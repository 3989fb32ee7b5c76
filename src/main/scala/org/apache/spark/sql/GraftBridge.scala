package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column<->Expression
  * converters, so graft's custom Catalyst expressions (package
  * graft.functions.expr) can be exposed as user-facing Columns. This is
  * the Spark-4 replacement for the removed public `new Column(expr)`
  * constructor; no other internals are touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function description on an EXISTING session's
    * registry — the post-hoc twin of `spark.sql.extensions`-time
    * injection (see `graft.GraftExtensions`), for sessions built without
    * the config (notebooks, tests). Same `private[sql]` altitude as the
    * Column converters above; no other internals touched.
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)

  /** The TABLE-function twin of [[registerFunction]] (a FROM-clause
    * table-valued function returning a LogicalPlan — the
    * `injectTableFunction` registry, reachable post-hoc).
    */
  def registerTableFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .registerFunction(ident, info, builder)

  /** The analyzed logical plan behind a DataFrame — for table-valued
    * functions that splice an engine-built frame into a SQL FROM clause.
    */
  def planOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.DataFrame].queryExecution.analyzed

  /** Re-tag a batch frame as a STREAMING one — what a V1 streaming
    * `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming` before grafting the batch plan into the streaming
    * plan). The same `internalCreateDataFrame(rdd, schema, isStreaming =
    * true)` call Spark's own FileStreamSource makes; the RDD is the
    * frame's lazily-planned execution, so nothing computes here.
    */
  def streamingFrameOf(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.DataFrame]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The INVERSE of [[streamingFrameOf]] — re-bind the micro-batch frame
    * a V1 `Sink.addBatch` receives as a plain BATCH frame: the incoming
    * frame is tied to the stream's IncrementalExecution and cannot be
    * handed to batch writers directly (re-planning it re-executes the
    * wrong plan — the documented V1 sink trap). Same
    * `internalCreateDataFrame` seam, `isStreaming = false`.
    */
  def batchFrameOf(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.DataFrame]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
