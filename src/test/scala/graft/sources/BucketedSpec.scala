package graft.sources

import graft.SparkTestBase

class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = (0 until 20000).map(i => ((i % 400).toLong, i.toLong))
    .toDF("k", "payload")
  private lazy val dim = (0 until 400).map(k => (k.toLong, s"label$k")).toDF("k", "label")

  test("both-sides-bucketed join plans with no exchange and no extra sort") {
    val t1 = s"b_fact_${System.nanoTime()}"
    val t2 = s"b_dim_${System.nanoTime()}"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.writeBucketed(fact, t1, "k", buckets = 8)
      Bucketed.writeBucketed(dim, t2, "k", buckets = 8)
      // force the sort-merge path (a broadcast would trivially avoid the
      // exchange without exercising bucket co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.read(spark, t1).join(Bucketed.read(spark, t2), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(600)}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      // bucket-sorted data: no per-task sort either side
      assert(!plan.linesIterator.exists(_.trim.startsWith("Sort ")),
        s"bucket-sorted join must not re-sort:\n${plan.take(1200)}")
      // and the result equals the shuffled join of the original frames
      val expect = fact.join(dim, "k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("q71's query path joins co-located with no orderkey exchange and no sort") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/orders.parquet").exists())
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so co-location (not a broadcast) is what elides the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = graft.queries.ParityQueries.queries("q71_bucketed_orders_lineitem")
      val frame = q(spark, sfDir)
      val plan = frame.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(800)}")
      // the aggregation exchange (on o_orderpriority) is expected; the
      // JOIN must not shuffle either fact on its order key
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed fact join shuffled:\n${plan.take(1500)}")
      assert(!plan.linesIterator.exists(_.trim.startsWith("Sort [o_orderkey")) &&
        !plan.linesIterator.exists(_.trim.startsWith("Sort [l_orderkey")),
        s"bucket-sorted join re-sorted:\n${plan.take(1500)}")
      // and the result matches the plain shuffled join over the raw tables
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val expect = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.expr("l_extendedprice * (1.0 - l_discount)")), 2)
          .as("revenue"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val got = frame.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed-by-fingerprint self-join (the dedup-index layout) stays shuffle-free") {
    val t = s"b_docs_${System.nanoTime()}"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val docs = (0 until 5000).map(i => (i.toLong, s"fp${i % 1000}")).toDF("doc_id", "fingerprint")
      Bucketed.writeBucketed(docs, t, "fingerprint", buckets = 4)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Bucketed.read(spark, t)
      val b = Bucketed.read(spark, t)
      val plan = a.join(b.withColumnRenamed("doc_id", "doc_id_b"), "fingerprint")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"shuffled:\n${plan.take(1200)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
