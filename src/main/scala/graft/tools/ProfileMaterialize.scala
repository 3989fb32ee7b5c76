package graft.queries // package-scoped for staged-dir access (dev tool)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage survivor counts for the q131 composed pipeline (dev
  * tool, not part of the query surface): how many docs each gate passes
  * at a given SF, plus the per-lang classifier evidence distribution
  * that justifies the operating-point threshold (see the q131 stage-4
  * comment — the absolute 0.5 rule is degenerate on this corpus).
  */
object ProfileMaterialize {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = graft.SessionDefaults(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.operators.CacheScope.scoped {
      val docs = graft.Tables.table(s, dir, "documents")
      val groups = s.read.parquet(DedupQueries.stagedKeepListDir(s, dir))
      val survivors = docs
        .join(groups, docs("doc_id") === groups("member_id"), "left")
        .filter(coalesce(col("keep_id"), docs("doc_id")) === docs("doc_id"))
        .select(docs("doc_id"), col("lang"), col("source"), col("text"))
      println("[m131] survivors=" + survivors.count())
      val stripped = graft.operators.Spans.stripRepeatedSpans(
          s, DedupQueries.stagedSpanIndexDir(s, dir), survivors)
        .select(col("doc_id"), col("clean_text"))
      val strip = survivors.drop("text")
        .join(stripped, Seq("doc_id")).withColumnRenamed("clean_text", "text")
      val gm = graft.operators.Gopher.metrics(strip, minWords = 10, minStopwords = 1)
      println("[m131] gopher_keep=" + gm.filter(col("keep")).count())
      val clf = graft.operators.QualityClassifier.load(
        s, TextQueries.stagedClfModelDir(s, dir))
      // per-lang mean gram weight (micro-units): the evidence behind the
      // q131 operating point
      val dots = strip
        .select(col("doc_id"), col("lang"),
          explode_outer(graft.functions.expr.ClassifierFunctions.charGramBuckets(
            graft.functions.TextFunctions.normText(col("text")), clf.n, clf.dim)).as("b"))
        .groupBy("doc_id", "lang")
        .agg(sum(element_at(typedLit(clf.weightsMicro.toSeq), col("b") + 1)).as("dot"),
          count(col("b")).as("ng"))
        .withColumn("mean_micro", col("dot").cast("double") / col("ng"))
      dots.groupBy("lang").agg(count(lit(1)).as("n"),
        min("mean_micro"), avg("mean_micro"), max("mean_micro")).orderBy("lang").show(false)
      val ck = graft.operators.QualityClassifier.keepAt(strip, clf, -53000L)
      println("[m131] clf_keepAt=" + ck.filter(col("keep")).count())
      val kept = strip
        .join(gm.filter(col("keep")).select("doc_id"), Seq("doc_id"))
        .join(ck.filter(col("keep")).select("doc_id"), Seq("doc_id"))
      println("[m131] kept_both=" + kept.count())
      kept.groupBy("lang").count().orderBy("lang").show(false)
    }
    s.stop()
  }
}
