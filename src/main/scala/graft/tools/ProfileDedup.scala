package graft.operators // package-scoped for Ann.withBuckets access (dev tool)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the dedup family (dev tool, not part of
  * the query surface). Currently dissects q78 (incremental embedding
  * near-dup): candidate volume pre/post distinct, per-phase wall time,
  * stage-level attribution.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.expr.VectorFunctions.cosineSim

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
        }
      }
    })

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val inc = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // mirror the staged index build (q78's stagedEmbeddingIndexDir params)
    val dir = s"${sys.props("java.io.tmpdir")}/profile_q78_idx"
    time("index build") {
      Dedup.writeEmbeddingIndex(emb.filter(col("vec_id") < 250), dir,
        planes = 6, tables = 24)
    }
    val (planes, tables, dim, seed) = (6, 24, 64, 42L)

    (1 to 2).foreach { i =>
      stages.synchronized(stages.clear())
      val incBase = Ann.withBuckets(inc, "vec", planes, tables, dim, seed)
        .select("id", "table", "bucket")
      val incProbed = Ann.withBuckets(inc, "vec", planes, tables, dim, seed, 1)
        .select("id", "table", "bucket")
      val baseSide = spark.read.parquet(s"$dir/buckets").withColumn("corpus", lit(true))
        .unionByName(incBase.withColumn("corpus", lit(false)))
      val joined = broadcast(incProbed.as("a")).join(baseSide.as("b"),
          col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
            col("a.id") =!= col("b.id") && (col("b.corpus") || col("a.id") < col("b.id")))
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"))
      val nRaw = time(s"#$i candidates pre-distinct count")(joined.count())
      val candidates = joined.distinct()
      val nDist = time(s"#$i candidates post-distinct count")(candidates.count())
      println(s"[profile] raw=$nRaw distinct=$nDist")
      val vecs = inc.unionByName(
        spark.read.parquet(s"$dir/vecs").join(inc.select("id"), Seq("id"), "left_anti"))
      val scored = candidates
        .join(vecs.select(col("id").as("id_a"), col("vec").as("v_a")), "id_a")
        .join(vecs.select(col("id").as("id_b"), col("vec").as("v_b")), "id_b")
        .withColumn("cosine", cosineSim(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      time(s"#$i full pipeline (score incl. re-run of candidates)")(noop(scored))
      time(s"#$i end-to-end operator")(noop(
        Dedup.incrementalEmbeddingNearDupPairs(spark, dir, emb.filter(col("vec_id") >= 250),
          threshold = 0.5)))
      stages.synchronized(stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, t) =>
        println(f"[profile]   stage $id%4d $ms%6d ms tasks=$t%3d  $n") })
    }
    spark.stop()
  }
}
