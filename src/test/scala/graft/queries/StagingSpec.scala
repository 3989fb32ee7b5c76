package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StagingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpdir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("a file: URI source keys identically to its plain-path spelling") {
    val dir = tmpdir("graft_staging_uri")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val plain = Staging.key(spark, Seq(s"$dir/t.parquet"), "p")
    val uri = Staging.key(spark, Seq(s"file:$dir/t.parquet"), "p")
    assert(plain == uri,
      "URI-spelled and plain-spelled paths must fingerprint the same source state")
  }

  test("a missing source throws instead of producing a stable-but-wrong key") {
    // java.io.File would have reported length 0 / mtime 0 and produced a
    // key that never invalidates — the bug class Staging closes
    intercept[java.io.FileNotFoundException] {
      Staging.key(spark, Seq("/nonexistent/graft/nowhere.parquet"), "p")
    }
  }

  test("the key tracks source state: a rewrite with different content re-keys") {
    val dir = tmpdir("graft_staging_state")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val k1 = Staging.key(spark, Seq(s"$dir/t.parquet"), "p")
    // different row count -> different length (and a later mtime)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val k2 = Staging.key(spark, Seq(s"$dir/t.parquet"), "p")
    assert(k1 != k2, "source rewrite must invalidate the stage key")
    assert(Staging.key(spark, Seq(s"$dir/t.parquet"), "other") != k2,
      "different build params must not alias")
  }

  test("dir() builds once per state and reuses until the marker exists") {
    val dir = tmpdir("graft_staging_dir")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    var builds = 0
    def stage(): String =
      Staging.dir(spark, "graft_staging_spec", Seq(s"$dir/t.parquet"), "p",
        "done.marker") { s =>
        builds += 1
        val p = new org.apache.hadoop.fs.Path(s, "done.marker")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.mkdirs(p.getParent); fs.create(p).close()
      }
    val first = stage()
    val second = stage()
    assert(first == second && builds == 1, "second call must reuse the staged dir")
  }

  test("dir() publishes atomically: a build that omits its marker throws and leaves no stage") {
    val dir = tmpdir("graft_staging_atomic")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    intercept[IllegalArgumentException] {
      Staging.dir(spark, "graft_staging_atomic_spec", Seq(s"$dir/t.parquet"), "p",
        "done.marker") { s =>
        // a "crashed" build: writes data but never the completion marker
        val p = new org.apache.hadoop.fs.Path(s, "partial.data")
        fs.mkdirs(p.getParent); fs.create(p).close()
      }
    }
    // the half-built scratch must NOT have been published as the stage
    val stage = new org.apache.hadoop.fs.Path(sys.props("java.io.tmpdir"),
      "graft_staging_atomic_spec_" +
        Staging.key(spark, Seq(s"$dir/t.parquet"), "p"))
    assert(!fs.exists(stage),
      "a markerless build must not be visible at the stage path")
    // a subsequent correct build succeeds and is reused
    var builds = 0
    def good(): String =
      Staging.dir(spark, "graft_staging_atomic_spec", Seq(s"$dir/t.parquet"), "p",
        "done.marker") { s =>
        builds += 1
        val p = new org.apache.hadoop.fs.Path(s, "done.marker")
        fs.mkdirs(p.getParent); fs.create(p).close()
      }
    assert(good() == good() && builds == 1)
  }

  test("retention sweep: regenerating a source collects its dead stage, " +
      "the live stage survives, and same-source/other-params stages survive") {
    val dir = tmpdir("graft_staging_gc")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    def mkStage(params: String): String =
      Staging.dir(spark, "graft_staging_gc_spec", Seq(s"$dir/t.parquet"), params,
        "done.marker") { s =>
        val p = new org.apache.hadoop.fs.Path(s, "done.marker")
        fs.mkdirs(p.getParent); fs.create(p).close()
      }
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val stateA1 = mkStage("p")
    val stateA2 = mkStage("other") // same source state, different params
    assert(stateA1 != stateA2)
    // regenerate the source: both old-state stages are now dead
    Thread.sleep(5) // ensure a distinct mtime even on coarse clocks
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val stateB1 = mkStage("p") // stages anew AND sweeps
    assert(stateB1 != stateA1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stateA1)),
      "dead stage (params p) must be collected by the sweep")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stateA2)),
      "dead stage (params other) must be collected by the sweep")
    assert(fs.exists(new org.apache.hadoop.fs.Path(stateB1, "done.marker")),
      "the live stage must survive its own sweep")
    // a second live stage with different params is NOT collected by a
    // subsequent call's sweep (its recorded source state still matches)
    val stateB2 = mkStage("other")
    mkStage("p")
    assert(fs.exists(new org.apache.hadoop.fs.Path(stateB2, "done.marker")),
      "live same-source/other-params stage must survive sibling sweeps")
  }

  test("sweep keys .build_ coldness on the NEWEST nested mtime: a live build " +
      "writing into nested dirs survives, a fully-cold crash is collected") {
    val dir = tmpdir("graft_staging_livebuild")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    val prefix = s"graftsweeptest${System.nanoTime()}"
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L)
    def mkScratch(tag: String): java.nio.file.Path = {
      val p = tmp.resolve(s"${prefix}_0000000000000000.build_$tag")
      java.nio.file.Files.createDirectories(p.resolve("out"))
      java.nio.file.Files.writeString(p.resolve("out").resolve("part-0"), "x")
      p
    }
    // live: root + intermediate dir look cold (a writer never touches
    // them), but the nested part file was written moments ago
    val live = mkScratch("live")
    java.nio.file.Files.setLastModifiedTime(live.resolve("out"), old)
    java.nio.file.Files.setLastModifiedTime(live, old)
    // dead: every mtime is cold — a genuinely crashed build
    val dead = mkScratch("dead")
    java.nio.file.Files.setLastModifiedTime(dead.resolve("out").resolve("part-0"), old)
    java.nio.file.Files.setLastModifiedTime(dead.resolve("out"), old)
    java.nio.file.Files.setLastModifiedTime(dead, old)
    // any dir() call with the prefix runs the sweep
    Staging.dir(spark, prefix, Seq(s"$dir/t.parquet"), "p", "_M") { scratch =>
      val sp = java.nio.file.Paths.get(scratch)
      java.nio.file.Files.createDirectories(sp)
      java.nio.file.Files.writeString(sp.resolve("_M"), "done")
    }
    assert(java.nio.file.Files.exists(live),
      "a >1h build with fresh nested writes must NOT be swept out from under its writer")
    assert(!java.nio.file.Files.exists(dead),
      "a fully-cold crashed scratch must be collected")
  }

  test("q43/q74's staged keep-list: consumers read the stage, not the text") {
    val dir = tmpdir("graft_staging_keeplist")
    // two near-dup docs + two singletons, written as the documents table
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa first"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa second"),
      (2L, "completely different content about cooking pasta with tomato sauce"),
      (3L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val stage = DedupQueries.stagedKeepListDir(spark, dir)
    val groups = spark.read.parquet(stage)
    // correctness: the staged closure equals a direct computation
    val direct = graft.operators.CacheScope.scoped {
      graft.operators.Dedup.nearDupGroups(
          graft.operators.Dedup.ngramJaccardPairs(
            spark.read.parquet(s"$dir/documents.parquet"), n = 3, threshold = 0.8))
        .orderBy("member_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val staged = groups.orderBy("member_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(staged == direct)
    assert(staged.contains((0L, 0L)) && staged.contains((1L, 0L)))

    // scale contract: the q43/q74 group side reads ONLY the staged
    // parquet — the pair pipeline must not re-run over the text
    val files = groups.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("graft_keeplist_")),
      s"keep-list consumer reads outside the stage: ${files.take(3).toSeq}")
    assert(!files.exists(_.contains("documents.parquet")),
      "keep-list consumer re-reads the corpus text")
  }
}
