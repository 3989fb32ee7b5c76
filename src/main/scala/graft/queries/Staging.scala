package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Source-state staging, shared by every query that builds a derived
  * artifact (streamed input copy, IVF index, MinHash index, near-dup
  * keep-list, bucketed tables): the artifact is built once per STATE of
  * its source files and reused until that state changes. The stage key
  * fingerprints each source's (qualified URI, length, mtime) plus the
  * build parameters, so regenerated testdata rebuilds instead of silently
  * replaying a stale artifact, distinct paths cannot alias, and repeated
  * bench/verify invocations reuse instead of rebuilding. One definition so
  * the contract (key derivation, completion marker, rebuild-on-miss)
  * cannot drift between staging sites.
  *
  * Sources resolve through each path's Hadoop FileSystem, never
  * java.io.File: a `file:` URI (or any remote scheme) fingerprints
  * correctly, where java.io.File silently reports length 0 / mtime 0 for
  * a URI-shaped path — a stable-but-wrong key that would replay a stale
  * artifact forever. A missing source throws instead of keying.
  *
  * Retention: a regenerated source changes the key, so its old stage
  * directory would otherwise leak under tmpdir forever — one full
  * derived artifact per dead source state. Every stage therefore records
  * its sources' fingerprint state in a `_sources` file, and each
  * [[dir]] call sweeps SAME-PREFIX siblings whose recorded state no
  * longer matches the live filesystem (source missing, or length/mtime
  * changed). Same-source stages with different params all stay live —
  * their recorded states still match. The sweep assumes a reader of a
  * source state does not outlive that state (the deployment contract:
  * data regeneration happens between runs, not during one). Orphaned
  * `.build_*` scratch dirs from crashed builds are collected once cold
  * (>1 h by mtime).
  */
object Staging {

  /** Per-source fingerprint rows: (qualified URI, length, mtime). */
  private def sourceState(
      conf: Configuration, sources: Seq[String]): Seq[(String, Long, Long)] =
    sources.map { src =>
      val p = new Path(src)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p) // FileNotFoundException on a missing source
      // the qualified URI, so "/x" and "file:/x" key as the same state
      (fs.makeQualified(p).toString, st.getLen, st.getModificationTime)
    }

  /** 16-hex-char fingerprint of the sources' state plus build params. */
  def key(spark: SparkSession, sources: Seq[String], params: String): String = {
    val state = sourceState(spark.sessionState.newHadoopConf(), sources)
      .map { case (uri, len, mtime) => s"$uri:$len:$mtime" }
    org.apache.commons.codec.digest.DigestUtils.md5Hex(
      state.mkString("|") + "|" + params).take(16)
  }

  private val stageName = """^(.+)_[0-9a-f]{16}$""".r

  /** Collect dead same-prefix stages (recorded source state no longer
    * matches the live filesystem) and cold orphaned scratch dirs.
    * Conservative by construction: a sibling without a `_sources` record
    * or whose sources all still match is left alone, and nothing outside
    * `tmpdir/<prefix>_<16-hex>` is ever considered.
    */
  private def sweep(fs: FileSystem, conf: Configuration, tmp: Path,
      prefix: String, keep: Path): Unit = {
    val siblings =
      try fs.listStatus(tmp).filter(_.getPath.getName.startsWith(prefix + "_"))
      catch { case _: java.io.IOException => Array.empty[org.apache.hadoop.fs.FileStatus] }
    siblings.foreach { st =>
      val p = st.getPath
      val name = p.getName
      try {
        if (name.contains(".build_")) {
          // crashed build's scratch: collect once cold. Coldness is the
          // NEWEST mtime anywhere under the dir, not the root's own — a
          // live build streams files into nested parquet output dirs
          // without ever touching the scratch root's mtime, and keying on
          // the root would let a concurrent sweep delete an in-progress
          // >1h build out from under its writer
          def newestMtime(d: org.apache.hadoop.fs.Path): Long = {
            val entries = fs.listStatus(d)
            (st.getModificationTime +: entries.toSeq.map(e =>
              if (e.isDirectory) newestMtime(e.getPath) else e.getModificationTime)).max
          }
          if (System.currentTimeMillis() - newestMtime(p) > 3600 * 1000L)
            fs.delete(p, true)
        } else if (p.toString != keep.toString && stageName.matches(name)) {
          val rec = new Path(p, "_sources")
          if (fs.exists(rec)) {
            val in = fs.open(rec)
            val recorded =
              try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
              finally in.close()
            val dead = recorded.exists { line =>
              line.split('\t') match {
                case Array(uri, len, mtime) =>
                  try {
                    val sp = new Path(uri)
                    val sst = sp.getFileSystem(conf).getFileStatus(sp)
                    sst.getLen != len.toLong || sst.getModificationTime != mtime.toLong
                  } catch { case _: java.io.FileNotFoundException => true }
                case _ => false // malformed record: leave the stage alone
              }
            }
            if (dead) fs.delete(p, true)
          }
        }
      } catch { case _: java.io.IOException => () } // sweep is best-effort
    }
  }

  /** Stage under `tmpdir/<prefix>_<key>`. `marker` is a stage-relative
    * path that `build` must create LAST — it is the completion flag, so
    * a crashed half-build reruns instead of being trusted.
    *
    * Concurrency: the build runs in a process-unique scratch dir that is
    * renamed into place only when complete, so two JVMs staging the same
    * key (e.g. bench and verify over the same testdata state) never write
    * interleaved files into one directory — the loser of the rename race
    * discards its scratch copy and reads the winner's stage.
    */
  def dir(spark: SparkSession, prefix: String, sources: Seq[String], params: String,
      marker: String)(build: String => Unit): String = {
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(sys.props("java.io.tmpdir"))
    val stage = new Path(tmp, s"${prefix}_${key(spark, sources, params)}")
    val fs = stage.getFileSystem(conf)
    sweep(fs, conf, tmp, prefix, keep = stage)
    if (!fs.exists(new Path(stage, marker))) {
      val scratch = new Path(s"$stage.build_${java.util.UUID.randomUUID().toString.take(8)}")
      try build(scratch.toString)
      catch { case e: Throwable => fs.delete(scratch, true); throw e }
      if (!fs.exists(new Path(scratch, marker))) {
        fs.delete(scratch, true)
        throw new IllegalArgumentException(
          s"stage build for $stage did not create its completion marker $marker")
      }
      // retention record, written post-marker (the publish below is what
      // makes the stage visible, so ordering inside scratch is free)
      val out = fs.create(new Path(scratch, "_sources"), true)
      try out.write(sourceState(conf, sources)
        .map { case (u, l, m) => s"$u\t$l\t$m" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // Publish atomically. A pre-existing destination means another
      // process won the race (Hadoop local rename would otherwise move
      // the scratch dir INSIDE it) — drop our copy and use theirs.
      if (fs.exists(stage) || !fs.rename(scratch, stage)) {
        fs.delete(scratch, true)
        require(fs.exists(new Path(stage, marker)),
          s"lost the stage race for $stage but the winner's marker $marker is absent")
      }
    }
    stage.toString
  }
}
