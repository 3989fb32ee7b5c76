package graft.queries

import org.apache.hadoop.fs.Path
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
  */
object Staging {

  /** 16-hex-char fingerprint of the sources' state plus build params. */
  def key(spark: SparkSession, sources: Seq[String], params: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val state = sources.map { src =>
      val p = new Path(src)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p) // FileNotFoundException on a missing source
      // the qualified URI, so "/x" and "file:/x" key as the same state
      s"${fs.makeQualified(p)}:${st.getLen}:${st.getModificationTime}"
    }
    org.apache.commons.codec.digest.DigestUtils.md5Hex(
      state.mkString("|") + "|" + params).take(16)
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
    val stage = new Path(sys.props("java.io.tmpdir"),
      s"${prefix}_${key(spark, sources, params)}")
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(stage, marker))) {
      val scratch = new Path(s"$stage.build_${java.util.UUID.randomUUID().toString.take(8)}")
      try build(scratch.toString)
      catch { case e: Throwable => fs.delete(scratch, true); throw e }
      if (!fs.exists(new Path(scratch, marker))) {
        fs.delete(scratch, true)
        throw new IllegalArgumentException(
          s"stage build for $stage did not create its completion marker $marker")
      }
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
