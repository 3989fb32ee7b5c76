package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("decodeImageMeta: deterministic stub metadata from bytes") {
    val df = Seq((1L, "Az"), (2L, "")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val metas = Multimodal.decodeImageMeta(df, "id", "payload")
      .orderBy("id").collect()
    val r1 = metas(0)
    // 'A'=65, 'z'=122: width=1+65%64=2, height=1+122%64=59, len=2, frames=1+2%8=3
    assert(r1.getAs[Long]("byte_len") == 2L)
    assert(r1.getAs[Long]("width") == 2L)
    assert(r1.getAs[Long]("height") == 59L)
    assert(r1.getAs[Long]("n_frames") == 3L)
    assert(r1.getAs[String]("format") == "webp") // 65 % 3 == 2
    val r2 = metas(1)
    assert(r2.getAs[Long]("byte_len") == 0L && r2.getAs[String]("format") == "empty")
  }

  test("decodeImageMeta handles null payloads as empty") {
    val df = Seq(1L).toDF("id").withColumn("payload", lit(null).cast("binary"))
    val r = Multimodal.decodeImageMeta(df, "id", "payload").head()
    assert(r.getAs[Long]("byte_len") == 0L)
  }

  test("sampleFrames explodes stride-spaced frame indices") {
    val meta = Seq((7L, 5L)).toDF("id", "n_frames")
    val frames = Multimodal.sampleFrames(meta, "id", stride = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(frames == Seq(0L, 2L, 4L))
  }

  test("sampleFrames yields no rows (not an error) for empty payloads") {
    // n_frames = 0 would make sequence(0, -1, +2) throw; the guard must
    // turn it into an empty explode, matching GENERATE_SERIES semantics
    val meta = Seq((1L, 0L), (2L, 3L)).toDF("id", "n_frames")
    val rows = Multimodal.sampleFrames(meta, "id", stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows == Seq((2L, 0L), (2L, 2L)))
  }

  test("end-to-end: empty payload survives decode -> sampleFrames") {
    val df = Seq((1L, ""), (2L, "abcd")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val frames = Multimodal.sampleFrames(
        Multimodal.decodeImageMeta(df, "id", "payload"), "id", stride = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(!frames.contains(1L) && frames.contains(2L))
  }
}
