package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_warc").toString

  private def gzBytes(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(record)
    gz.finish(); gz.close()
    bos.toByteArray
  }

  test("response records round-trip byte-exactly, including UTF-8 and empty bodies") {
    val dir = tmpDir()
    val docs = Seq(
      ("https://a.example/1", "plain ascii body"),
      ("https://a.example/2", "naïve café — déjà vu ✓"), // multi-byte UTF-8
      ("https://a.example/3", "")) // empty body
      .toDF("url", "body0")
      .select(col("url"), encode(col("body0"), "UTF-8").as("body"))
    Warc.writeResponses(docs.repartition(2), dir)
    val recs = Warc.read(spark, dir)
    val out = Warc.validResponses(recs)
      .select(col("url"), col("http_status"), col("http_content_type"),
        col("payload").cast("string").as("text"))
      .orderBy("url")
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).toSeq ==
      Seq("https://a.example/1", "https://a.example/2", "https://a.example/3"))
    assert(out.forall(_.getInt(1) == 200))
    assert(out.forall(_.getString(2) == "text/plain; charset=utf-8"))
    assert(out.map(_.getString(3)).toSeq ==
      Seq("plain ascii body", "naïve café — déjà vu ✓", ""))
    assert(Warc.corruptRecords(recs).isEmpty)
  }

  test("member-per-record gzip: many members in ONE file all parse (CC layout)") {
    // one partition -> one .warc.gz file with 5 concatenated gzip
    // members; pins java.util.zip's multi-member read-through, which the
    // Common Crawl layout depends on
    val dir = tmpDir()
    val docs = (1 to 5).map(i => (s"https://m.example/$i", s"body $i")).toDF("url", "body0")
      .select(col("url"), encode(col("body0"), "UTF-8").as("body"))
    Warc.writeResponses(docs.repartition(1), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1, s"expected one file, got ${files.toSeq}")
    val out = Warc.validResponses(Warc.read(spark, dir)).collect()
    assert(out.length == 5)
  }

  test("plain (uncompressed) WARC files parse via magic-byte detection") {
    val dir = tmpDir()
    val rec = Warc.responseRecord(
      "https://p.example/1", "uncompressed".getBytes(StandardCharsets.UTF_8),
      "2026-01-01T00:00:00Z")
    Files.write(Paths.get(dir, "plain.warc"), rec)
    val out = Warc.validResponses(Warc.read(spark, dir))
      .select(col("url"), col("payload").cast("string")).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "https://p.example/1")
    assert(out.head.getString(1) == "uncompressed")
  }

  test("truncated record surfaces in the corrupt audit and stays out of validResponses") {
    val dir = tmpDir()
    val docs = Seq(("https://t.example/ok", "fine")).toDF("url", "body0")
      .select(col("url"), encode(col("body0"), "UTF-8").as("body"))
    Warc.writeResponses(docs.repartition(1), dir)
    Warc.writeTruncatedFixture(spark, dir)
    val recs = Warc.read(spark, dir)
    val corrupt = Warc.corruptRecords(recs).collect()
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(0).contains("zz-truncated"))
    assert(corrupt.head.getString(1).contains("truncated"),
      s"unexpected error text: ${corrupt.head.getString(1)}")
    val ok = Warc.validResponses(recs).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("url") == "https://t.example/ok")
  }

  test("a corrupt record stops its file (length-delimited framing, no resync) " +
      "but other files still parse") {
    val dir = tmpDir()
    // file A: good record, then a record with garbage instead of a
    // version line, then a good record that is UNREACHABLE by contract
    val good1 = Warc.responseRecord("https://c.example/1",
      "one".getBytes(StandardCharsets.UTF_8), "2026-01-01T00:00:00Z")
    val bad = "NOT-A-WARC-RECORD\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val good2 = Warc.responseRecord("https://c.example/2",
      "two".getBytes(StandardCharsets.UTF_8), "2026-01-01T00:00:00Z")
    Files.write(Paths.get(dir, "a.warc.gz"), gzBytes(good1) ++ gzBytes(bad) ++ gzBytes(good2))
    // file B: clean
    val good3 = Warc.responseRecord("https://c.example/3",
      "three".getBytes(StandardCharsets.UTF_8), "2026-01-01T00:00:00Z")
    Files.write(Paths.get(dir, "b.warc.gz"), gzBytes(good3))
    val recs = Warc.read(spark, dir)
    val ok = Warc.validResponses(recs).select("url").collect().map(_.getString(0)).toSet
    assert(ok == Set("https://c.example/1", "https://c.example/3"),
      s"expected the pre-error record of A plus all of B, got $ok")
    val corrupt = Warc.corruptRecords(recs).collect()
    assert(corrupt.length == 1 && corrupt.head.getString(1).contains("bad version line"))
  }

  test("non-HTTP records (warcinfo) keep their raw block and a null status") {
    val dir = tmpDir()
    val info = "software: graft-test\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val rec = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${info.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++
      info ++ "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    Files.write(Paths.get(dir, "info.warc.gz"), gzBytes(rec))
    val out = Warc.read(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("record_type") == "warcinfo")
    assert(r.isNullAt(r.fieldIndex("http_status")))
    assert(new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.ISO_8859_1) ==
      "software: graft-test\r\n")
    assert(r.isNullAt(r.fieldIndex("error")))
  }
}
