package graft.sources

import java.io.{BufferedInputStream, InputStream, OutputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format web
  * crawls actually ship in (Common Crawl's WARC corpus being the one a
  * training-data pipeline meets first). Pure-JVM record parser: a header
  * walk over the `WARC/1.x` version line + name:value headers, a
  * Content-Length-delimited block read, and `java.util.zip` for the
  * member-per-record gzip layout — no external crawl libraries, the same
  * real-fixture-bytes discipline as the multimodal header parsers
  * ([[graft.multimodal.ImageHeaders]]).
  *
  * Reference scope: the reference ingests CSV only
  * (`src/etl_pipeline.py:53`); WARC is extension surface, the missing
  * real-world ingestion format called out in the r10 review.
  *
  * Design rules (the [[Jsonl]] contract, adapted to a binary container):
  *   - EXPLICIT output schema ([[recordSchema]]), never inference.
  *   - PERMISSIVE corruption handling: a malformed or truncated record
  *     lands as a row with `error` set instead of failing the job; the
  *     caller audits explicitly ([[corruptRecords]] / [[validResponses]]).
  *     Unlike JSONL there is NO resync after an error — record framing is
  *     length-delimited, so one bad length poisons the rest of the
  *     member stream; the parser emits the error row and stops that file
  *     (per-file blast radius, never silent row loss).
  *   - Parallelism is PER FILE ([[org.apache.spark.SparkContext
  *     .binaryFiles]] + a lazy per-file record iterator): gzip members
  *     are not byte-range splittable without a member index, and crawl
  *     archives are sized for exactly this (Common Crawl caps files at
  *     ~1 GB so a file is a work unit). Memory is bounded by ONE record
  *     at a time — the stream is never slurped.
  *   - HTTP response payloads are split (status line + headers + body) so
  *     consumers get the body bytes directly; non-HTTP records keep the
  *     raw block.
  */
object Warc {

  /** Largest Content-Length the parser will buffer for one record (the
    * WARC spec puts no bound; a corrupt length must not OOM an executor).
    */
  val maxRecordBytes: Long = 1L << 30

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** All WARC records under `path` (a directory or glob; `.gz` members
    * and plain files auto-detected per file by magic bytes). One row per
    * record; parse failures produce one `error` row per file (see class
    * doc). RDD entry is deliberate: per-file imperative stream parsing is
    * the genuine per-partition-logic case, and the result is immediately
    * a DataFrame with an explicit schema.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) => recordsOf(file, pds.open()) }
    spark.createDataFrame(rows, recordSchema)
  }

  /** Cleanly-parsed HTTP response records — the rows a text pipeline
    * consumes. `payload` is the HTTP BODY (headers already split off).
    */
  def validResponses(df: DataFrame): DataFrame =
    df.filter(col("error").isNull && col("record_type") === "response")

  /** Per-file parse failures, for auditing (the [[Jsonl.corruptRecords]]
    * shape).
    */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(col("error").isNotNull).select(col("warc_file"), col("error"))

  // ---------------------------------------------------------------- parse

  private def recordsOf(file: String, raw: InputStream): Iterator[Row] = {
    val pb = new PushbackInputStream(new BufferedInputStream(raw, 1 << 16), 2)
    new Iterator[Row] {
      private var in: InputStream = _
      private var nextRow: Row = _
      private var finished = false
      private var primed = false

      private def prime(): Unit = {
        if (primed) return
        primed = true
        // member layout detection by magic bytes, per file
        nextRow =
          try {
            val b0 = pb.read(); val b1 = pb.read()
            if (b1 != -1) pb.unread(b1)
            if (b0 != -1) pb.unread(b0)
            in =
              if (b0 == 0x1f && b1 == 0x8b)
                new BufferedInputStream(new GZIPInputStream(pb), 1 << 16)
              else pb
            parseOne()
          } catch { case e: java.io.IOException => errRow(s"unreadable: ${e.getMessage}") }
        if (nextRow == null) finished = true
      }

      override def hasNext: Boolean = { prime(); !finished }

      override def next(): Row = {
        prime()
        if (finished) throw new NoSuchElementException
        val out = nextRow
        if (out.get(8) != null) { finished = true; close() } // error row: stop this file
        else {
          nextRow =
            try parseOne()
            catch { case e: java.io.IOException => errRow(s"unreadable: ${e.getMessage}") }
          if (nextRow == null) { finished = true; close() }
        }
        out
      }

      private def close(): Unit =
        try (if (in != null) in else pb).close()
        catch { case _: java.io.IOException => () }

      /** One record, or null at clean EOF, or an error row. */
      private def parseOne(): Row = {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in) // record separators
        if (line == null) return null
        if (!line.startsWith("WARC/"))
          return errRow(s"bad version line: ${line.take(40)}")
        val headers = scala.collection.mutable.HashMap.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) return errRow(s"malformed header: ${h.take(40)}")
          headers.put(h.substring(0, i).trim.toLowerCase, h.substring(i + 1).trim)
          h = readLine(in)
        }
        if (h == null) return errRow("truncated: EOF inside record headers")
        val lenStr = headers.getOrElse("content-length", "")
        val len = try lenStr.toLong catch { case _: NumberFormatException => -1L }
        if (len < 0L || len > maxRecordBytes)
          return errRow(s"bad Content-Length: '$lenStr'")
        val block = new Array[Byte](len.toInt)
        var off = 0
        while (off < len) {
          val r = in.read(block, off, len.toInt - off)
          if (r < 0)
            return errRow(s"truncated: EOF at $off of $len content bytes")
          off += r
        }
        val rtype = headers.getOrElse("warc-type", null)
        val ctype = headers.getOrElse("content-type", null)
        val url = headers.getOrElse("warc-target-uri", null)
        val date = headers.getOrElse("warc-date", null)
        if (rtype == "response" && ctype != null &&
            ctype.toLowerCase.startsWith("application/http")) {
          val (status, httpCt, body) = splitHttp(block)
          Row(file, rtype, url, date, ctype, status, httpCt, body, null)
        } else Row(file, rtype, url, date, ctype, null, null, block, null)
      }

      private def errRow(msg: String): Row =
        Row(file, null, null, null, null, null, null, null, msg)
    }
  }

  /** Split an `application/http` response block into (status,
    * content-type, body). Lenient: a block with no recognizable HTTP
    * preamble keeps its full bytes as the body with null status — the
    * record itself is well-framed, so it is not an `error`.
    */
  private def splitHttp(block: Array[Byte]): (Integer, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return (null, null, block)
    val head = new String(block, 0, sep, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (null, null, block)
    val parts = lines(0).split(" ")
    val status: Integer =
      if (parts.length >= 2)
        try Integer.valueOf(parts(1)) catch { case _: NumberFormatException => null }
      else null
    val httpCt = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    (status, httpCt, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** ASCII header line terminated by LF (CR stripped); null at EOF. */
  private def readLine(in: InputStream): String = {
    var c = in.read()
    if (c == -1) return null
    val sb = new java.lang.StringBuilder(64)
    while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
    val n = sb.length()
    if (n > 0 && sb.charAt(n - 1) == '\r') sb.setLength(n - 1)
    sb.toString
  }

  // ---------------------------------------------------------------- write

  /** Write `df` rows as WARC response records, one `.warc.gz` file per
    * partition, each record its OWN gzip member (the Common Crawl layout
    * that makes per-record random access possible). `df` must carry a
    * string `url` column and a binary `body` column; the HTTP preamble is
    * a synthesized 200 response. Deterministic byte-for-byte given the
    * same rows (fixed date, record id = md5 of the url), so staged
    * corpora fingerprint stably.
    *
    * Executor-side writer (no driver collect): each partition streams its
    * own file. Intended for staging/fixtures and sharded export, not as a
    * general crawl emitter.
    */
  def writeResponses(
      df: DataFrame, dir: String,
      warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    df.select(col("url").cast("string").as("url"), col("body").cast("binary").as("body"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new Path(dir, f"part-$pid%05d.warc.gz")
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val out = fs.create(p, true)
          try rows.foreach { r =>
            writeMember(out, responseRecord(r.getString(0), r.getAs[Array[Byte]](1), warcDate))
          } finally out.close()
        }
      }
  }

  /** One record's full bytes: WARC headers + HTTP response + trailing
    * CRLF CRLF record separator.
    */
  private[sources] def responseRecord(
      url: String, body: Array[Byte], warcDate: String): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ body
    val id = org.apache.commons.codec.digest.DigestUtils.md5Hex(url)
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: $warcDate\r\nWARC-Record-ID: <urn:uuid:$id>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++
      http ++ "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Append `record` as its own gzip member; `finish()` (not close) keeps
    * the underlying file stream open for the next member.
    */
  private def writeMember(out: OutputStream, record: Array[Byte]): Unit = {
    val gz = new GZIPOutputStream(out, 1 << 16)
    gz.write(record)
    gz.finish()
  }

  /** A deliberately TRUNCATED response record (header declares more
    * content bytes than follow) as its own file, for corrupt-tail audits:
    * the reader must surface it via [[corruptRecords]] and keep it out of
    * [[validResponses]]. The `zz-` name sorts it last so clean fixtures
    * parse first in directory listings.
    */
  def writeTruncatedFixture(
      spark: SparkSession, dir: String, name: String = "zz-truncated.warc.gz"): Unit = {
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.invalid/truncated\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 1000\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
    val bytes = head ++ Array.fill[Byte](10)('x'.toByte)
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try writeMember(out, bytes) finally out.close()
  }
}
