package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase

class JsonlSpec extends SparkTestBase {

  test("JSONL read: explicit schema, unicode, corrupt lines captured not dropped") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "plain ascii text", "lang": "en", "source": "web", "n_chars": 16}""",
      """{"doc_id": 2, "text": "unicode éü中文 text", "lang": "de", "source": "web", "n_chars": 15}""",
      """{"doc_id": 3, "text": "missing optional fields"}""",
      """this line is not json at all""",
      """{"doc_id": 5, "text": "after the corrupt line", "lang": "en", "source": "books", "n_chars": 22}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val raw = Jsonl.readDocuments(spark, dir.toString)
    val valid = Jsonl.validDocuments(raw).collect().sortBy(_.getLong(0))
    assert(valid.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(valid(1).getString(1).contains("中文"), "unicode preserved")
    assert(valid(2).isNullAt(2), "missing optional field reads as null")

    val corrupt = Jsonl.corruptRecords(raw).collect()
    assert(corrupt.map(_.getString(1)).toSeq == Seq("this line is not json at all"))

    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
