package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Avro container-file source/sink ([[graft.sources.Avro]]).
  *
  * Pins the q135 contract from the outside: byte-faithful round-trip on
  * the supported type subset (incl. nulls, binary, arrays), reader-schema
  * projection (pruned decode), sync-marker SPLITTABILITY of one large
  * file, and fail-fast on an unsupported Catalyst type.
  */
class AvroSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = true), nullable = true)))

  private def sampleRows: Seq[Row] = Seq(
    Row(1L, "alpha", 0.5, true, Array[Byte](1, 2, 3), Seq(1.0f, 2.0f)),
    Row(2L, null, null, false, null, Seq(3.0f, null)),
    Row(3L, "gamma", -1.25, true, Array[Byte](), null),
    Row(4L, "", 0.0, false, Array[Byte](-128, 127), Seq.empty[Float]))

  test("round-trip: write then read returns the exact rows (nulls, binary, arrays)") {
    val dir = tmpDir("avro_rt")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 2), fullSchema)
    Avro.write(df, dir)
    val back = Avro.read(spark, dir, fullSchema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      fullSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length === 4)
    // binary needs element-wise compare; the rest compare structurally
    got.zip(sampleRows).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0))
      assert(g.get(1) === e.get(1))
      assert(g.get(2) === e.get(2))
      assert(g.getBoolean(3) === e.getBoolean(3))
      assert(Option(g.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq) ===
        Option(e.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq))
      assert(Option(g.get(5)).map(_.asInstanceOf[scala.collection.Seq[Any]].toList) ===
        Option(e.get(5)).map(_.asInstanceOf[scala.collection.Seq[Any]].toList))
    }
  }

  test("projection: a pruned reader schema returns only the asked columns, in order") {
    val dir = tmpDir("avro_proj")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 1), fullSchema)
    Avro.write(df, dir)
    val back = Avro.read(spark, dir, fullSchema, columns = Seq("name", "id"))
    assert(back.schema.fieldNames.toSeq === Seq("name", "id"))
    val got = back.collect().map(r => (r.getAs[String]("name"), r.getLong(1))).toSet
    assert(got === Set(("alpha", 1L), (null, 2L), ("gamma", 3L), ("", 4L)))
  }

  test("splittability: one container file fans out into multiple input splits") {
    val dir = tmpDir("avro_split")
    val n = 20000
    val df = spark.range(n).selectExpr(
      "id", "md5(cast(id AS string)) AS pad").repartition(1)
    // tiny sync interval -> many blocks -> many split points in ONE file
    Avro.write(df, dir, syncInterval = 2 * 1024)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro"))
    assert(files === 1)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("pad", StringType, nullable = true)))
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val prev = Option(hconf.get(key))
    hconf.set(key, (16 * 1024).toString)
    try {
      val back = Avro.read(spark, dir, schema, columns = Seq("id"))
      assert(back.rdd.getNumPartitions > 1,
        "a split cap far below the file size must yield >1 partition from 1 file")
      assert(back.count() === n.toLong)
      assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) ===
        n.toLong * (n - 1) / 2)
    } finally {
      prev match { case Some(v) => hconf.set(key, v); case None => hconf.unset(key) }
    }
  }

  test("unsupported Catalyst type fails fast with the field named") {
    val bad = StructType(Seq(
      StructField("id", LongType),
      StructField("nested", StructType(Seq(StructField("x", LongType))))))
    val e = intercept[IllegalArgumentException] {
      Avro.avroSchemaOf(bad, "row")
    }
    assert(e.getMessage.contains("nested"))
  }

  test("read of a missing column fails fast") {
    val dir = tmpDir("avro_badcol")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows.take(1), 1), fullSchema)
    Avro.write(df, dir)
    val e = intercept[IllegalArgumentException] {
      Avro.read(spark, dir, fullSchema, columns = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
