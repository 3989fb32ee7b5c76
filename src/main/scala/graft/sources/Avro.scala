package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink — the first-class ROW format beside
  * the columnar pair (parquet everywhere, ORC via q133). Spark 4 ships
  * the Avro core + avro-mapred jars but not the `spark-avro` DataSource,
  * so this module builds the source from the public Avro machinery
  * directly; no external dependency.
  *
  * Reference scope: the reference ingests CSV only
  * (`src/etl_pipeline.py:53`); Avro is extension surface — the log/event
  * interchange format a large ingest pipeline meets between the crawl
  * archive (WARC, q117) and the columnar warehouse (parquet/ORC).
  *
  * Scale design — the three properties that make this the 100 TB shape:
  *   - SPLITTABLE reads. Avro container files carry a 16-byte sync
  *     marker between blocks, so (unlike q117's gzip-member WARC, where
  *     a file is the work unit) one big file fans out across executors:
  *     reads go through `newAPIHadoopFile` + [[AvroKeyInputFormat]],
  *     whose record reader seeks to the first sync past the split start.
  *     The writer's `setSyncInterval` bounds block size (and therefore
  *     split granularity + per-record decode memory).
  *   - PROJECTION at decode. A row format cannot skip column I/O the way
  *     parquet/ORC do, but Avro schema RESOLUTION skips the *decode* of
  *     fields absent from the reader schema. [[read]] takes the wanted
  *     columns and hands [[AvroKeyInputFormat]] a pruned reader schema
  *     (`avro.schema.input.key`), so unselected fields are skipped, not
  *     materialized — the honest row-format analogue of column pruning.
  *     Predicates stay post-decode by nature of the format; a pipeline
  *     that needs predicate pushdown converts to parquet/ORC first.
  *   - DISTRIBUTED writes. [[write]] writes one container file per
  *     partition from the executors (deflate-compressed, pure JVM), via
  *     a temp-file + rename commit per task and a `_SUCCESS` marker from
  *     the driver — never a collect.
  *
  * Schema contract (the [[Jsonl]]/[[Warc]] rule): EXPLICIT schemas only,
  * never inference. The supported Catalyst subset is
  * boolean/int/long/float/double/string/binary plus arrays of those,
  * each nullable as a `["null", T]` union; anything else fails fast at
  * schema conversion with the offending field named.
  */
object Avro {

  /** Conf key [[AvroKeyInputFormat]] reads the reader schema from
    * (public avro-mapred contract, `AvroJob.setInputKeySchema`).
    */
  private val InputKeySchemaConf = "avro.schema.input.key"

  /** Hadoop `Configuration` shipped to write tasks (it is a `Writable`,
    * not `Serializable`; Spark's own wrapper is `private[spark]`).
    */
  private class SerHadoopConf(@transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      conf.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  // ---------------------------------------------------------------- schema

  /** Catalyst → Avro schema. Fields become `["null", T]` unions when
    * nullable (Avro's only null encoding); records are named `name` so a
    * pruned READER record resolves against the written one (Avro schema
    * resolution matches record by name, fields by name).
    */
  def avroSchemaOf(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = leafSchemaOf(f)
      val sch =
        if (f.nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  private def leafSchemaOf(f: StructField): Schema = f.dataType match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, containsNull) =>
      val elem = leafSchemaOf(StructField(f.name + ".element", et))
      val elemSch =
        if (containsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), elem))
        else elem
      Schema.createArray(elemSch)
    case other =>
      throw new IllegalArgumentException(
        s"Avro source supports boolean/int/long/float/double/string/binary" +
          s" and arrays of those; field '${f.name}' has unsupported type $other")
  }

  // ----------------------------------------------------------------- write

  /** Write `df` as a directory of Avro container files, one per input
    * partition (`part-NNNNN.avro`, deflate), plus `_SUCCESS`. Each task
    * writes to a `.build-<attempt>` temp name and renames into place, so
    * a retried task never exposes a torn file; the rename loser deletes
    * its temp (first-committer-wins, same content either way — the
    * writer is deterministic per partition).
    *
    * `syncInterval` bounds the Avro block size — it is the SPLIT
    * granularity floor on read and the per-block decode buffer on both
    * sides. The 64 KiB default keeps thousands of splits per gigabyte.
    */
  def write(df: DataFrame, dir: String, recordName: String = "row",
      syncInterval: Int = 64 * 1024, deflateLevel: Int = 6): Unit = {
    val st = df.schema
    val avroJson = avroSchemaOf(st, recordName).toString // Schema is not serializable-stable; ship JSON
    val spark = df.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new SerHadoopConf(spark.sessionState.newHadoopConf()))
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val dirStr = fs.makeQualified(out).toString

    df.rdd.foreachPartition { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val conf = confBc.value.conf
      val part = org.apache.spark.TaskContext.getPartitionId()
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val fsx = new Path(dirStr).getFileSystem(conf)
      val finalPath = new Path(dirStr, f"part-$part%05d.avro")
      val tmpPath = new Path(dirStr, f".part-$part%05d.avro.build-$attempt")
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(CodecFactory.deflateCodec(deflateLevel))
      writer.setSyncInterval(syncInterval)
      val stream = fsx.create(tmpPath, true)
      try {
        writer.create(schema, stream) // closes `stream` on writer.close()
        val converters = st.fields.zipWithIndex.map { case (f, i) =>
          val conv = toAvroConverter(f.dataType, schema.getFields.get(i).schema())
          (i, conv)
        }
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          converters.foreach { case (i, conv) =>
            rec.put(i, if (row.isNullAt(i)) null else conv(row.get(i)))
          }
          writer.append(rec)
        }
      } finally writer.close()
      if (!fsx.rename(tmpPath, finalPath)) {
        // a sibling attempt already committed identical content
        fsx.delete(tmpPath, false)
        require(fsx.exists(finalPath),
          s"avro write: rename of $tmpPath failed and $finalPath is absent")
      }
    }
    fs.create(new Path(out, "_SUCCESS"), true).close()
  }

  /** Catalyst external value → Avro datum (nulls handled by caller). */
  private def toAvroConverter(dt: DataType, fieldSchema: Schema): Any => Any = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType | StringType =>
      identity
    case BinaryType => (v: Any) => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val elemSchema = unwrapNull(fieldSchema).getElementType
      val elemConv = toAvroConverter(et, elemSchema)
      (v: Any) => {
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val list = new java.util.ArrayList[Any](seq.length)
        seq.foreach(e => list.add(if (e == null) null else elemConv(e)))
        list
      }
    case other => throw new IllegalArgumentException(s"unsupported avro write type $other")
  }

  private def unwrapNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  // ------------------------------------------------------------------ read

  /** Read a directory written by [[write]] back as a DataFrame.
    *
    * `schema` is the EXPLICIT full table schema (never inferred);
    * `columns`, when non-empty, selects + orders the output columns and
    * becomes the pruned Avro READER schema, so the decoder skips the
    * other fields entirely (see class doc). Splits come from
    * `FileInputFormat` (sync-marker aligned), so one large file reads in
    * parallel; `_`-prefixed side files are ignored by the input format's
    * hidden-file filter.
    */
  def read(spark: SparkSession, dir: String, schema: StructType,
      columns: Seq[String] = Nil, recordName: String = "row"): DataFrame = {
    val projected =
      if (columns.isEmpty) schema
      else StructType(columns.map(c => schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"avro read: column '$c' not in schema"))))
    val readerJson = avroSchemaOf(projected, recordName).toString
    val conf = new org.apache.hadoop.conf.Configuration(spark.sessionState.newHadoopConf())
    conf.set(InputKeySchemaConf, readerJson)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      dir,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf)
    val fieldNames = projected.fields.map(_.name)
    val fieldTypes = projected.fields.map(_.dataType)
    val rows = rdd.mapPartitions { it =>
      // converters rebuilt per partition (DataType is serializable; the
      // closures are not worth shipping). The record reader REUSES its
      // datum, so every value is materialized into the Row immediately.
      val convs = fieldTypes.map(fromAvroConverter)
      it.map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](fieldNames.length)
        var i = 0
        while (i < fieldNames.length) {
          val v = rec.get(fieldNames(i))
          vals(i) = if (v == null) null else convs(i)(v)
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, projected)
  }

  /** Avro datum → Catalyst external value. */
  private def fromAvroConverter(dt: DataType): Any => Any = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType => identity
    case StringType => {
      case u: Utf8 => u.toString
      case s => s.toString
    }
    case BinaryType => (v: Any) => {
      val bb = v.asInstanceOf[ByteBuffer].duplicate()
      val arr = new Array[Byte](bb.remaining())
      bb.get(arr)
      arr
    }
    case ArrayType(et, _) =>
      val elemConv = fromAvroConverter(et)
      (v: Any) =>
        v.asInstanceOf[java.util.List[Any]].asScala
          .map(e => if (e == null) null else elemConv(e)).toSeq
    case other => throw new IllegalArgumentException(s"unsupported avro read type $other")
  }
}
