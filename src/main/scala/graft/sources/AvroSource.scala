package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source (engine growth beyond the reference's
  * CSV/parquet surface — `timedf/timedf/backend.py` loads only CSV and
  * parquet). Spark 4's bundled `spark-avro` module is not on this
  * classpath, so this reads through the public avro-mapred
  * `AvroKeyInputFormat` — the same container format, block-splittable via
  * avro sync markers, so a 100 TB directory of .avro files fans out into
  * HDFS-block-sized input splits exactly like the built-in source.
  *
  * The writer schema is read driver-side from ONE file footer (schemas are
  * per-container-file in avro; a directory written by one job shares it);
  * records decode against that schema on executors and convert to rows
  * immediately inside the iterator (the record reader reuses its datum
  * object — values must be copied out before `next()`).
  *
  * Type coverage: the avro primitives (boolean/int/long/float/double/
  * string/bytes), nullable `["null", T]` unions, and arrays of those.
  * Anything else fails fast with the offending field named.
  */
object AvroSource {

  /** Spark type for an avro schema; nullable reflects `["null", T]`. */
  private def toSparkType(s: Schema, field: String): (DataType, Boolean) =
    s.getType match {
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case Schema.Type.ARRAY =>
        val (et, en) = toSparkType(s.getElementType, field)
        (ArrayType(et, en), false)
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
        if (branches.size != 1)
          throw new IllegalArgumentException(
            s"avro field '$field': only ['null', T] unions supported, got $s")
        (toSparkType(branches.head, field)._1, true)
      case other =>
        throw new IllegalArgumentException(
          s"avro field '$field': unsupported avro type $other")
    }

  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"top-level avro schema must be a record, got $avro")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSparkType(f.schema(), f.name())
      StructField(f.name(), dt, nullable)
    })
  }

  /** Copy one decoded avro value out of the (reused) record into the JVM
    * types Spark's Row encoder expects.
    */
  private def convert(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case l: java.util.List[_] => l.asScala.toSeq.map(convert)
    case other => other // boolean / int / long / float / double pass through
  }

  /** Read a .avro file or a directory of them as a DataFrame. */
  def read(s: SparkSession, path: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val firstFile =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
          .headOption.getOrElse(throw new IllegalArgumentException(
            s"no .avro files under $path"))
      else p
    val footer = new DataFileReader[GenericRecord](
      new FsInput(firstFile, conf), new GenericDatumReader[GenericRecord]())
    val avroSchema = try footer.getSchema finally footer.close()
    val schema = sparkSchema(avroSchema)
    val names = schema.fields.map(_.name)

    val rows = s.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(names.toIndexedSeq.map(n => convert(rec.get(n))))
      }
    s.createDataFrame(rows, schema)
  }
}
