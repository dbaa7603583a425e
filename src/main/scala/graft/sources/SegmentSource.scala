package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for "segment" corpora: a directory of
  * TSV-encoded immutable segment files plus a `_stats.tsv` sidecar
  * holding each file's doc_id min/max — the minimal shape of every
  * stats-pruned table format (Delta add-file stats, Iceberg manifests).
  * The connector implements the full V2 read stack the built-in formats
  * use, through PUBLIC interfaces only:
  *
  *  - `SupportsPushDownFilters`: doc_id range/equality predicates are
  *    consulted at PLANNING time to prune whole files against the
  *    sidecar stats — a skipped file is never opened, the 100 TB lever.
  *    Pruning is advisory (pushed filters are also returned as
  *    post-scan filters), so correctness never depends on stats;
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    requested columns (a text-free projection never decodes text);
  *  - one `InputPartition` per surviving file — split granularity and
  *    locality mirror file-based sources.
  *
  * Segment files are written by [[SegmentSource.write]]; schema is the
  * fixed (doc_id BIGINT, text STRING) corpus projection. TSV keeps the
  * reader dependency-free; the format contract (immutable segments +
  * stats sidecar + pruned planning) is the load-bearing part, not the
  * encoding.
  */
class SegmentSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-segments"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SegmentSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SegmentTable(properties.get("path"))
}

class SegmentTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-segments:$path"
  override def schema(): StructType = SegmentSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SegmentScanBuilder(path)
}

class SegmentScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SegmentSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep the doc_id bounds for file pruning; hand EVERY filter back to
    // Spark for post-scan evaluation (advisory pruning — stats can only
    // skip files, never substitute for row filtering)
    pushed = filters.filter(SegmentSource.bound(_).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SegmentScan(path, pushed, required)
}

class SegmentScan(path: String, pushed: Array[Filter], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-segments path=$path pushed=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val stats = SegmentSource.readStats(Paths.get(path))
    val bounds = pushed.flatMap(SegmentSource.bound)
    val survivors = stats.filter { case (_, lo, hi) =>
      bounds.forall { case (blo, bhi) => hi >= blo && lo <= bhi }
    }
    SegmentSource.lastPlanned.set((stats.length, survivors.length))
    survivors.map { case (f, _, _) =>
      SegmentPartition(Paths.get(path).resolve(f).toString)
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SegmentReaderFactory(required)
}

case class SegmentPartition(file: String) extends InputPartition

class SegmentReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SegmentReader(p.asInstanceOf[SegmentPartition].file, required)
}

class SegmentReader(file: String, required: StructType)
  extends PartitionReader[InternalRow] {
  private val lines = Files.newBufferedReader(
    Paths.get(file), StandardCharsets.UTF_8)
  private var current: InternalRow = _
  private val wantId = required.fieldNames.contains("doc_id")
  private val wantText = required.fieldNames.contains("text")

  override def next(): Boolean = {
    val line = lines.readLine()
    if (line == null) { current = null; false }
    else {
      val tab = line.indexOf('\t')
      val vals = required.fields.map { f =>
        if (f.name == "doc_id") java.lang.Long.parseLong(line.substring(0, tab))
        else UTF8String.fromString(
          SegmentSource.unescape(line.substring(tab + 1)))
      }
      current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

object SegmentSource {

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** (total files, surviving files) of the most recent planning pass —
    * lets specs pin that stats pruning actually skipped files.
    */
  val lastPlanned = new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))

  private[sources] def bound(f: Filter): Option[(Long, Long)] = f match {
    case EqualTo("doc_id", v: Long) => Some((v, v))
    case GreaterThan("doc_id", v: Long) => Some((v + 1, Long.MaxValue))
    case GreaterThanOrEqual("doc_id", v: Long) => Some((v, Long.MaxValue))
    case LessThan("doc_id", v: Long) => Some((Long.MinValue, v - 1))
    case LessThanOrEqual("doc_id", v: Long) => Some((Long.MinValue, v))
    case _ => None
  }

  private[sources] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
  private[sources] def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[sources] def readStats(dir: Path): Array[(String, Long, Long)] =
    Files.readAllLines(dir.resolve("_stats.tsv"), StandardCharsets.UTF_8)
      .asScala.filter(_.nonEmpty).map { l =>
        val p = l.split('\t')
        (p(0), p(1).toLong, p(2).toLong)
      }.toArray

  /** Write a (doc_id, text) frame as `nFiles` doc_id-range segment files
    * plus the `_stats.tsv` sidecar. Range clustering is what makes the
    * stats selective — the same reason lakehouse OPTIMIZE orders by the
    * skip key before splitting files.
    */
  def write(df: org.apache.spark.sql.DataFrame, dir: Path, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    Files.createDirectories(dir)
    val rows = df.select(col("doc_id").cast("long"), col("text"))
      .collect().sortBy(_.getLong(0))
    val per = math.max(1, (rows.length + nFiles - 1) / nFiles)
    val stats = new StringBuilder
    rows.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val name = f"segment-$i%04d.tsv"
      val body = chunk.map(r =>
        s"${r.getLong(0)}\t${escape(Option(r.getString(1)).getOrElse(""))}")
        .mkString("", "\n", "\n")
      Files.write(dir.resolve(name), body.getBytes(StandardCharsets.UTF_8))
      stats.append(s"$name\t${chunk.head.getLong(0)}\t${chunk.last.getLong(0)}\n")
    }
    Files.write(dir.resolve("_stats.tsv"),
      stats.toString.getBytes(StandardCharsets.UTF_8))
  }
}
