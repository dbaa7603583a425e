package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate: a Count-Min sketch (Cormode & Muthukrishnan,
  * J. Algorithms 2005) over a group of 64-bit element tokens in ONE
  * aggregate — the streaming-friendly frequency summary for heavy-hitter
  * queries at 100 TB, where an exact per-term groupBy would shuffle the
  * full term stream but a sketch is a constant `depth×width` longs per
  * partition.
  *
  * The buffer is the flattened d×w counter table. `update` increments one
  * counter per row (splitmix64-mixed bucket per row of the table);
  * `merge` is elementwise + — so map-side partial aggregation reduces the
  * shuffle to one sketch per partition regardless of cardinality. Point
  * estimates (`CountMinAgg.estimate`) take the min over the d counters
  * and carry the classic guarantee: never an underestimate, overestimate
  * > εN with probability ≤ (1/2)^depth for ε ≈ e/width.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require((width & (width - 1)) == 0, "width must be a power of two")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a bigint token, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinAgg.bucket(token, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {

  /** Default geometry: 4 rows × 1024 buckets = 32 KiB per sketch;
    * ε ≈ e/1024 ≈ 0.27% of the stream length at failure probability
    * (1/2)^4 per query.
    */
  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Row-r bucket of a token: splitmix64 finalizer over the seed-xored
    * token — d independent-enough hash rows from one 64-bit input.
    */
  def bucket(token: Long, row: Int, width: Int): Int = {
    var z = token ^ (0x9E3779B97F4A7C15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & (width - 1)).toInt
  }

  /** Point estimate: min over the d row counters — never an
    * underestimate of the token's true frequency.
    */
  def estimate(sketch: Array[Long], token: Long,
               depth: Int = DefaultDepth, width: Int = DefaultWidth): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(token, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Register `graft_cms(token)` with the default 4×1024 geometry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms", exprs => CountMinAgg(exprs.head, DefaultDepth, DefaultWidth),
      "built-in")
}
