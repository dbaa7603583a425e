package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, InterpretedOrdering, SortDirection, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.NullOrdering
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Generic bounded top-k ROWS aggregate — the whole-row sibling of
  * [[TopKAgg]] (which is fixed to (double, long) ANN candidates): keeps
  * the k first rows per group under an arbitrary multi-column sort order,
  * emitting them as a sorted `array<struct<row cols>>`.
  *
  * This is the execution target of [[graft.plans.TopKRewrite]]: a
  * `row_number() ≤ k` window filter sorts EVERY row of every group (the
  * built-in `WindowGroupLimit` optimization bounds what survives each
  * map partition but still locally sorts the full input stream first),
  * while this aggregate runs as ObjectHashAggregate with map-side
  * partial aggregation — each input row costs one bounded-buffer insert
  * (O(1) reject against the current k-th row in the common case), each
  * partition contributes at most k rows per group to the shuffle, and no
  * sort of the input ever happens. Past the 500k-group per-task bound the
  * standard sort-based fallback applies (buffers serialize/merge), so
  * per-task memory stays bounded at any group cardinality.
  *
  * Determinism matches the window form's: ties in the sort order keep an
  * arbitrary row either way — rewritten queries tie-break explicitly,
  * exactly as they must for their SQL oracles.
  *
  * `k` is bounded by the REWRITE (not here) to [[graft.plans.TopKRewrite.MaxK]]
  * — per-group state is k rows, and a window top-million is better served
  * by the sort it was going to do anyway.
  */
case class TopKRowsAgg(
    orderExprs: Seq[Expression],
    directions: Seq[SortDirection],
    nullOrderings: Seq[NullOrdering],
    rowExprs: Seq[Expression],
    rowNames: Seq[String],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsAgg.Buffer] {

  require(k > 0, "k must be positive")
  require(orderExprs.nonEmpty, "top-k needs a sort order")
  require(directions.length == orderExprs.length &&
    nullOrderings.length == orderExprs.length,
    "one direction and null-ordering per order expression")
  require(rowNames.length == rowExprs.length,
    "one output name per row expression")

  override def children: Seq[Expression] = orderExprs ++ rowExprs
  override def prettyName: String = "graft_topk_rows"
  override def nullable: Boolean = false

  private def rowStruct: StructType = StructType(
    rowNames.zip(rowExprs).map { case (n, e) =>
      StructField(n, e.dataType, e.nullable)
    })

  override def dataType: DataType =
    ArrayType(rowStruct, containsNull = false)

  // Bound-children projections and the sort-order comparator: built
  // lazily on the executor after binding (children are BoundReferences
  // by the time update runs), rebuilt per task — never serialized.
  @transient private lazy val ordProj = UnsafeProjection.create(orderExprs)
  @transient private lazy val rowProj = UnsafeProjection.create(rowExprs)
  @transient private lazy val ordering = new InterpretedOrdering(
    orderExprs.zipWithIndex.map { case (e, i) =>
      SortOrder(BoundReference(i, e.dataType, nullable = true),
        directions(i), nullOrderings(i), Seq.empty)
    })

  override def createAggregationBuffer(): TopKRowsAgg.Buffer =
    new TopKRowsAgg.Buffer

  /** Bounded sorted insert: the buffer stays ascending in the sort order
    * (position == row_number − 1). Common-case reject is one comparison
    * against the current k-th row; accepted rows binary-search their slot.
    */
  private def insert(buf: TopKRowsAgg.Buffer, key: InternalRow,
                     row: => InternalRow): Unit = {
    val keys = buf.keys
    val n = keys.length
    if (n == k && ordering.compare(key, keys(n - 1)) >= 0) return
    // binary search for the first position whose key sorts AFTER `key`
    // (ties insert after equal keys — stable w.r.t. arrival, arbitrary
    // across merges, same contract as row_number under ties)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(keys(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    keys.insert(lo, key.copy())
    buf.rows.insert(lo, row.copy())
    if (keys.length > k) {
      keys.remove(k)
      buf.rows.remove(k)
    }
  }

  override def update(buf: TopKRowsAgg.Buffer, input: InternalRow): TopKRowsAgg.Buffer = {
    // row_number ranks EVERY row — null sort keys order by the null
    // ordering, they are not dropped (unlike the ANN TopKAgg, which
    // skips null scores by contract)
    insert(buf, ordProj(input), rowProj(input))
    buf
  }

  override def merge(buf: TopKRowsAgg.Buffer, other: TopKRowsAgg.Buffer): TopKRowsAgg.Buffer = {
    var i = 0
    while (i < other.keys.length) {
      insert(buf, other.keys(i), other.rows(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKRowsAgg.Buffer): Any =
    new GenericArrayData(buf.rows.toArray[Any])

  // Buffers hold UnsafeRows (update copies projection outputs, merge
  // copies via insert), so serialization is length-prefixed raw bytes.
  override def serialize(buf: TopKRowsAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.keys.length)
    var i = 0
    while (i < buf.keys.length) {
      val kb = buf.keys(i).asInstanceOf[UnsafeRow].getBytes
      val rb = buf.rows(i).asInstanceOf[UnsafeRow].getBytes
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(rb.length); out.write(rb)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKRowsAgg.Buffer
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt); bb.get(kb)
      val key = new UnsafeRow(orderExprs.length); key.pointTo(kb, kb.length)
      val rb = new Array[Byte](bb.getInt); bb.get(rb)
      val row = new UnsafeRow(rowExprs.length); row.pointTo(rb, rb.length)
      // deserialized buffers arrive SORTED (serialize preserves order);
      // append keeps that order without re-comparing
      buf.keys += key
      buf.rows += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(orderExprs = newChildren.take(orderExprs.length),
      rowExprs = newChildren.drop(orderExprs.length))
}

object TopKRowsAgg {
  /** Parallel (sort-key, row) arrays, ascending in the sort order. */
  final class Buffer {
    val keys = new ArrayBuffer[InternalRow]
    val rows = new ArrayBuffer[InternalRow]
  }
}
