package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** EXACT distinct counting over a bounded-dense integer domain via a
  * mergeable bitmap — the "bitmap index" answer to COUNT(DISTINCT), the
  * fourth typed-imperative aggregate alongside KMV / CMS / Bloom.
  *
  * Spark plans COUNT(DISTINCT key) BY group as a two-phase Expand +
  * re-shuffle of every (group, key) PAIR — at 100 TB that second exchange
  * carries one row per distinct pair and is usually the most expensive
  * stage of a daily-actives rollup. This aggregate instead keeps one bit
  * per possible id in the aggregation buffer, so:
  *
  *  - partial aggregation applies: map-side partials absorb every row
  *    touch-locally and the shuffle moves ONE bitmap per (group,
  *    partition), never per-row pairs;
  *  - merge is wordwise OR — associative/commutative, so the result is a
  *    pure function of the value SET: identical across partitionings,
  *    retries, speculative re-runs, and cluster sizes;
  *  - eval is a popcount sum: exact, not an estimate.
  *
  * State discipline: the word array GROWS LAZILY to cover the highest bit
  * actually seen (a group touching ids < 4096 holds 512 bytes, whatever
  * `capacity` says), and `capacity` is the hard ceiling — an id outside
  * [0, capacity) fails loudly rather than silently wrapping, because the
  * contract is EXACTNESS. Intended for dictionary-encoded / surrogate-key
  * domains (user dims, doc ids after a dense-rank pass); for unbounded or
  * sparse domains use [[KmvSketch]] (estimate) or the exact two-phase
  * shape (q53's salted template). At the shipped 2^22 ceiling a fully
  * dense group costs 512 KiB — sized so groups-per-executor × capacity
  * stays inside a 4 GiB executor even at 1000-way parallelism.
  *
  * Oracle story: the result equals COUNT(DISTINCT x) bit-for-bit (it is
  * exact), so the DuckDB twin is plain SQL — no sketch replay needed.
  */
case class BitmapDistinct(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(capacity >= 64 && capacity <= (1 << 22),
    s"capacity must be in [64, 2^22], got $capacity (bitmap state is " +
      "capacity/8 bytes per group; dictionary-encode wider domains first)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1)

  private def maxWords: Int = (capacity + 63) >>> 6

  /** Grow to at least `words` words (doubling, capped at the ceiling). */
  private def ensure(buf: Array[Long], words: Int): Array[Long] = {
    if (buf.length >= words) buf
    else {
      var n = buf.length
      while (n < words) n = math.min(maxWords, n << 1)
      java.util.Arrays.copyOf(buf, n)
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= capacity) {
        throw new IllegalArgumentException(
          s"graft_bitmap_distinct: id $id outside [0, $capacity); " +
            "raise capacity or dictionary-encode the domain")
      }
      val w = (id >>> 6).toInt
      val b = ensure(buf, w + 1)
      b(w) |= 1L << (id & 63)
      b
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val b = ensure(buf, other.length)
    var i = 0
    while (i < other.length) { b(i) |= other(i); i += 1 }
    b
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    // Trim trailing zero words so a sparse group ships its occupied prefix
    // only (the shuffle payload tracks actual id range, not capacity).
    var top = buf.length
    while (top > 1 && buf(top - 1) == 0L) top -= 1
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * top)
    bb.putInt(top)
    var i = 0
    while (i < top) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

/** The same bitmap buffer evaluated to its WORDS (array of longs) instead
  * of a popcount — the set-algebra form (q47's KmvValues move). Per-group
  * bitmaps combine post-hoc with plain array built-ins: intersection =
  * zip_with(a, b, bitand), union = zip_with(..., bitor), cardinality =
  * Σ bit_count — so cohort/retention matrices come from ONE scan that
  * builds one bitmap per period, then pure in-plan arithmetic over the
  * tiny per-period rows, never a second pass over the fact table.
  */
case class BitmapWords(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  private val inner = BitmapDistinct(child, capacity)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_words"

  override def createAggregationBuffer(): Array[Long] =
    inner.createAggregationBuffer()
  override def update(buf: Array[Long], input: InternalRow): Array[Long] =
    inner.update(buf, input)
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    inner.merge(buf, other)

  /** Fixed-width output (capacity/64 words) so any two groups' arrays are
    * zip_with-compatible regardless of their occupied prefixes.
    */
  override def eval(buf: Array[Long]): Any = {
    val full = new Array[Long]((capacity + 63) >>> 6)
    System.arraycopy(buf, 0, full, 0, buf.length)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(full)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapWords =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapWords =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapWords =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Exact distinct count of a non-negative BIGINT column with ids below
    * `capacity`. One bit of group state per possible id; merge is wordwise
    * OR, so map-side partials absorb rows locally and the shuffle carries
    * bitmaps, not (group, id) pairs.
    */
  def bitmapDistinct(c: Column, capacity: Int = 1 << 22): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(c.cast("long")), capacity)
        .toAggregateExpression())

  /** The group's bitmap as a fixed-width long array (set-algebra form —
    * combine groups with zip_with bitand/bitor + bit_count). Size
    * `capacity` to the id domain: the output array is capacity/64 longs
    * per group REGARDLESS of sparsity, so keep it to real dictionary
    * widths (2^16 ≈ 8 KiB/group).
    */
  def bitmapWords(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      BitmapWords(ColumnBridge.expression(c.cast("long")), capacity)
        .toAggregateExpression())
}
