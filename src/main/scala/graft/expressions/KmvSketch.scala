package graft.expressions

import java.nio.ByteBuffer
import java.util.{Comparator, TreeSet => JTreeSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch — a custom typed imperative
  * AGGREGATE (the third extension kind after scalar expressions and the
  * whole-plan as-of join): keep the k smallest PORTABLE md5-62 hashes of
  * the input's canonical string form; estimate
  * |distinct| = (k-1) * 2^62 / kth-smallest-hash.
  *
  * Properties that matter at 100 TB:
  *  - constant state (k longs) per group, vs linear for exact distinct;
  *  - buffers MERGE by set-union + trim, so Spark's partial aggregation
  *    applies — map-side partials shuffle k values per group, not rows;
  *  - the estimate is a pure function of the value SET: identical across
  *    partitionings, retries, and cluster sizes (asserted in tests);
  *  - standard error ~ 1/sqrt(k-2) (~3% at k=1024).
  *
  * The hash is PortableHash.md5Lower62 of the value's canonical string
  * (md5_number_lower(CAST(x AS VARCHAR)) & mask in DuckDB terms), uniform
  * on the [0, 2^62) ring and non-negative, so natural signed ordering IS
  * the ring ordering and a SQL oracle can re-derive the exact estimate
  * from the 1024th-smallest distinct hash (q30's oracle does). Intended
  * for integral/string inputs — float-to-string rendering differs across
  * engines.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  private def cmp: Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compare(a, b)

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long](cmp)

  private def add(buf: JTreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size() < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) buf.remove(buf.last())
    }
  }

  override def update(
      buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, PortableHash.md5Lower62Any(v))
    buf
  }

  override def merge(
      buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    if (buf.size() < k) buf.size().toDouble
    else {
      // kth-smallest hash as a fraction of the [0, 2^62) ring. kth == 0 is
      // unreachable for k >= 2 (the buffer holds k DISTINCT non-negative
      // hashes, so the largest of them is >= k-1 > 0), but guard anyway so
      // an out-of-contract k=1 sketch hitting the literal 0 hash yields a
      // finite estimate instead of Infinity; the guard never fires for the
      // shipped k=1024, so DuckDB oracle parity is untouched.
      val kth = math.max(buf.last().longValue(), 1L)
      (k - 1).toDouble * PortableHash.Ring62 / kth.toDouble
    }
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** The same KMV buffer evaluated to its VALUES — the ascending array of the
  * k smallest distinct hashes — instead of a point estimate. Sketch arrays
  * are post-hoc combinable with plain array built-ins (union = k smallest
  * of the concatenation, intersection membership via array_contains), which
  * is what makes KMV the sketch for SET-OPERATION estimates: q47 merges two
  * per-slice sketches into |A∪B| and |A∩B| without rescanning either side.
  */
case class KmvValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 16, s"k must be >= 16 for a usable sketch, got $k")

  private val inner = KmvSketch(child, k)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_values"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(
      buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] =
    inner.update(buf, input)
  override def merge(
      buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] =
    inner.merge(buf, other)

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size())
    val it = buf.iterator() // TreeSet iterates ascending — already sorted
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvValues =
    copy(child = newChild)
}

object KmvSketch {
  def kmvDistinct(c: Column, k: Int = 1024): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(c), k).toAggregateExpression())

  def kmvValues(c: Column, k: Int = 1024): Column =
    ColumnBridge.column(
      KmvValues(ColumnBridge.expression(c), k).toAggregateExpression())
}
