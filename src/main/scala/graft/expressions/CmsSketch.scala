package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** PORTABLE Count-Min sketch — approximate per-item frequencies in
  * constant memory, the third sketch aggregate after [[BloomSketch]]
  * (membership) and [[KmvSketch]] (distinct count). Takes PRE-HASHED
  * md5-62 lanes and derives its d row positions with the same
  * Kirsch-Mitzenmacher arithmetic the Bloom filter uses:
  *
  *   h1 = h & (2^31-1),  h2 = (h >> 31) | 1  (odd step),
  *   pos_i = (h1 + i*h2) mod w               for depth rows i = 0..d-1
  *
  * — every intermediate fits a BIGINT, so a DuckDB oracle rebuilds the
  * exact counter matrix with one GROUP BY (depth, pos) and reproduces
  * every estimate, collisions included (t18's oracle does).
  *
  * Scale shape: state is d*w longs (256 KiB at the default 4x8192)
  * regardless of input size; partials merge by elementwise ADD, so
  * map-side combine folds each partition's token stream into one matrix
  * and the shuffle carries d*w longs per partition, not rows. One-sided
  * error: estimate >= true count always (no deletions), over-counting
  * only from hash collisions — E[over] <= 2N/w per row, min over d rows.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 1 && width <= CmsSketch.MaxWidth,
    s"width must be in [1,${CmsSketch.MaxWidth}], got $width")
  // Keeps depth*width, buf.length*8 and every byte offset inside Int range
  // (the encode buffer and estimate() offsets are Int-addressed).
  require(depth.toLong * width <= CmsSketch.MaxCells,
    s"depth*width must be <= ${CmsSketch.MaxCells} cells, got ${depth.toLong * width}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_build"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_build expects a bigint (md5-62 lane), got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h62 = v.asInstanceOf[Long] & PortableHash.Mask62
      val h1 = h62 & 0x7FFFFFFFL
      val h2 = (h62 >> 31) | 1L
      var i = 0
      while (i < depth) {
        buf(i * width + ((h1 + i * h2) % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsSketch.encode(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsSketch.encode(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsSketch.decode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {
  /** Default sizing: 4 rows x 8192 counters = 256 KiB state; expected
    * over-count ~ 2N/8192 per row before the min across rows.
    */
  val DefaultDepth: Int = 4
  val DefaultWidth: Int = 8192

  /** Geometry bounds: width alone and total cells are capped so that
    * depth*width*8 (encoded bytes, estimate() offsets) stays well inside
    * Int range — a 2^27-cell sketch is already 1 GiB of aggregate state.
    */
  val MaxWidth: Int = 1 << 26
  val MaxCells: Long = 1L << 27

  private[expressions] def encode(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  private[expressions] def decode(bytes: Array[Byte]): Array[Long] = {
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }

  /** min over depth rows of the counter at this hash's position — reads d
    * longs straight out of the encoded bytes, no array materialization.
    */
  private[expressions] def estimate(
      bytes: Array[Byte], h: Long, depth: Int, width: Int): Long = {
    require(bytes.length == depth * width * 8,
      s"CMS geometry mismatch: sketch is ${bytes.length} bytes but probe expects " +
        s"depth=$depth x width=$width (${depth * width * 8} bytes) — build and " +
        "estimate must use the same (depth, width)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val h62 = h & PortableHash.Mask62
    val h1 = h62 & 0x7FFFFFFFL
    val h2 = (h62 >> 31) | 1L
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = bb.getLong((i * width + ((h1 + i * h2) % width).toInt) * 8)
      if (c < best) best = c
      i += 1
    }
    best
  }

  def cmsBuild(hash: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(hash), depth, width).toAggregateExpression())

  def cmsEstimate(cms: Column, hash: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(cms), ColumnBridge.expression(hash), depth, width))
}

/** Frequency estimate against a built sketch. The sketch column is
  * typically a one-row aggregate broadcast to every probe row; per-row
  * work is d long reads.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected (binary, bigint), got $other")
    }

  override def nullSafeEval(cms: Any, h: Any): Any =
    java.lang.Long.valueOf(CmsSketch.estimate(
      cms.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], depth, width))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (c, h) =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression = copy(newLeft, newRight)
}
