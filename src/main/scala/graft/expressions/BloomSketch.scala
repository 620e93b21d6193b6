package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** PORTABLE Bloom filter — the constant-memory membership pre-pass for
  * contamination/dedup at 100 TB (t9's scaladoc names it; this makes it
  * real). Spark's builtin bloom_filter_agg hashes with xxhash (engine-
  * private, so no oracle could ever confirm a hit); this one takes
  * PRE-HASHED md5-62 lanes and derives its k probe positions with plain
  * integer arithmetic:
  *
  *   h1 = h & (2^31-1),  h2 = (h >> 31) | 1  (odd step),
  *   pos_i = (h1 + i*h2) mod m              (Kirsch-Mitzenmacher)
  *
  * — every intermediate fits a BIGINT, so a DuckDB oracle reproduces the
  * exact bit positions and therefore the exact hit/miss verdicts,
  * collisions included (t14's oracle replays membership as a semi-join
  * against the train-side position set, which is bitwise the same
  * question).
  *
  * Scale shape: the state is m/8 bytes (512 KiB at the default 2^22 bits)
  * regardless of input size; partials merge by OR, so map-side combine
  * ships one filter per partition, not rows. One-sided error: a MISS is
  * definitive (no false negatives), which is what makes it a sound
  * pre-pass — only hits need the exact join.
  */
case class BloomSketch(
    child: Expression,
    mBits: Int,
    kProbes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(mBits > 0 && mBits % 8 == 0, s"mBits must be a positive multiple of 8")
  require(kProbes >= 1 && kProbes <= 16)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_build expects a bigint (md5-62 lane), got $other")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.set(buf, v.asInstanceOf[Long], mBits, kProbes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  // both directions copy: the framework may keep serialized bytes around
  // while the live buffer keeps mutating (and vice versa)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

object BloomSketch {
  /** Default sizing: 2^22 bits / 4 probes ≈ 0.02% false-positive rate at
    * 100k distinct keys, 512 KiB state.
    */
  val DefaultBits: Int = 1 << 22
  val DefaultProbes: Int = 4

  private[expressions] def positions(h: Long, mBits: Int, kProbes: Int): Array[Int] = {
    // In-contract inputs are md5-62 lanes (non-negative 62-bit), for which
    // this mask is a no-op — oracle parity preserved. Out-of-contract
    // negative longs (e.g. raw xxhash64 fed via the SQL-registered
    // functions) would otherwise shift to a negative h2 and produce
    // negative probe positions → AIOOBE in set()/hit().
    val h62 = h & PortableHash.Mask62
    val h1 = h62 & 0x7FFFFFFFL
    val h2 = (h62 >> 31) | 1L
    val out = new Array[Int](kProbes)
    var i = 0
    while (i < kProbes) {
      out(i) = ((h1 + i * h2) % mBits).toInt
      i += 1
    }
    out
  }

  private[expressions] def set(buf: Array[Byte], h: Long, mBits: Int, kProbes: Int): Unit = {
    val ps = positions(h, mBits, kProbes)
    var i = 0
    while (i < kProbes) {
      val p = ps(i)
      buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  private[expressions] def hit(buf: Array[Byte], h: Long, mBits: Int, kProbes: Int): Boolean = {
    val ps = positions(h, mBits, kProbes)
    var i = 0
    while (i < kProbes) {
      val p = ps(i)
      if (((buf(p >> 3) >> (p & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def bloomBuild(hash: Column, mBits: Int = DefaultBits, kProbes: Int = DefaultProbes): Column =
    ColumnBridge.column(
      BloomSketch(ColumnBridge.expression(hash), mBits, kProbes).toAggregateExpression())

  def bloomHit(bloom: Column, hash: Column, mBits: Int = DefaultBits,
      kProbes: Int = DefaultProbes): Column =
    ColumnBridge.column(BloomHit(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash), mBits, kProbes))
}

/** Membership probe against a built filter. The filter column is typically
  * a one-row aggregate result broadcast to every probe row; the per-row
  * work is k bit reads.
  */
case class BloomHit(left: Expression, right: Expression, mBits: Int, kProbes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (binary, bigint), got $other")
    }

  override def nullSafeEval(bloom: Any, h: Any): Any =
    java.lang.Boolean.valueOf(BloomSketch.hit(
      bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], mBits, kProbes))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomHit", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = (Boolean) $ref.nullSafeEval($b, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression = copy(newLeft, newRight)
}
