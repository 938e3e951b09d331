/*
 * Bloom-filter pair for semi-join pre-filtering: `bloom_build(x, n, fpp)`
 * aggregates a key set into a compact bitset (mergeable via OR — partials
 * combine map-side), and `bloom_contains(bloom, x)` is a codegen scalar
 * predicate that rides the SCAN of the big side. The pattern: build the
 * filter over the small side (a few KB for 10^4 keys at 1%), collect or
 * scalar-subquery it into a literal, and filter the 10^12-row side
 * scan-locally BEFORE the shuffle/join — rows that cannot match never leave
 * the scan. Zero false negatives by construction (the exact join on the
 * survivors stays correct); false positives only cost the downstream join
 * a little slack. Hashing is deterministic double-hashing over XXH64 with
 * two fixed seeds — no RNG, byte-stable across runs and partitionings
 * (OR-merge is commutative/associative/idempotent, like the HLL registers).
 *
 * Layout of the binary: [numBits: long][k: int][bit words: long...].
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

object BloomKernel {
  /** Optimal sizing: m = -n·ln p / (ln 2)², k = (m/n)·ln 2 — standard. */
  def numBits(n: Long, fpp: Double): Long = {
    val m = math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.max(64L, (m + 63) / 64 * 64) // round up to whole words
  }

  def numHashes(n: Long, m: Long): Int =
    // capped at 64: beyond that more hashes cannot help (every word is
    // touched) and the serialized-header validity contract assumes k ≤ 64
    math.min(64, math.max(1, math.round(m.toDouble / n.toDouble * math.log(2)).toInt))

  @inline private def hashes(v: UTF8String): (Long, Long) = {
    val b = v.getBytes
    (XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L),
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0x9747b28cL))
  }

  def add(words: Array[Long], m: Long, k: Int, v: UTF8String): Unit = {
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Membership test straight off the serialized bytes — no deserialization
    * allocation on the per-row path (header: 8-byte m + 4-byte k). The
    * header is validated against the byte length: bloom_contains is a
    * user-facing SQL function, and Unsafe reads driven by an unchecked
    * header from arbitrary caller bytes would be an out-of-bounds read
    * (up to a JVM crash), not a clean error. */
  def contains(bloom: Array[Byte], v: UTF8String): Boolean = {
    require(bloom.length >= 20,
      s"bloom_contains: not a serialized bloom filter (${bloom.length} bytes < 20)")
    val m = Platform.getLong(bloom, Platform.BYTE_ARRAY_OFFSET)
    val k = Platform.getInt(bloom, Platform.BYTE_ARRAY_OFFSET + 8)
    require(m >= 64 && m % 64 == 0 && k >= 1 && k <= 64 &&
      bloom.length.toLong == 12L + (m >>> 6) * 8L,
      s"bloom_contains: corrupt bloom header (m=$m, k=$k, bytes=${bloom.length})")
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      val word = Platform.getLong(bloom, Platform.BYTE_ARRAY_OFFSET + 12 + (bit >>> 6) * 8)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], m: Long, k: Int): Array[Byte] = {
    val out = new Array[Byte](12 + words.length * 8)
    Platform.putLong(out, Platform.BYTE_ARRAY_OFFSET, m)
    Platform.putInt(out, Platform.BYTE_ARRAY_OFFSET + 8, k)
    var i = 0
    while (i < words.length) {
      Platform.putLong(out, Platform.BYTE_ARRAY_OFFSET + 12 + i * 8, words(i))
      i += 1
    }
    out
  }
}

/** Mutable build buffer. */
final class BloomBuffer(val m: Long, val k: Int) {
  val words: Array[Long] = new Array[Long]((m >>> 6).toInt)
  def mergeFrom(o: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
  }
}

/**
 * bloom_build(x, n, fpp) → binary: a Bloom filter of the value set, sized
 * for `n` expected distinct keys at false-positive rate `fpp`.
 */
@ExpressionDescription(usage = "bloom_build(x, n, fpp) - mergeable Bloom filter of the value set")
case class BloomBuildAgg(
    child: Expression, n: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[BloomBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(n >= 1, s"bloom_build: n must be >= 1, got $n")
  require(fpp > 0.0 && fpp < 0.5, s"bloom_build: fpp must be in (0, 0.5), got $fpp")

  private val m: Long = BloomKernel.numBits(n, fpp)
  private val k: Int = BloomKernel.numHashes(n, m)
  // the serialized form must fit a JVM byte array: Int-truncating the word
  // count or the 12 + words*8 byte length would turn an oversized n into
  // Unsafe OOB writes, not a clean error
  require(12L + (m >>> 6) * 8L <= Int.MaxValue.toLong,
    s"bloom_build: n=$n at fpp=$fpp needs $m bits (> 2 GB serialized) — " +
      "shard the build or relax fpp")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(m, k)

  override def update(b: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) BloomKernel.add(b.words, b.m, b.k, v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: BloomBuffer, o: BloomBuffer): BloomBuffer = { b.mergeFrom(o); b }

  override def eval(b: BloomBuffer): Any = BloomKernel.serialize(b.words, b.m, b.k)

  override def serialize(b: BloomBuffer): Array[Byte] =
    BloomKernel.serialize(b.words, b.m, b.k)

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val b = new BloomBuffer(m, k)
    var i = 0
    while (i < b.words.length) {
      b.words(i) = Platform.getLong(bytes, Platform.BYTE_ARRAY_OFFSET + 12 + i * 8)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = c(0))
  override def prettyName: String = "bloom_build"
}

object BloomBuildAgg {
  /** SQL builder: bloom_build(x, n, fpp) with literal sizing. */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length == 3, "bloom_build(x, n, fpp) takes 3 arguments")
    val n = es(1) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"bloom_build: n must be an integer literal, got $other")
    }
    val fpp = es(2) match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"bloom_build: fpp must be a numeric literal, got $other")
    }
    BloomBuildAgg(es.head, n, fpp).toAggregateExpression()
  }
}

/** bloom_contains(bloom, x) — codegen membership test off the raw bytes. */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def nullSafeEval(bloom: Any, v: Any): Any =
    BloomKernel.contains(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"org.apache.spark.sql.graft.BloomKernel.contains($b, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}
