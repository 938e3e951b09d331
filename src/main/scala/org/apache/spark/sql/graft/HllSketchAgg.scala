/*
 * HyperLogLog distinct-count sketch as a Catalyst aggregate — the bounded-
 * memory companion to the exact distinct aggregation (q30). The exact form
 * must shuffle every distinct key; at 100 TB a per-group distinct set (e.g.
 * distinct users per region) is itself the bottleneck. hll_count keeps
 * m = 2^p one-byte registers per partial aggregate and merges them with a
 * pointwise MAX — commutative, associative and idempotent, so unlike the
 * order-dependent MG/KLL summaries the HLL estimate is a PURE FUNCTION of
 * the input value set: any partitioning, any arrival order, any merge tree
 * yields the bit-identical register array (HllSketchSpec asserts exact
 * register equality across adversarial partitionings, plus the classic
 * ~1.04/√m relative-error bound against true cardinalities).
 *
 * Standard Flajolet et al. estimator with the small-range linear-counting
 * correction; hashing is Spark's own XXH64 (seed 42) over the value's
 * UTF-8 bytes — deterministic, no RNG anywhere.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Mutable register array; m = 2^p bytes. */
final class HllSketch(val p: Int) {
  val m: Int = 1 << p
  val regs: Array[Byte] = new Array[Byte](m)

  def add(v: UTF8String): Unit = {
    val bytes = v.getBytes
    val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    val idx = (h >>> (64 - p)).toInt
    // rank = position of the first 1-bit in the remaining 64-p bits (1-based);
    // all-zero remainder gets the maximum rank 64-p+1
    val w = h << p
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Pointwise max — commutative/associative/idempotent. */
  def mergeFrom(o: HllSketch): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  def estimate: Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

/**
 * hll_count(x, p) → bigint: approximate COUNT(DISTINCT x) from a 2^p-register
 * HyperLogLog (standard error ≈ 1.04/√(2^p); p = 12 → ~1.6%).
 */
@ExpressionDescription(usage = "hll_count(x, p) - mergeable HyperLogLog distinct count")
case class HllSketchAgg(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[HllSketch]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(p >= 4 && p <= 18, s"hll_count: p must be in 4..18, got $p")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(b: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: HllSketch, o: HllSketch): HllSketch = { b.mergeFrom(o); b }

  override def eval(b: HllSketch): Any = b.estimate

  override def serialize(b: HllSketch): Array[Byte] = b.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllSketch = {
    val b = new HllSketch(p)
    System.arraycopy(bytes, 0, b.regs, 0, b.m)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c(0))
  override def prettyName: String = "hll_count"
}

object HllSketchAgg {
  /** SQL builder: hll_count(x, p) with p an int literal. */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length == 2, "hll_count(x, p) takes 2 arguments")
    val p = es(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"hll_count: p must be an integer literal, got $other")
    }
    HllSketchAgg(es.head, p).toAggregateExpression()
  }
}
