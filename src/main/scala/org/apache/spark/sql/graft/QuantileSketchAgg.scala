/*
 * KLL-style quantile sketch as a Catalyst aggregate — the bounded-memory
 * companion to the exact percentile gate (q43). The exact form must hold
 * every distinct value through the aggregation; at 100 TB a per-group value
 * map (e.g. per-language quality scores) is itself too large. kll_quantiles
 * keeps a hierarchy of k-bounded compactor buffers (level i items each
 * stand for 2^i input rows), so a partial aggregate is O(k · log(n/k))
 * doubles and merges level-wise — the classic mergeable-summaries shape
 * (Karnin/Lang/Liberty compactors with DETERMINISTIC alternating-parity
 * selection instead of coin flips, trading the randomized guarantee for
 * run-to-run reproducibility; the same determinism stance as the rest of
 * the engine).
 *
 * Guarantee (tested under adversarial partitionings in QuantileSketchSpec):
 * each level-i compaction perturbs any rank by at most 2^i, and alternating
 * parity cancels consecutive perturbations, so the observed rank error
 * stays well inside ε·n with ε ≈ 2·log₂(n/k)/k. Values returned are always
 * ACTUAL input values (order statistics of the stream), never interpolated.
 * Like freq_topk, exact outputs are processing-order-dependent, so this is
 * a guarantee-tested surface, not a DuckDB-hash-compared one — q43 remains
 * the exact oracle twin.
 */
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable compactor hierarchy. Level i holds ≤ 2k items of weight 2^i;
  * on overflow the level is sorted and every other item (alternating parity
  * per level, deterministic) is promoted with doubled weight. */
final class QSketch(val k: Int) {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  val flips: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)
  var n: Long = 0L

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) { levels += mutable.ArrayBuffer.empty; flips += false }

  def add(v: Double): Unit = {
    n += 1
    levels(0) += v
    if (levels(0).size >= 2 * k) compact(0)
  }

  private def compact(i: Int): Unit = {
    val buf = levels(i)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    buf.clear()
    var len = sorted.length
    if (len % 2 == 1) { buf += sorted(len - 1); len -= 1 } // odd leftover stays
    ensureLevel(i + 1)
    val off = if (flips(i)) 1 else 0
    flips(i) = !flips(i)
    val up = levels(i + 1)
    var j = off
    while (j < len) { up += sorted(j); j += 2 }
    if (up.size >= 2 * k) compact(i + 1)
  }

  /** Level-wise concatenation, then cascade-compact — errors add, capacity
    * bounds hold, and the result is independent of HOW the stream was
    * partitioned only up to the documented rank-error bound. */
  def mergeFrom(o: QSketch): Unit = {
    n += o.n
    var i = 0
    while (i < o.levels.size) {
      ensureLevel(i)
      levels(i) ++= o.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.size) {
      if (levels(i).size >= 2 * k) compact(i)
      i += 1
    }
  }

  /** Value whose estimated rank is closest to q·n — walks the weighted
    * (value, 2^level) multiset once, sorted. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    if (n == 0) return qs.map(_ => Double.NaN)
    var m = 0
    var i = 0
    while (i < levels.size) { m += levels(i).size; i += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0
    i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach { v => vals(p) = v; wts(p) = w; p += 1 }
      i += 1
    }
    // indirect sort by value
    val idx = (0 until m).sortBy(vals(_)).toArray
    val total = wts.sum.toDouble
    qs.map { q =>
      val target = q * total
      var cum = 0.0
      var j = 0
      var out = vals(idx(m - 1))
      var done = false
      while (j < m && !done) {
        cum += wts(idx(j))
        if (cum >= target) { out = vals(idx(j)); done = true }
        j += 1
      }
      out
    }
  }

  def serialize(out: DataOutputStream): Unit = {
    out.writeLong(n)
    out.writeInt(levels.size)
    var i = 0
    while (i < levels.size) {
      out.writeBoolean(flips(i))
      out.writeInt(levels(i).size)
      levels(i).foreach(out.writeDouble)
      i += 1
    }
  }
}

object QSketch {
  def deserialize(k: Int, in: DataInputStream): QSketch = {
    val s = new QSketch(k)
    s.n = in.readLong()
    val nl = in.readInt()
    s.levels.clear(); s.flips.clear()
    var i = 0
    while (i < nl) {
      s.flips += in.readBoolean()
      val buf = mutable.ArrayBuffer.empty[Double]
      val sz = in.readInt()
      var j = 0
      while (j < sz) { buf += in.readDouble(); j += 1 }
      s.levels += buf
      i += 1
    }
    s
  }
}

/**
 * kll_quantiles(x, k, p1[, p2, …]) → array<double>: the requested quantiles
 * of x from a deterministic KLL-style sketch of capacity k per level.
 */
@ExpressionDescription(usage = "kll_quantiles(x, k, p...) - mergeable bounded-memory quantiles")
case class QuantileSketchAgg(
    child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[QSketch]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k >= 8, s"kll_quantiles: k must be >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"kll_quantiles: probabilities must be in [0, 1], got $probs")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(b: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: QSketch, o: QSketch): QSketch = { b.mergeFrom(o); b }

  override def eval(b: QSketch): Any =
    new GenericArrayData(b.quantiles(probs.toArray).map(v => v: Any))

  override def serialize(b: QSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    b.serialize(out)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QSketch =
    QSketch.deserialize(k, new DataInputStream(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = c(0))
  override def prettyName: String = "kll_quantiles"
}

object QuantileSketchAgg {
  /** SQL builder: kll_quantiles(x, k, p1[, p2, …]) with literal k / probs. */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length >= 3, "kll_quantiles(x, k, p1[, p2, ...]) takes >= 3 arguments")
    val k = es(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: k must be an integer literal, got $other")
    }
    val probs = es.drop(2).map {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Int, IntegerType) => v.toDouble
      // SQL decimal literals (0.25 parses as DECIMAL(2,2)) arrive as
      // Spark's Decimal wrapper, not java.math.BigDecimal
      case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: probabilities must be numeric literals, got $other")
    }
    QuantileSketchAgg(es.head, k, probs).toAggregateExpression()
  }
}
