/*
 * Misra-Gries heavy-hitters sketch as a Catalyst aggregate — the bounded-
 * memory companion to the exact top-k frequency query (q44). The exact form
 * must hold every distinct item through the aggregation; at 100 TB the
 * distinct n-gram set is itself too large to group cheaply. freq_topk keeps
 * at most `capacity` counters per partial aggregate and merges them, giving
 * the classic deterministic guarantee REGARDLESS of processing order:
 *
 *   - every item with true frequency > n / capacity IS in the summary;
 *   - each reported estimate e satisfies true - n/capacity <= e <= true.
 *
 * Counts (not membership) depend on arrival order, so this is an operator +
 * guarantee-tested surface, not a hash-compared oracle query — the same
 * split as ANN: exact baseline under the DuckDB gate (q44), sketch as the
 * scale path (FreqSketchSpec asserts the guarantees under adversarial
 * partitionings).
 */
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries summary: ≤ capacity counters + the total items seen
  * (n, for the error bound). Counters are held as RAW values over a running
  * `base` offset (true count = raw − base) and indexed by a count-ordered
  * bucket tree, so the MG eviction round — "decrement EVERY counter by the
  * minimum, drop the zeros" — is O(1) base arithmetic plus O(deaths) bucket
  * removal instead of an O(capacity) full-map sweep per non-resident
  * arrival (which degraded toward O(rows × capacity) on low-skew data).
  * Semantics are IDENTICAL to the textbook min-scan form. */
final class MGSummary(val capacity: Int) {
  /** Counter entry: the CANONICAL (cloned, stable) key + its raw count. The
    * bucket index must hold canonical keys only — an UnsafeRow-backed
    * UTF8String handed to `add` aliases a reused row buffer, and storing it
    * in a hash set corrupts the set when the buffer is overwritten. */
  private final class Ent(val key: UTF8String, var r: Long)
  private val ents = mutable.HashMap.empty[UTF8String, Ent]
  private val buckets = mutable.TreeMap.empty[Long, mutable.HashSet[UTF8String]]
  private var base = 0L
  var n: Long = 0L

  /** Current estimates (item → true count); O(size) snapshot. */
  def counts: Map[UTF8String, Long] =
    ents.iterator.map { case (_, e) => e.key -> (e.r - base) }.toMap

  def size: Int = ents.size

  private def bucketAdd(key: UTF8String, r: Long): Unit =
    buckets.getOrElseUpdate(r, mutable.HashSet.empty) += key

  private def bucketRemove(key: UTF8String, r: Long): Unit = {
    val s = buckets(r)
    s -= key
    if (s.isEmpty) buckets.remove(r)
  }

  /** Insert an OWNED (stable) key at a known true count (deserialize /
    * rebuild path — never call with a reused-buffer UTF8String). */
  def load(key: UTF8String, c: Long): Unit = {
    ents.update(key, new Ent(key, base + c))
    bucketAdd(key, base + c)
  }

  def add(item: UTF8String, w: Long): Unit = {
    n += w
    ents.get(item) match {
      case Some(e) =>
        bucketRemove(e.key, e.r)
        e.r += w
        bucketAdd(e.key, e.r)
      case None =>
        // weighted MG step: while no slot is free, one decrement "round"
        // destroys step × (capacity + 1) weight (step off every counter +
        // step of the arriving item). The uniform decrement is base += step
        // — O(1) instead of an O(capacity) full-map sweep — and only the
        // minimum bucket can die, freeing its slots. The RESIDUAL weight is
        // inserted — discarding it would break the membership guarantee for
        // w > 1 (a heavy item arriving as one weighted add must survive).
        var rem = w
        while (rem > 0 && ents.size >= capacity) {
          val minRaw = buckets.firstKey
          val step = math.min(rem, minRaw - base)
          base += step
          rem -= step
          if (minRaw - base <= 0) {
            val dead = buckets.remove(minRaw).get
            dead.foreach(ents.remove) // each death frees a slot — amortized O(1)
          }
        }
        if (rem > 0) load(item.clone(), rem)
    }
  }

  /** Mergeable-summaries combine (Agarwal et al.): add counters pointwise,
    * then if over capacity subtract the (capacity+1)-th largest count from
    * all and drop the non-positive — errors add, so the merged bound is
    * (n1+n2)/capacity. Rebuilds the bucket index once per merge (merges are
    * O(partials), never per-row). */
  def mergeFrom(o: MGSummary): Unit = {
    n += o.n
    val merged = mutable.HashMap.empty[UTF8String, Long]
    ents.foreach { case (_, e) => merged.update(e.key, e.r - base) }
    o.ents.foreach { case (_, e) =>
      merged.update(e.key, merged.getOrElse(e.key, 0L) + (e.r - o.base))
    }
    if (merged.size > capacity) {
      val sorted = merged.values.toArray.sorted(Ordering[Long].reverse)
      val cut = sorted(capacity) // (capacity+1)-th largest
      merged.mapValuesInPlace((_, c) => c - cut)
      merged.filterInPlace((_, c) => c > 0)
    }
    ents.clear(); buckets.clear(); base = 0L
    merged.foreach { case (k, c) => load(k, c) }
  }
}

/**
 * freq_topk(item, capacity, k) → array<struct<item: string, est: long>>:
 * the k highest-estimate items of a Misra-Gries(capacity) summary, ordered
 * by (est desc, item asc).
 */
@ExpressionDescription(usage = "freq_topk(item, capacity, k) - bounded-memory heavy hitters (Misra-Gries)")
case class FreqSketchAgg(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[MGSummary]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(capacity >= 1 && k >= 1 && k <= capacity,
    s"freq_topk: need 1 <= k <= capacity, got k=$k capacity=$capacity")

  // declared input type → a non-string item column is a clear analysis-time
  // error (or a useful implicit cast), not a per-task ClassCastException
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("item", StringType).add("est", LongType), containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(b: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = { b.mergeFrom(o); b }

  override def eval(b: MGSummary): Any = {
    val top = b.counts.toArray
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
    new GenericArrayData(top.map { case (item, c) => InternalRow(item, c) })
  }

  override def serialize(b: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.size)
    b.counts.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MGSummary(capacity)
    b.n = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      val len = in.readInt()
      val arr = new Array[Byte](len); in.readFully(arr)
      b.load(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = c(0))
  override def prettyName: String = "freq_topk"
}

object FreqSketchAgg {
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** SQL builder: freq_topk(item, capacity, k) with int-literal bounds. */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length == 3, "freq_topk(item, capacity, k) takes 3 arguments")
    def lit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"freq_topk: $name must be an integer literal, got $other")
    }
    FreqSketchAgg(es.head, lit(es(1), "capacity"), lit(es(2), "k")).toAggregateExpression()
  }
}
