package graft.operators

import graft.core.HexGrid

/**
 * Serializable kNN index over target centroids for the codegen kNN path
 * (same plan-reference-object pattern as [[PipIndex]]): ships inside the
 * query plan, generated code calls `matches(x, y)` directly — no join, no
 * shuffle, no Encoder round-trip on the probe scan.
 *
 * Two internal strategies, selected once at build time:
 *  - `n ≤ linearLimit`: a linear scan over primitive coordinate arrays with
 *    an insertion top-k (k·n flops, zero per-candidate allocation) — for
 *    city-scale target sets this beats walking hex rings, especially for
 *    far-field probes whose ring radius would be huge;
 *  - otherwise: hex-cell ring expansion with the provable stop bound
 *    ([[KnnJoin.ringLowerBound]]), buckets in an open-addressing
 *    primitive-key table (a boxed HashMap probe per row would allocate on
 *    the 10^12-row scan; see PipIndex.lookup).
 *
 * Tie-break: (d2, target_id) ascending — targets are pre-sorted by id, so
 * ordinal order IS id order and the insertion sort compares ordinals.
 *
 * `matches` returns ArrayData of struct<target_id:string,d2:double,rnk:int>
 * (rank precomputed — no downstream window needed).
 */
final class KnnIndex(targets: Seq[(String, Double, Double)], val k: Int,
                     res: Int = 12, maxR: Int = 64, linearLimit: Int = 512)
    extends Serializable {

  private val sorted: Array[(String, Double, Double)] =
    targets.sortBy(_._1).toArray
  private val n = sorted.length
  private val txs: Array[Double] = sorted.map(_._2)
  private val tys: Array[Double] = sorted.map(_._3)
  private val linear = n <= linearLimit

  @transient private lazy val tids: Array[org.apache.spark.unsafe.types.UTF8String] =
    sorted.map(t => org.apache.spark.unsafe.types.UTF8String.fromString(t._1))

  /** cell → target ordinals; open addressing, power-of-two capacity. */
  @transient private lazy val buckets: (Array[Long], Array[Array[Int]], Int) = {
    val tmp = new java.util.HashMap[java.lang.Long, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < n) {
      tmp.computeIfAbsent(HexGrid.encode(txs(i), tys(i), res),
        _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    var cap = 16
    while (cap < tmp.size * 4) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Array[Int]](cap)
    val mask = cap - 1
    tmp.forEach { (key, v) =>
      var slot = (graft.core.Hashing.mix64(key) & mask).toInt
      while (vals(slot) != null) slot = (slot + 1) & mask
      keys(slot) = key
      vals(slot) = v.toArray
    }
    (keys, vals, mask)
  }

  private def lookup(cell: Long): Array[Int] = {
    val (keys, vals, mask) = buckets
    var slot = (graft.core.Hashing.mix64(cell) & mask).toInt
    while (true) {
      val v = vals(slot)
      if (v == null) return null
      if (keys(slot) == cell) return v
      slot = (slot + 1) & mask
    }
    null
  }

  private val EmptyArray =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))

  /** k nearest targets of (x, y) as struct rows, ranked 1..k. */
  def matches(x: Double, y: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (n == 0) return EmptyArray
    val kk = math.min(k, n)
    val bd = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var filled = 0

    // (d2, ordinal) lexicographic insertion — ordinal order == target_id order
    def consider(i: Int, d2: Double): Unit = {
      if (filled == kk &&
          (d2 > bd(kk - 1) || (d2 == bd(kk - 1) && i > bi(kk - 1)))) return
      var p = if (filled < kk) filled else kk - 1
      while (p > 0 && (d2 < bd(p - 1) || (d2 == bd(p - 1) && i < bi(p - 1)))) {
        bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
      }
      bd(p) = d2; bi(p) = i
      if (filled < kk) filled += 1
    }

    if (linear) {
      var i = 0
      while (i < n) {
        val dx = txs(i) - x; val dy = tys(i) - y
        consider(i, dx * dx + dy * dy)
        i += 1
      }
    } else {
      val c0 = HexGrid.encode(x, y, res)
      var r = 0
      var done = false
      while (!done && r <= maxR) {
        val cells = if (r == 0) Array(c0) else HexGrid.ring(c0, r)
        var ci = 0
        while (ci < cells.length) {
          val cand = lookup(cells(ci))
          if (cand != null) {
            var j = 0
            while (j < cand.length) {
              val i = cand(j)
              val dx = txs(i) - x; val dy = tys(i) - y
              consider(i, dx * dx + dy * dy)
              j += 1
            }
          }
          ci += 1
        }
        // strict <: unseen targets are then strictly farther, so no tie with
        // the k-th candidate can be missed
        if (filled == kk &&
            math.sqrt(bd(kk - 1)) < KnnJoin.ringLowerBound(res, r + 1)) done = true
        r += 1
      }
      if (!done) {
        // ring budget exhausted before the stop bound (far-field probe or
        // sparse targets): fall back to the exact linear scan instead of
        // returning a silently truncated/incomplete top-k
        filled = 0
        var i = 0
        while (i < n) {
          val dx = txs(i) - x; val dy = tys(i) - y
          consider(i, dx * dx + dy * dy)
          i += 1
        }
      }
    }

    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](tids(bi(r)), bd(r), r + 1))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
