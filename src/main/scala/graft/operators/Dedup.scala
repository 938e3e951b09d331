package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/**
 * Deduplication operators for large-scale training-data pipelines.
 * All hot paths are built-in Catalyst functions (codegen'd, no Scala UDFs on
 * the scan side); candidate generation is LSH-style banding so the shuffle is
 * an equi-join on band keys — never an all-pairs cross join.
 */
object Dedup {

  /** Exact dedup: content hash → keeper (min id) + copy count. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol).cast("binary")))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Whitespace word tokens (lowercased). */
  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  /** Sliding word n-grams (shingles) as an array column — pure built-ins. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array())
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /**
   * MinHash signature columns: per permutation p, min over shingles of
   * md5(shingle || "_p"). Using the hex-string order statistic keeps the
   * operator expressible in ANSI SQL (DuckDB-oracle-checkable) while having
   * the same collision semantics as integer MinHash.
   */
  // one md5 per shingle; perm p = 8-hex-char slice (p-1)*8+1..8 of the digest
  // (4x less hashing than md5(s || "_p") per perm; slices of one digest are
  // as independent as suffixed digests for banding — recall property-tested)
  def minhashSig(sh: Column, perms: Int): Seq[Column] = {
    require(perms >= 1 && perms <= 4,
      s"perms must be 1..4 (a 32-hex md5 digest yields 4 8-char slices; got $perms)")
    (1 to perms).map { p =>
      array_min(transform(sh, s =>
        substring(md5(s.cast("binary")), (p - 1) * 8 + 1, 8))).as(s"m$p")
    }
  }

  /** doc_id + MinHash signature (one row per doc). */
  def minhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
              perms: Int = 4, ngram: Int = 3): DataFrame = {
    val sh = shingles(tokens(col(textCol)), ngram)
    docs.select(col(idCol) +: minhashSig(sh, perms): _*)
  }

  /**
   * LSH candidate pairs: docs sharing ANY signature band (band size 1 here:
   * each permutation is a bucket key), verified with exact n-gram Jaccard.
   * Shuffle shape: explode(perms) → groupBy bucket self-join → distinct pairs.
   */
  def lshPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
               perms: Int = 4, ngram: Int = 3, minJaccard: Double = 0.5,
               maxBucket: Int = 100): DataFrame = {
    require(perms >= 1 && perms <= 4,
      s"perms must be 1..4 (a 32-hex md5 digest yields 4 8-char slices; got $perms)")
    // 1) narrow band join on ids only (token arrays would bloat the shuffle
    //    and the distinct), 2) dedup candidate id pairs, 3) re-attach token
    //    sets with two broadcast-friendly joins, 4) exact-Jaccard verify.
    // Buckets larger than `maxBucket` are dropped from candidate generation —
    // a shared min-shingle that frequent carries no signal, and an uncapped
    // mega-bucket is an O(bucket²) pair explosion (standard LSH practice;
    // the DuckDB oracle applies the identical cap, so row parity holds).
    val toks = docs.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("toks"))
    // Build shingles with the one-pass codegen kernel (shingle_make): tokens
    // are adjacent in the source string, so rebuilding adjacency with
    // posexplode + window lead() shuffled and sorted every TOKEN row for
    // nothing; HOF transform() would interpret per element. One generator
    // expression, zero shuffles before the minhash groupBy.
    val exploded = docs.select(col(idCol).as("id"),
      explode(org.apache.spark.sql.graft.TextFunctionsImpl.shingle_make(
        col(textCol), lit(ngram))).as("s"))
    val hashes = exploded
      .select(col("id"), md5(col("s").cast("binary")).as("h0")) // ONE digest per shingle
      .select(col("id"),
        posexplode(array((1 to perms).map(p =>
          substring(col("h0"), (p - 1) * 8 + 1, 8)): _*)).as(Seq("band", "h")))
    val buckets0 = hashes.groupBy("id", "band").agg(min("h").as("bucket"))
    // cap enforcement: aggregate the (rare, by the frequent-shingle premise)
    // oversized buckets and anti-join them out — the same shuffle count as
    // the previous count-window form but with map-side partial aggregation
    // and NO per-partition sort of every (id, band, bucket) row; AQE picks a
    // broadcast anti-join when the oversized set is small (the normal case)
    val oversized = buckets0.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > maxBucket)
      .select("band", "bucket")
    val buckets = buckets0.join(oversized, Seq("band", "bucket"), "left_anti")
    val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .withColumn("jac",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .where(col("jac") >= minJaccard)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jac"))
  }

  /** Exact all-pairs n-gram Jaccard (test oracle; O(n²), small scale only). */
  def bruteForceJaccard(docs: Seq[(Long, String)], minJaccard: Double): Set[(Long, Long, Double)] = {
    val tok = docs.map { case (id, t) => id -> t.toLowerCase.split(" ").distinct.toSet }
    (for {
      (ia, sa) <- tok; (ib, sb) <- tok if ia < ib
      jac = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      if jac >= minJaccard
    } yield (ia, ib, jac)).toSet
  }

  /** 64-bit SimHash over word tokens. Per-word hash = the top 64 bits of
    * md5(word) — chosen over a custom integer mix so the whole operator is
    * ANSI-SQL-expressible (hex-digit bit extraction) and DuckDB-oracle-checked
    * as q20; empty tokens are skipped on both sides. */
  def simhash64(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    text.toLowerCase.split(" ").foreach { w =>
      if (w.nonEmpty) {
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** doc_id + simhash (typed map; the bit loop is not expressible in Catalyst). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }
      .toDF(idCol, "simhash")
  }

  /**
   * SimHash near-dup pairs with Hamming distance ≤ maxHamming.
   * LSH prefilter: split the 64-bit signature into (maxHamming+1) chunks — by
   * pigeonhole, any pair within maxHamming agrees on ≥1 chunk, so candidates
   * are an equi-join on (chunk_index, chunk_value); verify = bit_count(xor).
   */
  def simhashPairs(sigs: DataFrame, idCol: String = "doc_id",
                   maxHamming: Int = 3, sigCol: String = "simhash"): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    // disjoint chunks suffice for the pigeonhole guarantee even when
    // chunks*bits < 64: ≤ maxHamming differing bits cannot touch all
    // maxHamming+1 chunks, so some chunk is equal; verify counts all 64 bits
    val chunked = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col(sigCol), c * bits)
          .bitwiseAND(lit((1L << bits) - 1))): _*)).as(Seq("chunk", "cv")))
    val a = chunked.select(col("chunk"), col("cv"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("cv"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "cv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
  }

  /**
   * Image near-duplicate pairs by perceptual dHash Hamming distance — the
   * multimodal twin of [[simhashPairs]] over the input_hint image payload:
   * decode → 9x8 luminance dHash once per image (bounded mapPartitions
   * batches, NOT per candidate pair), then the same pigeonhole-banded
   * self-join + exact bit_count verify. At 10^12 images the decode pass is
   * embarrassingly parallel and the join shuffles 64-bit signatures, never
   * pixels.
   */
  def imageNearDup(imgs: DataFrame, idCol: String = "image_id",
                   maxHamming: Int = 6): DataFrame = {
    val sigs = graft.functions.ImageFunctions.extractFeatures(imgs)
      .select(col("image_id").as(idCol), col("dhash"))
    simhashPairs(sigs, idCol, maxHamming, sigCol = "dhash")
  }

  /**
   * Embedding near-dup via cosine-LSH (random hyperplanes): bucket = sign bits
   * of dot(v, r_j); candidates share a bucket; verify exact cosine ≥ threshold.
   * Hyperplanes are deterministic (seeded) literal arrays — no driver RNG state.
   */
  def embeddingNearDup(embs: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", dim: Int = 64,
                       planes: Int = 8, bands: Int = 4, minCosine: Double = 0.95): DataFrame = {
    // Same narrow shape as [[lshPairs]]: the band self-join and the candidate
    // distinct carry ids ONLY (the previous version dragged both 64-float
    // vectors through the distinct shuffle — pairs × vector width of shuffle
    // volume); vectors are re-attached per distinct pair with two equi-joins,
    // then verified with exact cosine.
    val vecs = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val withB = embs.select(col(idCol).as("id"),
        posexplode(lshBuckets(col(vecCol), dim, planes, bands)).as(Seq("band", "bucket")))
    val a = withB.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = withB.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", AnnSearch.cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * Connected components over a near-duplicate pair graph — the grouping
   * step every real dedup pipeline needs (keep ONE document per transitive
   * duplicate CLUSTER, not per pair). Hash-min label propagation: each
   * round every node takes the minimum root among itself and its
   * neighbours; converges in O(component diameter) rounds. Each round is
   * one equi-join + one min-aggregation over (node, root) scalars, eagerly
   * checkpointed — the standard distributed CC shape without dropping to
   * RDD/GraphX. Input pairs (a, b); output (node, root) with root = min
   * node id of the component.
   *
   * `checkpointDir`: see [[graft.core.Checkpoints]] — unset uses local
   * checkpoints (fastest; local-mode/testing), set uses reliable checkpoints
   * that survive executor loss on a real cluster.
   */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    val ck = graft.core.Checkpoints.strategy(pairs, checkpointDir)
    // pre-partition the static edge table by the per-round join key (b) and
    // PERSIST: the cached InMemoryRelation advertises the hash(b) layout, so
    // every round's join exchanges only the small evolving label side.
    // localCheckpoint alone does NOT work here — under AQE the checkpointed
    // LogicalRDD reports unknown partitioning and every round would
    // re-exchange the FULL edge table (the dominant per-round cost at
    // scale); the plan gate in PlanQualitySpec pins the working pattern.
    val edges = ck(pairs.select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct())
      .repartition(col("b")).persist()
    try {
      var labels = ck(edges.select(col("a").as("node")).distinct()
        .withColumn("root", col("node")))
      var changed = 1L
      var i = 0
      while (i < maxIters && changed > 0) {
        val nbrMin = edges
          .join(labels.select(col("node").as("b"), col("root")), Seq("b"))
          .groupBy(col("a").as("node")).agg(min("root").as("nbr_root"))
        val next = ck(labels.select(col("node"), col("root").as("old_root"))
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("old_root"), coalesce(col("nbr_root"), col("old_root"))).as("root"),
            col("old_root")))
        changed = next.where(col("root") =!= col("old_root")).count()
        labels = next.select("node", "root")
        i += 1
      }
      // converge or fail loudly — min-label propagation needs O(diameter)
      // rounds; returning unconverged labels would silently split clusters
      require(changed == 0,
        s"connectedComponents did not converge in $maxIters rounds ($changed labels still moving)")
      labels
    } finally edges.unpersist(blocking = false) // labels are checkpointed — independent
  }

  /** Per-cluster summary: (cluster_root = min doc id, csize). */
  def dupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("root").as("cluster_root"))
      .agg(count(lit(1)).as("csize"))

  /** Driver-side union-find oracle (tests). */
  def bruteComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  /**
   * Banded sign-bit LSH: `bands` independent bucket keys, each from `planes`
   * seeded hyperplanes (a pair within cosine θ collides in a band with prob
   * (1 − acos(θ)/π)^planes; missing ALL bands is exponentially unlikely).
   * Pure built-in expressions — the hyperplanes are literal arrays.
   */
  def lshBuckets(vec: Column, dim: Int, planes: Int, bands: Int): Column =
    array((0 until bands).map { b =>
      val terms: Seq[Column] = (0 until planes).map { p =>
        val r = Array.tabulate(dim)(d => Hashing.uniform(0xABCDEF + b * planes + p, d) * 2.0 - 1.0)
        val rLit = array(r.map(lit): _*)
        when(AnnSearch.dot(vec, rLit) >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      terms.reduce(_ + _)
    }: _*)
}
