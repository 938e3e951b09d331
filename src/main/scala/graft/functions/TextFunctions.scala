package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: language ID (stopword + n-gram
 * heuristic), quality scoring, token counting, document fingerprinting.
 * Everything on the scan path is built-in Catalyst functions.
 */
object TextFunctions {

  /** Small per-language stopword profiles (public common-word lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "una", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Fraction of a language's stopwords present among the doc's tokens. */
  def stopwordHits(toks: Column, lang: String): Column = {
    val hits = stopwords(lang).map(w => when(array_contains(toks, w), 1).otherwise(0))
    hits.reduce[Column](_ + _).cast("double") / lit(stopwords(lang).size.toDouble)
  }

  /**
   * Heuristic language ID: CJK-character ratio decides zh; otherwise the
   * language whose stopword profile scores highest (no hits → 'und').
   * Native single-pass codegen kernel ([[org.apache.spark.sql.graft
   * .LangIdKernel]]); [[langIdDeclarative]] is the equivalent pure-column
   * formulation it replaces (regexp + 40 array_contains scans re-walked the
   * text ~41x per row) — kept as the semantics oracle in tests.
   */
  def langId(textCol: Column): Column =
    org.apache.spark.sql.graft.TextFunctionsImpl.lang_id(textCol)

  /** Declarative reference formulation of [[langId]] (see its scaladoc). */
  def langIdDeclarative(textCol: Column): Column = {
    val toks = split(lower(textCol), "\\s+")
    val cjk = length(regexp_replace(textCol, "[^\\u4e00-\\u9fff]", "")).cast("double") /
      greatest(length(textCol).cast("double"), lit(1.0))
    val scored = Seq("en", "de", "fr", "es").map(l => struct(stopwordHits(toks, l).as("s"), lit(l).as("l")))
    val best = array_max(array(scored: _*))
    when(cjk > 0.2, lit("zh"))
      .when(best.getField("s") > 0.0, best.getField("l"))
      .otherwise(lit("und"))
  }

  /** Token count: whitespace tokens. */
  def tokenCount(textCol: Column): Column = size(split(textCol, "\\s+"))

  /** BPE-ish subword count estimate: regex word-piece segmentation. */
  def subwordCount(textCol: Column): Column =
    size(split(textCol, "(?<=[a-z])(?=[A-Z])|\\s+|(?=[^\\w\\s])"))

  /**
   * Quality score ∈ [0,1]: length, lexical diversity, mean word length.
   * All arithmetic is ANSI-expressible (DuckDB-oracle-checked as q26).
   */
  def qualityColumns(textCol: Column): Seq[Column] = {
    val toks = split(textCol, " ")
    val nTok = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val meanWordLen = (length(textCol).cast("double") - nTok + lit(1.0)) / nTok
    val score = lit(0.5) * least(lit(1.0), nTok / lit(50.0)) +
      lit(0.3) * distinctRatio +
      lit(0.2) * least(lit(1.0), meanWordLen / lit(8.0))
    Seq(nTok.cast("int").as("n_tokens"), distinctRatio.as("distinct_ratio"),
      meanWordLen.as("mean_word_len"), score.as("quality"))
  }

  /**
   * F2 string→type sniffing cascade (reference `ClazzUtils.castPrintableObject`
   * regex rules, ClazzUtils.java:88-142): boolean → char → integer (narrowest
   * of byte/short/int/long by range) → float/double ([0-9]+[.,][0-9]+) →
   * timestamp → string. Returns struct<kind, bool_v, long_v, double_v, ts_v>.
   * Only needed at the GML ingest boundary — the engine itself keeps native
   * Catalyst types (SURVEY §1.4).
   */
  def typedParse(c: Column): Column = {
    val trimmed = trim(c)
    val isBool = trimmed.rlike("^(?i)(true|false)$")
    val isInt = trimmed.rlike("^-?[0-9]+$")
    val isDec = trimmed.rlike("^-?[0-9]+[.,][0-9]+$")
    val longV = trimmed.cast("long")
    val intKind = when(longV.between(-128, 127), "byte")
      .when(longV.between(-32768, 32767), "short")
      .when(longV.between(Int.MinValue.toLong, Int.MaxValue.toLong), "int")
      .otherwise("long")
    val tsV = try_to_timestamp(trimmed)
    struct(
      when(isBool, lit("boolean"))
        .when(length(trimmed) === 1 && !trimmed.rlike("^[0-9]$"), lit("char"))
        .when(isInt && longV.isNotNull, intKind)
        .when(isDec, lit("double"))
        .when(tsV.isNotNull, lit("timestamp"))
        .otherwise(lit("string")).as("kind"),
      when(isBool, lower(trimmed) === "true").as("bool_v"),
      when(isInt, longV).as("long_v"),
      when(isDec, regexp_replace(trimmed, ",", ".").cast("double")).as("double_v"),
      tsV.as("ts_v"))
  }

  /**
   * Deterministic train/val/test split: md5 of the row id → first 4 hex
   * chars → bucket in [0,100). Content-derived (no RNG), so the split is
   * stable across runs, partitions and cluster sizes — the property a
   * training-data pipeline needs so re-runs never leak val rows into train.
   * ANSI-expressible (DuckDB-oracle-checked as q38).
   */
  def hashSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Normalized-content fingerprint (md5 over lowercased, space-collapsed text). */
  def fingerprint(textCol: Column): Column =
    substring(md5(regexp_replace(lower(textCol), "\\s+", " ").cast("binary")), 1, 16)

  /**
   * PII redaction: e-mail addresses and phone-shaped digit runs replaced by
   * typed placeholders — the scrub pass every public-web training corpus
   * runs before anything else. Pure codegen `regexp_replace` chain on the
   * scan (no UDF); the patterns deliberately use only constructs with
   * identical semantics in Java regex and RE2, so the operator is
   * DuckDB-oracle-checked (q57) — cross-engine regex parity is exactly the
   * kind of silent divergence a 100-TB scrub cannot afford.
   */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"
  def redactPii(textCol: Column): Column =
    regexp_replace(regexp_replace(textCol, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /**
   * Intra-document repetition (the MassiveText/Gopher "repeated n-gram
   * fraction" quality rule): 1 − distinct/total over word 3-grams; 0 for
   * docs too short to have any. High values flag boilerplate/templated
   * text that survives per-document dedup. Built-ins only; q58 oracle.
   */
  def repetitionColumns(textCol: Column, n: Int = 3): Seq[Column] = {
    // null text == empty string == zero grams — size(null) would propagate
    // NULL counts, diverging from the documented (0, 0, 0.0) contract and
    // from the q58 oracle's ELSE-[] branch
    val grams = org.apache.spark.sql.graft.TextFunctionsImpl
      .shingle_make(coalesce(textCol, lit("")), lit(n))
    val total = size(grams).cast("long")
    val distinctN = size(array_distinct(grams)).cast("long")
    Seq(total.as("n_grams"), distinctN.as("n_distinct"),
      when(total > 0L, lit(1.0) - distinctN.cast("double") / total.cast("double"))
        .otherwise(lit(0.0)).as("rep_frac"))
  }

  /** Just the repeated-n-gram fraction (for filters/gates). */
  def repetitionFrac(textCol: Column, n: Int = 3): Column =
    repetitionColumns(textCol, n).last

  /**
   * TF-IDF keyword extraction: the top-k terms of each document by
   * tf · ln(N/df), ties broken by term — corpus-level keyword/topic
   * signal for curation and inspection. Shuffle shape: one groupBy for
   * per-doc term frequencies, one for document frequencies, an equi-join
   * on term, and a k-bounded `topk_by` aggregate per doc (map-side combine:
   * only k-entry buffers cross the final shuffle, and the (tf, df) columns
   * ride the buffer as payload, so there is NO join-back against the full
   * (doc, term) table and NO per-doc sort of it — at 10^12 docs that table
   * is the query's largest intermediate, which a row_number() window would
   * shuffle AND sort whole); the corpus size joins in as a broadcast
   * scalar. NOT DuckDB-oracled by design: ln() is libm-dependent
   * and a last-ulp difference between engines could flip a rank at an
   * exact crossover (the same reason hex_encode's pow-based oracle was
   * rejected) — TextStatsSpec replays the exact formula with the same
   * StrictMath.log (what Spark's `log` evaluates) instead.
   */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // canonical tokenizer shared with the dedup family — a divergent token
    // stream here would silently decouple TF-IDF from the df/dedup view
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(graft.operators.Dedup.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term) — df falls out of it without
    // re-tokenizing the corpus or shuffling the exploded token stream again
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")))
    scored.groupBy("doc_id")
      .agg(org.apache.spark.sql.graft.GeoFunctionsImpl.topk_by(
        col("tfidf"), col("term"), struct(col("tf"), col("df")), k).as("top"))
      .select(col("doc_id"), explode(col("top")).as("e"))
      .select(col("doc_id"), col("e.key").as("term"),
        col("e.payload.tf").as("tf"), col("e.payload.df").as("df"),
        col("e.rnk").as("rnk"))
  }

  def withTextStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("*") +: (langId(col(textCol)).as("lang_pred") +:
      fingerprint(col(textCol)).as("fp16") +: qualityColumns(col(textCol))): _*)
}
