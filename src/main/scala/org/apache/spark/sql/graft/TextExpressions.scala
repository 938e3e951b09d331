/*
 * Lives under org.apache.spark.sql.* because Catalyst's extension surface is
 * private[sql] in Spark 4 (same as GeoExpressions/VecExpressions).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass language-ID kernel. The declarative formulation (regexp_replace
 * for the CJK ratio + 4 langs x 10 `array_contains` scans of the token array)
 * re-walks the text ~41 times per row; this walks it twice (codepoints, then
 * tokens) and ORs stopword hits into one 40-bit presence mask.
 *
 * Semantics are EXACTLY the declarative version's (q27's DuckDB oracle
 * replays that formula):
 *  - cjk ratio  = codepoints in [U+4E00, U+9FFF] / max(numChars, 1) > 0.2 → "zh"
 *  - score(l)   = |distinct stopwords of l present| / 10.0   (presence, not count)
 *  - pred       = argmax over (score, lang-code) LEXICOGRAPHIC — ties pick the
 *                 lexicographically greatest code, matching array_max over
 *                 struct(score, lang)
 *  - all scores 0 → "und"
 */
object LangIdKernel {
  private val langs: Array[String] = Array("en", "de", "fr", "es")

  /** token → OR-mask of (langIdx*10 + wordIdx) bits (a word may serve several langs). */
  private val wordMask: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var li = 0
    while (li < langs.length) {
      val words = graft.functions.TextFunctions.stopwords(langs(li))
      var wi = 0
      while (wi < words.size) {
        val bit = 1L << (li * 10 + wi)
        val prev = m.get(words(wi))
        m.put(words(wi), if (prev == null) bit else prev | bit)
        wi += 1
      }
      li += 1
    }
    m
  }

  private val ZH = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")
  private val LANG_U8: Array[UTF8String] = langs.map(UTF8String.fromString)

  def eval(text: UTF8String): UTF8String = {
    val s = text.toString
    var cjk = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      total += 1
      i += Character.charCount(cp)
    }
    if (cjk.toDouble / math.max(total.toDouble, 1.0) > 0.2) return ZH

    var mask = 0L
    val toks = s.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var t = 0
    while (t < toks.length) {
      val m = wordMask.get(toks(t))
      if (m != null) mask |= m.longValue()
      t += 1
    }
    var bestHits = 0
    var bestIdx = -1
    var li = 0
    while (li < langs.length) {
      val hits = java.lang.Long.bitCount((mask >>> (li * 10)) & 0x3ffL)
      // lexicographic (score, code) max — ties resolve to the greater code
      if (bestIdx < 0 || hits > bestHits ||
          (hits == bestHits && langs(li).compareTo(langs(bestIdx)) > 0)) {
        bestHits = hits; bestIdx = li
      }
      li += 1
    }
    if (bestHits > 0) LANG_U8(bestIdx) else UND
  }
}

/**
 * One-pass sliding n-gram shingles: lower → split(" ") → join n consecutive
 * tokens with spaces, all in a single JIT loop per row. Replaces the
 * posexplode + window-lead formulation, whose per-(doc) sort shuffled every
 * TOKEN row just to rebuild adjacency the source string already had.
 * String semantics identical to
 * `w[i] || ' ' || w[i+1] ... ` over `split(lower(text), ' ')` (single-space
 * split, empty tokens kept) — the DuckDB oracle replays exactly that.
 */
object ShingleKernel {
  def eval(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** shingle_make(text, n) — generator-style, explode the result. */
case class ShingleMakeExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleKernel.eval(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"org.apache.spark.sql.graft.ShingleKernel.eval($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "shingle_make"
}

/** lang_id(text) — codegen'd static call into [[LangIdKernel]]. */
case class LangIdExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullSafeEval(t: Any): Any =
    LangIdKernel.eval(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graft.LangIdKernel.eval($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lang_id"
}

object TextFunctionsImpl {
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
  def lang_id(text: Column): Column = column(LangIdExpr(expression(text)))
  def shingle_make(text: Column, n: Column): Column =
    column(ShingleMakeExpr(expression(text), expression(n)))
  /** Bounded-memory heavy hitters (Misra-Gries) — see FreqSketchAgg. */
  def freq_topk(item: Column, capacity: Int, k: Int): Column =
    column(FreqSketchAgg(expression(item), capacity, k).toAggregateExpression())
}
