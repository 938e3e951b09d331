/*
 * Catalyst optimizer rule: rewrites the naive declarative spatial join
 *
 *   points CROSS JOIN polys WHERE st_covers(ring, holes, x, y)
 *
 * into the filter-refine plan the engine would hand-build:
 *
 *   (points + cell = hex_encode(x, y, res))
 *     JOIN (polys + explode(hex_cover(ring, res)) AS cell)
 *     ON cellL = cellR AND st_covers(ring, holes, x, y)
 *
 * so a user writing the obvious SQL gets the O(n·cells) equi-join instead of
 * the O(n·m) nested loop. Correct because hex_cover is a superset of the
 * cells of all covered points (property-tested in CellGridSpec) and the
 * original predicate is kept as the exact refine.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val Res = 11 // hex resolution of the prejoin key (≈25 m edge)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        // guard: an already-expanded join references the injected __cell_
        // attributes in its condition — never rewrite twice
        if !cond.references.exists(_.name.startsWith("__cell_")) =>
      splitCovers(cond, left, right) match {
        case Some((pip, pointsLeft)) =>
          val (ptsSide, polySide) = if (pointsLeft) (left, right) else (right, left)
          val cellL = Alias(HexEncodeExpr(pip.third, pip.fourth, Literal(Res)), "__cell_pt")()
          val ptsPlan = Project(ptsSide.output :+ cellL, ptsSide)
          val cellR = AttributeReference("__cell_poly", LongType, nullable = false)()
          val polyPlan = Generate(Explode(HexCoverExpr(pip.first, Literal(Res))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(cellR), child = polySide)
          val eq = EqualTo(cellL.toAttribute, cellR)
          val (newL, newR) = if (pointsLeft) (ptsPlan, polyPlan) else (polyPlan, ptsPlan)
          Project(j.output, Join(newL, newR, Inner, Some(And(eq, cond)), hint))
        case None => j
      }
  }

  /** Find a PipCoversExpr that is itself one of the top-level conjuncts of the
    * join condition (never one buried under OR/NOT/CASE, where conjoining the
    * cell equi-join would drop rows satisfying only the other branch), whose
    * ring/holes come from one side and x/y from the other; returns it plus
    * whether the point side is the left input. */
  private def splitCovers(cond: Expression, left: LogicalPlan,
                          right: LogicalPlan): Option[(PipCoversExpr, Boolean)] = {
    val lset = left.outputSet
    val rset = right.outputSet
    splitConjunctivePredicates(cond).collectFirst {
      case p: PipCoversExpr
          if p.first.references.subsetOf(rset) && p.second.references.subsetOf(rset) &&
             p.third.references.subsetOf(lset) && p.fourth.references.subsetOf(lset) =>
        (p, true)
      case p: PipCoversExpr
          if p.first.references.subsetOf(lset) && p.second.references.subsetOf(lset) &&
             p.third.references.subsetOf(rset) && p.fourth.references.subsetOf(rset) =>
        (p, false)
    }
  }
}

/**
 * Session extensions entry point:
 *   SparkSession.builder().withExtensions(new GraftExtensions) …
 * or  --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
 * Injects the engine's SQL functions and the spatial-join rewrite — a
 * config-only deployment needs no code call to `register`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("org.apache.spark.sql.graft", name), builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRewrite)
    e.injectFunction(fn("hex_encode", es => HexEncodeExpr(es(0), es(1), es(2))))
    e.injectFunction(fn("z_encode", es => ZEncodeExpr(es(0), es(1), es(2))))
    e.injectFunction(fn("tile_of", es => TileOfExpr(es(0), es(1), es(2))))
    e.injectFunction(fn("st_covers_ring", es => PipContainsExpr(es(0), es(1), es(2))))
    e.injectFunction(fn("st_covers", es => PipCoversExpr(es(0), es(1), es(2), es(3))))
    e.injectFunction(fn("hex_cover", es => HexCoverExpr(es(0), es(1))))
    e.injectFunction(fn("hex_ring", es => HexRingExpr(es(0), es(1), es(2), es(3))))
    e.injectFunction(fn("z_cell_x", es => ZCellXExpr(es(0))))
    e.injectFunction(fn("z_cell_y", es => ZCellYExpr(es(0))))
    e.injectFunction(fn("tile_cover", es => TileCoverExpr(es(0), es(1))))
    e.injectFunction(fn("vec_dot", es => DotExpr(es(0), es(1))))
    e.injectFunction(fn("vec_cosine", es => CosineExpr(es(0), es(1))))
    e.injectFunction(fn("lang_id", es => LangIdExpr(es(0))))
    e.injectFunction(fn("shingle_make", es => ShingleMakeExpr(es(0), es(1))))
  }
}

/** Runtime attachment for an already-built session (tests, notebooks). */
object GraftExtensions {
  def enable(spark: org.apache.spark.sql.SparkSession): Unit = {
    GeoFunctionsImpl.register(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(SpatialJoinRewrite))
      spark.experimental.extraOptimizations = cur :+ SpatialJoinRewrite
  }
}
