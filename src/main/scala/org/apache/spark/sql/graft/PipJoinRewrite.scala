package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite a point-in-polygon THETA join into the
  * cell-partitioned EQUI join (the plan-level promotion of SURVEY.md §4
  * item 1, reference semantics /root/reference/lib/utils.py:676-702).
  *
  * {{{
  * SELECT ... FROM points p JOIN polys t ON graft_st_contains(t.ring, p.lon, p.lat)
  * }}}
  *
  * planned naively is a BroadcastNestedLoopJoin / CartesianProduct — every
  * point against every polygon, O(|P|·|T|) exact ray casts. The rule rewrites
  * to:
  *
  * {{{
  * points + cell_at(lon, lat, L)
  *   ⋈ (polys + explode(cover_cells(ring, L)) → (cell, interior))  ON cell
  * filtered by (interior OR st_contains(ring, lon, lat))
  * }}}
  *
  * — a hash equi-join on a long key with the interior-cell fast path, the
  * same shape the PipJoin library operator builds by hand. Each polygon
  * lists each cover cell once and each point has one cell, so no duplicate
  * (point, polygon) pairs arise and results are exactly the theta join's.
  *
  * The rule fires only on an INNER join whose condition contains a
  * `PipContains` conjunct with the ring on one side and the point
  * coordinates on the other (any remaining conjuncts are kept in the
  * post-join filter). Cover level: `spark.graft.pip.level` (default 6).
  * Runs inside the operator-optimization batch, so pushdown/broadcast
  * selection apply to the rewritten plan in the same fixed point; the
  * rewritten join has no PipContains in its condition, so the rule cannot
  * re-fire on its own output.
  */
object PipJoinRewrite extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val cs = conjuncts(cond)
      val hit = cs.collectFirst {
        case pc @ CellExpressions.PipContains(ring, px, py)
          if pc.deterministic &&
            ring.references.subsetOf(right.outputSet) &&
            (px.references ++ py.references).subsetOf(left.outputSet) =>
          (pc, ring, px, py, false)
        case pc @ CellExpressions.PipContains(ring, px, py)
          if pc.deterministic &&
            ring.references.subsetOf(left.outputSet) &&
            (px.references ++ py.references).subsetOf(right.outputSet) =>
          (pc, ring, px, py, true)
      }
      hit match {
        case Some((pc, ring, px, py, swapped)) =>
          val (ptSide, polySide) = if (swapped) (right, left) else (left, right)
          val level = conf.getConfString("spark.graft.pip.level", "6").toInt

          // point side: __graft_cell = cell_at(px, py, level)
          val cellAlias = Alias(
            CellExpressions.CellAt(px, py, Literal(level)), "__graft_cell")()
          val ptProj = Project(ptSide.output :+ cellAlias, ptSide)

          // polygon side: explode(cover_cells(ring, level)) → struct col
          val cover = CellExpressions.CoverCells(ring, Literal(level))
          val covType = cover.dataType
            .asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType
          val covAttr = AttributeReference("__graft_cov", covType, nullable = false)()
          val generate = Generate(Explode(cover), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(covAttr),
            child = polySide)
          val pcellAlias = Alias(GetStructField(covAttr, 0, Some("cell")), "__graft_pcell")()
          val interiorAlias = Alias(GetStructField(covAttr, 1, Some("interior")), "__graft_interior")()
          val polyProj = Project(polySide.output ++ Seq(pcellAlias, interiorAlias), generate)

          val equi = EqualTo(cellAlias.toAttribute, pcellAlias.toAttribute)
          val newJoin = Join(ptProj, polyProj, Inner, Some(equi), hint)
          // exact refine (skipped for interior cells) + any remaining conjuncts
          val refine = Or(interiorAlias.toAttribute, pc)
          val filterCond = (refine +: cs.filterNot(_ eq pc)).reduce(And)
          Project(j.output, Filter(filterCond, newJoin))
        case None => j
      }
  }
}
