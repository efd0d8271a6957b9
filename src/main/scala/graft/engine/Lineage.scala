package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage from the ANALYZED logical plan: which source
  * table columns feed each output column. The governance question every
  * data platform eventually asks ("where did this column come from?"),
  * answered from the same resolved plan Catalyst optimizes — no SQL
  * re-parsing, no regex, correct through aliases, expressions, joins,
  * aggregates, windows and CTEs (CTERelationRef leaves resolve back
  * through their WithCTE definitions).
  *
  * Driver-side plan analysis only — nothing executes. Source columns
  * are named `view.column` using the nearest SubqueryAlias over each
  * leaf relation (the engine registers every input under its config
  * name, A4, so lineage speaks the job's own vocabulary).
  */
object Lineage {

  /** (output_column, source_table, source_column) triples, sorted. */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed

    // leaf attribute -> (table, column): walk down remembering the
    // closest alias above each TRUE leaf (CTE refs are not leaves here)
    val leafNames = scala.collection.mutable.Map.empty[ExprId, (String, String)]
    def collectLeaves(p: LogicalPlan, alias: Option[String]): Unit = p match {
      case s: SubqueryAlias => collectLeaves(s.child, Some(s.alias))
      case w: WithCTE =>
        w.cteDefs.foreach(d => collectLeaves(d.child, None))
        collectLeaves(w.plan, alias)
      case _: CTERelationRef => ()
      case l: LeafNode =>
        l.output.foreach(a => leafNames(a.exprId) = (alias.getOrElse("?"), a.name))
      case other => other.children.foreach(collectLeaves(_, alias))
    }
    collectLeaves(plan, None)

    // attribute -> set of leaf attributes it derives from, built
    // bottom-up; CTE definitions resolve first so refs can link their
    // positional outputs back through the definition's lineage
    val cteOut = scala.collection.mutable.Map.empty[Long, Seq[(Attribute, Set[ExprId])]]
    def resolve(p: LogicalPlan): Map[ExprId, Set[ExprId]] = p match {
      case w: WithCTE =>
        w.cteDefs.foreach { d =>
          val m = resolve(d.child)
          cteOut(d.id) = d.child.output.map(a =>
            a -> m.getOrElse(a.exprId, Set(a.exprId)))
        }
        resolve(w.plan)
      case ref: CTERelationRef =>
        val defs = cteOut.getOrElse(ref.cteId, Nil)
        ref.output.zip(defs).map { case (out, (_, leaves)) =>
          out.exprId -> leaves
        }.toMap
      case l: LeafNode =>
        l.output.map(a => a.exprId -> Set(a.exprId)).toMap
      case u: Union =>
        // A Union's output reuses the FIRST child's exprIds, so the
        // generic pass-through would silently drop every later branch's
        // sources. Map each child's i-th output onto the union's i-th
        // output positionally (post-analysis unionByName is already a
        // positional Union over aligned Projects) and union the leaves.
        val childMaps = u.children.map(resolve)
        val merged = childMaps.foldLeft(Map.empty[ExprId, Set[ExprId]])(_ ++ _)
        merged ++ u.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
            val a = c.output(i)
            m.getOrElse(a.exprId, Set(a.exprId))
          }.toSet
        }.toMap
      case n =>
        val childMap = n.children.map(resolve).foldLeft(
          Map.empty[ExprId, Set[ExprId]])(_ ++ _)
        def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Set[ExprId] =
          e.references.toSeq.flatMap(a => childMap.getOrElse(a.exprId, Set(a.exprId))).toSet
        val named: Seq[NamedExpression] = n match {
          case proj: Project => proj.projectList
          case agg: Aggregate => agg.aggregateExpressions
          case w: Window => w.windowExpressions
          case _ => Nil
        }
        val introduced = named.collect {
          case al: Alias => al.exprId -> ofExpr(al.child)
          case a: Attribute => a.exprId -> childMap.getOrElse(a.exprId, Set(a.exprId))
        }.toMap
        // non-projecting nodes (Filter/Join/Distinct/SubqueryAlias/...)
        // pass child lineage through untouched
        childMap ++ introduced
    }
    val resolved = resolve(plan)

    plan.output.flatMap { out =>
      resolved.getOrElse(out.exprId, Set.empty).toSeq
        .flatMap(leafNames.get)
        .map { case (tbl, colName) => (out.name, tbl, colName) }
    }.distinct.sorted
  }
}
