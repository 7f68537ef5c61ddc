package graft.explain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/**
 * Column-level lineage derived from the ANALYZED Catalyst plan: every
 * output column of a query maps to the set of `table.column` base
 * columns it derives from. Extends the engine's plan-derived
 * explanation surface (N12, `explain/Explainer.scala`; ref
 * `app/models/inference.py:337-369` explains queries rule-wise — this
 * answers the follow-up a data platform needs: *which* upstream
 * columns feed each answer column, the provenance/impact-analysis
 * question at lake scale).
 *
 * Pure plan traversal — nothing executes, no jobs launch; cost is
 * independent of data size (a compile-time capability, safe to expose
 * on untrusted questions AFTER the Validator admits the statement).
 *
 * Mechanics: a bottom-up pass assigns each attribute ExprId the set
 * of base columns it derives from. Leaves qualify columns by the
 * nearest enclosing SubqueryAlias (how analyzed plans name view
 * reads); Project/Aggregate/Window aliases union the lineage of every
 * attribute their child expression references, descending into scalar
 * and IN subquery plans; Union and Expand merge positionally across
 * branches; WithCTE threads each definition's lineage to its
 * CTERelationRef readers; every other node passes its children's map
 * through. This is DATA lineage (what feeds the value), not control
 * lineage — filter/join predicates do not contribute.
 */
object Lineage {

  /** One output column and the sorted base columns feeding it. */
  final case class ColumnLineage(column: String, sources: Seq[String])

  def of(spark: SparkSession, sql: String): Seq[ColumnLineage] =
    of(spark.sql(sql))

  def of(df: DataFrame): Seq[ColumnLineage] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan, None, Map.empty)
    plan.output.map(a =>
      ColumnLineage(a.name, m.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted))
  }

  /** Lineage as a DataFrame (column, sources array) for API surfaces. */
  def frame(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    of(spark, sql).map(c => (c.column, c.sources)).toDF("column", "sources")
  }

  /** Base columns referenced by `e` under the child lineage map,
    * descending into subquery plans (a scalar subquery's value derives
    * from its inner plan's output columns plus any correlated outer
    * attributes, which Catalyst exposes through `references`). */
  private def refs(e: Expression, childMap: Map[ExprId, Set[String]],
      ctes: Map[Long, Seq[Set[String]]]): Set[String] = {
    val direct = e.references.toSeq
      .flatMap(a => childMap.getOrElse(a.exprId, Set.empty[String])).toSet
    val inner = e.collect { case s: SubqueryExpression =>
      val m = build(s.plan, None, ctes)
      s.plan.output.flatMap(a => m.getOrElse(a.exprId, Set.empty[String])).toSet
    }.flatten.toSet
    direct ++ inner
  }

  private def named(ns: Seq[NamedExpression], childMap: Map[ExprId, Set[String]],
      ctes: Map[Long, Seq[Set[String]]]): Map[ExprId, Set[String]] =
    ns.collect {
      case a: Alias => a.exprId -> refs(a.child, childMap, ctes)
      case a: Attribute => a.exprId -> childMap.getOrElse(a.exprId, Set.empty[String])
    }.toMap

  private def build(plan: LogicalPlan, alias: Option[String],
      ctes: Map[Long, Seq[Set[String]]]): Map[ExprId, Set[String]] =
    plan match {
      case SubqueryAlias(id, child) =>
        // nearest alias wins: it re-qualifies the leaf columns it names
        build(child, Some(id.name), ctes)
      case w: WithCTE =>
        // defs may reference earlier defs: fold left-to-right
        val ctx = w.cteDefs.foldLeft(ctes) { (acc, d) =>
          val m = build(d.child, None, acc)
          acc + (d.id ->
            d.child.output.map(a => m.getOrElse(a.exprId, Set.empty[String])))
        }
        build(w.plan, alias, ctx)
      case r: CTERelationRef =>
        val defOut = ctes.getOrElse(r.cteId, Seq.empty)
        r.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> defOut.lift(i).getOrElse(Set.empty[String])
        }.toMap
      case l: LeafNode =>
        val table = alias.getOrElse(l match {
          case rel: LogicalRelation =>
            rel.catalogTable.map(_.identifier.table).getOrElse("relation")
          case _ => l.nodeName.toLowerCase
        })
        l.output.map(a => a.exprId -> Set(s"$table.${a.name}")).toMap
      case p: Project =>
        val cm = mergedChildren(p, alias, ctes)
        cm ++ named(p.projectList, cm, ctes)
      case a: Aggregate =>
        val cm = mergedChildren(a, alias, ctes)
        cm ++ named(a.aggregateExpressions, cm, ctes)
      case w: Window =>
        val cm = mergedChildren(w, alias, ctes)
        cm ++ named(w.windowExpressions, cm, ctes)
      case g: Generate =>
        val cm = mergedChildren(g, alias, ctes)
        val src = refs(g.generator, cm, ctes)
        cm ++ g.generatorOutput.map(a => a.exprId -> src).toMap
      case e: Expand =>
        // grouping-set projections: output column i unions branch exprs at i
        val cm = mergedChildren(e, alias, ctes)
        e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap(row => refs(row(i), cm, ctes)).toSet
        }.toMap
      case u: Union =>
        // positional merge: output attr i derives from every child's attr i
        val childMaps = u.children.map(build(_, None, ctes))
        val merged = childMaps.foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[String])
          }.toSet
        }.toMap
      case other =>
        mergedChildren(other, alias, ctes)
    }

  private def mergedChildren(p: LogicalPlan, alias: Option[String],
      ctes: Map[Long, Seq[Set[String]]]): Map[ExprId, Set[String]] =
    p.children.map(build(_, alias, ctes))
      .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
}
