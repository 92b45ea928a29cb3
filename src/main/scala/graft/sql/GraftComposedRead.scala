package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Resolution rule (injected by `graft.GraftExtensions`): a [[GraftTable]]
  * relation whose snapshot the native file scan cannot represent —
  * merge-on-read delete debt, rename/promotion history, per-generation
  * layouts — is swapped for the library's COMPOSED plan
  * ([[graft.lake.SnapshotLakeCatalog.composedFrame]]): the same
  * delete-anti-join + alias + promotion-cast tree every library read face
  * uses, pinned to the same snapshot the relation was loaded at. The
  * substituted plan keeps the relation's exact output attributes (same
  * exprIds via aliases), so parents never re-resolve.
  *
  * Write commands are left alone — `INSERT INTO` a debt-carrying table
  * must keep its V2 relation (the append face handles debt natively);
  * only the TABLE child of a write is skipped, its query subtree is still
  * rewritten. Tables the native scan CAN represent pass through untouched
  * and plan through [[GraftScan]] (pushdown, stats,
  * KeyGroupedPartitioning). */
case class GraftComposedRead(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
      val nq = rewrite(w.query)
      if (nq eq w.query) w else w.withNewQuery(nq)
    // row-level commands bind to the RELATION itself (DeleteFromTableExec
    // resolves the SupportsDelete table off it) — substituting the table
    // child would break `DELETE FROM` on a debt-carrying table; only the
    // condition's subqueries read-compose
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
      val nc = d.condition.transformUp {
        case se: SubqueryExpression =>
          val np = rewrite(se.plan)
          if (np eq se.plan) se else se.withNewPlan(np)
      }
      if (nc eq d.condition) d else d.copy(condition = nc)
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      val ns = rewrite(m.sourceTable)
      if (ns eq m.sourceTable) m else m.copy(sourceTable = ns)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftComposable] &&
        r.table.asInstanceOf[GraftComposable].needsComposition =>
      val t = r.table.asInstanceOf[GraftComposable]
      val child = t.composedFrame().queryExecution.analyzed
      val byName = child.output.map(a => a.name -> a).toMap
      Project(r.output.map { a =>
        val src = byName.getOrElse(a.name, throw new IllegalStateException(
          s"${r.table.name()}: composed plan lost column '${a.name}'"))
        Alias(src, a.name)(exprId = a.exprId)
      }, child)
    case other =>
      val mapped = other.mapChildren(rewrite)
      mapped.transformExpressions {
        case se: SubqueryExpression =>
          val np = rewrite(se.plan)
          if (np eq se.plan) se else se.withNewPlan(np)
      }
  }
}
