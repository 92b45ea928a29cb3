package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExprId, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.DataType

/** Planner strategy (injected by [[graft.GraftExtensions]], VERDICT r14
  * #1): claims `UPDATE` and `MERGE INTO` on [[GraftTable]] relations —
  * the two row-level SQL commands Spark's built-in planner refuses for
  * tables without `SupportsRowLevelOperations` — and lowers them onto
  * the lake's merge-on-read machinery
  * ([[graft.lake.SnapshotLakeCatalog.commitRowLevel]]): ONE atomic
  * snapshot that position-deletes the touched rows and appends their new
  * versions plus inserts. This is the SQL completion of the reference's
  * `key_properties` upsert contract
  * (`/root/reference/target_iceberg/sinks.py:25,31`) — replace-by-
  * predicate rather than replace-by-key, same commit discipline.
  *
  * Runs BEFORE Spark's `BasicOperators` (extension strategies are tried
  * first), sees the fully-resolved command (assignments/actions aligned
  * and typed by the analyzer), and executes at most once — both commands
  * are eagerly-executed `Command` nodes. Non-graft targets pass through
  * untouched (`Nil`). */
case class GraftRowLevelStrategy(spark: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u: UpdateTable =>
      graftTarget(u.table).map { case (t, out) =>
        GraftRowLevelExec("UPDATE", t.name(),
          () => GraftRowLevel.runUpdate(spark, t, out, u)) :: Nil
      }.getOrElse(Nil)
    case m: MergeIntoTable =>
      graftTarget(m.targetTable).map { case (t, out) =>
        GraftRowLevelExec("MERGE INTO", t.name(),
          () => GraftRowLevel.runMerge(spark, t, out, m)) :: Nil
      }.getOrElse(Nil)
    // DELETE also routes here (not through SupportsDelete): on a
    // partitioned table the pushdown pass wraps the relation in a
    // column-reordering Project that Spark's own DeleteFromTable
    // planning refuses as "unexpected table relation", and the Column
    // conversion below accepts every deterministic condition, not just
    // the v1-Filter-translatable subset
    case d: DeleteFromTable =>
      graftTarget(d.table).map { case (t, out) =>
        GraftRowLevelExec("DELETE", t.name(),
          () => GraftRowLevel.runDelete(spark, t, out, d)) :: Nil
      }.getOrElse(Nil)
    case _ => Nil
  }

  /** The graft table under the command target, plus the attribute list
    * the command's expressions were resolved against. The optimizer's
    * V2ScanRelationPushDown may already have turned the relation into a
    * [[DataSourceV2ScanRelation]] (it rewrites relations even under
    * commands it cannot plan) — the exprIds survive that hop, so either
    * node's output re-keys the clauses. */
  private def graftTarget(p: LogicalPlan)
      : Option[(GraftTable, Seq[Attribute])] = {
    // the optimizer may wrap the relation in a pure column-reordering
    // Project (the native scan serves partition columns last; column
    // pruning restores the declared order) — attribute-only Projects
    // and aliases are transparent, the exprIds pass straight through
    def peel(q: LogicalPlan): Option[GraftTable] = q match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if sr.relation.table.isInstanceOf[GraftTable] =>
        Some(sr.relation.table.asInstanceOf[GraftTable])
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        peel(pr.child)
      case _ => None
    }
    val stripped = EliminateSubqueryAliases(p)
    peel(stripped).map(t => (t, stripped.output))
  }
}

/** Driver-side command node for the row-level SQL commands: `output` is
  * empty (both commands return no rows) and the work happens exactly once
  * at eager command execution — the thunk orchestrates distributed
  * DataFrame jobs (scan, join, delta write) and one lake commit. */
case class GraftRowLevelExec(command: String, tableName: String,
                             run: () => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override protected def doExecute(): RDD[InternalRow] = {
    run()
    sparkContext.emptyRDD[InternalRow]
  }
  override def simpleString(maxFields: Int): String =
    s"GraftRowLevelExec $command $tableName"
}

private[sql] object GraftRowLevel {

  private val SrcPrefix = "__graft_src_"
  private val ActTag = "__graft_action"

  /** Re-key a resolved command expression onto the executor's frames:
    * every [[AttributeReference]] becomes an [[UnresolvedAttribute]] of
    * the column name that attribute's row wears in the joined delta
    * frame (target columns keep their names; source columns were
    * positionally renamed to collision-proof ones). Unknown attributes
    * and correlated subqueries fail loudly — a silently mis-bound
    * assignment would corrupt rows. */
  private def rebind(e: Expression, m: Map[ExprId, String]): Column = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      "subqueries in UPDATE/MERGE clauses are not supported on graft " +
        "tables — rewrite the subquery into the MERGE source")
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(m.getOrElse(a.exprId,
          throw new IllegalStateException(
            s"row-level command references unbound attribute " +
              s"'${a.name}' (#${a.exprId.id})")))
    })
  }

  private def q(c: String): Column = col(s"`$c`")

  /** Top-level assignment map (column name -> value expression); nested
    * fields are refused loudly. */
  private def assignmentMap(as: Seq[org.apache.spark.sql.catalyst.plans
      .logical.Assignment]): Map[String, Expression] =
    as.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> a.value
        case other => throw new UnsupportedOperationException(
          s"assignment to nested field '${other.sql}' is not supported " +
            "on graft tables (top-level columns only)")
      }
    }.toMap

  def runDelete(spark: SparkSession, table: GraftTable,
                targetOut: Seq[Attribute], d: DeleteFromTable): Unit = {
    require(table.pinnedSnapshot.isEmpty,
      s"${table.name()}: cannot DELETE from a time-travel relation")
    val tmap = targetOut.map(a => a.exprId -> a.name).toMap
    table.lake.deleteWhereMOR(table.ns, table.tableName,
      rebind(d.condition, tmap))
  }

  def runUpdate(spark: SparkSession, table: GraftTable,
                targetOut: Seq[Attribute], u: UpdateTable): Unit = {
    require(table.pinnedSnapshot.isEmpty,
      s"${table.name()}: cannot UPDATE a time-travel relation")
    val lake = table.lake
    val (ns, tn) = (table.ns, table.tableName)
    val (scan, readLive) = lake.rowLevelScan(ns, tn)
    if (readLive.isEmpty) return // empty table: nothing to update
    val (fileTag, posTag) = lake.rowLevelPosCols
    val tmap = targetOut.map(a => a.exprId -> a.name).toMap
    val assigns = assignmentMap(u.assignments)
    val cols = scan.columns.filterNot(c => c == fileTag || c == posTag)
    val matched = u.condition.map(c => scan.filter(rebind(c, tmap)))
      .getOrElse(scan)
    val newVals = cols.map { c =>
      val dt = scan.schema(c).dataType
      assigns.get(c).map(e => rebind(e, tmap).cast(dt))
        .getOrElse(q(c)).as(c)
    }
    // one pass over the base: the delta (changed rows only) materializes
    // once, then both the position mask and the new-version dir project
    // off it without re-running the scan
    val delta = matched
      .select(newVals ++ Seq(q(fileTag), q(posTag)): _*)
      .localCheckpoint(true)
    if (delta.isEmpty) return // no matches: no commit
    lake.commitRowLevel(ns, tn,
      delta.select(q(fileTag).as("file_path"), q(posTag).as("pos")),
      delta.select(cols.map(q): _*),
      readLive)
  }

  def runMerge(spark: SparkSession, table: GraftTable,
               targetOut: Seq[Attribute], m: MergeIntoTable): Unit = {
    // MERGE WITH SCHEMA EVOLUTION needs no work here: the analyzer's
    // ResolveMergeIntoSchemaEvolution already ALTERed the table through
    // the catalog (AUTOMATIC_SCHEMA_EVOLUTION capability) and re-keyed
    // the star actions against the evolved, reloaded relation
    require(table.pinnedSnapshot.isEmpty,
      s"${table.name()}: cannot MERGE INTO a time-travel relation")
    val lake = table.lake
    val (ns, tn) = (table.ns, table.tableName)
    val (scan, readLive) = lake.rowLevelScan(ns, tn)
    val (fileTag, posTag) = lake.rowLevelPosCols
    val cols = scan.columns.filterNot(c => c == fileTag || c == posTag)
    cols.find(_.startsWith("__graft")).foreach(c =>
      throw new UnsupportedOperationException(
        s"MERGE INTO a table with a reserved '__graft*' column ('$c')"))

    // the source subquery, positionally renamed so no name can collide
    // with a target column (MERGE clauses re-key by exprId, so the
    // rename is invisible to them)
    val srcOut = m.sourceTable.output
    val srcNames = srcOut.indices.map(i => s"$SrcPrefix$i")
    val smap = srcOut.zipWithIndex
      .map { case (a, i) => a.exprId -> s"$SrcPrefix$i" }.toMap
    val tmap = targetOut.map(a => a.exprId -> a.name).toMap
    val amap = tmap ++ smap
    val srcPresent = s"${SrcPrefix}present"
    val src = GraftSqlBridge.ofRows(spark, m.sourceTable)
      .toDF(srcNames: _*).withColumn(srcPresent, lit(true))

    // keep exactly the unmatched sides an action consumes
    val joinType =
      (m.notMatchedActions.nonEmpty, m.notMatchedBySourceActions.nonEmpty) match {
        case (true, true)   => "full_outer"
        case (true, false)  => "right_outer"
        case (false, true)  => "left_outer"
        case (false, false) => "inner"
      }
    val joined = scan.join(src, rebind(m.mergeCondition, amap), joinType)
    val tPresent = q(posTag).isNotNull
    val sPresent = q(srcPresent).isNotNull

    // global action index: first-match-wins within each clause group,
    // -1 = untouched (matched rows with no applicable action carry over
    // by NOT being masked — merge-on-read's free carry)
    sealed trait Kind
    case object Upd extends Kind; case object Del extends Kind
    case object Ins extends Kind
    def kindOf(a: MergeAction): (Kind, Map[String, Expression]) = a match {
      case ua: UpdateAction => (Upd, assignmentMap(ua.assignments))
      case _: DeleteAction  => (Del, Map.empty)
      case ia: InsertAction => (Ins, assignmentMap(ia.assignments))
      case _: UpdateStarAction | _: InsertStarAction =>
        throw new IllegalStateException(
          "unexpanded star action reached the planner — analyzer bug")
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action: $other")
    }
    val all: Seq[(MergeAction, Int)] =
      (m.matchedActions ++ m.notMatchedActions ++
        m.notMatchedBySourceActions).zipWithIndex
    val kinds = all.map { case (a, i) => i -> kindOf(a) }.toMap
    def chain(actions: Seq[MergeAction], offset: Int): Column =
      actions.zipWithIndex.foldRight(lit(-1): Column) {
        case ((a, i), acc) =>
          val c = a.condition.map(rebind(_, amap)).getOrElse(lit(true))
          when(c, lit(offset + i)).otherwise(acc)
      }
    val nM = m.matchedActions.length
    val nNm = m.notMatchedActions.length
    val actIdx =
      when(tPresent && sPresent, chain(m.matchedActions, 0))
        .when(!tPresent && sPresent, chain(m.notMatchedActions, nM))
        .when(tPresent && !sPresent,
          chain(m.notMatchedBySourceActions, nM + nNm))
        .otherwise(lit(-1))

    val emitIdxs = kinds.collect { case (i, (Upd, _)) => i
                                   case (i, (Ins, _)) => i }.toSeq.sorted
    val maskIdxs = kinds.collect { case (i, (Upd, _)) => i
                                   case (i, (Del, _)) => i }.toSeq.sorted

    // per output column: the value the APPLIED action emits (update:
    // assignment else target's current value; insert: assignment else
    // NULL), cast to the table type
    def emitVal(c: String, dt: DataType): Column =
      emitIdxs.foldRight(lit(null).cast(dt): Column) { (i, acc) =>
        val v = kinds(i) match {
          case (Upd, as) => as.get(c).map(rebind(_, amap).cast(dt))
            .getOrElse(q(c))
          case (Ins, as) => as.get(c).map(rebind(_, amap).cast(dt))
            .getOrElse(lit(null).cast(dt))
          case _ => lit(null).cast(dt)
        }
        when(col(ActTag) === i, v).otherwise(acc)
      }

    // the delta: every row an action touches, PLUS (when matched actions
    // exist) every matched pair — the SQL cardinality rule binds to the
    // ON match, not to whether an action's extra condition applied.
    // Materialized once; the mask, the new rows, and the cardinality
    // check all project off it without re-running the join.
    val needMatchedPairs = m.matchedActions.nonEmpty
    val keep =
      if (needMatchedPairs) col(ActTag) >= 0 || (tPresent && sPresent)
      else col(ActTag) >= 0
    val withIdx = joined.withColumn(ActTag, actIdx).filter(keep)
    val matchedFlag = s"${SrcPrefix}matched"
    val deltaCols =
      cols.map(c => emitVal(c, scan.schema(c).dataType).as(c)) ++ Seq(
        col(ActTag), q(fileTag), q(posTag),
        (tPresent && sPresent).as(matchedFlag))
    val delta = withIdx.select(deltaCols: _*).localCheckpoint(true)

    if (needMatchedPairs) {
      // SQL's merge cardinality rule: a target row matched by more than
      // one source row is an error when matched actions exist
      val dup = delta.filter(col(matchedFlag))
        .groupBy(q(fileTag), q(posTag)).count()
        .filter(col("count") > 1).limit(1)
      if (!dup.isEmpty)
        throw new IllegalStateException(
          "MERGE_CARDINALITY_VIOLATION: a row of the target table " +
            s"$ns.$tn matched more than one source row — deduplicate " +
            "the source or tighten the ON condition")
    }

    def inIdx(idxs: Seq[Int]): Column =
      if (idxs.isEmpty) lit(false) else col(ActTag).isInCollection(idxs)
    val positions = delta
      .filter(inIdx(maskIdxs) && q(posTag).isNotNull)
      .select(q(fileTag).as("file_path"), q(posTag).as("pos")).distinct()
    val rows = delta.filter(inIdx(emitIdxs))
      .select(cols.map(q): _*)
    if (maskIdxs.nonEmpty || emitIdxs.nonEmpty)
      lake.commitRowLevel(ns, tn, positions, rows, readLive)
  }
}
