package graft

import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, RangeExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan-shape regression net. Dozens of operators carry
  * individually-spec'd plan shapes; this sweep EXPLAINs every registered
  * query once and asserts the GLOBAL invariants those specs rely on, so a
  * future refactor cannot silently regress a plan the value-level oracle
  * can't see:
  *
  *  1. a `CartesianProductExec` appears only in whitelisted queries, each
  *     justified as a cross of bounded marginals (grids, per-split counts);
  *  2. every `BroadcastNestedLoopJoinExec` broadcasts a BOUNDED side:
  *     a grouping-free aggregate (1-row scalar attach), a literal/local
  *     relation (fixture grids, collected control-plane frames), a small
  *     Range, a top-K (`TakeOrderedAndProject` / `GlobalLimit`), or — for
  *     probe sets and checkpointed bounded marginals, which scan as plain
  *     filtered scans / opaque RDDs — a query on the documented whitelist;
  *  3. an unpartitioned `WindowExec` is auto-accepted when its child
  *     subtree is top-K-bounded, and otherwise appears only in whitelisted
  *     queries, each justified as riding a bounded marginal / grid input
  *     (the r6 low-cardinality-window audit made machine-checkable).
  *
  * Every whitelist entry must be EXERCISED by the shape it excuses — an
  * entry whose query stops planning that shape fails the sweep, so the
  * whitelists cannot rot into blanket exemptions.
  *
  * The sweep PLANS every query (optimizer + physical planning, including
  * any eager localCheckpoint stages the query builds from) but does not
  * execute the final plan — invariants 1–3 are static properties of the
  * initial physical plan; AQE can only improve on them (SMJ→BHJ), never
  * introduce a cartesian or an exchange-free single-partition window. */
class PlanShapeSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries where an unpartitioned WindowExec rides a bounded marginal /
    * grid BY DESIGN and the bound is not statically visible in the plan
    * (checkpointed RDD scans, low-cardinality grouped aggregates). Each
    * query's own spec/scaladoc carries the full argument. Grow this list
    * only with a justification. */
  private val unpartitionedWindowWhitelist: Map[String, String] = Map(
    "q47_month_delta" -> "lag over the per-month revenue marginal (calendar-month grid)",
    "q117_quality_sweep" -> "cumulative over the <=10-row TTR band marginal (band = least(.., 9))",
    "q140_vocab_growth" -> "cumulative types over the <=VocabBands band grid (band = id*B div max)",
    "q149_pareto_frontier" -> "frontier scan over the checkpointed distinct-x marginal",
    "q156_skew_profile" -> "rank-select over checkpointed count-of-counts marginals (r6 audit)",
    "q163_conversion_latency" -> "q91-style block-offset prefix over the bounded per-day gap grid",
    "q177_vocab_sweep" -> "cumulative occurrence share over the checkpointed frequency-class marginal"
  )

  /** BNLJ broadcast sides that are bounded by construction but scan as
    * plain filtered scans or opaque checkpointed RDDs (see each query's
    * scaladoc). */
  private val bnljWhitelist: Map[String, String] = Map(
    "q25_knn_brute" -> "broadcasts the <=10-row probe set (vec_id < 10 pushed to the scan)",
    "q49_knn_agg" -> "broadcasts the <=10-row probe set (vec_id < 10 pushed to the scan)",
    "q132_hard_negatives" -> "broadcasts the <=10-row labeled probe set (vec_id < 10 pushed)",
    // optimization r15: q152/q174's BNLJ (the <=10-row probe-grid
    // broadcast) moved behind probeMeasure's bounded salted-survivor
    // checkpoint — the final inspected plan no longer contains it, so
    // the entries left the whitelist (the sweep's staleness check is
    // exactly what flagged this)
    "q142_sketch_overlap" -> "broadcasts per-source sketch/count marginals (<=|sources| rows)",
    "q162_cluster_histogram" -> "broadcasts the checkpointed 1-row corpus-totals frame"
  )

  /** Cartesians of bounded marginals — never of data-sized inputs. */
  private val cartesianWhitelist: Map[String, String] = Map(
    "q120_split_leakage" -> "cross of two per-split count marginals (<=|splits|^2 = 9 rows)"
  )

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => walk(q.plan)
    case _ => Seq(p) ++ (p.children ++ p.subqueries).flatMap(walk)
  }

  /** STRUCTURAL boundedness — does this plan produce a bounded number of
    * rows regardless of input size? Leaves: a grouping-free aggregate
    * (1 row), a literal relation, a top-K / limit, a small Range.
    * Row-preserving/reducing wrappers recurse; a join is bounded only if
    * BOTH inputs are. Deliberately NOT `walk(...).exists(...)`: a
    * data-sized frame that merely CONTAINS a scalar subtree (the
    * scalar-attach crossJoin pattern) must not pass. Grouped aggregates,
    * windows, and sorts count as bounded only when their INPUT is; opaque
    * RDD scans and file scans are unbounded here and need a whitelist
    * entry instead. */
  private def statBounded(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => statBounded(a.executedPlan)
    case q: QueryStageExec => statBounded(q.plan)
    case agg: BaseAggregateExec if agg.groupingExpressions.isEmpty => true
    case _: LocalTableScanExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: GlobalLimitExec => true
    case r: RangeExec => r.numElements <= BigInt(10000)
    case j: BroadcastNestedLoopJoinExec =>
      statBounded(j.left) && statBounded(j.right)
    case j: CartesianProductExec =>
      statBounded(j.left) && statBounded(j.right)
    case _: org.apache.spark.sql.execution.ProjectExec |
         _: org.apache.spark.sql.execution.FilterExec |
         _: org.apache.spark.sql.execution.SortExec |
         _: org.apache.spark.sql.execution.CollectLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.exchange.Exchange |
         _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec |
         _: org.apache.spark.sql.execution.WholeStageCodegenExec |
         _: org.apache.spark.sql.execution.InputAdapter |
         _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec |
         _: WindowExec |
         _: org.apache.spark.sql.execution.GenerateExec =>
      // grouped aggregates / windows reduce-or-preserve; Generate explodes
      // bounded inputs by a bounded factor in this registry (array grids)
      p.children.forall(statBounded)
    case _ => false
  }

  test("registry sweep: whitelisted cartesians only, bounded BNLJ sides, " +
    "unpartitioned windows only on bounded inputs") {
    // correctness-mode exact self-checks mirror Verify's environment (the
    // plans the oracle actually grades); restored in the finally below so
    // the shared TestSpark session doesn't leak the mode into later suites
    val prevExact = spark.conf.getOption(graft.ops.Similarity.ExactCheckConf)
    spark.conf.set(graft.ops.Similarity.ExactCheckConf, "true")
    try {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val planned = scala.collection.mutable.ArrayBuffer.empty[String]
    val used = scala.collection.mutable.Set.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes =
        try walk(fn(spark, sf).queryExecution.executedPlan)
        catch { case e: Throwable =>
          offenders += s"$name: failed to plan: ${e.getMessage}"
          Seq.empty
        }
      if (nodes.nonEmpty) planned += name
      nodes.foreach {
        case _: CartesianProductExec =>
          if (cartesianWhitelist.contains(name)) used += (("cartesian", name))
          else offenders += s"$name: CartesianProductExec in plan"
        case j: BroadcastNestedLoopJoinExec =>
          val side = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          if (!statBounded(side)) {
            if (bnljWhitelist.contains(name)) used += (("bnlj", name))
            else offenders += s"$name: BNLJ broadcasts an unbounded side: " +
              side.simpleStringWithNodeId()
          }
        case w: WindowExec if w.partitionSpec.isEmpty =>
          if (!statBounded(w.child)) {
            if (unpartitionedWindowWhitelist.contains(name))
              used += (("window", name))
            else offenders += s"$name: unpartitioned WindowExec over " +
              w.child.simpleStringWithNodeId()
          }
        case _ => ()
      }
    }
    assert(planned.size == SparkEntry.queries.size,
      s"planned ${planned.size} of ${SparkEntry.queries.size}")
    assert(offenders.isEmpty,
      s"${offenders.size} plan-shape violations:\n${offenders.mkString("\n")}")
    // the whitelists must not rot: every entry names a live query AND is
    // exercised by the exact shape it excuses
    val unused =
      cartesianWhitelist.keySet.map(("cartesian", _)) ++
        bnljWhitelist.keySet.map(("bnlj", _)) ++
        unpartitionedWindowWhitelist.keySet.map(("window", _)) -- used
    assert(unused.isEmpty, s"whitelist entries no longer exercised: $unused")
    } finally {
      prevExact match {
        case Some(v) => spark.conf.set(graft.ops.Similarity.ExactCheckConf, v)
        case None => spark.conf.unset(graft.ops.Similarity.ExactCheckConf)
      }
    }
  }
}
