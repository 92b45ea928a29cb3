package graft.ops

import graft.TestSpark
import graft.lake.SessionLakeCatalog
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** One label propagation feeds every cluster consumer (VERDICT r5 advisory):
  * q70/q80/q94/q107 in a session share a single converged assignment via the
  * per-(session, dir) memo, and the [[Dedup.clustersTable]] materialization
  * feeds the same four report shapes bit-identically across sessions. */
class DupClusterReuseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q70/q80/q94/q107 run ONE propagation between them (memoized fixpoint)") {
    Dedup.invalidateClusterCache()
    val before = Dedup.propagationRuns.get()
    val q70 = rows(Dedup.q70DupClusters(spark, sf))
    val q80 = rows(Dedup.q80LeakageSafeSplit(spark, sf))
    val q94 = rows(Dedup.q94DedupSurvivors(spark, sf))
    val q107 = rows(Dedup.q107SplitBalance(spark, sf))
    assert(q70.nonEmpty && q80.nonEmpty && q94.nonEmpty && q107.nonEmpty)
    assert(Dedup.propagationRuns.get() - before == 1L,
      "four cluster consumers must share one converged propagation")
    // a fifth consumer after invalidation recomputes (cache is refreshable)
    Dedup.invalidateClusterCache()
    rows(Dedup.q70DupClusters(spark, sf))
    assert(Dedup.propagationRuns.get() - before == 2L)
  }

  test("clustersTable materialization feeds all four consumers identically") {
    val ns = s"clu_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    Dedup.invalidateClusterCache()
    val table = Dedup.clustersTable(spark, sf, cat, ns)
    val before = Dedup.propagationRuns.get()
    // consumer faces read the TABLE — no propagation may run below
    val fromTable = Seq(
      rows(Dedup.clustersOf(table)),
      rows(Dedup.splitSummaryOf(spark, sf, table)),
      rows(Dedup.survivorsOf(spark, sf, table)),
      rows(Dedup.splitBalanceOf(spark, sf, table)))
    assert(Dedup.propagationRuns.get() == before,
      "table-fed consumers must not re-run propagation")
    val registered = Seq(
      rows(Dedup.q70DupClusters(spark, sf)),
      rows(Dedup.q80LeakageSafeSplit(spark, sf)),
      rows(Dedup.q94DedupSurvivors(spark, sf)),
      rows(Dedup.q107SplitBalance(spark, sf)))
    assert(fromTable == registered,
      "materialized-table consumers must match the registered forms")
    cat.dropNamespace(ns)
  }

  test("candidate pairs derive ONCE across q23/q60/q101/q109/q128 (memoized)") {
    Dedup.invalidateClusterCache()
    val pairsBefore = Dedup.pairDerivations.get()
    val truthBefore = Dedup.truthDerivations.get()
    Dedup.q23DedupMinhash(spark, sf).collect()
    Dedup.q60DedupMultiSignal(spark, sf).collect()
    Dedup.q101Containment(spark, sf).collect()
    Dedup.q108NgramJaccard(spark, sf).collect()
    Dedup.q109DedupRecall(spark, sf).collect()
    Dedup.q128IncrementalNearDup(spark, sf).collect()
    assert(Dedup.pairDerivations.get() == pairsBefore + 1,
      "the standard-cap pair list must derive exactly once")
    assert(Dedup.truthDerivations.get() == truthBefore + 1,
      "the n-gram truth must derive exactly once (q109 reuses q108's)")
  }
}
