package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline a training-data user actually runs —
  * the single-call composition of the operator families this library
  * verifies one by one: exact+near dedup (the q129 ledger), Gopher-style
  * quality gating (the q74 rules), leakage-safe cluster-aware splitting
  * (the q80 assignment), materialized to lake tables through any
  * [[graft.lake.LakeCatalog]].
  *
  * Everything rides the session memos (ledger, dup labels) and the shared
  * per-doc rule definitions ([[TextOps.gateDecisions]],
  * [[Dedup.splitAssigned]]) — the pipeline cannot disagree with the
  * operators the oracle gate verifies, because it runs the same code.
  *
  * Scale shape: three id-keyed joins against the corpus scan (two
  * left-semi from bounded decision frames, one split hookup), one write.
  * On a real cluster, partition the curated table by `split` (pass
  * `partitionBy`) so epoch readers prune to their split. */
object Pipeline {
  import Tables._

  /** Run the full curation chain and materialize `ns.table`:
    * keep = ledger-keep ∧ gate-pass, each kept doc labeled with its
    * leakage-safe split. Returns the table read BACK from the catalog
    * (the production contract: consumers read the lake, not the plan). */
  def curateCorpus(s: SparkSession, d: String,
                   catalog: graft.lake.LakeCatalog, ns: String,
                   table: String = "documents_curated",
                   partitionBy: Seq[String] = Nil): DataFrame = {
    val keeps = Dedup.q129DedupLedger(s, d)
      .filter(col("action") === "keep").select("doc_id")
    val pass = TextOps.gateDecisions(s, d)
      .filter(col("gate_pass")).select("doc_id")
    val splits = Dedup.splitAssigned(s, d).select("doc_id", "split")
    val curated = documents(s, d)
      .join(keeps, Seq("doc_id"), "left_semi")
      .join(pass, Seq("doc_id"), "left_semi")
      .join(splits, "doc_id")
      .select("doc_id", "text", "lang", "source", "n_chars", "split")
    catalog.ensureNamespace(ns)
    catalog.ensureTable(ns, table, curated.schema, partitionBy)
    catalog.overwrite(ns, table, curated)
    catalog.load(ns, table)
  }

  /** Incremental curation — the production crawl-ingest path: curate an
    * INCOMING document batch against the lake state with ZERO corpus text
    * reads. Dedup decisions ride the persisted signature index
    * ([[Dedup.signaturesTable]] / [[Dedup.dedupAgainstIndex]]: fp exact +
    * banded-MinHash estimate ≥ [[Dedup.DupJaccard]]); survivors pass the
    * SAME gate rules as the batch pipeline; gate-passers append to the
    * curated table with the q80 split convention (a novel doc is its own
    * cluster → split hashes its id). EVERY non-dup incoming doc's
    * signature is appended to the index — dedup is about what was SEEN,
    * curation about what was kept — which also makes a replayed batch a
    * no-op: its docs are all index hits the second time.
    *
    * Returns the 1-row ingest report (n_incoming, n_dup, n_gated,
    * n_appended). Scale shape: the q133 decision joins (index bands
    * equi-join, bucket-capped) + one append per table. */
  def curateIncrement(s: SparkSession, incoming: DataFrame,
                      catalog: graft.lake.LakeCatalog, ns: String,
                      sigTable: String = "dedup_signatures",
                      curatedTable: String = "documents_curated"): DataFrame = {
    val index = catalog.load(ns, sigTable)
    // INTRA-batch dedup first: a crawl batch routinely carries its own
    // copies, which the index (state BEFORE this batch) cannot see. The
    // min-id keeper rule over the batch's own exact + banded-near pair
    // graph — any doc paired with a smaller id drops (the component min
    // always survives; the q129 one-hop discipline)
    val intraDups = Dedup.dedupWithinBatch(s, incoming)
    val crossDups = Dedup.dedupAgainstIndex(s,
        incoming.join(intraDups, Seq("doc_id"), "left_anti"), index)
      .filter(col("match_kind") === "exact" ||
        col("est_jaccard") >= Dedup.DupJaccard)
      .select(col("incoming_id").as("doc_id")).distinct()
    val dupIds = intraDups.unionByName(crossDups)
      .localCheckpoint(true) // read by the survivor filter AND the report
    val survivors = incoming.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // feeds signatures, gate AND the report
    val kept = TextOps.gateDecisionsOf(survivors).filter(col("gate_pass"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"),
        TextOps.splitName(TextOps.splitBucket("doc_id")).as("split"))
      .localCheckpoint(true) // appended AND counted
    catalog.append(ns, sigTable, survivors.select(col("doc_id"),
      expr("norm_md5(text)").as("fp"),
      expr("shingle_minhash(text)").as("mh")))
    catalog.append(ns, curatedTable, kept)
    val nInc = incoming.count()
    val nDup = dupIds.count()
    val nSurv = survivors.count()
    val nKept = kept.count()
    import s.implicits._
    Seq((nInc, nDup, nSurv - nKept, nKept))
      .toDF("n_incoming", "n_dup", "n_gated", "n_appended")
  }

  /** The curation scoreboard over a materialized curated table: per
    * (split, lang) — kept docs and exact char mass. Reads the LAKE table,
    * so any later session can audit a curation it didn't run. */
  def curationReport(curated: DataFrame): DataFrame =
    curated.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("split", "lang")
}
