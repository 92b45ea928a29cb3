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
    * n_appended, n_preexisting — the columns always sum: n_incoming =
    * n_dup + n_gated + n_appended + n_preexisting, where n_preexisting
    * counts gate-passers absorbed by the curated-table doc_id guard —
    * crash replays and upstream id reuse).
    * Scale shape: the q133 decision joins (index bands
    * equi-join, bucket-capped) + one append per table. */
  def curateIncrement(s: SparkSession, incoming: DataFrame,
                      catalog: graft.lake.LakeCatalog, ns: String,
                      sigTable: String = "dedup_signatures",
                      curatedTable: String = "documents_curated"): DataFrame = {
    val plan = curateDecide(s, incoming, catalog, ns, sigTable, curatedTable)
    curateCommit(catalog, ns, sigTable, curatedTable, plan)
    plan.report
  }

  /** One epoch's curation decisions, fully materialized BEFORE any lake
    * write — shared verbatim by the batch face ([[curateIncrement]]) and
    * the streaming face ([[curateStream]]), the q124 one-definition-two-
    * modes convention. `kept`/`sigs` are localCheckpointed bounded frames;
    * `report` carries values already computed, so a caller can persist it
    * first and commit the data after (the crash-safe ordering — see
    * [[curateCommit]]). */
  private[ops] final case class EpochPlan(report: DataFrame,
                                          kept: DataFrame, sigs: DataFrame)

  private[ops] def curateDecide(s: SparkSession, incoming: DataFrame,
                                catalog: graft.lake.LakeCatalog, ns: String,
                                sigTable: String,
                                curatedTable: String): EpochPlan = {
    // bootstrap: a from-scratch stream's first epoch has no index yet —
    // an empty frame with the signaturesTable schema means "nothing seen".
    // Columns derive from `id` (not literals) so Catalyst cannot constant-
    // fold the band-key element_at over a foldable empty array.
    val index =
      if (catalog.tableExists(ns, sigTable)) catalog.load(ns, sigTable)
      else s.range(0).select(col("id").as("doc_id"),
        col("id").cast("string").as("fp"),
        array(col("id")).as("mh"))
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
    val keptAll = TextOps.gateDecisionsOf(survivors).filter(col("gate_pass"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"),
        TextOps.splitName(TextOps.splitBucket("doc_id")).as("split"))
      .localCheckpoint(true) // counted AND guarded below
    // Crash-replay guard (the annIngestSink key-anti-join shape): a doc
    // whose id is already in the curated table must not append twice. Two
    // ways to get here: a previous attempt of this same batch crashed
    // between its curated append and its signature append (the replay this
    // guard exists for), or the UPSTREAM reused a doc_id for different
    // text (a key violation — first write wins; the new text's signature
    // still joins the index under the keeper id, so future copies of it
    // dedup, and the drop is NOT silent: it lands in the ledger's
    // n_preexisting column, which keeps every epoch report balanced:
    // n_incoming = n_dup + n_gated + n_appended + n_preexisting).
    val keptAllN = keptAll.count()
    val kept = catalog.exceptExistingKeys(ns, curatedTable, "doc_id", keptAll)
      .localCheckpoint(true) // appended AND counted
    val sigs = survivors.select(col("doc_id"),
      expr("norm_md5(text)").as("fp"),
      expr("shingle_minhash(text)").as("mh"))
    val nInc = incoming.count()
    val nDup = dupIds.count()
    val nGated = survivors.count() - keptAllN
    val nKept = kept.count()
    import s.implicits._
    EpochPlan(
      Seq((nInc, nDup, nGated, nKept, keptAllN - nKept))
        .toDF("n_incoming", "n_dup", "n_gated", "n_appended",
          "n_preexisting"),
      kept, sigs)
  }

  /** Commit one decided epoch: curated rows FIRST, signatures second.
    * This ordering makes every crash point replay-exact (each append is an
    * atomic catalog commit; "replay" = the same batch runs [[curateDecide]]
    * again against whatever state persisted):
    *  - crash before the curated append: nothing persisted, replay redoes
    *    the epoch from scratch;
    *  - crash between the appends: the signature index is unchanged, so
    *    replay recomputes the SAME survivors; the curated guard anti-joins
    *    the already-appended rows away and only the signature append runs;
    *  - crash after both: every incoming doc is an index hit on replay —
    *    the whole epoch is a no-op.
    * The reverse order (signatures first — the pre-round-9 layout) loses a
    * kept doc forever when the crash lands between the appends: replay
    * classifies it as a dup before it ever reached the curated table. */
  private[ops] def curateCommit(catalog: graft.lake.LakeCatalog, ns: String,
                                sigTable: String, curatedTable: String,
                                plan: EpochPlan): Unit = {
    catalog.ensureTable(ns, curatedTable, plan.kept.schema)
    catalog.append(ns, curatedTable, plan.kept)
    catalog.ensureTable(ns, sigTable, plan.sigs.schema)
    catalog.append(ns, sigTable, plan.sigs)
  }

  /** The streaming curation face — the three index-maintenance sinks plus
    * the gate/split rules composed into ONE `foreachBatch` call: every
    * micro-batch of crawl docs is intra-batch deduped, deduped against the
    * persisted signature index, quality-gated, split-labeled, appended to
    * the curated table, signature-indexed for future epochs, and its
    * 1-row ingest report ledgered by epoch — [[curateIncrement]] run as a
    * stream, byte-identical decisions because it IS [[curateDecide]] +
    * [[curateCommit]] (the q124 one-definition-two-modes convention).
    *
    * Exactly-once across mid-epoch crashes, by ordering alone: the epoch
    * report (computed wholly from pre-epoch state) lands FIRST under an
    * epoch-key anti-join (the statsSink ledger guard), so however the
    * crash interleaves with the data appends, the ledger keeps the
    * original true counts and [[curateCommit]]'s replay analysis covers
    * the tables. Per-epoch read cost: the signature index (the dedup
    * input), the curated table's doc_id column (the guard), and the
    * report table's epoch column — bucket the first two by their keys on
    * a long-lived ingest. */
  def curateStream(docs: DataFrame, catalog: graft.lake.LakeCatalog,
                   ns: String, checkpointDir: String,
                   sigTable: String = "dedup_signatures",
                   curatedTable: String = "documents_curated",
                   reportTable: String = "curation_epochs")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], epoch: Long) =>
        val s = batch.sparkSession // cloned session per epoch
        graft.functions.TextHashExprs.register(s)
        val plan = curateDecide(s, batch.toDF(), catalog, ns,
          sigTable, curatedTable)
        val rep = plan.report.withColumn("epoch", lit(epoch))
          .select("epoch", "n_incoming", "n_dup", "n_gated", "n_appended",
            "n_preexisting")
        val ledgered = catalog.exceptExistingKeys(ns, reportTable,
          "epoch", rep, distinctKeys = true)
        catalog.ensureTable(ns, reportTable, ledgered.schema)
        catalog.append(ns, reportTable, ledgered)
        curateCommit(catalog, ns, sigTable, curatedTable, plan)
        Streaming.CrashHook.fire()
      }
      .start()

  /** Retention / right-to-be-forgotten purge — the lifecycle face the
    * curation tables need once data may not be kept forever: remove the
    * given doc_ids from the curated table AND the signature index in one
    * call, via the catalog's copy-on-write row delete
    * ([[graft.lake.SnapshotLakeCatalog.purgeKeys]] — only file groups
    * containing a match are rewritten, so a purge of yesterday's crawl on
    * a 100 TB table touches yesterday's files, not the table). Signatures
    * go too: a MinHash/fingerprint is data DERIVED from the content being
    * forgotten. Two documented consequences, both by design:
    *  - re-ingesting identical content later re-adds it (its signatures
    *    are gone) — retiring is not banning; pair with an upstream block
    *    list when the content must stay out;
    *  - the purged rows remain time-travelable in older snapshots until
    *    `expireSnapshots` runs — a COMPLETE forget is retire + expire,
    *    exactly Iceberg's own GDPR guidance.
    * Returns a 1-row report (rows purged per table). Idempotent: a replay
    * matches nothing and publishes no snapshot. */
  def retireDocuments(catalog: graft.lake.SnapshotLakeCatalog, ns: String,
                      docIds: DataFrame,
                      curatedTable: String = "documents_curated",
                      sigTable: String = "dedup_signatures"): DataFrame = {
    val s = docIds.sparkSession
    def purge(table: String): Long =
      if (catalog.tableExists(ns, table))
        catalog.purgeKeys(ns, table, "doc_id", docIds)
      else 0L
    val nCur = purge(curatedTable)
    val nSig = purge(sigTable)
    import s.implicits._
    Seq((nCur, nSig)).toDF("n_purged_curated", "n_purged_signatures")
  }

  /** The curation scoreboard over a materialized curated table: per
    * (split, lang) — kept docs and exact char mass. Reads the LAKE table,
    * so any later session can audit a curation it didn't run. */
  def curationReport(curated: DataFrame): DataFrame =
    curated.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("split", "lang")
}
