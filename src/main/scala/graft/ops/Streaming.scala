package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import java.sql.Timestamp

/** Typed event row for the custom-state operator. */
final case class EventRow(ts: Timestamp, user_id: Long,
                          event_type: String, value: Double)

/** Evolving per-user state carried across micro-batches. */
final case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
                           last_seen_epoch: Long) {
  def mean: Double = if (n_events == 0) 0.0 else sum_value / n_events
}

/** A user's open session (millis) while it accumulates. */
final case class OpenSession(startMs: Long, lastMs: Long,
                             n: Long, sum: Double)

/** One COMPLETED session — the only thing [[Streaming.closedSessions]]
  * ever emits. */
final case class ClosedSession(user_id: Long, start_epoch: Long,
                               end_epoch: Long, n_events: Long,
                               sum_value: Double)

/** Streaming analytics over the `events` stream (SURVEY.md §2.C7), built on
  * the batch/stream-unified operators: `window()` tumbling aggregation and
  * `session_window()` sessionization run identically over a bounded DataFrame
  * (verified against the DuckDB oracle here) and over `readStream` input
  * (verified with watermark/late-data unit tests in StreamingSpec).
  *
  * Scale design: tumbling windows shuffle on (window, key) with map-side
  * partial aggregation; session windows shuffle on the session key (user),
  * state is bounded by `withWatermark` in streaming mode (RocksDB state store
  * at production scale). */
object Streaming {
  import Tables._

  val SessionGapHours = 12 // ONE constant drives Spark AND the oracle SQL
  val SessionGap = s"$SessionGapHours hours"

  /** Batch/stream-unified tumbling hourly aggregation — the transform is a
    * function of the input frame, so the same code serves readStream. */
  def tumblingHourly(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** Batch/stream-unified sessionization: events from one user belong to one
    * session while gaps stay under [[SessionGap]]. */
  def sessionized(df: DataFrame): DataFrame =
    df.groupBy(session_window(col("ts"), SessionGap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))

  /** Streaming entry: the same transforms over a readStream source with a
    * watermark bounding state (late events beyond 1h are dropped). */
  def tumblingHourlyStream(events: DataFrame): DataFrame =
    tumblingHourly(events.withWatermark("ts", "1 hour"))

  def sessionizedStream(events: DataFrame): DataFrame =
    sessionized(events.withWatermark("ts", "1 hour"))

  /** Streaming exact dedup (C1's streaming face): drop re-delivered events
    * by id. `dropDuplicatesWithinWatermark` keeps one state entry per id
    * only until the watermark passes it, so state is bounded by the event
    * rate x horizon — a plain `dropDuplicates` on a stream retains every id
    * forever and OOMs the state store at production volume. */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom arbitrary state beyond what session/tumbling windows express
    * (SURVEY §2.C7 "custom state"): per-user running count/sum/mean carried
    * across micro-batches via `mapGroupsWithState`. State is one small
    * record per user, partitioned by the group key — at production scale the
    * state store (RocksDB) holds it off-heap and the processing-time timeout
    * evicts idle users. */
  def userRunningStats(s: SparkSession, events: DataFrame,
                       idleTimeout: Option[String] = None): Dataset[UserStats] = {
    import s.implicits._
    // Processing-time timeouts make Spark schedule extra no-data batches to
    // fire them, so the eviction policy is opt-in (set it in production
    // deployments; leave off where processAllAvailable-style draining is
    // expected to terminate).
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.select("ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](timeoutConf) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            // idle eviction: REMOVE the state (the whole point of the
            // timeout) and emit the final stats once. Without this branch
            // the timeout invocation would re-update + re-arm — a forever
            // loop of duplicate rows and state that never shrinks.
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, 0L))
            var n = prev.n_events
            var sum = prev.sum_value
            var last = prev.last_seen_epoch
            rows.foreach { r =>
              n += 1; sum += r.value
              last = math.max(last, r.ts.getTime / 1000)
            }
            val next = UserStats(uid, n, sum, last)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration) // evict idle users
            next
          }
      }
  }

  /** Batch face of [[userRunningStats]], registered as q143: the SAME
    * `mapGroupsWithState` operator run in batch mode (Spark executes the
    * stateful fold as one pass per group — the q124 one-definition-two-modes
    * convention, here for arbitrary-stateful aggregation rather than a
    * join). Output money is exact-integer CENTS: the per-user double sum
    * is integral-by-construction (2-decimal values), so rounding the
    * scaled sum is bit-stable against the oracle's own summation order —
    * the repo's exact-money discipline without changing the streaming
    * face's schema. last_seen truncates to whole epoch seconds on both
    * engines. At scale this is a shuffle on user_id with the state fold
    * running once per group — the same cost class as a hash aggregate. */
  def q143UserStats(s: SparkSession, d: String): DataFrame =
    userRunningStats(s, events(s, d)).toDF()
      .select(col("user_id"), col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_cents"),
        col("last_seen_epoch"))
      .orderBy("user_id")

  /** STREAM-STREAM interval join: attribute each purchase to the view
    * events of the same user within the preceding attribution horizon.
    * Both sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can prove when a buffered row can never match
    * again and evict it — join state stays bounded by rate x horizon at
    * any stream length (an unbounded stream-stream join would buffer both
    * streams forever). */
  val AttributionHorizon = "1 hour"

  /** The join core shared by the streaming projection
    * ([[purchaseAttribution]]) and the registered batch face
    * ([[q124PurchaseAttribution]]): ONE definition of the watermark +
    * interval predicate, parameterized only by join type (streaming uses
    * inner — stream-stream outer joins need both watermarks anyway;
    * the batch report keeps view-less purchases via left). */
  private[ops] def purchaseAttributionRaw(views: DataFrame,
                                          purchases: DataFrame,
                                          joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    p.join(v, expr(
      s"""p_user = v_user AND
          v_ts <= p_ts AND
          v_ts >= p_ts - INTERVAL $AttributionHorizon"""), joinType)
      .withColumn("user_id", col("p_user"))
  }

  def purchaseAttribution(views: DataFrame, purchases: DataFrame): DataFrame =
    purchaseAttributionRaw(views, purchases)
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        col("p_value"))

  /** Custom sessionization via `flatMapGroupsWithState` + EVENT-TIME
    * timeout — the state primitive [[userRunningStats]]'s `mapGroupsWithState`
    * can't express: that operator must emit one row per group per batch,
    * while this one emits NOTHING until a session actually closes (by an
    * in-batch gap, or by the watermark passing last-event + gap), so the
    * output is exactly one row per completed session. Compared to
    * `session_window` this surfaces the session's full custom payload and
    * lets the close condition be arbitrary code. State per user is one
    * [[OpenSession]] record; the event-time timeout is watermark-driven, so
    * no-data batches aren't scheduled (the `ProcessingTimeTimeout` caveat on
    * [[userRunningStats]] doesn't apply) and state is reclaimed exactly when
    * the watermark proves the session can no longer grow. */
  def closedSessions(s: SparkSession, events: DataFrame,
                     gap: String = SessionGap): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.OutputMode
    import s.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, "calendar-month session gaps are not supported")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000
    events.select("ts", "user_id", "event_type", "value").as[EventRow]
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[OpenSession]) =>
          def close(c: OpenSession) =
            ClosedSession(uid, c.startMs / 1000, c.lastMs / 1000, c.n, c.sum)
          if (state.hasTimedOut) {
            val done = state.getOption.map(close).iterator
            state.remove()
            done
          } else {
            val out = scala.collection.mutable.ListBuffer[ClosedSession]()
            var cur = state.getOption
            rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
              val t = r.ts.getTime
              cur match {
                case Some(c) if t - c.lastMs >= gapMs =>
                  out += close(c) // gap crossed inside the batch
                  cur = Some(OpenSession(t, t, 1L, r.value))
                case Some(c) =>
                  // a LATE in-watermark event can predate the open session's
                  // start — widen both bounds (approximation: late events
                  // extend the open session rather than re-splitting
                  // already-closed history, the same trade session_window
                  // makes before its window closes)
                  cur = Some(OpenSession(math.min(c.startMs, t),
                    math.max(c.lastMs, t), c.n + 1, c.sum + r.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1L, r.value))
              }
            }
            cur.foreach { c =>
              state.update(c)
              // fire once the watermark proves no event can extend the session
              state.setTimeoutTimestamp(c.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming ingestion into the lake: every micro-batch appends to a
    * catalog table through the same [[graft.lake.LakeCatalog]] the Singer
    * batch path commits through — one write surface for both worlds.
    * `foreachBatch` is the production shape: the sink sees a plain
    * DataFrame per epoch, the streaming checkpoint records the epoch, and
    * replays of an already-committed epoch are the idempotence concern the
    * caller's catalog handles (a real Iceberg catalog dedups by commit;
    * the parquet-backed local one documents at-least-once). Returns the
    * started query; the caller owns its lifecycle. */
  /** Crash-injection point for the exactly-once specs: every lake sink
    * calls [[CrashHook.fire]] as the LAST statement of its foreachBatch
    * body — after the epoch's appends, before Structured Streaming commits
    * the epoch to the checkpoint. A test that arms the hook gets a query
    * that dies exactly in the at-least-once window the replay guards exist
    * for (appends persisted, offset commit lost); restarting from the same
    * checkpoint redelivers the epoch, and the guards must absorb it.
    * Unarmed (production) it is a single volatile read. */
  private[ops] object CrashHook {
    private val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
    /** Arm: the NEXT sink epoch to complete its appends throws (one-shot). */
    private[ops] def arm(): Unit = armed.set(true)
    private[ops] def disarm(): Unit = armed.set(false)
    private[ops] def fire(): Unit =
      if (armed.getAndSet(false))
        throw new RuntimeException(
          "injected crash: epoch appended but not checkpoint-committed")
  }

  def sinkToLake(df: DataFrame, catalog: graft.lake.LakeCatalog,
                 ns: String, table: String,
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the epoch id is the checkpoint's concern, not the sink's
        catalog.ensureTable(ns, table, batch.schema)
        catalog.append(ns, table, batch.toDF())
      }
      .start()

  /** Continuous incremental dedup into the lake — q75's batch shape run as
    * a `foreachBatch` pipeline: each micro-batch is deduped intra-batch
    * (keep min doc_id per fingerprint), anti-joined against the
    * ACCUMULATED fingerprint table, and only the survivors are appended —
    * both to the document table and (fingerprint + doc_id only) to the
    * fingerprint table that future batches check. The fingerprint table is
    * the only state and it is lake-backed, not stream-store-backed: it
    * survives restarts, other jobs can read it, and its size is
    * ~32 B/unique doc. At 100 TB keep it bucketed by `fp` so each epoch's
    * anti-join prunes to matching buckets (see
    * [[graft.ops.Dedup.q75IncrementalDedup]]).
    *
    * Exactly-once across mid-epoch crashes (each append is an atomic
    * catalog commit): the document append runs FIRST under a doc_id
    * anti-join against the table's existing keys, the fingerprint append
    * second. Crash between them ⇒ replay recomputes the SAME survivors
    * (fpTable unchanged), the doc_id guard absorbs the already-appended
    * rows, and only the fingerprint append runs; crash after both ⇒ the
    * fingerprint anti-join zeroes the replayed epoch. The reverse order
    * would lose a doc forever (fp recorded ⇒ replay calls it a dup before
    * it reached the document table). The guard reads only the document
    * table's key column — bucket by doc_id on a long-lived ingest. */
  def dedupedSinkToLake(docs: DataFrame, catalog: graft.lake.LakeCatalog,
                        ns: String, table: String, fpTable: String,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession // foreachBatch runs in a cloned session
        graft.functions.TextHashExprs.register(s)
        val inBatch = batch.toDF()
          .withColumn("fp", expr("norm_md5(text)"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("fp").orderBy("doc_id")))
          .filter(col("__rn") === 1).drop("__rn")
          // ONE compute of the md5+window epoch transform: the guard's
          // null pre-scan AND the anti-join both read cached blocks
          .localCheckpoint(true)
        val survivors =
          catalog.exceptExistingKeys(ns, fpTable, "fp", inBatch)
        val out = survivors.localCheckpoint(true) // two appends, one compute
        // the doc_id guard also absorbs an upstream doc_id REUSE (same id,
        // different text, fp unseen): the first write wins, the new fp is
        // still recorded against the keeper id — a key violation surfaced
        // by the fp table carrying two rows for one doc_id, never by
        // silently duplicating the id in the document table
        val docsOut =
          catalog.exceptExistingKeys(ns, table, "doc_id", out.drop("fp"))
        catalog.ensureTable(ns, table, docsOut.schema)
        catalog.append(ns, table, docsOut)
        val fps = out.select("fp", "doc_id")
        catalog.ensureTable(ns, fpTable, fps.schema)
        catalog.append(ns, fpTable, fps)
        CrashHook.fire()
      }
      .start()

  /** Streaming ingest dedup against a PERSISTED signature index — the
    * stream-static composition of [[graft.ops.Dedup.dedupAgainstIndex]]:
    * each micro-batch of incoming docs is hashed and matched against the
    * (static, lake-resident) index built by
    * [[graft.ops.Dedup.signaturesTable]], and the per-doc decisions land
    * in an append-only decision table — the ingest gate that never
    * re-reads corpus text. foreachBatch (not a raw stream-stream join)
    * because the decision math needs the banded self-join + distinct that
    * streaming append mode cannot express without state; per micro-batch
    * it is the exact batch operator, so the streaming face can never
    * diverge from the oracle-checked q133 semantics.
    *
    * Replay guard: decisions are keyed by incoming doc, so a replayed
    * epoch (at-least-once redelivery after a crash) recomputes identical
    * rows — the `incoming_id` anti-join against the persisted decision
    * table drops them all, making the decision log exactly-once. Same
    * bounded-key-read note as [[annIngestSink]]: only the key column of
    * the decision table is read per epoch. */
  def indexDedupSink(docs: DataFrame, index: DataFrame,
                     catalog: graft.lake.LakeCatalog, ns: String,
                     table: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession // cloned session per epoch
        val all =
          graft.ops.Dedup.dedupAgainstIndex(s, batch.toDF(), index)
            .localCheckpoint(true) // guard pre-scan + append, one compute
        val decisions = catalog.exceptExistingKeys(ns, table,
          "incoming_id", all, distinctKeys = true)
        catalog.ensureTable(ns, table, decisions.schema)
        catalog.append(ns, table, decisions)
        CrashHook.fire()
      }
      .start()

  /** Streaming ANN ingest: append `(vec_id, cell, code_0..3)` index rows
    * for every embedding arriving on the stream, against quantizers
    * trained elsewhere — typically installed from the lake
    * ([[graft.ops.Similarity.installCodebook]] /
    * [[graft.ops.Similarity.installPqCodebook]]), so NO epoch ever touches
    * a training path. The fits are captured as plain arrays before the
    * query starts ([[graft.ops.Similarity.trainedQuantizers]] resolves them
    * from `s`'s memo, never from the per-epoch cloned session); each batch
    * is one compiled projection + a lake append — the streaming face of
    * the q141 index build, mirroring [[indexDedupSink]]'s shape.
    *
    * Replay-guard cost, accepted knowingly: the anti-join reads the FULL
    * persisted index table every epoch (the dedupedSinkToLake shape), so
    * per-epoch read cost grows linearly with the table over the stream's
    * lifetime. For a long-lived ingest of a large index, bound it — keep a
    * compact key-only companion table (vec_id sorted/bucketed so the
    * anti-join prunes to the probed buckets), or a Bloom sketch of ingested
    * keys rebuilt per checkpoint — the decision math is unchanged. */
  def annIngestSink(s: SparkSession, d: String, embs: DataFrame,
                    catalog: graft.lake.LakeCatalog, ns: String,
                    table: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (coarse, pq) = graft.ops.Similarity.trainedQuantizers(s, d)
    embs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // at-least-once delivery can duplicate a vector WITHIN one batch
        // (redelivery inside the epoch) and ACROSS epochs (replay after a
        // crash); a duplicated vector would occupy two candidate slots in
        // every probe of its cell, so both paths are guarded — the same
        // intra-batch dedup + persisted-key anti-join pair as
        // dedupedSinkToLake
        val all = graft.ops.Similarity
          .annIndexRows(batch.dropDuplicates("vec_id").toDF(), coarse, pq)
          .localCheckpoint(true) // guard pre-scan + append, one compute
        val rows = catalog.exceptExistingKeys(ns, table, "vec_id", all)
        catalog.ensureTable(ns, table, rows.schema)
        catalog.append(ns, table, rows)
        CrashHook.fire()
      }
      .start()
  }

  /** One epoch of [[statsSink]] — factored out so the spec can pin replay
    * semantics by invoking the same code twice with one epoch id. The
    * DELTA table doubles as the exactly-once ledger: deltas are keyed by
    * (epoch, source), and a replayed epoch's rows anti-join away against
    * the already-persisted epoch keys, so at-least-once redelivery
    * contributes ZERO new rows — no cross-table atomicity needed. */
  private[ops] def statsEpoch(batch: DataFrame, epoch: Long,
                              catalog: graft.lake.LakeCatalog,
                              ns: String, table: String): Unit = {
    val deltas = batch
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .withColumn("epoch", lit(epoch))
      .select("epoch", "source", "n_docs", "n_tokens", "n_chars")
      // |sources|-bounded aggregate: checkpoint so the guard's null
      // pre-scan and the append don't each re-run the epoch groupBy
      .localCheckpoint(true)
    val rows = catalog.exceptExistingKeys(ns, table, "epoch", deltas,
      distinctKeys = true)
    catalog.ensureTable(ns, table, rows.schema)
    catalog.append(ns, table, rows)
  }

  /** Incremental corpus statistics maintained in the lake — the third
    * index-maintenance face beside [[indexDedupSink]] (signatures) and
    * [[annIngestSink]] (ANN index rows): every epoch appends its
    * per-source (docs, whitespace tokens, chars) DELTA rows; the running
    * totals are [[corpusStats]]' bounded SUM over them. Per-epoch work is
    * one aggregate of the batch plus an anti-join against the
    * |epochs|·|sources| delta table (control-plane-sized; compact it by
    * summing history into a base row when epochs accumulate). This is
    * what keeps q76/q110-class mixing/budget planners runnable at ingest
    * time without ever rescanning a 100 TB corpus for totals. */
  def statsSink(docs: DataFrame, catalog: graft.lake.LakeCatalog,
                ns: String, table: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        statsEpoch(batch.toDF(), epoch, catalog, ns, table)
        CrashHook.fire()
      }
      .start()

  /** Current per-source totals over the [[statsSink]] delta table. */
  def corpusStats(catalog: graft.lake.LakeCatalog, ns: String,
                  table: String): DataFrame =
    catalog.load(ns, table).groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"))

  /** Compact a [[statsSink]] delta table: fold the accumulated per-epoch
    * rows into ONE base row per source (summed totals), so the per-epoch
    * replay anti-join and [[corpusStats]]' sum stop growing with stream
    * lifetime — the compaction step the statsSink scaladoc promises.
    *
    * Exactly-once survives the fold because foreachBatch epochs commit in
    * ORDER: epoch e+1 only runs after e's checkpoint commit, so once any
    * later epoch's rows are visible, epoch e can never be redelivered —
    * the only replayable epoch is the NEWEST one in the table, and the
    * base rows keep exactly that epoch id (the global max), so its replay
    * still anti-joins away.
    *
    * A LIVE [[statsSink]] stream is safe too: the fold runs through
    * [[graft.lake.LakeCatalog.foldReplace]], whose read and replacing
    * write are one ISOLATED unit (session catalog: the per-table write
    * lock every epoch append also takes; snapshot catalogs: commit-time
    * validation that no snapshot landed after the one the fold read, with
    * a re-fold on conflict) — an epoch row appended mid-fold is either
    * folded in or lands after the replacement, never silently dropped.
    * A crash before the replacing commit leaves the delta rows untouched,
    * after it the folded table — never a partial state. Totals are sums,
    * so [[corpusStats]] reads identically before and after. */
  def compactStats(catalog: graft.lake.LakeCatalog, ns: String,
                   table: String): Unit = {
    if (!catalog.tableExists(ns, table)) return
    catalog.foldReplace(ns, table) { t =>
      t.groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_chars").as("n_chars"))
        .crossJoin(broadcast(t.agg(max("epoch").as("epoch"))))
        .select("epoch", "source", "n_docs", "n_tokens", "n_chars")
    }
  }

  private def epochStart(w: Column): Column = unix_timestamp(w("start"))

  /** C7a tumbling-window aggregation (true `window()` operator; oracle =
    * hour-bucket GROUP BY). */
  def q36EventsTumbling(s: SparkSession, d: String): DataFrame =
    tumblingHourly(events(s, d))
      .select(epochStart(col("window")).as("hour_epoch"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_epoch", "event_type")

  /** C7c sliding windows: 1-hour windows every 30 minutes — each event lands
    * in exactly two windows (oracle enumerates both window starts). */
  def q45EventsSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** C7b session windows per user (oracle = gaps-and-islands SQL). */
  def q37EventsSessions(s: SparkSession, d: String): DataFrame =
    sessionized(events(s, d))
      .select(col("user_id"),
        epochStart(col("session_window")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** C7e hourly anomaly flags: each (hour, event_type) bucket's count
    * z-scored against that type's own mean/stddev across hours; |z| >= 2
    * flags the bucket. The per-type stats frame is tiny (one row per type)
    * and broadcast — the hourly aggregate is computed once and reused for
    * both sides (same-plan exchange reuse). Both engines filter on the
    * ROUNDED z so the boundary is decided identically. */
  def q69Anomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = tumblingHourly(events(s, d))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"))
    val stats = hourly.groupBy("event_type")
      .agg(avg("n").as("mu"), stddev_samp("n").as("sigma"))
    hourly.join(broadcast(stats), "event_type")
      .select(col("hour_epoch"), col("event_type"), col("n"),
        round((col("n") - col("mu")) / col("sigma"), 4).as("z"))
      .filter(abs(col("z")) >= 2.0)
      .orderBy("hour_epoch", "event_type")
  }

  /** C7 registered batch face of [[purchaseAttribution]] — the SAME
    * function, same join predicate, run in batch mode (Catalyst's
    * EliminateEventTimeWatermark drops the watermark nodes on batch
    * inputs, so one definition serves both run modes — the structured-
    * streaming promise made checkable by the oracle gate). Each purchase
    * reports its attribution-window view count and the LAST-touch view
    * (latest v_ts, ties to the highest view id — a deterministic rule
    * both engines express as the same row_number window); purchases with
    * no view in the horizon keep a row with n_views = 0.
    *
    * Shape: equi-join on user_id (one shuffle per side) with the interval
    * predicate as a post-join filter; both the last-touch and the count
    * window ride one hashpartitioning(purchase_id) exchange. In the
    * streaming form the same predicate bounds join state to
    * rate x horizon. */
  def q124PurchaseAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val joined = purchaseAttributionRaw(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"), "left")
    val byPurchase = Window.partitionBy("purchase_id")
    val lastTouch = byPurchase
      .orderBy(col("v_ts").desc_nulls_last, col("view_id").desc_nulls_last)
    joined
      .withColumn("n_views", count(col("view_id")).over(byPurchase))
      .withColumn("rn", row_number().over(lastTouch))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("n_views"),
        col("view_id").as("attributed_view_id"),
        round(col("p_value"), 2).as("purchase_value"))
      .orderBy("purchase_id")
  }

  /** Session-grain conversion dashboard (q180): per session-start hour,
    * how many sessions happened and how many CONVERTED — contained a view
    * and a purchase at-or-after it — in exact ppm. q66's funnel counts
    * users over their lifetime and q163 prices the view→purchase latency;
    * this is the session-grain truth both of them smear: a user who
    * browses nightly but buys once is 1/30 converting sessions, not a
    * converted user, and the hour axis exposes when conversion actually
    * happens. Runs on the TRUE `session_window` operator (the q37
    * machinery with richer aggregates) — on a stream the identical
    * expression runs with watermarked session state.
    *
    * Exactness: conversion compares raw event timestamps (purchase ≥
    * first view, the q163 boundary rule); hours are epoch-second floors
    * (`unix_timestamp` ↔ `floor(epoch())`, the q37 convention).
    *
    * Scale shape: the session aggregation keys on high-cardinality
    * user_id; the hour rollup consumes one row per SESSION, not per
    * event, with map-side partials. */
  def q180SessionConversion(s: SparkSession, d: String): DataFrame =
    sessionConversionOf(events(s, d))

  /** The STATEFUL stage of q180 over ANY events frame: one true
    * `session_window` aggregation emitting per-session (hour_epoch, conv)
    * decisions — this is the operator that runs watermarked on a stream
    * (parity spec-pinned streamed == batch; the hour rollup below is the
    * stateless downstream a streaming deployment runs per epoch or in
    * `foreachBatch` — chaining a second stateful aggregate behind session
    * state is the global-watermark correctness trap Spark itself flags). */
  def sessionDecisionsOf(ev: DataFrame): DataFrame =
    ev
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("v0"),
        max(when(col("event_type") === "purchase", col("ts"))).as("p1"))
      .select(
        expr("(unix_timestamp(session_window.start) div 3600) * 3600")
          .as("hour_epoch"),
        when(col("v0").isNotNull && col("p1").isNotNull &&
          col("p1") >= col("v0"), 1L).otherwise(0L).as("conv"))

  /** q180's full report over any events frame: the [[sessionDecisionsOf]]
    * stage plus the hour rollup. */
  def sessionConversionOf(ev: DataFrame): DataFrame =
    sessionDecisionsOf(ev)
      .groupBy("hour_epoch")
      .agg(count(lit(1)).as("n_sessions"), sum("conv").as("n_converted"))
      .withColumn("conv_ppm", expr("n_converted * 1000000 div n_sessions"))
      .orderBy("hour_epoch")

  /** Multi-touch attribution (q181): q124 picks ONE last-touch view per
    * purchase; this splits the credit LINEARLY across every view in the
    * attribution window — the weighting marketing mix models actually
    * consume — with an exact integer guarantee: weights per purchase sum
    * to EXACTLY 1e6 ppm. base = 1e6 div n and the 1e6 mod n remainder
    * goes +1 each to the MOST RECENT views (q124's recency order), so
    * the split is deterministic and float-free in both engines — no
    * "0.333… × 3 ≠ 1" leakage at any n. Same interval-join shape as
    * q124 (streaming form bounds state to rate × horizon); the windows
    * partition by purchase_id, bounded by views-per-horizon.
    *
    * rnk 1 is the last touch, so q124's single-touch report is exactly
    * the rnk=1 slice of this one (spec-pinned). */
  def q181MultiTouch(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val byP = Window.partitionBy("purchase_id")
    purchaseAttributionRaw(ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), "inner")
      .withColumn("n_views", count(lit(1)).over(byP))
      .withColumn("rnk", row_number().over(
        byP.orderBy(col("v_ts").desc, col("view_id").desc)))
      .withColumn("weight_ppm", expr(
        "1000000 div n_views + if(rnk <= 1000000 % n_views, 1, 0)"))
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        col("n_views"), col("rnk").cast("long").as("rnk"),
        col("weight_ppm").cast("long").as("weight_ppm"))
      .orderBy("purchase_id", "rnk")
  }

  /** ONE gaps-and-islands sessionization chain (`flagged` → `islands`,
    * carrying ts/value/event_type) shared by the q37 and q180 oracles so
    * the session-boundary rule (gap ≥ [[SessionGap]], `>=`) exists once
    * on the oracle side too — the minhashCandCtes discipline. */
  private def sessionIslandsCtes: String = s"""
      flagged AS (
        SELECT user_id, ts, value, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL $SessionGapHours HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ),
      islands AS (
        SELECT user_id, ts, value, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )"""

  /** ONE attribution interval-join chain (`v`/`p` → `j`, LEFT join with
    * p_value carried) shared by the q124 and q181 oracles — the window
    * predicate (view ≤ purchase, within [[AttributionHorizon]]) exists
    * once; q181 takes the inner slice via `view_id IS NOT NULL`. */
  private def attributionJoinCtes: String = s"""
      v AS (SELECT event_id AS view_id, user_id AS v_user, ts AS v_ts
            FROM events WHERE event_type = 'view'),
      p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                   value AS p_value
            FROM events WHERE event_type = 'purchase'),
      j AS (SELECT p.purchase_id, p.user_id, p.p_value, v.view_id, v.v_ts
            FROM p LEFT JOIN v
              ON p.user_id = v.v_user AND v.v_ts <= p.p_ts
                 AND v.v_ts >= p.p_ts - INTERVAL $AttributionHorizon)"""

  /** Merge-on-read delete-debt report (q209): drive the FULL v2
    * delete-file lifecycle on a real lake table built from the corpus and
    * report the debt — the registry face of
    * [[graft.lake.SnapshotLakeCatalog.deleteDebtReport]]. The scenario
    * composes every delete face so the report has one row per kind with
    * both extremes of the dangling spectrum:
    *   1. two appends split by doc_id parity (two data dirs);
    *   2. a merge-on-read POSITION delete (`lang = 'de'`);
    *   3. a copy-on-write delete (`doc_id % 7 = 0`) — it matches BOTH
    *      parities, so it rewrites both dirs, turning every position mask
    *      into dangling residue (their files are gone);
    *   4. a merge-on-read EQUALITY purge (`doc_id % 5 = 3` of whatever
    *      survived) — fully masking: its keys sit in lower-sequence live
    *      dirs and nothing rewrote them since.
    * The oracle prices the same set algebra straight off `documents`:
    * position n_rows = the de docs (all dangling after the rewrite);
    * equality n_rows = the %5=3 survivors (none dangling).
    *
    * Scale shape: the catalog ops under test are the operators' own
    * (bucketed scans, anti-join masks, manifest-count report math); the
    * 2-row result is collected to free the scratch table — bounded
    * control plane by construction. */
  def q209DeleteDebt(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "debt"
    val docs = documents(s, d).select("doc_id", "source", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 1))
    cat.deleteWhereMOR(ns, "t", col("lang") === "de")
    cat.deleteWhere(ns, "t", col("doc_id") % 7 === 0)
    cat.purgeKeysMOR(ns, "t", "doc_id",
      docs.filter(col("doc_id") % 5 === 3).select("doc_id"))
    val rows = cat.deleteDebtReport(ns, "t")
      .select("kind", "n_rows", "n_masking", "n_dangling")
      .collect() // ≤ one row per delete-file group — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("kind", "n_rows", "n_masking", "n_dangling").orderBy("kind")
  }

  /** MERGE/upsert audit (q210): drive [[graft.lake.LakeCatalog.merge]] —
    * the row-level surface the reference's `key_properties` promise but
    * never implement — on a lake table built from the corpus, and report
    * the post-merge language census. The incoming batch mixes UPDATES
    * (every doc_id % 3 == 0 re-landed with lang recoded 'xx' — must
    * REPLACE, not duplicate) and INSERTS (keys offset by max(doc_id)+1
    * for doc_id % 97 == 0, lang 'new' — derived, so insert keys are
    * FRESH at every scale factor; a fixed offset would collide with real
    * ids once the corpus outgrows it and silently turn inserts into
    * replaces); the oracle states the same set
    * algebra directly over `documents` (the census never reads the
    * insert keys, only their count, so the oracle needs no offset). One
    * atomic replace-by-key commit;
    * a key appearing twice post-merge would double a count and
    * hash-mismatch.
    *
    * Scale shape: merge cost is locate scan + rewrite of key-matching
    * dirs + the insert write (dir-granular, untouched dirs carried by
    * reference); the census is one partial-agg over the merged table. */
  def q210MergeAudit(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "mrg"
    val docs = documents(s, d).select("doc_id", "source", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs)
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("lang", lit("xx"))
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1L // control plane
    val inserts = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("source"),
        lit("new").as("lang"))
    cat.merge(ns, "t", Seq("doc_id"), updates.unionByName(inserts))
    val rows = cat.load(ns, "t").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
      .collect() // |langs|-bounded census — control plane
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("lang", "n_docs").orderBy("lang")
  }

  /** Partition-transform slice (q211): build a `days(ts)`-partitioned
    * lake table from the event stream and answer a one-day query through
    * [[graft.lake.SnapshotLakeCatalog.loadSlice]] — Iceberg scan planning
    * over the manifest partition tuples, so only the matching day's FILES
    * are read (the pruning itself is spec-proven by inputFiles in
    * PartitionTransformSpec; this registers the VALUE face: the slice
    * must agree with the oracle's plain ts-range filter). The sliced day
    * is the corpus's earliest UTC day (derived, so every SF works); the
    * upper bound rides micros precision (Spark timestamps are micros, so
    * `23:59:59.999999` is day-inclusive).
    *
    * Scale shape: at 100 TB this is the date-partitioned layout
    * SURVEY §4.3 mandates — the slice touches one day's partitions
    * regardless of table size; the aggregate is a |event_types|-bounded
    * partial agg. */
  def q211DaySlice(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "slice"
    val ev = events(s, d)
      .select("event_id", "user_id", "event_type", "value", "ts")
    cat.ensureTable(ns, "ev", ev.schema, Seq("days(ts)"))
    cat.append(ns, "ev", ev)
    val minDay = ev
      .agg(date_format(min(to_date(col("ts"))), "yyyy-MM-dd").as("d"))
      .head().getString(0) // 1-row bound derivation — control plane
    val rows = cat
      .loadSlice(ns, "ev", "ts", s"$minDay 00:00:00",
        s"$minDay 23:59:59.999999")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
      .collect() // |event_types|-bounded — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("event_type", "n", "sum_value").orderBy("event_type")
  }

  /** Sorted-ingest slice census (q212): ingest the corpus through
    * [[graft.lake.SnapshotLakeCatalog.appendSorted]] (two range-
    * partitioned, doc_id-sorted batches split by parity — the layout
    * whose per-file bound windows are disjoint) and answer a bounded
    * doc_id query through [[graft.lake.SnapshotLakeCatalog.loadSlice]],
    * which prunes files on the MANIFEST COLUMN BOUNDS the sorted write
    * tightened (the skipping itself is spec-proven by inputFiles in
    * PartitionTransformSpec; this registers the VALUE face: slice ≡ the
    * oracle's plain range filter). The bound is the middle half of the
    * id domain, derived from min/max so every SF works; integer-div
    * formula mirrored in the oracle (positive ids, so Spark `div` and
    * DuckDB `//` agree).
    *
    * Scale shape: each ingest batch pays ONE range exchange (what any
    * sorted write costs) and the bounded read then touches
    * O(selectivity) files forever after — the manifest-stats version of
    * q211's partition pruning, for the column no partition transform
    * covers. The census is a |sources|-bounded partial agg. */
  def q212SortedIngest(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "sorted"
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"),
        length(col("text")).as("n_chars"))
    cat.ensureTable(ns, "t", docs.schema)
    cat.appendSorted(ns, "t", docs.filter(col("doc_id") % 2 === 0),
      Seq("doc_id"), targetFiles = Some(4))
    cat.appendSorted(ns, "t", docs.filter(col("doc_id") % 2 === 1),
      Seq("doc_id"), targetFiles = Some(4))
    val b = docs.agg(min("doc_id"), max("doc_id")).head() // control plane
    val (lo0, hi0) = (b.getLong(0), b.getLong(1))
    val (lo, hi) = (lo0 + (hi0 - lo0) / 4, lo0 + (hi0 - lo0) / 4 * 3)
    val rows = cat.loadSlice(ns, "t", "doc_id", lo.toString, hi.toString)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("source")
      .collect() // |sources|-bounded census — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("source", "n_docs", "n_chars").orderBy("source")
  }

  /** Decimal load census (q214): drive the SINGER LOAD PATH end-to-end
    * with exact-decimal declarations — the precision-loss gap the
    * reference shares (`iceberg.py:81` maps every `number` to float64) —
    * and census the landed table. The feed is synthesized FROM the corpus
    * as a distributed string build (never a driver collect): one SCHEMA
    * line declaring `multipleOf: 0.01` (classic singer-python Decimal
    * scale), a string-carried `singer.decimal(18,4)`, and a MAP field
    * (`additionalProperties` object — the dynamic-keys shape the
    * reference silently drops as an empty struct), then one RECORD
    * per document whose amounts encode doc_id exactly (`amt` = doc_id
    * cents, `px` = 13·doc_id ten-thousandths, `tags` = {a: id%5,
    * b: id%7}). [[graft.lake.BatchLoader]]
    * loads it into a snapshot-catalog table — which must type the columns
    * DECIMAL / MAP (asserted: a float64 or empty-struct regression would
    * break the exact sums below) — and the census re-derives the
    * integers by exact decimal/map arithmetic. The oracle states the same set algebra
    * straight off `documents`; all output columns are integers, so the
    * hash compare is representation-proof.
    *
    * Scale shape: the feed build is one projection + text write; the load
    * is the loader's own one-commit scale path; the census a
    * |langs|-bounded partial agg. */
  def q214DecimalLoad(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "dec"
    val tmp = java.nio.file.Files.createTempDirectory("graft-q214-")
    val schemaFile = tmp.resolve("0_schema.jsonl")
    java.nio.file.Files.writeString(schemaFile,
      """{"type":"SCHEMA","stream":"pay","schema":{"properties":{""" +
        """"doc_id":{"type":["integer"]},"lang":{"type":["string","null"]},""" +
        """"amt":{"type":["number","null"],"multipleOf":0.01},""" +
        """"px":{"type":["string","null"],"format":"singer.decimal","precision":18,"scale":4},""" +
        """"tags":{"type":["object","null"],"additionalProperties":{"type":"integer"}}}}}""" +
        "\n")
    val recDir = tmp.resolve("records").toString
    documents(s, d).select(concat(
        lit("""{"type":"RECORD","stream":"pay","record":{"doc_id":"""),
        col("doc_id"),
        lit(""","lang":""""), col("lang"),
        lit("""","amt":"""),
        // integer `div`, never float division: the feed text must encode
        // doc_id exactly (positive ids, so div/% compose cleanly)
        concat(expr("doc_id div 100").cast("string"), lit("."),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")),
        lit(""","px":""""),
        concat(expr("(doc_id * 13) div 10000").cast("string"), lit("."),
          lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0")),
        // the MAP extension rides the same feed: dynamic string keys,
        // integer values derived from doc_id so the census is exact
        lit("""","tags":{"a":"""), (col("doc_id") % 5).cast("string"),
        lit(""","b":"""), (col("doc_id") % 7).cast("string"),
        lit("""}}}""")).as("line"))
      .coalesce(4).write.mode("overwrite").text(recDir)
    // loadPaths' own listing normalizes to Hadoop URI form and sorts —
    // "0_schema.jsonl" < "records/part-…", so the SCHEMA line leads
    val loader = new graft.lake.BatchLoader(s, cat, ns)
    loader.loadPaths(Seq(schemaFile.toString, recDir))
    val table = cat.load(ns, "pay")
    require(table.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 2) &&
      table.schema("px").dataType ==
        org.apache.spark.sql.types.DecimalType(18, 4) &&
      table.schema("tags").dataType ==
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType),
      s"typed load regressed to ${table.schema.catalogString}")
    val rows = table.groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("amt")) * 100).cast("long").as("sum_amt_cents"),
        (sum(col("px")) * 10000).cast("long").as("sum_px_e4"),
        sum(expr("aggregate(map_values(tags), 0L, (a, x) -> a + x)"))
          .as("sum_tags"),
        sum(size(col("tags")).cast("long")).as("n_tag_keys"))
      .orderBy("lang")
      .collect() // |langs|-bounded census — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    cat.dropNamespace(ns)
    deleteRecursively(tmp)
    import s.implicits._
    rows.toDF("lang", "n_rows", "sum_amt_cents", "sum_px_e4", "sum_tags",
      "n_tag_keys").orderBy("lang")
  }

  /** Standard metadata-table faces (q215): drive a four-commit lifecycle
    * (append / append / copy-on-write delete / compact) and answer it
    * ENTIRELY from [[graft.lake.SnapshotLakeCatalog.metaTable]] — the
    * `snapshots`, `history`, `files` and `manifests` relations an external
    * operator's tooling reads to size a table without scanning it. The
    * output is one row per snapshot (id, operation, summary total-records,
    * history's is_current_ancestor) plus two sentinel rows priced off the
    * files/manifests faces of the CURRENT snapshot (total data rows via
    * per-file record counts; the manifest count, exactly 1 after a
    * compact). The oracle restates every number as set algebra over
    * `documents` — metadata truth must equal data truth.
    *
    * Scale shape: all five faces read metadata only (JSON + Avro
    * manifests); the one data-shaped operation is the lifecycle itself
    * (the delete's locate/rewrite and compact's rewrite — the operators
    * under test). */
  def q215MetaTables(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "metaq"
    val docs = documents(s, d).select("doc_id", "source", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 1))
    require(cat.deleteWhere(ns, "t", col("doc_id") % 7 === 0) > 0)
    cat.compact(ns, "t", targetFiles = 2)
    val perSnap = cat.metaTable(ns, "t", "snapshots")
      .join(cat.metaTable(ns, "t", "history")
          .select("snapshot_id", "is_current_ancestor"),
        Seq("snapshot_id"))
      .select("snapshot_id", "operation", "total_records",
        "is_current_ancestor")
      .collect() // one row per snapshot — control plane
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    val fileRows = cat.metaTable(ns, "t", "files")
      .filter(col("content") === 0)
      .agg(sum("record_count")).head().getLong(0)
    val nManifests = cat.metaTable(ns, "t", "manifests")
      .filter(col("content") === 0).count()
    cat.dropNamespace(ns)
    import s.implicits._
    (perSnap ++ Seq((100L, "files_current", fileRows, true),
        (101L, "manifests_current", nManifests, true)))
      .toDF("snapshot_id", "operation", "total_records",
        "is_current_ancestor")
      .orderBy("snapshot_id")
  }

  /** Tagged time travel (q216): tag a mid-history snapshot, keep
    * committing (an append + an equality purge), EXPIRE history down to
    * keepLast=1 — the tag must protect its snapshot — and read BOTH
    * faces: the tag (exactly the first two appends, by name) and the
    * current table (everything minus the purge). The oracle restates
    * both censuses over `documents`.
    *
    * Scale shape: tag/expire are metadata commits; loadRef is an ordinary
    * snapshot scan (pruned to the tagged live set); the censuses are
    * |langs|-bounded partial aggs. */
  def q216TaggedTravel(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "tagq"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 0))
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 1))
    val auditedId = cat.snapshotIds(ns, "t").max
    cat.tag(ns, "t", "audited", auditedId)
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 2))
    require(cat.purgeKeysMOR(ns, "t", "doc_id",
      docs.filter(col("doc_id") % 5 === 0).select("doc_id")) > 0)
    cat.expireSnapshots(ns, "t", keepLast = 1)
    require(cat.snapshotIds(ns, "t").contains(auditedId),
      "expiry must protect the tagged snapshot")
    require(cat.listRefs(ns, "t")("audited") == (("tag", auditedId)))
    def census(face: String, df: DataFrame) = df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"))
      .collect() // |langs|-bounded — control plane
      .map(r => (face, r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val rows = census("audited", cat.loadRef(ns, "t", "audited")) ++
      census("current", cat.load(ns, "t"))
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("face", "lang", "n_docs", "sum_id").orderBy("face", "lang")
  }

  /** Promoted-table census (q217): create the table NARROW (int id, float
    * score, decimal(9,2) amt), load a batch, promote the schema to
    * long/double/decimal(18,2) — a METADATA-ONLY evolution, old files
    * untouched — then land values only the wide types admit (ids past
    * 2^31, amounts past 9 digits) plus one more still-narrow batch (the
    * drifting-tap shape: segments lag the table's promotion). The census
    * reads all three file generations under the current schema; every
    * output is an exact integer (score rides quarters so float->double
    * widening is value-exact), so the hash compare is representation-
    * proof. The oracle restates the arithmetic over `documents`.
    *
    * Scale shape: the promotion is one metadata commit regardless of
    * table size (the 100 TB point of VERDICT r11 #1); reads widen
    * per-column only where the physical type still differs; the census
    * is a |langs|-bounded partial agg. */
  def q217PromotedCensus(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "promo"
    val docs = documents(s, d).select("doc_id", "lang")
    def score(c: org.apache.spark.sql.Column) =
      (c % 97).cast("double") / lit(4.0) // quarters: exact in float32
    val narrow = docs.filter(col("doc_id") % 2 === 0).select(
      col("doc_id").cast(IntegerType).as("id"),
      score(col("doc_id")).cast(FloatType).as("score"),
      ((col("doc_id") % 1000).cast("double") / lit(100.0))
        .cast(DecimalType(9, 2)).as("amt"),
      col("lang"))
    cat.ensureTable(ns, "t", narrow.schema)
    cat.append(ns, "t", narrow)
    val wide = docs.filter(col("doc_id") % 4 === 1).select(
      (col("doc_id") + lit(5000000000L)).as("id"),
      score(col("doc_id")).as("score"),
      (((col("doc_id") % 1000).cast("double") / lit(100.0)) + lit(1.0e9))
        .cast(DecimalType(18, 2)).as("amt"),
      col("lang"))
    cat.ensureTable(ns, "t", wide.schema) // metadata-only promotion
    require(cat.load(ns, "t").schema("id").dataType == LongType &&
      cat.load(ns, "t").schema("amt").dataType == DecimalType(18, 2),
      "promotion must widen the live schema")
    cat.append(ns, "t", wide)
    // a STILL-NARROW late segment: accepted, cast up at the write boundary
    cat.append(ns, "t", docs.filter(col("doc_id") % 4 === 3).select(
      col("doc_id").cast(IntegerType).as("id"),
      score(col("doc_id")).cast(FloatType).as("score"),
      ((col("doc_id") % 1000).cast("double") / lit(100.0))
        .cast(DecimalType(9, 2)).as("amt"),
      col("lang")))
    val rows = cat.load(ns, "t").groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        sum("id").as("sum_id"),
        (sum("score") * 4).cast("long").as("sum_score_q"),
        (sum("amt") * 100).cast("long").as("sum_amt_cents"))
      .orderBy("lang")
      .collect() // |langs|-bounded census — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("lang", "n_rows", "sum_id", "sum_score_q", "sum_amt_cents")
      .orderBy("lang")
  }

  /** Partition spec evolution (q218): start a table UNPARTITIONED, land
    * half the corpus, evolve the default spec to `identity(lang)` — ONE
    * metadata commit, no data rewrite ([[graft.lake.SnapshotLakeCatalog
    * .updatePartitionSpec]]) — and land the rest under the new layout.
    * The output reads BOTH faces: the full-table lang census (a
    * mixed-layout scan: per-dir layouts recovered and aligned) and the
    * `partitions` metadata table (per-partition record counts straight
    * off the manifests — the unpartitioned generation reports as one ''
    * slice beside the lang= partitions, ZERO data bytes read). The
    * oracle restates both as set algebra over `documents`.
    *
    * Scale shape: this is the 100 TB re-layout move — when a feed
    * outgrows its layout, the switch is one commit; old dirs keep
    * reading (and stop pruning) until compaction folds them in. */
  def q218SpecEvolution(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "specq"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.updatePartitionSpec(ns, "t", Seq("lang"))
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 1))
    val census = cat.load(ns, "t").groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .collect() // |langs|-bounded — control plane
      .map(r => ("census", r.getString(0), r.getLong(1))).toSeq
    val parts = cat.metaTable(ns, "t", "partitions")
      .select("partition", "record_count")
      .collect() // |partitions|-bounded — control plane
      .map(r => ("partition", r.getString(0), r.getLong(1))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    (census ++ parts).toDF("face", "key", "n").orderBy("face", "key")
  }

  /** Write-audit-publish (q219): stage two corpus batches on a branch
    * ([[graft.lake.SnapshotLakeCatalog.stageAppend]]), census THREE
    * faces — the reader-visible table pre-publish (must still be the
    * first batch only: staging is invisible), the staged state by name
    * (the audit read), and the table after [[graft.lake
    * .SnapshotLakeCatalog.fastForward]] publishes atomically. The oracle
    * restates all three as set algebra over `documents`. This is the
    * Iceberg WAP pattern a production ingest runs daily: quality gates
    * run against the staged read; a failed audit drops the branch and
    * main never saw a row.
    *
    * Scale shape: staging costs exactly what the appends cost; audit
    * reads are ordinary snapshot scans; publish is ONE metadata commit
    * regardless of staged volume. Censuses are |langs|-bounded. */
  def q219WapPublish(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "wapq"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.stageAppend(ns, "t", "wap", docs.filter(col("doc_id") % 4 === 1))
    cat.stageAppend(ns, "t", "wap", docs.filter(col("doc_id") % 4 === 3))
    def census(face: String, df: DataFrame) = df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"))
      .collect() // |langs|-bounded — control plane
      .map(r => (face, r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pre = census("pre_publish", cat.load(ns, "t"))
    val staged = census("staged", cat.loadRef(ns, "t", "wap"))
    cat.fastForward(ns, "t", "wap")
    val post = census("published", cat.load(ns, "t"))
    cat.dropNamespace(ns)
    import s.implicits._
    (pre ++ staged ++ post).toDF("face", "lang", "n_docs", "sum_id")
      .orderBy("face", "lang")
  }

  /** Incremental append sync (q224): the CDC/downstream-sync face —
    * after a baseline load, two more corpus batches land; the downstream
    * reads ONLY what changed via [[graft.lake.SnapshotLakeCatalog
    * .loadAppendsSince]], an incremental append scan planned from the
    * MANIFESTS (each snapshot's live set minus its parent's — zero diff
    * computation, strictly fewer files than a full scan; the `pruned`
    * sentinel flips to 0 otherwise). Output: the baseline census (time
    * travel to the sync mark) beside the increment census; the oracle
    * restates both as set algebra over `documents`.
    *
    * Scale shape: shipping a day of appends costs the day's FILES — the
    * exceptAll-based [[graft.lake.SnapshotLakeCatalog.snapshotDiff]]
    * (two full scans) remains only for ranges containing rewrites,
    * which this face refuses loudly. */
  def q224IncrementalSync(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "incq"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 0))
    val mark = cat.snapshotIds(ns, "t").max // the downstream's sync point
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 1))
    cat.append(ns, "t", docs.filter(col("doc_id") % 3 === 2))
    val inc = cat.loadAppendsSince(ns, "t", mark)
    val prunedOk = inc.inputFiles.nonEmpty &&
      inc.inputFiles.length < cat.load(ns, "t").inputFiles.length
    def census(face: String, df: DataFrame) = df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"))
      .collect() // |langs|-bounded — control plane
      .map(r => (face, r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val rows = census("baseline", cat.loadAt(ns, "t", mark)) ++
      census("increment", inc) :+
      (("pruned", "", if (prunedOk) 1L else 0L, 0L))
    cat.dropNamespace(ns)
    import s.implicits._
    rows.toDF("face", "lang", "n_docs", "sum_id").orderBy("face", "lang")
  }

  /** Compound scan planning (q223): ingest events under `days(ts)` in
    * event_id-range batches (so BOTH pruning tiers have something to
    * bite: the day partition tuples AND per-file event_id manifest
    * bounds), then read one day AND one id-quartile through the
    * compound [[graft.lake.SnapshotLakeCatalog.loadSlice]] face — the
    * conjunction must touch STRICTLY fewer files than either
    * single-column slice (the `pruned` sentinel flips to 0 otherwise,
    * failing the hash compare) while returning exactly the
    * intersection, censused per event_type against the oracle.
    *
    * Scale shape: this is how a real 100 TB query filters — time range
    * AND key range together; every tier decision is manifest metadata
    * on the driver, zero storage I/O for pruned files. */
  def q223CompoundSlice(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "cmpq"
    val ev = events(s, d)
      .select("event_id", "user_id", "event_type", "value", "ts")
    // batch by USER quartiles: user_id is uncorrelated with event time
    // (event_id is sequential-in-time in this corpus, so a day x id-range
    // conjunction would be degenerate — correctly pruning to ZERO files)
    val b = ev.agg(org.apache.spark.sql.functions.min("user_id"),
      org.apache.spark.sql.functions.max("user_id"),
      org.apache.spark.sql.functions.min(to_date(col("ts")))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val d0 = b.getDate(2).toString
    val q = (hi - lo) / 2 + 1
    // the census reads only day d0; later days and the second user batch
    // are pruning FODDER — 7 days x 2 batches prove both tiers without
    // paying a dir-per-day write for the corpus's whole span or a
    // commit per quartile (each append is ~1.5 s of fixed commit cost;
    // the tiers' strictness is what the sentinel checks, not the
    // fan-out)
    val evB = ev.filter(to_date(col("ts")) <
      org.apache.spark.sql.functions.date_add(lit(d0).cast("date"), 7))
    cat.ensureTable(ns, "ev", evB.schema, Seq("days(ts)"))
    (0L to 1L).foreach(k => cat.append(ns, "ev",
      evB.filter(col("user_id") >= lo + k * q &&
        col("user_id") < lo + (k + 1) * q)))
    val (rlo, rhi) = (lo + (hi - lo) / 4, lo + (hi - lo) / 2)
    // micro-precision upper bound so the slice is day-INCLUSIVE like the
    // oracle's ts::DATE = d0 (a bare 23:59:59 would drop events in the
    // day's last fractional second — see q211's bound at line 813)
    val tsB = ("ts", s"$d0 00:00:00", s"$d0 23:59:59.999999")
    val idB = ("user_id", rlo.toString, rhi.toString)
    val allFiles = cat.load(ns, "ev").inputFiles.length
    val dayFiles = cat.loadSlice(ns, "ev", tsB._1, tsB._2, tsB._3)
      .inputFiles.length
    val idFiles = cat.loadSlice(ns, "ev", idB._1, idB._2, idB._3)
      .inputFiles.length
    val both = cat.loadSlice(ns, "ev", Seq(tsB, idB))
    val bothFiles = both.inputFiles.length
    // the structural pruning claim, scale-proof: the conjunction touches
    // no more files than EITHER tier alone and strictly fewer than the
    // whole table (the controlled strict-inequality case is spec-pinned
    // in PartitionTransformSpec)
    val prunedOk = bothFiles <= dayFiles && bothFiles <= idFiles &&
      bothFiles < allFiles
    val census = both.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"))
      .collect() // |event types|-bounded — control plane
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    cat.dropNamespace(ns)
    import s.implicits._
    (census :+ (("__pruned", if (prunedOk) 1L else 0L, 0.0)))
      .toDF("event_type", "n", "sum_value").orderBy("event_type")
  }

  /** `key_properties` upsert lifecycle (q222): drive the SINGER LOAD
    * PATH end-to-end with `upsert_streams` opt-in (VERDICT r12 #6 — the
    * face the reference's config accepts but never implements,
    * `sinks.py:25,31`). Feed 1 lands every document (ver 1, keyed by
    * the SCHEMA message's key_properties); feed 2 re-sends a third of
    * the keys with changed values (ver 2, lang 'xx') plus genuinely new
    * keys (ver 3) — [[graft.lake.SnapshotLakeCatalog.upsertMOR]] lands
    * it as ONE commit: an equality-delete file over the re-sent keys +
    * the new data dir, NO data rewrite (asserted in-query: the current
    * snapshot carries content=2 delete files and every feed-1 dir
    * still live). The census over the final table — old versions
    * replaced, new keys inserted, untouched keys intact — is restated
    * by the oracle as set algebra over `documents`.
    *
    * Scale shape: the cheap upsert path for frequent small batches at
    * 100 TB — cost is one key-projected presence scan + the batch
    * write; the masking debt is priced by q209's report and folded by
    * compaction. */
  /** q222's generated Singer feeds, once per (JVM, corpus dir) — the
    * feed TEXT is harness fodder (the oracle-visible work is the loader's
    * parse + the MOR upsert commits), so re-assembling JSON strings per
    * call would dominate the 100×-probe measurement (VERDICT r13 #6;
    * the q223 fixture trim, 743ac5d, set the precedent). The temp dirs
    * live for the JVM and are re-read by every subsequent call. */
  private val q222Feeds =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  def q222UpsertLoad(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "upq"
    val tmp = q222Feeds.computeIfAbsent(d, _ => {
      val t = java.nio.file.Files.createTempDirectory("graft-q222-")
      val schemaLine =
        """{"type":"SCHEMA","stream":"up","key_properties":["doc_id"],""" +
          """"schema":{"properties":{"doc_id":{"type":["integer"]},""" +
          """"lang":{"type":["string","null"]},""" +
          """"ver":{"type":["integer","null"]}}}}""" + "\n"
      def rec(idCol: org.apache.spark.sql.Column,
              langCol: org.apache.spark.sql.Column, ver: Int) = concat(
        lit("""{"type":"RECORD","stream":"up","record":{"doc_id":"""),
        idCol, lit(""","lang":""""), langCol, lit("""","ver":"""),
        lit(ver), lit("}}"))
      val docs = documents(s, d).select("doc_id", "lang")
      // feed 1: the full corpus at ver 1
      java.nio.file.Files.writeString(t.resolve("f1_0schema.jsonl"),
        schemaLine)
      docs.select(rec(col("doc_id"), col("lang"), 1).as("line"))
        .coalesce(4).write.mode("overwrite")
        .text(t.resolve("f1_records").toString)
      // feed 2: a third of the keys re-sent changed + genuinely new keys
      java.nio.file.Files.writeString(t.resolve("f2_0schema.jsonl"),
        schemaLine)
      docs.filter(col("doc_id") % 3 === 0)
        .select(rec(col("doc_id"), lit("xx"), 2).as("line"))
        .unionAll(docs.filter(col("doc_id") % 11 === 5)
          .select(rec(col("doc_id") + lit(10000000L), col("lang"), 3)
            .as("line")))
        .coalesce(4).write.mode("overwrite")
        .text(t.resolve("f2_records").toString)
      t
    })
    val loader = new graft.lake.BatchLoader(s, cat, ns,
      upsertStreams = Set("up"))
    loader.loadPaths(Seq(tmp.resolve("f1_0schema.jsonl").toString,
      tmp.resolve("f1_records").toString))
    val dirsAfterF1 = cat.metaTable(ns, "up", "files")
      .filter(col("content") === 0).count()
    loader.loadPaths(Seq(tmp.resolve("f2_0schema.jsonl").toString,
      tmp.resolve("f2_records").toString))
    // MOR proof: the replace published equality-delete files and
    // carried every feed-1 data file untouched (no rewrite)
    val files = cat.metaTable(ns, "up", "files")
    require(files.filter(col("content") === 2).count() > 0,
      "q222: the upsert must land as equality-delete files")
    require(files.filter(col("content") === 0).count() > dirsAfterF1,
      "q222: feed-2's data files must ADD to feed-1's, never rewrite")
    val rows = cat.load(ns, "up").groupBy("ver", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"))
      .collect() // |vers x langs|-bounded — control plane
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    cat.dropNamespace(ns)
    // the feed dirs stay — cached in q222Feeds for the session
    import s.implicits._
    rows.toDF("ver", "lang", "n_docs", "sum_id").orderBy("ver", "lang")
  }

  /** WAP with a branch-scoped AUDIT DELETE (q221): the canonical
    * write → audit → '''purge bad rows on the branch''' → publish flow
    * whose third step VERDICT r12 #2 asked for. Half the corpus is
    * published, the rest staged on a branch; the audit then runs
    * [[graft.lake.SnapshotLakeCatalog.deleteWhereMOR]] AGAINST THE
    * BRANCH — the delete file binds to branch-head files (including the
    * dir shared with main!) yet only the branch snapshot carries it —
    * and [[graft.lake.SnapshotLakeCatalog.fastForward]] publishes the
    * audited state atomically. Three faces are censused: pre-publish
    * main (every published row still visible — the audit delete is
    * branch-local), the audited staged read (bad rows masked across
    * BOTH generations), and post-publish main (== the audited state).
    * The oracle restates all three as set algebra over `documents`.
    *
    * Scale shape: the audit delete costs one branch scan + a write
    * proportional to the match count (no rewrite); publish stays ONE
    * metadata commit regardless of staged volume; censuses are
    * |langs|-bounded. */
  def q221WapAuditDelete(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "wapd"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema)
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.stageAppend(ns, "t", "wap", docs.filter(col("doc_id") % 2 === 1))
    // the audit: purge bad rows ON THE BRANCH (they span the published
    // dir AND the staged one — main must not see the masks yet)
    val n = cat.deleteWhereMOR(ns, "t", col("doc_id") % 7 === 3,
      branch = "wap")
    require(n > 0, "q221: the audit delete must match rows")
    def census(face: String, df: DataFrame) = df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"))
      .collect() // |langs|-bounded — control plane
      .map(r => (face, r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pre = census("pre_publish", cat.load(ns, "t"))
    val audited = census("audited", cat.loadRef(ns, "t", "wap"))
    cat.fastForward(ns, "t", "wap")
    val post = census("published", cat.load(ns, "t"))
    cat.dropNamespace(ns)
    import s.implicits._
    (pre ++ audited ++ post).toDF("face", "lang", "n_docs", "sum_id")
      .orderBy("face", "lang")
  }

  /** Bucket-layout lifecycle (q220): ingest the corpus into a
    * `bucket(16, doc_id)` table ([[graft.lake.SnapshotLakeCatalog]]'s
    * spec-conformant hash transform, VERDICT r12 #1) across two appends,
    * then exercise the three faces the layout exists for — the lang
    * census over the hash-clustered read, the `partitions` metadata
    * rollup (per-bucket sizing off manifests alone, zero data bytes),
    * and POINT LOOKUPS through [[graft.lake.SnapshotLakeCatalog
    * .loadSlice]], which must prune to the key's single bucket
    * (`inputFiles`-verified in-query; the `pruned` sentinel row flips to
    * 0 on any unpruned probe, failing the hash compare). The oracle
    * restates census/probes/totals over `documents`.
    *
    * Scale shape: THE layout for a high-cardinality key at 100 TB —
    * bounded partition counts regardless of cardinality, per-probe cost
    * O(bucket), and both sides of a recurring join sharing the transform
    * co-locate. Probe keys derive from min(doc_id) so the query is
    * scale-invariant. */
  def q220BucketLayout(s: SparkSession, d: String): DataFrame = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(s)
    val ns = "bktq"
    val docs = documents(s, d).select("doc_id", "lang")
    cat.ensureTable(ns, "t", docs.schema, Seq("bucket(16, doc_id)"))
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 0))
    cat.append(ns, "t", docs.filter(col("doc_id") % 2 === 1))
    val census = cat.load(ns, "t").groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .collect() // |langs|-bounded — control plane
      .map(r => (s"census_${r.getString(0)}", 0L, r.getLong(1))).toSeq
    // per-bucket sizing straight off the manifests: |buckets| <= 16 rows
    val parts = cat.metaTable(ns, "t", "partitions")
      .agg(count(lit(1)).as("nb"), sum("record_count").as("rows"))
      .head()
    require(parts.getLong(0) <= 16L,
      s"bucket(16) produced ${parts.getLong(0)} partitions")
    val metaRows = Seq(("meta_rows", 0L, parts.getLong(1)))
    val lo = docs.agg(org.apache.spark.sql.functions.min("doc_id"))
      .head().getLong(0)
    val allFiles = cat.load(ns, "t").inputFiles.length
    var allPruned = true
    val probes = Seq(lo, lo + 97L, lo + 211L).flatMap { k =>
      val slice = cat.loadSlice(ns, "t", "doc_id", k.toString, k.toString)
      allPruned &= slice.inputFiles.nonEmpty &&
        slice.inputFiles.length < allFiles
      slice.collect() // <= replication-factor rows per probed key
        .map(r => ("probe", r.getLong(0), 1L))
    }
    val pruned = Seq(("pruned", 0L, if (allPruned) 1L else 0L))
    cat.dropNamespace(ns)
    import s.implicits._
    (census ++ metaRows ++ probes ++ pruned)
      .toDF("face", "k", "n").orderBy("face", "k")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.toSeq).reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q224_incremental_sync" -> ((q224IncrementalSync _, """
      SELECT * FROM (
        SELECT 'baseline' AS face, lang, count(*)::BIGINT AS n_docs,
               sum(doc_id)::BIGINT AS sum_id
        FROM documents WHERE doc_id % 3 = 0 GROUP BY 2
        UNION ALL
        SELECT 'increment', lang, count(*)::BIGINT, sum(doc_id)::BIGINT
        FROM documents WHERE doc_id % 3 <> 0 GROUP BY 2
        UNION ALL
        SELECT 'pruned', '', 1::BIGINT, 0::BIGINT)
      ORDER BY face, lang""")),
    "q223_compound_slice" -> ((q223CompoundSlice _, """
      WITH md AS (SELECT min(ts::DATE) AS d0 FROM events),
           b AS (SELECT min(user_id) AS lo, max(user_id) AS hi
                 FROM events),
           r AS (SELECT lo + (hi - lo) // 4 AS rlo,
                        lo + (hi - lo) // 2 AS rhi FROM b)
      SELECT * FROM (
        SELECT event_type, count(*)::BIGINT AS n,
               round(sum(value), 2) AS sum_value
        FROM events, md, r
        WHERE ts::DATE = md.d0 AND user_id BETWEEN rlo AND rhi
        GROUP BY 1
        UNION ALL SELECT '__pruned', 1::BIGINT, 0.0)
      ORDER BY event_type""")),
    "q222_upsert_load" -> ((q222UpsertLoad _, """
      WITH final AS (
        SELECT doc_id, lang, 1 AS ver FROM documents WHERE doc_id % 3 <> 0
        UNION ALL
        SELECT doc_id, 'xx', 2 FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 10000000, lang, 3 FROM documents
        WHERE doc_id % 11 = 5)
      SELECT ver::BIGINT AS ver, lang, count(*)::BIGINT AS n_docs,
             sum(doc_id)::BIGINT AS sum_id
      FROM final GROUP BY 1, 2 ORDER BY ver, lang""")),
    "q221_wap_audit_delete" -> ((q221WapAuditDelete _, """
      SELECT * FROM (
        SELECT 'pre_publish' AS face, lang, count(*)::BIGINT AS n_docs,
               sum(doc_id)::BIGINT AS sum_id
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 2
        UNION ALL
        SELECT 'audited', lang, count(*)::BIGINT, sum(doc_id)::BIGINT
        FROM documents WHERE doc_id % 7 <> 3 GROUP BY 2
        UNION ALL
        SELECT 'published', lang, count(*)::BIGINT, sum(doc_id)::BIGINT
        FROM documents WHERE doc_id % 7 <> 3 GROUP BY 2)
      ORDER BY face, lang""")),
    "q220_bucket_layout" -> ((q220BucketLayout _, """
      WITH b AS (SELECT min(doc_id) AS lo FROM documents)
      SELECT * FROM (
        SELECT 'census_' || lang AS face, 0::BIGINT AS k,
               count(*)::BIGINT AS n
        FROM documents GROUP BY lang
        UNION ALL
        SELECT 'meta_rows', 0::BIGINT, count(*)::BIGINT FROM documents
        UNION ALL
        SELECT 'probe', doc_id::BIGINT, 1::BIGINT
        FROM documents, b
        WHERE doc_id IN (b.lo, b.lo + 97, b.lo + 211)
        UNION ALL
        SELECT 'pruned', 0::BIGINT, 1::BIGINT)
      ORDER BY face, k""")),
    "q215_meta_tables" -> ((q215MetaTables _, """
      WITH e AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
           n AS (SELECT count(*) AS c FROM documents),
           k AS (SELECT count(*) AS c FROM documents WHERE doc_id % 7 <> 0)
      SELECT * FROM (
        SELECT 1::BIGINT AS snapshot_id, 'append' AS operation,
               e.c::BIGINT AS total_records,
               true AS is_current_ancestor FROM e
        UNION ALL SELECT 2::BIGINT, 'append', n.c::BIGINT, true FROM n
        UNION ALL SELECT 3::BIGINT, 'delete', k.c::BIGINT, true FROM k
        UNION ALL SELECT 4::BIGINT, 'replace', k.c::BIGINT, true FROM k
        UNION ALL SELECT 100::BIGINT, 'files_current', k.c::BIGINT,
                         true FROM k
        UNION ALL SELECT 101::BIGINT, 'manifests_current', 1::BIGINT, true)
      ORDER BY snapshot_id""")),
    "q216_tagged_travel" -> ((q216TaggedTravel _, """
      SELECT * FROM (
        SELECT 'audited' AS face, lang, count(*)::BIGINT AS n_docs,
               sum(doc_id)::BIGINT AS sum_id
        FROM documents WHERE doc_id % 3 IN (0, 1) GROUP BY 2
        UNION ALL
        SELECT 'current' AS face, lang, count(*)::BIGINT,
               sum(doc_id)::BIGINT
        FROM documents WHERE doc_id % 5 <> 0 GROUP BY 2)
      ORDER BY face, lang""")),
    "q219_wap_publish" -> ((q219WapPublish _, """
      SELECT * FROM (
        SELECT 'pre_publish' AS face, lang, count(*)::BIGINT AS n_docs,
               sum(doc_id)::BIGINT AS sum_id
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 2
        UNION ALL
        SELECT 'published', lang, count(*)::BIGINT, sum(doc_id)::BIGINT
        FROM documents GROUP BY 2
        UNION ALL
        SELECT 'staged', lang, count(*)::BIGINT, sum(doc_id)::BIGINT
        FROM documents GROUP BY 2)
      ORDER BY face, lang""")),
    "q218_spec_evolution" -> ((q218SpecEvolution _, """
      SELECT * FROM (
        SELECT 'census' AS face, lang AS key, count(*)::BIGINT AS n
        FROM documents GROUP BY 2
        UNION ALL
        SELECT 'partition', '', count(*)::BIGINT
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 'partition', 'lang=' || lang, count(*)::BIGINT
        FROM documents WHERE doc_id % 2 = 1 GROUP BY 2)
      ORDER BY face, key""")),
    "q217_promoted_census" -> ((q217PromotedCensus _, """
      SELECT lang, count(*)::BIGINT AS n_rows,
             sum(doc_id + CASE WHEN doc_id % 4 = 1
                               THEN 5000000000 ELSE 0 END)::BIGINT AS sum_id,
             sum(doc_id % 97)::BIGINT AS sum_score_q,
             sum(doc_id % 1000 + CASE WHEN doc_id % 4 = 1
                 THEN 100000000000 ELSE 0 END)::BIGINT AS sum_amt_cents
      FROM documents GROUP BY 1 ORDER BY 1""")),
    "q214_decimal_load" -> ((q214DecimalLoad _, """
      SELECT lang, count(*)::BIGINT AS n_rows,
             sum(doc_id)::BIGINT AS sum_amt_cents,
             sum(doc_id * 13)::BIGINT AS sum_px_e4,
             sum(doc_id % 5 + doc_id % 7)::BIGINT AS sum_tags,
             (count(*) * 2)::BIGINT AS n_tag_keys
      FROM documents GROUP BY 1 ORDER BY 1""")),
    "q212_sorted_ingest" -> ((q212SortedIngest _, """
      WITH b AS (SELECT min(doc_id) AS lo0, max(doc_id) AS hi0
                 FROM documents),
      r AS (SELECT lo0 + (hi0 - lo0) // 4 AS lo,
                   lo0 + (hi0 - lo0) // 4 * 3 AS hi FROM b)
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(length(text))::BIGINT AS n_chars
      FROM documents, r WHERE doc_id BETWEEN lo AND hi
      GROUP BY 1 ORDER BY 1""")),
    "q210_merge_audit" -> ((q210MergeAudit _, """
      WITH merged AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang
        FROM documents
        UNION ALL
        SELECT 'new' AS lang FROM documents WHERE doc_id % 97 = 0)
      SELECT lang, count(*)::BIGINT AS n_docs
      FROM merged GROUP BY 1 ORDER BY 1""")),
    "q211_day_slice" -> ((q211DaySlice _, """
      WITH md AS (SELECT min(ts::DATE) AS d0 FROM events)
      SELECT event_type, count(*)::BIGINT AS n,
             round(sum(value), 2) AS sum_value
      FROM events, md WHERE ts::DATE = md.d0
      GROUP BY 1 ORDER BY 1""")),
    "q209_delete_debt" -> ((q209DeleteDebt _, s"""
      WITH qpos AS (SELECT count(*) AS n FROM documents WHERE lang = 'de'),
      qeq AS (SELECT count(*) AS n FROM documents
              WHERE doc_id % 5 = 3 AND lang <> 'de' AND doc_id % 7 <> 0)
      SELECT 'equality' AS kind, n::BIGINT AS n_rows,
             n::BIGINT AS n_masking, 0::BIGINT AS n_dangling FROM qeq
      UNION ALL
      SELECT 'position', n::BIGINT, 0::BIGINT, n::BIGINT FROM qpos
      ORDER BY kind""")),
    "q181_multi_touch" -> ((q181MultiTouch _, s"""
      WITH $attributionJoinCtes,
      r AS (SELECT purchase_id, user_id, view_id,
                   count(*) OVER (PARTITION BY purchase_id) AS n_views,
                   row_number() OVER (PARTITION BY purchase_id
                     ORDER BY v_ts DESC, view_id DESC) AS rnk
            FROM j WHERE view_id IS NOT NULL)
      SELECT purchase_id, user_id, view_id, n_views::BIGINT AS n_views,
             rnk::BIGINT AS rnk,
             (1000000 // n_views
               + CASE WHEN rnk <= 1000000 % n_views THEN 1 ELSE 0 END)::BIGINT
               AS weight_ppm
      FROM r ORDER BY purchase_id, rnk""")),
    "q180_session_conversion" -> ((q180SessionConversion _, s"""
      WITH $sessionIslandsCtes,
      sess AS (
        SELECT user_id, session_id,
               floor(epoch(min(ts)))::BIGINT AS start_sec,
               min(CASE WHEN event_type = 'view' THEN ts END) AS v0,
               max(CASE WHEN event_type = 'purchase' THEN ts END) AS p1
        FROM islands GROUP BY 1, 2
      )
      SELECT (start_sec // 3600) * 3600 AS hour_epoch,
             count(*)::BIGINT AS n_sessions,
             sum(CASE WHEN v0 IS NOT NULL AND p1 IS NOT NULL AND p1 >= v0
                      THEN 1 ELSE 0 END)::BIGINT AS n_converted,
             (sum(CASE WHEN v0 IS NOT NULL AND p1 IS NOT NULL AND p1 >= v0
                       THEN 1 ELSE 0 END) * 1000000
               // count(*))::BIGINT AS conv_ppm
      FROM sess GROUP BY 1 ORDER BY 1""")),
    "q143_user_stats" -> ((q143UserStats _, """
      SELECT user_id, count(*) AS n_events,
             round(sum(value) * 100)::BIGINT AS sum_cents,
             floor(epoch(max(ts)))::BIGINT AS last_seen_epoch
      FROM events GROUP BY user_id ORDER BY user_id""")),
    "q124_purchase_attribution" -> ((q124PurchaseAttribution _, s"""
      WITH $attributionJoinCtes,
      r AS (SELECT purchase_id, user_id, p_value, view_id,
                   count(view_id) OVER (PARTITION BY purchase_id) AS n_views,
                   row_number() OVER (PARTITION BY purchase_id
                     ORDER BY v_ts DESC NULLS LAST, view_id DESC NULLS LAST)
                     AS rn
            FROM j)
      SELECT purchase_id, user_id, n_views, view_id AS attributed_view_id,
             round(p_value, 2) AS purchase_value
      FROM r WHERE rn = 1 ORDER BY purchase_id""")),
    "q69_anomaly" -> ((q69Anomaly _, """
      WITH hourly AS (
        SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
      ),
      stats AS (
        SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
        FROM hourly GROUP BY 1
      )
      SELECT h.hour_epoch, h.event_type, h.n,
             round((h.n - s.mu) / s.sigma, 4) AS z
      FROM hourly h JOIN stats s USING (event_type)
      WHERE abs(round((h.n - s.mu) / s.sigma, 4)) >= 2
      ORDER BY hour_epoch, event_type""")),
    "q36_events_tumbling" -> ((q36EventsTumbling _, """
      SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""")),
    "q45_events_sliding" -> ((q45EventsSliding _, """
      WITH expanded AS (
        SELECT unnest([(floor(epoch(ts)/1800)*1800)::BIGINT,
                       (floor(epoch(ts)/1800)*1800)::BIGINT - 1800]) AS wstart,
               event_type, value
        FROM events
      )
      SELECT wstart, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM expanded GROUP BY wstart, event_type
      ORDER BY wstart, event_type""")),
    "q37_events_sessions" -> ((q37EventsSessions _, s"""
      WITH $sessionIslandsCtes
      SELECT user_id, floor(epoch(min(ts)))::BIGINT AS session_start,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM islands GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""))
  )
}
