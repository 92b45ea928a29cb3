package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Host steal time (jiffies) from /proc/stat — column 8 of the aggregate
    * `cpu` line. A timing window where this delta is large was contaminated
    * by the hypervisor/co-tenant stealing cycles from this VM: per-query
    * numbers from such a window measure the host, not the code. Emitting
    * the before/after delta makes a contaminated BENCH artifact
    * machine-detectable instead of needing human forensics (the r8 bench
    * showed 0.9 s queries at 34 s with zero GC attribution — classic steal).
    * Returns -1 when /proc/stat is unavailable (non-Linux). */
  private def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+"))
          .filter(_.length > 8)
          .map(_(8).toLong)
          .getOrElse(-1L)
      } finally src.close()
    } catch { case _: Throwable => -1L }

  /** Total JVM GC time across all collectors, ms. The second axis of the
    * contamination triage: a slow window with high gc_ms is the JVM's own
    * fault (heap pressure); high steal with flat gc_ms is the host's. */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM/codegen/catalog init + parquet reader path +
    // broadcast/window/agg infrastructure) outside any timed query so the
    // first measured queries don't carry startup cost. The warmup queries
    // run the REAL operator shapes at sf0.001 (agg, window, join) — same
    // schemas as the measured run, so whole-stage codegen for the early
    // queries is already JIT-compiled when timing starts.
    spark.range(1000).selectExpr("sum(id)").foreach(_ => ())
    try {
      val warmSf = "/root/testdata/sf0.001"
      Seq("q01_pricing_summary", "q10_window_rank", "q05_local_supplier")
        .foreach(q => SparkEntry.queries(q)(spark, warmSf).foreach(_ => ()))
    } catch { case _: Throwable => () }
    var failed = List.empty[String]
    // dev-only knob (the driver never sets it): restrict to name prefixes
    // for scale-ratio measurements of a query subset. PREFIX semantics:
    // "q10" also matches q100-q109 — use "q10_" to pin one query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // set-but-empty = no filter, never a 0-query "run"
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val steal0 = stealJiffies()
    val gc0 = gcMillis()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // foreach materializes every row (count() would let Catalyst prune the
      // final projection and skip decoding selected columns).
      try { fn(spark, sfDir).foreach(_ => ()) } catch {
        case e: Throwable =>
          // a crashed query must not silently shrink the total into looking
          // like a speedup — record it in the JSON and on stderr
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Seconds print at 3 decimals (ms precision — far below the run-to-run
    // noise band): at 233 queries the full-precision map made the JSON line
    // ~8 KB and a consumer capturing only a ~4 KB output tail truncated its
    // FRONT, so the line never parsed (r14/r15 BENCH artifacts both carry
    // parsed:null). Rounding shrinks the map; the compact summary line
    // below is the always-parseable fallback.
    def sec3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Contamination self-report: delta of host steal jiffies and JVM GC ms
    // over the timed window. steal_jiffies is -1 when /proc/stat is absent;
    // otherwise a large value (hundreds+ of jiffies while individual queries
    // spike with flat gc_ms) marks the whole artifact as host-contaminated.
    val steal1 = stealJiffies()
    val stealDelta = if (steal0 < 0 || steal1 < 0) -1L else steal1 - steal0
    val gcDelta = gcMillis() - gc0
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"steal_jiffies":$stealDelta,"gc_ms":$gcDelta,"sf":"$sfDir"}""")
    // Compact FINAL line (additive; the full per-query map stays on the line
    // above): small enough (~200 B) that any bounded tail capture retains it
    // whole, so the run's total/failed/contamination read remains machine-
    // parseable even when the map line is truncated.
    println(s"""{"metric":"total","value":${sec3(total)},"unit":"sec","n_queries":${results.size},"failed":$failedJson,"steal_jiffies":$stealDelta,"gc_ms":$gcDelta,"sf":"$sfDir"}""")
    spark.stop()
  }
}
