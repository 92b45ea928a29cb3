package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + plan-shape checks at sf0.001. Value-level correctness is the
  * driver's DuckDB oracle (every registry entry has oracle SQL); here we
  * assert each query runs, returns rows, and — for the plan-shape-sensitive
  * ones — that the physical plan is the one we designed for scale. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows at sf0.001") {
    Relational.registry.foreach { case (name, (fn, _)) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q06 pushes filters into the parquet scan") {
    val plan = Relational.q06ForecastRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_shipdate"), plan.take(2000))
  }

  test("q02 prunes columns at the scan (ReadSchema subset)") {
    val plan = Relational.q02FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    // scan must not read l_extendedprice-adjacent unused cols like l_tax
    assert(plan.contains("ReadSchema") && !plan.contains("l_tax"),
      plan.take(2000))
  }

  test("q18 dim join is broadcast, not shuffle") {
    val plan = Relational.q18PromoShare(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q09 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.q09TopKOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("oracle map covers exactly the SQL-expressible registry entries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // all relational queries are SQL-expressible
    Relational.registry.keys.foreach { k =>
      assert(SparkEntry.oracleSql.contains(k), s"$k missing oracle")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("as-of join is one windowed pass — no join operator in the plan") {
    val q = Relational.q54AsofJoin(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty)
    // views with no prior purchase carry nulls; some must have one
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("purchase_value"))))
    // purchase always at-or-before the view
    rows.filter(r => !r.isNullAt(r.fieldIndex("purchase_epoch"))).foreach { r =>
      assert(r.getAs[Long]("purchase_epoch") <= r.getAs[Long]("ts_epoch"))
    }
    val plan = q.queryExecution.executedPlan.toString
    // union-tag + carry-forward window: the inequality join never appears,
    // so there is no per-key |views| x |purchases| blowup to begin with
    assert(!plan.contains("Join"), plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
  }

  test("range join: events meet windows through a granule equi-join") {
    val q = Relational.q55RangeJoin(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wstart") < r.getAs[Long]("wend"))
      assert(r.getAs[Long]("n") > 0)
    }
    // the events-to-windows join must be the hash equi-join on granule;
    // only the 1-row scalar-bounds attach may be a nested loop
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("q03/q05 carry no broadcast hint on the fact-sized customer table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    def hintedCustomerJoin(plan: LogicalPlan): Boolean = plan.collect {
      case j: Join =>
        val sides = Seq(j.hint.leftHint.map(_ => j.left),
          j.hint.rightHint.map(_ => j.right)).flatten
        sides.exists(_.output.exists(_.name == "c_custkey"))
    }.exists(identity)
    for (q <- Seq(Relational.q03TopRevenue _, Relational.q05LocalSupplier _)) {
      val plan = q(spark, sf).queryExecution.optimizedPlan
      assert(!hintedCustomerJoin(plan),
        "customer must not be explicitly broadcast (driver OOM at scale)")
    }
    // the genuinely small dims keep their hints (q05 supplier chain)
    val q05 = Relational.q05LocalSupplier(spark, sf).queryExecution.optimizedPlan
    assert(q05.collect { case j: Join
        if j.hint.leftHint.isDefined || j.hint.rightHint.isDefined => j }.nonEmpty)
  }

  test("gap fill carries the last good reading forward, per user, in order") {
    val rows = Relational.q111GapFill(spark, sf).collect()
    // replay the fill on the driver: per user in (ts,event_id) order —
    // which event_id order preserves here because ids are assigned in ts
    // order in the synthetic feed — filled must equal the running last
    // non-null raw, and raw must pass through untouched when present
    val lastSeen = scala.collection.mutable.Map.empty[Long, java.lang.Double]
    var checkedNullFill = 0
    rows.sortBy(_.getAs[Long]("event_id")).foreach { r =>
      val u = r.getAs[Long]("user_id")
      val raw = if (r.isNullAt(r.fieldIndex("value_raw"))) null
        else java.lang.Double.valueOf(r.getAs[Double]("value_raw"))
      val filled = if (r.isNullAt(r.fieldIndex("value_filled"))) null
        else java.lang.Double.valueOf(r.getAs[Double]("value_filled"))
      if (raw != null) {
        assert(filled == raw, s"non-null raw must pass through (user $u)")
        lastSeen(u) = raw
      } else {
        assert(filled == lastSeen.getOrElse(u, null),
          s"null raw must take the user's last good reading (user $u)")
        checkedNullFill += 1
      }
    }
    assert(checkedNullFill > 0, "fixture produced no masked rows to check")
  }

  test("gap fill is one window pass — no join, no extra shuffle") {
    val plan = Relational.q111GapFill(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("daily trend: OLS from exact integer sums matches a driver replay") {
    val out = Relational.q114DailyTrend(spark, sf).collect()
    assert(out.nonEmpty)
    // replay: daily counts per type from the same normalized events read,
    // then the textbook OLS on exact BigInt sufficient statistics
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_timestamp(ts) div 86400 as day")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .view.mapValues(_.size.toLong).toMap
    def round(v: Double, s: Int): Double =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val pts = daily.collect { case ((t, d), y) if t == et => (d, y) }.toSeq
      assert(r.getAs[Long]("n_days") == pts.size.toLong)
      val n = BigInt(pts.size)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val a = n * sxy - sx * sy
      val b = n * sxx - sx * sx
      val c = n * syy - sy * sy
      assert(b != 0 && c != 0, s"degenerate fixture for $et")
      assert(r.getAs[Double]("slope") ==
        round(a.toDouble / b.toDouble, 6), s"slope($et)")
      assert(r.getAs[Double]("r2") ==
        round(a.toDouble * a.toDouble / (b.toDouble * c.toDouble), 6),
        s"r2($et)")
      assert(r.getAs[Double]("avg_daily") ==
        round(sy.toDouble / n.toDouble, 4), s"avg_daily($et)")
    }
  }

  test("above-average profile matches an exact-cents driver replay") {
    val out = Relational.q119AboveAvgProfile(spark, sf).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("n_orders"))).toMap
    val perCust = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "cast(round(o_totalprice * 100) as bigint) as c")
      .collect().groupBy(_.getAs[Long]("o_custkey"))
      .iterator.map { case (_, rs) => // iterator: a pair-valued map over a
        // Map would collapse customers sharing a decile
        val cents = rs.map(_.getAs[Long]("c"))
        val total = cents.sum
        val n = cents.length.toLong
        val above = cents.count(c => c * n > total).toLong
        (math.min(above * 10 / n, 9L), n)
      }.toSeq
    val expected = perCust.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    assert(out == expected)
    assert(out.values.map(_._1).sum == perCust.size.toLong)
  }

  test("q163 conversion latency: matches a driver replay of the definition") {
    val out = Relational.q163ConversionLatency(spark, sf).collect()(0)
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "cast(ts as long) as sec")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val v0 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val gaps = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, sec) =>
        v0.get(u).filter(sec >= _).map(v => (u, sec - v)) }
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).min }.toSeq.sorted
    assert(out.getAs[Long]("n_viewers") == v0.size.toLong)
    assert(out.getAs[Long]("n_converted") == gaps.length.toLong)
    assert(out.getAs[Long]("converted_ppm") ==
      gaps.length.toLong * 1000000L / v0.size)
    // lower quantile: the sorted element at 1-based position ceil(n*p/q)
    assert(out.getAs[Long]("p50_gap_sec") == gaps((gaps.length + 1) / 2 - 1))
    assert(out.getAs[Long]("p90_gap_sec") ==
      gaps((gaps.length * 9 + 9) / 10 - 1))
    assert(out.getAs[Long]("max_gap_sec") == gaps.max)
  }

  test("q163 rides the two-phase prefix sum: every unpartitioned window " +
    "is the per-day block grid, never the distinct-gap marginal") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = (p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case w: WindowExec => Seq(w)
      case _ => Seq.empty
    }) ++ p.children.flatMap(windows)
    val q = Relational.q163ConversionLatency(spark, sf)
    // the two window shapes may each appear several times (the p50/p90
    // branches re-plan `cum`); the invariant is on KINDS, not node count
    val wins = windows(q.queryExecution.executedPlan)
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    // the local prefix partitions by block (small partitions at any span)
    assert(part.nonEmpty &&
      part.forall(_.partitionSpec.exists(_.toString.contains("block"))))
    // every unpartitioned window is the block-offset prefix, ordered on
    // the day-block grid (timespan/1 day rows) — the gap marginal itself
    // (cardinality ~ timespan in SECONDS) never flows through one task
    assert(unpart.nonEmpty && unpart.forall(w =>
      w.orderSpec.exists(_.child.toString.contains("block")) &&
        !w.orderSpec.exists(_.child.toString.contains("gap"))),
      unpart.map(_.simpleStringWithNodeId()).mkString("; "))
  }

  test("q161 integrity audit: orphan counts match key-set arithmetic") {
    val out = Relational.q161IntegrityAudit(spark, sf).collect()(0)
    val liKeys = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .map(_.getLong(0))
    val ordKeys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0))
    val custKeys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val ordCust = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0))
    val ordSet = ordKeys.toSet
    val liSet = liKeys.toSet
    assert(out.getAs[Long]("n_lineitems") == liKeys.length.toLong)
    assert(out.getAs[Long]("n_orders") == ordKeys.length.toLong)
    assert(out.getAs[Long]("n_orphan_lineitems") ==
      liKeys.count(k => !ordSet.contains(k)).toLong)
    assert(out.getAs[Long]("n_orphan_orders") ==
      ordCust.count(k => !custKeys.contains(k)).toLong)
    assert(out.getAs[Long]("n_childless_orders") ==
      ordKeys.count(k => !liSet.contains(k)).toLong)
  }

  test("q154 bot detect: per-user stats match a driver-side replay") {
    val out = Relational.q154BotDetect(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    // independent replay of the whole definition on the 1k-row corpus
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "cast(ts as long) as sec", "ts")
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("sec")))
    val byUser = ev.groupBy(_._1)
    assert(out.keySet == byUser.keySet)
    for ((u, rows) <- byUser) {
      val sorted = rows.sortBy(t => (t._2.getTime, t._2.getNanos, t._3))
      val secs = sorted.map(_._4)
      val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
      val r = out(u)
      assert(r.getAs[Long]("n_events") == rows.length)
      assert(r.getAs[Long]("span_sec") == secs.max - secs.min)
      if (gaps.nonEmpty) {
        val lowerMedian = gaps.sorted.apply((gaps.length + 1) / 2 - 1)
        assert(r.getAs[Long]("median_gap_sec") == lowerMedian,
          s"user $u: ${r.getAs[Long]("median_gap_sec")} vs $lowerMedian")
        val nFast = gaps.count(_ <= Relational.FastGapSec)
        assert(r.getAs[Long]("n_fast") == nFast)
        assert(r.getAs[Boolean]("is_bot") == (nFast >= Relational.BotFastGaps))
      }
    }
  }

  test("above-average profile: window and per-customer agg share one exchange") {
    val plan = Relational.q119AboveAvgProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
    // o_custkey carries window AND aggregate; the only other exchange is
    // the 10-row decile rollup
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(plan).size == 1,
      plan.take(2500))
  }

  test("transition matrix matches a per-user driver replay; rows sum to ~1e6 ppm") {
    val out = Relational.q125TransitionMatrix(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map { r => // full microsecond precision: getTime would truncate to
        // millis and sort under a coarser order than the query's ts
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getAs[String]("event_type"))
      }
    val expected = ev.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val types = rows.sortBy(r => (r._3, r._2)).map(_._4)
      types.zip(types.drop(1))
    }.toSeq.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val got = out.map(r => (r.getAs[String]("event_type"),
      r.getAs[String]("next_type")) -> r.getAs[Long]("n")).toMap
    assert(got == expected)
    // each row's ppm cells sum to 1e6 minus at most |cells| of div flooring
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val ppm = rows.map(_.getAs[Long]("p_ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rows.length, s"ppm($t)=$ppm")
    }
  }

  test("q172 event paths: trigrams match a per-user driver replay") {
    val out = Relational.q172EventPaths(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getAs[String]("event_type"))
      }
    val walks = ev.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val types = rows.sortBy(r => (r._3, r._2)).map(_._4)
      types.lazyZip(types.drop(1)).lazyZip(types.drop(2))
        .map((a, b, c) => (u, (a, b, c)))
    }.toSeq
    val expN = walks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expU = walks.distinct.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    def key(r: org.apache.spark.sql.Row) = (r.getAs[String]("e1"),
      r.getAs[String]("e2"), r.getAs[String]("e3"))
    assert(out.map(r => key(r) -> r.getAs[Long]("n")).toMap == expN)
    assert(out.map(r => key(r) -> r.getAs[Long]("n_users")).toMap == expU)
    val total = expN.values.sum
    out.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("n") * 1000000L / total)
    }
    // hottest-first output order
    val ns = out.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q179 value gini: matches a brute-force pairwise replay") {
    val out = Relational.q179ValueGini(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getAs[String]("event_type") ->
        math.floor(r.getAs[Double]("value") * 100).toLong)
    val byType = ev.groupBy(_._1).map { case (t, rows) => t -> rows.map(_._2) }
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Long]("total_cents") == xs.sum)
      val d = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield math.abs(xs(i) - xs(j))).map(BigInt(_)).sum
      val gini = d * 1000000 / (BigInt(xs.length) * xs.sum)
      assert(BigInt(r.getAs[Long]("gini_ppm")) == gini, s"gini($t)")
      assert(r.getAs[Long]("gini_ppm") >= 0L &&
        r.getAs[Long]("gini_ppm") < 1000000L)
    }
  }

  test("q179 plan: marginal windows and rollups only — no join anywhere") {
    val df = Relational.q179ValueGini(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(2500))
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
  }

  test("q184 burstiness: matches a driver gap replay, never negative") {
    val out = Relational.q184Burstiness(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L, // order key (us)
          i.getEpochSecond, r.getAs[Long]("event_id"))
      }
    val gaps = ev.groupBy(e => (e._1, e._2)).iterator.flatMap { case (_, rows) =>
      val secs = rows.sortBy(r => (r._3, r._5)).map(_._4)
      secs.zip(secs.drop(1)).map { case (a, b) => (rows.head._2, b - a) }
    }.toSeq
    val byType = gaps.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val g = byType(t)
      assert(r.getAs[Long]("n_gaps") == g.length.toLong)
      assert(r.getAs[Long]("sum_g") == g.sum)
      assert(r.getAs[Long]("mean_gap") == g.sum / g.length)
      val cv2 = if (g.sum == 0L) BigInt(0)
        else BigInt(g.length) * g.map(x => BigInt(x) * x).sum * 1000000 /
          (BigInt(g.sum) * g.sum) - 1000000
      assert(BigInt(r.getAs[Long]("cv2_x1e6")) == cv2, s"cv2($t)")
      assert(r.getAs[Long]("cv2_x1e6") >= 0L)
    }
  }

  test("q190 audience overlap: matches a driver set replay") {
    val out = Relational.q190AudienceOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    val m = Tables.events(spark, sf).select("event_type", "user_id")
      .distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    val byType = m.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val (sa, sb) = (byType(a), byType(b))
      val both = sa.intersect(sb).size.toLong
      assert(r.getAs[Long]("n_a") == sa.size.toLong)
      assert(r.getAs[Long]("n_b") == sb.size.toLong)
      assert(r.getAs[Long]("n_both") == both)
      assert(r.getAs[Long]("jaccard_ppm") ==
        both * 1000000L / (sa.size + sb.size - both))
    }
    // every unordered type pair with nonzero overlap appears
    val types = byType.keys.toSeq.sorted
    val expectedPairs = (for (i <- types.indices; j <- i + 1 until types.size
      if byType(types(i)).intersect(byType(types(j))).nonEmpty)
      yield (types(i), types(j))).toSet
    assert(out.map(r => (r.getAs[String]("type_a"),
      r.getAs[String]("type_b"))).toSet == expectedPairs)
  }

  test("q192 supplier hhi: matches a driver replay, bounded by 1e6/n and 1e6") {
    import org.apache.spark.sql.functions._
    val out = Relational.q192SupplierHhi(spark, sf).collect()
    assert(out.nonEmpty)
    val perSupp = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("cents")).collect()
      .groupBy(_.getAs[Long]("l_suppkey")).view
      .mapValues(_.map(_.getAs[Long]("cents")).sum).toMap
    val nationOf = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("n_name"))
      .toMap
    val byNation = perSupp.toSeq.groupBy { case (k, _) => nationOf(k) }
    out.foreach { r =>
      val cents = byNation(r.getAs[String]("n_name")).map(_._2)
      assert(r.getAs[Long]("n_suppliers") == cents.length.toLong)
      assert(r.getAs[Long]("total_cents") == cents.sum)
      val hhi = cents.map(c => BigInt(c) * c).sum * 1000000 /
        (BigInt(cents.sum) * cents.sum)
      assert(BigInt(r.getAs[Long]("hhi_x1e6")) == hhi)
      // perfectly-balanced floor <= hhi <= single-supplier ceiling
      assert(r.getAs[Long]("hhi_x1e6") >= 1000000L / cents.length - 1 &&
        r.getAs[Long]("hhi_x1e6") <= 1000000L)
    }
  }

  test("q193 sourcing redundancy: crafted buckets land exactly; corpus conserves") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus: spend conserved across buckets
    val corpus = Relational.q193SourcingRedundancy(spark, sf).collect()
    val totalCents = Tables.lineitem(spark, sf)
      .select(expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
        "as bigint)").as("c")).agg(sum("c")).head().getLong(0)
    assert(corpus.map(_.getAs[Long]("spend_cents")).sum == totalCents)
    // crafted: part 1 single-sourced, part 2 dual, part 3 five suppliers
    val dir = java.nio.file.Files.createTempDirectory("redund").toString
    Seq(
      (1L, 10L, 100.0, 0.0), (1L, 10L, 100.0, 0.0),
      (2L, 10L, 100.0, 0.0), (2L, 11L, 100.0, 0.0),
      (3L, 10L, 100.0, 0.0), (3L, 11L, 100.0, 0.0), (3L, 12L, 100.0, 0.0),
      (3L, 13L, 100.0, 0.0), (3L, 14L, 100.0, 0.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = Relational.q193SourcingRedundancy(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_parts"), r.getAs[Long]("spend_cents")))).toMap
    assert(out(1L) == ((1L, 20000L))) // two lines, one supplier
    assert(out(2L) == ((1L, 20000L)))
    assert(out(4L) == ((1L, 50000L))) // 5 suppliers cap at the 4+ bucket
    assert(!out.contains(3L))
    out.values.foreach { case (_, c) => assert(c > 0L) }
  }

  test("q194 diurnal profile: cells conserve events, shares sum per type") {
    val out = Relational.q194DiurnalProfile(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables.events(spark, sf).count())
    out.foreach(r => assert(r.getAs[Long]("hod") >= 0L &&
      r.getAs[Long]("hod") <= 23L))
    // each type's ppm cells sum to 1e6 minus at most |cells| of flooring
    for ((t, rows) <- out.groupBy(_.getAs[String]("event_type"))) {
      val ppm = rows.map(_.getAs[Long]("share_ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rows.length, s"ppm($t)=$ppm")
    }
  }

  test("q196 ship latency: rank-selected quantiles match a sorted replay") {
    import org.apache.spark.sql.functions._
    val out = Relational.q196ShipLatency(spark, sf).collect()
    assert(out.nonEmpty)
    val gaps = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("v"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("v"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val xs = gaps(r.getAs[String]("o_orderpriority"))
      val n = xs.length
      assert(r.getAs[Long]("n") == n.toLong)
      // lower quantile: value at 1-based rank ceil(n*p)
      assert(r.getAs[Long]("p50_days") == xs((n + 1) / 2 - 1))
      assert(r.getAs[Long]("p90_days") == xs((n * 9 + 9) / 10 - 1))
      assert(r.getAs[Long]("max_days") == xs.last)
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days") &&
        r.getAs[Long]("p90_days") <= r.getAs[Long]("max_days"))
    }
  }

  test("q197 basket histogram: buckets conserve orders and revenue") {
    import org.apache.spark.sql.functions._
    val out = Relational.q197BasketHistogram(spark, sf).collect()
    assert(out.nonEmpty)
    val per = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("c"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("c").as("oc")).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("oc")))
    assert(out.map(_.getAs[Long]("n_orders")).sum == per.length.toLong)
    assert(out.map(_.getAs[Long]("revenue_cents")).sum == per.map(_._2).sum)
    val expected = per.groupBy(p => math.min(p._1, 7L)).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    assert(out.map(r => r.getAs[Long]("bucket") ->
      ((r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents")))).toMap
      == expected)
    val total = per.map(_._2).sum
    out.foreach(r => assert(BigInt(r.getAs[Long]("revenue_ppm")) ==
      BigInt(r.getAs[Long]("revenue_cents")) * 1000000 / total))
  }

  test("daily trend plan: two partial-agg rollups, no window, no join") {
    val plan = Relational.q114DailyTrend(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
    // day-level then type-level: exactly two hash-exchange boundaries at
    // most (AQE may collapse the second when day-level output is tiny)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      plan.take(2000))
  }

  test("q10 plan: the 25-value brand window consumes salted survivors, not the table") {
    // low-cardinality-window audit: the brand-only window may see at most
    // brands x salts x 3 rows — structurally, a Filter on the salted local
    // rank must sit between it and the scan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val plan = Relational.q10WindowRank(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.size == 2, plan.toString.take(2000))
    val brandOnly = windows.filter(_.partitionSpec.size == 1)
    assert(brandOnly.size == 1, "exactly one brand-only window")
    assert(brandOnly.head.child.collectFirst {
      case f: Filter if f.condition.toString.contains("r0") => f
    }.nonEmpty, "brand window must consume the salted local top-3:\n" +
      brandOnly.head.toString.take(1500))
  }

  test("q52 plan: distribution windows consume the balance marginal, not rows") {
    // the q122 contract: every window's input is a value-count aggregate
    // (bounded by the balance grid), never raw customer rows
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Relational.q52Quartiles(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, plan.toString.take(2000))
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        "window has no aggregate below it:\n" + w.toString.take(1500))
    }
  }
}
