package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.C8): filters, hash/broadcast/semi/
  * anti joins, hash aggregates, rollup/cube, ranking & frame windows,
  * sort/limit top-k, set ops, distinct aggregates, correlated-style subquery.
  *
  * Every query here is declarative DataFrame code — Catalyst plans the
  * physical strategy (predicate pushdown to parquet, broadcast for dim
  * tables, partial aggregation, AQE). Determinism contract for the DuckDB
  * oracle: total ORDER BY on every output + doubles rounded post-aggregation
  * (sum-order across partitions is otherwise nondeterministic in the last
  * ulp at any scale).
  *
  * Scale notes (100 TB): fact-fact joins (lineitem x orders) shuffle on the
  * join key and benefit from AQE skew handling; all dim tables (region,
  * nation, customer, supplier, part at <1% of fact size) are explicitly
  * `broadcast()` so no shuffle of the fact side is induced by them.
  */
object Relational {
  import Tables._

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q1-style pricing summary: scan + pushed filter + hash agg. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(sum(revenue * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Pushed-down filter + column-pruned projection; raw (unaggregated)
    * doubles are exact so no rounding needed. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q3-style: filtered join chain + agg + top-k. Customer is
    * fact-sized (~10% of orders at any SF) so it is NOT broadcast — AQE
    * plans the orders-customer join (shuffle at scale, runtime broadcast
    * if the filtered side turns out tiny). */
  def q03TopRevenue(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
    lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"))
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy(desc("rev"), col("l_orderkey"))
      .limit(20)
  }

  /** TPC-H Q4-style: EXISTS -> left-semi join, then agg. */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val bigLines = lineitem(s, d).filter(col("l_quantity") > 30)
      .select(col("l_orderkey"))
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1997-01-01"))
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style 6-way join through the full dimension chain. Genuinely
    * small dims (region/nation/supplier chain) are broadcast; customer is
    * fact-sized (multi-hundred-GB at 100 TB) so its join is left to AQE —
    * a shuffle join on custkey, never a driver-side broadcast. */
  def q05LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val nr = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val sup = supplier(s, d)
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
    lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy(desc("rev"), col("n_name"))
  }

  /** TPC-H Q6-style: pure pushed-predicate scan + single global agg. */
  def q06ForecastRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("rev"))

  /** Left-semi join: customers having at least one urgent order. */
  def q07SemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join: customers with no urgent orders (complement of q07). */
  def q08AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Global top-k: planned as TakeOrderedAndProject (no full sort at scale). */
  def q09TopKOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  val TopKSalts = 64 // salt slices for low-cardinality top-k-per-group

  /** Ranking window: top-3 parts per brand by retail price. `p_brand` has
    * 25 values (TPC-H spec), so a direct `Window.partitionBy(p_brand)`
    * serializes rows/25 into one task (the r6 low-cardinality-window
    * audit). Two-phase salted top-k instead: a local top-3 within each of
    * [[TopKSalts]] deterministic salt slices per brand (partition count
    * scales with the corpus), then the real rank over the surviving
    * ≤ brands × salts × 3 candidates — bounded regardless of table size.
    * Exact at any scale: the window's sort key is a TOTAL order (price
    * desc, partkey), so any global top-3 row is its salt slice's top-3
    * (rank == row_number under a total order), and the final rank over
    * candidates equals the global rank because every better row is also a
    * candidate. */
  def q10WindowRank(s: SparkSession, d: String): DataFrame = {
    val order = Seq(desc("p_retailprice"), col("p_partkey"))
    val wLocal = Window.partitionBy("p_brand", "salt").orderBy(order: _*)
    val w = Window.partitionBy("p_brand").orderBy(order: _*)
    part(s, d)
      .withColumn("salt", pmod(col("p_partkey"), lit(TopKSalts)))
      .withColumn("r0", row_number().over(wLocal))
      .filter(col("r0") <= 3)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice", "rnk")
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  /** Frame window: running quantity per supplier over ship order. */
  def q11RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .withColumn("running_qty", round(sum("l_quantity").over(w), 2))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** ROLLUP over returnflag/linestatus (grouping-set nulls ordered
    * explicitly NULLS FIRST to match the oracle). */
  def q12Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** GROUPING SETS — the explicit third grouping form beside ROLLUP/CUBE:
    * exactly the chosen aggregation levels ((flag, status), (status), ())
    * in one pass with partial aggregation per set, instead of unioning
    * three scans. Dataset.groupingSets is new API surface in Spark 4. */
  def q64GroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** CUBE over order status/priority. */
  def q13Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("sum_price"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** UNION ALL + agg across two sources. */
  def q14UnionAgg(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nationkey"))
    val su = supplier(s, d).select(col("s_nationkey").as("nationkey"))
    c.unionAll(su).groupBy("nationkey").agg(count(lit(1)).as("n"))
      .orderBy("nationkey")
  }

  /** EXCEPT (set difference): customer nations with no high-balance supplier. */
  def q15Except(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val su = supplier(s, d).filter(col("s_acctbal") > 8000)
      .select(col("s_nationkey").as("nationkey")).distinct()
    c.except(su).orderBy("nationkey")
  }

  /** Exact distinct aggregates (expand-based distinct agg in Spark). */
  def q16DistinctAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("distinct_parts"),
      countDistinct(col("l_suppkey")).as("distinct_supps"),
      count(lit(1)).as("total_rows"))

  /** GROUP BY + HAVING + top-k on the aggregate. */
  def q17Having(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
      .filter(col("cnt") >= 5)
      .orderBy(desc("cnt"), col("l_partkey"))
      .limit(100)

  /** TPC-H Q14-style promo revenue share: broadcast dim join + conditional
    * agg producing one scalar. */
  def q18PromoShare(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
              col("l_shipdate") < lit("1997-07-01"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(0.0))
          / sum(revenue), 4).as("promo_share"))

  /** Batch windowed aggregation over the events stream table (hourly). */
  def q19EventsHourly(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy(asc_nulls_first("hour_epoch"), asc_nulls_first("event_type"))

  /** TPC-H Q17-style correlated scalar subquery, expressed Spark-first as a
    * pre-aggregated threshold join (what a decorrelation rule would emit). */
  def q20AvgQtyThreshold(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    // Prune BEFORE the threshold aggregation: only ~4% of partkeys are
    // Brand#23, and avg(l_quantity) is per-partkey, so semi-joining lineitem
    // against the brand keys first cuts ~96% of the agg's shuffle output
    // with an identical result.
    val brandParts = broadcast(part(s, d).filter(col("p_brand") === "Brand#23"))
    val brandLines = li
      .join(brandParts.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val thr = brandLines.groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg("l_quantity") * 0.5).as("half_avg_qty"))
    brandLines
      .join(thr, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  /** INTERSECT (set intersection): nations present among both high-balance
    * customers and high-balance suppliers. Plans as a left-semi join over
    * distinct inputs — no cartesian, shuffle on the single key. */
  def q21Intersect(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_nationkey").as("nationkey"))
    val su = supplier(s, d).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").as("nationkey"))
    c.intersect(su).orderBy("nationkey")
  }

  /** LEFT OUTER join + agg: order count per customer INCLUDING zero-order
    * customers (null-preserving count on the right side's key). */
  def q38LeftJoinNulls(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("sum_price"))
      .filter(col("n_orders") <= 2) // keep the interesting sparse tail
      .orderBy("c_custkey")

  /** FULL OUTER join of two pre-aggregated sides (nation-level customer vs
    * supplier counts) — null-filling on both sides. */
  def q39FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val su = supplier(s, d).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    c.join(su, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Pivot-style conditional aggregation: one column per order status. */
  def q40StatusPivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy("o_orderpriority")

  /** UNPIVOT (inverse of [[q40StatusPivot]]): the wide per-status counts
    * melt back to (priority, status, n) rows via `stack` — the
    * wide-to-long reshape. stack is a generator (one pass, no shuffle
    * beyond q40's aggregate). */
  def q63Unpivot(s: SparkSession, d: String): DataFrame =
    q40StatusPivot(s, d)
      .select(col("o_orderpriority"),
        expr("stack(3, 'F', n_f, 'O', n_o, 'P', n_p) AS (status, n)"))
      .filter(col("n") > 0) // melt only combos that exist (oracle = GROUP BY)
      .orderBy("o_orderpriority", "status")

  /** Date arithmetic: average ship delay (days from order to ship) per
    * order priority — datediff/date_diff parity across engines. */
  def q41ShipDelay(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4)
        .as("avg_delay_days"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** String functions: group parts by the first word of p_type
    * (split/substring/upper parity). */
  def q42TypePrefix(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(upper(expr("element_at(split(p_type, ' '), 1)")).as("type_head"))
      .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 2).as("avg_price"))
      .orderBy("type_head")

  /** Semi-structured extraction: JSON `props` column -> typed value, agg per
    * event type (get_json_object / ->> parity). */
  def q43EventsProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** RANGE-frame window: per-supplier trailing-7-day shipped quantity
    * (value-based frame over epoch seconds, not row counts). */
  def q46RangeWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("ship_epoch"))
      .rangeBetween(-7L * 86400, 0)
    lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .withColumn("ship_epoch", unix_timestamp(col("l_shipdate")))
      .withColumn("qty_7d", round(sum("l_quantity").over(w), 2))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "ship_epoch", "qty_7d")
      .orderBy("l_suppkey", "ship_epoch", "l_orderkey", "l_linenumber")
  }

  /** Forward-fill gap imputation via an IGNORE NULLS running window — the
    * telemetry repair every event pipeline needs: a reading masked as bad
    * (here: `value` on error events) is replaced by the user's LAST good
    * reading, in event-time order with event_id as the deterministic
    * tiebreak. Rows before a user's first good reading stay null (nothing
    * to carry). Shape: one shuffle on user_id for the window sort; the
    * fill itself is `last(_, ignoreNulls)` over a rows-unbounded-preceding
    * frame — linear per partition, no self-join, no gap enumeration. */
  def q111GapFill(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("value_raw",
        when(col("event_type") =!= "error", col("value")))
      .select(col("event_id"), col("user_id"), col("value_raw"),
        last(col("value_raw"), ignoreNulls = true).over(w).as("value_filled"))
      .orderBy("event_id")
  }

  /** D-family daily-trend regression per event type: OLS slope / intercept
    * / r^2 of daily event counts vs day index — the drift detector that
    * says which event streams are growing or decaying and how linearly.
    * Spark has `regr_slope`, but its float accumulation order is
    * partial-agg-schedule-dependent — run-dependent low bits that break
    * bitwise oracle comparison. Here the five sufficient statistics
    * (Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINT sums (x = epoch day,
    * y = daily count — products fit a long with 2^13 headroom at any
    * per-type history up to ~10^5 days x 10^6 events/day), and each output
    * is a fixed tree of IEEE ops on those integers — bit-identical on any
    * engine, any partitioning, any scale. Degenerate groups (one day, or
    * constant counts) yield null slope/r² rather than an inf/NaN div.
    *
    * Shape: two hash aggregations — (type, day) then type — both map-side
    * partial; no window, no sort beyond the final tiny ORDER BY. */
  def q114DailyTrend(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("day").as("sx"), sum("y").as("sy"),
        sum(expr("day * y")).as("sxy"),
        sum(expr("day * day")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("a", expr("n * sxy - sx * sy"))
      .withColumn("b", expr("n * sxx - sx * sx"))
      .withColumn("c", expr("n * syy - sy * sy"))
      .select(col("event_type"), col("n").as("n_days"),
        round(expr("cast(sy as double) / cast(n as double)"), 4)
          .as("avg_daily"),
        round(expr(
          "CASE WHEN b = 0 THEN NULL " +
            "ELSE cast(a as double) / cast(b as double) END"), 6)
          .as("slope"),
        round(expr(
          "CASE WHEN b = 0 THEN NULL ELSE " +
            "(cast(sy as double) - cast(a as double) / cast(b as double)" +
            " * cast(sx as double)) / cast(n as double) END"), 4)
          .as("intercept"),
        round(expr(
          "CASE WHEN b = 0 OR c = 0 THEN NULL " +
            "ELSE cast(a as double) * cast(a as double) " +
            "/ (cast(b as double) * cast(c as double)) END"), 6).as("r2"))
      .orderBy("event_type")

  /** D-family correlated-comparison profile: for every customer, how many
    * of their orders exceed THEIR OWN average order value — the classic
    * correlated scalar subquery (`o_totalprice > (SELECT avg(...) WHERE
    * same customer)`), decorrelated by hand onto ONE exchange: the
    * per-customer aggregate rides a window over the same o_custkey
    * partitioning the groupBy needs, so Spark plans window + aggregate on
    * a single shuffle (a naive self-join would shuffle orders twice).
    * Output is the decile histogram of each customer's above-average
    * fraction — bounded at 10 rows at any scale.
    *
    * Exactness: "above average" is decided by integer cross-multiply on
    * exact cents (`cents * n > sum_cents`), never by comparing against a
    * floating average whose partial-agg addition order could flip a
    * boundary row between engines; decile banding is integer div. */
  def q119AboveAvgProfile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    orders(s, d)
      .select(col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .withColumn("sum_cents", sum("cents").over(w))
      .withColumn("n_orders", count(lit(1)).over(w))
      .withColumn("above",
        (col("cents") * col("n_orders") > col("sum_cents")).cast("long"))
      .groupBy("o_custkey")
      .agg(max("n_orders").as("n_orders"), sum("above").as("n_above"))
      .select(expr("least(n_above * 10 div n_orders, 9L)").as("decile"),
        col("n_orders"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("n_orders").as("n_orders"))
      .orderBy("decile")
  }

  /** D-family first-order journey transition matrix: for consecutive
    * events of one user (event-time order, event_id tiebreak), how often
    * does type A follow type B — the Markov view of user behavior that
    * funnels (q66, fixed sequence) and retention (q67, fixed horizon)
    * cannot give: it surfaces EVERY dominant path and dead-end at once.
    * Row-normalized probabilities are exact integer ppm (the q107
    * convention — `n * 1000000 div row_total` — so no float summation
    * order can perturb a digit).
    *
    * Shape: one user_id exchange for the `lead` window, then a
    * (type, next_type) aggregate bounded by |types|² and a ppm window
    * over those ≤25 rows. */
  def q125TransitionMatrix(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // |types|² rows; feeds totals AND the report
    val totals = pairs.groupBy("event_type").agg(sum("n").as("row_total"))
    pairs.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("next_type"), col("n"),
        expr("n * 1000000 div row_total").as("p_ppm"))
      .orderBy("event_type", "next_type")
  }

  /** Behavioral path mining (q172): every 3-step event-type path users
    * actually walk, with traversal counts, distinct walkers and exact-ppm
    * share — the trigram extension of q125's first-order transition
    * matrix. A Markov matrix cannot see third-order structure (view→
    * cart→purchase vs view→cart→view score identically pairwise); the
    * path table is what funnel DESIGN reads (which 3-step routes dominate,
    * where do loops sit), and n vs n_users separates a popular path from
    * one bot walking it in a loop (the q154 signal at path granularity).
    *
    * Scale shape: one window over per-user partitions (user_id is a
    * high-cardinality key — partitions stay small however big the log);
    * the rollup is ≤ |types|³ rows with map-side partial aggregation, and
    * the distinct-walker count shuffles (path, user) pairs ≤ one row per
    * event. Deterministic order: hottest paths first, ties lexicographic. */
  def q172EventPaths(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val g = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(byUser))
      .withColumn("e3", lead("e1", 2).over(byUser))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .localCheckpoint(true) // |types|³ rows; feeds the total AND the report
    g.crossJoin(broadcast(g.agg(sum("n").as("total"))))
      .select(col("e1"), col("e2"), col("e3"), col("n"), col("n_users"),
        expr("n * 1000000 div total").as("share_ppm"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
  }

  /** Conversion-latency report (q163): one row — viewers, converters
    * (users with a purchase at-or-after their first view), exact-ppm
    * conversion share, and the exact lower-quantile p50/p90/max
    * first-view→first-purchase latency in whole epoch seconds. q66 says
    * how many users pass each funnel stage; this says how LONG the
    * view→purchase edge takes — the latency half of funnel analysis.
    *
    * Exactness: second-floor timestamps (the q154 convention), lower
    * quantiles by cumulative rank over the (gap → user count) MARGINAL;
    * the per-user reductions are plain distributed aggregates.
    *
    * Scale shape: the gap marginal's cardinality is bounded by the corpus
    * TIMESPAN in seconds, not by a fixed grid (≈1e8 distinct values at
    * decade span) — the one marginal in the repo that grows with data, so
    * the cumulative rank is the q91 TWO-PHASE prefix sum, not a naked
    * `Window.orderBy(gap)`: local prefix within day blocks
    * (`gap div [[GapBlockSec]]`, ≤ 86 400 distinct gaps per partition),
    * block offsets from a window over the per-block totals (timespan/1 day
    * rows — a true bounded grid), broadcast-joined back. Identical `cum`
    * to the single-window form at any split; the quantile filters then
    * rank-select as before. */
  /** q163 prefix-sum block width: one day of whole-second gaps. Caps the
    * per-partition local prefix at 86 400 rows and sizes the block grid at
    * timespan/1day (≈3.7k rows per decade). */
  val GapBlockSec = 86400L

  def q163ConversionLatency(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_type"),
      col("ts").cast("long").as("sec"))
    val v0 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("v0"))
    val gaps = e.filter(col("event_type") === "purchase")
      .join(v0, "user_id")
      .filter(col("sec") >= col("v0"))
      .groupBy("user_id").agg(min(col("sec") - col("v0")).as("gap"))
    val marg = gaps.groupBy("gap").agg(count(lit(1)).as("nu"))
      .withColumn("block", expr(s"gap div $GapBlockSec"))
      .localCheckpoint(true) // distinct-gap rows feed totals + 2 quantiles
    val wLocal = Window.partitionBy("block").orderBy("gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlocks = Window.orderBy("block") // ≤ timespan/1day rows: bounded
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = marg.groupBy("block").agg(sum("nu").as("btot"))
      .withColumn("boff", coalesce(sum("btot").over(wBlocks), lit(0L)))
      .select("block", "boff")
    val cum = marg.withColumn("lcum", sum("nu").over(wLocal))
      .join(offsets, Seq("block"))
      .withColumn("cum", col("lcum") + col("boff"))
    val tot = marg.agg(sum("nu").as("n_converted"),
      max("gap").as("max_gap_sec"))
    val wt = cum.crossJoin(broadcast(tot))
    val p50 = wt.filter(expr("2 * cum >= n_converted"))
      .agg(min("gap").as("p50_gap_sec"))
    val p90 = wt.filter(expr("10 * cum >= 9 * n_converted"))
      .agg(min("gap").as("p90_gap_sec"))
    v0.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(tot).crossJoin(p50).crossJoin(p90)
      .withColumn("converted_ppm",
        expr("n_converted * 1000000 div n_viewers"))
      .select("n_viewers", "n_converted", "converted_ppm",
        "p50_gap_sec", "p90_gap_sec", "max_gap_sec")
  }

  /** Referential-integrity audit (q161): the ingestion QA gate for the
    * star schema — row totals plus every orphan class that would silently
    * corrupt downstream joins: lineitems whose order is missing, orders
    * whose customer is missing, and childless orders (legal, but a spike
    * is an ingest-ordering alarm). A load pipeline runs this after every
    * batch: fact-side joins silently DROP orphans, so the q01/q09-class
    * revenue queries would under-report without ever failing.
    *
    * Scale shape: each orphan class is one distributed left-anti join on
    * the join key (dim side build/broadcast under AQE at test scale,
    * shuffle join at 100 TB) feeding a count — no row survives to the
    * driver; the five counts assemble by crossJoin of 1-row aggregates. */
  def q161IntegrityAudit(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val ord = orders(s, d)
    val cust = customer(s, d)
    def cnt(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as(name))
    val orphanLi = cnt(li.join(ord,
      li("l_orderkey") === ord("o_orderkey"), "left_anti"), "n_orphan_lineitems")
    val orphanOrd = cnt(ord.join(cust,
      ord("o_custkey") === cust("c_custkey"), "left_anti"), "n_orphan_orders")
    val childless = cnt(ord.join(li,
      ord("o_orderkey") === li("l_orderkey"), "left_anti"), "n_childless_orders")
    cnt(li, "n_lineitems").crossJoin(cnt(ord, "n_orders"))
      .crossJoin(orphanLi).crossJoin(orphanOrd).crossJoin(childless)
  }

  val FastGapSec = 600L // an inter-event gap this small is "machine-paced"
  val BotFastGaps = 3L  // flag users with at least this many fast gaps

  /** Per-user automation/bot detection (q154): inter-arrival behavioral
    * stats per user — event count, distinct event types, active span, the
    * exact LOWER-median inter-event gap, and the count of machine-paced
    * gaps (≤ [[FastGapSec]]); users with ≥ [[BotFastGaps]] fast gaps are
    * flagged. The traffic-hygiene gate a behavioral pipeline runs before
    * trusting events as training signal: scripted clients reveal
    * themselves through gap REGULARITY and burst pacing long before any
    * content signal fires (the q69 anomaly monitor's per-user
    * counterpart).
    *
    * Exactness: gaps are whole epoch seconds (timestamp floor, matching
    * DuckDB `epoch(ts)::BIGINT`); the median is the rank-selected lower
    * median — value at position (n+1) div 2 of the sorted gap multiset —
    * never an interpolated float, so both engines agree bit-for-bit.
    *
    * Scale shape: both windows partition by user_id — a HIGH-cardinality
    * key (every user is an independent partition, parallelism is corpus-
    * wide; the q10/q52 low-cardinality-window concern does not apply),
    * and per-user event counts are human-bounded. One shuffle on user_id
    * serves the gap window, the rank-median window and the per-user
    * aggregate; the three per-user frames then join on the same key. */
  def q154BotDetect(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val gaps = e
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("sec"))
      .withColumn("gap", col("sec") - lag("sec", 1).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("gap").isNotNull)
      .select("user_id", "gap")
    val med = gaps
      .withColumn("r", row_number().over(
        Window.partitionBy("user_id").orderBy(col("gap"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("r") === expr("(n + 1) div 2"))
      .select(col("user_id"), col("gap").as("median_gap_sec"))
    val fast = gaps.groupBy("user_id").agg(
      sum(when(col("gap") <= FastGapSec, 1L).otherwise(0L)).as("n_fast"))
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      countDistinct("event_type").as("n_types"),
      (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("span_sec"))
    stats.join(med, Seq("user_id"), "left").join(fast, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_types"), col("span_sec"),
        col("median_gap_sec"),
        coalesce(col("n_fast"), lit(0L)).as("n_fast"),
        (coalesce(col("n_fast"), lit(0L)) >= BotFastGaps).as("is_bot"))
      .orderBy("user_id")
  }

  /** lag/lead window: month-over-month revenue delta. */
  def q47MonthDelta(s: SparkSession, d: String): DataFrame = {
    val monthly = lineitem(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
      .agg(round(sum(revenue), 2).as("rev"))
    // no-partition window is intentional: input is ONE ROW PER MONTH after
    // the aggregate (~84 rows over the 7-year corpus — bounded by calendar
    // time, not data volume), so the single-partition sort is trivial at
    // any scale; the heavy lifting happened in the distributed groupBy
    val w = Window.orderBy("m")
    monthly
      .withColumn("prev_rev", lag("rev", 1).over(w))
      .withColumn("delta", round(col("rev") - coalesce(col("prev_rev"), lit(0.0)), 2))
      .select(unix_timestamp(col("m")).as("month_epoch"), col("rev"),
        col("prev_rev"), col("delta"))
      .orderBy("month_epoch")
  }

  /** AS-OF JOIN: attach to each 'view' event the most recent prior
    * 'purchase' of the same user — the time-series join DuckDB/kdb expose
    * natively and Spark lacks as an operator. Composed Spark-first (SURVEY
    * preference (a): existing ops) as union-tag + carry-forward window:
    * both sides union into one stream ordered by (ts, side), and
    * `last(p, ignoreNulls)` over an unbounded-preceding row frame carries
    * the latest right-side payload onto every left row. ONE shuffle on the
    * join key, linear work — the naive inequality join explodes to
    * |views| x |purchases| per user before taking max(ts), which at 100 TB
    * is quadratic in the hot keys; this shape never materializes more than
    * the sorted union. Right side is deduped to one row per (user, ts)
    * (max value) so the as-of pick is deterministic in both engines; ties
    * at equal ts resolve right-before-left = inclusive `p.ts <= v.ts`,
    * matching DuckDB's ASOF LEFT JOIN exactly. */
  def q54AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pval"))
      .select(col("user_id"), col("ts"), lit(0).as("is_left"),
        lit(null).cast("long").as("event_id"),
        struct(col("ts").as("pts"), col("pval").as("pval")).as("p"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(1).as("is_left"), col("event_id"),
        expr("cast(null as struct<pts:timestamp,pval:double>)").as("p"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purch)
      .withColumn("lastp", last("p", ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_epoch"),
        unix_timestamp(col("lastp.pts")).as("purchase_epoch"),
        col("lastp.pval").as("purchase_value"))
      .orderBy("event_id")
  }

  /** RANGE JOIN: events against overlapping time intervals (the other
    * time-join the brief names beside as-of). The naive formulation is an
    * inequality join — Spark plans a nested loop, O(|events| x |windows|).
    * This uses the interval-bucketing pattern that survives BOTH sides
    * being large: time is granulated at the window stride, each window
    * explodes into the (bounded, here 2) granules it covers, events compute
    * their granule in-row, and the join is a plain EQUI-join on granule
    * followed by the exact containment filter — shuffle-partitionable,
    * AQE-skew-splittable, no nested loop at any size. The 50 test windows
    * are data-derived (min/max event time), so both engines reproduce them
    * exactly; window bounds ride a 1-row broadcast. */
  def q55RangeJoin(s: SparkSession, d: String): DataFrame = {
    val numWindows = 50
    val ev = events(s, d).select(unix_timestamp(col("ts")).as("e"), col("value"))
    val bounds = ev.agg(min("e").as("tmin"), max("e").as("tmax"))
    val par = bounds.select(col("tmin"),
      greatest(expr(s"(tmax - tmin) div $numWindows"), lit(1L)).as("stride"))
    val win = par
      .select(explode(sequence(lit(0L), lit(numWindows - 1L))).as("w"),
        col("tmin"), col("stride"))
      .select(col("w"), (col("tmin") + col("w") * col("stride")).as("wstart"),
        (col("tmin") + (col("w") + 2) * col("stride")).as("wend"))
    // each window [w*stride, (w+2)*stride) covers exactly granules w and w+1
    val winG = win.select(col("w"), col("wstart"), col("wend"),
      explode(array(col("w"), col("w") + 1)).as("g"))
    val evG = ev.crossJoin(broadcast(par))
      .select(col("e"), col("value"), expr("(e - tmin) div stride").as("g"))
    evG.join(broadcast(winG), "g")
      .filter(col("e") >= col("wstart") && col("e") < col("wend"))
      .groupBy("w", "wstart", "wend")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("w")
  }

  /** Statistical aggregates per group: correlation, sample covariance /
    * variance / stddev — identical sample definitions in both engines;
    * rounding absorbs summation-order ulps like every other double agg. */
  def q65StatAggs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qty_price"),
        round(stddev_samp("l_quantity"), 6).as("sd_qty"),
        round(var_samp("l_discount"), 6).as("var_disc"))
      .orderBy("l_returnflag")

  /** Funnel conversion: of the users who VIEWED, how many PURCHASED within
    * the hour that followed some view. "Exists a view within the horizon
    * before p" holds iff it holds for the LATEST view at-or-before p, so
    * the check is the q54 as-of shape — union-tag + carry-forward window,
    * ONE shuffle on user_id, linear — instead of the naive user equi-join,
    * which expands views x purchases per user before the range filter
    * (quadratic in hot users). The final 1-row x 1-row crossJoin just
    * pairs the two scalar counts. */
  def q66Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("side")) // views first on ts ties
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = v.unionByName(p)
      .withColumn("last_view",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
    val converted = tagged
      .filter(col("side") === 1 && col("last_view").isNotNull &&
        col("ts") <= col("last_view") + expr("INTERVAL 1 HOUR"))
      .select("user_id").distinct()
    v.select("user_id").distinct().agg(count(lit(1)).as("n_viewers"))
      .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
      .select(col("n_viewers"), col("n_converted"),
        round(col("n_converted") / col("n_viewers"), 4).as("conversion"))
  }

  /** Cohort retention: users grouped by their first-activity day, counted
    * at each day-offset they return. Two aggregates + one join, all
    * shuffling on user_id; the output matrix is bounded by days^2, not by
    * event volume. Days encode as days-since-epoch ints (no timezone or
    * epoch-rounding surface at all). */
  def q67Retention(s: SparkSession, d: String): DataFrame = {
    val days = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = days.groupBy("user_id").agg(min("day").as("cohort"))
    days.join(first, "user_id")
      .select(datediff(col("cohort"), lit("1970-01-01")).as("cohort_day"),
        datediff(col("day"), col("cohort")).as("offset"))
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  /** Exact Gini inequality profile (q179): per event type, the Gini
    * coefficient of the event values in exact integer ppm — the
    * whale-detection dial for monetization/engagement streams: a gini
    * near 0 says value is spread evenly across events, near 1e6 says a
    * handful of whale events carry it all, and a SHIFT is a pricing or
    * instrumentation alarm the mean (q65) and percentiles (q48) smear.
    *
    * Exactness: values floor to integer cents (floor has no rounding
    * midpoint, so both engines agree on any double); Gini = mean absolute
    * pairwise difference / (2·mean) computed WITHOUT enumerating pairs:
    * on the per-type (cents → count) marginal ordered ascending,
    * Σ_pairs |x−y| = Σ_v c_v·(v·C_before(v) − S_before(v)) with prefix
    * count/sum windows — so gini_ppm = D·1e6 div (n·total). D crosses
    * int64 at petabyte event counts, so it accumulates in decimal(38)
    * (DuckDB HUGEINT) — the q118 convention.
    *
    * Scale shape: one exchange to the (type, cents) marginal with
    * map-side partials; every window and the rollup run on marginal rows
    * (distinct cent values per type), never on events. */
  def q179ValueGini(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
      .withColumn("cb", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("sb", coalesce(sum(expr("c * cents")).over(w), lit(0L)))
      .groupBy("event_type")
      .agg(sum("c").as("n"), sum(expr("c * cents")).as("total_cents"),
        sum(expr("cast(c as decimal(38, 0)) * " +
          "(cast(cents as decimal(38, 0)) * cb - sb)")).as("dd"))
      .withColumn("gini_ppm", expr(
        "cast((dd * 1000000) div (cast(n as decimal(38, 0)) * total_cents) " +
          "as bigint)"))
      .select("event_type", "n", "total_cents", "gini_ppm")
      .orderBy("event_type")
  }

  /** Traffic burstiness profile (q184): per event type, the pooled
    * per-user inter-arrival gaps' squared coefficient of variation in
    * exact 1e-6 units — cv² = n·Σg²/(Σg)² − 1, the Poisson-ness dial:
    * cv² ≈ 1e6 is memoryless arrivals, far above is bursty (sessions,
    * retries, incidents), far below is machine-paced regularity (the
    * corpus-level reading of the per-user signal q154 flags). Whole-second
    * gaps, so a per-type traffic MODEL (capacity, anomaly baselines) can
    * be chosen on measured arrival statistics instead of an assumed
    * Poisson.
    *
    * Exactness: gaps are whole epoch seconds (`ts.cast(long)` ↔
    * `epoch_us // 1e6`); Σg² accumulates in decimal(38)/HUGEINT and the
    * cv² division is integer-floored in both engines (n·Σg² ≥ (Σg)² by
    * Cauchy-Schwarz, so the result is never negative). The 38-digit
    * headroom bounds exactness to ~1e12 gaps per type with ~1e6-second
    * gaps — shard the rollup (e.g. by day) past that, the q118/q179
    * accumulator convention.
    *
    * Scale shape: ONE window over (user_id, event_type) partitions — the
    * high-cardinality q154 key, never a per-type corpus window — then a
    * |types|-row rollup with map-side partials. */
  def q184Burstiness(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .withColumn("g", col("sec") - lag("sec", 1).over(w))
      .filter(col("g").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("g").as("sum_g"),
        sum(expr("cast(g as decimal(38, 0)) * g")).as("sum_g2"))
      .withColumn("mean_gap", expr("sum_g div n_gaps"))
      .withColumn("cv2_x1e6", expr(
        "if(sum_g = 0, 0L, cast((cast(n_gaps as decimal(38, 0)) * sum_g2 " +
          "* 1000000) div (cast(sum_g as decimal(38, 0)) * sum_g) " +
          "- 1000000 as bigint))"))
      .select("event_type", "n_gaps", "sum_g", "mean_gap", "cv2_x1e6")
      .orderBy("event_type")
  }

  /** Audience-overlap matrix (q190): for every ordered event-type pair,
    * how many distinct users do BOTH, with each side's audience size and
    * the exact-ppm Jaccard — the cross-feature adoption map (do buyers
    * also err? does signup co-occur with purchase?) that funnels (ordered
    * stages) and the transition matrix (adjacent steps) both miss:
    * overlap is order-free co-membership over the whole horizon.
    *
    * Scale shape: the corpus collapses to the DISTINCT (type, user)
    * membership relation (one exchange, ≤ |types| rows per user), the
    * pair join fans out ≤ |types|² rows per user keyed on user_id, and
    * the rollup is |types|²-bounded. Exact integers end to end. */
  def q190AudienceOverlap(s: SparkSession, d: String): DataFrame = {
    val m = events(s, d).select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(true) // membership relation: sizes AND the pair join
    val sizes = m.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = m.select(col("event_type").as("type_a"), col("user_id"))
      .join(m.select(col("event_type").as("type_b"), col("user_id")),
        "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    inter
      .join(sizes.select(col("event_type").as("type_a"), col("n").as("n_a")),
        "type_a")
      .join(sizes.select(col("event_type").as("type_b"), col("n").as("n_b")),
        "type_b")
      .withColumn("jaccard_ppm",
        expr("n_both * 1000000 div (n_a + n_b - n_both)"))
      .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard_ppm")
      .orderBy("type_a", "type_b")
  }

  /** Supplier-concentration HHI per nation (q192): the Herfindahl-
    * Hirschman index of supplier revenue shares in exact 1e-6 units —
    * HHI = Σ shareᵢ² = Σ centsᵢ²·1e6 div (Σ cents)², the
    * supply-concentration dial procurement risk reads: 1e6/n is perfect
    * balance, 1e6 is a single-supplier nation, and a rising HHI is the
    * dependency alarm no mean or top-k view gives (the q179 Gini's
    * market-structure sibling, squared-shares instead of pairwise
    * differences).
    *
    * Exactness: per-line revenue floors to cents FIRST (floor has no
    * rounding midpoint; the double product is IEEE-identical in both
    * engines), so every downstream number is integer; Σcents² and the
    * HHI numerator accumulate in decimal(38)/HUGEINT (the q179/q184
    * convention).
    *
    * Scale shape: fact-side revenue aggregates to the (nation, supplier)
    * marginal with map-side partials (the supplier dim broadcasts);
    * both the Σs² rollup and the share math run on the marginal. */
  def q192SupplierHhi(s: SparkSession, d: String): DataFrame = {
    val perSupp = lineitem(s, d)
      .select(col("l_suppkey"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("cents"))
      .groupBy("l_suppkey").agg(sum("cents").as("s_cents"))
      .join(broadcast(supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))),
        "l_suppkey")
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        "s_nationkey")
    perSupp.groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("s_cents").as("total_cents"),
        sum(expr("cast(s_cents as decimal(38, 0)) * s_cents")).as("s2"))
      .withColumn("hhi_x1e6", expr(
        "cast((s2 * 1000000) div (cast(total_cents as decimal(38, 0)) " +
          "* total_cents) as bigint)"))
      .select("n_name", "n_suppliers", "total_cents", "hhi_x1e6")
      .orderBy("n_name")
  }

  /** Sourcing-redundancy census (q193): parts bucketed by how many
    * DISTINCT suppliers actually shipped them, with each bucket's part
    * count and exact-ppm spend share — the single-sourced-spend risk
    * report completing q192's picture: HHI says revenue concentrates in
    * few suppliers; this says which SPEND has no alternative supplier at
    * all (bucket 1), the procurement number a resilience review opens
    * with. Buckets cap at 4+ so the report is fixed-width at any scale.
    *
    * Exactness: the q192 cents-floor rule; counts and shares are
    * integers end to end. Scale shape: one distinct (part, supplier)
    * exchange and one part-keyed spend rollup join on the part key
    * (both map-side-partial), then a ≤4-row bucket rollup. */
  def q193SourcingRedundancy(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_partkey"), col("l_suppkey"),
      expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
        "as bigint)").as("cents"))
    val redund = li.select("l_partkey", "l_suppkey").distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n_supp"))
    val spend = li.groupBy("l_partkey").agg(sum("cents").as("p_cents"))
    val tot = spend.agg(sum("p_cents").as("n_total"))
    redund.join(spend, "l_partkey")
      .withColumn("bucket", least(col("n_supp"), lit(4L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_parts"), sum("p_cents").as("spend_cents"))
      .crossJoin(broadcast(tot))
      // decimal(38): spend_cents·1e6 crosses int64 at ~9.2e12 cents
      // (TPC-H SF1-class volumes already), the q183/q192 convention
      .withColumn("spend_ppm", expr(
        "cast((cast(spend_cents as decimal(38, 0)) * 1000000) div n_total " +
          "as bigint)"))
      .select("bucket", "n_parts", "spend_cents", "spend_ppm")
      .orderBy("bucket")
  }

  /** Diurnal activity profile (q194): per (event type, hour-of-day), the
    * event count and its exact-ppm share of the type's total — the
    * seasonality baseline q69's anomaly z-scores ignore (a type whose
    * traffic peaks at 14:00 UTC will z-flag every ordinary afternoon
    * against a flat mean; the right baseline is per-hour-of-day, and
    * this is that baseline, materialized). UTC hours (the session is
    * pinned UTC, so `hour(ts)` agrees cross-engine).
    *
    * Scale shape: one rollup to the ≤ |types|·24 marginal with map-side
    * partials; type totals are a rollup of it joined back broadcast. */
  def q194DiurnalProfile(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the totals AND the report
    cells.join(broadcast(cells.groupBy("event_type")
        .agg(sum("n").as("n_type"))), "event_type")
      .withColumn("share_ppm", expr("n * 1000000 div n_type"))
      .select("event_type", "hod", "n", "share_ppm")
      .orderBy("event_type", "hod")
  }

  /** Ship-latency percentiles (q196): per order priority, the exact
    * lower-quantile p50/p90 and the max order→ship delay in whole days —
    * the tail half of q41's mean: SLA conversations happen at p90 and
    * max, which a mean smears (one expedited-priority order shipping a
    * quarter late is invisible in the average and IS the incident).
    *
    * Exactness + scale: day gaps collapse to the (priority, days)
    * count marginal in one exchange; every window and rank-select runs
    * on marginal rows (the q139/q163 discipline — distinct day values,
    * never lineitems under the 5-value priority key), and quantiles are
    * rank-selected minima (cum ≥ ceil(n·p)), never interpolated. */
  def q196ShipLatency(s: SparkSession, d: String): DataFrame = {
    val marg = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("v"))
      .groupBy("o_orderpriority", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // totals, cum frame and the max arm read it
    val tot = marg.groupBy("o_orderpriority").agg(sum("c").as("n"))
    val w = Window.partitionBy("o_orderpriority").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = marg.withColumn("cum", sum("c").over(w))
      .join(broadcast(tot), "o_orderpriority")
      .localCheckpoint(true) // both quantile arms read it
    def q(num: Int, den: Int, out: String) =
      cum.filter(col("cum") >= expr(s"(n * $num + $den - 1) div $den"))
        .groupBy("o_orderpriority").agg(min("v").as(out))
    tot.join(q(1, 2, "p50_days"), "o_orderpriority")
      .join(q(9, 10, "p90_days"), "o_orderpriority")
      .join(marg.groupBy("o_orderpriority").agg(max("v").as("max_days")),
        "o_orderpriority")
      .select("o_orderpriority", "n", "p50_days", "p90_days", "max_days")
      .orderBy("o_orderpriority")
  }

  /** Basket-size histogram (q197): orders bucketed by line count (1..6,
    * 7+) with each bucket's order count and exact-ppm revenue share —
    * basket analysis: whether revenue rides many small baskets or few
    * large ones decides fulfillment batching and promotion design, and a
    * shift in the histogram is a demand-mix alarm the daily trend (q114)
    * cannot attribute. Fixed-width report at any scale.
    *
    * Exactness: the q192 cents-floor rule per line; decimal(38) for the
    * ppm numerator (the q191/q193 fix class). Scale shape: one
    * order-keyed rollup of lineitem with map-side partials, then a
    * ≤7-row bucket rollup. */
  def q197BasketHistogram(s: SparkSession, d: String): DataFrame = {
    val perOrder = lineitem(s, d)
      .select(col("l_orderkey"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * 100) " +
          "as bigint)").as("cents"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("o_cents"))
    val tot = perOrder.agg(sum("o_cents").as("n_total"))
    perOrder.withColumn("bucket", least(col("n_lines"), lit(7L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), sum("o_cents").as("revenue_cents"))
      .crossJoin(broadcast(tot))
      .withColumn("revenue_ppm", expr(
        "cast((cast(revenue_cents as decimal(38, 0)) * 1000000) " +
          "div n_total as bigint)"))
      .select("bucket", "n_orders", "revenue_cents", "revenue_ppm")
      .orderBy("bucket")
  }

  /** Exact interpolated percentiles per group (median + p90). */
  def q48Percentiles(s: SparkSession, d: String): DataFrame =
    // interpolated percentiles of 2-decimal prices land on .xx5 midpoints
    // (even-count medians always; p90 whenever the bracketing gap ends in
    // 5 cents), where Spark and DuckDB round() can disagree on the binary
    // double — floor() has no midpoint and is bit-stable on both engines
    // (see q62 for the empirical divergence examples)
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        floor(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        floor(expr("percentile(o_totalprice, 0.9)")).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Distribution windows: quartile (ntile) + percent_rank of customers by
    * balance within each market segment — reported as per-(segment,
    * quartile) summaries.
    *
    * `c_mktsegment` has 5 values, so the textbook `ntile(4).over(
    * partitionBy(segment))` serializes rows/5 into one task (the r6
    * low-cardinality-window audit). But every reported number is a
    * function of the segment's VALUE-COUNT MARGINAL alone — `c_acctbal`
    * is a decimal(12,2) on a bounded grid (TPC-H: [-999.99, 9999.99],
    * ≤ 1.1M distinct values) — so this computes it the q122 way:
    *   1. one (segment, balance) count aggregate (map-side combined);
    *   2. cumulative positions over the MARGINAL (window rows bounded by
    *      grid cardinality, never corpus size): a balance group occupies
    *      positions [lo, hi] in the segment's (balance, custkey) total
    *      order — per-row ranks are position numbers because the
    *      tie-break key is unique, and equal-balance rows are
    *      interchangeable for every reported stat;
    *   3. each group overlaps ≤ 4 of the ntile intervals (first n%4
    *      tiles take one extra row — the SQL-standard split, exact
    *      integer arithmetic), so a 4-way explode + overlap filter
    *      reassembles per-tile counts, balance extremes, and the tile's
    *      last-position percent_rank `(end-1)/(ntot-1)` bit-identically
    *      to the per-row formulation. */
  def q52Quartiles(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeg = Window.partitionBy("c_mktsegment")
    customer(s, d)
      .groupBy("c_mktsegment", "c_acctbal")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hi", sum("cnt").over(wCum))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn("ntot", sum("cnt").over(wSeg))
      .select(col("c_mktsegment"), col("c_acctbal"), col("lo"), col("hi"),
        col("ntot"), explode(sequence(lit(1L), lit(4L))).as("quartile"))
      // SQL ntile(4): base = n div 4, first n % 4 tiles get base + 1
      .withColumn("t_start",
        expr("(quartile - 1) * (ntot div 4) + least(quartile - 1, ntot % 4) + 1"))
      .withColumn("t_end",
        expr("t_start + (ntot div 4) + if(quartile <= ntot % 4, 1, 0) - 1"))
      .withColumn("overlap",
        least(col("hi"), col("t_end")) - greatest(col("lo"), col("t_start")) + 1)
      .filter(col("overlap") > 0)
      .groupBy("c_mktsegment", "quartile")
      .agg(sum("overlap").as("n"),
        round(min("c_acctbal"), 2).as("min_bal"),
        round(max("c_acctbal"), 2).as("max_bal"),
        // percent_rank of the tile's LAST row: rank == position under the
        // unique (balance, custkey) tie-break; n == 1 degenerates to 0
        round(when(max("ntot") === 1, lit(0.0))
          .otherwise((max("t_end") - 1).cast("double") /
            (max("ntot") - 1)), 6).as("max_pr"))
      .orderBy("c_mktsegment", "quartile")
  }

  /** name -> (query fn, DuckDB oracle SQL). Column names/aliases match
    * pairwise (driver hash compare sorts columns by name). */
  /** Z-order locality profile over (l_partkey, l_suppkey): group rows by
    * the top 16 bits of their Morton key (native codegen'd
    * [[graft.functions.ZOrder2]]) and report each bucket's min/max in BOTH
    * key dimensions. Because a Z-bucket fixes the top 8 bits of each
    * interleaved 16-bit key, every bucket's span is bounded to 256 in both
    * columns simultaneously — the property that makes `sortWithinPartitions
    * (zorder2(x, y))` before a write give parquet row-group min/max stats
    * that can prune 2-D range predicates (a single-column sort bounds only
    * one dimension). The bound holds for keys in zorder2's 16-bit domain
    * (test-SF TPC-H keys fit directly); wider keys fold (`& 0xFFFF`) and
    * MUST be range-bucketed into 16 bits first — `key div
    * ceil(key_range / 65536)` — or the locality claim is void. The
    * registered query is the audit/demonstration; the production lever is
    * the sort-before-write. One scan, one small aggregation (<= 2^16
    * buckets regardless of table size). */
  def q79ZorderLocality(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(expr("zorder2(l_partkey, l_suppkey)").as("z"),
        col("l_partkey"), col("l_suppkey"))
      .withColumn("zbucket", expr("z div 65536"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      .orderBy("zbucket")

  /** The oracle-side Morton key: unrolled bit interleave (bit i of `a` ->
    * z-bit 2i, bit i of `b` -> z-bit 2i+1), identical math to
    * [[graft.functions.ZOrder2]]'s spread/merge twiddle. */
  private def interleaveSql(a: String, b: String): String =
    (0 until 16).map(i =>
      s"((($a & 65535) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($b & 65535) >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString(" + ")

  /** Single-scan column profiling (q90) — the data-quality summary every
    * ingest pipeline runs before training: per column, row count, null
    * count, exact distinct count, and value bounds. ONE scan: each row
    * explodes to (col_name, normalized string value) via a map literal,
    * then two hash aggregations — no per-column rescan, no
    * `count(distinct)` EXPAND blow-up (the first groupBy collapses to
    * (column, value) cardinality with map-side partial aggregation, the
    * second counts survivors). Values normalize to strings whose LEXICAL
    * order equals the native order (keys zero-padded, dates ISO), so
    * min/max survive the transpose (lpad, not format_string — the Formatter
    * path measured ~1.8x slower over the exploded stream). At 100 TB this is the same two-phase
    * shape with per-column cardinality as the only shuffle volume. */
  def q90ColumnProfile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      // array-of-structs, not a map literal: explode(map(...)) builds an
      // ArrayBasedMapData (two backing arrays + map object) per row just
      // to tear it apart again; the struct array emits the same
      // (col_name, val) pairs in the same order ~20% cheaper on the hot
      // exploded stream (optimization r15, guide §1.2 per-task work)
      .select(explode(array(
        struct(lit("l_orderkey").as("col_name"),
          lpad(col("l_orderkey").cast("string"), 12, "0").as("val")),
        struct(lit("l_returnflag").as("col_name"),
          col("l_returnflag").as("val")),
        struct(lit("l_linestatus").as("col_name"),
          col("l_linestatus").as("val")),
        struct(lit("l_shipdate").as("col_name"),
          col("l_shipdate").cast("string").as("val")))).as("cv"))
      .select(col("cv.col_name").as("col_name"), col("cv.val").as("val"))
      .groupBy("col_name", "val").agg(count(lit(1)).as("cnt"))
      .groupBy("col_name")
      .agg(sum("cnt").as("n"),
        coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
        count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
        min("val").as("min_val"), max("val").as("max_val"))
      .orderBy("col_name")

  /** Full ranking-window family in one pass (q92): rank / dense_rank /
    * ntile / percent_rank-style / cume_dist-style / nth_value — all riding ONE
    * hash exchange: same-spec functions collapse into a single Window
    * operator, and the partition-only count window shares the exchange
    * (its keys are a prefix of the sort spec). Verified: 2 exchanges total
    * in the executed plan (the window hash + the output range sort). Ties
    * are broken into a total order so every engine computes identical
    * tiles; the ratio outputs are exact integer ppm, not round(double, 6)
    * — (rank-1)/(n-1) lands on exact .xxxxx5 midpoints (e.g. 41/640)
    * where the engines' round() diverge (the q62/q48 hazard).
    *
    * Low-cardinality-window audit: `o_orderpriority` is a 5-value key,
    * so per-partition rows are bounded by the SELECTIVE FILTER feeding
    * the window (totalprice > 400k admits the top ~2% of orders), not by
    * the table — the demonstration corpus for the full ranking family,
    * not a whole-table scan shape. For an UNBOUNDED input on a 5-value
    * key, use [[q10WindowRank]]'s salted two-phase split (top-k) or
    * [[q52Quartiles]]' value-count-marginal path (distribution stats). */
  def q92RankFunctions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
      .withColumn("tile4", ntile(4).over(w).cast("long"))
      // ratio functions reported as exact integer ppm, not round(double, 6):
      // (rank-1)/(n-1) lands on exact .xxxxx5 midpoints (e.g. 41/640),
      // where the two engines' round() diverge — the q62/q48 hazard again
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      .withColumn("pct_ppm", expr("(rnk - 1) * 1000000 div (n - 1)"))
      .withColumn("cume_ppm", expr("rnk * 1000000 div n"))
      .drop("n")
      .withColumn("third_best", nth_value(col("o_orderkey"), 3).over(w))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q92_rank_functions" -> ((q92RankFunctions _, """
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS dense_rnk,
             ntile(4) OVER w AS tile4,
             ((rank() OVER w - 1) * 1000000)
               // (count(*) OVER (PARTITION BY o_orderpriority) - 1) AS pct_ppm,
             ((rank() OVER w) * 1000000)
               // count(*) OVER (PARTITION BY o_orderpriority) AS cume_ppm,
             nth_value(o_orderkey, 3) OVER w AS third_best
      FROM orders WHERE o_totalprice > 400000
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, rnk, o_orderkey""")),
    "q90_column_profile" -> ((q90ColumnProfile _, """
      SELECT col_name, count(*)::BIGINT AS n,
             sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
             count(DISTINCT val)::BIGINT AS n_distinct,
             min(val) AS min_val, max(val) AS max_val
      FROM (
        SELECT 'l_orderkey' AS col_name, lpad(l_orderkey::VARCHAR, 12, '0') AS val FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', l_returnflag FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', l_linestatus FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', l_shipdate::VARCHAR FROM lineitem) u
      GROUP BY col_name ORDER BY col_name""")),
    "q79_zorder_locality" -> ((q79ZorderLocality _, s"""
      WITH z AS (
        SELECT ${interleaveSql("l_partkey", "l_suppkey")} AS z,
               l_partkey, l_suppkey
        FROM lineitem)
      SELECT z // 65536 AS zbucket, count(*) AS n,
             min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
             min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
      FROM z GROUP BY 1 ORDER BY zbucket""")),
    "q01_pricing_summary" -> ((q01PricingSummary _, """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity),2) AS sum_qty,
             round(sum(l_extendedprice),2) AS sum_base_price,
             round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
             round(avg(l_quantity),4) AS avg_qty,
             round(avg(l_extendedprice),4) AS avg_price,
             round(avg(l_discount),6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    "q02_filter_project" -> ((q02FilterProject _, """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
      ORDER BY l_orderkey, l_linenumber""")),
    "q03_top_revenue" -> ((q03TopRevenue _, """
      SELECT l_orderkey, epoch(o_orderdate)::BIGINT AS order_epoch,
             round(sum(l_extendedprice*(1-l_discount)),2) AS rev
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY rev DESC, l_orderkey LIMIT 20""")),
    "q04_order_priority" -> ((q04OrderPriority _, """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 30)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    "q05_local_supplier" -> ((q05LocalSupplier _, """
      SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS rev
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY rev DESC, n_name""")),
    "q06_forecast_revenue" -> ((q06ForecastRevenue _, """
      SELECT round(sum(l_extendedprice*l_discount),2) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),
    "q07_semi_join" -> ((q07SemiJoin _, """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),
    "q08_anti_join" -> ((q08AntiJoin _, """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),
    "q09_topk_orders" -> ((q09TopKOrders _, """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),
    "q10_window_rank" -> ((q10WindowRank _, """
      SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               rank() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
        FROM part) t
      WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""")),
    "q11_running_sum" -> ((q11RunningSum _, """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
      FROM lineitem WHERE l_quantity >= 48
      ORDER BY l_suppkey, l_orderkey, l_linenumber""")),
    "q12_rollup" -> ((q12Rollup _, """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity),2) AS sum_qty, count(*) AS cnt
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
    "q64_grouping_sets" -> ((q64GroupingSets _, """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity),2) AS sum_qty, count(*) AS cnt
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
    "q13_cube" -> ((q13Cube _, """
      SELECT o_orderstatus, o_orderpriority,
             round(sum(o_totalprice),2) AS sum_price, count(*) AS cnt
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),
    "q14_union_agg" -> ((q14UnionAgg _, """
      SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL SELECT s_nationkey FROM supplier) t
      GROUP BY nationkey ORDER BY nationkey""")),
    "q15_except" -> ((q15Except _, """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey AS nationkey FROM supplier
      WHERE s_acctbal > 8000
      ORDER BY nationkey""")),
    "q16_distinct_agg" -> ((q16DistinctAgg _, """
      SELECT count(DISTINCT l_partkey) AS distinct_parts,
             count(DISTINCT l_suppkey) AS distinct_supps,
             count(*) AS total_rows
      FROM lineitem""")),
    "q17_having" -> ((q17Having _, """
      SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity),2) AS qty
      FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5
      ORDER BY cnt DESC, l_partkey LIMIT 100""")),
    "q18_promo_share" -> ((q18PromoShare _, """
      SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice*(1-l_discount)
                                    ELSE 0.0 END)
                   / sum(l_extendedprice*(1-l_discount)), 4) AS promo_share
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""")),
    "q19_events_hourly" -> ((q19EventsHourly _, """
      SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
             count(*) AS n, round(sum(value),2) AS sum_value
      FROM events GROUP BY 1, 2
      ORDER BY hour_epoch NULLS FIRST, event_type NULLS FIRST""")),
    "q20_avgqty_threshold" -> ((q20AvgQtyThreshold _, """
      SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)""")),
    "q21_intersect" -> ((q21Intersect _, """
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
      ORDER BY nationkey""")),
    "q38_left_join_nulls" -> ((q38LeftJoinNulls _, """
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS sum_price
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey HAVING count(o_orderkey) <= 2
      ORDER BY c_custkey""")),
    "q39_full_outer" -> ((q39FullOuter _, """
      WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust
                 FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS sk, count(*) AS n_supp
                 FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
      SELECT coalesce(ck, sk) AS nationkey,
             coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON ck = sk
      ORDER BY nationkey""")),
    "q40_status_pivot" -> ((q40StatusPivot _, """
      SELECT o_orderpriority,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
             sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
             sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    "q41_ship_delay" -> ((q41ShipDelay _, """
      SELECT o_orderpriority,
             round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay_days,
             count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    "q42_type_prefix" -> ((q42TypePrefix _, """
      SELECT upper(string_split(p_type, ' ')[1]) AS type_head,
             count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
      FROM part GROUP BY 1 ORDER BY type_head""")),
    "q43_events_props" -> ((q43EventsProps _, """
      SELECT event_type, count(*) AS n,
             round(avg((props->>'k')::BIGINT), 4) AS avg_k,
             max((props->>'k')::BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""")),
    "q197_basket_histogram" -> ((q197BasketHistogram _, """
      WITH per AS (
        SELECT l_orderkey, count(*)::BIGINT AS n_lines,
               sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
                 AS o_cents
        FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(o_cents)::BIGINT AS n_total FROM per),
      b AS (SELECT least(n_lines, 7) AS bucket, o_cents FROM per)
      SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_orders,
             sum(o_cents)::BIGINT AS revenue_cents,
             ((sum(o_cents)::HUGEINT * 1000000) // tot.n_total)::BIGINT
               AS revenue_ppm
      FROM b, tot GROUP BY bucket, tot.n_total ORDER BY bucket""")),
    "q196_ship_latency" -> ((q196ShipLatency _, """
      WITH g AS (SELECT o_orderpriority,
                        date_diff('day', o_orderdate, l_shipdate)::BIGINT AS v
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      m AS (SELECT o_orderpriority, v, count(*)::BIGINT AS c
            FROM g GROUP BY 1, 2),
      t AS (SELECT o_orderpriority, sum(c)::BIGINT AS n FROM m GROUP BY 1),
      cum AS (SELECT m.o_orderpriority, m.v, t.n,
                     sum(m.c) OVER (PARTITION BY m.o_orderpriority
                       ORDER BY m.v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
              FROM m JOIN t USING (o_orderpriority)),
      p50 AS (SELECT o_orderpriority, min(v) AS p50_days FROM cum
              WHERE cum >= (n * 1 + 1) // 2 GROUP BY 1),
      p90 AS (SELECT o_orderpriority, min(v) AS p90_days FROM cum
              WHERE cum >= (n * 9 + 9) // 10 GROUP BY 1),
      mx AS (SELECT o_orderpriority, max(v)::BIGINT AS max_days
             FROM m GROUP BY 1)
      SELECT t.o_orderpriority, t.n, p50.p50_days, p90.p90_days, mx.max_days
      FROM t JOIN p50 USING (o_orderpriority)
             JOIN p90 USING (o_orderpriority)
             JOIN mx USING (o_orderpriority)
      ORDER BY t.o_orderpriority""")),
    "q194_diurnal_profile" -> ((q194DiurnalProfile _, """
      WITH cells AS (SELECT event_type, hour(ts)::BIGINT AS hod,
                            count(*)::BIGINT AS n
                     FROM events GROUP BY 1, 2),
      tt AS (SELECT event_type, sum(n)::BIGINT AS n_type
             FROM cells GROUP BY 1)
      SELECT c.event_type, c.hod, c.n,
             (c.n * 1000000 // t.n_type)::BIGINT AS share_ppm
      FROM cells c JOIN tt t USING (event_type)
      ORDER BY c.event_type, c.hod""")),
    "q193_sourcing_redundancy" -> ((q193SourcingRedundancy _, """
      WITH li AS (SELECT l_partkey, l_suppkey,
                         floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT
                           AS cents
                  FROM lineitem),
      red AS (SELECT l_partkey, count(*)::BIGINT AS n_supp
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM li) d
              GROUP BY 1),
      sp AS (SELECT l_partkey, sum(cents)::BIGINT AS p_cents
             FROM li GROUP BY 1),
      tot AS (SELECT sum(p_cents)::BIGINT AS n_total FROM sp),
      b AS (SELECT least(r.n_supp, 4) AS bucket, sp.p_cents
            FROM red r JOIN sp USING (l_partkey))
      SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_parts,
             sum(p_cents)::BIGINT AS spend_cents,
             (sum(p_cents) * 1000000 // tot.n_total)::BIGINT AS spend_ppm
      FROM b, tot GROUP BY bucket, tot.n_total ORDER BY bucket""")),
    "q192_supplier_hhi" -> ((q192SupplierHhi _, """
      WITH per AS (
        SELECT l_suppkey,
               sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
                 AS s_cents
        FROM lineitem GROUP BY 1),
      ns AS (SELECT p.s_cents, n.n_name
             FROM per p JOIN supplier s ON s.s_suppkey = p.l_suppkey
                        JOIN nation n ON n.n_nationkey = s.s_nationkey)
      SELECT n_name, count(*)::BIGINT AS n_suppliers,
             sum(s_cents)::BIGINT AS total_cents,
             ((sum(s_cents::HUGEINT * s_cents) * 1000000)
               // (sum(s_cents)::HUGEINT * sum(s_cents)))::BIGINT
               AS hhi_x1e6
      FROM ns GROUP BY 1 ORDER BY 1""")),
    "q190_audience_overlap" -> ((q190AudienceOverlap _, """
      WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
      sizes AS (SELECT event_type, count(*)::BIGINT AS n FROM m GROUP BY 1),
      inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*)::BIGINT AS n_both
        FROM m a JOIN m b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
             (i.n_both * 1000000 // (sa.n + sb.n - i.n_both))::BIGINT
               AS jaccard_ppm
      FROM inter i JOIN sizes sa ON sa.event_type = i.type_a
                   JOIN sizes sb ON sb.event_type = i.type_b
      ORDER BY i.type_a, i.type_b""")),
    "q184_burstiness" -> ((q184Burstiness _, """
      WITH e AS (SELECT user_id, event_type, ts, event_id,
                        epoch_us(ts) // 1000000 AS sec
                 FROM events),
      g AS (SELECT event_type,
                   sec - lag(sec) OVER (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS g
            FROM e),
      r AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
                   sum(g)::BIGINT AS sum_g, sum(g::HUGEINT * g) AS sum_g2
            FROM g WHERE g IS NOT NULL GROUP BY 1)
      SELECT event_type, n_gaps, sum_g,
             (sum_g // n_gaps)::BIGINT AS mean_gap,
             (CASE WHEN sum_g = 0 THEN 0
                   ELSE (n_gaps::HUGEINT * sum_g2 * 1000000)
                        // (sum_g::HUGEINT * sum_g) - 1000000
              END)::BIGINT AS cv2_x1e6
      FROM r ORDER BY event_type""")),
    "q179_value_gini" -> ((q179ValueGini _, """
      WITH m AS (SELECT event_type, floor(value * 100)::BIGINT AS cents,
                        count(*)::BIGINT AS c
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      p AS (SELECT event_type, cents, c,
                   coalesce(sum(c) OVER w, 0)::BIGINT AS cb,
                   coalesce(sum(c * cents) OVER w, 0)::BIGINT AS sb
            FROM m WINDOW w AS (PARTITION BY event_type ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      g AS (SELECT event_type, sum(c)::BIGINT AS n,
                   sum(c * cents)::BIGINT AS total_cents,
                   sum(c::HUGEINT * (cents::HUGEINT * cb - sb)) AS dd
            FROM p GROUP BY 1)
      SELECT event_type, n, total_cents,
             ((dd * 1000000) // (n::HUGEINT * total_cents))::BIGINT
               AS gini_ppm
      FROM g ORDER BY event_type""")),
    "q172_event_paths" -> ((q172EventPaths _, """
      WITH t AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (SELECT e1, e2, e3, count(*)::BIGINT AS n,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM t WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
      tot AS (SELECT cast(sum(n) AS BIGINT) AS total FROM g)
      SELECT g.e1, g.e2, g.e3, g.n, g.n_users,
             (g.n * 1000000) // tot.total AS share_ppm
      FROM g, tot
      ORDER BY g.n DESC, g.e1, g.e2, g.e3""")),
    "q125_transition_matrix" -> ((q125TransitionMatrix _, """
      WITH nxt AS (
        SELECT event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
        FROM events),
      pairs AS (
        SELECT event_type, next_type, count(*) AS n
        FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT event_type, cast(sum(n) AS BIGINT) AS row_total
              FROM pairs GROUP BY 1)
      SELECT p.event_type, p.next_type, p.n,
             (p.n * 1000000) // t.row_total AS p_ppm
      FROM pairs p JOIN tot t USING (event_type)
      ORDER BY p.event_type, p.next_type""")),
    "q163_conversion_latency" -> ((q163ConversionLatency _, """
      WITH e AS (SELECT user_id, event_type,
                        epoch_us(ts) // 1000000 AS sec FROM events),
      v0 AS (SELECT user_id, min(sec) AS v0 FROM e
             WHERE event_type = 'view' GROUP BY 1),
      gaps AS (SELECT e.user_id, min(e.sec - v.v0) AS gap
               FROM e JOIN v0 v USING (user_id)
               WHERE e.event_type = 'purchase' AND e.sec >= v.v0
               GROUP BY 1),
      m AS (SELECT gap, count(*)::BIGINT AS nu FROM gaps GROUP BY 1),
      cum AS (SELECT gap, nu, sum(nu) OVER (ORDER BY gap) AS cum FROM m),
      tot AS (SELECT sum(nu)::BIGINT AS n_converted,
                     max(gap)::BIGINT AS max_gap_sec FROM m),
      vv AS (SELECT count(*)::BIGINT AS n_viewers FROM v0),
      p50 AS (SELECT min(gap)::BIGINT AS p50_gap_sec FROM cum, tot
              WHERE 2 * cum >= n_converted),
      p90 AS (SELECT min(gap)::BIGINT AS p90_gap_sec FROM cum, tot
              WHERE 10 * cum >= 9 * n_converted)
      SELECT vv.n_viewers, tot.n_converted,
             (tot.n_converted * 1000000 // vv.n_viewers)::BIGINT
               AS converted_ppm,
             p50.p50_gap_sec, p90.p90_gap_sec, tot.max_gap_sec
      FROM vv, tot, p50, p90""")),
    "q161_integrity_audit" -> ((q161IntegrityAudit _, """
      SELECT
        (SELECT count(*) FROM lineitem)::BIGINT AS n_lineitems,
        (SELECT count(*) FROM orders)::BIGINT AS n_orders,
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))::BIGINT
          AS n_orphan_lineitems,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))::BIGINT
          AS n_orphan_orders,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey))::BIGINT
          AS n_childless_orders""")),
    "q154_bot_detect" -> ((q154BotDetect _, s"""
      WITH g0 AS (
        SELECT user_id,
               epoch_us(ts) // 1000000
                 - epoch_us(lag(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id)) // 1000000 AS gap
        FROM events),
      g AS (SELECT user_id, gap FROM g0 WHERE gap IS NOT NULL),
      med AS (SELECT user_id, gap AS median_gap_sec FROM (
                SELECT user_id, gap,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY gap) AS r,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM g) t WHERE r = (n + 1) // 2),
      fast AS (SELECT user_id,
                      coalesce(count(*) FILTER (gap <= $FastGapSec), 0)::BIGINT
                        AS n_fast
               FROM g GROUP BY 1),
      stats AS (SELECT user_id, count(*)::BIGINT AS n_events,
                       count(DISTINCT event_type)::BIGINT AS n_types,
                       (max(epoch_us(ts) // 1000000)
                         - min(epoch_us(ts) // 1000000)) AS span_sec
                FROM events GROUP BY 1)
      SELECT s.user_id, s.n_events, s.n_types, s.span_sec, m.median_gap_sec,
             coalesce(f.n_fast, 0)::BIGINT AS n_fast,
             coalesce(f.n_fast, 0) >= $BotFastGaps AS is_bot
      FROM stats s
      LEFT JOIN med m USING (user_id)
      LEFT JOIN fast f USING (user_id)
      ORDER BY s.user_id""")),
    "q119_above_avg_profile" -> ((q119AboveAvgProfile _, """
      WITH per AS (
        SELECT o_custkey,
               round(o_totalprice * 100)::BIGINT AS cents,
               sum(round(o_totalprice * 100)::BIGINT)
                 OVER (PARTITION BY o_custkey) AS sum_cents,
               count(*) OVER (PARTITION BY o_custkey) AS n_orders
        FROM orders),
      cust AS (
        SELECT o_custkey, max(n_orders) AS n_orders,
               cast(sum(CASE WHEN cents * n_orders > sum_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        FROM per GROUP BY 1)
      SELECT least(n_above * 10 // n_orders, 9) AS decile,
             count(*) AS n_customers,
             cast(sum(n_orders) AS BIGINT) AS n_orders
      FROM cust GROUP BY 1 ORDER BY decile""")),
    "q114_daily_trend" -> ((q114DailyTrend _, """
      WITH daily AS (
        SELECT event_type, (floor(epoch(ts) / 86400))::BIGINT AS day,
               count(*) AS y
        FROM events GROUP BY event_type, day),
      st AS (
        SELECT event_type, count(*) AS n,
               cast(sum(day) AS BIGINT) AS sx,
               cast(sum(y) AS BIGINT) AS sy,
               cast(sum(day * y) AS BIGINT) AS sxy,
               cast(sum(day * day) AS BIGINT) AS sxx,
               cast(sum(y * y) AS BIGINT) AS syy
        FROM daily GROUP BY event_type),
      abc AS (
        SELECT event_type, n, sx, sy,
               n * sxy - sx * sy AS a,
               n * sxx - sx * sx AS b,
               n * syy - sy * sy AS c
        FROM st)
      SELECT event_type, n AS n_days,
             round(sy::DOUBLE / n::DOUBLE, 4) AS avg_daily,
             round(CASE WHEN b = 0 THEN NULL
                        ELSE a::DOUBLE / b::DOUBLE END, 6) AS slope,
             round(CASE WHEN b = 0 THEN NULL
                        ELSE (sy::DOUBLE - a::DOUBLE / b::DOUBLE * sx::DOUBLE)
                             / n::DOUBLE END, 4) AS intercept,
             round(CASE WHEN b = 0 OR c = 0 THEN NULL
                        ELSE a::DOUBLE * a::DOUBLE
                             / (b::DOUBLE * c::DOUBLE) END, 6) AS r2
      FROM abc ORDER BY event_type""")),
    "q111_gap_fill" -> ((q111GapFill _, """
      SELECT event_id, user_id,
             CASE WHEN event_type <> 'error' THEN value END AS value_raw,
             last_value(CASE WHEN event_type <> 'error' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_filled
      FROM events ORDER BY event_id""")),
    "q46_range_window" -> ((q46RangeWindow _, """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             epoch(l_shipdate)::BIGINT AS ship_epoch,
             round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)::BIGINT
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS qty_7d
      FROM lineitem WHERE l_quantity >= 49
      ORDER BY l_suppkey, ship_epoch, l_orderkey, l_linenumber""")),
    "q47_month_delta" -> ((q47MonthDelta _, """
      WITH monthly AS (
        SELECT date_trunc('month', l_shipdate) AS m,
               round(sum(l_extendedprice*(1-l_discount)), 2) AS rev
        FROM lineitem GROUP BY 1)
      SELECT epoch(m)::BIGINT AS month_epoch, rev,
             lag(rev, 1) OVER (ORDER BY m) AS prev_rev,
             round(rev - coalesce(lag(rev, 1) OVER (ORDER BY m), 0.0), 2) AS delta
      FROM monthly ORDER BY month_epoch""")),
    "q48_percentiles" -> ((q48Percentiles _, """
      SELECT o_orderpriority,
             floor(quantile_cont(o_totalprice, 0.5))::BIGINT AS p50,
             floor(quantile_cont(o_totalprice, 0.9))::BIGINT AS p90,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    "q52_quartiles" -> ((q52Quartiles _, """
      WITH ranked AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pr
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      )
      SELECT c_mktsegment, quartile, count(*) AS n,
             round(min(c_acctbal), 2) AS min_bal,
             round(max(c_acctbal), 2) AS max_bal,
             round(max(pr), 6) AS max_pr
      FROM ranked GROUP BY c_mktsegment, quartile
      ORDER BY c_mktsegment, quartile""")),
    "q54_asof_join" -> ((q54AsofJoin _, """
      WITH purch AS (
        SELECT user_id, ts, max(value) AS pval
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
      ),
      views AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
      SELECT v.event_id, v.user_id, floor(epoch(v.ts))::BIGINT AS ts_epoch,
             floor(epoch(p.ts))::BIGINT AS purchase_epoch, p.pval AS purchase_value
      FROM views v ASOF LEFT JOIN purch p
        ON v.user_id = p.user_id AND p.ts <= v.ts
      ORDER BY v.event_id""")),
    "q65_stat_aggs" -> ((q65StatAggs _, """
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
             round(stddev_samp(l_quantity), 6) AS sd_qty,
             round(var_samp(l_discount), 6) AS var_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    "q66_funnel" -> ((q66Funnel _, """
      WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      conv AS (
        SELECT DISTINCT v.user_id
        FROM v JOIN p ON p.user_id = v.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      )
      SELECT (SELECT count(DISTINCT user_id) FROM v) AS n_viewers,
             (SELECT count(*) FROM conv) AS n_converted,
             round((SELECT count(*) FROM conv)::DOUBLE /
                   (SELECT count(DISTINCT user_id) FROM v), 4) AS conversion""")),
    "q67_retention" -> ((q67Retention _, """
      WITH days AS (
        SELECT DISTINCT user_id, ts::DATE AS day FROM events
      ),
      first AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
      SELECT (f.cohort - DATE '1970-01-01') AS cohort_day,
             (d.day - f.cohort) AS "offset", count(*) AS n_users
      FROM days d JOIN first f USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_day, "offset" """)),
    "q63_unpivot" -> ((q63Unpivot _, """
      SELECT o_orderpriority, o_orderstatus AS status, count(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority, status""")),
    "q55_range_join" -> ((q55RangeJoin _, """
      WITH ev AS (SELECT floor(epoch(ts))::BIGINT AS e, value FROM events),
      b AS (SELECT min(e) AS tmin, max(e) AS tmax FROM ev),
      par AS (SELECT tmin, greatest((tmax - tmin) // 50, 1) AS stride FROM b),
      win AS (
        SELECT i.i AS w, tmin + i.i * stride AS wstart,
               tmin + (i.i + 2) * stride AS wend
        FROM par, (SELECT unnest(generate_series(0, 49)) AS i) i
      )
      SELECT w, wstart, wend, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM win JOIN ev ON ev.e >= win.wstart AND ev.e < win.wend
      GROUP BY w, wstart, wend ORDER BY w"""))
  )
}
