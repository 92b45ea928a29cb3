package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join handles moderate cases at runtime; [[saltedJoin]] is the
  * explicit escape hatch when one join key dominates (the classic hot-user /
  * hot-band problem): the skewed (large) side spreads each key over
  * `saltFactor` sub-keys round-robin, the small side is replicated
  * `saltFactor` times — every shuffle partition then holds ~1/saltFactor
  * of any hot key, including keys whose rows are all identical. Result is
  * row-identical to the plain join.
  */
object Skew {
  /** Inner equi-join of `large` (skewed) with `small` on `key`, salted.
    * The salt is `monotonically_increasing_id() % saltFactor` — a
    * round-robin over each partition's rows, which spreads a hot key
    * even when its rows are fully IDENTICAL (any salt derived from row
    * content, e.g. `hash(all columns)`, maps duplicate rows to one salt
    * and the straggler survives). Join output is invariant to salt
    * values — each large row matches exactly its one replica of the
    * small side — so task retries re-salting differently cannot change
    * results, only re-balance them. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumnRenamed(key, "__rkey")
    salted
      .join(replicated,
        col(s"`$key`") === col("__rkey") && salted("__salt") === replicated("__salt"))
      .drop("__salt", "__rkey")
  }

  /** Top-n heavy-hitter keys of a frame — the usual input for deciding
    * whether salting is warranted (and for AQE skew threshold tuning). */
  def heavyHitters(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(col(s"`$key`"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(s"`$key`"))
      .limit(n)

  /** Registered end-to-end check of the salting machinery: events of the
    * 20 heaviest users, aggregated per type — through [[saltedJoin]] with
    * factor 8. [[saltedJoin]] is row-identical to the plain join by
    * construction, so the DuckDB oracle IS the plain join: any salt
    * replication/dedup bug breaks the hash compare. */
  def q61SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "value")
    val hot = heavyHitters(ev, "user_id", 20)
    saltedJoin(ev, hot, "user_id", saltFactor = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** Bloom bit-array size (bits; power of 2) and probe count for
    * [[bloomPrefilter]]. 2^17 bits = 16 KiB sized for the ~10^4 build keys
    * of the registered query (~1% false positives at k=5). At production
    * scale, size m ~ 10-13 bits/key: 10^9 keys -> ~1.5 GB, which is when
    * you switch to Spark's own AQE runtime bloom
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, capped at 8 MB by
    * default) or accept a higher FP rate — the prefilter only needs to cut
    * the shuffle, not be exact, because an exact join always follows. */
  val BloomBits = 1 << 17
  val BloomProbes = 5

  /** Append `__h1`/`__h2` double-hashing seeds for `key` (Kirsch-
    * Mitzenmacher: position_i = h1 + i*(2*h2+1) mod m; the odd multiplier
    * makes the stride coprime to the power-of-2 m). Both seeds are
    * mod-reduced BEFORE combining so position arithmetic stays far from
    * Long overflow (ANSI mode would throw on wrap). */
  private def withBloomHashes(df: DataFrame, key: String): DataFrame =
    df.withColumn("__h1", pmod(xxhash64(col(key)), lit(BloomBits.toLong)))
      .withColumn("__h2", pmod(xxhash64(col(key), lit(1L)), lit(BloomBits.toLong)))

  /** The i-th probed bit position as a column expression. */
  private def bloomPos(i: Int): org.apache.spark.sql.Column =
    pmod(col("__h1") + lit(i.toLong) * (lit(2L) * col("__h2") + lit(1L)),
      lit(BloomBits.toLong))

  /** Build a Bloom filter over `build(key)` as a ONE-ROW DataFrame holding a
    * word-indexed bitmap map — fully declarative (explode -> groupBy-bit_or
    * -> map_from_entries), no driver-side collect, no custom aggregate; the
    * bitmap is bounded by [[BloomBits]]/64 entries regardless of build-side
    * row count. Then drop every `probe` row whose key cannot be in the
    * build set. This is semi-join REDUCTION, the scale lever for a
    * selective dim filter: the probe side is filtered BEFORE its shuffle,
    * so the join exchanges only (FP-rate-inflated) survivors — at 100 TB
    * that is the difference between shuffling 100 TB and shuffling the ~1%
    * that matters. False positives pass through and MUST be removed by the
    * exact join that follows; false negatives are impossible. */
  def bloomPrefilter(build: DataFrame, buildKey: String,
                     probe: DataFrame, probeKey: String): DataFrame = {
    val bits = withBloomHashes(build, buildKey)
      .select((0 until BloomProbes).map(i => bloomPos(i).as(s"p$i")): _*)
      .select(explode(array((0 until BloomProbes).map(i => col(s"p$i")): _*))
        .as("bit"))
    val bloom = bits
      .select(expr("bit div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word"))))
        .as("bm"))
      // densify the sparse word map into a fixed-size array ONCE at build
      // time: `element_at` on a Spark map is a LINEAR scan over its
      // entries, so probing the map directly costs O(words) per probe —
      // measured 3.3 s for q95 at sf0.1 vs 0.6 s with the O(1) array index
      .select(expr(s"transform(sequence(0, ${BloomBits / 64 - 1}), " +
        "i -> coalesce(element_at(bm, cast(i as bigint)), cast(0 as bigint)))")
        .as("__bloom"))
    val probed = (0 until BloomProbes)
      .foldLeft(withBloomHashes(probe, probeKey).crossJoin(broadcast(bloom))) {
        (df, i) => df.withColumn(s"__p$i", bloomPos(i))
      }
    // low bit of the shifted word: `% 2 != 0` is low-bit-set for negative
    // (sign-extended) shifts too — Java remainder keeps the operand's sign
    val hit = (0 until BloomProbes).map { i =>
      s"((shiftright(element_at(__bloom, cast(__p$i div 64 as int) + 1)," +
        s" cast(__p$i % 64 as int)) % 2) != 0)"
    }.mkString(" AND ")
    probed.filter(expr(hit))
      .drop(col("__bloom")).drop("__h1" +: "__h2" +:
        (0 until BloomProbes).map(i => s"__p$i"): _*)
  }

  /** Registered end-to-end check of the Bloom reduction: revenue by month
    * for lineitems of 1995 urgent orders — the fact scan is pre-filtered by
    * a Bloom on the ~selective order-key set, then exactly joined (which
    * removes Bloom false positives), so the DuckDB oracle IS the plain
    * join: a hash/probe/bitmap bug surfaces as a hash mismatch. */
  def q95BloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    // checkpointed: `dim` feeds BOTH the Bloom build and the exact join, and
    // without pinning it each consumer re-runs the orders scan + filter (the
    // q96 `hashed` lesson) — the filtered projection is the small side by
    // construction, so materializing it is bounded while the avoided rework
    // is a second full orders scan at production scale
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
      .select("o_orderkey", "o_orderdate")
      .localCheckpoint(true)
    val fact = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    bloomPrefilter(dim, "o_orderkey", fact, "l_orderkey")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      // exact integer money math (cents x basis points), so the sum is
      // order-independent: round(sum(double), 2) lands on .xx5 boundaries
      // where the engines' summation orders diverge (seen at sf0.001);
      // the decimal(38) accumulator mirrors DuckDB's HUGEINT and cannot
      // overflow at any corpus size
      .agg(count(lit(1)).as("n_items"),
        (sum(expr("cast(cast(round(l_extendedprice * 100) as bigint) * " +
          "(100 - cast(round(l_discount * 100) as bigint)) as decimal(38,0))"))
          .cast("double") / 10000.0).as("revenue"))
      .orderBy("month")
  }

  val HotKeyFactor = 4L // a key above this multiple of the median is "hot"

  /** Key-skew profile (q156 via [[q156SkewProfile]]): the one-row report
    * that decides whether a join/agg key needs [[saltedJoin]] or AQE skew
    * handling BEFORE the shuffle stalls at 100 TB — row/key totals, exact
    * lower-quantile per-key counts (p50/p99), the max key, max/median
    * ratio, and how many keys exceed [[HotKeyFactor]]× the median (the
    * salt-candidate list's size).
    *
    * Scale shape: ONE distributed groupBy produces the per-key counts,
    * which immediately collapse to the (cnt → n_keys) COUNT MARGINAL —
    * bounded by the number of DISTINCT count values, not by keys — and
    * every quantile/total/hot-key stat derives from that checkpointed
    * marginal (the q139/q52 marginal discipline; the unpartitioned cumsum
    * window orders marginal rows, never keys). Quantiles are exact
    * integers: lower quantile q is the smallest cnt with
    * cum·denom ≥ num·n_keys — no float interpolation to diverge on. */
  def skewProfile(df: DataFrame, key: String): DataFrame = {
    val marg = df.groupBy(col(s"`$key`")).agg(count(lit(1)).as("cnt"))
      .groupBy("cnt").agg(count(lit(1)).as("nk"))
      .localCheckpoint(true) // bounded marginal feeds 4 consumers below
    val w = org.apache.spark.sql.expressions.Window.orderBy("cnt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = marg.withColumn("cum", sum("nk").over(w))
    val tot = marg.agg(sum(expr("cnt * nk")).as("n_rows"),
      sum("nk").as("n_keys"), max("cnt").as("max_cnt"))
    val withTot = cum.crossJoin(broadcast(tot))
    val p50 = withTot.filter(expr("2 * cum >= n_keys"))
      .agg(min("cnt").as("p50_cnt"))
    val p99 = withTot.filter(expr("100 * cum >= 99 * n_keys"))
      .agg(min("cnt").as("p99_cnt"))
    val hot = cum.crossJoin(broadcast(p50))
      .filter(col("cnt") > lit(HotKeyFactor) * col("p50_cnt"))
      .agg(coalesce(sum("nk"), lit(0L)).as("n_hot_keys"))
    tot.crossJoin(p50).crossJoin(p99).crossJoin(hot)
      .select(col("n_rows"), col("n_keys"), col("p50_cnt"), col("p99_cnt"),
        col("max_cnt"),
        expr("max_cnt * 100 div p50_cnt").as("max_over_p50_x100"),
        col("n_hot_keys"))
  }

  /** Registered face: profile lineitem's part-key distribution — the fact
    * table's highest-cardinality join key. */
  def q156SkewProfile(s: SparkSession, d: String): DataFrame =
    skewProfile(Tables.lineitem(s, d), "l_partkey")

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q156_skew_profile" -> ((q156SkewProfile _, s"""
      WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      m AS (SELECT cnt, count(*) AS nk FROM c GROUP BY 1),
      cum AS (SELECT cnt, nk, sum(nk) OVER (ORDER BY cnt) AS cum FROM m),
      tot AS (SELECT sum(cnt * nk)::BIGINT AS n_rows,
                     sum(nk)::BIGINT AS n_keys,
                     max(cnt)::BIGINT AS max_cnt FROM m),
      p50 AS (SELECT min(cnt)::BIGINT AS p50_cnt FROM cum, tot
              WHERE 2 * cum >= n_keys),
      p99 AS (SELECT min(cnt)::BIGINT AS p99_cnt FROM cum, tot
              WHERE 100 * cum >= 99 * n_keys),
      hot AS (SELECT coalesce(sum(nk), 0)::BIGINT AS n_hot_keys
              FROM cum, p50 WHERE cnt > $HotKeyFactor * p50_cnt)
      SELECT tot.n_rows, tot.n_keys, p50.p50_cnt, p99.p99_cnt, tot.max_cnt,
             (tot.max_cnt * 100 // p50.p50_cnt)::BIGINT AS max_over_p50_x100,
             hot.n_hot_keys
      FROM tot, p50, p99, hot""")),
    "q95_bloom_semijoin" -> ((q95BloomSemiJoin _, """
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n_items,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT))::DOUBLE
               / 10000.0 AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
      GROUP BY 1 ORDER BY month""")),
    "q61_salted_join" -> ((q61SaltedJoin _, """
      WITH hot AS (
        SELECT user_id FROM events GROUP BY user_id
        ORDER BY count(*) DESC, user_id LIMIT 20
      )
      SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM events JOIN hot USING (user_id)
      GROUP BY event_type ORDER BY event_type"""))
  )
}
