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

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
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
