package graft.ops

import graft.TestSpark
import graft.lake.SessionLakeCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path utilities: salted joins must be row-identical to plain joins
  * and actually spread hot keys; bucketed tables must join without a
  * shuffle on either side. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed = {
    // key 1 is 90% of the large side — the classic hot key
    val rows = (1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => ((i % 7 + 2).toLong, s"w$i"))
    rows.toDF("k", "payload")
  }
  private def dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) => s.mkString("|")))
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) => s.mkString("|")))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting spreads the hot key over multiple sub-keys") {
    import org.apache.spark.sql.functions._
    val spread = skewed
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread > 4, s"hot key landed on only $spread salts")
  }

  test("fully identical rows still join correctly and spread (the content-hash trap)") {
    import org.apache.spark.sql.functions._
    // 1000 byte-identical rows of one hot key: a salt derived from row
    // content would put them ALL on one salt — the round-robin salt must
    // both spread them and keep the join row-identical to the plain join
    val dupes = spark.range(1000).select(lit(1L).as("k"), lit("same").as("payload"))
    val one = Seq((1L, "dim")).toDF("k", "name")
    val out = Skew.saltedJoin(dupes, one, "k", saltFactor = 8)
    assert(out.count() == 1000)
    val spread = dupes
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread == 8, s"identical rows landed on only $spread salts")
  }

  test("heavy hitters surfaces the dominant key first") {
    val top = Skew.heavyHitters(skewed, "k", 3).collect()
    assert(top.head.getAs[Long]("k") == 1L)
    assert(top.head.getAs[Long]("cnt") == 900L)
  }

  test("bucketed tables join without a shuffle on either side") {
    val ns = s"bkt_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    val left = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "a")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("id", "b")
    cat.writeBucketed(ns, "l", left, Seq("id"), numBuckets = 4, sortCols = Seq("id"))
    cat.writeBucketed(ns, "r", right, Seq("id"), numBuckets = 4, sortCols = Seq("id"))
    // force the non-broadcast path: co-location only matters for joins too
    // big to broadcast, which is exactly the 100 TB case being modeled
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = cat.load(ns, "l").join(cat.load(ns, "r"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    cat.dropNamespace(ns)
  }

  test("bloom prefilter: no false negatives, real reduction, exact q95") {
    import org.apache.spark.sql.functions._
    val build = (1L to 50L).map(i => i * 7).toDF("k")
    val probe = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "v")
    val survived = Skew.bloomPrefilter(build, "k", probe, "k")
    // every true match survives (false negatives are impossible)
    val trueKeys = (1L to 50L).map(_ * 7).filter(_ <= 2000L).toSet
    val survivedKeys = survived.select("k").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(survivedKeys))
    // the prefilter is a real reduction, not a pass-through: with 2^17
    // bits over 50 keys the FP rate is tiny, so survivors ~ true matches
    assert(survivedKeys.size < 200,
      s"bloom kept ${survivedKeys.size} of 2000 probe rows")
    // schema is untouched (helper columns dropped)
    assert(survived.columns.toSeq == Seq("k", "v"))
    // the registered query equals the plain exact join it accelerates
    val sf = "/root/testdata/sf0.001"
    val bloomed = Skew.q95BloomSemiJoin(spark, sf).collect().map(_.toSeq)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
      .select("o_orderkey", "o_orderdate")
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_items"),
        (sum(expr("cast(cast(round(l_extendedprice * 100) as bigint) * " +
          "(100 - cast(round(l_discount * 100) as bigint)) as decimal(38,0))"))
          .cast("double") / 10000.0).as("revenue"))
      .orderBy("month").collect().map(_.toSeq)
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("skew profile: exact quantiles and hot-key count on a planted distribution") {
    // 90 keys x 1 row, 9 keys x 10 rows, 1 key x 100 rows
    val rows = (1 to 90).map(k => (k.toLong, "a")) ++
      (for (k <- 91 to 99; i <- 1 to 10) yield (k.toLong, s"b$i")) ++
      (1 to 100).map(i => (100L, s"c$i"))
    val out = Skew.skewProfile(rows.toDF("k", "v"), "k").collect()(0)
    assert(out.getAs[Long]("n_rows") == 280L)
    assert(out.getAs[Long]("n_keys") == 100L)
    // lower p50: cum(cnt=1)=90 >= 50; lower p99: cum(cnt=10)=99 >= 99
    assert(out.getAs[Long]("p50_cnt") == 1L)
    assert(out.getAs[Long]("p99_cnt") == 10L)
    assert(out.getAs[Long]("max_cnt") == 100L)
    assert(out.getAs[Long]("max_over_p50_x100") == 10000L)
    // hot = keys above 4x the median count: the nine 10s and the one 100
    assert(out.getAs[Long]("n_hot_keys") == 10L)
  }
}
