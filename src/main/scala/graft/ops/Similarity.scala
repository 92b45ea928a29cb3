package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.C3) plus
  * approximate-distinct (C4).
  *
  * Two ANN tiers, as a real pipeline would ship them:
  *   - '''brute force''' ([[q25KnnBrute]]): exact cosine top-k. The query set
  *     is tiny and broadcast, so the "cross join" is a broadcast nested loop
  *     whose build side is k rows — the data side streams once, no shuffle of
  *     the corpus. This is the correctness baseline and the right plan when
  *     |queries| is small.
  *   - '''LSH-bucketed''' ([[q26KnnLsh]]): random-hyperplane signatures
  *     bucket the corpus; each query probes its own bucket plus all
  *     Hamming-distance-1 neighbors (multi-probe). At 100 TB the corpus is
  *     hashed ONCE (narrow projection), the probe join is an equi-join on
  *     bucket id, and per-query work is O(corpus/2^planes * probes) instead
  *     of O(corpus). Recall is tunable via planes/probes.
  *
  * All cosine math is done in DOUBLE via `aggregate`/`zip_with` built-ins
  * (codegen'd, no UDF). Hyperplanes are deterministic integer vectors from a
  * seeded LCG so the DuckDB oracle reproduces them exactly.
  */
object Similarity {
  import Tables._

  val K = 5          // neighbors per query (brute force)
  val LshK = 3       // neighbors per query (LSH tier)
  val NumQueries = 10 // query set: vec_id < 10
  val NumPlanes = 6  // 64 buckets

  /** Deterministic hyperplanes: NumPlanes x 64 ints in [-1000, 1000], from a
    * fixed-seed LCG (values chosen once; both engines get the same literals). */
  val hyperplanes: Array[Array[Long]] = {
    var state = 42L
    def next(): Long = { // MMIX LCG
      state = state * 6364136223846793005L + 1442695040888963407L
      math.floorMod(state >>> 16, 2001L) - 1000L
    }
    Array.fill(NumPlanes, 64)(next())
  }

  /** Corpus with double-precision vectors (floats widen exactly). */
  private def emb(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  private val cosineExpr =
    """aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)
      | / (sqrt(aggregate(v, cast(0 as double), (a, x) -> a + x * x))
      |    * sqrt(aggregate(qv, cast(0 as double), (a, x) -> a + x * x)))""".stripMargin

  /** C3 baseline: exact cosine top-K for each query vector (vec_id < 10).
    * round(sim, 6) before ranking makes the order robust to last-ulp
    * differences between engines; ties break on neighbor id. */
  def q25KnnBrute(s: SparkSession, d: String): DataFrame = {
    val corpus = emb(s, d)
    val queries = emb(s, d).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("neighbor_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr(cosineExpr), 6).as("sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .orderBy("q_id", "rnk")
  }

  private def planeSqlArray(p: Array[Long]): String = p.mkString("array(", ",", ")")

  /** bucket(v) = sum_j 2^j * [dot(v, plane_j) >= 0] — one narrow projection. */
  private[ops] def withBucket(df: DataFrame): DataFrame = {
    val bucket = hyperplanes.zipWithIndex.map { case (p, j) =>
      s"""(CASE WHEN aggregate(zip_with(v, ${planeSqlArray(p)}, (x, c) -> x * c),
         |  cast(0 as double), (a, x) -> a + x) >= 0 THEN ${1 << j} ELSE 0 END)"""
        .stripMargin
    }.mkString(" + ")
    df.withColumn("bucket", expr(bucket).cast("long"))
  }

  /** C3 scale tier: multi-probe LSH top-k. Probe set per query = own bucket +
    * every Hamming-distance-1 bucket (NumPlanes+1 probes). */
  def q26KnnLsh(s: SparkSession, d: String): DataFrame = {
    val corpus = withBucket(emb(s, d))
    val queries = withBucket(emb(s, d).filter(col("vec_id") < NumQueries))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(expr(
          s"transform(sequence(0, $NumPlanes), p -> CASE WHEN p = $NumPlanes THEN bucket ELSE cast(bucket ^ shiftleft(1, p) as bigint) END)"))
          .as("probe"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("neighbor_id"))
    corpus.join(queries,
        col("bucket") === col("probe") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr(cosineExpr), 6).as("sim"))
      .distinct() // a neighbor can match several probes of one query
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= LshK)
      .orderBy("q_id", "rnk")
  }

  val NearDupCosine = 0.4

  /** C2c embedding-cosine near-dup: vector pairs with cosine >= [[NearDupCosine]],
    * candidates restricted to same-LSH-bucket pairs (bucket-collect + in-
    * bucket combinations — the signature pipeline runs once, no cartesian).
    * Same recall characteristics as any sign-LSH dedup: near-identical
    * vectors collide in all planes, so threshold-level pairs are caught. */
  def q44DedupEmbedding(s: SparkSession, d: String): DataFrame =
    withBucket(emb(s, d))
      .groupBy("bucket")
      .agg(collect_list(struct(col("vec_id"), col("v"))).as("vs"))
      .filter(size(col("vs")) > 1)
      .select(explode(expr(
        """flatten(transform(vs, (x, i) ->
          |  transform(slice(vs, i + 2, size(vs)), y -> named_struct(
          |    'id_a', least(x.vec_id, y.vec_id),
          |    'id_b', greatest(x.vec_id, y.vec_id),
          |    'sim', round(aggregate(zip_with(x.v, y.v, (p, q) -> p * q),
          |             cast(0 as double), (a, z) -> a + z)
          |           / (sqrt(aggregate(x.v, cast(0 as double), (a, z) -> a + z * z))
          |              * sqrt(aggregate(y.v, cast(0 as double), (a, z) -> a + z * z))), 6)))))"""
          .stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.sim").as("sim"))
      .distinct()
      .filter(col("sim") >= NearDupCosine)
      .orderBy("id_a", "id_b")

  /** Typed single-pass grouped top-k (SURVEY §7.5's custom `Aggregator`):
    * each partition keeps only its k best (neighbor, sim) pairs, so the
    * shuffle carries k rows per (partition, query) instead of the full
    * candidate set — the alternative to window row_number when candidate
    * lists are huge. Ordering matches q25: sim desc, neighbor id asc. */
  case class TopKBuf(items: Seq[(Long, Double)])

  class TopKAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Double), TopKBuf, TopKBuf] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy(t => (-t._2, t._1)).take(k)
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, a: (Long, Long, Double)): TopKBuf =
      TopKBuf(trim(b.items :+ ((a._2, a._3))))
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf(trim(x.items ++ y.items))
    override def finish(b: TopKBuf): TopKBuf = TopKBuf(trim(b.items))
    override def bufferEncoder = org.apache.spark.sql.Encoders.product[TopKBuf]
    override def outputEncoder = org.apache.spark.sql.Encoders.product[TopKBuf]
  }

  /** C3 via the typed Aggregator — same result (and same oracle) as
    * [[q25KnnBrute]], different physical strategy: partial top-k per
    * partition, merge, no window sort. */
  def q49KnnAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, d)
    val queries = emb(s, d).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr(cosineExpr), 6).as("sim"))
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(K).toColumn.name("top")
    scored.groupByKey(_._1).agg(agg)
      .flatMap { case (qId, top) =>
        top.items.zipWithIndex.map { case ((n, sim), i) => (qId, n, sim, (i + 1).toLong) }
      }
      .toDF("q_id", "neighbor_id", "sim", "rnk")
      .orderBy("q_id", "rnk")
  }

  /** C4 approximate distinct: HLL++ `approx_count_distinct` (rsd 1%) checked
    * against the exact count inside the query — the boolean lets the hash
    * oracle verify the sketch's accuracy without bit-matching HLL internals. */
  def q27ApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .select(col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * 0.05).as("approx_ok"))

  private def lshProbeSql: String = {
    val planes = hyperplanes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_inner_product(v, ${p.mkString("[", ",", "]")}::DOUBLE[]) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (SELECT vec_id, v, ($planes)::BIGINT AS bucket FROM e),
      probes AS (
        SELECT vec_id AS q_id, v AS qv, bucket,
               CASE WHEN p.p = $NumPlanes THEN bucket
                    ELSE xor(bucket, 1::BIGINT << p.p) END AS probe
        FROM b, (SELECT unnest(generate_series(0, $NumPlanes)) AS p) p
        WHERE vec_id < $NumQueries
      ),
      cand AS (
        SELECT DISTINCT pr.q_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(c.v, pr.qv), 6) AS sim
        FROM probes pr JOIN b c ON c.bucket = pr.probe AND c.vec_id <> pr.q_id
      ),
      ranked AS (
        SELECT q_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM cand
      )
      SELECT q_id, neighbor_id, sim, rnk FROM ranked
      WHERE rnk <= $LshK ORDER BY q_id, rnk"""
  }

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q25_knn_brute" -> ((q25KnnBrute _, s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      sims AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(c.v, q.v), 6) AS sim
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < $NumQueries
      ),
      ranked AS (
        SELECT q_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM sims
      )
      SELECT q_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= $K
      ORDER BY q_id, rnk""")),
    "q26_knn_lsh" -> ((q26KnnLsh _, lshProbeSql)),
    "q49_knn_agg" -> ((q49KnnAgg _, s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      sims AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(c.v, q.v), 6) AS sim
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < $NumQueries
      ),
      ranked AS (
        SELECT q_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM sims
      )
      SELECT q_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= $K
      ORDER BY q_id, rnk""")),
    "q44_dedup_embedding" -> ((q44DedupEmbedding _, {
      val planes = hyperplanes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN list_inner_product(v, ${p.mkString("[", ",", "]")}::DOUBLE[]) >= 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (SELECT vec_id, v, ($planes)::BIGINT AS bucket FROM e)
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b2.v), 6) AS sim
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= $NearDupCosine
      ORDER BY id_a, id_b"""
    })),
    "q27_approx_distinct" -> ((q27ApproxDistinct _, """
      SELECT count(DISTINCT user_id) AS exact_users, true AS approx_ok
      FROM events"""))
  )
}
