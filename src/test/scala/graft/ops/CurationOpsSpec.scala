package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 curation operators: k-means (q85), SemDeDup (q86), chunking
  * (q87), BPE merge induction (q88), PMI collocations (q89), column
  * profiling (q90), sequence packing (q91) — invariants + the plan shapes
  * that must survive scale. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q85 kmeans: every vector assigned, d2 >= 0, clusters within codebook") {
    val rows = Similarity.q85KMeans(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.length == nVec)
    assert(rows.forall(_.getAs[Long]("d2") >= 0L))
    val clusters = rows.map(_.getAs[Long]("cluster")).toSet
    assert(clusters.subsetOf(
      (0 until Similarity.adaptiveKmeansK(spark, sf)).map(_.toLong).toSet))
    assert(clusters.size > 1, "all vectors in one cluster — assignment broken")
  }

  test("q85 kmeans: iterated centroids beat (or match) the seed assignment") {
    // Lloyd's monotonicity on the integer grid is only approximate (integer
    // centroid means truncate), but total distortion after 2 updates must
    // not exceed the seed-codebook assignment it started from.
    val q = Similarity.quantized(spark, sf, Similarity.QuantOffset)
    val seedD2 = q.select(element_at(
        call_function("ivec_nearest", col("q"),
          Similarity.centLit(Similarity.seedCentroids(q,
            Similarity.adaptiveKmeansK(spark, sf)))), 2).as("d2"))
      .agg(sum("d2")).collect()(0).getLong(0)
    val finalD2 = Similarity.q85KMeans(spark, sf)
      .agg(sum("d2")).collect()(0).getLong(0)
    assert(finalD2 > 0)
    assert(finalD2 <= seedD2,
      s"2 Lloyd's iterations worsened total d2: seed=$seedD2 final=$finalD2")
  }

  test("q93 purity: per-cluster rollup consistent with the assignment") {
    val asg = Similarity.q85KMeans(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster"))
    val rows = Similarity.q93ClusterPurity(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cluster")).toSet == asg.keySet)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n == asg(r.getAs[Long]("cluster")).length)
      val nMaj = r.getAs[Long]("n_maj")
      assert(nMaj >= 1 && nMaj <= n)
      assert(r.getAs[Long]("purity_ppm") == nMaj * 1000000L / n)
    }
  }

  test("q86 semdedup: pairs ordered, in-threshold, within one cluster") {
    val rows = Similarity.q86SemDedup(spark, sf).collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(a < b)
      val dot = r.getAs[Long]("dot")
      val (n2a, n2b) = (r.getAs[Long]("n2_a"), r.getAs[Long]("n2_b"))
      assert(dot > 0)
      assert(10000L * dot * dot >= Similarity.SemDedupTauSq10k * n2a * n2b)
      // exact-integer cosine bound implies the float cosine clears ~tau
      val cos = dot / math.sqrt(n2a.toDouble * n2b.toDouble)
      assert(cos >= math.sqrt(Similarity.SemDedupTauSq10k / 10000.0) - 1e-9)
    }
  }

  test("q86 codebook size scales with the corpus (linear pair volume)") {
    // the test corpus floors at KMeansK...
    assert(Similarity.semDedupK(spark, sf) == Similarity.KMeansK)
    // ...and a corpus past KMeansK * SemDedupCell vectors gets
    // ceil(n / cell) cells, keeping expected in-cluster pairs ~n * cell
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semk").toString
    val n = Similarity.SemDedupCell * (Similarity.KMeansK + 2) + 1
    (0 until n).map(i => (i.toLong, Array.fill(4)(0.5f), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.semDedupK(spark, dir) == Similarity.KMeansK + 3)
  }

  test("q44 plane count scales with the corpus (bounded LSH buckets)") {
    // floors at NumPlanes on every test corpus (so results are unchanged
    // there)...
    assert(Similarity.dedupPlanes(spark, sf) == Similarity.NumPlanes)
    // ...and a corpus needing more than 2^NumPlanes buckets gets the
    // smallest p with 2^p * DedupTargetBucket >= n (prefix planes, so the
    // first NumPlanes hyperplanes are identical)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpl").toString
    val n = (Similarity.DedupTargetBucket << 9).toInt + 1 // needs 2^10 cells
    (0 until n).map(i => (i.toLong, Array.fill(4)(0.5f), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.dedupPlanes(spark, dir) == 10)
    // the oracle's generate_series probe uses the same integer formula —
    // replicate it here to pin the contract
    val cells = (n + Similarity.DedupTargetBucket - 1) / Similarity.DedupTargetBucket
    val p = (0 to Similarity.MaxDedupPlanes).find(p => (1L << p) >= cells).get
    assert(math.min(Similarity.MaxDedupPlanes,
      math.max(Similarity.NumPlanes, p)) == 10)
  }

  test("q87 chunking: full token coverage, stable fingerprints") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextOps.q87DocChunks(spark, sf).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every doc must produce >= 1 chunk")
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val expected = 1 + (n - 1) / TextOps.ChunkStride
      assert(cs.length == expected)
      val ids = cs.map(_.getAs[Long]("chunk_id")).sorted
      assert(ids.sameElements(0L until expected.toLong), "chunk ids contiguous")
      // last token covered: final chunk starts at (expected-1)*stride < n
      val lastLen = cs.maxBy(_.getAs[Long]("chunk_id")).getAs[Long]("n_tok")
      assert((expected - 1) * TextOps.ChunkStride + lastLen == n ||
        lastLen == TextOps.ChunkSize)
    }
  }

  test("q88 bpe merges: descending weights, 2-codepoint pairs") {
    val rows = TextOps.q88BpeMerges(spark, sf).collect()
    assert(rows.length == TextOps.BpeTopK)
    val weights = rows.map(_.getAs[Long]("weight"))
    assert(weights.sameElements(weights.sorted.reverse))
    rows.foreach(r => assert(r.getAs[String]("pair").codePointCount(0,
      r.getAs[String]("pair").length) == 2))
  }

  test("q89 collocations: lift >= observed-count floor, ranked") {
    val rows = TextOps.q89Collocations(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n12") >= TextOps.PmiMinCount)
      assert(r.getAs[Long]("lift_x100") > 0)
    }
    val lifts = rows.map(_.getAs[Long]("lift_x100"))
    assert(lifts.sameElements(lifts.sorted.reverse))
  }

  test("q90 profile: counts consistent, lexical==native bounds for padded key") {
    val rows = Relational.q90ColumnProfile(spark, sf).collect()
    assert(rows.length == 4)
    val total = Tables.lineitem(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == total)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") > 0)
      assert(r.getAs[String]("min_val") <= r.getAs[String]("max_val"))
    }
    val ok = rows.find(_.getAs[String]("col_name") == "l_orderkey").get
    val realMin = Tables.lineitem(spark, sf).agg(min("l_orderkey"))
      .collect()(0).getLong(0)
    assert(ok.getAs[String]("min_val").toLong == realMin)
  }

  test("q91 packing: offsets within budget, bins contiguous per lang") {
    val rows = TextOps.q91SeqPacking(spark, sf).collect()
    rows.foreach { r =>
      val off = r.getAs[Long]("bin_offset")
      assert(off >= 0 && off < TextOps.PackBudget)
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      val bins = sorted.map(_.getAs[Long]("bin"))
      assert(bins.head == 0L)
      bins.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => }
      // cumulative consistency: bin = floor(prefix_tokens / budget)
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin") == cum / TextOps.PackBudget)
        assert(r.getAs[Long]("bin_offset") == cum % TextOps.PackBudget)
        cum += r.getAs[Long]("n_tok")
      }
    }
  }

  test("q86 plan: in-cluster pairs come from an equi-join on cluster") {
    val plan = Similarity.q86SemDedup(spark, sf).queryExecution
      .executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "SemDeDup must never go all-pairs — cluster equi-join only")
  }

  test("q90 plan: ONE lineitem scan (no per-column rescan)") {
    val plan = Relational.q90ColumnProfile(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans")
  }

  test("q94 plan: keeper argmax is a hash aggregate, not a window sort") {
    val plan = Dedup.q94DedupSurvivors(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), "keeper selection must use max_by")
    assert(!plan.contains("Window"),
      "per-cluster argmax must not buffer clusters through a window")
  }

  test("q95 plan: bloom prefilter sits UNDER the exact join, no sort-merge") {
    val qe = Skew.q95BloomSemiJoin(spark, sf).queryExecution
    // structural check on the optimized plan: the equi-join on orderkey
    // must have the bitmap probe (element_at filter) inside its left
    // (fact) subtree — i.e. the prefilter cuts the scan BEFORE the join,
    // which is the whole point of the reduction
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val exact = joins.filter(_.condition.exists(_.toString.contains("orderkey")))
    assert(exact.nonEmpty, qe.optimizedPlan.toString.take(1500))
    assert(exact.forall(_.left.toString.contains("element_at")),
      "bitmap probe must filter the fact side below the exact join")
    assert(!qe.executedPlan.toString.contains("SortMergeJoin"),
      "survivor join should hash/broadcast at this dim size")
  }

  test("q97 plan: per-source cap uses the bounded typed aggregator") {
    val plan = TextOps.q97SourceCap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "cap must run through the partial top-k Aggregator")
    assert(!plan.contains("Window"),
      "per-source selection must not rank whole sources through a window")
  }

  test("q96/q98 plans: candidates from equi-joins, never all-pairs") {
    Seq(Multimodal.q96PhashNearDup(spark, sf),
        Dedup.q98SubstrOverlap(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        "pair generation must stay an equi-join on the hash bucket")
    }
  }
}
