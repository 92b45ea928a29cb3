package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operators: planted-duplicate detection + plan-shape (the LSH join
  * must be an equi-join on band keys, never a cartesian product). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planted: DataFrame = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees under a bright morning sky"
    Seq(
      (1L, base, "en", "s", base.length.toLong),
      // near-dup of 1: one word changed
      (2L, base.replace("morning", "evening"), "en", "s", base.length.toLong),
      // exact dup of 1 modulo whitespace/case
      (3L, ("  " + base.toUpperCase + "  ").replaceAll(" ", "  "), "en", "s", base.length.toLong),
      (4L, "completely different text about spark shuffles partitions joins " +
        "aggregations windows watermarks and codegen stages running at scale", "en", "s", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def withDocs[A](df: DataFrame)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    body(dir)
  }

  test("opt-in pair budget (VERDICT r11 #7): capped output is a strict " +
    "deterministic subset of the uncapped; a non-binding cap is a no-op") {
    def key(df: DataFrame): Set[(Long, Long)] = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sf0.001 yields a small but nonempty candidate stream
    val full = key(Dedup.nearDupPairs(spark, sf))
    assert(full.nonEmpty, "need candidates to exercise the cap")
    // default face == q23 face (cap off by default)
    assert(key(Dedup.q23DedupMinhash(spark, sf)) == full)
    // a non-binding cap reproduces the full stream exactly (step = 1)
    assert(key(Dedup.nearDupPairs(spark, sf,
      maxPairs = Some(full.size + 10L))) == full)
    // a binding cap yields a nonempty strict subset, and re-running it
    // reproduces the SAME subset (fixed arithmetic, no RNG)
    val cap = math.max(1L, full.size / 2L)
    val thin = key(Dedup.nearDupPairs(spark, sf, maxPairs = Some(cap)))
    assert(thin.nonEmpty && thin.subsetOf(full) && thin.size < full.size,
      s"capped ${thin.size} of ${full.size}")
    assert(key(Dedup.nearDupPairs(spark, sf, maxPairs = Some(cap))) == thin,
      "deterministic: the same cap re-samples the same pairs")
    // the containment face shares the budget seam
    val fullC = key(Dedup.containmentPairs(spark, sf))
    val thinC = key(Dedup.containmentPairs(spark, sf, Some(cap)))
    assert(fullC == full, "same candidate stream under both scorers")
    assert(thinC == thin, "same thinning arithmetic under both scorers")
    intercept[IllegalArgumentException](
      Dedup.nearDupPairs(spark, sf, maxPairs = Some(0L)))
  }

  test("funnel: per-source monotone raw -> exact -> cluster survivors") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val t2 = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val docs = Seq(
      (1L, t1, "en", "s1", 20L),  // keeper of the identical family {1,2,4}
      (2L, t1, "en", "s1", 20L),  // exact dup, same source
      (3L, t2, "en", "s1", 16L),  // unique
      (4L, t1, "en", "s2", 20L)   // exact dup ACROSS sources
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q115DedupFunnel(spark, dir).collect()
        .map(r => r.getAs[String]("source") -> r).toMap
      // s1: 3 raw; exact keeps 1 (family min) and 3; both survive
      // clustering (1 is its family's component min, 3 is isolated)
      assert(out("s1").getAs[Long]("n_raw") == 3L)
      assert(out("s1").getAs[Long]("chars_raw") == 56L)
      assert(out("s1").getAs[Long]("n_exact") == 2L)
      assert(out("s1").getAs[Long]("n_final") == 2L)
      assert(out("s1").getAs[Long]("chars_final") == 36L)
      assert(out("s1").getAs[Double]("pct_kept") == 66.67)
      // s2's only doc is a cross-source copy: dropped at the exact stage
      assert(out("s2").getAs[Long]("n_raw") == 1L)
      assert(out("s2").getAs[Long]("n_exact") == 0L)
      assert(out("s2").getAs[Long]("n_final") == 0L)
      assert(out("s2").getAs[Double]("pct_kept") == 0.0)
    }
  }

  test("funnel stages ride one corpus scan: window min on fp, no fp self-join") {
    val df = Dedup.q115DedupFunnel(spark, sf)
    df.collect() // materialize so AQE's FINAL plan is inspectable: the
    // checkpointed label side has no size estimate statically, so the
    // static plan shows a sort-merge join that AQE demotes at runtime
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), full.take(500))
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    // judge only what actually ran
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("Window"), plan.take(1500))
    // the exact stage must NOT appear as a corpus self-join on the
    // fingerprint, and the (small) label hookup must land broadcast
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("split leakage: cross-split shingle jaccard matches a driver replay") {
    val out = Dedup.q120SplitLeakage(spark, sf).collect()
    assert(out.nonEmpty)
    val assigned = Dedup.splitAssigned(spark, sf).select("doc_id", "split")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val bySplit = Dedup.shingled(spark, sf).collect()
      .flatMap(r => r.getSeq[String](1)
        .map(g => (assigned(r.getAs[Long]("doc_id")), g)))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(a < b, "pairs must be canonically ordered")
      val inter = bySplit(a).intersect(bySplit(b)).size.toLong
      assert(r.getAs[Long]("n_shared") == inter, s"n_shared($a,$b)")
      val union = bySplit(a).size + bySplit(b).size - inter
      val jac = BigDecimal(inter.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("jaccard") == jac, s"jaccard($a,$b)")
    }
  }

  test("split leakage plan: bounded self-equi-join, no cartesian") {
    val df = Dedup.q120SplitLeakage(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("incremental near-dup: only incoming-vs-corpus pairs, never corpus pairs") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val docs = Seq(
      (1L, t, "en", Dedup.IncomingSource, 16L),            // incoming copy
      (2L, t, "en", "corpus1", 16L),                       // corpus original
      (3L, t, "en", "corpus2", 16L),                       // second corpus copy
      (4L, "totally different words about nothing shared " +
        "with the planted family at all here", "en", "corpus1", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q128IncrementalNearDup(spark, dir).collect()
      // corpus-corpus pair (2,3) must NOT appear; incoming doc 1 pairs
      // with both corpus copies at jaccard 1.0
      assert(out.length == 2, out.mkString(","))
      out.foreach { r =>
        assert(r.getAs[Long]("incoming_id") == 1L)
        assert(r.getAs[Double]("jaccard") == 1.0)
        assert(r.getAs[Boolean]("is_dup"))
      }
      assert(out.map(_.getAs[Long]("corpus_id")).toSet == Set(2L, 3L))
    }
  }

  test("dedup ledger: every doc gets exactly one action, consistent with q115") {
    withDocs(planted) { dir =>
      val out = Dedup.q129DedupLedger(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("action"), r.getAs[Long]("keeper_id"))).toMap
      // planted: doc 3 is a whitespace/case copy of doc 1 -> drop_exact;
      // doc 2 is a near-dup of doc 1 (one word changed) -> its cluster
      // keeper is 1 when LSH surfaces the pair; doc 4 unique -> keep
      assert(out(1L) == (("keep", 1L)))
      assert(out(3L) == (("drop_exact", 1L)))
      assert(out(4L) == (("keep", 4L)))
      val (a2, k2) = out(2L)
      assert(a2 == "drop_near" && k2 == 1L ||
        a2 == "keep" && k2 == 2L) // near-dup recall is LSH-dependent
      // ledger keep-set must equal the funnel's survivor count
      val funnel = Dedup.q115DedupFunnel(spark, dir).collect()
        .map(_.getAs[Long]("n_final")).sum
      assert(out.values.count(_._1 == "keep").toLong == funnel)
      // final_keeper_id is TERMINAL: it must name a 'keep' row, never a
      // dropped doc (the one-hop keeper_id may), and never exceed the hop
      val full = Dedup.q129DedupLedger(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("action"), r.getAs[Long]("keeper_id"),
            r.getAs[Long]("final_keeper_id"))).toMap
      full.foreach { case (id, (action, keeper, fin)) =>
        assert(full(fin)._1 == "keep",
          s"doc $id resolved to $fin, whose action is ${full(fin)._1}")
        assert(fin <= keeper, s"doc $id: final $fin > hop $keeper")
        if (action == "keep") assert(fin == id)
      }
    }
  }

  test("deduped epoch plan budgets only surviving tokens") {
    withDocs(planted) { dir =>
      // planted survivors: docs 1 (or its family keeper) and 4; doc 3's
      // whitespace/case copy and (if LSH surfaces it) doc 2's near-dup
      // tokens must NOT count toward any source's budget
      val raw = TextOps.q110EpochPlan(spark, dir).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
      val dd = TextOps.q130DedupedEpochPlan(spark, dir).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
      assert(dd("s").toLong < raw("s"),
        s"dedup must shrink the surviving token mass: $dd vs $raw")
      // budget conservation: shares still sum to ~1 over surviving sources
      val shares = TextOps.q130DedupedEpochPlan(spark, dir).collect()
        .map(_.getAs[Double]("share")).sum
      assert(math.abs(shares - 1.0) < 1e-4, s"shares sum $shares")
    }
  }

  test("exact dedup collapses whitespace/case variants to one survivor") {
    withDocs(planted) { dir =>
      val out = Dedup.q22DedupExact(spark, dir).collect()
      // doc 3 normalizes to doc 1's content -> 3 distinct fingerprints
      assert(out.length == 3)
      val byKeep = out.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
      assert(byKeep(1L) == 2L) // docs 1+3 merged, survivor = min id
      assert(byKeep(2L) == 1L && byKeep(4L) == 1L)
    }
  }

  test("minhash LSH finds the planted near-dup pair with high jaccard") {
    withDocs(planted) { dir =>
      val pairs = Dedup.q23DedupMinhash(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard")))
      // 1-2 (one word changed) must be caught; 1-3 identical post-normalization
      // of case is NOT identical raw (upper vs lower shingles differ) — only
      // require the near-dup pair plus no pairing with the unrelated doc 4
      assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.7 },
        pairs.mkString(","))
      assert(!pairs.exists { case (a, b, _) => b == 4L || a == 4L })
    }
  }

  test("exact n-gram jaccard finds the planted pair and agrees with q23's overlap") {
    withDocs(planted) { dir =>
      val exact = Dedup.q108NgramJaccard(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard")))
      // doc 4 shares no shingles with anything; doc 3 is uppercase (raw
      // shingles all differ) -> only the 1-2 near-dup survives the 0.5 bar
      assert(exact.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)), exact.mkString(","))
      // ONE overlap definition: the exact tier's jaccard must equal the
      // LSH tier's exact rescoring of the same pair
      val lshJ = Dedup.q23DedupMinhash(spark, dir).collect()
        .collectFirst { case r if r.getAs[Long]("id_a") == 1L &&
          r.getAs[Long]("id_b") == 2L => r.getAs[Double]("jaccard") }
      assert(lshJ.contains(exact.head._3), s"exact=${exact.head._3} lsh=$lshJ")
    }
  }

  test("dedup recall monitor: bands the truth pairs and scores the LSH tier") {
    withDocs(planted) { dir =>
      val rows = Dedup.q109DedupRecall(spark, dir).collect()
      // one truth pair (1-2), in one 0.1-wide band, caught by LSH here
      assert(rows.length == 1, rows.mkString(","))
      val r = rows.head
      assert(r.getAs[Long]("n_true") == 1L && r.getAs[Long]("n_caught") == 1L)
      assert(r.getAs[Double]("recall") == 1.0)
      assert(r.getAs[Double]("jaccard_band") ===
        math.floor(Dedup.q108NgramJaccard(spark, dir).head()
          .getAs[Double]("jaccard") * 10) / 10.0)
    }
  }

  test("stop-gram cap excludes boilerplate from intersection AND union") {
    import spark.implicits._
    // 66 filler docs whose ONLY mutual overlap is the boilerplate shingle
    // "zz yy xx" (df = 68 > MaxShingleDf), plus one exact-dup pair that
    // also carries it
    val filler = (1 to 66).map(i =>
      (i.toLong, s"zz yy xx a$i b$i c$i", "en", "s", 20L))
    val dupText = "zz yy xx m n o p"
    val docs = (filler ++ Seq(
      (200L, dupText, "en", "s", 17L), (201L, dupText, "en", "s", 17L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      // the boilerplate shingle is out of the index; rare shingles stay
      val ixSh = Dedup.ngramIndex(spark, dir).select("sh").distinct()
        .as[String].collect().toSet
      assert(!ixSh.contains("zz yy xx"), "df-68 boilerplate must be capped out")
      assert(ixSh.contains("m n o"))
      // filler docs share ONLY the capped shingle -> no candidate pairs at
      // all among them; the dup pair scores 1.0 because BOTH intersection
      // and sizes count sub-cap shingles only (an asymmetric regression —
      // capped intersection over uncapped sizes — would yield 4/(5+5-4) = 0.6667)
      val out = Dedup.q108NgramJaccard(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard")))
      assert(out.toSeq == Seq((200L, 201L, 1.0)), out.mkString(","))
    }
  }

  test("n-gram index joins are equi-joins; pairs stream, never materialize") {
    withDocs(planted) { dir =>
      Seq(Dedup.q108NgramJaccard(spark, dir), Dedup.q109DedupRecall(spark, dir))
        .foreach { df =>
          val plan = df.queryExecution.executedPlan.toString
          assert(!plan.contains("CartesianProduct"), plan.take(1500))
          assert(!plan.contains("collect_list"), plan.take(1500))
        }
    }
  }

  test("simhash flags the near-dup pair within hamming distance") {
    withDocs(planted) { dir =>
      val pairs = Dedup.simhashPairs(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      assert(pairs.contains((1L, 2L)), pairs.mkString(","))
      // registered form aggregates per doc: both 1 and 2 report a near-dup
      val deg = Dedup.q24DedupSimhash(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_near_dups")).toMap
      assert(deg.getOrElse(1L, 0L) >= 1L && deg.getOrElse(2L, 0L) >= 1L)
    }
  }

  test("LSH candidate joins are equi-joins — no cartesian product in any plan") {
    for (q <- Seq(Dedup.q23DedupMinhash _, Dedup.q24DedupSimhash _)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    }
  }

  test("candidate pairs stream through joins — no bucket materialization") {
    // a collect_list bucket row is the 100 TB OOM shape the self-equi-join
    // replaced; guard all three LSH-candidate consumers
    for (q <- Seq(Dedup.q23DedupMinhash _, Dedup.q24DedupSimhash _,
        Dedup.q51DedupEditDistance _)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("collect_list"), plan.take(1500))
    }
  }

  test("q51's histogram lower bound and banded DP never change the " +
    "result: optimized output == unguarded exact filter") {
    // the two guards (char-histogram L1/2 prefilter, threshold-banded
    // levenshtein) must only drop pairs the exact edit_dist <= EditDupMax
    // filter drops anyway — the oracle mirrors ONLY the exact filter
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("substring(text, 1, 60)").as("prefix"))
    val a = docs.select(col("doc_id").as("id_a"), col("prefix").as("pa"))
    val b = docs.select(col("doc_id").as("id_b"), col("prefix").as("pb"))
    val unguarded = Dedup.minhashCandidates(spark, sf,
        Some(Dedup.DefaultMaxBucket))
      .join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= Dedup.EditDupMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val optimized = Dedup.q51DedupEditDistance(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(optimized == unguarded,
      s"guards changed the result: only-optimized=${optimized -- unguarded}" +
        s" only-unguarded=${unguarded -- optimized}")
    assert(optimized.nonEmpty, "fixture must exercise the verifier")
  }

  test("the char-histogram L1/2 bound is a true Levenshtein lower bound, " +
    "untracked characters included") {
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val tracked = ('a' to 'z').mkString + " "
    def l1Half(s: String, t: String): Int = {
      val l1 = tracked.map(c =>
        math.abs(s.count(_ == c) - t.count(_ == c))).sum
      (l1 + 1) / 2
    }
    val rnd = new scala.util.Random(7)
    // alphabet includes UNTRACKED chars (digits, punctuation, unicode) —
    // the subset histogram must still never overshoot the true distance
    val alpha = "abcdefgh 0189.,!é漢"
    for (_ <- 1 to 300) {
      val s = Seq.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      val t = Seq.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(l1Half(s, t) <= lev(s, t),
        s"bound overshot on '$s' vs '$t': ${l1Half(s, t)} > ${lev(s, t)}")
    }
  }

  test("calibration pair sampling: deterministic arithmetic subset; " +
    "step=1 (all gate scales) reproduces the full stream exactly") {
    def pairs(maxPairs: Long): Set[(Long, Long)] =
      Dedup.sampledCalibPairs(spark, sf, maxPairs).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val full = pairs(Long.MaxValue)
    assert(full.nonEmpty)
    // under the budget -> unsampled: the calibration outputs are
    // byte-identical to the pre-sampling behavior at every gate scale
    assert(pairs(Dedup.CalibMaxPairs) == full,
      "sf0.01 is far under CalibMaxPairs — step must be 1")
    // tiny budget -> the exact arithmetic the oracles mirror (ceil div)
    val budget = math.max(1L, full.size / 3L)
    val step = math.max(1L, (full.size + budget - 1) / budget)
    val sampled = pairs(budget)
    assert(sampled == full.filter { case (a, b) =>
      (a * 1000003L + b) % step == 0 },
      s"sampling must be the mirrored modulus arithmetic (step $step)")
    assert(sampled.nonEmpty && sampled.size < full.size)
    assert(pairs(budget) == sampled, "sampling must be deterministic")
  }

  test("minhash signatures are one shuffle-free codegen'd projection") {
    val shPlan = Dedup.shingled(spark, sf).queryExecution.executedPlan.toString
    assert(!shPlan.contains("Exchange"), shPlan.take(1500))
    val mhPlan = Dedup.minhashes(spark, sf).queryExecution.executedPlan.toString
    // native ShingleMinHash expression: narrow plan, inside WholeStageCodegen
    assert(!mhPlan.contains("Exchange"), mhPlan.take(1500))
    assert(mhPlan.contains("shingleminhash"), mhPlan.take(1500))
    assert(mhPlan.contains("*(1)"), mhPlan.take(1500)) // codegen span
  }

  test("dup clusters: transitive near-dups collapse into one component") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees under a bright morning sky"
    val docs = Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, base.replace("morning", "evening"), "en", "s", base.length.toLong),
      // LSH pairs doc 3 with doc 2 but NOT with doc 1 (verified band
      // overlap) — {1,2,3} becomes one cluster only via transitivity,
      // which is exactly what connected components adds over q23
      (3L, base.replace("morning", "evening").replace("birds", "larks"),
        "en", "s", base.length.toLong),
      (4L, "completely different text about spark shuffles partitions joins " +
        "aggregations windows watermarks and codegen stages running at scale",
        "en", "s", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q70DupClusters(spark, dir).collect()
      // doc 4 pairs with nobody -> absent; 1/2/3 are ONE cluster labeled 1
      assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
      assert(out.forall(_.getAs[Long]("cluster_id") == 1L))
      assert(out.forall(_.getAs[Long]("cluster_size") == 3L))
      assert(out.filter(_.getAs[Boolean]("is_keeper"))
        .map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    }
  }

  test("leakage-safe split: a dup cluster never straddles splits") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees under a bright morning sky"
    val docs = Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, base.replace("morning", "evening"), "en", "s", base.length.toLong),
      (3L, base.replace("morning", "evening").replace("birds", "larks"),
        "en", "s", base.length.toLong),
      (4L, "completely different text about spark shuffles partitions joins " +
        "aggregations windows watermarks and codegen stages running at scale",
        "en", "s", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q80LeakageSafeSplit(spark, dir).collect()
        .map(r => r.getAs[String]("split") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters")))
      // 4 docs in 2 clusters: {1,2,3} (transitive near-dups) and {4}
      assert(out.map(_._2._1).sum == 4L)
      assert(out.map(_._2._2).sum == 2L)
      // the 3-doc cluster moves as a unit: every split holds whole clusters,
      // so no split can have 2 docs, and a 3-doc split is one cluster
      out.foreach { case (_, (nDocs, nClusters)) =>
        assert(nDocs != 2L)
        if (nDocs == 3L) assert(nClusters == 1L)
        if (nDocs == 1L) assert(nClusters == 1L)
        if (nDocs == 4L) assert(nClusters == 2L)
      }
    }
  }

  test("source overlap joins stay equi-joins with broadcast size rollups") {
    val p = Dedup.q81SourceOverlap(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500)) // the sizes joins
  }

  test("source overlap: shared shingles and jaccard per source pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w", "en", "sA", 7L), // shingles: "x y z", "y z w"
      (2L, "x y z q", "en", "sB", 7L), // shingles: "x y z", "y z q"
      (3L, "p q r", "en", "sC", 5L)    // shingle: "p q r" — no overlap
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q81SourceOverlap(spark, dir).collect()
        .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
          (r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard"))).toMap
      // only the sA/sB pair shares a shingle: 1 of 3 distinct -> 1/3
      assert(out.keySet == Set(("sA", "sB")))
      assert(out(("sA", "sB")) == (1L, 0.3333))
    }
  }

  test("incremental dedup: intra-batch + corpus-hit drops, fresh docs survive") {
    import spark.implicits._
    val docs = Seq(
      // existing corpus
      (1L, "existing corpus document one", "en", "src1", 28L),
      (2L, "existing corpus document two", "en", "src2", 28L),
      // incoming batch: exact dup of corpus doc 1 (modulo case/whitespace)
      (10L, "  EXISTING  corpus document one ", "en", "src0", 32L),
      // intra-batch dup pair -> min doc_id survives
      (11L, "brand new incoming text", "en", "src0", 23L),
      (12L, "brand new incoming text", "en", "src0", 23L),
      // fresh
      (13L, "another genuinely novel document", "en", "src0", 32L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    withDocs(docs) { dir =>
      val out = Dedup.q75IncrementalDedup(spark, dir).collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L, 13L))
    }
  }

  test("survivors keep the highest-ttr member of every multi-doc cluster") {
    val rows = Dedup.q94DedupSurvivors(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the invariant independently: within each cluster, the
    // keeper's ttr is the cluster max, tie broken by smallest doc_id
    import org.apache.spark.sql.functions._
    val ttr = Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"),
        round(expr("size(array_distinct(t))") / size(col("t")), 4).as("ttr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = Dedup.q70DupClusters(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val ms = members(cid).map(_.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("cluster_size") == ms.length)
      assert(r.getAs[Long]("n_dropped") == ms.length - 1)
      val best = ms.map(id => (-ttr(id), id)).min
      assert(r.getAs[Long]("keeper_id") == best._2)
      assert(r.getAs[Double]("keeper_ttr") == ttr(best._2))
    }
  }

  test("split balance: shares sum to ~1e6 per split, deltas consistent") {
    val rows = Dedup.q107SplitBalance(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("share_ppm") - r.getAs[Long]("corpus_ppm"))
      assert(r.getAs[Long]("share_ppm") >= 0 &&
        r.getAs[Long]("share_ppm") <= 1000000L)
    }
    // per split, the lang shares cover the whole split up to floor loss
    rows.groupBy(_.getAs[String]("split")).foreach { case (sp, rs) =>
      val sum = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(sum > 1000000L - rs.length && sum <= 1000000L, s"$sp: $sum")
    }
    // split totals must cover the whole corpus
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.ops.Tables.documents(spark, sf).count())
  }

  test("split balance joins its tiny aggregates by broadcast, never sort-merge") {
    // sl is checkpointed, so this plan is exactly the post-aggregate part
    // the doc comment makes claims about: st/cl/tot must broadcast
    val plan = Dedup.q107SplitBalance(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("q168 dup trend: bands partition the corpus, ledger-consistent") {
    val out = Dedup.q168DupTrend(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(out.length <= Dedup.DupTrendBands)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs)
    val ledger = Dedup.q129DedupLedger(spark, sf).collect()
      .groupBy(_.getAs[String]("action")).map { case (a, r) => a -> r.length.toLong }
    assert(out.map(_.getAs[Long]("n_drop_exact")).sum ==
      ledger.getOrElse("drop_exact", 0L))
    assert(out.map(_.getAs[Long]("n_drop_near")).sum ==
      ledger.getOrElse("drop_near", 0L))
    out.foreach { r =>
      val drops = r.getAs[Long]("n_drop_exact") + r.getAs[Long]("n_drop_near")
      assert(r.getAs[Long]("drop_ppm") ==
        drops * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("q167 cap utilization: both cap rows present, identities hold") {
    val out = Dedup.q167CapUtilization(spark, sf).collect()
      .map(r => r.getAs[String]("cap_name") -> r).toMap
    assert(out.keySet == Set("lsh_bucket", "shingle_df"))
    assert(out("lsh_bucket").getAs[Long]("cap_value") ==
      Dedup.DefaultMaxBucket.toLong)
    assert(out("shingle_df").getAs[Long]("cap_value") ==
      Dedup.MaxShingleDf.toLong)
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_over_cap") <= r.getAs[Long]("n_groups"))
      // dropped groups are each over the cap, so their row mass exceeds
      // cap * count; a clean corpus may simply have none
      val over = r.getAs[Long]("n_over_cap")
      assert(r.getAs[Long]("rows_dropped") >=
        over * (r.getAs[Long]("cap_value") + 1) ||
        (over == 0L && r.getAs[Long]("rows_dropped") == 0L))
      assert(r.getAs[Long]("pairs_kept_bound") >= 0L)
      assert(over > 0L || r.getAs[Long]("pairs_suppressed") == 0L)
    }
    // total LSH bucket rows = docs x bands (every doc lands in every band)
    val docs = Tables.documents(spark, sf).count()
    val lsh = out("lsh_bucket")
    assert(lsh.getAs[Long]("rows_dropped") <= docs * Dedup.NumBands)
  }

  test("q165 banding curve: bands agree with q109, S-curve bounded") {
    val out = Dedup.q165BandingCurve(spark, sf).collect()
      .map(r => r.getAs[Double]("jaccard_band") -> r).toMap
    val q109 = Dedup.q109DedupRecall(spark, sf).collect()
      .map(r => r.getAs[Double]("jaccard_band") -> r).toMap
    assert(out.keySet == q109.keySet)
    for ((band, r) <- out) {
      assert(r.getAs[Long]("n_true") == q109(band).getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_caught") == q109(band).getAs[Long]("n_caught"))
      val emp = r.getAs[Long]("empirical_ppm")
      val exp = r.getAs[Long]("expected_ppm")
      assert(emp >= 0L && emp <= 1000000L)
      assert(exp >= 0L && exp <= 1000000L)
      assert(r.getAs[Long]("delta_ppm") == emp - exp)
      // analytic floor: every pair in this band has j >= band, and the
      // S-curve is monotone, so the band mean cannot undercut p(band)
      val j2 = band * band; val j4 = j2 * j2
      val t2 = (1.0 - j4) * (1.0 - j4)
      val floorPpm = math.floor((1.0 - t2 * t2) * 1000000.0).toLong
      assert(exp >= floorPpm, s"band $band: $exp < $floorPpm")
    }
  }

  test("q164 drop quality: actions partition the corpus, signals bounded") {
    val out = Dedup.q164DropQuality(spark, sf).collect()
    val actions = out.map(_.getAs[String]("action")).toSet
    assert(actions.subsetOf(Set("keep", "drop_exact", "drop_near")))
    assert(actions.contains("keep"))
    val docs = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.getLong(0))
    assert(out.map(_.getAs[Long]("n_chars")).sum == docs.getLong(1))
    out.foreach { r =>
      val m = r.getAs[Long]("mean_ttr_x10000")
      assert(m >= 0L && m <= 10000L)
    }
    // the per-action counts agree with the ledger itself
    val ledger = Dedup.q129DedupLedger(spark, sf).collect()
      .groupBy(_.getAs[String]("action")).map { case (a, rs) => a -> rs.length.toLong }
    out.foreach { r =>
      assert(ledger(r.getAs[String]("action")) == r.getAs[Long]("n_docs"))
    }
  }

  test("q162 cluster histogram: conserves docs, matches the q70 view") {
    val out = Dedup.q162ClusterHistogram(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    // every doc lands in exactly one size bucket
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("docs_ppm") ==
        r.getAs[Long]("n_docs") * 1000000L / docs)
    }
    // the multi-doc buckets agree with q70's per-doc cluster sizes
    val q70 = Dedup.q70DupClusters(spark, sf).collect()
    val bySize = q70.groupBy(_.getAs[Long]("cluster_size"))
      .map { case (sz, rows) => sz -> rows.length.toLong / sz }
    bySize.foreach { case (sz, nClusters) =>
      val row = out.find(_.getAs[Long]("cluster_size") == sz)
      assert(row.exists(_.getAs[Long]("n_clusters") == nClusters),
        s"size $sz: expected $nClusters clusters")
    }
  }

  test("q170 cluster density: edges conserved, bounded, pair-clusters are cliques") {
    val out = Dedup.q170ClusterDensity(spark, sf).collect()
    assert(out.nonEmpty)
    val nPairs = Dedup.minhashCandidates(spark, sf,
      Some(Dedup.DefaultMaxBucket)).count()
    // every candidate edge lands in exactly one cluster's count
    assert(out.map(_.getAs[Long]("n_edges")).sum == nPairs)
    out.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      val nc = r.getAs[Long]("n_clusters")
      val edges = r.getAs[Long]("n_edges")
      val poss = r.getAs[Long]("n_possible")
      assert(size >= 2L) // labels only cover docs in >= 1 pair
      assert(poss == nc * (size * (size - 1) / 2))
      // connected needs >= size-1 edges per cluster; clique caps at possible
      assert(edges >= nc * (size - 1) && edges <= poss)
      assert(r.getAs[Long]("density_ppm") == edges * 1000000L / poss)
      // a 2-doc cluster is its one edge — exactly a clique
      if (size == 2L) assert(r.getAs[Long]("density_ppm") == 1000000L)
    }
    // sizes agree with the q162 multi-doc buckets
    val hist = Dedup.q162ClusterHistogram(spark, sf).collect()
      .filter(_.getAs[Long]("cluster_size") > 1L)
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters"))
      .toMap
    assert(out.map(r => r.getAs[Long]("cluster_size") ->
      r.getAs[Long]("n_clusters")).toMap == hist)
  }

  test("q173 dup metadata conflicts: fixture groups flagged, corpus clean") {
    val out = Dedup.q173DupMetaConflicts(spark, sf).collect()
    // the corpus has no exact-dup groups — every group is the fixture's
    assert(out.length == 3)
    val byAnchor = out.map(r => r.getAs[Long]("anchor_id") ->
      (r.getAs[Long]("n_docs"), r.getAs[Boolean]("lang_conflict"),
        r.getAs[Boolean]("source_conflict"))).toMap
    // alpha: lang conflict through the case/whitespace-normalized copy
    assert(byAnchor(9100001L) == ((2L, true, false)))
    // beta: verbatim syndication across sources
    assert(byAnchor(9100003L) == ((2L, false, true)))
    // gamma: a dup group with CONSISTENT metadata stays unflagged
    assert(byAnchor(9100005L) == ((2L, false, false)))
  }

  test("q176 bbit sweep: monotone in b, never below full matches, ties q148") {
    val out = Dedup.q176BbitSweep(spark, sf).collect().sortBy(_.getAs[Long]("b"))
    assert(out.map(_.getAs[Long]("b")).toSeq == Dedup.BbitGrid.map(_.toLong))
    assert(out.map(_.getAs[Long]("n_pairs")).distinct.length == 1)
    out.foreach { r =>
      assert(r.getAs[Long]("bbit_matches") >= r.getAs[Long]("full_matches"))
      assert(r.getAs[Long]("excess") ==
        r.getAs[Long]("bbit_matches") - r.getAs[Long]("full_matches"))
      assert(r.getAs[Long]("excess_ppm") == r.getAs[Long]("excess") * 1000000L /
        (r.getAs[Long]("n_pairs") * Dedup.NumHashes))
    }
    // keeping more bits can only remove accidental collisions
    val bm = out.map(_.getAs[Long]("bbit_matches"))
    assert(bm.zip(bm.tail).forall { case (a, b) => a >= b })
    // full-slot matches agree with the q148 calibration marginal
    val full = Dedup.q148MinhashCalibration(spark, sf).collect()
      .map(r => r.getAs[Long]("n_match") * r.getAs[Long]("n_pairs")).sum
    assert(out.head.getAs[Long]("full_matches") == full)
  }

  test("q170 plan: equi-joins over memoized frames, no cartesian") {
    val df = Dedup.q170ClusterDensity(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), plan.take(2500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2500))
  }

  test("star contraction equals min-label propagation on the corpus graph") {
    val pairs = Dedup.minhashCandidates(spark, sf, Some(Dedup.DefaultMaxBucket))
    val star = Dedup.propagateStarContraction(spark, pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    val prop = Dedup.dupLabels(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(star == prop)
  }

  test("star contraction: 300-node chain converges inside the round budget") {
    import spark.implicits._
    // diameter 299 >> MaxCcIterations: min-label propagation CANNOT finish
    // this graph; star contraction needs only O(log n) rounds
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.propagateStarContraction(spark, chain).collect()
    assert(out.length == 300)
    assert(out.forall(_.getAs[Long]("label") == 0L))
  }

  test("star contraction matches a union-find replay on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)(
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    val out = Dedup.propagateStarContraction(spark,
      edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    // driver union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val comps = nodes.groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
    assert(out == comps)
  }

  test("q187 recall by length: bands conserve the q109 truth totals") {
    val out = Dedup.q187RecallByLength(spark, sf).collect()
    assert(out.nonEmpty)
    // the same truth pairs q109 measures, re-cut by length band
    val q109 = Dedup.q109DedupRecall(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_true")).sum ==
      q109.map(_.getAs[Long]("n_true")).sum)
    assert(out.map(_.getAs[Long]("n_caught")).sum ==
      q109.map(_.getAs[Long]("n_caught")).sum)
    out.foreach { r =>
      val (t, c) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_caught"))
      assert(c <= t)
      assert(r.getAs[Double]("recall") ==
        BigDecimal(c.toDouble / t)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Long]("len_band") >= 0L &&
        r.getAs[Long]("len_band") <= 3L)
    }
  }

  test("q191 df histogram: bands partition the vocabulary, replay-exact") {
    val out = Dedup.q191DfHistogram(spark, sf).collect()
    assert(out.nonEmpty)
    val dfs = Dedup.shingled(spark, sf).collect()
      .flatMap(r => r.getSeq[String](1).distinct
        .map(g => (r.getAs[Long]("doc_id"), g)))
      .distinct.groupBy(_._2).map { case (_, xs) => xs.length.toLong }.toSeq
    val total = dfs.sum
    val expected = dfs.groupBy(df => 63 - java.lang.Long.numberOfLeadingZeros(df))
      .map { case (b, xs) => b.toLong -> ((xs.length.toLong, xs.sum)) }
    assert(out.map(r => r.getAs[Long]("band") ->
      ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_postings")))).toMap
      == expected)
    assert(out.map(_.getAs[Long]("n_postings")).sum == total)
    out.foreach(r => assert(r.getAs[Long]("postings_ppm") ==
      r.getAs[Long]("n_postings") * 1000000L / total))
  }

  test("q153 threshold sweep: grid-complete, monotone, floor point = q108") {
    val truth = Dedup.q108NgramJaccard(spark, sf).collect()
    val before = Dedup.truthDerivations.get()
    val out = Dedup.q153ThresholdSweep(spark, sf).collect()
      .sortBy(_.getAs[Double]("threshold"))
    // rides the memoized truth — no second index derivation
    assert(Dedup.truthDerivations.get() == before)
    assert(out.map(_.getAs[Double]("threshold")).toSeq == Dedup.JaccardSweep)
    // tightening the threshold can only flag fewer pairs, drop fewer docs,
    // remove fewer chars, retain more
    def mono(col: String, incr: Boolean): Unit = {
      val v = out.map(_.getAs[Long](col))
      assert(v.zip(v.tail).forall { case (a, b) => if (incr) a <= b else a >= b },
        s"$col not monotone: ${v.toSeq}")
    }
    mono("n_pairs", incr = false)
    mono("n_docs_dropped", incr = false)
    mono("chars_removed", incr = false)
    mono("retained_chars_ppm", incr = true)
    // every sweep point matches a driver-side union-find replay of the
    // COMPONENT min-keeper rule over its filtered pair set
    def componentDrops(minJ: Double): Long = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      truth.filter(_.getAs[Double]("jaccard") >= minJ).foreach { r =>
        val (a, b) = (find(r.getAs[Long]("id_a")), find(r.getAs[Long]("id_b")))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val nodes = truth.filter(_.getAs[Double]("jaccard") >= minJ)
        .flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).distinct
      nodes.count(n => find(n) != n).toLong
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs_dropped") ==
        componentDrops(r.getAs[Double]("threshold")),
        s"threshold ${r.getAs[Double]("threshold")}")
    }
    val floor = out.head
    assert(floor.getAs[Long]("n_pairs") == truth.length)
    // retained ppm identity against the recomputed totals
    val docs = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs_total") == docs.getLong(0))
      val total = docs.getLong(1)
      assert(r.getAs[Long]("retained_chars_ppm") ==
        (total - r.getAs[Long]("chars_removed")) * 1000000L / total)
    }
  }

  test("q157 source matrix: ordered cells, pair totals conserve q108 truth") {
    val truth = Dedup.q108NgramJaccard(spark, sf).collect()
    val before = Dedup.truthDerivations.get()
    val out = Dedup.q157SourceDupMatrix(spark, sf).collect()
    assert(Dedup.truthDerivations.get() == before) // rides the memo
    out.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    // every truth pair lands in exactly one cell
    assert(out.map(_.getAs[Long]("n_pairs")).sum == truth.length.toLong)
    // source sizes match an independent count
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs_a") == sizes(r.getAs[String]("source_a")))
      assert(r.getAs[Long]("n_docs_b") == sizes(r.getAs[String]("source_b")))
    }
  }

  test("q158 signature sweep: grid-complete, pair-conserving, bounded errors") {
    // the scored base derives once across q148 and q158
    Dedup.q148MinhashCalibration(spark, sf).collect()
    val calibBefore = Dedup.calibDerivations.get()
    val out = Dedup.q158SignatureSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("n_hashes"))
    assert(Dedup.calibDerivations.get() == calibBefore)
    assert(out.map(_.getAs[Long]("n_hashes")).toSeq ==
      Dedup.HashBudgetGrid.map(_.toLong))
    // every sweep point scores the SAME candidate-pair universe
    val nPairs = out.map(_.getAs[Long]("n_pairs")).distinct
    assert(nPairs.length == 1 && nPairs.head > 0L)
    out.foreach { r =>
      val mean = r.getAs[Long]("mean_abs_err_ppm")
      val mx = r.getAs[Long]("max_abs_err_ppm")
      assert(mean >= 0L && mean <= mx && mx <= 1000000L)
      // the signed total can never exceed the absolute total
      assert(math.abs(r.getAs[Long]("sum_err_ppm")) <=
        mx * r.getAs[Long]("n_pairs"))
    }
  }

  test("containment is asymmetric, bounded, and at least as large as jaccard") {
    val cont = Dedup.q101Containment(spark, sf).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"),
          r.getAs[Boolean]("is_contained")))).toMap
    assert(cont.nonEmpty)
    val jac = Dedup.q23DedupMinhash(spark, sf).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    // identical candidate pairs (both consume minhashCandidates)
    assert(cont.keySet == jac.keySet)
    cont.foreach { case (pair, (ca, cb, flag)) =>
      assert(ca >= 0 && ca <= 1.0 && cb >= 0 && cb <= 1.0)
      // |A∩B|/|A| >= |A∩B|/|A∪B| always (union is the bigger denominator);
      // rounded independently at 4 dp, so allow that rounding slack
      assert(ca >= jac(pair) - 0.0001 && cb >= jac(pair) - 0.0001)
      assert(flag == (ca >= Dedup.ContainDup || cb >= Dedup.ContainDup))
    }
  }

  test("q136 sampling weights: one row per doc, inverse-size ppm, q70 parity") {
    val rows = Dedup.q136SamplingWeights(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      assert(sz >= 1)
      assert(r.getAs[Long]("weight_ppm") == 1000000L / sz)
    }
    // parity with q70's cluster sizes for every clustered doc
    val q70 = Dedup.q70DupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size"))
      .toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      q70.get(d).foreach(sz =>
        assert(r.getAs[Long]("cluster_size") == sz, s"doc $d size mismatch"))
    }
  }

  test("q133 index dedup: incoming-only left side, estimates bounded, exact never re-reported") {
    val rows = Dedup.q133IndexDedup(spark, sf).collect()
    val srcOf = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    rows.foreach { r =>
      val (i, c) = (r.getAs[Long]("incoming_id"), r.getAs[Long]("corpus_id"))
      assert(srcOf(i) == Dedup.IncomingSource)
      assert(srcOf(c) != Dedup.IncomingSource)
      assert(seen.add((i, c)), s"pair ($i,$c) reported twice")
      val est = r.getAs[Double]("est_jaccard")
      r.getAs[String]("match_kind") match {
        case "exact" => assert(est == 1.0)
        case "near"  => assert(est >= 0.0 && est <= 1.0)
        case other   => fail(s"unknown match_kind $other")
      }
    }
  }

  test("q148 calibration: exact ppm bands, full candidate coverage, correlated") {
    val rows = Dedup.q148MinhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("n_match")
      assert(m >= 0 && m <= Dedup.NumHashes)
      assert(r.getAs[Long]("est_ppm") == m * (1000000L / Dedup.NumHashes))
      val t = r.getAs[Long]("mean_true_ppm")
      assert(t >= 0 && t <= 1000000L)
      assert(r.getAs[Long]("mean_abs_err_ppm") >= 0)
    }
    // every candidate pair lands in exactly one band
    val nCand = Dedup.q23DedupMinhash(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nCand)
    // the estimator correlates: the highest-match band's true jaccard
    // must not trail the lowest band's
    val sorted = rows.sortBy(_.getAs[Long]("n_match"))
    assert(sorted.last.getAs[Long]("mean_true_ppm") >=
      sorted.head.getAs[Long]("mean_true_ppm"))
  }

  test("q142 sketch overlap: exact mode holds I-E identities and the 5% gate") {
    spark.conf.set(Similarity.ExactCheckConf, "true")
    try {
      val rows = Dedup.q142SketchOverlap(spark, sf).collect()
      val nSrc = Tables.documents(spark, sf)
        .select("source").distinct().count()
      assert(rows.length == nSrc * (nSrc - 1) / 2, "every source pair reports")
      rows.foreach { r =>
        val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
        val (ni, nu) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))
        assert(ni >= 0 && ni <= math.min(na, nb))
        assert(nu == na + nb - ni, "inclusion-exclusion identity")
        assert(r.getAs[Boolean]("approx_ok"),
          s"union sketch off by >5% for ${r.getAs[String]("src_a")}/" +
            s"${r.getAs[String]("src_b")}")
      }
    } finally spark.conf.unset(Similarity.ExactCheckConf)
  }

  test("q142 production plan is sketch-only: no distinct shingle aggregate") {
    val df = Dedup.q142SketchOverlap(spark, sf)
    // the corpus was scanned ONCE into the checkpointed sketch table; the
    // lazy plan pairs that |sources|-row table with itself — no parquet
    // scan, no exact-branch distinct/intersection aggregates
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("parquet"), plan.take(2000))
    assert(!plan.toLowerCase.contains("hll_sketch_agg"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_inter") >= 0)
      assert(r.getAs[Long]("n_union") >= math.max(
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) - 1) // estimate slack
    }
  }

  test("q208 filter overlap: grid-complete, conserves corpus docs and " +
    "both filters' marginals") {
    import org.apache.spark.sql.functions._
    val out = Dedup.q208FilterOverlap(spark, sf).collect()
    assert(out.length == 6) // 3 actions x 2 gate outcomes, always
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == n)
    // folding out gate_pass reproduces the ledger's action counts
    val byAction = out.groupBy(_.getAs[String]("action")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val ledger = Dedup.q129DedupLedger(spark, sf).groupBy("action").count()
      .collect().map(r => r.getAs[String]("action") -> r.getAs[Long]("count"))
      .toMap
    assert(byAction.filter(_._2 > 0) == ledger)
    // folding out the action reproduces the gate's pass/fail counts
    val byGate = out.groupBy(_.getAs[Boolean]("gate_pass")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val gates = TextOps.gateDecisions(spark, sf).groupBy("gate_pass").count()
      .collect().map(r => r.getAs[Boolean]("gate_pass") -> r.getAs[Long]("count"))
      .toMap
    assert(byGate.filter(_._2 > 0) == gates)
    out.foreach(r => assert(r.getAs[Long]("corpus_ppm") ==
      r.getAs[Long]("n_docs") * 1000000L / n))
  }

  test("q207 dup arrival gaps: conserves the q108 truth, bit-length bands " +
    "bound their gaps, floor shares sum under 1e6") {
    val out = Dedup.q207DupArrivalGaps(spark, sf).collect()
    val truth = Dedup.q108NgramJaccard(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum == truth.length.toLong)
    out.foreach { r =>
      val b = r.getAs[Long]("band")
      val (lo, hi) = (if (b == 1L) 1L else 1L << (b - 1), (1L << b) - 1)
      assert(r.getAs[Long]("min_gap") >= lo && r.getAs[Long]("max_gap") <= hi,
        s"band $b holds gaps outside [$lo, $hi]")
      assert(r.getAs[Long]("min_gap") <= r.getAs[Long]("max_gap"))
    }
    val shares = out.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - out.length)
  }

  test("q205 source diversity: conserves docs, inverse-Simpson bounds, " +
    "replay-exact off the shared cluster assignment") {
    import org.apache.spark.sql.functions._
    val out = Dedup.q205SourceDiversity(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (n, k, eff) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("eff_clusters_x1000"))
      assert(k <= n)
      assert(eff >= 1000L && eff <= k * 1000L) // 1 <= effective <= distinct
      assert(r.getAs[Long]("top_cluster_ppm") >= 1000000L / n)
    }
    // full driver replay off the SAME memoized cluster assignment q80 uses
    val asg = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .join(Dedup.splitAssigned(spark, sf).select("doc_id", "cluster_id"),
        "doc_id").collect()
    val expect = asg.groupBy(_.getAs[String]("source")).map { case (src, rows) =>
      val sizes = rows.groupBy(_.getAs[Long]("cluster_id")).values
        .map(_.length.toLong).toSeq
      val n = sizes.sum
      src -> ((n, sizes.length.toLong, sizes.max * 1000000L / n,
        n * n * 1000L / sizes.map(c => c * c).sum))
    }
    out.foreach { r =>
      assert(expect(r.getAs[String]("source")) ==
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
          r.getAs[Long]("top_cluster_ppm"),
          r.getAs[Long]("eff_clusters_x1000"))))
    }
  }

  test("q202 split token KL: three splits conserve corpus tokens, KL >= 0, " +
    "splits agree with q80's assignment") {
    import org.apache.spark.sql.functions._
    val out = Dedup.q202SplitTokenKl(spark, sf).collect()
    assert(out.map(_.getAs[String]("split")).sorted.toSeq ==
      Seq("test", "train", "valid"))
    // every corpus token lands in exactly one split
    val corpusTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    assert(out.map(_.getAs[Long]("n_tokens")).sum == corpusTokens)
    // KL to the pooled corpus distribution is non-negative (Gibbs), and a
    // split's token count matches a direct replay over q80's assignment
    out.foreach(r => assert(r.getAs[Double]("kl") >= -1e-6))
    val replay = Tables.documents(spark, sf)
      .join(Dedup.splitAssigned(spark, sf).select("doc_id", "split"), "doc_id")
      .select(col("split"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("split").count().collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
    out.foreach(r => assert(
      r.getAs[Long]("n_tokens") == replay(r.getAs[String]("split"))))
  }
}
