package graft.sql

import graft.TestSpark
import graft.lake.AvroManifests
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DIR-tier pruning (VERDICT r14 #2): manifest-list `field_summary`
  * bounds drop whole data dirs BEFORE their per-dir manifests are read,
  * so scan-planning cost scales with surviving dirs — the daily-append
  * 100 TB shape. Asserted via the manifest-open counter: a day-filtered
  * scan of a many-day table opens only the matching dirs' manifests. */
class GraftDirPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-dirprune-").toString
    spark.conf.set("spark.sql.catalog.gdp", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gdp.warehouse", wh)
    "gdp"
  }

  private def manifestOpens[T](body: => T): (T, Long) = {
    val before = AvroManifests.manifestReadCount.get()
    val r = body
    (r, AvroManifests.manifestReadCount.get() - before)
  }

  test("identity-partitioned daily appends: a day-filtered scan opens " +
    "only the matching dir's manifest; unfiltered opens all") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dp")
    val t = s"$cat.dp.daily"
    spark.sql(s"CREATE TABLE $t (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    (1 to 5).foreach { d =>
      spark.sql(s"INSERT INTO $t SELECT id, 'd$d', id * 1.0 " +
        s"FROM range(${d * 10})")
    }
    val (full, fullOpens) = manifestOpens(
      spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0))
    assert(full == (1 to 5).map(_ * 10).sum)
    assert(fullOpens >= 5, s"unfiltered scan must read all dirs ($fullOpens)")
    val (one, oneOpens) = manifestOpens(
      spark.sql(s"SELECT count(*) FROM $t WHERE day = 'd3'")
        .collect()(0).getLong(0))
    assert(one == 30)
    assert(oneOpens < fullOpens && oneOpens <= 2,
      s"day-filtered scan opened $oneOpens manifests (full: $fullOpens) " +
        "— dir-tier pruning must skip non-matching dirs' manifests")
    // range predicate prunes too (string identity bounds, UTF-8 order)
    val (rng, rngOpens) = manifestOpens(
      spark.sql(s"SELECT count(*) FROM $t WHERE day >= 'd4'")
        .collect()(0).getLong(0))
    assert(rng == 40 + 50)
    assert(rngOpens < fullOpens,
      s"range-filtered scan opened $rngOpens manifests (full: $fullOpens)")
  }

  test("days(ts)-partitioned appends: a pushed timestamp range drops " +
    "whole dirs without opening their manifests") {
    val t = s"$cat.dp.ts"
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    (1 to 4).foreach { d =>
      spark.sql(s"INSERT INTO $t SELECT id, " +
        s"timestamp'2024-03-0$d 12:00:00' FROM range(10)")
    }
    val (_, fullOpens) = manifestOpens(
      spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0))
    val (n, prunedOpens) = manifestOpens(
      spark.sql(s"SELECT count(*) FROM $t " +
        "WHERE ts >= timestamp'2024-03-04 00:00:00'")
        .collect()(0).getLong(0))
    assert(n == 10)
    assert(prunedOpens < fullOpens && prunedOpens <= 2,
      s"ts-range scan opened $prunedOpens manifests (full: $fullOpens)")
  }

  test("library loadSlice prunes DIRS off the manifest-list summaries " +
    "too: a day-bounded slice of a daily-append table opens only the " +
    "matching dirs' manifests (identity string + bucket point lookup)") {
    import spark.implicits._
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val ns = s"dslice_${System.nanoTime()}"
    cat.ensureTable(ns, "t",
      Seq((1L, "d1", 1.0)).toDF("id", "day", "v").schema, Seq("day"))
    (1 to 5).foreach { d =>
      cat.append(ns, "t", (1 to d * 10).map(i =>
        (i.toLong, s"d$d", i * 1.0)).toDF("id", "day", "v"))
    }
    val (_, fullOpens) = manifestOpens(cat.load(ns, "t").count())
    assert(fullOpens >= 5)
    val (n, oneOpens) = manifestOpens(
      cat.loadSlice(ns, "t", "day", "d3", "d3").count())
    assert(n == 30)
    assert(oneOpens < fullOpens && oneOpens <= 2,
      s"loadSlice opened $oneOpens manifests (full: $fullOpens) — the " +
        "dir tier must skip non-matching dirs")
    val (rng, rngOpens) = manifestOpens(
      cat.loadSlice(ns, "t", "day", "d4", "d5").count())
    assert(rng == 90 && rngOpens < fullOpens)
    cat.dropNamespace(ns)
  }

  test("pre-summary manifest lists (older tables) read as null and keep " +
    "every dir — superset-safe, results exact") {
    // simulate: entries round-trip through write/read WITHOUT summaries
    val dir = Files.createTempDirectory("ml-compat-")
    val p = dir.resolve("ml.avro")
    val e = AvroManifests.ManifestListEntry("m1", 1L, 0, 0, 1L, 1L, 1L,
      1, 0, 0, 10L, 0L, 0L, partitions = None)
    AvroManifests.writeManifestList(p, Seq(e))
    val back = AvroManifests.readManifestList(p)
    assert(back.head.partitions.isEmpty)
    // and a summary-carrying entry round-trips bounds byte-exactly
    val fs = AvroManifests.FieldSummary(containsNull = false,
      Some(Array[Byte](1, 2)), Some(Array[Byte](3, 4)))
    AvroManifests.writeManifestList(p,
      Seq(e.copy(partitions = Some(Seq(fs)))))
    val back2 = AvroManifests.readManifestList(p).head.partitions.get.head
    assert(!back2.containsNull &&
      back2.lowerBound.get.toSeq == Seq[Byte](1, 2) &&
      back2.upperBound.get.toSeq == Seq[Byte](3, 4))
  }
}
