package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Id-space invariant for every crafted VALUES fixture that a registered
  * query unions into the corpus (q151 pHash clusters, q173 metadata
  * conflicts, q182 frame runs).
  *
  * The 10× stress corpora (tools/scale_corpus.py) replicate the base
  * tables with copy c getting `doc_id + c * KEY_OFFSET` — so ANY fixture
  * id whose value mod KEY_OFFSET falls inside the base doc_id range is
  * minted as a real corpus id at some copy count, and the fixture row
  * silently merges with a corpus row (on the oracle side: one
  * GROUP BY doc_id bucket folding two different payloads). Round 9's
  * full-registry 10× gate caught exactly this: PhashFixture's old
  * 9000001–9000005 collided with copy 9 of sf0.01 (9000000–9000499).
  *
  * The invariant: `id mod KEY_OFFSET` must clear the base doc_id range of
  * every driver SF with slack — and the fixtures must not collide with
  * each other under mod either, since two fixture families could in
  * principle meet in a scaled UNION the same way. */
class FixtureIdSpec extends AnyFunSuite {

  // mirrors tools/scale_corpus.py KEY_OFFSET
  private val KeyOffset = 1000000L

  // base doc_ids are dense 0..n-1; sf0.1 is the largest driver SF (5,000
  // docs) and 100_000 leaves 20× headroom over it before a fixture id's
  // residue could be minted by replication
  private val MaxBaseDocId = 100000L

  private def allFixtureIds: Map[String, Seq[Long]] = Map(
    "PhashFixture" -> Multimodal.PhashFixture.map(_._1),
    "FrameRunFixture" -> Multimodal.FrameRunFixture.map(_._1),
    "VideoFixture" -> Multimodal.VideoFixture.map(_._1),
    "MetaConflictFixture" -> Dedup.MetaConflictFixture.map(_._1),
    "RetrEvalDocs" -> TextOps.RetrEvalDocs.map(_._1),
    // q_ids share the doc id space through `doc_id <> q_id` filters: a
    // replication-minted doc at an eval q_id would be dropped as "self"
    "RetrEvalQueries" -> TextOps.RetrEvalQueries.map(_._1))

  test("every fixture id's mod-KEY_OFFSET residue clears the base doc_id range") {
    for ((name, ids) <- allFixtureIds; id <- ids)
      assert(id % KeyOffset > MaxBaseDocId,
        s"$name id $id has residue ${id % KeyOffset} <= $MaxBaseDocId: " +
          "key-offset replication would mint it as a corpus doc_id")
  }

  test("fixture ids are unique across fixture families, mod KEY_OFFSET too") {
    val all = allFixtureIds.toSeq.flatMap { case (n, ids) => ids.map(n -> _) }
    val byResidue = all.groupBy(_._2 % KeyOffset)
    for ((res, owners) <- byResidue)
      assert(owners.size == 1,
        s"residue $res claimed by ${owners.mkString(", ")}")
  }

  test("fixture ids sit above the real corpus id range at every local SF") {
    val spark = TestSpark.spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val maxId = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)
      assert(maxId < MaxBaseDocId, s"$sf max doc_id $maxId >= $MaxBaseDocId: " +
        "the MaxBaseDocId slack assumption no longer holds — raise the " +
        "fixture residue convention before trusting any fixture-union oracle")
      for ((name, ids) <- allFixtureIds; id <- ids)
        assert(id > maxId, s"$name id $id inside $sf corpus range")
    }
  }
}
