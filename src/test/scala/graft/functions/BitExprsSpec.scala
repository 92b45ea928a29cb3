package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BitExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zorder2 interleaves bits: a -> even positions, b -> odd") {
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    assert(ZOrder2.interleave(1L, 0L) == 1L)
    assert(ZOrder2.interleave(0L, 1L) == 2L)
    assert(ZOrder2.interleave(3L, 1L) == 7L) // a bits 0,1 -> z 0,2; b bit 0 -> z 1
    assert(ZOrder2.interleave(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrder2.interleave(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrder2.interleave(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // values past 16 bits fold onto the low 16
    assert(ZOrder2.interleave(0x1FFFFL, 0L) == ZOrder2.interleave(0xFFFFL, 0L))
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    import spark.implicits._
    graft.functions.TextHashExprs.register(spark)
    val df = Seq((3L, 1L), (12345L, 678L), (65535L, 65535L))
      .toDF("a", "b")
      .selectExpr("a", "b", "zorder2(a, b) AS z")
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrder2.interleave(r.getLong(0), r.getLong(1)))
    }
    val nulls = spark.sql(
      "SELECT zorder2(CAST(NULL AS BIGINT), 1) AS a, zorder2(1, CAST(NULL AS BIGINT)) AS b")
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // int inputs widen like bigint inputs
    val ints = spark.sql("SELECT zorder2(CAST(3 AS INT), CAST(1 AS INT)) AS z")
      .collect().head
    assert(ints.getLong(0) == 7L)
  }

  test("dhash64: gradient bits, empty payload, identical/near payloads") {
    // constant payload: no ascending gradient anywhere -> hash 0
    assert(DHash64.hash(Array.fill[Byte](100)(7)) == 0L)
    assert(DHash64.hash(Array.emptyByteArray) == 0L)
    // strictly ascending payload: every px(g+1) > px(g) -> all 64 bits set
    assert(DHash64.hash((0 until 144).map(_.toByte).toArray) == -1L)
    // identical payloads collide; one flipped region flips few bits
    val base = (0 until 720).map(i => ((i * 37) % 251).toByte).toArray
    val near = base.clone(); (0 until 10).foreach(i => near(300 + i) = 0)
    assert(DHash64.hash(base) == DHash64.hash(base.clone()))
    val ham = java.lang.Long.bitCount(DHash64.hash(base) ^ DHash64.hash(near))
    assert(ham <= 4, s"local edit flipped $ham of 64 bits")
  }

  test("dhash64 codegen path matches the static kernel; null propagates") {
    graft.functions.TextHashExprs.register(spark)
    import spark.implicits._
    val df = Seq("abcdef", "zzzzzz", "a").toDF("s")
      .selectExpr("encode(s, 'UTF-8') AS b")
      .selectExpr("b", "dhash64(b) AS h")
    df.collect().foreach { r =>
      assert(r.getLong(1) == DHash64.hash(r.getAs[Array[Byte]](0)))
    }
    val n = spark.sql("SELECT dhash64(CAST(NULL AS BINARY)) AS h").collect().head
    assert(n.isNullAt(0))
  }

  test("z-buckets bound BOTH dimensions (the pruning property)") {
    val rows = graft.ops.Relational
      .q79ZorderLocality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // top-16-bit bucket fixes the high 8 bits of each interleaved key:
      // both spans are <= 255 — FOR KEYS IN zorder2's 16-bit domain (the
      // documented contract; test-SF TPC-H keys fit). Keys past 2^16 fold
      // (& 0xFFFF) and must be range-bucketed into 16 bits first, or this
      // locality bound does not hold.
      assert(r.getAs[Long]("max_pk") - r.getAs[Long]("min_pk") <= 255)
      assert(r.getAs[Long]("max_sk") - r.getAs[Long]("min_sk") <= 255)
    }
  }
}
