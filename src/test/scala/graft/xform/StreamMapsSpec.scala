package graft.xform

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-map + flattening semantics mirroring the SDK capabilities the
  * reference declares (meltano.yml:14-15). */
class StreamMapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq((1L, "a@x.com", 10.0), (2L, "b@y.org", 20.0), (3L, "c@x.com", 30.0))
    .toDF("id", "email", "v")

  test("filter keeps matching rows only") {
    val out = StreamMaps(df, StreamMapConfig(filter = Some("v >= 20")))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("derive may reference a column that is simultaneously dropped (rename)") {
    val cfg = StreamMapConfig(columns = Map(
      "email" -> None,                                   // drop source
      "email_domain" -> Some("split(email, '@')[1]")))   // derived from it
    val out = StreamMaps(df, cfg)
    assert(!out.columns.contains("email"))
    assert(out.filter($"id" === 1).select("email_domain").as[String].head() == "x.com")
  }

  test("derives and filter compose; schema keeps untouched columns") {
    val cfg = StreamMapConfig(
      columns = Map("v2" -> Some("v * 2")), filter = Some("id != 2"))
    val out = StreamMaps(df, cfg)
    assert(out.columns.toSet == Set("id", "email", "v", "v2"))
    assert(out.agg(sum("v2")).head().getDouble(0) == 80.0)
  }

  test("flatten: 2-level struct -> parent__child columns, round-trips values") {
    val nested = Seq((1L, ("alice", ("nyc", "us")))).toDF("id", "u")
      .select(col("id"), struct(col("u._1").as("name"),
        struct(col("u._2._1").as("city"), col("u._2._2").as("cc")).as("addr")).as("u"))
    val flat = StreamMaps.flatten(nested, maxDepth = 2)
    assert(flat.columns.toSet == Set("id", "u__name", "u__addr__city", "u__addr__cc"))
    val r = flat.head()
    assert(r.getAs[String]("u__name") == "alice" &&
      r.getAs[String]("u__addr__city") == "nyc")
  }

  test("flatten property: leaf count is preserved for generated nested schemas") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.types._
    def genSchema(depth: Int): Gen[StructType] = for {
      n <- Gen.choose(1, 3)
      names <- Gen.listOfN(n, Gen.identifier.map(_.take(6))).map(_.distinct)
      fields <- Gen.sequence[List[StructField], StructField](names.map { nm =>
        if (depth > 0)
          Gen.frequency(
            2 -> Gen.const(StructField(nm, LongType)),
            1 -> genSchema(depth - 1).map(st => StructField(nm, st)))
        else Gen.const(StructField(nm, LongType))
      })
    } yield StructType(fields)
    def leaves(s: StructType): Int = s.fields.map {
      case StructField(_, st: StructType, _, _) => leaves(st)
      case _ => 1
    }.sum
    (0 until 30).flatMap(i =>
      genSchema(3).apply(Gen.Parameters.default, Seed(i.toLong))).foreach { schema =>
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val flat = StreamMaps.flatten(df, maxDepth = 10)
      assert(flat.columns.length == leaves(schema),
        s"schema=${schema.simpleString}")
      assert(flat.columns.distinct.length == flat.columns.length)
    }
  }

  test("flatten: structs beyond maxDepth serialize to JSON strings (SDK rule)") {
    val nested = Seq((1L, ("alice", ("nyc", "us")))).toDF("id", "u")
      .select(col("id"), struct(col("u._1").as("name"),
        struct(col("u._2._1").as("city"), col("u._2._2").as("cc")).as("addr")).as("u"))
    val flat = StreamMaps.flatten(nested, maxDepth = 1)
    assert(flat.columns.toSet == Set("id", "u__name", "u__addr"))
    assert(flat.head().getAs[String]("u__addr") == """{"city":"nyc","cc":"us"}""")
  }
}
