package graft.singer

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven tests mirroring every row of SURVEY.md §1.4 / FIXTURES.md §3
  * (reference behavior at /root/reference/target_iceberg/iceberg.py:9-160). */
class SchemaConvSpec extends AnyFunSuite {

  private def conv(json: String): StructType = SchemaConv.toStructType(json)
  private def field(st: StructType, name: String): StructField = st(name)

  test("primitive types: integer/number/boolean/string") {
    val st = conv("""{"properties": {
      "i": {"type": ["integer"]}, "n": {"type": ["number"]},
      "b": {"type": ["boolean"]}, "s": {"type": ["string"]}}}""")
    assert(field(st, "i").dataType == LongType && !field(st, "i").nullable)
    assert(field(st, "n").dataType == DoubleType)
    assert(field(st, "b").dataType == BooleanType)
    assert(field(st, "s").dataType == StringType)
  }

  test("nullability iff 'null' in the type union") {
    val st = conv("""{"properties": {
      "a": {"type": ["integer", "null"]}, "b": {"type": ["integer"]}}}""")
    assert(field(st, "a").nullable && !field(st, "b").nullable)
  }

  test("string formats honored only at level 0: date-time/date/time") {
    val st = conv("""{"properties": {
      "dt": {"type": ["string"], "format": "date-time"},
      "d":  {"type": ["string"], "format": "date"},
      "t":  {"type": ["string"], "format": "time"}}}""")
    assert(field(st, "dt").dataType == TimestampType)
    assert(field(st, "d").dataType == DateType)
    assert(field(st, "t").dataType == LongType) // micros; SURVEY §7.4
    // the lossy time mapping carries its provenance tag so writers can
    // re-emit format:time (round-trip); the lossless mappings carry none
    assert(SchemaConv.isTimeField(field(st, "t")))
    assert(!field(st, "dt").metadata.contains(SchemaConv.SingerFormatKey))
  }

  test("time strings parse to micros and print back identically") {
    assert(SchemaConv.timeStringToMicros("00:00:00") == 0L)
    assert(SchemaConv.timeStringToMicros("12:34:56") ==
      (12 * 3600 + 34 * 60 + 56) * 1000000L)
    assert(SchemaConv.timeStringToMicros("23:59:59.25") ==
      (23 * 3600 + 59 * 60 + 59) * 1000000L + 250000L)
    assert(SchemaConv.timeStringToMicros("24:00:00") == null)
    assert(SchemaConv.timeStringToMicros("9:00:00") == null)
    assert(SchemaConv.timeStringToMicros("not a time") == null)
    for (m <- Seq(0L, 1L, 250000L, 86399999999L,
        (12 * 3600 + 34 * 60 + 56) * 1000000L)) {
      assert(SchemaConv.timeStringToMicros(
        SchemaConv.microsToTimeString(m)) == m, s"micros $m")
    }
    // out-of-range micros (which neither load face admits) must not crash
    // an export of an externally-written table: floor-mod into the day
    assert(SchemaConv.microsToTimeString(-1L) == "23:59:59.999999")
    assert(SchemaConv.microsToTimeString(SchemaConv.MicrosPerDay) == "00:00:00")
    assert(SchemaConv.timeStringToMicros(
      SchemaConv.microsToTimeString(Long.MaxValue)) != null)
  }

  test("nested datetime demoted to string (format gated on level 0)") {
    val st = conv("""{"properties": {"o": {"type": ["object"], "properties":
      {"d": {"type": ["string"], "format": "date-time"}}}}}""")
    val inner = field(st, "o").dataType.asInstanceOf[StructType]
    assert(field(inner, "d").dataType == StringType)
  }

  test("missing type key defaults to nullable string") {
    val st = conv("""{"properties": {"x": {"description": "no type"}}}""")
    assert(field(st, "x").dataType == StringType && field(st, "x").nullable)
  }

  test("anyOf keeps string/null only; first format wins") {
    val st = conv("""{"properties": {"x": {"anyOf": [
      {"type": "string", "format": "date-time"}, {"type": "null"}]}}}""")
    assert(field(st, "x").dataType == TimestampType && field(st, "x").nullable)
  }

  test("anyOf with non-string members reduces them away") {
    // mirror of iceberg.py:28-33: integer member contributes nothing
    val st = conv("""{"properties": {"x": {"anyOf": [
      {"type": "integer"}, {"type": "null"}]}}}""")
    // only "null" survives -> no primary type -> NullType, nullable
    assert(field(st, "x").dataType == NullType && field(st, "x").nullable)
  }

  test("arrays: typed items, nested arrays, struct items, missing items") {
    val st = conv("""{"properties": {
      "a":  {"type": ["array"], "items": {"type": ["number"]}},
      "nn": {"type": ["array"], "items":
              {"type": ["array"], "items": {"type": ["integer"]}}},
      "so": {"type": ["array"], "items": {"type": ["object"], "properties":
              {"k": {"type": ["string"]}}}},
      "no": {"type": ["array"]}}}""")
    assert(field(st, "a").dataType == ArrayType(DoubleType, containsNull = false))
    assert(field(st, "nn").dataType ==
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false))
    val soEl = field(st, "so").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(field(soEl, "k").dataType == StringType)
    assert(field(st, "no").dataType == ArrayType(NullType, containsNull = true))
  }

  test("array items format is NOT honored (level > 0)") {
    val st = conv("""{"properties": {"a": {"type": ["array"],
      "items": {"type": ["string"], "format": "date-time"}}}}""")
    assert(field(st, "a").dataType.asInstanceOf[ArrayType].elementType == StringType)
  }

  test("empty object yields empty struct") {
    val st = conv("""{"properties": {"o": {"type": ["object"], "properties": {}}}}""")
    assert(field(st, "o").dataType == StructType(Nil))
  }

  test("field ids: sequential depth-first, struct parent un-id'd") {
    val st = conv("""{"properties": {
      "a": {"type": ["integer"]},
      "o": {"type": ["object"], "properties": {
        "x": {"type": ["string"]}, "y": {"type": ["number"]}}},
      "z": {"type": ["boolean"]}}}""")
    def id(f: StructField): Long = f.metadata.getLong(SchemaConv.FieldIdKey)
    val o = field(st, "o")
    val inner = o.dataType.asInstanceOf[StructType]
    assert(id(field(st, "a")) == 1L)
    assert(id(field(inner, "x")) == 2L && id(field(inner, "y")) == 3L)
    assert(id(field(st, "z")) == 4L)
    assert(!o.metadata.contains(SchemaConv.FieldIdKey)) // parent quirk
    val ids = Seq(field(st, "a"), field(inner, "x"), field(inner, "y"),
      field(st, "z")).map(id)
    assert(ids == ids.distinct)
  }

  test("decimal extension: multipleOf powers of ten declare scale; " +
    "singer.decimal declares precision/scale; everything else keeps the " +
    "reference's float64 mapping") {
    val st = conv("""{"properties": {
      "cents":   {"type": ["number", "null"], "multipleOf": 0.01},
      "tenths":  {"type": "number", "multipleOf": 1e-1},
      "tens":    {"type": ["number"], "multipleOf": 10},
      "grid":    {"type": ["number", "null"], "multipleOf": 0.25},
      "plain":   {"type": ["number", "null"]},
      "decl":    {"type": ["number", "null"], "format": "singer.decimal",
                  "precision": 12, "scale": 3},
      "sdec":    {"type": ["string", "null"], "format": "singer.decimal"},
      "sdecp":   {"type": ["string", "null"], "format": "singer.decimal",
                  "precision": 9, "scale": 4}}}""")
    assert(field(st, "cents").dataType == DecimalType(38, 2))
    assert(field(st, "tenths").dataType == DecimalType(38, 1) &&
      !field(st, "tenths").nullable)
    // INTEGRAL steps (multipleOf 1/10/100) are plain grid constraints,
    // not scale declarations: they keep float64 (ADVICE r11 — inferring
    // DECIMAL(38,0) silently retyped existing feeds). Integral exact
    // decimals opt in via format: singer.decimal.
    assert(field(st, "tens").dataType == DoubleType)
    assert(field(conv("""{"properties": {
      "n": {"type": "number", "multipleOf": 1}}}"""), "n")
      .dataType == DoubleType)
    // a non-power-of-ten step has no exact decimal type: float64 as before
    assert(field(st, "grid").dataType == DoubleType)
    assert(field(st, "plain").dataType == DoubleType)
    assert(field(st, "decl").dataType == DecimalType(12, 3))
    // string-carried decimals default (38,18) and carry the provenance
    // tag so the sink re-emits quoted strings
    assert(field(st, "sdec").dataType == DecimalType(38, 18))
    assert(SchemaConv.isDecimalStringField(field(st, "sdec")))
    assert(field(st, "sdecp").dataType == DecimalType(9, 4))
    assert(SchemaConv.isDecimalStringField(field(st, "sdecp")))
    assert(!SchemaConv.isDecimalStringField(field(st, "decl")),
      "number-carried decimals must NOT claim the string wire shape")
  }

  test("decimal extension: declared-but-invalid precision/scale fails " +
    "loudly; formats and multipleOf are level-0 only") {
    intercept[IllegalArgumentException](conv("""{"properties": {
      "bad": {"type": "number", "format": "singer.decimal",
              "precision": 40}}}"""))
    intercept[IllegalArgumentException](conv("""{"properties": {
      "bad": {"type": "string", "format": "singer.decimal",
              "precision": 6, "scale": 9}}}"""))
    // nested: the reference honors formats at level 0 only; the decimal
    // extension follows the same rule
    val st = conv("""{"properties": {"o": {"type": "object", "properties": {
      "inner": {"type": ["number", "null"], "multipleOf": 0.01}}}}}""")
    assert(field(field(st, "o").dataType.asInstanceOf[StructType], "inner")
      .dataType == DoubleType)
  }

  test("map extension: additionalProperties schema object -> MapType; " +
    "declared properties still win; bare true keeps the empty struct") {
    val st = conv("""{"properties": {
      "tags":  {"type": ["object", "null"],
                "additionalProperties": {"type": "integer"}},
      "attrs": {"type": "object",
                "additionalProperties": {"type": ["string", "null"]}},
      "typed": {"type": "object",
                "properties": {"x": {"type": "integer"}},
                "additionalProperties": {"type": "integer"}},
      "bare":  {"type": "object", "additionalProperties": true}}}""")
    // values always nullable: the reader contract nulls type mismatches
    assert(field(st, "tags").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    assert(field(st, "tags").nullable)
    assert(field(st, "attrs").dataType ==
      MapType(StringType, StringType, valueContainsNull = true))
    // fixed properties win over additionalProperties (typed struct)
    assert(field(st, "typed").dataType ==
      StructType(Seq(StructField("x", LongType, nullable = false,
        field(st, "typed").dataType.asInstanceOf[StructType]("x").metadata))))
    // `additionalProperties: true` carries no value schema: the
    // reference's empty-struct behavior is preserved
    assert(field(st, "bare").dataType == StructType(Nil))
  }

  test("events fixture schema matches FIXTURES.md §2") {
    val st = conv("""{"properties": {
      "event_id":  {"type": ["integer"]},
      "ts":        {"type": ["string"], "format": "date-time"},
      "user_id":   {"type": ["integer", "null"]},
      "event_type":{"type": ["string", "null"]},
      "value":     {"type": ["number", "null"]},
      "props":     {"type": ["string", "null"]}}}""")
    val expect = Seq(
      ("event_id", LongType: DataType, false), ("ts", TimestampType, false),
      ("user_id", LongType, true), ("event_type", StringType, true),
      ("value", DoubleType, true), ("props", StringType, true))
    expect.foreach { case (n, dt, nn) =>
      assert(field(st, n).dataType == dt && field(st, n).nullable == nn, n)
    }
  }
}
