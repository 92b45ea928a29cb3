package graft.singer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Singer JSON Schema -> Spark [[StructType]] converter.
  *
  * Behavioral contract mirrors the reference's two-hop conversion
  * (`/root/reference/target_iceberg/iceberg.py:9-166`) collapsed into one hop,
  * per SURVEY.md §1.3-1.4:
  *
  *   - `anyOf` unions are reduced keeping only `string`/`null` member types,
  *     first `format` wins (iceberg.py:12-33).
  *   - a property with no `type` key defaults to nullable string
  *     (iceberg.py:72-74).
  *   - `string` `format`s are honored only at nesting level 0
  *     (iceberg.py:87-95): `date` -> DateType, `time` -> LongType micros
  *     (Spark has no time type; divergence documented in SURVEY §7.4), any
  *     other format (`date-time`, ...) -> TimestampType.
  *   - `integer` -> LongType, `number` -> DoubleType, `boolean` -> BooleanType
  *     (iceberg.py:76-84).
  *   - `array` recurses into `items` (iceberg.py:98-109); missing `items`
  *     yields ArrayType(NullType) (iceberg.py:110-116); `object` recurses into
  *     `properties` (iceberg.py:117-127).
  *   - nullable iff `"null"` is in the type union (iceberg.py:77 et al.).
  *   - Iceberg-style sequential field ids attached as `PARQUET:field_id`
  *     metadata, depth-first, struct leaves only (iceberg.py:137-153).
  */
object SchemaConv {
  private val mapper = new ObjectMapper()
  val FieldIdKey = "PARQUET:field_id"

  /** Metadata key recording the Singer `format` that produced a field's
    * Spark type when the mapping is lossy or wire-shape-sensitive:
    * `"time"` (Spark has no time type, so micros-since-midnight land in
    * LongType — SURVEY §7.4) and `"singer.decimal"` (the STRING-carried
    * decimal: values arrive and must re-emit as quoted plain strings,
    * not JSON numbers). The tag lets the Singer sink re-emit the exact
    * Singer shape the field came from. */
  val SingerFormatKey = "singer:format"

  /** Does this field carry the `format: time` provenance tag? */
  def isTimeField(f: StructField): Boolean =
    f.dataType == LongType && f.metadata.contains(SingerFormatKey) &&
      f.metadata.getString(SingerFormatKey) == "time"

  /** Does this field carry the string-borne `singer.decimal` tag? */
  def isDecimalStringField(f: StructField): Boolean =
    f.dataType.isInstanceOf[DecimalType] &&
      f.metadata.contains(SingerFormatKey) &&
      f.metadata.getString(SingerFormatKey) == "singer.decimal"

  /** `HH:mm:ss[.SSSSSS]` -> micros-since-midnight, or null when the text
    * does not parse — the ONE definition of the Singer time-string value
    * rule, shared by the DSv2 reader ([[graft.sources]]) and mirrored by
    * the load path's column expression ([[graft.lake.BatchLoader]]). */
  val TimePattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      "^([01]\\d|2[0-3]):([0-5]\\d):([0-5]\\d)(?:\\.(\\d{1,6}))?$")

  /** Valid micros-since-midnight are `[0, MicrosPerDay)` — the ONE range
    * both load faces enforce so the sink's time-string encoder can never
    * see a value it cannot represent. */
  val MicrosPerDay: Long = 86400000000L

  def timeStringToMicros(s: String): java.lang.Long = {
    val m = TimePattern.matcher(s)
    if (!m.matches()) return null
    val secs = m.group(1).toLong * 3600 + m.group(2).toLong * 60 +
      m.group(3).toLong
    val frac = Option(m.group(4)).map(f => (f + "0" * (6 - f.length)).toLong)
      .getOrElse(0L)
    java.lang.Long.valueOf(secs * 1000000L + frac)
  }

  /** Micros-since-midnight -> the canonical Singer time string (fraction
    * printed only when nonzero, always 6 digits — re-parses exactly).
    * Both load faces reject values outside `[0, MicrosPerDay)`, but a table
    * written by an EXTERNAL engine may still hold one — normalize by
    * floor-mod into the day rather than crash the whole export job on a
    * row this engine never admitted. */
  def microsToTimeString(micros: Long): String = {
    val inDay = java.lang.Math.floorMod(micros, MicrosPerDay)
    val t = java.time.LocalTime.ofNanoOfDay(inDay * 1000L)
    val base = f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    val frac = inDay % 1000000L
    if (frac == 0L) base else f"$base.$frac%06d"
  }

  /** Parse a JSON document (the `schema` object of a Singer SCHEMA message). */
  def parse(json: String): JsonNode = mapper.readTree(json)

  def toStructType(json: String): StructType = toStructType(parse(json))

  def toStructType(schema: JsonNode): StructType = {
    val root = convertObject(schema, level = 0)
    assignFieldIds(root)
  }

  /** anyOf reduction (iceberg.py:12-33): keep only `string`/`null` member
    * types; the first member carrying a `format` wins. Returns (types, format).
    */
  private[singer] def processAnyOf(anyOf: JsonNode): (Seq[String], Option[String]) = {
    var types = Vector.empty[String]
    var format: Option[String] = None
    anyOf.elements().asScala.foreach { member =>
      val t = typeList(member)
      if (t.contains("string")) {
        if (format.isEmpty && member.hasNonNull("format"))
          format = Some(member.get("format").asText())
        if (!types.contains("string")) types :+= "string"
      }
      if (t.contains("null") && !types.contains("null")) types :+= "null"
    }
    (types, format)
  }

  /** The `type` key as a list (Singer allows both `"integer"` and
    * `["integer","null"]`). */
  private def typeList(node: JsonNode): Seq[String] = {
    val t = node.get("type")
    if (t == null) Seq.empty
    else if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
    else Seq(t.asText())
  }

  /** One property -> Spark DataType + nullability + provenance metadata.
    * `level` counts struct nesting depth; string formats only apply at
    * level 0 (iceberg.py:87). */
  private[singer] def convertField(prop: JsonNode,
                                   level: Int): (DataType, Boolean, Metadata) = {
    val (types, anyOfFormat) =
      if (prop.has("anyOf")) processAnyOf(prop.get("anyOf"))
      else {
        val t = typeList(prop)
        // missing `type` defaults to nullable string (iceberg.py:72-74)
        val tt = if (t.isEmpty) Seq("string", "null") else t
        // hasNonNull, like processAnyOf: `"format": null` means no format
        // (NullNode.asText would yield the string "null" -> TimestampType)
        (tt, if (prop.hasNonNull("format")) Some(prop.get("format").asText())
             else None)
      }
    val nullable = types.contains("null")
    val primary = types.find(_ != "null")
    var md = Metadata.empty
    val dt: DataType = primary match {
      case Some("integer") => LongType
      case Some("number") =>
        // DECIMAL extension (beyond the reference, which maps every
        // `number` to float64 — iceberg.py:81 — silently losing precision
        // on the first tap that declares exact-decimal semantics):
        //  - `format: singer.decimal` (the Singer SDK's exact-decimal
        //    marker) with optional sibling `precision`/`scale` keys;
        //  - a FRACTIONAL `multipleOf` 10^-s, s >= 1 (how classic
        //    singer-python encodes Decimal scale) -> DecimalType(38, s);
        //    integral steps (1/10/100) stay float64 — see multipleOfDecimal.
        // Level 0 only, like every other format rule here.
        if (level == 0 && anyOfFormat.contains("singer.decimal"))
          declaredDecimal(prop)
        else if (level == 0) multipleOfDecimal(prop).getOrElse(DoubleType)
        else DoubleType
      case Some("boolean") => BooleanType
      case Some("string") =>
        anyOfFormat match {
          case Some(f) if level == 0 =>
            f match {
              case "date" => DateType
              case "time" =>
                // micros-since-midnight (SURVEY §7.4) WITH the provenance
                // tag, so writers can re-emit format:time (round-trip)
                md = new MetadataBuilder()
                  .putString(SingerFormatKey, "time").build()
                LongType
              case "singer.decimal" =>
                // string-carried exact decimal: tag the provenance so the
                // sink re-emits quoted plain strings, not JSON numbers
                md = new MetadataBuilder()
                  .putString(SingerFormatKey, "singer.decimal").build()
                declaredDecimal(prop)
              case _      => TimestampType // date-time and any other format
            }
          case _ => StringType
        }
      case Some("array") =>
        val items = prop.get("items")
        if (items == null) ArrayType(NullType, containsNull = true)
        else {
          val (et, en, _) = convertField(items, level + 1)
          ArrayType(et, containsNull = en)
        }
      case Some("object") =>
        // MAP extension (beyond the reference, which converts an object
        // with no `properties` to an EMPTY struct — iceberg.py:117-127 —
        // silently dropping every field the first dynamic-keys tap
        // emits): an object declaring NO fixed properties but a SCHEMA
        // OBJECT under `additionalProperties` is JSON Schema's map shape
        // -> MapType(string, <value type>). Declared `properties` still
        // win (typed struct); a bare `additionalProperties: true` keeps
        // the reference's empty-struct behavior.
        val ap = prop.get("additionalProperties")
        if (prop.get("properties") == null && ap != null && ap.isObject) {
          val (vt, _, _) = convertField(ap, level + 1)
          // values ALWAYS nullable: the query surface nulls
          // type-mismatched values (the reader contract), so even a
          // non-null value declaration can surface null map entries
          MapType(StringType, vt, valueContainsNull = true)
        } else convertObject(prop, level + 1)
      case _              => NullType // unknown type (iceberg.py:57-58)
    }
    (dt, nullable, md)
  }

  /** `format: singer.decimal` -> DecimalType from the declared
    * `precision`/`scale` keys (defaults 38/18 — Spark's max precision and
    * a balanced scale, matching pyiceberg's own singer.decimal default
    * shape). Declared-but-invalid values fail LOUDLY: a malformed decimal
    * declaration silently becoming a string or float is exactly the
    * precision-loss bug this extension exists to close. */
  private def declaredDecimal(prop: JsonNode): DecimalType = {
    val p = if (prop.hasNonNull("precision")) prop.get("precision").asInt()
            else 38
    val s = if (prop.hasNonNull("scale")) prop.get("scale").asInt() else 18
    require(p >= 1 && p <= 38 && s >= 0 && s <= p,
      s"singer.decimal declares precision=$p scale=$s — need " +
        "1 <= precision <= 38 and 0 <= scale <= precision")
    DecimalType(p, s)
  }

  /** `multipleOf` = 10^-s with s >= 1 (after trailing-zero normalization)
    * declares scale-s decimal semantics — the classic singer-python
    * fractional-Decimal encoding. Any other step keeps the reference's
    * float64 mapping: a non-decimal grid like 0.25 has no exact decimal
    * type, and INTEGRAL steps (`multipleOf` 1, 10, 100) are the common
    * plain grid constraint ("this number is a multiple of N"), not a
    * scale declaration — inferring DECIMAL(38,0) from them silently
    * retypes existing float64 feeds (ADVICE r11). A feed wanting an
    * integral exact decimal declares `format: singer.decimal` with
    * explicit precision/scale (which is also what [[graft.sources]]'
    * sink emits, so scale-0 round-trips are unaffected). */
  private def multipleOfDecimal(prop: JsonNode): Option[DecimalType] =
    if (!prop.hasNonNull("multipleOf")) None
    else {
      val bd = prop.get("multipleOf").decimalValue().stripTrailingZeros()
      val s = bd.scale()
      if (bd.unscaledValue() == java.math.BigInteger.ONE && s >= 1 && s <= 38)
        Some(DecimalType(38, s))
      else None
    }

  private[singer] def convertObject(node: JsonNode, level: Int): StructType = {
    val props = node.get("properties")
    if (props == null) return StructType(Nil)
    // iterator, NOT .asScala.map on the entry Set: mapping a Set wrapper
    // rebuilds a HashSet and scrambles declaration order, which field-id
    // assignment (A10: sequential ids in declaration order) depends on
    val fields = props.properties().asScala.iterator.map { e =>
      val (dt, nullable, md) = convertField(e.getValue, level)
      StructField(e.getKey, dt, nullable, md)
    }.toSeq
    StructType(fields)
  }

  /** Sequential Iceberg field-id assignment as `PARQUET:field_id` metadata:
    * depth-first; struct children recursed, struct parent itself un-id'd;
    * list element types intentionally NOT recursed — both quirks mirror
    * iceberg.py:137-153 and are unit-tested as documented behavior. */
  def assignFieldIds(schema: StructType): StructType = {
    var next = 0
    def walk(st: StructType): StructType = StructType(st.fields.map { f =>
      f.dataType match {
        case s: StructType => f.copy(dataType = walk(s))
        case _ =>
          next += 1
          f.copy(metadata = new MetadataBuilder()
            .withMetadata(f.metadata).putLong(FieldIdKey, next.toLong).build())
      }
    })
    walk(schema)
  }
}
