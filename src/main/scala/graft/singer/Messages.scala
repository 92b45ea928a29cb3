package graft.singer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Singer protocol message ADT + JSONL decoder.
  *
  * The reference consumes these via the Singer SDK's `Target` CLI
  * (`/root/reference/target_iceberg/target.py:64-65`); the wire format is the
  * public Singer spec: one JSON object per line, discriminated by `type` —
  * SCHEMA / RECORD / STATE / ACTIVATE_VERSION (SURVEY.md §2.B1).
  */
sealed trait SingerMessage extends Product with Serializable

object SingerMessage {
  /** Declares/updates a stream's schema; `schemaJson` is the raw JSON Schema
    * text (kept as text so it can live in a Spark Dataset[String] and be
    * re-parsed off the driver). */
  final case class Schema(stream: String, schemaJson: String,
                          keyProperties: Seq[String]) extends SingerMessage
  /** One data row, as raw JSON text of the `record` object. */
  final case class Record(stream: String, recordJson: String) extends SingerMessage
  /** Checkpoint to be echoed downstream once pending batches are durable. */
  final case class State(valueJson: String) extends SingerMessage
  /** Full-table version swap signal. */
  final case class ActivateVersion(stream: String, version: Long) extends SingerMessage
  /** SDK 0.34+ file-reference batch: the records live in the manifest's
    * JSONL files (one bare record object per line, optionally gzip parts),
    * not inline in the feed. The reference never opts in (`meltano.yml`
    * declares no `batch` capability), so this is optional surface. */
  final case class Batch(stream: String, format: String, compression: String,
                         manifest: Seq[String]) extends SingerMessage

  // USE_BIG_DECIMAL_FOR_FLOATS: decode re-serializes the `record` node
  // (rec.toString) for downstream typed parsing — a default mapper would
  // round JSON floats through a double HERE, silently corrupting
  // number-carried singer.decimal values past ~16 significant digits
  // before any decimal-aware consumer saw the text
  @transient private lazy val mapper = new ObjectMapper()
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)

  /** Decode one JSONL line. Unknown/garbled lines return None (the Singer
    * spec requires targets to ignore unrecognized message types). */
  def decode(line: String): Option[SingerMessage] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None
    val node =
      try mapper.readTree(trimmed)
      catch { case _: Exception => return None }
    decode(node)
  }

  def decode(node: JsonNode): Option[SingerMessage] = {
    if (node == null || !node.has("type")) return None
    node.get("type").asText() match {
      case "SCHEMA" =>
        for {
          stream <- Option(node.get("stream")).map(_.asText())
          schema <- Option(node.get("schema"))
        } yield Schema(stream, schema.toString, keyProps(node))
      case "RECORD" =>
        // Singer records are JSON objects; a non-object `record` (e.g. a bare
        // number) is invalid and must be dropped, not admitted as an all-null
        // row — PERMISSIVE from_json would otherwise return an all-null
        // struct for it downstream (SDK record validation, SURVEY §2.B2).
        for {
          stream <- Option(node.get("stream")).map(_.asText())
          rec <- Option(node.get("record")) if rec.isObject
        } yield Record(stream, rec.toString)
      case "STATE" =>
        Some(State(Option(node.get("value")).map(_.toString).getOrElse("{}")))
      case "ACTIVATE_VERSION" =>
        for (stream <- Option(node.get("stream")).map(_.asText()))
          yield ActivateVersion(stream,
            Option(node.get("version")).map(_.asLong()).getOrElse(0L))
      case "BATCH" =>
        val enc = Option(node.get("encoding"))
        for (stream <- Option(node.get("stream")).map(_.asText()))
          yield Batch(stream,
            enc.flatMap(e => Option(e.get("format")).map(_.asText()))
              .getOrElse("jsonl"),
            enc.flatMap(e => Option(e.get("compression")).map(_.asText()))
              .getOrElse("none"),
            Option(node.get("manifest")) match {
              case Some(m) if m.isArray =>
                m.elements().asScala.map(_.asText()).toSeq
              case _ => Seq.empty
            })
      case _ => None
    }
  }

  private def keyProps(node: JsonNode): Seq[String] =
    Option(node.get("key_properties")) match {
      case Some(kp) if kp.isArray => kp.elements().asScala.map(_.asText()).toSeq
      case _                      => Seq.empty
    }
}
