package graft.lake

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** HTTP-carried [[SnapshotLakeCatalog]]: the table metadata lives on a
  * catalog SERVER speaking the Iceberg REST catalog protocol shape — the
  * exact wire surface the reference connects to
  * (`/root/reference/target_iceberg/sinks.py:55-65`, pyiceberg's
  * `load_catalog(type=rest)`), which neither local carrier exercises.
  *
  * Protocol (a faithful reduction of the public Iceberg REST catalog
  * OpenAPI — same routes, same commit model; the metadata document is this
  * repo's table-metadata JSON rather than the full Iceberg TableMetadata
  * schema, and the commit requirement is a single base-version assertion,
  * the role `assert-table-uuid`/`assert-ref-snapshot-id` play in the full
  * spec):
  *   - `POST /v1/namespaces` `{"namespace": ["<ns>"]}` — create (409 = exists, fine)
  *   - `DELETE /v1/namespaces/<ns>` — drop with tables
  *   - `GET /v1/namespaces/<ns>/tables/<t>` —
  *     `{"metadata-version": N, "metadata": {...}}` or 404
  *   - `POST /v1/namespaces/<ns>/tables/<t>` —
  *     `{"base-version": N, "metadata": {...}}`; the SERVER checks the
  *     base against its current version and commits atomically — 200
  *     `{"metadata-version": N+1}`, or 409 on a stale base. This is the
  *     server-side compare-and-swap the reference's catalog provides, and
  *     the commit loop in [[SnapshotLakeCatalog]] retries on it exactly as
  *     it does on a lost link(2) claim.
  *
  * The data plane stays on the shared filesystem `warehouse` (a REST
  * catalog points at object storage; snapshot directories are written by
  * the engine and only NAMED in the committed metadata). The in-test
  * server (`RestCatalogStub`) implements the same routes over a
  * ConcurrentHashMap, so `LakeCatalogMatrixSpec` runs the full lifecycle —
  * including the racing-writers case — through real HTTP round-trips. */
class RestLakeCatalog(spark: SparkSession, baseUri: String,
                      val warehouse: Path)
    extends SnapshotLakeCatalog(spark) {

  private val http = HttpClient.newHttpClient()

  /** Percent-encode a PATH segment. URLEncoder alone form-encodes
    * (space -> '+'), which a path-decoding server reads back as a literal
    * plus — so the '+' is rewritten to %20 (and a literal '+' in the name
    * was already %2B-escaped by URLEncoder), giving true RFC 3986 segment
    * encoding that survives exactly one server-side decode. */
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def send(method: String, path: String, body: String = "")
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$baseUri$path"))
      .header("Content-Type", "application/json")
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case "POST"   => b.POST(HttpRequest.BodyPublishers.ofString(body))
    }).build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def expect(r: HttpResponse[String], ok: Int*): HttpResponse[String] = {
    if (!ok.contains(r.statusCode()))
      throw new IllegalStateException(
        s"catalog server returned ${r.statusCode()} for ${r.uri()}: ${r.body()}")
    r
  }

  override protected def dataDir(ns: String, table: String): Path =
    warehouse.resolve(ns).resolve(table).resolve("data")

  override def ensureNamespace(ns: String): Unit = {
    val body = mapper.createObjectNode()
    body.putArray("namespace").add(ns)
    // 409 = already exists: ensure semantics
    expect(send("POST", "/v1/namespaces", body.toString), 200, 409)
    Files.createDirectories(warehouse.resolve(ns))
  }

  override def dropNamespace(ns: String): Unit = {
    expect(send("DELETE", s"/v1/namespaces/${enc(ns)}"), 200, 404)
    deleteTree(warehouse.resolve(ns))
  }

  override protected def fetchMeta(ns: String,
                                   table: String): Option[(Int, ObjectNode)] = {
    val r = expect(
      send("GET", s"/v1/namespaces/${enc(ns)}/tables/${enc(table)}"), 200, 404)
    if (r.statusCode() == 404) None
    else {
      val node = mapper.readTree(r.body()).asInstanceOf[ObjectNode]
      Some((node.get("metadata-version").asInt(),
        node.get("metadata").asInstanceOf[ObjectNode]))
    }
  }

  override protected def casMeta(ns: String, table: String, base: Int,
                                 meta: ObjectNode): Boolean = {
    val body = mapper.createObjectNode()
    body.put("base-version", base)
    body.set[ObjectNode]("metadata", meta)
    // 409 = stale base: the server-side CAS rejected us — lost race
    expect(send("POST", s"/v1/namespaces/${enc(ns)}/tables/${enc(table)}",
      body.toString), 200, 409).statusCode() == 200
  }
}
