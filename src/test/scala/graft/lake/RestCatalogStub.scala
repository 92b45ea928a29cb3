package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** In-test Iceberg-REST-shaped catalog server (the [[RestLakeCatalog]]
  * scaladoc documents the protocol): namespaces and versioned table
  * metadata in memory, with the commit route performing the server-side
  * compare-and-swap under one lock — exactly the atomicity the reference's
  * real REST catalog provides and the client's retry loop relies on.
  * Listens on an ephemeral localhost port. */
object RestCatalogStub {
  private val mapper = new ObjectMapper()

  final class Server private[RestCatalogStub] (private val hs: HttpServer) {
    private val lock = new Object
    private val namespaces = scala.collection.mutable.Set[String]()
    // (ns, table) -> (version, metadata JSON)
    private val tables =
      scala.collection.mutable.Map[(String, String), (Int, String)]()

    def port: Int = hs.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"
    def stop(): Unit = hs.stop(0)

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def dec(s: String): String =
      java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

    private[RestCatalogStub] def handle(ex: HttpExchange): Unit = try {
      val method = ex.getRequestMethod
      // RAW path: URI.getPath percent-decodes, and dec() below decodes
      // exactly once — decoding twice would corrupt names containing '+'
      // or '%' (the client sends RFC 3986 segment encoding)
      val parts = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty)
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      (method, parts.toList) match {
        // POST /v1/namespaces {"namespace": ["ns"]}
        case ("POST", "v1" :: "namespaces" :: Nil) =>
          val ns = mapper.readTree(body).get("namespace").get(0).asText()
          lock.synchronized {
            if (namespaces.add(ns)) reply(ex, 200, "{}")
            else reply(ex, 409, """{"error":"namespace exists"}""")
          }
        // DELETE /v1/namespaces/{ns}
        case ("DELETE", "v1" :: "namespaces" :: ns :: Nil) =>
          lock.synchronized {
            val n = dec(ns)
            val had = namespaces.remove(n)
            tables.keys.filter(_._1 == n).toSeq.foreach(tables.remove)
            reply(ex, if (had) 200 else 404, "{}")
          }
        // GET /v1/namespaces/{ns}/tables/{t}
        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          lock.synchronized {
            tables.get((dec(ns), dec(t))) match {
              case Some((v, meta)) =>
                reply(ex, 200, s"""{"metadata-version":$v,"metadata":$meta}""")
              case None => reply(ex, 404, """{"error":"no such table"}""")
            }
          }
        // POST /v1/namespaces/{ns}/tables/{t} {"base-version":N,"metadata":{}}
        // — the server-side CAS: commit iff the base matches
        case ("POST", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          val node = mapper.readTree(body)
          val base = node.get("base-version").asInt()
          val meta = node.get("metadata").toString
          lock.synchronized {
            val key = (dec(ns), dec(t))
            val cur = tables.get(key).map(_._1).getOrElse(0)
            if (cur != base)
              reply(ex, 409, s"""{"metadata-version":$cur,"error":"stale base $base"}""")
            else {
              tables.update(key, (cur + 1, meta))
              reply(ex, 200, s"""{"metadata-version":${cur + 1}}""")
            }
          }
        case _ => reply(ex, 404, """{"error":"no such route"}""")
      }
    } catch {
      case e: Exception =>
        reply(ex, 500, s"""{"error":"${e.getMessage}"}""")
    }
  }

  def start(): Server = {
    val hs = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val server = new Server(hs)
    hs.createContext("/", (ex: HttpExchange) => server.handle(ex))
    // a small pool so racing clients actually overlap on the server
    hs.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    hs.start()
    server
  }
}
