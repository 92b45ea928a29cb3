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
  * Listens on an ephemeral localhost port.
  *
  * Hardening-spec extensions: optional bearer-token enforcement (401 on a
  * missing/wrong Authorization header), paginated list routes
  * (`next-page-token` contract), and two fault injectors — [[Server.failNext]]
  * rejects the next N requests with a 5xx BEFORE touching state (the
  * retryable transient), [[Server.failAfterCommit]] APPLIES the next
  * commit and then returns 503 (the lost-response ambiguity the client's
  * commit-recovery protocol must resolve without double-committing). */
object RestCatalogStub {
  private val mapper = new ObjectMapper()

  final class Server private[RestCatalogStub] (private val hs: HttpServer,
                                               requiredToken: Option[String],
                                               oauthClients: Map[String, String],
                                               tokenTtlMs: Long) {
    private val lock = new Object
    private val namespaces = scala.collection.mutable.Set[String]()
    // (ns, table) -> (version, metadata JSON)
    private val tables =
      scala.collection.mutable.Map[(String, String), (Int, String)]()
    private var failNextN = 0
    private var failNextCode = 503
    private var failNextMethod: Option[String] = None
    private var failAfterCommitN = 0
    private var raceAfterCommit = false
    private var requests = 0
    // token -> server-side expiry (epoch ms): the stub REJECTS an expired
    // token like a real auth gate, so the proactive-refresh spec can
    // prove "zero 401s served" rather than just "client refreshed"
    private val issuedTokens = scala.collection.mutable.Map[String, Long]()
    private var tokensIssued = 0
    private var unauthorized = 0
    private var echoPageToken = false

    def port: Int = hs.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"
    def stop(): Unit = hs.stop(0)

    /** Reject the next `n` requests with `code` before processing —
      * optionally only requests of one HTTP `method` (so a spec can fault
      * the commit POST without starving the fetch GETs around it). */
    def failNext(n: Int, code: Int = 503,
                 method: Option[String] = None): Unit =
      lock.synchronized {
        failNextN = n; failNextCode = code; failNextMethod = method
      }

    /** APPLY the next `n` commit POSTs, then answer 503 — the
      * committed-but-response-lost ambiguity. With `race = true`, a
      * RACING WRITER also lands before the client can recover (modeled as
      * a rebase carrying the committed content forward, what a real
      * racing append does): the table advances TWO versions past the
      * client's base, so a bare version compare misreads the client's own
      * landed commit as a plain lost race. */
    def failAfterCommit(n: Int, race: Boolean = false): Unit =
      lock.synchronized { failAfterCommitN = n; raceAfterCommit = race }

    /** Requests served so far (pagination specs count page fetches). */
    def requestCount: Int = lock.synchronized(requests)

    /** Invalidate every OAuth token issued so far — the mid-run token
      * EXPIRY injector: the client's next request gets 401 and must run
      * its refresh-then-retry path (a fresh exchange issues a new one). */
    def expireTokens(): Unit = lock.synchronized(issuedTokens.clear())

    /** Token exchanges served so far (the refresh specs count them). */
    def tokenCount: Int = lock.synchronized(tokensIssued)

    /** 401s served by the AUTH GATE so far (not the token endpoint's own
      * invalid-credential rejections) — the proactive-refresh spec pins
      * this to zero across a run spanning several token lifetimes. */
    def unauthorizedCount: Int = lock.synchronized(unauthorized)

    /** Make list routes echo the SAME next-page-token forever — the
      * non-progressing-server bug the client's pagination guard must
      * abort on instead of hanging. */
    def echoPageTokens(): Unit = lock.synchronized { echoPageToken = true }

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def dec(s: String): String =
      java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

    private def queryParams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val i = kv.indexOf('=')
          dec(kv.take(i)) -> dec(kv.drop(i + 1))
        }.toMap

    /** One page of `items`: the slice at the offset the pageToken encodes,
      * plus `next-page-token` when more remain — the OpenAPI contract. */
    private def page(ex: HttpExchange, items: Seq[String],
                     render: Seq[String] => String): Unit = {
      val params = queryParams(ex)
      val size = params.get("pageSize").flatMap(_.toIntOption).getOrElse(100)
      val off = params.get("pageToken").flatMap(_.toIntOption).getOrElse(0)
      val slice = items.slice(off, off + size)
      // the last page carries an EXPLICIT null token (the OpenAPI marks it
      // nullable and real servers emit it) — a client reading NullNode's
      // asText as the string "null" would loop forever
      val next =
        if (lock.synchronized(echoPageToken))
          ""","next-page-token":"0"""" // the non-progressing-server bug
        else if (off + size < items.size)
          s""","next-page-token":"${off + size}""""
        else ""","next-page-token":null"""
      reply(ex, 200, s"{${render(slice)}$next}")
    }

    private[RestCatalogStub] def handle(ex: HttpExchange): Unit = try {
      val method = ex.getRequestMethod
      // RAW path: URI.getPath percent-decodes, and dec() below decodes
      // exactly once — decoding twice would corrupt names containing '+'
      // or '%' (the client sends RFC 3986 segment encoding)
      val parts = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty)
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      lock.synchronized { requests += 1 }
      // the token endpoint sits OUTSIDE the auth gate (it is how a client
      // GETS a token): POST /v1/oauth/tokens, form-encoded
      // client-credentials grant per the Iceberg REST spec
      if (method == "POST" &&
          parts.toList == List("v1", "oauth", "tokens")) {
        val form = body.split("&").filter(_.contains("=")).map { kv =>
          val i = kv.indexOf('=')
          dec(kv.take(i)) -> dec(kv.drop(i + 1))
        }.toMap
        val ok = form.get("grant_type").contains("client_credentials") &&
          form.get("client_id").exists(id =>
            oauthClients.get(id) == form.get("client_secret"))
        if (!ok) {
          reply(ex, 401, """{"error":"invalid_client"}""")
          return
        }
        val tok = lock.synchronized {
          tokensIssued += 1
          val t = s"oat-$tokensIssued"
          issuedTokens(t) = System.currentTimeMillis() + tokenTtlMs
          t
        }
        reply(ex, 200, s"""{"access_token":"$tok","token_type":"bearer",""" +
          s""""expires_in":${math.max(1L, tokenTtlMs / 1000)}}""")
        return
      }
      // auth gate first: a real catalog rejects before routing. Accepted:
      // the static required token, or any UNEXPIRED issued OAuth token.
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val authOk = lock.synchronized {
        val now = System.currentTimeMillis()
        val accepted = requiredToken.toSet ++
          issuedTokens.collect { case (t, exp) if exp > now => t }
        accepted.isEmpty && oauthClients.isEmpty ||
          accepted.exists(t => auth.contains(s"Bearer $t"))
      }
      if (!authOk) {
        lock.synchronized { unauthorized += 1 }
        reply(ex, 401, """{"error":"missing or invalid bearer token"}""")
        return
      }
      // transient-fault injector: reject BEFORE touching any state
      val injected = lock.synchronized {
        if (failNextN > 0 && failNextMethod.forall(_ == method)) {
          failNextN -= 1; Some(failNextCode)
        } else None
      }
      if (injected.isDefined) {
        reply(ex, injected.get, """{"error":"injected transient failure"}""")
        return
      }
      (method, parts.toList) match {
        // POST /v1/namespaces {"namespace": ["ns"]}
        case ("POST", "v1" :: "namespaces" :: Nil) =>
          val ns = mapper.readTree(body).get("namespace").get(0).asText()
          lock.synchronized {
            if (namespaces.add(ns)) reply(ex, 200, "{}")
            else reply(ex, 409, """{"error":"namespace exists"}""")
          }
        // GET /v1/namespaces — paginated list
        case ("GET", "v1" :: "namespaces" :: Nil) =>
          val items = lock.synchronized(namespaces.toSeq.sorted)
          page(ex, items, slice => s""""namespaces":[${slice
            .map(n => s"""[${quote(n)}]""").mkString(",")}]""")
        // DELETE /v1/namespaces/{ns}
        case ("DELETE", "v1" :: "namespaces" :: ns :: Nil) =>
          lock.synchronized {
            val n = dec(ns)
            val had = namespaces.remove(n)
            tables.keys.filter(_._1 == n).toSeq.foreach(tables.remove)
            reply(ex, if (had) 200 else 404, "{}")
          }
        // GET /v1/namespaces/{ns}/tables — paginated list
        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
          val n = dec(ns)
          val items = lock.synchronized(
            tables.keys.filter(_._1 == n).map(_._2).toSeq.sorted)
          page(ex, items, slice => s""""identifiers":[${slice.map(t =>
            s"""{"namespace":[${quote(n)}],"name":${quote(t)}}""")
            .mkString(",")}]""")
        // DELETE /v1/namespaces/{ns}/tables/{t}
        case ("DELETE", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          lock.synchronized {
            val had = tables.remove((dec(ns), dec(t))).isDefined
            reply(ex, if (had) 204 else 404, "{}")
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
              if (failAfterCommitN > 0) {
                // the ambiguity injector: state IS committed, response lost
                failAfterCommitN -= 1
                if (raceAfterCommit) // a racing rebase lands on top, too
                  tables.update(key, (cur + 2, meta))
                reply(ex, 503, """{"error":"injected post-commit failure"}""")
              } else reply(ex, 200, s"""{"metadata-version":${cur + 1}}""")
            }
          }
        case _ => reply(ex, 404, """{"error":"no such route"}""")
      }
    } catch {
      case e: Exception =>
        reply(ex, 500, s"""{"error":"${e.getMessage}"}""")
    }

    private def quote(s: String): String = mapper.writeValueAsString(s)
  }

  def start(requiredToken: Option[String] = None,
            oauthClients: Map[String, String] = Map.empty,
            tokenTtlMs: Long = 60000L): Server = {
    val hs = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val server = new Server(hs, requiredToken, oauthClients, tokenTtlMs)
    hs.createContext("/", (ex: HttpExchange) => server.handle(ex))
    // a small pool so racing clients actually overlap on the server
    hs.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    hs.start()
    server
  }
}
