package graft.lake

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Production hardening of the REST carrier (VERDICT r10 #4): bearer-token
  * auth, transient-5xx retry with backoff, the commit lost-response
  * recovery protocol, and the paginated list routes — each driven against
  * [[RestCatalogStub]]'s auth enforcement and fault injectors over real
  * HTTP round-trips. */
class RestHardeningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType)))
  private def fastCat(server: RestCatalogStub.Server,
                      token: Option[String] = None): RestLakeCatalog =
    new RestLakeCatalog(spark, server.uri,
      Files.createTempDirectory("graft-rest-hard-"), token = token,
      retryBaseMs = 1L)

  test("auth: the bearer token rides every request; missing credentials " +
    "fail loudly and are NEVER retried") {
    val server = RestCatalogStub.start(requiredToken = Some("sekret-tok"))
    try {
      val before = server.requestCount
      val bad = fastCat(server, token = None)
      val ex = intercept[IllegalStateException](bad.ensureNamespace("authns"))
      assert(ex.getMessage.contains("401") &&
        ex.getMessage.contains("not retried"), ex.getMessage)
      assert(server.requestCount == before + 1,
        "an auth failure must not burn the retry budget")
      // wrong token is the same loud failure
      intercept[IllegalStateException](
        fastCat(server, token = Some("wrong")).ensureNamespace("authns"))
      // the right token runs the full lifecycle
      val good = fastCat(server, token = Some("sekret-tok"))
      good.ensureTable("authns", "t", schema)
      good.append("authns", "t", Seq(1L, 2L).toDF("id"))
      assert(good.load("authns", "t").count() == 2L)
      good.dropNamespace("authns")
    } finally server.stop()
  }

  test("transient 5xx on idempotent routes: retry with backoff, then " +
    "succeed; a persistent 5xx still fails loudly") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      cat.ensureTable("t5", "t", schema)
      cat.append("t5", "t", Seq(7L).toDF("id"))
      server.failNext(3, code = 503) // under the 4-retry budget
      assert(cat.load("t5", "t").collect().map(_.getLong(0)).toSeq ==
        Seq(7L), "three 503s must be absorbed by the retry loop")
      server.failNext(20, code = 503) // beyond any budget
      val ex = intercept[IllegalStateException](cat.load("t5", "t").count())
      assert(ex.getMessage.contains("503"), ex.getMessage)
      server.failNext(0)
      cat.dropNamespace("t5")
    } finally server.stop()
  }

  test("commit 5xx BEFORE the server applies: the re-send commits " +
    "exactly once") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      cat.ensureTable("pre", "t", schema)
      cat.append("pre", "t", Seq(1L).toDF("id"))
      // fault only the commit POST — the surrounding fetch GETs must flow
      server.failNext(2, code = 503, method = Some("POST"))
      cat.append("pre", "t", Seq(2L).toDF("id"))
      assert(cat.load("pre", "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L), "the re-sent commit must land exactly once")
      assert(cat.snapshotIds("pre", "t").size == 2)
      cat.dropNamespace("pre")
    } finally server.stop()
  }

  test("commit applied but the response lost: the recovery protocol " +
    "reports success WITHOUT double-committing") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      cat.ensureTable("amb", "t", schema)
      cat.append("amb", "t", Seq(1L).toDF("id"))
      // the server APPLIES the next commit, then answers 503: a blind
      // re-send would read its own 409 as a lost race, re-derive on top
      // of itself, and append the same snapshot dir twice
      server.failAfterCommit(1)
      cat.append("amb", "t", Seq(2L).toDF("id"))
      assert(cat.load("amb", "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L), "rows must not duplicate on commit recovery")
      assert(cat.snapshotIds("amb", "t").size == 2,
        "exactly one snapshot per append, recovery included")
      // the carrier stays healthy: the NEXT commit proceeds normally
      cat.append("amb", "t", Seq(3L).toDF("id"))
      assert(cat.load("amb", "t").count() == 3L)
      cat.dropNamespace("amb")
    } finally server.stop()
  }

  test("commit applied, response lost, AND a racing writer lands before " +
    "recovery: the freshMark still proves our commit — no double-append") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      cat.ensureTable("amb2", "t", schema)
      cat.append("amb2", "t", Seq(1L).toDF("id"))
      // the table advances TWO versions past our base (our commit + a
      // racing rebase): a bare version compare reads this as a plain
      // lost race, re-derives on top of our own landed commit, and
      // appends the same snapshot dir twice
      server.failAfterCommit(1, race = true)
      cat.append("amb2", "t", Seq(2L).toDF("id"))
      assert(cat.load("amb2", "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L), "rows must not duplicate under recovery-with-race")
      assert(cat.snapshotIds("amb2", "t").size == 2,
        "exactly one snapshot per append, raced recovery included")
      cat.dropNamespace("amb2")
    } finally server.stop()
  }

  test("paginated list routes: the client follows next-page-token to " +
    "completion, in |items|/pageSize round-trips") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      val nss = (1 to 7).map(i => f"pag_ns$i%02d")
      nss.foreach(cat.ensureNamespace)
      (1 to 5).foreach(i => cat.ensureTable("pag_ns01", f"t$i%02d", schema))
      val before = server.requestCount
      assert(cat.listNamespaces(pageSize = 3) == nss,
        "every namespace surfaces across pages, in order")
      assert(server.requestCount == before + 3,
        "7 items at pageSize 3 = exactly 3 page fetches")
      assert(cat.listTables("pag_ns01", pageSize = 2) ==
        (1 to 5).map(i => f"t$i%02d"))
      nss.foreach(cat.dropNamespace)
    } finally server.stop()
  }

  test("pagination progress guard: a server echoing the same " +
    "next-page-token aborts loudly instead of hanging") {
    val server = RestCatalogStub.start()
    try {
      val cat = fastCat(server)
      (1 to 4).foreach(i => cat.ensureNamespace(s"echo_ns$i"))
      server.echoPageTokens()
      val ex = intercept[IllegalStateException](
        cat.listNamespaces(pageSize = 2))
      assert(ex.getMessage.contains("not progressing"), ex.getMessage)
    } finally server.stop()
  }

  test("OAuth2 client-credentials (VERDICT r11 #6): the token exchange " +
    "gates the lifecycle; a mid-run expiry refreshes ONCE and retries") {
    val server = RestCatalogStub.start(
      oauthClients = Map("graft-client" -> "s3cr3t"))
    try {
      val cat = new RestLakeCatalog(spark, server.uri,
        Files.createTempDirectory("graft-rest-oauth-"),
        retryBaseMs = 1L, credential = Some("graft-client:s3cr3t"))
      // full lifecycle through the exchanged bearer (no static token)
      cat.ensureTable("oans", "t", schema)
      cat.append("oans", "t", Seq(1L, 2L).toDF("id"))
      assert(cat.load("oans", "t").count() == 2L)
      assert(server.tokenCount == 1,
        "one exchange serves the whole session — the token is cached")
      // EXPIRY mid-run: the next request 401s, the client refreshes once
      // and retries — the lifecycle continues seamlessly
      server.expireTokens()
      cat.append("oans", "t", Seq(3L).toDF("id"))
      assert(cat.load("oans", "t").count() == 3L)
      assert(server.tokenCount == 2,
        "the 401 must trigger exactly one re-exchange")
      cat.dropNamespace("oans")
    } finally server.stop()
  }

  test("OAuth2 PROACTIVE refresh (VERDICT r12 #3): short-lived tokens are " +
    "re-exchanged ahead of expiry — a multi-lifetime run serves ZERO " +
    "401s; the 401 fallback still covers early server-side revocation") {
    // 2 s server-side TTL, advertised as expires_in=2; the client
    // schedules its re-exchange at 80% of that (1.6 s)
    val server = RestCatalogStub.start(
      oauthClients = Map("graft-client" -> "s3cr3t"), tokenTtlMs = 2000L)
    try {
      val cat = new RestLakeCatalog(spark, server.uri,
        Files.createTempDirectory("graft-rest-oauth-proactive-"),
        retryBaseMs = 1L, credential = Some("graft-client:s3cr3t"))
      cat.ensureTable("oap", "t", schema)
      // a load spanning several token lifetimes: one request per ~1.1 s
      // for ~4.4 s (> 2 full lifetimes past the first token)
      (1L to 4L).foreach { i =>
        cat.append("oap", "t", Seq(i).toDF("id"))
        Thread.sleep(1100)
      }
      assert(cat.load("oap", "t").count() == 4L)
      assert(server.unauthorizedCount == 0,
        s"proactive refresh must beat expiry — the auth gate served " +
          s"${server.unauthorizedCount} 401s")
      assert(server.tokenCount >= 2 && server.tokenCount <= 5,
        s"expected ~1 exchange per lifetime, got ${server.tokenCount}")
      cat.dropNamespace("oap")
    } finally server.stop()
  }

  test("OAuth2 bad credential: the token endpoint's rejection is loud " +
    "and never retried; a wrong mid-run refresh fails loudly too") {
    val server = RestCatalogStub.start(
      oauthClients = Map("graft-client" -> "s3cr3t"))
    try {
      val before = server.requestCount
      val bad = new RestLakeCatalog(spark, server.uri,
        Files.createTempDirectory("graft-rest-oauth-bad-"),
        retryBaseMs = 1L, credential = Some("graft-client:WRONG"))
      val ex = intercept[IllegalStateException](bad.ensureNamespace("oa2"))
      assert(ex.getMessage.contains("401") &&
        ex.getMessage.contains("not retried"), ex.getMessage)
      assert(server.requestCount == before + 1,
        "a rejected exchange must not burn the retry budget")
      // a STATIC token is never refreshed: 401 stays fatal even when a
      // credential could have been exchanged
      val staticCat = new RestLakeCatalog(spark, server.uri,
        Files.createTempDirectory("graft-rest-oauth-static-"),
        token = Some("stale"), retryBaseMs = 1L,
        credential = Some("graft-client:s3cr3t"))
      intercept[IllegalStateException](staticCat.ensureNamespace("oa3"))
      assert(server.tokenCount == 0, "static token must shadow the flow")
    } finally server.stop()
  }
}
