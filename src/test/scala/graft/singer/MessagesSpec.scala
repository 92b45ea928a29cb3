package graft.singer

import org.scalatest.funsuite.AnyFunSuite

class MessagesSpec extends AnyFunSuite {
  import SingerMessage._

  test("SCHEMA decodes stream, schema text, key_properties") {
    val m = decode("""{"type":"SCHEMA","stream":"events",
      "schema":{"properties":{"id":{"type":["integer"]}}},
      "key_properties":["id"]}""".replaceAll("\n\\s*", ""))
    val s = m.get.asInstanceOf[Schema]
    assert(s.stream == "events" && s.keyProperties == Seq("id"))
    assert(SchemaConv.toStructType(s.schemaJson).fieldNames.sameElements(Array("id")))
  }

  test("RECORD keeps raw record JSON") {
    val m = decode("""{"type":"RECORD","stream":"events","record":{"id":7,"v":1.5}}""")
    val r = m.get.asInstanceOf[Record]
    assert(r.stream == "events" && r.recordJson.contains("\"id\":7"))
  }

  test("STATE carries value payload; ACTIVATE_VERSION carries version") {
    assert(decode("""{"type":"STATE","value":{"bookmarks":{}}}""")
      .get.asInstanceOf[State].valueJson.contains("bookmarks"))
    val av = decode("""{"type":"ACTIVATE_VERSION","stream":"s","version":3}""")
      .get.asInstanceOf[ActivateVersion]
    assert(av.stream == "s" && av.version == 3L)
  }

  test("BATCH decodes stream, encoding, and manifest (SDK 0.34 surface)") {
    val m = SingerMessage.decode(
      """{"type":"BATCH","stream":"users","encoding":{"format":"jsonl",
        |"compression":"gzip"},"manifest":["file:///tmp/a.jsonl.gz",
        |"file:///tmp/b.jsonl.gz"]}""".stripMargin.replaceAll("\n", ""))
    assert(m == Some(SingerMessage.Batch("users", "jsonl", "gzip",
      Seq("file:///tmp/a.jsonl.gz", "file:///tmp/b.jsonl.gz"))))
    // encoding defaults: jsonl / none
    val bare = SingerMessage.decode(
      """{"type":"BATCH","stream":"u","manifest":["/x.jsonl"]}""")
    assert(bare == Some(SingerMessage.Batch("u", "jsonl", "none", Seq("/x.jsonl"))))
    // a BATCH without a stream is invalid -> ignored
    assert(SingerMessage.decode("""{"type":"BATCH","manifest":[]}""").isEmpty)
  }

  test("unknown types, blank and garbled lines are ignored (Singer spec)") {
    assert(decode("""{"type":"BATCH","stuff":1}""").isEmpty)
    assert(decode("").isEmpty)
    assert(decode("not json at all").isEmpty)
    assert(decode("""{"no_type":true}""").isEmpty)
  }

  test("decode NEVER throws — any byte salad yields Some or None") {
    // the load path runs decode on untrusted tap output inside executors;
    // one thrown exception fails the whole Spark stage, so total-ness is a
    // hard contract, pinned over adversarial + random inputs
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val adversarial = Seq(
      "{", "}", "[]", "null", "0", "\"\"", "{\"type\":null}",
      "{\"type\":7}", "{\"type\":\"RECORD\"}", "{\"type\":\"SCHEMA\"}",
      "{\"type\":\"RECORD\",\"stream\":null,\"record\":null}",
      "{\"type\":\"ACTIVATE_VERSION\",\"stream\":\"s\",\"version\":\"x\"}",
      "{\"type\":\"RECORD\"\u0000}", // control byte INSIDE json (not trimmable)
      new String(Array.fill(10000)('{')))
    adversarial.foreach(l => decode(l)) // must not throw
    // deterministic sampling loop (no scalatest-scalacheck bridge on the
    // offline classpath), same idiom as SchemaConvProps
    (0 until 500).foreach { i =>
      Gen.asciiStr(Gen.Parameters.default, Seed(i.toLong)).foreach(decode)
    }
  }
}
