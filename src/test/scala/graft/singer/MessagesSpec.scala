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

  test("unknown types, blank and garbled lines are ignored (Singer spec)") {
    assert(decode("""{"type":"BATCH","stuff":1}""").isEmpty)
    assert(decode("").isEmpty)
    assert(decode("not json at all").isEmpty)
    assert(decode("""{"no_type":true}""").isEmpty)
  }
}
