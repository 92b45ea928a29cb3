package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Config surface contract: same keys/required-ness/defaults as the
  * reference's config_jsonschema (target.py:15-59), fail-fast validation. */
class TargetConfigSpec extends AnyFunSuite {
  private val full =
    """{"aws_access_key_id":"k","aws_secret_access_key":"s",
      |"s3_endpoint":"http://localhost:9000","iceberg_rest_uri":"http://c",
      |"iceberg_catalog_name":"cat","iceberg_catalog_namespace_name":"ns"}"""
      .stripMargin.replaceAll("\n", "")

  test("all required keys present -> parses with reference defaults") {
    val cfg = TargetConfig.fromJson(full).toOption.get
    assert(!cfg.addRecordMetadata)          // default false (target.py:16)
    assert(cfg.s3Bucket == "lakehouse")     // default (target.py:38)
    assert(cfg.batchSize == 10000)          // sinks.py:18
    assert(!cfg.flatteningEnabled && cfg.streamMaps.isEmpty)
  }

  test("every missing required key is reported, fail-fast style") {
    TargetConfig.fromJson("""{"s3_endpoint":"e"}""") match {
      case Left(errors) =>
        assert(errors.size == 5)
        assert(errors.exists(_.contains("aws_access_key_id")))
        assert(errors.exists(_.contains("iceberg_catalog_namespace_name")))
      case Right(_) => fail("must not validate")
    }
  }

  test("malformed JSON and non-object configs are rejected") {
    assert(TargetConfig.fromJson("{nope").isLeft)
    assert(TargetConfig.fromJson("[1,2]").isLeft)
    assert(TargetConfig.fromJson("""{"batch_size":-1}""").isLeft)
  }

  test("s3aHadoopConf maps config -> fs.s3a.* (the reference's FileIO " +
    "wiring, sinks.py:55-65); custom endpoints force path-style access") {
    // MinIO-style endpoint: creds + endpoint + path-style
    val minio = TargetConfig.fromJson(full).toOption.get.s3aHadoopConf
    assert(minio == Map(
      "fs.s3a.access.key" -> "k",
      "fs.s3a.secret.key" -> "s",
      "fs.s3a.endpoint" -> "http://localhost:9000",
      "fs.s3a.path.style.access" -> "true"), minio)
    // real AWS endpoint: virtual-hosted style stays (no path-style key)
    val aws = TargetConfig.fromJson(full.replace("http://localhost:9000",
        "s3.eu-central-1.amazonaws.com")).toOption.get.s3aHadoopConf
    assert(!aws.contains("fs.s3a.path.style.access") &&
      aws("fs.s3a.endpoint") == "s3.eu-central-1.amazonaws.com", aws)
    // the pairs are valid spark.hadoop.* session conf (what GraftTarget
    // sets): assert the round trip through a session builder-style map
    assert(minio.keys.forall(_.startsWith("fs.s3a.")))
  }

  test("path-style heuristic recognizes AWS partition suffixes and the " +
    "s3_path_style key overrides it both ways (ADVICE r12)") {
    // *.amazonaws.com.cn is an AWS partition: no forced path-style
    val cn = TargetConfig.fromJson(full.replace("http://localhost:9000",
        "https://s3.cn-north-1.amazonaws.com.cn")).toOption.get.s3aHadoopConf
    assert(!cn.contains("fs.s3a.path.style.access"), cn)
    // port/scheme don't confuse the host check
    val port = TargetConfig.fromJson(full.replace("http://localhost:9000",
        "https://s3.us-east-1.amazonaws.com:443/")).toOption.get.s3aHadoopConf
    assert(!port.contains("fs.s3a.path.style.access"), port)
    // explicit override: a virtual-host-only non-AWS gateway opts OUT
    val vhost = TargetConfig.fromJson(full.dropRight(1) +
      ""","s3_path_style":false}""").toOption.get.s3aHadoopConf
    assert(vhost("fs.s3a.path.style.access") == "false", vhost)
    // ... and an AWS-suffixed proxy can opt IN
    val proxied = TargetConfig.fromJson(full
      .replace("http://localhost:9000", "s3.eu-west-1.amazonaws.com")
      .dropRight(1) + ""","s3_path_style":true}""").toOption.get.s3aHadoopConf
    assert(proxied("fs.s3a.path.style.access") == "true", proxied)
  }

  test("stream_maps parse: drop / derive / filter / alias") {
    val json = full.dropRight(1) +
      ""","stream_maps":{"ev":{"secret":null,"vv":"v * 2",
        |"__filter__":"id > 1","__alias__":"ev_mapped"}}}"""
        .stripMargin.replaceAll("\n", "")
    val cfg = TargetConfig.fromJson(json).toOption.get
    val m = cfg.streamMaps("ev")
    assert(m.columns("secret").isEmpty)
    assert(m.columns("vv").contains("v * 2"))
    assert(m.filter.contains("id > 1"))
    assert(m.alias.contains("ev_mapped"))
  }
}
