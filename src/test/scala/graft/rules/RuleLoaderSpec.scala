package graft.rules

import graft.SparkSpec

class RuleLoaderSpec extends SparkSpec {

  private val eventJson = """{
    "event": [
      { "name": "logs", "when": "name LIKE '%.log'", "schemaRule": "access",
        "compress": "gzip" },
      { "name": "trails", "when": "startswith(name, 'trail/')",
        "schemaRule": "cloudtrail", "multiDoc": true } ]
  }"""

  private val schemaJson = """{
    "schema": [
      { "name": "access", "dataset": "'logs'", "table": "'access'",
        "partition": "day", "timestamp": "ts",
        "transforms": [ { "op": "drop", "path": "secret" },
                        { "op": "rename", "from": "u", "to": "user" },
                        { "op": "set", "name": "ms", "expr": "latency * 1000" } ] },
      { "name": "cloudtrail", "dataset": "'audit'", "table": "'trail'",
        "timestamp": "eventTime", "explodePath": "Records",
        "id": "eventID", "when": "eventName IS NOT NULL" } ]
  }"""

  test("fromJson parses event + schema rules with transforms") {
    val r = RuleLoader.fromJson(eventJson)
    assert(r.event.map(_.name) == Seq("logs", "trails"))
    assert(r.event.head.compress == "gzip" && !r.event.head.multiDoc)
    assert(r.event(1).multiDoc)
    val s = RuleLoader.fromJson(schemaJson)
    val access = s.schemaRule("access")
    assert(access.partition == "day")
    assert(access.transforms == Seq(DropField("secret"),
      RenameField("u", "user"), SetField("ms", "latency * 1000")))
    val ct = s.schemaRule("cloudtrail")
    assert(ct.explodePath.contains("Records") && ct.id.contains("eventID"))
  }

  test("fromDir merges files in filename order; validation still applies") {
    val dir = tmpDir("rules")
    writeFile(dir, "a_event.json", eventJson)
    writeFile(dir, "b_schema.json", schemaJson)
    val r = RuleLoader.fromDir(dir)
    assert(r.event.size == 2 && r.schema.size == 2)
    // invalid configs are rejected at load (ref validates on policy load)
    val bad = """{ "event": [ { "name": "x", "when": "1=1",
      "schemaRule": "s", "compress": "zip" } ] }"""
    intercept[IllegalArgumentException](RuleLoader.fromJson(bad))
    val missing = """{ "schema": [ { "name": "x", "dataset": "'d'" } ] }"""
    intercept[RuntimeException](RuleLoader.fromJson(missing))
  }

  test("loaded rules drive a real ingest end-to-end") {
    import spark.implicits._
    import graft.ingest.{Pipeline, TableSink}
    import graft.schema.SchemaRegistry
    val work = tmpDir("ruleload-e2e")
    writeFile(work, "rules/all.json", """{
      "event": [ { "name": "ndjson", "when": "name LIKE '%.json'",
                   "schemaRule": "ev" } ],
      "schema": [ { "name": "ev", "dataset": "'d'", "table": "'t'",
                    "timestamp": "ts",
                    "transforms": [ { "op": "set", "name": "v2", "expr": "v * 2" } ] } ]
    }""")
    writeFile(work, "landing/a.json",
      """{"ts":1700000000.0,"v":1}
{"ts":1700000001.0,"v":2}""")
    val rules = RuleLoader.fromDir(s"$work/rules")
    val registry = new SchemaRegistry(s"$work/wh")
    Pipeline.ingestPaths(spark, Pipeline.Config(registry, rules),
      Seq(s"$work/landing/a.json"))
    val rows = TableSink.read(spark, registry, "d", "t")
      .selectExpr("data.v2").as[Long].collect().sorted
    assert(rows.toSeq == Seq(2L, 4L))
  }
}
