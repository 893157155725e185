package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DistributedInferenceSpec extends SparkSpec {
  import spark.implicits._

  /** read.json's inference (the reference typing) on the same docs. */
  private def sparkInfer(docs: Seq[String]): StructType =
    spark.read.option("dropFieldIfAllNull", "true")
      .json(docs.toDS()).schema

  private def check(docs: Seq[String]): Unit = {
    val dist = DistributedInference.inferJson(docs.toDS())
    assert(dist == sparkInfer(docs),
      s"dist=$dist\nspark=${sparkInfer(docs)}\ndocs=$docs")
  }

  test("typing parity with read.json: scalars, nesting, arrays, nulls, widening") {
    check(Seq("""{"a":1,"b":"x","c":true,"d":1.5}"""))
    // heterogeneous docs widen + union fields; all-null field dropped
    check(Seq(
      """{"color":"red","n":1,"dead":null}""",
      """{"color":"blue","n":2.5,"dead":null}""",
      """{"size":{"w":3,"h":4},"color":"green"}"""))
    // nested arrays of structs, empty arrays pruned, field order sorted
    check(Seq(
      """{"z":1,"a":{"q":[{"x":1},{"y":"s"}],"empty":[]}}""",
      """{"a":{"q":[{"x":2.0}]},"z":9}"""))
    // top-level array docs contribute one record per element
    check(Seq("""[{"v":1},{"v":2,"w":"s"}]""", """{"v":3.5}"""))
    // conflicting types fall back to string
    check(Seq("""{"v":{"x":1}}""", """{"v":[1,2]}"""))
    check(Seq("""{"v":1}""", """{"v":"s"}"""))
    // beyond-long integers: smallest containing decimal, like read.json
    check(Seq("""{"v":99999999999999999999}"""))
    check(Seq("""{"v":1}""", """{"v":99999999999999999999}"""))
  }

  test("partition count does not change the result (merge laws hold)") {
    val docs = (0 until 200).map { i =>
      if (i % 3 == 0) s"""{"a":$i,"b":"s$i"}"""
      else if (i % 3 == 1) s"""{"a":${i + 0.5},"c":{"d":[$i]}}"""
      else s"""{"b":null,"c":{"e":true}}"""
    }
    val one = DistributedInference.inferJson(docs.toDS().repartition(1))
    val many = DistributedInference.inferJson(docs.toDS().repartition(17))
    assert(one == many)
    assert(one == sparkInfer(docs))
  }

  test("e2e ingest with distributedInference=true matches the default path") {
    import graft.ingest.{Pipeline, TableSink}
    import graft.rules._
    val landing = tmpDir("di-landing")
    writeFile(landing, "a.log",
      """{"log_id":"a1","event_time":1559347200.25,"user":"u1","n":1,"tags":["x","y"]}
        |{"log_id":"a2","event_time":1559347201.5,"user":"u2","nested":{"k":2}}
        |""".stripMargin)
    val rules = Rules(
      event = Seq(EventRule(name = "l", when = "name LIKE '%.log'", schemaRule = "l")),
      schema = Seq(SchemaRule(name = "l", dataset = "'di'", table = "'t'",
        id = Some("log_id"), timestamp = "event_time")))
    def ingest(dist: Boolean, wh: String) = {
      val reg = new SchemaRegistry(wh)
      Pipeline.ingestPrefix(spark,
        Pipeline.Config(reg, rules, distributedInference = dist), s"$landing/*")
      val rows = TableSink.read(spark, reg, "di", "t")
        .drop("ingest_id", "ingested_at").orderBy("id")
      (rows.schema, rows.collect().toSeq)
    }
    val (s1, r1) = ingest(dist = false, tmpDir("di-wh1"))
    val (s2, r2) = ingest(dist = true, tmpDir("di-wh2"))
    assert(s1 == s2, s"schemas differ:\n$s1\n$s2")
    assert(r1 == r2)
  }
}
