package graft.sources

import graft.SparkSpec
import graft.ingest.Pipeline
import graft.rules.{EventRule, Rules, SchemaRule}
import graft.schema.SchemaRegistry

/** ENV-GATED live test for the `gs://` object-source path — the same
  * gating discipline as the reference's live-infra tests
  * (`/root/reference/pkg/usecase/load_test.go:23-46`: skip unless the
  * `TEST_*` env names a real bucket/table). `ObjectSource` and the
  * ingest stream list and read exclusively through the Hadoop
  * `FileSystem` API, so a `gs://` glob needs only classpath + conf:
  *
  *   - `gcs-connector-hadoop3` (shaded) on the Spark classpath,
  *   - `spark.hadoop.fs.gs.impl =
  *     com.google.cloud.hadoop.fs.GoogleHadoopFileSystem`,
  *   - `spark.hadoop.google.cloud.auth.type = APPLICATION_DEFAULT`.
  *
  * Set `GRAFT_GCS_TEST_BUCKET=<bucket>` (with `<bucket>/graft-test/`
  * holding at least one `*.json` NDJSON object) to run; unset, the
  * suite CANCELS — recorded as canceled, never silently green. */
class GcsObjectSourceSpec extends SparkSpec {

  private val bucket = sys.env.get("GRAFT_GCS_TEST_BUCKET")

  test("gs:// glob lists and ingests hermetically (in-JVM FileSystem for the scheme)") {
    // register the fake exactly as the production connector registers
    // itself; the seam under test is everything ABOVE FileSystem —
    // glob expansion, listing metadata, NDJSON open/decode, the rule
    // router — with true gs://bucket/... URIs end to end
    spark.sparkContext.hadoopConfiguration
      .set("fs.gs.impl", classOf[FakeGcsFileSystem].getName)
    val dir = tmpDir("fake-gcs")
    writeFile(dir, "a.json", """{"event_id": 1, "ts": 1714550400.5}""" + "\n" +
      """{"event_id": 2, "ts": 1714550401.5}""" + "\n")
    writeFile(dir, "b.json", """{"event_id": 3, "ts": 1714550402.5}""" + "\n")
    writeFile(dir, "skip.txt", "not routed\n")
    val glob = s"gs://fake-bucket$dir/*.json"

    val listed = ObjectSource.list(spark, glob)
    assert(listed.count() == 2, "glob must match exactly the two .json objects")
    val row = listed.orderBy("name").head()
    assert(row.getAs[String]("bucket") == "gs://fake-bucket")
    assert(row.getAs[String]("name") == s"$dir/a.json")
    assert(row.getAs[Long]("size") > 0)

    val rules = Rules(
      event = Seq(EventRule(name = "all", when = "name LIKE '%.json'",
        schemaRule = "ev")),
      schema = Seq(SchemaRule(name = "ev", dataset = "'gcs'", table = "'t'",
        timestamp = "ts", id = Some("cast(event_id as string)"))))
    val registry = new SchemaRegistry(tmpDir("fake-gcs-wh"))
    val res = Pipeline.ingestPrefix(spark,
      Pipeline.Config(registry, rules), glob)
    assert(res.results.forall(_.success), s"gs:// ingest failed: ${res.results}")
    val out = graft.ingest.TableSink.read(spark, registry, "gcs", "t")
    assert(out.count() == 3, "all three events across the two objects land")
  }

  test("gs:// glob lists and ingests through the Hadoop FileSystem seam") {
    assume(bucket.isDefined,
      "GRAFT_GCS_TEST_BUCKET unset — gs:// live test canceled (sandbox)")
    val glob = s"gs://${bucket.get}/graft-test/*.json"
    val listed = ObjectSource.list(spark, glob)
    assert(listed.count() > 0, s"no objects under $glob")
    assert(listed.columns.contains("size"))
    val rules = Rules(
      event = Seq(EventRule(name = "all", when = "name LIKE '%.json'",
        schemaRule = "ev")),
      schema = Seq(SchemaRule(name = "ev", dataset = "'gcs'", table = "'t'",
        timestamp = "ts")))
    val registry = new SchemaRegistry(tmpDir("gcs-wh"))
    val res = Pipeline.ingestPrefix(spark,
      Pipeline.Config(registry, rules), glob)
    assert(res.results.forall(_.success), s"gs:// ingest failed: ${res.results}")
  }
}
