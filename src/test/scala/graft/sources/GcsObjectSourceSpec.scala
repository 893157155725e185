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
