package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableBackend}

/** Contract test for the storage seam: the engine (TableSink) must be
  * drivable through ANY [[TableBackend]] — the deployment story is "swap
  * the backend, never edit the engine" (ref: usecase-vs-infra split,
  * `pkg/infra/bq/client.go`). A delegating backend records every call so
  * the spec can assert the engine touches ONLY the trait surface and in
  * the right order (DDL before data). */
class TableBackendSpec extends SparkSpec {

  /** Wraps the parquet registry, recording the call sequence. */
  private final class Recording(inner: SchemaRegistry) extends TableBackend {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    def exists(ds: String, t: String): Boolean =
      { calls += s"exists:$ds.$t"; inner.exists(ds, t) }
    def currentSchema(ds: String, t: String): Option[(Int, StructType)] =
      { calls += s"schema:$ds.$t"; inner.currentSchema(ds, t) }
    def createOrUpdate(ds: String, t: String, in: StructType): StructType =
      { calls += s"ddl:$ds.$t"; inner.createOrUpdate(ds, t, in) }
    def appendPartitioned(ds: String, t: String, df: DataFrame): Unit =
      { calls += s"append:$ds.$t"; inner.appendPartitioned(ds, t, df) }
    def readWithPart(s: SparkSession, ds: String, t: String): DataFrame =
      { calls += s"read:$ds.$t"; inner.readWithPart(s, ds, t) }
  }

  private def routed(n: Int, prefix: String = "id"): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (s"$prefix-$i", i))
      .toDF("rid", "v")
      .select(col("rid").as("id"), lit("ing").as("ingest_id"),
        expr("timestamp'2024-05-01 00:00:00'").as("timestamp"),
        current_timestamp().as("ingested_at"),
        struct(col("v")).as("data"),
        lit("d").as("dataset"), lit("t").as("table"), lit("day").as("partition"))
  }

  test("append drives only the trait: DDL before data, dedup reads via the trait") {
    val backend = new Recording(new SchemaRegistry(tmpDir("backend-rec")))
    val r1 = TableSink.append(spark, backend, routed(10), dedup = true)
    assert(r1.map(_.logCount) == Seq(10L))
    // first append: table absent → exists (dedup probe), then create,
    // then the data append — never data before DDL
    val first = backend.calls.toList
    assert(first.indexWhere(_.startsWith("ddl:")) <
      first.indexWhere(_.startsWith("append:")), s"DDL must precede data: $first")
    assert(first.count(_.startsWith("append:")) == 1)

    backend.calls.clear()
    // replay: dedup path must read existing ids THROUGH the trait and
    // append zero rows
    val r2 = TableSink.append(spark, backend, routed(10), dedup = true)
    assert(r2.map(_.logCount) == Seq(0L))
    assert(backend.calls.exists(_.startsWith("read:")),
      s"dedup must consult the backend's readWithPart: ${backend.calls}")
  }

  test("concurrent same-table appends are serialized — no batch lost to shared staging") {
    // the Hadoop committer does not support concurrent writers on one
    // path (job A's cleanup deletes job B's pending task outputs); the
    // registry serializes appends per table, so parallel streams
    // appending one table must all land
    val registry = new SchemaRegistry(tmpDir("backend-concurrent"))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 4).map { i =>
        Future(TableSink.append(spark, registry, routed(50, s"w$i")))
      }
      Await.result(Future.sequence(fs), 180.seconds)
    } finally pool.shutdown()
    val out = TableSink.read(spark, registry, "d", "t")
    assert(out.count() == 200L, "every concurrent batch must land")
    assert(out.select("id").distinct().count() == 200L)
  }

  test("schema evolution round-trips through a custom backend") {
    import spark.implicits._
    val backend = new Recording(new SchemaRegistry(tmpDir("backend-evolve")))
    def batch(withExtra: Boolean): DataFrame = {
      val base = Seq(("a", 1)).toDF("rid", "v")
      val data = if (withExtra) struct(col("v"), lit("x").as("extra"))
        else struct(col("v"))
      base.select(col("rid").as("id"), lit("i").as("ingest_id"),
        expr("timestamp'2024-05-02 00:00:00'").as("timestamp"),
        current_timestamp().as("ingested_at"), data.as("data"),
        lit("d").as("dataset"), lit("e").as("table"), lit("day").as("partition"))
    }
    TableSink.append(spark, backend, batch(withExtra = false))
    val r2 = TableSink.append(spark, backend, batch(withExtra = true))
    assert(r2.head.schemaVersion == 2, s"evolution must bump the version: $r2")
    val out = TableSink.read(spark, backend, "d", "e")
    assert(out.count() == 2)
    // old rows surface the evolved column as null
    assert(out.filter(col("data.extra").isNull).count() == 1)
  }
}
