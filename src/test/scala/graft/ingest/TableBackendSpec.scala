package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableBackend, TxLogBackend}

/** Contract test for the storage seam: the engine (TableSink) must be
  * drivable through ANY [[TableBackend]] — the deployment story is "swap
  * the backend, never edit the engine" (ref: usecase-vs-infra split,
  * `pkg/infra/bq/client.go`). The whole suite runs against BOTH shipped
  * backends — the parquet-dir [[SchemaRegistry]] and the transaction-log
  * [[TxLogBackend]] — so the contract is demonstrated, not asserted: a
  * backend with different commit machinery (CAS DDL, manifest appends)
  * passes the same suite the lock-based one does. A delegating backend
  * records every call so the spec can assert the engine touches ONLY the
  * trait surface and in the right order (DDL before data). */
class TableBackendSpec extends SparkSpec {

  /** Wraps any backend, recording the call sequence. */
  private final class Recording(inner: TableBackend) extends TableBackend {
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

  private val backends: Seq[(String, String => TableBackend)] = Seq(
    "parquet-registry" -> (dir => new SchemaRegistry(dir)),
    "tx-log" -> (dir => new TxLogBackend(dir)),
    // the connector-shaped backend: ETag-CAS DDL + Storage-Write-API
    // pending-stream commits against the in-sandbox emulator
    "bigquery-write" -> (dir =>
      new graft.schema.bigquery.BigQueryWriteBackend(
        new graft.schema.bigquery.BigQueryEmulator(dir))))

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

  for ((name, mk) <- backends) {

    test(s"[$name] append drives only the trait: DDL before data, dedup reads via the trait") {
      val backend = new Recording(mk(tmpDir(s"backend-rec-$name")))
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

    test(s"[$name] concurrent same-table appends all land — no batch lost") {
      // the registry serializes appends per table (shared Hadoop-committer
      // staging); the tx-log needs no lock (unique batch dirs + manifest
      // commits). Both must land every batch.
      val backend = mk(tmpDir(s"backend-concurrent-$name"))
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = (0 until 4).map { i =>
          Future(TableSink.append(spark, backend, routed(50, s"w$i")))
        }
        Await.result(Future.sequence(fs), 180.seconds)
      } finally pool.shutdown()
      val out = TableSink.read(spark, backend, "d", "t")
      assert(out.count() == 200L, "every concurrent batch must land")
      assert(out.select("id").distinct().count() == 200L)
    }

    test(s"[$name] schema evolution round-trips through the backend") {
      import spark.implicits._
      val backend = new Recording(mk(tmpDir(s"backend-evolve-$name")))
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

    test(s"[$name] full ingest pipeline (q33 path) lands identically") {
      import graft.rules._
      val landing = tmpDir(s"backend-pipe-$name")
      writeFile(landing, "access.log",
        """{"log_id": "a1", "event_time": 1559347200.25, "user": "u1", "ok": true}
          |{"log_id": "a2", "event_time": 1559347201.5, "user": "u2", "ok": false}
          |""".stripMargin)
      val backend = mk(tmpDir(s"backend-pipe-tables-$name"))
      val rules = Rules(
        event = Seq(EventRule(name = "access", when = "name LIKE '%.log'",
          schemaRule = "access")),
        schema = Seq(SchemaRule(name = "access",
          dataset = "'ds'", table = "'t'",
          id = Some("log_id"), timestamp = "event_time")))
      val res = Pipeline.ingestPrefix(spark,
        Pipeline.Config(backend, rules), s"$landing/*")
      assert(res.results.map(_.logCount) == Seq(2L))
      val out = TableSink.read(spark, backend, "ds", "t").orderBy("id")
      assert(out.collect().map(_.getString(0)).toSeq == Seq("a1", "a2"))
      assert(out.select("data.user").orderBy("data.user").collect()
        .map(_.getString(0)).toSeq == Seq("u1", "u2"))
    }
  }

  test("tx-log DDL is optimistic CAS: racing writers converge on the union schema") {
    import org.apache.spark.sql.types.{StringType, StructField}
    val backend = new TxLogBackend(tmpDir("txlog-cas"))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 8).map { i =>
        Future(backend.createOrUpdate("d", "cas",
          StructType(Seq(StructField(s"c$i", StringType)))))
      }
      Await.result(Future.sequence(fs), 60.seconds)
    } finally pool.shutdown()
    val Some((version, live)) = backend.currentSchema("d", "cas")
    // every writer's column survived every race (no lost update — the
    // CAS loser re-reads the winner's schema and re-merges)
    assert((0 until 8).forall(i => live.fieldNames.contains(s"c$i")),
      s"lost update: v$version $live")
    assert(version <= 8, "each CAS win bumps the version at most once")
  }

  test("tx-log staged-but-uncommitted batch is invisible (manifest IS the commit point)") {
    import spark.implicits._
    val root = tmpDir("txlog-orphan")
    val backend = new TxLogBackend(root)
    TableSink.append(spark, backend, routed(3))
    // fake a crash between stage and publish: a batch dir with no manifest
    val orphan = java.nio.file.Paths.get(root, "d", "t", "data", "batch-orphan")
    Seq(("zz", 9)).toDF("id", "v").withColumn("__part", lit("2024-05-01"))
      .write.partitionBy("__part").parquet(orphan.toString)
    assert(TableSink.read(spark, backend, "d", "t").count() == 3L,
      "unpublished batch dirs must be invisible to readers")
    // vacuum reclaims the orphan (it is older than a zero horizon) but
    // never a manifested dir — and the table reads the same after
    val deleted = backend.vacuum("d", "t", olderThanMs = 0L)
    assert(deleted == Seq("batch-orphan"), s"vacuum must take only orphans: $deleted")
    assert(!java.nio.file.Files.exists(orphan))
    assert(TableSink.read(spark, backend, "d", "t").count() == 3L)
    // a FRESH orphan (inside the horizon — an in-flight append's stage
    // window) is left alone
    val fresh = java.nio.file.Paths.get(root, "d", "t", "data", "batch-fresh")
    Seq(("yy", 8)).toDF("id", "v").withColumn("__part", lit("2024-05-01"))
      .write.partitionBy("__part").parquet(fresh.toString)
    assert(backend.vacuum("d", "t").isEmpty, "inside the horizon: untouched")
    assert(java.nio.file.Files.exists(fresh))
  }

  test("tx-log snapshot reads: versioned manifests, immutable prefixes, evolution null-fill") {
    import spark.implicits._
    val root = tmpDir("txlog-snapshot")
    val backend = new TxLogBackend(root)
    TableSink.append(spark, backend, routed(2, "b1"))
    TableSink.append(spark, backend, routed(3, "b2"))
    TableSink.append(spark, backend, routed(4, "b3"))
    assert(backend.snapshotVersions("d", "t") == Seq(1, 2, 3),
      "commits must form a dense total order")
    // each snapshot is exactly the manifest prefix
    assert(backend.readAt(spark, "d", "t", 1).count() == 2L)
    assert(backend.readAt(spark, "d", "t", 2).count() == 5L)
    assert(backend.readAt(spark, "d", "t", 3).count() == 9L)
    val v2ids = backend.readAt(spark, "d", "t", 2)
      .select("id").as[String].collect().sorted.toSeq
    // later appends — including a SCHEMA EVOLUTION — must not change
    // what an already-published snapshot returns
    val evolved = routed(2, "b4").withColumn("data",
      struct(col("data.v"), lit("x").as("extra")))
    TableSink.append(spark, backend, evolved)
    assert(backend.snapshotVersions("d", "t") == Seq(1, 2, 3, 4))
    assert(backend.readAt(spark, "d", "t", 2)
      .select("id").as[String].collect().sorted.toSeq == v2ids,
      "a published snapshot is immutable")
    // old snapshots read under the CURRENT (superset) schema: the new
    // column exists and is null for pre-evolution batches
    val v2 = backend.readAt(spark, "d", "t", 2)
    assert(v2.select("data.extra").distinct().collect().map(_.isNullAt(0)).toSeq == Seq(true))
    val v4 = backend.readAt(spark, "d", "t", 4)
    assert(v4.filter(col("data.extra").isNotNull).count() == 2L)
    assert(v4.count() == 11L)
    // readAt at the tip ≡ the live read
    assert(TableSink.read(spark, backend, "d", "t").count() == 11L)
  }

  test("tx-log version listing is not digit-capped (commit 100000 stays visible, CAS moves past it)") {
    val root = tmpDir("txlog-bigv")
    val backend = new TxLogBackend(root)
    TableSink.append(spark, backend, routed(2))
    // fabricate a six-digit version pointing at the existing batch dir —
    // a digit-capped listing regex would make it invisible while its
    // casCreate succeeded, wedging every later publish() forever
    val dataDir = java.nio.file.Paths.get(root, "d", "t", "data")
    val s = java.nio.file.Files.list(dataDir)
    val batch = try s.iterator().next().getFileName.toString finally s.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "d", "t", "_log", "commit-v100000.json"),
      s"""{"dir":"$batch"}""".getBytes("UTF-8"))
    assert(backend.snapshotVersions("d", "t") == Seq(1, 100000))
    TableSink.append(spark, backend, routed(2, "late"))
    assert(backend.snapshotVersions("d", "t") == Seq(1, 100000, 100001),
      "the CAS loop must advance past a six-digit tip")
  }

  test("tx-log concurrent appends CAS distinct manifest versions — none lost, dense order") {
    val root = tmpDir("txlog-cas-commits")
    val backend = new TxLogBackend(root)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 4).map { i =>
        Future(TableSink.append(spark, backend, routed(10, s"c$i")))
      }
      Await.result(Future.sequence(fs), 180.seconds)
    } finally pool.shutdown()
    // the version CAS must have linearized all four: dense 1..4, and
    // every batch readable at the tip
    assert(backend.snapshotVersions("d", "t") == Seq(1, 2, 3, 4),
      s"racing commits must CAS distinct versions: ${backend.snapshotVersions("d", "t")}")
    assert(backend.readAt(spark, "d", "t", 4).count() == 40L)
  }

  test("bigquery-write: pending streams are invisible until the batch commit") {
    import graft.schema.bigquery.BigQueryEmulator
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType, StringType}
    import spark.implicits._
    val emu = new BigQueryEmulator(tmpDir("bq-pending"))
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("v", IntegerType)))
    emu.createTable("d", "p", schema)
    val s1 = emu.createWriteStream("d", "p")
    emu.appendRows("d", "p", s1, Seq(("a", 1), ("b", 2)).toDF("id", "v"))
    // staged + even finalized rows stay invisible — commit is the point
    assert(emu.readRows(spark, "d", "p", schema).count() == 0L)
    emu.finalizeWriteStream("d", "p", s1)
    assert(emu.readRows(spark, "d", "p", schema).count() == 0L)
    emu.batchCommitWriteStreams("d", "p", Seq(s1))
    assert(emu.readRows(spark, "d", "p", schema).count() == 2L)
    // a finalized stream refuses further appends (Storage Write contract)
    intercept[IllegalArgumentException](
      emu.appendRows("d", "p", s1, Seq(("c", 3)).toDF("id", "v")))
    // commit requires finalize first
    val s2 = emu.createWriteStream("d", "p")
    emu.appendRows("d", "p", s2, Seq(("c", 3)).toDF("id", "v"))
    intercept[IllegalArgumentException](
      emu.batchCommitWriteStreams("d", "p", Seq(s2)))
  }

  test("bigquery-write DDL is ETag CAS: racing writers converge on the union schema") {
    import graft.schema.bigquery.{BigQueryEmulator, BigQueryWriteBackend}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val backend = new BigQueryWriteBackend(
      new BigQueryEmulator(tmpDir("bq-cas")))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 8).map { i =>
        Future(backend.createOrUpdate("d", "cas",
          StructType(Seq(StructField(s"c$i", StringType)))))
      }
      Await.result(Future.sequence(fs), 60.seconds)
    } finally pool.shutdown()
    val Some((etag, live)) = backend.currentSchema("d", "cas")
    assert((0 until 8).forall(i => live.fieldNames.contains(s"c$i")),
      s"lost update: etag $etag $live")
    assert(etag <= 8, "each ETag win bumps at most once")
  }
}
