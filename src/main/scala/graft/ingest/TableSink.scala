package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.TableBackend

/** Per-destination append with schema evolution and time-partitioning —
  * the reference's `ingestRecords` (`pkg/usecase/load.go:283-372`):
  * infer schema → merge into live table (create/evolve) → write rows,
  * partitioned by the destination's time unit
  * (`pkg/usecase/utils.go:170-194`; hour/day/month/year
  * `pkg/domain/types/types.go:51-57`).
  *
  * Storage is behind [[graft.schema.TableBackend]] — this object never
  * touches parquet paths directly, so a BigQuery/Delta deployment swaps
  * the backend without editing the engine (the reference's
  * usecase-vs-infra split, `pkg/infra/bq/client.go`).
  *
  * Scale design: routing destinations are FEW (they're table names), rows
  * are MANY — so we `collect()` only the distinct routing triple (driver
  * metadata, bounded by table count) and keep all row movement inside one
  * partitioned write per destination. The partition column `__part` keeps
  * per-table files clustered by event time so downstream reads prune
  * (SURVEY §4 partition-pruning row).
  */
object TableSink {

  /** Table row schema = envelope with this dest's inferred data struct. */
  private def tableSchema(dataSchema: StructType): StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("ingest_id", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("ingested_at", TimestampType, nullable = false),
    StructField("data", dataSchema, nullable = true)))

  private def partCol(unit: String) = unit match {
    case "hour" => date_format(col("timestamp"), "yyyy-MM-dd-HH")
    case "day" => date_format(col("timestamp"), "yyyy-MM-dd")
    case "month" => date_format(col("timestamp"), "yyyy-MM")
    case "year" => date_format(col("timestamp"), "yyyy")
    case _ => lit("all")
  }

  /** Result of one destination append (telemetry — ref `IngestLog`,
    * `model/bigquery.go:26-39`: dataset/table/schema + LogCount). */
  final case class IngestResult(dataset: String, table: String,
      partition: String, schemaVersion: Int, logCount: Long, success: Boolean)

  /** Destination-append concurrency — the reference ingests tables with
    * a goroutine pool of 8 (`pkg/usecase/usecase.go:34`); here each
    * append is itself a distributed job, but submitting them
    * concurrently lets Spark pipeline small-table writes. */
  val TableConcurrency = 8

  /** Append a routed DataFrame (Transform output) to its destination
    * tables, evolving each table's schema as needed.
    *
    * `dedup=true` drops incoming rows whose `id` already exists in the
    * destination — replay safety across delivery mechanisms, the role of
    * the reference's Firestore state machine (SURVEY §2.7 T3). The
    * anti-join is scoped to the time partitions present in the batch, so
    * at scale it reads only the overlapping slices of the table (id
    * re-deliveries are near-in-time), not the whole history.
    */
  def append(spark: SparkSession, backend: TableBackend,
      routed: DataFrame, dedup: Boolean = false,
      knownDests: Option[Seq[(String, String, String)]] = None): Seq[IngestResult] = {
    val pruned = Transform.pruneDataSchema(routed)
    // distinct destinations: driver-side, O(#tables) not O(#rows) — and
    // skipped entirely when the rule routes by literals
    // ([[graft.rules.SchemaRule.literalDests]]): static routing is the
    // common case and should not cost a scan of the batch.
    val dests = knownDests.map(_.toArray).getOrElse(
      pruned.select("dataset", "table", "partition").distinct()
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))))
    def one(ds: String, tbl: String, unit: String): IngestResult = {
      val slice = pruned
        .filter(col("dataset") === ds && col("table") === tbl &&
          col("partition") === unit)
        .drop("dataset", "table", "partition")
      val deduped =
        if (!dedup || !backend.exists(ds, tbl)) slice
        else {
          val existing = backend.readWithPart(spark, ds, tbl)
          val parts = slice.select(partCol(unit).as("__p")).distinct()
            .collect().map(_.getString(0))
          slice.join(
            existing.filter(col("__part").isin(parts.toIndexedSeq: _*))
              .select(col("id").as("__existing_id")),
            col("id") === col("__existing_id"), "left_anti")
        }
      appendSlice(spark, backend, ds, tbl, unit, deduped)
    }
    if (dests.length <= 1) dests.toSeq.map((one _).tupled)
    else {
      // many-table batch: submit per-destination jobs concurrently
      // (backend DDL stays serialized by its per-table lock)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(TableConcurrency, dests.length))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(dests.toSeq.map { case (ds, tbl, unit) =>
          Future(one(ds, tbl, unit))
        }), Duration.Inf)
      finally pool.shutdown()
    }
  }

  /** Append one destination's slice; evolve-then-retry like the
    * reference's SCHEMA_MISMATCH loop (`pkg/infra/bq/stream.go:87-106`) —
    * with a local registry the merge happens before the write, so one
    * retry suffices for racing writers. */
  def appendSlice(spark: SparkSession, backend: TableBackend, dataset: String,
      table: String, partitionUnit: String, slice: DataFrame): IngestResult = {
    val incomingData = slice.schema("data").dataType.asInstanceOf[StructType]
    val incoming = tableSchema(incomingData)
    val effective = backend.createOrUpdate(dataset, table, incoming)
    val effData = effective("data").dataType.asInstanceOf[StructType]
    val aligned = slice.withColumn("data",
      graft.functions.alignStruct(col("data"), incomingData, effData))
    val withPart = aligned.withColumn("__part", partCol(partitionUnit))
    // Cluster the batch by its target partition BEFORE the dynamic-
    // partition write. Without this, every input task opens a writer for
    // every partition value it happens to hold: a 32-split batch spanning
    // 141 day-partitions writes up to 32×141 ≈ 4,500 tiny files, and the
    // parquet memory manager shrinks row groups under the hundreds of
    // concurrent writers ("Scaling row group sizes … for 677 writers" in
    // the round-3 bench) — the one write shape that gets WORSE with
    // scale. REBALANCE is the AQE-aware clustering: rows with one __part
    // land in one shuffle partition (→ one file per partition per batch),
    // small partitions coalesce into shared tasks, and a skewed partition
    // splits into a few LARGE files instead of one straggler task.
    val clustered = withPart.hint("rebalance", "__part")
    // row count observed DURING the write job (ref IngestLog.LogCount,
    // `model/bigquery.go:37`) — no second pass over the data
    val obs = org.apache.spark.sql.Observation()
    backend.appendPartitioned(dataset, table,
      clustered.observe(obs, count(lit(1)).as("n")))
    val logCount = obs.get.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)
    val version = backend.currentSchema(dataset, table).map(_._1).getOrElse(1)
    IngestResult(dataset, table, partitionUnit, version, logCount, success = true)
  }

  /** Read a table back under its evolved schema (partition column kept
    * out of the logical row — it's derivable from `timestamp`). */
  def read(spark: SparkSession, backend: TableBackend, dataset: String,
      table: String): DataFrame =
    backend.readWithPart(spark, dataset, table).drop("__part")
}
