package graft.schema.bigquery

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.schema.{SchemaMerge, TableBackend}

/** The CONNECTOR-shaped third [[TableBackend]]: the engine's storage
  * seam driven through the exact call sequences the reference issues
  * against BigQuery — ETag-CAS DDL (`pkg/infra/bq/client.go:198-204`)
  * and the Storage Write API's pending-stream batch protocol
  * (`pkg/infra/bq/stream.go:30-116`) — with [[BigQueryEmulator]]
  * standing in for the service (sandbox has no egress). Every method
  * here talks ONLY to the emulator's eight client verbs, so wiring the
  * real thing is a client substitution: replace the emulator with a
  * thin adapter over `google-cloud-bigquery` +
  * `google-cloud-bigquerystorage` (or mount the table through
  * `spark-bigquery-connector` for the read side) and this file does
  * not change. The TableBackendSpec contract suite runs green against
  * this backend alongside the parquet registry and the tx-log — the
  * seam is proven three-sided.
  *
  * Mapping notes (emulator verb → real client call):
  *   - `getTable` → `Tables.Get` / `bigquery.Client.Dataset(..).Table(..).Metadata`
  *   - `createTable` → `Tables.Insert` (`bq/client.go:150-170` CreateTable)
  *   - `updateTable(etag)` → `Tables.Update` with `If-Match` etag
  *   - `createWriteStream` → `BigQueryWriteClient.CreateWriteStream(PENDING)`
  *   - `appendRows` → `AppendRows` on the stream's proto connection
  *   - `finalizeWriteStream` → `FinalizeWriteStream`
  *   - `batchCommitWriteStreams` → `BatchCommitWriteStreams`
  *   - `readRows` → Storage Read API sessions / the Spark connector scan
  *
  * `__part` rides as a data column (BigQuery: the partitioning /
  * clustering column of the destination table — partition decorators
  * prune it server-side; here parquet row-group stats do, exactly the
  * tx-log note).
  */
final class BigQueryWriteBackend(emulator: BigQueryEmulator,
    backoffInitialMs: Long = 10,
    backoffMaxMs: Long = 30L * 1000,
    retryDeadlineMs: Long = 15L * 60 * 1000) extends TableBackend {

  override def exists(dataset: String, table: String): Boolean =
    emulator.getTable(dataset, table).isDefined

  override def currentSchema(dataset: String, table: String): Option[(Int, StructType)] =
    emulator.getTable(dataset, table).map(m => m.etag -> m.schema)

  /** The reference's DDL loop verbatim in shape: read metadata, merge,
    * short-circuit on no-change, conditionally update on the read ETag;
    * on AlreadyExists (lost create race) or EtagMismatch (lost update
    * race) re-read the winner's schema and retry the merge — no lost
    * columns under any interleaving (the CAS test pins this). */
  @tailrec
  override def createOrUpdate(dataset: String, table: String,
      incoming: StructType): StructType =
    emulator.getTable(dataset, table) match {
      case None =>
        val created =
          try { emulator.createTable(dataset, table, incoming); true }
          catch { case _: emulator.AlreadyExistsException => false }
        if (created) incoming else createOrUpdate(dataset, table, incoming)
      case Some(meta) =>
        val merged = SchemaMerge.merge(meta.schema, incoming)
        if (SchemaMerge.normalize(merged) == SchemaMerge.normalize(meta.schema))
          meta.schema
        else {
          val updated =
            try { emulator.updateTable(dataset, table, merged, meta.etag); true }
            catch { case _: emulator.EtagMismatchException => false }
          if (updated) merged else createOrUpdate(dataset, table, incoming)
        }
    }

  /** One PENDING stream per engine batch: stage, finalize, commit —
    * atomic per call exactly as the trait demands (the batch commit is
    * the single visibility point; a crash before it strands an
    * invisible stream, the service's own replay story).
    *
    * SCHEMA_MISMATCH retry protocol (the reference's, in shape:
    * `pkg/infra/bq/stream.go:87-106` + `bq/writer/manager.go:128-146`
    * + the `bq/client.go:64-89` backoff): right after the engine's DDL
    * merge, the write plane may still serve the pre-ALTER schema (DDL
    * propagation lag, ~10 min per the issue the reference cites) and
    * reject the widened batch with `SCHEMA_MISMATCH_EXTRA_FIELDS`. The
    * loop RENEWS the stream (the reference reconnects its managed
    * stream — a pending stream that took a rejected append is simply
    * abandoned, never finalized, so it can't half-commit) and retries
    * under exponential backoff 10 ms → 30 s capped, bounded by a
    * 15-minute deadline — after which the mismatch propagates to the
    * caller (at-least-once delivery: the batch replays). */
  override def appendPartitioned(dataset: String, table: String,
      df: DataFrame): Unit = {
    val deadline = System.nanoTime() + retryDeadlineMs * 1000000L
    var backoff = backoffInitialMs
    while (true) {
      val stream = emulator.createWriteStream(dataset, table)
      try {
        emulator.appendRows(dataset, table, stream, df)
        emulator.finalizeWriteStream(dataset, table, stream)
        emulator.batchCommitWriteStreams(dataset, table, Seq(stream))
        return
      } catch {
        case e: emulator.SchemaMismatchException =>
          if (System.nanoTime() >= deadline) throw e
          Thread.sleep(backoff) // then renew: next iteration's fresh stream
          backoff = math.min(backoff * 2, backoffMaxMs)
      }
    }
  }

  override def readWithPart(spark: SparkSession, dataset: String,
      table: String): DataFrame = {
    val (_, schema) = currentSchema(dataset, table)
      .getOrElse(sys.error(s"no such table $dataset.$table"))
    emulator.readRows(spark, dataset, table, schema.add("__part", StringType))
  }
}
