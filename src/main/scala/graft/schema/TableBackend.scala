package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage seam between the ingest engine and the destination catalog —
  * the Spark-side analogue of the reference's infra interfaces
  * (`pkg/infra/bq/client.go` BigQuery, `pkg/infra/cs/client.go` object
  * store): the usecase layer there talks to narrow interfaces, never to
  * a concrete client, so deployments swap backends without touching the
  * engine.
  *
  * [[graft.ingest.TableSink]] calls ONLY this trait. The parquet-backed
  * [[SchemaRegistry]] is the tested local implementation; a cloud
  * deployment (BigQuery via its Spark connector, Delta/Iceberg on object
  * storage) implements these five methods and drops in — the engine's
  * schema-evolution, partition-clustering, dedup, and telemetry logic is
  * backend-agnostic.
  *
  * Contract notes for implementers:
  *   - `appendPartitioned` receives a frame already carrying a `__part`
  *     string column AND already clustered by it (the engine rebalances
  *     before the hand-off, so a naive partitioned write produces ~one
  *     file per partition per batch). The call must be atomic per batch:
  *     either all rows land or none (the streaming replay contract
  *     assumes no half-visible batches).
  *   - `createOrUpdate` must be safe under concurrent callers for
  *     DIFFERENT tables; same-table concurrency may be serialized
  *     internally (the registry uses a per-table lock; BigQuery uses its
  *     ETag compare-and-set, `bq/client.go:198-204`).
  *   - `readWithPart` surfaces `__part` so dedup's anti-join can prune
  *     to the partitions present in the incoming batch.
  */
trait TableBackend {

  /** Does the destination table exist (schema registered)? */
  def exists(dataset: String, table: String): Boolean

  /** Live (version, schema) of the table, if it exists. */
  def currentSchema(dataset: String, table: String): Option[(Int, StructType)]

  /** Merge `incoming` into the live schema, creating the table if
    * absent; returns the table's effective schema after the call. */
  def createOrUpdate(dataset: String, table: String, incoming: StructType): StructType

  /** Append a batch carrying a `__part` partition column, pre-clustered
    * by the engine. Atomic per call. */
  def appendPartitioned(dataset: String, table: String, df: DataFrame): Unit

  /** Read the table under its live (evolved) schema with the `__part`
    * partition column surfaced. */
  def readWithPart(spark: SparkSession, dataset: String, table: String): DataFrame
}
