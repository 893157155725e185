package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry

/** Per-request telemetry rollup — one row per ingest request with
  * nested `sources[]` / `ingests[]` arrays, the reference's `LoadLog`
  * record shape (`pkg/domain/model/bigquery.go:9-39`: one BigQuery row
  * per request embedding `Sources[]` and `Ingests[]`).
  *
  * The engine WRITES telemetry flattened — `_meta.load_log` one row per
  * destination, `_meta.source_log` one row per source object — because
  * appends at ingest time must stay append-only streams (a nested
  * record per request would force a read-modify-write or driver-side
  * buffering across the whole request). This view restores the
  * reference's one-record-per-request queryability at READ time: two
  * metadata-sized groupBys and one join, both keyed on `ingest_id`.
  * Telemetry volume is rows-per-request × requests — always dwarfed by
  * the data itself, so the rollup is never the scaling concern.
  */
object LoadLogView {

  /** One row per ingest request:
    * `(ingest_id, started_at, finished_at, sources, ingests)` with
    * `sources: array<struct<rule,path,row_count>>` (per ingested
    * object — ref `SourceLog`) and `ingests: array<struct<dataset,
    * table,schema_version,log_count,success>>` (per destination — ref
    * `IngestLog`). Arrays are sorted for deterministic output. A
    * request whose rules matched no objects has an empty `sources`
    * array (left join), mirroring the reference's empty slice. */
  def requestRollup(spark: SparkSession, registry: SchemaRegistry): DataFrame = {
    // a fresh warehouse (no telemetry-enabled ingest yet) has no _meta
    // dirs — zero requests, not a PATH_NOT_FOUND. source_log can also
    // be absent independently (ingests whose rules matched no objects
    // write load_log only); the left join below already yields empty
    // source arrays for those.
    def metaOrEmpty(table: String, schemaDdl: String): DataFrame =
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(registry.dataDir("_meta", table))))
        spark.read.parquet(registry.dataDir("_meta", table))
      else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    val load = metaOrEmpty("load_log",
      "ingest_id string, started_at timestamp, finished_at timestamp, " +
        "dataset string, table string, schema_version int, log_count bigint, " +
        "success boolean")
    val src = metaOrEmpty("source_log",
      "ingest_id string, started_at timestamp, rule string, path string, " +
        "row_count bigint")
    val ingests = load.groupBy(col("ingest_id"))
      .agg(
        min(col("started_at")).as("started_at"),
        max(col("finished_at")).as("finished_at"),
        sort_array(collect_list(struct(
          col("dataset"), col("table"), col("schema_version"),
          col("log_count"), col("success")))).as("ingests"))
    val sources = src.groupBy(col("ingest_id").as("__sid"))
      .agg(sort_array(collect_list(struct(
        col("rule"), col("path"), col("row_count")))).as("sources"))
    ingests.join(sources, col("ingest_id") === col("__sid"), "left")
      .drop("__sid")
      .withColumn("sources", coalesce(col("sources"),
        array().cast("array<struct<rule:string,path:string,row_count:bigint>>")))
      .select("ingest_id", "started_at", "finished_at", "sources", "ingests")
  }
}
