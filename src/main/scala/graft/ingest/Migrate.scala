package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.{SchemaMerge, SchemaRegistry}

/** Table migration (SURVEY §3.3): the reference's `migrate` command
  * copies a table's schema into a destination then runs
  * ``INSERT `dst` SELECT * FROM `src` `` through the warehouse's SQL
  * engine (`pkg/usecase/migrate.go:14-73`, `pkg/controller/cmd/migrate
  * .go:26`). Here both halves are native: schema copy goes through the
  * registry's create-or-evolve (so a populated destination widens rather
  * than clobbers), data copy is a distributed append of the source read.
  */
object Migrate {

  /** Copy src into dst (creating or evolving dst's schema first).
    * Returns the migrated row count. */
  def migrate(spark: SparkSession, registry: SchemaRegistry,
      srcDataset: String, srcTable: String,
      dstDataset: String, dstTable: String,
      partitionUnit: String = ""): Long = {
    val (_, srcSchema) = registry.currentSchema(srcDataset, srcTable)
      .getOrElse(sys.error(s"no such table $srcDataset.$srcTable"))
    registry.createOrUpdate(dstDataset, dstTable, srcSchema)
    val rows = TableSink.read(spark, registry, srcDataset, srcTable)
    TableSink.appendSlice(spark, registry, dstDataset, dstTable,
      partitionUnit, rows)
    TableSink.read(spark, registry, dstDataset, dstTable).count()
  }

  /** SQL passthrough (SURVEY §2.1 K3): the reference hands raw SQL to
    * BigQuery (`pkg/infra/bq/client.go:53-62`); we hand it to Spark SQL
    * with the registry's tables registered as temp views — including
    * the `_meta` telemetry streams (schema-on-read; they carry no
    * registered schema) as `meta_load_log` / `meta_source_log` /
    * `meta_quarantine` / `meta_stream_log`, plus the per-request
    * nested rollup as `meta_load_log_rollup` — the reference's
    * operational queries over its meta table work here too. */
  def sql(spark: SparkSession, registry: SchemaRegistry,
      tables: Seq[(String, String)], query: String): DataFrame = {
    // telemetry views FIRST, so a user table in a dataset literally
    // named `meta` (view name collision) wins the name — user data must
    // never be silently shadowed by telemetry
    def metaDir(t: String) = registry.dataDir("_meta", t)
    Seq("load_log", "source_log", "quarantine", "stream_log").foreach { t =>
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(metaDir(t))))
        spark.read.parquet(metaDir(t)).createOrReplaceTempView(s"meta_$t")
      else spark.catalog.dropTempView(s"meta_$t") // stale view from a prior call
    }
    // the rollup handles a fresh warehouse itself (empty frame, not an
    // error) — register unconditionally for consistent query behavior
    LoadLogView.requestRollup(spark, registry)
      .createOrReplaceTempView("meta_load_log_rollup")
    tables.foreach { case (ds, tbl) =>
      TableSink.read(spark, registry, ds, tbl)
        .createOrReplaceTempView(s"${ds}_$tbl")
    }
    spark.sql(query)
  }
}
