package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the coverage surface: one entry per implemented operator
  * group from SURVEY §2 plus the training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal). Entries with an
  * `oracleSql` twin are hash-checked against DuckDB at sf0.01; entries
  * without one get a rows-only check (non-SQL-expressible ops:
  * streaming, schema inference, the rule pipeline itself).
  */
object SparkEntry {

  /** Flagship: the full ingest pipeline end-to-end on sf0.001 — events
    * exported as NDJSON objects, routed by an event rule, transformed by
    * a schema rule, schema-inferred, appended to a managed table, read
    * back. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.ingest.{Pipeline, TableSink}
    import graft.rules._
    import graft.schema.SchemaRegistry

    val work = graft.util.Workspace.temp("graft-entry")
    val landing = s"$work/landing"
    graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_timestamp(col("ts")).cast("double"))
      .coalesce(1).write.mode("overwrite").json(landing)
    val rules = Rules(
      event = Seq(EventRule(name = "events-ndjson",
        when = "name LIKE '%.json' OR name LIKE '%.txt'",
        schemaRule = "events")),
      schema = Seq(SchemaRule(name = "events",
        dataset = "'analytics'", table = "'events'",
        partition = "day", timestamp = "ts",
        id = Some("cast(event_id as string)"))))
    val registry = new SchemaRegistry(s"$work/warehouse")
    val cfg = Pipeline.Config(registry, rules, telemetry = true)
    Pipeline.ingestPrefix(spark, cfg, s"$landing/part-*")
    TableSink.read(spark, registry, "analytics", "events")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ training-
    * data ops). Column names match oracleSql exactly (driver sorts
    * columns by name before hashing). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all.map { case (n, f, _) => n -> f }.toMap ++
      graft.queries.CurationQueries.all.map { case (n, f, _) => n -> f }.toMap ++
      graft.queries.PipelineQueries.all.map { case (n, f, _) => n -> f }.toMap

  /** DuckDB-runnable oracle SQL per query (same column names/aliases).
    * Queries absent here (approximate/streaming ops) get the driver's
    * weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.all.map { case (n, _, sql) => n -> sql.trim }.toMap ++
      graft.queries.CurationQueries.all.collect {
        case (n, _, Some(sql)) => n -> sql.trim
      }.toMap ++
      graft.queries.PipelineQueries.all.collect {
        case (n, _, Some(sql)) => n -> sql.trim
      }.toMap
}
