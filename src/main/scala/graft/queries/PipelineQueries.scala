package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.{Pipeline, TableSink}
import graft.multimodal.Multimodal
import graft.relational.Tables
import graft.rules._
import graft.schema.SchemaRegistry

/** Queries exercising the ingestion engine itself (the reference's core:
  * rule-routed, schema-inferring NDJSON → table pipelines, batch and
  * streaming) plus the multimodal decode path.
  *
  * The ingest queries round-trip the `events` table through NDJSON →
  * rules → envelope → managed table, then aggregate the *table* — so the
  * DuckDB oracle (same aggregate over the original parquet) verifies the
  * pipeline was lossless, not just that it ran. The multimodal decode is
  * md5-deterministic (see [[Multimodal.FakeCodec]]) and oracle-checked
  * the same way.
  */
object PipelineQueries {

  private def eventsRules = Rules(
    event = Seq(EventRule(name = "events-ndjson",
      when = "name LIKE '%.json' OR name LIKE '%.txt'",
      schemaRule = "events")),
    schema = Seq(SchemaRule(name = "events",
      dataset = "'analytics'", table = "'events'",
      partition = "day", timestamp = "ts",
      id = Some("cast(event_id as string)"))))

  private def exportNdjson(s: SparkSession, d: String, dir: String,
      codec: Option[String] = None, nParts: Int = 32): Unit = {
    val w = Tables.events(s, d)
      .withColumn("ts", unix_timestamp(col("ts")).cast("double"))
      // repartition (not coalesce — the source is a single parquet file,
      // so coalesce(n) would stay at 1) → n landing objects, exercising
      // multi-object listing and per-source telemetry. Default 32: the
      // landing file count caps the parallelism of every downstream
      // parse job (text splits = files here), so a 4-file export made
      // the whole ingest run 4-wide on a 32-core session. q40/q41 pin
      // nParts=4 because their oracles assert the source/batch counts.
      .repartition(nParts).write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(dir)
  }

  /** q33: batch ingest round-trip — events → NDJSON objects → full rule
    * pipeline → managed table → aggregate the table. */
  def q33(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q33")
    exportNdjson(s, d, s"$work/landing")
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, eventsRules),
      s"$work/landing/part-*")
    TableSink.read(s, registry, "analytics", "events")
      .groupBy(col("data.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  val q33Sql: String = s"""
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** q130: q33's full ingest pipeline driven through the CONNECTOR-
    * SHAPED BigQuery backend — ETag-CAS DDL + pending-stream
    * append/finalize/batch-commit against the in-process emulator —
    * instead of the parquet registry, with a DDL-propagation window
    * armed mid-run so every batch crosses the SCHEMA_MISMATCH
    * renew/backoff path at least potentially. Same landing data, same
    * rules, same read-back aggregate, SAME ORACLE as q33: the third
    * backend is adjudicated by the hash gate itself, not just the
    * contract suite. (Storage semantics — pending invisible, commit
    * atomic, write-plane schema validation — are the emulator's; the
    * engine code is byte-for-byte the q33 path, proving the storage
    * seam carries the whole pipeline.) */
  def q130(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q130")
    exportNdjson(s, d, s"$work/landing")
    val emu = new graft.schema.bigquery.BigQueryEmulator(s"$work/warehouse")
    val backend = new graft.schema.bigquery.BigQueryWriteBackend(emu,
      backoffInitialMs = 1, backoffMaxMs = 8)
    emu.setPropagationLag(2) // every DDL merge lags the write plane
    try Pipeline.ingestPrefix(s, Pipeline.Config(backend, eventsRules),
      s"$work/landing/part-*")
    finally emu.setPropagationLag(0)
    TableSink.read(s, backend, "analytics", "events")
      .groupBy(col("data.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** q34: streaming ingest round-trip — the same landing dir drained by
    * the checkpointed file-source stream (Trigger.AvailableNow), then
    * the same lossless-ness aggregate. Covers SURVEY §2.7 T1-T3. */
  def q34(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q34")
    exportNdjson(s, d, s"$work/landing")
    val registry = new SchemaRegistry(s"$work/warehouse")
    val q = Pipeline.stream(s, Pipeline.Config(registry, eventsRules),
      s"$work/landing/part-*", s"$work/checkpoint", Trigger.AvailableNow())
    q.awaitTermination()
    TableSink.read(s, registry, "analytics", "events")
      .groupBy(col("data.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("distinct_ids"))
      .orderBy(col("event_type"))
  }

  val q34Sql: String = """
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** q35: schema evolution — two heterogeneous NDJSON batches into one
    * table; result = the table read back under the EVOLVED schema (old
    * rows' missing fields null, new nested struct readable) + the final
    * version + the full field:type list. The oracle is the golden
    * expectation over the same two literal batches, so the driver
    * hash-checks both the merged values and the merged schema text. */
  def q35(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q35")
    def write(name: String, lines: String): Unit = {
      val p = java.nio.file.Paths.get(work, "landing", name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, lines.getBytes("UTF-8"))
    }
    write("a.json", """{"ts":1700000000.0,"color":"red","n":1}
{"ts":1700000001.0,"color":"blue","n":2}""")
    write("b.json", """{"ts":1700000002.0,"color":"green","size":{"w":3,"h":4}}""")
    val rules = Rules(
      event = Seq(EventRule(name = "all", when = "name LIKE '%.json'",
        schemaRule = "colors")),
      schema = Seq(SchemaRule(name = "colors",
        dataset = "'demo'", table = "'colors'", timestamp = "ts")))
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPaths(s, Pipeline.Config(registry, rules),
      Seq(s"$work/landing/a.json"))
    Pipeline.ingestPaths(s, Pipeline.Config(registry, rules),
      Seq(s"$work/landing/b.json"))
    val (version, schema) = registry.currentSchema("demo", "colors").get
    val dataType = schema("data").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val fieldsStr = dataType.fields.sortBy(_.name)
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    TableSink.read(s, registry, "demo", "colors")
      .select(col("data.color").as("color"), col("data.n").as("n"),
        col("data.size.w").as("w"), col("data.size.h").as("h"),
        col("data.ts").as("ts"),
        lit(version).as("schema_version"), lit(fieldsStr).as("fields"))
      .orderBy("color")
  }

  val q35Sql: String = {
    // Spark JSON inference sorts struct keys → h before w
    val fields = "color:string,n:bigint,size:struct<h:bigint,w:bigint>,ts:double"
    s"""
    SELECT * FROM (VALUES
      ('blue', CAST(2 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(1700000001.0 AS DOUBLE), CAST(2 AS INT), '$fields'),
      ('green', CAST(NULL AS BIGINT), CAST(3 AS BIGINT), CAST(4 AS BIGINT),
       CAST(1700000002.0 AS DOUBLE), CAST(2 AS INT), '$fields'),
      ('red', CAST(1 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(1700000000.0 AS DOUBLE), CAST(2 AS INT), '$fields'))
    AS t(color, n, w, h, ts, schema_version, fields) ORDER BY color"""
  }

  /** q31: multimodal image decode — binary payload column through the
    * batched mapPartitions decoder; md5-deterministic so oracle-exact. */
  def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.repartitionBySize(
      Multimodal.mediaFromDocuments(Tables.documents(s, d)), 8)
    Multimodal.decodeImages(media)
      .select(col("media_id"), col("width"), col("height"), col("channels"),
        round(element_at(col("features"), 1), 6).as("f0"))
      .orderBy(col("media_id"))
  }

  val q31Sql: String = """
    SELECT doc_id AS media_id,
           1 + CAST(list_reduce(list_transform(range(1, 9), i ->
               CAST(strpos('0123456789abcdef', substring(md5(text), CAST(i AS INT), 1)) - 1 AS BIGINT)),
             (a, x) -> a * 16 + x) % 1024 AS INT) AS width,
           1 + CAST(list_reduce(list_transform(range(9, 17), i ->
               CAST(strpos('0123456789abcdef', substring(md5(text), CAST(i AS INT), 1)) - 1 AS BIGINT)),
             (a, x) -> a * 16 + x) % 1024 AS INT) AS height,
           1 + CAST(list_reduce(list_transform(range(17, 21), i ->
               CAST(strpos('0123456789abcdef', substring(md5(text), CAST(i AS INT), 1)) - 1 AS BIGINT)),
             (a, x) -> a * 16 + x) % 4 AS INT) AS channels,
           round(CAST(list_reduce(list_transform(range(1, 9), i ->
               CAST(strpos('0123456789abcdef', substring(md5(md5(text) || '/0'), CAST(i AS INT), 1)) - 1 AS BIGINT)),
             (a, x) -> a * 16 + x) % 1000 AS DOUBLE) / 1000.0, 6) AS f0
    FROM documents ORDER BY media_id"""

  /** q32: video frame sampling — per-payload frame explosion through the
    * stubbed demuxer; output is metadata-sized, oracle-exact. */
  def q32(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      .filter(col("media_type") === "video")
    Multimodal.sampleFrames(media)
      .orderBy(col("media_id"), col("frame_idx"))
      .select(col("media_id"), col("frame_idx"), col("frame_md5"))
  }

  val q32Sql: String = """
    SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
           md5(text || '#' || CAST(f AS VARCHAR)) AS frame_md5
    FROM (SELECT doc_id, text,
            unnest(range(0, greatest(1, least(10, octet_length(encode(text)) // 1000)))) AS f
          FROM documents WHERE doc_id % 3 = 0)
    ORDER BY media_id, frame_idx"""

  /** q61: multimodal audio decode — binary payloads through the batched
    * audio decoder (rate / duration / channels / first MFCC), size-aware
    * partitioning; md5-deterministic like q31 so the oracle replays the
    * decode exactly. */
  def q61(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.repartitionBySize(
      Tables.documents(s, d).select(col("doc_id").as("media_id"),
        lit("audio").as("media_type"), lit("fake").as("fmt"),
        encode(col("text"), "UTF-8").cast("binary").as("content")), 8)
    Multimodal.decodeAudio(media)
      .select(col("media_id"), col("sample_rate"), col("duration_ms"),
        col("channels"), round(element_at(col("mfcc"), 1), 6).as("mfcc0"))
      .orderBy(col("media_id"))
  }

  val q61Sql: String = {
    def hexLong(src: String, from: Int, len: Int) =
      s"""CAST(list_reduce(list_transform(range($from, ${from + len}), i ->
          CAST(strpos('0123456789abcdef', substring($src, CAST(i AS INT), 1)) - 1 AS BIGINT)),
        (a, x) -> a * 16 + x) AS BIGINT)"""
    s"""
    SELECT doc_id AS media_id,
           list_extract([8000, 16000, 22050, 44100, 48000],
             1 + CAST(${hexLong("md5(text)", 1, 8)} % 5 AS INT)) AS sample_rate,
           1 + ${hexLong("md5(text)", 9, 8)} % 600000 AS duration_ms,
           1 + CAST(${hexLong("md5(text)", 17, 4)} % 2 AS INT) AS channels,
           round(CAST(${hexLong("md5(md5(text) || '@0')", 1, 8)} % 2000 - 1000 AS DOUBLE) / 100.0, 6) AS mfcc0
    FROM documents ORDER BY media_id"""
  }

  /** q149: audio near-duplicate pairs —
    * [[Multimodal.audioNearDupPairs]]: the stub MFCC vectors (13-dim,
    * md5-deterministic, so the oracle replays the decode exactly)
    * through the SRP-LSH banded pair generator with exact cosine
    * verify at 0.75 — the audio twin of q114's image dedup. Exact
    * payload duplicates land at sim 1.0; the LSH bands are the same
    * q29 fragments the oracle replays. */
  def q149(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.repartitionBySize(
      Tables.documents(s, d).select(col("doc_id").as("media_id"),
        lit("audio").as("media_type"), lit("fake").as("fmt"),
        encode(col("text"), "UTF-8").cast("binary").as("content")), 8)
    Multimodal.audioNearDupPairs(media, threshold = 0.75)
      .orderBy(col("a"), col("b"))
  }

  val q149Sql: String = {
    def hexLong(src: String, from: Int, len: Int) =
      s"""CAST(list_reduce(list_transform(range($from, ${from + len}), i ->
          CAST(strpos('0123456789abcdef', substring($src, CAST(i AS INT), 1)) - 1 AS BIGINT)),
        (a, x) -> a * 16 + x) AS BIGINT)"""
    val mfccJ = hexLong("md5(md5(text) || '@' || CAST(j AS VARCHAR))", 1, 8)
    s"""
    WITH e AS MATERIALIZED (
      SELECT doc_id AS media_id,
             list_transform(range(0, 13), j ->
               CAST($mfccJ % 2000 - 1000 AS DOUBLE) / 100.0) AS v
      FROM documents),
    sigs AS MATERIALIZED (
      SELECT media_id, v, sqrt(${graft.queries.CurationQueries.dotSql("v", "v")}) AS nrm,
             ${graft.queries.CurationQueries.srpSigSql()} AS sig FROM e),
    banded AS (SELECT media_id, unnest(${graft.queries.CurationQueries.srpBandListSql()}) AS band
               FROM sigs),
    cands AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b
              FROM banded x JOIN banded y ON x.band = y.band
              WHERE x.media_id < y.media_id)
    SELECT a, b, round(${graft.queries.CurationQueries.dotSql("sa.v", "sb.v")} / (sa.nrm * sb.nrm), 6) AS sim
    FROM cands JOIN sigs sa ON sa.media_id = a JOIN sigs sb ON sb.media_id = b
    WHERE round(${graft.queries.CurationQueries.dotSql("sa.v", "sb.v")} / (sa.nrm * sb.nrm), 6) >= 0.75
    ORDER BY a, b"""
  }

  /** q36: notification decode (SURVEY S7) — Cloud-Storage object-event
    * JSON (built deterministically from `events`) through the fixed-
    * schema from_json decoder: string→long size, RFC3339→timestamp,
    * base64 md5→hex. The oracle computes the decoded values directly,
    * so the encode→decode round-trip must be lossless to match. */
  def q36(s: SparkSession, d: String): DataFrame = {
    // events ships as one parquet file; the JSON encode→decode round
    // trip is per-row compute, so spread it across cores first
    val spread = graft.util.Spread(Tables.events(s, d))
    val eventJson = spread.select(to_json(struct(
      lit("storage#object").as("kind"),
      concat(lit("logs/"), col("event_id"), lit(".json")).as("name"),
      lit("data-bucket").as("bucket"),
      (col("event_id") * 100).cast("string").as("size"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timeCreated"),
      base64(unhex(md5(col("event_id").cast("string")))).as("md5Hash"))).as("j"))
    graft.sources.Events.decodeStorageEvents(eventJson, col("j"), "o")
      .select(col("o.bucket").as("bucket"), col("o.name").as("name"),
        col("o.path").as("path"), col("o.size").as("size"),
        date_format(col("o.created_at"), "yyyy-MM-dd HH:mm:ss").as("created_str"),
        col("o.md5").as("md5"))
      .orderBy(col("name"))
  }

  val q36Sql: String = """
    SELECT 'data-bucket' AS bucket,
           concat('logs/', CAST(event_id AS VARCHAR), '.json') AS name,
           concat('gs://data-bucket/logs/', CAST(event_id AS VARCHAR), '.json') AS path,
           event_id * 100 AS size,
           strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS created_str,
           md5(CAST(event_id AS VARCHAR)) AS md5
    FROM events ORDER BY name"""

  /** q40: telemetry parity (SURVEY K6/A3) — ingest the events NDJSON
    * export, then read back `_meta.load_log` (per-destination LogCount)
    * and `_meta.source_log` (per-object RowCount). The oracle derives
    * every count independently from the events table, so the telemetry
    * row counts are hash-checked, not just present. */
  def q40(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q40")
    exportNdjson(s, d, s"$work/landing", nParts = 4)
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, eventsRules),
      s"$work/landing/part-*")
    val load = s.read.parquet(registry.dataDir("_meta", "load_log"))
      .select(col("dataset"), col("table"), col("schema_version"),
        col("log_count"), col("success"))
    val src = s.read.parquet(registry.dataDir("_meta", "source_log"))
      .agg(sum(col("row_count")).as("src_rows"), count(lit(1)).as("n_sources"))
    load.crossJoin(src)
  }

  val q40Sql: String = """
    SELECT 'analytics' AS dataset, 'events' AS "table",
           CAST(1 AS INT) AS schema_version, COUNT(*) AS log_count, true AS success,
           COUNT(*) AS src_rows, CAST(4 AS BIGINT) AS n_sources
    FROM events"""

  /** q63: per-request telemetry rollup (ref `LoadLog{Sources[],
    * Ingests[]}`, `model/bigquery.go:9-39`) — ingest the events export,
    * roll the flattened `_meta` tables up to ONE nested record per
    * request ([[graft.ingest.LoadLogView]]), then project the nested
    * arrays down to oracle-checkable scalars (sizes + sums + the
    * destination fields inside the arrays): DuckDB can't hash Spark's
    * nested rendering, so the check is on the array CONTENTS. */
  def q63(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q63")
    exportNdjson(s, d, s"$work/landing", nParts = 4)
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, eventsRules),
      s"$work/landing/part-*")
    graft.ingest.LoadLogView.requestRollup(s, registry)
      .select(
        size(col("sources")).as("n_sources"),
        size(col("ingests")).as("n_ingests"),
        aggregate(col("sources"), lit(0L),
          (a, x) => a + x.getField("row_count")).as("src_rows"),
        aggregate(col("ingests"), lit(0L),
          (a, x) => a + x.getField("log_count")).as("log_rows"),
        col("ingests")(0).getField("dataset").as("dataset"),
        col("ingests")(0).getField("table").as("table"),
        col("ingests")(0).getField("success").as("success"))
  }

  val q63Sql: String = """
    SELECT CAST(4 AS INT) AS n_sources, CAST(1 AS INT) AS n_ingests,
           COUNT(*) AS src_rows, COUNT(*) AS log_rows,
           'analytics' AS dataset, 'events' AS "table", true AS success
    FROM events"""

  /** q41: backfill round-trip (SURVEY K5/A4/S8) — list the landing
    * prefix, pack it into work-list batches (Enqueue), decode the batch
    * messages back to object rows (the S8 fan-out decoder), read the
    * decoded paths, and aggregate. Proves listing → batching → publish →
    * decode → read is lossless; the oracle derives the same counts from
    * the events table directly. countLimit=2 with an unreachable size
    * limit → exactly ⌈4 objects / 2⌉ = 2 batches at every SF. The
    * landing objects are GZIPPED NDJSON, so the oracle-checked path also
    * covers S4 decompression (transparent by extension). */
  def q41(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q41")
    exportNdjson(s, d, s"$work/landing", codec = Some("gzip"), nParts = 4)
    val batchFiles = graft.ingest.Enqueue.enqueue(s, s"$work/landing/part-*",
      s"$work/batches", countLimit = 2, sizeLimit = Long.MaxValue)
    val objects = graft.sources.Events.explodeWorkList(
      s.read.text(batchFiles: _*).withColumnRenamed("value", "j"), "j")
    // objects listed in the work-list are re-read as the ingest would
    val paths = objects.select("path").collect().map(_.getString(0)).toSeq
    s.read.json(paths: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("distinct_ids"))
      .withColumn("n_batches", lit(batchFiles.length))
  }

  val q41Sql: String = """
    SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS distinct_ids,
           CAST(2 AS INT) AS n_batches
    FROM events"""

  /** q45: small-file compaction round-trip — write the events table
    * month-partitioned but heavily fragmented (16 shuffled files per
    * partition, the shape a micro-batching streaming sink leaves
    * behind), compact every partition to the byte target, then
    * aggregate the COMPACTED table. The oracle is the same aggregate
    * over the original events parquet, so the hash check proves the
    * rewrite was byte-lossless; the fragmentation drop itself is
    * asserted in CompactSpec (file counts aren't SQL-visible). */
  def q45(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q45")
    val dir = s"$work/events_table"
    Tables.events(s, d)
      .withColumn("__part", date_format(col("ts"), "yyyy-MM"))
      .repartition(16)
      .write.partitionBy("__part").parquet(dir)
    val reports = graft.ingest.Compact.compactDir(s, dir, targetBytes = 1L << 30)
    require(reports.nonEmpty && reports.forall(r => r.filesAfter < r.filesBefore),
      s"compaction was a no-op: $reports")
    s.read.parquet(dir)
      .groupBy(col("__part"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.relational.RelationalQueries.dsum(col("value")).as("total_value"))
      .orderBy(col("__part"))
  }

  val q45Sql: String = s"""
    SELECT strftime(ts, '%Y-%m') AS __part,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value
    FROM events GROUP BY 1 ORDER BY __part"""

  /** q53: CSV ingest round-trip — the same lossless-pipeline check as
    * q33 but through the `parser: csv` rule path (header + full-scan
    * inference). Beyond the reference (swarm is JSON-only); a mixed
    * landing zone needs it. */
  def q53(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q53")
    Tables.events(s, d)
      .withColumn("ts", unix_timestamp(col("ts")).cast("double"))
      .repartition(4).write.mode("overwrite")
      .option("header", "true").csv(s"$work/landing")
    val rules = Rules(
      event = Seq(EventRule(name = "events-csv", when = "name LIKE '%.csv'",
        parser = "csv", schemaRule = "events")),
      schema = Seq(SchemaRule(name = "events",
        dataset = "'analytics'", table = "'events_csv'",
        partition = "day", timestamp = "ts",
        id = Some("cast(event_id as string)"))))
    val registry = new SchemaRegistry(s"$work/wh")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, rules, telemetry = false),
      s"$work/landing/*.csv")
    TableSink.read(s, registry, "analytics", "events_csv")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        countDistinct(col("data.event_type")).as("n_types"))
  }

  val q53Sql: String = """
    SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS distinct_ids,
           COUNT(DISTINCT event_type) AS n_types
    FROM events"""

  /** q60: replay-safe streaming ingest (SURVEY T2/T3, oracle-checked) —
    * the SAME landing prefix is drained by TWO streams with independent
    * checkpoints, i.e. a full at-least-once replay of every object
    * (what a lost checkpoint does in production). Streaming dedup is on
    * by default, so the table must still hold each record exactly once;
    * the oracle is the single-copy aggregate over the source table, so
    * the hash check proves replay-exactly-once, not just "it ran". */
  def q60(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q60")
    exportNdjson(s, d, s"$work/landing")
    val registry = new SchemaRegistry(s"$work/warehouse")
    val cfg = Pipeline.Config(registry, eventsRules)
    Pipeline.stream(s, cfg, s"$work/landing/part-*", s"$work/ckpt-1",
      Trigger.AvailableNow()).awaitTermination()
    // checkpoint loss: a fresh stream re-reads EVERY landing object
    Pipeline.stream(s, cfg, s"$work/landing/part-*", s"$work/ckpt-2",
      Trigger.AvailableNow()).awaitTermination()
    TableSink.read(s, registry, "analytics", "events")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"))
  }

  val q60Sql: String = s"""
    SELECT COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value
    FROM events"""

  /** q37: SQL passthrough (SURVEY K3) — a raw SQL string handed to
    * Spark SQL over registered views, the analogue of the reference
    * handing SQL to BigQuery. The oracle is the *same string*. */
  val passthroughSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  def q37(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(passthroughSql)
  }

  /** q77: schema-rule FAN-OUT — one landing object set, TWO event rules
    * both matching every object, routing to two destinations (the
    * reference's set semantics: N matching rules = N parse directives,
    * `event.go:11-21` / `load.go:213-216`): `all_events` takes every
    * record; `purchases` filters to `event_type = 'purchase'` via the
    * schema rule's `when`. Result = per-destination lossless-ness
    * aggregates, so the oracle hash-checks that fan-out MULTIPLIES
    * records into each destination (not splits between them) and that
    * the rule-level filter applied exactly. */
  def q77(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q77")
    exportNdjson(s, d, s"$work/landing", nParts = 8)
    val rules = Rules(
      event = Seq(
        EventRule(name = "route-all", when = "name LIKE '%.json'",
          schemaRule = "all"),
        EventRule(name = "route-purchases", when = "name LIKE '%.json'",
          schemaRule = "purchases")),
      schema = Seq(
        SchemaRule(name = "all", dataset = "'analytics'",
          table = "'all_events'", partition = "day", timestamp = "ts",
          id = Some("cast(event_id as string)")),
        SchemaRule(name = "purchases", dataset = "'analytics'",
          table = "'purchases'", when = Some("event_type = 'purchase'"),
          partition = "day", timestamp = "ts",
          id = Some("cast(event_id as string)"))))
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, rules),
      s"$work/landing/part-*")
    def destAgg(table: String) =
      TableSink.read(s, registry, "analytics", table)
        .groupBy(lit(table).as("dest"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("id")).as("distinct_ids"),
          graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"))
    destAgg("all_events").union(destAgg("purchases")).orderBy(col("dest"))
  }

  val q77Sql: String = s"""
    SELECT 'all_events' AS dest, COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value
    FROM events
    UNION ALL
    SELECT 'purchases' AS dest, COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value
    FROM events WHERE event_type = 'purchase'
    ORDER BY dest"""

  /** q78: the Rego frontend end-to-end — event + schema rules written in
    * the REFERENCE'S policy grammar (`docs/rule.md`), compiled by
    * [[graft.rules.rego.RegoRules]] into the same rule DSL the rest of
    * the pipeline runs, driving a real ingest whose landed table is
    * aggregated and hash-checked against DuckDB over the original
    * parquet. Verifies the whole frontend chain: src-rule predicate
    * (endswith over object metadata), schema-rule body condition
    * (`input.event_type == "purchase"` → `when`), id/timestamp column
    * refs, and day partitioning — lossless vs the oracle. */
  def q78(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q78")
    exportNdjson(s, d, s"$work/landing", nParts = 8)
    val eventRego = """package event

src[s] {
	endswith(input.cs.name, ".json")
	s := {"parser": "json", "schema": "purchases"}
}
"""
    val schemaRego = """package schema.purchases

log[d] {
	input.event_type == "purchase"
	d := {
		"dataset": "analytics",
		"table": "purchases",
		"partition": "day",
		"id": input.event_id,
		"timestamp": input.ts,
		"data": input,
	}
}
"""
    val compiled = Seq(eventRego, schemaRego).map(graft.rules.rego.RegoRules.compile)
      .reduce((a, b) => Rules(a.event ++ b.event, a.schema ++ b.schema))
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s, Pipeline.Config(registry, compiled),
      s"$work/landing/part-*")
    TableSink.read(s, registry, "analytics", "purchases")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"),
        unix_timestamp(min(col("timestamp"))).as("min_ts"),
        unix_timestamp(max(col("timestamp"))).as("max_ts"))
  }

  val q78Sql: String = s"""
    SELECT COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts
    FROM events WHERE event_type = 'purchase'"""

  /** q96: the Rego frontend's FULL-GENERALITY pass, end-to-end — a
    * policy DIRECTORY ([[graft.rules.RuleLoader.fromDir]], the
    * reference's sorted policy-tree walk) whose schema rule uses every
    * construct round 7 added: a cross-package `data.<pkg>` constant
    * module (set + scalar), set-literal membership (→ codegen'd IN),
    * `every` (→ native `forall`), and an array comprehension under
    * `count` (→ `size(filter(...))`). The landing docs carry a derived
    * `codes` array so the quantifiers have something to quantify; the
    * oracle replays the identical policy logic in DuckDB
    * (`list_filter`), so the hash check proves the COMPILED SQL
    * implements the Rego semantics — not merely that it parses. */
  def q96(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q96")
    // events + a deterministic int array per record (the policy's
    // quantification target), landed as NDJSON objects
    Tables.events(s, d)
      .withColumn("ts", unix_timestamp(col("ts")).cast("double"))
      .withColumn("codes", array(
        (col("event_id") % 7 * 100).cast("int"),
        (col("user_id") % 11 * 50).cast("int")))
      .repartition(8).write.mode("overwrite").json(s"$work/landing")
    val policyDir = s"$work/policy"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(policyDir))
    def policy(name: String, src: String): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(policyDir, name), src.getBytes("UTF-8"))
    policy("00_consts.rego", """package consts
kinds := {"purchase", "view"}
max_hot := 1
""")
    policy("10_event.rego", """package event
src[s] {
	endswith(input.cs.name, ".json")
	s := {"parser": "json", "schema": "filtered"}
}
""")
    policy("20_schema.rego", """package schema.filtered
log[d] {
	input.event_type in data.consts.kinds
	every c in input.codes { c < 600 }
	count([c | c := input.codes[_]; c >= 300]) <= data.consts.max_hot
	d := {
		"dataset": "analytics",
		"table": "filtered",
		"partition": "day",
		"id": input.event_id,
		"timestamp": input.ts,
		"data": input,
	}
}
""")
    val registry = new SchemaRegistry(s"$work/warehouse")
    Pipeline.ingestPrefix(s,
      Pipeline.Config(registry, graft.rules.RuleLoader.fromDir(policyDir)),
      s"$work/landing/part-*")
    TableSink.read(s, registry, "analytics", "filtered")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("distinct_ids"),
        graft.relational.RelationalQueries.dsum(col("data.value")).as("total_value"),
        unix_timestamp(min(col("timestamp"))).as("min_ts"),
        unix_timestamp(max(col("timestamp"))).as("max_ts"))
  }

  val q96Sql: String = s"""
    WITH coded AS (
      SELECT *, [CAST(event_id % 7 * 100 AS INT),
                 CAST(user_id % 11 * 50 AS INT)] AS codes
      FROM events),
    kept AS (
      SELECT * FROM coded
      WHERE event_type IN ('purchase', 'view')
        AND len(list_filter(codes, c -> c >= 600)) = 0
        AND len(list_filter(codes, c -> c >= 300)) <= 1)
    SELECT COUNT(*) AS n,
           COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS distinct_ids,
           ${graft.relational.RelationalQueries.dsumSql("value")} AS total_value,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts
    FROM kept"""

  /** q85: watermarked event-time windowed aggregation (SURVEY T4),
    * oracle-checked — the events table is drained as a FILE STREAM
    * through [[graft.streaming.StreamOps.windowedAgg]] (1-hour tumbling
    * windows, 30-minute watermark, append mode), so only windows the
    * watermark has closed ever reach the sink. Append mode emits
    * nothing for windows still open at end-of-stream, so the query
    * drains twice: the first run emits every window the real data's
    * watermark passed, then a single sentinel event 4 hours past max
    * ts arrives as a new landing file and the second run (same
    * checkpoint) advances the watermark past every real window,
    * closing the tail. The oracle is the same hourly aggregate in
    * DuckDB over the source parquet — the hash check proves the
    * watermark closed EVERY window exactly once with nothing dropped
    * or duplicated, i.e. T4's bounded-state design loses no data when
    * the stream is drained to quiescence.
    *
    * Scale: the windowed agg is a keyed shuffle with map-side partial
    * aggregation; state is ∝ open windows × keys and evicted by the
    * watermark, so an unbounded stream holds ~2 hours × |keys| of
    * state regardless of history length. */
  def q85(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val work = graft.util.Workspace.temp("graft-q85")
    val landing = s"$work/landing"
    // decimal value → exact sums; cast back to double for the compare
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"),
      col("value").cast(DecimalType(18, 6)).as("value"))
    ev.repartition(8).write.mode("overwrite").parquet(landing)
    val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
    def drain(): Unit = {
      val in = s.readStream.schema(ev.schema).parquet(landing)
      val agg = graft.streaming.StreamOps.windowedAgg(in, "ts", "event_type",
        "value", "1 hour", watermark = "30 minutes")
      // state width = the landing fan-in (8 files), not the session's
      // batch shuffle width: the keyed state is a handful of event
      // types × open windows, and every trigger (incl. the no-data
      // watermark batch) pays per-partition store commits — see
      // StreamOps.sizedStateStart
      graft.streaming.StreamOps.sizedStateStart(s, 8) {
        agg.writeStream.format("parquet")
          .option("path", s"$work/sink")
          .option("checkpointLocation", s"$work/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
      }.awaitTermination()
    }
    drain()
    // sentinel: one event far past max ts, landed as a NEW file so the
    // second drain's watermark closes every real window. Its own
    // window never closes (nothing later arrives), so it stays in
    // state — the filter below is belt-and-braces.
    s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000),
        "__sentinel", new java.math.BigDecimal(0))),
      ev.schema).write.mode("append").parquet(landing)
    drain()
    s.read.parquet(s"$work/sink")
      .filter(col("event_type") =!= "__sentinel")
      .select(col("window_start"), col("window_end"), col("event_type"),
        col("n"), col("total").cast("double").as("total"))
  }

  val q85Sql: String = """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2, 3"""

  /** q99: STREAMING sessionization (SURVEY T5 — the stateful
    * transform), oracle-checked: the events table drains as a file
    * stream through [[graft.streaming.StreamOps.sessionize]]
    * (flatMapGroupsWithState, event-time timeouts, 30-min gap), the
    * q85 sentinel pattern closes every idle session on a second drain,
    * and the emitted sessions hash-match the batch gaps-and-islands
    * replay in DuckDB (q56's lag + cumulative-flag SQL). This pins the
    * state machine's THREE close paths — in-batch gap, cross-batch
    * gap, watermark timeout — against the closed-form answer: no
    * session lost, split, or double-emitted on the way to quiescence.
    *
    * Determinism: (user_id, ts) is unique in the table, so the state
    * machine's in-order double fold replays exactly as DuckDB's
    * `list_reduce` over `value ORDER BY us`; rounded to 6 decimals.
    *
    * Scale: state is one small struct per ACTIVE (user, session),
    * evicted by the event-time timeout — unbounded history holds
    * ~|active users| state regardless of stream length. */
  def q99(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamOps
    import s.implicits._
    val work = graft.util.Workspace.temp("graft-q99")
    val landing = s"$work/landing"
    val ev = Tables.events(s, d).filter(col("user_id") < 50)
      .select(col("user_id"), col("ts"), col("value"))
    ev.repartition(8).write.mode("overwrite").parquet(landing)
    val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
    def drain(): Unit = {
      val in = s.readStream.schema(ev.schema).parquet(landing)
        .as[StreamOps.Event]
      // state width = landing fan-in (8), not the batch shuffle width —
      // one small struct per active user; see StreamOps.sizedStateStart
      StreamOps.sizedStateStart(s, 8) {
        StreamOps.sessionize(in, gapMillis = 1800L * 1000, watermark = "30 minutes")
          .writeStream.format("parquet")
          .option("path", s"$work/sink")
          .option("checkpointLocation", s"$work/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
      }.awaitTermination()
    }
    drain()
    // sentinel user far past max ts: the second drain's watermark passes
    // every real lastSeen+gap, firing the event-time timeouts; the
    // sentinel's own session never closes and is filtered
    Seq(StreamOps.Event(999999L,
        new java.sql.Timestamp(maxTs.getTime + 8L * 3600 * 1000), 0.0))
      .toDS().toDF().write.mode("append").parquet(landing)
    drain()
    s.read.parquet(s"$work/sink")
      .filter(col("user_id") =!= 999999L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events").cast("long").as("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val q99Sql: String = """
    WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS us
               FROM events WHERE user_id < 50),
    f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                           OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
          FROM f)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(value ORDER BY us)), (a, b) -> a + b), 6) AS total_value
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""

  /** q100: watermarked STREAM-STREAM interval join
    * ([[graft.streaming.StreamOps.intervalJoin]]), oracle-checked —
    * click→purchase attribution: every click pairs with the same
    * user's purchases inside the following 6 hours. Both sides drain
    * as file streams; the inner join emits each match as both rows
    * arrive (append mode needs no close for INNER joins — the
    * watermark's job here is STATE EVICTION: a buffered row dies once
    * the other side's watermark passes its window, so state tracks the
    * in-flight 6-hour window, never stream history). The oracle is the
    * identical range join in DuckDB — row-exact, no folds. */
  def q100(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StreamOps
    val work = graft.util.Workspace.temp("graft-q100")
    val landing = s"$work/landing"
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    ev.repartition(8).write.mode("overwrite").parquet(landing)
    def side(t: String, idAs: String, tsAs: String) =
      s.readStream.schema(ev.schema).parquet(landing)
        .filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
    val joined = StreamOps.intervalJoin(
        side("click", "click_id", "click_ts"),
        side("purchase", "purchase_id", "purchase_ts"),
        "user_id", "click_ts", "purchase_ts",
        withinSecs = 21600, watermark = "1 hour")
      .select(col("l.user_id").as("user_id"),
        col("l.click_id").as("click_id"), col("l.click_ts").as("click_ts"),
        col("r.purchase_id").as("purchase_id"),
        col("r.purchase_ts").as("purchase_ts"))
    // state width = landing fan-in (8): the interval join keeps FOUR
    // state stores per partition, so the session's 32-wide batch
    // default paid 128 store commits per trigger (incl. the no-data
    // batch) to buffer a 6-hour window of ~50 users — measured at
    // 85-90% of the query; see StreamOps.sizedStateStart
    StreamOps.sizedStateStart(s, 8) {
      joined.writeStream.format("parquet")
        .option("path", s"$work/sink")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }.awaitTermination()
    // explicit schema: a selective join can legitimately emit NOTHING
    // (no click→purchase inside the window), leaving a data-file-less
    // sink that schema inference would refuse to read
    s.read.schema(joined.schema).parquet(s"$work/sink")
      .orderBy(col("click_id"), col("purchase_id"))
  }

  val q100Sql: String = """
    SELECT l.user_id AS user_id, l.event_id AS click_id, l.ts AS click_ts,
           r.event_id AS purchase_id, r.ts AS purchase_ts
    FROM events l JOIN events r ON l.user_id = r.user_id
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
      AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 21600 SECONDS
    ORDER BY click_id, purchase_id"""

  /** q108: STREAMING frequent-token mining — the q104 operator run as
    * a drift monitor on a live feed. The corpus token stream drains as
    * a FILE STREAM (one file per micro-batch) through a complete-mode
    * global aggregation holding a [[graft.plans.MisraGriesAgg]] sketch,
    * so the sketch state round-trips the state store (serialize /
    * deserialize / merge) on every trigger. The final sketch's
    * candidates are then re-counted exactly against the same landed
    * data, and the result hash-matches q104's plain-batch oracle — a
    * proof that the mergeable-MG combine preserves the superset
    * guarantee across micro-batch state persistence, not just across
    * in-memory partials.
    *
    * Scale: streaming state is ONE row of ≤ k (term, count) entries no
    * matter the feed size; each micro-batch contributes k-bounded
    * partials. The exact re-count is the q104 broadcast shape. */
  def q108(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions.tokens
    val work = graft.util.Workspace.temp("graft-q108")
    val landing = s"$work/landing"
    Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("term"))
      .repartition(6).write.mode("overwrite").parquet(landing)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType)))
    // unique memory-sink name: q108 may run more than once per session
    val sinkName = "q108sk_" + java.lang.Long.toHexString(
      java.nio.file.Paths.get(work).getFileName.toString.hashCode.toLong & 0xffffffffL)
    val in = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val writer = in.groupBy()
      .agg(count(lit(1)).as("n"),
        call_function("graft_misra_gries", col("term"), lit(100)).as("sk"))
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    // global aggregation = ONE state row total; a 32-wide state
    // shuffle paid 31 empty store commits per trigger × 6 triggers —
    // see StreamOps.sizedStateStart
    graft.streaming.StreamOps.sizedStateStart(s, 1)(writer.start())
      .awaitTermination()
    val cands = s.table(sinkName)
      .select(explode(col("sk")).as("c"), col("n"))
      .select(col("c.term").as("term"), col("n"))
    s.read.parquet(landing)
      .join(broadcast(cands), Seq("term"))
      .groupBy(col("term"), col("n"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") * 50 >= col("n") * 1)
      .select(col("term"), col("freq"))
      .orderBy(col("freq").desc, col("term"))
  }

  /** q114: perceptual-hash image dedup
    * ([[Multimodal.imageNearDupPairs]]) — decode-inline aHash
    * signatures, hash-bucket self-join, exact feature verify: the
    * image-side twin of text digest dedup. The corpus carries no
    * duplicate payloads at this SF, so the landing zone is planted:
    * every 25th image re-enters under id+100000 (a re-crawled mirror),
    * and exactly those pairs must come back — the ~490 same-phash
    * birthday collisions among the 8-bit hashes of distinct images
    * must all die at the feature verify. The oracle replays the
    * md5-derived stub decode, the planted union, the mean-threshold
    * bit construction, and both join predicates. */
  def q114(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val planted = docs.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    Multimodal.imageNearDupPairs(Multimodal.repartitionBySize(
      Multimodal.mediaFromDocuments(docs.unionByName(planted)), 8))
  }

  val q114Sql: String = {
    def hexLong8(src: String) =
      s"""list_reduce(list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef', substring($src, CAST(i AS INT), 1)) - 1 AS BIGINT)),
        (a, x) -> a * 16 + x)"""
    val fList = s"""list_transform(range(0, 8), j ->
      CAST(${hexLong8("md5(md5(text) || '/' || CAST(j AS VARCHAR))")} % 1000 AS DOUBLE) / 1000.0)"""
    s"""
    WITH media AS (SELECT doc_id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 100000, text FROM documents
                   WHERE doc_id % 25 = 0),
    sig AS (SELECT doc_id AS media_id, $fList AS f FROM media),
    m AS (SELECT media_id, f,
            list_reduce(list_prepend(0.0, f), (a, x) -> a + x)
              / CAST(len(f) AS DOUBLE) AS mean FROM sig),
    h AS (SELECT media_id, f,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, 8), j ->
                CASE WHEN f[CAST(j + 1 AS INT)] > mean
                  THEN CAST(round(pow(2, CAST(j AS INT))) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END)),
              (a, x) -> a + x) AS BIGINT) AS phash FROM m)
    SELECT x.media_id AS a, y.media_id AS b, x.phash AS phash
    FROM h x JOIN h y
      ON x.phash = y.phash AND x.media_id < y.media_id AND x.f = y.f
    ORDER BY a, b"""
  }

  /** q119: radius-parametric perceptual-hash image dedup
    * ([[Multimodal.imageNearDupPairsRadius]]) — pairs within Hamming
    * radius 2 over the stub codec's 8-bit aHash, blocked into 3
    * disjoint bit slices (pigeonhole-total recall). The oracle
    * computes the EXACT all-pairs Hamming filter with no blocking at
    * all, so the hash check proves the banded plan loses no pair
    * within the radius — the recall identity, adjudicated end to end.
    * Runs over every 4th document to keep the radius-2 pair count
    * fixture-sized. */
  def q119(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 4 === 0)
    Multimodal.imageNearDupPairsRadius(Multimodal.repartitionBySize(
      Multimodal.mediaFromDocuments(docs), 8), maxHamming = 2, hashBits = 8)
  }

  val q119Sql: String = {
    def hexLong8(src: String) =
      s"""list_reduce(list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef', substring($src, CAST(i AS INT), 1)) - 1 AS BIGINT)),
        (a, x) -> a * 16 + x)"""
    val fList = s"""list_transform(range(0, 8), j ->
      CAST(${hexLong8("md5(md5(text) || '/' || CAST(j AS VARCHAR))")} % 1000 AS DOUBLE) / 1000.0)"""
    s"""
    WITH media AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
    sig AS (SELECT doc_id AS media_id, $fList AS f FROM media),
    m AS (SELECT media_id, f,
            list_reduce(list_prepend(0.0, f), (a, x) -> a + x)
              / CAST(len(f) AS DOUBLE) AS mean FROM sig),
    h AS (SELECT media_id,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, 8), j ->
                CASE WHEN f[CAST(j + 1 AS INT)] > mean
                  THEN CAST(round(pow(2, CAST(j AS INT))) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END)),
              (a, x) -> a + x) AS BIGINT) AS phash FROM m)
    SELECT x.media_id AS a, y.media_id AS b,
           CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS dist
    FROM h x JOIN h y ON x.media_id < y.media_id
    WHERE bit_count(xor(x.phash, y.phash)) <= 2
    ORDER BY a, b"""
  }

  /** q120: STREAMING LM-perplexity scoring
    * ([[graft.curation.LangModel.scoreBigramStream]]) — the q104→q108
    * pattern applied to the LM family: the bigram model trains once in
    * batch and persists its three count tables, then the documents
    * arrive as a file stream and every micro-batch scores via
    * `foreachBatch` against the frozen artifact. Scoring is
    * per-document and the model is frozen, so the union of the batch
    * outputs must equal batch scoring exactly — q81's oracle
    * adjudicates the streaming path unchanged. */
  def q120(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions.tokens
    val base = Tables.documents(s, d)
    val work = graft.util.Workspace.temp("graft-q120")
    graft.curation.LangModel.trainBigramModel(base, col("doc_id"),
      tokens(lower(col("text"))), s"$work/model")
    val in = graft.streaming.ScoreStream.feed(
      base.select(col("doc_id"), col("text")), s"$work/landing", files = 3)
    graft.curation.LangModel.scoreBigramStream(in, col("doc_id"),
      tokens(lower(col("text"))), s"$work/model", s"$work/scored", s"$work/ckpt")
    val scored = graft.streaming.ScoreStream.output(s, s"$work/scored")
      .withColumnRenamed("__id", "doc_id")
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("xent"), 6).as("xent"))
      .orderBy(col("doc_id"))
  }

  /** q122: STREAMING classifier scoring
    * ([[graft.curation.Classifier.scoreNbStream]]) — q120's pattern
    * for the NB family: train once in batch, persist the five count
    * tables, score the live document stream per micro-batch against
    * the frozen artifact. q97's oracle adjudicates the streaming path
    * unchanged. */
  def q122(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions.tokens
    val base = Tables.documents(s, d)
    val work = graft.util.Workspace.temp("graft-q122")
    graft.curation.Classifier.trainNbModel(base, col("doc_id"),
      tokens(lower(col("text"))), col("source"), s"$work/model")
    val in = graft.streaming.ScoreStream.feed(
      base.select(col("doc_id"), col("source"), col("text")), s"$work/landing",
      files = 3)
    graft.curation.Classifier.scoreNbStream(in, col("doc_id"),
      tokens(lower(col("text"))), col("source"),
      s"$work/model", s"$work/scored", s"$work/ckpt")
    graft.streaming.ScoreStream.output(s, s"$work/scored")
      .withColumnRenamed("__id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** q126: incremental image dedup
    * ([[Multimodal.incrementalImageDedup]]) — the one-sided steady-
    * state shape: the already-ingested corpus (doc_id < 400) persists
    * only `(media_id, phash)`; the incoming batch (doc_id ≥ 400)
    * decodes in-pass and probes at Hamming radius 2. The oracle
    * computes the UNBLOCKED one-sided all-pairs filter, so the hash
    * check is the recall identity for the banded probe, batch-side. */
  def q126(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
    val corpus = Multimodal.imageSignatures(
        media.filter(col("media_id") < 400)).toDF()
      .select(col("media_id"), col("phash"))
    Multimodal.incrementalImageDedup(media.filter(col("media_id") >= 400),
      corpus, maxHamming = 2, hashBits = 8)
  }

  val q126Sql: String = {
    def hexLong8(src: String) =
      s"""list_reduce(list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef', substring($src, CAST(i AS INT), 1)) - 1 AS BIGINT)),
        (a, x) -> a * 16 + x)"""
    val fList = s"""list_transform(range(0, 8), j ->
      CAST(${hexLong8("md5(md5(text) || '/' || CAST(j AS VARCHAR))")} % 1000 AS DOUBLE) / 1000.0)"""
    s"""
    WITH sig AS (SELECT doc_id AS media_id, $fList AS f FROM documents),
    m AS (SELECT media_id, f,
            list_reduce(list_prepend(0.0, f), (a, x) -> a + x)
              / CAST(len(f) AS DOUBLE) AS mean FROM sig),
    h AS (SELECT media_id,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, 8), j ->
                CASE WHEN f[CAST(j + 1 AS INT)] > mean
                  THEN CAST(round(pow(2, CAST(j AS INT))) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END)),
              (a, x) -> a + x) AS BIGINT) AS phash FROM m)
    SELECT n.media_id AS new_id, c.media_id AS corpus_id,
           CAST(bit_count(xor(n.phash, c.phash)) AS BIGINT) AS dist
    FROM h n JOIN h c ON n.media_id >= 400 AND c.media_id < 400
    WHERE bit_count(xor(n.phash, c.phash)) <= 2
    ORDER BY new_id, corpus_id"""
  }

  /** q127: STREAMING DSIR gate ([[graft.curation.Dsir.gateStream]]) —
    * data selection on a live feed: the importance-ratio table trains
    * once and freezes (full bucket domain, so unseen-feed buckets
    * score the smoothed zero-count ratio), then every micro-batch
    * keeps only documents scoring ≥ 0 (more target-like than the
    * corpus base rate). A per-document threshold decomposes over
    * batches where q103's global top-n would not — so the union of
    * gated batches equals the batch filter exactly, and q103's score
    * CTE adjudicates the streaming path with just a WHERE clause. */
  def q127(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions.tokens
    val base = Tables.documents(s, d)
    val work = graft.util.Workspace.temp("graft-q127")
    graft.curation.Dsir.trainDsirModel(base, col("doc_id"),
      tokens(lower(col("text"))), col("lang") === "en",
      numBuckets = 256, modelDir = s"$work/model")
    val in = graft.streaming.ScoreStream.feed(
      base.select(col("doc_id"), col("text")), s"$work/landing", files = 3)
    graft.curation.Dsir.gateStream(in, col("doc_id"),
      tokens(lower(col("text"))), s"$work/model", numBuckets = 256,
      threshold = 0.0, outDir = s"$work/kept", checkpointDir = s"$work/ckpt")
    graft.streaming.ScoreStream.output(s, s"$work/kept")
      .withColumnRenamed("__id", "doc_id")
      .orderBy(col("doc_id"))
  }

  val q127Sql: String = s"""${graft.queries.CurationQueries.dsirScoreCte}
    SELECT doc_id, n_feats, score FROM sc
    WHERE score >= 0.0 ORDER BY doc_id"""

  /** q129: STREAMING fuzzy decontamination
    * ([[graft.dedup.Dedup.decontaminateStream]]) — q123's hygiene pass
    * at crawl time: the eval suite's winnowed fingerprints freeze once
    * ([[graft.dedup.Dedup.trainEvalFingerprints]]), then the non-eval
    * corpus replays as a live feed and every micro-batch probes the
    * frozen set one-sided (the q126 pattern). Flagging is per-document
    * against a frozen artifact, so the union of batch outputs equals
    * the batch pass exactly — q123's oracle adjudicates the streaming
    * path unchanged (the q120/q122/q127 adjudication pattern, now on
    * the [[graft.streaming.ScoreStream]] harness end-to-end). */
  def q129(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val work = graft.util.Workspace.temp("graft-q129")
    graft.dedup.Dedup.trainEvalFingerprints(base,
      col("doc_id") % 10 === 0, modelDir = s"$work/model")
    val in = graft.streaming.ScoreStream.feed(
      base.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text")), s"$work/landing", files = 3)
    graft.dedup.Dedup.decontaminateStream(in, s"$work/model",
      outDir = s"$work/flagged", checkpointDir = s"$work/ckpt")
    graft.streaming.ScoreStream.output(s, s"$work/flagged").orderBy(col("doc_id"))
  }

  /** q135: STREAMING weighted reservoir
    * ([[graft.streaming.Reservoir.streamWeightedSample]]) — q132's
    * Efraimidis–Spirakis draw over a live 6-file feed. The E-S key is
    * mergeable, so the final reservoir equals the batch sample exactly
    * and q132's oracle adjudicates the streaming path unchanged. */
  def q135(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q135")
    val in = graft.streaming.ScoreStream.feed(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      s"$work/landing")
    graft.streaming.Reservoir.streamWeightedSample(s, in,
        idCol = "doc_id", weightCol = "n_chars", n = 200, seed = "0",
        storeDir = s"$work/reservoir", checkpointDir = s"$work/ckpt")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("es_key"), col("rank"))
      .orderBy(col("doc_id"))
  }

  /** q136: STREAMING embedding-space decontamination —
    * [[graft.sim.Similarity.semanticContamination]] against a FROZEN
    * eval set, per micro-batch over a live corpus feed
    * ([[graft.streaming.ScoreStream.replay]]). Per-batch argmax equals
    * the batch argmax (the scoring is per-row against frozen state), so
    * the union of batch appends is q134's answer and q134's oracle
    * adjudicates the streaming path unchanged. */
  def q136(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q136")
    val emb = Tables.embeddings(s, d)
    val isEval = graft.text.TextFunctions.md5Long(
      concat(lit("decon|"), col("vec_id").cast("string"))) % 16 === 0
    val evalSet = emb.filter(isEval)
    val in = graft.streaming.ScoreStream.feed(
      emb.filter(!isEval), s"$work/landing", files = 3)
    graft.streaming.ScoreStream.replay(in, Seq(evalSet),
      outDir = s"$work/report", checkpointDir = s"$work/ckpt") { batch =>
      graft.sim.Similarity.semanticContamination(batch, evalSet, threshold = 0.25)
    }
    graft.streaming.ScoreStream.output(s, s"$work/report").orderBy(col("vec_id"))
  }

  /** q139: STREAMING CDC duplication gate — q138's coverage scoring
    * against the FROZEN reference chunk-digest set, per micro-batch
    * over a live feed ([[graft.streaming.ScoreStream.replay]]). A
    * document is one feed row, so its chunks never straddle batches
    * and the per-doc coverage is batch-local; scoring is against
    * frozen state, so the union of batch appends is q138's answer and
    * q138's oracle adjudicates the streaming path unchanged. */
  def q139(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q139")
    val base = Tables.documents(s, d)
    val refD = graft.dedup.Dedup.cdcDigests(
      base.filter(col("doc_id") % 10 === 0), k = 3, p = 8)
    val in = graft.streaming.ScoreStream.feed(
      base.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text")),
      s"$work/landing", files = 3)
    graft.streaming.ScoreStream.replay(in, Seq(refD),
      outDir = s"$work/coverage", checkpointDir = s"$work/ckpt") { batch =>
      graft.dedup.Dedup.cdcCoverage(batch, refD, k = 3, p = 8)
    }
    graft.streaming.ScoreStream.output(s, s"$work/coverage").orderBy(col("doc_id"))
  }

  /** q144: STREAMING stratified weighted reservoir — q143's
    * per-language quota draw over a live feed: the E-S merge property
    * holds within each stratum, so the n·|strata|-row store equals the
    * batch stratified sample at every trigger and q143's oracle
    * adjudicates unchanged. */
  def q144(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q144")
    val in = graft.streaming.ScoreStream.feed(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      s"$work/landing")
    graft.streaming.Reservoir.streamWeightedSample(s, in,
        idCol = "doc_id", weightCol = "n_chars", n = 40, seed = "0",
        storeDir = s"$work/reservoir", checkpointDir = s"$work/ckpt",
        strata = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("es_key"), col("rank"))
      .orderBy(col("doc_id"))
  }

  /** q140: STREAMING histogram quantiles — q125's corpus length
    * profile over a live feed via the mergeable value-count store
    * ([[graft.streaming.CountStream]]): (lang, n_chars, count) is the
    * operator's complete sufficient statistic, merges by commutative
    * integer sum, and the weighted read-out
    * ([[graft.curation.HistQuantiles.weightedQuantiles]]) replays the
    * identical arithmetic — q125's oracle adjudicates unchanged. */
  def q140(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q140")
    val in = graft.streaming.ScoreStream.feed(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      s"$work/landing")
    val counts = graft.streaming.CountStream.accumulate(s, in,
      s"$work/store", s"$work/ckpt", Seq("lang", "x"), "c") { b =>
      b.groupBy(col("lang"), col("n_chars").as("x")).agg(count(lit(1)).as("c"))
    }
    graft.curation.HistQuantiles.weightedQuantiles(counts,
        col("lang"), col("x"), col("c"), bins = 64, qs = Seq(0.5, 0.9, 0.99))
      .withColumnRenamed("grp", "lang")
  }

  /** q141: STREAMING source-KL drift — q105 over a live feed: the
    * (group, term, c_gt) table is klDrift's sufficient statistic;
    * [[graft.text.CorpusStats.klDriftFromCounts]] reads the
    * accumulated store out through the identical tail, so q105's
    * oracle adjudicates unchanged. The scale contract is the bounded
    * term vocabulary (the same bound q105 itself carries). */
  def q141(s: SparkSession, d: String): DataFrame = {
    import graft.text.TextFunctions.tokens
    val work = graft.util.Workspace.temp("graft-q141")
    val in = graft.streaming.ScoreStream.feed(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
      s"$work/landing")
    val gt = graft.streaming.CountStream.accumulate(s, in,
      s"$work/store", s"$work/ckpt", Seq("group", "term"), "c_gt") { b =>
      b.select(col("source").as("group"),
          explode(tokens(lower(col("text")))).as("term"))
        .groupBy(col("group"), col("term")).agg(count(lit(1)).as("c_gt"))
    }
    graft.text.CorpusStats.klDriftFromCounts(gt)
      .withColumnRenamed("group", "source")
  }

  /** q150: STREAMING duplicate clusters
    * ([[graft.streaming.ClusterStream]]) — q51's connected components
    * maintained incrementally as documents land: per batch, LSH edges
    * (batch-internal + a one-sided probe of the persisted signature
    * store) fold into a bucketed label store, recomputing only the
    * components those edges touch. The fold invariant is that the
    * labels equal the batch CC over all pairs seen, so q51's
    * recursive-CTE oracle adjudicates the streaming path unchanged.
    *
    * Fed as THREE one-file triggers: the incremental coverage needs a
    * fresh-store fold, a cross-batch probe and a bridging merge —
    * three boundaries buy all three while not pricing the per-trigger
    * floor twice more for nothing (the r14 six-trigger feed measured
    * ~2x this floor; q153 is the 2-trigger mega-batch twin and the
    * deep multi-fold orderings live in ClusterStreamSpec's soaks). */
  def q150(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q150")
    val in = graft.streaming.ScoreStream.feed(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      s"$work/landing", files = 3)
    graft.streaming.ClusterStream.streamClusters(s, in,
        s"$work/store", s"$work/ckpt")
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** q151: STREAMING corpus diff ([[graft.streaming.DiffStream]]) —
    * q148's delta read-out with the "after" corpus arriving live: the
    * after side's (digest, count, example) statistic merges per batch
    * through the mergeable-store discipline and reads out through the
    * batch diff's own tail, so q148's oracle adjudicates unchanged. */
  def q151(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q151")
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val after = base.filter(col("doc_id") % 7 =!= 0)
      .unionAll(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
    val in = graft.streaming.ScoreStream.feed(after, s"$work/landing")
    graft.streaming.DiffStream.streamCorpusDiff(s, base, in,
        s"$work/store", s"$work/ckpt")
      .orderBy(col("digest"))
  }

  /** q152: STREAMING keep-best retention — q121's quality-aware
    * cluster retention read off the INCREMENTALLY MAINTAINED label
    * store instead of a fresh CC run: the feed drains through
    * [[graft.streaming.ClusterStream]], then the retention tail
    * ([[graft.dedup.Dedup.keepBestFromLabels]] — the same code the
    * batch operator runs) ranks each maintained cluster by
    * (n_chars desc, doc_id). The fold invariant (labels ≡ batch CC at
    * every trigger) makes q121's oracle adjudicate unchanged — the
    * hash pins the maintained clustering AND which member survives.
    * Three one-file triggers, as q150 (same floor-vs-coverage trade). */
  def q152(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q152")
    val base = Tables.documents(s, d)
    val in = graft.streaming.ScoreStream.feed(
      base.select(col("doc_id"), col("text")), s"$work/landing", files = 3)
    val labels = graft.streaming.ClusterStream.streamClusters(s, in,
      s"$work/store", s"$work/ckpt")
    graft.dedup.Dedup.keepBestFromLabels(
        base.withColumn("n_chars", length(col("text"))),
        "doc_id", "n_chars", labels)
      .orderBy(col("doc_id"))
  }

  /** q153: q150's drain with MEGA-BATCH landing — the same corpus in 2
    * triggers instead of 6 (`maxFilesPerTrigger=3`): each fold's fixed
    * cost (plan + store write + job overhead, AQE off inside
    * foreachBatch) is per-TRIGGER, so batching the landing amortizes
    * the floor — the production knob for a backlogged stream. The fold
    * invariant is trigger-boundary-independent, so the q51 oracle
    * adjudicates unchanged; the q150-vs-q153 bench delta measures the
    * floor-vs-work split (docs/PERF.md round-12). */
  def q153(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q153")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.repartition(6).write.mode("overwrite").parquet(s"$work/landing")
    val in = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 3).parquet(s"$work/landing")
    graft.streaming.ClusterStream.streamClusters(s, in,
        s"$work/store", s"$work/ckpt")
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** q154: q150's clustering against a MAINTAINED store — the
    * operational lifecycle inside one query: drain half the corpus
    * (one mega-batch), run [[graft.streaming.ClusterStream.compactStores]]
    * (the sig bulk re-lands id-bucket partitioned, the band bulk
    * band-key partitioned — the LSM read-optimized layout), then drain
    * the rest on the SAME lineage, so the second fold probes the
    * compacted bulk through both partition prunes (candidate
    * id-buckets + batch band-key buckets + sentinel flat tail) and
    * rewrites labels through the denormalized comp index. Compaction
    * preserves content exactly and the fold invariant is
    * trigger-boundary-independent, so the q51 oracle adjudicates
    * unchanged — the maintenance machinery sits under the driver's
    * correctness gate, not just specs. */
  def q154(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q154")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def land(part: DataFrame): Unit = part.repartition(3)
      .write.mode("append").parquet(s"$work/landing")
    def drain(): DataFrame = {
      val in = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 3).parquet(s"$work/landing")
      graft.streaming.ClusterStream.streamClusters(s, in,
        s"$work/store", s"$work/ckpt")
    }
    land(docs.filter(col("doc_id") % 2 === 0))
    drain()
    graft.streaming.ClusterStream.compactStores(s, s"$work/store", minDirs = 2)
    land(docs.filter(col("doc_id") % 2 =!= 0))
    drain()
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** q155: the retention horizon under the driver's gate — the one
    * maintenance op q154 left to specs. Two single-trigger drains give
    * a DETERMINISTIC batch↔docs mapping (batch 0 = doc_id % 4 == 0,
    * batch 1 = doc_id % 4 == 2; no per-trigger file limit, so each
    * drain is one micro-batch), then
    * [[graft.streaming.ClusterStream.expire]] cuts the horizon at
    * batch 1: every batch-0 doc expires, the labels recompute as the
    * retained-window CC from the persisted per-batch verified edges
    * (an expired bridge SPLITS its component), and the read-out must
    * equal a from-scratch batch clustering of the retained quarter
    * only — which is exactly what the oracle computes (q51's
    * recursive-CTE CC restricted to doc_id % 4 = 2). */
  def q155(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q155")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def land(part: DataFrame): Unit = part.repartition(3)
      .write.mode("append").parquet(s"$work/landing")
    def drain(): Unit = {
      val in = s.readStream.schema(docs.schema).parquet(s"$work/landing")
      graft.streaming.ClusterStream.streamClusters(s, in,
        s"$work/store", s"$work/ckpt")
      ()
    }
    // quarter-corpus halves: this expiry is the WORST case for the
    // touched-partition cut — batch 0 and batch 2 docs interleave in
    // every cluster, so nearly every component (and its label buckets)
    // is touched; production expiries with mostly-disjoint horizons pay
    // only the touched fraction. The bench slice stays bounded and the
    // adjudication corpus-size-independent either way
    land(docs.filter(col("doc_id") % 4 === 0)); drain() // batch 0
    land(docs.filter(col("doc_id") % 4 === 2)); drain() // batch 1
    graft.streaming.ClusterStream.expire(s, s"$work/store", fromBatch = 1)
    graft.streaming.ClusterStream.clusters(s, s"$work/store")
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
      .orderBy(col("doc_id"))
  }

  val q155Sql: String = s"""
    WITH RECURSIVE
    ${graft.queries.CurationQueries.jaccardCompCteSql("cluster",
      "doc_id % 4 = 2")}
    SELECT doc_id, cluster FROM comp ORDER BY doc_id"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q31_multimodal_decode", q31 _, Some(q31Sql)),
    ("q32_frame_sample", q32 _, Some(q32Sql)),
    ("q33_ingest_pipeline", q33 _, Some(q33Sql)),
    ("q34_stream_ingest", q34 _, Some(q34Sql)),
    ("q35_schema_evolution", q35 _, Some(q35Sql)),
    ("q36_event_decode", q36 _, Some(q36Sql)),
    ("q37_sql_passthrough", q37 _, Some(passthroughSql)),
    ("q40_telemetry", q40 _, Some(q40Sql)),
    ("q41_enqueue_roundtrip", q41 _, Some(q41Sql)),
    ("q45_compaction", q45 _, Some(q45Sql)),
    ("q53_csv_ingest", q53 _, Some(q53Sql)),
    ("q60_replay_dedup", q60 _, Some(q60Sql)),
    ("q61_audio_decode", q61 _, Some(q61Sql)),
    ("q63_loadlog_rollup", q63 _, Some(q63Sql)),
    ("q77_rule_fanout", q77 _, Some(q77Sql)),
    ("q78_rego_ingest", q78 _, Some(q78Sql)),
    ("q85_windowed_agg", q85 _, Some(q85Sql)),
    ("q96_rego_general", q96 _, Some(q96Sql)),
    ("q99_stream_sessionize", q99 _, Some(q99Sql)),
    ("q100_stream_interval_join", q100 _, Some(q100Sql)),
    ("q108_stream_heavy_hitters", q108 _,
      Some(graft.queries.CurationQueries.q104Sql)),
    ("q114_image_dedup", q114 _, Some(q114Sql)),
    ("q119_image_neardup_radius", q119 _, Some(q119Sql)),
    ("q120_stream_lm_score", q120 _,
      Some(graft.queries.CurationQueries.q81Sql)),
    ("q122_stream_nb_score", q122 _,
      Some(graft.queries.CurationQueries.q97Sql)),
    ("q126_incremental_image_dedup", q126 _, Some(q126Sql)),
    ("q127_stream_dsir_gate", q127 _, Some(q127Sql)),
    ("q129_stream_decontam", q129 _,
      Some(graft.queries.CurationQueries.q123Sql)),
    ("q130_bigquery_pipeline", q130 _, Some(q33Sql)),
    ("q135_stream_weighted_sample", q135 _,
      Some(graft.queries.CurationQueries.q132Sql)),
    ("q136_stream_semantic_decontam", q136 _,
      Some(graft.queries.CurationQueries.q134Sql)),
    ("q139_stream_cdc_gate", q139 _,
      Some(graft.queries.CurationQueries.q138Sql)),
    ("q140_stream_hist_quantiles", q140 _,
      Some(graft.queries.CurationQueries.q125Sql)),
    ("q141_stream_kl_drift", q141 _,
      Some(graft.queries.CurationQueries.q105Sql)),
    ("q144_stream_stratified_weighted", q144 _,
      Some(graft.queries.CurationQueries.q143Sql)),
    ("q149_audio_neardup", q149 _, Some(q149Sql)),
    ("q150_stream_dedup_clusters", q150 _,
      Some(graft.queries.CurationQueries.q51Sql)),
    ("q151_stream_corpus_diff", q151 _,
      Some(graft.queries.CurationQueries.q148Sql)),
    ("q152_stream_keep_best", q152 _,
      Some(graft.queries.CurationQueries.q121Sql)),
    ("q153_megabatch_clusters", q153 _,
      Some(graft.queries.CurationQueries.q51Sql)),
    ("q154_maintained_clusters", q154 _,
      Some(graft.queries.CurationQueries.q51Sql)),
    ("q155_expired_clusters", q155 _, Some(q155Sql)))
}
