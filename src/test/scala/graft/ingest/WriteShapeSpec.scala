package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.SchemaRegistry

/** The partitioned-append WRITE SHAPE contract: a batch arriving in many
  * input splits and spanning many time partitions must land as ~one
  * parquet file per partition per batch — NOT tasks×partitions tiny
  * files. Round 3 shipped the anti-pattern (32 splits × 141 day
  * partitions ≈ 4,500 files per ingest, parquet shrinking row groups
  * under 677 concurrent writers); the rebalance-by-`__part` clustering
  * in [[TableSink.appendSlice]] is what these tests pin down. At 100×
  * scale the same shape holds: files per batch grows with the BATCH'S
  * partition span, never with its task count. */
class WriteShapeSpec extends SparkSpec {

  /** parquet files per `__part=` dir of a table's data directory. */
  private def filesPerPartition(dataDir: String): Map[String, Int] = {
    val dirs = Option(new java.io.File(dataDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__part="))
    dirs.map(d => d.getName ->
      d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
  }

  /** Envelope-shaped routed frame: `n` rows across `span` time
    * partitions of `unit`, delivered in 32 input splits (the round-3
    * regression shape). */
  private def routedBatch(n: Int, span: Int, unit: String) = {
    val step = unit.toUpperCase
    spark.range(n)
      .withColumn("ts", expr(
        s"timestampadd($step, CAST(id % $span AS INT), timestamp'2024-01-01 00:00:00')"))
      .select(
        concat(lit("id-"), col("id")).as("id"),
        lit("ing-1").as("ingest_id"),
        col("ts").as("timestamp"),
        current_timestamp().as("ingested_at"),
        struct(col("id").as("v")).as("data"),
        lit("shape_test").as("dataset"),
        lit(s"t_$unit").as("table"),
        lit(unit).as("partition"))
      .repartition(32)
  }

  test("32-split batch over 140 day-partitions writes ONE file per partition") {
    val registry = new SchemaRegistry(tmpDir("shape-day"))
    val res = TableSink.append(spark, registry, routedBatch(20000, 140, "day"))
    assert(res.map(_.logCount).sum == 20000L)
    val files = filesPerPartition(registry.dataDir("shape_test", "t_day"))
    assert(files.size == 140, s"expected 140 day partitions, got ${files.size}")
    val worst = files.maxBy(_._2)
    assert(worst._2 == 1,
      s"partition ${worst._1} got ${worst._2} files — the write must cluster " +
        "by __part so a batch adds one file per partition, not one per task")
  }

  test("hour granularity (10× the partitions) holds the same shape") {
    // the reference supports hour partitioning (types.go:51-57); 1,400
    // hour-partitions is the day-test's span at 10× — the shape must not
    // degrade as partition count grows, only file COUNT (∝ span).
    val registry = new SchemaRegistry(tmpDir("shape-hour"))
    TableSink.append(spark, registry, routedBatch(20000, 1400, "hour"))
    val files = filesPerPartition(registry.dataDir("shape_test", "t_hour"))
    assert(files.size == 1400)
    assert(files.values.max == 1, "hour-partitioned append must also write one file per partition")
  }

  test("events export at hour granularity (~3.4k partitions) holds the shape end-to-end") {
    // the real ingest path on the real events table (ref supports hour
    // partitioning, types.go:51-57): sf0.001's events span ~141 days ≈
    // 3.4k hour-partitions — 2.4× the synthetic hour case, through the
    // full rule pipeline instead of a hand-built routed frame.
    import graft.rules._
    val landing = tmpDir("shape-events-landing")
    val events = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_timestamp(col("ts")).cast("double"))
    events.coalesce(8).write.mode("overwrite").json(landing)
    val expectedParts = events
      .select(date_format(timestamp_seconds(col("ts")), "yyyy-MM-dd-HH"))
      .distinct().count()
    val total = events.count()
    val registry = new SchemaRegistry(tmpDir("shape-events-tables"))
    val rules = Rules(
      event = Seq(EventRule(name = "e", when = "name LIKE '%.json'", schemaRule = "s")),
      schema = Seq(SchemaRule(name = "s", dataset = "'analytics'", table = "'events'",
        partition = "hour", id = Some("cast(event_id as string)"), timestamp = "ts")))
    Pipeline.ingestPrefix(spark,
      Pipeline.Config(registry, rules), s"$landing/part-*")
    assert(TableSink.read(spark, registry, "analytics", "events").count() == total)
    val files = filesPerPartition(registry.dataDir("analytics", "events"))
    assert(files.size == expectedParts,
      s"expected $expectedParts hour partitions, got ${files.size}")
    assert(files.values.max == 1,
      s"one ingest must write one file per hour partition — worst has ${files.values.max}")
  }

  test("a second batch appends one more file per touched partition (not a rewrite)") {
    val registry = new SchemaRegistry(tmpDir("shape-append"))
    TableSink.append(spark, registry, routedBatch(5000, 30, "day"))
    TableSink.append(spark, registry, routedBatch(5000, 30, "day"))
    val files = filesPerPartition(registry.dataDir("shape_test", "t_day"))
    assert(files.size == 30 && files.values.forall(_ == 2),
      s"two batches → exactly two files per partition, got $files")
    // and the table reads back complete
    assert(TableSink.read(spark, registry, "shape_test", "t_day").count() == 10000L)
  }

  test("streaming ingest (foreachBatch) holds the shape: one file per partition per micro-batch") {
    import graft.rules._
    val landing = tmpDir("shape-stream-landing")
    // 8 landing objects × 175 records spanning 35 day-partitions — the
    // q34 shape in miniature (many input splits × many partitions)
    (0 until 8).foreach { f =>
      val lines = (0 until 175).map { i =>
        val ts = 1700000000.0 + ((f * 175 + i) % 35) * 86400.0
        s"""{"log_id": "f$f-$i", "event_time": $ts, "v": $i}"""
      }.mkString("\n")
      writeFile(landing, s"obj$f.json", lines + "\n")
    }
    val registry = new graft.schema.SchemaRegistry(tmpDir("shape-stream-tables"))
    val rules = Rules(
      event = Seq(EventRule(name = "e", when = "name LIKE '%.json'", schemaRule = "s")),
      schema = Seq(SchemaRule(name = "s", dataset = "'d'", table = "'t'",
        partition = "day", id = Some("log_id"), timestamp = "event_time")))
    val q = Pipeline.stream(spark, Pipeline.Config(registry, rules),
      s"$landing/*", tmpDir("shape-stream-ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    assert(TableSink.read(spark, registry, "d", "t").count() == 8L * 175L)
    val files = filesPerPartition(registry.dataDir("d", "t"))
    assert(files.size == 35, s"expected 35 day partitions: ${files.size}")
    assert(files.values.max == 1,
      s"streaming append must cluster by __part too — worst partition has ${files.values.max} files")
  }

  test("filterByPaths: literal isin below the limit, broadcast semi-join above") {
    import spark.implicits._
    val cached = (0 until 2000).map(i => (s"/data/f$i.json", s"line-$i"))
      .toDF("path", "value")
    val few = (0 until 10).map(i => s"/data/f$i.json")
    val many = (0 until 1500).map(i => s"/data/f$i.json")
    val fewF = Pipeline.filterByPaths(cached, few)
    val manyF = Pipeline.filterByPaths(cached, many)
    assert(fewF.count() == 10 && manyF.count() == 1500)
    // plan shape: small set stays a scalar predicate, large set becomes a
    // join (one broadcast hash probe per line, not a 1500-literal In)
    def hasJoin(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    assert(!hasJoin(fewF), "small path sets must keep the literal filter")
    assert(hasJoin(manyF), "large path sets must use the semi-join")
    // membership semantics identical across the switch
    assert(Pipeline.filterByPaths(cached, many).select("path").as[String].collect().toSet
      == many.toSet)
  }
}
