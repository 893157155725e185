package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.rules._
import graft.schema.SchemaMerge

/** Record transform: parsed JSON records → routed, enveloped log rows
  * (the tail of the reference's `importSource`, `pkg/usecase/load.go:186-249`).
  *
  * Output columns (fixed envelope — ref `model/bigquery.go:98-105` — plus
  * routing): `id, ingest_id, timestamp, ingested_at, data` +
  * `dataset, table, partition`.
  *
  * Entirely declarative: explode is a built-in Generator, transforms are
  * `withColumn`/`dropFields`, the default id is md5-of-canonical-JSON
  * (graft.functions.logId) — all codegen-friendly, no UDFs.
  */
object Transform {

  val EnvelopeCols: Seq[String] =
    Seq("id", "ingest_id", "timestamp", "ingested_at", "data")
  val RoutingCols: Seq[String] = Seq("dataset", "table", "partition")

  /** Apply one schema rule to a DataFrame of parsed records (one row per
    * record, record fields as top-level columns). `ingestId` is constant
    * per pipeline invocation (ref: UUIDv4 per table-ingest,
    * `types.go:17,25`).
    *
    * `observeInvalid`: when set, the count of records validation drops is
    * collected DURING whatever action first consumes the returned frame
    * (the destination append) — the caller decides afterwards whether a
    * quarantine pass is needed at all, so the common all-valid ingest
    * never runs an extra emptiness-probe job over the batch.
    */
  def apply(records: DataFrame, rule: SchemaRule, ingestId: String,
      observeInvalid: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val (reshaped, dataCols) = reshape(records, rule)
    val withEnvelope = reshaped
      // a missing id field falls back to the content digest, like no id rule
      .withColumn("__graft_id", rule.id.map(exprOrNull(reshaped, _).cast(StringType))
        .getOrElse(lit(null).cast(StringType)))
    val packed0 = withEnvelope.withColumn("__graft_data",
      struct(dataCols: _*))
    val valid = col("__graft_ds").isNotNull && col("__graft_tbl").isNotNull &&
      col("__graft_ts").isNotNull
    // the metrics node sits BELOW the validity filter, so the dropped
    // rows are counted by the append job itself (count(when) is 0 on an
    // empty batch, never null)
    val packed = observeInvalid.fold(packed0)(obs =>
      packed0.observe(obs, count(when(!valid, lit(1))).as("invalid")))
    val dataSchema = packed.schema("__graft_data").dataType.asInstanceOf[StructType]
    packed
      // record validation (ref model/policy.go:73-89): dataset/table/
      // timestamp are required; invalid logs error out in the reference —
      // we drop-with-metric semantics via filter (strictness configurable
      // at the pipeline level).
      .filter(valid)
      .select(
        coalesce(col("__graft_id"),
          graft.functions.logId(col("__graft_data"), dataSchema)).as("id"),
        lit(ingestId).as("ingest_id"),
        col("__graft_ts").as("timestamp"),
        current_timestamp().as("ingested_at"),
        col("__graft_data").as("data"),
        col("__graft_ds").as("dataset"),
        col("__graft_tbl").as("table"),
        lit(rule.partition).as("partition"))
  }

  /** The rows [[apply]] DROPS: records failing validation (null
    * dataset/table/timestamp after rule evaluation), each with the
    * machine-readable reasons and the record itself re-serialized as
    * JSON. The reference errors the whole object on an invalid log
    * (`pkg/usecase/load.go:213-231` → error); at corpus scale one bad
    * record must not fail a billion-row object, so the pipeline appends
    * these to a quarantine table instead ([[Pipeline]] `_meta.quarantine`)
    * — dropped data is never silent. */
  def invalid(records: DataFrame, rule: SchemaRule, ingestId: String): DataFrame = {
    val (checked, dataCols) = reshape(records, rule)
    checked
      .filter(col("__graft_ds").isNull || col("__graft_tbl").isNull ||
        col("__graft_ts").isNull)
      .select(
        lit(ingestId).as("ingest_id"),
        lit(rule.name).as("rule"),
        array_compact(array(
          when(col("__graft_ds").isNull, lit("dataset_null")),
          when(col("__graft_tbl").isNull, lit("table_null")),
          when(col("__graft_ts").isNull, lit("timestamp_null")))).as("reasons"),
        to_json(struct(dataCols: _*)).as("record"))
  }

  /** Shared head of [[apply]] and [[invalid]] — the two MUST agree on
    * what reaches validation or quarantine contents drift from what
    * apply actually drops.
    *
    * 1. one doc -> N records (ref rule `r := input.Records[_]`);
    * 2. record-level predicate (0 matches -> record dropped, ref
    *    load.go:213);
    * 3. field transforms;
    * 4. routing + envelope exprs evaluated with record fields in scope,
    *    under RESERVED internal names so a record field named
    *    dataset/table/partition/timestamp is packed into `data`
    *    untouched rather than silently replaced by the routing value
    *    (`timestamp` is a common log field) — renamed to the envelope
    *    names only in the caller's final projection, after `data` is
    *    packed.
    *
    * Returns the reshaped frame with `__graft_ds/tbl/ts` appended, plus
    * the record's own column names (the future `data` fields). */
  private def reshape(records: DataFrame, rule: SchemaRule): (DataFrame, Seq[Column]) = {
    val exploded = rule.explodePath match {
      case Some(path) =>
        records.select(explode(col(path)).as("__rec")).select("__rec.*")
      case None => records
    }
    val filtered = rule.when.fold(exploded)(w => exploded.filter(expr(w)))
    // enrichment runs here — after explode/when, before transforms — so
    // BOTH apply and invalid see the enriched record (the quarantine
    // agreement this shared head exists for)
    val enriched = rule.enrich.fold(filtered)(_.transform(filtered))
    val reshaped = rule.transforms.foldLeft(enriched) {
      case (df, DropField(path)) =>
        if (path.contains(".")) {
          val Array(top, rest @ _*) = path.split("\\."): @unchecked
          df.withColumn(top, col(top).dropFields(rest.mkString(".")))
        } else df.drop(path)
      case (df, RenameField(from, to)) => df.withColumnRenamed(from, to)
      case (df, SetField(nm, e)) => df.withColumn(nm, expr(e))
    }
    // the columns `data` packs: a dataSelect REPLACES the record (the
    // reference's reshaped `"data": {…}` — new object, not a patch),
    // evaluated here so routing/id/timestamp below still see the full
    // record; absent fields degrade per-column to null like rule exprs
    val dataCols = rule.dataSelect match {
      case Some(fields) => fields.map { case (n, e) => exprOrNull(reshaped, e).as(n) }
      case None => reshaped.columns.toSeq.map(col)
    }
    val checked = reshaped
      .withColumn("__graft_ds", exprOrNull(reshaped, rule.dataset).cast(StringType))
      .withColumn("__graft_tbl", exprOrNull(reshaped, rule.table).cast(StringType))
      .withColumn("__graft_ts",
        toTimestamp(exprOrNull(reshaped, rule.timestamp), reshaped, rule.timestamp))
    (checked, dataCols)
  }

  /** Rule exprs referencing fields ABSENT from the whole batch (a field
    * the objects simply don't carry) must not fail the batch with an
    * analysis error — they evaluate to null, so validation routes every
    * record to quarantine with the usual `*_null` reason. The reference
    * has the same shape: an undefined Rego reference yields no output →
    * invalid log (`pkg/usecase/load.go:213-216`); we quarantine where it
    * errors the object.
    *
    * ONLY unresolved column/field references degrade — any other
    * analysis error (unknown function, type mismatch: a mis-WRITTEN
    * rule, not mis-shaped data) still fails loudly; swallowing those
    * would silently quarantine 100% of every batch on a config typo.
    * Structural rule config (explodePath, SetField transforms) likewise
    * stays loud by design. */
  private def exprOrNull(df: DataFrame, e: String): Column = {
    val c = expr(e)
    try { df.select(c); c }
    catch {
      case ae: org.apache.spark.sql.AnalysisException
          if Option(ae.getCondition).exists(cls =>
            cls.startsWith("UNRESOLVED_COLUMN") ||
              cls.startsWith("FIELD_NOT_FOUND") ||
              cls.startsWith("UNRESOLVED_FIELD")) =>
        lit(null)
    }
  }

  /** Interpret the rule's timestamp expr by type: DOUBLE Unix seconds
    * (the reference's float64 contract, `policy.go:69`), native
    * timestamp/date, or an RFC3339-ish string. */
  private def toTimestamp(c: Column, df: DataFrame, raw: String): Column = {
    val t = df.select(c.as("__t")).schema.head.dataType
    t match {
      case _: NumericType => graft.functions.floatSecondsToTimestamp(c)
      case TimestampType => c
      case DateType => c.cast(TimestampType)
      case StringType => to_timestamp(c)
      case NullType => c.cast(TimestampType) // absent field → quarantine path
      case other => sys.error(s"timestamp expr '$raw' has unusable type $other")
    }
  }

  /** Strip null-only fields from the routed rows' `data` struct — the
    * schema-level equivalent of the reference's per-record
    * `cloneWithoutNil` (`pkg/usecase/utils.go:14-154`): a field that is
    * null in EVERY row of the batch carries no type and must not reach
    * the table schema. (Per-ROW null values inside an otherwise-typed
    * field are fine — parquet stores them as nulls, same as BigQuery.)
    */
  def pruneDataSchema(routed: DataFrame): DataFrame = {
    val dataSchema = routed.schema("data").dataType.asInstanceOf[StructType]
    val pruned = SchemaMerge.pruneNullTypes(dataSchema)
    if (pruned == dataSchema) routed
    else routed.withColumn("data",
      graft.functions.alignStruct(col("data"), dataSchema, pruned))
  }
}
