package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative rule config — the Spark-native replacement for the
  * reference's Rego policy surface (SURVEY §2.8).
  *
  * The reference evaluates `package event` over object metadata to decide
  * how to parse (ref `pkg/usecase/event.go:11-21`, grammar
  * `docs/rule.md:17-124`) and `package schema.{name}` per record to
  * transform and route (ref `pkg/usecase/load.go:205-245`). Every observed
  * rule uses primitives Spark SQL already has (`startswith`, `split`,
  * `lower`, `json.patch` remove, rfc3339 parse — SURVEY §2.6 F8), so
  * rules here are plain Spark SQL expression strings compiled to
  * [[Column]]s: predicates stay in whole-stage codegen and benefit from
  * pushdown, unlike an interpreted policy engine.
  */

/** Parse directive — the reference's `Source` (`model/policy.go:25-30`):
  * which parser/compression to use and which schema rule to apply.
  * `parser` must be "json"; `compress` "gzip" or empty (validated like
  * ref `types.go:132-143`; gzip is transparent to Spark by extension).
  */
final case class EventRule(
    name: String,
    /** Boolean Spark SQL over object metadata columns
      * (`bucket`, `name`, `size`, `created_at`, `md5`). */
    when: String,
    /** Object format: `json` (NDJSON or, with [[multiDoc]], concatenated
      * docs — the reference's only format, `load.go:251-279`), plus
      * `csv` (header + full-scan type inference, matching the JSON
      * path's inference contract) and `parquet` — the formats a mixed
      * landing zone actually contains. */
    parser: String = "json",
    compress: String = "",
    /** True when objects are single/concatenated JSON docs rather than
      * NDJSON (the reference auto-detects via its Decoder loop,
      * `load.go:251-279`; we make it a rule property). */
    multiDoc: Boolean = false,
    schemaRule: String) {
  require(Set("json", "csv", "parquet")(parser),
    s"unsupported parser '$parser' (json | csv | parquet)")
  require(parser == "json" || !multiDoc, "multiDoc applies to json only")
  require(compress == "" || compress == "gzip",
    s"unsupported compress '$compress' (ref allows only gzip)")
  def predicate: Column = expr(when)
}

/** One field-level transform on the record (the reference reshapes
  * records arbitrarily in Rego — `json.patch` remove, renames, arithmetic;
  * `docs/rule.md` README example). */
sealed trait TransformOp
/** Remove a (possibly dotted) field — ≡ Rego `json.patch` remove. */
final case class DropField(path: String) extends TransformOp
/** Rename a top-level field. */
final case class RenameField(from: String, to: String) extends TransformOp
/** Add/replace a top-level field from a SQL expr over the record. */
final case class SetField(name: String, sqlExpr: String) extends TransformOp

/** Programmatic enrichment hook — the extensibility seam for what the
  * reference does with arbitrary Rego, including mid-rule `http.send`
  * calls out to enrichment services (`README.md:55-66`; evaluated by
  * `pkg/infra/policy/client.go:143-174`). A rule that needs more than
  * SQL exprs names an Enrichment, which rewrites the RECORD frame
  * (post-explode/filter, pre-transforms) with any DataFrame→DataFrame
  * logic.
  *
  * The Spark-first translation of per-record `http.send` is per-BATCH
  * fetch + broadcast join: pull the lookup once on the driver (or read
  * a reference table), then `records.join(broadcast(lookup), ...)` —
  * same information, O(1) calls per batch instead of O(records), and
  * the join stays in codegen. The hook is deliberately plan-level
  * (DataFrame in, DataFrame out, applied before Catalyst optimizes the
  * whole pipeline) rather than row-level, so an enrichment can never
  * smuggle in a per-row RPC without it being visible in the plan.
  *
  * Enrichments are code, not config — file-loaded rules reference them
  * by name and [[RuleLoader]] resolves against a caller-supplied
  * registry, failing loudly on an unknown name (mis-wired rules must
  * not silently skip a step the quarantine contract depends on).
  *
  * Enrichments MUST be deterministic for a given batch: the hook is
  * invoked once for the append and again for the quarantine pass when
  * validation dropped rows, and Spark itself re-executes plan
  * fragments (task retries, AQE re-optimization) — a transform whose
  * output varies between evaluations desynchronizes quarantine from
  * what validation saw, and can differ even within one action. If the
  * backing source varies over time, fetch ONCE per batch outside the
  * hook and close over the result (`val lookup = fetch(); Enrichment(
  * "geo", _.join(broadcast(lookup), ...))`). */
final case class Enrichment(name: String, transform: DataFrame => DataFrame)

/** Per-record transform + routing — the reference's schema rule output
  * `Log{dataset, table, partition, id, timestamp, data}`
  * (`model/policy.go:64-71`). All string fields are Spark SQL exprs over
  * the record's top-level columns; 0 rule matches drop the record
  * (ref `load.go:213-216`), explode turns one doc into many records
  * (ref fixture rule `r := input.Records[_]`).
  */
final case class SchemaRule(
    name: String,
    /** Optional array field to explode first: one doc → N records. */
    explodePath: Option[String] = None,
    /** Optional boolean SQL filter over the (exploded) record. */
    when: Option[String] = None,
    /** Destination dataset/table — SQL exprs (usually literals). */
    dataset: String,
    table: String,
    /** Time-partition granularity: hour | day | month | year | "" (none)
      * (ref `types.go:51-57`). */
    partition: String = "",
    /** SQL expr for the row id; empty → md5(canonical_json(data)). */
    id: Option[String] = None,
    /** SQL expr yielding the event time: DOUBLE Unix seconds (like the
      * reference's float64 contract), a timestamp, or an RFC3339 string. */
    timestamp: String,
    transforms: Seq[TransformOp] = Nil,
    /** Optional [[Enrichment]] applied to the record frame after
      * explode/when, before transforms — so routing, id, timestamp and
      * transform exprs all see the enriched columns, and the
      * quarantine path sees exactly what validation saw. */
    enrich: Option[Enrichment] = None,
    /** Optional FULL REPLACEMENT of the packed `data` struct:
      * `(name, sqlExpr)` pairs evaluated over the (exploded/enriched/
      * transformed) record — ≡ the reference's reshaped `"data": {…}`
      * object (`docs/rule.md:166-168`), where the emitted data is a new
      * object, NOT a patch. Routing/id/timestamp exprs still see the
      * full record (they are independent log-object fields in the
      * reference), so an id can reference a field the reshape drops.
      * Absent → `data` packs every record column (the `"data": input`
      * common case). */
    dataSelect: Option[Seq[(String, String)]] = None) {
  require(Set("", "hour", "day", "month", "year")(partition),
    s"bad partition unit '$partition'")

  /** When dataset AND table are string LITERALS (`'x'` — the common
    * case; every rule in the reference's examples routes statically),
    * the destination set is known without scanning the batch, so the
    * append path can skip its destination-discovery job entirely.
    * Dynamic routing exprs return None and fall back to the scan. */
  def literalDests: Option[Seq[(String, String, String)]] = {
    val Lit = "^'([^']*)'$".r
    (dataset.trim, table.trim) match {
      case (Lit(d), Lit(t)) => Some(Seq((d, t, partition)))
      case _ => None
    }
  }
}

/** A rule set = the reference's policy directory. */
final case class Rules(event: Seq[EventRule], schema: Seq[SchemaRule]) {
  private val byName = schema.groupBy(_.name)

  /** All schema rules under a name, in declaration order — SET semantics
    * like the reference's Rego `log[d]`: every rule with the name emits
    * for each record, so N rules multiply the record N ways (each with
    * its own explode/when/routing; ref `pkg/usecase/load.go:205-245`
    * iterates the whole output set). The pipeline applies each in turn
    * over the cached batch. */
  def schemaRulesFor(name: String): Seq[SchemaRule] =
    byName.getOrElse(name, sys.error(s"no schema rule '$name'"))

  /** The single schema rule under a name; loud when the name is shared
    * (callers that can only honor one rule must not silently pick one —
    * the pipeline itself uses [[schemaRulesFor]]). */
  def schemaRule(name: String): SchemaRule = schemaRulesFor(name) match {
    case Seq(r) => r
    case rs => sys.error(s"${rs.size} schema rules named '$name' — set " +
      "semantics; use schemaRulesFor")
  }

  /** Event-rule evaluation over an object-metadata DataFrame: each rule
    * that matches fans the object out once (set semantics like Rego
    * `src[s]`; N matches = N parse directives — ref `event.go:11-21`).
    * Returns (rule, matching-objects) pairs; unmatched objects are
    * dropped (ignored object, ref behavior).
    */
  def matchObjects(objects: DataFrame): Seq[(EventRule, DataFrame)] =
    event.map(r => r -> objects.filter(r.predicate))

  /** [[matchObjects]] grouped by matched-rule SET — the parse-sharing
    * discipline: ONE pass over the listing evaluates every rule's
    * predicate and tags each object with the set of rules that matched,
    * so the pipeline can read/parse each object once and fan all its
    * routes out over that copy (the reference's one-download set
    * semantics, `pkg/usecase/load.go:186-249`) instead of once per
    * matching rule. Returns (rule group, their objects) with groups in
    * declared-rule order; the distinct group count is bounded by the
    * config's rule combinations, never ∝ objects. Unmatched objects
    * drop (ignored object, ref behavior).
    *
    * Granularity is deliberate: TOTAL parse work is always ≤ the
    * per-rule alternative (each object parses exactly once, vs once
    * per matching rule), while the fixed per-group overhead (an
    * inference + count job sequence) multiplies with distinct match
    * sets — in principle 2^rules, in any real config a handful. A
    * coarser sharing (one parse over the UNION of all matched objects)
    * would cut that overhead but LEAK inferred fields across rules:
    * rule A's destinations would grow null columns for fields only
    * rule B's objects carry, changing table schemas — so groups stay
    * exactly the objects every rule in the group genuinely matched. */
  def matchGroups(objects: DataFrame): Seq[(Seq[EventRule], DataFrame)] = {
    val tags = array_compact(array(event.zipWithIndex.map {
      case (r, i) => when(r.predicate, lit(i)) }: _*))
    val tagged = objects.withColumn("__rules", tags)
      .filter(size(col("__rules")) > 0)
    import scala.math.Ordering.Implicits.seqOrdering
    tagged.select("__rules").distinct().collect()
      .map(_.getSeq[Int](0).toList).sorted.toSeq
      .map(sig => (sig.map(event(_)),
        tagged.filter(col("__rules") === array(sig.map(i => lit(i)): _*))
          .drop("__rules")))
  }
}
