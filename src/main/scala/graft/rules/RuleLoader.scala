package graft.rules

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Rule-config file loading — the reference loads Rego policies from
  * directories/files (`pkg/infra/policy/client.go:35-120`); we load the
  * declarative rule config from JSON files (one file or a directory of
  * `*.json`, merged in filename order). Jackson ships with Spark, so no
  * extra dependency.
  *
  * File shape:
  * {{{
  * { "event": [ { "name": "...", "when": "<bool SQL over object metadata>",
  *                "schemaRule": "...", "parser": "json", "compress": "",
  *                "multiDoc": false } ],
  *   "schema": [ { "name": "...", "dataset": "'d'", "table": "'t'",
  *                 "partition": "day", "timestamp": "<SQL expr>",
  *                 "id": "<SQL expr>",            // optional
  *                 "explodePath": "Records",       // optional
  *                 "when": "<bool SQL>",           // optional
  *                 "transforms": [                  // optional
  *                   { "op": "drop",   "path": "a.b" },
  *                   { "op": "rename", "from": "x", "to": "y" },
  *                   { "op": "set",    "name": "z", "expr": "x * 2" } ],
  *                 "dataSelect": [                  // optional: data is
  *                   { "name": "kb", "expr": "bytes / 1000" } ] } ] }
  *                   // REPLACED by exactly these fields (routing/id/
  *                   // timestamp still see the full record)
  * }}}
  */
object RuleLoader {

  private val mapper = new ObjectMapper()

  def fromFile(path: String,
      enrichments: Map[String, Enrichment] = Map.empty): Rules =
    if (path.endsWith(".rego"))
      graft.rules.rego.RegoRules.compile(Files.readString(Paths.get(path)))
    else fromJson(Files.readString(Paths.get(path)), enrichments)

  /** Load and merge every `*.json` AND `*.rego` under a directory
    * (filename order — deterministic like the reference's sorted
    * policy-dir walk). Rego modules (`package event` / `package
    * schema.<name>`) compile through [[graft.rules.rego.RegoRules]] —
    * TOGETHER, so cross-package `data.<pkg>.<name>` references resolve
    * against sibling data modules in the same directory (OPA's shared
    * `data` document; the reference loads its policy tree the same
    * way). A `package auth` module in the directory fails loudly (auth
    * is request-path config — [[graft.rules.rego.RegoAuth]]), never
    * silently unenforced. `enrichments` is the caller's code registry
    * for rules that name an `"enrich"` hook (see [[Enrichment]]). */
  def fromDir(dir: String,
      enrichments: Map[String, Enrichment] = Map.empty): Rules = {
    val stream = Files.list(Paths.get(dir))
    val files =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".json") || p.toString.endsWith(".rego"))
        .toSeq.sortBy(_.toString)
      finally stream.close()
    require(files.nonEmpty, s"no *.json or *.rego rule files under $dir")
    val (rego, json) = files.partition(_.toString.endsWith(".rego"))
    val regoRules =
      if (rego.isEmpty) Nil
      else Seq(graft.rules.rego.RegoRules.compileAll(
        rego.map(p => Files.readString(p))))
    val jsonRules = json.map(p => fromFile(p.toString, enrichments))
    (regoRules ++ jsonRules)
      .reduce((a, b) => Rules(a.event ++ b.event, a.schema ++ b.schema))
  }

  def fromJson(json: String,
      enrichments: Map[String, Enrichment] = Map.empty): Rules = {
    val root = mapper.readTree(json)
    val events = arr(root, "event").map { n =>
      EventRule(
        name = req(n, "name"),
        when = req(n, "when"),
        parser = opt(n, "parser").getOrElse("json"),
        compress = opt(n, "compress").getOrElse(""),
        multiDoc = Option(n.get("multiDoc")).exists(_.asBoolean(false)),
        schemaRule = req(n, "schemaRule"))
    }
    val schemas = arr(root, "schema").map { n =>
      SchemaRule(
        name = req(n, "name"),
        explodePath = opt(n, "explodePath"),
        when = opt(n, "when"),
        dataset = req(n, "dataset"),
        table = req(n, "table"),
        partition = opt(n, "partition").getOrElse(""),
        id = opt(n, "id"),
        timestamp = req(n, "timestamp"),
        transforms = arr(n, "transforms").map(parseTransform),
        dataSelect = Option(n.get("dataSelect")).map(ds =>
          ds.elements().asScala.toSeq.map(f =>
            (req(f, "name"), req(f, "expr")))),
        enrich = opt(n, "enrich").map(name => enrichments.getOrElse(name,
          sys.error(s"rule names enrichment '$name' but the registry has " +
            s"[${enrichments.keys.toSeq.sorted.mkString(", ")}] — register it " +
            "when loading (RuleLoader.fromDir(dir, enrichments))"))))
    }
    Rules(events, schemas)
  }

  private def parseTransform(n: JsonNode): TransformOp =
    req(n, "op") match {
      case "drop" => DropField(req(n, "path"))
      case "rename" => RenameField(req(n, "from"), req(n, "to"))
      case "set" => SetField(req(n, "name"), req(n, "expr"))
      case other => sys.error(s"unknown transform op '$other'")
    }

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def req(n: JsonNode, field: String): String =
    Option(n.get(field)).filter(!_.isNull).map(_.asText())
      .getOrElse(sys.error(s"rule config missing required field '$field' in ${n.toString.take(120)}"))

  private def opt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(f => !f.isNull && f.asText().nonEmpty).map(_.asText())
}
