package graft.rules.rego

import graft.rules.{EventRule, Rules, SchemaRule}
import RegoParser.{Module, RefPart, Rule, Stmt, Term}

/** Compile `package event` / `package schema.<name>` Rego modules to the
  * Spark-native rule DSL ([[graft.rules.EventRule]] /
  * [[graft.rules.SchemaRule]]), so the reference's shipped policies load
  * UNMODIFIED — no hand-port step.
  *
  * The translation is compile-time, not an interpreter: rule bodies
  * become Spark SQL expression strings, so compiled rules cost exactly
  * what hand-written DSL rules cost (whole-stage codegen, pushdown) and
  * an interpreted policy engine never sits on the per-record hot path.
  * This is the Spark-first answer to the reference's embedded OPA
  * (`pkg/infra/policy/client.go:143-174` evaluates Rego per object /
  * per record at runtime).
  *
  * Event rules evaluate over the object-metadata frame
  * ([[graft.sources.ObjectSource]] columns `bucket, name, size,
  * created_at, md5`); the reference's richer input doc (an `Object`
  * wrapping a Cloud Storage event, `pkg/domain/model/usecase.go:30-38`,
  * `message.go:44-63`) maps onto those columns below — paths with no
  * local equivalent fail loudly rather than silently never-match.
  *
  * Schema rules evaluate over the parsed record; `input.<field>` refs
  * become column refs, the fixture idiom `r := input.Records[_]` becomes
  * the rule's `explodePath`, remaining body conditions become the `when`
  * filter, and `time.parse_rfc3339_ns` becomes
  * `unix_micros(to_timestamp(…)) * 1000` (nanoseconds, like OPA's).
  *
  * Out-of-subset constructs — a second `log` rule in one schema package,
  * a reshaped `data:` object, an unmapped input path — throw with the
  * rule name in the message. Silent partial enforcement of an auth or
  * routing policy is the one failure mode this loader must not have.
  */
object RegoRules {

  /** Parse + compile one Rego module source. `package auth` is rejected
    * here: auth is request-path configuration, not part of [[Rules]] —
    * load it with [[RegoAuth.compile]] and hand the predicate to
    * [[graft.sources.PushReceiver]]. */
  def compile(src: String): Rules = compileAll(Seq(src))

  /** Compile a SET of Rego modules together, resolving cross-package
    * `data.<pkg>.<name>` references: modules whose package is neither
    * `event`, `schema.*`, nor `auth` are DATA modules — shared constant
    * tables (OPA's `data` document, loaded from a policy dir the way
    * the reference loads its whole policy tree) whose rules must be
    * parameterless literal constants (`allowed := {"a", "b"}`). Every
    * `data.` reference in an event/schema rule substitutes its constant
    * at COMPILE time, so cross-package structure costs nothing on the
    * record path. An unresolved `data.` path fails loudly. */
  def compileAll(srcs: Seq[String]): Rules = {
    val modules = srcs.map(RegoParser.parse)
    val dataConsts: Map[List[String], Term] = modules
      .filter(m => m.pkg != Seq("event") && m.pkg != Seq("auth") &&
        m.pkg.headOption != Some("schema"))
      .flatMap(RegoData.moduleConstants).toMap
    val compiled = modules.flatMap { m =>
      m.pkg match {
        case Seq("event") =>
          Some(Rules(eventRules(substData(m, dataConsts)), Nil))
        case Seq("schema", name @ _*) if name.nonEmpty =>
          Some(Rules(Nil, schemaRules(substData(m, dataConsts), name.mkString("_"))))
        case Seq("auth") =>
          sys.error("package auth is a request-path policy — compile it with " +
            "RegoAuth.compile and pass the predicate to PushReceiver, not RuleLoader")
        case _ => None // data module — constants only
      }
    }
    require(compiled.nonEmpty,
      "no event/schema modules among the loaded rego sources (only data modules)")
    compiled.reduce((a, b) => Rules(a.event ++ b.event, a.schema ++ b.schema))
  }

  /** Substitute every `data.<pkg>.<name>` reference in a module with
    * its constant term ([[RegoData.resolve]]: longest-prefix constant
    * + field selections into object literals, so `data.c.limits.hot`
    * and `data.c.limits["hot"]` both compile). A data-rooted path that
    * resolves to nothing fails loudly (a typo'd constant must not
    * silently never-match). */
  private def substData(m: Module, consts: Map[List[String], Term]): Module = {
    def term(t: Term): Term = RegoData.dataPath(t) match {
      case Some(p) if p.nonEmpty =>
        RegoData.resolve(p, consts).getOrElse(sys.error(
          s"${m.pkg.mkString(".")}: data.${p.mkString(".")} resolves to no " +
            "loaded data-module constant"))
      case _ => t match {
        case Term.Sel(b, RefPart.Idx(i)) => Term.Sel(term(b), RefPart.Idx(term(i)))
        case Term.Sel(b, part) => Term.Sel(term(b), part)
        case Term.Call(fn, args) => Term.Call(fn, args.map(term))
        case Term.Obj(es) => Term.Obj(es.map { case (k, v) => (term(k), term(v)) })
        case Term.Arr(is) => Term.Arr(is.map(term))
        case Term.SetLit(is) => Term.SetLit(is.map(term))
        case Term.Bin(op, l, r) => Term.Bin(op, term(l), term(r))
        case Term.ArrCompr(h, b) => Term.ArrCompr(term(h), b.map(stmt))
        case Term.SetCompr(h, b) => Term.SetCompr(term(h), b.map(stmt))
        case Term.ObjCompr(k, v, b) => Term.ObjCompr(term(k), term(v), b.map(stmt))
        case other => other
      }
    }
    def stmt(s: Stmt): Stmt = s match {
      case Stmt.Assign(n, v) => Stmt.Assign(n, term(v))
      case Stmt.Expr(t) => Stmt.Expr(term(t))
      case Stmt.Not(t) => Stmt.Not(term(t))
      case Stmt.Every(v, xs, b) => Stmt.Every(v, term(xs), b.map(stmt))
    }
    Module(m.pkg, m.rules.map(r => r.copy(
      key = r.key.map(term), value = r.value.map(term), body = r.body.map(stmt))))
  }

  // ---- event rules ----------------------------------------------------

  /** `input.…` paths over object metadata → SQL over the
    * [[graft.sources.ObjectSource]] columns. `input.data.*` is the raw
    * Cloud Storage event (string `size`, base64 `md5Hash`, RFC3339
    * `timeCreated` — `model/message.go:44-63`); `input.cs.*` /
    * `input.size` / `input.created_at` the normalized `Object`
    * (`model/usecase.go:30-38`). `input.data.kind` is constant
    * `storage#object` for every object a listing can produce, so it
    * compiles to that literal and the predicate folds away. */
  private val eventPathSql: Map[List[String], String] = Map(
    List("cs", "bucket") -> "bucket",
    List("cs", "name") -> "name",
    List("size") -> "size",
    List("created_at") -> "unix_timestamp(created_at)",
    List("data", "kind") -> "'storage#object'",
    List("data", "bucket") -> "bucket",
    List("data", "name") -> "name",
    List("data", "size") -> "cast(size as string)",
    List("data", "md5Hash") -> "base64(unhex(md5))",
    List("data", "timeCreated") ->
      "date_format(created_at, \"yyyy-MM-dd'T'HH:mm:ss.SSS'Z'\")")

  private def eventRules(m: Module): Seq[EventRule] = {
    val srcRules = m.rules.filter(_.name == "src")
    require(srcRules.nonEmpty, "package event defines no src[…] rules")
    m.rules.filterNot(_.name == "src").foreach(r =>
      sys.error(s"package event: unsupported rule '${r.name}' (only src[…])"))
    srcRules.zipWithIndex.map { case (r, i) =>
      val (out, condStmts) = setOutput(r, s"src[$i]")
      val conds = condStmts.map {
        case Stmt.Expr(t) => sqlExpr(t, eventRef)
        // Rego `not`: succeeds on undefined OR false — in SQL a missing/
        // null operand yields NULL, so coalesce to false before negating
        case Stmt.Not(t) => s"NOT coalesce((${sqlExpr(t, eventRef)}), false)"
        case a: Stmt.Assign => sys.error(s"src[$i]: variable bindings other " +
          s"than the head object are unsupported in event rules ($a)")
        case _: Stmt.Every => sys.error(s"src[$i]: 'every' is request-path " +
          "(auth) only — object metadata has no array columns to quantify")
      }
      // multiDoc is an ENGINE EXTENSION key: the reference's decoder
      // auto-detects concatenated JSON docs per object (load.go:251-279);
      // here doc shape is a rule property, so a ported policy for a
      // concatenated-doc bucket declares it explicitly.
      val terms = objTerms(out, s"src[$i]")
      val multiDoc = terms.get("multiDoc") match {
        case Some(Term.Bool(b)) => b
        case Some(other) => sys.error(s"src[$i]: multiDoc must be true/false, got $other")
        case None => false
      }
      val directive = objStrings(Term.Obj(out.entries.filterNot(_._1 == Term.Str("multiDoc"))),
        s"src[$i]")
      directive.keys.find(k => !Set("parser", "schema", "compress")(k)).foreach(k =>
        sys.error(s"src[$i]: unsupported source key '$k' " +
          "(parser | schema | compress — model/policy.go:25-30 — or engine-extension multiDoc)"))
      val schema = directive.getOrElse("schema",
        sys.error(s"src[$i]: source object lacks required 'schema'"))
      val when =
        if (conds.isEmpty) "true"
        else conds.mkString("(", ") AND (", ")")
      EventRule(
        name = s"src$i-$schema",
        when = when,
        parser = directive.getOrElse("parser", "json"),
        compress = directive.getOrElse("compress", ""),
        multiDoc = multiDoc,
        schemaRule = schema)
    }
  }

  private def eventRef(t: Term): String = t match {
    case Term.Sel(base, RefPart.Dot(n)) =>
      def path(x: Term, acc: List[String]): Option[List[String]] = x match {
        case Term.Ref("input") => Some(acc)
        case Term.Sel(b, RefPart.Dot(p)) => path(b, p :: acc)
        case _ => None
      }
      path(base, List(n)) match {
        case Some(p) => eventPathSql.getOrElse(p,
          sys.error(s"event rule references input.${p.mkString(".")} which has " +
            "no object-metadata equivalent (bucket/name/size/created_at/md5)"))
        case None => sys.error(s"event rule: unsupported reference $t")
      }
    case other => sys.error(s"event rule: unsupported reference $other")
  }

  // ---- schema rules ---------------------------------------------------

  /** One [[SchemaRule]] per `log` rule, all under the schema's name —
    * set semantics: the pipeline applies every same-name rule
    * ([[graft.rules.Rules.schemaRulesFor]]), so N log rules multiply
    * each record N ways exactly like the reference's Rego set. */
  private def schemaRules(m: Module, name: String): Seq[SchemaRule] = {
    val logRules = m.rules.filter(_.name == "log")
    require(logRules.nonEmpty, s"package schema.$name defines no log[…] rules")
    m.rules.filterNot(_.name == "log").foreach(r =>
      sys.error(s"schema.$name: unsupported rule '${r.name}' (only log[…])"))
    logRules.map(r => schemaRule(r, name))
  }

  private def schemaRule(r: Rule, name: String): SchemaRule = {
    val (out, body0) = setOutput(r, s"schema.$name")

    // `v := input.<arr>[_]` → explode; other assigns → inline
    // substitution. Conditions compile AFTER the loop (closures over
    // the final ref resolver), so late assigns still reach early conds.
    var explodePath: Option[String] = None
    var recordVar: Option[String] = None
    var subst = Map.empty[String, String]
    val conds = Seq.newBuilder[(Term => String) => String]
    body0.foreach {
      case Stmt.Assign(v, Term.Sel(arr, RefPart.Wildcard)) =>
        val path = inputPath(arr).getOrElse(
          sys.error(s"schema.$name: iteration over non-input path $arr"))
        require(explodePath.isEmpty, s"schema.$name: two [_] iterations — one explode per rule")
        explodePath = Some(path.mkString("."))
        recordVar = Some(v)
      case Stmt.Assign(v, value) =>
        subst += v -> sqlExpr(value, recordSql(recordVar, subst, name))
      case Stmt.Expr(t) => conds += (ref => sqlExpr(t, ref))
      // Rego `not`: undefined-or-false — null-safe SQL negation
      case Stmt.Not(t) => conds += (ref => s"NOT coalesce((${sqlExpr(t, ref)}), false)")
      // `every v in xs { conds }` → forall(xs, v -> conds): universal
      // quantification compiled to the native higher-order function.
      // Rego's vacuous-truth on empty matches forall([]); an undefined
      // xs (missing path → NULL array) makes forall NULL, which the
      // when-filter treats as false — Rego's undefined-fails-the-body.
      case Stmt.Every(v, xs, inner) =>
        conds += (ref => everySql(v, xs, inner, ref, s"schema.$name"))
    }
    val ref: Term => String = recordSql(recordVar, subst, name)
    val when = {
      val cs = conds.result()
      if (cs.isEmpty) None
      else Some(cs.map(_(ref)).mkString("(", ") AND (", ")"))
    }

    val keys = objTerms(out, s"schema.$name")
    keys.keys.find(k => !Set("dataset", "table", "partition", "timeunit",
      "id", "timestamp", "data")(k)).foreach(k =>
      sys.error(s"schema.$name: unsupported log key '$k' (model/policy.go:64-71)"))
    def field(k: String): Option[Term] = keys.get(k)
    def sqlField(k: String): Option[String] = field(k).map(t => sqlExpr(t, ref))

    // data: the whole record ("data": input / "data": r — the common
    // case) or a reshaped object literal → full replacement of the
    // packed data struct (docs/rule.md:166-168), compiled field-by-field
    // to SQL; routing/id/timestamp exprs still see the full record.
    val dataSelect = field("data") match {
      case Some(Term.Ref("input")) if recordVar.isEmpty => None
      case Some(Term.Ref(v)) if recordVar.contains(v) => None
      case Some(o: Term.Obj) => Some(o.entries.map {
        case (Term.Str(k), v) => (k, sqlExpr(v, ref))
        case (k, _) => sys.error(s"schema.$name data: non-string key $k")
      })
      case Some(other) => sys.error(s"schema.$name: 'data' must be the whole " +
        s"record (input / the [_] binding) or an object literal; got $other")
      case None => sys.error(s"schema.$name: log object lacks required 'data'")
    }
    val partition = (field("partition") orElse field("timeunit")) match {
      case Some(Term.Str(s)) => s
      case Some(other) => sys.error(s"schema.$name: partition must be a string literal, got $other")
      case None => ""
    }
    SchemaRule(
      name = name,
      explodePath = explodePath,
      when = when,
      dataset = sqlField("dataset").getOrElse(
        sys.error(s"schema.$name: log object lacks required 'dataset'")),
      table = sqlField("table").getOrElse(
        sys.error(s"schema.$name: log object lacks required 'table'")),
      partition = partition,
      id = sqlField("id"),
      timestamp = sqlField("timestamp").getOrElse(
        sys.error(s"schema.$name: log object lacks required 'timestamp'")),
      dataSelect = dataSelect)
  }

  /** Record-scope reference → SQL: `input.a.b` / `<recordVar>.a.b` →
    * backticked column path; a bound variable → its inlined SQL. */
  private def recordSql(recordVar: Option[String], subst: Map[String, String],
      schema: String)(t: Term): String = t match {
    case Term.Ref(v) if subst.contains(v) => subst(v)
    case _ =>
      def path(x: Term, acc: List[String]): Option[List[String]] = x match {
        case Term.Ref("input") if recordVar.isEmpty => Some(acc)
        case Term.Ref(v) if recordVar.contains(v) => Some(acc)
        case Term.Sel(b, RefPart.Dot(p)) => path(b, p :: acc)
        case _ => None
      }
      path(t, Nil) match {
        case Some(Nil) => sys.error(s"schema.$schema: the whole record is only " +
          "valid as 'data'")
        case Some(p) => p.map(f => s"`$f`").mkString(".")
        case None => sys.error(s"schema.$schema: unsupported reference $t")
      }
  }

  /** The `input.a.b` path of a term, if it is one. */
  private def inputPath(t: Term): Option[List[String]] = t match {
    case Term.Ref("input") => Some(Nil)
    case Term.Sel(b, RefPart.Dot(n)) => inputPath(b).map(_ :+ n)
    case _ => None
  }

  // ---- shared ---------------------------------------------------------

  /** A partial-set rule's output object + remaining body conditions:
    * either the head key IS the object (`src[{…}] { conds }`) or the key
    * is a variable assigned an object in the body (`src[s] { conds;
    * s := {…} }`). */
  private def setOutput(r: Rule, what: String): (Term.Obj, Seq[Stmt]) =
    r.key match {
      case Some(o: Term.Obj) => (o, r.body)
      case Some(Term.Ref(v)) =>
        val (assigns, rest) = r.body.partition {
          case Stmt.Assign(`v`, _: Term.Obj) => true
          case _ => false
        }
        assigns match {
          case Seq(Stmt.Assign(_, o: Term.Obj)) => (o, rest)
          case _ => sys.error(s"$what: head variable '$v' is not assigned " +
            "exactly one object literal in the body")
        }
      case other => sys.error(s"$what: unsupported set key $other")
    }

  /** Object literal → string-keyed term map. */
  private def objTerms(o: Term.Obj, what: String): Map[String, Term] =
    o.entries.map {
      case (Term.Str(k), v) => k -> v
      case (k, _) => sys.error(s"$what: non-string object key $k")
    }.toMap

  /** Object literal whose values must all be string literals (event
    * source directives are — `model/policy.go:25-30`). */
  private def objStrings(o: Term.Obj, what: String): Map[String, String] =
    objTerms(o, what).map {
      case (k, Term.Str(v)) => k -> v
      case (k, other) => sys.error(s"$what: value of '$k' must be a string literal, got $other")
    }

  /** Lambda-scoped reference resolution: `v` / `v.a.b` → the SQL
    * lambda variable; anything else falls through to the enclosing
    * resolver (correlated references to the record are legal inside a
    * Spark SQL lambda). Rego variables are identifier-safe, so the
    * Rego name IS the lambda name. */
  private def lambdaRef(v: String, outer: Term => String)(t: Term): String = {
    def path(x: Term, acc: List[String]): Option[List[String]] = x match {
      case Term.Ref(`v`) => Some(acc)
      case Term.Sel(b, RefPart.Dot(p)) => path(b, p :: acc)
      case _ => None
    }
    path(t, Nil) match {
      case Some(Nil) => v
      case Some(p) => (v +: p.map(f => s"`$f`")).mkString(".")
      case None => outer(t)
    }
  }

  /** `every v in xs { body }` → `forall(<xs>, v -> <conjunction>)`. */
  private def everySql(v: String, xs: Term, body: Seq[Stmt],
      ref: Term => String, what: String): String = {
    val inner = lambdaRef(v, ref) _
    val cs = body.map {
      case Stmt.Expr(t) => sqlExpr(t, inner)
      case Stmt.Not(t) => s"NOT coalesce((${sqlExpr(t, inner)}), false)"
      case other => sys.error(s"$what: a data-plane 'every' body supports " +
        s"only conditions over the bound variable (got $other)")
    }
    val conj = if (cs.isEmpty) "true" else cs.mkString("(", ") AND (", ")")
    s"forall(${sqlExpr(xs, ref)}, $v -> $conj)"
  }

  /** Array/set comprehension → `transform(filter(xs, v -> conds), v ->
    * head)`: the data-plane subset is exactly one `v := xs[_]` binding
    * (or `some v in xs`) followed by conditions — the
    * enumerate-filter-map shape, which IS what Spark's higher-order
    * functions express. Sets add `array_distinct`. */
  private def comprSql(head: Term, body: Seq[Stmt], ref: Term => String,
      distinct: Boolean, what: String): String = body match {
    case Stmt.Assign(v, Term.Sel(src, RefPart.Wildcard)) +: conds =>
      val inner = lambdaRef(v, ref) _
      val cs = conds.map {
        case Stmt.Expr(t) => sqlExpr(t, inner)
        case Stmt.Not(t) => s"NOT coalesce((${sqlExpr(t, inner)}), false)"
        case other => sys.error(s"$what: a data-plane comprehension body is " +
          s"one 'v := xs[_]' binding followed by conditions (got $other)")
      }
      val filtered =
        if (cs.isEmpty) sqlExpr(src, ref)
        else s"filter(${sqlExpr(src, ref)}, $v -> ${cs.mkString("(", ") AND (", ")")})"
      val mapped = head match {
        case Term.Ref(`v`) => filtered // identity head — no transform pass
        case _ => s"transform($filtered, $v -> ${sqlExpr(head, inner)})"
      }
      if (distinct) s"array_distinct($mapped)" else mapped
    case _ => sys.error(s"$what: a data-plane comprehension body must START " +
      "with its 'v := xs[_]' (or 'some v in xs') binding")
  }

  /** Term → Spark SQL, with `ref` resolving variable/input references
    * per rule kind. Builtins map to codegen'd Spark functions. */
  private def sqlExpr(t: Term, ref: Term => String): String = t match {
    // backslashes first: Spark's literal parser processes \-escapes, so
    // an unescaped backslash corrupts (or unbalances) the literal
    case Term.Str(v) => "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case Term.Num(v) => v.underlying.toPlainString
    case Term.Bool(v) => v.toString
    case Term.Bin("in", l, r) => r match {
      // membership: literal list/set → codegen'd IN; anything else (an
      // input array path, a comprehension) → array_contains
      case Term.Arr(items) =>
        s"(${sqlExpr(l, ref)} IN (${items.map(sqlExpr(_, ref)).mkString(", ")}))"
      case Term.SetLit(items) =>
        s"(${sqlExpr(l, ref)} IN (${items.map(sqlExpr(_, ref)).mkString(", ")}))"
      case other =>
        s"array_contains(${sqlExpr(other, ref)}, ${sqlExpr(l, ref)})"
    }
    case Term.ArrCompr(h, b) => comprSql(h, b, ref, distinct = false, "comprehension")
    case Term.SetCompr(h, b) => comprSql(h, b, ref, distinct = true, "comprehension")
    case _: Term.ObjCompr => sys.error(
      "object comprehensions are request-path (auth) only — data-plane rules " +
        "compile to columnar SQL, which has no dynamic-key map build")
    case _: Term.SetLit => sys.error(
      "a set literal in a data-plane rule is only supported as the right side " +
        "of 'in' (membership compiles to a codegen'd IN list)")
    case Term.Arr(items) =>
      s"array(${items.map(sqlExpr(_, ref)).mkString(", ")})"
    case Term.Bin(op, l, r) =>
      val sqlOp = op match {
        case "==" => "=" ; case "!=" => "<>"
        case o @ ("<" | "<=" | ">" | ">=" | "+" | "-" | "*" | "/" | "%") => o
        case other => sys.error(s"unsupported operator '$other'")
      }
      s"(${sqlExpr(l, ref)} $sqlOp ${sqlExpr(r, ref)})"
    case Term.Call(fn, args) =>
      val a = args.map(sqlExpr(_, ref))
      fn match {
        case "startswith" | "endswith" | "contains" | "lower" | "upper" |
             "trim" | "concat" | "split" | "abs" | "round" | "floor" | "ceil" |
             "replace" =>
          s"$fn(${a.mkString(", ")})"
        case "count" => s"size(${a.head})"
        case "trim_space" => s"trim(${a.head})"
        case "to_number" => s"cast(${a.head} as double)"
        // OPA substring/indexof are 0-based; SQL substr/instr 1-based
        case "substring" => s"substr(${a(0)}, (${a(1)}) + 1, ${a(2)})"
        case "indexof" => s"(instr(${a(0)}, ${a(1)}) - 1)"
        case "sum" => s"aggregate(${a.head}, cast(0.0 as double), (acc, x) -> acc + x)"
        case "product" => s"aggregate(${a.head}, cast(1.0 as double), (acc, x) -> acc * x)"
        case "max" => s"array_max(${a.head})"
        case "min" => s"array_min(${a.head})"
        case "sort" => s"sort_array(${a.head})"
        case "array.concat" => s"concat(${a.mkString(", ")})"
        case "array.reverse" | "strings.reverse" => s"reverse(${a.head})"
        // OPA numbers.range is inclusive both ends and auto-steps -1
        // when descending — exactly Spark's sequence()
        case "numbers.range" => s"sequence(${a(0)}, ${a(1)})"
        // non-overlapping literal substring occurrences
        case "strings.count" =>
          s"cast((length(${a(0)}) - length(replace(${a(0)}, ${a(1)}, ''))) / length(${a(1)}) as bigint)"
        case "base64.encode" => s"base64(cast(${a.head} as binary))"
        case "base64.decode" => s"cast(unbase64(${a.head}) as string)"
        // OPA hex.encode emits lowercase; Spark hex() uppercase
        case "hex.encode" => s"lower(hex(cast(${a.head} as binary)))"
        case "hex.decode" => s"cast(unhex(${a.head}) as string)"
        // OPA format_int emits lowercase digits for base 16
        case "format_int" => s"lower(conv(cast(${a(0)} as bigint), 10, cast(${a(1)} as int)))"
        // structured values only (struct/map/array columns) — a scalar
        // arg fails loudly at analysis, matching the loud-fail boundary
        case "json.marshal" => s"to_json(${a.head})"
        case "array.slice" =>
          // OPA slice is [lo, hi) 0-based; SQL slice is (start 1-based, length)
          s"slice(${a(0)}, (${a(1)}) + 1, (${a(2)}) - (${a(1)}))"
        // OPA regex is RE2; Spark is Java regex. The shared subset
        // (literals, classes, anchors, quantifiers, alternation) is
        // what policies actually write; RE2-only syntax fails loudly
        // at evaluation, never silently matches differently.
        case "regex.match" => s"(${a(1)} rlike ${a(0)})"
        case "regex.split" => s"split(${a(1)}, ${a(0)}, -1)"
        case "regex.replace" => s"regexp_replace(${a(0)}, ${a(1)}, ${a(2)})"
        case "sprintf" => args match {
          case Seq(Term.Str(fmt), Term.Arr(items)) =>
            // OPA's %v prints like %s for the scalar types a data-plane
            // rule can produce; Spark's format_string handles %s/%d/%f
            val jfmt = fmt.replace("%v", "%s")
            val vals = items.map(sqlExpr(_, ref))
            s"format_string(${sqlExpr(Term.Str(jfmt), ref)}${vals.map(", " + _).mkString})"
          case _ => sys.error("sprintf needs a literal format string and a " +
            "literal argument array in a compiled rule")
        }
        case "time.parse_rfc3339_ns" =>
          // OPA returns nanoseconds; rules then divide back down — keep
          // the unit so their arithmetic stays correct as written
          s"(unix_micros(to_timestamp(${a.head})) * 1000)"
        case other => sys.error(s"unsupported builtin '$other' in a compiled rule " +
          "(data-plane rules compile to SQL; request-path builtins live in RegoAuth)")
      }
    case other => ref(other)
  }
}
