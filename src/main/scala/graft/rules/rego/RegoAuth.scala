package graft.rules.rego

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.HttpExchange

import RegoParser.{Module, RefPart, Rule, Stmt, Term}

/** Evaluator for `package auth` Rego policies — the request-path third
  * of the reference's policy surface (`docs/rule.md:186-283`; evaluated
  * per HTTP request in `pkg/controller/server/server.go` with the input
  * model `pkg/domain/model/policy.go:8-19`).
  *
  * Unlike event/schema rules ([[RegoRules]]), auth runs per REQUEST on
  * the receiver, not per record on executors — so an interpreter is the
  * right shape here (no plan, no codegen concern; request rates are
  * O(pushes), not O(rows)). The subset covers every construct the
  * reference's auth docs and fixtures use: `default deny`, `deny :=
  * false { allow }`, multiple `allow` bodies, header/query/path
  * matching with `split`/`count`/`lower`, user-defined helper functions,
  * and the full Google-JWKS idiom — `http.send` (with `force_cache`),
  * `io.jwt.verify_rs256`, `io.jwt.decode`, `time.now_ns` claim checks.
  *
  * Semantics follow Rego where the subset overlaps it: a rule body is a
  * conjunction; a statement that is false or UNDEFINED (missing key,
  * out-of-range index, failed builtin) fails the body, never throws; a
  * `[_]` is existential — including inside call arguments, and a
  * `v := arr[_]` binding backtracks over the rest of the body; `not x`
  * succeeds iff x is undefined or false; `deny` takes the value of the
  * first succeeding deny rule, else its `default`, else undefined;
  * undefined/false deny allows (`docs/rule.md:214`). Out-of-subset
  * constructs — and references to names that exist nowhere (a typo'd
  * helper rule would otherwise evaluate to undefined and silently
  * disarm a deny body) — fail at COMPILE time: a policy that loads is
  * fully enforced.
  *
  * `http.send` and the clock are injectable ([[Config]]): production
  * uses a TTL-cached `java.net` fetch whose per-URL TTL is the
  * policy's own `force_cache_duration_seconds` (0 — no caching — when
  * the policy doesn't ask for `force_cache`); tests inject fixtures.
  * Any fetch failure makes the calling rule undefined → deny, the same
  * fail-closed default as
  * [[graft.sources.PushReceiver.jwtBearerRs256]].
  */
object RegoAuth {

  /** The reference's auth input doc (`pkg/domain/model/policy.go:8-19`). */
  final case class AuthInput(method: String, path: String, remote: String,
      query: Map[String, Seq[String]], header: Map[String, Seq[String]],
      body: String)

  final case class Config(
      /** (url, cacheSeconds) → response body; `cacheSeconds` is the
        * policy's `force_cache_duration_seconds` (0 = don't cache).
        * Failures may throw (rule goes undefined). */
      http: (String, Long) => String = defaultHttp(),
      nowNs: () => Long = () => System.currentTimeMillis() * 1000000L)

  /** TTL-cached GET, one entry per URL — `http.send`'s `force_cache`
    * contract, with the TTL supplied PER CALL from the policy's
    * `force_cache_duration_seconds`. The cache is per-predicate (a
    * receiver builds one policy at startup), refreshed after the TTL so
    * JWKS rotation works without restart. */
  def defaultHttp(): (String, Long) => String = {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]
    (url, ttlSeconds) => {
      val now = System.currentTimeMillis() / 1000
      // ttl 0 = this CALL didn't ask for force_cache: bypass the cache
      // on read too (another rule may have cached the same URL, but
      // this call's contract is a fresh fetch), and store nothing
      val hit = if (ttlSeconds > 0) cache.get(url) else null
      if (hit != null && hit._1 > now) hit._2
      else {
        val conn = new java.net.URI(url).toURL.openConnection()
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(5000)
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        if (ttlSeconds > 0) cache.put(url, (now + ttlSeconds, body))
        body
      }
    }
  }

  /** Compile a `package auth` module to a predicate. Fails loudly on
    * parse errors or out-of-subset rules. `data` is additional module
    * sources forming OPA's shared `data` document: their parameterless
    * constant rules resolve `data.<pkg>.<name>` references in the
    * policy (allowed-token tables, issuer lists — config separated
    * from logic, the way the reference loads a policy tree). */
  def compile(src: String, cfg: Config = Config(),
      data: Seq[String] = Nil): AuthInput => Boolean = {
    val m = RegoParser.parse(src)
    require(m.pkg == Seq("auth"),
      s"expected package auth, got '${m.pkg.mkString(".")}'")
    val eval = new Eval(m, cfg, dataConstants(data))
    eval.checkCompilable()
    input => eval.allows(input)
  }

  /** Parse data modules to their constant tables (the shared
    * [[RegoData]] contract, so auth and data-plane policies accept the
    * same trees). Kept as TERMS; [[RegoData.toValue]] converts at
    * resolution. */
  private def dataConstants(srcs: Seq[String]): Map[List[String], Term] =
    srcs.flatMap { src =>
      val m = RegoParser.parse(src)
      require(m.pkg != Seq("auth"),
        "a data module cannot be 'package auth' (pass the policy as src)")
      RegoData.moduleConstants(m)
    }.toMap

  /** Adapt a compiled policy to [[graft.sources.PushReceiver]]'s auth
    * seam. Only the fields a push carries are populated (method, path,
    * query, headers, remote, body). */
  def asHttpAuth(policy: AuthInput => Boolean): HttpExchange => Boolean =
    ex => {
      val uri = ex.getRequestURI
      val query = Option(uri.getRawQuery).getOrElse("").split('&')
        .filter(_.nonEmpty).toSeq
        .map { kv =>
          val i = kv.indexOf('=')
          if (i < 0) (dec(kv), "") else (dec(kv.take(i)), dec(kv.drop(i + 1)))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      // sun's Headers normalizes keys to "X-goog-channel-token"; the
      // reference presents Go net/http canonical keys
      // ("X-Goog-Channel-Token"), which is what ported policies match —
      // re-canonicalize so multi-word header lookups work
      val headers = ex.getRequestHeaders.entrySet().asScala
        .map(e => canonicalHeader(e.getKey) -> e.getValue.asScala.toSeq).toMap
      // the push body is consumed downstream by the receiver; auth sees
      // it empty (no reference auth rule inspects the body)
      policy(AuthInput(ex.getRequestMethod, uri.getPath,
        Option(ex.getRemoteAddress).map(_.getAddress.getHostAddress).getOrElse(""),
        query, headers, ""))
    }

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  /** Go's `textproto.CanonicalMIMEHeaderKey`: first letter of each
    * '-'-separated segment upper, rest lower. */
  private[rego] def canonicalHeader(k: String): String =
    k.split("-", -1).map { seg =>
      if (seg.isEmpty) seg
      else seg.head.toUpper +: seg.tail.toLowerCase
    }.mkString("-")

  // ---- evaluator ------------------------------------------------------

  /** Evaluation failure = Rego "undefined" — never an exception. */
  private object Undefined extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Eval(m: Module, cfg: Config,
      dataConsts: Map[List[String], Term] = Map.empty) {
    private val mapper = new ObjectMapper
    private val rulesByName: Map[String, Seq[Rule]] = m.rules.groupBy(_.name)
    /** Function rules in source order — Rego tries same-name bodies in
      * order, first defined result wins. */
    private val functions: Map[String, Seq[Rule]] =
      m.rules.filter(_.params.isDefined).groupBy(_.name)

    /** Walk every rule once at compile time so unsupported builtins,
      * operators, and UNKNOWN NAMES fail at load, not first request. A
      * typo'd helper-rule name in a deny body would otherwise evaluate
      * to undefined and silently disarm the rule (fail-open). */
    def checkCompilable(): Unit = {
      // rule-name dependency edges (bare refs + user-function calls),
      // collected during the walk for the cycle check below
      val deps = scala.collection.mutable.Map.empty[String, Set[String]]
        .withDefaultValue(Set.empty)
      def checkTerm(from: String, t: Term, bound: Set[String]): Unit = t match {
        case Term.Ref("data") => sys.error(
          "auth policy uses a bare 'data' reference — only full " +
            "data.<pkg>.<name> paths resolve (against loaded data modules)")
        case Term.Ref(n) =>
          if (!bound(n)) {
            if (!rulesByName.contains(n))
              sys.error(s"auth policy references unknown name '$n' " +
                "(not a rule, function parameter, or := binding in scope)")
            // a name defined ONLY as a function would evaluate to
            // undefined when referenced bare — the same silent
            // fail-open this check exists to close
            if (!rulesByName(n).exists(_.params.isEmpty))
              sys.error(s"auth policy references function '$n' without " +
                "arguments (it has no complete-rule definition)")
            deps(from) += n
          }
        case Term.Call(fn, args) =>
          if (!builtinNames(fn) && !functions.contains(fn))
            sys.error(s"auth policy calls unknown function '$fn' " +
              s"(builtins: ${builtinNames.toSeq.sorted.mkString(", ")})")
          if (functions.contains(fn)) deps(from) += fn
          args.foreach(checkTerm(from, _, bound))
        // a data-rooted path must resolve to a loaded constant — a
        // typo'd data path (or a field absent from the constant's
        // value) would otherwise be undefined and silently disarm its
        // rule (the same fail-open every check here closes). Constants
        // are static, so the FULL path is checkable at compile time.
        case _: Term.Sel if dataPath(t).isDefined =>
          val p = dataPath(t).get
          if (dataResolve(p).isEmpty)
            sys.error(s"auth policy references data.${p.mkString(".")} which " +
              "no loaded data module defines")
        case Term.Bin(_, l, r) => checkTerm(from, l, bound); checkTerm(from, r, bound)
        case Term.Sel(b, RefPart.Idx(i)) => checkTerm(from, b, bound); checkTerm(from, i, bound)
        case Term.Sel(b, _) => checkTerm(from, b, bound)
        case Term.Obj(es) => es.foreach { case (k, v) =>
          checkTerm(from, k, bound); checkTerm(from, v, bound) }
        case Term.Arr(is) => is.foreach(checkTerm(from, _, bound))
        case Term.SetLit(is) => is.foreach(checkTerm(from, _, bound))
        // comprehension bodies bind like rule bodies; inner bindings
        // don't leak past the comprehension
        case Term.ArrCompr(h, b) =>
          checkTerm(from, h, checkBody(from, b, bound))
        case Term.SetCompr(h, b) =>
          checkTerm(from, h, checkBody(from, b, bound))
        case Term.ObjCompr(k, v, b) =>
          val inner = checkBody(from, b, bound)
          checkTerm(from, k, inner); checkTerm(from, v, inner)
        case _ =>
      }
      def checkBody(from: String, body: Seq[Stmt], bound0: Set[String]): Set[String] =
        body.foldLeft(bound0) { (bound, s) =>
          s match {
            case Stmt.Assign(v, t) => checkTerm(from, t, bound); bound + v
            case Stmt.Expr(t) => checkTerm(from, t, bound); bound
            case Stmt.Not(t) => checkTerm(from, t, bound); bound
            case Stmt.Every(v, xs, inner) =>
              checkTerm(from, xs, bound)
              checkBody(from, inner, bound + v) // inner bindings don't leak
              bound
          }
        }
      m.rules.foreach { r =>
        val boundAll = checkBody(r.name, r.body,
          Set("input") ++ r.params.getOrElse(Nil))
        // head terms may use any name the body binds
        r.key.foreach(checkTerm(r.name, _, boundAll))
        r.value.foreach(checkTerm(r.name, _, boundAll))
      }
      // recursion would StackOverflowError at request time — an Error,
      // not an Exception, so it escapes every fail-closed net; reject
      // cycles at load (OPA itself forbids recursive rules)
      def cyclic(n: String, path: Set[String]): Option[String] =
        if (path(n)) Some(n)
        else deps(n).view.flatMap(d => cyclic(d, path + n)).headOption
      deps.keys.foreach { n =>
        cyclic(n, Set.empty).foreach(c =>
          sys.error(s"auth policy has recursive rule references (via '$c') — " +
            "recursion is not allowed in Rego"))
      }
    }

    private val builtinNames = Set("startswith", "endswith", "contains",
      "lower", "upper", "trim", "split", "count", "concat", "sprintf",
      "http.send", "io.jwt.verify_rs256", "io.jwt.decode", "time.now_ns")

    /** deny undefined/false → allow; deny true → deny. */
    def allows(input: AuthInput): Boolean = {
      val in: Any = Map(
        "method" -> input.method, "path" -> input.path,
        "remote" -> input.remote,
        "query" -> input.query.map { case (k, v) => k -> v.toVector },
        "header" -> input.header.map { case (k, v) => k -> v.toVector },
        "body" -> input.body)
      evalCompleteRule("deny", in) match {
        case Some(true) => false
        case _ => true
      }
    }

    /** First succeeding non-default rule's value, else the default. */
    private def evalCompleteRule(name: String, input: Any): Option[Any] = {
      val rs = rulesByName.getOrElse(name, Nil).filter(_.params.isEmpty)
      val live = rs.filterNot(_.isDefault)
      val hit = live.iterator.flatMap { r =>
        try {
          val env = evalBody(r.body, Map("input" -> input), input)
          Some(r.value.map(v => evalOne(v, env, input)).getOrElse(true))
        } catch { case Undefined => None }
      }.nextOption()
      hit.orElse(rs.find(_.isDefault).map(r =>
        evalOne(r.value.get, Map.empty, input)))
    }

    /** Run a body; returns the final env. Throws Undefined on failure.
      * An `v := arr[_]` assignment is existential ACROSS the rest of the
      * body: each candidate binding is tried in order and the first that
      * makes the remaining statements succeed wins (Rego backtracking,
      * scoped to this subset's one-directional bindings). */
    private def evalBody(body: Seq[Stmt], env0: Map[String, Any], input: Any): Map[String, Any] =
      body match {
        case Seq() => env0
        case Stmt.Assign(v, t) +: rest =>
          val candidates = evalAll(t, env0, input)
          candidates.iterator.flatMap { x =>
            try Some(evalBody(rest, env0 + (v -> x), input))
            catch { case Undefined => None }
          }.nextOption().getOrElse(throw Undefined)
        case Stmt.Expr(t) +: rest =>
          // existential over [_]: succeed iff SOME expansion is truthy
          val ok = evalAll(t, env0, input).exists {
            case b: Boolean => b
            case _ => true // a defined non-boolean statement succeeds (Rego)
          }
          if (!ok) throw Undefined
          evalBody(rest, env0, input)
        case Stmt.Not(t) +: rest =>
          // negation as failure: succeed iff NO expansion is truthy
          val truthy =
            try evalAll(t, env0, input).exists {
              case b: Boolean => b
              case _ => true
            } catch { case Undefined => false }
          if (truthy) throw Undefined
          evalBody(rest, env0, input)
        case Stmt.Every(v, xs, inner) +: rest =>
          // universal: the inner body must succeed for EVERY value
          // (vacuously true on empty); a non-collection is undefined
          val vals: Seq[Any] = evalOne(xs, env0, input) match {
            case vec: Vector[_] => vec
            case mp: Map[_, _] => mp.values.toSeq
            case st: Set[_] => st.toSeq
            case _ => throw Undefined
          }
          vals.foreach(x => evalBody(inner, env0 + (v -> x), input))
          evalBody(rest, env0, input)
      }

    /** ALL solutions of a body (comprehension semantics). Total: a
      * failing candidate binding contributes nothing rather than
      * aborting the enumeration — [[evalBody]] stays the lazy
      * first-solution path for rule bodies (it stops invoking effectful
      * builtins at the first success); comprehensions need the full
      * solution set anyway. `[_]` in a bare condition stays existential
      * within its statement, as documented for rule bodies. */
    private def solveAll(body: Seq[Stmt], env0: Map[String, Any],
        input: Any): Seq[Map[String, Any]] = body match {
      case Seq() => Seq(env0)
      case Stmt.Assign(v, t) +: rest =>
        val candidates =
          try evalAll(t, env0, input) catch { case Undefined => Seq.empty }
        candidates.flatMap(x => solveAll(rest, env0 + (v -> x), input))
      case Stmt.Expr(t) +: rest =>
        val ok =
          try evalAll(t, env0, input).exists {
            case b: Boolean => b
            case _ => true
          } catch { case Undefined => false }
        if (ok) solveAll(rest, env0, input) else Seq.empty
      case Stmt.Not(t) +: rest =>
        val truthy =
          try evalAll(t, env0, input).exists {
            case b: Boolean => b
            case _ => true
          } catch { case Undefined => false }
        if (truthy) Seq.empty else solveAll(rest, env0, input)
      case (e: Stmt.Every) +: rest =>
        val holds =
          try { evalBody(Seq(e), env0, input); true }
          catch { case Undefined => false }
        if (holds) solveAll(rest, env0, input) else Seq.empty
    }

    /** The shared-contract path/resolution ([[RegoData]]): the same
      * trees the data-plane compiler accepts. Constants convert to
      * plain values ONCE here — per-reference conversion would rebuild
      * a large allowlist collection on every request. */
    private val dataValues: Map[List[String], Any] =
      dataConsts.map { case (k, t) => k -> RegoData.toValue(t) }

    private def dataPath(t: Term): Option[List[String]] = RegoData.dataPath(t)

    private def dataResolve(p: List[String]): Option[Any] =
      RegoData.resolveValue(p, dataValues)

    /** All values a term can take (one per `[_]` expansion); empty =
      * undefined. */
    private def evalAll(t: Term, env: Map[String, Any], input: Any): Seq[Any] = t match {
      case Term.Str(v) => Seq(v)
      case Term.Num(v) => Seq(v)
      case Term.Bool(v) => Seq(v)
      case Term.Obj(es) =>
        Seq(es.map { case (k, v) => (evalOne(k, env, input), evalOne(v, env, input)) }
          .map { case (k: String, v) => k -> v
                 case (k, _) => throw Undefined }.toMap)
      case Term.Arr(is) => Seq(is.map(evalOne(_, env, input)).toVector)
      case Term.SetLit(is) => Seq(is.map(evalOne(_, env, input)).toSet)
      // comprehensions: one value per SOLUTION of the body, head
      // evaluated under each solution's bindings (a solution whose head
      // is undefined contributes nothing, as in OPA)
      case Term.ArrCompr(h, b) =>
        Seq(solveAll(b, env, input).flatMap(e =>
          try Seq(evalOne(h, e, input)) catch { case Undefined => Seq.empty })
          .toVector)
      case Term.SetCompr(h, b) =>
        Seq(solveAll(b, env, input).flatMap(e =>
          try Seq(evalOne(h, e, input)) catch { case Undefined => Seq.empty })
          .toSet)
      case Term.ObjCompr(k, v, b) =>
        val pairs = solveAll(b, env, input).flatMap { e =>
          try Seq((evalOne(k, e, input), evalOne(v, e, input)))
          catch { case Undefined => Seq.empty }
        }
        // OPA: one key bound to two different values is a CONFLICT —
        // the whole comprehension is undefined, never a silent pick
        val grouped = pairs.groupBy(_._1)
        if (grouped.values.exists(_.map(_._2).distinct.size > 1)) throw Undefined
        Seq(grouped.map { case (key, vs) =>
          (key match { case s: String => s; case _ => throw Undefined }) -> vs.head._2
        })
      case Term.Ref(n) =>
        env.get(n).map(Seq(_)).getOrElse {
          // bare reference to another rule: true iff any body succeeds
          if (rulesByName.contains(n)) evalCompleteRule(n, input).toSeq
          else Seq.empty
        }
      case _: Term.Sel if dataPath(t).isDefined =>
        dataResolve(dataPath(t).get).toSeq
      case Term.Sel(b, part) =>
        evalAll(b, env, input).flatMap { base =>
          part match {
            case RefPart.Dot(name) => sel(base, name).toSeq
            case RefPart.Idx(i) =>
              evalOne(i, env, input) match {
                case n: BigDecimal => base match {
                  case v: Vector[_] if n.isValidInt && n.toInt >= 0 && n.toInt < v.size =>
                    Seq(v(n.toInt))
                  case _ => Seq.empty
                }
                case k: String => sel(base, k).toSeq
                case _ => Seq.empty
              }
            case RefPart.Wildcard => base match {
              case v: Vector[_] => v
              case mp: Map[_, _] => mp.values.toSeq
              case st: Set[_] => st.toSeq
              case _ => Seq.empty
            }
          }
        }
      case Term.Bin(op, l, r) =>
        for { lv <- evalAll(l, env, input); rv <- evalAll(r, env, input) }
          yield binop(op, lv, rv)
      case Term.Call(fn, args) =>
        // [_] keeps its existential meaning inside call arguments:
        // expand the cartesian product of argument values, skipping
        // combinations for which the call itself is undefined. The
        // expansion is LAZY so a short-circuiting consumer (a body
        // statement's `exists`) stops invoking effectful builtins
        // (http.send) at the first truthy combination
        val combos = args.foldLeft(LazyList(Seq.empty[Any])) { (acc, a) =>
          val vs = evalAll(a, env, input)
          for { c <- acc; v <- vs } yield c :+ v
        }
        combos.flatMap { a =>
          try Seq(call(fn, a, input)) catch { case Undefined => Seq.empty }
        }
    }

    /** Exactly-one value (first expansion); undefined if none. */
    private def evalOne(t: Term, env: Map[String, Any], input: Any): Any =
      evalAll(t, env, input).headOption.getOrElse(throw Undefined)

    private def sel(base: Any, key: String): Option[Any] = base match {
      case mp: Map[_, _] => mp.asInstanceOf[Map[String, Any]].get(key)
      case _ => None
    }

    private def binop(op: String, l: Any, r: Any): Any = (op, l, r) match {
      case ("==", a, b) => a == b
      case ("!=", a, b) => a != b
      // OPA v1 membership: arrays/sets by element, objects by VALUE
      case ("in", a, v: Vector[_]) => v.contains(a)
      case ("in", a, st: Set[_]) => st.asInstanceOf[Set[Any]].contains(a)
      case ("in", a, mp: Map[_, _]) =>
        mp.asInstanceOf[Map[String, Any]].values.exists(_ == a)
      case ("<", a: BigDecimal, b: BigDecimal) => a < b
      case ("<=", a: BigDecimal, b: BigDecimal) => a <= b
      case (">", a: BigDecimal, b: BigDecimal) => a > b
      case (">=", a: BigDecimal, b: BigDecimal) => a >= b
      case ("+", a: BigDecimal, b: BigDecimal) => a + b
      case ("-", a: BigDecimal, b: BigDecimal) => a - b
      case ("*", a: BigDecimal, b: BigDecimal) => a * b
      case ("/", a: BigDecimal, b: BigDecimal) =>
        if (b.signum == 0) throw Undefined
        a(java.math.MathContext.DECIMAL128) / b
      case ("%", a: BigDecimal, b: BigDecimal) =>
        if (b.signum == 0) throw Undefined
        a % b
      case _ => throw Undefined
    }

    private def call(fn: String, args: Seq[Any], input: Any): Any = (fn, args) match {
      case ("startswith", Seq(s: String, p: String)) => s.startsWith(p)
      case ("endswith", Seq(s: String, p: String)) => s.endsWith(p)
      case ("contains", Seq(s: String, p: String)) => s.contains(p)
      case ("lower", Seq(s: String)) => s.toLowerCase
      case ("upper", Seq(s: String)) => s.toUpperCase
      case ("trim", Seq(s: String, cut: String)) =>
        s.dropWhile(c => cut.contains(c)).reverse.dropWhile(c => cut.contains(c)).reverse
      case ("split", Seq(s: String, sep: String)) =>
        s.split(java.util.regex.Pattern.quote(sep), -1).toVector
      case ("count", Seq(v: Vector[_])) => BigDecimal(v.size)
      case ("count", Seq(st: Set[_])) => BigDecimal(st.size)
      case ("count", Seq(s: String)) => BigDecimal(s.length)
      case ("count", Seq(m: Map[_, _])) => BigDecimal(m.size)
      case ("concat", Seq(sep: String, v: Vector[_])) =>
        v.map(_.toString).mkString(sep)
      case ("sprintf", Seq(fmt: String, v: Vector[_])) =>
        String.format(fmt.replace("%v", "%s"), v.map(_.asInstanceOf[Object]): _*)
      case ("time.now_ns", Seq()) => BigDecimal(cfg.nowNs())
      case ("http.send", Seq(req: Map[_, _])) =>
        val r = req.asInstanceOf[Map[String, Any]]
        val url = r.getOrElse("url", throw Undefined).toString
        r.get("method").foreach(m =>
          if (m.toString.toUpperCase != "GET") throw Undefined)
        // the policy's own cache directive: force_cache_duration_seconds
        // (default 3600 when force_cache is set bare), else no caching
        val ttl = r.get("force_cache") match {
          case Some(true) => r.get("force_cache_duration_seconds") match {
            case Some(n: BigDecimal) => n.toLong
            case _ => 3600L
          }
          case _ => 0L
        }
        val body = try cfg.http(url, ttl) catch { case _: Exception => throw Undefined }
        Map("status_code" -> BigDecimal(200), "raw_body" -> body)
      case ("io.jwt.decode", Seq(token: String)) => jwtDecode(token)
      case ("io.jwt.verify_rs256", Seq(token: String, jwks: String)) =>
        verifyRs256(token, jwks)
      case _ =>
        // user function: same-name bodies tried in source order, first
        // defined result wins (Rego's multi-body function semantics)
        functions.getOrElse(fn, Nil).iterator.flatMap { f =>
          try {
            val params = f.params.get
            if (params.size != args.size) None
            else {
              val env = params.zip(args).toMap[String, Any] + ("input" -> input)
              val bodyEnv = evalBody(f.body, env, input)
              Some(evalOne(f.value.get, bodyEnv, input))
            }
          } catch { case Undefined => None }
        }.nextOption().getOrElse(throw Undefined)
    }

    /** `io.jwt.decode` → `[header, payload, sig-hex]` (OPA's contract). */
    private def jwtDecode(token: String): Vector[Any] = token.split('.') match {
      case Array(h, p, s) =>
        try {
          val dec = java.util.Base64.getUrlDecoder
          Vector(
            fromJson(mapper.readTree(dec.decode(h))),
            fromJson(mapper.readTree(dec.decode(p))),
            dec.decode(s).map("%02x".format(_)).mkString)
        } catch { case _: Exception => throw Undefined }
      case _ => throw Undefined
    }

    /** Signature-only RS256 check against a JWK Set — claim checks are
      * the POLICY's job (it pins iss/email/exp itself, docs/rule.md:
      * 271-283), unlike the fused validator in
      * [[graft.sources.PushReceiver.jwtBearerRs256]]. Shares the
      * verification core, [[graft.util.Jwks]], with that validator. */
    private def verifyRs256(token: String, jwksJson: String): Boolean =
      graft.util.Jwks.signatureValid(token, jwksJson)

    private def fromJson(n: JsonNode): Any =
      if (n.isTextual) n.asText()
      else if (n.isNumber) BigDecimal(n.decimalValue())
      else if (n.isBoolean) n.asBoolean()
      else if (n.isArray) n.elements().asScala.map(fromJson).toVector
      else if (n.isObject) n.properties().asScala
        .map(e => e.getKey -> fromJson(e.getValue)).toMap
      else null
  }
}
