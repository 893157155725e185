package graft.rules.rego

/** Parser for the Rego SUBSET the reference's policy surface uses
  * (every construct in its docs and shipped fixtures — grammar examples
  * `/root/reference/docs/rule.md:21-283`, fixtures under
  * `examples/readme/policy/` and the per-package `testdata/policy/`):
  *
  *   - `package event | schema.<name> | auth`
  *   - partial-set rules `src[s] { … }` / `src[{…}] { … }` /
  *     `log[d] { … }`
  *   - complete rules `default deny = true`, `deny := false { allow }`,
  *     boolean rules `allow { … }`
  *   - function rules `jwks_request(url) := http.send({…}).raw_body`
  *   - bodies of `v := expr` bindings, boolean expressions,
  *     `not expr` (negation as failure), OPA-v1 `some v in xs`
  *     (desugared to the backtracking `v := xs[_]` binding), and
  *     `every v in xs { … }` (universal quantification)
  *   - `else` chains on complete and function rules (desugared to
  *     ordered same-name rules — first match wins)
  *   - terms: string/number/bool literals, object/array/set literals
  *     (`{a, b}`), array/set/object comprehensions (`[h | body]`,
  *     `{h | body}`, `{k: v | body}`), dotted refs with `[index]` /
  *     `["key"]` / `[_]`, namespaced calls (`time.parse_rfc3339_ns`,
  *     `io.jwt.verify_rs256`), arithmetic (`+ - * / %`), comparisons
  *     (`== != < <= > >=`, body `=`), and `x in collection` membership
  *   - cross-package `data.<pkg>.<name>` references (resolved by the
  *     compiler/evaluator against sibling modules — see
  *     [[RegoRules.compileAll]] / [[RegoAuth.compile]])
  *
  * NOT a full OPA implementation — no `some i` index form, no `with`,
  * no multi-value variables unified across statements (a `[_]` is
  * existential within its own statement). Parse errors and
  * out-of-subset constructs fail loudly with line/column; nothing is
  * silently skipped — a policy that parses here means every one of its
  * rules is enforced.
  */
object RegoParser {

  // ---- AST ------------------------------------------------------------
  sealed trait Term
  object Term {
    final case class Str(v: String) extends Term
    final case class Num(v: BigDecimal) extends Term
    final case class Bool(v: Boolean) extends Term
    /** A variable / rule-name reference (`input`, `allow`, `r`). */
    final case class Ref(name: String) extends Term
    /** `base.name`, `base[i]`, `base["k"]`, `base[_]`. */
    final case class Sel(base: Term, part: RefPart) extends Term
    /** `fn(args)` — `fn` is the full dotted name (`io.jwt.decode`). */
    final case class Call(fn: String, args: Seq[Term]) extends Term
    final case class Obj(entries: Seq[(Term, Term)]) extends Term
    final case class Arr(items: Seq[Term]) extends Term
    /** `{a, b, c}` — a Rego set literal (distinct, unordered; `{}` is
      * the empty OBJECT as in OPA — the empty set has no literal). */
    final case class SetLit(items: Seq[Term]) extends Term
    final case class Bin(op: String, l: Term, r: Term) extends Term
    /** `[head | body]` — one element per solution of `body`, in
      * enumeration order. */
    final case class ArrCompr(head: Term, body: Seq[Stmt]) extends Term
    /** `{head | body}` — distinct elements (a Rego set). */
    final case class SetCompr(head: Term, body: Seq[Stmt]) extends Term
    /** `{k: v | body}` — a key bound to two different values across
      * solutions is a conflict (undefined), as in OPA. */
    final case class ObjCompr(key: Term, value: Term, body: Seq[Stmt]) extends Term
  }

  sealed trait RefPart
  object RefPart {
    final case class Dot(name: String) extends RefPart
    final case class Idx(t: Term) extends RefPart
    case object Wildcard extends RefPart
  }

  sealed trait Stmt
  object Stmt {
    final case class Assign(name: String, value: Term) extends Stmt
    final case class Expr(t: Term) extends Stmt
    /** `not t` — succeeds iff `t` is undefined or false (Rego negation
      * as failure). */
    final case class Not(t: Term) extends Stmt
    /** `every v in xs { body }` — succeeds iff `body` succeeds for
      * EVERY value of `xs` (vacuously true when empty). */
    final case class Every(v: String, xs: Term, body: Seq[Stmt]) extends Stmt
  }

  /** One rule. `key` = the `[term]` of a partial-set head; `value` = the
    * `= term` / `:= term` of a complete or function head (None for bare
    * boolean rules, which are value `true`); `params` = function rule
    * parameter names. */
  final case class Rule(name: String, key: Option[Term], value: Option[Term],
      params: Option[Seq[String]], body: Seq[Stmt], isDefault: Boolean)

  final case class Module(pkg: Seq[String], rules: Seq[Rule])

  final case class RegoError(msg: String, line: Int, col: Int)
      extends RuntimeException(s"rego parse error at $line:$col: $msg")

  // ---- Tokenizer ------------------------------------------------------
  private sealed trait Tok { def line: Int; def col: Int }
  private final case class TIdent(v: String, line: Int, col: Int) extends Tok
  private final case class TStr(v: String, line: Int, col: Int) extends Tok
  private final case class TNum(v: BigDecimal, line: Int, col: Int) extends Tok
  private final case class TPunct(v: String, line: Int, col: Int) extends Tok
  private final case class TEof(line: Int, col: Int) extends Tok

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0; var line = 1; var col = 1
    def err(m: String) = throw RegoError(m, line, col)
    def advance(n: Int): Unit = {
      var k = 0
      while (k < n) {
        if (src(i) == '\n') { line += 1; col = 1 } else col += 1
        i += 1; k += 1
      }
    }
    val puncts = Seq(":=", "==", "!=", "<=", ">=", "{", "}", "[", "]", "(",
      ")", ",", ":", ".", ";", "<", ">", "=", "+", "-", "*", "/", "%", "|")
    while (i < src.length) {
      val c = src(i)
      if (c == '#') { while (i < src.length && src(i) != '\n') advance(1) }
      else if (c.isWhitespace) advance(1)
      else if (c == '"') {
        val (l0, c0) = (line, col)
        advance(1)
        val sb = new StringBuilder
        while (i < src.length && src(i) != '"') {
          if (src(i) == '\\') {
            if (i + 1 >= src.length) err("unterminated escape")
            advance(1)
            sb.append(src(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case '"' => '"'; case '\\' => '\\'; case '/' => '/'
              case 'u' =>
                if (i + 4 >= src.length) err("bad \\u escape")
                val h = src.substring(i + 1, i + 5); advance(4)
                Integer.parseInt(h, 16).toChar
              case other => err(s"unsupported escape \\$other")
            })
            advance(1)
          } else { sb.append(src(i)); advance(1) }
        }
        if (i >= src.length) err("unterminated string")
        advance(1)
        out += TStr(sb.toString, l0, c0)
      }
      else if (c.isDigit) {
        val (l0, c0) = (line, col)
        val start = i
        while (i < src.length && (src(i).isDigit || src(i) == '.') &&
          // a dot is part of the number only when followed by a digit
          // (so `1000) * 1000` and ref dots never get swallowed)
          !(src(i) == '.' && (i + 1 >= src.length || !src(i + 1).isDigit)))
          advance(1)
        out += TNum(BigDecimal(src.substring(start, i)), l0, c0)
      }
      else if (c.isLetter || c == '_') {
        val (l0, c0) = (line, col)
        val start = i
        while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_'))
          advance(1)
        out += TIdent(src.substring(start, i), l0, c0)
      }
      else {
        val (l0, c0) = (line, col)
        puncts.find(p => src.startsWith(p, i)) match {
          case Some(p) => advance(p.length); out += TPunct(p, l0, c0)
          case None => err(s"unexpected character '$c'")
        }
      }
    }
    out += TEof(line, col)
    out.result()
  }

  // ---- Parser ---------------------------------------------------------
  def parse(src: String): Module = new P(tokenize(src)).module()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def err(m: String): Nothing = throw RegoError(m, cur.line, cur.col)
    private def isPunct(v: String): Boolean =
      cur.isInstanceOf[TPunct] && cur.asInstanceOf[TPunct].v == v
    private def isIdent(v: String): Boolean =
      cur.isInstanceOf[TIdent] && cur.asInstanceOf[TIdent].v == v
    private def eatPunct(v: String): Unit =
      if (isPunct(v)) pos += 1 else err(s"expected '$v'")
    private def ident(): String = cur match {
      case TIdent(v, _, _) => pos += 1; v
      case _ => err("expected identifier")
    }

    def module(): Module = {
      if (!isIdent("package")) err("expected 'package'")
      pos += 1
      val pkg = Seq.newBuilder[String]
      pkg += ident()
      while (isPunct(".")) { pos += 1; pkg += ident() }
      val rules = Seq.newBuilder[Rule]
      while (!cur.isInstanceOf[TEof]) rules ++= rule()
      Module(pkg.result(), rules.result())
    }

    private def rule(): Seq[Rule] = {
      val isDefault = isIdent("default")
      if (isDefault) pos += 1
      val name = ident()
      if (isDefault) {
        if (isPunct("=") || isPunct(":=")) pos += 1 else err("expected '='")
        return Seq(Rule(name, None, Some(term()), None, Nil, isDefault = true))
      }
      if (isPunct("[")) { // partial set: name[term] { body }
        pos += 1
        val key = term()
        eatPunct("]")
        val body = if (isPunct("{")) ruleBody() else Nil
        Seq(Rule(name, Some(key), None, None, body, isDefault = false))
      } else if (isPunct("(")) { // function: name(params) := term { body? }
        pos += 1
        val params = Seq.newBuilder[String]
        if (!isPunct(")")) {
          params += ident()
          while (isPunct(",")) { pos += 1; params += ident() }
        }
        eatPunct(")")
        if (isPunct(":=") || isPunct("=")) pos += 1 else err("expected ':='")
        val value = term()
        val body = if (isPunct("{")) ruleBody() else Nil
        elseChain(Rule(name, None, Some(value), Some(params.result()), body,
          isDefault = false))
      } else { // complete / boolean rule
        val value =
          if (isPunct(":=") || isPunct("=")) { pos += 1; Some(term()) }
          else None
        val body = if (isPunct("{")) ruleBody() else Nil
        if (value.isEmpty && body.isEmpty) err(s"rule '$name' has neither value nor body")
        elseChain(Rule(name, None, value, None, body, isDefault = false))
      }
    }

    /** `else (:= term)? ({ body })?` chain after a complete or function
      * rule: desugared to additional same-name rules in source order —
      * the evaluator takes the first succeeding one, which IS Rego's
      * else semantics (strict ordering, first match wins). An else with
      * a value and no body is the unconditional tail; one with a body
      * and no value is boolean `true` like any bare rule. */
    private def elseChain(first: Rule): Seq[Rule] = {
      val out = Seq.newBuilder[Rule]
      out += first
      while (isIdent("else")) {
        pos += 1
        val value =
          if (isPunct(":=") || isPunct("=")) { pos += 1; Some(term()) }
          else None
        val body = if (isPunct("{")) ruleBody() else Nil
        if (value.isEmpty && body.isEmpty) err("'else' needs a value or a body")
        if (first.params.isDefined && value.isEmpty) err("a function 'else' needs a value")
        out += Rule(first.name, None, value, first.params, body, isDefault = false)
      }
      out.result()
    }

    private def ruleBody(): Seq[Stmt] = {
      eatPunct("{")
      val stmts = Seq.newBuilder[Stmt]
      while (!isPunct("}")) {
        if (cur.isInstanceOf[TEof]) err("expected '}'")
        if (isPunct(";")) { pos += 1 }
        else stmts += stmt()
      }
      eatPunct("}")
      stmts.result()
    }

    private def stmt(): Stmt = {
      if (isIdent("not")) { pos += 1; return Stmt.Not(term()) }
      if (isIdent("some")) {
        // OPA v1 `some v in xs`: iterate xs' VALUES with v bound —
        // exactly `v := xs[_]` (the binding backtracks over the rest
        // of the body). The index form (`some i` alone) and the
        // two-variable form are out of subset and fail loudly.
        pos += 1
        val v = ident()
        if (!isIdent("in")) err("'some' supports only the 'some v in xs' form")
        pos += 1
        return Stmt.Assign(v, Term.Sel(term(), RefPart.Wildcard))
      }
      if (isIdent("every")) {
        // OPA v1 `every v in xs { body }`: universal quantification
        // over xs' VALUES (vacuously true on empty)
        pos += 1
        val v = ident()
        if (!isIdent("in")) err("'every' supports only the 'every v in xs { … }' form")
        pos += 1
        val xs = term()
        if (!isPunct("{")) err("'every' needs a { body }")
        return Stmt.Every(v, xs, ruleBody())
      }
      // lookahead for `ident :=`; cur is never TEof here (ruleBody
      // guards), so pos+1 is always in bounds — but guard anyway
      (cur, if (pos + 1 < toks.length) toks(pos + 1) else cur) match {
        case (TIdent(n, _, _), TPunct(":=", _, _)) =>
          pos += 2
          Stmt.Assign(n, term())
        case _ => Stmt.Expr(term())
      }
    }

    // term := addsub ((cmpOp | 'in') addsub)?
    private def term(): Term = {
      val l = addsub()
      if (isIdent("in")) { // OPA v1 membership: `x in collection`
        pos += 1
        return Term.Bin("in", l, addsub())
      }
      val cmps = Seq("==", "!=", "<=", ">=", "<", ">", "=")
      cmps.find(isPunct) match {
        case Some(op) =>
          pos += 1
          val norm = if (op == "=") "==" else op
          Term.Bin(norm, l, addsub())
        case None => l
      }
    }

    private def addsub(): Term = {
      var l = muldiv()
      while (isPunct("+") || isPunct("-")) {
        val op = cur.asInstanceOf[TPunct].v; pos += 1
        l = Term.Bin(op, l, muldiv())
      }
      l
    }

    private def muldiv(): Term = {
      var l = postfix()
      while (isPunct("*") || isPunct("/") || isPunct("%")) {
        val op = cur.asInstanceOf[TPunct].v; pos += 1
        l = Term.Bin(op, l, postfix())
      }
      l
    }

    /** primary with `.name` / `[...]` / call postfixes. A dotted chain
      * followed by `(` is a namespaced call (`io.jwt.decode(t)`). */
    private def postfix(): Term = {
      var t = primary()
      var done = false
      while (!done) {
        if (isPunct(".")) {
          pos += 1
          val n = ident()
          if (isPunct("(")) {
            val fn = dottedName(t) match {
              case Some(base) => s"$base.$n"
              case None => err("cannot call a computed value")
            }
            t = Term.Call(fn, callArgs())
          } else t = Term.Sel(t, RefPart.Dot(n))
        } else if (isPunct("[")) {
          pos += 1
          val part =
            if (isIdent("_")) { pos += 1; RefPart.Wildcard }
            else RefPart.Idx(term())
          eatPunct("]")
          t = Term.Sel(t, part)
        } else if (isPunct("(")) {
          val fn = dottedName(t).getOrElse(err("cannot call a computed value"))
          t = Term.Call(fn, callArgs())
        } else done = true
      }
      t
    }

    /** The dotted name a Ref/Sel chain spells, if it is a pure name. */
    private def dottedName(t: Term): Option[String] = t match {
      case Term.Ref(n) => Some(n)
      case Term.Sel(b, RefPart.Dot(n)) => dottedName(b).map(p => s"$p.$n")
      case _ => None
    }

    private def callArgs(): Seq[Term] = {
      eatPunct("(")
      val args = Seq.newBuilder[Term]
      if (!isPunct(")")) {
        args += term()
        while (isPunct(",")) {
          pos += 1
          if (!isPunct(")")) args += term() // tolerate trailing comma
        }
      }
      eatPunct(")")
      args.result()
    }

    private def primary(): Term = cur match {
      case TStr(v, _, _) => pos += 1; Term.Str(v)
      case TNum(v, _, _) => pos += 1; Term.Num(v)
      case TIdent("true", _, _) => pos += 1; Term.Bool(true)
      case TIdent("false", _, _) => pos += 1; Term.Bool(false)
      case TIdent(v, _, _) => pos += 1; Term.Ref(v)
      case TPunct("{", _, _) => objLit()
      case TPunct("[", _, _) => arrLit()
      case TPunct("(", _, _) =>
        pos += 1
        val t = term()
        eatPunct(")")
        t
      case TPunct("-", _, _) =>
        pos += 1
        primary() match {
          case Term.Num(v) => Term.Num(-v)
          case t => Term.Bin("-", Term.Num(0), t)
        }
      case _ => err("expected a term")
    }

    /** `{…}` disambiguates on the first entry: `k: v` continues as an
      * object (or `{k: v | body}` — object comprehension), a bare term
      * followed by `|` is a set comprehension, and a bare term followed
      * by `,`/`}` starts a set literal. `{}` is the empty OBJECT (OPA:
      * the empty set has no literal). */
    private def objLit(): Term = {
      eatPunct("{")
      if (isPunct("}")) { pos += 1; return Term.Obj(Nil) }
      val first = term()
      if (isPunct(":")) {
        pos += 1
        val v = term()
        if (isPunct("|")) { // {k: v | body}
          pos += 1
          return Term.ObjCompr(first, v, comprBody("}"))
        }
        val entries = Seq.newBuilder[(Term, Term)]
        entries += ((first, v))
        while (!isPunct("}")) {
          if (isPunct(",")) pos += 1
          else err("expected ',' or '}' in object")
          if (!isPunct("}")) {
            val k = term()
            eatPunct(":")
            entries += ((k, term()))
          }
        }
        eatPunct("}")
        Term.Obj(entries.result())
      } else if (isPunct("|")) { // {head | body}
        pos += 1
        Term.SetCompr(first, comprBody("}"))
      } else { // {a, b, c} — set literal
        val items = Seq.newBuilder[Term]
        items += first
        while (!isPunct("}")) {
          if (isPunct(",")) pos += 1
          else err("expected ',' or '}' in set literal")
          if (!isPunct("}")) items += term()
        }
        eatPunct("}")
        Term.SetLit(items.result())
      }
    }

    private def arrLit(): Term = {
      eatPunct("[")
      if (isPunct("]")) { pos += 1; return Term.Arr(Nil) }
      val first = term()
      if (isPunct("|")) { // [head | body]
        pos += 1
        return Term.ArrCompr(first, comprBody("]"))
      }
      val items = Seq.newBuilder[Term]
      items += first
      while (!isPunct("]")) {
        if (isPunct(",")) pos += 1
        else err("expected ',' or ']' in array")
        if (!isPunct("]")) items += term()
      }
      eatPunct("]")
      Term.Arr(items.result())
    }

    /** Statements of a comprehension body, up to (not eating past) the
      * closing bracket. Same statement grammar as rule bodies. */
    private def comprBody(close: String): Seq[Stmt] = {
      val stmts = Seq.newBuilder[Stmt]
      while (!isPunct(close)) {
        if (cur.isInstanceOf[TEof]) err(s"expected '$close'")
        if (isPunct(";")) { pos += 1 }
        else stmts += stmt()
      }
      eatPunct(close)
      stmts.result()
    }
  }
}
