package graft.rules.rego

import RegoParser.{Module, RefPart, Term}

/** The shared `data` document contract — ONE definition of what a data
  * module is, how `data.` paths spell, and how they resolve, used by
  * BOTH frontends ([[RegoRules]] compiles constants into SQL at load;
  * [[RegoAuth]] resolves them in the request-path evaluator). Factored
  * here so the two cannot drift: the data plane and the auth plane
  * accept exactly the same policy trees.
  *
  * A DATA module is any package that is not `event`/`schema.*`/`auth`;
  * its rules must be parameterless literal constants
  * (`name := <literal>` — strings, numbers, bools, and
  * arrays/sets/objects thereof). References are `data.<pkg>.<name>`
  * plus optional field selections INTO object constants, in either
  * spelling (`data.consts.limits.hot` ≡ `data.consts.limits["hot"]`).
  */
object RegoData {

  /** One data module's constant table. Loud on anything non-constant. */
  def moduleConstants(m: Module): Seq[(List[String], Term)] =
    m.rules.map { r =>
      require(r.params.isEmpty && r.body.isEmpty && r.key.isEmpty,
        s"data module ${m.pkg.mkString(".")}: rule '${r.name}' must be a " +
          "parameterless constant (name := <literal>)")
      val v = r.value.getOrElse(sys.error(
        s"data module ${m.pkg.mkString(".")}: rule '${r.name}' has no value"))
      requireLiteral(v, s"${m.pkg.mkString(".")}.${r.name}")
      (m.pkg.toList :+ r.name) -> v
    }

  def requireLiteral(t: Term, what: String): Unit = t match {
    case _: Term.Str | _: Term.Num | _: Term.Bool =>
    case Term.Arr(is) => is.foreach(requireLiteral(_, what))
    case Term.SetLit(is) => is.foreach(requireLiteral(_, what))
    case Term.Obj(es) => es.foreach { case (k, v) =>
      requireLiteral(k, what); requireLiteral(v, what) }
    case other => sys.error(s"data constant $what must be a literal, got $other")
  }

  /** The `data.a.b…` path of a term, if it is one — dotted parts and
    * string-index parts both count (`data.a["b"]` ≡ `data.a.b`, as in
    * OPA refs). */
  def dataPath(t: Term): Option[List[String]] = t match {
    case Term.Ref("data") => Some(Nil)
    case Term.Sel(b, RefPart.Dot(n)) => dataPath(b).map(_ :+ n)
    case Term.Sel(b, RefPart.Idx(Term.Str(k))) => dataPath(b).map(_ :+ k)
    case _ => None
  }

  /** Resolve a data path: the LONGEST prefix naming a constant, with
    * remaining segments selected into that constant's object-literal
    * value. None = nothing resolves (callers fail loudly at load — a
    * typo'd path must never silently never-match). */
  def resolve(p: List[String], consts: Map[List[String], Term]): Option[Term] =
    (p.length to 1 by -1).view.flatMap { k =>
      consts.get(p.take(k)).map { base =>
        p.drop(k).foldLeft(Option(base)) {
          case (Some(Term.Obj(es)), key) =>
            es.collectFirst { case (Term.Str(`key`), v) => v }
          case _ => None
        }
      }
    }.headOption.flatten

  /** Value-level twin of [[resolve]] for constants ALREADY converted
    * with [[toValue]] (the auth evaluator pre-converts once at load —
    * converting per reference would rebuild a large allowlist on every
    * request of the auth hot path). */
  def resolveValue(p: List[String], consts: Map[List[String], Any]): Option[Any] =
    (p.length to 1 by -1).view.flatMap { k =>
      consts.get(p.take(k)).map { base =>
        p.drop(k).foldLeft(Option[Any](base)) {
          case (Some(m: Map[_, _]), key) =>
            m.asInstanceOf[Map[String, Any]].get(key)
          case _ => None
        }
      }
    }.headOption.flatten

  /** Literal term → the auth evaluator's plain-Scala value universe. */
  def toValue(t: Term): Any = t match {
    case Term.Str(v) => v
    case Term.Num(v) => v
    case Term.Bool(v) => v
    case Term.Arr(is) => is.map(toValue).toVector
    case Term.SetLit(is) => is.map(toValue).toSet
    case Term.Obj(es) => es.map {
      case (Term.Str(k), v) => k -> toValue(v)
      case (k, _) => sys.error(s"data constant: non-string object key $k")
    }.toMap
    case other => sys.error(s"data constant must be a literal, got $other")
  }
}
