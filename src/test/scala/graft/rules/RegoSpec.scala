package graft.rules

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.SparkSpec
import graft.rules.rego.{RegoAuth, RegoParser, RegoRules}
import graft.rules.rego.RegoAuth.AuthInput

/** The Rego frontend: the reference's policy grammar loading unmodified
  * onto the Spark-native rule DSL (event/schema → compiled SQL rules)
  * and the request-path evaluator (auth). Shapes mirror the reference's
  * docs (`docs/rule.md`) and fixtures (the `.rego` files under
  * `examples/readme/policy/`, `pkg/usecase/testdata/policy/`, and
  * `pkg/controller/server/testdata/policy/`). */
class RegoSpec extends SparkSpec {

  // ---- event rules -----------------------------------------------------

  private val eventRego = """package event

# compressed web access logs
src[s] {
	input.cs.bucket == "corp-logs"
	startswith(input.cs.name, "/web/")
	endswith(input.cs.name, ".log.gz")
	s := {
		"parser": "json",
		"schema": "web_access",
		"compress": "gzip",
	}
}

# plain ones — head-object form, storage-event input doc
src[{
	"parser": "json",
	"schema": "web_access",
}] {
	input.data.kind == "storage#object"
	input.data.bucket == "corp-logs"
	endswith(input.cs.name, ".log")
}
"""

  test("event module compiles to EventRules whose predicates match like Rego") {
    import spark.implicits._
    val rules = RegoRules.compile(eventRego)
    assert(rules.event.size == 2 && rules.schema.isEmpty)
    val Seq(gz, plain) = rules.event
    assert(gz.compress == "gzip" && gz.schemaRule == "web_access")
    assert(plain.compress == "" && plain.parser == "json")

    val meta = Seq(
      ("corp-logs", "/web/a.log.gz", 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("corp-logs", "/web/b.log", 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"),
      ("other-bkt", "/web/c.log.gz", 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "cc"),
      ("corp-logs", "/img/d.png", 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "dd"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = rules.matchObjects(meta).map { case (r, df) =>
      r.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(gz.name) == Set("/web/a.log.gz"))
    assert(matched(plain.name) == Set("/web/b.log"))
  }

  test("event rules: multiDoc extension key; bad values rejected") {
    val r = RegoRules.compile("""package event
src[{"parser": "json", "schema": "s", "multiDoc": true}] {
	endswith(input.cs.name, ".json")
}""")
    assert(r.event.head.multiDoc)
    intercept[RuntimeException](RegoRules.compile(
      """package event
src[{"parser": "json", "schema": "s", "multiDoc": "yes"}] { endswith(input.cs.name, ".json") }"""))
  }

  test("event rules reject unmapped input paths and non-src rules at compile") {
    val badPath = "package event\nsrc[{\"schema\": \"s\"}] { input.data.generation == \"3\" }"
    val e = intercept[RuntimeException](RegoRules.compile(badPath))
    assert(e.getMessage.contains("generation"))
    val badRule = "package event\nallow { input.cs.bucket == \"b\" }"
    intercept[RuntimeException](RegoRules.compile(badRule))
  }

  // ---- schema rules ----------------------------------------------------

  private val schemaRego = """package schema.audit_trail

log[{
	"dataset": "sec",
	"table": "audit",
	"timeunit": "month",
	"id": r.event_id,
	"timestamp": time.parse_rfc3339_ns(r.event_time) / 1000000000,
	"data": r,
}] {
	r := input.Records[_]
}
"""

  test("schema module: explode binding, rfc3339 arithmetic, routing literals") {
    val rules = RegoRules.compile(schemaRego)
    val s = rules.schemaRule("audit_trail")
    assert(s.explodePath.contains("Records"))
    assert(s.partition == "month")
    assert(s.dataset == "'sec'" && s.table == "'audit'")
    assert(s.id.contains("`event_id`"))
    // parse_rfc3339_ns is nanos (OPA's unit); the rule divides to seconds
    assert(s.timestamp == "((unix_micros(to_timestamp(`event_time`)) * 1000) / 1000000000)")
    assert(s.literalDests.contains(Seq(("sec", "audit", "month"))))
  }

  test("out-of-subset schema shapes fail loudly") {
    // data as a computed non-object, non-record term
    val bad = """package schema.x
log[d] { d := {"dataset": "d", "table": "t", "timestamp": input.ts,
  "data": input.nested} }"""
    assert(intercept[RuntimeException](RegoRules.compile(bad))
      .getMessage.contains("whole record"))
    // package auth routed to the wrong loader
    assert(intercept[RuntimeException](RegoRules.compile("package auth\nallow { input.path == \"/\" }"))
      .getMessage.contains("RegoAuth"))
  }

  test("rego-loaded rules drive a real ingest end-to-end (explode + rfc3339 ts)") {
    import spark.implicits._
    import graft.ingest.{Pipeline, TableSink}
    import graft.schema.SchemaRegistry
    val work = tmpDir("rego-e2e")
    writeFile(work, "rules/10_event.rego", """package event
src[s] {
	endswith(input.cs.name, ".json")
	s := {"parser": "json", "schema": "audit_trail"}
}
""")
    writeFile(work, "rules/20_schema.rego", schemaRego)
    writeFile(work, "landing/a.json",
      """{"Records":[{"event_id":"e1","event_time":"2024-05-01T10:00:00Z","action":"login"},{"event_id":"e2","event_time":"2024-06-02T11:30:00Z","action":"logout"}]}
{"Records":[{"event_id":"e3","event_time":"2024-06-03T00:00:00Z","action":"delete"}]}""")
    val rules = RuleLoader.fromDir(s"$work/rules")
    assert(rules.event.size == 1 && rules.schema.size == 1)
    val registry = new SchemaRegistry(s"$work/wh")
    Pipeline.ingestPaths(spark, Pipeline.Config(registry, rules),
      Seq(s"$work/landing/a.json"))
    val rows = TableSink.read(spark, registry, "sec", "audit")
      .selectExpr("id", "cast(timestamp as string) ts", "data.action")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("e1", "e2", "e3"))
    assert(rows.head._2 == "2024-05-01 10:00:00") // rfc3339 → seconds → timestamp
    assert(rows.map(_._3).toSeq == Seq("login", "logout", "delete"))
  }

  test("set semantics: two log rules under one schema each emit (record multiplies)") {
    import spark.implicits._
    import graft.ingest.{Pipeline, TableSink}
    import graft.schema.SchemaRegistry
    // ≡ ref `log[d]` set accumulation across rules (load.go:205-245)
    val rules = RegoRules.compile("""package schema.traffic
log[d] {
	d := {"dataset": "net", "table": "all_flows", "timestamp": input.ts, "data": input}
}
log[d] {
	input.proto == "tcp"
	d := {"dataset": "net", "table": "tcp_flows", "timestamp": input.ts, "data": input}
}
""")
    assert(rules.schema.size == 2)
    assert(rules.schemaRulesFor("traffic").map(_.table) == Seq("'all_flows'", "'tcp_flows'"))
    intercept[RuntimeException](rules.schemaRule("traffic")) // single-rule accessor stays loud

    val work = tmpDir("rego-set")
    writeFile(work, "landing/f.json",
      """{"ts":1700000000.0,"proto":"tcp","bytes":10}
{"ts":1700000001.0,"proto":"udp","bytes":20}
{"ts":1700000002.0,"proto":"tcp","bytes":30}""")
    val all = Rules(
      Seq(EventRule(name = "flows", when = "name LIKE '%.json'", schemaRule = "traffic")),
      rules.schema)
    val registry = new SchemaRegistry(s"$work/wh")
    Pipeline.ingestPaths(spark, Pipeline.Config(registry, all),
      Seq(s"$work/landing/f.json"))
    assert(TableSink.read(spark, registry, "net", "all_flows").count() == 3)
    assert(TableSink.read(spark, registry, "net", "tcp_flows")
      .selectExpr("data.bytes").as[Long].collect().sorted.toSeq == Seq(10L, 30L))
  }

  test("reshaped data object: full replacement; id still sees dropped fields") {
    import spark.implicits._
    import graft.ingest.{Pipeline, TableSink}
    import graft.schema.SchemaRegistry
    // ≡ docs/rule.md:166-168 — "data" as a new object, not the input
    val rules = RegoRules.compile("""package schema.flows
log[d] {
	d := {
		"dataset": "net",
		"table": "slim",
		"id": input.flow_id,
		"timestamp": input.ts,
		"data": {"proto": lower(input.proto), "kb": input.bytes / 1000},
	}
}
""")
    val s = rules.schemaRule("flows")
    assert(s.dataSelect.contains(Seq(
      ("proto", "lower(`proto`)"), ("kb", "(`bytes` / 1000)"))))

    val work = tmpDir("rego-reshape")
    writeFile(work, "landing/f.json",
      """{"ts":1700000000.0,"proto":"TCP","bytes":2000,"flow_id":"f1","secret":"x"}""")
    val all = Rules(
      Seq(EventRule(name = "flows", when = "name LIKE '%.json'", schemaRule = "flows")),
      rules.schema)
    val registry = new SchemaRegistry(s"$work/wh")
    Pipeline.ingestPaths(spark, Pipeline.Config(registry, all),
      Seq(s"$work/landing/f.json"))
    val row = TableSink.read(spark, registry, "net", "slim")
      .selectExpr("id", "data.proto", "data.kb").as[(String, String, Double)]
      .collect().toSeq
    assert(row == Seq(("f1", "tcp", 2.0))) // id from a field data dropped
    val dataFields = TableSink.read(spark, registry, "net", "slim")
      .schema("data").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq
    assert(dataFields == Seq("proto", "kb")) // replacement, not a patch
  }

  // ---- auth policies ---------------------------------------------------

  private def in(path: String = "/", header: Map[String, Seq[String]] = Map.empty,
      query: Map[String, Seq[String]] = Map.empty): AuthInput =
    AuthInput("POST", path, "198.51.100.3", query, header, "")

  test("auth: default deny + bearer / path / query allow rules (fixture shape)") {
    val policy = RegoAuth.compile("""package auth

default deny = true

deny = false {
	allow
}

allow {
	input.header.Authorization[_] == "Bearer sesame"
}

allow {
	input.path == "/event/hook-7f3a"
}

allow {
	input.query.token[_] == "q-tok"
}
""")
    assert(policy(in(header = Map("Authorization" -> Seq("Bearer sesame")))))
    assert(policy(in(header = Map("Authorization" -> Seq("Basic xx", "Bearer sesame")))))
    assert(!policy(in(header = Map("Authorization" -> Seq("Bearer wrong")))))
    assert(!policy(in()))
    assert(policy(in(path = "/event/hook-7f3a")))
    assert(policy(in(query = Map("token" -> Seq("nope", "q-tok")))))
    assert(!policy(in(query = Map("token" -> Seq("nope")))))
  }

  test("auth: no deny rule means allow-all; deny without default denies only on match") {
    val empty = RegoAuth.compile("package auth\n\nallow { input.path == \"/x\" }")
    assert(empty(in())) // undefined deny → allow (docs/rule.md:214)
    val health = RegoAuth.compile(
      "package auth\n\ndeny { input.path == \"/health\" }")
    assert(!health(in(path = "/health")))
    assert(health(in(path = "/event")))
  }

  test("auth: the full Google-JWKS idiom — helper fn, http.send cache, claims") {
    // keypair + JWKS fixture, as in PushReceiverSpec
    val gen = java.security.KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val kp = gen.generateKeyPair()
    val evil = gen.generateKeyPair()
    def b64(bytes: Array[Byte]): String =
      Base64.getUrlEncoder.withoutPadding().encodeToString(bytes)
    def b64s(s: String): String = b64(s.getBytes(UTF_8))
    def jwk(kp: java.security.KeyPair): String = {
      val pub = kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
      def uint(b: java.math.BigInteger) = {
        val raw = b.toByteArray
        b64(if (raw(0) == 0) raw.tail else raw)
      }
      s"""{"kty":"RSA","alg":"RS256","kid":"k1","n":"${uint(pub.getModulus)}","e":"${uint(pub.getPublicExponent)}"}"""
    }
    def sign(payload: String, signer: java.security.KeyPair): String = {
      val h = b64s("""{"alg":"RS256","kid":"k1"}""")
      val p = b64s(payload)
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initSign(signer.getPrivate)
      sig.update(s"$h.$p".getBytes(UTF_8))
      s"$h.$p.${b64(sig.sign())}"
    }
    val email = "pusher@proj.iam.gserviceaccount.com"
    val iss = "https://accounts.google.com"
    val now = 1700000000L
    def claims(exp: Long, em: String = email) =
      s"""{"iss":"$iss","email":"$em","exp":$exp}"""

    var fetches = 0
    var seenTtl = -1L
    val cfg = RegoAuth.Config(
      http = (url, ttl) => {
        assert(url == "https://www.googleapis.com/oauth2/v3/certs")
        seenTtl = ttl
        fetches += 1
        s"""{"keys":[${jwk(kp)}]}"""
      },
      nowNs = () => now * 1000000000L)

    // the docs' policy, verbatim shape: helper function + verify + claims
    val policy = RegoAuth.compile(s"""package auth

default deny = true

deny := false { allow }

jwks_request(url) := http.send({
	"url": url,
	"method": "GET",
	"force_cache": true,
	"force_cache_duration_seconds": 3600
}).raw_body

allow {
	authHdr := input.header["Authorization"]
	count(authHdr) == 1
	authHdrValues := split(authHdr[0], " ")
	count(authHdrValues) == 2
	lower(authHdrValues[0]) == "bearer"
	token := authHdrValues[1]

	jwks := jwks_request("https://www.googleapis.com/oauth2/v3/certs")

	io.jwt.verify_rs256(token, jwks)
	claims := io.jwt.decode(token)

	claims[1]["iss"] == "$iss"
	claims[1]["email"] == "$email"
	time.now_ns() / (1000 * 1000 * 1000) < claims[1]["exp"]
}
""", cfg)

    def withTok(t: String) = in(header = Map("Authorization" -> Seq(s"Bearer $t")))
    assert(policy(withTok(sign(claims(now + 3600), kp))), "valid token allows")
    assert(!policy(withTok(sign(claims(now - 10), kp))), "expired denies")
    assert(!policy(withTok(sign(claims(now + 3600, "other@x"), kp))), "wrong email denies")
    assert(!policy(withTok(sign(claims(now + 3600), evil))), "wrong key denies")
    assert(!policy(in(header = Map("Authorization" ->
      Seq(s"Bearer ${sign(claims(now + 3600), kp)}", "Bearer second")))),
      "count(authHdr)==1 enforced like the policy says")
    assert(!policy(in()), "no header denies")
    assert(fetches >= 1)
    assert(seenTtl == 3600L, "policy's force_cache_duration_seconds reaches the fetcher")
  }

  test("auth: unknown builtins fail at compile, not first request") {
    val e = intercept[RuntimeException](RegoAuth.compile(
      "package auth\nallow { net.cidr_contains(\"10.0.0.0/8\", input.remote) }"))
    assert(e.getMessage.contains("net.cidr_contains"))
  }

  // ---- the reference's own shipped policies ----------------------------

  test("the reference's shipped .rego policies load unmodified (when present)") {
    val ref = java.nio.file.Paths.get("/root/reference")
    assume(java.nio.file.Files.isDirectory(ref), "reference checkout not present")
    def read(p: String) = java.nio.file.Files.readString(ref.resolve(p))

    // examples/readme/policy: one src rule, one schema rule
    val readme = RegoRules.compile(read("examples/readme/policy/event.rego"))
    assert(readme.event.size == 1)
    val readmeSchema = RegoRules.compile(read("examples/readme/policy/schema.rego"))
    assert(readmeSchema.schemaRule("my_log").id.contains("`log_id`"))

    // pkg/usecase/testdata/policy: two src rules (gz + plain), a schema
    // rule with Records[_] explode and parse_rfc3339_ns arithmetic
    val ev = RegoRules.compile(read("pkg/usecase/testdata/policy/event.rego"))
    assert(ev.event.size == 2)
    assert(ev.event.map(_.compress).toSet == Set("", "gzip"))
    val ct = RegoRules.compile(read("pkg/usecase/testdata/policy/schema.rego"))
    val s = ct.schemaRule("cloudtrail")
    assert(s.explodePath.contains("Records") && s.partition == "month")

    // pkg/controller/server/testdata/policy/auth_token.rego
    val auth = RegoAuth.compile(read("pkg/controller/server/testdata/policy/auth_token.rego"))
    assert(auth(in(header = Map("Authorization" -> Seq("Bearer good-token")))))
    assert(!auth(in(header = Map("Authorization" -> Seq("Bearer bad-token")))))
  }

  // ---- the PushReceiver seam -------------------------------------------

  test("asHttpAuth wires a compiled policy into the receiver") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val policy = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
allow { input.header.Authorization[_] == "Bearer spool-key" }
""")
    val spool = tmpDir("rego-push")
    val rx = new graft.sources.PushReceiver(spool,
      auth = RegoAuth.asHttpAuth(policy)).start()
    try {
      val http = HttpClient.newHttpClient()
      val ev = Base64.getEncoder.encodeToString(
        """{"kind":"storage#object","bucket":"b","name":"o.log","size":"1","timeCreated":"2024-05-01T10:00:00Z"}""".getBytes(UTF_8))
      val body = s"""{"message":{"messageId":"m1","data":"$ev"},"subscription":"s"}"""
      def post(tok: Option[String]): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"http://localhost:${rx.boundPort}/"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        tok.foreach(t => b.header("Authorization", t))
        http.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(post(Some("Bearer spool-key")) == 204)
      assert(post(Some("Bearer wrong")) == 401)
      assert(post(None) == 401)
    } finally rx.stop()
  }

  // ---- negation, existentials, compile-time name checks ----------------

  test("auth: `not` is negation-as-failure") {
    val policy = RegoAuth.compile("""package auth
deny { not allow }
allow { input.path == "/hook" }
""")
    assert(policy(in(path = "/hook")))
    assert(!policy(in(path = "/other"))) // allow undefined → not succeeds → deny
  }

  test("auth: unknown names fail at compile (a typo'd helper would fail open)") {
    val e = intercept[RuntimeException](RegoAuth.compile(
      "package auth\ndeny { not alow }\nallow { input.path == \"/hook\" }"))
    assert(e.getMessage.contains("alow"))
  }

  test("auth: a bare reference to a function-only name fails at compile") {
    // is_blocked only exists as a function: the bare ref would be
    // undefined at runtime, silently disarming the deny
    val e = intercept[RuntimeException](RegoAuth.compile(
      """package auth
deny { is_blocked }
is_blocked(p) := true { startswith(p, "/admin") }"""))
    assert(e.getMessage.contains("is_blocked"))
  }

  test("auth: recursive rule references fail at compile, not StackOverflow at request time") {
    val e = intercept[RuntimeException](RegoAuth.compile(
      "package auth\ndeny { helper }\nhelper { deny }"))
    assert(e.getMessage.contains("recursive"))
    val e2 = intercept[RuntimeException](RegoAuth.compile(
      "package auth\ndeny { deny }"))
    assert(e2.getMessage.contains("recursive"))
  }

  test("auth: [_] stays existential inside call arguments") {
    val p = RegoAuth.compile("""package auth
blocked := ["/admin", "/internal"]
deny { startswith(input.path, blocked[_]) }
""")
    assert(!p(in(path = "/admin/x")))
    assert(!p(in(path = "/internal/x"))) // the SECOND prefix must also deny
    assert(p(in(path = "/public/x")))
  }

  test("auth: a := binding over [_] backtracks across the rest of the body") {
    val p = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
allow {
	h := input.header.Authorization[_]
	startswith(h, "Bearer ")
	h == "Bearer good"
}
""")
    // the matching value is NOT the first — binding must backtrack
    assert(p(in(header = Map("Authorization" -> Seq("Basic x", "Bearer good")))))
    assert(!p(in(header = Map("Authorization" -> Seq("Basic x", "Bearer bad")))))
  }

  test("auth: multi-body functions are tried in order (Rego semantics)") {
    val p = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
ok(p) := true { p == "/a" }
ok(p) := true { p == "/b" }
allow { ok(input.path) }
""")
    assert(p(in(path = "/a")))
    assert(p(in(path = "/b"))) // the SECOND body must also be live
    assert(!p(in(path = "/c")))
  }

  test("asHttpAuth canonicalizes multi-word header names (Go net/http form)") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val policy = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
allow { input.header["X-Goog-Channel-Token"][_] == "s3cr3t" }
""")
    val spool = tmpDir("rego-push-hdr")
    val rx = new graft.sources.PushReceiver(spool,
      auth = RegoAuth.asHttpAuth(policy)).start()
    try {
      val http = HttpClient.newHttpClient()
      val ev = Base64.getEncoder.encodeToString(
        """{"kind":"storage#object","bucket":"b","name":"o.log","size":"1","timeCreated":"2024-05-01T10:00:00Z"}""".getBytes(UTF_8))
      val body = s"""{"message":{"messageId":"m1","data":"$ev"},"subscription":"s"}"""
      def post(hdr: Option[(String, String)]): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"http://localhost:${rx.boundPort}/"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        hdr.foreach { case (k, v) => b.header(k, v) }
        http.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      // sun's server lowercases to "X-goog-channel-token"; the policy
      // matches the Go-canonical name the reference presents
      assert(post(Some("X-Goog-Channel-Token" -> "s3cr3t")) == 204)
      assert(post(Some("X-Goog-Channel-Token" -> "wrong")) == 401)
      assert(post(None) == 401)
    } finally rx.stop()
  }

  test("event/schema rules: `not` compiles to null-safe SQL negation") {
    import spark.implicits._
    val r = RegoRules.compile("""package event
src[{"schema": "s"}] {
	input.cs.bucket == "corp-logs"
	not endswith(input.cs.name, ".tmp")
}""")
    assert(r.event.head.when.contains("NOT coalesce"))
    val meta = Seq(
      ("corp-logs", "/a.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("corp-logs", "/b.tmp", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = r.matchObjects(meta).map { case (er, df) =>
      er.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(r.event.head.name) == Set("/a.log"))
  }

  test("string literals with backslashes survive SQL compilation") {
    import spark.implicits._
    // raw triple-quote: the Rego source holds logs\\2024, value logs\2024
    val r = RegoRules.compile("""package event
src[{"schema": "s"}] { input.cs.name == "logs\\2024" }""")
    val meta = Seq(
      ("b", "logs\\2024", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("b", "logs2024", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = r.matchObjects(meta).map { case (er, df) =>
      er.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(r.event.head.name) == Set("logs\\2024"))
  }

  test("auth: else chains evaluate in order, first match wins") {
    val p = RegoAuth.compile("""package auth
level := "admin" { startswith(input.path, "/admin") }
  else := "user" { startswith(input.path, "/u") }
  else := "anon"
deny { level == "anon" }
""")
    assert(p(in(path = "/admin/x")))
    assert(p(in(path = "/u/1")))
    assert(!p(in(path = "/other"))) // unconditional else tail → anon → deny
  }

  test("auth: `some v in xs` iterates with backtracking; `in` is membership") {
    val p = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
allow {
	some h in input.header.Authorization
	h == "Bearer good"
}
""")
    assert(p(in(header = Map("Authorization" -> Seq("Basic x", "Bearer good")))))
    assert(!p(in(header = Map("Authorization" -> Seq("Basic x")))))
    val m = RegoAuth.compile("""package auth
deny { input.path in ["/admin", "/internal"] }
""")
    assert(!m(in(path = "/internal")))
    assert(m(in(path = "/public")))
    // out-of-subset `some i` index form fails at parse
    intercept[RegoParser.RegoError](RegoAuth.compile(
      "package auth\nallow { some i; input.q[i] == 1 }"))
  }

  test("auth: `every v in xs { … }` quantifies universally, vacuously true on empty") {
    val p = RegoAuth.compile("""package auth
default deny = true
deny = false { allow }
allow {
	every h in input.header.Authorization { startswith(h, "Bearer ") }
	count(input.header.Authorization) >= 1
}
""")
    assert(p(in(header = Map("Authorization" -> Seq("Bearer a", "Bearer b")))))
    assert(!p(in(header = Map("Authorization" -> Seq("Bearer a", "Basic x")))))
    assert(!p(in())) // no header: the collection is undefined → deny
  }

  test("schema rules: `some r in input.Records` is the explode binding") {
    val rules = RegoRules.compile("""package schema.ct
log[{"dataset": "d", "table": "t", "timestamp": r.ts, "data": r}] {
	some r in input.Records
}""")
    assert(rules.schemaRule("ct").explodePath.contains("Records"))
  }

  test("event rules: `in` membership compiles to a codegen'd IN list") {
    import spark.implicits._
    val r = RegoRules.compile("""package event
src[{"schema": "s"}] { input.cs.bucket in ["corp-logs", "corp-audit"] }""")
    assert(r.event.head.when.contains(" IN ("))
    val meta = Seq(
      ("corp-logs", "/a.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("corp-audit", "/b.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"),
      ("other", "/c.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "cc"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = r.matchObjects(meta).map { case (er, df) =>
      er.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(r.event.head.name) == Set("/a.log", "/b.log"))
  }

  // ---- sets, comprehensions, every, data.-refs (full-generality pass) --

  test("auth: set literals — membership, count, iteration") {
    val allow = RegoAuth.compile("""package auth
default deny = true
deny := false {
	input.method in {"GET", "HEAD"}
	count({"a", "b", "a"}) == 2
}""")
    assert(allow(AuthInput("GET", "/", "", Map.empty, Map.empty, "")))
    assert(allow(AuthInput("HEAD", "/", "", Map.empty, Map.empty, "")))
    assert(!allow(AuthInput("POST", "/", "", Map.empty, Map.empty, "")))
  }

  test("auth: array/set/object comprehensions enumerate body solutions") {
    val allow = RegoAuth.compile("""package auth
default deny = true
scopes := [s | s := split(input.header["X-Scopes"][0], ",")[_]; s != ""]
uniq := {s | s := split(input.header["X-Scopes"][0], ",")[_]; s != ""}
lens := {s: count(s) | s := split(input.header["X-Scopes"][0], ",")[_]; s != ""}
deny := false {
	count(scopes) == 3
	count(uniq) == 2
	"read" in uniq
	lens["write"] == 5
}""")
    def in(h: String) = AuthInput("GET", "/", "",
      Map.empty, Map("X-Scopes" -> Seq(h)), "")
    // duplicates: the ARRAY keeps them (3), the SET collapses (2); the
    // object maps each scope to its length
    assert(allow(in("read,write,read")))
    assert(!allow(in("read,write")), "array count must see 3 elements")
    assert(!allow(in("read,read,read")), "set must collapse to 1, not 2")
  }

  test("auth: object comprehension key conflict is undefined (rule fails closed)") {
    val allow = RegoAuth.compile("""package auth
default deny = true
m := {k: v | p := split(input.header["X-P"][0], ",")[_]; k := split(p, "=")[0]; v := split(p, "=")[1]}
deny := false { m["a"] == "1" }""")
    def in(h: String) = AuthInput("GET", "/", "",
      Map.empty, Map("X-P" -> Seq(h)), "")
    assert(allow(in("a=1,b=2")))
    // same key bound to two values: the comprehension is UNDEFINED
    // (OPA conflict), so the deny-false rule fails and default denies
    assert(!allow(in("a=1,a=2")))
    // same key, same value: no conflict
    assert(allow(in("a=1,a=1")))
  }

  test("auth: data.<pkg> constants resolve from sibling modules; typos fail at compile") {
    val data = Seq("""package tokens
allowed := {"tok-a", "tok-b"}
limits := {"max_scopes": 2}
""")
    val allow = RegoAuth.compile("""package auth
default deny = true
deny := false {
	split(input.header["Authorization"][0], " ")[1] in data.tokens.allowed
	count(split(input.header["X-Scopes"][0], ",")) <= data.tokens.limits.max_scopes
}""", RegoAuth.Config(), data)
    def in(tok: String, scopes: String) = AuthInput("GET", "/", "", Map.empty,
      Map("Authorization" -> Seq(s"Bearer $tok"), "X-Scopes" -> Seq(scopes)), "")
    assert(allow(in("tok-a", "read,write")))
    assert(!allow(in("tok-c", "read")), "token outside the data set must deny")
    assert(!allow(in("tok-a", "a,b,c")), "scope count over the data limit must deny")
    // a typo'd data path fails at COMPILE (it would silently fail open
    // a deny body, or fail closed an allow — either way, silently)
    val e = intercept[RuntimeException](RegoAuth.compile(
      "package auth\ndeny { data.tokens.missing == 1 }", RegoAuth.Config(), data))
    assert(e.getMessage.contains("data.tokens.missing"))
    // same for a field absent from an object constant
    val e2 = intercept[RuntimeException](RegoAuth.compile(
      "package auth\ndeny { data.tokens.limits.nope == 1 }", RegoAuth.Config(), data))
    assert(e2.getMessage.contains("data.tokens.limits.nope"))
  }

  test("event rules: membership against a data-module constant (set + scalar)") {
    import spark.implicits._
    val rules = RegoRules.compileAll(Seq(
      """package buckets
logs := {"corp-logs", "corp-audit"}
max_size := 5""",
      """package event
src[{"schema": "s"}] {
	input.cs.bucket in data.buckets.logs
	input.size <= data.buckets.max_size
}"""))
    assert(rules.event.head.when.contains(" IN ("))
    assert(rules.event.head.when.contains("5"))
    val meta = Seq(
      ("corp-logs", "/a.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("corp-audit", "/b.log", 9L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"),
      ("other", "/c.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "cc"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = rules.matchObjects(meta).map { case (er, df) =>
      er.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(rules.event.head.name) == Set("/a.log"))
    // an unresolved data path fails at compile, not silently-never-match
    val e = intercept[RuntimeException](RegoRules.compileAll(Seq(
      "package buckets\nlogs := [\"x\"]",
      "package event\nsrc[{\"schema\": \"s\"}] { input.cs.bucket in data.buckets.nope }")))
    assert(e.getMessage.contains("data.buckets.nope"))
  }

  test("data refs select INTO object constants — dot and bracket spellings alike") {
    val rules = RegoRules.compileAll(Seq(
      """package consts
limits := {"hot": 300, "cold": 5}""",
      """package schema.lim
log[{"dataset": "d", "table": "t", "timestamp": input.ts, "data": input}] {
	input.n <= data.consts.limits.hot
	input.m >= data.consts.limits["cold"]
}"""))
    val when = rules.schemaRule("lim").when.get
    assert(when.contains("300") && when.contains("5"),
      s"both field selections must inline their constants: $when")
    // a field absent from the object constant fails at LOAD
    val e = intercept[RuntimeException](RegoRules.compileAll(Seq(
      "package consts\nlimits := {\"hot\": 300}",
      "package schema.x\nlog[{\"dataset\": \"d\", \"table\": \"t\", " +
        "\"timestamp\": input.ts, \"data\": input}] " +
        "{ input.n <= data.consts.limits.nope }")))
    assert(e.getMessage.contains("limits.nope"))
    // the SAME selection works in auth (one shared data contract)
    val allow = RegoAuth.compile("""package auth
default deny = true
deny := false { count(input.path) <= data.consts.limits["cold"] }""",
      RegoAuth.Config(), Seq("package consts\nlimits := {\"hot\": 300, \"cold\": 5}"))
    assert(allow(AuthInput("GET", "/ab", "", Map.empty, Map.empty, "")))
    assert(!allow(AuthInput("GET", "/abcdef", "", Map.empty, Map.empty, "")))
  }

  test("schema rules: `every` compiles to forall; vacuous on empty, null fails") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val rules = RegoRules.compile("""package schema.ev
log[{"dataset": "d", "table": "t", "timestamp": input.ts, "data": input}] {
	every c in input.codes { c < 400 }
}""")
    val when = rules.schemaRule("ev").when.get
    assert(when.contains("forall("))
    val df = Seq(
      (1L, Some(Seq(200, 301))),
      (2L, Some(Seq(200, 500))),
      (3L, Some(Seq.empty[Int])),
      (4L, Option.empty[Seq[Int]]))
      .toDF("ts", "codes")
    val kept = df.filter(expr(when)).select("ts").as[Long].collect().toSet
    // 500 fails the forall; the empty array is vacuously true; the
    // NULL array is Rego-undefined → body fails → row drops
    assert(kept == Set(1L, 3L))
  }

  test("schema rules: comprehensions compile to filter/transform higher-order SQL") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    // array comprehension + count ≡ "no error codes"; set comprehension
    // counts DISTINCT codes
    val rules = RegoRules.compile("""package schema.cp
log[{"dataset": "d", "table": "t", "timestamp": input.ts, "data": input}] {
	count([c | c := input.codes[_]; c >= 400]) == 0
	count({c | c := input.codes[_]}) == 2
}""")
    val when = rules.schemaRule("cp").when.get
    assert(when.contains("filter(") && when.contains("size(") &&
      when.contains("array_distinct("))
    val df = Seq(
      (1L, Seq(200, 301)),       // no errors, 2 distinct → kept
      (2L, Seq(200, 500)),       // a 500 → dropped
      (3L, Seq(200, 200)))       // 1 distinct → dropped
      .toDF("ts", "codes")
    val kept = df.filter(expr(when)).select("ts").as[Long].collect().toSet
    assert(kept == Set(1L))
    // a transform pass appears only for a non-identity head
    val r2 = RegoRules.compile("""package schema.tf
log[{"dataset": "d", "table": "t", "timestamp": input.ts, "data": input}] {
	1000 in [c * 2 | c := input.codes[_]]
}""")
    val w2 = r2.schemaRule("tf").when.get
    assert(w2.contains("transform("))
    val kept2 = df.filter(expr(w2)).select("ts").as[Long].collect().toSet
    assert(kept2 == Set(2L)) // 500 * 2
  }

  test("RuleLoader.fromDir resolves data.-references across sibling .rego files") {
    val dir = tmpDir("rego-dir")
    writeFile(dir, "00_data.rego", """package consts
buckets := ["corp-logs"]
max := 100
""")
    writeFile(dir, "10_event.rego", """package event
src[{"schema": "s"}] {
	input.cs.bucket in data.consts.buckets
	input.size <= data.consts.max
}
""")
    writeFile(dir, "20_schema.rego", """package schema.s
log[{"dataset": "d", "table": "t", "timestamp": input.ts, "data": input}] {
	input.n <= data.consts.max
}
""")
    val rules = RuleLoader.fromDir(dir)
    assert(rules.event.size == 1 && rules.schema.size == 1)
    assert(rules.event.head.when.contains("100"))
    assert(rules.schemaRule("s").when.get.contains("100"))
  }

  // ---- parser details --------------------------------------------------

  test("parser: truncated policy fails with a RegoError, not an index error") {
    val e = intercept[RegoParser.RegoError](
      RegoParser.parse("package auth\nallow {"))
    assert(e.getMessage.contains("expected"))
  }


  test("parser: numbers vs dotted refs, trailing commas, comments, escapes") {
    val m = RegoParser.parse("""package event
# comment with "quotes" and ] brackets
src[s] {
	input.size > 1000
	s := {"schema": "s\"x", "parser": "json",}
}""")
    assert(m.pkg == Seq("event"))
    assert(m.rules.size == 1)
    // ((1000)) not swallowed into a float by the dot-check
    val n = RegoParser.parse("package schema.t\nlog[d] { d := {\"dataset\": \"d\", \"table\": \"t\", \"timestamp\": ((input.ts / 1000) * 1000) * 1000, \"data\": input} }")
    assert(n.rules.size == 1)
  }

  test("string/array/regex/sprintf builtins compile and match OPA semantics") {
    import spark.implicits._
    // OPA indexing conventions differ from SQL's: substring/indexof are
    // 0-based, array.slice is [lo, hi) — the compiled SQL must shift
    val r = RegoRules.compile("""package event
src[{"schema": "s"}] {
	input.cs.bucket == "corp-logs"
	substring(input.cs.name, 0, 4) == "/web"
	indexof(input.cs.name, "web") == 1
	replace(input.cs.name, ".gz", "") != input.cs.name
	regex.match("^/web/[a-z]+\\.log\\.gz$", input.cs.name)
	sprintf("%s-%v", [input.cs.bucket, 1]) == "corp-logs-1"
	to_number("2") == 2
}""")
    val meta = Seq(
      ("corp-logs", "/web/a.log.gz", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"),
      ("corp-logs", "/web/b.log", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "bb"),
      ("corp-logs", "/img/c.log.gz", 1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "cc"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    val matched = r.matchObjects(meta).map { case (er, df) =>
      er.name -> df.select("name").as[String].collect().toSet
    }.toMap
    assert(matched(r.event.head.name) == Set("/web/a.log.gz"), matched.toString)

    // array builtins: sum/sort/slice over a literal array in a predicate
    val r2 = RegoRules.compile("""package event
src[{"schema": "s"}] {
	sum([1, 2, 3]) == 6
	sort([3, 1, 2]) == [1, 2, 3]
	array.slice([1, 2, 3, 4], 1, 3) == [2, 3]
	max([input.size, 5]) >= 5
	input.cs.bucket == "corp-logs"
}""")
    val m2 = r2.matchObjects(meta).map { case (er, df) => df.count() }.sum
    assert(m2 == 3L, "constant-true array builtins keep all bucket rows")

    // sprintf with a non-literal format still fails loudly at compile
    val e = intercept[RuntimeException](RegoRules.compile("""package event
src[{"schema": "s"}] { sprintf(input.cs.name, [1]) == "x" }"""))
    assert(e.getMessage.contains("sprintf"))
  }

  test("encoding/number/regex builtin family compiles and matches OPA semantics") {
    import spark.implicits._
    val meta = Seq(
      ("corp-logs", "/web/a.log.gz", 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), "aa"))
      .toDF("bucket", "name", "size", "created_at", "md5")
    // every predicate is OPA-checkable: encode/decode round-trips,
    // lowercase hex/format_int, inclusive numbers.range, product,
    // strings.count non-overlapping, regex split/replace arg orders
    val r = RegoRules.compile("""package event
src[{"schema": "s"}] {
	base64.encode("swarm") == "c3dhcm0="
	base64.decode("c3dhcm0=") == "swarm"
	hex.encode("AB") == "4142"
	hex.decode("4142") == "AB"
	format_int(255, 16) == "ff"
	numbers.range(2, 5) == [2, 3, 4, 5]
	numbers.range(3, 1) == [3, 2, 1]
	product([2, 3, 4]) == 24
	strings.count("banana", "an") == 2
	strings.reverse("abc") == "cba"
	array.reverse([1, 2]) == [2, 1]
	regex.split("/", input.cs.name) == ["", "web", "a.log.gz"]
	regex.replace(input.cs.name, "[0-9]+", "N") == input.cs.name
	input.cs.bucket == "corp-logs"
}""")
    val matched = r.matchObjects(meta).map { case (_, df) => df.count() }.sum
    assert(matched == 1L, "all encoding/number builtins hold on the row")

    // unknown builtins still fail loudly at compile, not silently false
    val e = intercept[RuntimeException](RegoRules.compile("""package event
src[{"schema": "s"}] { units.parse("10KB") == 10000 }"""))
    assert(e.getMessage.contains("unsupported builtin"))
  }
}
