package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ingest.{Pipeline, TableSink}
import graft.rules._
import graft.schema.SchemaRegistry

/** Drives a REAL HTTP round-trip: receiver on an ephemeral port, push
  * envelopes POSTed with the JDK client, spool tailed by the
  * checkpointed notification stream, table read back. */
class PushReceiverSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()

  private def post(port: Int, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def envelope(bucket: String, name: String, msgId: String = "m-1"): String = {
    val ev = s"""{"kind":"storage#object","bucket":"$bucket","name":"$name",""" +
      s""""size":"123","timeCreated":"2024-05-01T10:00:00Z","md5Hash":"${Base64.getEncoder.encodeToString("x".getBytes(UTF_8))}"}"""
    val data = Base64.getEncoder.encodeToString(ev.getBytes(UTF_8))
    s"""{"message":{"messageId":"$msgId","data":"$data"},"subscription":"sub"}"""
  }

  private def postAuth(port: Int, body: String, token: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("Authorization", t))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def spoolFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json")).map(_.getName).toSeq

  test("receiver: valid push spooled + 204; malformed nacked with 400") {
    val spool = tmpDir("push-spool")
    val rx = new PushReceiver(spool).start()
    try {
      assert(post(rx.boundPort, envelope("b", "o.log")).statusCode() == 204)
      assert(spoolFiles(spool).size == 1)

      assert(post(rx.boundPort, "not json").statusCode() == 400)
      assert(post(rx.boundPort, """{"message":{}}""").statusCode() == 400)
      assert(post(rx.boundPort,
        """{"message":{"messageId":"m","data":"!!!notb64!!!"}}""").statusCode() == 400)
      // base64 of something that is not a storage event
      val notEvent = Base64.getEncoder.encodeToString("""{"foo":1}""".getBytes(UTF_8))
      assert(post(rx.boundPort,
        s"""{"message":{"messageId":"m","data":"$notEvent"}}""").statusCode() == 400)
      assert(spoolFiles(spool).size == 1) // none of the bad ones landed
    } finally rx.stop()
  }

  test("auth hook: bearer token allows; wrong or missing token → 401, never spooled") {
    // ≡ reference middleware.go:17-46 over auth_token.rego
    // (`input.header.Authorization[_] == "Bearer good-token"`)
    val spool = tmpDir("push-auth")
    val rx = new PushReceiver(spool,
      auth = PushReceiver.bearerToken("good-token")).start()
    try {
      val body = envelope("b", "o.log")
      assert(postAuth(rx.boundPort, body, Some("Bearer good-token")).statusCode() == 204)
      assert(postAuth(rx.boundPort, body, Some("Bearer bad-token")).statusCode() == 401)
      assert(postAuth(rx.boundPort, body, None).statusCode() == 401)
      assert(spoolFiles(spool).size == 1) // only the authorized push landed
    } finally rx.stop()
  }

  test("jwt auth: HS256 validity window + signature + claims; gate order auth before 429") {
    // ≡ reference docs/rule.md:252-283 (io.jwt.decode_verify policy)
    def b64(s: String): String =
      Base64.getUrlEncoder.withoutPadding().encodeToString(s.getBytes(UTF_8))
    def sign(h: String, p: String, secret: String = "jwt-secret"): String = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
      val sig = Base64.getUrlEncoder.withoutPadding()
        .encodeToString(mac.doFinal(s"${b64(h)}.${b64(p)}".getBytes(UTF_8)))
      s"${b64(h)}.${b64(p)}.$sig"
    }
    val now = System.currentTimeMillis() / 1000L
    val hs256 = """{"alg":"HS256","typ":"JWT"}"""
    def claims(exp: Long, iss: String = "notifier") =
      s"""{"iss":"$iss","exp":$exp,"nbf":${now - 60}}"""
    val spool = tmpDir("push-jwt")
    var heap = 0L
    val rx = new PushReceiver(spool,
      auth = PushReceiver.jwtBearer("jwt-secret", Map("iss" -> "notifier")),
      memoryLimitBytes = 100L, heapUsed = () => heap).start()
    try {
      val body = envelope("b", "o.log")
      def code(tok: String) =
        postAuth(rx.boundPort, body, Some(s"Bearer $tok")).statusCode()
      val good = sign(hs256, claims(now + 3600), "jwt-secret")
      // gate order: an OVER-LIMIT heap still answers 401 first for a bad
      // token (auth → 429 → handler, like the reference middleware chain)
      heap = 200L
      assert(code(sign(hs256, claims(now + 3600), "wrong-secret")) == 401,
        "bad signature must 401 even when the heap gate would 429")
      assert(code(good) == 429, "valid token proceeds to the memory gate")
      heap = 50L
      assert(code(good) == 204)
      assert(code(sign(hs256, claims(now - 10))) == 401, "expired token")
      assert(code(sign(hs256, s"""{"iss":"notifier"}""")) == 401,
        "missing exp (a forever token) rejected")
      assert(code(sign(hs256,
        s"""{"iss":"notifier","exp":${now + 3600},"nbf":${now + 3600}}""")) == 401,
        "not-yet-valid (nbf in the future)")
      assert(code(sign(hs256, claims(now + 3600, iss = "intruder"))) == 401,
        "wrong pinned claim")
      assert(code(sign("""{"alg":"none"}""", claims(now + 3600))) == 401,
        "alg downgrade rejected")
      val Array(h, p, _) = good.split('.')
      assert(code(s"$h.$p.${b64("forged")}") == 401, "forged signature")
      assert(code(s"$h.$p") == 401, "truncated token")
      assert(code("...") == 401, "garbage token never throws")
      assert(spoolFiles(spool).size == 1) // only the one authorized, under-limit push
    } finally rx.stop()
  }

  test("jwt auth: RS256 over a JWKS — kid routing, downgrades, required exp, pinned claims") {
    // ≡ reference docs/rule.md:252-283 (io.jwt.verify_rs256 against
    // Google's JWKS with pinned iss/email) — the production push auth
    val gen = java.security.KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val kpA = gen.generateKeyPair()
    val kpB = gen.generateKeyPair()
    val kpEvil = gen.generateKeyPair() // a keypair NOT in the JWKS
    def b64(bytes: Array[Byte]): String =
      Base64.getUrlEncoder.withoutPadding().encodeToString(bytes)
    def b64s(s: String): String = b64(s.getBytes(UTF_8))
    def jwk(kid: String, kp: java.security.KeyPair): String = {
      val pub = kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
      def uint(b: java.math.BigInteger) = { // JWK wants unsigned big-endian
        val raw = b.toByteArray
        b64(if (raw(0) == 0) raw.tail else raw)
      }
      s"""{"kty":"RSA","alg":"RS256","use":"sig","kid":"$kid",""" +
        s""""n":"${uint(pub.getModulus)}","e":"${uint(pub.getPublicExponent)}"}"""
    }
    def sign(header: String, payload: String, kp: java.security.KeyPair): String = {
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initSign(kp.getPrivate)
      sig.update(s"${b64s(header)}.${b64s(payload)}".getBytes(UTF_8))
      s"${b64s(header)}.${b64s(payload)}.${b64(sig.sign())}"
    }
    val now = System.currentTimeMillis() / 1000L
    val iss = "https://accounts.google.com"
    val email = "my-pubsub@my-project.iam.gserviceaccount.com"
    def claims(exp: String = s""""exp":${now + 3600},""") =
      s"""{$exp"iss":"$iss","email":"$email"}"""
    // mutable supplier: the validator re-reads it per request (rotation
    // / outage behavior testable on one receiver)
    var jwks = s"""{"keys":[${jwk("a", kpA)},${jwk("b", kpB)}]}"""
    val spool = tmpDir("push-rs256")
    val rx = new PushReceiver(spool, auth = PushReceiver.jwtBearerRs256(
      () => jwks, Map("iss" -> iss, "email" -> email))).start()
    try {
      val body = envelope("b", "o.log")
      def code(tok: String) =
        postAuth(rx.boundPort, body, Some(s"Bearer $tok")).statusCode()
      val rs = """{"alg":"RS256"}"""
      assert(code(sign("""{"alg":"RS256","kid":"b"}""", claims(), kpB)) == 204,
        "kid-routed Google-style token accepted")
      assert(code(sign("""{"alg":"RS256","kid":"b"}""", claims(), kpA)) == 401,
        "kid routes to exactly its key — a cross-signed token fails")
      assert(code(sign(rs, claims(), kpA)) == 204,
        "no kid: any published set key may verify (rotation overlap)")
      assert(code(sign("""{"alg":"RS256","kid":"zzz"}""", claims(), kpA)) == 401,
        "unknown kid")
      assert(code(sign(rs, claims(), kpEvil)) == 401, "key outside the set")
      assert(code(sign("""{"alg":"none"}""", claims(), kpA)) == 401, "alg none")
      assert(code(sign("""{"alg":"HS256"}""", claims(), kpA)) == 401,
        "alg-confusion downgrade rejected outright")
      assert(code(sign(rs, claims(s""""exp":${now - 10},"""), kpA)) == 401, "expired")
      assert(code(sign(rs, claims(""), kpA)) == 401,
        "missing exp (a forever token) rejected")
      assert(code(sign(rs, s"""{"exp":${now + 3600},"nbf":${now + 3600},"iss":"$iss","email":"$email"}""",
        kpA)) == 401, "not yet valid")
      assert(code(sign(rs, s"""{"exp":${now + 3600},"iss":"$iss","email":"intruder@evil.example"}""",
        kpA)) == 401, "wrong pinned email")
      assert(code(sign(rs, s"""{"exp":${now + 3600},"iss":"evil","email":"$email"}""",
        kpA)) == 401, "wrong pinned iss")
      // payload tamper: signature covers header.payload
      val good = sign(rs, claims(), kpA)
      val Array(h, _, s) = good.split('.')
      assert(code(s"$h.${b64s(claims().replace(email, "x@evil"))}.$s") == 401, "tampered payload")
      assert(code("...") == 401, "garbage token never throws")
      // JWKS outage / garbage: deny-all, not crash; recovery re-admits
      jwks = "not json at all"
      assert(code(sign(rs, claims(), kpA)) == 401, "garbled JWKS denies")
      jwks = s"""{"keys":[${jwk("a", kpA)}]}"""
      assert(code(sign(rs, claims(), kpA)) == 204, "recovered JWKS re-admits")
    } finally rx.stop()
  }

  test("cachedSupplier memoizes for the TTL and does not cache failures") {
    var now = 0L
    var calls = 0
    val s = PushReceiver.cachedSupplier(10L, () => {
      calls += 1
      if (calls == 1) sys.error("net down") else s"v$calls"
    }, () => now)
    intercept[RuntimeException](s()) // failure propagates (validator denies)…
    assert(s() == "v2" && calls == 2) // …and was NOT cached
    assert(s() == "v2" && calls == 2, "within TTL: served from cache")
    now = 10001L
    assert(s() == "v3" && calls == 3, "past TTL: refetched")
  }

  test("memory guard: deliveries over the heap limit nacked with 429 (T6)") {
    // ≡ reference middleware.go:89-108 MemoryLimit; heap probe injected
    val spool = tmpDir("push-mem")
    var heap = 0L
    val rx = new PushReceiver(spool, memoryLimitBytes = 100L,
      heapUsed = () => heap).start()
    try {
      heap = 50L
      assert(post(rx.boundPort, envelope("b", "o.log")).statusCode() == 204)
      heap = 200L // over limit: Pub/Sub should back off and redeliver
      assert(post(rx.boundPort, envelope("b", "o2.log")).statusCode() == 429)
      heap = 50L
      assert(post(rx.boundPort, envelope("b", "o2.log")).statusCode() == 204)
      assert(spoolFiles(spool).size == 2)
    } finally rx.stop()
  }

  test("state machine: two receivers, one spool — duplicate delivery spools once; " +
    "failed spool and crashed owner are re-acquired (ref server.go:121-146)") {
    val spool = tmpDir("push-state-spool")
    val stateDir = tmpDir("push-state")
    // short processing timeout so the crashed-owner takeover is testable
    def store = new graft.state.StateStore(stateDir, timeoutMillis = 300L)
    val rx1 = new PushReceiver(spool, state = Some(store)).start()
    val rx2 = new PushReceiver(spool, state = Some(store)).start()
    try {
      // same messageId delivered to BOTH workers (Pub/Sub redelivery
      // across subscribers): first spools, second skips-as-completed
      assert(post(rx1.boundPort, envelope("b", "o.log", msgId = "dup-1")).statusCode() == 204)
      assert(post(rx2.boundPort, envelope("b", "o.log", msgId = "dup-1")).statusCode() == 204)
      assert(spoolFiles(spool).size == 1, "duplicate delivery must spool exactly once")

      // distinct message still processed by the second worker
      assert(post(rx2.boundPort, envelope("b", "o2.log", msgId = "dup-2")).statusCode() == 204)
      assert(spoolFiles(spool).size == 2)

      // crashed owner: a `running` state whose expiry has passed — the
      // next delivery takes over (after deferring past the expiry)
      val st = store
      assert(st.acquire("crashed-1")) // owner dies here: never marks
      Thread.sleep(400L) // let the running state expire
      assert(post(rx1.boundPort, envelope("b", "o3.log", msgId = "crashed-1")).statusCode() == 204)
      assert(spoolFiles(spool).size == 3, "expired running message must be re-acquired")
      assert(st.get("crashed-1").map(_.state).contains("completed"))

      // failed state: always re-acquired immediately
      val st2 = store
      assert(st2.acquire("failed-1"))
      st2.markFailed("failed-1")
      assert(post(rx2.boundPort, envelope("b", "o4.log", msgId = "failed-1")).statusCode() == 204)
      assert(spoolFiles(spool).size == 4)

      // live owner: the blocked delivery defers, then answers 205 Reset
      // Content — outside Pub/Sub's ack set, so the sender redelivers,
      // but NOT an error code that trips dead-letter/error-rate policy
      // (the reference's deliberate ErrBlockingPubSub status,
      // server.go:66-76,134-139). Once the owner's lease expires the
      // redelivery takes over.
      val rx3 = new PushReceiver(spool, state = Some(store),
        waitBudgetMillis = 100L).start()
      try {
        val st3 = store
        assert(st3.acquire("busy-1")) // owner alive, lease 300 ms
        assert(post(rx3.boundPort, envelope("b", "o5.log", msgId = "busy-1")).statusCode() == 205,
          "duplicate delivery while the owner is running must defer with 205, not 500")
        assert(spoolFiles(spool).size == 4, "blocked delivery must not spool")
        Thread.sleep(350L) // lease expires (owner crashed mid-flight)
        assert(post(rx3.boundPort, envelope("b", "o5.log", msgId = "busy-1")).statusCode() == 204)
        assert(spoolFiles(spool).size == 5)
      } finally rx3.stop()
    } finally { rx1.stop(); rx2.stop() }
  }

  test("push → spool → streamNotifications → table; replay stays idempotent") {
    val spool = tmpDir("push-spool-e2e")
    val objects = tmpDir("push-objects")
    writeFile(objects, "access.log",
      """{"log_id": "p1", "event_time": 1714557600.5, "user": "u1"}
        |{"log_id": "p2", "event_time": 1714557601.0, "user": "u2"}
        |""".stripMargin)
    val registry = new SchemaRegistry(tmpDir("push-tables"))
    val cfg = Pipeline.Config(registry, Rules(
      event = Seq(EventRule(name = "access", when = "name LIKE '%.log'",
        schemaRule = "access")),
      schema = Seq(SchemaRule(name = "access",
        dataset = "'push_test'", table = "'logs'",
        id = Some("log_id"), timestamp = "event_time"))),
      dedup = Some(true))
    val ckpt = tmpDir("push-ckpt")
    def drain(): Unit = {
      val q = Pipeline.streamNotifications(spark, cfg, s"$spool/*.json", ckpt,
        Trigger.AvailableNow(),
        // decoded paths are gs://local-bucket/<name>; remap to the fixture dir
        pathRewrite = Some(("gs://local-bucket/", s"$objects/")))
      q.awaitTermination()
    }

    val rx = new PushReceiver(spool).start()
    try {
      assert(post(rx.boundPort, envelope("local-bucket", "access.log")).statusCode() == 204)
      drain()
      val out = TableSink.read(spark, registry, "push_test", "logs")
      assert(out.select("id").collect().map(_.getString(0)).sorted.toSeq == Seq("p1", "p2"))

      // Pub/Sub redelivery: same notification again → new spool file, a
      // second micro-batch re-reads the object; the dedup anti-join on
      // the deterministic id keeps the table exactly-once
      assert(post(rx.boundPort, envelope("local-bucket", "access.log")).statusCode() == 204)
      drain()
      val out2 = TableSink.read(spark, registry, "push_test", "logs")
      assert(out2.count() == 2)
    } finally rx.stop()
  }
}
