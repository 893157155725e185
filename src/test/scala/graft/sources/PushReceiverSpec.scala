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

  private def envelope(bucket: String, name: String): String = {
    val ev = s"""{"kind":"storage#object","bucket":"$bucket","name":"$name",""" +
      s""""size":"123","timeCreated":"2024-05-01T10:00:00Z","md5Hash":"${Base64.getEncoder.encodeToString("x".getBytes(UTF_8))}"}"""
    val data = Base64.getEncoder.encodeToString(ev.getBytes(UTF_8))
    s"""{"message":{"messageId":"m-1","data":"$data"},"subscription":"sub"}"""
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
      dedup = true)
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
