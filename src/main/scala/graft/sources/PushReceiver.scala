package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Pub/Sub push ingress (SURVEY §2.1 S6) — the HTTP endpoint the
  * reference exposes for storage-notification delivery
  * (`pkg/controller/server/server.go:34-100`), re-expressed for Spark's
  * execution model.
  *
  * The reference processes the object INSIDE the request handler and
  * acks afterwards. A Spark driver can't run a distributed job per HTTP
  * request, so the receiver splits that contract at the durable
  * boundary instead: validate + decode the envelope, append the inner
  * storage-event JSON to a spool directory with an atomic rename, and
  * only then return 2xx. A non-2xx answer (malformed → 400, spool IO
  * failure → 500) makes Pub/Sub redeliver — exactly the reference's
  * ack/nack semantics — and the checkpointed stream over the spool
  * ([[graft.ingest.Pipeline.streamNotifications]]) carries the
  * at-least-once guarantee from there (replays are idempotent via the
  * deterministic row id + optional dedup).
  *
  * Driver-side only and metadata-sized: one small JSON line per object
  * notification, never record data. jackson ships with Spark; no extra
  * dependency.
  */
final class PushReceiver(spoolDir: String, port: Int = 0) {

  private val mapper = new ObjectMapper
  Files.createDirectories(Paths.get(spoolDir))
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  private val pool = Executors.newFixedThreadPool(4)
  server.setExecutor(pool)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  /** Bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): PushReceiver = { server.start(); this }

  /** HttpServer.stop does NOT terminate a caller-supplied executor —
    * without the explicit shutdown the non-daemon worker threads keep
    * the JVM alive after the receiver stops. */
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val body = msg.getBytes(UTF_8)
    ex.sendResponseHeaders(code, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, "POST only"); return }
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      decodeEnvelope(body) match {
        case Left(err) => respond(ex, 400, err)
        case Right(inner) =>
          spool(inner)
          respond(ex, 204, "")
      }
    } catch {
      // spool write failed → nack so the sender redelivers
      case e: Exception => respond(ex, 500, s"spool failure: ${e.getMessage}")
    }

  /** Envelope → compact single-line inner storage-event JSON, or a
    * 400-worthy error. Mirrors the reference's decode order: envelope
    * JSON → base64 message.data → inner JSON with name+bucket
    * (`pkg/domain/model/message.go:32-58`). */
  private[sources] def decodeEnvelope(body: String): Either[String, String] = {
    val env = try mapper.readTree(body) catch {
      case e: Exception => return Left(s"envelope is not JSON: ${e.getMessage}")
    }
    val data = env.path("message").path("data")
    if (!data.isTextual) return Left("missing message.data")
    val inner = try new String(java.util.Base64.getDecoder.decode(data.asText), UTF_8)
    catch { case _: IllegalArgumentException => return Left("message.data is not base64") }
    val ev = try mapper.readTree(inner) catch {
      case e: Exception => return Left(s"decoded payload is not JSON: ${e.getMessage}")
    }
    if (!ev.path("name").isTextual || !ev.path("bucket").isTextual)
      return Left("payload is not a storage event (name/bucket missing)")
    Right(mapper.writeValueAsString(ev)) // compact: exactly one spool line
  }

  /** Durable append: write to a hidden temp name, fsync-free atomic
    * rename into the spool (the file source never sees half a file). */
  private def spool(line: String): Unit = {
    val id = UUID.randomUUID().toString
    val tmp = Paths.get(spoolDir, s".$id.tmp")
    Files.write(tmp, (line + "\n").getBytes(UTF_8))
    Files.move(tmp, Paths.get(spoolDir, s"$id.json"), StandardCopyOption.ATOMIC_MOVE)
  }
}
