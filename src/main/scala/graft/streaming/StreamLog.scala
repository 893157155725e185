package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.schema.TableBackend

/** Streaming telemetry → `_meta.stream_log`: one row per completed
  * micro-batch (query name, batch id, input rows, trigger duration).
  * The streaming counterpart of the reference's LoadLog/SourceLog
  * telemetry (K6, `pkg/domain/model/bigquery.go:9-39`) — a `serve`/
  * `push` deployment's per-batch health record, queryable next to the
  * tables it loads (`graft sql "SELECT * FROM _meta_stream_log"`).
  *
  * Listener events arrive on Spark's listener bus (async, off the
  * query's hot path); each row is a single metadata-sized append. The
  * small files this accumulates are exactly what [[graft.ingest.Compact]]
  * exists for. */
final class StreamLog(spark: SparkSession, registry: TableBackend)
    extends StreamingQueryListener {

  // progress events are delivered async on the listener bus; a one-shot
  // driver that calls spark.stop() right after awaitTermination() would
  // otherwise race the final batch's telemetry write (the write job
  // then dies on the stopped context and the run records nothing)
  private val pending = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var lastEventAtMs = 0L

  /** Wait until the listener has been quiet for `quietMs` and no write
    * is in flight (bounded by `maxWaitMs`) — call before stopping the
    * session in one-shot runs so the final batch's row lands. */
  def drain(maxWaitMs: Long = 5000, quietMs: Long = 400): Unit = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    while (System.currentTimeMillis() < deadline &&
      (pending.get() > 0 ||
        System.currentTimeMillis() - lastEventAtMs < quietMs))
      Thread.sleep(50)
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    import spark.implicits._
    pending.incrementAndGet()
    lastEventAtMs = System.currentTimeMillis()
    val p = e.progress
    val row = (Option(p.name).getOrElse(""), p.id.toString, p.batchId,
      p.numInputRows, p.durationMs.getOrDefault("triggerExecution", 0L),
      new java.sql.Timestamp(System.currentTimeMillis()))
    // through the registry's appendPartitioned so the per-table write
    // lock covers this path too — a concurrent writer to the same dir
    // (backfill, compaction) must never race this append's staging;
    // DDL-first like every append (a metadata-validating backend —
    // BigQuery — rejects rows against an undeclared table)
    try {
      val df = Seq(row)
        .toDF("query", "query_id", "batch_id", "input_rows", "trigger_ms", "logged_at")
        .withColumn("__part", date_format(col("logged_at"), "yyyy-MM"))
      registry.createOrUpdate("_meta", "stream_log",
        org.apache.spark.sql.types.StructType(
          df.schema.filterNot(_.name == "__part")))
      registry.appendPartitioned("_meta", "stream_log", df)
    }
    catch {
      // telemetry must never kill the listener bus; the query goes on
      case e: Exception =>
        System.err.println(s"[stream_log] append failed: ${e.getMessage}")
    } finally pending.decrementAndGet()
  }
}

object StreamLog {
  /** Attach a stream logger to the session; returns it for removal. */
  def attach(spark: SparkSession, registry: TableBackend): StreamLog = {
    val l = new StreamLog(spark, registry)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: StreamLog): Unit =
    spark.streams.removeListener(l)
}
