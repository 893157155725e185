package graft

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized through a `noop` write (a bare count() would let column
  * pruning skip the computed output — we want end-to-end work).
  *
  * Noise hygiene (the shared bench machine has measured 2.5× run-to-run
  * skew on identical code): every query runs TWICE back-to-back and
  * reports the per-query MINIMUM — the min is the best estimate of the
  * code's cost under contention, and round-over-round deltas on mins are
  * attributable to code. The JSON also carries `loadavg` (1-minute, read
  * at start and end) so a loaded-box run is identifiable after the fact.
  * A single session-wide JVM/codegen warm-up precedes the first query,
  * mirroring cold-cache single-node operation otherwise.
  *
  * The r5 lesson is mechanized, not just documented: a capture that
  * STARTS on a loaded box (1-min loadavg ≥ [[QuietThreshold]]) waits —
  * bounded by [[MaxQuietWaitSec]] so a permanently-busy box still
  * produces numbers — and the JSON carries `quiet_wait_sec` plus the
  * start/end loadavg, so "was this run adjudicable?" is answered by the
  * artifact itself instead of by whoever remembered to run `uptime`.
  */
object Bench {
  /** 1-min loadavg below which a capture is considered quiet. */
  val QuietThreshold = 1.0
  /** Upper bound on the pre-capture wait for a quiet box. */
  val MaxQuietWaitSec = 300

  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Exception => -1.0 }

  /** Block until the box is quiet or the bound expires; returns the
    * seconds waited. Skipped when /proc/loadavg is unreadable. */
  private def awaitQuiet(): Long = {
    val t0 = System.nanoTime()
    var l = loadavg()
    while (l >= QuietThreshold && (System.nanoTime() - t0) / 1e9 < MaxQuietWaitSec) {
      System.err.println(f"[bench] loadavg $l%.2f >= $QuietThreshold%.1f - waiting for a quiet box")
      Thread.sleep(10000)
      l = loadavg()
    }
    ((System.nanoTime() - t0) / 1e9).toLong
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val quietWait = awaitQuiet()
    val spark = GraftSession.get()
    val loadStart = loadavg()
    // JVM/codegen warm-up so q01 doesn't pay one-time session costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    // optional args = query-name filter (local iteration; driver passes none)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    // Right(elapsed) on success, Left(timeToFailure) on error — a failed
    // run's (tiny) elapsed must never win the min over a real sample.
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Either[Double, Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop per-query persisted intermediates
      if (ok) Right(elapsed) else Left(elapsed)
    }
    val ordered = selected.toSeq.sortBy(_._1)
    // two interleaved full passes (not per-query back-to-back repeats):
    // the second pass of query q runs ~a full suite after the first, so a
    // transient load spike can't inflate BOTH samples of the same query
    val pass1 = ordered.map { case (n, fn) => n -> once(n, fn) }
    val pass2 = ordered.map { case (n, fn) => n -> once(n, fn) }
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) =>
      val successes = Seq(a, b).collect { case Right(t) => t }
      // no successful sample → report the SLOWER failure time (never a
      // flattering min) — stderr already carries the error lines
      n -> (if (successes.nonEmpty) successes.min
            else Seq(a, b).collect { case Left(t) => t }.max)
    }
    val loadEnd = loadavg()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":2,"agg":"min","loadavg":[$loadStart%.2f,$loadEnd%.2f],"quiet_wait_sec":$quietWait}""")
    System.out.flush() // the driver greps stdout for this one line
    spark.stop()
  }
}
