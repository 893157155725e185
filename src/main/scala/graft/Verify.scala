package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-proofing (the round-9 lesson — an empty `{}` correctness file
  * on green code, because a driver-side wall clock truncated the run):
  *   1. `oracle_sql.json` is written FIRST, so a partial run yields
  *      per-query "no spark output" rows instead of an empty object;
  *   2. queries dump cheapest-first (recorded per-query seconds,
  *      `graft/verify-order.txt`), so a truncation costs only the
  *      most expensive tail, never the broad cheap surface;
  *   3. dumps run on a small thread pool — the queries are independent
  *      and individually leave most of the 32 cores idle, so four in
  *      flight roughly quarters the wall clock without changing any
  *      result (every query is deterministic and partitioning-invariant
  *      by the md5/decimal contracts, and Spark job submission is
  *      thread-safe);
  *   4. each query's scratch dirs delete on success
  *      ([[graft.util.Workspace.scoped]]), so the run's disk footprint
  *      stays bounded by in-flight queries, not the whole suite.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: run only these queries (local iteration);
    // the driver always passes exactly two args → full run
    val only = args.drop(2).toSet
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // recorded cost order, cheapest first; queries it doesn't know
    // (added since the last bench capture) go to the back of the queue
    val rank: Map[String, Int] = {
      val in = getClass.getResourceAsStream("/graft/verify-order.txt")
      if (in == null) Map.empty
      else try scala.io.Source.fromInputStream(in).getLines()
        .zipWithIndex.toMap
      finally in.close()
    }
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .sortBy { case (name, _) => (rank.getOrElse(name, Int.MaxValue), name) }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    ordered.foreach { case (name, fn) =>
      pool.execute { () =>
        try graft.util.Workspace.scoped {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    spark.stop()
  }
}
