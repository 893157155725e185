package graft

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized through a `noop` write (a bare count() would let column
  * pruning skip the computed output — we want end-to-end work). Each
  * query runs once warm-up-free except a single session-wide JVM/codegen
  * warm-up query, mirroring cold-cache single-node operation. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // JVM/codegen warm-up so q01 doesn't pay one-time session costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    // optional args = query-name filter (local iteration; driver passes none)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop per-query persisted intermediates
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush() // the driver greps stdout for this one line
    spark.stop()
  }
}
