package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-capture tool for the optimization rounds: builds each named
  * query's DataFrame against a scale-factor directory and writes its
  * `explain("formatted")` output to `<outDir>/<query><suffix>.txt` —
  * the before/after evidence the optimization deliverables commit under
  * `plans/r<n>/`.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> <suffix> <query>...
  *
  * Note: pipeline-shaped queries execute their setup (export + ingest)
  * while the DataFrame is being BUILT; the captured plan is the
  * declared query's final frame — the thing the driver hashes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] no such query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name$suffix.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          System.err.println(s"[explain] wrote $name$suffix.txt")
      }
    }
    spark.stop()
  }
}
