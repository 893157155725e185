package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dry-run sink (SURVEY §2.1 K4): instead of appending to managed
  * tables, write each destination's rows as NDJSON plus the inferred
  * schema as JSON — the reference's `--dry-run` file-dumper
  * (`pkg/infra/dump/client.go:21-104`, layout `{dataset}.{table}.log` +
  * `{dataset}.{table}.schema.json`).
  */
object DumpSink {

  /** Dump a routed DataFrame (Transform output) per destination.
    * Returns the written (dataset, table) pairs.
    *
    * APPEND semantics WITHIN a run, like the reference's dumper (it
    * opens the `.log` with O_APPEND, `dump/client.go:50`): one dry-run
    * ingest may call this once per parse chunk (`maxObjectsPerBatch`),
    * and chunk N must not clobber chunks 1..N-1. Across runs the caller
    * passes the run's `ingestId` so each invocation dumps under its own
    * `outDir/<ingestId>/` namespace — a second dry-run at the same
    * `--output` never doubles the first one's records, and each run's
    * schema.json reflects that run's final chunk only. */
  def dump(routed: DataFrame, baseDir: String,
      ingestId: String): Seq[(String, String)] = {
    val outDir = s"$baseDir/$ingestId"
    Files.createDirectories(Paths.get(outDir))
    val dests = routed.select("dataset", "table").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    dests.toSeq.map { case (ds, tbl) =>
      val slice = routed
        .filter(col("dataset") === ds && col("table") === tbl)
        .drop("dataset", "table", "partition")
      slice.coalesce(1).write.mode("append")
        .json(s"$outDir/$ds.$tbl.log")
      Files.writeString(Paths.get(s"$outDir/$ds.$tbl.schema.json"),
        slice.schema.prettyJson)
      (ds, tbl)
    }
  }
}
