package graft.util

import org.apache.spark.sql.DataFrame

/** Widen a narrow file-backed frame to the session's parallelism before
  * compute-bound projections (the driver's test tables ship as ONE
  * parquet file each → one input partition → one busy core).
  *
  * The width probe is `inputFiles` — resolved from the analyzed logical
  * plan, so unlike an `rdd.getNumPartitions` probe it never forces
  * physical planning of the whole query. File count under-counts the
  * partitions of large splittable files, but the decision is the same:
  * a source with fewer FILES than cores is at risk of narrow scans, and
  * a source with more files than cores never needs the shuffle. Frames
  * with no file lineage (in-memory datasets, flatMapped readers) are
  * left alone — callers apply Spread to file scans.
  *
  * At real corpus scale the source is thousands of splits and this is a
  * no-op guard; call it once per source, not per plan branch, and never
  * on a side that is about to be broadcast.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Exception => 0 }
    if (files > 0 && files < par) df.repartition(par) else df
  }
}
