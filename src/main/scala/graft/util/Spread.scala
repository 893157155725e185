package graft.util

import org.apache.spark.sql.DataFrame

/** Widen a narrow frame to the session's parallelism before
  * compute-bound projections (the driver's test tables ship as ONE
  * parquet file each → one input partition → one busy core).
  *
  * The primary width probe is `inputFiles` — resolved from the analyzed
  * logical plan, so unlike an `rdd.getNumPartitions` probe it never
  * forces physical planning of the whole query. File count under-counts
  * the partitions of large splittable files, but the decision is the
  * same: a source with fewer FILES than cores is at risk of narrow
  * scans, and a source with more files than cores never needs the
  * shuffle. Frames with NO file lineage (in-memory datasets, flatMapped
  * readers) fall back to the RDD partition probe — such plans are small
  * (no scan to re-plan), so forcing physical planning there is cheap,
  * and without the probe a narrow in-memory frame would serialize its
  * compute-bound downstream onto one core.
  *
  * At real corpus scale the source is thousands of splits and this is a
  * no-op guard; call it once per source, not per plan branch, and never
  * on a side that is about to be broadcast.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Exception => 0 }
    val width =
      if (files > 0) files
      else try df.rdd.getNumPartitions catch { case _: Exception => par }
    if (width < par) df.repartition(par) else df
  }
}
