package graft.util

import org.apache.spark.sql.DataFrame

/** Partition-count guard for compute-bound projections over small
  * single-file sources: the sf test tables arrive as ONE parquet file →
  * one input partition, serializing per-row work (shingling, hashing,
  * scoring) onto one core. On a real corpus (thousands of splits) the
  * guard is a no-op.
  *
  * The partition probe goes through `df.rdd`, which materializes the
  * physical plan — cheap for a scan-shaped frame, but call this once
  * per source, not per plan branch, and never on a side that is about
  * to be broadcast (the repartition shuffle would be pure waste).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
