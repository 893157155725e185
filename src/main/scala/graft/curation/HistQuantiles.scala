package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic approximate quantiles from a fixed-width histogram —
  * the 100 TB path for the percentile family. The exact sort-based
  * `percentile` (q50, q92, q124 cutpoints) is a GLOBAL SORT of the
  * value column per group: correct, and the right oracle tool, but a
  * full shuffle-and-sort of 100 TB to learn p99 is the wrong plan.
  * This operator answers the same question in two map-side-combined
  * aggregations — a (group, min, max) pass, then a (group, bin) count
  * pass over `bins` fixed-width buckets — with error bounded by ONE
  * BIN WIDTH `(max − min) / bins`, and no sort anywhere.
  *
  * Why not `approx_percentile`/t-digest: Spark's sketch merges are
  * order-dependent, so two runs over different partitionings can give
  * different answers — useless under this engine's determinism
  * contract. Histogram counts are commutative integers: the answer is
  * IDENTICAL under any partitioning, retry, or cluster size, and a
  * DuckDB oracle replays it bit-for-bit (q125).
  *
  * Estimate convention: for quantile q over n rows, target rank
  * `t = q·n`; the estimate interpolates linearly inside the first bin
  * whose cumulative count reaches t:
  * `min + (bin + (t − cumBefore)/binCount) · width`, rounded to 6.
  * Degenerate groups (all values equal, width 0) return the value.
  */
object HistQuantiles {

  /** Per-group histogram quantiles. Null values must be filtered by
    * the caller first (a null lands in no bin but would still count
    * toward n, shifting every target rank).
    *
    * @param qs quantile points, each in (0, 1)
    * @return (group, q, est, n) — one row per group × quantile,
    *         ordered by (group, q)
    */
  def quantiles(df: DataFrame, group: Column, v: Column,
      bins: Int = 128, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    weightedQuantiles(df, group, v, lit(1L), bins, qs)

  /** [[quantiles]] over PRE-COUNTED values: each row carries a value
    * and its multiplicity `w`. `quantiles(df, g, v)` ≡
    * `weightedQuantiles(distinct-counts of v, g, v, c)` — counts are
    * commutative integers either way, so the two spellings are
    * bit-identical. The weighted form is what a STREAMING value-count
    * accumulator ([[graft.streaming.CountStream]]) reads out through:
    * the (group, value, count) table is the operator's mergeable
    * sufficient statistic. */
  def weightedQuantiles(df: DataFrame, group: Column, v: Column, wgt: Column,
      bins: Int = 128, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantile points must lie in (0, 1): $qs")
    val staged = df.select(group.as("grp"), v.cast(DoubleType).as("x"),
      wgt.cast("long").as("w"))
    val ranges = staged.groupBy(col("grp"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        sum(col("w")).as("n"))
      .withColumn("width", (col("hi") - col("lo")) / lit(bins.toDouble))
    // bin membership: integer floor of (x − lo)/width, top edge clamped
    val binned = staged.join(broadcast(ranges), Seq("grp"))
      .withColumn("bin",
        when(col("width") === 0.0, lit(0))
          .otherwise(least(floor((col("x") - col("lo")) / col("width"))
            .cast("int"), lit(bins - 1))))
      .groupBy(col("grp"), col("bin")).agg(sum(col("w")).as("c"))
    // cumulative-before per bin: a window over the BINS-BOUNDED count
    // table (≤ bins rows per group — never data-scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = binned.withColumn("cum_before",
      coalesce(sum(col("c")).over(w), lit(0L)))
    val spark = df.sparkSession
    import spark.implicits._
    val qFrame = qs.toDF("q")
    // pick the first bin whose cumulative reaches t = q·n, interpolate
    val t = col("q") * col("n").cast(DoubleType)
    cum.join(broadcast(ranges), Seq("grp"))
      .crossJoin(broadcast(qFrame))
      .filter(col("cum_before").cast(DoubleType) < t &&
        (col("cum_before") + col("c")).cast(DoubleType) >= t)
      // ties across bins cannot happen: cum_before < t ≤ cum_before + c
      // selects exactly one bin per (grp, q)
      .select(col("grp"), col("q"),
        when(col("width") === 0.0, round(col("lo"), 6))
          .otherwise(round(col("lo") + (col("bin").cast(DoubleType) +
            (t - col("cum_before").cast(DoubleType)) / col("c").cast(DoubleType)) *
            col("width"), 6)).as("est"),
        col("n"))
      .orderBy(col("grp"), col("q"))
  }
}
