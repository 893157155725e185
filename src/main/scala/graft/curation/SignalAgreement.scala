package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Filter-signal agreement audit — before stacking two quality
  * filters (length × lexical diversity, perplexity × classifier, …) a
  * curation pipeline should know whether they are measuring the same
  * thing: two redundant signals double-count one bias; two orthogonal
  * ones genuinely tighten the sieve. This operator quantifies it:
  * band both signals into quantile buckets, cross-tabulate, and score
  * the diagonal mass with Cohen's kappa (0 ≈ independent, 1 ≡ the
  * same ranking, < 0 anti-correlated).
  *
  * Scale shape (100 TB): banding uses exact interpolated percentile
  * CUTPOINTS (one sort-based aggregate per signal — the q50 shape),
  * broadcast back as a one-row frame; NO global ntile window (a
  * single-partition sort at corpus scale is the anti-pattern this
  * deliberately avoids). The contingency table is one bands²-bounded
  * groupBy; kappa folds from it in closed form on the driver-free
  * plan (a one-row cross join).
  *
  * Determinism: callers pass pre-rounded score columns; cutpoints are
  * the interpolated `percentile` values (bit-identical to DuckDB's
  * `quantile_cont` — the q50-proven contract), band membership is
  * `score > cutpoint` strict comparisons, and kappa rounds to 6.
  */
object SignalAgreement {

  /** Cross-tabulate two signals at `bands` quantile buckets. Rows with
    * a null in either signal must be filtered by the caller first
    * (`percentile` skips nulls but the cross-tab would band them).
    *
    * @return (band_a, band_b, n, kappa) — one row per OCCUPIED cell,
    *         bands 1..`bands`, kappa the same on every row (the
    *         table-level statistic riding the row-level table),
    *         ordered by (band_a, band_b)
    */
  def bandAgreement(docs: DataFrame, scoreA: Column, scoreB: Column,
      bands: Int = 5): DataFrame = {
    require(bands >= 2, s"need >= 2 bands, got $bands")
    val staged = docs.select(scoreA.cast(DoubleType).as("__a"),
      scoreB.cast(DoubleType).as("__b"))
    val qs = (1 until bands).map(i => i.toDouble / bands)
    val qsSql = qs.map(q => s"${q}D").mkString(", ")
    val cuts = staged.agg(
      expr(s"percentile(__a, array($qsSql))").as("ca"),
      expr(s"percentile(__b, array($qsSql))").as("cb"))
    def bandOf(v: Column, cutArr: Column): Column =
      (1 until bands).map(i => (v > element_at(cutArr, i)).cast("int"))
        .reduce(_ + _) + 1
    val banded = staged.crossJoin(broadcast(cuts))
      .select(bandOf(col("__a"), col("ca")).as("band_a"),
        bandOf(col("__b"), col("cb")).as("band_b"))
    val cells = banded.groupBy(col("band_a"), col("band_b"))
      .agg(count(lit(1)).as("n"))
    // kappa from the bands²-bounded cell table: po = diag/n,
    // pe = sum_i row_i * col_i / n² — all-integer sums, one double
    // division each, rounded at the end
    val totals = cells.agg(
      sum(col("n")).as("tot"),
      sum(when(col("band_a") === col("band_b"), col("n")).otherwise(0L)).as("diag"))
    val rows = cells.groupBy(col("band_a").as("__i")).agg(sum(col("n")).as("ra"))
    val cols = cells.groupBy(col("band_b").as("__i")).agg(sum(col("n")).as("cb"))
    val pe = rows.join(cols, "__i")
      .agg(sum(col("ra") * col("cb")).as("cross"))
    // pe = 1 (all mass in one band pair) degenerates kappa: null, not NaN
    val kappa = totals.crossJoin(pe)
      .select(when(col("cross") === col("tot") * col("tot"),
          lit(null).cast(DoubleType))
        .otherwise(round(
          (col("diag").cast(DoubleType) / col("tot").cast(DoubleType) -
            col("cross").cast(DoubleType) / (col("tot") * col("tot")).cast(DoubleType)) /
            (lit(1.0) -
              col("cross").cast(DoubleType) / (col("tot") * col("tot")).cast(DoubleType)),
          6)).as("kappa"))
    cells.crossJoin(broadcast(kappa))
      .select(col("band_a"), col("band_b"), col("n"), col("kappa"))
      .orderBy(col("band_a"), col("band_b"))
  }
}
