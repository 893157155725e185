package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-n without a global sort of the full frame: prune each
  * input partition to its local top-n under the caller's total order,
  * then rank once over the ≤ n·P survivors. The union of per-partition
  * top-n sets contains the global top-n under the same total order, so
  * the two-stage answer is exact and deterministic — while no executor
  * ever sorts more than one partition's rows plus the survivor frame.
  *
  * The ranking idiom behind BM25 retrieval, DSIR selection, PMI
  * collocations, and every other "global top-n by score" operator here;
  * keep the invariant (SAME order in both stages) in this one place.
  */
object TopN {

  /** @param partitionBy rank within these groups (empty = one global
    *                    ranking); the per-partition prune composes with
    *                    it transparently
    * @param order       a TOTAL order (break score ties on a unique
    *                    column) — required for exactness
    * @param rankAs      name of the emitted 1..n LongType rank column
    */
  def exact(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column],
      n: Int, rankAs: String = "rank"): DataFrame = {
    require(n > 0, s"top-n needs n > 0, got $n")
    val local = Window.partitionBy(col("__pid") +: partitionBy: _*)
      .orderBy(order: _*)
    val global = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(local))
      .where(col("__lr") <= n).drop("__pid", "__lr")
      .withColumn(rankAs, row_number().over(global).cast("long"))
      .where(col(rankAs) <= n)
  }
}
