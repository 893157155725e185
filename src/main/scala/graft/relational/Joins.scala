package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the two shapes that break naive plans at 100 TB:
  * skewed keys and repeated big-big joins.
  *
  * The reference never joins (BigQuery does); these are the Spark-side
  * operators a warehouse this size needs alongside the broadcast
  * discipline already used in RelationalQueries.
  */
object Joins {

  /** Salted equi-join for skewed keys.
    *
    * A shuffle join partitions both sides by `key`; with few (or
    * heavy-tailed) key values, a handful of reducers receive almost all
    * rows and the stage runs at single-task speed. Salting appends a
    * deterministic `__salt` in [0, nSalts) to the SKEWED side's key and
    * replicates the other side once per salt value, spreading each hot
    * key over `nSalts` reducers. Same rows out as a plain join.
    *
    * AQE's skew-join splitting (on in GraftSession) already handles
    * sort-merge skew it can SEE at runtime; explicit salting is the fix
    * when AQE can't help — shuffle-hash joins, skewed `groupBy` built on
    * the join output, or stream-stream joins where partitions can't be
    * re-split after the fact.
    *
    * `saltBy` must be DETERMINISTIC (e.g. a hash of the row's id — NOT
    * rand()) so replays/retries route a row to the same reducer and the
    * result is reproducible; any well-spread expression works. A null
    * `saltBy` value maps to salt 0 (the row still joins — a null salt
    * would silently drop it from the equi-join). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      nSalts: Int, saltBy: Column): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val l = skewed.withColumn("__salt",
      coalesce(pmod(saltBy, lit(nSalts)).cast("int"), lit(0)))
    val r = other.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed + per-bucket-sorted external parquet table
    * registered as `table` (data under `path`). Joins and aggregations
    * between tables bucketed the same way on the same key need NO
    * exchange — the scan's output partitioning already satisfies the
    * join's requirement. THE layout for fact tables that are joined on
    * the same key query after query: the shuffle is paid once at write
    * time, never again at read time.
    *
    * The pre-write `repartition(nBuckets, key)` keeps exactly one file
    * per bucket (otherwise every write task emits one file per bucket:
    * tasks × buckets small files) and makes the per-bucket sort global
    * within each bucket. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit =
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite").option("path", path)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** As-of (point-in-time) join: for each left row, attach the LATEST
    * right row for the same key with `rightTs` ≤ `leftTs` — the
    * feature-store / market-data join Spark has no native operator for.
    *
    * Composed Spark-first instead of a custom physical operator: both
    * sides are UNIONED into one per-key timeline (right rows flagged),
    * a running `last(_, ignoreNulls)` over (key, time) carries the most
    * recent right payload forward, and the left rows are projected out
    * with the carried value. ONE shuffle (the window's partitioning by
    * key) and a per-key sort — no time-range join, whose candidate set
    * explodes with |left|×|right per window| at scale. Equal timestamps
    * are INCLUSIVE (a right row at exactly `leftTs` is visible),
    * matching DuckDB's `ASOF JOIN ... ON r.ts <= l.ts` — the oracle twin.
    *
    * `rightCols` maps right-side columns to output names (alias them
    * away from left column names). The right side must be unique per
    * (key, rightTs) — pre-aggregate if not, or the carried row among
    * equal-ts right rows is arbitrary. Null semantics match the
    * equi-join + comparison contract: right rows with a null key or
    * null `rightTs` can never satisfy `r.key = l.key AND r.ts <= l.ts`,
    * so they are dropped (NOT sorted first and carried, which is what
    * a naive null-ascending window would do). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Seq[(String, String)]): DataFrame = {
    val rStruct = struct(rightCols.map { case (c, a) => col(c).as(a) }: _*)
    val rType = right.select(rStruct.as("__r")).schema.head.dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("__l")).schema.head.dataType
    val rRows = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__t"),
        rStruct.as("__r"), lit(1).as("__isr"), lit(null).cast(lType).as("__l"))
    val lRows = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(null).cast(rType).as("__r"), lit(0).as("__isr"), lStruct.as("__l"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      // right rows sort BEFORE left rows at the same instant → inclusive
      .orderBy(col("__t").asc, col("__isr").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    rRows.unionByName(lRows)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select(col("__l.*") +:
        rightCols.map { case (_, a) => col("__carried").getField(a).as(a) }: _*)
  }

  /** Join two same-bucketed tables on their bucket key. The merge hint
    * pins sort-merge (a broadcast would hide the exchange-free scan
    * property this layout exists for — and at 100 TB neither side
    * broadcasts anyway). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), Seq(key))
}
