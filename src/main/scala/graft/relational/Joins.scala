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

  /** Join two same-bucketed tables on their bucket key. The merge hint
    * pins sort-merge (a broadcast would hide the exchange-free scan
    * property this layout exists for — and at 100 TB neither side
    * broadcasts anyway). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), Seq(key))
}
