package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The batch relational surface (SURVEY §2.3-§2.5: joins / aggs /
  * windows / set ops are *absent* in the reference — delegated to
  * BigQuery SQL via its `migrate`/`Query` passthrough, ref
  * `pkg/infra/bq/client.go:53-62` — and come to us from stock Catalyst).
  * Everything here is declarative DataFrame API: Catalyst gets full
  * freedom on join order, pushdown and pruning; AQE resizes shuffles at
  * runtime.
  *
  * Oracle parity rules (the driver hash-compares against DuckDB):
  *   - money/value sums go through DECIMAL(18,6) so the aggregate is
  *     exact and order-independent, then cast to DOUBLE (identical bits
  *     on both engines for the same exact decimal);
  *   - averages are computed as exact-decimal sum / count in DOUBLE
  *     division, never engine-native avg() (whose intermediate types
  *     differ);
  *   - every query ORDER BYs a unique key, and no sort key is ever null
  *     (Spark and DuckDB default null ordering differs).
  */
object RelationalQueries {

  /** Exact, order-independent sum of a DOUBLE column: decimal-widen
    * per element, sum, cast back. Deterministic across partitionings —
    * plain `sum(double)` is not associative and would hash-mismatch. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
  /** SQL spelling of [[dsum]] for the DuckDB oracle. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  def davg(c: Column): Column = dsum(c) / count(c)
  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"

  /** q01: TPC-H Q1-shaped pricing summary — full-scan groupBy with
    * map-side partial aggregation; 4 groups, so the shuffle is tiny
    * regardless of SF (partial agg does all the work). */
  def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
           ${dsumSql("l_quantity")} AS sum_qty,
           ${dsumSql("l_extendedprice")} AS sum_base_price,
           ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
           ${davgSql("l_quantity")} AS avg_qty,
           ${davgSql("l_extendedprice")} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** q02: revenue by region/nation — fact⋈dims star join. The dimension
    * chain (customer⋈nation⋈region) is explicitly broadcast: at any SF
    * the dims are orders of magnitude below lineitem, so the only
    * shuffle left is the final 25-group aggregation (map-side combined).
    */
  def q02(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(s, d).select("r_regionkey", "r_name")
    val dims = broadcast(cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select("c_custkey", "n_name", "r_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(dims, ord("o_custkey") === dims("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q02Sql: String = s"""
    SELECT r_name, n_name,
           ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""

  /** q03: top-10 unshipped-revenue orders for one segment (TPC-H Q3
    * shape) — selective dim filter broadcast into the fact join, then a
    * global top-k (Spark's sort+limit is a per-partition top-k followed
    * by a driver merge — no full sort at scale). */
  def q03(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String = s"""
    SELECT l_orderkey,
           ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** q04: order-priority check (TPC-H Q4 shape) — EXISTS ≡ left-semi
    * join; Catalyst turns it into a shuffled semi (or broadcast when one
    * side shrinks under AQE). */
  def q04(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val late = Tables.lineitem(s, d)
      .select("l_orderkey", "l_shipdate")
    val semi = ord.join(late,
      ord("o_orderkey") === late("l_orderkey") &&
        late("l_shipdate") > add_months(ord("o_orderdate"), 1), "left_semi")
    semi.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 1 MONTH)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** q05: top-3 orders per customer by price — ranking window. The
    * window shuffles once on o_custkey; rank+filter is pipelined
    * (whole-stage codegen) with no second shuffle. */
  def q05(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q05Sql: String = """
    SELECT o_custkey, o_orderkey, rk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
    WHERE rk <= 3
    ORDER BY o_custkey, rk"""

  /** q06: selective scan-agg (TPC-H Q6 shape) — the pushdown showcase:
    * all three predicates reach the parquet reader (`PushedFilters`),
    * only 4 columns are read, result is a single row with zero shuffle
    * (partial agg + single-row final). */
  def q06(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  val q06Sql: String = s"""
    SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  /** q07: distinct aggregation — count(distinct) expands to a two-phase
    * aggregate in Spark (partial distinct per partition, then final);
    * no row explosion crosses the wire. */
  def q07(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("nations"),
        count(lit(1)).as("customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("c_mktsegment"))

  val q07Sql: String = s"""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS nations,
           COUNT(*) AS customers,
           ${dsumSql("c_acctbal")} AS total_acctbal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** q08: ROLLUP over (returnflag, linestatus) — grouping-set aggregate;
    * subtotal levels are computed in the same shuffle (Expand), not by
    * re-scanning. NULL grouping cells are labeled 'ALL' so no sort key
    * is null. */
  def q08(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q08Sql: String = s"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           ${dsumSql("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus"""

  /** q09: anti join — suppliers with no shipment in a narrow window.
    * Catalyst picks broadcast-anti when the subquery side is small;
    * the fact side is pre-filtered before the join (pushdown). */
  def q09(s: SparkSession, d: String): DataFrame = {
    val active = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-08").cast(TimestampType))
      .select("l_suppkey")
    Tables.supplier(s, d)
      .join(active, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  val q09Sql: String = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey
                        AND l_shipdate >= TIMESTAMP '1998-01-01'
                        AND l_shipdate <  TIMESTAMP '1998-01-08')
    ORDER BY s_suppkey"""

  /** q10: set operations — INTERSECT/EXCEPT compile to Spark semi/anti
    * aggregates (distinct + join), exercising the multiset machinery the
    * reference only has as union (`LogRecordSet.Merge`). */
  def q10(s: SparkSession, d: String): DataFrame = {
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .withColumn("which", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("which", lit("customer_only"))
    val suppOnly = suppNations.except(custNations)
      .withColumn("which", lit("supplier_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
      .orderBy(col("which"), col("nationkey"))
      .select(col("which"), col("nationkey"))
  }

  val q10Sql: String = """
    SELECT which, nationkey FROM (
      SELECT 'both' AS which, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'customer_only', nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'supplier_only', nationkey FROM
        (SELECT s_nationkey AS nationkey FROM supplier
         EXCEPT SELECT c_nationkey FROM customer))
    ORDER BY which, nationkey"""

  /** q11: correlated scalar aggregate — customers above their segment's
    * average balance, written as window aggregates (one shuffle on
    * segment, no self-join). */
  def q11(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("seg_avg",
        (sum(col("c_acctbal").cast(DecimalType(18, 6))).over(w).cast(DoubleType) /
          count(lit(1)).over(w)))
      .filter(col("c_acctbal") > col("seg_avg") * 1.5)
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q11Sql: String = """
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY c_mktsegment) AS seg_avg
      FROM customer)
    WHERE c_acctbal > seg_avg * 1.5
    ORDER BY c_custkey"""

  /** q12: event-time bucketing — hourly tumbling aggregation over the
    * event stream table (the batch shape of a streaming windowed agg;
    * SURVEY §2.7 T4). Group key count is bounded by hours×types so the
    * shuffle stays tiny at any SF. */
  def q12(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val q12Sql: String = s"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n,
           ${dsumSql("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type"""

  /** q13: semi-structured extraction — pull a field out of the JSON
    * `props` column (the reference's whole business is JSON records;
    * here as a column-level op). get_json_object is codegen'd. */
  def q13(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("event_type"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_type")).as("types"))
      .orderBy(col("k"))

  val q13Sql: String = """
    SELECT CAST(json_extract_string(props, 'k') AS INTEGER) AS k,
           COUNT(*) AS n,
           COUNT(DISTINCT event_type) AS types
    FROM events
    GROUP BY k
    ORDER BY k"""

  /** q14: GROUPING SETS / cube — both subtotal layouts in one shuffle
    * (Expand), labeled to keep sort keys non-null. */
  def q14(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  val q14Sql: String = s"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  /** q15: IN-subquery (uncorrelated) — compiles to a left-semi join
    * against the distinct subquery side. */
  def q15(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val q15Sql: String = """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** q16: conditional aggregation (pivot shape) — one pass, one shuffle,
    * a column per category; spelled with explicit conditional sums so
    * the column names are deterministic on both engines. */
  def q16(s: SparkSession, d: String): DataFrame = {
    def cnt(status: String) =
      sum(when(col("o_orderstatus") === status, 1).otherwise(0)).as(s"n_$status")
    def tot(status: String) =
      dsum(when(col("o_orderstatus") === status, col("o_totalprice")).otherwise(lit(0.0)))
        .as(s"total_$status")
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(cnt("O"), cnt("F"), cnt("P"), tot("O"), tot("F"), tot("P"))
      .orderBy(col("o_orderpriority"))
  }

  val q16Sql: String = {
    def cnt(st: String) = s"CAST(SUM(CASE WHEN o_orderstatus = '$st' THEN 1 ELSE 0 END) AS BIGINT) AS n_$st"
    def tot(st: String) =
      s"${dsumSql(s"CASE WHEN o_orderstatus = '$st' THEN o_totalprice ELSE 0.0 END")} AS total_$st"
    s"""
    SELECT o_orderpriority, ${cnt("O")}, ${cnt("F")}, ${cnt("P")},
           ${tot("O")}, ${tot("F")}, ${tot("P")}
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  }

  /** q17: string-function surface — lower/upper/substring/replace/
    * concat/length/trim, all codegen'd, identical semantics in DuckDB. */
  def q17(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        lower(col("p_brand")).as("brand_lower"),
        upper(substring(col("p_type"), 1, 5)).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("deVoweled"),
        concat_ws("::", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  val q17Sql: String = """
    SELECT p_partkey,
           lower(p_brand) AS brand_lower,
           upper(substring(p_type, 1, 5)) AS type_prefix,
           length(p_name) AS name_len,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS deVoweled,
           concat_ws('::', p_brand, p_type) AS brand_type
    FROM part ORDER BY p_partkey"""

  /** q18: UNION dedup vs UNION ALL — distinct-union is a hash agg over
    * the concatenation; both engines treat it identically. */
  def q18(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d)
      .filter(col("o_totalprice") > 90)
      .select(col("o_custkey").as("custkey"))
    val b = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.union(b).distinct()
      .agg(count(lit(1)).as("n_union_distinct"))
      .crossJoin(a.unionAll(b).agg(count(lit(1)).as("n_union_all")))
  }

  val q18Sql: String = """
    SELECT (SELECT COUNT(*) FROM (
              SELECT o_custkey FROM orders WHERE o_totalprice > 90
              UNION
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS n_union_distinct,
           (SELECT COUNT(*) FROM (
              SELECT o_custkey FROM orders WHERE o_totalprice > 90
              UNION ALL
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS n_union_all"""

  /** q19: date/time arithmetic — truncation, extraction, intervals,
    * diffs; output as strings/ints so both engines hash identically. */
  def q19(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        datediff(lit("2002-01-01").cast(TimestampType), col("o_orderdate")).cast("long").as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  val q19Sql: String = """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           EXTRACT(dayofweek FROM o_orderdate) + 1 AS dow,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""

  /** q46: salted sort-merge join on an EXTREMELY skewed key —
    * l_returnflag has 3 values, so an unsalted shuffle join lands the
    * whole fact table on 3 reducers; the salt spreads each flag over 8.
    * The salt is a deterministic hash of the row's key (never rand()),
    * so the result — and the oracle hash — is exact. */
  def q46(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("w",
        pmod(graft.text.TextFunctions.md5Long(col("l_returnflag"), 8), lit(100)))
    Joins.saltedJoin(li.hint("merge"), dim, "l_returnflag", nSalts = 8,
        saltBy = pmod(col("l_orderkey"), lit(97)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"),
        max(col("w")).as("w"))
      .orderBy(col("l_returnflag"))
  }

  val q46Sql: String = s"""
    WITH dim AS (SELECT DISTINCT l_returnflag,
                        ${graft.text.TextFunctions.md5LongSql("l_returnflag", 8)} % 100 AS w
                 FROM lineitem)
    SELECT l_returnflag, COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS total,
           MAX(w) AS w
    FROM lineitem JOIN dim USING (l_returnflag)
    GROUP BY 1 ORDER BY l_returnflag"""

  /** q47: exchange-free big-big join via bucketed layout — both tables
    * are written bucketed+sorted on the join key (shuffle paid once, at
    * write), then the join's scan partitioning already satisfies the
    * requirement and the plan has no exchange before the merge join
    * (asserted in JoinsSpec). The per-round write cost is the point:
    * it amortizes over every subsequent join at 100 TB. */
  def q47(s: SparkSession, d: String): DataFrame = {
    val work = graft.util.Workspace.temp("graft-q47")
    Joins.writeBucketed(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      "q47_orders_b", s"$work/o", "o_orderkey", nBuckets = 8)
    Joins.writeBucketed(
      Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "q47_lineitem_b", s"$work/l", "o_orderkey", nBuckets = 8)
    Joins.bucketedJoin(s, "q47_orders_b", "q47_lineitem_b", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("o_orderpriority"))
  }

  val q47Sql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n, ${dsumSql("l_quantity")} AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY o_orderpriority"""

  /** q54: as-of join — each event picks up the user's most recent
    * prior-or-simultaneous click (the point-in-time feature-lookup
    * shape). The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the
    * hash check pins our union+window composition to an independent
    * native implementation of the operator. */
  def q54(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // unique (user, ts) right side — the asOfJoin determinism contract
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
    Joins.asOfJoin(ev.filter(col("event_id") < 2000), clicks,
        "user_id", "ts", "ts",
        Seq(("ts", "click_ts"), ("click_value", "click_value")))
      .select(col("event_id"), col("click_ts"), col("click_value"))
      .orderBy(col("event_id"))
  }

  val q54Sql: String = """
    WITH clicks AS (SELECT user_id, ts, MAX(value) AS click_value
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT e.event_id, c.ts AS click_ts, c.click_value
    FROM events e ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts <= e.ts
    WHERE e.event_id < 2000 ORDER BY e.event_id"""

  /** q56: batch sessionization — the lag + cumulative-flag SQL twin of
    * the streaming `StreamOps.sessionize` state machine: a session
    * breaks when the gap to the previous event exceeds 30 min. Gap
    * arithmetic is in exact integer MICROSECONDS (`unix_micros` ≡
    * DuckDB `epoch_us`) — second-truncated `unix_timestamp` would
    * misclassify sub-second boundaries. One shuffle (by user), two
    * window passes over it. */
  def q56(s: SparkSession, d: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val ev = Tables.events(s, d).filter(col("user_id") < 50)
      .withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("ns", when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("sid"))
  }

  val q56Sql: String = s"""
    WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
               FROM events WHERE user_id < 50),
    f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                           OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM f)
    SELECT user_id, sid, COUNT(*) AS n_events, ${dsumSql("value")} AS total_value,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY 1, 2 ORDER BY user_id, sid"""

  /** Name → (query, oracle) for SparkEntry wiring. */
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q01_pricing_summary", q01 _, q01Sql),
    ("q02_revenue_by_nation", q02 _, q02Sql),
    ("q03_topk_orders", q03 _, q03Sql),
    ("q04_order_priority_semijoin", q04 _, q04Sql),
    ("q05_window_rank", q05 _, q05Sql),
    ("q06_selective_filter", q06 _, q06Sql),
    ("q07_distinct_agg", q07 _, q07Sql),
    ("q08_rollup", q08 _, q08Sql),
    ("q09_anti_join", q09 _, q09Sql),
    ("q10_set_ops", q10 _, q10Sql),
    ("q11_window_avg_filter", q11 _, q11Sql),
    ("q12_events_hourly", q12 _, q12Sql),
    ("q13_json_extract", q13 _, q13Sql),
    ("q14_cube", q14 _, q14Sql),
    ("q15_in_subquery", q15 _, q15Sql),
    ("q16_pivot_agg", q16 _, q16Sql),
    ("q17_string_funcs", q17 _, q17Sql),
    ("q18_union_dedup", q18 _, q18Sql),
    ("q19_date_arith", q19 _, q19Sql),
    ("q46_salted_join", q46 _, q46Sql),
    ("q47_bucketed_join", q47 _, q47Sql),
    ("q54_asof_join", q54 _, q54Sql),
    ("q56_sessionization", q56 _, q56Sql))
}
