package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: identical rows to a plain join; shuffle keys carry the salt") {
    // 90% of rows share key "a" — the classic hot-key shape
    val skewed = (1 to 300).map(i => (if (i % 10 == 0) "b" else "a", i.toLong))
      .toDF("k", "v")
    val dim = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "w")
    val plain = skewed.join(dim, Seq("k")).orderBy("v").collect().toSeq
    val salted = Joins.saltedJoin(skewed.hint("merge"), dim, "k", nSalts = 8, saltBy = $"v")
      .select("k", "v", "w").orderBy("v").collect().toSeq
    assert(salted == plain)

    // the exchange must partition on (k, __salt), spreading hot keys
    val plan = Joins.saltedJoin(skewed.hint("merge"), dim, "k", 8, $"v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt missing from plan:\n$plan")
  }

  test("asOfJoin: latest right row at-or-before each left ts; no match -> null") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "e1"), // before any quote -> null
      (1L, ts("2024-01-01 00:02:00"), "e2"), // after q@01:00 -> 10
      (1L, ts("2024-01-01 00:05:00"), "e3"), // exactly at q@05:00 -> 30 (inclusive)
      (2L, ts("2024-01-01 00:09:00"), "e4")) // other key -> its own quote
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:01:00"), 10.0),
      (1L, ts("2024-01-01 00:05:00"), 30.0),
      (2L, ts("2024-01-01 00:03:00"), 99.0))
      .toDF("k", "rt", "price")
    val out = Joins.asOfJoin(left, right, "k", "t", "rt",
        Seq(("rt", "quote_t"), ("price", "price")))
      .select("tag", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out == Map("e1" -> None, "e2" -> Some(10.0),
      "e3" -> Some(30.0), "e4" -> Some(99.0)))
  }

  test("bucketedJoin: no exchange in the plan; identical rows to a plain join") {
    val work = tmpDir("bucketed-spec")
    val left = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("a"))
    val right = spark.range(0, 1000, 3).select($"id".as("k"), ($"id" + 7).as("b"))
    Joins.writeBucketed(left, "js_left_b", s"$work/l", "k", nBuckets = 4)
    Joins.writeBucketed(right, "js_right_b", s"$work/r", "k", nBuckets = 4)

    val j = Joins.bucketedJoin(spark, "js_left_b", "js_right_b", "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")

    val plain = left.join(right, Seq("k")).orderBy("k").collect().toSeq
    assert(j.orderBy("k").collect().toSeq == plain)
  }
}
