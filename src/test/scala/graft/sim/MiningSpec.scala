package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MiningSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight clusters: label 0 around (1,0), label 1 around (0,1);
    * vec 99 is a label-0 vector planted INSIDE the label-1 cluster. */
  private def emb = ((0 until 10).map(i =>
    (i.toLong, 0, Array(1f, 0.01f * i))) ++
    (10 until 20).map(i => (i.toLong, 1, Array(0.01f * i, 1f))) :+
    ((99L, 0, Array(0.02f, 1f))))
    .toDF("vec_id", "label", "embedding")

  test("hardNegatives returns only cross-label neighbors, nearest first") {
    val out = Mining.hardNegatives(emb.filter(col("vec_id") === 0L), emb, k = 5)
      .orderBy("rk").collect()
    assert(out.length == 5)
    assert(out.forall(_.getInt(3) != out.head.getInt(1)),
      "every mined negative carries a different label")
    // sims are non-increasing and the top negative is the planted
    // label-1-side vector most aligned with (1, ~0)'s cluster boundary
    val sims = out.map(_.getDouble(4))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("knnLabelAgreement flags the planted mislabel and trusts cluster cores") {
    val out = Mining.knnLabelAgreement(emb, emb, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(99L) == 0.0,
      s"label-0 vector living in the label-1 cluster must disagree fully: $out")
    assert(out(5L) >= 0.8, s"cluster-core vector must agree: ${out(5L)}")
    assert(out.keySet.size == 21, "one row per query vector")
  }

  test("hardNegativesIvf: exhaustive probe reproduces the exact answer; pruned probe is a subset") {
    val qs = emb.filter(col("vec_id") < 3)
    val exact = Mining.hardNegatives(qs, emb, k = 4).collect().toSeq
      .sortBy(r => (r.getLong(0), r.getLong(5)))
    val exhaustive = Mining.hardNegativesIvf(qs, emb, k = 4,
      nlist = 4, nprobe = 4).collect().toSeq
      .sortBy(r => (r.getLong(0), r.getLong(5)))
    assert(exhaustive == exact,
      "nprobe = nlist must be the recall identity (bit-for-bit)")
    // pruned probes may legitimately return fewer rows (a query whose
    // probed lists are all same-label finds nothing — correct, since
    // hard negatives live in OTHER clusters by construction); what is
    // guaranteed: every returned pair is cross-label and appears in the
    // exact answer's candidate space (same scored pairs, never invented)
    val exactAll = Mining.hardNegatives(qs, emb, k = Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toSet
    for (np <- 1 to 3) {
      val pruned = Mining.hardNegativesIvf(qs, emb, k = 4, nlist = 4, nprobe = np)
        .collect().toSeq
      assert(pruned.forall(r => r.getInt(1) != r.getInt(3)),
        s"nprobe=$np returned a same-label pair")
      assert(pruned.forall(r =>
        exactAll.contains((r.getLong(0), r.getLong(2), r.getDouble(4)))),
        s"nprobe=$np invented a pair/score outside the exact space")
    }
  }

  test("agreement divides by neighbors actually ranked, not requested k") {
    // 3 vectors, k=10: each query ranks only 2 neighbors; all share the
    // label, so agreement must be 1.0 (not 0.2)
    val tiny = Seq((1L, 0, Array(1f, 0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 0, Array(0.8f, 0.2f))).toDF("vec_id", "label", "embedding")
    val out = Mining.knnLabelAgreement(tiny, tiny, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.values.forall(_ == 1.0),
      s"perfectly-labeled tiny corpus must agree fully: $out")
  }

  test("exact entry points refuse a query side past the broadcast cap") {
    val qs = emb.filter(col("vec_id") < 3)
    // a cap below the query-row count must fail loudly, naming the scale path
    val e1 = intercept[IllegalArgumentException](
      Mining.hardNegatives(qs, emb, k = 2, maxQueryRows = 2))
    assert(e1.getMessage.contains("hardNegativesIvf"),
      s"the failure must name the scale path: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](
      Mining.knnLabelAgreement(qs, emb, k = 2, maxQueryRows = 2))
    assert(e2.getMessage.contains("maxQueryRows"), e2.getMessage)
    // an explicit raised cap is the documented exact-audit opt-in
    assert(Mining.hardNegatives(qs, emb, k = 2, maxQueryRows = 3).count() > 0)
  }

  test("IVF path degrades to shuffle (no query-side broadcast) past the cap") {
    val qs = emb.filter(col("vec_id") < 3)
    // size-based auto-broadcast off, so any BroadcastExchange in the
    // plan can only come from the row-cap hint under test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val over = Mining.hardNegativesIvf(qs, emb, k = 4, nlist = 4, nprobe = 4,
        maxBroadcastQueryRows = 2)
      val plan = over.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"past the cap the query side must not be hint-broadcast:\n$plan")
      val under = Mining.hardNegativesIvf(qs, emb, k = 4, nlist = 4, nprobe = 4)
      assert(under.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "under the cap the query side is hint-broadcast")
      // and the shuffle shape is the same answer as the broadcast shape
      assert(over.collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(5))) ==
        under.collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(5))))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mining is partitioning-invariant") {
    val a = Mining.hardNegatives(emb.filter(col("vec_id") < 3), emb.repartition(1), 4).collect().toSeq
    val b = Mining.hardNegatives(emb.filter(col("vec_id") < 3), emb.repartition(7), 4).collect().toSeq
    assert(a.sortBy(r => (r.getLong(0), r.getLong(5))) ==
      b.sortBy(r => (r.getLong(0), r.getLong(5))))
  }
}
