package graft.curation

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.range(1000)
    .select($"id".as("doc_id"), ($"id" % 4).cast("string").as("src"))

  test("datasetSplit: total partition, deterministic, fractions ~respected, stable under append") {
    val split = Sampling.datasetSplit(corpus, col("doc_id"),
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    // every row in exactly one split
    assert(split.count() == 1000L)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900, s"$counts")
    // deterministic: identical assignment on recompute
    val again = Sampling.datasetSplit(corpus, col("doc_id"),
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    assert(split.exceptAll(again).isEmpty)
    // appending a split only moves rows out of the LAST range: the
    // train assignment is bucket-stable
    val finer = Sampling.datasetSplit(corpus, col("doc_id"),
      Seq("train" -> 800, "val" -> 100, "test" -> 50, "holdout" -> 50))
    val trainIds = split.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val finerTrain = finer.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(trainIds == finerTrain)
    intercept[IllegalArgumentException](
      Sampling.datasetSplit(corpus, col("doc_id"), Seq("a" -> 500)))
    intercept[IllegalArgumentException](
      Sampling.datasetSplit(corpus, col("doc_id"), Seq("a" -> 1100, "b" -> -100)))
  }

  test("datasetSplit: independent of uniformSample; null ids get a null split") {
    // domain-separated hash: a 100-permille uniform sample must still
    // populate ALL splits (a bare-id bucket would land the whole sample
    // in train and silently empty the eval sets)
    val sampled = Sampling.uniformSample(corpus, col("doc_id"), 100)
    val splits = Sampling.datasetSplit(sampled, col("doc_id"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .groupBy("split").count().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"),
      s"sample composed with split must cover all splits, got $splits")
    // null ids: no bucket → null split, never dumped into the last split
    val withNull = corpus.select(
      when(col("doc_id") < 5, lit(null)).otherwise(col("doc_id")).as("doc_id"))
    val nulls = Sampling.datasetSplit(withNull, col("doc_id"),
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    assert(nulls.filter(col("doc_id").isNull && col("split").isNotNull).count() == 0L)
  }

  test("uniformSample: deterministic, rate within tolerance, map-side only") {
    val a = Sampling.uniformSample(corpus, $"doc_id", 200)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.uniformSample(corpus.repartition(13), $"doc_id", 200)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size - 200) < 60, s"rate off: ${a.size}/1000")
    // rate 0 and 1000 are exact
    assert(Sampling.uniformSample(corpus, $"doc_id", 0).count() == 0)
    assert(Sampling.uniformSample(corpus, $"doc_id", 1000).count() == 1000)
    // no exchange: pure filter
    val plan = Sampling.uniformSample(corpus, $"doc_id", 200)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("mixAllocation: alpha interpolates proportional -> uniform; weights sum to ~1") {
    val df = (1 to 90).map(i => if (i <= 80) "big" else "small").toDF("src")
    def weights(alpha: Double) =
      Sampling.mixAllocation(df, "src", alpha, budget = 1000)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val prop = weights(1.0)
    assert(math.abs(prop("big") - 8.0 / 9) < 1e-6) // 80/90
    val uni = weights(0.0)
    assert(uni("big") == 0.5 && uni("small") == 0.5)
    val temp = weights(0.5)
    assert(temp("small") > 1.0 / 9 && temp("small") < 0.5) // up-weighted, not equal
    val allocs = Sampling.mixAllocation(df, "src", 0.5, budget = 1000)
      .collect().map(_.getLong(3))
    assert(allocs.sum <= 1000 && allocs.sum >= 998) // floor loses < 1 per stratum
  }

  test("budgetSelect: greedy prefix by (score desc, id); distributed prefix sum in the plan") {
    // scores force the order 9,8,...,0; weights make the 20-budget cut
    // fall mid-prefix: 9(w5) 8(w5) 7(w5) 6(w5) = 20 kept, 5(w5) = 25 out
    val rows = spark.range(10)
      .select($"id".as("doc_id"), $"id".cast("double").as("q"), lit(5L).as("w"))
    val kept = Sampling.budgetSelect(rows, $"doc_id", $"q", $"w", budget = 20L)
    val got = kept.select("doc_id", "cum_weight").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((6L, 20L), (7L, 15L), (8L, 10L), (9L, 5L)),
      s"greedy prefix must keep exactly the budget-fitting head, got ${got.toSeq}")
    // ties broken by id: equal scores keep the LOWER ids first
    val tied = spark.range(10)
      .select($"id".as("doc_id"), lit(1.0).as("q"), lit(5L).as("w"))
    assert(Sampling.budgetSelect(tied, $"doc_id", $"q", $"w", budget = 20L)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // scale shape: the data's running sum is computed per range
    // partition (windowspec keyed by the partition id) over a range
    // exchange — never a partition-less window over the corpus
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"budgetSelect must range-partition by the sort key, plan:\n$plan")
    assert(plan.contains("windowspecdefinition(__pid"),
      s"the data window must be partitioned by the physical partition id, plan:\n$plan")
  }

  test("budgetSelect: null or negative weights fail loudly, never corrupt the prefix") {
    // a null weight would ride the window sum at zero cost; a negative
    // one desyncs the per-partition offsets — both are corrupt inputs
    // and the contract is enforced, not prose
    val nulled = spark.range(4).select($"id".as("doc_id"),
      $"id".cast("double").as("q"),
      when($"id" === 2, lit(null)).otherwise(lit(5L)).as("w"))
    val e1 = intercept[Exception](
      Sampling.budgetSelect(nulled, $"doc_id", $"q", $"w", 20L).collect())
    assert(e1.getMessage.contains("non-negative"), e1.getMessage)
    val negative = spark.range(4).select($"id".as("doc_id"),
      $"id".cast("double").as("q"),
      when($"id" === 1, lit(-3L)).otherwise(lit(5L)).as("w"))
    val e2 = intercept[Exception](
      Sampling.budgetSelect(negative, $"doc_id", $"q", $"w", 20L).collect())
    assert(e2.getMessage.contains("non-negative"), e2.getMessage)
    // UNCASTABLE weights (string column, non-numeric value) are null
    // only AFTER the cast — the guard must fire on those too, not let
    // the row ride the budget for free
    val uncastable = spark.range(4).select($"id".as("doc_id"),
      $"id".cast("double").as("q"),
      when($"id" === 2, lit("abc")).otherwise(lit("5")).as("w"))
    val e3 = intercept[Exception](
      Sampling.budgetSelect(uncastable, $"doc_id", $"q", $"w", 20L).collect())
    assert(e3.getMessage.contains("non-negative"), e3.getMessage)
  }

  test("shuffleOrder: a permutation, deterministic across partitionings, distributed plan") {
    val rows = spark.range(500).select($"id".as("doc_id"))
    val ordered = Sampling.shuffleOrder(rows, $"doc_id", seed = "s1")
    val got = ordered.select("doc_id", "ord_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 1..N, each position exactly once
    assert(got.map(_._2).sorted.toSeq == (1L to 500L).toSeq)
    // not the identity order (it's a shuffle)
    assert(got.sortBy(_._1).map(_._2).toSeq != (1L to 500L).toSeq)
    // identical assignment under a different physical partitioning
    val again = Sampling.shuffleOrder(rows.repartition(7), $"doc_id", "s1")
      .select("doc_id", "ord_pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // a different seed is a different permutation
    val other = Sampling.shuffleOrder(rows, $"doc_id", "s2")
      .select("doc_id", "ord_pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(other.sortBy(_._1).map(_._2).toSeq != got.sortBy(_._1).map(_._2).toSeq)
    // scale shape: range exchange + partition-id windows, never a
    // partition-less window over the data
    val plan = ordered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"shuffleOrder must range-partition by the hash key, plan:\n$plan")
    assert(plan.contains("windowspecdefinition(__pid"),
      s"the data window must be partitioned by the physical partition id, plan:\n$plan")
  }

  test("stratifiedCap: cap per stratum, deterministic, small strata intact") {
    val skewed = corpus.filter($"src" =!= "3")
      .union(corpus.filter($"src" === "3").limit(2)) // one tiny stratum
    val out = Sampling.stratifiedCap(skewed, Seq("src"), $"doc_id", cap = 10)
    val sizes = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("0") == 10 && sizes("1") == 10 && sizes("2") == 10)
    assert(sizes("3") == 2) // under-cap strata pass through whole
    // same subset regardless of partitioning
    val again = Sampling.stratifiedCap(skewed.repartition(7), Seq("src"), $"doc_id", 10)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq)
    // Spark 4 recognizes the rank filter: partial top-k before the exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("clusterAwareSplit: no near-dup pair ever straddles a split boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 docs; edges chain {0,1,2} and pair {10,11}; rest singletons
    val docsDf = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val out = Sampling.clusterAwareSplit(docsDf, col("doc_id"), pairs,
      Seq("train" -> 600, "val" -> 200, "test" -> 200))
    val bySplit = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    // every edge stays within one split — the leakage property
    Seq((0L, 1L), (1L, 2L), (10L, 11L)).foreach { case (a, b) =>
      assert(bySplit(a) == bySplit(b), s"pair ($a,$b) straddles splits")
    }
    // cluster members inherit the REPRESENTATIVE's assignment
    val repSplit = Sampling.datasetSplit(
      Seq(0L, 10L).toDF("doc_id"), col("doc_id"),
      Seq("train" -> 600, "val" -> 200, "test" -> 200))
      .as[(Long, String)].collect().toMap
    assert(bySplit(2L) == repSplit(0L) && bySplit(11L) == repSplit(10L))
    // singletons match the plain per-doc split exactly
    val plain = Sampling.datasetSplit(docsDf, col("doc_id"),
      Seq("train" -> 600, "val" -> 200, "test" -> 200))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (0L until 60L).filterNot(Set(0L, 1L, 2L, 10L, 11L)).foreach { i =>
      assert(bySplit(i) == plain(i))
    }
    // all three splits actually populated on 60 docs
    assert(out.select("split").distinct().count() == 3)
  }

  test("weightedSample: deterministic, weight-biased, exact n, total order") {
    // weights: doc 0..499 light (10), 500..999 heavy (1000)
    val weighted = corpus.withColumn("w",
      when($"doc_id" < 500, lit(10L)).otherwise(lit(1000L)))
    val out = Sampling.weightedSample(weighted, $"doc_id", $"w", 100, "s1")
    assert(out.count() == 100L)
    val heavy = out.filter($"doc_id" >= 500).count()
    // heavy rows are 100x likelier: expect the sample to be dominated
    // by them (P[light dominating] is astronomically small)
    assert(heavy > 80, s"heavy=$heavy of 100")
    // identical sample on a different partitioning (md5 key, TopN)
    val again = Sampling.weightedSample(weighted.repartition(13),
      $"doc_id", $"w", 100, "s1")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // a different seed draws a different sample
    val other = Sampling.weightedSample(weighted, $"doc_id", $"w", 100, "s2")
    assert(other.exceptAll(out).count() > 0)
    // ranks are 1..n under the key's total order
    val ranks = out.select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 100L))
    intercept[IllegalArgumentException](
      Sampling.weightedSample(weighted, $"doc_id", $"w", 0, "s"))
  }

  test("stratifiedWeightedSample: independent per-stratum draws, exact quota") {
    val df = corpus.withColumn("w", lit(10L) + $"doc_id" % 5)
    val out = Sampling.stratifiedWeightedSample(df, Seq("src"), $"doc_id", $"w", 30, "s")
    // every stratum gets exactly its quota (250 candidates each)
    val per = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(per.values.toSet == Set(30L) && per.size == 4, s"$per")
    // ranks are 1..n inside each stratum
    val ranks = out.filter($"src" === "0").select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 30L))
    // a stratum's draw is INDEPENDENT of other strata's membership:
    // dropping stratum 3 leaves strata 0-2 selections unchanged
    val without = Sampling.stratifiedWeightedSample(
      df.filter($"src" =!= "3"), Seq("src"), $"doc_id", $"w", 30, "s")
    val before = out.filter($"src" =!= "3")
    assert(before.exceptAll(without).isEmpty && without.exceptAll(before).isEmpty)
    intercept[IllegalArgumentException](
      Sampling.stratifiedWeightedSample(df, Seq.empty, $"doc_id", $"w", 30, "s"))
  }

  test("allocatedSample: realizes the mix allocation exactly, small strata capped by size") {
    // strata sized 300/150/50: alpha 0.5 up-weights the small ones
    val df = (spark.range(300).select(lit("big").as("src"), $"id".as("doc_id")) unionAll
      spark.range(150).select(lit("mid").as("src"), ($"id" + 1000).as("doc_id")) unionAll
      spark.range(50).select(lit("small").as("src"), ($"id" + 5000).as("doc_id")))
      .withColumn("w", lit(1L) + $"doc_id" % 7)
    val alloc = Sampling.mixAllocation(df, "src", alpha = 0.5, budget = 100L)
      .select("src", "alloc").as[(String, Long)].collect().toMap
    val out = Sampling.allocatedSample(df, "src", 0.5, 100L, $"doc_id", $"w", "m")
    val per = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // every stratum contributes exactly min(alloc, size)
    assert(per == alloc.map { case (s, a) =>
      s -> math.min(a, Map("big" -> 300L, "mid" -> 150L, "small" -> 50L)(s)) }
      .filter(_._2 > 0), s"per=$per alloc=$alloc")
    // deterministic under repartitioning
    val again = Sampling.allocatedSample(df.repartition(9), "src", 0.5, 100L,
      $"doc_id", $"w", "m")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("weightedSample: zero/negative weights clamp to epsilon, never crash") {
    val df = spark.range(100).select($"id".as("doc_id"),
      when($"id" < 50, lit(0L)).otherwise(lit(-3L)).as("w"))
    val out = Sampling.weightedSample(df, $"doc_id", $"w", 20, "s")
    assert(out.count() == 20L)
    // all weights equal (clamped) -> sample is the plain md5-uniform draw
    assert(out.select("es_key").as[Double].collect().forall(_ <= 0.0))
  }

  test("weightedSample: fractional weights keep proportional odds (not collapsed to uniform)") {
    // half the corpus carries quality 0.9, half 0.01 — the E-S draw
    // must overwhelmingly prefer the 0.9 rows; the old greatest(w, 1.0)
    // clamp flattened BOTH halves to uniform and drew ~50/50
    val df = spark.range(2000).select($"id".as("doc_id"),
      when($"id" % 2 === 0, lit(0.9)).otherwise(lit(0.01)).as("q"))
    val out = Sampling.weightedSample(df, $"doc_id", $"q", 200, "s")
    val hi = out.filter($"doc_id" % 2 === 0).count()
    assert(hi >= 180L, s"expected the 0.9-quality half to dominate, got $hi/200")
    // and zero-weight rows are never drawn ahead of positive-weight ones
    val z = spark.range(100).select($"id".as("doc_id"),
      when($"id" < 90, lit(0.5)).otherwise(lit(0.0)).as("q"))
    val zo = Sampling.weightedSample(z, $"doc_id", $"q", 90, "s")
    assert(zo.filter($"doc_id" >= 90).count() == 0L,
      "zero-weight rows drawn while positive-weight rows remained")
  }

  test("domainQualityFilter: keeps domains at/above corpus mean with min count") {
    val df = Seq.tabulate(60) { i =>
      val dom = s"d${i % 3}"
      // d0 scores high, d1 mid, d2 low
      val score = (i % 3) match { case 0 => 0.9; case 1 => 0.5; case 2 => 0.1 }
      (i.toLong, dom, score)
    }.toDF("id", "dom", "score")
    val kept = DomainFilter.domainQualityFilter(df, $"dom", $"score", minCount = 5L)
    val doms = kept.select("dom").distinct().as[String].collect().toSet
    // corpus mean = 0.5 -> d0 (0.9) and d1 (0.5, ties keep) survive
    assert(doms == Set("d0", "d1"), s"kept $doms")
    assert(kept.count() == 40L)
    assert(kept.filter($"dom" === "d0").select("domain_avg")
      .distinct().as[Double].head() == 0.9)
    // minCount prunes small domains even when high-scoring
    val plus = df.union(Seq((100L, "tiny", 1.0)).toDF("id", "dom", "score"))
    val kept2 = DomainFilter.domainQualityFilter(plus, $"dom", $"score", minCount = 5L)
    assert(!kept2.select("dom").distinct().as[String].collect().contains("tiny"))
    // partitioning-invariant (decimal sums)
    val again = DomainFilter.domainQualityFilter(df.repartition(7), $"dom", $"score", 5L)
    assert(kept.exceptAll(again).isEmpty)
  }
}
