package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    // deterministic pseudo-random corpus + two planted near-dups of vec 0
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => i.toLong -> Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val planted = Seq(
      100L -> base(0)._2.map(x => x + 0.01f),
      101L -> base(0)._2.map(x => x * 1.05f))
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("cosine: exact on known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
    val sims = df.select(Similarity.cosine($"a", $"b").as("s")).as[Double].collect()
    assert(math.abs(sims(0)) < 1e-12 && math.abs(sims(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK finds planted near-dups first") {
    val q = vecs.filter($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(q, vecs, k = 3)
      .orderBy($"rk").select("neighbor_id").as[Long].collect()
    assert(top.take(2).toSet == Set(100L, 101L))
  }

  test("nearDupPairs finds planted pairs above threshold") {
    val pairs = Similarity.nearDupPairs(vecs, threshold = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)) && pairs.contains((0L, 101L)))
  }

  test("ivfTopK: centroids deterministic, planted near-dups found, recall high") {
    val cents1 = Similarity.ivfCentroids(vecs, nlist = 4)
    val cents2 = Similarity.ivfCentroids(vecs, nlist = 4)
    assert(cents1.length == 4)
    assert(cents1.zip(cents2).forall { case (a, b) => a.sameElements(b) })

    val q = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(q, vecs, k = 5, nlist = 4, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // the planted near-dup of vector 0 lands in the same (or probed)
    // cluster and must be found
    assert(approx.contains((0L, 100L)))
  }

  test("ivf store: same result as ivfTopK; scan is partition-pruned") {
    val dir = graft.util.Workspace.temp("ivf-store-spec") + "/store"
    val cents = Similarity.writeIvfStore(vecs, dir, nlist = 4)
    val q = vecs.filter($"vec_id" < 5)
    val direct = Similarity.ivfTopK(q, vecs, k = 5, nlist = 4, nprobe = 2)
      .orderBy("query_id", "rk").collect().toSeq
    val stored = Similarity.ivfStoreTopK(spark, dir, cents, q, k = 5, nprobe = 2)
      .orderBy("query_id", "rk").collect().toSeq
    assert(stored == direct)

    // the probed-cluster predicate must reach the scan as a partition
    // filter (reads nprobe/nlist of the store), not a post-scan filter
    val plan = Similarity.ivfStoreTopK(spark, dir, cents, q, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"), s"no partition pruning in:\n$plan")
  }

  test("nearDupPairsLsh: subset of exact pairs, planted near-dups survive banding") {
    val exact = Similarity.nearDupPairs(vecs, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(vecs, threshold = 0.9, planes = 16, bandBits = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // every LSH pair is exact-verified, so lsh ⊆ exact
    assert(lsh.subsetOf(exact))
    // highly-similar planted pairs collide in some band at these params
    assert(lsh.contains((0L, 100L)) && lsh.contains((0L, 101L)))
  }

  test("semanticDedup: planted near-dup group collapses to the min id; " +
    "others keep themselves") {
    val out = Similarity.semanticDedup(vecs, threshold = 0.95, nlist = 4)
      .select("vec_id", "rep", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == 62) // every vector classified
    // the planted dups (100, 101 ≈ vec 0) fold into rep 0 and drop
    assert(byId(0L) == ((0L, 0L, true)))
    assert(byId(100L) == ((100L, 0L, false)))
    assert(byId(101L) == ((101L, 0L, false)))
    // everything else is its own representative
    assert(out.filter(r => !Set(0L, 100L, 101L)(r._1)).forall(r => r._2 == r._1 && r._3))
  }

  test("pqTopK: codes well-formed; topC >= corpus equals brute force exactly; recall finds planted dups") {
    val corpus = vecs // dim 16
    val queries = corpus.filter(col("vec_id") === 0L)
    // encode shape: m codes per row, each within [0, ksub)
    val books = Similarity.pqCodebooks(corpus, m = 4, ksub = 8)
    assert(books.length == 4 && books.forall(_.length == 8)
      && books.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(corpus, books).select("codes")
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // with topC covering the whole corpus the ADC ordering is irrelevant
    // and the exact re-rank must reproduce brute force EXACTLY
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val viaPq = Similarity.pqTopK(queries, corpus, k = 5, m = 4, ksub = 8, topC = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(viaPq.sortBy(_._4).toSeq == exact.sortBy(_._4).toSeq)
    // realistic topC: the planted near-dups of vec 0 must survive the
    // ADC cut and rank first
    val ann = Similarity.pqTopK(queries, corpus, k = 5, m = 4, ksub = 8, topC = 10)
      .orderBy("rk").collect().map(_.getLong(1))
    assert(ann.take(2).toSet == Set(100L, 101L),
      s"planted near-dups must top the PQ ranking, got ${ann.toSeq}")
  }

  test("ivfPqTopK: full probe equals pqTopK exactly; pruned probe keeps planted dups") {
    val corpus = vecs
    val queries = corpus.filter(col("vec_id") === 0L)
    // nprobe = nlist → candidate set is the whole corpus → the
    // composition must reproduce flat PQ exactly
    val flat = Similarity.pqTopK(queries, corpus, k = 5, m = 4, ksub = 8, topC = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._3)
    val full = Similarity.ivfPqTopK(queries, corpus, k = 5,
        nlist = 8, nprobe = 8, m = 4, ksub = 8, topC = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(_._3)
    assert(full.toSeq == flat.toSeq)
    // realistic pruning: the planted near-dups share vec 0's coarse
    // cluster, so they survive a 4-of-8 probe and top the ranking
    val pruned = Similarity.ivfPqTopK(queries, corpus, k = 5,
        nlist = 8, nprobe = 4, m = 4, ksub = 8, topC = 20)
      .orderBy("rk").collect().map(_.getLong(1))
    assert(pruned.take(2).toSet == Set(100L, 101L),
      s"planted dups must survive prune+compress, got ${pruned.toSeq}")
  }

  test("ivfPqStoreTopK: store layout equals in-memory composition; codes-only pruned first pass") {
    val corpus = vecs
    val queries = corpus.filter(col("vec_id") < 2L)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-store").toString + "/store"
    val (cents, books) = Similarity.writeIvfPqStore(corpus, dir,
      nlist = 8, m = 4, ksub = 8)
    val store = Similarity.ivfPqStoreTopK(spark, dir, cents, books,
      queries, k = 5, nprobe = 4, topC = 20)
    val mem = Similarity.ivfPqTopK(queries, corpus, k = 5,
        nlist = 8, nprobe = 4, m = 4, ksub = 8, topC = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(store.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq == mem.sortBy(t => (t._1, t._4)).toSeq,
      "the at-rest layout must reproduce the in-memory composition exactly")
    // plan shape: both scans prune to probed clusters; the ADC pass
    // reads codes WITHOUT the vector column (the compression is real)
    val plan = store.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.exists(s => s.contains("codes") && !s.contains("embedding")),
      s"ADC pass must read codes only, scans:\n${scans.mkString("\n")}")
    assert(plan.contains("PartitionFilters: [cluster")
      || plan.linesIterator.exists(l =>
        l.trim.startsWith("PartitionFilters:") && l.contains("cluster")),
      s"store scans must prune by cluster, plan:\n$plan")
  }

  test("clusterBalancedSample: at most cap per cluster, deterministic, rare clusters kept whole") {
    val s1 = Similarity.clusterBalancedSample(vecs, nlist = 8, cap = 2)
    val perCluster = s1.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCluster.values.forall(_ <= 2L),
      s"no cluster may exceed the cap, got $perCluster")
    // clusters with <= cap members are kept whole (trim modes, keep tails)
    val full = Similarity.assignCluster(vecs, Similarity.ivfCentroids(vecs, 8))
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    full.filter(_._2 <= 2L).foreach { case (c, n) =>
      assert(perCluster.getOrElse(c, 0L) == n,
        s"cluster $c has $n <= cap members and must be kept whole")
    }
    // md5-keyed: identical output on a re-run (no rand())
    val ids1 = s1.select("vec_id").as[Long].collect().sorted.toSeq
    val ids2 = Similarity.clusterBalancedSample(vecs, nlist = 8, cap = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("srp signature deterministic; lshTopK recall vs brute force is high") {
    val sig1 = vecs.select(Similarity.srpSignature($"embedding", 16).as("s"))
      .as[Long].collect()
    val sig2 = vecs.select(Similarity.srpSignature($"embedding", 16).as("s"))
      .as[Long].collect()
    assert(sig1.toSeq == sig2.toSeq)

    val q = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, vecs, k = 5, planes = 16, bandBits = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // the planted near-dup must survive LSH bucketing for query 0
    assert(approx.contains((0L, 100L)))
  }

  test("ivfCentroids: Lloyd steps reduce distortion, stay partition-invariant") {
    val emb = vecs
    def distortion(cents: Array[Array[Double]]): Double =
      Similarity.assignCluster(emb, cents)
        .select(posexplode($"__v").as(Seq("pos", "x")), $"cluster")
        .collect().groupBy(r => (r.getInt(2), r.getInt(0)))
        .map { case ((c, pos), rows) =>
          rows.map(r => math.pow(r.getDouble(1) - cents(c)(pos), 2)).sum }
        .sum
    val c0 = Similarity.ivfCentroids(emb, nlist = 4, lloydSteps = 0)
    val c1 = Similarity.ivfCentroids(emb, nlist = 4, lloydSteps = 1)
    val c3 = Similarity.ivfCentroids(emb, nlist = 4, lloydSteps = 3)
    // k-means monotonicity: each step's means minimize within-cluster
    // SSE for the previous assignment
    val (d0, d1, d3) = (distortion(c0), distortion(c1), distortion(c3))
    assert(d1 <= d0 + 1e-9 && d3 <= d1 + 1e-9, s"distortion rose: $d0 $d1 $d3")
    // default is one step — the oracle contract
    assert(Similarity.ivfCentroids(emb, nlist = 4).map(_.toSeq).toSeq ==
      c1.map(_.toSeq).toSeq)
    // decimal-exact sums ⇒ identical centroids under any partitioning
    val c3b = Similarity.ivfCentroids(emb.repartition(7), nlist = 4, lloydSteps = 3)
    assert(c3b.map(_.toSeq).toSeq == c3.map(_.toSeq).toSeq)
  }

  test("recallAtK: exhaustive IVF probe (nprobe = nlist) recalls exactly 1.0") {
    val emb = vecs
    val q = emb.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
    val full = Similarity.ivfTopK(q, emb, k = 5, nlist = 4, nprobe = 4)
    val r = Similarity.recallAtK(exact, full, k = 5)
      .select("recall").as[Double].collect()
    assert(r.length == 4 && r.forall(_ == 1.0),
      s"probing every list must equal the exact baseline, got ${r.toSeq}")
    // and a partial probe can only lose, never gain
    val part = Similarity.ivfTopK(q, emb, k = 5, nlist = 4, nprobe = 1)
    val rp = Similarity.recallAtK(exact, part, k = 5)
      .select("recall").as[Double].collect()
    assert(rp.forall(_ <= 1.0))
  }

  test("recallAtK: PQ with corpus-wide re-rank recalls exactly 1.0") {
    // topC >= corpus: ADC only ORDERS candidates, the exact re-rank
    // sees every row — compression cannot lose a true neighbor
    val emb = vecs
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
    val pq = Similarity.pqTopK(q, emb, k = 5, topC = 1000)
    val r = Similarity.recallAtK(exact, pq, k = 5)
      .select("recall").as[Double].collect()
    assert(r.length == 3 && r.forall(_ == 1.0),
      s"corpus-wide re-rank must equal the exact baseline, got ${r.toSeq}")
  }

  test("int8TopK: corpus-wide topC equals brute force; tight topC keeps high recall") {
    val emb = Similarity.quantizeInt8(vecs)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5)
    // topC >= corpus: the coarse pass only ORDERS candidates — the
    // exact re-rank sees every row, so quantization cannot lose a
    // true neighbor and the result is the brute-force result
    val wide = Similarity.int8TopK(q, emb, k = 5, topC = 1000)
    val r = Similarity.recallAtK(exact, wide, k = 5)
      .select("recall").as[Double].collect()
    assert(r.length == 3 && r.forall(_ == 1.0),
      s"corpus-wide int8 re-rank must equal the exact baseline, got ${r.toSeq}")
    // returned sims are the EXACT float cosines, not quantized ones
    val exactSims = exact.select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    wide.select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .foreach { case (qid, nid, s) => assert(exactSims((qid, nid)) == s) }
    // a tight coarse cut still recalls well (int8 error ≤ scale/2/dim)
    val tight = Similarity.int8TopK(q, emb, k = 5, topC = 8)
    val rt = Similarity.recallAtK(exact, tight, k = 5)
      .select("recall").as[Double].collect()
    assert(rt.forall(_ >= 0.8), s"tight topC recall too low: ${rt.toSeq}")
  }

  test("recallAtK: per-query intersection over the exact baseline") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L),
      (3L, 20L), (3L, 21L), (3L, 22L), (3L, 23L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), // all 4
      (2L, 10L), (2L, 99L), // 1 of 4 (99 is a miss, not in exact)
      (3L, 50L)) // 0 of 4
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx, k = 4)
      .orderBy($"query_id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 0.25), (3L, 0.0)))
    // duplicate approx rows must not double-count
    val got2 = Similarity.recallAtK(exact, approx.union(approx), k = 4)
      .orderBy($"query_id").as[(Long, Double)].collect().toSeq
    assert(got2 == got)
  }

  test("semanticContamination: argmax eval, tie-break, flag, zero-norm drop") {
    val evalSet = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f))) // duplicate direction of eval 1
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2f, 0f, 0f, 0f)),   // parallel to eval 1 AND 3 -> tie, keep 1
      (11L, Array(0f, 0.1f, 0f, 0f)), // parallel to eval 2
      (12L, Array(0f, 0f, 1f, 1f)),   // orthogonal to all -> sim 0
      (13L, Array(0f, 0f, 0f, 0f)))   // zero norm -> dropped
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(corpus, evalSet, threshold = 0.9)
      .orderBy($"vec_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, 1L, 1.0, true),
      (11L, 2L, 1.0, true),
      (12L, 1L, 0.0, false)), s"got $got")
    // partitioning-invariant (aggregate-form argmax)
    val again = Similarity.semanticContamination(
      corpus.repartition(5), evalSet, threshold = 0.9)
      .orderBy($"vec_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(again == got)
  }

  test("semanticContaminationIvf: exhaustive probe equals the exact report") {
    val all = vecs
    val evalSet = all.filter($"vec_id" % 5 === 0)
    val corpus = all.filter($"vec_id" % 5 =!= 0)
    // nprobe = nlist → every eval list probed → identical to the
    // broadcast-exact operator (the q38/q87 exhaustive-probe identity)
    val ivf = Similarity.semanticContaminationIvf(corpus, evalSet,
      threshold = 0.8, nlist = 4, nprobe = 4)
    val exact = Similarity.semanticContamination(corpus, evalSet, threshold = 0.8)
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty)
    // tight probe: a subset report, never a contradictory one — every
    // reported max_sim is a real pair the exact report can only equal
    // or beat
    val tight = Similarity.semanticContaminationIvf(corpus, evalSet,
      threshold = 0.8, nlist = 4, nprobe = 1)
      .select($"vec_id", $"max_sim").as[(Long, Double)].collect().toMap
    val exactMap = exact.select($"vec_id", $"max_sim").as[(Long, Double)].collect().toMap
    assert(tight.forall { case (id, s) => exactMap(id) >= s })
    // the planted near-dup of vec 0 that lands on the corpus side
    // (id 101; 0 and 100 are eval) is flagged even at nprobe 1 — the
    // leak sits in its eval point's own list
    assert(tight(101L) > 0.99, s"tight=${tight.get(101L)}")
  }
}
