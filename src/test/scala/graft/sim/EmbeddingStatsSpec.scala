package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  /** dim 0 separates the classes (0±0.5 vs 10±0.5), dim 1 is identical
    * noise in both classes, dim 2 is constant everywhere. */
  private def emb = (0 until 40).map { i =>
    val label = i % 2
    val jitter = if (i % 4 < 2) 0.5f else -0.5f
    (i.toLong, label, Array(label * 10f + jitter, jitter, 3f))
  }.toDF("vec_id", "label", "embedding")

  test("fisherRatio: separating dim ≫ noise dim; constant dim goes null") {
    val out = EmbeddingStats.fisherRatio(emb, col("embedding"), col("label"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).isDefined && out(1L).isDefined)
    assert(out(0L).get > 50 * out(1L).get,
      s"class-separating dimension must dominate: $out")
    assert(out(1L).get < 1e-6, "identical-noise dim has ~zero between-scatter")
    assert(out(2L).isEmpty, "constant dim (zero within-scatter) flags as null")
  }

  test("fisherRatio matches the hand-computed two-class value") {
    // class 0: {1, 3} → μ=2, within = 2; class 1: {5, 9} → μ=7, within = 8
    // global μ = 4.5; between = 2·(2−4.5)² + 2·(7−4.5)² = 25; fisher = 2.5
    val tiny = Seq((1L, 0, Array(1f)), (2L, 0, Array(3f)),
      (3L, 1, Array(5f)), (4L, 1, Array(9f)))
      .toDF("vec_id", "label", "embedding")
    val r = EmbeddingStats.fisherRatio(tiny, col("embedding"), col("label"))
      .collect().head
    assert(r.getLong(0) == 0L)
    assert(r.getDouble(1) == 25.0, s"between: $r")
    assert(r.getDouble(2) == 10.0, s"within: $r")
    assert(r.getDouble(3) == 2.5, s"fisher: $r")
  }

  test("anisotropy matches hand-computed pair means; degenerate inputs flag") {
    def mc(vecs: Seq[Array[Float]]): Option[Double] = {
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val r = EmbeddingStats.anisotropy(df, col("embedding")).collect().head
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    }
    // identical unit vectors: every pairwise cosine is 1
    assert(mc(Seq(Array(1f, 0f), Array(1f, 0f), Array(1f, 0f))).get == 1.0)
    // orthogonal pair: mean cosine 0
    assert(math.abs(mc(Seq(Array(1f, 0f), Array(0f, 1f))).get) < 1e-9)
    // antipodal pair: mean cosine -1
    assert(mc(Seq(Array(1f, 0f), Array(-1f, 0f))).get == -1.0)
    // a zero vector is excluded, leaving one usable vector → null
    assert(mc(Seq(Array(1f, 0f), Array(0f, 0f))).isEmpty)
  }

  test("anisotropy closed form equals the explicit O(n²) pair mean") {
    val vecs = (0 until 25).map(i =>
      Array.tabulate(6)(j => (math.sin(i * 3 + j) + 0.4).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = EmbeddingStats.anisotropy(df, col("embedding"))
      .collect().head.getDouble(1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val pairs = for (i <- vecs.indices; j <- vecs.indices if i != j)
      yield cos(vecs(i), vecs(j))
    val want = pairs.sum / pairs.size
    assert(math.abs(got - want) < 1e-4,
      s"closed form $got vs explicit pair mean $want")
  }

  test("fisherRatio is partitioning-invariant (decimal-sum contract)") {
    val a = EmbeddingStats.fisherRatio(emb.repartition(1),
      col("embedding"), col("label")).collect().toSeq
    val b = EmbeddingStats.fisherRatio(emb.repartition(9),
      col("embedding"), col("label")).collect().toSeq
    assert(a == b)
  }
}
