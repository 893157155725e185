package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextFunctions.md5Long

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, sign-random-
  * projection (SRP) LSH bucketing as the scale path, and embedding-
  * space near-duplicate detection.
  *
  * Scale design:
  *   - Brute force is a broadcast nested-loop: the QUERY side is tiny
  *     (user-supplied probes) and broadcast; the corpus streams through
  *     map-side cosine + per-partition top-k (window over rank) — no
  *     corpus shuffle except the final k·|queries| rows.
  *   - SRP-LSH: each vector gets a `planes`-bit signature from
  *     deterministic pseudo-random hyperplanes (hash-derived, so no
  *     plane matrix is stored or broadcast — any executor can recompute
  *     column j of plane p from md5(p,j)). Bucketing on the signature
  *     (or signature bands) turns all-pairs search into per-bucket
  *     work, output-proportional like every LSH here.
  *   - At 100 TB the corpus side would additionally be IVF-partitioned
  *     (cluster-id bucketing) — same join shape, coarser buckets.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — explicit
    * left-fold dot products so the accumulation order is fixed and
    * portable (DuckDB's list_inner_product matches element order). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` must be small (it is broadcast); `corpus` can be
    * arbitrarily large. Ties broken by corpus id. Self-matches (same id)
    * are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** Deterministic SRP hyperplane component: ±1 for plane p, dimension
    * j, derived from md5 — no stored plane matrix. */
  private def planeSign(p: Column, j: Column): Column =
    when(md5Long(concat(p.cast(StringType), lit("_"), j.cast(StringType)), 8) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** SRP-LSH signature: `planes`-bit long; bit p = sign(v · r_p) where
    * r_p is the ±1 pseudo-random hyperplane. Pure projection. */
  def srpSignature(vec: Column, planes: Int): Column = {
    val v = asDouble(vec)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), size(v) - 1),
          j => planeSign(lit(p), j)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via SRP-LSH: bucket corpus by signature bands (each band =
    * `bandBits` consecutive signature bits; vectors sharing any band
    * with the query are candidates), then exact cosine re-rank to top-k
    * within candidates. Recall < 1 by construction; tested against
    * [[bruteForceTopK]] in SimilaritySpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planes % bandBits == 0)
    val bands = planes / bandBits
    def banded(df: DataFrame, id: String, v: String): DataFrame = {
      val sig = srpSignature(col(vecCol), planes)
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v), sig.as("sig"))
        .withColumn("band", explode(array((0 until bands).map(b =>
          concat_ws(":", lit(b),
            shiftright(col("sig"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1)))): _*)))
    }
    val q = broadcast(banded(queries, "query_id", "qv"))
    val c = banded(corpus, "neighbor_id", "cv")
    val cands = c.join(q, "band")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** Embedding-space near-duplicates: all pairs with cosine ≥ threshold.
    * Exact all-pairs (for oracle checking and modest corpora); the LSH
    * candidate cut above is the scale path. Pairs are (a < b). */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = corpus.select(col(idCol).as("a"), asDouble(col(vecCol)).as("va"))
    val r = corpus.select(col(idCol).as("b"), asDouble(col(vecCol)).as("vb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("a", "b", "sim")
  }
}
