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

  /** Left-fold dot product — accumulation order is fixed and portable
    * (the DuckDB oracle folds in the same order → identical doubles). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Native-kernel dot (codegen'd [[graft.plans.DotProductExpr]], same
    * accumulation order → bit-identical to [[dot]]); falls back to the
    * declarative fold on sessions without GraftExtensions. */
  private def fastDot(df: DataFrame)(x: Column, y: Column): Column =
    if (df.sparkSession.catalog.functionExists("graft_dot"))
      call_function("graft_dot", x, y)
    else dot(x, y)

  /** Cosine similarity between two array<double> columns. Hot paths
    * stage per-row norms once (see [[withVecNorm]]) instead. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Stage (id, vector, norm) — the norm is computed once per row here,
    * not once per candidate pair (interpreted higher-order functions
    * re-evaluate inlined subtrees, so pair-side norms would cost a full
    * dot per pair per side). Also raises partition count for the
    * compute-bound scoring when the source is a single small file. */
  private def withVecNorm(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String,
      spread: Boolean = true): DataFrame = {
    // spread BEFORE staging so the norm computation parallelizes too;
    // spread=false for query sides that are about to be broadcast (a
    // repartition shuffle before a broadcast collect is pure waste)
    val src = if (spread) graft.util.Spread(df) else df
    src.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
      .withColumn(normAs, sqrt(fastDot(df)(col(vecAs), col(vecAs))))
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` must be small (it is broadcast); `corpus` can be
    * arbitrarily large. Ties broken by corpus id. Self-matches (same id)
    * are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withVecNorm(queries, idCol, vecCol, "query_id", "qv", "qn", spread = false))
    val c = withVecNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(fastDot(corpus)(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** Deterministic SRP hyperplane component: ±1 for plane p, dimension
    * j, derived from md5(p_j) — the plane "matrix" is a pure function,
    * so any process regenerates it bit-identically (no broadcast state).
    * Computed driver-side once and embedded as literals: per-row hash
    * evaluation would recompute row-constant values. */
  private[graft] def planeSign(p: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$j".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(h, 16) % 2 == 0) 1.0 else -1.0
  }

  /** SRP-LSH signature: `planes`-bit long; bit p = sign(v · r_p) where
    * r_p is the ±1 pseudo-random hyperplane. Pure projection; `vec`
    * must be a staged array<double> column (hot-path contract). `dims`
    * caps the plane literals; extra vector dimensions are ignored,
    * which keeps signatures stable if dims grow. */
  def srpSignature(vec: Column, planes: Int, dims: Int = 64): Column = {
    val bits = (0 until planes).map { p =>
      val signs = array((0 until dims).map(j => lit(planeSign(p, j))): _*)
      // slice to the vector's length: zip_with pads the shorter side
      // with nulls, which would poison the fold for dims < `dims`
      val proj = aggregate(
        zip_with(vec, slice(signs, lit(1), size(vec)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Explode a signature column into its LSH band keys ("b:val"). */
  private def withSrpBands(df: DataFrame, planes: Int, bandBits: Int): DataFrame = {
    require(planes % bandBits == 0)
    df.withColumn("band", explode(array((0 until planes / bandBits).map(b =>
      concat_ws(":", lit(b),
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1)))): _*)))
  }

  /** ANN via SRP-LSH: bucket corpus by signature bands (each band =
    * `bandBits` consecutive signature bits; vectors sharing any band
    * with the query are candidates), then exact cosine re-rank to top-k
    * within candidates. Recall < 1 by construction; tested against
    * [[bruteForceTopK]] in SimilaritySpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def banded(df: DataFrame, id: String, v: String, n: String): DataFrame =
      withSrpBands(withVecNorm(df, idCol, vecCol, id, v, n)
        .withColumn("sig", srpSignature(col(v), planes)), planes, bandBits)
    val q = broadcast(banded(queries, "query_id", "qv", "qn"))
    val c = banded(corpus, "neighbor_id", "cv", "cn")
    val cands = c.join(q, "band")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn").distinct()
      .withColumn("sim", round(fastDot(corpus)(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** recall@k of an approximate top-k result against the exact one —
    * the eval harness every ANN deployment needs before trusting a
    * parameter choice (planes/bandBits, nlist/nprobe, PQ m×bits) at
    * scale: run both on a SAMPLE of queries, read the recall, then
    * point the tuned operator at the full corpus.
    *
    * Both inputs are `(query_id, neighbor_id)`-shaped frames (extra
    * columns ignored). Per query: |approx ∩ exact| / k — counted over
    * the exact side, so recall is against the true top-k even when the
    * approximate side returned fewer than k rows. Queries with zero
    * hits still appear (left join), recall 0.
    *
    * Scale: both sides are query-sample-sized (k rows per sampled
    * query), so the join and the per-query count are driver-trivial
    * regardless of corpus size — the expensive part is producing the
    * exact baseline, which is precisely why it runs on a sample. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
      .withColumn("__hit", lit(1))
    // distinct BOTH sides: duplicate (query_id, neighbor_id) rows on the
    // exact side would each count as a hit and push recall past 1.0.
    exact.select(col("query_id"), col("neighbor_id")).distinct()
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(least(count(col("__hit")).cast(DoubleType) / k, lit(1.0)).as("recall"))
  }

  /** Per-vector int8 quantization — the standard embeddings-at-rest
    * format between full precision and PQ: one float scale plus an
    * int8 per dimension (4× smaller than float32, 8× than float64,
    * exactly invertible bookkeeping). `scale = max|v_i| / 127`,
    * `code_i = round(v_i / scale)` — so every |code| ≤ 127 and the
    * reconstruction error per dimension is ≤ scale/2 by construction.
    * A zero vector gets scale 0 and zero codes.
    *
    * Shuffle-free map pass; dequantization is `code_i · scale`.
    * Downstream ANN can score int8 directly (integer dot ×
    * scale_a·scale_b ≈ float dot) or dequantize for exact re-rank. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
      scaleCol: String = "scale", codesCol: String = "codes"): DataFrame = {
    val v = asDouble(col(vecCol))
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = when(maxAbs > 0, maxAbs / 127).otherwise(lit(0.0))
    df.withColumn(scaleCol, scale)
      .withColumn(codesCol, when(col(scaleCol) > 0,
          transform(v, x => round(x / col(scaleCol)).cast("int")))
        .otherwise(transform(v, _ => lit(0))))
  }

  /** Dequantized vector from [[quantizeInt8]] output. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast(DoubleType) * scale)

  /** ANN over the int8 at-rest format ([[quantizeInt8]]): pass 1 ranks
    * every candidate on the integer CODES alone — the per-vector
    * scales cancel in the cosine, so the coarse score is
    * `intdot / sqrt(qq·cc)`, pure integer arithmetic off a codes-only
    * columnar scan (the 4× at-rest saving becoming 4× less scan I/O;
    * plan-asserted in PlanShapeSpec for the store read) — keeping
    * `topC` per query; pass 2 re-ranks only those survivors with the
    * exact float cosine. Coarse-rank error is bounded by the
    * quantization error (≤ scale/2 per dimension), so `topC > k`
    * absorbs it; the exact scores of the returned rows are identical
    * to [[bruteForceTopK]]'s for the same pairs.
    *
    * Determinism: all code dots are exact integers represented in
    * doubles (|dot| ≤ dims·127² ≪ 2⁵³), so the coarse scores replay
    * bit-for-bit in any engine; both ranks round to 6 decimals and
    * break ties by id.
    *
    * `queries`/`corpus` carry codes + the float vector (a
    * [[quantizeInt8]] frame or its store read back). At 100 TB pass 1
    * composes with IVF: cluster-partition the codes store and this
    * scan prunes to probed clusters as well. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, k: Int, topC: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codesCol: String = "codes"): DataFrame = {
    require(topC >= k, s"topC ($topC) must be >= k ($k)")
    def codesStage(df: DataFrame, idAs: String, cAs: String, nAs: String,
        spread: Boolean) = {
      val src = if (spread) graft.util.Spread(df) else df
      src.select(col(idCol).as(idAs), asDouble(col(codesCol)).as(cAs))
        .withColumn(nAs, fastDot(df)(col(cAs), col(cAs)))
    }
    val q = broadcast(codesStage(queries, "query_id", "qc", "qq", spread = false))
    val c = codesStage(corpus, "neighbor_id", "cc", "ccn", spread = true)
    // zero-code vectors (scale 0) have no direction — score 0, same
    // guard as the quantizer's
    val coarse = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("iscore", when(col("qq") > 0 && col("ccn") > 0,
          round(fastDot(corpus)(col("qc"), col("cc")) /
            sqrt(col("qq") * col("ccn")), 6))
        .otherwise(lit(0.0)))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("iscore").desc, col("neighbor_id"))
    val cands = coarse.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= topC)
      .select(col("query_id"), col("neighbor_id"))
    // pass 2: the float vectors are touched only through the broadcast
    // candidate join — nq·topC rows, never the corpus
    val qf = broadcast(withVecNorm(queries, idCol, vecCol, "query_id", "qv", "qn",
      spread = false))
    val cf = withVecNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cnrm")
    val exact = broadcast(cands)
      .join(cf, "neighbor_id")
      .join(qf, "query_id")
      .withColumn("sim",
        round(fastDot(corpus)(col("qv"), col("cv")) / (col("qn") * col("cnrm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** IVF (inverted-file) coarse quantizer: `nlist` centroids taken
    * deterministically from the corpus (rows with the smallest
    * md5(vec_id) — an unbiased pseudo-random sample reproducible on any
    * executor), refined with one Lloyd iteration driver-side. Centroids
    * are small (nlist × dims doubles) and live as plan literals — no
    * broadcast state, no model file.
    *
    * At 100 TB this is THE similarity-search shape: the corpus is
    * partitioned (bucketed/clustered on `cluster`) once at ingest, and
    * a query probes `nprobe` inverted lists instead of the whole
    * corpus — the same join pattern as the LSH path but with
    * data-adaptive buckets. */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      lloydSteps: Int = 1): Array[Array[Double]] = {
    require(lloydSteps >= 0, s"lloydSteps must be >= 0, got $lloydSteps")
    val seeds = corpus
      .select(asDouble(col(vecCol)).as("v"),
        md5Long(col(idCol).cast(StringType), 15).as("h"))
      .orderBy(col("h")).limit(nlist)
      .collect().map(_.getSeq[Double](0).toArray)
    // Lloyd steps, DISTRIBUTED: per-(cluster, dim) means via groupBy —
    // only nlist×dims aggregate rows reach the driver, never the
    // corpus vectors (collecting them would cap corpus size at driver
    // memory). Decimal-exact sums keep centroids deterministic across
    // partitionings (double partial-avg is order-dependent), so the
    // result is a pure function of (corpus, nlist, lloydSteps) and the
    // default steps=1 stays bit-identical to what every oracle
    // replays. More steps = k-means proper (each is one corpus pass;
    // distortion is non-increasing — see SimilaritySpec).
    (0 until lloydSteps).foldLeft(seeds)((cents, _) =>
      lloydStep(corpus, cents, idCol, vecCol))
  }

  /** One distributed Lloyd iteration: assign, then per-(cluster, dim)
    * decimal-exact means. An emptied cluster keeps its centroid. */
  private def lloydStep(corpus: DataFrame, cents: Array[Array[Double]],
      idCol: String, vecCol: String): Array[Array[Double]] = {
    val means = assignCluster(corpus, cents, idCol, vecCol)
      .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg((sum(col("x").cast(DecimalType(30, 15))).cast(DoubleType) /
        count(lit(1))).as("m"))
      .collect()
    val byCluster = means.groupBy(_.getInt(0))
    cents.indices.map { c =>
      byCluster.get(c) match {
        case Some(rows) =>
          val mean = cents(c).clone()
          rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2))
          mean
        case None => cents(c)
      }
    }.toArray
  }

  /** Assign each vector to its nearest centroid (max v·c − ‖c‖²/2 ≡ min
    * L2 distance). Centroids are literals → pure codegen-able
    * projection, no shuffle. Output keeps the staged vector as `__v`. */
  def assignCluster(df: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("cluster", nearestCluster(df, centroids, col("__v")))

  /** Cluster-BALANCED deterministic sample — the diversity-balancing
    * step a curation pipeline runs after semantic dedup: assign every
    * embedding to its IVF cluster, then keep at most `cap` rows per
    * cluster by the md5-ranked deterministic order
    * ([[graft.curation.Sampling.stratifiedCap]]) — over-represented
    * modes are trimmed, rare modes are kept whole, and the sample is
    * identical on any cluster, partitioning, or retry. Cost: one
    * corpus projection for assignment (centroids are metadata
    * literals — no join) and one window over (id, cluster) rows; the
    * embedding column never rides the shuffle. */
  def clusterBalancedSample(corpus: DataFrame, nlist: Int, cap: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    graft.curation.Sampling.stratifiedCap(
      assignCluster(corpus, cents, idCol, vecCol)
        .select(col(idCol), col("cluster")),
      Seq("cluster"), col(idCol), cap)
  }

  /** Index of the nearest centroid to `v` (max v·c − ‖c‖²/2; ties →
    * larger index via the greatest-struct comparison) — shared by the
    * coarse assignment and the IVF-PQ composition. */
  private[sim] def nearestCluster(df: DataFrame, centroids: Array[Array[Double]],
      v: Column): Column = {
    val best = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      val half = c.map(x => x * x).sum / 2.0
      struct((fastDot(df)(v, cLit) - lit(half)).as("s"), lit(i).as("c"))
    }
    greatest(best.toIndexedSeq: _*).getField("c")
  }

  /** Query side of IVF: rank ALL centroids per query, explode the
    * `nprobe` nearest as (query_id, qv, qn, cluster) probe rows. */
  private[sim] def probeQueries(queries: DataFrame, cents: Array[Array[Double]],
      nprobe: Int, idCol: String, vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(fastDot(queries)(col("qv"), col("qv"))))
      .withColumn("cluster", explode(array({
        val scored = cents.zipWithIndex.map { case (cc, i) =>
          val cLit = array(cc.map(lit): _*)
          val half = cc.map(x => x * x).sum / 2.0
          struct((fastDot(queries)(col("qv"), cLit) - lit(half)).as("s"), lit(i).as("c"))
        }
        // top-nprobe centroids via array sort of (score, idx) structs
        val arr = array_sort(array(scored.toIndexedSeq: _*),
          (a, b) => when(a.getField("s") > b.getField("s"), -1)
            .when(a.getField("s") < b.getField("s"), 1).otherwise(0))
        (0 until nprobe).map(i => element_at(arr, i + 1).getField("c"))
      }: _*)))

  /** Exact cosine rerank of (cluster-joined) candidates to top-k. */
  private def rerank(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
  }

  /** ANN via IVF: bucket the corpus by nearest centroid, probe the
    * query's `nprobe` nearest lists, exact-rerank within them. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val c = assignCluster(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__v").as("cv"), col("cluster"))
      .withColumn("cn", sqrt(fastDot(corpus)(col("cv"), col("cv"))))
    val cands = c.join(broadcast(probeQueries(queries, cents, nprobe, idCol, vecCol)), "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(fastDot(corpus)(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    rerank(cands, k)
  }

  /** Write the corpus as an IVF-partitioned store: one directory
    * partition per coarse cluster. THE 100 TB layout — the expensive
    * clustering pass runs once at ingest; every subsequent ANN query
    * prunes to its probed partitions at the SCAN (PartitionFilters),
    * reading ~nprobe/nlist of the data. Returns the centroids (plan
    * literals; regenerate any time with [[ivfCentroids]] — they are
    * deterministic). */
  def writeIvfStore(corpus: DataFrame, dir: String, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    assignCluster(corpus, cents, idCol, vecCol)
      .select(col(idCol), col("__v").as(vecCol), col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    cents
  }

  /** ANN over an IVF-partitioned store written by [[writeIvfStore]]:
    * the probed-cluster filter is a partition-column predicate, so the
    * scan reads ONLY those directories. Same candidates → same result
    * as [[ivfTopK]] with the same centroids. */
  def ivfStoreTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      cents: Array[Array[Double]], queries: DataFrame, k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = probeQueries(queries, cents, nprobe, idCol, vecCol)
    // probed clusters: metadata-sized (≤ queries × nprobe) driver list
    val probed = probes.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSeq
    val store = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed: _*)) // → PartitionFilters
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cluster"))
      .withColumn("cn", sqrt(fastDot(queries)(col("cv"), col("cv"))))
    val cands = store.join(broadcast(probes), "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(fastDot(queries)(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    rerank(cands, k)
  }

  // ---- Product quantization (compressed ADC scan + exact re-rank) ----

  /** PQ codebooks: the vector split into `m` equal subvectors, each
    * with its own `ksub`-codeword codebook trained exactly like
    * [[ivfCentroids]] (the same md5-seeded rows, one decimal-exact
    * Lloyd step — per subvector slice), so codebooks are deterministic
    * and oracle-replayable. `codebooks(j)(c)` is subvector j's
    * codeword c.
    *
    * 100 TB role: PQ COMPRESSES the ANN scan — a d-dim float column
    * (4d B/row) becomes m small codes (m B/row; 64× at d=64, m=4), so
    * the first-pass scan reads codes and does m table lookups per row
    * instead of streaming full vectors — where IVF
    * ([[writeIvfStore]]) PRUNES the scan to probed lists. Production
    * systems compose the two (IVF-PQ); here each is verified
    * independently and composes through the same cluster column. */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    // ONE seed pass (the md5-smallest rows, full vectors — sliced per
    // subvector on the driver) and ONE combined Lloyd job for all m
    // codebooks: per-sub training would rescan the corpus m times for
    // byte-identical seed sorts. Values are identical to m independent
    // [[ivfCentroids]] runs on the slices (same seed rows, same
    // assignment expression, decimal sums are order-exact), which is
    // what the q70 oracle replays.
    val seedRows = corpus
      .select(asDouble(col(vecCol)).as("v"),
        graft.text.TextFunctions.md5Long(col(idCol).cast(StringType), 15).as("h"))
      .orderBy(col("h")).limit(ksub)
      .collect().map(_.getSeq[Double](0).toArray)
    val d = seedRows.head.length
    require(d % m == 0, s"dims $d must divide into $m subvectors")
    val sub = d / m
    val seedSubs: Array[Array[Array[Double]]] =
      (0 until m).map(j => seedRows.map(_.slice(j * sub, (j + 1) * sub))).toArray
    val staged = corpus.select(asDouble(col(vecCol)).as("__v"))
    val withSubs = staged.select((0 until m).map(j =>
      slice(col("__v"), j * sub + 1, sub).as(s"__sv$j")): _*)
    val perSub = (0 until m).map { j =>
      struct(lit(j).as("j"),
        nearestCluster(corpus, seedSubs(j), col(s"__sv$j")).as("c"),
        col(s"__sv$j").as("v"))
    }
    val means = withSubs.select(explode(array(perSub: _*)).as("e"))
      .select(col("e.j").as("j"), col("e.c").as("c"),
        posexplode(col("e.v")).as(Seq("pos", "x")))
      .groupBy(col("j"), col("c"), col("pos"))
      .agg((sum(col("x").cast(DecimalType(30, 15))).cast(DoubleType) /
        count(lit(1))).as("mn"))
      .collect()
    // empty codeword → seed fallback (rows simply absent for it)
    val books = seedSubs.map(_.map(_.clone()))
    means.foreach(r =>
      books(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    books
  }

  /** Encode each vector as its per-subvector nearest-codeword ids: a
    * pure projection over ksub·m literal scores (codegen'd; ties →
    * larger code, the [[assignCluster]] convention). Keeps the staged
    * vector as `__v` — the store writes codes AND vector; scans read
    * only the codes column (columnar pruning is what realizes the
    * compression). */
  def pqEncode(df: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val staged = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
    val withSubs = staged.select(col("*") +: (0 until m).map(j =>
      slice(col("__v"), j * sub + 1, sub).as(s"__sv$j")): _*)
    val codes = (0 until m).map(j =>
      nearestCluster(df, codebooks(j), col(s"__sv$j")))
    withSubs.withColumn("codes", array(codes: _*))
      .drop((0 until m).map(j => s"__sv$j"): _*)
  }

  /** ANN via PQ asymmetric distance computation: per query, a lookup
    * table `table(j)(c) = q_j·c − ‖c‖²/2` (the same inner-product
    * ranking form as the IVF probe) is computed ON THE DRIVER (m·ksub
    * doubles — metadata) and baked into the scan as literals; the
    * corpus scan then costs m `element_at` lookups per row — never a
    * full-vector dot — to rank candidates. The `topC` best ADC
    * candidates per query are exact-reranked to cosine top-k: recall
    * comes from topC ≫ k, precision is exact. With `topC` ≥ corpus
    * size the result equals [[bruteForceTopK]] exactly (spec-pinned).
    *
    * Queries are collected to the driver (their tables become plan
    * literals) — ANN query batches are driver-bounded by contract,
    * like the centroid literals everywhere else in this family. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, m: Int = 4,
      ksub: Int = 16, topC: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val books = pqCodebooks(corpus, m, ksub, idCol, vecCol)
    val encoded = pqEncode(corpus, books, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__v").as("cv"), col("codes"))
    // one corpus scan for ALL queries (full scan — IVF-PQ prunes it)
    val qFrame = adcQueryFrame(queries, books, idCol, vecCol, probe = None)
    adcRerank(encoded.crossJoin(qFrame), books.length, topC, k)
  }

  /** IVF-PQ: the production ANN composition — the coarse quantizer
    * PRUNES the scan to each query's `nprobe` inverted lists, PQ
    * COMPRESSES the surviving rows to m code lookups, and the `topC`
    * ADC candidates are exact-reranked. With `nprobe = nlist` the
    * candidate set is the whole corpus and the result equals
    * [[pqTopK]] exactly (spec-pinned); over a [[writeIvfStore]]-style
    * cluster-partitioned store of (id, codes, vector), the probe is a
    * PartitionFilters-pruned scan that reads only the codes column —
    * prune × compress is what makes billion-vector ANN interactive. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 4, ksub: Int = 16,
      topC: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val books = pqCodebooks(corpus, m, ksub, idCol, vecCol)
    val clustered = pqEncode(corpus, books, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__v").as("cv"), col("codes"))
      .withColumn("cluster", nearestCluster(corpus, cents, col("cv")))
    // each neighbor lives in exactly ONE cluster, so the probe join
    // cannot duplicate (query, neighbor) pairs
    val qFrame = adcQueryFrame(queries, books, idCol, vecCol,
      probe = Some((cents, nprobe)))
    adcRerank(clustered.join(qFrame, "cluster"), books.length, topC, k)
  }

  /** IVF-PQ AT REST: write the corpus as (id, codes, vector)
    * partitioned by coarse cluster — [[writeIvfStore]]'s layout plus
    * the PQ codes column. The expensive passes (centroid + codebook
    * training, encoding) run ONCE at ingest; queries then pay a
    * partition-pruned, codes-only scan ([[ivfPqStoreTopK]]). Returns
    * (centroids, codebooks) — deterministic, regenerable any time from
    * the same corpus. */
  def writeIvfPqStore(corpus: DataFrame, dir: String, nlist: Int = 16,
      m: Int = 4, ksub: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val books = pqCodebooks(corpus, m, ksub, idCol, vecCol)
    pqEncode(corpus, books, idCol, vecCol)
      .select(col(idCol), col("codes"), col("__v").as(vecCol))
      .withColumn("cluster", nearestCluster(corpus, cents, col(vecCol)))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    (cents, books)
  }

  /** ANN over an IVF-PQ store — the full 100 TB read path: the query's
    * `nprobe` lists are pruned at the SCAN (PartitionFilters) and the
    * first pass reads ONLY the codes column (ReadSchema excludes the
    * vector — PQ's compression realized as columnar pruning, m bytes
    * per row instead of 4·d). The `topC` ADC survivors per query
    * (output-sized) broadcast back into a second pruned scan that
    * fetches just their vectors for the exact re-rank. Same probe,
    * same candidates, same folds → identical to [[ivfPqTopK]] with the
    * same centroids/codebooks (spec-pinned), so the q71 oracle is
    * exact for this layout too. */
  def ivfPqStoreTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      queries: DataFrame, k: Int, nprobe: Int = 4, topC: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val qFrame = adcQueryFrame(queries, books, idCol, vecCol,
      probe = Some((cents, nprobe)))
    // probed clusters: metadata-sized (≤ queries × nprobe) driver list
    val probed = qFrame.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSeq
    // pass 1: codes-only pruned scan; neither vector column is read
    val codesScan = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed: _*)) // → PartitionFilters
      .select(col(idCol).as("neighbor_id"), col("codes"), col("cluster"))
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__qtab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id"))
    // arrays (query table, query vector, codes) are all dropped before
    // the topC window so nothing wide rides its shuffle
    val top = codesScan.join(qFrame, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adc)
      .select(col("query_id"), col("neighbor_id"), col("__adc"))
      .withColumn("__cr", row_number().over(wC))
      .filter(col("__cr") <= topC)
      .select(col("query_id"), col("neighbor_id"))
    val qVecs = qFrame.select(col("query_id"), col("qv"), col("qn"))
      .dropDuplicates("query_id")
    // pass 2: fetch the survivors' vectors — candidate-gated, pruned
    val fetched = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(top), "neighbor_id")
      .join(broadcast(qVecs), "query_id")
    val scored = fetched.withColumn("sim",
      round(fastDot(queries)(col("qv"), col("cv")) /
        (col("qn") * sqrt(fastDot(queries)(col("cv"), col("cv")))), 6))
    rerank(scored, k)
  }

  /** Broadcastable query frame for the ADC scan, built from ONE
    * evaluation of `queries` (a nondeterministic query frame — a
    * sample, an unordered limit — must not yield different rows to the
    * table builder and the scan): original-typed id, staged vector,
    * and the per-query ADC lookup table `__qtab(j)(c) = q_j·c −
    * ‖c‖²/2` as column DATA (m·ksub doubles per query — metadata on
    * the broadcast side; dropped before any shuffle). Table entries
    * fold left-to-right from 0.0 — the engine/oracle dot order — so
    * the doubles are bit-identical to a SQL replay. With
    * `probe = Some((cents, nprobe))` the frame carries one row per
    * (query, probed cluster), driver-ranked with the same score and
    * tie order as [[probeQueries]]. Empty queries → empty frame →
    * empty result, like every sibling topK. */
  private def adcQueryFrame(queries: DataFrame,
      books: Array[Array[Array[Double]]],
      idCol: String, vecCol: String,
      probe: Option[(Array[Array[Double]], Int)]): DataFrame = {
    val m = books.length
    val sub = books(0)(0).length
    def dotL(a: Seq[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val base = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val idType = base.schema("query_id").dataType
    val rows = base.collect() // the ONE evaluation of `queries`
    val out: Seq[org.apache.spark.sql.Row] = rows.toSeq.flatMap { r =>
      val qv = r.getSeq[Double](1)
      val tab: Seq[Seq[Double]] = (0 until m).map { j =>
        books(j).toSeq.map { c =>
          val half = c.map(x => x * x).sum / 2.0
          dotL(qv.slice(j * sub, (j + 1) * sub), c) - half
        }
      }
      probe match {
        case None => Seq(org.apache.spark.sql.Row(r.get(0), qv, tab, -1))
        case Some((cents, nprobe)) =>
          // same score and tie order as probeQueries' stable sort
          val ranked = cents.zipWithIndex.map { case (c, i) =>
            (dotL(qv, c) - c.map(x => x * x).sum / 2.0, i)
          }.sortBy { case (sc, i) => (-sc, i) }.take(nprobe)
          ranked.map { case (_, cl) =>
            org.apache.spark.sql.Row(r.get(0), qv, tab, cl)
          }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", idType),
      org.apache.spark.sql.types.StructField("qv", ArrayType(DoubleType)),
      org.apache.spark.sql.types.StructField("__qtab",
        ArrayType(ArrayType(DoubleType))),
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.IntegerType)))
    import scala.jdk.CollectionConverters._
    val df = queries.sparkSession.createDataFrame(out.asJava, schema)
      .withColumn("qn", sqrt(fastDot(queries)(col("qv"), col("qv"))))
    broadcast(if (probe.isEmpty) df.drop("cluster") else df)
  }

  /** Shared ADC tail: `withQ` holds candidate rows (neighbor_id, cv,
    * codes) ⋈ (query_id, qv, qn, __qtab); ADC is two `element_at`
    * lookups per subvector into the query's own table column — no
    * per-query plan branches — summed left-to-right (the oracle's
    * association order). The table column is dropped before the topC
    * window so it never rides a shuffle; `topC` survivors are
    * exact-reranked to cosine top-k. */
  private def adcRerank(withQ: DataFrame, m: Int, topC: Int, k: Int): DataFrame = {
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__qtab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val cands = withQ
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adc)
      .drop("__qtab")
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id"))
    val top = cands.withColumn("__cr", row_number().over(wC))
      .filter(col("__cr") <= topC)
    // exact re-rank only on the topC survivors
    val scored = top
      .withColumn("sim", round(fastDot(withQ)(col("qv"), col("cv")) /
        (col("qn") * sqrt(fastDot(withQ)(col("cv"), col("cv")))), 6))
    rerank(scored, k)
  }

  /** INCREMENTAL semantic near-dup: a NEW batch of vectors against an
    * EXISTING IVF-partitioned corpus store — the embedding twin of the
    * minhash band-store path ([[graft.dedup.Dedup.incrementalCandidates]],
    * the production dedup shape). The corpus was clustered ONCE at
    * ingest ([[writeIvfStore]]); each incoming batch probes its
    * `nprobe` nearest lists and compares only against those
    * PARTITION-PRUNED directories — per-batch cost tracks the batch and
    * the probed slice, never the corpus. Returns (new_id, corpus_id,
    * sim) with exact cosine ≥ threshold. */
  def incrementalSemanticNearDup(spark: org.apache.spark.sql.SparkSession,
      dir: String, cents: Array[Array[Double]], batch: DataFrame,
      threshold: Double, nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = probeQueries(batch, cents, nprobe, idCol, vecCol)
    val probed = probes.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSeq
    val store = spark.read.parquet(dir)
      .filter(col("cluster").isin(probed: _*)) // → PartitionFilters
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"), col("cluster"))
      .withColumn("cn", sqrt(fastDot(batch)(col("cv"), col("cv"))))
    store.join(broadcast(probes), "cluster")
      .withColumn("sim", round(fastDot(batch)(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .filter(col("sim") >= threshold)
      .select(col("query_id").as("new_id"), col("corpus_id"), col("sim"))
      .distinct() // nprobe > 1 can surface the same pair via two lists
  }

  /** Embedding-space near-duplicates: all pairs with cosine ≥ threshold.
    * Exact all-pairs — O(n²); the EXACT VERIFIER for modest corpora and
    * the recall baseline in SimilaritySpec. The scale path is
    * [[nearDupPairsLsh]]. Pairs are (a < b). */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = withVecNorm(corpus, idCol, vecCol, "a", "va", "na")
    val r = withVecNorm(corpus, idCol, vecCol, "b", "vb", "nb")
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("sim", round(fastDot(corpus)(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("a", "b", "sim")
  }

  /** Embedding-space near-duplicates at scale: SRP-LSH band collisions
    * generate candidate pairs (output-proportional — the shuffle carries
    * (band, id, vec) rows, never the cross product), then EXACT cosine
    * verifies each candidate against the threshold. Recall < 1 like any
    * LSH (tested vs [[nearDupPairs]] in SimilaritySpec); every emitted
    * pair is exact. This is the 100 TB shape — no crossJoin anywhere. */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double,
      planes: Int = 16, bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val staged = withSrpBands(
      withVecNorm(corpus, idCol, vecCol, "doc", "v", "nrm")
        .withColumn("sig", srpSignature(col("v"), planes)), planes, bandBits)
    val l = staged.select(col("doc").as("a"), col("v").as("va"), col("nrm").as("na"), col("band"))
    val r = staged.select(col("doc").as("b"), col("v").as("vb"), col("nrm").as("nb"), col("band"))
    // verify before distinct: only passing pairs shuffle for the dedup,
    // and the ≤ bands-fold duplicate sims are computed map-side
    l.join(r, "band").filter(col("a") < col("b"))
      .withColumn("sim", round(fastDot(corpus)(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("a", "b", "sim").distinct()
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, public method):
    * cluster the embedding space with the IVF coarse quantizer, compare
    * pairs only WITHIN a cluster (cosine ≥ threshold), close the pairs
    * into duplicate groups, keep the minimum id of each group.
    *
    * Returns one row per vector: (id, cluster, rep, keep) with
    * rep = the group's canonical keeper (itself when not duplicated).
    *
    * 100 TB shape: the within-cluster self-join is the METHOD — nlist
    * grows with the corpus so cluster populations stay bounded, and the
    * quadratic term is paid per cluster, never globally (no crossJoin).
    * Assignment is a centroid-literal projection; the only shuffles are
    * the cluster self-join and the component closure over the (tiny)
    * duplicate-pair graph. Needs a GraftExtensions session (native dot
    * kernel — bit-identical to the declarative fold). */
  def semanticDedup(corpus: DataFrame, threshold: Double, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    // (id, __v, __n, cluster) feeds both self-join sides and the final
    // projection — materialized once, output-sized relative to corpus
    val assigned = assignCluster(corpus, cents, idCol, vecCol)
      .withColumn("__n", sqrt(call_function("graft_dot", col("__v"), col("__v"))))
      .transform(graft.util.Materialize.eager)
    val l = assigned.select(col(idCol).as("a"), col("__v").as("va"),
      col("__n").as("na"), col("cluster"))
    val r = assigned.select(col(idCol).as("b"), col("__v").as("vb"),
      col("__n").as("nb"), col("cluster"))
    val pairs = l.join(r, "cluster").filter(col("a") < col("b"))
      .withColumn("sim", round(
        call_function("graft_dot", col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("a", "b")
    val comps = graft.dedup.Dedup.connectedComponents(pairs)
    assigned.select(col(idCol), col("cluster"))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("comp"), col(idCol)).as("rep"),
        (coalesce(col("comp"), col(idCol)) === col(idCol)).as("keep"))
  }

  /** THRESHOLD CALIBRATION for semantic dedup (q131) — the workflow
    * step before [[semanticDedup]]: what cosine cutoff means "the same
    * document" on THIS corpus? A deterministic md5 sample of vectors
    * (`md5("cal|" + id) % sampleMod == 0` — the reproducible-sample
    * contract every Sampling operator uses), exact pairwise cosine over
    * the sample only, and EXACT interpolated percentiles of the
    * similarity distribution (the q50-proven `percentile` ≡
    * `quantile_cont` contract). Read p99/p90 against the intended
    * duplicate rate and hand the cutoff to [[semanticDedup]].
    *
    * 100 TB shape: the pair space is sample², never corpus² — pick
    * `sampleMod` so the sample is O(10³-10⁴) vectors regardless of
    * corpus size (quantile error depends on sample size alone). The
    * sample broadcasts; the pair generation is a broadcast self-join
    * DELIBERATELY (sample-bounded by construction, the one place a
    * nested-loop join is the intended plan). Norms stage once per
    * vector ([[cosine]]'s hot-path note). */
  def cosineCalibration(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", sampleMod: Int = 8): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val sampled = emb
      .filter(graft.text.TextFunctions.md5Long(
        concat(lit("cal|"), col(idCol).cast("string"))) % sampleMod === 0)
      .select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", sqrt(fastDot(emb)(col("__v"), col("__v"))))
      .filter(col("__n") > 0)
    val pairs = sampled.select(col("__id").as("a"), col("__v").as("va"), col("__n").as("na"))
      .join(broadcast(sampled.select(col("__id").as("b"), col("__v").as("vb"),
        col("__n").as("nb"))), col("a") < col("b"))
      .select(round(fastDot(emb)(col("va"), col("vb"))
        / (col("na") * col("nb")), 6).as("sim"))
    val quantiles = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(sim, array(0.5D, 0.9D, 0.99D))").as("p"))
    sampled.agg(count(lit(1)).as("n_vectors")).crossJoin(quantiles)
      .select(col("n_vectors"), col("n_pairs"),
        element_at(col("p"), 1).as("p50"),
        element_at(col("p"), 2).as("p90"),
        element_at(col("p"), 3).as("p99"))
  }

  /** Embedding-space decontamination: for every corpus vector, its max
    * cosine against the EVAL set, the arg-max eval id (ties broken on
    * the smaller id), and a `contaminated` flag at `threshold` — the
    * semantic complement of the n-gram decontamination family (exact
    * q48 / fuzzy q123): paraphrased eval leakage shares no n-grams but
    * sits next to the eval point in embedding space.
    *
    * Scale shape: the q126 one-sided-probe contract — the eval set is
    * small by construction (an eval benchmark, not a corpus) and is
    * BROADCAST; the corpus streams through map-side: per corpus row,
    * |eval| staged-norm dot products, one partial max. Never
    * corpus × corpus, no shuffle of pair rows — the only exchange is
    * the final per-id max, and even that is pre-aggregated map-side.
    * Rows with zero-norm vectors on either side are dropped (cosine
    * undefined). */
  /** [[semanticContamination]]'s IVF scale path — for an eval set too
    * large to broadcast (full benchmark suites, millions of rows): the
    * EVAL set is clustered (md5-deterministic IVF), each corpus vector
    * probes its `nprobe` nearest eval lists map-side (centroids are
    * plan literals), and the candidate join is a shuffle equi-join on
    * the cluster id — the same exact→shuffle degradation contract as
    * [[graft.sim.Mining]]. Max cosine is over the PROBED candidates
    * only (the IVF approximation); corpus rows whose probed clusters
    * hold no eval vector are absent from the report (they have no
    * candidate — at any plausible threshold they are clean). The
    * probe is still one-sided: never corpus × corpus, never eval²,
    * and each eval vector lives in exactly one list so no pair is
    * scored twice. */
  def semanticContaminationIvf(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(evalSet, nlist, idCol, vecCol)
    val e = assignCluster(evalSet, cents, idCol, vecCol)
      .select(col(idCol).as("__eid"), col("__v").as("__ev"), col("cluster"))
      .withColumn("__en", sqrt(fastDot(evalSet)(col("__ev"), col("__ev"))))
      .filter(col("__en") > 0)
    val p = probeQueries(corpus, cents, nprobe, idCol, vecCol)
      .filter(col("qn") > 0)
    p.join(e, "cluster")
      .select(col("query_id"),
        round(fastDot(corpus)(col("qv"), col("__ev"))
          / (col("qn") * col("__en")), 6).as("__sim"),
        col("__eid"))
      .groupBy(col("query_id").as(idCol))
      .agg(max(struct(col("__sim"), (-col("__eid")).as("__neg"))).as("__m"))
      .select(col(idCol),
        (-col("__m.__neg")).as("eval_id"),
        col("__m.__sim").as("max_sim"),
        (col("__m.__sim") >= threshold).as("contaminated"))
  }

  def semanticContamination(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = withVecNorm(corpus, idCol, vecCol, "__id", "__v", "__n")
      .filter(col("__n") > 0)
    val e = withVecNorm(evalSet, idCol, vecCol, "__eid", "__ev", "__en",
        spread = false)
      .filter(col("__en") > 0)
    c.join(broadcast(e))
      .select(col("__id"),
        round(fastDot(corpus)(col("__v"), col("__ev"))
          / (col("__n") * col("__en")), 6).as("__sim"),
        col("__eid"))
      // max of (sim, -eval_id) = highest sim, then LOWEST eval id — an
      // aggregate-form argmax (partial map-side combine), not a window
      .groupBy(col("__id").as(idCol))
      .agg(max(struct(col("__sim"), (-col("__eid")).as("__neg"))).as("__m"))
      .select(col(idCol),
        (-col("__m.__neg")).as("eval_id"),
        col("__m.__sim").as("max_sim"),
        (col("__m.__sim") >= threshold).as("contaminated"))
  }
}
