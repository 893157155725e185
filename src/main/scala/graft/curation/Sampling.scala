package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.md5Long

/** Deterministic sampling for corpus mix balancing — the step between
  * curation filters and training: cap over-represented sources, draw a
  * reproducible uniform subset. Everything is keyed on md5 of the row
  * id, NEVER rand(): the sample is identical on any cluster, any
  * partitioning, any retry — so downstream dedup/decontamination stay
  * hash-checkable and a re-run of the pipeline rebuilds the same
  * training set (the property that makes data ablations comparable).
  */
object Sampling {

  /** Keep ~`perMille`/1000 of rows, chosen by the id's md5 bucket.
    * A pure map-side filter — no shuffle, no state, any scale. */
  def uniformSample(df: DataFrame, idCol: Column, perMille: Int): DataFrame = {
    require(perMille >= 0 && perMille <= 1000, "perMille in [0,1000]")
    df.filter(pmod(md5Long(idCol.cast("string"), 8), lit(1000)) < perMille)
  }

  /** Temperature-balanced mix allocation (the multilingual
    * alpha-sampling scheme): stratum i gets weight cᵢ^alpha / Σ cⱼ^alpha
    * — alpha 1.0 = proportional, 0.0 = uniform, 0.3-0.7 the usual
    * up-weighting of low-resource strata. Returns one row per stratum
    * with its count, weight, and integer allocation out of `budget`.
    *
    * Determinism contract: the denominator is folded LEFT-TO-RIGHT in
    * stratum sort order (not a parallel sum() whose accumulation order
    * is partition-dependent), so the doubles — and the oracle hash —
    * are exact. The stratum table is tiny (one row per stratum); the
    * only corpus-scale work is the counting aggregate. */
  def mixAllocation(df: DataFrame, stratum: String, alpha: Double,
      budget: Long): DataFrame = {
    // a null stratum is not a real corpus slice (and null sort order
    // differs across engines, which would break the ordered-fold
    // determinism contract) — excluded, not allocated
    val counts = df.filter(col(stratum).isNotNull)
      .groupBy(col(stratum))
      .agg(count(lit(1)).as("c"))
      .withColumn("pw", pow(col("c").cast("double"), lit(alpha)))
    val tot = counts
      .agg(sort_array(collect_list(struct(col(stratum), col("pw")))).as("a"))
      .select(aggregate(col("a"), lit(0.0), (acc, x) => acc + x.getField("pw")).as("tot"))
    counts.crossJoin(tot)
      .select(col(stratum), col("c"),
        round(col("pw") / col("tot"), 6).as("weight"),
        floor(lit(budget.toDouble) * col("pw") / col("tot")).cast("long").as("alloc"))
  }

  /** Deterministic dataset split (train/val/test): each row lands in
    * exactly one split by its id's md5 bucket out of 1000. Pure
    * map-side projection — identical assignment on any cluster, any
    * partitioning, any retry, so eval rows can never leak into train
    * across re-runs (the property decontamination depends on).
    * `fractions` are per-mille and must sum to 1000; bucket ranges are
    * cumulative in the given order, so APPENDING a split or shrinking
    * the last one moves only the affected buckets. */
  def datasetSplit(df: DataFrame, idCol: Column,
      fractions: Seq[(String, Int)], splitCol: String = "split"): DataFrame = {
    require(fractions.map(_._2).sum == 1000, "fractions must sum to 1000 per-mille")
    require(fractions.forall(_._2 >= 0), "fractions must be non-negative")
    // DOMAIN-SEPARATED hash ("split|" prefix): uniformSample/stratifiedCap
    // bucket the BARE id, and reusing that bucket here would correlate
    // the operators — a <=800-permille uniform sample would land entirely
    // in the first split, leaving val/test empty. The prefix makes the
    // split assignment independent of every other md5-keyed decision.
    val bucket = pmod(md5Long(concat(lit("split|"), idCol.cast("string")), 8), lit(1000))
    val cuts = fractions.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = fractions.zip(cuts).init.foldRight(
      lit(fractions.last._1): Column) { case (((name, _), hi), els) =>
      when(bucket < hi, lit(name)).otherwise(els)
    }
    // a null id has no bucket: split is null (caller filters), matching
    // uniformSample's natural exclusion — never silently dumped into the
    // last split
    df.withColumn(splitCol, when(idCol.isNotNull, assign))
  }

  /** [[datasetSplit]] that keeps near-duplicate CLUSTERS intact: every
    * doc is assigned the split of its duplicate-cluster REPRESENTATIVE
    * (the component's min id; singletons represent themselves), so a
    * train/test boundary can never separate two near-dups — the
    * leakage channel a per-doc split leaves open (a test doc whose
    * near-copy sits in train is contamination no decontamination pass
    * downstream will see, because the split itself planted it).
    *
    * `pairs` is any near-dup edge set — [[graft.dedup.Dedup]]'s LSH /
    * SimHash / semantic pair generators all produce the (a, b) shape.
    *
    * Scale: the component labels are pair-vertex-sized (only docs that
    * HAVE a near-dup carry a label — a tiny fraction of a deduped
    * corpus), so the label join is small-side; everything else is
    * [[datasetSplit]]'s map-side bucketing. */
  def clusterAwareSplit(df: DataFrame, idCol: Column, pairs: DataFrame,
      fractions: Seq[(String, Int)], splitCol: String = "split",
      repCol: String = "rep"): DataFrame = {
    val labels = graft.dedup.Dedup.connectedComponents(pairs)
      .select(col("id").as("__cid"), col("comp").as("__comp"))
    val withRep = df.join(labels, idCol === col("__cid"), "left")
      .withColumn(repCol, coalesce(col("__comp"), idCol))
      .drop("__cid", "__comp")
    datasetSplit(withRep, col(repCol), fractions, splitCol)
  }

  /** At most `cap` rows per stratum, chosen by md5 order of the id
    * (reproducible "random" priority; ties broken by the id itself).
    *
    * Scale shape: one shuffle keyed on the strata; the rank filter is
    * recognized by Spark 4's WindowGroupLimit, which keeps a partial
    * top-`cap` per map task BEFORE the exchange — a skewed stratum
    * ships ~cap rows per upstream task, not its full population. */
  def stratifiedCap(df: DataFrame, strata: Seq[String], idCol: Column,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5Long(idCol.cast("string"), 15), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
  }

  /** Budget selection: order rows by (`score` DESC, id) and keep the
    * maximal prefix whose cumulative `weight` fits `budget` (a row is
    * kept iff the running sum INCLUDING it is ≤ budget) — the final
    * corpus-selection step: "take the best documents until the token
    * budget is full". Returns the kept rows with their running total
    * as `cum_weight`.
    *
    * Scale contract: a bare global window (`Window.orderBy` with no
    * partition) would move the whole corpus to ONE task. This instead
    * computes the distributed prefix sum: range-partition by the sort
    * key (parallel range exchange), per-partition running sums (window
    * PARTITIONED by the physical partition id — parallel), and a
    * partition-offset table of one row per partition (metadata-sized,
    * broadcast back). Partition boundaries come from range sampling,
    * but the running total of an integer weight over a TOTAL order
    * (score, id tiebreak) is independent of where the boundaries fall
    * — the result is deterministic on any cluster. The range exchange
    * is shared by the offset aggregate and the final join via Spark's
    * exchange reuse. `weight` must be integral (token counts, bytes):
    * long arithmetic keeps the fold order-exact — and it must be
    * present and non-negative, ENFORCED below: a null weight would ride
    * the window sum at zero cost, and a negative one makes the
    * per-partition total diverge from the running sum, silently
    * corrupting every later partition's offset. Rows violating the
    * contract fail the job loudly (a budget over corrupt weights is a
    * wrong training set, not a recoverable row). */
  def budgetSelect(df: DataFrame, idCol: Column, score: Column,
      weight: Column, budget: Long): DataFrame = {
    // guard on the POST-cast value: an uncastable weight ('abc' in a
    // string column) must fail with THIS contract error, not ANSI's
    // generic cast error (or, with ANSI off, ride the sum as null) —
    // try_cast turns both modes into a null the guard below owns
    val w = weight.try_cast("long")
    val keyed = df.withColumn("__score", score)
      .withColumn("__w", when(w.isNull || w < 0,
          raise_error(concat(lit("budgetSelect: weight must be a " +
            "non-negative integer, got "),
            coalesce(weight.cast("string"), lit("NULL")))))
        .otherwise(w))
    runningSum(keyed, Seq(col("__score").desc, idCol), col("__w"), "cum_weight")
      .filter(col("cum_weight") <= budget)
      .drop("__score", "__w")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis): draw
    * `n` rows with inclusion probability proportional to `weight`, by
    * ranking on the priority key u^(1/w) — spelled in log space as
    * ln(u)/w so the arithmetic stays in the deterministic-ln contract
    * (ln only on exact integers: u is the md5 long + 1; ln 2^60 is the
    * exact domain bound; their difference is the genuine ln of a (0,1]
    * uniform). The "uniform" u is the domain-separated md5 of
    * `"wsample|seed|id"`, NEVER rand() — the sample is identical on any
    * cluster, partitioning, or retry, and a new seed draws an
    * independent sample. Key is scaled ×1e6 and rounded to 6 decimals
    * BEFORE ranking (the cross-engine double contract); ties break on
    * the id, so the selection is a total order.
    *
    * Scale shape: the key is a pure map-side projection; the global
    * top-n runs through [[graft.util.TopN.exact]] (per-partition prune,
    * then rank the ≤ n·P survivors) — no full sort, no single-task
    * window, any corpus size. */
  def weightedSample(df: DataFrame, idCol: Column, weight: Column, n: Int,
      seed: String, keyAs: String = "es_key"): DataFrame = {
    require(n > 0, s"weightedSample needs n > 0, got $n")
    graft.util.TopN.exact(df.withColumn(keyAs, esKey(idCol, weight, seed)),
      Seq.empty, Seq(col(keyAs).desc, idCol.asc), n)
  }

  /** Per-stratum [[weightedSample]]: an independent without-replacement
    * E-S draw of `n` rows INSIDE each stratum — the per-language /
    * per-source quota shape (a global weighted draw would let a heavy
    * stratum crowd out the tail entirely). Same key, same total order,
    * ranked within the strata; TopN's per-partition prune composes
    * with the grouping, so no stratum ever funnels through one task. */
  def stratifiedWeightedSample(df: DataFrame, strata: Seq[String],
      idCol: Column, weight: Column, n: Int, seed: String,
      keyAs: String = "es_key"): DataFrame = {
    require(strata.nonEmpty, "stratifiedWeightedSample needs >= 1 stratum column")
    require(n > 0, s"stratifiedWeightedSample needs n > 0, got $n")
    graft.util.TopN.exact(df.withColumn(keyAs, esKey(idCol, weight, seed)),
      strata.map(col), Seq(col(keyAs).desc, idCol.asc), n)
  }

  /** REALIZE a [[mixAllocation]]: the temperature-balanced mix as an
    * actual drawn corpus, not just an allocation table — each stratum
    * contributes exactly its alpha-weighted integer allocation, drawn
    * without replacement by the E-S priority (weight-proportional
    * INSIDE the stratum, alpha-balanced ACROSS strata). A stratum
    * smaller than its allocation contributes everything it has.
    *
    * Scale shape: one low-cardinality count aggregate (the allocation),
    * one per-stratum TopN pruned at the LARGEST allocation (driver
    * reads one scalar off the strata-sized frame), and a broadcast
    * join of the allocation table for the final per-stratum cut. */
  def allocatedSample(df: DataFrame, stratum: String, alpha: Double,
      budget: Long, idCol: Column, weight: Column, seed: String): DataFrame = {
    val alloc = mixAllocation(df, stratum, alpha, budget)
      .select(col(stratum), col("alloc"))
    val maxAlloc = alloc.agg(max(col("alloc"))).head().getLong(0)
    val ranked = graft.util.TopN.exact(
      df.filter(col(stratum).isNotNull)
        .withColumn("es_key", esKey(idCol, weight, seed)),
      Seq(col(stratum)), Seq(col("es_key").desc, idCol.asc),
      math.max(maxAlloc, 1L).toInt)
    ranked.join(broadcast(alloc), Seq(stratum))
      .filter(col("rank") <= col("alloc"))
  }

  /** The Efraimidis–Spirakis priority key of [[weightedSample]] — a
    * pure per-row projection, exposed so the STREAMING reservoir
    * ([[graft.streaming.Reservoir]]) ranks by the identical key: the
    * E-S priority is mergeable (top-n(A ∪ B) = top-n(top-n(A) ∪ B)),
    * which is exactly what makes the streaming sample equal the batch
    * sample. */
  private[graft] def esKey(idCol: Column, weight: Column, seed: String): Column = {
    val u = md5Long(concat(lit(s"wsample|$seed|"), idCol.cast("string")), 15) + lit(1L)
    // clamp guards only w <= 0 (a zero/negative weight would divide by
    // zero or flip the key's sign); fractional weights in (0,1) — e.g.
    // quality scores — keep their proportional inclusion odds
    val w = greatest(weight.cast("double"), lit(1e-9))
    round((log(u.cast("double")) - log(lit(1152921504606846976L).cast("double")))
      / w * lit(1000000.0), 6)
  }

  /** Deterministic global shuffle order — the training-order step: a
    * reproducible "random" permutation of the corpus, assigned as a
    * 1-based `posCol` by rank of the domain-separated md5 of
    * `"shuffle|seed|id"`. Identical on any cluster / partitioning /
    * retry; a new `seed` gives an independent permutation (epoch
    * reshuffles), and the domain prefix decorrelates it from every
    * other md5-keyed decision (sampling, splits).
    *
    * Scale shape: the [[budgetSelect]] distributed prefix sum with
    * weight 1 — never a single-partition global window. */
  def shuffleOrder(df: DataFrame, idCol: Column, seed: String,
      posCol: String = "ord_pos"): DataFrame = {
    val key = md5(concat(lit(s"shuffle|$seed|"), idCol.cast("string")))
    runningSum(df.withColumn("__k", key), Seq(col("__k"), idCol), lit(1L), posCol)
      .drop("__k")
  }

  /** Distributed global running sum of `w` over the TOTAL order `sort`:
    * range-partition on the sort key (parallel range exchange),
    * per-partition running sums (window PARTITIONED by the physical
    * partition id — parallel), and a partition-offset table of one row
    * per partition (metadata-sized, broadcast back). A bare global
    * window (`Window.orderBy` with no partition) would move the whole
    * corpus to ONE task; this never does. Partition boundaries come
    * from range sampling, but the running total of an integral `w`
    * over a total order is independent of where they fall — the
    * result is deterministic on any cluster. The range exchange is
    * shared by the offset aggregate and the final join via Spark's
    * exchange reuse. */
  private def runningSum(df: DataFrame, sort: Seq[Column], w: Column,
      out: String): DataFrame = {
    val ranged = df
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
    val wRun = Window.partitionBy(col("__pid"))
      .orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = ranged.withColumn("__pcum", sum(w).over(wRun))
    // one row per physical partition; the cross-partition prefix runs
    // over THIS tiny frame, never the data
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // plain sum of w, not max(__pcum): equal by construction once the
    // caller's non-negative contract holds, and immune to it slipping
    val offsets = withCum.groupBy(col("__pid"))
      .agg(sum(w).as("__ptot"))
      .withColumn("__offset", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))
    withCum.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__offset") + col("__pcum"))
      .drop("__pid", "__pcum", "__offset")
  }
}
