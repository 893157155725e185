package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SignalAgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappaOf(df: org.apache.spark.sql.DataFrame): Double =
    df.select("kappa").head.getDouble(0)

  test("identical signals score kappa 1; reversed signals go negative") {
    val docs = (1 to 100).map(i => (i.toDouble, i.toDouble, 101.0 - i))
      .toDF("a", "same", "rev")
    val same = SignalAgreement.bandAgreement(docs, col("a"), col("same"))
    assert(kappaOf(same) == 1.0, "identical rankings are full agreement")
    // every cell on the diagonal, 5 bands of 20
    assert(same.collect().forall(r => r.getInt(0) == r.getInt(1)))
    // a clean reversal puts ALL mass on the anti-diagonal: its
    // diagonal hit rate equals chance (uniform marginals), so Cohen's
    // kappa is exactly 0 — the statistic detects AGREEMENT, not
    // correlation, and the cell table shows the structure
    val rev = SignalAgreement.bandAgreement(docs, col("a"), col("rev"))
    assert(kappaOf(rev) == 0.0, s"reversal sits at chance: ${kappaOf(rev)}")
    assert(rev.collect().forall(r => r.getInt(0) + r.getInt(1) == 6),
      "reversal mass lives on the anti-diagonal")
  }

  test("independent signals sit near kappa 0") {
    // a keyed by i, b keyed by a co-prime stride: bands decorrelate
    val docs = (0 until 500).map(i => (i.toDouble, ((i * 7) % 500).toDouble))
      .toDF("a", "b")
    val k = kappaOf(SignalAgreement.bandAgreement(docs, col("a"), col("b")))
    assert(math.abs(k) < 0.15, s"shuffled signal must not fake agreement: $k")
  }

  test("degenerate one-band mass yields null kappa, not NaN") {
    val docs = Seq.fill(10)((1.0, 1.0)).toDF("a", "b")
    val out = SignalAgreement.bandAgreement(docs, col("a"), col("b"))
    assert(out.count() == 1 && out.head.isNullAt(3),
      "pe = 1 must surface as null")
  }

  test("partitioning-invariant (cutpoint banding, no global window)") {
    val docs = (0 until 200).map(i => (math.sin(i).abs * 100, (i % 37).toDouble))
      .toDF("a", "b")
    val one = SignalAgreement.bandAgreement(docs.repartition(1), col("a"), col("b"))
      .collect().toSeq
    val many = SignalAgreement.bandAgreement(docs.repartition(13), col("a"), col("b"))
      .collect().toSeq
    assert(one == many)
  }
}
