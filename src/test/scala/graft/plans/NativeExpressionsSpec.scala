package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextFunctions._

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a completely different sentence with other words entirely"),
    (3L, "xy"), // fewer tokens than shingle k -> empty shingle set
    (4L, "")).toDF("doc_id", "text")

  test("graft_minhash matches the declarative HOF signature bit-for-bit") {
    val staged = docs
      .withColumn("t", tokens($"text"))
      .withColumn("sh", wordShinglesOf($"t", 3))
    val hof = staged.select($"doc_id", Dedup.minhashSignatureOf($"sh", 8).as("sig"))
      .as[(Long, Seq[Option[Long]])].collect().toMap
    val native = staged.select($"doc_id", Dedup.minhashSignatureNative($"sh", 8).as("sig"))
      .as[(Long, Seq[Option[Long]])].collect().toMap
    assert(native == hof)
    assert(native(1L).forall(_.isDefined) && native(1L).length == 8)
    assert(native(3L).forall(_.isEmpty)) // no shingles -> null minima
  }

  test("graft_winnow matches the declarative winnow-over-md5Long bit-for-bit") {
    val staged = docs
      .withColumn("t", tokens($"text"))
      .withColumn("sh", wordShinglesOf($"t", 3))
      .withColumn("hashes", transform($"sh", x => md5Long(x, 8)))
    val hof = staged.select($"doc_id", winnowFromHashes($"hashes", 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = staged.select($"doc_id", winnowNative($"sh", 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
    assert(native(1L).nonEmpty && native(1L) == native(1L).sorted)
    assert(native(3L).isEmpty) // no shingles -> empty fingerprint set
  }

  test("graft_simhash matches the declarative tf-weighted fold bit-for-bit") {
    val staged = docs.withColumn("t", tokens($"text"))
    val hof = staged.select($"doc_id", Dedup.simhashOf($"t").as("s"))
      .as[(Long, Long)].collect().toMap
    val native = staged.select($"doc_id", Dedup.simhashNative($"t").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof)
    assert(native(4L) == 0L) // empty text -> no tokens -> zero signature
  }

  test("graft_dot returns null for unequal lengths, matching zip_with semantics") {
    val uneven = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val viaKernel = uneven
      .select(call_function("graft_dot", $"a", $"b").as("d"))
      .collect().head.isNullAt(0)
    val viaFold = uneven.select(Similarity.dot($"a", $"b").as("d"))
      .collect().head.isNullAt(0)
    assert(viaKernel && viaFold)
  }

  test("graft_dot matches the declarative fold bit-for-bit") {
    val vecs = Seq((Array(1.5, -2.25, 3.125), Array(0.5, 4.0, -1.0)))
      .toDF("a", "b")
    val hof = vecs.select(Similarity.dot($"a", $"b")).as[Double].head()
    val native = vecs.select(call_function("graft_dot", $"a", $"b")).as[Double].head()
    assert(hof == native)
    assert(native == 1.5 * 0.5 + -2.25 * 4.0 + 3.125 * -1.0)
  }

  test("graft_nfc composes decomposed sequences; cleanText strips invisibles and collapses") {
    val dirty = Seq(
      (1L, "re\u0301sume\u0301"),              // decomposed -> composed
      (2L, "r\u00e9sum\u00e9"),                // already composed -> unchanged
      (3L, "a\u200Bb\u00ADc\uFEFFd"),         // invisibles stripped by cleanText
      (4L, "  x \t y \r\n z  "),            // whitespace collapse + trim
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = dirty.select($"doc_id", nfc($"text").as("n"), cleanText($"text").as("c"))
      .as[(Long, Option[String], Option[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L)._1.get == "r\u00e9sum\u00e9", "NFC must compose e+combining acute")
    assert(out(1L)._1.get == out(2L)._1.get)
    assert(out(3L)._2.get == "abcd")
    assert(out(4L)._2.get == "x y z")
    assert(out(5L)._1.isEmpty && out(5L)._2.isEmpty, "null rides through")
    // the digest-gate motivation: decomposed and composed content must
    // key identically AFTER the cleanup, differently before
    val keys = dirty.filter($"doc_id" <= 2)
      .select(Dedup.contentKey($"text").as("raw"),
        Dedup.contentKey(cleanText($"text")).as("clean"))
      .as[(String, String)].collect()
    assert(keys.map(_._1).distinct.length == 2, "raw digests differ")
    assert(keys.map(_._2).distinct.length == 1, "cleaned digests agree")
  }

  test("native expressions are callable from SQL and survive codegen") {
    docs.withColumn("t", tokens($"text"))
      .withColumn("sh", wordShinglesOf($"t", 3))
      .createOrReplaceTempView("nat_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash(sh, 4) AS sig FROM nat_docs WHERE doc_id = 1")
      .as[(Long, Seq[Option[Long]])].head()
    assert(viaSql._2.length == 4 && viaSql._2.forall(_.isDefined))
  }
}
