package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokenCount: whitespace runs, trimming, empty text") {
    assert(one[Int](tokenCount($"t"), "a b  c\t d") == 4)
    assert(one[Int](tokenCount($"t"), "  leading and trailing  ") == 3)
    assert(one[Int](tokenCount($"t"), "") == 0)
    assert(one[Int](tokenCount($"t"), "   ") == 0)
  }

  test("bpeishCount: letters/digits/punct split") {
    // "don't stop123!" -> don, ', t, stop, 123, !
    assert(one[Int](bpeishCount($"t"), "don't stop123!") == 6)
  }

  test("ratios are exact and bounded") {
    assert(one[Double](punctRatio($"t"), "a.b!") == 0.5)
    assert(one[Double](digitRatio($"t"), "a1b2") == 0.5)
    assert(one[Double](upperRatio($"t"), "AbCd") == 0.5)
    assert(one[Double](punctRatio($"t"), "") == 0.0)
  }

  test("langId: marker argmax with deterministic tie-break, unknown fallback") {
    assert(one[String](langId($"t"), "the cat and the dog is here") == "en")
    assert(one[String](langId($"t"), "der hund und die katze ist das") == "de")
    assert(one[String](langId($"t"), "xyzzy plugh") == "unknown")
    // 'la' is in both fr and es lists; fr wins by marker order
    assert(one[String](langId($"t"), "la la") == "fr")
  }

  test("wordShingles: k-grams, short docs empty") {
    assert(one[scala.collection.Seq[String]](wordShingles($"t", 3), "a b c d")
      == Seq("a b c", "b c d"))
    assert(one[scala.collection.Seq[String]](wordShingles($"t", 3), "a b") == Seq())
  }

  test("md5Long: deterministic, positive, matches manual hex parse") {
    val h = one[Long](md5Long($"t", 8), "abc")
    // md5("abc") = 900150983cd24fb0... -> 0x90015098
    assert(h == java.lang.Long.parseLong("90015098", 16))
    assert(one[Long](md5Long($"t", 15), "abc") ==
      java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("fingerprints: deterministic, order-sensitive (rolling), edit-robust (winnow)") {
    val fp1 = one[Long](rollingFingerprint($"t"), "a b c d e")
    val fp2 = one[Long](rollingFingerprint($"t"), "b a c d e")
    assert(fp1 != fp2 && fp1 >= 0 && fp1 < 2147483647L)
    assert(fp1 == one[Long](rollingFingerprint($"t"), "a b c d e"))
    // winnow: one word changed at the end keeps most fingerprints
    val w1 = one[scala.collection.Seq[Long]](winnowFingerprints($"t"), "a b c d e f g h i j")
    val w2 = one[scala.collection.Seq[Long]](winnowFingerprints($"t"), "a b c d e f g h i CHANGED")
    assert(w1.toSeq.intersect(w2.toSeq).nonEmpty)
    assert(w1.toSeq == w1.toSeq.sorted && w1.toSeq.distinct == w1.toSeq)
  }

  test("redact: emails, URLs, IPs; IP inside a URL absorbed by [URL]") {
    val r = one[String](redact($"t"),
      "mail bob.smith+x@corp.example.org see https://10.1.2.3/path?x=1 or http://a.b/c from 192.168.0.1 end")
    // query-string '?' is outside the URL charset — the path up to it is
    // redacted, the tail survives (documented conservative charset)
    assert(r == "mail [EMAIL] see [URL]?x=1 or [URL] from [IP] end")
    assert(one[Int](redactionCount($"t", EmailPattern), "a@b.co and c.d@e.f.gh x") == 2)
    assert(one[Int](redactionCount($"t", Ipv4Pattern), "1.2.3.4 and 500.1.2.3") == 2)
    assert(one[String](redact($"t"), "no pii here") == "no pii here")
  }

  test("dupNgramRatio: 0 for unique, rises with repetition, 0 on empty") {
    def dup2(s: String) = {
      val df = Seq(s).toDF("t").withColumn("tk", tokens($"t"))
        .withColumn("s2", wordShinglesOf($"tk", 2))
      df.select(dupNgramRatio($"s2").as("r")).collect().head.getDouble(0)
    }
    assert(dup2("a b c d e") == 0.0)
    assert(dup2("a b a b a b") > 0.5)
    assert(dup2("") == 0.0)
  }

  test("stripMarkup: blocks drop with contents, tags space-separate, entities decode") {
    def strip(s: String) = one[String](stripMarkup($"t"), s)
    // script/style/comment contents are code, not prose — gone entirely
    assert(strip("a<script>var x = 'b';</script>c") == "a c")
    assert(strip("a<style>p{color:red}</style>c") == "a c")
    assert(strip("a<!-- b -->c") == "a c")
    // case-insensitive, attribute-bearing, multiline
    assert(strip("a<SCRIPT type=\"x\">\nb\n</SCRIPT >c") == "a c")
    // tags become spaces so block boundaries never glue words
    assert(strip("<p>one</p><p>two</p>") == "one two")
    // entity decode, &amp; last: the &amp;lt; trap must NOT double-decode
    assert(strip("fish &amp; chips &lt;b&gt; &amp;lt;x&amp;gt;&nbsp;end") ==
      "fish & chips <b> &lt;x&gt; end")
    // non-markup < > pass through untouched when not tag-shaped
    assert(strip("3 < 5 > 2") == "3 < 5 > 2")
    assert(strip("") == "")
  }

  test("qualityScore in [0,1], rewards stopword-rich text") {
    val hi = one[java.lang.Double](qualityScore($"t"),
      "the cat and the dog is a friend of the house and it is warm")
    val lo = one[java.lang.Double](qualityScore($"t"), "x9! y8? z7.")
    assert(hi > lo && hi <= 1.0 && lo >= 0.0)
  }
}
