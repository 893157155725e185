package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import Bpe._

  test("induce learns the classic merges on a hand-computed corpus") {
    // Sennrich-style toy corpus as a piece-frequency table:
    //   low×5  lower×2  newest×6  widest×3
    // Pair counts: es 9, st 9, we 8(?) — hand-derive the first merges:
    //   e+s : newest 6 + widest 3 = 9
    //   s+t : 9 (same words)      = 9  → tie, "es" < "st" lexicographically
    // merge1 = (e,s). Then (es,t) = 9 is the unique max → merge2.
    // Then l+o = low 5 + lower 2 = 7 → merge3; (lo,w) = 7 → merge4.
    val merges = induce(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    assert(merges == Seq(Merge("e", "s"), Merge("es", "t"),
      Merge("l", "o"), Merge("lo", "w")))
  }

  test("tie-break is deterministic: lexicographically smallest pair wins") {
    // "ab" and "ba" both appear 3 times ("aba" has one of each):
    // counts equal → (a,b) < (b,a) must win regardless of map order.
    val merges = induce(Seq("aba" -> 3L), 1)
    assert(merges == Seq(Merge("a", "b")))
  }

  test("repeated-symbol runs fuse left-to-right") {
    // "aaaa"×2: pairs (a,a)=3×2=6 → merge (a,a); rewrite left-to-right
    // gives [aa, aa], then (aa,aa)=2 → merge. Never [a, aa, a].
    val merges = induce(Seq("aaaa" -> 2L), 2)
    assert(merges == Seq(Merge("a", "a"), Merge("aa", "aa")))
  }

  test("encode applies merges greedily by rank and round-trips") {
    val spark2 = spark
    import spark2.implicits._
    val merges = Seq(Merge("e", "s"), Merge("es", "t"), Merge("l", "o"),
      Merge("lo", "w"))
    val df = Seq("lowest", "low slowest", "", "tabs\tand\nnewlines",
      "punct,uation!", "unicode: café 😀 á").toDF("text")
    val out = df.select(col("text"),
      Bpe.encode(col("text"), merges).as("toks"))
    val rows = out.collect()
    // lowest → pieces [lowest]; merges: es, est, lo, low → [low, est]
    assert(rows(0).getSeq[String](1) == Seq("low", "est"))
    // whitespace chars are their own pieces; words merge independently
    assert(rows(1).getSeq[String](1) == Seq("low", " ", "s", "low", "est"))
    assert(rows(2).getSeq[String](1) == Seq.empty)
    // lossless round-trip on every row, incl. tabs/newlines/unicode/
    // combining marks/astral plane
    val bad = out.filter(Bpe.decode(col("toks")) =!= col("text")).count()
    assert(bad == 0)
  }

  test("train on a DataFrame learns corpus-wide merges and encodes smaller") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq.fill(20)("the cat sat on the mat").toDF("text")
    val merges = train(docs, "text", numMerges = 8)
    assert(merges.nonEmpty)
    // "the" must become a single token within 8 merges (most frequent word)
    val toks = docs.limit(1)
      .select(Bpe.encode(col("text"), merges).as("t")).head.getSeq[String](0)
    assert(toks.contains("the"))
    // round-trip + compression bounds over the corpus
    val stats = docs.select(
      (Bpe.decode(Bpe.encode(col("text"), merges)) === col("text")).as("rt"),
      size(Bpe.encode(col("text"), merges)).as("n"),
      size(Bpe.pieces(col("text"))).as("np"),
      length(col("text")).as("nc"))
    assert(stats.filter(!col("rt")).count() == 0)
    assert(stats.filter(col("n") < col("np") || col("n") > col("nc")).count() == 0)
  }

  test("vocab is token frequencies over the encoded corpus") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("aa aa", "aa").toDF("text")
    val v = vocab(docs, "text", Seq(Merge("a", "a")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("aa" -> 3L, " " -> 1L))
  }

  test("encodeIds maps tokens to deterministic vocab positions, -1 for oov") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq.fill(10)("the cat sat").toDF("text")
    val merges = train(docs, "text", numMerges = 6)
    val v = vocabList(docs, "text", merges)
    // id order: freq desc, token asc — " " is the most frequent token
    assert(v.head == " ")
    val withIds = docs.limit(1).select(
      Bpe.encode(col("text"), merges).as("toks"),
      Bpe.encodeIds(col("text"), merges, v).as("ids"))
    val row = withIds.head
    val toks = row.getSeq[String](0)
    val ids = row.getSeq[Int](1)
    // ids are exactly the vocab positions of the string tokens
    assert(ids == toks.map(t => v.indexOf(t)))
    assert(ids.forall(_ >= 0))
    // ids decode back to the text through the same vocab
    val bad = docs.select(
      (Bpe.decodeIds(Bpe.encodeIds(col("text"), merges, v), v) === col("text"))
        .as("ok")).filter(!col("ok")).count()
    assert(bad == 0)
    // out-of-vocab text (chars never seen at train time) → -1, not a crash
    val oov = Seq("zzz 😀").toDF("text")
      .select(Bpe.encodeIds(col("text"), merges, v).as("ids"))
      .head.getSeq[Int](0)
    assert(oov.contains(-1))
  }

  test("null text encodes to null, merge table may be empty") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Some("ab"), None).toDF("text")
    val out = df.select(Bpe.encode(col("text"), Seq.empty).as("t")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).isNullAt(0))
  }
}
