package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and
  * document fingerprinting. All are pure `Column` expressions — no UDFs,
  * so every operator stays inside whole-stage codegen and needs zero
  * shuffles (per-row work scales embarrassingly to any corpus size).
  *
  * Determinism contract: each function must be exactly reproducible in
  * portable SQL (the DuckDB oracle), so hashing is built on md5 (byte-
  * identical across engines) rather than engine-native hash functions,
  * and ratios are exact int/int double divisions.
  */
object TextFunctions {

  /** Unicode NFC normalization (native codegen kernel — see
    * [[graft.plans.NfcNormalizeExpr]]): decomposed accent sequences
    * compose to the canonical form, so byte-identical content can't
    * evade digest-based dedup gates via representation. */
  def nfc(text: Column): Column = call_function("graft_nfc", text)

  /** Canonical text cleanup — the normalize-first step every corpus
    * pass shares: NFC compose, strip zero-width/soft-hyphen code
    * points (ZWSP, BOM/ZWNBSP, soft hyphen), collapse whitespace runs
    * to one space, trim. Character classes are spelled as explicit
    * code-point lists so the Java-regex (Spark) and RE2 (DuckDB
    * oracle) semantics coincide. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(text), "[\\u200B\\uFEFF\\u00AD]", ""),
      "[ \t\r\n]+", " "))

  /** Markup/boilerplate strip — the extract-text step a web-scraped
    * corpus runs before any other pass: drop <script>/<style> blocks
    * WITH their contents (code is not prose), replace every remaining
    * tag with a space (block boundaries must not glue words), decode
    * the five core entities plus &nbsp;, collapse whitespace, trim.
    * Regex-only on purpose: portable to the DuckDB oracle (RE2 — so
    * script/style are spelled without backreferences), shuffle-free,
    * codegen'd. `&amp;` decodes LAST (standard order: a literal
    * "&amp;lt;" yields "&lt;", not "<"). */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)</?[A-Za-z!][^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "[ \t\r\n]+", " "))
  }

  /** SQL spelling of [[stripMarkup]] over a text expression, same
    * regexes under RE2. */
  def stripMarkupSql(textE: String): String = {
    val steps = Seq(
      ("(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
      ("(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
      ("(?s)<!--.*?-->", " "),
      ("(?s)</?[A-Za-z!][^>]*>", " "),
      ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
      ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"))
    val inner = steps.foldLeft(textE) { case (e, (p, v)) =>
      s"regexp_replace($e, '${p.replace("'", "''")}', '${v.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($inner, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * other non-space chars — the standard pre-tokenizer shape used to
    * approximate LLM token counts without a vocab. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Exact ratio helpers: int/int → double division is bit-identical
    * across engines for identical operands. */
  private def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast(DoubleType) / den.cast(DoubleType))

  def punctRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "[\\.,!\\?;:]", "")), length(text))

  def digitRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "[0-9]", "")), length(text))

  def upperRatio(text: Column): Column =
    ratio(length(text) - length(regexp_replace(text, "[A-Z]", "")), length(text))

  /** Mean characters per whitespace token. */
  def meanTokenLen(text: Column): Column =
    ratio(length(regexp_replace(trim(text), "\\s+", "")), tokenCount(text))

  /** Per-language stopword markers for the language-ID heuristic.
    * Order matters: ties resolve by list order (en first). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "y", "es", "los"))

  /** Count of hits of any marker word for one language (token-exact:
    * split + filter + size — portable to SQL via list_filter). */
  /** Marker hits from a staged lowercase-tokens column (hot path). */
  def markerHitsOf(ltoks: Column, markers: Seq[String]): Column =
    size(filter(ltoks, t => t.isInCollection(markers)))

  def markerHits(text: Column, markers: Seq[String]): Column =
    markerHitsOf(tokens(lower(text)), markers)

  /** N-gram/stopword heuristic language ID from a staged lowercase-
    * tokens column: argmax of marker hits with deterministic tie-break
    * by [[LangMarkers]] order (when() chains evaluate top-down, so the
    * first language is checked first); no hits at all → 'unknown'. */
  def langIdOf(ltoks: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHitsOf(ltoks, ms) }
    val best = greatest(hits.map(_._2): _*)
    hits.reverse.foldLeft(lit("unknown"): Column) { case (els, (lang, h)) =>
      when(h > 0 && h === best, lit(lang)).otherwise(els)
    }
  }

  def langId(text: Column): Column = langIdOf(tokens(lower(text)))

  /** Composite quality score in [0,1]: rewards mid-length docs and
    * stopword presence, penalizes punctuation/digit/upper noise. The
    * exact formula is arbitrary (as in any production quality filter);
    * what matters is that it is deterministic and portable. */
  def qualityScoreOf(text: Column, toks: Column, ltoks: Column): Column = {
    val ntok = size(toks).cast(DoubleType)
    val lengthTerm = least(ntok / lit(64.0), lit(1.0))
    // guard ntok=0: an unguarded x/0 is null, and null-skipping least()
    // would hand empty documents FULL stopword credit (quality 0.6)
    val stopTerm = when(ntok === 0, lit(0.0)).otherwise(
      least(markerHitsOf(ltoks, LangMarkers.flatMap(_._2)).cast(DoubleType) / ntok * 4.0, lit(1.0)))
    val noise = punctRatio(text) + digitRatio(text) + upperRatio(text)
    round(greatest(lit(0.0), least(lit(1.0),
      lit(0.4) * lengthTerm + lit(0.4) * stopTerm + lit(0.2) * (lit(1.0) - noise))), 6)
  }

  def qualityScore(text: Column): Column =
    qualityScoreOf(text, tokens(text), tokens(lower(text)))

  /** PII-style redaction (emails, URLs, IPv4) — the scrub pass every
    * training-data pipeline runs before export. Patterns are written in
    * the common subset of Java regex (Spark) and RE2 (DuckDB oracle):
    * character classes, bounded repeats, and ASCII `\b` only, so both
    * engines match byte-identically. Pure codegen'd `regexp_replace` —
    * per-row work, no shuffle, linear at any corpus size. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[A-Za-z0-9./_-]+"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Matches of one redaction pattern (count BEFORE redacting). */
  def redactionCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails → [EMAIL], then URLs → [URL], then IPv4 → [IP].
    * Order matters and is part of the contract: an IP inside a URL is
    * absorbed by [URL], never double-redacted. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        UrlPattern, "[URL]"),
      Ipv4Pattern, "[IP]")

  /** Duplicate-n-gram fraction (Gopher-style repetition signal): the
    * fraction of shingles that are repeats of an earlier one. 0 = no
    * repetition, →1 = the document is one phrase looping. Pass a BOUND
    * shingles column (see [[wordShinglesOf]] PERF CONTRACT). */
  def dupNgramRatio(shingles: Column): Column =
    ratio(size(shingles) - size(array_distinct(shingles)), size(shingles))

  /** First `n` hex chars of md5 → LONG. Spark side uses the native
    * `conv` expression (single codegen-able op); the DuckDB oracle
    * spells the identical value as a positional digit fold (DuckDB has
    * no conv) — same integer for any hex string. n ≤ 15 keeps the value
    * inside a signed 64-bit long. */
  def md5Long(c: Column, n: Int = 8): Column = {
    require(n <= 15, "n>15 overflows signed long")
    conv(substring(md5(c), 1, n), 16, 10).cast(LongType)
  }
  /** SQL twin of [[md5Long]] for the DuckDB oracle. The md5 hex prefix
    * is STAGED through a one-element-list lambda binding (`[h]` →
    * `__mh`) before the positional digit fold: DuckDB, like Spark's
    * interpreted HOFs, re-evaluates a lambda's input expression per
    * element access, so the naive fold would compute `md5($e)` once per
    * digit — n× the hash work for the identical value. Inside
    * per-shingle lambdas (winnow/minhash oracles) that factor
    * multiplied into minutes of DuckDB time per query. */
  def md5LongSql(e: String, n: Int = 8): String =
    s"list_transform([substring(md5($e), 1, $n)], __mh -> " +
      s"list_reduce(list_transform(range(1, ${n + 1}), i -> " +
      s"CAST(strpos('0123456789abcdef', substring(__mh, CAST(i AS INT), 1)) - 1 AS BIGINT)), " +
      s"(acc, x) -> acc * 16 + x))[1]"

  /** Word k-shingles from an already-materialized tokens column.
    *
    * PERF CONTRACT: pass a *bound column* (staged via `.withColumn`),
    * never an expression tree — higher-order functions evaluate
    * interpreted, so an inlined `split()` here would be re-executed for
    * every element access (measured 1000× slowdowns). Staging between
    * projections keeps each array computed once per row; Catalyst's
    * CollapseProject leaves multi-referenced non-cheap aliases alone. */
  def wordShinglesOf(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))

  /** Word k-shingles of raw text — convenience for tests/small data;
    * hot paths must stage tokens and call [[wordShinglesOf]]. */
  def wordShingles(text: Column, k: Int): Column =
    wordShinglesOf(tokens(text), k)

  /** Native-kernel twin of [[wordShinglesOf]]: identical values
    * (space-joined windows, concat_ws null-skipping, <k tokens → empty)
    * via the compiled `graft_shingles` loop — the interpreted HOF
    * version re-walks an expression tree per (window, element) and is
    * the dominant CPU of the shingle-based dedup family. Requires a
    * GraftExtensions session ([[graft.GraftSession]] registers it). */
  def wordShinglesNativeOf(toks: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_shingles", toks,
      org.apache.spark.sql.functions.lit(k))

  /** [[wordShinglesNativeOf]] when the kernel is registered on the
    * session, else the interpreted [[wordShinglesOf]] — identical values
    * either way, so library entry points stay usable on a plain
    * SparkSession (just slower) instead of failing analysis. */
  def wordShinglesFastOf(session: org.apache.spark.sql.SparkSession,
      toks: Column, k: Int): Column =
    if (session.catalog.functionExists("graft_shingles"))
      wordShinglesNativeOf(toks, k)
    else wordShinglesOf(toks, k)

  /** Rolling polynomial fingerprint over a tokens column:
    * fold(acc*31 + md5Long(token)) mod (2^31-1). One value per doc —
    * order-sensitive (reorderings change it), content-exact. */
  def rollingFingerprintOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 31 + pmod(md5Long(t, 8), lit(2147483647L))) % 2147483647L)

  def rollingFingerprint(text: Column): Column =
    rollingFingerprintOf(tokens(text))

  /** Winnowing-style fingerprint set (Schleimer et al., SIGMOD'03 —
    * public algorithm): hash every k-shingle, slide a window of `w`
    * hashes, keep each window's minimum, distinct + sort. Robust to
    * local edits; the standard document-fingerprint for near-dup/
    * plagiarism detection at corpus scale. Returned as a sorted array. */
  def winnowFingerprintsOf(shingles: Column, w: Int = 4): Column =
    winnowFromHashes(transform(shingles, s => md5Long(s, 8)), w)

  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    winnowFingerprintsOf(wordShingles(text, k), w)

  /** Native-kernel winnow over a SHINGLES column: hash + sliding-min +
    * distinct + sort fused into one compiled pass, identical values to
    * `winnowFromHashes(transform(sh, md5Long(_, 8)), w)` (parity
    * spec-tested; requires a GraftExtensions session). */
  def winnowNative(shingles: Column, w: Int): Column =
    call_function("graft_winnow", shingles, lit(w))

  /** Winnow from an already-staged hash column (hot path: stage
    * `transform(shingles, md5Long)` first — the sliding-window slices
    * re-read the array per window, so it must be a bound column). */
  def winnowFromHashes(hashes: Column, w: Int): Column = {
    val n = size(hashes)
    val mins = when(n === 0, array().cast(ArrayType(LongType)))
      .otherwise(when(n <= w, array(array_min(hashes)))
        .otherwise(transform(sequence(lit(1), n - (w - 1)),
          i => array_min(slice(hashes, i, lit(w))))))
    array_sort(array_distinct(mins))
  }
}
