package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis and dedup primitives for large-scale training-data
  * pipelines. Everything here is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs in the hot path) and every
  * definition has an exact ANSI-SQL twin in [[graft.SparkEntry.oracleSql]]
  * so results are cross-checkable against DuckDB at any scale factor.
  */
object TextFns {

  /** Whitespace tokens of trimmed text.
    *
    * CONVENTION: empty or whitespace-only text yields `[""]` — ONE empty
    * token — because both engines' regex split of "" returns one empty
    * element (Spark `split` and DuckDB `regexp_split_to_array` agree, so
    * every oracle replays bit-for-bit). Consequences callers rely on:
    * `tokenCount("") = 1` (a min-token quality screen never passes empty
    * docs anyway, its thresholds being >= 3), and empty docs share the
    * `hash32("")` token. Filter empty documents upstream when that
    * matters; "fixing" one engine alone would silently break parity.
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Distinct token set — the unit for Jaccard/minhash set similarity. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles from an already-materialized token array column.
    * IMPORTANT: pass a plain column reference, not the `tokens(...)`
    * expression — the lambda below references the array once per element,
    * and higher-order-function lambdas sit outside codegen subexpression
    * elimination, so an inline split would re-execute per shingle (measured
    * 15x slower at sf0.1).
    */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Convenience form over raw text; see [[shinglesOf]] for the fast path. */
  def shingles(c: Column, n: Int): Column = shinglesOf(tokens(c), n)

  /** Deterministic 32-bit token hash: the big-endian first 8 hex chars of
    * md5, as a long in [0, 2^32). Chosen over Spark's murmur `hash()` because
    * it is reproducible in any engine with an md5 function (DuckDB oracle:
    * `('0x' || substr(md5(t), 1, 8))::BIGINT`).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 8), 16, 10).cast(LongType)

  /** Document-frequency cap for shingle-hash equi-joins (contamination /
    * near-dup candidate generation): shingles present in more documents
    * than this are boilerplate and are dropped before joining — a hot
    * shingle fans out O(df^2) pairs, the classic skew killer at 100 TB.
    * The knob is a constant here so the SQL oracles can mirror it exactly.
    */
  val ShingleDfCap: Int = 50

  /** MinHash parameters: k universal-hash functions h_i(x) = (a_i*x + b_i)
    * mod P over the 32-bit token hash. a_i <= 2^19 keeps a_i * x < 2^51 —
    * exact in both long and double arithmetic, so engines agree bit-for-bit.
    * 8 permutations / 4 LSH bands of 2 rows: candidate recall ~ 1-(1-s^2)^4
    * (s = true Jaccard). Widening is just appending constants here — the
    * signature aggregate, band construction, and both SQL oracles are all
    * generated from these sequences.
    */
  val MinhashP: Long = 4294967311L // smallest prime > 2^32
  val MinhashA: Seq[Long] = Seq(131071L, 8191L, 524287L, 127L, 65537L, 4099L, 196613L, 89L)
  val MinhashB: Seq[Long] = Seq(12345L, 67890L, 424242L, 777L, 31337L, 271828L, 161803L, 55555L)
  /** LSH band layout: signature indices grouped two rows per band. */
  val MinhashBands: Seq[Seq[Int]] = MinhashA.indices.grouped(2).toSeq.map(_.toSeq)

  /** One minhash value: min over the document's distinct tokens of h_i. */
  def minhashOf(tokenHash: Column, i: Int): Column =
    pmod(tokenHash * lit(MinhashA(i)) + lit(MinhashB(i)), lit(MinhashP))

  /** Language-ID by stopword evidence: count hits from small per-language
    * marker sets, predict the argmax with a fixed precedence order
    * (en > es > de > fr > zh) for ties. A deterministic n-gram heuristic —
    * exactly reproducible in SQL, linear, shuffle-free.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "les", "des", "une", "est"),
    "zh" -> Seq("zh0", "zh1", "zh2", "zh3", "zh4")
  )

  /** Marker hits over raw tokens (frequency-weighted). */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(set, t)))
  }

  /** Marker hits over the distinct token set (presence-weighted). */
  def langScoreSet(c: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokenSet(c), t => array_contains(set, t)))
  }

  def langPredict(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, m) => lang -> langScoreSet(c, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declared precedence) achieving the max
    scores.reverse.foldLeft(lit(LangMarkers.head._1)) { case (acc, (lang, s)) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Document-quality heuristics (length / punctuation / stopword ratios),
    * combined into a [0,1] score. All ratios are single IEEE divisions of
    * exact integer counts -> deterministic across engines.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val stopHits = langScore(text, Seq("the", "a", "an", "and", "of")).cast(DoubleType)
    val meanTokLen = (nChars - (nTok - lit(1.0))) / nTok // chars net of separators
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val stopScore = least(stopHits / nTok * lit(8.0), lit(1.0))
    val tokScore = when(meanTokLen >= 3.0 && meanTokLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
    // unrounded: both engines compute the identical IEEE op sequence, and
    // round()'s half-at-boundary behavior differs between them
    lenScore * lit(0.5) + stopScore * lit(0.3) + tokScore * lit(0.2)
  }

  // ------------------------------------------------------------------
  // One-pass variants. langPredict / qualityScore above are built from
  // REPEATED references to tokens(c) / tokenSet(c), and higher-order-
  // function lambdas sit outside codegen subexpression elimination, so
  // every reference re-runs the regex split (and the distinct): the
  // executed q_lang_id plan carried 30 `split(trim(text))` per row and
  // the filter-funnel flag projection 42 (+30 array_distinct). The
  // variants below compute the same values in ONE tokens() pass via
  // aggregate(): everything downstream lives in the finish lambda,
  // where the accumulator is a BOUND variable — free to reference —
  // rather than a re-evaluated subtree. Values are bit-identical to the
  // originals (same counts, same IEEE op order), which the DuckDB
  // oracle gate pins at every scale factor.

  /** All language markers, flattened in declared order; presence of
    * marker i is bit i of the one-pass accumulator mask. Markers must be
    * globally unique across languages — the mask position IS the marker
    * identity (they are: 25 distinct words).
    */
  private val AllMarkers: Seq[String] = LangMarkers.flatMap(_._2)
  require(AllMarkers.distinct.size == AllMarkers.size,
    "LangMarkers must be globally unique for the mask encoding")
  private val LangBitOffsets: Seq[Int] =
    LangMarkers.map(_._2.size).scanLeft(0)(_ + _)

  /** The marker-presence bit of one token (0 when not a marker). */
  private def markerBit(t: Column): Column = {
    val pos = array_position(array(AllMarkers.map(lit): _*), t) // 0 = absent
    when(pos > 0, call_function("shiftleft", lit(1L), (pos - 1).cast(IntegerType)))
      .otherwise(lit(0L))
  }

  /** Presence-weighted per-language scores off a marker mask: popcount of
    * the language's bit slice via fixed shifts. Identical counts to
    * [[langScoreSet]] — OR-ing per-token bits dedups exactly like the
    * token-set distinct.
    */
  private def langScoresFromMask(mask: Column): Seq[(String, Column)] =
    LangMarkers.zipWithIndex.map { case ((lang, m), li) =>
      lang -> m.indices
        .map(j => shiftright(mask, LangBitOffsets(li) + j).bitwiseAND(lit(1L)))
        .reduce(_ + _)
    }

  /** `langPredict(c) === LangMarkers.head._1` in one tokens() pass. */
  def langPredictIsFirst(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => acc.bitwiseOR(markerBit(t)),
      mask => {
        val scores = langScoresFromMask(mask)
        // the head language wins every tie it is part of, so "predicted
        // head" is exactly "head's score >= every other score"
        scores.tail.map(_._2).map(scores.head._2 >= _).reduce(_ && _)
      })

  /** [[qualityScore]] in one tokens() pass: the token count (low half)
    * and stopword hits (high half) accumulate PACKED into one long — a
    * struct accumulator allocates a row per token and measured 2.4×
    * slower than the original at sf0.1; long arithmetic is free. The
    * finish lambda replays the identical IEEE op sequence on the
    * unpacked counts (both bounded by the doc's token count — no
    * overflow across the halves).
    */
  def qualityScoreOnePass(text: Column): Column = {
    val stopSet = array(LangMarkers.head._2.map(lit): _*)
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + when(array_contains(stopSet, t), lit(4294967297L)) // 2^32 + 1
        .otherwise(lit(1L)),
      acc => {
        val nTok = acc.bitwiseAND(lit(0xffffffffL)).cast(DoubleType)
        val nChars = length(text).cast(DoubleType)
        val stopHits = shiftright(acc, 32).cast(DoubleType)
        val meanTokLen = (nChars - (nTok - lit(1.0))) / nTok
        val lenScore = least(nTok / lit(64.0), lit(1.0))
        val stopScore = least(stopHits / nTok * lit(8.0), lit(1.0))
        val tokScore =
          when(meanTokLen >= 3.0 && meanTokLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
        lenScore * lit(0.5) + stopScore * lit(0.3) + tokScore * lit(0.2)
      })
  }

  /** `tokenCount(c) BETWEEN lo AND hi` in one tokens() pass (the plain
    * form references — and so re-splits — the text twice).
    */
  def tokenCountBetween(c: Column, lo: Int, hi: Int): Column =
    aggregate(tokens(c), lit(0L), (n, _) => n + lit(1L),
      n => n >= lit(lo.toLong) && n <= lit(hi.toLong))

  /** PII patterns (the scrubbing pass of public training-data pipelines:
    * Dolma §4.1, FineWeb), in redaction-precedence order — email first so
    * a digit-bearing local part can never later be re-matched as a phone.
    * Restricted to the Java-regex ∩ RE2 common subset (explicit `[0-9]`
    * classes, `\b` ASCII anchors, no lookaround, no backreferences) so the
    * DuckDB oracle runs the semantically identical automaton; the
    * redacted-text md5 in `q_pii_screen` cross-checks the match SPANS, not
    * just the counts.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b",
    "ipv4"  -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  )

  /** Non-overlapping occurrence count of one PII category. */
  def piiCount(c: Column, pattern: String): Column = regexp_count(c, lit(pattern))

  /** Replace every PII span with a `<category>` sentinel, categories
    * applied in [[PiiPatterns]] order. Pure codegen'd `regexp_replace`
    * chain — linear per row, shuffle-free, safe inside any scan.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (cat, p)) => regexp_replace(acc, p, s"<$cat>") }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text — the
    * exact-dedup key. `fingerprintBucket` is its top-16-bit shard, the
    * partition key a 100 TB dedup would shuffle on.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))).cast(BinaryType))

  def fingerprintBucket(text: Column): Column =
    conv(substring(fingerprint(text), 1, 4), 16, 10).cast(LongType)
}
