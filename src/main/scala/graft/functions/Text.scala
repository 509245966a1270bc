package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, token counting, n-gram shingling, MinHash signatures,
  * language ID, quality scoring, and document fingerprinting.
  *
  * Everything here is composed from native Spark functions / higher-order
  * functions, so it runs inside whole-stage codegen with no UDFs and no
  * driver-side state — each row is independent, which is what lets these
  * scale linearly to 100 TB document sets.
  */
object Text {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-ish token count: runs of letters, runs of digits,
    * and single non-alphanumeric marks each count as one token —
    * approximates byte-pair-encoding token inflation for budget
    * estimates without a vocab file. Takes a column NAME (the regex
    * runs via a SQL expression). */
  def bpeIshCount(textCol: String): Column =
    size(expr(
      s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
      .cast("long")

  /** Word n-grams over a token array (empty when fewer than n tokens). */
  def wordNgrams(toks: Column, n: Int): Column =
    WordNgrams.column(toks, n)

  /** HOF formulation of [[wordNgrams]] — three interpreted lambdas per
    * gram; kept as the differential oracle for the native expression. */
  def wordNgramsHof(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Longest run of equal adjacent elements after sorting — i.e. the
    * max multiplicity of any element. Per-row HOF fold (no shuffle);
    * empty arrays give 0. */
  def maxMultiplicity(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition signals, per row:
    *  - duplicate-token fraction: 1 - distinct/total tokens;
    *  - top-bigram fraction: the most frequent word bigram's share of
    *    all bigrams.
    * High values flag boilerplate/spam documents. Pure projections —
    * the whole quality pass stays a narrow map over the scan. */
  def dupTokenFrac(toks: Column): Column =
    round(lit(1.0) -
      size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1)), 4)

  def topBigramFrac(toks: Column): Column = {
    val bg = wordNgrams(toks, 2)
    round(maxMultiplicity(bg).cast("double") /
      greatest(size(bg), lit(1)), 4)
  }

  /** Per-token xxhash64 of the whitespace tokens. The long-array form is
    * the fast currency for shingling/minhash/simhash: each token string
    * is hashed exactly once, and everything downstream is fixed-width
    * long arithmetic. Keep this in its own projection (referenced >1
    * time, CollapseProject then materialises it once per row). */
  def tokenHashes(text: Column): Column =
    transform(split(text, "\\s+"), t => xxhash64(t))

  /** Hashed word n-grams from a token-hash array: gram hash = xxhash64
    * fold of the n member hashes (shifted slices + zip_with — no
    * per-position string allocation, no quadratic rehash). */
  def gramHashes(th: Column, n: Int): Column = {
    val m = size(th) - (n - 1)
    val folded = (2 to n).foldLeft(slice(th, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(th, lit(j), m), (a, b) => xxhash64(a, b))
    }
    when(m <= 0, array().cast("array<long>")).otherwise(folded)
  }

  /** Character k-gram shingles of a string column (by NAME — substring
    * with a lambda-bound position is SQL-expression-only). */
  def charShingles(textCol: String, k: Int): Column =
    expr(s"transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), " +
      s"i -> substring($textCol, i, $k))")

  /** One MinHash lane: min over the shingle set of a salted xxhash64.
    * Salting with the lane index gives k independent hash functions
    * without 64-bit modular arithmetic. */
  def minhashLane(shingles: Column, lane: Int): Column =
    coalesce(
      array_min(transform(shingles, s => xxhash64(s, lit(lane)))),
      lit(Long.MaxValue))

  /** Full MinHash signature (k lanes) of a shingle array. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i => minhashLane(shingles, i)): _*)

  /** Rolling-hash document fingerprint: the minimum salted hash over
    * char-8-gram shingles (one-lane MinHash == winnowing-style content
    * fingerprint, stable under small reorderings of unrelated docs). */
  def fingerprint(textCol: String): Column =
    minhashLane(charShingles(textCol, 8), 0)

  /** Portable variant of [[fingerprint]]: the same shingle→min pipeline
    * with md5 as the lane hash. md5 hex is bit-identical across engines,
    * so a DuckDB oracle can recompute it exactly; the xxhash64 lane
    * above stays the production fast path (codegen'd, no hex strings). */
  def fingerprintPortable(textCol: String): Column =
    array_min(transform(charShingles(textCol, 8), s => md5(s)))

  /** Portable k-lane MinHash signature: lane i = min md5(shingle∥"#i")
    * over the char-8-gram shingles, lanes joined with ':'. Same
    * signature algebra as [[minhashSignature]] (per-lane independent
    * salted min), engine-portable for oracle checks. */
  def minhashSignaturePortable(textCol: String, k: Int): Column =
    concat_ws(":", (0 until k).map { l =>
      array_min(transform(charShingles(textCol, 8),
        s => md5(concat(s, lit("#" + l)))))
    }: _*)

  /** Tiny per-language stopword inventories for the heuristic
    * language-ID below. Deliberately small: language ID at scale is a
    * scoring pass over the token array, not a model invocation. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"))

  /** Per-language hit count: distinct stopwords present. */
  def langScore(toks: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(toks), array(words.map(lit): _*)))
  }

  /** Heuristic language ID: argmax of stopword hits, 'und' when no
    * language scores > 0. Ties resolve in `stopwords` order. */
  def langId(toks: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> langScore(toks, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0 && acc === "und", lit(l)).otherwise(acc)
    }
  }

  /** Stopword ratio over all tokens (any language's stopwords). */
  def stopwordRatio(toks: Column): Column = {
    val all = stopwords.flatMap(_._2).distinct
    (size(filter(toks, t => t.isInCollection(all))).cast("double") /
      greatest(size(toks), lit(1))).cast("double")
  }

  /** Vocabulary coverage: fraction of a document's whitespace tokens
    * found in `vocab` (an in-expression literal array — suited to
    * checking against a small core vocabulary; for real tokenizer
    * vocabs join against a broadcast vocab table instead). Exact
    * integer counts under the hood; the ratio is rounded to 4 places
    * for cross-engine comparison. */
  def vocabCoverage(text: Column, vocab: Seq[String]): Column = {
    val toks = tokens(text)
    round(size(filter(toks, t => t.isInCollection(vocab))).cast("double") /
      greatest(size(toks), lit(1)), 4)
  }

  /** Canonical text normalization for dedup keys and model input:
    * lowercase, collapse all whitespace runs to single spaces, trim.
    * Pure codegen'd string ops; the regexes stay inside the
    * Java-regex ∩ RE2 subset so any engine replays them identically
    * (DuckDB: `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Aggressive normalization: [[normalize]] plus stripping every
    * character outside `[a-z0-9 ]` — the usual key for exact-dedup of
    * near-identical boilerplate where punctuation varies. */
  def normalizeAscii(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** PII redaction: emails, SSN-shaped ids, US-style phone numbers and
    * IPv4 addresses replaced by typed placeholder tags, in an order
    * that keeps the patterns from shadowing each other (SSN 3-2-4
    * before phone 3-3-4). One codegen'd regexp_replace chain per row —
    * no UDF, no dictionary state — and every pattern sits in the
    * Java-regex ∩ RE2 subset (no lookaround/backrefs) so a DuckDB or
    * Trino audit replays the exact transformation. A redaction pass at
    * corpus scale is this expression over one scan, nothing more. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<ID>")
    val phone = regexp_replace(ssn,
      "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>")
    regexp_replace(phone,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
  }

  /** Quality score in [0, 1]: length saturation, mean-token-length
    * band, stopword presence. Deterministic arithmetic on integer
    * counts — safe for cross-engine comparison after rounding. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val meanLen = (length(text).cast("double") - (nTok - 1)) /
      greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val meanScore = when(meanLen.between(3.0, 9.0), 1.0).otherwise(0.5)
    val stopScore = least(stopwordRatio(toks) * 4.0, lit(1.0))
    round(lenScore * 0.4 + meanScore * 0.3 + stopScore * 0.3, 4)
  }
}
