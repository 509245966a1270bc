package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text
import graft.ops.Dedup

/** Training-data text operators over the documents/events tables:
  * token counting, quality scoring, language ID, fingerprinting, and
  * the dedup family. SQL-expressible ones carry DuckDB oracles; the
  * hash-based ones (xxhash64 signatures) are rows-only and covered by
  * ScalaTest invariants instead.
  */
object TextQueries extends QueryGroup {

  /** Token counting — whitespace + BPE-ish regex counts. */
  private val tokenCount = q(
    "q_token_count",
    """SELECT doc_id,
      |  CAST(LENGTH(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.tokenCount(col("text")).as("n_tokens"),
      Text.bpeIshCount("text").as("n_bpeish"),
      col("n_chars"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals: duplicate-token fraction and the
    * top bigram's share — boilerplate/spam flags computed as pure
    * per-row projections; the oracle recomputes both via explode +
    * group-by. */
  private val repMetrics = q(
    "q_rep_metrics",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ss
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, ss,
      |    CASE WHEN LENGTH(ss) < 2 THEN []
      |    ELSE list_transform(generate_series(1, LENGTH(ss) - 1),
      |         i -> ss[i] || ' ' || ss[i+1]) END AS bg
      |  FROM t),
      |bgc AS (
      |  SELECT doc_id AS bid, MAX(c) AS max_bg, CAST(SUM(c) AS BIGINT) AS n_bg
      |  FROM (SELECT doc_id, g, COUNT(*) AS c
      |        FROM (SELECT doc_id, unnest(bg) AS g FROM b)
      |        GROUP BY doc_id, g)
      |  GROUP BY doc_id)
      |SELECT t.doc_id,
      |  ROUND(1.0 - CAST(LENGTH(list_distinct(t.ss)) AS DOUBLE)
      |        / GREATEST(LENGTH(t.ss), 1), 4) AS dup_tok_frac,
      |  ROUND(CAST(COALESCE(bgc.max_bg, 0) AS DOUBLE)
      |        / GREATEST(COALESCE(bgc.n_bg, 0), 1), 4) AS top_bigram_frac
      |FROM t LEFT JOIN bgc ON t.doc_id = bgc.bid
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = Text.tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.dupTokenFrac(toks).as("dup_tok_frac"),
      Text.topBigramFrac(toks).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Quality scoring — length saturation + mean token length band +
    * stopword ratio (SURVEY north-star text analysis). */
  private val quality = q(
    "q_text_quality",
    s"""WITH t AS (
      |  SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  ROUND(
      |    LEAST(CAST(LENGTH(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      |    (CASE WHEN (CAST(LENGTH(text) AS DOUBLE) - (LENGTH(toks) - 1))
      |               / GREATEST(CAST(LENGTH(toks) AS DOUBLE), 1.0)
      |               BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
      |    LEAST(CAST(LENGTH(list_filter(toks, x -> x IN (${sqlStops}))) AS DOUBLE)
      |          / GREATEST(LENGTH(toks), 1) * 4.0, 1.0) * 0.3, 4) AS quality
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  private def sqlStops: String =
    Text.stopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")

  /** Heuristic language ID — stopword-hit argmax (ties → declaration
    * order, no hits → 'und'). */
  private val langId = q(
    "q_lang_id",
    {
      val scores = Text.stopwords.map { case (l, ws) =>
        l -> s"LENGTH(list_intersect(list_distinct(toks), [${ws.map(w => s"'$w'").mkString(", ")}]))"
      }
      val best = scores.map(_._2).reduce((a, b) => s"GREATEST($a, $b)")
      val caseChain = scores.map { case (l, s) =>
        s"WHEN $s = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, $best AS best FROM t)
        |SELECT doc_id, CASE $caseChain ELSE 'und' END AS lang_guess
        |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.langId(Text.tokens(col("text"))).as("lang_guess"))
      .orderBy("doc_id")
  }

  /** Exact dedup over real duplicates (events.props: ~100 distinct
    * payloads over 10k rows): digest → keep-min-id + multiplicity. */
  private val dedupExactProps = q(
    "q_dedup_exact_props",
    """SELECT md5(props) AS content_hash, MIN(event_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM events GROUP BY content_hash ORDER BY keep_id""".stripMargin) {
    (s, d) =>
      Dedup.exact(Tables.events(s, d), "event_id", "props")
        .orderBy("keep_id")
  }

  /** Exact dedup on documents (no duplicates in testdata — the
    * all-singleton result is itself the assertion). */
  private val dedupExactDocs = q(
    "q_dedup_exact_docs",
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY content_hash ORDER BY keep_id""".stripMargin) {
    (s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id")
  }

  /** n-gram Jaccard similarity, all pairs over a bounded slice —
    * the exact near-dup verifier (word 3-grams). */
  private val ngramJaccard = q(
    "q_ngram_jaccard",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ss
      |  FROM documents WHERE doc_id < 25),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN LENGTH(ss) < 3 THEN []
      |      ELSE list_transform(generate_series(1, LENGTH(ss) - 2),
      |           i -> ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2]) END) AS gs
      |  FROM t)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  ROUND(CAST(LENGTH(list_intersect(a.gs, b.gs)) AS DOUBLE)
      |        / GREATEST(LENGTH(list_distinct(a.gs || b.gs)), 1), 4) AS jaccard
      |FROM g a JOIN g b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.ngramJaccardPairs(
      Tables.documents(s, d).filter(col("doc_id") < 25), "doc_id", "text")
      .orderBy("id_a", "id_b")
  }

  /** MinHash signatures, portable md5 lanes — the DuckDB oracle
    * recomputes lane i = min md5(8-gram∥"#i") exactly, so the whole
    * shingle→salted-min signature pipeline is hash-verified. The
    * production xxhash64 signature (Dedup.withSignature) is the same
    * algebra with a codegen'd hash; it is differential-tested against
    * an HOF oracle in DedupSpec. */
  private val minhashSig = q(
    "q_minhash_sig",
    """WITH sh AS (
      |  SELECT doc_id, list_transform(
      |    range(1, greatest(length(text) - 7, 1) + 1),
      |    i -> substring(text, i, 8)) AS ss
      |  FROM documents)
      |SELECT doc_id AS id,
      |  list_aggregate(list_transform(ss, s -> md5(s || '#0')), 'min') || ':' ||
      |  list_aggregate(list_transform(ss, s -> md5(s || '#1')), 'min') || ':' ||
      |  list_aggregate(list_transform(ss, s -> md5(s || '#2')), 'min') || ':' ||
      |  list_aggregate(list_transform(ss, s -> md5(s || '#3')), 'min') AS sig
      |FROM sh ORDER BY id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id").as("id"),
        Text.minhashSignaturePortable("text", 4).as("sig"))
      .orderBy("id")
  }

  /** DuckDB replay of the PRODUCTION xxhash64 simhash pipeline
    * (Dedup.simhashNearDups, radius 4): XXH64 token hashes →
    * strict-majority bit votes → 4×16-bit bands → Hamming verify. */
  private def simhashXxSql: String = {
    import XxSql._
    val tok =
      s"SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t FROM documents"
    val th = stagedSelect(tok, hashBytesStages("t", BigInt(42), "x_"),
      Seq("doc_id", "x_out AS h"))
    s"""WITH th AS ($th),
       |bits AS (
       |  SELECT doc_id, j,
       |    CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE 0 END) * 2 > COUNT(*)
       |         THEN (CAST(1 AS UBIGINT) << j) ELSE CAST(0 AS UBIGINT) END AS bit
       |  FROM th, generate_series(0, 63) s(j)
       |  GROUP BY doc_id, j),
       |sh AS (SELECT doc_id, CAST(SUM(bit) AS UBIGINT) AS sh FROM bits GROUP BY doc_id),
       |band AS (
       |  SELECT doc_id, sh, j AS band, (sh >> (j*16)) & 65535 AS bucket
       |  FROM sh, generate_series(0, 3) s(j))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  MIN(CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT)) AS hamming
       |FROM band a JOIN band b
       |  ON a.doc_id < b.doc_id AND a.band = b.band AND a.bucket = b.bucket
       |GROUP BY 1, 2
       |HAVING hamming <= 4
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replay of the PRODUCTION xxhash64 MinHash+LSH pipeline
    * (Dedup.minhashNearDups, k=16, bands=4, minJaccard=0.2): XXH64
    * token hashes → word-3-gram XXH64 folds → distinct gram sets → 16
    * salted lanes (hashInt∘hashLong, signed mins, MaxValue when empty)
    * → per-band bucket = XXH64(band:int, csv-of-lanes:string) → bucket
    * join → exact Jaccard ≥ 0.2. */
  private def minhashXxSql: String = {
    import XxSql._
    val maxLong = "9223372036854775807"
    val tok =
      s"""SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t,
         |    generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
         |  FROM documents""".stripMargin
    val th = stagedSelect(tok, hashBytesStages("t", BigInt(42), "x_"),
      Seq("doc_id", "pos", "x_out AS th"))
    // gram = H(H(a,b),c) with H(x,y) = hashLong(y, hashLong(x, 42)) —
    // exactly Text.gramHashes' zip_with fold over xxhash64(a, b)
    val gramStages =
      hashLongStages("t1", "CAST(42 AS UBIGINT)", "a_") ++
        hashLongStages("t2", "a_out", "b_") ++
        hashLongStages("b_out", "CAST(42 AS UBIGINT)", "c_") ++
        hashLongStages("t3", "c_out", "g_")
    val gramsBase =
      """SELECT a.doc_id, a.th AS t1, b.th AS t2, c.th AS t3
        |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2""".stripMargin
    val grams = stagedSelect(gramsBase, gramStages, Seq("doc_id", "g_out AS g"))
    val laneExprs = (0 until 16).map(i =>
      s"${u2s(hashIntLitExpr(i, "hl_out"))} AS lane$i")
    val lanes = stagedSelect("SELECT DISTINCT doc_id, g FROM grams",
      hashLongStages("g", "CAST(42 AS UBIGINT)", "hl_"),
      Seq("doc_id", "g") ++ laneExprs)
    val mins = (0 until 16)
      .map(i => s"COALESCE(MIN(lane$i), $maxLong) AS l$i").mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val seed = hashIntLit(b, 42L)
      val cols = (0 until 4).map(i => s"CAST(l${b * 4 + i} AS VARCHAR)").mkString(", ")
      stagedSelect(
        s"SELECT doc_id, concat_ws(',', $cols) AS bs FROM sig",
        hashBytesStages("bs", seed, "x_"),
        Seq("doc_id", s"$b AS band", "x_out AS bucket"))
    }
    val jac = """ROUND(CAST(LENGTH(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                |        / GREATEST(LENGTH(list_distinct(sa.sh || sb.sh)), 1), 4)""".stripMargin
    s"""WITH th AS ($th),
       |grams AS ($grams),
       |lanes AS ($lanes),
       |sig AS (
       |  SELECT d.doc_id, $mins
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  LEFT JOIN lanes ON d.doc_id = lanes.doc_id
       |  GROUP BY d.doc_id),
       |banded AS (${bandSelects.mkString(" UNION ALL ")}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE a.doc_id < b.doc_id),
       |shs AS (
       |  SELECT doc_id, list(DISTINCT g) AS sh FROM grams GROUP BY doc_id)
       |SELECT c.id_a, c.id_b, $jac AS jaccard
       |FROM cand c
       |JOIN shs sa ON sa.doc_id = c.id_a
       |JOIN shs sb ON sb.doc_id = c.id_b
       |WHERE $jac >= 0.2
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** MinHash+LSH near-dup candidate pairs with exact Jaccard verify.
    * Oracle (round 11): the ENTIRE xxhash64 production pipeline is
    * replayed by [[minhashXxSql]] — DuckDB recomputes Spark's XXH64
    * token hashes, the word-3-gram folds, all 16 salted signature
    * lanes, the 4 band buckets and the exact-Jaccard verify via the
    * graft.queries.XxSql mod-2^64 emulation, so the rows-only gap the
    * md5 twin used to cover is closed with ZERO production change.
    * (The oracle omits the maxBucket=1000 cap — bucket sizes at the
    * oracle SF are two orders of magnitude below it.) */
  private val minhashPairs = q("q_minhash_pairs", minhashXxSql) { (s, d) =>
    Dedup.minhashNearDups(
      Tables.documents(s, d), "doc_id", "text", minJaccard = 0.2)
      .orderBy("id_a", "id_b")
  }

  /** The ENTIRE MinHash+LSH pipeline, engine-portably (md5 lanes, md5
    * band buckets): shingle → signature → band → bucket-join → exact
    * Jaccard verify, replayed stage-for-stage by the DuckDB oracle and
    * hash-compared — the strongest cross-engine check the dedup family
    * has. Production speed lives in q_minhash_pairs (xxhash64). */
  private val minhashPairsMd5 = q(
    "q_minhash_pairs_md5",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(length(text) - 7, 1) + 1),
      |    i -> substring(text, i, 8))) AS ss
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id, ss,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#0')), 'min') AS l0,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#1')), 'min') AS l1,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#2')), 'min') AS l2,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#3')), 'min') AS l3
      |  FROM sh),
      |band AS (
      |  SELECT doc_id, ss,
      |    md5('0:' || l0 || ':' || l1) AS b0,
      |    md5('1:' || l2 || ':' || l3) AS b1
      |  FROM sig),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    ROUND(CAST(LENGTH(list_intersect(a.ss, b.ss)) AS DOUBLE)
      |          / GREATEST(LENGTH(list_distinct(a.ss || b.ss)), 1), 4) AS jaccard
      |  FROM band a JOIN band b
      |    ON a.doc_id < b.doc_id AND (a.b0 = b.b0 OR a.b1 = b.b1))
      |SELECT id_a, id_b, jaccard FROM pairs
      |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.minhashNearDupsPortable(
      Tables.documents(s, d), "doc_id", "text", minJaccard = 0.2)
      .orderBy("id_a", "id_b")
  }

  /** SimHash values + banded near-dup pairs. Oracle (round 11): DuckDB
    * replays the production 64-bit pipeline exactly — Spark XXH64 token
    * hashes via [[graft.queries.XxSql]], strict-majority bit votes,
    * 4×16-bit band buckets, Hamming verify at radius 4. */
  private val simhashPairs = q("q_simhash_pairs", simhashXxSql) { (s, d) =>
    Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text", radius = 4)
      .orderBy("id_a", "id_b")
  }

  /** The ENTIRE SimHash pipeline, engine-portably (60-bit md5-prefix
    * token hashes): tokenize → bit-vote → band → bucket-join → Hamming
    * verify, replayed stage-for-stage by the DuckDB oracle. With this
    * and q_minhash_pairs_md5, every DETERMINISTIC dedup pipeline is
    * cross-engine hash-verified; only inherently approximate (ANN),
    * sketch-based (HLL) and stub-decode (multimodal) queries remain
    * rows-only. */
  private val simhashPairsMd5 = q(
    "q_simhash_pairs_md5",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::UBIGINT AS h FROM tok),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE 0 END) * 2 > COUNT(*)
      |         THEN (1::UBIGINT << j) ELSE 0::UBIGINT END AS bit
      |  FROM th, generate_series(0, 59) s(j)
      |  GROUP BY doc_id, j),
      |sh AS (SELECT doc_id, CAST(SUM(bit) AS UBIGINT) AS sh FROM bits GROUP BY doc_id),
      |band AS (
      |  SELECT doc_id, sh, j AS band, CAST((sh >> (j*15)) & 32767 AS BIGINT) AS bucket
      |  FROM sh, generate_series(0, 3) s(j))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  MIN(CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT)) AS hamming
      |FROM band a JOIN band b
      |  ON a.doc_id < b.doc_id AND a.band = b.band AND a.bucket = b.bucket
      |GROUP BY 1, 2
      |HAVING hamming <= 8
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.simhashNearDupsPortable(
      Tables.documents(s, d), "doc_id", "text", radius = 8)
      .orderBy("id_a", "id_b")
  }

  /** Content fingerprint (char-8-gram min-hash), portable md5 lane so
    * the DuckDB oracle recomputes it exactly; the xxhash64 production
    * lane (Text.fingerprint) is spec-tested in TextSpec. */
  private val fingerprint = q(
    "q_fingerprint",
    """SELECT doc_id,
      |  list_aggregate(list_transform(
      |    range(1, greatest(length(text) - 7, 1) + 1),
      |    i -> md5(substring(text, i, 8))), 'min') AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.fingerprintPortable("text").as("fp"))
      .orderBy("doc_id")
  }

  /** Connected components over a CHAIN graph: events sharing a payload
    * are linked only to their next-id neighbour, so the duplicate
    * cluster is recoverable solely by multi-hop propagation — while the
    * truth is available in closed form (min event_id per payload hash).
    * Iterative min-label propagation vs a plain GROUP BY: two
    * completely different algorithms must agree node-for-node. */
  private val dedupClusters = q(
    "q_dedup_clusters",
    """WITH e AS (
      |  SELECT event_id, md5(props) AS h FROM events WHERE event_id < 500),
      |c AS (
      |  SELECT h, MIN(event_id) AS comp FROM e
      |  GROUP BY h HAVING COUNT(*) > 1)
      |SELECT e.event_id AS node, c.comp AS component
      |FROM e JOIN c USING (h) ORDER BY node""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).where(col("event_id") < 500)
      .select(col("event_id"), md5(col("props")).as("h"))
    val nxt = lead("event_id", 1)
      .over(Window.partitionBy("h").orderBy("event_id"))
    val edges = ev.withColumn("nxt", nxt).where(col("nxt").isNotNull)
    graft.ops.Components.connected(edges, "event_id", "nxt")
      .orderBy("node")
  }

  /** Near-dup aware corpus filter: one representative per MinHash-LSH
    * duplicate CLUSTER (not per pair — transitive closure matters when
    * A~B and B~C but A!~C). The oracle replays the portable pair
    * pipeline, then walks the pair graph with a recursive CTE to the
    * same min-id components. */
  private val dedupKeep = q(
    "q_dedup_keep",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(length(text) - 7, 1) + 1),
      |    i -> substring(text, i, 8))) AS ss
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id, ss,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#0')), 'min') AS l0,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#1')), 'min') AS l1,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#2')), 'min') AS l2,
      |    list_aggregate(list_transform(ss, s -> md5(s || '#3')), 'min') AS l3
      |  FROM sh),
      |band AS (
      |  SELECT doc_id, ss,
      |    md5('0:' || l0 || ':' || l1) AS b0,
      |    md5('1:' || l2 || ':' || l3) AS b1
      |  FROM sig),
      |edges AS (
      |  SELECT a.doc_id AS ea, b.doc_id AS eb
      |  FROM band a JOIN band b
      |    ON a.doc_id < b.doc_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
      |  WHERE CAST(LENGTH(list_intersect(a.ss, b.ss)) AS DOUBLE)
      |        / GREATEST(LENGTH(list_distinct(a.ss || b.ss)), 1) >= 0.2),
      |sym AS (SELECT ea, eb FROM edges UNION SELECT eb, ea FROM edges),
      |reach(n, r) AS (
      |  SELECT ea AS n, ea AS r FROM sym
      |  UNION
      |  SELECT e.eb, reach.r FROM reach JOIN sym e ON e.ea = reach.n),
      |comp AS (SELECT n, MIN(r) AS c FROM reach GROUP BY n)
      |SELECT doc_id, lang FROM documents
      |WHERE doc_id NOT IN (SELECT n FROM comp WHERE n <> c)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDupsPortable(docs, "doc_id", "text",
      minJaccard = 0.2)
    graft.ops.Components.keepRepresentatives(
        docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Span-level exact dedup (Dedup.duplicateSpans): maximal token
    * regions covered by corpus-recurring word 3-grams — cut the
    * boilerplate span, keep the document. The oracle replays gram
    * positions, the document-frequency cut, and the gaps-and-islands
    * merge; spans, bounds and gram counts must match row-for-row. */
  private val dupSpans = q(
    "q_dup_spans",
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ss FROM documents),
      |g AS (
      |  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
      |    SELECT doc_id, unnest(CASE WHEN LENGTH(ss) < 3 THEN []
      |      ELSE list_transform(generate_series(1, LENGTH(ss) - 2),
      |        i -> {'pos': i - 1,
      |              'h': md5(ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2])}) END) AS u
      |    FROM tok)),
      |hot AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 4),
      |d AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM hot)),
      |m AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |           OR pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 3
      |         THEN 1 ELSE 0 END AS brk
      |  FROM d),
      |i AS (SELECT doc_id, pos,
      |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM m)
      |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |  CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams
      |FROM i GROUP BY doc_id, isl
      |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
    Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text",
        n = 3, minDf = 4)
      .orderBy("doc_id", "span_start")
  }

  /** The cross-document-only variant: grams must recur in ≥2 DISTINCT
    * documents (min(doc) != max(doc), partial-aggregable in the count
    * pass) — internal repetition stays, cross-document boilerplate is
    * cut. The looser minDf=2 makes the distinctness test load-bearing:
    * within-document-only repeats pass the count cut and must be
    * excluded by the cross-doc condition alone. */
  private val dupSpansXdoc = q(
    "q_dup_spans_xdoc",
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ss FROM documents),
      |g AS (
      |  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
      |    SELECT doc_id, unnest(CASE WHEN LENGTH(ss) < 3 THEN []
      |      ELSE list_transform(generate_series(1, LENGTH(ss) - 2),
      |        i -> {'pos': i - 1,
      |              'h': md5(ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2])}) END) AS u
      |    FROM tok)),
      |hot AS (SELECT h FROM g GROUP BY h
      |        HAVING COUNT(*) >= 2 AND MIN(doc_id) <> MAX(doc_id)),
      |d AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM hot)),
      |m AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |           OR pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 3
      |         THEN 1 ELSE 0 END AS brk
      |  FROM d),
      |i AS (SELECT doc_id, pos,
      |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM m)
      |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |  CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams
      |FROM i GROUP BY doc_id, isl
      |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
    Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text",
        n = 3, minDf = 2, crossDocOnly = true)
      .orderBy("doc_id", "span_start")
  }

  /** Per-document duplicated-token fraction over the cross-doc spans —
    * the "drop documents that are mostly boilerplate" curation signal.
    * One row per input document; the ratio is a single IEEE division,
    * so the float hash replays bit-exactly. */
  private val dupRatio = q(
    "q_dup_ratio",
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS ss FROM documents),
      |g AS (
      |  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
      |    SELECT doc_id, unnest(CASE WHEN LENGTH(ss) < 3 THEN []
      |      ELSE list_transform(generate_series(1, LENGTH(ss) - 2),
      |        i -> {'pos': i - 1,
      |              'h': md5(ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2])}) END) AS u
      |    FROM tok)),
      |hot AS (SELECT h FROM g GROUP BY h
      |        HAVING COUNT(*) >= 2 AND MIN(doc_id) <> MAX(doc_id)),
      |d AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM hot)),
      |m AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |           OR pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 3
      |         THEN 1 ELSE 0 END AS brk
      |  FROM d),
      |i AS (SELECT doc_id, pos,
      |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM m),
      |spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 3 AS e
      |          FROM i GROUP BY doc_id, isl),
      |agg AS (SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS dup_tokens
      |        FROM spans GROUP BY doc_id)
      |SELECT t.doc_id, CAST(LENGTH(t.ss) AS BIGINT) AS n_tokens,
      |  COALESCE(a.dup_tokens, 0) AS dup_tokens,
      |  CASE WHEN LENGTH(t.ss) <= 0 THEN 0.0
      |       ELSE CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / LENGTH(t.ss)
      |  END AS dup_ratio
      |FROM tok t LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.duplicatedTokenRatio(Tables.documents(s, d), "doc_id", "text",
        n = 3, minDf = 2, crossDocOnly = true)
      .orderBy("doc_id")
  }

  /** Exact heavy-hitter tokens (ops.Frequent): tokens carrying ≥ 1/30
    * of all token mass, via a bounded Misra-Gries candidate pass plus
    * an exact count of only the candidates — at corpus scale the
    * groupBy never sees the full vocabulary. The integer-fraction cut
    * (cnt·30 ≥ N) replays bit-identically in DuckDB. */
  private val frequentTokens = q(
    "q_frequent_tokens",
    """WITH t AS (SELECT unnest(string_split_regex(text, '\s+')) AS value
      |           FROM documents),
      |     t2 AS (SELECT value FROM t WHERE value <> ''),
      |     n AS (SELECT COUNT(*) AS total FROM t2)
      |SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM t2, n GROUP BY value, total
      |HAVING COUNT(*) * 30 >= total
      |ORDER BY value""".stripMargin) { (s, d) =>
    // spread BEFORE the tokenize+explode so the Misra-Gries partial
    // aggregate runs cluster-wide on an unsplittable scan (r11: 0.91×)
    val toks = Tables.spreadCompute(Tables.documents(s, d))
      .select(explode(Text.tokens(col("text"))).as("value"))
      .where(col("value") =!= "")
    graft.ops.Frequent.heavyHitters(toks, "value", denom = 30L)
      .orderBy("value")
  }

  /** Canonical + aggressive text normalization (Text.normalize /
    * normalizeAscii) — the dedup-key transforms, hash-verified against
    * DuckDB replaying the identical regex chain. */
  private val normalizeText = q(
    "q_normalize",
    """SELECT doc_id,
      |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |    '\s+', ' ', 'g')) AS norm_ascii
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        Text.normalize(col("text")).as("norm"),
        Text.normalizeAscii(col("text")).as("norm_ascii"))
      .orderBy("doc_id")
  }

  /** PII redaction over synthesized contact strings (the parquet corpus
    * carries no PII, so the query builds deterministic emails, SSNs,
    * phones and IPs from customer keys, then redacts them) — DuckDB
    * replays both the synthesis and the identical regex chain, so the
    * hash gate verifies every pattern and the replacement order. */
  private val redact = q(
    "q_redact",
    """SELECT c_custkey,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    'Contact ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR)
      |      || '@example.com> ssn ' ||
      |      printf('%03d-%02d-%04d', c_custkey % 1000, c_custkey % 100,
      |             (c_custkey * 13) % 10000)
      |      || ' call ' ||
      |      printf('%03d-%03d-%04d', c_custkey % 1000, (c_custkey * 7) % 1000,
      |             (c_custkey * 13) % 10000)
      |      || ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.7',
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ID>', 'g'),
      |    '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
      |  AS redacted
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val raw = concat(
      lit("Contact "), col("c_name"),
      lit(" <user"), k.cast("string"), lit("@example.com> ssn "),
      format_string("%03d-%02d-%04d", k % 1000, k % 100, (k * 13) % 10000),
      lit(" call "),
      format_string("%03d-%03d-%04d", k % 1000, (k * 7) % 1000, (k * 13) % 10000),
      lit(" from 10.0."), (k % 256).cast("string"), lit(".7"))
    Tables.customer(s, d)
      .select(k, Text.redactPii(raw).as("redacted"))
      .orderBy("c_custkey")
  }

  /** TF/DF corpus statistics — the integer substrate of TF-IDF: per
    * (doc, token) term frequency joined with each token's corpus
    * document frequency. Both aggregates are partial-aggregable
    * groupBys whose output is vocabulary-sized (the desired artifact);
    * downstream idf/score arithmetic is a float projection over this
    * exact table. Per-doc rows windowed to a doc slice to keep the
    * oracle result bounded; df is computed over the FULL corpus. */
  private val tfdf = q(
    "q_tfdf",
    """WITH tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY doc_id, tok),
      |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok)
      |SELECT tf.doc_id, tf.tok, tf.tf, df.df
      |FROM tf JOIN df ON tf.tok = df.tok
      |WHERE tf.doc_id < 25
      |ORDER BY tf.doc_id, tf.tok""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(df, "tok")
      .where(col("doc_id") < 25)
      .select("doc_id", "tok", "tf", "df")
      .orderBy("doc_id", "tok")
  }

  /** Vocabulary coverage per document against a core vocab literal
    * (Text.vocabCoverage) — exact integer counts, ratio rounded for
    * cross-engine hash compare. */
  private val vocabCov = q(
    "q_vocab_coverage",
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |           FROM documents)
      |SELECT doc_id,
      |  ROUND(CAST(LENGTH(list_filter(toks,
      |      x -> x IN ('join', 'hash', 'row', 'scan', 'table', 'data')))
      |    AS DOUBLE) / GREATEST(LENGTH(toks), 1), 4) AS coverage
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.vocabCoverage(col("text"),
        Seq("join", "hash", "row", "scan", "table", "data")).as("coverage"))
      .orderBy("doc_id")
  }

  /** Fuzzy near-dup pairs by edit distance (Dedup.editPairs): part
    * names blocked on their first token, verified with early-abandon
    * Levenshtein, keeping near-misses (1..3 edits — exact duplicates
    * belong to the digest path). DuckDB's levenshtein is the identical
    * metric, so every pair and distance hash-matches. */
  private val editDedup = q(
    "q_edit_pairs",
    """WITH p AS (SELECT p_partkey, p_name,
      |    string_split(p_name, ' ')[1] AS blk FROM part
      |  QUALIFY row_number() OVER (PARTITION BY blk ORDER BY p_partkey) <= 64)
      |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    // maxBlock = 64 bounds each block's quadratic at 64²/2 verifies —
    // the 100 TB calling convention (the cap is deterministic in id
    // order, replayed by the oracle's QUALIFY row_number)
    Dedup.editPairs(
        Tables.part(s, d), "p_partkey", "p_name",
        block = split(col("p_name"), " ").getItem(0),
        maxDist = 3, minDist = 1, maxBlock = 64)
      .orderBy("id_a", "id_b")
  }

  /** Per-(lang, source) curation report: corpus size, quality-floor
    * pass rate, and token budget — the summary a filtering run emits.
    * Every metric derives from integer counts (pass rate = two-int
    * division, rounded identically in both engines), so the whole
    * report hash-verifies. */
  private val qualityReport = q(
    "q_quality_report",
    s"""WITH t AS (
      |  SELECT lang, source,
      |    string_split_regex(text, '\\s+') AS toks, text FROM documents),
      |s AS (SELECT lang, source,
      |    LENGTH(toks) AS tc,
      |    (ROUND(
      |      LEAST(CAST(LENGTH(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      |      (CASE WHEN (CAST(LENGTH(text) AS DOUBLE) - (LENGTH(toks) - 1))
      |                 / GREATEST(CAST(LENGTH(toks) AS DOUBLE), 1.0)
      |                 BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
      |      LEAST(CAST(LENGTH(list_filter(toks, x -> x IN (${sqlStops}))) AS DOUBLE)
      |            / GREATEST(LENGTH(toks), 1) * 4.0, 1.0) * 0.3, 4)
      |     >= 0.75) AS pass FROM t)
      |SELECT lang, source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  ROUND(SUM(CASE WHEN pass THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
      |    AS pass_rate,
      |  CAST(SUM(tc) AS BIGINT) AS total_tokens
      |FROM s GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        Text.tokenCount(col("text")).as("tc"),
        (Text.qualityScore(col("text")) >= 0.75).as("pass"))
    docs.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1).otherwise(0)).cast("long").as("n_pass"),
        round(sum(when(col("pass"), 1).otherwise(0)) * 1.0 / count(lit(1)), 4)
          .as("pass_rate"),
        sum("tc").cast("long").as("total_tokens"))
      .orderBy("lang", "source")
  }

  def defs = Seq(
    tokenCount, quality, repMetrics, langId, dedupExactProps, dedupExactDocs,
    ngramJaccard, minhashSig, minhashPairs, minhashPairsMd5, simhashPairs,
    simhashPairsMd5, fingerprint, dedupClusters, dedupKeep, dupSpans,
    dupSpansXdoc, dupRatio,
    frequentTokens, normalizeText, redact, tfdf, vocabCov, editDedup,
    qualityReport)
}
