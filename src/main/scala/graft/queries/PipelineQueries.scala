package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text
import graft.ops.{AsOf, Chunk, Decontam, Pack, RangeJoin, Sampling}

/** Training-data pipeline operators beyond the reference's surface:
  * point-in-time (as-of) joins and deterministic sampling / dataset
  * splits. Each is oracle-checked: DuckDB's native ASOF JOIN verifies
  * [[graft.ops.AsOf]]'s union+running-last formulation (two genuinely
  * different algorithms must agree row-for-row), and the md5-keyed
  * sampling lanes replay identically in any engine.
  */
object PipelineQueries extends QueryGroup {

  /** For every click, the user's most recent purchase value at or
    * before that moment. Build side is deduped per (user_id, ts) so
    * the as-of winner is unique (see AsOf scaladoc). */
  private val asofJoin = q(
    "q_asof_join",
    """SELECT p.event_id, p.user_id, b.last_purchase
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'click') p
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, MAX(value) AS last_purchase
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) b
      |ON p.user_id = b.user_id AND p.ts >= b.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val probe = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val build = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("value").as("last_purchase"))
    AsOf.joinAsOf(probe, build, Seq("user_id"), "ts", Seq("last_purchase"))
      .select("event_id", "user_id", "last_purchase")
      .orderBy("event_id")
  }

  /** Deterministic ~16% document sample (hash-bucket Bernoulli): a
    * pure pushed-down filter, reproducible in any engine. */
  private val sampleHash = q(
    "q_sample_hash",
    """SELECT doc_id, lang FROM documents
      |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.sampleByHash(
        Tables.documents(s, d), col("doc_id"), pct256 = 0x29)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Deterministic 80/10/10 train/val/test assignment per document —
    * stable under re-runs and data growth (membership depends only on
    * the doc's own key). */
  private val trainTestSplit = q(
    "q_train_test_split",
    """SELECT doc_id,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Sampling.split(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  /** Deterministic global shuffle + sharding (Sampling.shuffleShards):
    * the oracle replays rank = md5(seed‖key) and shard = first-8-hex
    * mod n exactly, so assignment AND the within-shard order key are
    * cross-engine verified. The Spark side pays one hash shuffle +
    * per-partition sorts — no global sort barrier. */
  private val shuffleShards = q(
    "q_shuffle_shards",
    """SELECT doc_id, shard, shuffle_rank FROM (
      |  SELECT doc_id,
      |    md5('ep0' || CAST(doc_id AS VARCHAR)) AS shuffle_rank,
      |    ('0x' || substring(md5('ep0' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
      |  FROM documents)
      |ORDER BY shard, shuffle_rank""".stripMargin) { (s, d) =>
    Sampling.shuffleShards(Tables.documents(s, d), col("doc_id"), 8, "ep0")
      .select("doc_id", "shard", "shuffle_rank")
      .orderBy("shard", "shuffle_rank")
  }

  /** Exact 20-docs-per-language stratified sample, ranked by content
    * hash inside each stratum (deterministic reservoir twin). */
  private val sampleStratified = q(
    "q_sample_stratified",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang, ROW_NUMBER() OVER (
      |    PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
      |  FROM documents)
      |WHERE rk <= 20 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.stratified(
        Tables.documents(s, d), Seq("lang"), col("doc_id"), k = 20)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** All event pairs within 60s of each other (co-occurrence mining).
    * Spark runs the banded range join (hash shuffle on band ids, no
    * nested loop); the oracle is DuckDB's native inequality join — two
    * different join algorithms agreeing pair-for-pair. */
  private val rangeProx = q(
    "q_range_prox",
    """SELECT a.event_id AS id_a, b.event_id AS id_b,
      |  CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap
      |FROM events a JOIN events b
      |  ON a.event_id < b.event_id
      | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("pt"))
    RangeJoin.proximityPairs(ev, "event_id", "pt", radius = 60000000L)
      .orderBy("id_a", "id_b")
  }

  /** Deterministic importance sampling: keep probability rises with
    * document length (a stand-in for any per-row quality weight). The
    * md5-derived uniform makes the sample reproducible in any engine —
    * the oracle replays the exact membership test. */
  private val sampleWeighted = q(
    "q_sample_weighted",
    """SELECT doc_id, n_chars FROM documents
      |WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |       / 4294967296.0) < LEAST(n_chars / 1000.0, 1.0)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.sampleByWeight(
        Tables.documents(s, d), col("doc_id"),
        least(col("n_chars") / 1000.0, lit(1.0)))
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Top-2 orders by price per customer via the bounded-buffer typed
    * Aggregator (ops.TopK): partial aggregation carries at most k
    * candidates per group into the shuffle — the oracle computes the
    * same answer with the window idiom, so two different algorithms
    * must agree on every (group, rank) row. */
  private val topkGroup = q(
    "q_topk_group",
    """SELECT o_custkey, rank, o_totalprice, o_orderkey FROM (
      |  SELECT o_custkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
      |    o_totalprice, o_orderkey
      |  FROM orders)
      |WHERE rank <= 2 ORDER BY o_custkey, rank""".stripMargin) { (s, d) =>
    graft.ops.TopK.perGroup(
        Tables.orders(s, d), Seq("o_custkey"),
        "o_totalprice", "o_orderkey", k = 2)
      .orderBy("o_custkey", "rank")
  }

  /** Decontamination: corpus docs sharing a word-5-gram with the
    * "eval" slice (doc_id >= 450) — the pre-training contamination
    * check. The oracle recomputes the md5 gram sets and the overlap
    * join exactly. */
  private val decontam = q(
    "q_decontam",
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN LENGTH(ss) < 5 THEN []
      |    ELSE list_transform(generate_series(1, LENGTH(ss) - 4),
      |      i -> md5(ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2] || ' ' ||
      |               ss[i+3] || ' ' || ss[i+4])) END)) AS g
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ss
      |        FROM documents))
      |SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM g c JOIN g p ON c.g = p.g
      | AND p.doc_id >= 450 AND c.doc_id <> p.doc_id
      |GROUP BY 1, 2 ORDER BY corpus_id, probe_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Decontam.overlaps(
        docs, docs.where(col("doc_id") >= 450), "doc_id", "text", n = 5)
      .orderBy("corpus_id", "probe_id")
  }

  /** Decontamination with the boilerplate-gram cap engaged: 3-grams
    * whose corpus document frequency exceeds 5 are excluded before the
    * overlap join (at both oracle scales this genuinely bites —
    * dropping ~4% of pairs and shrinking n_shared on others — unlike
    * the rare 5-grams of q_decontam, where no hot gram reaches a probe
    * pair). Exercises the partial-aggregable DF counting + broadcast
    * anti-join path; the oracle replays the cap as a HAVING over the
    * same gram sets. */
  private val decontamCapped = q(
    "q_decontam_capped",
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN LENGTH(ss) < 3 THEN []
      |    ELSE list_transform(generate_series(1, LENGTH(ss) - 2),
      |      i -> md5(ss[i] || ' ' || ss[i+1] || ' ' || ss[i+2])) END)) AS g
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ss
      |        FROM documents)),
      |hot AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) > 5)
      |SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM g c JOIN g p ON c.g = p.g
      | AND p.doc_id >= 450 AND c.doc_id <> p.doc_id
      |WHERE c.g NOT IN (SELECT g FROM hot)
      |GROUP BY 1, 2 ORDER BY corpus_id, probe_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Decontam.overlaps(
        docs, docs.where(col("doc_id") >= 450), "doc_id", "text",
        n = 3, maxGramDf = 5)
      .orderBy("corpus_id", "probe_id")
  }

  /** Concat-then-chunk sequence packing at a 128-token budget: the
    * running stream offset runs on the distributed prefix machinery
    * (no OrderBarrier); the oracle replays the same packing with a
    * window cumsum + generate_series, so every (document, sequence)
    * slice must agree exactly — boundaries, spans, and tail. */
  private val packSeqs = q(
    "q_pack_sequences",
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(LENGTH(string_split_regex(text, '\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok,
      |    CAST(SUM(tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM t WHERE tok > 0),
      |s AS (
      |  SELECT doc_id, tok, cum, cum - tok AS strt,
      |    unnest(generate_series((cum - tok) // 128, (cum - 1) // 128)) AS seq_id
      |  FROM c)
      |SELECT doc_id, seq_id, strt AS doc_start,
      |  GREATEST(seq_id * 128, strt) - strt AS slice_start,
      |  LEAST((seq_id + 1) * 128, cum) - GREATEST(seq_id * 128, strt) AS slice_len,
      |  GREATEST(seq_id * 128, strt) - seq_id * 128 AS seq_off
      |FROM s ORDER BY doc_id, seq_id""".stripMargin) { (s, d) =>
    Pack.contiguous(
        Tables.documents(s, d)
          .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", "doc_id", budget = 128)
      .orderBy("doc_id", "seq_id")
  }

  /** Sliding 120-char chunks with 20-char overlap (retrieval/embedding
    * prep): pure narrow codegen fan-out, no shuffle; the oracle
    * replays the window arithmetic and substrings exactly. */
  private val chunkSliding = q(
    "q_chunk_sliding",
    """WITH t AS (
      |  SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS len
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, text,
      |    GREATEST(1, (len - 20 + 99) // 100) AS n FROM t),
      |e AS (
      |  SELECT doc_id, text,
      |    unnest(generate_series(0, n - 1)) AS chunk_id FROM n)
      |SELECT doc_id, chunk_id, chunk_id * 100 AS chunk_start,
      |  substring(text, CAST(chunk_id * 100 + 1 AS INT), 120) AS chunk_text
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Chunk.sliding(Tables.documents(s, d), "doc_id", "text",
        size = 120, overlap = 20)
      .orderBy("doc_id", "chunk_id")
  }

  private def sqlStops: String =
    Text.stopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")

  /** End-to-end curation pipeline — the flagship composition a corpus
    * team would actually run: token-count floor → quality scoring →
    * per-source top-5 by quality (bounded-buffer aggregator, not a
    * window) → deterministic split assignment. The oracle replays every
    * stage in SQL, with the window idiom standing in for the
    * aggregator — two different top-k algorithms must agree on the
    * final curated set, rank for rank. */
  private val curate = q(
    "q_curate",
    s"""WITH t AS (
      |  SELECT doc_id, source, text, string_split_regex(text, '\\s+') AS toks
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, source,
      |    ROUND(
      |      LEAST(CAST(LENGTH(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      |      (CASE WHEN (CAST(LENGTH(text) AS DOUBLE) - (LENGTH(toks) - 1))
      |                 / GREATEST(CAST(LENGTH(toks) AS DOUBLE), 1.0)
      |                 BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
      |      LEAST(CAST(LENGTH(list_filter(toks, x -> x IN (${sqlStops}))) AS DOUBLE)
      |            / GREATEST(LENGTH(toks), 1) * 4.0, 1.0) * 0.3, 4) AS quality,
      |    CAST(LENGTH(toks) AS BIGINT) AS n_tokens
      |  FROM t),
      |r AS (
      |  SELECT source, doc_id, quality,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
      |  FROM sc WHERE n_tokens >= 30)
      |SELECT source, rank, quality, doc_id,
      |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin) { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        Text.qualityScore(col("text")).as("quality"),
        Text.tokenCount(col("text")).as("n_tokens"))
      .where(col("n_tokens") >= 30)
    graft.ops.TopK.perGroup(scored, Seq("source"), "quality", "doc_id", k = 5)
      .withColumn("split", Sampling.split(col("doc_id")))
      .orderBy("source", "rank")
  }

  /** Z-order layout (ops.Layout): Morton z-values over
    * (user_id, value) at 8 bits/dim — the multi-dimensional clustering
    * key a 100 TB layout job range-partitions on so parquet min/max
    * stats prune EVERY dimension. The oracle replays the scale +
    * bit-interleave arithmetic exactly (same IEEE expression order), so
    * the curve itself is hash-verified; locality benefits are measured
    * in LayoutSpec. */
  private val zorderVals = q(
    "q_zorder",
    {
      val interleave = (0 until 8).flatMap(b => Seq(
        s"(((s0 >> $b) & 1) << ${2 * b})",
        s"(((s1 >> $b) & 1) << ${2 * b + 1})")).mkString(" | ")
      s"""WITH s AS (
        |  SELECT MIN(CAST(user_id AS DOUBLE)) AS mn0, MAX(CAST(user_id AS DOUBLE)) AS mx0,
        |         MIN(CAST(value AS DOUBLE)) AS mn1, MAX(CAST(value AS DOUBLE)) AS mx1
        |  FROM events),
        |v AS (
        |  SELECT event_id,
        |    CASE WHEN mx0 - mn0 <= 0 THEN 0
        |         ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
        |           (CAST(user_id AS DOUBLE) - mn0) / (mx0 - mn0) * 255) AS BIGINT)))
        |    END AS s0,
        |    CASE WHEN mx1 - mn1 <= 0 THEN 0
        |         ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
        |           (CAST(value AS DOUBLE) - mn1) / (mx1 - mn1) * 255) AS BIGINT)))
        |    END AS s1
        |  FROM events, s)
        |SELECT event_id, CAST($interleave AS BIGINT) AS z
        |FROM v ORDER BY event_id""".stripMargin
    }) { (s, d) =>
    graft.ops.Layout.withZValue(
        Tables.events(s, d).select("event_id", "user_id", "value"),
        Seq("user_id", "value"), bits = 8)
      .select(col("event_id"), col("__z").as("z"))
      .orderBy("event_id")
  }

  /** Materialized packed sequences (Pack.sequences): the slice plan
    * joined back to the token arrays, every sequence's token stream
    * assembled in order and hash-verified as TEXT — the strongest
    * end-to-end check packing can carry (boundaries, spans, slice
    * extraction and assembly order all land in one string compare). */
  private val packText = q(
    "q_pack_text",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS toks,
      |    CAST(LENGTH(string_split_regex(text, '\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, tok,
      |    CAST(SUM(tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM t WHERE tok > 0),
      |s AS (
      |  SELECT doc_id, toks, tok, cum, cum - tok AS strt,
      |    unnest(generate_series((cum - tok) // 128, (cum - 1) // 128)) AS seq_id
      |  FROM c),
      |sl AS (
      |  SELECT seq_id, doc_id, toks,
      |    GREATEST(seq_id * 128, strt) - strt AS ss,
      |    LEAST((seq_id + 1) * 128, cum) - GREATEST(seq_id * 128, strt) AS ln,
      |    GREATEST(seq_id * 128, strt) - seq_id * 128 AS off
      |  FROM s)
      |SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ln) AS BIGINT) AS n_tokens,
      |  string_agg(array_to_string(list_slice(toks, ss + 1, ss + ln), ' '),
      |    ' ' ORDER BY off) AS seq_text
      |FROM sl GROUP BY seq_id ORDER BY seq_id""".stripMargin) { (s, d) =>
    Pack.sequences(
        Tables.documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("toks")),
        "doc_id", "toks", "doc_id", budget = 128)
      .select(col("seq_id"), col("n_docs"), col("n_tokens"),
        concat_ws(" ", col("tokens")).as("seq_text"))
      .orderBy("seq_id")
  }

  /** Corpus-LM scoring (ops.LangModel — the perplexity-filter shape):
    * unigram counts trained on the TRAIN split only, every document
    * scored by exact mean token probability (no leakage; held-out docs
    * carry genuine OOV mass). Rational arithmetic end-to-end — one
    * final IEEE division — so the oracle replays the score exactly, no
    * rounding bands needed. */
  private val lmScore = q(
    "q_lm_score",
    """WITH tr AS (
      |  SELECT text FROM documents
      |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'),
      |c AS (
      |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split_regex(text, '\s+')) AS t FROM tr)
      |  GROUP BY t),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |    CAST(SUM(COALESCE(c.c, 0)) AS BIGINT) AS hit_mass
      |  FROM tok LEFT JOIN c ON tok.t = c.t GROUP BY doc_id)
      |SELECT doc_id, n_tok, hit_mass,
      |  CAST(hit_mass AS DOUBLE)
      |    / (CAST(n_tok AS DOUBLE) * CAST(total AS DOUBLE)) AS mean_prob
      |FROM sc, tot ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val counts = graft.ops.LangModel.unigramCounts(
      docs.where(Sampling.split(col("doc_id")) === "train"), "text")
    graft.ops.LangModel.scoreMeanProb(docs, "doc_id", "text", counts)
      .orderBy("doc_id")
  }

  /** Bloom-pruned semi join (ops.Bloom): a fixed-size filter over the
    * qualifying customer keys probes the orders scan in codegen, so
    * non-matching orders die before the join's shuffle; the exact semi
    * join re-checks survivors, making the result bit-identical to the
    * plain semi join the oracle runs (fpp only changes how much the
    * scan prunes, never the answer). */
  private val bloomSemi = q(
    "q_bloom_semi",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN
      |  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).where(col("c_acctbal") > 5000)
    graft.ops.Bloom.semiPruned(
        Tables.orders(s, d), "o_custkey", cust, "c_custkey",
        expectedItems = 1 << 16)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Bloom-short-circuited anti join — the decontamination calling
    * shape (keep only corpus rows NOT matching a key set): rows the
    * filter proves absent are emitted without touching the join; only
    * Bloom "maybe" rows pay the exact anti join. */
  private val bloomAnti = q(
    "q_bloom_anti",
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    graft.ops.Bloom.antiPruned(
        Tables.orders(s, d), "o_custkey", cust, "c_custkey",
        expectedItems = 1 << 16)
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }

  /** Snapshot diff between two corpus versions (ops.SnapshotDiff): the
    * "new" snapshot is a deterministic mutation of documents (drops,
    * text edits, additions), and DuckDB replays both the mutation and
    * the digest compare, hash-verifying the full added/removed/changed
    * classification. */
  private val snapshotDiff = q(
    "q_snapshot_diff",
    """WITH o AS (SELECT doc_id,
      |    md5(CAST(length(text) AS VARCHAR) || ':' || text) AS dg
      |  FROM documents),
      |base AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0),
      |adds AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 23 = 0),
      |n AS (SELECT doc_id,
      |    md5(CAST(length(text) AS VARCHAR) || ':' || text) AS dg
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM adds))
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.dg IS NULL THEN 'added'
      |       WHEN n.dg IS NULL THEN 'removed'
      |       WHEN o.dg <> n.dg THEN 'changed' END AS change,
      |  o.dg AS old_digest, n.dg AS new_digest
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |WHERE (o.dg IS NULL OR n.dg IS NULL OR o.dg <> n.dg)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val neu = docs.where(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(docs.where(col("doc_id") % 23 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
    graft.ops.SnapshotDiff.diff(docs, neu, "doc_id", Seq("text"))
      .orderBy("doc_id")
  }

  /** Corpus mixing to target language proportions (ops.Mix): per-group
    * counts → keep-rates (T = min n_g/t_g, scarcest group kept whole)
    * → deterministic md5-lane sample. DuckDB replays the rate
    * arithmetic AND the hash lane bit-exactly, so the oracle verifies
    * the whole mix — rates, feasibility cap, and row membership. */
  private val mixProportions = q(
    "q_mix",
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |t(lang, tf) AS (VALUES ('en', 0.6), ('de', 0.2), ('fr', 0.2)),
      |j AS (SELECT c.lang, c.n, t.tf, CAST(c.n AS DOUBLE) / t.tf AS cap
      |      FROM c JOIN t ON c.lang = t.lang),
      |tt AS (SELECT MIN(cap) AS tmin FROM j),
      |r AS (SELECT lang,
      |        LEAST(1.0, tf * (SELECT tmin FROM tt) / CAST(n AS DOUBLE))
      |          AS rate FROM j)
      |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
      |WHERE (('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |       / 4294967296.0) < r.rate
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    graft.ops.Mix.toProportions(
        Tables.documents(s, d).select("doc_id", "lang"), "lang",
        col("doc_id"), Map("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2))
      .orderBy("doc_id")
  }

  /** α-temperature mix (Mix.temperature, α = 0.5): targets p ∝ n^0.5
    * from the data itself; the normaliser cancels, so the oracle
    * replays `rate = min_h(n_h^0.5) · n^-0.5` (min, not sum — order-
    * free IEEE) plus the md5 membership lane bit-exactly. */
  private val mixTemperature = q(
    "q_mix_temperature",
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |m AS (SELECT MIN(POWER(CAST(n AS DOUBLE), 0.5)) AS mv FROM c),
      |r AS (SELECT lang,
      |        LEAST(1.0, (SELECT mv FROM m) * POWER(CAST(n AS DOUBLE), -0.5))
      |          AS rate FROM c)
      |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
      |WHERE (('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |       / 4294967296.0) < r.rate
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    graft.ops.Mix.temperature(
        Tables.documents(s, d).select("doc_id", "lang"), "lang",
        col("doc_id"), alpha = 0.5)
      .orderBy("doc_id")
  }

  def defs = Seq(asofJoin, sampleHash, trainTestSplit, sampleStratified,
    sampleWeighted, rangeProx, topkGroup, decontam, decontamCapped,
    packSeqs, chunkSliding, curate, zorderVals, packText, lmScore,
    bloomSemi, bloomAnti, snapshotDiff, mixProportions, shuffleShards,
    mixTemperature)
}
