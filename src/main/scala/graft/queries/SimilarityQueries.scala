package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Multimodal, Similarity}

/** Similarity-search and multimodal-plumbing queries over the
  * embeddings/documents tables. Brute-force cosine results carry a
  * full DuckDB oracle (identical double-precision formula on both
  * sides); the hash-bucketed variants are rows-only with recall
  * asserted in ScalaTest.
  */
object SimilarityQueries extends QueryGroup {

  /** Shared oracle scaffold: pairwise cosine in double precision. */
  private def cosineSql(qFilter: String, cFilter: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qFilter),
       |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE $cFilter),
       |p AS (
       |  SELECT qid, cid,
       |    ROUND(SUM(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))
       |      / (sqrt(SUM(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
       |       * sqrt(SUM(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))), 4) AS sim
       |  FROM q, c, generate_series(1, 64) t(i)
       |  WHERE qid <> cid GROUP BY qid, cid)""".stripMargin

  /** Brute-force cosine top-k neighbors for 5 query vectors. */
  private val cosineTopK = q(
    "q_cosine_topk",
    cosineSql("vec_id < 5", "TRUE") +
      """
        |SELECT qid, cid, sim, rk FROM (
        |  SELECT qid, cid, sim,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
        |  FROM p)
        |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
      .orderBy("qid", "rk")
  }

  /** Embedding-cosine near-duplicate pairs (threshold on rounded sim,
    * bounded slice — the exact verifier for embedding dedup). */
  private val nearDup = q(
    "q_embedding_neardup",
    cosineSql("vec_id < 200", "vec_id < 200") +
      """
        |SELECT qid AS id_a, cid AS id_b, sim FROM p
        |WHERE qid < cid AND sim >= 0.3 ORDER BY id_a, id_b""".stripMargin) {
    (s, d) =>
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.crossJoin(b)
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", round(Similarity.cosine(emb, "va", "vb"), 4))
        .filter(col("sim") >= 0.3)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a", "id_b")
  }

  /** LSH-bucketed ANN (random hyperplanes). Oracle (round 11): the
    * gaussian plane matrix is deterministic (seed 42), so its exact
    * double values are INLINED into the SQL as shortest-round-trip
    * decimals and the dot products fold sequentially (list_reduce) in
    * the same ascending order HyperplaneSignature uses — IEEE doubles
    * agree bit-for-bit, so sign bits, band buckets, candidates and the
    * rounded re-rank all replay exactly. Recall (<1 by construction)
    * stays covered by AnnRecallSpec's 0.85 floor at these parameters.
    * (The oracle omits the maxBucket=1000 cap — per-band buckets at
    * the oracle SF hold ~125 vectors.) */
  private val lshTopK = q("q_ann_lsh", lshOracleSql) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      dim = 64, k = 3, bits = 16, bands = 8)
      .orderBy("qid", "rk")
  }

  /** IVF ANN with deterministic coarse centroids. Oracle (round 11):
    * the untrained quantizer picks the first nlist corpus vectors BY ID
    * (`ORDER BY vec_id LIMIT 8` — plain SQL), and every later stage is
    * the rounded-cosine algebra the md5 twin already hash-verifies, so
    * the PRODUCTION query replays end-to-end. AnnRecallSpec's
    * recall-vs-nprobe contract is unchanged. */
  private val ivfTopK = q(
    "q_ann_ivf",
    """WITH cents AS (
      |  SELECT vec_id AS centroid_id, embedding AS centv
      |  FROM embeddings ORDER BY vec_id LIMIT 8),
      |asim AS (
      |  SELECT e.vec_id AS cid, c.centroid_id,
      |    ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.centv[i] AS DOUBLE))
      |      / (sqrt(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |       * sqrt(SUM(CAST(c.centv[i] AS DOUBLE) * CAST(c.centv[i] AS DOUBLE)))), 4) AS csim
      |  FROM embeddings e, cents c, generate_series(1, 64) t(i)
      |  GROUP BY 1, 2),
      |assigned AS (
      |  SELECT cid, centroid_id FROM (
      |    SELECT cid, centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY csim DESC, centroid_id DESC) AS rn
      |    FROM asim) WHERE rn = 1),
      |probes AS (
      |  SELECT qid, centroid_id FROM (
      |    SELECT cid AS qid, centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY csim DESC, centroid_id ASC) AS rn
      |    FROM asim WHERE cid < 5) WHERE rn <= 3),
      |cand AS (
      |  SELECT p.qid, a.cid FROM probes p JOIN assigned a USING (centroid_id)
      |  WHERE p.qid <> a.cid),
      |p AS (
      |  SELECT c.qid, c.cid,
      |    ROUND(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))
      |      / (sqrt(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
      |       * sqrt(SUM(CAST(ce.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)))), 4) AS sim
      |  FROM cand c
      |  JOIN embeddings qe ON qe.vec_id = c.qid
      |  JOIN embeddings ce ON ce.vec_id = c.cid,
      |  generate_series(1, 64) t(i)
      |  GROUP BY c.qid, c.cid)
      |SELECT qid, cid, sim, rk FROM (
      |  SELECT qid, cid, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
      |  FROM p)
      |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
      .orderBy("qid", "rk")
  }

  /** The q_ann_lsh oracle: exact gaussian plane literals (the same
    * `new Random(42)` stream Similarity.planes draws; Double.toString
    * round-trips, and DuckDB parses decimals to the nearest double) +
    * sequential per-plane dot folds + the proven rounded-cosine
    * re-rank idiom. */
  private def lshOracleSql: String = {
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val bitExprs = planes.zipWithIndex.map { case (w, j) =>
      val wl = w.map(java.lang.Double.toString).mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, 65), d ->
         |    CAST(embedding[d] AS DOUBLE) * ($wl)[d])),
         |  (acc, x) -> acc + x) >= 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }
    s"""WITH s AS (
       |  SELECT vec_id, CAST(${bitExprs.mkString(" + ")} AS BIGINT) AS sig
       |  FROM embeddings),
       |banded AS (
       |  SELECT vec_id, b AS band, (sig >> (b * 2)) & 3 AS bucket
       |  FROM s, generate_series(0, 7) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS qid, c.vec_id AS cid
       |  FROM banded a JOIN banded c ON a.band = c.band AND a.bucket = c.bucket
       |  WHERE a.vec_id < 5 AND a.vec_id <> c.vec_id),
       |p AS (
       |  SELECT cd.qid, cd.cid,
       |    ROUND(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))
       |      / (sqrt(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
       |       * sqrt(SUM(CAST(ce.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)))), 4) AS sim
       |  FROM cand cd
       |  JOIN embeddings qe ON qe.vec_id = cd.qid
       |  JOIN embeddings ce ON ce.vec_id = cd.cid,
       |  generate_series(1, 64) t(i)
       |  GROUP BY cd.qid, cd.cid)
       |SELECT qid, cid, sim, rk FROM (
       |  SELECT qid, cid, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
       |  FROM p)
       |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  /** The ENTIRE LSH ANN pipeline, engine-portably: md5-derived integer
    * hyperplanes, integer sign-bit dot over 1e4-quantized lanes, band
    * buckets, candidate join, exact double cosine re-rank — each stage
    * replayed verbatim by the DuckDB oracle and hash-compared. With
    * this twin only the gaussian-plane PRODUCTION variant (q_ann_lsh)
    * stays rows-only, covered by its measured recall floor. */
  private val lshTopKMd5 = q(
    "q_ann_lsh_md5",
    """WITH w AS (
      |  SELECT j, d,
      |    CAST(('0x' || substr(md5('pl:' || j || ':' || d), 1, 15))::UBIGINT
      |         % 2001 AS BIGINT) - 1000 AS wv
      |  FROM generate_series(0, 15) s1(j), generate_series(0, 63) s2(d)),
      |qv AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings),
      |dots AS (
      |  SELECT qv.vec_id, w.j, SUM(qv.q[w.d + 1] * w.wv) AS s
      |  FROM qv, w GROUP BY 1, 2),
      |buck AS (
      |  SELECT vec_id, j // 4 AS band,
      |    SUM(CASE WHEN s >= 0 THEN 1 ELSE 0 END * (1 << (j % 4))) AS bucket
      |  FROM dots GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
      |  FROM buck a JOIN buck b ON a.band = b.band AND a.bucket = b.bucket
      |  WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id),
      |p AS (
      |  SELECT c.qid, c.cid,
      |    ROUND(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))
      |      / (sqrt(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
      |       * sqrt(SUM(CAST(ce.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)))), 4) AS sim
      |  FROM cand c
      |  JOIN embeddings qe ON qe.vec_id = c.qid
      |  JOIN embeddings ce ON ce.vec_id = c.cid,
      |  generate_series(1, 64) t(i)
      |  GROUP BY c.qid, c.cid)
      |SELECT qid, cid, sim, rk FROM (
      |  SELECT qid, cid, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
      |  FROM p)
      |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopKPortable(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      dim = 64, k = 3, bits = 16, bands = 4)
      .orderBy("qid", "rk")
  }

  /** The ENTIRE IVF ANN pipeline, engine-portably: centroid pick
    * seeded from an md5 lane, nearest-centroid assignment (rounded
    * cosine, highest-id tie), top-nprobe probe lists (qsim desc, id
    * asc), probed-cluster scoring, exact re-rank — replayed
    * stage-for-stage by the DuckDB oracle. Only the floating-point
    * ranking of the PRODUCTION variants (q_ann_lsh / q_ann_ivf)
    * remains rows-only. */
  private val ivfTopKMd5 = q(
    "q_ann_ivf_md5",
    """WITH cents AS (
      |  SELECT vec_id AS centroid_id, embedding AS centv
      |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      |asim AS (
      |  SELECT e.vec_id AS cid, c.centroid_id,
      |    ROUND(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.centv[i] AS DOUBLE))
      |      / (sqrt(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |       * sqrt(SUM(CAST(c.centv[i] AS DOUBLE) * CAST(c.centv[i] AS DOUBLE)))), 4) AS csim
      |  FROM embeddings e, cents c, generate_series(1, 64) t(i)
      |  GROUP BY 1, 2),
      |assigned AS (
      |  SELECT cid, centroid_id FROM (
      |    SELECT cid, centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY csim DESC, centroid_id DESC) AS rn
      |    FROM asim) WHERE rn = 1),
      |probes AS (
      |  SELECT qid, centroid_id FROM (
      |    SELECT cid AS qid, centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY csim DESC, centroid_id ASC) AS rn
      |    FROM asim WHERE cid < 5) WHERE rn <= 3),
      |cand AS (
      |  SELECT p.qid, a.cid FROM probes p JOIN assigned a USING (centroid_id)
      |  WHERE p.qid <> a.cid),
      |p AS (
      |  SELECT c.qid, c.cid,
      |    ROUND(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))
      |      / (sqrt(SUM(CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
      |       * sqrt(SUM(CAST(ce.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)))), 4) AS sim
      |  FROM cand c
      |  JOIN embeddings qe ON qe.vec_id = c.qid
      |  JOIN embeddings ce ON ce.vec_id = c.cid,
      |  generate_series(1, 64) t(i)
      |  GROUP BY c.qid, c.cid)
      |SELECT qid, cid, sim, rk FROM (
      |  SELECT qid, cid, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
      |  FROM p)
      |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopKPortable(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
      .orderBy("qid", "rk")
  }

  /** Multimodal plumbing: synthesized binary payloads → byte length
    * oracle (the decode stage itself is stubbed, see Multimodal). */
  private val multimodalBytes = q(
    "q_multimodal_bytes",
    """SELECT doc_id AS media_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    Multimodal.synthesize(Tables.documents(s, d))
      .select(col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("media_id")
  }

  /** Frame sampling over binary payloads. The frame BYTES are opaque to
    * DuckDB, but the sampled frame count and media kind are pure
    * functions of the synthesized payload length, so the oracle
    * recomputes them from strlen(text): n_frames =
    * floor(greatest(bytes div 64 - 1, 0) / 4) + 1 (every 4th 64-byte
    * frame, at least one). */
  private val frames = q(
    "q_multimodal_frames",
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(FLOOR(GREATEST((strlen(text) // 64) - 1, 0) / 4) + 1 AS BIGINT)
      |    AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    Multimodal.frameSample(Multimodal.synthesize(Tables.documents(s, d)))
      .select("media_id", "kind", "n_frames")
      .orderBy("media_id")
  }

  /** Mean-pooled centroid per label class — quantized-integer lanes
    * make the float aggregation order-independent, so the DuckDB
    * oracle hash-matches every (label, dim) cell. */
  private val centroid = q(
    "q_embedding_centroid",
    """SELECT label, dim,
      |  CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT)
      |    / (COUNT(*) * 10000.0) AS centroid
      |FROM (SELECT label, unnest(embedding) AS v,
      |        generate_subscripts(embedding, 1) - 1 AS dim
      |      FROM embeddings)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin) { (s, d) =>
    Similarity.centroids(Tables.embeddings(s, d), "label", "embedding")
      .orderBy("label", "dim")
  }

  /** Embedding hygiene ops (Similarity.l2Norm / l2Normalize /
    * quantizeInt8): exact norms (both engines fold the same lane order
    * in doubles), a unit-norm flag for the normalized copy, and an
    * int8 reconstruction-error bound — |x - q*scale| ≤ scale/2 holds
    * REGARDLESS of round-tie direction, so the flag is engine-portable
    * even where rounding modes could differ. */
  private val embedNorm = q(
    "q_embedding_norm",
    """WITH t AS (
      |  SELECT vec_id,
      |    SQRT(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm,
      |    list_aggregate(list_transform(embedding,
      |      x -> ABS(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale,
      |    embedding
      |  FROM embeddings)
      |SELECT vec_id, ROUND(nrm, 4) AS norm,
      |  TRUE AS unit_after_norm,
      |  COALESCE(scale = 0 OR list_aggregate(list_transform(embedding,
      |    x -> ABS(CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / scale) * scale)),
      |    'max') <= scale * 0.5000001, TRUE) AS quant_in_bound
      |FROM t ORDER BY vec_id""".stripMargin) { (s, d) =>
    val v = col("embedding")
    val normed = Similarity.l2Normalize(v)
    val qs = Similarity.quantizeInt8(v)
    val deq = Similarity.dequantizeInt8(qs)
    val maxErr = aggregate(
      zip_with(v, deq, (x, r) => abs(x.cast("double") - r)),
      lit(0.0), (acc, e) => greatest(acc, e))
    Tables.embeddings(s, d).select(
      col("vec_id"),
      round(Similarity.l2Norm(v), 4).as("norm"),
      // a zero vector stays zero; anything else must be unit-norm
      (Similarity.l2Norm(v) === 0.0 ||
        abs(Similarity.l2Norm(normed) - 1.0) < 1e-9).as("unit_after_norm"),
      (qs.getField("scale") === 0.0 ||
        maxErr <= qs.getField("scale") * 0.5000001).as("quant_in_bound"))
      .orderBy("vec_id")
  }

  def defs = Seq(
    cosineTopK, nearDup, lshTopK, ivfTopK, lshTopKMd5, ivfTopKMd5,
    multimodalBytes, frames, centroid, embedNorm)
}
