package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), three tiers:
  *
  *  - brute force: broadcast the (small) query set, scan the corpus
  *    once, per-query top-k via window. Exact; linear in corpus size;
  *    the 100 TB shape is "queries ≪ corpus", so the corpus is read
  *    once with no shuffle of vector payloads.
  *  - LSH (random hyperplanes): deterministic signed projections →
  *    band buckets → bucket join → exact re-rank of candidates.
  *    Sub-linear candidate sets; recall tunable via bits/bands.
  *  - IVF: coarse centroids (deterministic seed vectors), assign each
  *    corpus vector to its nearest centroid (one broadcast argmin),
  *    probe the nprobe closest clusters per query. Partition-prunable
  *    when the corpus is written bucketed by cluster id.
  *
  * All distance math is double-precision sequential folds via SQL HOFs
  * (codegen; deterministic across engines).
  */
object Similarity {

  /** Cosine similarity of two float-array columns (by SQL fragment),
    * computed in double precision — HOF formulation, kept as the
    * differential oracle for the native expression. */
  def cosineExpr(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, CAST(0 AS DOUBLE),
       |       (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |   * sqrt(aggregate($b, CAST(0 AS DOUBLE),
       |       (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |""".stripMargin.replace("\n", " "))

  /** Native codegen cosine (graft.functions.CosineSimilarity) — same
    * fold order as [[cosineExpr]], so results are bit-identical; one
    * fused loop instead of three interpreted lambdas. */
  def cosine(df: DataFrame, a: String, b: String): Column = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    expr(s"cosine_sim($a, $b)")
  }

  /** L2 norm of a float-vector column, in double precision (in-order
    * fold — portable across engines). */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(transform(vec, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** L2-normalized copy (double lanes): normalize ONCE at ingest and
    * cosine becomes a plain dot product — at 100 TB the norm pass is
    * the cheap side of every subsequent comparison. Zero vectors stay
    * zero (no NaNs downstream). */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n === 0.0, transform(vec, _ => lit(0.0)))
      .otherwise(transform(vec, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization: per-vector scale = maxAbs/127,
    * codes = round(x/scale) in [-127, 127] — a 4× smaller shuffle and
    * storage footprint for candidate generation; exact re-rank reads
    * the float column for the few survivors. Zero vectors get scale 0
    * and all-zero codes. Returns struct(scale DOUBLE, q ARRAY<TINYINT>). */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = aggregate(transform(vec, x => abs(x.cast("double"))),
      lit(0.0), (acc, x) => greatest(acc, x))
    val scale = maxAbs / 127.0
    val q = when(scale === 0.0, transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec, x =>
        greatest(lit(-127L), least(lit(127L),
          round(x.cast("double") / scale))).cast("byte")))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Reconstruction of a [[quantizeInt8]] struct back to double lanes:
    * `q * scale`; max error per lane ≤ scale/2. */
  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"),
      x => x.cast("double") * qs.getField("scale"))

  /** Exact top-k: for each query vector, the k most-cosine-similar
    * corpus vectors (excluding itself). Ranking uses the rounded
    * similarity with id tie-break so results are stable across
    * engines. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    // per-row cosine against every broadcast query is heavy compute —
    // spread an under-parallelised corpus scan (r11 measurement: 0.62×)
    val c = graft.core.Tables.spreadCompute(corpus)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // the candidate set per query is the WHOLE corpus, so the re-rank
    // must be the bounded k-buffer aggregate: a per-qid row_number
    // window here would sort corpus-sized groups — at 100 TB that is
    // the difference between shuffling ~queries × k candidates and
    // sorting queries × corpus rows
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(cosine(corpus, "qv", "cv"), 4))
      .select("qid", "cid", "sim")
    rerank(scored, k)
  }

  /** Per-group mean-pooled embedding (class centroids, user profiles,
    * chunk-to-doc pooling) in LONG format (key, dim, centroid).
    *
    * Scale shape: posexplode fans each vector into (key, dim, value)
    * rows, then ONE combiner-friendly hash aggregation on (key, dim) —
    * partial sums are map-side, parallelism is rows×dims, and no
    * executor ever holds more than a running (sum, count) per (key,
    * dim). The alternative (zip_with array-sum into one reducer per
    * key) pins whole vectors in each group's aggregation state and
    * dies on skewed keys.
    *
    * Determinism: each float is quantized to round(v*1e4) as LONG
    * before summing — integer sums are order-independent, so the same
    * query replayed on any engine/partitioning hash-matches (the
    * [[graft.queries.Num]] fixed-point argument applied to
    * embeddings). One double division at the end. */
  def centroids(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col(keyCol), col("dim"))
      .agg((sum(round(col("__v").cast("double") * 10000).cast("long")) /
        (count(lit(1)) * 10000.0)).as("centroid"))

  /** Deterministic random hyperplanes: `bits` planes in `dim`
    * dimensions, seeded — identical across runs and executors. */
  private def planes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of a vector against the hyperplanes — one-pass
    * native expression (graft.functions.HyperplaneSignature). */
  def lshSignature(vecCol: String, dim: Int, bits: Int, seed: Long = 42L): Column =
    graft.functions.HyperplaneSignature.column(col(vecCol), planes(dim, bits, seed))

  /** HOF formulation of [[lshSignature]] (bits interpreted passes) —
    * kept as the differential oracle for the native expression. */
  def lshSignatureHof(vecCol: String, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val ps = planes(dim, bits, seed)
    val bitCols = ps.zipWithIndex.map { case (p, j) =>
      val dot = expr(
        s"aggregate(zip_with($vecCol, ${sqlArray(p)}, (x, y) -> CAST(x AS DOUBLE) * y), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
      when(dot >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  private def sqlArray(xs: Array[Double]): String =
    xs.mkString("array(", "D, ", "D)")

  /** LSH-bucketed ANN: band-equal signatures propose candidates, exact
    * cosine re-ranks. Same output shape as [[bruteForceTopK]]; recall
    * < 1 by construction. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 16, bands: Int = 4, seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1L << r) - 1
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        lshSignature(vecCol, dim, bits, seed).as("sig"))
        .select(col(id), col(vec),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(lit(mask))): _*))
            .as(Seq("band", "bucket")))
    val qb = banded(queries, "qid", "qv")
    // cap the corpus side only: a hot corpus bucket is what makes the
    // candidate join quadratic (Dedup.capBuckets rationale)
    val cb = graft.ops.Dedup.capBuckets(banded(corpus, "cid", "cv"), "cid", maxBucket)
    val cand = qb.join(cb, Seq("band", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
    val scored = cand
      .withColumn("sim", round(cosine(corpus, "qv", "cv"), 4))
      .select("qid", "cid", "sim")
    rerank(scored, k)
  }

  /** Engine-portable twin of [[lshTopK]]: hyperplane weights derive
    * from md5 (`w(j,d) = (u60(md5("pl:j:d")[0,15)) % 2001) - 1000`) and
    * the sign test runs on an INTEGER dot product over 1e4-quantized
    * lanes — both replayable verbatim in DuckDB, so bucketing and
    * candidate-set formation are cross-engine hash-verified end to end
    * (the [[graft.queries.Num]] fixed-point argument applied to LSH).
    * Production speed stays with [[lshTopK]]'s gaussian planes +
    * codegen signature; this is the verification lane. */
  def lshTopKPortable(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 16, bands: Int = 8): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val w = md5Planes(dim, bits)
    def bucketArr(vec: Column): Column = {
      val qv = transform(vec, x => round(x.cast("double") * 10000).cast("long"))
      array((0 until bands).map { b =>
        (0 until r).map { i =>
          val j = b * r + i
          val dot = aggregate(
            zip_with(qv, typedLit(w(j).toSeq), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x)
          when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)
    }
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .select(col(id), col(vec),
          posexplode(bucketArr(col(vec))).as(Seq("band", "bucket")))
    val qb = banded(queries, "qid", "qv")
    val cb = banded(corpus, "cid", "cv")
    val cand = qb.join(cb, Seq("band", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
    val scored = cand
      .withColumn("sim", round(cosine(corpus, "qv", "cv"), 4))
      .select("qid", "cid", "sim")
    rerank(scored, k)
  }

  /** md5-derived integer hyperplanes: DuckDB replays each weight as
    * `(('0x' || substr(md5('pl:'||j||':'||d),1,15))::UBIGINT % 2001)
    * - 1000`; 15 hex chars = 60 bits, so the value fits a signed long
    * on both engines. */
  private def md5Planes(dim: Int, bits: Int): Array[Array[Long]] =
    Array.tabulate(bits) { j =>
      Array.tabulate(dim) { d =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"pl:$j:$d".getBytes("UTF-8"))
        val hex = h.map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
      }
    }

  /** Shared ANN re-rank: exact top-k per query over the scored
    * candidate set via the bounded [[TopK.TopKAgg]] buffer (sim desc,
    * cid asc tie-break — the same order the old per-qid row_number
    * window imposed, without its per-query sort: map-side combine caps
    * every buffer at k before the one shuffle on qid). Candidate ids
    * surface as LONG (the aggregator's id lane). */
  private def rerank(scored: DataFrame, k: Int): DataFrame = {
    // the candidate set per query is unbounded (corpus-sized for brute
    // force), so the re-rank MUST ride the bounded long-id k-buffer —
    // a type-generic collect_list here would pin whole candidate sets
    // in aggregation state. That makes integral corpus ids a hard,
    // loud contract (editPairs maxBlock rationale): map string ids to
    // a long surrogate before calling. Centroid ids (IVF probe stage)
    // stay type-generic — their per-group state is bounded by nlist.
    import org.apache.spark.sql.types._
    val integral = scored.schema("cid").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    require(integral,
      s"ANN re-rank rides a bounded long-id top-k buffer; corpus id type " +
        s"${scored.schema("cid").dataType} is not integral — map ids to a " +
        "long surrogate key before calling")
    TopK.perGroup(scored, Seq("qid"), "sim", "cid", k)
      .select(col("qid"), col("cid"), col("sim"), col("rank").as("rk"))
  }

  /** Lloyd-iteration k-means centroids, DataFrame-native: seed with the
    * first `nlist` corpus vectors (deterministic), then `iters` rounds
    * of assign (broadcast-centroid argmax-cosine) + recompute
    * (per-dimension mean via posexplode → groupBy(cluster, dim) —
    * partial-aggregable, one shuffle per round, never collects
    * vectors to the driver beyond the nlist centroids themselves).
    * At 100 TB: train on a sample (`corpus.sample(...)`), the round
    * cost is a corpus scan + a (nlist×dim)-row aggregate. */
  def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var cents = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centv"))
    val vecs = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    for (_ <- 0 until iters) {
      val assigned = assign(vecs, cents, corpus)
      val recomputed = assigned
        .select(col("centroid_id"),
          posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"),
          expr("transform(dm, p -> CAST(p.m AS FLOAT))").as("newv"))
      // a centroid that wins no vectors this round would vanish from the
      // recompute groupBy, silently shrinking nlist — carry it forward
      cents = cents
        .join(recomputed, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("newv"), col("centv")).as("centv"))
    }
    cents
  }

  /** Nearest-centroid assignment as a partial-aggregable aggregate:
    * `groupBy(cid).agg(max(struct(csim, centroid_id, centv)))` folds the
    * argmax map-side before the one shuffle on `cid` — no sort, no
    * unique-key window pass over corpus×nlist rows. Ties on the rounded
    * similarity go to the highest centroid_id (any fixed rule works;
    * struct max gives this one for free). */
  private def assign(
      vecs: DataFrame, cents: DataFrame, hof: DataFrame): DataFrame =
    vecs
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(hof, "cv", "centv"), 4))
      .groupBy("cid")
      .agg(
        first(col("cv")).as("cv"), // constant within the group
        max(struct(col("csim"), col("centroid_id"))).as("best"))
      .select(col("cid"), col("cv"), col("best.centroid_id").as("centroid_id"))

  /** IVF: `nlist` coarse centroids — trained by [[kmeansCentroids]]
    * when `trainIters > 0`, else the first nlist corpus vectors (the
    * deterministic zero-cost quantizer). Returns per-query top-k
    * searching only the nprobe nearest clusters. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 8, nprobe: Int = 2, trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, trainIters)
      else corpus
        .orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("centv"))
    ivfSearch(queries, corpus, idCol, vecCol, k, nprobe, cents)
  }

  /** Engine-portable twin of [[ivfTopK]]: the untrained quantizer's
    * centroid pick is seeded from an md5 lane (`ORDER BY
    * md5(CAST(id AS VARCHAR))`) DuckDB replays verbatim, so centroid
    * selection, assignment, probe-list formation and the final re-rank
    * are all cross-engine hash-verified. Same search body as the
    * production path. */
  def ivfTopKPortable(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 8, nprobe: Int = 2): DataFrame = {
    val cents = corpus
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centv"))
    ivfSearch(queries, corpus, idCol, vecCol, k, nprobe, cents)
  }

  /** The IVF search body: assign corpus vectors to their nearest
    * centroid (map-side-foldable argmax, see [[assign]]), build
    * per-query probe lists, score candidates in the probed clusters,
    * exact re-rank. The probe stage folds `collect_list` capped by the
    * BOUNDED nlist centroid set and sorts the ≤ nlist-element array
    * in place — no window, no cast of `centroid_id` through a long
    * surrogate (any orderable id type works, incl. string ids from a
    * caller-trained quantizer); ranking is (qsim desc, centroid_id
    * asc), the same order the old row_number idiom gave. */
  private def ivfSearch(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      cents: DataFrame): DataFrame = {
    val assigned =
      assign(corpus.select(col(idCol).as("cid"), col(vecCol).as("cv")),
        cents, corpus)
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("qsim", round(cosine(corpus, "qv", "centv"), 4))
      .groupBy("qid")
      .agg(first(col("qv")).as("qv"),
        slice(array_sort(collect_list(struct(
          (-col("qsim")).as("nsim"), col("centroid_id")))), 1, nprobe)
          .as("__pk"))
      .select(col("qid"), col("qv"), explode(col("__pk")).as("__p"))
      .select(col("qid"), col("qv"), col("__p.centroid_id").as("centroid_id"))
    val scored = probes.join(assigned, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(cosine(corpus, "qv", "cv"), 4))
      .select("qid", "cid", "sim")
    rerank(scored, k)
  }
}
