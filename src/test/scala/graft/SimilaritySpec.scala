package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Multimodal, Similarity}

/** Recall/shape invariants for ANN variants and multimodal plumbing. */
class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("native cosine_sim expression matches the HOF formulation exactly") {
    val pairs = emb.filter(col("vec_id") < 30)
      .select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("idb"), col("embedding").as("vb")))
      .filter(col("ida") < col("idb"))
    val diff = pairs
      .withColumn("hof", Similarity.cosineExpr("va", "vb"))
      .withColumn("native", Similarity.cosine(emb, "va", "vb"))
      .filter(col("hof") =!= col("native")) // bit-equality: same fold order
      .count()
    assert(diff == 0)
  }

  test("native hyperplane signature matches the HOF formulation exactly") {
    val diff = emb
      .withColumn("native", Similarity.lshSignature("embedding", 64, 16))
      .withColumn("hof", Similarity.lshSignatureHof("embedding", 64, 16))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("brute-force top-k returns k rows per query, self excluded") {
    val res = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
    val rows = res.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("LSH ANN has nonzero recall vs brute force and only valid pairs") {
    val exact = topSet(Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
      .select("qid", "cid"))
    val approx = topSet(Similarity.lshTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      dim = 64, k = 3, bits = 16, bands = 8).select("qid", "cid"))
    // hyperplane LSH on random unit-ish vectors: recall is probabilistic;
    // assert the mechanism works (some overlap, right arity) rather than
    // a tight bound at this tiny scale
    assert(approx.nonEmpty)
    assert(approx.map(_._1).subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    assert(exact.intersect(approx).nonEmpty)
  }

  test("IVF ANN produces k-bounded per-query results") {
    val res = Similarity.ivfTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3).collect()
    assert(res.nonEmpty)
    val perQ = res.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQ.forall(_ <= 3))
  }

  test("trained IVF centroids are valid vectors and improve over seeds") {
    val corpus = emb.filter(col("vec_id") < 200)
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      nlist = 4, iters = 2).collect()
    assert(cents.length == 4)
    val dims = cents.map(_.getSeq[Float](1).length).distinct
    assert(dims.length == 1 && dims.head > 0) // all centroids full-width
    assert(cents.forall(_.getSeq[Float](1).forall(f => !f.isNaN)))
    // trained quantizer still yields k-bounded results end-to-end
    val res = Similarity.ivfTopK(
      emb.filter(col("vec_id") < 5), corpus, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 2, trainIters = 1).collect()
    assert(res.nonEmpty)
    assert(res.groupBy(_.getLong(0)).values.forall(_.length <= 3))
  }

  test("multimodal stub decode: features are a normalized histogram") {
    import spark.implicits._
    implicit val s = spark
    val media = Multimodal.synthesize(Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
    assert(feats.forall(f => f.n_bytes > 0))
  }

  test("frame sampling keeps every 4th frame") {
    val df = Multimodal.frameSample(
      Multimodal.synthesize(Tables.documents(spark, sf)))
    val row = df.filter(col("media_id") === 1).select("n_frames").collect()(0)
    assert(row.getLong(0) >= 1)
  }
}
