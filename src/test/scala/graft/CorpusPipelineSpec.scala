package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text
import graft.ops.{Components, Dedup, Pack, Sampling}

/** End-to-end corpus pipeline: the operators compose the way a corpus
  * team chains them — near-dup pairs → clusters → keep representatives
  * → quality floor → deterministic split → pack the training split —
  * with conservation invariants at every boundary (nothing silently
  * dropped or duplicated between stages).
  */
class CorpusPipelineSpec extends SparkSpec {

  test("dedup → cluster → filter → split → pack conserves the corpus") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. near-dup pairs → one representative per duplicate cluster
    val pairs = Dedup.minhashNearDupsPortable(docs, "doc_id", "text",
      minJaccard = 0.2)
    val kept = Components.keepRepresentatives(docs, "doc_id",
      pairs, "id_a", "id_b")
    val dropped = Components.connected(pairs, "id_a", "id_b")
      .where(col("node") =!= col("component")).count()
    assert(kept.count() == total - dropped && dropped > 0)

    // 2. quality floor (token count), deterministic split tags
    val scored = kept.select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tok"))
      .where(col("n_tok") >= 20)
      .withColumn("split", Sampling.split(col("doc_id")))
    val bySplit = scored.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == scored.count())
    // md5 split is stable: train ≈ 80%
    assert(bySplit("train") > scored.count() * 0.7)

    // 3. pack the train split; every train token lands in exactly one
    //    sequence slice
    val train = scored.where(col("split") === "train")
    val packed = Pack.contiguous(train, "doc_id", "n_tok", "doc_id", 128L)
    val trainToks = train.agg(sum("n_tok")).head.getLong(0)
    val packedToks = packed.agg(sum("slice_len")).head.getLong(0)
    assert(packedToks == trainToks)
    // every doc of the split appears; no doc from other splits leaks in
    val packedDocs = packed.select("doc_id").distinct()
    assert(packedDocs.count() == train.count())
    assert(packedDocs.join(train, Seq("doc_id"), "left_anti").isEmpty)
  }
}
