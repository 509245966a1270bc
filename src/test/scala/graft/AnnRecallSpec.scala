package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Measured recall floors for the approximate ANN variants — recall<1
  * by construction means no exact oracle can exist, so the bound IS
  * the verification: recall@10 against bruteForceTopK over 50 query
  * vectors, asserted ≥ a floor with headroom under the measured
  * figure. Deterministic end to end (seeded hyperplanes, fixed corpus,
  * rounded similarities with id tie-break). */
class AnnRecallSpec extends SparkSpec {

  lazy val emb: DataFrame = Tables.embeddings(spark, sf)
  private val k = 10
  private lazy val queries = emb.filter(col("vec_id") < 50)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = pairs(
    Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k))

  private def recall(approx: Set[(Long, Long)]): Double =
    exact.intersect(approx).size.toDouble / exact.size

  test("LSH ANN recall@10 >= 0.85 vs brute force") {
    val r = recall(pairs(Similarity.lshTopK(
      queries, emb, "vec_id", "embedding",
      dim = 64, k = k, bits = 16, bands = 8)))
    assert(r >= 0.85, s"LSH recall@10 = $r")
    info(f"LSH recall@10 = $r%.3f")
  }

  test("IVF ANN recall@10 >= 0.5 vs brute force (nprobe 4 of 8)") {
    val r = recall(pairs(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding",
      k = k, nlist = 8, nprobe = 4)))
    assert(r >= 0.5, s"IVF recall@10 = $r")
    info(f"IVF recall@10 = $r%.3f")
  }

  test("IVF recall rises with nprobe (the recall/cost dial)") {
    val r1 = recall(pairs(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", k = k, nlist = 8, nprobe = 1)))
    val r8 = recall(pairs(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", k = k, nlist = 8, nprobe = 8)))
    assert(r8 >= r1, s"nprobe=8 recall $r8 < nprobe=1 recall $r1")
    // probing every cluster searches the whole corpus: exact by design
    assert(r8 == 1.0, s"nprobe=nlist recall = $r8")
    info(f"IVF recall@10: nprobe=1 $r1%.3f -> nprobe=8 $r8%.3f")
  }
}
