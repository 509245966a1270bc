package graft

import org.apache.spark.sql.functions._
import graft.ops.LangModel

/** Corpus-LM scoring (ops.LangModel): exact arithmetic vs a driver-side
  * reference, OOV mass behavior, and the filter property the shape
  * exists for — in-distribution text outscores junk. */
class LangModelSpec extends SparkSpec {

  import spark.implicits._

  private val train = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog")).toDF("id", "text")

  test("scores match a driver-side exact computation; OOV counts zero") {
    val counts = LangModel.unigramCounts(train, "text")
    val probes = Seq(
      (10L, "the cat"),          // all in-vocab
      (11L, "zyx wvu"),          // all OOV → mean_prob 0
      (12L, "the zyx")).toDF("id", "text")
    val got = LangModel.scoreMeanProb(probes, "id", "text", counts)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val toks = train.collect().flatMap(_.getString(1).split("\\s+"))
    val cnt = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = toks.length.toLong
    def exp(text: String) = {
      val ts = text.split("\\s+")
      val hit = ts.map(t => cnt.getOrElse(t, 0L)).sum
      (ts.length.toLong, hit, hit.toDouble / (ts.length.toDouble * total.toDouble))
    }
    assert(got.toSeq == Seq(10L, 11L, 12L).map(id =>
      (id, exp(Map(10L -> "the cat", 11L -> "zyx wvu", 12L -> "the zyx")(id))))
      .map { case (id, (n, h, p)) => (id, n, h, p) })
    assert(got(1)._4 == 0.0) // fully OOV
  }

  test("in-distribution text outscores junk (the filter property)") {
    val counts = LangModel.unigramCounts(train, "text")
    val scored = LangModel.scoreMeanProb(
      Seq((1L, "the cat sat on the mat"),
          (2L, "qqq www eee rrr ttt yyy")).toDF("id", "text"),
      "id", "text", counts)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) > scored(2L) && scored(2L) == 0.0)
  }
}
