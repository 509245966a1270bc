package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Sketch

/** Mergeability contract of the HLL sketch ops: a rollup of
  * fine-grained sketches must estimate like a sketch built directly
  * over the same rows (union is register-wise, so the split must not
  * matter), and estimates must sit inside the configured accuracy band
  * of known cardinalities. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("rollup of per-group sketches ≈ direct global sketch") {
    val docs = Tables.documents(spark, sf)
    val direct = Sketch.rollup(
      Sketch.grouped(docs, Seq.empty, "text"), Seq.empty)
      .select("estimate").head.getLong(0).toDouble
    // two different fine-grained splits, both rolled up globally
    for (split <- Seq(Seq("lang"), Seq("source"), Seq("lang", "source"))) {
      val rolled = Sketch.rollup(
        Sketch.grouped(docs, split, "text"), Seq.empty)
        .select("estimate").head.getLong(0).toDouble
      // union abandons the direct build's HIP estimator, so allow a
      // small relative gap — but the register state is the same, so the
      // estimates must be near-identical
      assert(math.abs(rolled - direct) <= direct * 0.02 + 1.0,
        s"split=$split rolled=$rolled direct=$direct")
    }
  }

  test("estimates sit inside the accuracy band of known cardinalities") {
    for (n <- Seq(1L, 50L, 5000L)) {
      val df = (0L until n).map(i => s"v$i").toDF("v")
        .repartition(8) // sketches built per partition, merged map-side
      val est = Sketch.rollup(Sketch.grouped(df, Seq.empty, "v"), Seq.empty)
        .select("estimate").head.getLong(0).toDouble
      assert(math.abs(est - n) <= math.max(n * 0.05, 1.0), s"n=$n est=$est")
    }
  }

  test("incremental union: yesterday's sketch + today's shard") {
    val a = (0L until 300L).map(i => s"k$i").toDF("v")   // yesterday
    val b = (200L until 500L).map(i => s"k$i").toDF("v") // today, overlaps
    val merged = Sketch.rollup(
      Sketch.grouped(a, Seq.empty, "v")
        .union(Sketch.grouped(b, Seq.empty, "v")),
      Seq.empty).select("estimate").head.getLong(0).toDouble
    assert(math.abs(merged - 500.0) <= 25.0, s"est=$merged") // true distinct 500
  }

  test("mixed-precision unions need the explicit opt-in") {
    val a = Sketch.grouped((0L until 100L).map(i => s"x$i").toDF("v"),
      Seq.empty, "v", lgK = 12)
    val b = Sketch.grouped((0L until 100L).map(i => s"y$i").toDF("v"),
      Seq.empty, "v", lgK = 10)
    intercept[Exception] {
      Sketch.rollup(a.union(b), Seq.empty).collect()
    }
    val est = Sketch.rollup(a.union(b), Seq.empty, allowDifferentLgK = true)
      .select("estimate").head.getLong(0).toDouble
    assert(math.abs(est - 200.0) <= 20.0, s"est=$est")
  }
}
