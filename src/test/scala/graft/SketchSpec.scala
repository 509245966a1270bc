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

  test("KLL rollup: n is exact under any split; quantiles inside the rank band") {
    val n = 20000
    // skewed long values with heavy ties
    val df = (0 until n).map(i => (i % 4, (math.pow(i % 1000, 1.5)).toLong))
      .toDF("g", "v").repartition(8)
    val exact = df.select("v").as[Long].collect().sorted
    for (split <- Seq(Seq("g"), Seq.empty[String])) {
      val rolled = Sketch.quantileRollup(
        Sketch.quantileGrouped(df, split, "v"), Seq.empty, Seq(0.5, 0.9))
      val row = rolled.head
      assert(row.getAs[Long]("n") == n.toLong, s"split=$split n=${row.getAs[Long]("n")}")
      for ((qc, p) <- Seq(("q50", 0.5), ("q90", 0.9))) {
        val est = row.getAs[Long](qc)
        // translate the estimate back to its rank in the exact order;
        // KLL k=200 guarantees ~1.65% normalized rank error — allow 4%
        val lo = exact(((p - 0.04) * (n - 1)).toInt)
        val hi = exact(((p + 0.04) * (n - 1)).toInt)
        assert(est >= lo && est <= hi, s"split=$split $qc est=$est band=[$lo,$hi]")
      }
    }
  }

  test("KLL quantile labels are exact — no whole-percent collisions") {
    val df = (0L until 100L).toDF("v")
    val fine = Sketch.quantileGrouped(df, Seq.empty, "v")
    val r = Sketch.quantileRollup(fine, Seq.empty, Seq(0.995, 1.0, 0.29))
    assert(r.columns.toSet == Set("n", "q99_5", "q100", "q29"))
    intercept[IllegalArgumentException] {
      Sketch.quantileRollup(fine, Seq.empty, Seq(0.5, 0.5))
    }
  }

  test("KLL incremental: yesterday's sketch merges with today's shard") {
    val a = (0L until 5000L).toDF("v")
    val b = (5000L until 10000L).toDF("v")
    val merged = Sketch.quantileRollup(
      Sketch.quantileGrouped(a, Seq.empty, "v")
        .union(Sketch.quantileGrouped(b, Seq.empty, "v")),
      Seq.empty, Seq(0.5))
    val row = merged.head
    assert(row.getAs[Long]("n") == 10000L)
    assert(math.abs(row.getAs[Long]("q50") - 5000L) <= 400L,
      s"q50=${row.getAs[Long]("q50")}")
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
