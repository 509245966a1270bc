package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Layout

/** Z-order layout (ops.Layout): the curve matches a driver-side Morton
  * computation, and — the point of the operator — the written file
  * ranges cover far smaller per-dimension bounding boxes than a
  * single-column sort layout, which is what parquet min/max pruning
  * feeds on. */
class LayoutSpec extends SparkSpec {

  private val dims = Seq("user_id", "value")

  test("z-values match a driver-side Morton computation") {
    val bits = 8
    val rows = Tables.events(spark, sf)
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble, r.getDouble(2)))
    val (mn0, mx0) = (rows.map(_._2).min, rows.map(_._2).max)
    val (mn1, mx1) = (rows.map(_._3).min, rows.map(_._3).max)
    def scale(v: Double, mn: Double, mx: Double): Long =
      if (mx - mn <= 0) 0L
      else math.min(255L, math.max(0L, math.floor((v - mn) / (mx - mn) * 255).toLong))
    val expected = rows.map { case (id, u, v) =>
      val (s0, s1) = (scale(u, mn0, mx0), scale(v, mn1, mx1))
      val z = (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((s0 >> b) & 1L) << (2 * b)) | (((s1 >> b) & 1L) << (2 * b + 1))
      }
      id -> z
    }.toMap
    val got = Layout.withZValue(
        Tables.events(spark, sf).select("event_id", "user_id", "value"),
        dims, bits)
      .select("event_id", "__z").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  /** Mean normalized per-partition span on each dimension — the
    * fraction of the axis a file's min/max range covers, i.e. the
    * probability a point predicate on that axis CANNOT prune the file.
    * (Mean box AREA is the wrong metric: any N-cell tiling has total
    * area ~1/N; the layout question is how that area is SHAPED.) */
  private def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val ev = df.withColumn("__part", spark_partition_id())
      .groupBy("__part")
      .agg(min("user_id").as("u0"), max("user_id").as("u1"),
        min("value").as("v0"), max("value").as("v1"))
      .collect()
    val uSpan = ev.map(_.getLong(2)).max - ev.map(_.getLong(1)).min + 1.0
    val vSpan = ev.map(_.getDouble(4)).max - ev.map(_.getDouble(3)).min
    (ev.map(r => (r.getLong(2) - r.getLong(1) + 1.0) / uSpan).sum / ev.length,
     ev.map(r => (r.getDouble(4) - r.getDouble(3)) / vSpan).sum / ev.length)
  }

  test("z-order prunes on BOTH dimensions where a 1-D sort prunes on one") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val (zu, zv) = meanSpans(Layout.zorder(ev, dims, numFiles = 16, bits = 16))
    val (lu, lv) = meanSpans(ev.repartitionByRange(16, col("user_id")))
    // the classic single-key layout is selective on its key only: files
    // span most of the value axis (not quite all of it here — 60-ish
    // samples per file leave boundary slack at this sf)
    assert(lu < 0.25 && lv > 0.5, s"lex spans u=$lu v=$lv")
    // the z-layout must cut both axes at once (16 files ≈ 4×4 grid),
    // making a value-only predicate prunable too
    assert(zu < 0.5 && zv < 0.5, s"z spans u=$zu v=$zv")
    assert(zv * 1.5 < lv, s"z=$zv lex=$lv")
  }

  test("three dimensions interleave round-robin (k-dim Morton)") {
    import spark.implicits._
    val df = (for (a <- 0L to 3L; b <- 0L to 3L; c <- 0L to 3L)
      yield (a, b, c)).toDF("a", "b", "c")
    val got = Layout.withZValue(df, Seq("a", "b", "c"), bits = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3))).toMap
    // mirror the operator's IEEE scaling exactly (2/3*3 = 1.999…, so a
    // lattice shortcut would be wrong) then interleave dimension-major
    def scale(v: Long): Long =
      math.min(3L, math.max(0L, math.floor(v.toDouble / 3.0 * 3.0).toLong))
    def morton3(a: Long, b: Long, c: Long): Long =
      (0 until 2).foldLeft(0L) { (acc, bit) =>
        acc | (((scale(a) >> bit) & 1L) << (3 * bit)) |
          (((scale(b) >> bit) & 1L) << (3 * bit + 1)) |
          (((scale(c) >> bit) & 1L) << (3 * bit + 2))
      }
    got.foreach { case ((a, b, c), z) =>
      assert(z == morton3(a, b, c), s"($a,$b,$c)")
    }
  }

  test("constant dimensions degrade gracefully to the other axis") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i, 7L, i * 2.0)).toDF("id", "c", "v")
    val z = Layout.withZValue(df, Seq("c", "v"), bits = 8)
      .orderBy("__z").select("id").collect().map(_.getLong(0)).toSeq
    assert(z == (0L until 64L)) // ordering follows v alone
    intercept[IllegalArgumentException] {
      Layout.withZValue(df, Seq("c", "v"), bits = 40) // 80 bits > 62
    }
  }
}
