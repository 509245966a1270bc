package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketized) range joins.
  *
  * Spark plans a pure non-equi join (`ON p BETWEEN lo AND hi`, no
  * equality key) as BroadcastNestedLoopJoin — O(n·m) compares and a
  * broadcast of one whole side, which does not survive large×large
  * inputs. Banding manufactures the missing equality key: quantize the
  * domain into fixed-width bands, explode each row into the bands its
  * point/interval touches, hash-join on the band id, then re-check the
  * exact predicate. Cost becomes one hash shuffle of ~(n + m·bands/row)
  * rows and band-local compares — the standard distributed range-join
  * shape (what Databricks' range-join hint does under the hood).
  *
  * Band width trades fan-out for selectivity: explosion factor is
  * `len/width + 1` per build interval, band-local pair count grows as
  * width does. A width near the typical interval length (or the probe
  * radius) keeps both linear. Dense hot bands (timestamp bursts) are
  * ordinary join skew — AQE skew-join or salting applies unchanged.
  */
object RangeJoin {

  /** Probe points against build intervals: every (probe, build) pair
    * with `build.lo <= probe.pt <= build.hi` (inclusive both ends).
    * All three columns must be LONG-comparable (cast timestamps to
    * epoch micros upstream). Column names must not collide across the
    * two inputs. `width` defaults to 0 → auto: the 95th-pctile
    * interval length, clamped to >= 1. Auto-width fetches ONE scalar to
    * the driver but plans a full extra pass over `build` to compute the
    * percentile — at 100 TB pass an explicit `width` (from domain
    * knowledge or a prior profile) so the join is a single-pass plan;
    * the catalog's q_range_prox models this calling convention with an
    * explicit radius. */
  def intervalJoin(
      probe: DataFrame, ptCol: String,
      build: DataFrame, loCol: String, hiCol: String,
      width: Long = 0L): DataFrame = {
    val w =
      if (width > 0) width
      else build.select(
          percentile_approx((col(hiCol) - col(loCol)).cast("long"),
            lit(0.95), lit(1000)))
        .collect().headOption
        .collect { case r if !r.isNullAt(0) => math.max(1L, r.getLong(0)) }
        .getOrElse(1L)
    val probeB = probe.withColumn("__band", floor(col(ptCol) / w))
    val buildB = build.withColumn("__band",
      explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    probeB.join(buildB, Seq("__band"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__band")
  }

  /** All unordered pairs of rows whose `ptCol` values lie within
    * `radius` of each other (|pt_a - pt_b| <= radius, id_a < id_b).
    * One side keeps its own band, the other explodes into the three
    * bands a within-radius partner can occupy (width = radius), so
    * every qualifying pair hash-joins on exactly one band id — no
    * dedup pass needed. Returns the pair ids and the signed gap
    * (pt_b - pt_a). */
  def proximityPairs(
      df: DataFrame, idCol: String, ptCol: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val a = df.select(col(idCol).as("id_a"), col(ptCol).as("pt_a"))
      .withColumn("__band", floor(col("pt_a") / radius))
    val b = df.select(col(idCol).as("id_b"), col(ptCol).as("pt_b"))
      .withColumn("__band",
        explode(array(
          floor(col("pt_b") / radius) - 1,
          floor(col("pt_b") / radius),
          floor(col("pt_b") / radius) + 1)))
    a.join(b, Seq("__band"))
      .where(col("id_a") < col("id_b") &&
        abs(col("pt_b") - col("pt_a")) <= radius)
      .select(col("id_a"), col("id_b"),
        (col("pt_b") - col("pt_a")).as("gap"))
  }
}
