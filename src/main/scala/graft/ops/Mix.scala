package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: downsample groups (language, source, domain) so the
  * output matches target proportions — the standard re-balancing step
  * before training-data assembly.
  *
  * Given target fractions t_g (summing to ≤1 over the groups present),
  * the largest achievable total is T = min_g(n_g / t_g); each group
  * then keeps rate_g = t_g · T / n_g of its rows, so the output hits
  * the target mix exactly (up to per-row hash granularity) while
  * keeping every row of the scarcest group.
  *
  * Scale shape: one partial-aggregable `groupBy(group).count()` (tiny
  * result — one row per group), a broadcast join of the computed rates
  * back onto the corpus, and the same deterministic md5-lane filter as
  * [[Sampling.sampleByWeight]] — membership depends only on the row's
  * own key and its group's rate, so the mix is reproducible across
  * engines, partitionings and re-runs, and the filter is a pure
  * per-row predicate (no shuffle of the corpus itself).
  */
object Mix {

  /** Keep-rate per group for target fractions `targets` (group →
    * fraction). Groups absent from `targets` are dropped (rate 0); a
    * TARGETED group with no rows is an error — silently skipping it
    * would renormalise the output onto the remaining groups and ship a
    * skewed corpus with no warning. One aggregate scan; the result is
    * one row per target, computed driver-side (bounded by the target
    * map, like a broadcast dim). */
  def rates(df: DataFrame, groupCol: String,
            targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(t => t > 0 && t <= 1),
      "targets must be positive fractions")
    val t = df.sparkSession.createDataFrame(targets.toSeq)
      .toDF(groupCol, "__t")
    val counts = df.groupBy(groupCol).count()
    // left-outer from the TARGETS: a null count marks a targeted group
    // absent from the data, using the join's own type coercion (so a
    // numeric/decimal group column matches its string target exactly
    // the way the rates join will) — never a driver-side string compare
    val joined = t.join(counts, Seq(groupCol), "left_outer")
      .select(col(groupCol), col("count").cast("double").as("__n"), col("__t"))
    val rows = joined.collect()
    val missing = rows.filter(_.isNullAt(1)).map(r => String.valueOf(r.get(0)))
    require(missing.isEmpty,
      s"target groups absent from data: ${missing.sorted.mkString(", ")}")
    // T = min_g(n_g / t_g); rate_g = t_g * T / n_g — the same IEEE
    // operation order an engine replaying the formula computes
    val tmin = rows.map(r => r.getDouble(1) / r.getDouble(2)).min
    val rateRows = rows.toIndexedSeq.map { r =>
      org.apache.spark.sql.Row(r.get(0),
        math.min(1.0, r.getDouble(2) * tmin / r.getDouble(1)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      joined.schema.head,
      org.apache.spark.sql.types.StructField("rate",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rateRows, 1), schema)
  }

  /** The mixed corpus: deterministic per-group hash sample at the
    * computed rates. `key` must identify rows (doc id). */
  def toProportions(df: DataFrame, groupCol: String, key: Column,
                    targets: Map[String, Double]): DataFrame = {
    val r = rates(df, groupCol, targets)
    df.join(broadcast(r), groupCol)
      .where(Sampling.hashUniform(key) < col("rate"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** α-temperature mix — the multilingual-training sampling standard
    * (target fractions p_g ∝ n_g^α computed from the data itself:
    * α = 1 keeps natural proportions, α → 0 approaches uniform across
    * groups, in between damps head-group dominance). The normaliser
    * Σ n^α CANCELS in the keep-rate algebra, leaving
    * `rate_g = min_h(n_h^(1-α)) · n_g^(α-1)` — a MIN, not a SUM, so
    * the arithmetic is order-free and replays bit-identically in any
    * engine (an IEEE sum would depend on group enumeration order). The
    * scarcest-effective group is kept whole; everything else
    * downsamples deterministically on the md5 lane.
    *
    * Scale shape: identical to [[toProportions]] — one
    * partial-aggregable count per group (driver fetch bounded by group
    * cardinality: languages/sources/domains), broadcast rates, pure
    * per-row pushed-down filter; the corpus never shuffles. */
  def temperature(df: DataFrame, groupCol: String, key: Column,
                  alpha: Double, maxGroups: Int = 100000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(maxGroups > 0, "maxGroups must be positive")
    // the driver fetch is one row per group — bounded by construction
    // for the op's domain (languages/sources/domains), and ENFORCED so
    // a degenerate group column (a per-document key) fails loudly
    // instead of materialising the corpus's key space on the driver
    val counts = df.groupBy(groupCol).count().limit(maxGroups + 1).collect()
    require(counts.length <= maxGroups,
      s"temperature mix: more than $maxGroups groups — α-temperature is " +
        "a coarse-group schedule (language/source/domain), not a per-key op; " +
        "raise maxGroups only if the rate table genuinely fits the driver")
    require(counts.nonEmpty, "temperature mix over an empty corpus")
    val m = counts.map(r => math.pow(r.getLong(1).toDouble, 1 - alpha)).min
    val rateRows = counts.toIndexedSeq.map { r =>
      org.apache.spark.sql.Row(r.get(0),
        math.min(1.0, m * math.pow(r.getLong(1).toDouble, alpha - 1)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.select(groupCol).schema.head,
      org.apache.spark.sql.types.StructField("rate",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val r = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rateRows, 1), schema)
    df.join(broadcast(r), groupCol)
      .where(Sampling.hashUniform(key) < col("rate"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
