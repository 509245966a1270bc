package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (the time-series/point-in-time lookup the
  * reference's relational surface lacks; standard in training-data
  * pipelines for feature attribution — "the user's most recent purchase
  * before this click").
  *
  * Spark has no native ASOF JOIN; the naive encoding
  * `probe JOIN build ON key AND probe.t >= build.t` + argmax explodes
  * to O(probe x build-history) rows before the reduction, and a
  * non-equi theta join degrades to broadcast-nested-loop. This
  * implementation is the union + running-last formulation instead:
  * tag both sides, union them, and take `last(build_payload,
  * ignoreNulls)` over a window partitioned by key and ordered by
  * (time, side). Cost is ONE hash shuffle of probe+build on the key
  * and an in-partition sort (Spark's ExternalSorter, spill-safe) —
  * the same shape as a sort-merge join, with running O(1) state per
  * row and no intermediate blow-up. At 100 TB this scales exactly like
  * any SMJ on the same key; skewed keys can be pre-salted the usual
  * way because the window state is a pure running-last.
  *
  * Tie semantics: `strict=false` (default) matches build rows with
  * time <= probe time (DuckDB `ASOF JOIN ... ON p.t >= b.t`);
  * `strict=true` matches strictly earlier rows only. Build rows must
  * be unique per (keys, timeCol) for a deterministic answer — dedupe
  * upstream (e.g. groupBy(keys, t).agg(...)) when the source can
  * collide.
  */
object AsOf {

  /** Left as-of join: every `probe` row, plus `payload` columns from
    * the latest `build` row with the same `keys` whose `timeCol` is
    * <= (or < when strict) the probe's. Unmatched probes get nulls.
    *
    * Both sides must carry `keys` and `timeCol` under the same names;
    * `payload` names must not collide with probe columns.
    */
  def joinAsOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val missingP = (keys :+ timeCol).filterNot(probe.columns.contains)
    val missingB = (keys ++ (timeCol +: payload)).filterNot(build.columns.contains)
    require(missingP.isEmpty, s"probe side lacks column(s): ${missingP.mkString(",")}")
    require(missingB.isEmpty, s"build side lacks column(s): ${missingB.mkString(",")}")
    val collide = payload.filter(probe.columns.contains)
    require(collide.isEmpty,
      s"payload name(s) collide with probe columns: ${collide.mkString(",")}")
    val side = "__asof_side"
    val pay = "__asof_payload"

    // Wrap build payload in a struct: non-null for every build row even
    // when individual payload fields are null, so running-last never
    // skips past a legitimately-null newer value to an older row.
    val buildU = build.select(
      (keys :+ timeCol).map(col) :+
        struct(payload.map(col): _*).as(pay): _*)
    // Visibility at equal timestamps is decided by the side ordinal:
    // inclusive = build sorts first (visible), strict = probe first.
    val (buildOrd, probeOrd) = if (strict) (1, 0) else (0, 1)
    val unified = probe
      .withColumn(side, lit(probeOrd))
      .unionByName(buildU.withColumn(side, lit(buildOrd)),
        allowMissingColumns = true)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unified
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .where(col(side) === probeOrd)

    val out = probe.columns.map(col) ++
      payload.map(p => col(s"$pay.$p").as(p))
    matched.select(out.toIndexedSeq: _*)
  }
}
