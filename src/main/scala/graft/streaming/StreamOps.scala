package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming surface for the engine.
  *
  * The reference has no stream processing (SURVEY §2.10 — "streaming" in
  * jetro means single-pass demand-bounded iteration,
  * jetro-core/src/builtins/mod.rs:988-997). We expose the same operator
  * surface over Spark Structured Streaming where the op is
  * incremental-friendly:
  *
  *   - stateless row ops (`filter` / `map` / `flat_map`, SURVEY §2.2) —
  *     identical Column expressions work on a streaming DataFrame;
  *   - keyed aggregation (`count_by` / `group_by` + sum/avg/min/max,
  *     SURVEY §2.4) — watermarked event-time windows;
  *   - rolling analytics (SURVEY §2.5) — sliding event-time windows;
  *   - `unique_by` (SURVEY §2.6) — `dropDuplicatesWithinWatermark`;
  *   - `accumulate` (M:160-161, running fold) — arbitrary keyed state via
  *     `flatMapGroupsWithState`.
  *
  * Scale notes (1000-executor / 100 TB design): every stateful op here
  * keys its state by a bounded-cardinality key (window × event_type, or
  * user_id) so state partitions shard across executors via the usual
  * hash shuffle; watermarks bound state size; file-source streams
  * parallelize by input file split. RocksDB state store is the intended
  * production backend (`spark.sql.streaming.stateStore.providerClass`) —
  * nothing below depends on the in-memory provider.
  */
object StreamOps {

  /** Events schema as produced by the driver (TESTDATA.md), with `ts`
    * surfaced as a real TimestampType. The driver's parquet stores
    * TIMESTAMP(NANOS), which Spark reads as long nanos under the legacy
    * conf (see [[graft.core.Tables.events]]).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Stateless slice — streaming `filter(pred).map({shape})`. Runs with
    * zero state; at scale this is a pure per-file map, no shuffle. */
  def filterShape(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase" && col("value") > 0)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        round(col("value"), 2).as("amount"))

  /** Streaming `count_by(event_type)` over tumbling event-time windows
    * with a watermark. Output: one row per (window, event_type) once the
    * watermark passes the window end (append semantics downstream).
    */
  def countByWindow(
      events: DataFrame,
      watermark: String = "1 hour",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Rolling analytics analog (SURVEY §2.5): sliding windows — every
    * event contributes to `len/slide` overlapping windows; avg/min/max
    * per slide. */
  def slidingAgg(
      events: DataFrame,
      len: String = "2 hours",
      slide: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), len, slide))
      .agg(
        avg("value").as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"),
        col("avg_value"), col("min_value"), col("max_value"), col("cnt"))

  /** Streaming `unique_by(event_id)` — keep-first dedup bounded by the
    * watermark (state is dropped once event-time passes). */
  def dedupeByIdWithinWatermark(
      events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user: gap-based `group_by(user)` —
    * the canonical "no reference semantics to copy" op (SURVEY §7.3);
    * we define sessions as activity gaps > `gap`. */
  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(
        col("session_window.start").as("sess_start"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class Ev(
      event_id: Long, tsMicros: Long, user_id: Long,
      event_type: String, value: Double)
  final case class RunningTotal(user_id: Long, n: Long, total: Double)

  /** `accumulate(fn)` analog — an arbitrary running fold per user via
    * `flatMapGroupsWithState` (SURVEY §2.11: custom state). Emits the
    * updated running total for each new batch of a user's events.
    * State is one small record per user — shards by user_id hash.
    */
  def runningTotals(
      spark: SparkSession,
      events: DataFrame): org.apache.spark.sql.Dataset[RunningTotal] = {
    import spark.implicits._
    events
      .select(
        col("event_id"), unix_micros(col("ts")).as("tsMicros"),
        col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[RunningTotal]) => {
          val prev = state.getOption.getOrElse(RunningTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          evs.foreach { e => n += 1; total += e.value }
          val next = RunningTotal(uid, n, total)
          state.update(next)
          Iterator(next)
        })
  }

  /** Stream enrichment: the streaming `equi_join` against a STATIC
    * dimension (the index-join idiom, §2.3, on a stream). Stream-static
    * joins are stateless in Structured Streaming — each micro-batch
    * joins against the dim as of that batch; with a bounded dim Spark
    * broadcasts it, so no stream-side shuffle at any scale. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** The relational compiler on a STREAMING frame: the same jetro text
    * that runs against parquet tables (graft.plans.Lower) compiles
    * against an unbounded stream. Stateless lowerings — `{pred}` /
    * filter, map shapes, pick/omit, scalar functions, f-strings, patch
    * blocks — become pure per-micro-batch maps (zero state, no
    * shuffle at any scale). `None` when the lowering bails (doc-mode
    * fallback territory). Order-dependent chains (`sort_by` + the
    * window family) compile to sorts/global row numbers that
    * Structured Streaming rejects when the query starts — the same
    * contract as hand-written streaming code, asserted in
    * StreamingSpec. */
  def lowerStream(expr: String, table: String, stream: DataFrame): Option[DataFrame] =
    graft.plans.Lower.tryCompile(expr, t =>
      if (t == table) stream
      else throw new graft.plans.LowerException(s"not the stream table: $t"))
}
