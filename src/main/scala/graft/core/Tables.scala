package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over the driver-generated TPC-H-ish parquet layout
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * All engine queries read through here so that scan-level concerns
  * (pushdown-friendly reads, schema expectations) live in one place.
  * At 100 TB these would be partitioned/ bucketed tables registered in a
  * catalog; the accessor indirection means swapping `spark.read.parquet`
  * for `spark.table` is a one-line change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // events needs its conf + ts normalisation on EVERY access path —
    // generic resolvers (Lower's table resolver, the CLI) come through
    // here, and without the reroute they'd only work if some earlier
    // events accessor had already set the session conf
    if (name == "events") events(spark, sfDir)
    else raw(spark, sfDir, name)

  /** Stored-order access: the raw scan, guaranteed free of any
    * compute-spread repartition. Document-mode semantics depend on the
    * table's stored row order (`$.t.first()`, enumerate, keep-first
    * dedup over the document array), so the doc-rung collector must see
    * rows exactly as the parquet lays them out.
    */
  def stored(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsNorm(raw(spark, sfDir, name))
    else raw(spark, sfDir, name)

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  // ── compute-spread: repartition unsplittable inputs under HEAVY
  //    per-row operators ──
  // The local testdata ships one single-row-group parquet file per
  // table, so every scan is ONE task no matter the core count — exactly
  // the "one huge unsplittable file" input-skew case (optimization
  // guide §2.5): per-row work serializes on one core until the first
  // exchange. Remedy per the guide: repartition immediately after the
  // read. Round 11 first applied this to EVERY table read and measured
  // the full bench both ways: per-row-HEAVY lanes (interpreter rungs,
  // string-split array chains, map-object rebuilds, shingle/minhash
  // signatures) win 1.2×–3.3×, but scan-light lanes LOSE 1.3×–2.3× —
  // the round-robin exchange ships every row that a map-side partial
  // aggregate would have collapsed in place. So the spread is NOT a
  // table-read policy; the specific operators whose per-row cost
  // measurably exceeds one narrow-row shuffle call [[spreadCompute]] on
  // their input themselves.
  //
  // Scale-adaptive by construction: the trigger compares the scan's
  // effective parallelism against the cluster's defaultParallelism — at
  // production scale, where files are split properly, the check is
  // false and no exchange is added. `spark.graft.scan.spread=false`
  // disables globally.
  //
  // Round 12 (guide §2.5, §2.3; r11 verdict items 1/5):
  //  * The under-parallelism probe no longer calls `df.rdd`: on an input
  //    that already carries an exchange, `.rdd` materializes AQE query
  //    stages — running real jobs — at PLAN-BUILD time (the same
  //    compile-time-execution bug class r11 fixed in the rowwise
  //    reader). The spread now applies only to bare scan lineages
  //    (Project/Filter over one file relation), where effective
  //    parallelism is read driver-side from the file index + parquet
  //    footers. Row groups, not byte splits, are the probe's unit: a
  //    byte-split of a single-row-group file yields empty tasks, so
  //    `.rdd.getNumPartitions` OVERCOUNTED on large single-group files
  //    and silently disabled the spread exactly where it mattered.
  //  * The exchange is a deterministic hash repartition on xxhash64 of
  //    the row's hashable columns, not round-robin: round-robin's
  //    sortBeforeRepartition runs a full local sort INSIDE the one scan
  //    task the spread exists to relieve (at 10× bench scale that sort
  //    was the dominant map-side cost), and a deterministic key keeps
  //    retried map tasks consistent (guide §2.5, SPARK-38388).
  def spreadCompute(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.scan.spread", "true").toBoolean) return df
    val want = spark.sparkContext.defaultParallelism
    if (want <= 2) return df
    bareScanParallelism(df, want) match {
      case Some(have) if have * 2 < want =>
        hashKey(df) match {
          case Some(k) => df.repartition(want, k)
          case None    => df.repartition(want)
        }
      case _ => df // already parallel enough, or not a bare scan
    }
  }

  /** Effective max parallelism of a bare file-scan lineage, or None when
    * the plan is anything else (derived frames are left alone — probing
    * them risks compile-time execution, and their exchanges already
    * parallelise). Cheap and job-free: the file listing is the read's
    * own cached InMemoryFileIndex; parquet footers are read driver-side
    * once per (path, size, mtime) and memoised process-wide.
    */
  private def bareScanParallelism(df: DataFrame, want: Int): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    @annotation.tailrec
    def relation(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      case Project(_, c)          => relation(c)
      case Filter(_, c)           => relation(c)
      case SubqueryAlias(_, c)    => relation(c)
      case l: LogicalRelation     => l.relation match {
        case fs: HadoopFsRelation => Some(fs)
        case _                    => None
      }
      case _ => None
    }
    relation(df.queryExecution.logical).map { fs =>
      val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
      if (files.length >= want) files.length
      else {
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        var groups = 0
        val it = files.iterator
        // early-stop: past `want` groups the exact count is irrelevant
        while (it.hasNext && groups < want) {
          val f = it.next()
          groups += rowGroups(f.getPath, f.getLen, f.getModificationTime, conf)
        }
        math.max(groups, 1)
      }
    }
  }

  /** Row-group count per parquet file, memoised on (path, len, mtime).
    * Non-parquet/unreadable files fall back to a byte-split estimate at
    * the default 128 MB split size. */
  private val rowGroupCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def rowGroups(
      path: org.apache.hadoop.fs.Path, len: Long, mtime: Long,
      conf: org.apache.hadoop.conf.Configuration): Int = {
    val key = s"$path#$len#$mtime"
    val hit = rowGroupCache.get(key)
    if (hit != null) hit.intValue()
    else {
      val n: Int =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size() finally r.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            math.max(1L, len / (128L << 20)).toInt
        }
      rowGroupCache.put(key, Int.box(n))
      n
    }
  }

  /** xxhash64 over every hashable column — the deterministic spread key
    * (maps and other unhashable types are skipped; None when no column
    * qualifies, falling back to round-robin). */
  private def hashKey(df: DataFrame): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.xxhash64
    def hashable(t: DataType): Boolean = t match {
      case _: NumericType | _: StringType | _: BooleanType |
           _: BinaryType | _: DateType | _: TimestampType |
           _: TimestampNTZType => true
      case ArrayType(e, _) => hashable(e)
      case s: StructType   => s.fields.forall(f => hashable(f.dataType))
      case _               => false
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => df.col(s"`${f.name}`"))
    if (cols.isEmpty) None else Some(xxhash64(cols.toIndexedSeq: _*))
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet vintages: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects outright — read as raw
    * nanos under the legacy conf and truncate) and plain timestamp[us]
    * (read as TIMESTAMP_NTZ). Both are surfaced as the same microsecond
    * TimestampType column — with the session zone pinned to UTC that is
    * exactly the value DuckDB sees, so oracle comparisons on `ts` agree.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsNorm(raw(s, d, "events"))

  private def eventsNorm(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
