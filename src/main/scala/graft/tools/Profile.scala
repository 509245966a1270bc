package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

/** Stage-level profiling probe for the heavy pipeline ops (not part of
  * the driver contract). Prints per-stage wall seconds + row counts.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs rows=${docs.count()}")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // micro-variants of signature computation
    val base = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text")).as("sh"))
    time("v0 shingles only")(noop(base))
    time("v1 base-hash transform")(noop(
      base.select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hs"))))
    time("v2 current 16-lane sig")(noop(
      base.select(col("id"),
        graft.functions.Text.minhashSignature(col("sh"), 16).as("sig"))))
    val k = 16
    val aggd = base.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
      .groupBy("id")
      .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
        (1 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i")): _*)
    time("v3 explode+agg sig")(noop(aggd))

    val signed = time("signatures")(
      Dedup.withSignature(docs, "doc_id", "text").cache())
    time("signatures.count")(println("[profile] signed=" + signed.count()))
    val pairs = time("neardups full")(
      Dedup.minhashNearDups(docs, "doc_id", "text"))
    time("neardups.count")(println("[profile] pairs=" + pairs.count()))
    val again = time("neardups again (warm)")(
      Dedup.minhashNearDups(docs, "doc_id", "text"))
    time("neardups.count2")(println("[profile] pairs=" + again.count()))
    spark.stop()
  }
}
