package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps reference vectors of Spark's `xxhash64` (strings, longs, ints,
  * and the exact multi-arg chains the dedup pipelines use) so the
  * DuckDB-SQL re-implementation in [[graft.queries.XxSql]] can be
  * validated bit-for-bit. Writes CSVs under /tmp/xxref/. */
object XxRefProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("xxref")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    def randStr(n: Int): String = {
      val cs = "abcdefghijklmnopqrstuvwxyz 0123456789,-:#"
      (0 until n).map(_ => cs(rnd.nextInt(cs.length))).mkString
    }
    // strings across every tail-length class incl. multi-stripe
    val strs = (0 to 100).map(randStr) ++
      Seq("", "a", "the", "hello world", "-123,456", "0",
        (0 until 7).map(_ => Long.MinValue.toString).mkString(",")) ++
      (0 until 200).map(_ => randStr(1 + rnd.nextInt(40)))
    strs.toDF("s").withColumn("h", xxhash64(col("s")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/xxref/strs")

    val longs = Seq(0L, 1L, -1L, 42L, Long.MinValue, Long.MaxValue) ++
      (0 until 200).map(_ => rnd.nextLong())
    longs.toDF("a").withColumn("h", xxhash64(col("a")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/xxref/longs")

    // two-long chains (gramHashes) and long+int-literal chains (lanes)
    val pairs = longs.zip(longs.reverse)
    pairs.toDF("a", "b").withColumn("h", xxhash64(col("a"), col("b")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/xxref/pairs")
    (0 until 16).flatMap(l => longs.take(20).map(a => (a, l)))
      .toDF("a", "lane")
      .withColumn("h", xxhash64(col("a"), col("lane")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/xxref/lanes")

    // int-literal + string chains (bandHashes shape)
    (0 until 4).flatMap(b => strs.take(60).map(s => (b, s)))
      .toDF("b", "s")
      .withColumn("h", xxhash64(col("b"), col("s")))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/xxref/bandstrs")

    spark.stop()
  }
}
