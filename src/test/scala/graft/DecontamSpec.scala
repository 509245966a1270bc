package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Decontam
import scala.jdk.CollectionConverters._

/** The gram-DF cap: boilerplate n-grams present in most of the corpus
  * must stop pairing once capped, while rare (true-contamination)
  * grams keep their pairs. The uncapped path is oracle-verified by
  * q_decontam; this pins the cap semantics.
  */
class DecontamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  test("gram-DF cap drops boilerplate pairs, keeps rare-gram pairs") {
    val boiler = "terms of service apply here"       // in every corpus doc
    val rare = "zebra quark nimbus oracle fjord"     // only docs 3 and 100
    val rows = (0L until 8L).map { i =>
      Row(i, s"$boiler unique filler ${"x" * i.toInt} token stream $i " +
        (if (i == 3) rare else ""))
    } :+ Row(100L, s"probe question text $rare")
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema)
    val corpus = df.where(col("doc_id") < 100)
    val probes = df.where(col("doc_id") === 100)

    val uncapped = Decontam.overlaps(corpus, probes, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // only doc 3 shares the rare 5-gram with the probe
    assert(uncapped.keySet == Set(3L))

    // cap below the boilerplate DF: same answer (boilerplate grams are
    // corpus-internal, not shared with the probe), proving capping does
    // not disturb rare-gram recall
    val capped = Decontam.overlaps(
      corpus, probes, "doc_id", "text", n = 5, maxGramDf = 4)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      == uncapped)

    // now make the boilerplate SHARED with the probe: uncapped pairs
    // every corpus doc; capped keeps only the rare-gram pair
    val probes2 = spark.createDataFrame(
      new java.util.ArrayList[Row](Seq(
        Row(200L, s"$boiler $rare")).asJava), schema)
    val un2 = Decontam.overlaps(corpus, probes2, "doc_id", "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(un2 == (0L until 8L).toSet)
    val cap2 = Decontam.overlaps(
      corpus, probes2, "doc_id", "text", n = 5, maxGramDf = 4)
      .collect().map(_.getLong(0)).toSet
    assert(cap2 == Set(3L))
  }
}
