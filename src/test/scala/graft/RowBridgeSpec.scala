package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexpr.{JValue, Jetro, RowBridge}
import scala.jdk.CollectionConverters._

/** Fidelity contract for the struct→JValue bridge: for every row of a
  * corpus covering nested structs, arrays (incl. empty / null / with
  * null elements), maps, decimals, dates, timestamps, binary and
  * booleans, `RowBridge.convert(schema)(row)` must equal
  * `JValue.parse(to_json(struct(...)))` structurally — the bridge IS
  * the JSON round-trip, minus the text. Plus an end-to-end check that
  * the struct-fed interpreter overload agrees with the JSON-fed one.
  */
class RowBridgeSpec extends SparkSpec {

  private val itemType = StructType(Seq(
    StructField("qty", LongType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("tag", StringType, nullable = true)))
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("active", BooleanType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("dec", DecimalType(12, 2), nullable = true),
    StructField("whole", DecimalType(10, 0), nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("at", TimestampType, nullable = true),
    StructField("at_ntz", TimestampNTZType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("items", ArrayType(itemType, containsNull = true), nullable = true),
    StructField("nums", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("props", MapType(StringType, StringType), nullable = true)))

  private def mk(i: Int): Row = {
    val items =
      if (i == 3) null
      else (0 until i % 4).map(j =>
        Row(if (j == 2) null else (i * 3 + j) % 7L, j + 0.25, s"t$j"))
    Row(
      i.toLong,
      if (i == 5) null else s"n$i",
      if (i % 4 == 0) null else Boolean.box(i % 2 == 0),
      if (i == 2) null else i * 1.5,
      if (i == 6) null else new java.math.BigDecimal(s"$i${i % 10}.2${i % 10}"),
      new java.math.BigDecimal(i * 17),
      java.sql.Date.valueOf(s"2026-0${i % 9 + 1}-1${i % 9}"),
      new java.sql.Timestamp(1700000000000L + i * 987654321L),
      java.time.LocalDateTime.ofEpochSecond(
        1700000000L + i * 98765L, i * 1000000, java.time.ZoneOffset.UTC),
      if (i == 4) null else Array[Byte](1, 2, (i % 100).toByte),
      items,
      if (i == 7) Seq(null, 4L, 5L) else Seq(i.toLong, i + 1L),
      if (i == 8) null else Map(s"k$i" -> s"v$i", "z" -> null))
  }

  private lazy val df = spark.createDataFrame(
    new java.util.ArrayList[Row]((0 until 12).map(mk).asJava), schema)

  test("bridge equals to_json round-trip on every row") {
    val cols = schema.fieldNames.map(col)
    val rows = df
      .select(to_json(struct(cols: _*)).as("js"), struct(cols: _*).as("st"))
      .collect()
    val conv = RowBridge.convert(schema)
    rows.zipWithIndex.foreach { case (r, i) =>
      val viaJson   = JValue.parse(r.getString(0))
      val viaBridge = conv(r.getStruct(1))
      assert(JValue.eq(viaJson, viaBridge),
        s"row $i\n json:   $viaJson\n bridge: $viaBridge")
    }
  }

  test("struct-fed interpreter matches JSON-fed interpreter") {
    val exprs = Seq(
      "$.items.filter(qty > 2).count()",
      "$.items.map(price).sum()",
      "$.nums.compact().sum()",
      "$.name ?? \"anon\"")
    val cols = schema.fieldNames.map(col)
    val out = df.select(
      Jetro.jetroEvalMany(exprs, to_json(struct(cols: _*))).as("viaJson"),
      Jetro.jetroEvalMany(exprs, struct(cols: _*), schema).as("viaStruct"))
      .collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"row $i")
    }
  }
}
