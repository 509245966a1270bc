package graft.tools

import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexpr.{JArr, JBool, JFloat, JInt, JNull, JObj, JStr, JValue, Jetro}
import scala.collection.immutable.VectorMap

/** Dev probe for the new array-lane lowerings: runs candidate
  * expressions through both backends over the DocColumnSpec corpus and
  * prints LOWERED/BAIL plus the first per-row divergence. Throwaway —
  * the real gate is DocColumnSpec.
  */
object ArrLaneProbe {
  private val itemType = StructType(Seq(
    StructField("qty", LongType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("tag", StringType, nullable = true)))
  private val docType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false), nullable = true),
    StructField("nums", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true)))

  private def toJ(v: Any): JValue = v match {
    case null                  => JNull
    case r: Row                =>
      JObj(VectorMap.from(r.schema.fieldNames.zipWithIndex.map {
        case (n, i) => n -> toJ(r.get(i))
      }))
    case s: scala.collection.Seq[_] => JArr(s.map(toJ).toVector)
    case l: Long               => JInt(l)
    case i: Int                => JInt(i.toLong)
    case d: Double             => JFloat(d)
    case f: Float              => JFloat(f.toDouble)
    case s: String             => JStr(s)
    case b: Boolean            => JBool(b)
    case other => throw new RuntimeException(s"unmapped $other")
  }

  private def jEq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JInt(x), JFloat(y)) => x.toDouble == y
    case (JFloat(x), JInt(y)) => x == y.toDouble
    case (JArr(xs), JArr(ys)) => xs.length == ys.length && xs.lazyZip(ys).forall(jEq)
    case (JObj(xs), JObj(ys)) => xs.keySet == ys.keySet && xs.forall { case (k, v) => jEq(v, ys(k)) }
    case _                    => a == b
  }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = (0 until 40).map { i =>
      val items =
        if (i == 7) null
        else (0 until i % 6).map { j =>
          Row((i * 3 + j) % 7L, ((i * 7 + j * 13) % 40) / 4.0 + 0.25,
            s"t${(i + j) % 5}")
        }
      val nums =
        if (i == 11) null
        else (0 until i % 5).map { j =>
          if ((i + j) % 6 == 0) null else java.lang.Long.valueOf((i * 5 + j) % 9L)
        }
      val tags = (0 until i % 4).map(j => s"g${(i * j) % 3}")
      Row(i.toLong, items, nums, tags)
    }
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), docType)

    val exprs: Seq[String] =
      if (argv.nonEmpty) argv.toSeq
      else Seq(
        "$.nums.collect()",
        "$.nums.append(99)",
        "$.nums.append()",
        "$.nums.prepend(0)",
        "$.tags.append(\"z\")",
        "$.nums.append(1.5)",
        "$.items.map({a: [qty], b: [qty + 1]}).flatten()",
        "$.nums.slice(1, 3)",
        "$.nums.slice(-2)",
        "$.nums.remove(3)",
        "$.nums.remove(lambda x: x > 4)",
        "$.tags.remove(\"g0\")",
        "$.nums.index(3)",
        "$.nums.index_of(3)",
        "$.tags.index_of(\"g1\")",
        "$.nums.indices_of(3)",
        "$.nums.find_first(@ > 4)",
        "$.items.find_first(qty > 4)",
        "$.items.find_one(lambda x: x.qty > 4)",
        "$.nums.take_while(@ < 5)",
        "$.nums.drop_while(@ < 5)",
        "$.items.take_while(qty < 5).map(qty)",
        "$.items.drop_while(qty < 5).map(tag)",
        "$.nums.window(2)",
        "$.nums.window(3)",
        "$.nums.chunk(2)",
        "$.nums.batch(3)",
        "$.nums.pairwise()",
        "$.nums.enumerate()",
        "$.tags.enumerate()",
        "$.nums.partition(@ > 3)",
        "$.items.partition(qty > 3)",
        "$.nums.zip($.nums.reverse())",
        "$.nums.zip($.tags)",
        "$.nums.zip_longest($.nums.take(1))",
        "$.tags.zip($.tags.reverse())",
        "$.nums.diff($.nums.take(2))",
        "$.nums.intersect($.nums.take(3))",
        "$.tags.union($.tags.reverse())",
        "$.nums.union($.nums)",
        "$.nums.lag()",
        "$.nums.lag(2)",
        "$.nums.lead(1)",
        "$.nums.diff_window()",
        "$.nums.pct_change()",
        "$.nums.zscore()",
        "$.nums.cum_max()",
        "$.nums.cum_min()",
        "$.nums.rolling_sum(2)",
        "$.nums.rolling_avg(3)",
        "$.nums.rolling_min(2)",
        "$.nums.rolling_max(2)",
        "$.items.map(price).rolling_sum(2)",
        "$.items.map(qty).cum_max()",
        "$.nums.compact().zscore()")

    val doc = struct(docType.fieldNames.map(col): _*)
    exprs.foreach { e =>
      Jetro.evalNative(e, doc, docType) match {
        case None => println(s"BAIL     $e")
        case Some(nc) =>
          val both =
            try docs.select(col("id"), nc.as("native"), to_json(doc).as("json"))
              .orderBy("id").collect()
            catch { case ex: Throwable =>
              println(s"RUNERR   $e  ${ex.getMessage.linesIterator.next().take(120)}")
              Array.empty[Row]
            }
          val compiled = Jetro.compile(e)
          var bad = 0
          both.foreach { r =>
            val native = toJ(r.get(1))
            val interp =
              try compiled.evalValue(JValue.parse(r.getString(2)))
              catch { case _: graft.jexpr.EvalException => JNull }
            if (!jEq(native, interp) && bad < 3) {
              bad += 1
              println(s"DIVERGE  $e  id=${r.getLong(0)} native=${native.render} interp=${interp.render}")
            }
          }
          if (bad == 0 && both.nonEmpty) println(s"OK       $e")
      }
    }
    spark.stop()
  }
}
