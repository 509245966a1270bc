package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisects which step of Graft.rowwiseCompile evaluates the interpreter
  * (r11: the compute-spread probe was suspected of triggering a pass). */
object RowwiseCompileProbe {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = graft.Graft.rowwiseCounters(spark)
    val e = """$.supplier.map({k: s_suppkey, nw: s_name.words().len(),
              |               big: s_acctbal when s_acctbal > 100})""".stripMargin
    val plan = graft.Graft.rowwisePlan(e).get
    println(s"[probe] table=${plan._1} evalExpr=${plan._2.take(60)}…")
    val t0 = c.evaluated.value
    val raw = graft.core.Tables(spark, sf, plan._1)
    println(s"[probe] after Tables(): ${c.evaluated.value - t0}")
    val spreadDf = graft.core.Tables.spreadCompute(raw)
    println(s"[probe] after spreadCompute: ${c.evaluated.value - t0}")
    val sch = graft.plans.Lower.rowwiseStaticSchema(spreadDf.schema, plan._2)
    println(s"[probe] static schema proved=${sch.isDefined}: ${c.evaluated.value - t0}")
    // the compile must stay LAZY (zero interpreter work) even with the
    // compute-spread exchange in the plan — the r11 regression was
    // DataFrameReader.json calling .rdd, which under AQE materialises
    // query stages at compile time; the static path now parses with the
    // from_json expression instead
    val rw = graft.Graft.rowwiseCompile(spark, sf, e)
    println(s"[probe] after rowwiseCompile: ${c.evaluated.value - t0} (defined=${rw.isDefined})")
    rw.get.collect()
    println(s"[probe] after collect: ${c.evaluated.value - t0}")
    rw.get.collect()
    println(s"[probe] after collect2 (cached): ${c.evaluated.value - t0}")
    spark.stop()
  }
}
