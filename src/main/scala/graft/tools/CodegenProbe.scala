package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: for one bench headline lane, report whether whole-stage
  * codegen actually compiled (subtree count + generated-code size), and
  * time the lane end-to-end with the noop sink. Usage:
  *   runMain graft.tools.CodegenProbe <lane> [trials]
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lane = args.headOption.getOrElse("b_map_lane")
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val fn = graft.Bench.headline.find(_._1 == lane)
      .getOrElse(sys.error(s"no lane $lane"))._2
    val df = fn(spark, sfDir)
    import org.apache.spark.sql.execution.debug._
    val pieces = df.queryExecution.debug.codegenToSeq()
    println(s"[probe] $lane: ${pieces.size} codegen subtree(s)")
    pieces.zipWithIndex.foreach { case ((subtree, code, _), i) =>
      println(s"[probe] subtree $i: codeLen=${code.length}")
      println(subtree.linesIterator.take(12).mkString("\n"))
    }
    (1 to trials).foreach { t =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] trial $t: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
