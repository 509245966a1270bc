package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz seeds are fixed for CI determinism; exploratory runs can sweep
  * other seeds with GRAFT_FUZZ_SEED=<n> sbt test. */
object FuzzSeed {
  def apply(default: Long): Long =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(default)
}

/** Shared local SparkSession for specs (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  def fuzzSeed(default: Long): Long = FuzzSeed(default)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
