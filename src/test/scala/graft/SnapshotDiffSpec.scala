package graft

import org.apache.spark.sql.functions._
import graft.ops.SnapshotDiff

/** Contract of the snapshot diff: churn-only output, and a digest that
  * cannot confuse column boundaries or null with empty. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("added/removed/changed classified; unchanged rows never emitted") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val neu = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "t")
    val got = SnapshotDiff.diff(old, neu, "id", Seq("t"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("digest separates column boundaries and null vs empty") {
    val a = Seq((1L, "ab", "c"), (2L, null.asInstanceOf[String], "x"))
      .toDF("id", "u", "v")
    val b = Seq((1L, "a", "bc"), (2L, "", "x")).toDF("id", "u", "v")
    val got = SnapshotDiff.diff(a, b, "id", Seq("u", "v"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("identical snapshots produce an empty diff") {
    val s = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    assert(SnapshotDiff.diff(s, s, "id", Seq("t")).count() == 0L)
  }
}
