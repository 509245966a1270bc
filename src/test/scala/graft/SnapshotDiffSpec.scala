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

  test("randomized differential: diff classification matches a naive map compare") {
    val rnd = new scala.util.Random(fuzzSeed(2024))
    for (_ <- 1 to 5) {
      val oldM = (0 until 200).map(i =>
        i.toLong -> rnd.nextInt(8).toString).toMap
      val newM = oldM.flatMap { case (k, v) =>
        rnd.nextInt(4) match {
          case 0 => None                                  // removed
          case 1 => Some(k -> rnd.nextInt(8).toString)    // maybe changed
          case _ => Some(k -> v)                          // kept
        }
      } ++ (200 until 220).filter(_ => rnd.nextBoolean())
        .map(i => i.toLong -> "new")
      val want = ((oldM.keySet ++ newM.keySet).flatMap { k =>
        (oldM.get(k), newM.get(k)) match {
          case (None, Some(_))              => Some(k -> "added")
          case (Some(_), None)              => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _                            => None
        }
      }).toMap
      val got = SnapshotDiff.diff(
          oldM.toSeq.toDF("id", "t"), newM.toSeq.toDF("id", "t"),
          "id", Seq("t"))
        .select("id", "change").as[(Long, String)].collect().toMap
      assert(got == want)
    }
  }
}
