package graft

import graft.ops.Components

/** Connected components (ops.Components) vs a driver-side union-find —
  * two different algorithms over random and adversarial graphs. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], maxIters: Int = 20): Unit = {
    val got = Components.connected(
        edges.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), s"edges=$edges")
  }

  test("chains, stars, cliques, merges, self-loops") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L)))                   // chain
    check(Seq((10L, 11L), (10L, 12L), (10L, 13L)))             // star
    check(Seq((1L, 2L), (1L, 3L), (2L, 3L)))                   // clique
    check(Seq((1L, 2L), (3L, 4L), (2L, 3L)))                   // merge
    check(Seq((5L, 5L)))                                       // self-loop
    check(Seq((7L, 6L), (6L, 5L)))                             // desc ids
    check(Seq((1L, 2L), (100L, 101L), (200L, 201L)))           // islands
  }

  test("random graphs match union-find") {
    val rng = new scala.util.Random(fuzzSeed(20260814))
    (0 until 10).foreach { _ =>
      val n = 30 + rng.nextInt(50)
      val edges = (0 until n).map(_ =>
        (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      check(edges)
    }
  }

  test("unconverged propagation fails loudly instead of mid-merge labels") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalStateException] {
      Components.connected(chain.toDF("a", "b"), "a", "b", maxIters = 2)
        .collect()
    }
    check(chain, maxIters = 20)
  }

  test("pointer doubling: a 300-link chain converges in log-many rounds") {
    // plain one-hop min propagation would need ~300 rounds; the
    // shortcut pass doubles reach per round, so 12 suffice
    val chain = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq
    check(chain, maxIters = 12)
  }

  test("keepRepresentatives keeps cluster minima and untouched docs") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((2L, 4L), (4L, 6L)).toDF("a", "b") // cluster {2,4,6}
    val kept = Components.keepRepresentatives(docs, "id", edges, "a", "b")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L)) // 4 and 6 dropped, rep 2 kept
  }

  test("reliable-checkpoint mode produces the same clusters") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
      val got = Components.connected(
          edges.toDF("a", "b"), "a", "b",
          maxIters = 20, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(edges))
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no checkpoint files written")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
