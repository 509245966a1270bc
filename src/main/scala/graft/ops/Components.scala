package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the clustering step that
  * turns near-duplicate PAIRS (MinHash/SimHash candidate output) into
  * duplicate CLUSTERS, so a corpus keeps exactly one representative per
  * transitively-connected group instead of dropping only direct pair
  * partners.
  *
  * Algorithm: iterative min-label propagation ("hash-to-min") with
  * pointer-doubling, on DataFrames. Every node starts labeled with
  * itself; each round every node takes the minimum of its own and its
  * neighbours' labels (one equi-join + one partial-aggregable groupBy
  * min), then shortcuts through its label's label (one more equi-join)
  * so the propagation reach DOUBLES per round; fixpoint = every node
  * holds the smallest id reachable from it, which IS its component id.
  * Convergence needs ~log2(diameter) rounds — 2-3 for the dense small
  * clusters near-dup graphs produce, ~9 even for a 500-link document
  * version CHAIN; `maxIters` bounds pathology and the loop stops early
  * the first round nothing changes (one scalar aggregate per round —
  * the same driver-side control flow GraphX/GraphFrames use for CC).
  * Lineage is truncated per round with localCheckpoint so the plan
  * doesn't grow with iterations. localCheckpoint stores blocks on the
  * executors — lost with a lost executor — so on a real cluster pass
  * `checkpointDir` to switch every truncation to a RELIABLE checkpoint
  * (HDFS/S3-backed `sparkContext.checkpoint`); the local default keeps
  * single-JVM runs free of tmp-dir churn.
  */
object Components {

  /** `(node, component)` for every node that appears in `edges`;
    * `component` = the smallest node id in the node's connected
    * component. Node ids must be LONG-castable. */
  def connected(edges: DataFrame, aCol: String, bCol: String,
                maxIters: Int = 20,
                checkpointDir: Option[String] = None): DataFrame = {
    require(maxIters > 0, "maxIters must be positive")
    // reliable-checkpoint mode: survives executor loss mid-iteration
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // symmetric edge list + self-loops (so isolated endpoints keep
    // their own label through the aggregate-only propagation step)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .union(e.select(col("src"), col("src").as("dst")))
      .union(e.select(col("dst").as("src"), col("dst").as("dst")))
      .distinct()
    val symT = truncate(sym)
    var labels = truncate(
      symT.select(col("src").as("node"), col("src").as("label")).distinct())
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // neighbour-min pass: label(x) <- min over {x} ∪ N(x) of label
      // (self-loops make the node's own label part of the aggregate)
      val nbr = symT.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min("label").as("label"))
      // pointer-doubling shortcut: label(x) <- label(label(x)). Labels
      // are always node ids (mins of ids present), so the lookup is an
      // inner equi-join, and label(y) <= y makes it monotone. Plain
      // neighbour propagation advances one hop per round (diameter
      // rounds on a chain — document version chains are exactly that);
      // the shortcut doubles the reach, so convergence needs
      // ~log2(diameter) rounds at the cost of one extra join per round.
      val next = nbr.alias("__a")
        .join(labels.alias("__b"), col("__a.label") === col("__b.node"))
        .select(col("__a.node").as("node"), col("__b.label").as("label"))
      val nextT = truncate(next)
      val changed = nextT.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .where(col("label") =!= col("old"))
        .limit(1).count()
      converged = changed == 0
      labels = nextT
      it += 1
    }
    // an unconverged result is silently WRONG (labels stop mid-merge) —
    // fail loudly instead; near-dup graphs converge in a handful of
    // rounds, so hitting this means the graph is not a dedup graph
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds; " +
        "raise maxIters (needs ~log2 of the graph diameter)")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Near-dup aware corpus filter: keep every document that is its
    * cluster's representative (the minimum id), plus every document
    * that never appeared in `edges`. One anti-join against the
    * non-representative nodes. */
  def keepRepresentatives(docs: DataFrame, idCol: String,
                          edges: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    val drop = connected(edges, aCol, bCol, maxIters)
      .where(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
