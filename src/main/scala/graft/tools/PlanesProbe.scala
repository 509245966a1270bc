package graft.tools

/** Prints the deterministic gaussian hyperplane matrix
  * (Similarity.planes seed 42) as exact shortest-round-trip decimals —
  * reference data for validating the q_ann_lsh DuckDB oracle. */
object PlanesProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42L)
    val out = new java.io.PrintWriter("/tmp/planes.txt")
    for (_ <- 0 until 16) {
      out.println((0 until 64)
        .map(_ => java.lang.Double.toString(rnd.nextGaussian()))
        .mkString(","))
    }
    out.close()
  }
}
