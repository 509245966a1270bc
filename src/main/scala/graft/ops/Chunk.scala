package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking for retrieval/embedding pipelines:
  * split each document's text into fixed-size character windows with a
  * configurable overlap (chunk i covers `[i*step, i*step + size)`,
  * `step = size - overlap`), so each chunk can be embedded or indexed
  * independently while the overlap preserves cross-boundary context.
  *
  * Scale design: a pure narrow per-row fan-out — `sequence` +
  * `posexplode` + `substr`, all codegen'd, no shuffle, no UDF; the
  * chunk count per document is `ceil((len - overlap) / step)`, so the
  * explosion factor is bounded by `len/step + 1`. Filters on the parent
  * document push down through the explode to the parquet scan.
  */
object Chunk {

  /** One row per (document, chunk): `idCol`, `chunk_id` (0-based),
    * `chunk_start` (character offset), `chunk_text` (the window, short
    * at the tail). Every document yields at least one chunk (empty text
    * → one empty chunk), so a downstream join back to the parent never
    * loses rows. */
  def sliding(df: DataFrame, idCol: String, textCol: String,
              size: Int, overlap: Int): DataFrame = {
    require(size > 0, "size must be positive")
    require(overlap >= 0 && overlap < size, "overlap must be in [0, size)")
    val step = size - overlap
    // exact for any text Spark can hold (len < 2^31 « 2^53)
    val len = length(col(textCol)).cast("long")
    val n = greatest(lit(1L),
      ((len - lit(overlap.toLong) + lit(step - 1L)) / step).cast("long"))
    df.withColumn("chunk_id", explode(sequence(lit(0L), n - 1)))
      .select(
        col(idCol), col("chunk_id"),
        (col("chunk_id") * step).as("chunk_start"),
        col(textCol).substr((col("chunk_id") * step + 1).cast("int"), lit(size))
          .as("chunk_text"))
  }
}
