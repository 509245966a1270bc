package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-language-model scoring — the perplexity-filter SHAPE from
  * published corpus pipelines (train a small LM on trusted text, score
  * every candidate document, drop the tail): the LM here is the corpus
  * unigram table itself, and the score is the exact mean token
  * probability under it. A production deployment would swap a real
  * n-gram/neural scorer into the same three stages; the distributed
  * shape — count, broadcast, score — is what this operator provides,
  * and the rational-arithmetic score is reproducible bit-for-bit in any
  * engine (no transcendental functions, one IEEE division per doc).
  */
object LangModel {

  /** "Train": corpus token counts — one partial-aggregable groupBy.
    * Train on the TRUSTED slice only (e.g. the train split) so scoring
    * the held-out slices measures genuine generalization, not leakage. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** "Score": mean token probability of each document under `counts`.
    * Exact rational form: mean = Σ c(tok) / (n_tokens × total), so the
    * only float op is one final division — deterministic across
    * engines and partitionings. Unknown tokens count 0 (the OOV mass).
    * Output: `idCol`, `n_tok`, `hit_mass` (Σ c over the doc's tokens),
    * `mean_prob`. */
  def scoreMeanProb(df: DataFrame, idCol: String, textCol: String,
                    counts: DataFrame): DataFrame = {
    val total = counts.agg(sum("c").as("__total"))
    val toks = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
    toks.join(counts, Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("c"), lit(0L))).as("hit_mass"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tok"), col("hit_mass"),
        (col("hit_mass").cast("double") /
          (col("n_tok").cast("double") * col("__total").cast("double")))
          .as("mean_prob"))
  }
}
