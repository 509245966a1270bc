package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Train/eval decontamination: find corpus documents that share long
  * word n-grams with a probe (benchmark/eval) set — the standard
  * contamination test applied before training on scraped corpora.
  *
  * Shape: both sides explode to (id, gram-hash) pairs and meet in ONE
  * equi-join on the hash — the corpus side never shuffles documents,
  * only 16-byte (id, hash) rows. `maxGramDf` drops grams whose corpus
  * document frequency exceeds the cap (boilerplate n-grams behave like
  * LSH's degenerate buckets: a gram in half the corpus would pair with
  * every probe that contains it and explode the join); real
  * contamination is carried by RARE long n-grams, so the cap costs no
  * recall in practice and bounds the join fan-out at cap x probes.
  * At 100 TB the probe side (an eval suite) is small: AQE broadcasts
  * its gram set and the whole check is a map-side semi-join over the
  * corpus scan.
  */
object Decontam {

  /** (corpus_id, probe_id, n_shared) for every corpus/probe pair
    * sharing at least one word-`n`-gram, self-pairs excluded. */
  def overlaps(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, maxGramDf: Int = 0): DataFrame = {
    // hash AFTER the explode (codegen'd md5 over flat rows, not an
    // interpreted transform lambda); distinct on grams ≡ distinct on
    // their hashes
    def gramRows(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
        explode(array_distinct(
          Text.wordNgrams(Text.tokens(col(textCol)), n))).as("__g0"))
        .select(col(outId), md5(col("__g0")).as("g"))
    val c0 = gramRows(corpus, "corpus_id")
    val c =
      if (maxGramDf <= 0) c0
      else {
        // Partial-aggregable document frequency per gram: map-side
        // combine counts each gram inside every partition, so a hot
        // gram's postings never cluster into one task (the
        // count-over-Window idiom would funnel exactly the boilerplate
        // grams the cap exists to bound through a single partition).
        // The hot set holds at most distinctGrams/maxGramDf values —
        // genuinely tiny for realistic caps, but NOT bounded for
        // maxGramDf = 1 on a near-duplicate-free corpus, so the join
        // side is left to the planner/AQE (which broadcasts small sets
        // at runtime) instead of a forced broadcast hint that would
        // collect an unbounded set onto the driver.
        val hot = c0.groupBy("g")
          .agg(count(lit(1)).as("__df"))
          .where(col("__df") > maxGramDf)
          .select("g")
        c0.join(hot, Seq("g"), "left_anti")
      }
    val p = gramRows(probes, "probe_id")
    c.join(p, Seq("g"))
      .where(col("corpus_id") =!= col("probe_id"))
      .groupBy("corpus_id", "probe_id")
      .agg(count(lit(1)).cast("long").as("n_shared"))
  }
}
