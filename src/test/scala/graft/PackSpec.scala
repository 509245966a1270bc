package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text
import graft.ops.Pack

/** Invariants of concat-then-chunk sequence packing (ops.Pack), checked
  * against a trivially-correct sequential re-pack of the same stream on
  * the driver (the distributed prefix machinery vs a fold — two
  * algorithms must agree slice-for-slice).
  */
class PackSpec extends SparkSpec {

  private val budget = 64L

  private lazy val packed = Pack.contiguous(
    Tables.documents(spark, sf)
      .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok")),
    "doc_id", "n_tok", "doc_id", budget)
    .orderBy("doc_id", "seq_id")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  private lazy val toks = Tables.documents(spark, sf)
    .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok"))
    .orderBy("doc_id")
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  private def repack(b: Long): Vector[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    toks.filter(_._2 > 0).flatMap { case (id, tok) =>
      val start = off
      off += tok
      (start / b to (off - 1) / b).map { seq =>
        val sliceAbs = math.max(seq * b, start)
        (id, seq, start, sliceAbs - start,
          math.min((seq + 1) * b, off) - sliceAbs, sliceAbs - seq * b)
      }
    }.toVector
  }

  test("matches a sequential driver-side re-pack exactly") {
    assert(packed.toVector == repack(budget))
  }

  test("re-pack parity across a budget sweep") {
    for (b <- Seq(2L, 17L, 127L, 1000L)) {
      val got = Pack.contiguous(
        Tables.documents(spark, sf)
          .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", "doc_id", b)
        .orderBy("doc_id", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toVector
      assert(got == repack(b), s"budget=$b")
    }
  }

  test("every sequence except the last is exactly full and tiles without gaps") {
    val bySeq = packed.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, slices) =>
      val total = slices.map(_._5).sum
      if (seq != lastSeq) assert(total == budget, s"seq $seq holds $total")
      // slices tile [0, total): sorted by seq_off, each begins where the
      // previous ended
      val sorted = slices.sortBy(_._6)
      assert(sorted.head._6 == 0L, s"seq $seq starts at ${sorted.head._6}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 + a._5 == b._6, s"gap in seq $seq")
        case _           =>
      }
    }
  }

  test("every document's slices cover it exactly once, in order") {
    val byDoc = packed.groupBy(_._1)
    toks.filter(_._2 > 0).foreach { case (id, tok) =>
      val slices = byDoc(id).sortBy(_._4)
      assert(slices.map(_._5).sum == tok, s"doc $id")
      assert(slices.head._4 == 0L, s"doc $id first slice")
      slices.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"doc $id slice gap")
        case _           =>
      }
    }
    // zero-token docs are dropped
    toks.filter(_._2 == 0).foreach { case (id, _) =>
      assert(!byDoc.contains(id))
    }
  }

  test("materialized sequences reassemble the exact token stream") {
    val seqs = Pack.sequences(
        Tables.documents(spark, sf)
          .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks")),
        "doc_id", "toks", "doc_id", budget)
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[String](3)))
    val lastSeq = seqs.map(_._1).max
    seqs.foreach { case (seq, _, nTok, toks) =>
      assert(toks.length == nTok, s"seq $seq length")
      if (seq != lastSeq) assert(nTok == budget, s"seq $seq not full")
    }
    // global stream = all documents' tokens concatenated in doc order
    val stream = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .flatMap(r => r.getString(1).split("\\s+"))
    assert(seqs.flatMap(_._4).toSeq == stream.toSeq)
  }

  test("degenerate budgets: 1-token sequences and one giant sequence") {
    val tiny = Pack.contiguous(
      Tables.documents(spark, sf)
        .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok")),
      "doc_id", "n_tok", "doc_id", budget = 1L)
    val totalToks = toks.map(_._2).sum
    assert(tiny.count() == totalToks) // every token its own sequence
    val giant = Pack.contiguous(
      Tables.documents(spark, sf)
        .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tok")),
      "doc_id", "n_tok", "doc_id", budget = 1L << 40)
    // one sequence, one slice per non-empty doc
    assert(giant.select("seq_id").distinct().count() == 1)
    assert(giant.count() == toks.count(_._2 > 0))
  }
}
