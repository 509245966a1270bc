package graft

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Tables
import graft.jexpr.{JArr, JFloat, JInt, JNull, JObj, JValue}
import graft.streaming.StreamOps
import scala.collection.immutable.VectorMap

/** Randomized streaming-vs-batch differential for the streaming rungs
  * (StreamOps.lowerStream / rowwiseStream): the same generated
  * element-wise pipelines the batch fuzzers build replay through
  * MemoryStream micro-batches, and the streamed rows must equal the
  * batch engine's rows over the same data — the distribution-over-
  * stream-concatenation contract that makes the streaming surface
  * trustworthy beyond StreamingSpec's hand-picked cases.
  *
  * Two passes: a multi-batch pass feeds the rows in three chunks (three
  * real micro-batches — element-wise stages must distribute over the
  * concatenation), and a bulk pass sweeps ≥100 generated pipelines
  * across two seeds single-batch. Both rungs must be exercised.
  */
class StreamFuzzSpec extends SparkSpec {

  private lazy val batchCustomer: DataFrame = Tables(spark, sf, "customer")
  private lazy val allRows: Vector[Row] = batchCustomer.collect().toVector
  private implicit lazy val rowEnc: Encoder[Row] = Encoders.row(batchCustomer.schema)
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Canonical row multiset entry: parse, drop null object fields (the
    * rowwise rung's raw JSON keeps "k":null where a DataFrame's toJSON
    * omits it), sort keys (read.json alphabetizes), collapse integral
    * doubles (a typed 17.0 and an interpreter-rendered 17 are one
    * value). */
  private def canon(s: String): String = {
    def go(v: JValue): JValue = v match {
      case JObj(fs) =>
        JObj(VectorMap.from(fs.toVector.collect {
          case (k, x) if x != JNull => k -> go(x)
        }.sortBy(_._1)))
      case JArr(xs) => JArr(xs.map(go))
      case JFloat(f) if f.isWhole && math.abs(f) < 1e15 => JInt(f.toLong)
      case other => other
    }
    go(JValue.parse(s)).render
  }

  private def batchRows(e: String): Vector[String] =
    Graft.query(spark, sf, e).toJSON.collect().toVector.map(canon).sorted

  private var nameSeq = 0

  /** Compile `e` against a fresh MemoryStream, feed `chunks` as
    * separate micro-batches, drain to a memory sink; returns the rung
    * taken and the canonical row multiset. */
  private def streamRows(e: String, chunks: Seq[Seq[Row]]): (String, Vector[String]) = {
    val ms = MemoryStream[Row]
    val (rung, out) = StreamOps.compileStream(e, "customer", ms.toDF())
      .getOrElse(fail(s"no streaming rung accepted: $e"))
    assert(out.isStreaming, e)
    nameSeq += 1
    val name = s"sfz_$nameSeq"
    val q = out.writeStream.format("memory").queryName(name).start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    val t = spark.table(name)
    val jsons =
      if (rung == "rowwise") t.collect().map(_.getString(0)).toVector
      else t.toJSON.collect().toVector
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (rung, jsons.map(canon).sorted)
  }

  private val preds = Seq(
    "c_acctbal > 1000", "c_nationkey < 13", "c_custkey % 3 == 0",
    "c_acctbal > -100 and c_nationkey >= 3", "c_mktsegment == \"BUILDING\"",
    "c_acctbal > 999999") // empty-result stressor

  /** One generated element-wise pipeline (the RowwiseFuzzSpec shapes:
    * both rungs, object streams only — scalar streams re-enter batch
    * through the _corrupt_record read and are StreamingSpec's
    * hand-pinned territory). */
  private def genExpr(rng: scala.util.Random): String = {
    val pred = preds(rng.nextInt(preds.length))
    val filterStage = rng.nextInt(3) match {
      case 0 => s"{$pred}"
      case 1 => s".filter($pred)"
      case _ => s".where($pred)"
    }
    rng.nextInt(10) match {
      case 0 => s"$$.customer$filterStage.map({k: c_custkey, seg: c_mktsegment})"
      case 1 => s"$$.customer$filterStage.map({k: c_custkey, u: c_name.upper(), b: c_acctbal * 2})"
      case 2 => s"$$.customer$filterStage.map({k: c_custkey, s: c_name.title_case()})" // rowwise
      case 3 => s"$$.customer$filterStage.map({k: c_custkey, w: c_mktsegment.words()})"
      case 4 => s"""$$.customer$filterStage.pick("c_custkey", "c_mktsegment")"""
      case 5 => s"""$$.customer$filterStage.omit("c_name", "c_acctbal", "c_address", "c_phone", "c_comment")"""
      case 6 => s"$$.customer$filterStage.map({k: c_custkey, w: c_name.words()}).explode(\"w\")"
      case 7 => s"$$.customer$filterStage.map({k: c_custkey, nw: c_name.words().len().rec(@)})" // forced rowwise
      // row-iterating writes: per-row patches on the streaming rung
      case 8 => s"$$.customer{$pred}.c_acctbal.modify(@ + 5)"
      case _ => s"patch $$ { customer[*].c_name: @.upper() }"
    }
  }

  test("multi-batch: element-wise pipelines distribute over micro-batch concatenation") {
    val rng = new scala.util.Random(fuzzSeed(20260817))
    val chunks = allRows.grouped((allRows.size / 3).max(1)).toSeq
    var rungs = Set.empty[String]
    (0 until 12).foreach { _ =>
      val e = genExpr(rng)
      val (rung, got) = streamRows(e, chunks)
      rungs += rung
      assert(got == batchRows(e), s"stream != batch for: $e")
    }
    assert(rungs == Set("lowered", "rowwise"),
      s"both rungs must be exercised, got $rungs")
  }

  test("bulk sweep: 100+ generated pipelines across two seeds, single batch") {
    var lowered = 0; var rowwise = 0
    Seq(20260818L, 20260819L).foreach { seed =>
      val rng = new scala.util.Random(fuzzSeed(seed))
      (0 until 52).foreach { _ =>
        val e = genExpr(rng)
        val (rung, got) = streamRows(e, Seq(allRows))
        if (rung == "lowered") lowered += 1 else rowwise += 1
        assert(got == batchRows(e), s"stream != batch for: $e")
      }
    }
    assert(lowered > 0 && rowwise > 0, s"rungs: lowered=$lowered rowwise=$rowwise")
  }
}
