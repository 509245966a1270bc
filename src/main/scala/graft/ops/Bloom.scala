package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime pruning for joins — the manual form of Spark's
  * own `InjectRuntimeFilter` (row-level runtime filtering), exposed as
  * an operator so a pipeline can apply it where the optimizer's
  * heuristics would not (filter side behind an opaque transform, anti
  * joins, reuse of one filter across several probes).
  *
  * The 100 TB shape: a semi/anti join of a huge corpus against a small
  * key set normally shuffles BOTH sides on the key. Building a
  * fixed-size Bloom filter over the small side and probing it in a
  * codegen'd predicate at the corpus scan kills the non-matching rows
  * BEFORE the exchange — the shuffle then carries only (candidate
  * matches + fpp·N false positives), and the exact join re-checks
  * survivors, so the result is bit-identical to the plain join at any
  * false-positive rate.
  *
  * The build is one `treeAggregate` returning a blob whose size is
  * FIXED at (expectedItems, fpp) build time — ~1.1 MB for 1M items at
  * 3% — independent of the actual row count, so the driver fetch is
  * bounded by construction (same contract as a broadcast dim). Size
  * `expectedItems` at or above the true distinct count of the build
  * side: undersizing only raises the false-positive rate (weaker
  * pruning), never breaks correctness.
  */
object Bloom {

  /** Serialized Bloom filter over `xxhash64(key)` of `dim`. Null keys
    * hash to the xxhash64 seed value like any other — harmless, since
    * every probe survivor is re-checked by an exact join. */
  def buildBytes(dim: DataFrame, key: Column,
                 expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val hashed = dim.select(xxhash64(key).as("__h"))
    val bf =
      // zero-row aggregate yields a null blob inside stat.bloomFilter
      // (NPE on deserialize); an explicit empty filter — "nothing is a
      // member" — is the correct value for an empty build side
      if (hashed.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else hashed.stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe: Spark's native `BloomFilterMightContain`
    * over the serialized filter — no false negatives, ≤fpp false
    * positives. Evaluates inside whole-stage codegen at the scan. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** `big LEFT SEMI JOIN dim ON big(bigKey) = dim(dimKey)`, with the
    * Bloom probe pruning the big side at its scan. Exact result: the
    * semi join re-checks every Bloom survivor. */
  def semiPruned(big: DataFrame, bigKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBytes(dim, col(dimKey), expectedItems, fpp)
    big.where(mightContain(bytes, col(bigKey)))
      .join(dim, big(bigKey) === dim(dimKey), "left_semi")
  }

  /** `big LEFT ANTI JOIN dim` with Bloom short-circuiting: rows the
    * filter PROVES absent from dim (no false negatives) are emitted
    * directly without ever reaching the join; only the "maybe" rows —
    * candidate matches plus fpp·N false positives — pay the exact anti
    * join. Two scans of `big` (both column-pruned and filter-pushed)
    * replace one full-table shuffle; at corpus scale the scan is the
    * cheap side of that trade. Null big-side keys match nothing, so
    * either branch routes them to the output, correctly. */
  def antiPruned(big: DataFrame, bigKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBytes(dim, col(dimKey), expectedItems, fpp)
    val p = mightContain(bytes, col(bigKey))
    val definite = big.where(!p)
    val maybe = big.where(p)
      .join(dim, big(bigKey) === dim(dimKey), "left_anti")
    definite.unionByName(maybe)
  }
}
