package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY §4.6 / the 100 TB design
  * checklist): when one join key carries a disproportionate share of the
  * fact rows AND the dimension side is too large to broadcast, a plain
  * shuffle join puts the whole hot key in one task. Salting splits each
  * hot key into `salts` sub-keys: the fact side gets a deterministic
  * per-row salt, the dim side is replicated once per salt value, and the
  * join runs on (key, salt) — the hot key now spreads across `salts`
  * tasks at the cost of a `salts`× blow-up of the (smaller) dim side.
  *
  * AQE's runtime skew-join split (spark.sql.adaptive.skewJoin) handles
  * the sort-merge case automatically; explicit salting remains the tool
  * for hash joins, for streaming joins, and when the planner must commit
  * before runtime stats exist.
  */
object Skew {

  /** Deterministic row salt in [0, salts): hashes the given columns so
    * re-runs and retries land identically (no rand() — retried tasks
    * must not re-salt differently). */
  def rowSalt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join of `fact` to `dim` on `key`, salted `salts` ways.
    * Result is identical to `fact.join(dim, key)`; only the physical
    * distribution differs. `saltOn` designates fact columns that make
    * the salt deterministic per row (default: the key itself plus all
    * fact columns is overkill — pass a row id). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltOn: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("__salt", rowSalt(salts, saltOn.map(col): _*))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
