package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema-directed struct utilities — the static-schema strategy for the
  * reference's dot-path / deep-traversal ops (SURVEY §2.8): when the
  * schema is known at plan time, nested paths expand to plain column
  * references (zero runtime cost, full pruning/pushdown) instead of a
  * per-row interpreted walk.
  */
object StructOps {

  /** `flatten_keys()` (reference O:path.rs): one output column per leaf
    * field, named by its dot-joined path. Top-level non-struct columns
    * keep their names. Purely a projection — Catalyst prunes unread
    * branches out of the scan.
    */
  def flattenKeys(df: DataFrame, sep: String = "."): DataFrame = {
    def leaves(path: Seq[String], tpe: StructType): Seq[Column] =
      tpe.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case st: StructType => leaves(p, st)
          case _ => Seq(col(p.mkString(".")).as(p.mkString(sep)))
        }
      }
    df.select(leaves(Nil, df.schema): _*)
  }
}
