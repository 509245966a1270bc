package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, col}
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

  /** Recursive descent `$..name` for static schemas (SURVEY §2.8
    * strategy (a)): enumerate every field named `name` at any struct
    * depth from the schema at PLAN time and emit the matching column
    * refs — the compile-time analogue of the reference's structural
    * bitmap index (exec/structural.rs). Zero runtime search; pruning
    * reads only the matched branches.
    */
  def descendantPaths(schema: StructType, name: String): Seq[String] = {
    def go(path: Seq[String], tpe: StructType): Seq[Seq[String]] =
      tpe.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        val here = if (f.name == name) Seq(p) else Nil
        f.dataType match {
          case st: StructType => here ++ go(p, st)
          case _              => here
        }
      }
    go(Nil, schema).map(_.mkString("."))
  }

  /** All `$..name` matches as one array column (pre-order). */
  def descend(df: DataFrame, name: String): Column = {
    val paths = descendantPaths(df.schema, name)
    if (paths.isEmpty) array()
    else array(paths.map(col): _*)
  }

  /** Batched nested-path patch (SURVEY §4.5): apply many `path := value`
    * updates in ONE struct rewrite per root column — the Spark analogue
    * of the reference's patch fusion, which batches adjacent same-root
    * `.set/.modify` patches into a single path trie
    * (plan/patch_fusion.rs). Updates on the same root build one
    * `withField` chain inside a single Column tree, which Catalyst's
    * OptimizeUpdateFields collapses to one `update_fields` node — the
    * plan stays one projection wide no matter how many leaves change
    * (asserted in PlanQualitySpec). Paths are dot-separated; the first
    * segment names the root column, the rest the nested field (created
    * if absent, per `withField`).
    */
  def patchFields(df: DataFrame, updates: Seq[(String, Column)]): DataFrame = {
    val byRoot = updates.zipWithIndex
      .groupBy(_._1._1.split("\\.", 2)(0))
      .toSeq.sortBy(_._2.head._2) // keep first-seen root order deterministic
    byRoot.foldLeft(df) { case (d, (root, ups)) =>
      val patched = ups.map(_._1).foldLeft(col(root)) { case (c, (path, v)) =>
        path.split("\\.", 2) match {
          case Array(_, sub) => c.withField(sub, v)
          case _             => v // bare root: replace wholesale
        }
      }
      d.withColumn(root, patched)
    }
  }
}
