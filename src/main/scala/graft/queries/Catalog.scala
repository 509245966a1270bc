package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of every verifiable query the engine exposes, grouped by the
  * SURVEY §2 category it covers. `SparkEntry` delegates here.
  */
object Catalog {
  def groups: Seq[QueryGroup] = Seq(
    CoreQueries, WindowQueries, SequenceQueries, AggQueries,
    ArraySetQueries, ScalarQueries, ShapeQueries, DocQueries,
    TextQueries, SimilarityQueries, NativeUpsideQueries, LoweredQueries,
    PipelineQueries)

  lazy val all: Seq[QueryDef] = {
    val ds = groups.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
