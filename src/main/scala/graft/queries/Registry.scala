package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query paired with its DuckDB oracle SQL (None → the driver
  * records a weaker rows-only check; used for ops DuckDB can't express). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++ DedupQueries.all ++ TextQueries.all ++
      RelationalQueries.all ++ OlapQueries.all ++
      MultimodalQueries.all ++ AnnQueries.all ++ PipelineQueries.all ++
      CurationQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
