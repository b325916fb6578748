package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query paired with its DuckDB oracle SQL (None → the driver
  * records a weaker rows-only check; used for ops DuckDB can't express). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Once-per-(session, sfDir) fixture builds for the round-trip queries
  * (compact/maintain/skip/export/change-feed/time-travel): the mutation
  * history a round-trip query replays — ingest, seal, delete, upsert,
  * compact, index build, export write — is the OFFLINE setup of the
  * surface it measures (the read-back profile, the netted delta, the
  * snapshot read). Building it once per (session, sfDir, fixture) is
  * the same discipline the ANN queries apply to model training
  * ("training is the offline step — cache so repeated runs time the
  * SERVE path"): correctness is untouched (the builds are
  * deterministic, and a Verify run builds exactly once anyway), while
  * the bench's repeated passes time the query surface instead of
  * re-paying the setup I/O every rep. A failed build is NOT cached —
  * the next call retries. */
private[queries] object BuiltFixtures {
  private val store =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), Any]()
  def once[T](s: SparkSession, dir: String, name: String)(build: => T): T =
    store.computeIfAbsent((System.identityHashCode(s), dir, name),
      _ => build).asInstanceOf[T]
}

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
