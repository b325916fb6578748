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
  /** Per-key memo whose body runs OUTSIDE the map's bin lock (a
    * multi-second Spark build inside computeIfAbsent would pin a
    * ConcurrentHashMap bin and serialize unrelated fixtures); the lazy
    * val's own monitor serializes per-key, and a failed build is not
    * cached — Scala lazy initialization retries after a throw. */
  private final class Once(f0: () => Any) {
    /** Cleared once the build succeeds so the thunk's captured
      * SparkSession stops being strongly reachable from this entry.
      * Caveat that remains BY DESIGN: a built value that itself holds
      * the session (a cached Lake does) is a WeakHashMap value
      * referencing its own key, which pins that entry for the JVM's
      * life — bounded at one small fixture set per session, the
      * explicit cost of "build once, reuse across bench reps". Entries
      * whose value is session-free (paths, counts) become collectable
      * with the session once the thunk is nulled. */
    private var f: () => Any = f0
    lazy val value: Any = { val v = f(); f = null; v }
  }

  /** Keyed on the LIVE session object (weak; identity can never
    * collide the way a recycled identityHashCode can), then
    * (sfDir, fixture). See Once for exactly when an entry becomes
    * GC-eligible with its session. */
  private val store =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), Once]]()

  def once[T](s: SparkSession, dir: String, name: String)(build: => T): T = {
    val perSession = store.synchronized {
      var m = store.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), Once]()
        store.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name), _ => new Once(() => build))
      .value.asInstanceOf[T]
  }

  /** The one definition of the session-scoped round-trip tmp path:
    * sanitized FULL sfDir (collision-free, unlike a 32-bit hashCode)
    * plus the Spark application id (two concurrent driver JVMs on the
    * same sfDir write disjoint trees) plus the session object's
    * identity (sibling `newSession()`s share an applicationId but
    * cache fixtures per session object — without the discriminator a
    * second session's rebuild would delete+rewrite the tree the first
    * session's still-cached Lake points at). */
  def sessionTmp(s: SparkSession, dir: String, prefix: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${prefix}_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" +
      s.sparkContext.applicationId + "_" +
      java.lang.Integer.toHexString(System.identityHashCode(s))
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
