package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE lineage-cut helper for every site that materializes an
  * intermediate frame feeding multiple downstream consumers (LSH
  * signature tables probed by both band-join sides, k-means assignment
  * tables feeding a self-join, iterative label propagation, …).
  *
  * Three modes, in precedence order:
  *   1. explicit `dir = Some(path)` — RELIABLE cut: write the frame to
  *      `path/cut-N` parquet (an HDFS/object-store path on a real
  *      cluster) and re-read it, so the cut survives executor loss and
  *      preemption on a 1000-executor job;
  *   2. session conf `spark.graft.checkpointDir` set — same reliable
  *      cut rooted there: ONE deployment-time conf upgrades every cut
  *      site in the engine from executor-local to durable, with zero
  *      API churn at the sites;
  *   3. neither — `localCheckpoint()`: executor-local blocks, fastest
  *      and the right default in local mode, but lost on preemption.
  *
  * Deliberately NOT `sc.setCheckpointDir` + `df.checkpoint()`: that
  * mutates the SparkContext's checkpoint directory globally and would
  * silently redirect every other job's reliable checkpoints in the
  * session (the trap ConnectedComponents documented first).
  *
  * [[cut]] step files carry a process-unique token, so many driver
  * processes can safely share ONE deployment-wide conf dir (the whole
  * point of mode 2) without overwriting each other's live cuts; files
  * accumulate across process lifetimes — vacuum the dir on whatever
  * cadence suits the deployment. [[cutter]] names steps by its plain
  * per-call counter (`<prefix>-N`, overwritten per invocation) — scope
  * its dir to one logical job. */
object Materialize {

  /** Session conf key for mode 2. */
  val confKey = "spark.graft.checkpointDir"

  private val step = new java.util.concurrent.atomic.AtomicInteger()
  private val processToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Cut `df`'s lineage; see object doc for mode selection. */
  def cut(df: DataFrame, dir: Option[String] = None): DataFrame =
    dir.orElse(confDir(df)) match {
      case Some(d) =>
        val p = s"$d/cut-$processToken-${step.getAndIncrement()}"
        df.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => df.localCheckpoint()
    }

  /** A cut function with its OWN step sequence under `prefix` — for
    * iterative algorithms whose per-round files should be identifiable
    * (`dir/<prefix>-0`, `dir/<prefix>-1`, …). Same mode precedence as
    * [[cut]]. */
  def cutter(dir: Option[String], prefix: String): DataFrame => DataFrame = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    df => dir.orElse(confDir(df)) match {
      case Some(d) =>
        val p = s"$d/$prefix-${n.getAndIncrement()}"
        df.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => df.localCheckpoint()
    }
  }

  private def confDir(df: DataFrame): Option[String] =
    Option(df.sparkSession.conf.get(confKey, null)).filter(_.nonEmpty)
}
