package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * transitive-closure step a dedup pipeline runs AFTER pair generation
  * (LSH gives you near-dup PAIRS; picking one canonical document per
  * duplicate GROUP needs the component, because near-dup is not
  * transitive at the pair level: a~b, b~c ⇒ {a,b,c} one group).
  *
  * Each round every node takes the min component label among itself and
  * its neighbors; fixpoint after O(component diameter) rounds — and
  * near-dup components are shallow (stars/chains of a few docs), so
  * 2-4 rounds in practice. Per round: one shuffle join + one map-side-
  * combinable min aggregate; lineage cut by localCheckpoint so the plan
  * doesn't grow with iterations. (For adversarial graphs with huge
  * diameters the large-star/small-star variant halves rounds; not
  * needed for dedup workloads.) Deterministic: labels are min doc ids.
  */
object ConnectedComponents {

  /** @param edges undirected edge list
    * @param maxIter iteration bound; a graph that needs MORE than
    *        maxIter propagation rounds (diameter > maxIter — not a
    *        dedup shape) raises IllegalStateException rather than
    *        silently returning split components; convergence ON the
    *        last round is confirmed with one extra zero-change round
    * @param checkpointDir when Some(dir): cut lineage RELIABLY by
    *        materializing each round to `dir/cc-step-N` parquet (an
    *        HDFS/object-store path on a real cluster) and re-reading it,
    *        so a 20-round job survives executor loss. Deliberately NOT
    *        `sc.setCheckpointDir` + `df.checkpoint()`: that mutates the
    *        SparkContext's checkpoint directory globally and would
    *        silently redirect every other job's reliable checkpoints in
    *        the session. Step files are overwritten per invocation —
    *        reuse one dir per logical job. Default None =
    *        `localCheckpoint` — executor-local blocks, fine in local
    *        mode and fastest, but lost on preemption.
    * @return (id, component) for every node appearing in `edges`;
    *         component = min node id in the component */
  def components(edges: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    val cut: DataFrame => DataFrame = Materialize.cutter(checkpointDir, "cc-step")
    // both edge directions from ONE pass over `edges` (explode, not a
    // union of two scans): the upstream pair plan is often the expensive
    // part (an LSH band join), and a union evaluates it twice before the
    // cut can help (guide §2.4 — don't compute things twice)
    val sym = cut(edges
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct())

    // round 0 fused: under identity labels every neighbor's component IS
    // its id, so min-label propagation is a single aggregate over sym —
    // no identity-label table to build/cut and no join (two fewer jobs
    // per call than initializing labels = id and running a full round)
    var labels = cut(sym.groupBy(col("src"))
      .agg(min("dst").as("nmin"))
      .select(col("src").as("id"),
        least(col("src"), col("nmin")).as("component")))
    var changedPrev = labels.where(col("component") =!= col("id")).count()

    def round(): Long = {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("nc").as("nmin"))
      // carry the old label through the update so convergence is a
      // filter-count on the (checkpointed) result — no second join
      val updated = cut(labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component")))
      val changed = updated.where(col("component") =!= col("_old")).count()
      labels = updated.select("id", "component")
      changed
    }

    // the fused aggregate above IS propagation round 0 (i starts at 1),
    // so the maxIter bound still counts total propagation rounds
    var changed = changedPrev
    var i = 1
    while (changed > 0 && i < maxIter) { changed = round(); i += 1 }
    // a run whose LAST permitted round still changed labels may in fact
    // have just reached the fixpoint (diameter == maxIter); only a
    // zero-change confirming round can tell — run one before declaring
    // failure, so the bound is exact rather than off by one
    if (changed > 0 && round() > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(labels still moving) — raise maxIter for long-diameter graphs")
    labels
  }
}
