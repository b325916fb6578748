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
    * @return (id, component) for every node appearing in `edges`;
    *         component = min node id in the component */
  def components(edges: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("nc").as("nmin"))
      // carry the old label through the update so convergence is a
      // filter-count on the (checkpointed) result — no second join
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      changed = updated.where(col("component") =!= col("_old")).count()
      labels = updated.select("id", "component")
      i += 1
    }
    labels
  }
}
