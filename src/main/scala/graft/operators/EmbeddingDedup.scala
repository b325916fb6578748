package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Lsh, VectorFunctions => V}

/** Embedding-level near-duplicate detection: LSH-bucketed candidate
  * generation + exact cosine verification, with the two dials that keep
  * the within-bucket join alive at 100 TB (the reference has no
  * embedding-dedup at all; its all-pairs scan, index.py:499-537, is the
  * shape this operator replaces):
  *
  *  - WIDTH (`lsh.numHashes`): expected bucket size shrinks ~2× per
  *    added hyperplane, and the hyperplane matrix is PREFIX-STABLE in
  *    `numHashes` (same seed ⇒ plane j identical), so a wider dedup
  *    join is a strict refinement of narrower storage routing — the low
  *    8 bits of a 12-hash bucket id ARE the 8-hash storage shard.
  *    Widen the join without re-routing stored data.
  *
  *  - SALT (`blocks`): within-bucket pairing is quadratic in bucket
  *    size and real embedding buckets are skewed, so one hot bucket
  *    stalls the stage on a single task. Every row gets a deterministic
  *    block in [0, blocks) from a hash of its id; pairs are generated
  *    under block-PAIR join keys (shard, i, j) with i ≤ j, so a hot
  *    bucket of B rows spreads its ~B²/2 pairs over blocks·(blocks+1)/2
  *    independent shuffle keys — the largest key holds ≈ (B/blocks)²
  *    pairs, the documented per-task bound. Replication cost: each row
  *    appears under ≤ blocks join keys (left side covers (blk, j ≥ blk),
  *    right side (i ≤ blk, blk)).
  *
  * The emitted pair set is EXACTLY the plain bucket join's, for any
  * `blocks`: a cross-block pair meets under its (min, max) block key in
  * one orientation only; a same-block pair meets under (blk, blk) in
  * both orientations and is kept id-ordered. Ids are canonicalized to
  * a_id < b_id. Fully deterministic — the salt is a hash, not a random.
  */
object EmbeddingDedup {

  /** Route `vecCol` with `lsh` and emit verified cosine near-dup pairs
    * `(shard, a_id, b_id, sim)` with `sim > minSim`, sim rounded to 6dp
    * (−0.0-normalized), a_id < b_id. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      lsh: Lsh = Lsh.default, minSim: Double = 0.4, blocks: Int = 1): DataFrame =
    bucketPairs(
      df.select(col(idCol).as("id"),
        V.asDouble(col(vecCol)).as("vec"),
        lsh.shardCol(col(vecCol)).as("shard"),
        V.l2Norm(col(vecCol)).as("nrm")),
      minSim, blocks)

  /** Block-salted within-bucket pair join over a prepared
    * `(shard, id, vec, nrm)` frame (norms precomputed per ROW, not per
    * pair). Use this form when the caller already carries the routed
    * frame (e.g. pipeline stages). */
  def bucketPairs(prepped: DataFrame, minSim: Double, blocks: Int = 1): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    // internal working columns — refuse input that would silently collide
    Seq("_blk", "_bi", "_bj").foreach(c => require(!prepped.columns.contains(c),
      s"bucketPairs uses internal column '$c'; rename it in the input first"))
    val base = prepped.withColumn("_blk",
      pmod(hash(col("id")), lit(blocks)).cast("int"))
    // lower-block row joins on the LEFT: left covers keys (blk, j≥blk),
    // right covers (i≤blk, blk) — every cross-block pair meets under
    // exactly its (min,max) block key, same-block pairs under (blk,blk)
    val a = base.withColumn("_bj", explode(sequence(col("_blk"), lit(blocks - 1))))
      .select(col("shard"), col("_blk").as("_bi"), col("_bj"),
        col("id").as("a_id"), col("vec").as("a_vec"), col("nrm").as("a_nrm"))
    val b = base.withColumn("_bi", explode(sequence(lit(0), col("_blk"))))
      .select(col("shard"), col("_bi"), col("_blk").as("_bj"),
        col("id").as("b_id"), col("vec").as("b_vec"), col("nrm").as("b_nrm"))
    a.join(b, Seq("shard", "_bi", "_bj"))
      // same-block: order by id (also drops self-pairs); cross-block:
      // single orientation already — keep all, canonicalize ids below
      .where(col("_bi") =!= col("_bj") || col("a_id") < col("b_id"))
      .select(col("shard"),
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        V.round6z(V.cosineSimPre(V.dot(col("a_vec"), col("b_vec")),
          col("a_nrm"), col("b_nrm"))).as("sim"))
      .where(col("sim") > minSim)
  }
}
