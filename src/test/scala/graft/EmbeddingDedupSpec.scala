package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Lsh
import graft.operators.EmbeddingDedup

/** The two scale dials of the embedding near-dup join: block salting
  * (spread a hot bucket's quadratic pairing over block-pair shuffle
  * keys WITHOUT changing the pair set) and LSH width (prefix-stable
  * hyperplanes — a wider join bucket refines the storage shard). */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private def vecs(n: Int, dim: Int): DataFrame =
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")

  private def pairSet(df: DataFrame): Set[(Int, Long, Long, Double)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("salting any number of blocks emits exactly the unsalted pair set") {
    val df = vecs(40, 8).localCheckpoint()
    val lsh = Lsh(8, 3, seed = 5L) // 8 buckets -> several rows per bucket
    // minSim = -2 keeps every within-bucket pair: the comparison is over
    // the FULL pair set, not just high-sim survivors
    val plain = pairSet(EmbeddingDedup.nearDupPairs(df, "vec_id", "embedding", lsh, -2.0, blocks = 1))
    assert(plain.nonEmpty)
    for (blocks <- Seq(2, 3, 5)) {
      val salted = pairSet(EmbeddingDedup.nearDupPairs(df, "vec_id", "embedding", lsh, -2.0, blocks))
      assert(salted === plain, s"blocks=$blocks diverged from unsalted pair set")
    }
    // a_id < b_id canonical form, no duplicates
    assert(plain.forall { case (_, a, b, _) => a < b })
  }

  test("a deliberately hot bucket pairs completely under salting") {
    // 60 identical vectors: every row routes to ONE bucket — the skew
    // case where an unsalted join puts all C(60,2) pairs on one task
    val hot = (0 until 60).map(i => (i.toLong, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val out = EmbeddingDedup.nearDupPairs(hot, "vec_id", "embedding",
      Lsh(4, 3, seed = 5L), minSim = 0.9, blocks = 4)
    val rows = out.collect()
    assert(rows.length === 60 * 59 / 2) // every pair found exactly once
    assert(rows.forall(_.getDouble(3) === 1.0))
    // the salt is in the shuffle key: the pair join partitions on the
    // block columns, not on shard alone
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_bi") && plan.contains("_bj"),
      "block salt columns missing from the physical pair-join plan")
  }

  test("LSH width is prefix-stable: a wider bucket id refines the storage shard") {
    val narrow = Lsh(64, 8)
    val wide = Lsh(64, 12)
    // same seed => identical leading hyperplanes
    assert(wide.planes.take(8).map(_.toSeq).toSeq === narrow.planes.map(_.toSeq).toSeq)
    val v = Seq.fill(64)(rng.nextGaussian())
    assert((wide.shardOf(v) & 0xFF) === narrow.shardOf(v))
  }
}
