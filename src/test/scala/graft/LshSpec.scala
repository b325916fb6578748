package graft

import org.apache.spark.sql.functions._
import graft.functions.Lsh

/** Mirrors the reference's router properties
  * (/root/reference/tests/test_properties.py:33-46): shard ids in range,
  * deterministic across processes, and the Column expression agrees with
  * the plain-Scala router. */
class LshSpec extends SparkSpec {
  import spark.implicits._

  private val lsh = Lsh(dim = 5, numHashes = 4)

  test("shard in [0, numShards) for arbitrary vectors") {
    val rng = new scala.util.Random(123)
    (0 until 500).foreach { _ =>
      val v = Seq.fill(5)(rng.nextGaussian())
      val s = lsh.shardOf(v)
      assert(s >= 0 && s < lsh.numShards)
    }
  }

  test("deterministic: same seed -> same planes -> same routing") {
    val a = Lsh(dim = 5, numHashes = 4)
    val b = Lsh(dim = 5, numHashes = 4)
    assert(a.planes.map(_.toSeq).toSeq === b.planes.map(_.toSeq).toSeq)
    val v = Seq(0.1, -0.2, 0.3, 0.4, -0.5)
    assert(a.shardOf(v) === b.shardOf(v))
  }

  test("Column expression agrees with plain-Scala router") {
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(5)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vector")
      .select(col("id"), lsh.shardCol(col("vector")).as("shard"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === lsh.shardOf(v.map(_.toDouble)), s"vector $id")
    }
  }

  test("default router matches testdata dims: 8 hashes -> 256 shards") {
    assert(Lsh.default.numShards === 256)
    assert(Lsh.default.planes.length === 8)
    assert(Lsh.default.planes.head.length === 64)
  }

  test("prefix stability: widening keeps the narrow planes, so reshard refinement is exact") {
    // the contract Lake.reshard rests on: one seeded RNG fills planes
    // row-major, so Lsh(d, h, s).planes is elementwise equal to
    // Lsh(d, h + b, s).planes.take(h), and a width-(h+b) shard is the
    // width-h shard plus the shardColFrom(_, h) refinement bits
    val narrow = Lsh(dim = 16, numHashes = 5, seed = 7L)
    val wide = Lsh(dim = 16, numHashes = 9, seed = 7L)
    (0 until 5).foreach { i =>
      assert(narrow.planes(i).sameElements(wide.planes(i)), s"plane $i")
    }
    val rng = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val v = Seq.fill(16)(rng.nextGaussian())
      val n = narrow.shardOf(v)
      val w = wide.shardOf(v)
      assert((w & 31) === n, "low bits must be the narrow shard")
    }
    // and the Column refinement agrees with the plain-Scala split
    import spark.implicits._
    val vecs = (0 until 60).map(i => (i.toLong,
      Seq.fill(16)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v").select(col("id"),
      (narrow.shardCol(col("v")) + wide.shardColFrom(col("v"), 5))
        .as("derived"),
      wide.shardCol(col("v")).as("full"))
    assert(df.where(col("derived") =!= col("full")).count() === 0L)
  }
}
