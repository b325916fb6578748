package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Lsh

/** ScalaCheck mirror of the reference's Hypothesis property suite
  * (/root/reference/tests/test_properties.py): router range for
  * arbitrary vectors (:33-38), add-returns-valid-shard (:41-46),
  * |query(k)| ≤ k with correct dimensionality (:49-58), empty-store
  * query (:74-85). */
class LakePropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: drive a ScalaCheck Gen from a fixed seed
    * (no scalatest-plus bridge in the offline dependency cache). */
  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), 25) { case (a, b) => f(a, b) }

  private val dim = 5
  private val lsh = Lsh(dim = dim, numHashes = 4)
  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0))

  test("property: router range 0 <= shard < numShards for arbitrary vectors") {
    forAll(vecGen) { v =>
      val s = lsh.shardOf(v)
      assert(s >= 0 && s < lsh.numShards)
    }
  }

  test("property: routing is a pure function (same vector -> same shard)") {
    forAll(vecGen) { v =>
      assert(lsh.shardOf(v) === lsh.shardOf(v))
      assert(lsh.shardOf(v) === Lsh(dim, 4).shardOf(v))
    }
  }

  test("property: |topK(k)| <= k and every hit has the store's dimension") {
    val lake = Lake(spark, LakeConfig(
      s"${Files.createTempDirectory("graft_prop")}/lake", dim = dim, numHashes = 4))
    val rng = new scala.util.Random(3)
    lake.ingest(Seq.fill(30)((Seq.fill(dim)(rng.nextGaussian().toFloat), "d"))
      .toDF("vector", "document"))
    forAll(vecGen, Gen.chooseNum(1, 10)) { (q, k) =>
      val rows = lake.topKExact(q, k).collect()
      assert(rows.length <= k)
      rows.foreach(r =>
        assert(r.getAs[scala.collection.Seq[Float]]("vector").length === dim))
    }
  }

  test("property: empty store returns no results for any query") {
    val lake = Lake(spark, LakeConfig(
      s"${Files.createTempDirectory("graft_prop")}/lake", dim = dim, numHashes = 4))
    forAll(vecGen, Gen.chooseNum(1, 10)) { (q, k) =>
      assert(lake.topK(q, k).count() === 0L)
    }
  }
}
