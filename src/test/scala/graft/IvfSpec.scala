package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  test("train is deterministic and yields k centroids of the input dimension") {
    val m1 = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    val m2 = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    assert(m1.k === 8)
    assert(m1.centroids.forall(_.length === 64))
    assert(m1.centroids === m2.centroids)
  }

  test("every vector lands in a valid cell; cells partition the data") {
    val m = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    val cells = Ivf.index(emb, m, "embedding")
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.keys.forall(c => c >= 0 && c < 8))
    assert(cells.values.sum === emb.count())
  }

  test("nprobe=k recovers the exact brute-force top-10") {
    val m = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    val indexed = Ivf.index(emb, m, "embedding")
    val ivfTop = Ivf.search(indexed, m, "embedding", "vec_id",
      Fixtures.queryVec, 10, nprobe = 8).select("vec_id").as[Long].collect().toSeq
    val exact = emb
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosineDist(
          col("embedding"), graft.functions.VectorFunctions.vecLit(Fixtures.queryVec)), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfTop === exact)
  }

  test("nprobe=2 of 8 keeps reasonable recall@10 while scanning a fraction") {
    val m = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    val indexed = Ivf.index(emb, m, "embedding")
    val approx = Ivf.search(indexed, m, "embedding", "vec_id",
      Fixtures.queryVec, 10, nprobe = 2).select("vec_id").as[Long].collect().toSet
    val exact = Ivf.search(indexed, m, "embedding", "vec_id",
      Fixtures.queryVec, 10, nprobe = 8).select("vec_id").as[Long].collect().toSet
    val recall = (approx & exact).size / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall")
    val scanned = indexed.where(col("cell")
      .isin(m.cellsFor(Fixtures.queryVec, 2): _*)).count()
    assert(scanned < emb.count(), "must scan a strict subset")
  }
}
