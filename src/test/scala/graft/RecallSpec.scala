package graft

import org.apache.spark.sql.functions._

import graft.functions.{Lsh, VectorFunctions => V}
import graft.operators.Ivf

/** Quantifies the recall/cost dial of every ANN pruning strategy against
  * exact brute force on the same query — the quality measurement the
  * reference's test suite never does (SURVEY.md §5: its ANN results are
  * only count-checked, which is how its inverted-metric bug survived).
  *
  * Measured on the sf0.001 gaussian embeddings: sign-LSH single-probe
  * recall@20 ≈ 0.10 — an honest reproduction of the reference's
  * one-bucket probe, whose recall is equally poor on isotropic data
  * (random hyperplanes scatter true neighbors across cells). The
  * learned-centroid IVF path (nprobe 4 of 8) reaches ≈ 0.90 scanning
  * half the data — which is why the engine offers it alongside the
  * reference-faithful router. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val k = 20

  private def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("vec_id"),
      round(V.cosineDist(col("embedding"), V.vecLit(Fixtures.queryVec)), 6).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(k)
      .select("vec_id").as[Long].collect().toSet

  test("recall@20: multiprobe >= single-probe; IVF nprobe=4 >= 0.5; exact = 1") {
    val emb = Tables.embeddings(spark, dir)
    val lsh = Lsh.default
    val exact = topIds(emb)

    val routed = lsh.shardOf(Fixtures.queryVec)
    val single = topIds(emb.where(lsh.shardCol(col("embedding")) === routed))
    val probes = routed +: (0 until lsh.numHashes).map(j => routed ^ (1 << j))
    val multi = topIds(emb.where(lsh.shardCol(col("embedding")).isin(probes: _*)))

    val model = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    val ivf = Ivf.search(Ivf.index(emb, model, "embedding"), model,
      "embedding", "vec_id", Fixtures.queryVec, k, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet

    def recall(s: Set[Long]) = (s & exact).size.toDouble / k
    info(f"recall@$k: single=${recall(single)}%.2f multi=${recall(multi)}%.2f ivf(4/8)=${recall(ivf)}%.2f")
    assert(recall(multi) >= recall(single))
    assert(recall(ivf) >= 0.5)
    assert(topIds(emb) === exact) // exact is self-consistent
  }
}
