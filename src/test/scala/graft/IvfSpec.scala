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

  test("re-open: a second session loads the persisted model and searches identically, zero retraining") {
    val modelDir = java.nio.file.Files.createTempDirectory("graft_ivf_model")
      .toString + "/_ivf"
    // session 1: train, persist, index, search
    val m1 = Ivf.loadOrTrain(spark, modelDir, emb, "embedding", "vec_id",
      k = 8, iters = 3)
    val r1 = Ivf.search(Ivf.index(emb, m1, "embedding"), m1, "embedding",
      "vec_id", Fixtures.queryVec, 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    // session 2: the training frame is accumulator-instrumented — a
    // retrain would read it; loading the persisted model must not
    val acc = spark.sparkContext.longAccumulator("train_rows_read")
    val s2 = spark.newSession()
    val instrumented = Tables.embeddings(s2, dir)
      .map { r => acc.add(1); r }(org.apache.spark.sql.Encoders.row(
        Tables.embeddings(s2, dir).schema))
    val m2 = Ivf.loadOrTrain(s2, modelDir, instrumented, "embedding",
      "vec_id", k = 8, iters = 3)
    assert(acc.value === 0L, "a persisted model must never retrain")
    assert(m2.centroids === m1.centroids, "loaded centroids are bit-identical")
    assert(m2.fingerprint === m1.fingerprint)
    val r2 = Ivf.search(Ivf.index(Tables.embeddings(s2, dir), m2, "embedding"),
      m2, "embedding", "vec_id", Fixtures.queryVec, 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(r2 === r1, "second-session IVF-pruned search must match exactly")
  }

  test("persisted model integrity: mismatched overwrite refused, corrupt sidecar fails loudly") {
    val modelDir = java.nio.file.Files.createTempDirectory("graft_ivf_bad")
      .toString + "/_ivf"
    val m = Ivf.train(emb, "embedding", "vec_id", k = 4, iters = 2)
    Ivf.save(spark, m, modelDir)
    Ivf.save(spark, m, modelDir) // same model: idempotent no-op
    // a different training (different k) must not silently replace it
    val other = Ivf.train(emb, "embedding", "vec_id", k = 5, iters = 2)
    val e = intercept[IllegalArgumentException](Ivf.save(spark, other, modelDir))
    assert(e.getMessage.contains("refusing to overwrite"))
    // k mismatch at loadOrTrain is a config error, not a retrain
    val e2 = intercept[IllegalArgumentException](
      Ivf.loadOrTrain(spark, modelDir, emb, "embedding", "vec_id", k = 7))
    assert(e2.getMessage.contains("k="))
    // hand-edited fingerprint: load must fail, never mis-assign
    val p = new org.apache.hadoop.fs.Path(modelDir, "_ivf_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(s"""{"k": 4, "dim": 64, "fingerprint": "${"0" * 32}"}""".getBytes("UTF-8"))
    out.close()
    val e3 = intercept[IllegalArgumentException](Ivf.load(spark, modelDir))
    assert(e3.getMessage.contains("corrupt"))
  }
}
