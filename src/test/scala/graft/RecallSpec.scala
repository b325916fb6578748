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

  test("calibration staleness: small churn stays fresh, mass ingest goes stale, maintain() re-calibrates exactly then") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall_stale").toString
    val cfgL = LakeConfig(s"$tmp/lake", dim = 64, numHashes = 3)
    val lake = Lake(spark, cfgL)
    def batch(n: Int, shift: Double) = Tables.embeddings(spark, dir)
      .limit(n)
      .select(transform(col("embedding"), x => x + lit(shift))
        .cast("array<float>").as("vector"),
        concat(lit(s"d$shift-"), col("vec_id")).as("document"))
    lake.ingest(batch(120, 0.0))
    assert(lake.recallCalibStale().isEmpty, "no calibration yet -> None")
    assert(!lake.maintain().recallRecalibrated,
      "maintain() must never create a calibration the operator didn't ask for")
    lake.calibrateRecall(k = 10, sampleQueries = 8)
    assert(lake.recallCalibStale() === Some(false), "just calibrated -> fresh")
    // a no-op maintain() must NOT re-calibrate (the fresh-token path)
    val idle = lake.maintain()
    assert(!idle.recallRecalibrated, "no churn -> no recalibration")
    // small churn: the change token moves, but volume drift is far
    // under the threshold -> still fresh
    lake.ingest(batch(6, 0.1))
    assert(lake.recallCalibStale() === Some(false),
      "a small append must not invalidate the ladder")
    assert(!lake.maintain().recallRecalibrated)
    // mass ingest of a SHIFTED distribution: volume more than doubles
    // -> stale, and maintain() refreshes the calibration with the
    // persisted (k, sample)
    lake.ingest(batch(200, 3.0).union(batch(200, -3.0)))
    assert(lake.recallCalibStale() === Some(true),
      "post-churn distribution shift must read as stale")
    val healed = lake.maintain()
    assert(healed.recallRecalibrated, "maintain() must re-calibrate when stale")
    assert(lake.recallCalibStale() === Some(false), "healed -> fresh again")
    assert(!lake.maintain().recallRecalibrated, "and the next maintain() skips")
    // the refreshed ladder still serves the dial end-to-end
    assert(lake.topKAtRecall(Fixtures.queryVec, 5, 0.5).count() === 5L)
    // a DRAINED lake reads maximally stale but has nothing to sample:
    // maintain() must skip the recalibration, never fail the tick
    assert(lake.deleteWhere(lit(true)) > 0L)
    val drained = lake.maintain()
    assert(!drained.recallRecalibrated,
      "an empty lake cannot recalibrate; the tick must still succeed")
  }

  test("topKAtRecall: one-scan calibration is monotone and persisted; targets map to the promised plans") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_recall").toString
    val cfgL = LakeConfig(s"$tmp/lake", dim = 64, numHashes = 4)
    val lake = Lake(spark, cfgL)
    lake.ingest(Tables.embeddings(spark, dir)
      .select(col("embedding").as("vector"),
        col("vec_id").cast("string").as("id")))
    // no calibration yet → loud, with the fix named
    val e = intercept[IllegalStateException](
      lake.topKAtRecall(Fixtures.queryVec, k, 0.5))
    assert(e.getMessage.contains("calibrateRecall"))
    val recalls = lake.calibrateRecall(k = k, sampleQueries = 16)
    info(s"calibrated ladder: ${recalls.map(r => f"$r%.2f").mkString(", ")}")
    assert(recalls.size === 1 + cfgL.numHashes)
    // growing the probe set can only add exact hits → monotone exactly
    recalls.sliding(2).foreach { case Seq(a, b) => assert(b >= a); case _ => () }
    assert(recalls.head > 0.0 && recalls.last <= 1.0)
    // a FRESH session loads the persisted calibration (no re-measure)
    val lake2 = Lake(spark, cfgL)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getString(0)).toSet
    // target == the single-probe measured recall → the single-probe plan
    assert(ids(lake2.topKAtRecall(Fixtures.queryVec, k, recalls.head)) ===
      ids(lake2.topK(Fixtures.queryVec, k)))
    // the full ladder's own recall is reachable by construction — the
    // pruned plan (never the exact fallback) serves a full k answer
    assert(ids(lake2.topKAtRecall(Fixtures.queryVec, k, recalls.last)).size === k)
    // an unreachable target falls back to the EXACT scan — the promise
    // is never silently missed
    if (recalls.last < 1.0)
      assert(ids(lake2.topKAtRecall(Fixtures.queryVec, k, 1.0)) ===
        ids(lake2.topKExact(Fixtures.queryVec, k)))
    // achieved recall on HELD-OUT queries meets the target (within the
    // calibration's sampling tolerance): measure against exact
    val target = recalls(1) // nprobe-2 level: a real intermediate dial
    val achieved = Seq(Fixtures.queryVec, Fixtures.queryVec2).map { q =>
      val ex = ids(lake2.topKExact(q, k))
      (ids(lake2.topKAtRecall(q, k, target)) & ex).size.toDouble / k
    }
    info(f"target=$target%.2f achieved=${achieved.map(a => f"$a%.2f").mkString(", ")}")
    assert(achieved.sum / achieved.size >= target - 0.25,
      s"held-out achieved ${achieved} vs target $target")

    // the ladder is METRIC-specific: a session opening the same lake
    // under another metric must refuse the persisted calibration (which
    // shards hold a query's top-k depends on the distance ranking)
    val l2Lake = Lake(spark, cfgL.copy(metric = "l2"))
    val em = intercept[IllegalArgumentException](
      l2Lake.topKAtRecall(Fixtures.queryVec, k, target))
    assert(em.getMessage.contains("metric"), em.getMessage)
  }
}
