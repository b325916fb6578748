package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private lazy val data = {
    val rnd = new scala.util.Random(11)
    (0L until 300L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
  }
  private lazy val model = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))

  test("train is deterministic and shapes the codebooks (m × k × subDim)") {
    val again = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    assert(model === again)
    assert(model.m === 4 && model.k === 8 && model.subDim === dim / 4)
  }

  test("every code is in [0, k); encoding is stable across evaluations") {
    val codes = data.select(
      (0 until model.m).map(mi => model.codeCol(col("vec"), mi).as(s"c$mi")): _*)
    val rows = codes.collect()
    rows.foreach(r => (0 until model.m).foreach { mi =>
      assert(r.getInt(mi) >= 0 && r.getInt(mi) < model.k)
    })
    assert(codes.except(data.select(
      (0 until model.m).map(mi => model.codeCol(col("vec"), mi).as(s"c$mi")): _*))
      .count() === 0L)
  }

  test("ADC distance approximates true L2: PQ top-30 recalls most of exact top-10") {
    val q = {
      val rnd = new scala.util.Random(5)
      Seq.fill(dim)(rnd.nextGaussian())
    }
    val exact = data
      .select(col("id"), V.l2Dist(V.asDouble(col("vec")), V.vecLit(q)).as("d"))
      .orderBy(col("d"), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val pq = data
      .select(col("id"), model.adcDistCol(col("vec"), q).as("d"))
      .orderBy(col("d"), col("id")).limit(30)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size / 10.0
    assert(recall >= 0.5, s"recall@10-in-30 = $recall")
  }

  test("lake pq_code round-trip: stored codes decode to the model's codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_lake")
    val m16 = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = dim,
      numHashes = 3, pqCodebooks = Some(m16)))
    lake.ingest(data.select(col("vec").as("vector"),
      concat(lit("doc-"), col("id")).as("document")))
    val stored = lake.read()
      .select(col("document"), col("pq_code"), col("vector"))
      .collect()
    assert(stored.length === 300)
    // decode each stored word and compare against re-encoding the vector
    val reEnc = lake.read().select(col("document"),
      (0 until m16.m).map(mi =>
        org.apache.spark.sql.functions.shiftleft(
          m16.codeCol(col("vector"), mi).cast("long"), 8 * mi))
        .reduce(_ + _).as("again"), col("pq_code"))
    assert(reEnc.where(col("again") =!= col("pq_code")).count() === 0L)
  }

  test("topKPq with coarseK >= corpus equals exact retrieval; coarse scan reads only id+pq_code") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_topk")
    val m16 = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = dim,
      numHashes = 3, pqCodebooks = Some(m16)))
    lake.ingest(data.select(col("vec").as("vector"),
      concat(lit("doc-"), col("id")).as("document")))
    val q = {
      val rnd = new scala.util.Random(3)
      Seq.fill(dim)(rnd.nextGaussian())
    }
    val viaPq = lake.topKPq(q, 5, coarseK = 1000)
      .select("document", "dist").collect().map(r => (r.getString(0), r.getDouble(1)))
    val exact = lake.topKExact(q, 5)
      .select("document", "dist").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaPq.toSeq === exact.toSeq,
      "an exhaustive coarse stage must reduce to exact retrieval")
    // the compression must LAND: the coarse stage's scan projects only
    // the id and the 8-byte code word, never the float vector
    val plan = lake.topKPq(q, 5).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:string,pq_code:bigint>"), plan.take(1500))
  }

  test("topKPqRouted: route + coarse + rerank all stay inside the routed shards; exhaustive dials reduce to exact routed retrieval") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_routed")
    val m16 = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = dim,
      numHashes = 3, pqCodebooks = Some(m16)))
    lake.ingest(data.select(col("vec").as("vector"),
      concat(lit("doc-"), col("id")).as("document")))
    val q = {
      val rnd = new scala.util.Random(17)
      Seq.fill(dim)(rnd.nextGaussian())
    }
    val routed = lake.lsh.shardOf(q)
    // exhaustive coarse stage ⇒ exact retrieval over the routed shard
    val got = lake.topKPqRouted(q, 5, coarseK = 1000)
      .select("document", "dist").collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = lake.topKFiltered(q, 5, col("shard") === routed)
      .select("document", "dist").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq,
      "exhaustive topKPqRouted must equal exact routed retrieval")
    // single-probe results never leave the routed shard
    lake.topKPqRouted(q, 5).collect()
      .foreach(r => assert(r.getAs[Int]("shard") === routed))
    // multiProbe widens to exactly the Hamming-distance-1 shard set
    val probes = (routed +: (0 until 3).map(j => routed ^ (1 << j))).toSet
    lake.topKPqRouted(q, 5, multiProbe = true).collect()
      .foreach(r => assert(probes.contains(r.getAs[Int]("shard"))))
    // the plan must show BOTH stages pruned: every scan carries the
    // shard partition filter, and the coarse scan projects only
    // (id, pq_code) — the two claims that make this the 100 TB path
    val plan = lake.topKPqRouted(q, 5).queryExecution.executedPlan
    val scans = fileScansOf(plan)
    assert(scans.nonEmpty)
    scans.foreach(s => assert(
      s.partitionFilters.exists(_.toString.contains("shard")),
      s"scan missing shard partition filter: ${s.partitionFilters}"))
    scans.foreach(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
      .foreach(f => assert(f.contains(s"shard=$routed/"),
        s"pruned scan still lists $f")))
    assert(plan.toString.contains("ReadSchema: struct<id:string,pq_code:bigint>"),
      plan.toString.take(1500))
    // a user-partitioned lake has no LSH routing to compose with
    val userLake = Lake(spark, LakeConfig(s"$dir/user", dim = dim,
      partitionKey = Some("pk"), pqCodebooks = Some(m16)))
    val e = intercept[IllegalArgumentException](userLake.topKPqRouted(q, 5))
    assert(e.getMessage.contains("LSH"))
  }

  test("a lake refuses pq_code access under a different model; accepts an identical retrain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_fp")
    val loc = s"$dir/lake"
    Lake(spark, LakeConfig(loc, dim = dim, numHashes = 3, pqCodebooks = Some(model)))
      .ingest(data.select(col("vec").as("vector"),
        concat(lit("doc-"), col("id")).as("document")))
    // deterministic retraining reproduces the model: same fingerprint, accepted
    val same = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    assert(same.fingerprint === model.fingerprint)
    val q = Seq.tabulate(dim)(i => (i % 3) * 0.5 - 0.5)
    assert(Lake(spark, LakeConfig(loc, dim = dim, numHashes = 3,
      pqCodebooks = Some(same))).topKPq(q, 3).count() === 3L)
    // one moved centroid = a retrain: different fingerprint, both write AND read refuse
    val other = Pq.PqModel(model.codebooks.updated(0,
      model.codebooks(0).updated(0, model.codebooks(0)(0).map(_ + 1.0))))
    assert(other.fingerprint !== model.fingerprint)
    val stale = Lake(spark, LakeConfig(loc, dim = dim, numHashes = 3,
      pqCodebooks = Some(other)))
    intercept[IllegalArgumentException] {
      stale.ingest(data.limit(1).select(col("vec").as("vector")))
    }
    intercept[IllegalArgumentException] { stale.topKPq(q, 3) }
  }

  test("re-open: a second session loads the persisted codebooks and serves the pq lake") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_reopen")
    val loc = s"$tmp/lake"
    val modelDir = s"$tmp/lake/_pq"
    // session 1: train + persist, build the lake with the model
    val m1 = Pq.loadOrTrain(spark, modelDir, data, "vec", "id",
      dim = dim, m = 4, k = 8, iters = 2)
    val lake1 = Lake(spark, LakeConfig(loc, dim = dim, numHashes = 3,
      pqCodebooks = Some(m1)))
    lake1.ingest(data.select(col("vec").as("vector"),
      concat(lit("d"), col("id")).as("document")))
    val q = (0 until dim).map(i => math.sin(i * 0.7) * 0.5)
    val r1 = lake1.topKPq(q, 5).select("document").collect().map(_.getString(0)).toSeq
    // session 2: no model object in hand — load it; training frame must
    // not be touched (accumulator), and the fingerprint gate must accept
    val acc = spark.sparkContext.longAccumulator("pq_train_rows")
    val s2 = spark.newSession()
    import org.apache.spark.sql.{Encoders, Row}
    val instrumented = data.map { r => acc.add(1); r }(Encoders.row(data.schema))
    val m2 = Pq.loadOrTrain(s2, modelDir, instrumented, "vec", "id",
      dim = dim, m = 4, k = 8, iters = 2)
    assert(acc.value === 0L, "a persisted PQ model must never retrain")
    assert(m2.fingerprint === m1.fingerprint)
    val lake2 = Lake(s2, LakeConfig(loc, dim = dim, numHashes = 3,
      pqCodebooks = Some(m2)))
    val r2 = lake2.topKPq(q, 5).select("document").collect().map(_.getString(0)).toSeq
    assert(r2 === r1, "second-session PQ retrieval must match exactly")
    // geometry mismatch is a config error, not a retrain
    val e = intercept[IllegalArgumentException](
      Pq.loadOrTrain(s2, modelDir, data, "vec", "id", dim = dim, m = 2, k = 8))
    assert(e.getMessage.contains("geometry"))
  }

  test("adcDistCol equals the driver-side LUT replay (expression correctness)") {
    val q = Seq.tabulate(dim)(i => (i % 3) * 0.5 - 0.5)
    val got = data
      .select(col("id"),
        model.adcDistCol(col("vec"), q).as("d"),
        (0 until model.m).map(mi => model.codeCol(col("vec"), mi))
          .reduce[org.apache.spark.sql.Column]((a, b) => a * lit(100) + b).as("packed"))
      .collect()
    got.foreach { r =>
      // unpack codes and replay the LUT sum in plain Scala
      var packed = r.getInt(2)
      val codes = Array.fill(model.m)(0)
      for (mi <- (model.m - 1) to 0 by -1) { codes(mi) = packed % 100; packed /= 100 }
      val want = BigDecimal(codes.zipWithIndex.map { case (c, mi) =>
        model.lutFor(q, mi)(c) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(1) - want) < 1e-9, s"id ${r.getLong(0)}")
    }
  }
}
