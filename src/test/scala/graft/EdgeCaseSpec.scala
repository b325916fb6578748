package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.{AsofJoin, Ivf}

/** Degenerate-input behavior, pinned: these are the documented edges
  * (NaN cosine on zero norm, schema-mismatch rejection, short/empty
  * payloads, fewer rows than centroids, empty join sides). */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    Seq(1).toDF("x").select(c.as("v")).head().getAs[A](0)

  test("cosine distance of a zero-norm vector is NaN (documented), and topK does not throw") {
    assert(one[Double](V.cosineDist(V.vecLit(Seq(0.0, 0.0)), V.vecLit(Seq(1.0, 0.0)))).isNaN)
    val lake = Lake(spark, LakeConfig(
      s"${Files.createTempDirectory("graft_edge")}/lake", dim = 2, numHashes = 2))
    lake.ingest(Seq((Seq(1.0f, 0f), "d")).toDF("vector", "document"))
    // NaN distances sort last in ascending order; query must not throw
    assert(lake.topKExact(Seq(0.0, 0.0), 3).collect().length === 1)
  }

  test("Lake.read rejects a location holding a foreign schema") {
    val dir = Files.createTempDirectory("graft_edge").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/lake")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 2))
    val e = intercept[IllegalArgumentException](lake.read())
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("text functions on empty/short strings do not throw") {
    assert(one[Long](T.fingerprint(lit(""))) === 0L)
    assert(one[scala.collection.Seq[String]](T.charNgrams(lit("ab"), 3)).isEmpty)
    assert(one[scala.collection.Seq[String]](T.shingles(lit(""), 2)).isEmpty)
    assert(one[String](T.predictedLang(T.tokens(lit("")))) === "en") // tie -> preference order
    assert(one[Long](T.simhash(array(), 16)) === 0L)
  }

  test("IVF with fewer rows than requested centroids degrades to k=rows") {
    val tiny = Seq((1L, Seq(1.0f, 0f)), (2L, Seq(0f, 1.0f))).toDF("vec_id", "embedding")
    val m = Ivf.train(tiny, "embedding", "vec_id", k = 8, iters = 2)
    assert(m.k === 2)
    val out = Ivf.search(Ivf.index(tiny, m, "embedding"), m,
      "embedding", "vec_id", Seq(1.0, 0.0), 5, nprobe = 2)
    assert(out.count() === 2)
  }

  test("as-of join with an empty side behaves (all-null payload / empty result)") {
    val left = Seq(("A", 1L, 10L)).toDF("k", "t_us", "lid")
    val right = Seq.empty[(String, Long, Long, Double)].toDF("k", "rt_us", "rid", "v")
    val noRight = AsofJoin.asof(left, right, "k", "t_us", "rt_us", Seq("rid", "v"), "rid")
    assert(noRight.count() === 1)
    assert(noRight.collect().head.isNullAt(3))

    val noLeft = AsofJoin.asof(
      Seq.empty[(String, Long, Long)].toDF("k", "t_us", "lid"),
      Seq(("A", 1L, 2L, 0.5)).toDF("k", "rt_us", "rid", "v"),
      "k", "t_us", "rt_us", Seq("rid", "v"), "rid")
    assert(noLeft.count() === 0)
  }

  test("hybridSearch / mmrSearch / deleteWhere on an empty lake return empty, not errors") {
    val dir = Files.createTempDirectory("graft_edge_empty").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 3))
    assert(lake.hybridSearch(Seq(1.0, 0, 0), Seq("anything"), 5).count() === 0L)
    assert(lake.mmrSearch(Seq(1.0, 0, 0), 5).count() === 0L)
    assert(lake.deleteWhere(lit(true)) === 0L)
    assert(lake.vacuum() === 0L)
  }

  test("lake ingest requires a vector column") {
    val lake = Lake(spark, LakeConfig(
      s"${Files.createTempDirectory("graft_edge")}/lake", dim = 2))
    intercept[Exception](lake.ingest(Seq(("x")).toDF("document")))
  }

  test("compact on an empty or nonexistent lake is a no-op returning 0") {
    val lake = Lake(spark, LakeConfig(
      s"${Files.createTempDirectory("graft_edge")}/lake", dim = 2, numHashes = 2))
    assert(lake.compact() === 0L)
    assert(!lake.exists())
  }

  test("empty-shingle docs generate no LSH band candidates") {
    // all-null signatures would otherwise share bare band keys (concat_ws
    // skips nulls) and pair every empty doc with every other — quadratic,
    // and divergent from the SQL oracle where NULL bands produce no pairs
    val docs = Seq((1L, ""), (2L, ""), (3L, "solo"),
      (10L, "the quick brown fox"), (11L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val sigs = graft.operators.TextDedup
      .minhashSignatures(docs, "doc_id", "text").localCheckpoint()
    val pairs = graft.operators.TextDedup.bandedCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)))
  }

  test("inverted interval (lo > hi) joins nothing, never throws") {
    import java.sql.Timestamp
    val intervals = Seq((1L,
      Timestamp.valueOf("2024-01-05 00:00:00"),
      Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("iv_id", "lo", "hi")
    val points = Seq((10L, Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("pt_id", "pt")
    // Spark sequence() auto-steps backwards for lo-bin > hi-bin, so bins
    // ARE generated — the exact residual filter must still reject all
    assert(graft.operators.RangeJoin
      .pointInInterval(intervals, points, "lo", "hi", "pt").count() === 0)
  }

  test("PQ training on an empty sample fails loudly, not deep in encoding") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Pq.train(empty, "vec", "id", dim = 8, m = 2, k = 4)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("Tables.events normalizes every fixture shape of ts to a session-TZ timestamp") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // the driver has regenerated events.parquet with different parquet
    // types across rounds (TIMESTAMP(NANOS) → read as long under the
    // legacy conf; plain timestamp[us] → TIMESTAMP_NTZ); every shape
    // must come out as the TimestampType the 14 events queries expect
    def dirWith(df: org.apache.spark.sql.DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_events_shape").toString
      df.write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    val base = spark.range(3).select(col("id"), lit("c").as("category"))
    // shape 1: long nanos (what the legacy conf yields for TIMESTAMP(NANOS))
    val nanos = dirWith(base.withColumn("ts",
      (lit(1767225600000000000L) + col("id") * 1000000000L)))
    // shape 2: plain timestamp[us] with isAdjustedToUTC=false → NTZ
    val ntz = dirWith(base.withColumn("ts",
      expr("timestamp_ntz '2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)")))
    // shape 3: already a session-TZ timestamp
    val ltz = dirWith(base.withColumn("ts",
      expr("timestamp '2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)")))
    for (d <- Seq(nanos, ntz, ltz)) {
      val got = Tables.events(spark, d)
      assert(got.schema("ts").dataType === TimestampType, s"dir $d")
      // all three shapes encode the same instants (session TZ is UTC)
      assert(got.select(max(col("ts")).cast("string")).head().getString(0)
        === "2026-01-01 00:00:02", s"dir $d")
    }
    // a parquet NTZ round-trip really is NTZ (the shape-2 premise)
    assert(spark.read.parquet(s"$ntz/events.parquet").schema("ts").dataType
      === TimestampNTZType)
  }

  test("stratifiedSample with n=0 is empty; sampling an empty frame is empty") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(graft.operators.Curation
      .stratifiedSample(docs, "lang", "doc_id", 0).count() === 0)
    assert(graft.operators.Curation
      .stratifiedSample(docs.where(lit(false)), "lang", "doc_id", 3).count() === 0)
  }

  test("streaming nearDupGate handles empty-string documents deterministically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStreaming
      .nearDupGate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("edge_gate_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData((1L, ""), (2L, ""))
      q.processAllAvailable()
      val got = spark.table("edge_gate_out")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      // both empty docs hash to the same bucket; first claims, second drops
      assert(got === Map(1L -> true, 2L -> false))
    } finally q.stop()
  }
}
