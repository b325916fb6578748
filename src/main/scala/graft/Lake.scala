package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Lsh, VectorFunctions => V}

/** Engine configuration — the analog of the reference's `Index` fields
  * (/root/reference/vector_lake/core/index.py:431-448). Unlike the
  * reference, `metric` is actually honored (there it is declared but
  * never read — SURVEY.md §1.3).
  *
  * @param location   table root (local path or any Hadoop FS URI — s3a://
  *                   replaces the reference's hand-rolled S3Bucket tier,
  *                   index.py:344-428)
  * @param dim        embedding dimension (index.py:433)
  * @param numHashes  LSH hyperplane count → 2^numHashes shards; the
  *                   reference derives it as round(log2(approx_shards))
  *                   (index.py:454-455)
  * @param metric     "cosine" | "l2" | "dot" (index.py:436 intent)
  * @param partitionKey when Some(colName): user-controlled partitioning
  *                   instead of LSH — the reference's `Partition` subclass
  *                   (index.py:592-607)
  * @param partitionKeyType type of the user partition column — used only
  *                   for the empty-lake bootstrap schema, so read() on an
  *                   empty lake agrees with what ingest will later write
  *                   (the LSH `shard` column is always IntegerType)
  * @param packSignBits when true, ingest MATERIALIZES a `packed` long
  *                   column (sign bit per dimension, first 64 dims) so
  *                   compressed Hamming retrieval reads 8 stored bytes
  *                   per row instead of recomputing the pack from the
  *                   full vector — the 32× column-compression actually
  *                   lands as stored bytes; see [[Lake.topKCompressed]]
  * @param pqCodebooks when Some(model): ingest MATERIALIZES a `pq_code`
  *                   long column — every subspace code packed 8 bits
  *                   wide (so m ≤ 8, k ≤ 256) — and
  *                   [[Lake.topKPq]] runs its coarse ADC stage over
  *                   those 8 stored bytes per row. Train the model once
  *                   on a sample ([[graft.operators.Pq.train]]) and
  *                   construct every writer/reader with the SAME model:
  *                   codes are only meaningful under their codebooks —
  *                   ENFORCED via a codebook fingerprint in
  *                   `_meta.json`: ingest/topKPq under a model whose
  *                   fingerprint differs from the one that first wrote
  *                   the lake fails loudly.
  */
final case class LakeConfig(
    location: String,
    dim: Int,
    numHashes: Int = 8,
    metric: String = "cosine",
    seed: Long = 42L,
    partitionKey: Option[String] = None,
    partitionKeyType: DataType = StringType,
    codec: String = "snappy",
    packSignBits: Boolean = false,
    pqCodebooks: Option[graft.operators.Pq.PqModel] = None) {
  require(Set("cosine", "l2", "dot")(metric), s"unknown metric $metric")
  pqCodebooks.foreach { m =>
    require(m.m <= 8 && m.k <= 256,
      s"pq_code packs 8 codes × 8 bits into one long: need m <= 8 (got ${m.m}) and k <= 256 (got ${m.k})")
    require(m.m * m.subDim == dim,
      s"PQ model covers ${m.m}×${m.subDim} dims but the lake stores $dim")
  }
}

/** A sharded vector lake on partitioned Parquet.
  *
  * Data model (SURVEY.md §1.1): rows of
  * `(id, vector, metadata, document, timestamp)` + a derived `shard`
  * partition column. One DataFrame, `partitionBy("shard")` on write;
  * Catalyst partition pruning on a literal `shard = h(q)` predicate
  * replaces the reference's "load only the routed bucket"
  * (index.py:487-489). Writes are append-mode parquet (the reference
  * rewrites whole segment files on every sync, index.py:294-308 — append
  * is strictly better and is what scales).
  */
final class Lake(spark: SparkSession, val cfg: LakeConfig) {
  import Lake._

  val lsh: Lsh = Lsh(cfg.dim, cfg.numHashes, cfg.seed)

  private def partCol: String = cfg.partitionKey.getOrElse("shard")

  /** Data columns as stored: canonical schema plus the optional
    * materialized `packed` sign-bit word and/or `pq_code` word. */
  private def storedCols: Seq[String] =
    dataCols ++ (if (cfg.packSignBits) Seq("packed") else Nil) ++
      (if (cfg.pqCodebooks.isDefined) Seq("pq_code") else Nil)

  private def storedFields: Seq[StructField] =
    schema.fields.toSeq ++
      (if (cfg.packSignBits) Seq(StructField("packed", LongType)) else Nil) ++
      (if (cfg.pqCodebooks.isDefined) Seq(StructField("pq_code", LongType)) else Nil)

  /** Ingest rows with at least a `vector` column; `metadata`, `document`
    * optional. Adds `id` (uuid), `timestamp`, routes `shard`, coerces
    * empty metadata to {"id": "1"} (the reference's quirk,
    * index.py:572-575 — an ingest rule, not a query rule), and
    * append-writes partitioned parquet.
    *
    * Scale: routing is a map-side expression; the only shuffle is the
    * cluster-by-shard exchange before the write, which keeps file count
    * = O(shards) instead of O(tasks × shards).
    */
  def ingest(rows: DataFrame): Unit = withWriterLock("ingest") {
    requirePqModelMatch()
    writeAppend(withDerived(rows))
  }

  /** Fail-fast single-writer gate for the mutating ops ([[ingest]],
    * [[deleteWhere]], [[upsert]], [[compact]]): an atomic marker-file
    * create (`FileSystem.create` with overwrite=false — atomic on
    * HDFS/POSIX) of `_lock` under the lake root, released in finally.
    * A concurrent mutation THROWS `ConcurrentModificationException`
    * instead of silently losing the race — directory-layout tables
    * have no optimistic-commit log, so a lost race is lost data (an
    * append landing in a directory mid-swap is dropped by the rename).
    * The reference's posture is last-persist-wins (index.py:294-308).
    *
    * Underscore-prefixed files are invisible to Spark's file index, so
    * readers never see the lock. A crashed writer (JVM death skips
    * finally) strands the lock and every later mutation fails loudly:
    * inspect, then [[vacuum]] — which removes a stale lock — to
    * recover. */
  private def withWriterLock[T](op: String)(body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(cfg.location, lockName)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(lock, false)
      catch { case e: java.io.IOException =>
        throw new java.util.ConcurrentModificationException(
          s"$op on ${cfg.location} refused: writer lock $lock is held " +
            s"(${lockHolder(fs, lock).getOrElse("holder unreadable")}). " +
            "Another maintenance op is in flight — retry after it " +
            "finishes; if its writer crashed, vacuum() removes the " +
            "stale lock.", e)
      }
    try {
      out.write(s"""{"op": "$op", "taken_at": "${java.time.Instant.now()}"}"""
        .getBytes("UTF-8"))
      out.close()
      body
    } finally fs.delete(lock, false)
  }

  private def lockHolder(fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        if (n <= 0) None else Some(new String(buf, 0, n, "UTF-8"))
      } finally in.close()
    } catch { case _: Throwable => None }

  /** Append-write an already-derived frame (shared by [[ingest]] and
    * [[upsert]]'s bootstrap path so the two can never diverge). */
  private def writeAppend(derived: DataFrame): Unit = {
    routingChecked // never append rows routed under foreign hyperplanes
    derived
      // cluster rows by partition value before the write: each task then
      // writes whole shard files instead of every task touching every
      // shard directory (the small-files explosion at scale)
      .repartition(col(partCol))
      .write.mode(SaveMode.Append)
      .option("compression", cfg.codec) // reference hard-codes gzip (index.py:308); snappy default scans faster
      .partitionBy(partCol)
      .parquet(cfg.location)
    writeMetaSidecar()
  }

  /** The ONE derived-column block, shared by batch and streaming ingest
    * so the two paths can never diverge: metadata coercion (column
    * missing → {"name":"unknown"}; null or EMPTY map → {"id":"1"}, the
    * reference's ingest quirk, index.py:572-575), document default,
    * uuid id, ingest timestamp, float vector cast, LSH shard routing.
    * All row-local expressions — map-side at any scale. */
  private def withDerived(rows: DataFrame): DataFrame = {
    var df = rows
    if (!df.columns.contains("metadata"))
      df = df.withColumn("metadata",
        map(lit("name"), lit("unknown")).cast(MapType(StringType, StringType)))
    else
      df = df.withColumn("metadata",
        when(col("metadata").isNull || size(col("metadata")) === 0,
          map(lit("id"), lit("1")).cast(MapType(StringType, StringType)))
          .otherwise(col("metadata")))
    if (!df.columns.contains("document")) df = df.withColumn("document", lit(""))
    // a caller-supplied id survives (upsert identity); absent → uuid,
    // the reference's default (index.py:577)
    if (!df.columns.contains("id")) df = df.withColumn("id", expr("uuid()"))
    df = df
      .withColumn("id", col("id").cast(StringType))
      .withColumn("timestamp", current_timestamp())
      .withColumn("vector", col("vector").cast(ArrayType(FloatType)))
    if (cfg.packSignBits)
      df = df.withColumn("packed", V.signPack(col("vector")))
    cfg.pqCodebooks.foreach { m =>
      df = df.withColumn("pq_code",
        (0 until m.m).map(mi =>
          shiftleft(m.codeCol(col("vector"), mi).cast("long"), 8 * mi))
          .reduce(_ + _))
    }
    if (cfg.partitionKey.isEmpty)
      df = df.withColumn("shard", lsh.shardCol(col("vector")))
    // footer attrs parity (reference index.py:296-305): Spark's parquet
    // writer serializes field metadata into the footer's spark-schema
    // key/value entry, so stamping the timestamp field lands last_update
    // + index attrs in EVERY data file's footer — readable by any
    // parquet reader (FooterMetaSpec proves it) — not just the sidecar
    val stamped = storedCols.map {
      case "timestamp" => col("timestamp").as("timestamp", footerStamp)
      case c           => col(c)
    }
    df.select((stamped :+ col(partCol)): _*)
  }

  /** Per-write footer attrs, stamped at plan-construction time (once per
    * batch ingest; once at stream start for the streaming path). */
  private def footerStamp: Metadata = new MetadataBuilder()
    .putString("graft.last_update", java.time.Instant.now().toString)
    .putLong("graft.dim", cfg.dim.toLong)
    .putString("graft.metric", cfg.metric)
    .build()

  /** Continuous ingest: the streaming form of [[ingest]] — the SAME
    * [[withDerived]] block (shard routing, metadata coercion incl. the
    * empty-map quirk), written by Structured Streaming's file sink
    * (exactly-once via checkpointed manifests). The reference has no
    * streaming path at all (SURVEY.md §2.10).
    *
    * `last_update` semantics on a long-running stream: the parquet
    * FOOTER stamp is evaluated once at plan construction, so every file
    * the stream ever writes carries the stream-START timestamp — the
    * `_meta.json` sidecar is the authoritative `last_update` here, and
    * a [[org.apache.spark.sql.streaming.StreamingQueryListener]] scoped
    * to this query re-stamps it after every data-carrying micro-batch
    * (the sidecar sits outside the sink's `_spark_metadata` manifest,
    * so the refresh cannot race the sink's exactly-once bookkeeping).
    * This matches the reference's per-persist stamping (index.py:
    * 296-305) at micro-batch granularity. */
  def ingestStream(rows: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): org.apache.spark.sql.streaming.StreamingQuery = {
    routingChecked // BEFORE the sidecar write below re-stamps it
    requirePqModelMatch() // likewise
    writeMetaSidecar()
    import org.apache.spark.sql.streaming.StreamingQueryListener
    // registered BEFORE start() so batch 0's progress event can't slip
    // through the start→addListener window. The query is given a unique
    // name, and onQueryStarted — which Spark delivers synchronously
    // INSIDE start(), before any progress or termination event — latches
    // the query id from it. Progress and termination then match on that
    // id alone: no sink-description substring test (which false-matched
    // sibling paths, /x/lake vs /x/lake2) and no post-start id
    // assignment (which leaked the listener when a query terminated
    // before start() returned).
    val qName = s"graft_ingest_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stamper = new StreamingQueryListener {
      @volatile private var queryId: java.util.UUID = null
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        if (e.name == qName) queryId = e.id
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == queryId && e.progress.numInputRows > 0)
          writeMetaSidecar()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == queryId) spark.streams.removeListener(this)
    }
    spark.streams.addListener(stamper)
    val query =
      try withDerived(rows)
        .writeStream
        .queryName(qName)
        .format("parquet")
        .option("path", cfg.location)
        .option("checkpointLocation", checkpoint)
        .option("compression", cfg.codec)
        .partitionBy(partCol)
        .trigger(trigger)
        .start()
      catch { case t: Throwable =>
        spark.streams.removeListener(stamper); throw t }
    query
  }

  /** Schema-validated read (reference validates column list on load,
    * index.py:249-250). Empty-location bootstrap returns an empty frame
    * with the canonical schema (index.py:247). */
  def read(): DataFrame = {
    routingChecked // a mismatched-config session must not prune/route
    if (!exists())
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(storedFields :+ StructField(partCol,
          if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType)))
    // mergeSchema: the default read infers from ONE footer (the
    // lexicographically first file), so an EXTRA column in any other
    // file would slip through null-filled instead of failing the
    // validation; merging unions every footer so added-column drift in
    // ANY file surfaces here. Known residual gap: a foreign file with a
    // SUBSET of the columns still unions to the canonical set and reads
    // null-filled — catching that needs per-footer comparison (an
    // O(files) metadata pass), same per-loaded-frame limitation as the
    // reference's validation (index.py:249-250). compact() rewrites
    // homogenize such files away. Footer merging stays cheap via
    // compact()'s O(shards) file-count discipline.
    val df = spark.read.option("mergeSchema", "true").parquet(cfg.location)
    val got = df.columns.toSet
    val want = storedCols.toSet + partCol
    require(got == want, s"schema mismatch: got $got want $want")
    df
  }

  private def distCol(q: Seq[Double]): Column = cfg.metric match {
    case "cosine" => V.cosineDist(col("vector"), V.vecLit(q))
    case "l2"     => V.l2Dist(col("vector"), V.vecLit(q))
    case "dot"    => -V.dot(col("vector"), V.vecLit(q)) // nearest = max dot
  }

  /** Single-probe kNN: prune to the LSH-routed shard (a *literal*
    * predicate so Catalyst prunes partition directories at planning),
    * then exact top-k — `TakeOrderedAndProject` does per-partition heap
    * top-k on executors + driver merge, structurally the reference's
    * per-shard search + merge (index.py:499-537). */
  def topK(q: Seq[Double], k: Int): DataFrame = {
    val routed = lsh.shardOf(q)
    topKWhere(q, k, col(partCol) === lit(routed))
  }

  /** Multi-probe variant: search all shards within Hamming distance 1 of
    * the routed shard (IVF-style recall/cost dial; still prunes 247 of
    * 256 directories at 8 hashes). */
  def topKMultiProbe(q: Seq[Double], k: Int): DataFrame = {
    val routed = lsh.shardOf(q)
    val probes = routed +: (0 until cfg.numHashes).map(j => routed ^ (1 << j))
    topKWhere(q, k, col(partCol).isin(probes: _*))
  }

  /** Exact kNN over the whole lake (no pruning). */
  def topKExact(q: Seq[Double], k: Int): DataFrame =
    topKWhere(q, k, lit(true))

  /** Batch kNN: many queries in ONE scan of the lake. The query set is
    * broadcast; per-query top-k uses the bounded-heap aggregate, so the
    * shuffle carries at most k rows per query per executor — the batch
    * shape the reference's one-query-at-a-time API cannot express
    * (SURVEY.md §3.3). Honors `cfg.metric` like every other retrieval
    * path (previously cosine-only — the one API that ignored the
    * config). Returns (qid, rank, id, dist). */
  def topKBatch(queries: Seq[(Long, Seq[Double])], k: Int): DataFrame = {
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
      .select(col("qid"), col("qvec"), V.l2Norm(col("qvec")).as("qnrm"))
    val batchDist: Column = cfg.metric match {
      // zero-norm guarded (cosineSimPre): one degenerate row must not
      // ANSI-fail the scan; round6z keeps self-pair dist at +0.0
      case "cosine" => lit(1.0) -
        V.cosineSimPre(V.dot(col("vec"), col("qvec")), col("nrm"), col("qnrm"))
      case "l2"  => V.l2Dist(col("vec"), col("qvec"))
      case "dot" => -V.dot(col("vec"), col("qvec")) // nearest = max dot
    }
    read()
      .select(col("id"), V.asDouble(col("vector")).as("vec"),
        V.l2Norm(col("vector")).as("nrm"))
      .crossJoin(broadcast(qdf))
      .select(col("qid"), col("id"), V.round6z(batchDist).as("dist"))
      .groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("id")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("id"), col("p.dist").as("dist"))
      .orderBy("qid", "rank")
  }

  /** Continuous retrieval: serve a STREAM of query vectors against the
    * lake — the streaming twin of [[topKBatch]], and a surface the
    * reference's blocking one-query API cannot express. Each
    * micro-batch of queries costs one lake scan (the stream-static
    * join's static side), and per-query state is the bounded top-k
    * heap ([[graft.expressions.TopKAggregate]]), so state never grows
    * past k rows per query id no matter how long the stream runs.
    * Late-arriving refinements of a qid update its row (update output
    * mode). Honors `cfg.metric` like [[topKBatch]].
    *
    * The static side is the lake AT PLAN TIME (a parquet plan freezes
    * its file listing): restart the query to serve post-start ingests.
    *
    * @param queries streaming frame with (qid: long, qvec: array)
    * @return streaming frame (qid, top: array<struct<dist,id>>) —
    *         explode downstream if flat rows are wanted */
  def topKStream(queries: DataFrame, k: Int): DataFrame = {
    val lakeV = read().select(
      col("id"), V.asDouble(col("vector")).as("vec"),
      V.l2Norm(col("vector")).as("nrm"), lit(1).as("__j"))
    val q = queries.select(col("qid"),
      col("qvec").cast(ArrayType(DoubleType)).as("qvec"),
      lit(1).as("__jq"))
      .withColumn("qnrm", V.l2Norm(col("qvec")))
    val dist: Column = cfg.metric match {
      case "cosine" => lit(1.0) -
        V.cosineSimPre(V.dot(col("vec"), col("qvec")), col("nrm"), col("qnrm"))
      case "l2"  => V.l2Dist(col("vec"), col("qvec"))
      case "dot" => -V.dot(col("vec"), col("qvec"))
    }
    // a literal equi-key instead of crossJoin: stream-static INNER
    // equi-joins are supported by the streaming planner, cross joins
    // are not — same plan (broadcast the 1-key side), same rows
    q.join(lakeV, col("__jq") === col("__j"))
      .select(col("qid"), col("id"), V.round6z(dist).as("dist"))
      .groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("id")), k).as("top"))
  }

  /** Two-stage compressed retrieval over the MATERIALIZED `packed`
    * column (requires `cfg.packSignBits`): a coarse Hamming top-`coarseK`
    * whose scan reads only (id, packed) — 8 bytes of vector data per row
    * instead of dim×4, which is where the 32× compression pays off at
    * 100 TB — then an exact rerank that touches full-precision vectors
    * for ≤ coarseK rows (the coarse id set is broadcast back as a
    * semi-join filter). Both stages are TakeOrderedAndProject heaps;
    * recall/cost dial = coarseK. */
  def topKCompressed(q: Seq[Double], k: Int, coarseK: Int = 100): DataFrame = {
    require(cfg.packSignBits,
      "topKCompressed needs a materialized packed column: set packSignBits = true")
    val qWord = V.signPackOf(q)
    val coarse = read()
      .select(col("id"),
        bit_count(col("packed").bitwiseXOR(lit(qWord))).cast("int").as("hamming"))
      .orderBy(col("hamming"), col("id"))
      .limit(coarseK)
      .select("id")
    read()
      .join(broadcast(coarse), Seq("id"))
      .withColumn("dist", V.round6z(distCol(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)
  }

  /** Two-stage PQ retrieval over the MATERIALIZED `pq_code` column
    * (requires `cfg.pqCodebooks`): the coarse stage ranks by asymmetric
    * distance — per subspace, unpack 8 bits of the stored word and look
    * up a literal query-distance table — reading only (id, pq_code),
    * 8 stored bytes of vector data per row; then the exact rerank
    * touches full-precision vectors for ≤ coarseK rows. Same shape as
    * [[topKCompressed]], but the coarse metric is LEARNED (codebooks)
    * instead of data-independent sign bits — tighter candidates at the
    * same stored size. */
  def topKPq(q: Seq[Double], k: Int, coarseK: Int = 100): DataFrame = {
    val model = cfg.pqCodebooks.getOrElse(throw new IllegalArgumentException(
      "topKPq needs a materialized pq_code column: set pqCodebooks = Some(model)"))
    requirePqModelMatch() // stored codes must be this model's codes
    val adc = (0 until model.m).map { mi =>
      element_at(V.vecLit(model.lutFor(q, mi)),
        (shiftright(col("pq_code"), 8 * mi).bitwiseAND(lit(255)) + 1).cast("int"))
    }.reduce(_ + _)
    val coarse = read()
      .select(col("id"), adc.as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(coarseK)
      .select("id")
    read()
      .join(broadcast(coarse), Seq("id"))
      .withColumn("dist", V.round6z(distCol(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)
  }

  private def topKWhere(q: Seq[Double], k: Int, pred: Column): DataFrame =
    read()
      .where(pred)
      .withColumn("dist", V.round6z(distCol(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)

  /** Metadata/attribute-filtered exact kNN — the vector-DB "filtered
    * search" surface (`topKFiltered(q, k, col("metadata")("name") ===
    * "x")`): the predicate is pushed into the scan like any Catalyst
    * filter, then the usual heap top-k. Exact over the filtered set —
    * no post-filtering a pruned candidate list short (the classic
    * filtered-ANN recall bug). */
  def topKFiltered(q: Seq[Double], k: Int, pred: Column): DataFrame =
    topKWhere(q, k, pred)

  /** Maximal-marginal-relevance search (the LangChain
    * `max_marginal_relevance_search` the reference's store never grew):
    * fetch the `fetchK` nearest candidates distributed, then greedily
    * pick `k` of them maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — relevance traded
    * against redundancy. The greedy loop is inherently sequential, so
    * it runs driver-side over the COLLECTED candidate set — bounded at
    * `fetchK` rows by the distributed top-k that precedes it (the same
    * bounded-pull posture as the IVF centroid fetch, never the corpus).
    * Returns (id, document, dist) in selection order. */
  def mmrSearch(q: Seq[Double], k: Int, fetchK: Int = 50,
      lambdaMult: Double = 0.5): DataFrame = {
    import spark.implicits._
    val cand = topKExact(q, fetchK)
      .select(col("id"), col("document"), col("dist"), col("vector"))
      .collect()
    val vecs = cand.map(_.getAs[scala.collection.Seq[Float]]("vector")
      .map(_.toDouble).toIndexedSeq)
    val qv = q.toIndexedSeq
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      // 0.0, not NaN: Scala's Double ordering ranks NaN above every real
      // score, so a single zero-norm candidate would win maxBy first
      // regardless of lambda
      if (den == 0.0) 0.0 else dot / den
    }
    val qSim = vecs.map(cos(_, qv))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (selected.length < math.min(k, cand.length)) {
      val best = vecs.indices
        .filterNot(selected.contains)
        .maxBy { i =>
          val redundancy =
            if (selected.isEmpty) 0.0
            else selected.map(j => cos(vecs(i), vecs(j))).max
          lambdaMult * qSim(i) - (1 - lambdaMult) * redundancy
        }
      selected += best
    }
    selected.toSeq.map { i =>
      (cand(i).getAs[String]("id"), cand(i).getAs[String]("document"),
        cand(i).getAs[Double]("dist"))
    }.toDF("id", "document", "dist")
  }

  /** Retrieval-surface projection mirroring the reference's LangChain
    * adapter `similarity_search` (langchain/__init__.py:78-90): top-k
    * rows projected to (document, metadata, dist). Embedding the query
    * text is the caller's job — no model inference in-engine (§2.6). */
  def similaritySearch(queryEmbedding: Seq[Double], k: Int): DataFrame =
    topK(queryEmbedding, k).select(col("document"), col("metadata"), col("dist"))

  /** The reference's actual `Index.query` contract (index.py:539-541):
    * nearest-neighbor VECTORS only, nothing else projected — column
    * pruning reaches the parquet scan, so only the vector column is
    * read. */
  def query(queryEmbedding: Seq[Double], k: Int): DataFrame =
    topK(queryEmbedding, k).select(col("vector"))

  /** Hybrid retrieval over the lake — BM25 keyword leg over `document`
    * plus a cosine leg over `vector`, fused by reciprocal rank
    * (1/(60+r) per leg; the q_hybrid_rrf shape as a first-class store
    * API). Each leg reduces to a heap top-`perLegK` list before any
    * window ranks it, so the lake never meets a global sort; BM25 uses
    * the linear idf (N/df) with k1=1.2, b=0.75. A keyword absent from
    * the whole lake contributes zero (guarded — the unguarded formula
    * is 0·∞ = NaN for every row), and a document matching no keyword is
    * dropped from the keyword leg entirely, so a dead keyword leg
    * genuinely contributes nothing (not an id-ordered rank list).
    * Returns (id, rrf) ranked best-first. */
  def hybridSearch(q: Seq[Double], keywords: Seq[String], k: Int,
      perLegK: Int = 100): DataFrame = {
    require(keywords.nonEmpty, "hybridSearch needs at least one keyword")
    val T = graft.functions.TextFunctions
    val toks = read().select(col("id"), T.tokens(col("document")).as("tk"))
    val aggCols =
      org.apache.spark.sql.functions.count(lit(1)).as("n") +:
        sum(size(col("tk")).cast("long")).as("sumdl") +:
        keywords.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("tk"), t), 1L).otherwise(0L)).as(s"df$i")
        }
    val stats = toks.agg(aggCols.head, aggCols.tail: _*)
    def termScore(t: String, i: Int): Column =
      T.bm25TermScore(col("tk"), t, col("n"), col("sumdl"), col(s"df$i"))
    val w = org.apache.spark.sql.expressions.Window
    val kwTop = toks.crossJoin(broadcast(stats))
      .select(col("id"),
        keywords.zipWithIndex.map((termScore _).tupled).reduce(_ + _).as("s"))
      // a document matching NO keyword scores 0 — drop it BEFORE ranking,
      // or a dead keyword leg would still emit ranks 1..perLegK by id and
      // hand every such row an arbitrary nonzero 1/(60+rk) contribution
      .where(col("s") > 0)
      .orderBy(col("s").desc, col("id")).limit(perLegK)
    val kwRanked = kwTop.select(col("id"),
      row_number().over(w.orderBy(col("s").desc, col("id"))).as("rk"))
    val vecTop = read()
      .select(col("id").as("vid"), V.round6z(distCol(q)).as("d"))
      .orderBy(col("d"), col("vid")).limit(perLegK)
    val vecRanked = vecTop.select(col("vid"),
      row_number().over(w.orderBy(col("d"), col("vid"))).as("rv"))
    kwRanked.join(vecRanked, kwRanked("id") === vecRanked("vid"), "full_outer")
      .select(coalesce(col("id"), col("vid")).as("id"),
        (coalesce(lit(1.0) / (lit(60) + col("rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** Batch ingest of (text, embedding) pairs — the `add_texts` analog
    * (langchain/__init__.py:43-67): returns the row count written. */
  def addTexts(texts: DataFrame): Long = {
    val n = texts.count()
    ingest(texts.withColumnRenamed("text", "document")
      .withColumnRenamed("embedding", "vector"))
    n
  }

  /** Force-materialize (the reference's warm `load_local`, index.py:565-568). */
  def loadWarm(): Long = { val df = read().cache(); df.count() }

  /** Estimated bytes (reference `memory_footprint`, index.py:332-335). */
  def sizeInBytes(): BigInt =
    read().queryExecution.optimizedPlan.stats.sizeInBytes

  def count(): Long = read().count()

  /** Compact the lake's small files: every append (`ingest`,
    * `ingestStream` micro-batch) adds at least one file per touched
    * shard, so a long-lived lake accumulates the small-files
    * antipattern (listing pressure, per-file open cost, tiny scans —
    * the thing that actually kills 100 TB parquet lakes). Rewrites each
    * shard's data into ~`targetBytes` files: shards get
    * ceil(bytes/target) slices, rows are clustered by (shard, slice) so
    * each output file is whole, then the directories are swapped.
    *
    * This is the maintenance operation the reference cannot express —
    * its sync already rewrites EVERY segment file on EVERY persist
    * (index.py:294-308); here rewriting is explicit, sized, and
    * distributed (one shuffle, no driver-side data).
    *
    * Refuses to touch a lake with a Structured Streaming `_spark_metadata`
    * sink log: the sink's manifest names the original files, and a swap
    * would silently orphan them — stop the stream and rename the log
    * away first (or read through a new location).
    *
    * Atomicity: the two renames are atomic on HDFS/POSIX; object stores
    * implement rename as copy+delete, so there readers may briefly see
    * a missing root — schedule compaction in a maintenance window or
    * front the location with a catalog pointer there (standard practice
    * for any rewrite-in-place on S3-class storage).
    *
    * @param clusterBy optional within-file clustering expressions: each
    *        rewritten file is locally sorted by these (e.g. a
    *        [[graft.operators.ZOrder]] interleave over metadata
    *        columns) — the OPTIMIZE-ZORDER analog. Pure layout change:
    *        rows, routing, and file sizing are untouched; what changes
    *        is min/max-stats tightness, so post-compaction scans with
    *        predicates on the clustered columns skip more row groups.
    * @return number of data files after compaction */
  def compact(targetBytes: Long = 128L * 1024L * 1024L,
      clusterBy: Seq[Column] = Nil): Long = {
    if (!exists()) return 0L
    withWriterLock("compact")(compactImpl(targetBytes, clusterBy))
  }

  private def compactImpl(targetBytes: Long, clusterBy: Seq[Column]): Long = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      "refusing to compact a streaming-sink lake: _spark_metadata manifest present")

    // per-shard compressed bytes from one directory listing. Directory
    // names carry ESCAPED partition values (Spark writes ':','%','=' etc
    // as %XX and null as the Hive sentinel) while read() yields decoded
    // values — decode here or the slice join below misses those shards
    val shardBytes: Map[Option[String], Long] = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(s => unescapePartitionValue(s.getPath.getName.split("=", 2)(1)) ->
        fs.getContentSummary(s.getPath).getLength)
      .toMap
    if (shardBytes.isEmpty) return 0L

    val slices = shardBytes.map { case (sh, b) =>
      sh -> math.max(1L, (b + targetBytes - 1) / targetBytes)
    }
    val totalSlices = math.max(1, math.min(slices.values.sum, Int.MaxValue).toInt)

    // broadcast the (shard → slice count) table, cluster by (shard, slice):
    // each output file is written whole by one task, files-per-shard is
    // proportional to that shard's bytes (small shards stay one file)
    import spark.implicits._
    val sliceDf = broadcast(
      slices.toSeq.map { case (sh, n) => (sh.orNull, n) }
        .toDF(partCol + "_s", "n_slices")
        .withColumn(partCol + "_s", col(partCol + "_s").cast(
          if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType)))
    val tmp = new org.apache.hadoop.fs.Path(cfg.location + "__compacting")
    fs.delete(tmp, true)
    // null-safe LEFT join with a 1-slice default: a shard whose directory
    // name failed to map (or a null partition value) must still be
    // rewritten — dropping it here would turn into silent data loss at
    // the swap below
    val src = read()
    val srcRows = src.count()
    val sliced = src
      .join(sliceDf, col(partCol) <=> col(partCol + "_s"), "left")
      .withColumn("_slice", pmod(abs(hash(col("id"))), coalesce(col("n_slices"), lit(1L))))
      .repartition(totalSlices, col(partCol), col("_slice"))
      .select((storedCols.map(col) :+ col(partCol)): _*)
    // partCol leads the sort: the dynamic-partition writer requires rows
    // ordered by the partition column and ADDS ITS OWN (non-stable) sort
    // when the incoming order doesn't satisfy that — which would undo
    // the clustering. Leading with partCol satisfies the requirement, so
    // the writer keeps this exact order.
    (if (clusterBy.isEmpty) sliced
     else sliced.sortWithinPartitions((col(partCol) +: clusterBy): _*))
      .write.mode(SaveMode.Overwrite)
      .option("compression", cfg.codec)
      .partitionBy(partCol)
      .parquet(tmp.toString)

    // verify BEFORE the destructive swap: any rewrite shortfall aborts
    // with both trees intact instead of surfacing as permanent loss
    val tmpRows = spark.read.parquet(tmp.toString).count()
    if (tmpRows != srcRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compact aborted: rewrote $tmpRows rows but source has $srcRows ($root left untouched)")
    }

    // swap: keep the old tree until the new one is fully in place
    val bak = new org.apache.hadoop.fs.Path(cfg.location + "__precompact")
    fs.delete(bak, true)
    require(fs.rename(root, bak), s"rename $root -> $bak failed")
    require(fs.rename(tmp, root), s"rename $tmp -> $root failed")
    fs.delete(bak, true)
    writeMetaSidecar()

    fs.listStatus(root).filter(_.isDirectory).map(d =>
      fs.listStatus(d.getPath).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")).toLong).sum
  }

  /** Inverse of Spark's partition-path escaping (the behavior of
    * catalyst's `ExternalCatalogUtils.unescapePathName`, reimplemented
    * to stay off the internal API): `%XX` → char, the Hive null
    * sentinel → None. */
  private[graft] def unescapePartitionValue(raw: String): Option[String] = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") return None
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '%' && i + 2 < raw.length) {
        // validate each nibble as ASCII hex specifically:
        // Integer.parseInt(_, 16) also accepts signed forms ("+4") and
        // Character.digit accepts non-ASCII Unicode digits (fullwidth
        // '４', Arabic-Indic) — either would decode a foreign dir value
        // to a control char instead of passing it through literally
        // (Spark itself only ever emits ASCII %XX)
        def nibble(c: Char): Int =
          if (c < 128) Character.digit(c, 16) else -1
        val hi = nibble(raw.charAt(i + 1))
        val lo = nibble(raw.charAt(i + 2))
        if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) | lo).toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  /** Row-level DELETE WHERE — the targeted maintenance op the reference
    * lacks (its only delete is whole-store, index.py:548-563; table
    * formats call this DELETE): rewrites ONLY the shard directories
    * that contain matches. Affected-partition discovery is one pruned
    * scan; unaffected directories are never read or touched, which at
    * 100 TB is the difference between rewriting gigabytes and
    * rewriting everything. Rows where `pred` evaluates NULL are KEPT
    * (SQL DELETE semantics: only true deletes). Returns rows deleted.
    *
    * SINGLE-WRITER op (like [[compact]]/[[upsert]]): an append landing
    * in an affected directory between the tmp write and the swap would
    * be lost — directory-layout tables have no optimistic-commit log.
    * ENFORCED by [[withWriterLock]]: a concurrent mutation throws
    * instead of silently losing the race.
    */
  def deleteWhere(pred: Column): Long = {
    if (!exists()) return 0L
    withWriterLock("deleteWhere")(deleteWhereImpl(pred))
  }

  private def deleteWhereImpl(pred: Column): Long = {
    val affected = read().where(pred).select(partCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    if (affected.isEmpty) return 0L
    val slice = read().where(affectedPartPred(affected))
    val total = slice.count()
    val kept = slice.where(!coalesce(pred, lit(false)))
      .select((storedCols.map(col) :+ col(partCol)): _*)
    val keptCount = kept.count()
    val deleted = total - keptCount
    if (deleted == 0L) return 0L
    rewritePartitions(affected, kept, keptCount, "__deleting")
    deleted
  }

  /** Upsert by caller-supplied id: rows whose id already exists replace
    * the stored version (wherever routing put it — a changed vector may
    * have moved shards), the rest append. One rewrite touching only the
    * union of (shards holding old versions, shards receiving new rows);
    * the id probe is a broadcast semi/anti join, never a collected id
    * list. Returns the number of replaced rows. Single-writer, same
    * caveat as [[deleteWhere]]. */
  def upsert(rows: DataFrame): Long = {
    require(rows.columns.contains("id"),
      "upsert needs caller-supplied ids (an id column) to define row identity")
    requirePqModelMatch()
    withWriterLock("upsert")(upsertImpl(rows))
  }

  private def upsertImpl(rows: DataFrame): Long = {
    val newDerived = graft.operators.Materialize.cut(withDerived(rows))
    val newCount = newDerived.count()
    if (newCount == 0L) return 0L // empty batch: nothing to probe, write, or rewrite
    // duplicate ids WITHIN the batch would all survive the rewrite and
    // recreate the duplicate this op exists to prevent — and a frame
    // has no row order to make "keep last" deterministic. Fail loudly —
    // BEFORE the empty-lake bootstrap branch, so an upsert into an
    // empty (or fully-deleted) lake cannot silently ingest both
    // versions of a duplicated id.
    val distinctIds = newDerived.select("id").distinct().count()
    require(distinctIds == newCount,
      s"upsert batch has duplicate ids ($newCount rows, $distinctIds distinct ids)")
    if (!exists()) { writeAppend(newDerived); return 0L } // bootstrap: plain ingest
    val newIds = broadcast(newDerived.select(col("id").as("__new_id")).distinct())
    val oldShards = read()
      .join(newIds, col("id") === col("__new_id"), "left_semi")
      .select(partCol).distinct().collect()
    val newShards = newDerived.select(partCol).distinct().collect()
    val affected = (oldShards ++ newShards)
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    val slice = read().where(affectedPartPred(affected))
    val sliceCount = slice.count()
    val keptOld = slice
      .join(newIds, col("id") === col("__new_id"), "left_anti")
      .select((storedCols.map(col) :+ col(partCol)): _*)
    val keptCount = keptOld.count()
    rewritePartitions(affected,
      keptOld.unionByName(newDerived.select((storedCols.map(col) :+ col(partCol)): _*)),
      keptCount + newCount, "__upserting")
    sliceCount - keptCount
  }

  /** Null-safe membership predicate over decoded partition values. */
  private def affectedPartPred(affected: Set[Option[String]]): Column =
    affected.toSeq
      .map(v => col(partCol).cast(StringType) <=> lit(v.orNull))
      .reduce(_ || _)

  /** Shared targeted-rewrite machinery for [[deleteWhere]]/[[upsert]]:
    * write `content` (covering EXACTLY the `affected` partition values)
    * to a tmp tree, verify the row count, then swap each affected
    * directory individually — original renamed to a backup outside the
    * lake root (a suffixed name INSIDE the root would poison partition
    * discovery), replacement renamed in, backups dropped last. An
    * affected value with no tmp directory means all its rows were
    * removed: the original directory is retired without a replacement.
    */
  private def rewritePartitions(affected: Set[Option[String]],
      content: DataFrame, expectedRows: Long, tag: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata")),
      "refusing to rewrite a streaming-sink lake: _spark_metadata manifest present")
    val tmp = new org.apache.hadoop.fs.Path(cfg.location + tag)
    fs.delete(tmp, true)
    if (expectedRows > 0L) {
      content.repartition(col(partCol))
        .write.mode(SaveMode.Overwrite)
        .option("compression", cfg.codec)
        .partitionBy(partCol)
        .parquet(tmp.toString)
      val tmpRows = spark.read.parquet(tmp.toString).count()
      if (tmpRows != expectedRows) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"partition rewrite aborted: wrote $tmpRows rows, expected $expectedRows ($root untouched)")
      }
    }
    def dirsOf(p: org.apache.hadoop.fs.Path): Map[Option[String], String] =
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(s => unescapePartitionValue(s.getPath.getName.split("=", 2)(1)) ->
          s.getPath.getName)
        .toMap
    val oldDirs = dirsOf(root).filter { case (v, _) => affected.contains(v) }
    val tmpDirs = dirsOf(tmp)
    require(tmpDirs.keySet.subsetOf(affected),
      s"rewrite produced out-of-scope partitions: ${tmpDirs.keySet -- affected}")
    val bakParent = new org.apache.hadoop.fs.Path(cfg.location + tag + "_bak")
    fs.delete(bakParent, true)
    fs.mkdirs(bakParent)
    (oldDirs.keySet ++ tmpDirs.keySet).foreach { v =>
      val name = oldDirs.getOrElse(v, tmpDirs(v))
      val cur = new org.apache.hadoop.fs.Path(root, name)
      if (fs.exists(cur))
        require(fs.rename(cur, new org.apache.hadoop.fs.Path(bakParent, name)),
          s"rename $cur -> backup failed")
      tmpDirs.get(v).foreach { tn =>
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp, tn), cur),
          s"rename $tmp/$tn -> $cur failed")
      }
    }
    fs.delete(bakParent, true)
    fs.delete(tmp, true)
    writeMetaSidecar()
  }

  /** Remove leftover rewrite scratch trees (`__compacting`,
    * `__precompact`, `__deleting`, `__upserting`, and the
    * `__deleting_bak`/`__upserting_bak` backup trees) that a crashed
    * compact/deleteWhere/upsert may have stranded next to the lake
    * root — the VACUUM of this table layout. Only those KNOWN scratch
    * names are touched: an unrelated sibling lake that merely shares
    * the name prefix (`/data/lake__v2` next to `/data/lake`) is never
    * matched. Safe while live: scratch trees are only ever read by the
    * op that created them, inside the same call.
    *
    * Crash-safety guard: after a crash INSIDE a swap window, a backup
    * tree (`__precompact` or a `_bak` tree) may hold the ONLY copy of
    * some partitions — compact renames the whole root to
    * `__precompact` before renaming the replacement in, and
    * rewritePartitions moves each original directory to its `_bak`
    * tree before its replacement. Deleting those trees then is
    * permanent data loss, so vacuum REFUSES (IllegalStateException)
    * when any backup tree holds a partition directory absent from the
    * lake root: run [[repair]] (rolls the crashed op back), then
    * re-run. Note the guard is deliberately conservative — a directory
    * that deleteWhere legitimately retired (all rows deleted) also
    * trips it if the crash hit before backup cleanup; repair
    * resurrects those rows (re-run the delete).
    *
    * Returns the number of trees removed. */
  def vacuum(): Long = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return 0L
    val scratchNames = scratchSuffixes.map(root.getName + _).toSet
    val scratch = fs.listStatus(parent)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => scratchNames.contains(p.getName))
    def partDirs(p: org.apache.hadoop.fs.Path): Set[String] =
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath.getName).toSet
    val rootDirs = partDirs(root)
    scratch.filter(p => backupSuffixes.exists(p.getName.endsWith)).foreach { b =>
      val orphaned = partDirs(b) -- rootDirs
      if (orphaned.nonEmpty) throw new IllegalStateException(
        s"vacuum refused: backup tree $b holds partition(s) " +
          s"${orphaned.toSeq.sorted.mkString(", ")} missing from $root — a " +
          "maintenance op crashed mid-swap and these may be the only copies; " +
          "run repair() to roll the crashed op back, then re-run vacuum")
    }
    scratch.foreach(p => fs.delete(p, true))
    // a writer that died without reaching its finally strands the
    // `_lock` marker and every later mutation fails loudly — vacuum is
    // the documented recovery, so it removes the lock too. (Like the
    // scratch sweep itself, vacuum must only run when no maintenance op
    // is actually in flight.)
    val lock = new org.apache.hadoop.fs.Path(root, lockName)
    val staleLock = fs.exists(lock) && fs.delete(lock, false)
    scratch.length.toLong + (if (staleLock) 1L else 0L)
  }

  /** Crash RECOVERY for a mid-swap failure — the roll-back twin of
    * [[vacuum]]'s refusal. Every swap in this layout backs an original
    * up BEFORE renaming its replacement in (compact renames the whole
    * root to `__precompact`; rewritePartitions moves each affected
    * directory to its `_bak` tree), so after any crash the complete
    * pre-op state exists across (root ∪ backup trees). repair() makes
    * the crashed op never-happened:
    *
    *  - `__precompact` present → the pre-compact tree replaces the
    *    root wholesale (content-identical even when the crash hit
    *    after the forward swap: compact is a pure layout change);
    *  - every partition directory in a `_bak` tree replaces its root
    *    counterpart (a replacement that did get swapped in is rolled
    *    back; one that didn't was never removed);
    *  - tmp trees, now-redundant backups, and a stranded writer lock
    *    are swept (vacuum's guard passes by construction afterwards).
    *
    * A deleteWhere that legitimately retired a directory and crashed
    * before backup cleanup gets its rows RESURRECTED — rollback
    * semantics, the conservative direction (re-run the delete; the
    * other direction is silent data loss). Like vacuum, run only when
    * no maintenance op is actually in flight. Returns the number of
    * partition directories (or whole trees) restored. */
  def repair(): Long = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var restored = 0L
    val precompact = new org.apache.hadoop.fs.Path(cfg.location + "__precompact")
    if (fs.exists(precompact)) {
      fs.delete(root, true)
      require(fs.rename(precompact, root), s"rename $precompact -> $root failed")
      restored += 1L
    }
    Seq("__deleting_bak", "__upserting_bak").foreach { suf =>
      val bak = new org.apache.hadoop.fs.Path(cfg.location + suf)
      if (fs.exists(bak)) {
        fs.mkdirs(root) // rename target parent must exist
        fs.listStatus(bak)
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .foreach { d =>
            val target = new org.apache.hadoop.fs.Path(root, d.getPath.getName)
            fs.delete(target, true) // roll a swapped-in replacement back
            require(fs.rename(d.getPath, target),
              s"rename ${d.getPath} -> $target failed")
            restored += 1L
          }
      }
    }
    vacuum() // backups are now empty/redundant; tmp trees + stale lock swept
    restored
  }

  /** Integrity audit — the CHECK TABLE of this layout, one scan, one
    * row out: `(rows, misrouted, dup_ids, bad_packed, bad_pq)`. Every
    * stored invariant the maintenance ops rely on is recomputed and
    * counted rather than assumed:
    *
    *  - `misrouted`: rows whose directory shard ≠ the LSH route of
    *    their own vector (a foreign file dropped into a shard dir, or
    *    data written under a different routing config before the
    *    sidecar pin) — pruned queries silently miss these rows;
    *  - `dup_ids`: rows minus distinct ids — upsert's identity
    *    invariant;
    *  - `bad_packed` / `bad_pq`: materialized aux words that no longer
    *    equal their recomputation from the vector (−1 when the column
    *    is not configured) — compressed retrieval reads these bytes as
    *    truth.
    *
    * All checks are map-side expressions into one aggregate; at 100 TB
    * this costs exactly one full scan, the floor for any audit that
    * reads every row. Zero everywhere (and -1 for unconfigured
    * columns) = healthy. */
  def validate(): DataFrame = {
    val df = read()
    // every branch must be an AGGREGATE expression (a bare literal is
    // rejected by agg); "not configured" = max of a constant -1
    def unconfigured: Column = coalesce(max(lit(-1L)), lit(-1L))
    def violations(pred: Column): Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
    val misrouted: Column =
      if (cfg.partitionKey.isEmpty)
        violations(col(partCol) =!= lsh.shardCol(col("vector")))
      else unconfigured // user-keyed: any partition value is by definition correct
    val badPacked: Column =
      if (cfg.packSignBits)
        violations(col("packed") =!= V.signPack(col("vector")))
      else unconfigured
    val badPq: Column = cfg.pqCodebooks.map { m =>
      val recomputed = (0 until m.m).map(mi =>
        shiftleft(m.codeCol(col("vector"), mi).cast("long"), 8 * mi))
        .reduce(_ + _)
      violations(col("pq_code") =!= recomputed)
    }.getOrElse(unconfigured)
    // functions.count is shadowed by Lake.count() inside this class
    val rowsAgg = org.apache.spark.sql.functions.count(lit(1))
    df.agg(
      rowsAgg.as("rows"),
      misrouted.as("misrouted"),
      (rowsAgg - countDistinct(col("id"))).as("dup_ids"),
      badPacked.as("bad_packed"),
      badPq.as("bad_pq"))
  }

  /** The sidecar's `last_update` stamp — rewritten by every completed
    * write/maintenance op (and per data-carrying micro-batch on the
    * streaming path); None before any write. A cheap CHANGE TOKEN for
    * snapshot consumers: pair with
    * `DedupStreaming.CorpusGate.refreshIfChanged` to re-snapshot a
    * corpus exactly when the lake actually changed, instead of on a
    * blind timer (reference parity: its readers re-check the parquet
    * attrs stamp the same way, index.py:296-305). */
  def lastUpdate(): Option[String] =
    readMetaSidecar().flatMap(""""last_update"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(_).map(_.group(1)))

  /** Best-effort recursive delete (reference S5, index.py:312-325,548-563). */
  def delete(): Unit = {
    val p = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** True iff the lake holds DATA: at least one partition directory or
    * root-level parquet file. A location carrying only `_meta.json` /
    * `_SUCCESS` markers (e.g. after `deleteWhere` retired every shard)
    * counts as empty — the parquet reader cannot infer a schema from
    * markers alone, so every data path must take the bootstrap branch. */
  def exists(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(cfg.location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      (s.isDirectory && s.getPath.getName.contains("=")) ||
        (s.isFile && s.getPath.getName.endsWith(".parquet")))
  }

  /** Sidecar `_meta.json` — replaces the reference's parquet-attrs
    * `last_update` stamp (index.py:296-305); Spark's DataFrameWriter has
    * no per-file custom-metadata hook. */
  private def writeMetaSidecar(): Unit = {
    val p = new org.apache.hadoop.fs.Path(cfg.location, "_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val pqField = cfg.pqCodebooks
      .map(m => s""", "pq_fingerprint": "${m.fingerprint}"""").getOrElse("")
    val seedField =
      if (cfg.partitionKey.isEmpty) s""", "lsh_seed": ${cfg.seed}""" else ""
    val json = s"""{"last_update": "${java.time.Instant.now()}", "dim": ${cfg.dim}, "metric": "${cfg.metric}", "num_shards": ${if (cfg.partitionKey.isEmpty) lsh.numShards else -1}$seedField$pqField}"""
    out.write(json.getBytes("UTF-8")); out.close()
  }

  private def readMetaSidecar(): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(cfg.location, "_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** Stored `shard` values are only meaningful under the hyperplanes
    * that routed them — the routing analog of the PQ/IVF fingerprint
    * contract. A session configured with a different `numHashes` or
    * `seed` than the lake's writer would route queries under DIFFERENT
    * hyperplanes: single-probe topK prunes to the wrong directory and
    * returns wrong neighbors with no error, and ingest appends rows
    * whose shard disagrees with every stored row's. The sidecar records
    * (dim, num_shards, lsh_seed); any read or write under a mismatched
    * config fails loudly here. Checked once per Lake instance (lazy) —
    * pre-seed sidecars (no lsh_seed field) check what they carry. */
  private lazy val routingChecked: Unit =
    readMetaSidecar().foreach { json =>
      def longField(name: String): Option[Long] =
        (s""""$name"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(json)
          .map(_.group(1).toLong)
      longField("dim").foreach(d => require(d == cfg.dim,
        s"lake at ${cfg.location} stores $d-dim vectors but this session " +
          s"is configured for ${cfg.dim}"))
      if (cfg.partitionKey.isEmpty) {
        longField("num_shards").filter(_ != -1L).foreach(ns =>
          require(ns == lsh.numShards,
            s"lake at ${cfg.location} was routed into $ns LSH shards but " +
              s"this session's config routes into ${lsh.numShards} " +
              s"(numHashes mismatch) — pruned queries would scan the wrong " +
              "directory; construct the Lake with the writer's config"))
        longField("lsh_seed").foreach(s => require(s == cfg.seed,
          s"lake at ${cfg.location} was routed with LSH seed $s but this " +
            s"session's config uses seed ${cfg.seed} — same shard count, " +
            "different hyperplanes; construct the Lake with the writer's config"))
      }
    }

  /** `pq_code` rows are only meaningful under the codebooks that wrote
    * them — previously a doc-comment contract on
    * [[LakeConfig.pqCodebooks]], now enforced: the sidecar records the
    * model fingerprint and any writer/reader constructed with a
    * DIFFERENT model fails loudly here instead of silently mixing
    * incompatible codes (which corrupts topKPq with no error). A
    * pre-fingerprint sidecar (no field) is accepted and stamped on the
    * next write. */
  private def requirePqModelMatch(): Unit =
    cfg.pqCodebooks.foreach { m =>
      for {
        json <- readMetaSidecar()
        found <- """"pq_fingerprint"\s*:\s*"([0-9a-f]+)"""".r
          .findFirstMatchIn(json).map(_.group(1))
      } require(found == m.fingerprint,
        s"lake at ${cfg.location} stores pq_code under codebook fingerprint " +
          s"$found but this session's model fingerprints ${m.fingerprint}; " +
          "mixing codes from different trainings silently corrupts topKPq — " +
          "construct the Lake with the model that first wrote it")
    }
}

object Lake {
  /** The complete set of scratch-tree suffixes the maintenance ops may
    * strand next to a lake root ([[Lake.compact]] uses `__compacting` /
    * `__precompact`; [[Lake.deleteWhere]]/[[Lake.upsert]] use
    * `__deleting`/`__upserting` plus their `_bak` backup trees).
    * [[Lake.vacuum]] matches EXACTLY these — never an open-ended
    * prefix. */
  private[graft] val scratchSuffixes: Seq[String] = Seq(
    "__compacting", "__precompact",
    "__deleting", "__deleting_bak",
    "__upserting", "__upserting_bak")

  /** The subset of [[scratchSuffixes]] that are BACKUP trees: after a
    * mid-swap crash they may hold the only copy of a partition. */
  private[graft] val backupSuffixes: Seq[String] =
    Seq("__precompact", "__deleting_bak", "__upserting_bak")

  /** Writer-lock marker file name, under the lake root. Underscore
    * prefix keeps it out of Spark's file index (never read as data). */
  private[graft] val lockName: String = "_lock"

  /** Canonical stored-row schema (SURVEY.md §1.1; reference frame_schema
    * index.py:198-200). `shard` is a directory partition column on top. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("document", StringType),
    StructField("timestamp", TimestampType)))

  val dataCols: Seq[String] = schema.fields.map(_.name).toSeq

  def apply(spark: SparkSession, cfg: LakeConfig): Lake = new Lake(spark, cfg)

  /** Construct-and-ingest in one call — the reference's `from_texts`
    * classmethod (langchain/__init__.py:92-116): build the lake at
    * `cfg.location` and append the (text, embedding) rows. */
  def fromTexts(spark: SparkSession, texts: DataFrame, cfg: LakeConfig): Lake = {
    val lake = new Lake(spark, cfg)
    lake.addTexts(texts)
    lake
  }
}
