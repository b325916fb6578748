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
  *
  * On-disk layout (v2, generation-pointer commit): partition
  * directories live under GENERATION subtrees `<root>/gen-N/shard=K/`,
  * and versioned sidecars `<root>/_meta.<v>.json` (highest version
  * wins; each write is an atomic create of a new version) name the
  * live set: the current generation — whose whole subtree is live, and
  * where appends land — plus a manifest of directories still live in
  * older generations. Every maintenance op (compact / deleteWhere /
  * upsert) WRITES A NEW GENERATION and commits with ONE sidecar
  * create; nothing on the data path is ever renamed or deleted, so the
  * layout is object-store-atomic where rename is copy+delete (the
  * design rename-based swaps cannot reach on S3-class storage). Dead
  * generations are swept only by the operator-invoked [[vacuum]].
  * Root-level siblings (`_pq`, `_ivf` model dirs, the `_lock` marker)
  * are untouched by any maintenance op by construction.
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

  /** Registered EXTRA columns ([[evolve]]'s schema widening) of a
    * state, resolved from sidecar (name, catalog-DDL) pairs. */
  private def extraFieldsOf(st: LakeState): Seq[StructField] =
    st.extraCols.map { case (n, t) => StructField(n, DataType.fromDDL(t)) }

  /** The CURRENT extras, from the newest sidecar — for surfaces that
    * have no state in hand (feed schemas, the DSv2 format). */
  private[graft] def currentExtraFields: Seq[StructField] =
    extraFieldsOf(readState())

  private def storedColsOf(st: LakeState): Seq[String] =
    storedCols ++ st.extraCols.map(_._1)
  private def storedFieldsOf(st: LakeState): Seq[StructField] =
    storedFields ++ extraFieldsOf(st)
  private def storedColsNow: Seq[String] = storedColsOf(readState())

  /** SCHEMA EVOLUTION: widen the stored schema with `add` — at 100 TB
    * "add a column" must be a SIDECAR COMMIT, never a reload. The
    * registration rides every later sidecar (states are re-read before
    * each commit), so from this moment: [[ingest]] carries the columns
    * (supplied values cast to the registered type, absent → typed
    * null), every read pads pre-evolve files with nulls (parquet
    * null-fills a requested-but-absent column for post-evolve files
    * written by a stale session the same way), and every rewrite
    * ([[deleteWhere]]/[[upsert]]/[[compact]]) preserves them. Types
    * are stored as catalog DDL (`string`, `double`, `array<int>`, …).
    * Name collisions with stored/partition/registered columns are
    * refused — this is WIDENING only; drops or type changes would need
    * a rewrite and are deliberately not offered. [[validate]] reports
    * `pre_evolve_rows` (rows all-null across every registered extra) so
    * operators can see how much of the lake predates the evolution.
    * The reference pins its frame schema for the index's life
    * (index.py:249-250); evolution is an engine extension. */
  /** Materialize the sidecar for a brand-new lake WITHOUT ingesting a
    * row — the `CREATE TABLE` bootstrap ([[graft.sources.GraftCatalog]]):
    * one state commit makes the empty lake discoverable (the sidecar
    * records dim/metric/routing config, so later sessions and the SQL
    * format resolve it with zero options). Idempotent on an existing
    * lake (a plain `last_update` re-stamp). */
  def bootstrap(): Unit = withWriterLock("bootstrap") {
    // bootstrap IS the documented config-UPGRADE migration (re-stamping
    // a pre-recording lake whose files genuinely carry the compressed
    // columns), so only the LESSER direction is refused here: a
    // session whose config lacks a compression the sidecar declares
    // would erase the flag from the re-stamped sidecar, and every
    // later lesser-config write would then pass [[requireWriteConfigMatch]]
    // and strip the columns for real.
    requireNoLesserConfig(readMetaSidecar())
    writeState(readState()); ()
  }

  def evolve(add: StructType): Unit = {
    require(add.fields.nonEmpty, "evolve: no columns given")
    withWriterLock("evolve") {
      // evolve re-stamps the sidecar from THIS session's config: under
      // a mismatched one it would silently flip the recorded
      // compression flags (same hazard as any write)
      requireWriteConfigMatch()
      val st = readState()
      validateExtraCols(st, add.fields.toSeq, "evolve")
      writeState(st.copy(extraCols =
        st.extraCols ++ add.fields.map(f => f.name -> f.dataType.catalogString)))
      ()
    }
  }

  /** The ONE validation for registering extra stored columns — shared
    * by [[evolve]] and [[applyChanges]]'s auto-evolve, so a buggy or
    * hostile delta frame cannot register a column name that evolve()
    * itself would refuse. CASE-INSENSITIVE checks throughout: Spark's
    * resolver matches columns case-insensitively by default, so a
    * "Dist" extra would still be clobbered by topK's
    * withColumn("dist", ...) and a "Document" extra would collide with
    * the stored column. */
  private def validateExtraCols(st: LakeState, fields: Seq[StructField],
      tag: String): Unit = {
    val dup = fields.map(_.name).groupBy(identity)
      .collect { case (n, xs) if xs.size > 1 => n }
    require(dup.isEmpty,
      s"$tag: duplicate column name(s) ${dup.mkString(", ")}")
    val taken = (storedColsOf(st) :+ partCol).map(_.toLowerCase).toSet
    fields.foreach { f =>
      val lower = f.name.toLowerCase
      require(!taken(lower),
        s"$tag at ${cfg.location}: column `${f.name}` already exists")
      // names the query surfaces DERIVE onto result frames
      // ("change" on the feed, "dist" on kNN, "packed"/"pq_code" on
      // compressed lakes) or use as rewrite-plan internals — an extra
      // with one of these names would be silently clobbered by
      // withColumn or corrupt a join key, not served back
      require(!Lake.reservedDerivedCols(lower) &&
          lower != (partCol + "_s").toLowerCase,
        s"$tag at ${cfg.location}: column name `${f.name}` is " +
          "reserved by a query or maintenance surface (derived " +
          "outputs: change, dist, packed, pq_code; plan internals) — " +
          "pick another name")
      require(!f.name.contains("\u0001"),
        s"$tag: column name `${f.name}` contains the reserved \\u0001")
      // the DDL must round-trip: an unparseable registration would
      // poison every later read
      DataType.fromDDL(f.dataType.catalogString)
    }
  }

  /** Ingest rows with at least a `vector` column; `metadata`, `document`
    * optional. Adds `id` (uuid), `timestamp`, routes `shard`, coerces
    * empty metadata to {"id": "1"} (the reference's quirk,
    * index.py:572-575 — an ingest rule, not a query rule), and
    * append-writes partitioned parquet.
    *
    * Scale: routing is a map-side expression; the only shuffle is the
    * cluster-by-shard exchange before the write, which keeps file count
    * = O(shards) instead of O(tasks × shards). CONCURRENT ingests are
    * admitted (shared gate, [[withAppendLock]]) — N parallel loaders
    * land disjoint files in the live tree and scale with the cluster;
    * only maintenance excludes them. A built skip index is refreshed
    * for exactly the shards this batch touched, so appends no longer
    * stale-out their shards' sketches until the next rebuild. */
  def ingest(rows: DataFrame): Unit = withAppendLock("ingest") {
    requireWriteConfigMatch()
    val out = writeAppend(withDerived(rows))
    refreshSkipIndex(out.shards)
    refreshZoneMap(out.files)
  }

  /** EXACTLY-ONCE ingest for the registered streaming SINK
    * (`df.writeStream.format("graft")`, [[graft.sources.GraftSink]]):
    * [[ingest]] semantics plus idempotent micro-batch replay. Returns
    * false when the batch was already committed (the replay no-op).
    *
    * Structured Streaming guarantees a replayed micro-batch carries
    * the SAME `batchId` with the SAME data, so exactly-once reduces to
    * idempotent commit. The protocol, all under the shared append gate:
    *
    *  1. LEDGER CHECK — `_sink.<id>.<batch>.json` versions at the root
    *     record the newest committed batch per sink identity (atomic
    *     CREATE per commit, reader takes the max — the sidecar
    *     pattern). `batchId` at or below it: already committed, skip.
    *  2. TORN-ATTEMPT SWEEP — a pend marker left by a crashed attempt
    *     of THIS batch means some of its files may already sit in the
    *     live tree; they are identifiable BY NAME (every published
    *     file of a sink batch is prefixed `sink-<id>-<batchHex>-`,
    *     [[writeAppend]]'s `fileTag`) and are deleted before the
    *     rewrite, so replay converges instead of duplicating.
    *  3. PEND MARKER — `_append.<id>-<batchHex>-<attempt>.lock` is
    *     created before any file lands, HEARTBEATEN (re-PUT) every few
    *     seconds while the attempt publishes, and deleted only AFTER
    *     the ledger commit. It matches the shared append-marker
    *     pattern, so a crash mid-batch BLOCKS maintenance (exactly
    *     like a crashed plain append) until the sink restarts and
    *     self-heals — a compact running between crash and replay would
    *     merge the torn files beyond the sweep's reach. The heartbeat
    *     is the live-vs-dead discriminator: a replay finding a FRESH
    *     rival marker for its own batch refuses loudly (a zombie
    *     driver is publishing that batch concurrently — sweeping would
    *     corrupt what it is about to commit), while a STALE marker
    *     (no heartbeat for `pendStaleMs`) marks a dead attempt whose
    *     files are swept. Should two attempts still interleave past
    *     the marker check, the ledger version create arbitrates and
    *     the loser deletes exactly its own attempt-tagged files.
    *     Force-clearing the marker (`repair()`/`vacuum(force)`) and
    *     then compacting before the sink restarts is the one
    *     documented way to defeat the sweep; the marker's json names
    *     the sink, batch, and attempt for exactly that inspection.
    *  4. WRITE + LEDGER — the tagged append, the skip/zone refreshes
    *     (idempotent recomputes), then the ledger version create. A
    *     crash after the ledger but before the pend delete is healed
    *     by the replay's skip branch, which clears the stale marker.
    *
    * 100 TB posture: the happy path adds two tiny root files per batch
    * (marker + ledger version, older versions swept inline) on top of
    * [[ingest]]'s cost; the tree-wide sweep LIST runs only on the
    * torn-replay path. Delta's streaming sink records the same
    * (queryId, batchId) watermark in its transaction log — here the
    * layout has no atomic multi-file commit, so the name-tagged sweep
    * stands in for log atomicity. */
  private[graft] def ingestExactlyOnce(rows: DataFrame, sinkId: String,
      batchId: Long): Boolean = withAppendLock("sink-batch") {
    val fs = fsOfRoot
    val idHex = Lake.sinkIdHex(sinkId)
    val batchHex = java.lang.Long.toHexString(batchId)
    // per-ATTEMPT identity on top of the (sink, batch) identity: two
    // concurrent attempts of the same batch (a zombie driver racing its
    // replacement) publish under DISTINCT tags, the ledger version
    // create arbitrates, and the loser deletes exactly its own files —
    // without this, the loser's uniquely-named duplicates would survive
    // forever (the later replay takes the skip branch and sweeps
    // nothing)
    val attempt = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    def pendsForBatch(): Seq[(org.apache.hadoop.fs.Path, String)] =
      listRoot(fs).collect {
        case s if s.isFile &&
          s.getPath.getName.startsWith(s"_append.$idHex-$batchHex-") &&
          s.getPath.getName.endsWith(".lock") =>
          s.getPath -> s.getPath.getName
            .stripPrefix(s"_append.$idHex-$batchHex-").stripSuffix(".lock")
      }
    // Some(true) = stale (dead attempt), Some(false) = fresh (live
    // rival, heartbeat protection), None = GONE — deleted between the
    // pendsForBatch() listing and this stat, i.e. its attempt just
    // committed and cleaned up. Gone is its own state: mapping it to
    // "fresh" would make a replay refuse (spuriously failing the query
    // over a rival that already finished), and mapping it to "stale"
    // would sweep the files of a batch that just committed.
    def markerState(p: org.apache.hadoop.fs.Path): Option[Boolean] =
      try Some(System.currentTimeMillis() -
        fs.getFileStatus(p).getModificationTime >= Lake.pendStaleMs)
      catch { case _: java.io.FileNotFoundException => None }
    // Heal the DEAD attempts of this batch: for every STALE marker
    // (no heartbeat for pendStaleMs = its JVM is gone), delete that
    // attempt's published files — UNLESS it is the recorded winner,
    // whose files ARE the committed batch — then the marker itself.
    // Scoped per OBSERVED stale attempt, never batch-wide: a racing
    // live attempt's files carry a different attempt tag and are never
    // matched, so no replay can delete rows another attempt is about
    // to commit (and fresh markers — live rivals — are left untouched,
    // heartbeat protection intact).
    //
    // `version` is [[sinkVersion]]'s three-way answer for THIS batch:
    // None = no ledger version (nothing committed — every stale attempt
    // is a dead loser, sweep freely); Some(Some(w)) = w won (sweep
    // every stale attempt but w); Some(None) = the version FILE exists
    // but its winner is UNREADABLE (a torn ledger write) — the one
    // state where sweeping is forbidden: the committed batch's files
    // carry SOME attempt's tag and we cannot tell whose, so deleting
    // any stale attempt's files might delete the committed rows
    // themselves. Markers are kept too: maintenance stays blocked,
    // loudly, until an operator repairs the torn _sink.<id>.<batch>
    // .json (or repair()/vacuum(force) clears the marker).
    def healDeadAttempts(version: Option[Option[String]]): Unit =
      pendsForBatch().foreach { case (p, a) =>
        if (markerState(p).contains(true)) version match {
          case Some(None) => () // torn ledger: winner unknowable — keep everything
          case Some(Some(w)) if w == a =>
            // the winner's own stale marker (crash in the ledger →
            // marker-delete window): its files ARE the batch
            try { fs.delete(p, false); () }
            catch { case scala.util.control.NonFatal(_) => () }
          case _ =>
            sweepSinkFiles(fs, s"$idHex-$batchHex-$a")
            try { fs.delete(p, false); () }
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    val committed = sinkLedger(fs, idHex)
    // a LEGITIMATE replay only ever re-delivers the ledger head (the
    // micro-batch commit log lags addBatch by at most one batch). A
    // batch id BELOW the head means the query's checkpoint restarted
    // from scratch against a ledger that remembers more — the classic
    // wiped-checkpoint-same-location accident — and skipping would
    // silently drop every batch until the count catches up: refuse.
    require(!committed.exists(batchId < _),
      s"graft sink at ${cfg.location}: ledger for sink '$sinkId' has " +
        s"committed batch ${committed.get} but the query delivered batch " +
        s"$batchId — a reset/wiped checkpoint is reusing this sink " +
        "identity. Restore the original checkpoint, or pass a fresh " +
        s".option(\"sinkId\", ...) to ingest as a new sink, or delete " +
        s"the _sink.$idHex.*.json ledger files to deliberately re-ingest " +
        "from scratch.")
    if (committed.exists(_ == batchId)) {
      // the replay of the already-committed head: any crash fell in the
      // ledger→marker-delete window. Heal DEAD attempts (a crashed
      // loser's files would otherwise be served as duplicates forever —
      // the ledger records the WINNING attempt so its files are never
      // touched) and leave any fresh marker alone: a live zombie is
      // mid-publish and will lose the ledger race and clean itself up.
      healDeadAttempts(sinkVersion(fs, idHex, batchId))
      false
    } else {
      requireWriteConfigMatch()
      // A FRESH marker for this batch means another driver is
      // publishing it right now (a zombie racing its replacement —
      // live attempts HEARTBEAT their marker): refuse loudly, since
      // converging concurrently would double-publish. STALE markers
      // are dead attempts; heal them (sweep + marker delete) per
      // observed attempt.
      val fresh = pendsForBatch().collect {
        case (p, _) if markerState(p).contains(false) => p
      }
      if (fresh.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"sink batch $batchId at ${cfg.location} refused: another " +
          s"attempt of this same batch holds a fresh marker " +
          s"(${fresh.map(_.getName).mkString(", ")}) — a concurrent " +
          "duplicate driver is publishing this batch right now. Retry " +
          s"after the marker stops heartbeating (${Lake.pendStaleMs} ms) " +
          "or its commit lands.")
      healDeadAttempts(version = None)
      val pend = new org.apache.hadoop.fs.Path(cfg.location,
        s"_append.$idHex-$batchHex-$attempt.lock")
      // pendLock serializes the heartbeat's re-PUT against the final
      // marker delete: without it, a beat blocked inside fs.create on a
      // slow store could land AFTER the delete and resurrect the marker
      // — stranding it (maintenance blocked) until repair
      val pendLock = new Object
      def stampPend(): Unit = {
        val o = fs.create(pend, true)
        try o.write(
          (s"""{"op": "sink-batch", "sink": "$idHex", "batch": $batchId, """ +
            s""""attempt": "$attempt", """ +
            s""""taken_at": "${java.time.Instant.now()}"}""").getBytes("UTF-8"))
        finally o.close()
      }
      stampPend()
      // heartbeat: re-PUT the marker (portable mtime refresh — setTimes
      // is unsupported on object stores) so rival replays see a LIVE
      // attempt for as long as this JVM is; a crash stops the beat and
      // the marker goes stale within pendStaleMs
      val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
      val beat = new Thread(() => {
        while (beating.get()) {
          try Thread.sleep(math.max(1000L, Lake.pendStaleMs / 4))
          catch { case _: InterruptedException => () }
          pendLock.synchronized {
            if (beating.get())
              try stampPend()
              catch { case scala.util.control.NonFatal(_) => () }
          }
        }
      }, s"graft-sink-pend-beat-$attempt")
      beat.setDaemon(true)
      beat.start()
      try {
        val out = writeAppend(withDerived(rows),
          fileTag = Some(s"$idHex-$batchHex-$attempt"))
        refreshSkipIndex(out.shards)
        refreshZoneMap(out.files)
        // COMMIT = the atomic ledger version create (recording THIS
        // attempt as the winner). On IOException the version state
        // disambiguates LOSING A RACE from OUR OWN WRITE TEARING —
        // without the distinction, a torn own write (create succeeded,
        // write/close threw, a visible half-written version remains)
        // would match a naive "version exists" guard, sweep our own
        // just-published files, and report already-committed: every
        // later replay skips and the batch's rows are silently lost.
        //  - a READABLE version naming a RIVAL attempt: we lost the
        //    race — remove exactly our attempt's files (the winner's
        //    stay) and report already-committed.
        //  - NO version but the ledger head moved PAST this batch: a
        //    rival committed it (and more; our batch's version slot
        //    was rotated out — for the rival to be delivered batch
        //    n+1 its commit of n must have landed). Our files are
        //    pure duplicates: sweep, report already-committed.
        //  - anything else (version absent with head at/below us,
        //    version unreadable, or — readback races — naming US):
        //    RETHROW. The pend marker stays, maintenance stays
        //    blocked, and the restart's replay converges through the
        //    skip/heal branch (which preserves a recorded winner's
        //    files and refuses to sweep under a torn version). On a
        //    plain-S3 store where create(overwrite=false) is a blind
        //    PUT the arbitration narrows to the same documented
        //    residual as the writer lock.
        val won =
          try { writeSinkLedger(fs, idHex, batchId, attempt); true }
          catch { case e: java.io.IOException =>
            sinkVersion(fs, idHex, batchId) match {
              case Some(Some(w)) if w != attempt =>
                sweepSinkFiles(fs, s"$idHex-$batchHex-$attempt")
                false
              case None if sinkLedger(fs, idHex).exists(_ > batchId) =>
                sweepSinkFiles(fs, s"$idHex-$batchHex-$attempt")
                false
              case _ => throw e
            }
          }
        beating.set(false); beat.interrupt(); beat.join(5000L)
        // the monitor (not the bounded join) is what makes the delete
        // final: any in-flight beat completes first, none start after
        pendLock.synchronized {
          try { fs.delete(pend, false); () }
          catch { case scala.util.control.NonFatal(_) => () }
        }
        // other STALE markers of this batch heal now that a winner is
        // recorded (fresh ones belong to live rivals about to lose and
        // self-clean)
        healDeadAttempts(
          if (won) Some(Some(attempt)) else sinkVersion(fs, idHex, batchId))
        won
      } finally { beating.set(false); beat.interrupt() }
    }
  }

  /** The ledger version state for (sink, batch) — three-way, because
    * the heal paths must treat each differently:
    *
    *  - `None`: the version FILE is absent (never committed, or rotated
    *    out after later commits).
    *  - `Some(Some(attempt))`: committed; `attempt` won. The batch's
    *    files carry the winner's tag and must never be swept.
    *  - `Some(None)`: the version file EXISTS but the winning attempt
    *    cannot be read out of it (a torn ledger write, or a transient
    *    read failure). The batch counts as committed (the filename is
    *    the ledger, [[sinkLedger]]) but the winner is unknowable — heal
    *    paths must sweep NOTHING under this state, or they could delete
    *    the committed rows themselves. */
  private def sinkVersion(fs: org.apache.hadoop.fs.FileSystem,
      idHex: String, batchId: Long): Option[Option[String]] = {
    val p = new org.apache.hadoop.fs.Path(cfg.location,
      s"_sink.$idHex.$batchId.json")
    try {
      if (!fs.exists(p)) None
      else Some(""""attempt"\s*:\s*"([0-9a-f]+)"""".r
        .findFirstMatchIn(readFully(fs, p)).map(_.group(1)))
    } catch {
      case _: java.io.FileNotFoundException => None
      case scala.util.control.NonFatal(_) => Some(None)
    }
  }

  /** Whether ANY ledger version exists for this user-visible sink id —
    * the migration probe [[graft.sources.GraftDataSource.createSink]]
    * uses to keep a pre-normalization checkpoint spelling bound to its
    * existing ledger (a respelled identity with an empty ledger would
    * re-ingest the replayed head batch). One root listing. */
  private[graft] def hasSinkLedger(sinkId: String): Boolean =
    sinkLedger(fsOfRoot, Lake.sinkIdHex(sinkId)).isDefined

  /** Newest committed batch id for sink `idHex`, from the root's
    * `_sink.<id>.<batch>.json` ledger versions. */
  private def sinkLedger(fs: org.apache.hadoop.fs.FileSystem,
      idHex: String): Option[Long] = {
    val re = ("_sink\\." + java.util.regex.Pattern.quote(idHex) +
      "\\.(\\d+)\\.json").r
    listRoot(fs).flatMap(s => s.getPath.getName match {
      case re(b) if s.isFile => Some(b.toLong)
      case _ => None
    }).sorted.lastOption
  }

  /** Atomic-create ledger version for (sink, batch); sweeps all but the
    * newest two versions of this sink best-effort (same rotation
    * posture as the `_meta` sidecar). */
  private def writeSinkLedger(fs: org.apache.hadoop.fs.FileSystem,
      idHex: String, batchId: Long, attempt: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(cfg.location,
      s"_sink.$idHex.$batchId.json")
    val out = fs.create(p, false) // atomic create = the commit arbiter;
    try out.write(                // a collision means a rival won
      (s"""{"sink": "$idHex", "batch": $batchId, "attempt": "$attempt", """ +
        s""""committed_at": "${java.time.Instant.now()}"}""")
        .getBytes("UTF-8"))
    finally out.close()
    try {
      val re = ("_sink\\." + java.util.regex.Pattern.quote(idHex) +
        "\\.(\\d+)\\.json").r
      listRoot(fs).flatMap(s => s.getPath.getName match {
        case re(b) if s.isFile => Some(b.toLong -> s.getPath)
        case _ => None
      }).sortBy(_._1).dropRight(2).foreach(v => fs.delete(v._2, false))
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Delete every live-tree file a torn attempt of this sink batch
    * published (identified by the `sink-<tag>-` name prefix). Runs only
    * on the torn-replay path; cost is one current-generation tree LIST.
    * The torn files all sit in the CURRENT generation: appends only
    * land there, and the pend marker has blocked every maintenance op
    * (nothing can have moved them) since the torn attempt. */
  private def sweepSinkFiles(fs: org.apache.hadoop.fs.FileSystem,
      tag: String): Unit = {
    val gen = genPath(readState().generation)
    if (!fs.exists(gen)) return
    fs.listStatus(gen)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .foreach { d =>
        fs.listStatus(d.getPath)
          .filter(s => s.isFile && s.getPath.getName.startsWith(s"sink-$tag-"))
          .foreach(s => fs.delete(s.getPath, false))
      }
  }

  /** Fail-fast EXCLUSIVE gate for the structure-mutating ops
    * ([[deleteWhere]], [[upsert]], [[compact]], [[vacuum]], [[seal]],
    * stream-start): a marker-file create (`FileSystem.create` with
    * overwrite=false — atomic on HDFS/POSIX) of `_lock` under the lake
    * root, released in finally. Plain [[ingest]] appends do NOT take
    * this lock — they hold a SHARED marker ([[withAppendLock]]) so N
    * parallel loaders scale instead of serializing on one marker file;
    * after verifying its own token, the exclusive side refuses while
    * any shared marker is present (an append is writing into the very
    * tree a rewrite would retire). A concurrent mutation THROWS
    * `ConcurrentModificationException` instead of silently losing the
    * race — two maintenance commits interleaving would lose one side's
    * manifest update. The reference's posture is last-persist-wins
    * (index.py:294-308).
    *
    * Object-store posture: where the store advertises CONDITIONAL
    * CREATE (s3a on Hadoop 3.4.x+, probed per path — see
    * [[Lake.conditionalCreateKey]]), acquisition is an If-None-Match
    * PUT that the store itself arbitrates at close(): the gate is
    * EXACT, same as HDFS/POSIX. On plain-PUT stores without it, the
    * lock body carries a per-acquisition HOLDER TOKEN, and after
    * writing, the writer READS THE LOCK BACK — if another writer's PUT
    * landed over ours, the token mismatches and we abort without
    * touching the lock (release also only deletes when the stored
    * token is still ours). Together with the exists() pre-check this
    * narrows the unguarded HEAD-then-PUT window to the few
    * milliseconds between a writer's own PUT and its read-back; two
    * writers whose PUT+verify fully interleave inside that window can
    * both proceed — on such stores, upgrade to a client or endpoint
    * with conditional writes for the exact gate.
    *
    * Underscore-prefixed files are invisible to Spark's file index, so
    * readers never see the lock. A crashed writer (JVM death skips
    * finally) strands the lock and every later mutation fails loudly:
    * inspect, then [[repair]] (or `vacuum(force = true)`, which
    * refuses locks younger than `lockMaxAgeMs`) to recover. */
  private[graft] def withWriterLock[T](op: String)(body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(cfg.location, lockName)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString
    def contention(e: java.io.IOException): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"$op on ${cfg.location} refused: writer lock $lock is held " +
          s"(${lockHolder(fs, lock).getOrElse("holder unreadable")}). " +
          "Another maintenance op is in flight — retry after it " +
          "finishes; if its writer crashed, repair() removes the " +
          "stale lock.", e)
    // pre-check: on stores whose create(overwrite=false) is a plain PUT
    // the create below would silently clobber a HELD lock — an existing
    // marker is contention regardless of filesystem semantics
    if (fs.exists(lock)) contention(new java.io.IOException("lock file present"))
    val payload =
      s"""{"op": "$op", "taken_at": "${java.time.Instant.now()}", "holder": "$token"}"""
        .getBytes("UTF-8")
    // ACQUIRE — with the platform's atomic exclusive create where one
    // exists. Hadoop's LOCAL create(overwrite=false) is check-then-act
    // (RawLocalFileSystem tests existence, then opens a truncating
    // stream), so two writers landing in the window both "create": the
    // second TRUNCATES the first's just-written lock, and if the
    // first's verify-after-write read ran before the truncation, BOTH
    // proceed — observed as two DML commits rewriting one generation
    // concurrently (the loser's sanity-abort then deleted the winner's
    // committed tree: the full lost-update sequence). POSIX
    // open(O_CREAT|O_EXCL) via NIO CREATE_NEW closes the window
    // outright on file:// filesystems; HDFS's create(overwrite=false)
    // is atomic at the namenode already; plain-PUT object stores keep
    // the verify-after-write mitigation below (the documented lock
    // residual).
    if (fs.getScheme == "file") {
      val p = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, payload,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        ()
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          contention(new java.io.IOException("lock file present", e))
      }
    } else if (conditionalCreate(fs, lock)) {
      // CONDITIONAL CREATE (Hadoop 3.4.2+, HADOOP-19256): the store
      // itself arbitrates with an If-None-Match PUT — the create
      // commits at close() and FAILS there if any rival object landed
      // first, closing the plain-PUT interleave window exactly. s3a
      // advertises the capability when fs.s3a.create.conditional.enabled
      // (default true); the builder option is rejected by stores that
      // don't, which is why this path is capability-gated.
      val b = fs.createFile(lock)
      b.overwrite(false)
      b.must(Lake.conditionalCreateKey, true)
      val out =
        try b.build().asInstanceOf[org.apache.hadoop.fs.FSDataOutputStream]
        catch {
          case e: org.apache.hadoop.fs.FileAlreadyExistsException => contention(e)
          case e: java.io.IOException if fs.exists(lock) => contention(e)
        }
      try {
        out.write(payload)
        out.close() // the conditional PUT commits HERE
      } catch {
        // s3a surfaces a failed precondition at close as
        // RemoteFileChangedException (an IOException subclass); a lock
        // now on disk that is not ours is contention, anything else
        // (network, quota) surfaces as itself
        case e: org.apache.hadoop.fs.FileAlreadyExistsException => contention(e)
        case e: java.io.IOException
            if !lockHolder(fs, lock).exists(_.contains(token)) => contention(e)
      }
    } else {
      val out =
        try fs.create(lock, false)
        catch {
          // only a genuinely-held lock is contention; any other
          // IOException (permission, quota, network) must surface as
          // itself — mapping it to "lock is held" would steer the
          // operator toward force-vacuum, which could then delete a lock
          // a LIVE writer actually holds
          case e: org.apache.hadoop.fs.FileAlreadyExistsException => contention(e)
          case e: java.io.IOException if fs.exists(lock) => contention(e)
        }
      out.write(payload)
      out.close()
    }
    try {
      // verify-after-write: the lease survives only if OUR token is
      // what the store now serves (see scaladoc: object-store race).
      // Redundant on file:// and HDFS (atomic create) and under
      // conditional create (the store arbitrated at close);
      // load-bearing on plain-PUT stores without it.
      if (!lockHolder(fs, lock).exists(_.contains(token)))
        contention(new java.io.IOException("lost lock-create race"))
      // shared-marker check AFTER our lock is visible (store-then-load
      // on both sides: an appender stores its marker then loads `_lock`;
      // we store `_lock` then load markers — at least one side must see
      // the other, so append and maintenance can never both proceed).
      // Listing is strongly consistent on POSIX/HDFS and on S3 since
      // 2020, so a marker created before our load is visible to it.
      val markers = appendMarkers(fs)
      if (markers.nonEmpty) {
        fs.delete(lock, false)
        throw new java.util.ConcurrentModificationException(
          s"$op on ${cfg.location} refused: writer lock yields to " +
            s"${markers.size} in-flight append(s) " +
            s"(${markers.map(_.getPath.getName).mkString(", ")}). " +
            "Retry after they finish; a crashed appender's stale marker " +
            "is cleared by repair() or vacuum(force).")
      }
      body
    } finally {
      // release ONLY a lock we still hold: if a racing writer's PUT
      // overwrote ours, deleting here would unlock THEM
      if (lockHolder(fs, lock).exists(_.contains(token)))
        fs.delete(lock, false)
    }
  }

  /** Every live shared append marker under the root. */
  private def appendMarkers(fs: org.apache.hadoop.fs.FileSystem)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    listRoot(fs).filter(s =>
      s.isFile && Lake.appendMarkerRe.matches(s.getPath.getName))

  /** SHARED gate for plain appends — the concurrent-ingest protocol
    * (the 100 TB loading story: N parallel ingest jobs must not
    * serialize on one marker file). An append:
    *
    *  1. refuses if the exclusive `_lock` is present (maintenance is
    *     restructuring the very tree the append would land in);
    *  2. creates its own uniquely-named `_append.<uuid>.lock` marker —
    *     unique names never collide, so appends admit each other;
    *  3. re-checks `_lock` AFTER its marker is visible: both sides
    *     store their marker first and load the other's second, so under
    *     a linearizable store (POSIX/HDFS; S3 is list-after-PUT
    *     consistent since 2020) at least one of a racing append /
    *     maintenance pair sees the other and backs off — they can never
    *     both proceed. If maintenance won, the append deletes its
    *     marker and throws, leaving nothing behind.
    *
    * Appends are safe to run concurrently by construction: each writes
    * fresh uniquely-named files into the current generation's live tree
    * via its own staging dir ([[writeAppend]]), touches no existing
    * file, and its sidecar stamp re-reads the state it republishes
    * UNDER this gate — maintenance cannot interleave, so a stamp can
    * never republish a stale manifest (the lost-update hazard that kept
    * ingest serialized before). A crashed appender strands its marker;
    * maintenance then fails loudly until [[repair]] (or
    * `vacuum(force)`) clears it — the same posture as the exclusive
    * lock. */
  private def withAppendLock[T](op: String)(body: => T): T = {
    val fs = fsOfRoot
    val lock = new org.apache.hadoop.fs.Path(cfg.location, lockName)
    def contention(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"$op on ${cfg.location} refused: writer lock $lock is held " +
          s"(${lockHolder(fs, lock).getOrElse("holder unreadable")}). " +
          "A maintenance op is in flight — retry after it finishes; if " +
          "its writer crashed, repair() removes the stale lock.")
    if (fs.exists(lock)) contention()
    fs.mkdirs(new org.apache.hadoop.fs.Path(cfg.location)) // first-ever append
    val marker = new org.apache.hadoop.fs.Path(cfg.location,
      s"_append.${java.util.UUID.randomUUID()}.lock")
    val out = fs.create(marker, false)
    // once created, the marker blocks every maintenance op until aged
    // out — so ANY failure between create and the body's own
    // try/finally (a short write, the store-then-load re-check, the
    // contention throw itself) must tear it down on the way out
    try {
      try out.write(
        s"""{"op": "$op", "taken_at": "${java.time.Instant.now()}"}"""
          .getBytes("UTF-8"))
      finally out.close()
      if (fs.exists(lock)) contention()
    } catch { case t: Throwable => fs.delete(marker, false); throw t }
    try body finally fs.delete(marker, false)
  }

  /** Read a small control file fully (sidecars, the lock). A single
    * read() call may legally return a short prefix on some streams —
    * truncating a lock body would drop the holder token and truncating
    * a sidecar would tear the manifest, so EVERY control-file read goes
    * through this loop (the derived-table sidecar reader shares it:
    * [[Lake.readControlFile]]). */
  private def readFully(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = Lake.readControlFile(fs, p)

  private def lockHolder(fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path): Option[String] =
    try Some(readFully(fs, lock)).filter(_.nonEmpty)
    catch { case _: Throwable => None }

  /** Whether the store advertises conditional (If-None-Match) create
    * for this path — the probe that picks the exact object-store lock
    * acquisition over the verify-after-write fallback. A store that
    * cannot answer (old client, RPC error) answers no: the fallback is
    * always safe, merely weaker. */
  private def conditionalCreate(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    try fs.hasPathCapability(p, Lake.conditionalCreateKey)
    catch { case scala.util.control.NonFatal(_) => false }

  /** Path of generation `g`'s subtree under the root. */
  private def genPath(g: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(cfg.location, s"gen-$g")

  /** True iff `tree` holds partition directories or bare parquet files.
    * Pass `knownExists = true` when a prior listing already proved the
    * directory's presence — skips one HEAD round trip per call on the
    * hot read path. */
  private def treeHasData(fs: org.apache.hadoop.fs.FileSystem,
      tree: org.apache.hadoop.fs.Path, knownExists: Boolean = false): Boolean =
    (knownExists || fs.exists(tree)) && fs.listStatus(tree).exists(s =>
      (s.isDirectory && s.getPath.getName.contains("=")) ||
        (s.isFile && s.getPath.getName.endsWith(".parquet")))

  /** Every live (escaped-dir-name, generation) pair: the manifest plus
    * the current generation's own partition directories (appends land
    * there between commits, so the whole current tree is live by rule).
    * One dir name can appear under several generations — a partition
    * rewritten long ago and appended to since has copies in both. */
  private def liveEntries(st: LakeState): Seq[(String, Long)] = {
    // a SEALED state is manifest-only ([[seal]]): its generation tree
    // was empty at commit, and anything there now (post-seal appends
    // before their unsealing commit, or a crashed append's orphans) is
    // not part of the sealed snapshot
    if (st.isSealed) return st.live
    val fs = fsOfRoot
    val cur = genPath(st.generation)
    val inCur =
      if (!fs.exists(cur)) Nil
      else fs.listStatus(cur).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath.getName -> st.generation)
    st.live.filter(_._2 != st.generation) ++ inCur
  }

  /** Data sitting at ROOT level, outside any generation: a pre-v2 flat
    * lake (still readable) or a foreign dataset dropped at this
    * location (read()'s schema validation rejects it loudly instead of
    * bootstrapping an empty lake on top of someone else's data).
    * Maintenance ops refuse while such data is present — they cannot
    * retire what the manifest does not govern. */
  private def rootLevelDataFrom(entries: Seq[org.apache.hadoop.fs.FileStatus]): Seq[org.apache.hadoop.fs.Path] =
    entries.filter(s =>
      (s.isDirectory && s.getPath.getName.contains("=")) ||
        (s.isFile && s.getPath.getName.endsWith(".parquet"))).map(_.getPath)

  private def rootLevelData(fs: org.apache.hadoop.fs.FileSystem): Seq[org.apache.hadoop.fs.Path] =
    rootLevelDataFrom(listRoot(fs))

  /** First unused generation number: past both the committed pointer
    * and any UNCOMMITTED tree a crashed op stranded on disk (those keep
    * their number until [[vacuum]] sweeps them — reusing it would mix
    * two ops' files in one tree). */
  private def nextGen(st: LakeState): Long = {
    val fs = fsOfRoot
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val onDisk =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.flatMap(s => s.getPath.getName match {
        case genDirRe(g) if s.isDirectory => Some(g.toLong)
        case _ => None
      })
    (st.generation +: onDisk).max + 1
  }

  /** Append-write an already-derived frame (shared by [[ingest]] and
    * [[upsert]]'s bootstrap path so the two can never diverge). Appends
    * go into the CURRENT generation's tree — new files in live
    * directories, invisible to a concurrent reader's already-planned
    * scan, visible to the next; no commit needed beyond the
    * `last_update` stamp.
    *
    * Write path: stage under `_staging/<uuid>/` (each append gets its
    * OWN Hadoop committer scratch — concurrent jobs appending to one
    * directory share `_temporary/0` and clobber each other's in-flight
    * task files at cleanup), then MOVE the finished part-files into the
    * live tree. Filenames embed the write job's uuid, so moves from
    * concurrent appends never collide; a crash mid-move leaves some
    * files visible and the staging remainder as scratch ([[vacuum]]
    * sweeps `_staging`) — the same partial-visibility contract as any
    * non-atomic append, with zero committed rows lost. On object
    * stores the move is copy+delete per file, the identical cost the
    * file committer itself pays there. Returns the partition values
    * this batch landed files in (the skip-index refresh scope) and the
    * published file paths themselves (the zone-map refresh scope).
    * Caller holds the shared OR exclusive gate, so the generation
    * pointer cannot move between the state read and the move, and the
    * closing stamp republishes a state no maintenance commit can be
    * concurrently replacing.
    *
    * `fileTag` (the streaming-sink path, [[ingestExactlyOnce]])
    * prefixes every published filename with `sink-<tag>-` so a torn
    * batch's files are IDENTIFIABLE by name on replay — the sweep that
    * makes the sink's replay idempotent. Plain appends stay untagged. */
  private def writeAppend(derived: DataFrame,
      fileTag: Option[String] = None): Lake.Appended = {
    routingChecked // never append rows routed under foreign hyperplanes
    val fs = fsOfRoot
    val st = readState()
    // re-checked UNDER the append gate (not just at op entry): a
    // reshard transition committing in the entry-check-to-marker
    // window must not let this session land rows routed at the old
    // width into the post-transition tree
    requireStateWidth(st, "append")
    // a generation with a sink manifest is STREAM-OWNED: the manifest
    // governs which files readers see, and it will never name a batch
    // append's files — writing here would produce committed-but-
    // invisible rows. [[ingestStream]] rolls a fresh generation when it
    // starts over batch data; the inverse direction refuses.
    require(!fs.exists(new org.apache.hadoop.fs.Path(
      genPath(st.generation), "_spark_metadata")),
      s"refusing batch ingest at ${cfg.location}: the current generation " +
        "is a streaming sink (its _spark_metadata manifest would not " +
        "name the appended files, hiding them from every read)")
    val staging = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(cfg.location, Lake.stagingDirName),
      java.util.UUID.randomUUID().toString)
    derived
      // cluster rows by partition value before the write: each task then
      // writes whole shard files instead of every task touching every
      // shard directory (the small-files explosion at scale)
      .repartition(col(partCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", cfg.codec) // reference hard-codes gzip (index.py:308); snappy default scans faster
      .partitionBy(partCol)
      .parquet(staging.toString)
    val gen = genPath(st.generation)
    val stagedDirs = fs.listStatus(staging).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    val moved = Seq.newBuilder[String]
    stagedDirs.foreach { d =>
      val tgt = new org.apache.hadoop.fs.Path(gen, d.getPath.getName)
      fs.mkdirs(tgt)
      dataFilesIn(fs, d.getPath).foreach { f =>
        val dstName = fileTag match {
          case Some(t) => s"sink-$t-${f.getPath.getName}"
          case None    => f.getPath.getName
        }
        val dst = new org.apache.hadoop.fs.Path(tgt, dstName)
        if (!fs.rename(f.getPath, dst))
          throw new java.io.IOException(
            s"append publish failed: could not move ${f.getPath} to $dst")
        moved += dst.toString
      }
    }
    fs.delete(staging, true)
    // drop the _staging parent too once no sibling append is staging —
    // best-effort (delete(recursive=false) refuses a concurrently
    // repopulated dir), so a racing append can never lose its scratch
    try {
      if (fs.listStatus(staging.getParent).isEmpty)
        fs.delete(staging.getParent, false)
    } catch { case scala.util.control.NonFatal(_) => () }
    // merge-safe stamp: re-read the state UNDER the gate (no maintenance
    // commit can interleave; racing append stamps republish the same
    // manifest) so the stamp can never resurrect a pre-commit manifest
    writeState(readState())
    Lake.Appended(
      stagedDirs.map(d =>
        unescapePartitionValue(d.getPath.getName.split("=", 2)(1))).toSet,
      moved.result())
  }

  /** The ONE derived-column block, shared by batch and streaming ingest
    * so the two paths can never diverge: metadata coercion (column
    * missing → {"name":"unknown"}; null or EMPTY map → {"id":"1"}, the
    * reference's ingest quirk, index.py:572-575), document default,
    * uuid id, ingest timestamp, float vector cast, LSH shard routing.
    * All row-local expressions — map-side at any scale. */
  private def withDerived(rows: DataFrame): DataFrame = {
    var df = rows
    // NESTED metadata (reference parity: `add` accepts an arbitrary
    // dict, index.py:266): a `metadata_json` string column rides
    // OPAQUELY in the stored map under the reserved "_json" key — the
    // stored schema stays map<string,string>, any JSON nesting depth
    // round-trips byte-exactly, and [[metadataField]] reads nested
    // paths out at query time (get_json_object, codegen'd — no schema
    // migration, no UDF). A user map that already carries "_json"
    // fails map_concat's duplicate-key check loudly rather than
    // silently shadowing one side.
    if (df.columns.contains("metadata_json")) {
      val j = coalesce(col("metadata_json").cast(StringType), lit("{}"))
      df =
        (if (df.columns.contains("metadata"))
          df.withColumn("metadata", map_concat(
            coalesce(col("metadata"),
              map().cast(MapType(StringType, StringType))),
            map(lit("_json"), j)))
        else df.withColumn("metadata", map(lit("_json"), j)))
          .drop("metadata_json")
    }
    if (!df.columns.contains("metadata"))
      df = df.withColumn("metadata",
        map(lit("name"), lit("unknown")).cast(MapType(StringType, StringType)))
    else
      df = df.withColumn("metadata",
        when(col("metadata").isNull || size(col("metadata")) === 0,
          map(lit("id"), lit("1")).cast(MapType(StringType, StringType)))
          .otherwise(col("metadata")))
    // NULL-valued derived columns are treated like ABSENT ones, per row
    // — the SQL write path (INSERT INTO ... USING graft with a column
    // list, df.write.format("graft") with a subset schema) delivers the
    // full table schema with unsupplied columns null-filled, and a null
    // document/id landing verbatim would diverge from what the same
    // rows get through the Scala API
    if (!df.columns.contains("document")) df = df.withColumn("document", lit(""))
    else df = df.withColumn("document",
      coalesce(col("document").cast(StringType), lit("")))
    // a caller-supplied id survives (upsert identity); absent or null →
    // uuid, the reference's default (index.py:577)
    if (!df.columns.contains("id")) df = df.withColumn("id", expr("uuid()"))
    df = df
      .withColumn("id", coalesce(col("id").cast(StringType), expr("uuid()")))
      // a caller-supplied timestamp survives (backfill/replay ingest
      // keeps source event times — and the `_zone` time pruning is only
      // as good as the times are meaningful); absent or null → now(),
      // the reference's always-stamp default. Never null either way.
      // NUMERIC columns are REFUSED rather than cast: Spark reads a
      // bare number as epoch SECONDS, so the overwhelmingly common
      // epoch-millis source would silently land every row ~50,000 years
      // out — convert explicitly (timestamp_seconds/timestamp_millis)
      // to say which unit you mean. MALFORMED strings are refused
      // per-row in the plan: a non-null source value whose cast comes
      // back null (a date format Spark cannot parse) would otherwise be
      // coalesced to now() — silently rewriting a backfill's event
      // times to ingest time and corrupting readTimeRange/topKInRange
      // semantics. Only absent/NULL values are defaulted.
      .withColumn("timestamp",
        if (df.columns.contains("timestamp")) {
          require(!df.schema("timestamp").dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"ingest at ${cfg.location}: the supplied `timestamp` column is " +
              s"numeric (${df.schema("timestamp").dataType.simpleString}) — " +
              "ambiguous epoch unit (seconds? millis?). Convert explicitly " +
              "with timestamp_seconds(...) or timestamp_millis(...).")
          // try_cast, not cast: under ANSI (Spark 4's default) a plain
          // cast throws CAST_INVALID_INPUT with no ingest context, and
          // under ANSI-off it nulls silently — try_cast nulls in BOTH
          // modes, so the refusal below fires deterministically with
          // the lake's own message regardless of the session's mode.
          coalesce(col("timestamp").try_cast(TimestampType),
            when(col("timestamp").isNull, current_timestamp())
              .otherwise(raise_error(concat(
                lit(s"ingest at ${cfg.location}: unparseable `timestamp` " +
                  "value '"),
                col("timestamp").cast(StringType),
                lit("' — malformed timestamps are rejected (only " +
                  "absent/null values default to now()); fix the source " +
                  "format or cast explicitly before ingest")))
                .cast(TimestampType)))
        } else current_timestamp())
      // a NULL or WRONG-LENGTH vector is refused per-row in the plan
      // (not pre-counted — that would cost an extra scan): a null
      // cannot be routed, packed, or searched (and on an LSH lake it
      // would silently land in the Hive default partition outside
      // every shard prune), and a vector of the wrong dimension would
      // route through a truncated dot product and poison every later
      // distance — the easiest mistake to make through the SQL write
      // surface, caught at the door with the lake's own message
      .withColumn("vector",
        when(col("vector").isNull, raise_error(lit(
          s"ingest at ${cfg.location}: `vector` is null — every ingested " +
            "row needs a vector (it is the routing and search key)"))
          .cast(ArrayType(FloatType)))
          .when(size(col("vector")) =!= cfg.dim, raise_error(concat(
            lit(s"ingest at ${cfg.location}: vector of length "),
            size(col("vector")).cast(StringType),
            lit(s" does not match the lake's dim ${cfg.dim}")))
            .cast(ArrayType(FloatType)))
          .otherwise(col("vector").cast(ArrayType(FloatType))))
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
    // schema-evolution extras ride along: a supplied column is cast to
    // its REGISTERED type (the sidecar's), an absent one is typed null
    // — every file written after an evolve() carries the full current
    // schema, so null-filling pre-evolve files is the only merge reads
    // ever need. Unregistered input columns are dropped (the documented
    // ingest contract): evolve() first, then ingest.
    val extras = extraFieldsOf(readState()).map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }
    df.select((stamped ++ extras :+ col(partCol)): _*)
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
    * sidecar is the authoritative `last_update` here, and
    * a [[org.apache.spark.sql.streaming.StreamingQueryListener]] scoped
    * to this query re-stamps it after every data-carrying micro-batch
    * (the sidecar sits outside the sink's `_spark_metadata` manifest,
    * so the refresh cannot race the sink's exactly-once bookkeeping).
    * This matches the reference's per-persist stamping (index.py:
    * 296-305) at micro-batch granularity.
    *
    * The sink writes into the CURRENT generation's tree (resolved at
    * stream start). Maintenance ops refuse to run while the sink's
    * `_spark_metadata` manifest is present there, so the generation
    * pointer cannot move out from under a live stream. */
  def ingestStream(rows: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): org.apache.spark.sql.streaming.StreamingQuery = {
    routingChecked // BEFORE the sidecar write below re-stamps it
    requireWriteConfigMatch() // likewise
    // resolve the sink generation, stamp, AND pin it — all under the
    // writer lock, failing LOUDLY on contention (a silently-skipped
    // start racing a compact could resolve a generation that a commit
    // + vacuum then retires before batch 0 writes the sink manifest:
    // batch 0 would recreate the dead tree and its rows would be
    // invisible and vacuum-bait). Pinning = pre-creating the sink's
    // `_spark_metadata` dir here, so the maintenance guard refuses
    // from stream START, not from batch 0's commit; the sink's
    // metadata log happily adopts the pre-existing empty dir.
    val (sinkPath, pinnedMeta) = withWriterLock("ingestStream-start") {
      val st = readState()
      val fs = fsOfRoot
      val cur = genPath(st.generation)
      val metaExisted = fs.exists(
        new org.apache.hadoop.fs.Path(cur, "_spark_metadata"))
      // A generation that already holds BATCH data must not become the
      // sink: the sink's manifest governs which files readers see in
      // its tree, and it would never name the batch files — every
      // pre-existing row would vanish from read(). ROLL instead: one
      // commit keeps every live dir at its existing generation (they
      // keep reading through the normal older-generation branch) and
      // opens a fresh generation the manifest is truthfully
      // authoritative for. A generation that already HAS a manifest is
      // stream-owned (this is a restart): reuse it, never roll —
      // the checkpointed sink log continues where it left off.
      val sinkSt =
        if (!metaExisted && treeHasData(fs, cur)) {
          // the roll carries any in-flight reshard forward: pending
          // (dir, generation) references are absolute, so a fresh
          // append target never invalidates them
          val rolled = LakeState(nextGen(st), liveEntries(st),
            extraCols = st.extraCols, sidecarShards = st.sidecarShards,
            reshard = st.reshard)
          writeState(rolled)
          rolled
        } else { writeState(st); st }
      val p = genPath(sinkSt.generation)
      val meta = new org.apache.hadoop.fs.Path(p, "_spark_metadata")
      // remember whether THIS call created the pin: a pre-existing
      // manifest (a restarted stream, possibly with committed batches)
      // must never be rolled back by our failure path below
      val created = !fs.exists(meta)
      if (created) fs.mkdirs(meta)
      (p.toString, if (created) Some(meta) else None)
    }
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
          stampQuietly() // pure last_update stamp; state unchanged
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == queryId) spark.streams.removeListener(this)
    }
    spark.streams.addListener(stamper)
    val query =
      try withDerived(rows)
        .writeStream
        .queryName(qName)
        .format("parquet")
        .option("path", sinkPath)
        .option("checkpointLocation", checkpoint)
        .option("compression", cfg.codec)
        .partitionBy(partCol)
        .trigger(trigger)
        .start()
      catch { case t: Throwable =>
        spark.streams.removeListener(stamper)
        // a failed start() must not leave the pin behind: an EMPTY
        // streaming manifest in the live tree would hide every
        // current-generation row from read() (the branch honors it)
        // and refuse maintenance forever. Remove only the dir this
        // call created, only while still empty, under the lock;
        // best-effort — the start failure is the error that matters
        try pinnedMeta.foreach { m =>
          withWriterLock("ingestStream-unpin") {
            val fs = fsOfRoot
            if (fs.exists(m) && fs.listStatus(m).isEmpty) {
              fs.delete(m, false); ()
            }
          }
        } catch { case scala.util.control.NonFatal(_) => () }
        throw t }
    query
  }

  /** Schema-validated read (reference validates column list on load,
    * index.py:249-250). Empty-location bootstrap returns an empty frame
    * with the canonical schema (index.py:247).
    *
    * Layout v2: one branch per live GENERATION — the whole current tree
    * (appends land there; read as a single path so a streaming sink's
    * `_spark_metadata` manifest is honored), plus each older
    * generation's manifest-named directories under a `basePath` at that
    * generation (the standard subset-of-a-partitioned-table read).
    * A freshly-compacted (or never-rewritten) lake is ONE branch — the
    * exact single-scan plan of a flat layout; each uncommitted-into-
    * compact maintenance op adds at most one branch, and partition
    * pruning applies inside every branch. Dead directories are never
    * even LISTED — a reader's paths are resolved from one sidecar
    * read, and nothing deletes a live-at-resolution-time directory
    * except an operator-invoked [[vacuum]]. */
  def read(): DataFrame = {
    routingChecked // a mismatched-config session must not prune/route
    val fs = fsOfRoot
    val entries = listRoot(fs)
    readFrom(readStateFrom(fs, entries), entries)
  }

  /** SNAPSHOT READ at a past sidecar version — time travel, free by
    * construction in this layout: every commit is a NEW sidecar file
    * and superseded generations are dead-IN-PLACE, so any version still
    * on disk (a few are always kept; [[vacuum]] is the only thing that
    * retires them and their generations) replays exactly the rows that
    * commit saw. Pair with [[history]] to pick the version. Appends are
    * not versioned below commit granularity: a snapshot whose
    * generation received later appends includes them (the whole
    * current-gen tree is live by rule) — maintenance commits are the
    * snapshot boundaries, the same contract as the reference's
    * last-persist-wins stamp, but queryable. Fails loudly when the
    * version's sidecar (or a generation it names) has been vacuumed. */
  def readAt(version: Long): DataFrame = {
    routingChecked
    val fs = fsOfRoot
    val entries = listRoot(fs)
    readFrom(vacuumCheckedStateAt(version, fs, entries), entries)
  }

  /** [[stateAt]] plus the vacuumed-snapshot detectors [[readAt]] and
    * the `graft` DSv2 format's [[scanRoots]] share — a retired
    * snapshot must fail loudly, never read back partial or empty.
    * Two detectors, both needed: (a) the commit recorded whether its
    * OWN generation tree held data, so that tree being gone is
    * detectably retired; (b) SEALED commits always record
    * gen_has_data=false (seal rolls to a fresh empty generation), so
    * for them the signal is a MANIFEST-NAMED generation missing from
    * the root listing — vacuum only ever sweeps whole generation
    * trees, and the listing is already in hand, so this costs
    * nothing. */
  private def vacuumCheckedStateAt(version: Long,
      fs: org.apache.hadoop.fs.FileSystem,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): LakeState = {
    val st = stateAt(version, fs, entries)
    if (st.genHasData.contains(true) &&
        !treeHasData(fs, genPath(st.generation)))
      throw new IllegalStateException(
        s"snapshot $version at ${cfg.location} has been vacuumed: " +
          s"generation ${st.generation} is no longer on disk")
    val present = entries.collect {
      case e if e.isDirectory => e.getPath.getName
    }.toSet
    val swept = st.live.map(_._2).distinct.sorted
      .filterNot(g => present.contains(genPath(g).getName))
    if (swept.nonEmpty)
      throw new IllegalStateException(
        s"snapshot $version at ${cfg.location} has been vacuumed: " +
          s"generation(s) ${swept.mkString(", ")} no longer on disk " +
          "(see vacuum(retainMs) for the consumer window)")
    st
  }

  /** CLONE — materialize this lake's current (or `asOf`-pinned)
    * snapshot as a NEW, fully independent lake at `targetLocation`:
    * the experiment-fork op (Delta's `CREATE TABLE ... DEEP CLONE`
    * analog). Every stored byte is preserved — ids, timestamps,
    * metadata, routing (`shard` values stay valid because the clone
    * inherits this config's hyperplane seed), compressed columns
    * (`packed`/`pq_code` under the same codebooks), and whatever
    * schema-evolution extras the SNAPSHOT carries (an `asOf` clone
    * gets the schema as of that version, not today's). Nothing is
    * re-derived and no routing is recomputed: the snapshot frame is
    * handed straight to the target's append path.
    *
    * DEEP by design, shallow deliberately declined: the manifest
    * stores root-relative directory names and [[vacuum]] owns dead
    * trees per root, so a metadata-only clone would either break on
    * relative resolution or couple the two lakes' retention lifetimes
    * (the source's vacuum silently destroying the clone's data). One
    * distributed read→write job instead — O(data) but zero driver
    * data-plane, and the clone's lifecycle (compaction, vacuum,
    * seals, indexes — rebuilt on demand, not copied) is its own from
    * the first byte.
    *
    * The target must be EMPTY (no sidecar, no data): clone creates,
    * never merges. A vacuumed `asOf` fails loudly via [[readAt]]. */
  def cloneTo(targetLocation: String, asOf: Option[Long] = None): Lake = {
    routingChecked
    // the clone's first sidecar is stamped from THIS config, so a
    // session whose config lacks a compression the SOURCE declares
    // (the codebook-less SQL-procedure session on a PQ lake, a
    // misconstructed Scala one) would produce a target whose sidecar
    // misdescribes the faithfully-copied pq_code/packed bytes — refuse,
    // same contract as every write surface
    requireNoLesserConfig(readMetaSidecar())
    val fs = fsOfRoot
    val here = fs.makeQualified(new org.apache.hadoop.fs.Path(cfg.location))
    val there = new org.apache.hadoop.fs.Path(targetLocation)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(targetLocation))
    require(here != there,
      s"cloneTo: target equals the source location $here")
    val snap = asOf.map(readAt).getOrElse(read())
    val target = Lake(spark, cfg.copy(location = targetLocation))
    require(!target.exists() && target.readMetaSidecar().isEmpty,
      s"cloneTo: target $targetLocation already holds a lake or data — " +
        "clone only creates, never merges; delete() the target first")
    // extras = snapshot columns beyond this config's canonical stored
    // set (registered on the target BEFORE the append so its very
    // first sidecar carries them)
    val base = (storedFields.map(_.name) :+ partCol).map(_.toLowerCase).toSet
    val extras = snap.schema.fields.filterNot(f => base(f.name.toLowerCase))
    if (extras.nonEmpty) target.evolve(StructType(extras.toSeq))
    target.withAppendLock("clone") { target.writeAppend(snap); () }
    target
  }

  /** REPLICATION APPLY — advance this lake by a netted change-feed
    * delta ([[changesBetween]]'s frame: stored columns + partition
    * column + `change` ∈ insert|delete). The churn-proportional
    * companion to [[cloneTo]]: a replica cut at version A follows its
    * source to version B by applying `changesBetween(A, B)` — cost
    * O(churn + affected partitions), never O(data), where a re-clone
    * would copy everything.
    *
    * Semantics are upsert-shaped and byte-preserving: rows matching a
    * DELETE id leave, INSERT rows land exactly as carried (no
    * re-derive, no re-route — the delta's own `shard`/key values are
    * kept, valid because source and replica share the routing config
    * by clone construction), and any pre-existing row sharing an
    * INSERT id is replaced rather than duplicated (a replica drifted
    * by a partial earlier apply converges instead of corrupting).
    * Columns the delta carries beyond this lake's stored set are
    * auto-[[evolve]]d first, so a source schema evolution rides the
    * feed to the replica. The caller owns VERSION ALIGNMENT: applying
    * a delta whose from-version is not the replica's current state is
    * answered garbage-for-garbage ([[syncFrom]] is the aligned
    * convenience). Same rewrite machinery, locks, and staged-publish
    * commit as [[upsert]]. Returns (deleted, inserted). */
  def applyChanges(changes: DataFrame): (Long, Long) = {
    require(changes.columns.contains("change"),
      "applyChanges wants a change-feed frame (a `change` column of " +
        "insert|delete) — see changesBetween/changesSince(netted=true)")
    requireWriteConfigMatch()
    withWriterLock("applyChanges")(applyChangesImpl(changes))
  }

  private def applyChangesImpl(changes: DataFrame): (Long, Long) = {
    val delta = graft.operators.Materialize.cut(changes)
    val bad = delta.select("change").distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
      .filterNot(Set("insert", "delete"))
    require(bad.isEmpty,
      s"applyChanges: unknown change kind(s) ${bad.mkString(", ")}")
    val insRaw = delta.where(col("change") === "insert").drop("change")
    val insCount = insRaw.count()
    val distinctIns = insRaw.select("id").distinct().count()
    require(distinctIns == insCount,
      s"applyChanges: delta inserts carry duplicate ids ($insCount rows, " +
        s"$distinctIns distinct) — not a netted feed frame")
    // the delta must CARRY the rows it claims: the BASE stored columns
    // and the partition column may never be padded — a null-filled
    // vector/id would corrupt rows, and a null-filled partition column
    // would misplace every insert into the default partition instead
    // of its routed shard. Only evolve()d extras null-fill (replica
    // evolved past the source), the same typed fill every read applies.
    val missing = (storedCols :+ partCol).filterNot(c =>
      insRaw.columns.exists(_.equalsIgnoreCase(c)))
    require(insCount == 0L || missing.isEmpty,
      s"applyChanges: the delta is missing stored column(s) " +
        s"${missing.mkString(", ")} — not a change-feed frame (see " +
        "changesBetween/changesSince; only evolved extras may be absent)")
    // ROUTING-WIDTH guard on the carried shard values: the feed is
    // byte-preserving (no re-route), so a delta cut from a source that
    // RESHARDED to a wider routing than this replica carries shard ids
    // this lake's width can never probe — they would land in
    // directories single-probe topK never reads, a silent recall hole.
    // O(churn) like every other delta pass. (The inverse skew — a
    // NARROWER source's ids, all in range but routed under fewer
    // planes — is not detectable from values alone: [[syncFrom]]'s
    // instance-config equality covers the aligned path, and validate()
    // counts such rows as misrouted after the fact.)
    if (cfg.partitionKey.isEmpty && insCount > 0L) {
      val outOfWidth = insRaw
        .where(col(partCol) < 0 || col(partCol) >= lsh.numShards).count()
      require(outOfWidth == 0L,
        s"applyChanges at ${cfg.location}: $outOfWidth delta rows carry " +
          s"shard ids outside this lake's ${lsh.numShards}-shard width — " +
          "the source was resharded to a wider routing; reshard this " +
          "replica to the same width first (routing is deterministic, " +
          "both sides then converge), or re-clone")
    }
    // auto-evolve: delta columns beyond the stored set ride the feed
    // (inline sidecar commit under the held writer lock, so no
    // re-entrant evolve() — but the SAME validation: a legit source's
    // evolve already vetted these names, so anything validateExtraCols
    // refuses here marks a frame that never came from a feed)
    val st0 = readState()
    val known = (storedColsOf(st0) :+ partCol).map(_.toLowerCase).toSet
    val extra = insRaw.schema.fields.filterNot(f => known(f.name.toLowerCase))
    if (extra.nonEmpty) {
      validateExtraCols(st0, extra.toSeq, "applyChanges")
      writeState(st0.copy(extraCols = st0.extraCols ++
        extra.map(f => f.name -> f.dataType.catalogString)))
      ()
    }
    if (!exists()) { // bootstrapping replica: the delta IS the state
      val out = writeAppend(insRaw)
      refreshSkipIndex(out.shards); refreshZoneMap(out.files)
      return (0L, insCount)
    }
    // project both sides to the replica's stored shape; a column this
    // replica holds that the delta lacks (replica evolved past the
    // source) null-fills, the same typed fill every read applies
    val colsNow = storedColsNow
    val shape = canonicalSchema.fields.map(f => f.name -> f.dataType).toMap
    def proj(df: DataFrame): DataFrame = {
      val padded = (colsNow :+ partCol).filterNot(df.columns.contains)
        .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast(shape(c))))
      padded.select((colsNow.map(col) :+ col(partCol)): _*)
    }
    val ins = proj(insRaw)
    // every id the delta touches (delete = candidate removal, insert =
    // candidate replacement); affected-partition candidates come from
    // the delta itself — it carries the partition column for both
    // sides, so a shard-moving replacement hits old AND new dirs
    val touched = broadcast(
      delta.select(col("id").as("__chg_id")).distinct())
    val candidates = delta.select(partCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    if (candidates.isEmpty) return (0L, 0L)
    // CONVERGENCE NETTING: net the incoming inserts against the
    // replica's CURRENT rows for the touched ids (the one netting
    // definition, [[Lake.netInsertsDeletes]]). A row already present
    // byte-identical contributes nothing; a delete for an absent id
    // no-ops — so re-applying a delta after a crashed half-applied
    // step, or replaying a full snapshot over an already-converged
    // replica (the [[follow]] bootstrap), REWRITES NOTHING instead of
    // churning every partition. Only partitions where a row actually
    // enters or leaves are rewritten.
    val current = graft.operators.Materialize.cut(
      proj(read().where(affectedPartPred(candidates))
        .join(touched, col("id") === col("__chg_id"), "left_semi")))
    val net = graft.operators.Materialize.cut(netInsertsDeletes(ins, current))
    val toIns = net.where(col("change") === "insert").drop("change")
    val insN = toIns.count()
    val delN = net.where(col("change") === "delete").count()
    if (insN == 0L && delN == 0L) return (0L, 0L) // already converged
    val affected = net.select(partCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    val changedIds = broadcast(
      net.select(col("id").as("__chg_id")).distinct())
    val slice = read().where(affectedPartPred(affected))
    val sliceCount = slice.count()
    val kept = proj(
      slice.join(changedIds, col("id") === col("__chg_id"), "left_anti"))
    val keptCount = kept.count()
    rewritePartitions(affected, kept.unionByName(toIns),
      keptCount + insN, "applyChanges")
    (sliceCount - keptCount, insN)
  }

  /** Aligned replication step: advance this REPLICA from its
    * `fromVersion` cut to the source's `toVersion` seal by applying
    * the netted delta — [[cloneTo]]`(asOf = A)` then repeated
    * `syncFrom(source, A, B)` / `syncFrom(source, B, C)` keeps a
    * replica following at O(churn). Both versions must be sealed sync
    * points on the SOURCE ([[changesBetween]]'s contract; a vacuumed
    * endpoint fails loudly there). */
  def syncFrom(source: Lake, fromVersion: Long, toVersion: Long): (Long, Long) =
    applyChanges(source.changesBetween(fromVersion, toVersion))

  /** CONTINUOUS replication — this lake FOLLOWS `source` as a live
    * replica: the source's change feed (the raw DSv2 `graft-changes`
    * stream — the forward path, no legacy extension points) is netted
    * per micro-batch ([[graft.streaming.LakeChanges.net]]) and applied
    * through [[applyChanges]] inside `foreachBatch`. The composition
    * closes the replication story: [[cloneTo]] forks, [[syncFrom]]
    * advances seal-by-seal on demand, `follow` keeps a replica current
    * unattended.
    *
    * Consistency: each micro-batch is one sealed interval (a, b] of
    * the source, applied as one transactional rewrite here — the
    * replica only ever serves sealed source states, never a torn
    * middle. Exactly-once EFFECT without sink-side ledger machinery:
    * offsets are durable source seals, and a batch replayed after a
    * crash (foreachBatch is at-least-once) re-nets against the
    * replica's current rows and rewrites only what is genuinely
    * missing — an already-applied batch is a no-op by
    * [[applyChanges]]'s convergence netting.
    *
    * Bootstrap: a fresh checkpoint's first batch is the full sealed
    * snapshot as inserts. An EMPTY replica bootstraps with a plain
    * append (no netting cost); a replica pre-seeded by [[cloneTo]]
    * pays one convergence pass that reads both sides, proves them
    * identical, and rewrites nothing. Restarts resume from the
    * checkpoint and never re-pay the snapshot.
    *
    * Contention: each apply takes the REPLICA's writer lock and fails
    * fast if replica-side maintenance holds it — the query fails
    * loudly rather than stalling, and a restart converges by the
    * replay-netting contract above. Schedule replica maintenance
    * around the follower (or let the follower own it).
    *
    * 100 TB posture: steady-state cost per trigger is O(churn +
    * affected partitions) — file-level delta reads, the netting
    * anti-join shuffles only the delta, and only partitions where a
    * row actually enters or leaves are rewritten. [[graft.Lake.vacuum]]
    * on the SOURCE is the one thing that can break a long-stopped
    * follower's replay (it retires sealed versions); run it with
    * `retainMs` covering the follower's maximum downtime, same as any
    * change-feed consumer. */
  def follow(source: LakeConfig, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): org.apache.spark.sql.streaming.StreamingQuery = {
    require(source.location != cfg.location,
      "follow: a lake cannot follow itself")
    // rows land byte-as-carried (no re-route, no re-derive) — sound
    // only when both lakes resolve identical routing and storage
    require(source.dim == cfg.dim && source.numHashes == cfg.numHashes &&
      source.seed == cfg.seed && source.partitionKey == cfg.partitionKey &&
      source.packSignBits == cfg.packSignBits,
      "follow: source and replica must share the routing/storage config " +
        "(dim, numHashes, seed, partitionKey, packSignBits) — got source=" +
        s"(${source.dim}, ${source.numHashes}, ${source.seed}, " +
        s"${source.partitionKey}, ${source.packSignBits}) vs replica=" +
        s"(${cfg.dim}, ${cfg.numHashes}, ${cfg.seed}, " +
        s"${cfg.partitionKey}, ${cfg.packSignBits})")
    val reader = spark.readStream.format("graft-changes")
      .option("location", source.location)
      .option("dim", source.dim.toString)
      .option("numHashes", source.numHashes.toString)
      .option("metric", source.metric)
      .option("seed", source.seed.toString)
      .option("packSignBits", source.packSignBits.toString)
      .option("netted", "false")
      .option("initialSnapshot", "true")
    source.partitionKey.fold(reader)(k => reader.option("partitionKey", k))
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyChanges(graft.streaming.LakeChanges.net(batch.toDF()))
        ()
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .start()
  }

  /** Per-shard divergence audit between this lake and a shard-aligned
    * `other` (a [[cloneTo]] fork, a [[syncFrom]]/[[follow]] replica) —
    * the replication VERIFICATION op: one row per live shard value
    * with both sides' row counts and an `in_sync` verdict derived
    * from counts plus an order-independent content fingerprint
    * (`bit_xor` of `xxhash64` over the stored columns both sides
    * share, partition column excluded), so a count-neutral divergence
    * — a corrupted vector, a document swapped under the same id — is
    * still caught. Columns: `(<partCol>, cnt, other_cnt, in_sync)`.
    *
    * 100 TB posture: this is the STORAGE-PARTITIONED-JOIN shape end
    * to end — both scans opt in (`option("spj", "true")`), so the
    * per-shard aggregates ride the key-grouped file partitions with
    * no exchange and the final per-shard join is co-located; the only
    * data movement is two map-side aggregated rows per shard
    * (GraftSpjSpec pins the zero-shuffle plan). Compare with a
    * re-download-and-compare: days of copy for a verdict this
    * computes in one metadata-light pass. */
  def diffStats(other: Lake, spj: Boolean = true): DataFrame = {
    require(other.cfg.location != cfg.location,
      "diffStats: comparing a lake to itself is vacuous")
    require(other.cfg.dim == cfg.dim && other.cfg.numHashes == cfg.numHashes &&
      other.cfg.seed == cfg.seed && other.cfg.partitionKey == cfg.partitionKey,
      "diffStats: lakes must share the routing config (dim, numHashes, " +
        "seed, partitionKey) or per-shard comparison is meaningless")
    val shared = {
      val mine = canonicalSchema.fieldNames.toSet
      val theirs = other.canonicalSchema.fieldNames.toSet
      (mine intersect theirs - partCol).toSeq.sorted
    }
    require(shared.nonEmpty, "diffStats: no shared stored columns")
    // hash expressions prohibit MAP inputs (map hashcodes are
    // order-sensitive) — canonicalize maps to their sorted entry list.
    // NULL-DISTINGUISHING: xxhash64 passes its seed through unchanged
    // on a NULL input, so two rows differing only in WHICH of two
    // columns is null would hash identically — each value rides with
    // an explicit per-column null flag so null placement is part of
    // the fingerprint.
    val byName = canonicalSchema.fields.map(f => f.name -> f.dataType).toMap
    val hashInputs = shared.flatMap { f =>
      val v = byName(f) match {
        case _: MapType => sort_array(map_entries(col(f)))
        case _ => col(f)
      }
      Seq(v, isnull(col(f)).cast(IntegerType))
    }
    // spj=false forces the stock shuffled plan — the A/B lever
    // SpjBench measures the co-located audit against.
    // TWO combiners over the per-row hash: bit_xor alone is blind to
    // byte-identical row PAIRS (h XOR h = 0 — a duplicated-and-
    // dropped-elsewhere pair would XOR-cancel, count-neutral), and a
    // plain sum alone is blind to nothing obvious but wraps under
    // ANSI overflow — so the additive combiner runs in decimal(38,0)
    // (10^19 hash magnitude × 10^19 rows fits) and a shard is in_sync
    // only when count, XOR fold, AND additive fold all agree.
    def side(l: Lake, cntName: String, hashName: String, sumName: String): DataFrame =
      spark.read.format("graft").option("spj", spj.toString).load(l.cfg.location)
        .groupBy(col(partCol))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as(cntName),
          bit_xor(xxhash64(hashInputs: _*)).as(hashName),
          sum(xxhash64(hashInputs: _*).cast(DecimalType(38, 0))).as(sumName))
    // Join strategy by NULLABILITY of the shard key. A user-keyed
    // lake's null-key rows (hive default-partition dirs) and an
    // adopted flat lake's unpartitioned root files audit as ONE
    // null-key group per side — a plain equi-join would never match
    // them and report a healthy null shard as two spurious one-sided
    // rows, so those lakes take a NULL-SAFE join. But Spark rewrites
    // `<=>` into coalesce/isnull join keys, which cannot ride
    // KeyGroupedPartitioning — so the common case (LSH-routed, no
    // legacy root data: the shard key is provably non-null) keeps the
    // plain equi-join and with it the ZERO-EXCHANGE co-located plan
    // (GraftSpjSpec pins both shapes).
    val mine = side(this, "cnt", "h", "hs")
    val theirs = side(other, "other_cnt", "oh", "ohs")
    val verdict =
      (col("cnt") <=> col("other_cnt") && col("h") <=> col("oh") &&
        col("hs") <=> col("ohs")).as("in_sync")
    val nullableKey = cfg.partitionKey.isDefined ||
      scanRoots(None).exists(_._2.isEmpty) ||
      other.scanRoots(None).exists(_._2.isEmpty)
    val joined =
      if (nullableKey)
        mine.join(theirs, mine(partCol) <=> theirs(partCol), "full_outer")
          .select(coalesce(mine(partCol), theirs(partCol)).as(partCol),
            col("cnt"), col("other_cnt"), col("h"), col("oh"),
            col("hs"), col("ohs"))
      else mine.join(theirs, Seq(partCol), "full_outer")
    joined.select(col(partCol),
      coalesce(col("cnt"), lit(0L)).as("cnt"),
      coalesce(col("other_cnt"), lit(0L)).as("other_cnt"),
      verdict)
    // deliberately UNORDERED: an orderBy here would range-shuffle the
    // (tiny) result and spoil the plan's zero-exchange property —
    // callers that want shard order sort the |shards|-row output
  }

  /** ANTI-ENTROPY repair — make this REPLICA equal to `source` on
    * every shard [[diffStats]] convicts, touching nothing else. The
    * heal half of the audit/heal pair: the audit convicts per-shard
    * divergence (missing rows, extra rows, count-neutral tampering —
    * the fingerprint catches all three), and repairFrom rewrites
    * exactly the convicted partitions from the source's rows: a shard
    * the replica is missing is created, a shard the source no longer
    * has is dropped, and a healthy shard's files stay byte-in-place
    * (RepairSpec pins the untouched live set path-for-path). Columns
    * the source carries beyond this lake's stored set auto-[[evolve]]
    * first (the same validation as [[applyChanges]]); replica-only
    * extras null-fill in repaired shards — the source is
    * authoritative. Returns (convicted shards, rows rewritten).
    *
    * This is the recovery path when the change feed CANNOT replay:
    * the source [[vacuum]]ed past the replica's last sync point, or
    * the replica was mutated out of band ([[syncFrom]]/[[follow]]
    * stay the cheap steady-state at O(churn); repair is O(diverged
    * partitions) after a metadata-light audit). Same rewrite
    * machinery, locks, and staged-publish commit as [[upsert]].
    *
    * 100 TB posture: the audit is the end-to-end storage-partitioned
    * join — zero exchanges, two aggregated rows per shard on the
    * wire — and the copy reads and writes ONLY convicted directories,
    * so a replica diverged in k of N shards repairs at ~k/N of a
    * re-clone's cost (re-cloning 100 TB is days of copy; repairing a
    * two-shard divergence is two directory rewrites). */
  def repairFrom(source: Lake): (Long, Long) = {
    requireWriteConfigMatch()
    withWriterLock("repairFrom") {
      val convicted = diffStats(source).where(!col("in_sync"))
        .select(partCol).collect()
        .map(r => Option(r.get(0)).map(_.toString)).toSet
      if (convicted.isEmpty) (0L, 0L)
      else {
        val truth = source.read().where(affectedPartPred(convicted))
        // auto-evolve source extras under the held lock (no re-entrant
        // evolve(), same inline path + validation as applyChanges)
        val st0 = readState()
        val known = (storedColsOf(st0) :+ partCol).map(_.toLowerCase).toSet
        val extra = truth.schema.fields
          .filterNot(f => known(f.name.toLowerCase))
        if (extra.nonEmpty) {
          validateExtraCols(st0, extra.toSeq, "repairFrom")
          writeState(st0.copy(extraCols = st0.extraCols ++
            extra.map(f => f.name -> f.dataType.catalogString)))
          ()
        }
        val colsNow = storedColsNow
        val shape = canonicalSchema.fields.map(f => f.name -> f.dataType).toMap
        val padded = (colsNow :+ partCol).filterNot(truth.columns.contains)
          .foldLeft(truth)((d, c) => d.withColumn(c, lit(null).cast(shape(c))))
        val content = graft.operators.Materialize.cut(
          padded.select((colsNow.map(col) :+ col(partCol)): _*))
        val n = content.count()
        rewritePartitions(convicted, content, n, "repairFrom")
        (convicted.size.toLong, n)
      }
    }
  }

  // ------------------------------------------------ derived tables --

  /** Newest sidecar version on disk — the staleness anchor
    * [[DerivedTable.isStale]] and [[joinDerived]] compare against.
    * One root listing; 0 for a lake that has never committed. */
  private[graft] def latestSidecarVersion: Long = {
    val fs = fsOfRoot
    metaVersionsFrom(listRoot(fs)).map(_._1).foldLeft(0L)(math.max)
  }

  /** True iff the lake's ROW SET provably did not change since sidecar
    * `version` — the derived-table freshness test. Seal commits never
    * move rows (they roll an empty generation), and every row-changing
    * path commits a NON-seal version (appends stamp under the gate;
    * maintenance/DML write their rewrite commits), so the row set is
    * unchanged when every commit after `version` is a seal. Two guards
    * keep this safe, never merely plausible: the version chain since
    * `version` must be CONTIGUOUS (inline rotation retires old non-seal
    * versions — a hole could hide one, so a hole reads as changed), and
    * any unreadable sidecar reads as changed. Without this relaxation,
    * sibling feature tables could never be jointly fresh: every
    * [[deriveTo]] seals, so table A's refresh would permanently
    * "stale" table B under a strict latest-version equality. */
  private[graft] def rowSetUnchangedSince(version: Long): Boolean = {
    val fs = fsOfRoot
    rowSetUnchangedSinceFrom(fs, metaVersionsFrom(listRoot(fs)), version,
      scala.collection.mutable.Map.empty)
  }

  /** [[rowSetUnchangedSince]] against an already-taken listing, with a
    * caller-scoped parse memo — [[joinDerivedAll]] judges every
    * feature table from ONE listing snapshot and reads each immutable
    * seal sidecar once, not once per table. */
  private def rowSetUnchangedSinceFrom(fs: org.apache.hadoop.fs.FileSystem,
      versions: Seq[(Long, org.apache.hadoop.fs.Path)], version: Long,
      sealedMemo: scala.collection.mutable.Map[Long, Boolean]): Boolean = {
    // the ANCHOR must still be listed: sync points are seal commits
    // (rotation-exempt), so an absent anchor means vacuum retired it or
    // the base was deleted and recreated at this location — in both
    // cases "unchanged" is unprovable and a recreated base would
    // otherwise pass vacuously (its version counter restarted below the
    // sync point, leaving nothing "after" it)
    if (!versions.exists(_._1 == version)) return false
    val since = versions.filter(_._1 > version).sortBy(_._1)
    since.isEmpty || (
      since.map(_._1) == (version + 1 to since.last._1) &&
        since.forall { case (v, p) =>
          sealedMemo.getOrElseUpdate(v,
            try parseState(readFully(fs, p)).isSealed
            catch { case scala.util.control.NonFatal(_) => false })
        })
  }

  /** This lake's location as the filesystem qualifies it — the stable
    * identity derived sidecars record (`/tmp/x` and `file:/tmp/x` must
    * name one base). */
  private def qualifiedLocation: String = {
    val p = new org.apache.hadoop.fs.Path(cfg.location)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Derive a CO-LOCATED feature table at `location`: compute
    * `f(rows)` over this lake's rows (f must pass `id` and `shard`
    * through untouched — filters and new feature columns are the whole
    * point, re-keying is a contract breach) and store the result
    * partitioned by the SAME shard values, so [[joinDerived]] serves
    * features back as a storage-partitioned join with zero exchange.
    * See [[DerivedTable]] for the layout and the 100 TB posture.
    *
    * INCREMENTAL by default: called again on an existing derived
    * location, it seals the base, diffs the change feed from the
    * recorded sync point ([[changesBetween]], netted), recomputes `f`
    * over only the INSERTED rows, and rewrites only the AFFECTED shard
    * directories (deleted/replaced ids drop, new feature rows land) —
    * O(base churn), never O(corpus). A no-churn refresh commits only a
    * new sync point. `rebuild = true` forces the full snapshot path
    * (required after a base [[reshard]], when `f`'s output schema
    * changed, or when [[vacuum]] retired the recorded sync point — all
    * refused loudly by the incremental path with this recovery named;
    * an automatic fallback would silently turn O(churn) into
    * O(corpus)).
    *
    * Seals the base each call (the change-feed sync-point discipline —
    * a refresh must diff two immutable states). Transform contract,
    * enforced at the door: output carries `id` (non-null string) and
    * `shard` (int, in `[0, numShards)` — range-guarded per row at
    * write); everything else is the caller's feature payload. Derived
    * tables key on LSH routing, so a user-keyed lake is refused. */
  def deriveTo(location: String, rebuild: Boolean = false)(
      f: DataFrame => DataFrame): DerivedTable = {
    require(cfg.partitionKey.isEmpty,
      s"deriveTo at ${cfg.location}: derived co-location keys on LSH " +
        "shard routing; this lake is user-keyed")
    routingChecked
    val qualBase = qualifiedLocation
    // self/overlap guard on QUALIFIED paths: a raw string compare would
    // let a trailing slash or a `file:` spelling of the lake's own root
    // through, and writeDerivedGen's Overwrite would then DESTROY lake
    // generations. Prefix containment is refused in both directions —
    // a derived tree inside the lake root would be swept as foreign
    // data by lake audits, and a lake inside the derived root would be
    // clobbered by a rebuild.
    val qualTarget = {
      val p = new org.apache.hadoop.fs.Path(location)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    require(qualTarget != qualBase &&
      !qualTarget.startsWith(qualBase + "/") &&
      !qualBase.startsWith(qualTarget + "/"),
      s"deriveTo: the derived location ($qualTarget) must not be, or " +
        s"overlap, the lake itself ($qualBase)")
    val prior = DerivedTable.tryLoad(spark, location)
    prior match {
      case Some(d) if !rebuild => deriveIncremental(location, d, f, qualBase)
      case _ => deriveFull(location, prior, f, qualBase)
    }
  }

  /** Join this lake's rows with a [[deriveTo]] feature table on
    * `(shard, id)` — the CO-LOCATED join: with `spj` (default) both
    * sides read through the `graft` format in storage-partitioned
    * mode, so the join plans with ZERO exchange (DerivedSpec pins the
    * plan; q_derived_join oracle-checks the rows). At 100 TB that is
    * the difference between streaming co-located directory pairs and
    * re-hashing corpus + features across the wire.
    *
    * STALENESS is refused by default: a base commit after the derive
    * point means rows the feature table has never seen — an inner join
    * would silently drop them, a left join would silently null them.
    * Refresh first (`deriveTo` again — O(churn)), or pass
    * `allowStale = true` to accept the recorded snapshot's coverage
    * (changed rows join as if absent). `how` ∈ inner | left (left
    * serves base rows with no feature row — a filtering `f` — with
    * null features).
    *
    * The zero-exchange shape needs the session opted in (rows are
    * correct under ANY conf — Spark just shuffles when the opt-ins are
    * off): `spark.sql.sources.v2.bucketing.enabled` and
    * `...pushPartValues.enabled` (both default true on this line) plus
    * `spark.sql.requireAllClusterKeysForCoPartition=false` — the join
    * keys (shard, id) are a SUPERSET of the partition keys (shard),
    * and the strict default demands every join key be a partition key
    * (the same relaxation Iceberg's SPJ docs prescribe). `graft.Bench`
    * and `graft.Verify` sessions ship it; DerivedSpec pins the
    * zero-exchange plan under exactly these confs. */
  def joinDerived(derived: DerivedTable, how: String = "inner",
      spj: Boolean = true, allowStale: Boolean = false): DataFrame =
    joinDerivedAll(Seq(derived), how, spj, allowStale)

  /** [[joinDerived]] over SEVERAL feature tables at once — the
    * multi-feature-store read: every derived side reads key-grouped on
    * the same shard values, so the whole join CHAIN plans with zero
    * exchange under the SPJ opt-in (each pairwise join's keys contain
    * the shared partition key; DerivedSpec pins the chained plan).
    * Feature column names must be distinct across tables (Spark only
    * errors on reference, not on join) — that is the caller's naming
    * contract, same as any SELECT *. */
  def joinDerivedAll(derived: Seq[DerivedTable], how: String = "inner",
      spj: Boolean = true, allowStale: Boolean = false): DataFrame = {
    require(derived.nonEmpty, "joinDerivedAll: no derived tables given")
    require(Set("inner", "left", "left_outer")(how),
      s"joinDerived: how must be inner or left, got '$how' — other join " +
        "types have no feature-lookup reading")
    val qual = qualifiedLocation
    derived.foreach(_.requireMatches(this, qual))
    if (!allowStale) {
      // freshness = the ROW SET is provably unchanged since each
      // table's sync point ([[rowSetUnchangedSince]]): pure seals —
      // including sibling deriveTo refreshes — do not stale a table.
      // ONE listing snapshot + a shared sidecar-parse memo judge every
      // table consistently (N listings would each see a different
      // base state, and seal sidecars are immutable — one read each)
      val fs = fsOfRoot
      val versions = metaVersionsFrom(listRoot(fs))
      val memo = scala.collection.mutable.Map.empty[Long, Boolean]
      derived.foreach(d =>
        require(rowSetUnchangedSinceFrom(fs, versions, d.baseVersion, memo),
          s"derived table at ${d.location} is STALE: base " +
            s"${cfg.location} has row-changing (or unprovable) commits " +
            s"after its sync point ${d.baseVersion} — deriveTo again to " +
            "refresh (O(churn)), or pass allowStale = true (rows changed " +
            "since will join as if absent)"))
    }
    def readVia(location: String): DataFrame =
      spark.read.format("graft").option("spj", spj.toString).load(location)
    derived.foldLeft(readVia(cfg.location))((acc, d) =>
      acc.join(readVia(d.location), Seq("shard", "id"), how))
  }

  /** Full-snapshot derive: seal, transform, write ONE new generation,
    * commit. `prior` (a rebuild's predecessor) only advances the
    * generation counter so the new tree never collides with a live
    * one. */
  private def deriveFull(location: String, prior: Option[DerivedTable],
      f: DataFrame => DataFrame, qualBase: String): DerivedTable = {
    val v = seal()
    val feats = validateDerivedOutput(f(readAt(v)), location)
    val gen = prior.map(_.state.generation + 1).getOrElse(1L)
    writeDerivedGen(location, gen, feats)
    val st = DerivedTable.State(qualBase, v, cfg.dim, 1 << cfg.numHashes,
      cfg.seed, cfg.metric, gen, listDerivedDirs(location, gen),
      feats.schema.toDDL)
    DerivedTable.commit(spark, location, st)
    // the committed state IS the result — a re-load here would pay a
    // second listing and, under a lost commit race, could return a
    // rival writer's snapshot as our own
    new DerivedTable(spark, location, st)
  }

  /** Incremental refresh: diff the base change feed from the recorded
    * sync point, recompute `f` over inserted rows only, rewrite only
    * affected shard directories. Refuses (with the rebuild recovery)
    * what it cannot serve: a resharded base (feature rows carry no
    * vectors to re-derive shards from — and a reshard's rewrite nets
    * to zero in the feed, so silence here would keep stale-width
    * directories forever) and a changed feature schema (the pinned
    * read schema is the table). */
  private def deriveIncremental(location: String, d: DerivedTable,
      f: DataFrame => DataFrame, qualBase: String): DerivedTable = {
    d.requireMatches(this, qualBase)
    val v2 = seal()
    val delta = changesBetween(d.state.baseVersion, v2).cache()
    try {
      // bounded: ≤ numShards values (the upsert/deleteWhere pattern)
      val affected = delta.select(col(partCol)).distinct()
        .collect().map(_.getInt(0)).toSet
      val committed: DerivedTable.State = if (affected.isEmpty) {
        // no churn, but f's OUTPUT SCHEMA may still have drifted —
        // probe it on an empty frame (analysis only, no job) so a
        // changed transform is refused NOW with the rebuild recovery,
        // not silently accepted until the next churnful refresh
        val probe = validateDerivedOutput(
          f(delta.drop("change").limit(0)), location)
        require(probe.schema.toDDL == d.state.schemaDdl,
          s"deriveTo refresh at $location: f's output schema changed — " +
            s"recorded '${d.state.schemaDdl}' vs computed " +
            s"'${probe.schema.toDDL}'; the pinned read schema is the " +
            "table, so rebuild: deriveTo(location, rebuild = true)(f)")
        val st = d.state.copy(baseVersion = v2)
        DerivedTable.commit(spark, location, st)
        st
      } else {
        val inserts = delta.where(col("change") === "insert").drop("change")
        val newFeats = validateDerivedOutput(f(inserts), location)
        require(newFeats.schema.toDDL == d.state.schemaDdl,
          s"deriveTo refresh at $location: f's output schema changed — " +
            s"recorded '${d.state.schemaDdl}' vs computed " +
            s"'${newFeats.schema.toDDL}'; the pinned read schema is the " +
            "table, so rebuild: deriveTo(location, rebuild = true)(f)")
        // every touched id (deletes AND inserts — an upsert's insert
        // replaces its stale feature row) drops from the kept side
        val touched = delta.select(col(partCol), col("id")).distinct()
        val ordered = d.schema.fieldNames.toSeq
        val kept = d.read()
          .where(col(partCol).isin(affected.toSeq: _*))
          .join(touched, Seq(partCol, "id"), "left_anti")
          .select(ordered.map(col): _*)
        val gen = d.state.generation + 1
        writeDerivedGen(location, gen,
          kept.unionByName(newFeats.select(ordered.map(col): _*)))
        val keptDirs = d.state.live
          .filterNot(rel => affected.contains(DerivedTable.shardOf(rel)))
        val st = d.state.copy(
          baseVersion = v2, generation = gen,
          live = keptDirs ++ listDerivedDirs(location, gen))
        DerivedTable.commit(spark, location, st)
        st
      }
      new DerivedTable(spark, location, committed)
    } finally { delta.unpersist(); () }
  }

  /** Re-co-locate a derived feature table after THIS lake was
    * [[reshard]]ed — O(feature bytes + base churn), never re-running
    * `f` over the corpus (the full-rebuild recovery is O(recompute):
    * at 100 TB that is re-reading documents and re-running models for
    * rows whose features never changed).
    *
    * Feature rows carry no vectors, so the refined shard cannot be
    * derived locally; it is JOINED in from the base's (id, shard)
    * mapping — a 2-column projection of the lake, shuffled on `id`
    * against the feature bytes (a zero-exchange shape is impossible
    * here by construction: the extra routing bits live only with the
    * vectors, and the old and new layouts share no partitioning).
    *
    * The base may have taken REAL churn around the reshard too. The
    * change feed across a reshard is O(data) relocation noise
    * (delete+insert per moved row — see [[changesBetween]]), so this
    * re-nets the delta with the shard column EXCLUDED from row
    * identity ([[Lake.netInsertsDeletes]] excludeKeys): relocations
    * cancel, surviving rows are the genuine inserts/deletes/upserts.
    * `f` is recomputed over exactly those inserts; deleted/upserted
    * ids drop from the re-keyed side (deleted ids also vanish from
    * the mapping — the inner join enforces it). The commit advances
    * the sync point, so the next [[deriveTo]] refresh diffs from
    * AFTER the reshard and stays O(churn).
    *
    * When the widths already match there is nothing to re-key — the
    * call degrades to a plain [[deriveTo]] refresh. Refuses a foreign
    * table, a foreign base, and a changed output schema exactly like
    * the incremental refresh. */
  def reshardDerived(location: String)(
      f: DataFrame => DataFrame): DerivedTable = {
    require(cfg.partitionKey.isEmpty,
      s"reshardDerived at ${cfg.location}: derived co-location keys on " +
        "LSH shard routing; this lake is user-keyed")
    routingChecked
    val qualBase = qualifiedLocation
    val d = DerivedTable.load(spark, location)
    require(d.state.baseLocation == qualBase,
      s"derived table at $location was built from ${d.state.baseLocation}, " +
        s"not from $qualBase")
    require(d.state.dim == cfg.dim && d.state.seed == cfg.seed &&
      d.state.metric == cfg.metric,
      s"derived table at $location was built under routing config " +
        s"(dim=${d.state.dim}, seed=${d.state.seed}, " +
        s"metric=${d.state.metric}) but the base lake resolves " +
        s"(dim=${cfg.dim}, seed=${cfg.seed}, metric=${cfg.metric})")
    val newShards = 1 << cfg.numHashes
    require(d.state.numShards <= newShards,
      s"derived table at $location is co-located at ${d.state.numShards} " +
        s"shards, WIDER than the base's $newShards — reshard only " +
        "refines, so this table belongs to a different (wider) lake")
    if (d.state.numShards == newShards)
      return deriveTo(location)(f) // nothing to re-key: a plain refresh
    val v2 = seal()
    val rawDelta = changesBetween(d.state.baseVersion, v2)
    val ordered = d.schema.fieldNames.toSeq
    // relocation noise cancels with `shard` out of row identity; what
    // survives is the real churn (bounded by actual base mutations)
    val churn = Lake.netInsertsDeletes(
      rawDelta.where(col("change") === "insert").drop("change"),
      rawDelta.where(col("change") === "delete").drop("change"),
      excludeKeys = Set(partCol)).cache()
    try {
      val inserts = churn.where(col("change") === "insert").drop("change")
      val newFeats = validateDerivedOutput(f(inserts), location)
      require(newFeats.schema.toDDL == d.state.schemaDdl,
        s"reshardDerived at $location: f's output schema changed — " +
          s"recorded '${d.state.schemaDdl}' vs computed " +
          s"'${newFeats.schema.toDDL}'; the pinned read schema is the " +
          "table, so rebuild: deriveTo(location, rebuild = true)(f)")
      // the mapping join re-keys every surviving feature row; touched
      // ids (upserts AND deletes) drop from the kept side first —
      // their features are stale or orphaned
      val touched = churn.select(col("id")).distinct()
      val mapping = read().select(col("id"), col(partCol))
      val kept = d.read().drop(partCol)
        .join(touched, Seq("id"), "left_anti")
        .join(mapping, Seq("id"))
        .select(ordered.map(col): _*)
      val gen = d.state.generation + 1
      writeDerivedGen(location, gen,
        kept.unionByName(newFeats.select(ordered.map(col): _*)))
      val st = d.state.copy(
        baseVersion = v2, numShards = newShards, generation = gen,
        live = listDerivedDirs(location, gen))
      DerivedTable.commit(spark, location, st)
      new DerivedTable(spark, location, st)
    } finally { churn.unpersist(); () }
  }

  /** The deriveTo transform contract, enforced at the door: `id`
    * (string) and `shard` (int) present, per-row null/range guards in
    * the plan (codegen'd — no extra scan), feature columns reordered
    * so `shard` is last (the partition column's canonical slot in the
    * pinned schema). */
  private def validateDerivedOutput(out: DataFrame,
      location: String): DataFrame = {
    val cols = out.columns.toSeq
    require(cols.contains("id") && cols.contains(partCol),
      s"deriveTo at $location: the transform must pass 'id' and " +
        s"'$partCol' through (got columns ${cols.mkString(", ")}) — they " +
        "are the co-location key the join serves on")
    require(out.schema(partCol).dataType == IntegerType,
      s"deriveTo at $location: '$partCol' must stay the lake's int " +
        s"shard, got ${out.schema(partCol).dataType.simpleString}")
    require(out.schema("id").dataType == StringType,
      s"deriveTo at $location: 'id' must stay the lake's string id, " +
        s"got ${out.schema("id").dataType.simpleString}")
    val n = 1 << cfg.numHashes
    val others = cols.filterNot(_ == partCol).map(col)
    out.select((others :+ col(partCol)): _*)
      .withColumn("id",
        when(col("id").isNull, raise_error(lit(
          s"deriveTo at $location: null id — every feature row must " +
            "name the base row it describes")).cast(StringType))
          .otherwise(col("id")))
      .withColumn(partCol,
        when(col(partCol).isNull || col(partCol) < 0 || col(partCol) >= n,
          raise_error(concat(
            lit(s"deriveTo at $location: shard "),
            col(partCol).cast(StringType),
            lit(s" outside [0, $n) — the transform re-keyed rows off " +
              "their base shard, breaking co-location")))
            .cast(IntegerType))
          .otherwise(col(partCol)))
  }

  /** Stage one derived generation tree — same clustering exchange and
    * codec as the lake's own writes; invisible until the sidecar
    * commit names it. Overwrite, for the same reason rewritePartitions
    * overwrites: a crashed prior attempt strands an UNCOMMITTED tree
    * under the same next-generation name, and the retry must converge
    * over it, not refuse. */
  private def writeDerivedGen(location: String, gen: Long,
      rows: DataFrame): Unit =
    rows.repartition(col(partCol))
      .write.mode(SaveMode.Overwrite)
      // STATIC overwrite pinned per-write: under a session's
      // partitionOverwriteMode=dynamic, only the shards present in
      // `rows` would clear — a crashed prior attempt's stranded shard
      // dirs would survive under the same gen name and be ADOPTED by
      // the manifest listing below as committed data
      .option("partitionOverwriteMode", "static")
      .option("compression", cfg.codec)
      .partitionBy(partCol)
      .parquet(s"$location/gen-$gen")

  private def listDerivedDirs(location: String, gen: Long): Seq[String] = {
    val fs = DerivedTable.fsOf(spark, location)
    val genDir = new org.apache.hadoop.fs.Path(s"$location/gen-$gen")
    if (!fs.exists(genDir)) Nil
    else fs.listStatus(genDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .map(s => s"gen-$gen/${s.getPath.getName}")
  }

  /** The canonical stored schema + partition column — what an empty
    * lake's scan serves (and what [[readFrom]] validates a non-empty
    * read against). */
  private[graft] def canonicalSchema: StructType =
    StructType(storedFieldsOf(readState()) :+ StructField(partCol,
      if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType))

  /** DIRECTORY-level scan roots of the current (`asOf = None`) or a
    * past snapshot — the `graft` DSv2 format's live-set resolution:
    * exactly the directories [[read]]/[[readAt]] would open (the live
    * manifest's (dir, generation) entries, the whole current
    * generation tree by rule, plus any pre-v2/root-level legacy
    * data), resolved from ONE sidecar read + the root listing. Each
    * entry pairs the directory path with its ESCAPED `key=value`
    * partition-dir name (None for unpartitioned root-level legacy
    * files), from which the format constructs the partition spec
    * directly — partition INFERENCE cannot work on this layout (each
    * generation strips to a different base and Spark refuses the
    * "conflicting directory structures"), and the manifest already
    * knows every value. Dead generations are never listed; a vacuumed
    * `asOf` fails loudly via [[vacuumCheckedStateAt]]. A stream-owned
    * current generation is REFUSED: its `_spark_metadata` manifest
    * governs file visibility, and a raw listing would serve
    * uncommitted in-flight files — read through [[read]] (which
    * consults the manifest) or stop the ingest stream first. */
  private[graft] def scanRoots(asOf: Option[Long]): Seq[(String, Option[String])] = {
    routingChecked
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = asOf match {
      case Some(v) => vacuumCheckedStateAt(v, fs, entries)
      case None => readStateFrom(fs, entries)
    }
    if (!st.isSealed && fs.exists(
        new org.apache.hadoop.fs.Path(genPath(st.generation), "_spark_metadata")))
      throw new IllegalStateException(
        s"graft format at ${cfg.location}: the current generation is an " +
          "active streaming-sink tree (its _spark_metadata manifest " +
          "governs file visibility; a raw listing would serve " +
          "uncommitted files) — read through Lake.read() or stop the " +
          "ingest stream and roll a batch generation first.")
    // WIDTH-UNIFORMITY guard: the format serves partition values
    // straight from directory NAMES — it has no per-row re-derivation
    // hook — so a state holding directories at a narrower width than
    // the session (an in-flight reshard's pending set, or a
    // pre-reshard snapshot via asOf) would serve stale shard values
    // through SQL. Lake.read()/readAt() re-derive and stay available.
    st.reshard.foreach { r =>
      throw new IllegalStateException(
        s"graft format at ${cfg.location}: an incremental reshard " +
          s"${1L << r.fromBits} -> ${1L << r.toBits} shards is in " +
          s"flight (${r.pending.size} directories still at the old " +
          "width) — the SQL scan would serve stale directory-named " +
          "shard values; read through Lake.read() or finish the " +
          "reshard (reshard(newNumHashes) resumes).")
    }
    if (cfg.partitionKey.isEmpty)
      st.sidecarShards.filter(_ > 0).foreach(ns => require(
        ns == lsh.numShards,
        s"graft format at ${cfg.location}: this snapshot was routed " +
          s"into $ns LSH shards but the lake's current width is " +
          s"${lsh.numShards} (a reshard happened since) — the SQL " +
          "scan cannot re-route directory-named partition values; " +
          "read the snapshot through Lake.readAt, which re-derives " +
          "routing at the current width"))
    val dirs = liveEntries(st).map { case (d, g) =>
      new org.apache.hadoop.fs.Path(genPath(g), d).toString -> Some(d) }
    val legacy = rootLevelDataFrom(entries).map { p =>
      if (p.getName.contains("=")) p.toString -> Some(p.getName)
      else cfg.location -> None // bare root-level parquet: no partition
    }.distinct
    dirs ++ legacy
  }

  /** [[scanRoots]]' FILE-level companion for the DSv2 format: for each
    * root whose (dir, generation) entry carries a sidecar-recorded file
    * manifest, the exact files to plan — keyed by the same root path
    * string scanRoots returns. Roots absent from the map (the current
    * generation tree, legacy data, pre-field sidecars) are listed by
    * the index as before. One sidecar read, no listing. */
  private[graft] def scanRootFiles(asOf: Option[Long]): Map[String, Seq[Lake.LiveFile]] = {
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = asOf match {
      case Some(v) => vacuumCheckedStateAt(v, fs, entries)
      case None => readStateFrom(fs, entries)
    }
    // never serve a manifest for a CURRENT-generation entry: that tree
    // is live-by-rule (appends land there without a commit), so only a
    // listing is truthful for it
    st.live.distinct.filter(_._2 != st.generation).flatMap { case e @ (d, g) =>
      st.liveFiles.get(e).map(fl =>
        new org.apache.hadoop.fs.Path(genPath(g), d).toString -> fl)
    }.toMap
  }

  /** The live data files as a frame — (file, partition, generation,
    * bytes, modified_ms), the capacity-planning / small-files view
    * behind the format's `option("view", "files")`. One root listing +
    * one LIST per live directory: O(live files) driver-side metadata,
    * the same order as [[validate]]'s skip check. Pre-v2/legacy
    * root-level data reports generation 0. */
  def filesView(): DataFrame = {
    import spark.implicits._
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = readStateFrom(fs, entries)
    def fileRows(dir: org.apache.hadoop.fs.Path, part: Option[String],
        gen: Long): Seq[(String, String, Long, Long, Long)] =
      if (!fs.exists(dir)) Nil
      else dataFilesIn(fs, dir).map(f => (f.getPath.toString, part.orNull,
        gen, f.getLen, f.getModificationTime))
    // pooled LISTs (the liveShardFiles posture): on an object store a
    // serial per-directory listing would pay O(live dirs) round trips
    val live = mapDirsPooled(liveEntries(st)) { (d, g) =>
      fileRows(new org.apache.hadoop.fs.Path(genPath(g), d),
        unescapePartitionValue(d.split("=", 2)(1)), g)
    }.flatten
    val legacy = rootLevelDataFrom(entries).flatMap { p =>
      if (p.getName.endsWith(".parquet"))
        // listRoot already fetched these statuses — reuse, no re-stat
        entries.find(_.getPath == p).toSeq.map(s =>
          (p.toString, null: String, 0L, s.getLen, s.getModificationTime))
      else fileRows(p, unescapePartitionValue(p.getName.split("=", 2)(1)), 0L)
    }
    (live ++ legacy)
      .toDF("file", "partition", "generation", "bytes", "modified_ms")
  }

  /** The commit log as a frame: one row per sidecar version still on
    * disk — (version, last_update, generation, live_dirs). The
    * versions are [[readAt]]'s input; the latest row is what [[read]]
    * serves. */
  def history(): DataFrame = {
    import spark.implicits._
    val fs = fsOfRoot
    metaVersions(fs).sortBy(_._1).map { case (v, p) =>
      val json = readFully(fs, p)
      val st = parseState(json)
      (v, stampFrom(json).getOrElse(""), st.generation, st.live.size.toLong,
        st.isSealed)
    }.toDF("version", "last_update", "generation", "live_dirs", "sealed")
  }

  /** The `last_update` stamp inside one sidecar's JSON. */
  private def stampFrom(json: String): Option[String] =
    """"last_update"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(json).map(_.group(1))

  /** The `last_update` stamp a specific sidecar version recorded — what
    * the change-feed source pins after a [[seal]] (reading the sealed
    * sidecar itself is immune to the re-read race where a writer lands
    * between the seal's lock release and a `lastUpdate()` call, which
    * would adopt the FOREIGN stamp as already-sealed and withhold its
    * delta). None once vacuum retires the version. */
  private[graft] def stampOfVersion(version: Long): Option[String] = {
    val fs = fsOfRoot
    metaVersions(fs).find(_._1 == version)
      .flatMap(vp => stampFrom(readFully(fs, vp._2)))
  }

  /** The newest SEALED sync point still on disk, with the
    * `last_update` stamp its commit recorded — the DURABLE resume point
    * for change-feed subscribers: a restarting subscriber whose lake
    * stamp still equals this seal's stamp adopts it instead of sealing
    * a fresh sync point (an in-memory idle detector resets on every
    * restart, and each spurious seal is a permanently-retained sidecar
    * until vacuum). Control-plane cost: reads sidecars newest-first
    * until the first sealed one. */
  def latestSealed(): Option[(Long, String)] = {
    val fs = fsOfRoot
    metaVersions(fs).sortBy(-_._1).view
      .map { case (v, p) => (v, readFully(fs, p)) }
      .collectFirst { case (v, json) if parseState(json).isSealed =>
        (v, stampFrom(json).getOrElse("")) }
  }

  /** The newest committed sidecar version — what [[read]] serves and
    * [[history]]'s last row; None before any write. */
  def currentVersion(): Option[Long] =
    metaVersions(fsOfRoot).map(_._1).maxOption

  /** True when the CURRENT generation is stream-owned (a Structured
    * Streaming sink's `_spark_metadata` manifest governs its file
    * visibility) — the layout [[seal]] refuses. Surfaced so the change
    * feed can refuse at SUBSCRIBE time with a clear error instead of
    * killing the stream on its first data-carrying trigger. */
  private[graft] def currentGenerationStreamOwned: Boolean =
    exists() && fsOfRoot.exists(new org.apache.hadoop.fs.Path(
      genPath(readState().generation), "_spark_metadata"))

  /** SEAL the live set — the change-feed SYNC POINT: one sidecar commit,
    * zero data movement, after which the sealed version denotes an
    * IMMUTABLE row set. The problem it solves: appends land inside the
    * current generation's tree below commit granularity, so an ordinary
    * version cannot tell "file present at my commit" from "file
    * appended after it". Sealing ROLLS the append target to a fresh
    * generation (every live directory keeps its existing location,
    * named in the manifest; the data path is untouched), so everything
    * the sealed version names is a directory no future write can add a
    * file to — the file-set diff of two sealed versions, or of a sealed
    * version against the current live set, is EXACT, which is what
    * [[changesSince]]/[[changesBetween]] ship. [[readAt]] of a sealed
    * version serves the frozen row set (later appends excluded — unlike
    * unsealed versions, whose whole-tree-live rule admits them).
    *
    * Cost: one sidecar write now; one extra union branch per seal on
    * later reads until a compact folds the generations back into one.
    * Sealed sidecars are exempt from the inline version rotation —
    * consumers hold sync points across arbitrarily many commits — and
    * are retired only by [[vacuum]] (pass `retainMs` to keep the
    * consumer window; a swept sync point fails loudly, never reads back
    * partial). Returns the sealed version number. */
  def seal(): Long = withWriterLock("seal") {
    routingChecked // seal re-stamps the sidecar: never under a foreign config
    requireWriteConfigMatch() // both directions — the stamp is authoritative
    val fs = fsOfRoot
    val st = readState()
    requireNoReshard(st, "seal")
    require(!fs.exists(new org.apache.hadoop.fs.Path(
      genPath(st.generation), "_spark_metadata")),
      s"refusing to seal ${cfg.location}: the current generation is a " +
        "streaming sink — its manifest governs file visibility, so a " +
        "physical freeze would misattribute uncommitted files; stop the " +
        "stream first")
    require(rootLevelData(fs).isEmpty,
      s"refusing to seal ${cfg.location}: root-level (pre-v2/foreign) data " +
        "present — the manifest does not govern it, so a sealed snapshot " +
        "could not name it; re-ingest into the generation layout first")
    if (treeHasData(fs, genPath(st.generation)))
      writeState(LakeState(nextGen(st), liveEntries(st), extraCols = st.extraCols), sealedCommit = true)
    else writeState(LakeState(st.generation, st.live, extraCols = st.extraCols), sealedCommit = true)
  }

  /** CHANGE FEED — every row the lake gained or lost since the sealed
    * sync point `version`, reading ONLY changed files: files in this
    * layout are immutable, never renamed, and deleted only by vacuum,
    * so (live files now) − (live files at the sync point) holds exactly
    * the inserted rows and the reverse difference exactly the removed
    * ones. The cost of a sync tracks what CHANGED, never lake size —
    * the incremental-consumer contract (downstream tokenizers, index
    * builds, embedding jobs) at 100 TB.
    *
    * `netted = true` (default) cancels rows identical on every stored
    * byte across the two sides — a row that merely moved files (a
    * compact, a rewrite's kept rows) vanishes, leaving the true
    * row-level delta: DELETE WHERE emits exactly the deleted rows,
    * upsert a delete+insert pair per replaced id, appends plain
    * inserts, and a pure compact nets to ZERO. The netting anti-joins
    * shuffle only changed-file rows. `netted = false` skips the joins
    * and reports raw file-level churn (cheaper; rewrites show their
    * kept rows on both sides).
    *
    * The upper side is the CURRENT live set (a racing in-flight append
    * may be partially visible, like any read — seal first and use
    * [[changesBetween]] for a fully reproducible delta). Fails loudly:
    * unknown version, a version that is not a [[seal]] sync point, or a
    * sync point whose directories vacuum already swept.
    *
    * @return changed rows with the stored columns plus
    *         `change ∈ {insert, delete}` */
  def changesSince(version: Long, netted: Boolean = true): DataFrame = {
    routingChecked
    val fs = fsOfRoot
    val entries = listRoot(fs)
    require(rootLevelDataFrom(entries).isEmpty,
      s"changesSince at ${cfg.location} refused: root-level (pre-v2/foreign) " +
        "data present — the manifest does not govern it")
    val stOld = stateAt(version, fs, entries)
    requireSealedSync(version, stOld)
    val stNew = readStateFrom(fs, entries)
    requireNoReshard(stNew, "changesSince")
    require(!fs.exists(new org.apache.hadoop.fs.Path(
      genPath(stNew.generation), "_spark_metadata")),
      s"changesSince at ${cfg.location} refused: the current generation is " +
        "a streaming sink — its manifest governs file visibility, so a " +
        "physical diff would count uncommitted files; stop the stream first")
    changeFrame(
      fileOwners(fs, stOld.live, s"changesSince($version)", stOld.liveFiles),
      fileOwners(fs, liveEntries(stNew), "changesSince: current state",
        stNew.liveFiles),
      netted, extraFieldsOf(stNew))
  }

  /** [[changesSince]] between TWO sealed sync points — both sides
    * immutable, so the delta is exactly reproducible until vacuum
    * retires either version: the replayable feed a scheduled downstream
    * sync wants (`seal()` each cycle, ship `changesBetween(prev, cur)`,
    * advance). Same columns, netting, cost shape, and loud-failure
    * contract as [[changesSince]]. */
  def changesBetween(fromVersion: Long, toVersion: Long,
      netted: Boolean = true): DataFrame = {
    require(fromVersion <= toVersion,
      s"changesBetween($fromVersion, $toVersion): from must not exceed to — " +
        "a swapped pair would return a plausible-looking INVERTED delta " +
        "(inserts reported as deletes) with no other symptom")
    routingChecked
    val fs = fsOfRoot
    val entries = listRoot(fs)
    require(rootLevelDataFrom(entries).isEmpty,
      s"changesBetween at ${cfg.location} refused: root-level (pre-v2/" +
        "foreign) data present — the manifest does not govern it")
    val stFrom = stateAt(fromVersion, fs, entries)
    requireSealedSync(fromVersion, stFrom)
    val stTo = stateAt(toVersion, fs, entries)
    requireSealedSync(toVersion, stTo)
    changeFrame(
      fileOwners(fs, stFrom.live, s"changesBetween($fromVersion, _)",
        stFrom.liveFiles),
      fileOwners(fs, stTo.live, s"changesBetween(_, $toVersion)",
        stTo.liveFiles),
      netted,
      // CURRENT extras (not either endpoint's): a replayed pre-evolve
      // batch then null-fills the new columns instead of changing shape
      extraFieldsOf(readStateFrom(fs, entries)))
  }

  /** State at a specific sidecar version, from an already-taken root
    * listing; throws for unknown/vacuumed versions (shared by
    * [[readAt]] and the change feed). */
  private def stateAt(version: Long, fs: org.apache.hadoop.fs.FileSystem,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): LakeState = {
    val versions = metaVersionsFrom(entries)
    val p = versions.collectFirst { case (v, path) if v == version => path }
      .getOrElse(throw new IllegalArgumentException(
        s"no sidecar version $version at ${cfg.location} (vacuumed, or never " +
          s"existed) — available: ${versions.map(_._1).sorted.mkString(", ")}"))
    parseState(readFully(fs, p))
  }

  private def requireSealedSync(version: Long, st: LakeState): Unit =
    if (!st.isSealed) throw new IllegalArgumentException(
      s"version $version at ${cfg.location} is not a sealed sync point — " +
        "its generation tree could receive appends after the commit, so a " +
        "file diff against it cannot attribute them; take change-feed sync " +
        "points with seal()")

  /** (path, length, escaped-dir-name) of every data file of a SEALED
    * sync point — the DSv2 change stream's file-level resolution:
    * lengths drive its input-partition packing, dir names carry the
    * shard partition value each file's rows serve. Same bounded-pool
    * listing and loud-on-vacuumed contract as [[fileOwners]]. */
  private[graft] def sealedFileStatuses(version: Long): Seq[(String, Long, String)] = {
    routingChecked
    val fs = fsOfRoot
    val entries = listRoot(fs)
    require(rootLevelDataFrom(entries).isEmpty,
      s"change stream at ${cfg.location} refused: root-level (pre-v2/" +
        "foreign) data present — the manifest does not govern it")
    val st = stateAt(version, fs, entries)
    requireSealedSync(version, st)
    // manifest-recorded entries serve name+length straight from the
    // sidecar (zero listing — the fileOwners posture, loudness moved
    // to the scan that opens the files); the rest pay one pooled LIST
    val (recorded, toList) = st.live.distinct.partition(st.liveFiles.contains)
    val served = recorded.flatMap { case e @ (d, g) =>
      val p = fs.makeQualified(new org.apache.hadoop.fs.Path(genPath(g), d))
      st.liveFiles(e).map(f =>
        (new org.apache.hadoop.fs.Path(p, f.name).toString, f.len, d))
    }
    served ++ mapDirsPooled(toList) { (d, g) =>
      val p = new org.apache.hadoop.fs.Path(genPath(g), d)
      try dataFilesIn(fs, p).map(s => (s.getPath.toString, s.getLen, d))
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"change stream at ${cfg.location}: live directory $p of " +
              s"version $version is no longer on disk — vacuum has swept " +
              "past this sync point (see vacuum(retainMs) for the " +
              "consumer window)")
      }
    }.flatten
  }

  /** Every data file of the given live (escaped-dir, generation)
    * entries, as file-path → owning generation. An entry the sidecar's
    * FILE-level manifest records is served straight from it — zero
    * listing (guide §6; sound because committed entries are immutable
    * until vacuum retires them wholesale); the rest pay one LIST per
    * directory from a bounded pool (the [[liveShardFiles]] object-store
    * discipline). A LISTED directory that is gone means vacuum swept
    * past the sync point — loud, never a partial delta; a
    * manifest-served entry vacuum swept fails equally loudly when the
    * delta scan opens its files (the [[readFileSlice]] cost contract:
    * only delta files are opened), never silently partial. */
  private def fileOwners(fs: org.apache.hadoop.fs.FileSystem,
      dirs: Seq[(String, Long)], context: String,
      manifest: Map[(String, Long), Seq[Lake.LiveFile]] = Map.empty): Map[String, Long] = {
    val (recorded, toList) = dirs.distinct.partition(manifest.contains)
    // QUALIFIED exactly as a listing would return them: [[changeFrame]]
    // diffs the two sides by path STRING, so a manifest-served
    // `/x/f.parquet` against a listed `file:/x/f.parquet` would report
    // the same file as both insert and delete
    val served = recorded.flatMap { case e @ (d, g) =>
      val p = fs.makeQualified(new org.apache.hadoop.fs.Path(genPath(g), d))
      manifest(e).map(f =>
        new org.apache.hadoop.fs.Path(p, f.name).toString -> g)
    }
    (served ++ mapDirsPooled(toList) { (d, g) =>
      val p = new org.apache.hadoop.fs.Path(genPath(g), d)
      try dataFilesIn(fs, p).map(_.getPath.toString -> g)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"$context at ${cfg.location}: live directory $p is no " +
              "longer on disk — vacuum has swept past this sync " +
              "point (see vacuum(retainMs) for the consumer window)")
      }
    }.flatten).toMap
  }

  /** Read an explicit file set with the canonical schema, one branch
    * per owning generation so partition values resolve against the
    * right basePath. Only these files are opened — the change feed's
    * cost contract. */
  private def readFileSlice(files: Map[String, Long],
      extras: Seq[StructField] = Nil): DataFrame = {
    val partType =
      if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType
    val full = StructType(
      (storedFields ++ extras) :+ StructField(partCol, partType))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    // pinned schema: parquet null-fills a requested column absent from
    // a pre-evolve file, so both change-feed sides share one shape
    files.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, fm) =>
      try spark.read.option("basePath", genPath(g).toString).schema(full)
        .parquet(fm.keys.toSeq.sorted: _*)
      catch {
        // a sidecar-recorded file gone from disk: the sync point's data
        // was vacuumed while its sealed sidecar lingered. Manifest-served
        // resolution performs no per-directory LIST, so this is where
        // the sweep becomes visible — translate to the same loud
        // contract the listing path threw, never a partial delta.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          throw new IllegalStateException(
            s"reading manifest-recorded data files at ${cfg.location}: a " +
              "recorded file is no longer on disk — vacuum has swept past " +
              "this sync point (see vacuum(retainMs) for the consumer " +
              "window)", e)
      }
    }.reduce(_ unionByName _)
  }

  /** Assemble the change frame from the two resolved file→generation
    * maps: rows of files only the new side holds are inserts, rows of
    * files only the old side holds are deletes; `netted` cancels
    * byte-identical rows across the two (metadata compared as sorted
    * entries — maps are not join keys). */
  private def changeFrame(oldFiles: Map[String, Long],
      newFiles: Map[String, Long], netted: Boolean,
      extras: Seq[StructField] = Nil): DataFrame = {
    val ins = readFileSlice(newFiles -- oldFiles.keySet, extras)
    val del = readFileSlice(oldFiles -- newFiles.keySet, extras)
    // the slice's own column order IS the output shape (stored cols,
    // extras, partition col) — netting keys derive from it so an
    // evolved column participates in row identity (an upsert changing
    // only an extra must NOT cancel)
    val sliceCols = ins.columns.toSeq
    if (!netted)
      ins.withColumn("change", lit("insert"))
        .unionByName(del.withColumn("change", lit("delete")))
        .select((sliceCols.map(col) :+ col("change")): _*)
    else Lake.netInsertsDeletes(ins, del)
  }

  private def readFrom(st: LakeState,
      rootEntries: Seq[org.apache.hadoop.fs.FileStatus]): DataFrame = {
    val partType =
      if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType
    val fs = fsOfRoot
    // ROUTING-WIDTH resolution (LSH lakes): a state written at a
    // NARROWER width than this session — a pre-reshard snapshot via
    // readAt, or the pending directories of an in-flight reshard —
    // serves its rows with the missing high hyperplane bits RE-DERIVED
    // per row (exact: planes are prefix-stable in the seeded sequence,
    // see Lsh.shardColFrom), so every read is width-uniform at the
    // session's width. A state WIDER than the session is refused
    // (requireStateWidth — bits cannot be un-derived). Steady-state
    // reads take the `entryBits >= cfg.numHashes` short-circuit: zero
    // added work. The transient cost is honest and self-shrinking:
    // pending branches lose directory pruning (the filter lands
    // post-derivation) until their reshard step completes. Note this
    // is deliberately LOOSER than requireStateWidth: a narrower state
    // is legal here (it derives up — that is what mid-reshard pending
    // sets and pre-reshard snapshots are), and a stale old-width
    // instance reading a resharded lake is still refused by the
    // wider-state require below.
    val stateBits: Int =
      if (cfg.partitionKey.isDefined) cfg.numHashes
      else st.reshard.map(_.toBits)
        .orElse(st.sidecarShards.filter(_ > 0)
          .map(ns => java.lang.Long.numberOfTrailingZeros(ns)))
        .getOrElse(cfg.numHashes)
    require(stateBits <= cfg.numHashes,
      s"read at ${cfg.location}: this snapshot was routed into " +
        s"${1L << stateBits} shards but the session's width is " +
        s"${lsh.numShards} — a wider snapshot cannot be served " +
        "narrower; construct the Lake at the snapshot's width")
    val reshardPending: Set[(String, Long)] =
      st.reshard.map(_.pending.toSet).getOrElse(Set.empty)
    def widen(df: DataFrame, entryBits: Int): DataFrame =
      if (cfg.partitionKey.isDefined || entryBits >= cfg.numHashes ||
          // foreign/legacy branches may lack the columns — pass them
          // through for the schema validation below to reject with
          // the full diff instead of failing on a missing reference
          !df.columns.contains(partCol) || !df.columns.contains("vector"))
        df
      else df.withColumn(partCol,
        (col(partCol) + lsh.shardColFrom(col("vector"), entryBits))
          .cast(IntegerType))
    // SCHEMA RESOLUTION, two regimes (round 11 — previously every
    // branch ran mergeSchema):
    //
    //  - MANIFEST-GOVERNED branches (generation trees) read with the
    //    SIDECAR-PINNED schema, zero footer I/O at plan time. The old
    //    posture merged every live footer ON EVERY READ to catch an
    //    out-of-contract foreign file — an O(live files) distributed
    //    planning job per query, which at object-store scale is the
    //    difference between millisecond and minute planning. The
    //    write path already guarantees the shape (one withDerived,
    //    requireWriteConfigMatch both directions), the SQL format has
    //    always served the pinned schema, and drift detection moved
    //    to [[validate]]'s `drift_cols` audit — the one place an
    //    O(files) footer sweep belongs. A foreign file inside a
    //    generation now reads null-padded/projected instead of
    //    failing the read; validate() convicts it.
    //  - The LEGACY/ROOT branch (pre-v2 flat lakes, foreign data
    //    dropped at the location) keeps mergeSchema + the final
    //    column-set validation below: that data is NOT
    //    manifest-governed, so a foreign schema must fail loudly
    //    with the full diff, never bootstrap silently.
    // the reference round-trips last_update (+ index attrs) through
    // file metadata readable off the frame (index.py:296-305) — the
    // pinned read keeps that surface by stamping the SIDECAR's attrs
    // onto the timestamp field (the sidecar is the canonical fast
    // path; with footer merging the surfaced stamp was whichever
    // file's footer won the merge, the sidecar's latest is strictly
    // better defined). The raw per-file footers still carry their
    // write-time stamps (FooterMetaSpec reads them with parquet-hadoop
    // directly).
    val pinnedFields = storedFieldsOf(st).map {
      case f if f.name == "timestamp" =>
        val md = new MetadataBuilder()
          .putString("graft.last_update", st.lastUpdate.getOrElse(""))
          .putLong("graft.dim", cfg.dim.toLong)
          .putString("graft.metric", cfg.metric)
          .build()
        f.copy(metadata = md)
      case f => f
    }
    def pinnedBranch(basePath: Option[String], paths: Seq[String]): DataFrame = {
      var r = spark.read.schema(
        StructType(pinnedFields :+ StructField(partCol, partType)))
      basePath.foreach(b => r = r.option("basePath", b))
      r.parquet(paths: _*)
    }
    def branch(basePath: Option[String], paths: Seq[String]): DataFrame = {
      var r = spark.read.option("mergeSchema", "true")
      basePath.foreach(b => r = r.option("basePath", b))
      // pin the partition column's type: a branch holding only the Hive
      // null-sentinel directory would otherwise infer a different type
      // and poison the union (cast is a no-op when types already agree,
      // so pruning literals still reach the scan). A foreign branch may
      // lack the column entirely — pass it through for the schema
      // validation below to reject with the full diff.
      val raw = r.parquet(paths: _*)
      if (raw.columns.contains(partCol))
        raw.withColumn(partCol, col(partCol).cast(partType))
      else raw
    }
    val cur = genPath(st.generation)
    // a SEALED state is manifest-only by contract ([[seal]]): its
    // generation tree was empty at commit, and anything in it NOW is a
    // later append (or an in-flight write racing this read) that the
    // sync point must not serve — the frozen-snapshot semantics the
    // change feed diffs against
    val curPresent = !st.isSealed && rootEntries.exists(s =>
      s.isDirectory && s.getPath.getName == cur.getName)
    // a stream-owned current generation is read with the CANONICAL
    // schema instead of footer inference: its `_spark_metadata`
    // manifest governs the file list, and between stream start and
    // batch 0's commit that list is legitimately EMPTY — inference
    // would throw "unable to infer schema" at a perfectly healthy
    // moment, where the truthful answer is an empty slice. The sink
    // writes exactly withDerived's columns, so no drift can hide here.
    val curSinkOwned = curPresent && fs.exists(
      new org.apache.hadoop.fs.Path(cur, "_spark_metadata"))
    val curBranch =
      if (curPresent && treeHasData(fs, cur, knownExists = true))
        Seq(widen(
          if (curSinkOwned)
            spark.read
              .schema(StructType(pinnedFields :+ StructField(partCol, partType)))
              .parquet(cur.toString)
          else pinnedBranch(None, Seq(cur.toString)), stateBits))
      else Nil
    // older-generation branches split by reshard membership: pending
    // entries were routed at the reshard's FROM width and re-derive
    // the missing bits; everything else is at the state's width
    // (mid-reshard, that is the target width — completed steps and
    // post-transition appends). A branch whose every entry carries a
    // FILE-level manifest (recorded at commit) is planned straight
    // from the sidecar — zero listStatus against the data tree
    // ([[graft.sources.GraftManifestFileIndex]], guide §6); entries
    // predating the field fall back to the listing read, branch by
    // branch.
    val oldBranches = st.live.filter(_._2 != st.generation)
      .groupBy(e => (e._2, reshardPending.contains(e)))
      .toSeq.sortBy(_._1).map { case ((g, isPending), entries) =>
        val base = genPath(g)
        val dirs = entries.distinct
        val branchDf =
          if (dirs.forall(st.liveFiles.contains)) {
            val qBase = fs.makeQualified(base)
            graft.sources.GraftManifestFileIndex.frame(spark,
              StructType(pinnedFields), StructField(partCol, partType),
              dirs.map { case e @ (d, _) =>
                val dir = new org.apache.hadoop.fs.Path(qBase, d)
                (dir,
                  graft.sources.GraftDataSource.partValue(Some(d), partType),
                  st.liveFiles(e).map(f => graft.sources
                    .GraftManifestFileIndex.status(dir, f.name, f.len, f.mod))
                    .toArray)
              })
          } else pinnedBranch(Some(base.toString),
            dirs.map(_._1).distinct
              .map(d => new org.apache.hadoop.fs.Path(base, d).toString))
        widen(branchDf,
          if (isPending) st.reshard.get.fromBits else stateBits)
      }
    // pre-v2 flat tree or foreign data at the root: a dedicated branch,
    // so legacy lakes stay readable and foreign schemas fail validation
    val rootData = rootLevelDataFrom(rootEntries)
    val legacyBranch =
      if (rootData.isEmpty) Nil
      else Seq(widen(branch(Some(cfg.location), rootData.map(_.toString)),
        stateBits))
    // SCHEMA EVOLUTION null-fill: a branch whose generations predate an
    // evolve() lacks the registered extras — pad with typed nulls so
    // the union holds one shape. Only REGISTERED columns are padded;
    // a foreign column still fails the validation below.
    def pad(df: DataFrame): DataFrame =
      extraFieldsOf(st).filterNot(f => df.columns.contains(f.name))
        .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val branches = (curBranch ++ oldBranches ++ legacyBranch).map(pad)
    if (branches.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(pinnedFields :+ StructField(partCol, partType)))
    val df = branches.reduce(_ unionByName _)
    val got = df.columns.toSet
    val want = storedColsOf(st).toSet + partCol
    require(got == want, s"schema mismatch: got $got want $want")
    df
  }

  private def distCol(q: Seq[Double]): Column = cfg.metric match {
    case "cosine" => V.cosineDist(col("vector"), V.vecLit(q))
    case "l2"     => V.l2Dist(col("vector"), V.vecLit(q))
    case "dot"    => -V.dot(col("vector"), V.vecLit(q)) // nearest = max dot
  }

  /** Pair-distance under `cfg.metric` for a scored row holding
    * (vec, nrm) against a joined query holding (qvec, qnrm) — the ONE
    * definition every batch/stream serve path shares ([[topKBatch]],
    * [[topKBatchRouted]], [[topKStream]], [[topKStreamRouted]],
    * [[topKStreamExpiring]]); a metric addition or guard fix lands in
    * all of them at once. Cosine goes through the zero-norm-guarded
    * precomputed-norms kernel (one degenerate row must not ANSI-fail
    * the scan); round6z at the call sites keeps self-pair dist +0.0. */
  private def pairDist: Column = cfg.metric match {
    case "cosine" => lit(1.0) -
      V.cosineSimPre(V.dot(col("vec"), col("qvec")), col("nrm"), col("qnrm"))
    case "l2"  => V.l2Dist(col("vec"), col("qvec"))
    case "dot" => -V.dot(col("vec"), col("qvec")) // nearest = max dot
  }

  /** The shared batch tail: bounded-heap top-k per qid, exploded to
    * (qid, rank, id, dist) rows. */
  private def batchTopKTail(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("id")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("id"), col("p.dist").as("dist"))
      .orderBy("qid", "rank")

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
    val probes = probeShards(q, 1 + cfg.numHashes)
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
    if (queries.isEmpty) return emptyBatchResult
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
      .select(col("qid"), col("qvec"), V.l2Norm(col("qvec")).as("qnrm"))
    batchTopKTail(
      read()
        .select(col("id"), V.asDouble(col("vector")).as("vec"),
          V.l2Norm(col("vector")).as("nrm"))
        .crossJoin(broadcast(qdf))
        .select(col("qid"), col("id"), V.round6z(pairDist).as("dist")),
      k)
  }

  /** The empty (qid, rank, id, dist) frame — the batch-kNN result shape
    * with no rows; the zero-query answer (an `isin()` with zero operands
    * or a zero-row broadcast side is an untested edge on the serving
    * path, so empty batches short-circuit here instead). */
  private def emptyBatchResult: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("qid", LongType), StructField("rank", IntegerType),
        StructField("id", StringType), StructField("dist", DoubleType))))

  /** A query's probe sequence, nearest-first: its routed shard, then the
    * `numHashes` Hamming-distance-1 neighbors in bit order — the same
    * ladder [[topKMultiProbe]] climbs all the way up. `nprobe` takes a
    * prefix: 1 = single-probe ([[topK]]'s recall contract),
    * 1 + numHashes = the full Hamming≤1 ball ([[topKMultiProbe]]'s). */
  private def probeShards(qv: Seq[Double], nprobe: Int): Seq[Int] = {
    val routed = lsh.shardOf(qv)
    (routed +: (0 until cfg.numHashes).map(j => routed ^ (1 << j))).take(nprobe)
  }

  private def requireNprobe(nprobe: Int): Unit =
    require(nprobe >= 1 && nprobe <= 1 + cfg.numHashes,
      s"nprobe must be in [1, ${1 + cfg.numHashes}] (routed shard + one " +
        s"flip per hyperplane); got $nprobe")

  /** [[topKBatch]] with per-query LSH routing — the batch shape that
    * survives 100 TB. Two cuts over the plain batch scan:
    *
    *  1. the scan prunes to the UNION of the queries' probed shard
    *     directories (a literal IN predicate resolved at planning —
    *     a 100-query batch touches ≤ 100·nprobe of 2^numHashes
    *     directories);
    *  2. the broadcast join is an EQUI-join on shard, so each row
    *     meets only the queries probing its shard —
    *     Σ_s rows_s × queries_probing_s distance evaluations instead
    *     of the cross join's rows × queries.
    *
    * `nprobe` is the recall/cost dial ([[probeShards]]): the default 1
    * keeps [[topK]]'s single-probe contract per query (a query routed
    * to an empty shard returns no rows, exactly like topK);
    * `1 + cfg.numHashes` gives exactly [[topKMultiProbe]]'s Hamming≤1
    * recall, still as ONE scan for the whole batch — the equi-join
    * shape is unchanged, the broadcast side just carries nprobe rows
    * per query. Returns (qid, rank, id, dist). */
  def topKBatchRouted(queries: Seq[(Long, Seq[Double])], k: Int,
      nprobe: Int = 1): DataFrame = {
    require(cfg.partitionKey.isEmpty,
      "topKBatchRouted routes by the LSH shard column — a user-partitioned " +
        "lake has no LSH routing; use topKBatch")
    requireNprobe(nprobe)
    if (queries.isEmpty) return emptyBatchResult
    import spark.implicits._
    val probed = for {
      (qid, qv) <- queries
      shard <- probeShards(qv, nprobe)
    } yield (qid, qv, shard)
    val qdf = probed.toDF("qid", "qvec", "qshard")
      .select(col("qid"), col("qvec"), col("qshard"),
        V.l2Norm(col("qvec")).as("qnrm"))
    val shards = probed.map(_._3).distinct
    batchTopKTail(
      read()
        .where(col(partCol).isin(shards: _*))
        .select(col("id"), col(partCol),
          V.asDouble(col("vector")).as("vec"), V.l2Norm(col("vector")).as("nrm"))
        .join(broadcast(qdf), col(partCol) === col("qshard"))
        .select(col("qid"), col("id"), V.round6z(pairDist).as("dist")),
      k)
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
    * STATE-LIFECYCLE CONTRACT: state here is bounded per id but keyed
    * by qid FOREVER — over an unbounded stream of distinct ids it
    * grows with the id universe. Right for a bounded/recycled id space
    * (session ids, tenant slots); for open-ended id streams use
    * [[topKStreamExpiring]], which retires an id's state once it has
    * been idle past an event-time TTL.
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
    // a literal equi-key instead of crossJoin: stream-static INNER
    // equi-joins are supported by the streaming planner, cross joins
    // are not — same plan (broadcast the 1-key side), same rows
    q.join(lakeV, col("__jq") === col("__j"))
      .select(col("qid"), col("id"), V.round6z(pairDist).as("dist"))
      .groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("id")), k).as("top"))
  }

  /** [[topKStream]] with per-query LSH routing — the serve-path twin of
    * [[topKBatchRouted]]: the stream-static join becomes an EQUI-join
    * on the shard value. The static side carries its stored shard
    * column; each incoming query derives `shardOf(qvec)` through the
    * same hyperplane expression ingest routes with, so a micro-batch's
    * queries pair only with the lake rows of their routed shards —
    * Σ_s rows_s × queries_s distance evaluations, never
    * rows × queries. The static side remains the whole-lake plan (its
    * file listing froze at plan time; partition pruning cannot follow a
    * per-batch dynamic key), so the cut is pairing count and shuffle
    * volume, and the join gets a real equi-key to hash on instead of
    * the degenerate single-key join. `nprobe` is the same recall/cost
    * dial as [[topKBatchRouted]]'s, derived IN THE PLAN: the probe
    * ladder (routed shard, then each single-bit flip) is a literal
    * array expression over the routed value, sliced to nprobe and
    * exploded — each query becomes nprobe probe rows on the stream
    * side, the equi-join shape unchanged. Default 1 keeps [[topK]]'s
    * single-probe contract per query (a query routed to an empty shard
    * emits no row); 1 + numHashes gives [[topKMultiProbe]]'s Hamming≤1
    * recall. State stays the bounded per-qid heap (≤ k rows) — probes
    * of one qid merge into one heap; compose with
    * [[topKStreamExpiring]]'s ttl semantics by watermarking upstream if
    * the id space is open-ended. */
  def topKStreamRouted(queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    require(cfg.partitionKey.isEmpty,
      "topKStreamRouted routes by the LSH shard column — a " +
        "user-partitioned lake has no LSH routing; use topKStream")
    requireNprobe(nprobe)
    val lakeV = read().select(
      col("id"), V.asDouble(col("vector")).as("vec"),
      V.l2Norm(col("vector")).as("nrm"), col(partCol))
    val probeLadder = array(
      (col("__routed") +:
        (0 until cfg.numHashes).map(j => col("__routed").bitwiseXOR(lit(1 << j)))): _*)
    val q = queries.select(col("qid"),
      col("qvec").cast(ArrayType(DoubleType)).as("qvec"))
      .withColumn("qnrm", V.l2Norm(col("qvec")))
      .withColumn("__routed", lsh.shardCol(col("qvec")))
      .withColumn("qshard", explode(slice(probeLadder, 1, nprobe)))
      .drop("__routed")
    q.join(lakeV, col("qshard") === col(partCol))
      .select(col("qid"), col("id"), V.round6z(pairDist).as("dist"))
      .groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("id")), k).as("top"))
  }

  /** [[topKStream]] with a STATE LIFECYCLE: per-query state (≤ k rows)
    * is dropped once the query id has been idle past `ttl` of EVENT
    * time — over an unbounded stream of distinct query ids, plain
    * [[topKStream]]'s state grows with the id universe forever, while
    * this variant's state is bounded by the LIVE query set (ids seen
    * within the ttl window). Queries carry an event-time column
    * `qtime`; `watermarkDelay` is the usual lateness allowance, and
    * expiry advances with the watermark — deterministic under
    * replay/backfill, no wall-clock coupling. Late refinements of a
    * live qid still merge into its bounded heap (update semantics,
    * like topKStream); a refinement arriving AFTER its id expired
    * starts a fresh heap over that micro-batch's scan, the only
    * honest answer once the old state is gone.
    *
    * @param queries streaming frame with (qid: long, qvec: array,
    *        qtime: timestamp)
    * @return streaming frame (qid, top: array<struct<dist,id>>),
    *         update output mode */
  def topKStreamExpiring(queries: DataFrame, k: Int,
      ttl: java.time.Duration,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
    import spark.implicits._
    val lakeV = read().select(
      col("id"), V.asDouble(col("vector")).as("vec"),
      V.l2Norm(col("vector")).as("nrm"), lit(1).as("__j"))
    val q = queries
      .withWatermark("qtime", watermarkDelay)
      .select(col("qid"), col("qtime"),
        col("qvec").cast(ArrayType(DoubleType)).as("qvec"),
        lit(1).as("__jq"))
      .withColumn("qnrm", V.l2Norm(col("qvec")))
    val scored = q.join(lakeV, col("__jq") === col("__j"))
      .select(col("qid"), col("qtime"), col("id"), V.round6z(pairDist).as("dist"))
      .as[(Long, java.sql.Timestamp, String, Double)]
    val ttlMs = ttl.toMillis
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[TopKServeState, (Long, Seq[(Double, String)])](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (qid: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Double)],
            state: GroupState[TopKServeState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var maxEvent = Long.MinValue
            val incoming = rows.map { case (_, t, id, d) =>
              if (t.getTime > maxEvent) maxEvent = t.getTime
              (d, id)
            }.toSeq
            // bounded merge: old heap ∪ new scores, keep the k best —
            // state never exceeds k entries per live qid
            val prev = state.getOption
            val merged = (prev.map(_.top).getOrElse(Nil) ++ incoming)
              .sortBy { case (d, id) => (d, id) }.take(k)
            // idle-expiry clock: the deadline only ever moves FORWARD
            // (a late-but-admitted refinement carries an OLDER event
            // time — recomputing from it alone would pull the deadline
            // back and expire the id early), floored above the current
            // watermark (Spark requires a future timestamp)
            val deadline = math.max(
              prev.map(_.deadlineMs).getOrElse(Long.MinValue),
              maxEvent + ttlMs)
            state.update(TopKServeState(merged, deadline))
            state.setTimeoutTimestamp(
              math.max(deadline, state.getCurrentWatermarkMs() + 1))
            Iterator.single(qid -> merged)
          }
      }
      .toDF("qid", "top")
      // tuple encoding names the struct fields _1/_2 — present the same
      // (dist, id) shape as topKStream
      .select(col("qid"), transform(col("top"),
        e => struct(e("_1").as("dist"), e("_2").as("id"))).as("top"))
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
  def topKPq(q: Seq[Double], k: Int, coarseK: Int = 100): DataFrame =
    topKPqWhere("topKPq", q, k, coarseK, lit(true))

  /** [[topKPq]] with LSH shard pruning composed in — the full serving
    * stack a 100 TB ANN deployment actually runs, each stage cutting
    * what the next one reads:
    *
    *  1. ROUTE: a literal shard predicate prunes partition directories
    *     at planning — the candidate universe shrinks to 1 (or
    *     1+numHashes under `multiProbe`) of 2^numHashes shards before
    *     a single byte is read;
    *  2. COARSE: the ADC scan inside the routed shards reads only
    *     (id, pq_code) — 8 stored bytes of vector data per row;
    *  3. RERANK: full-precision vectors are touched for ≤ `coarseK`
    *     rows, also only inside the routed shards.
    *
    * Recall dials: `multiProbe` (widens stage 1 to the routed shard's
    * Hamming-distance-1 neighbors — 1+numHashes of 2^numHashes shards,
    * the [[topKMultiProbe]] trade; never the whole lake) and `coarseK`
    * (widens stage 3). With `coarseK` ≥ rows the result reduces to
    * EXACT retrieval over the probed shard set — single-probe that is
    * [[topK]]'s answer, multiprobe [[topKMultiProbe]]'s; PqSpec pins
    * the single-probe contract. */
  def topKPqRouted(q: Seq[Double], k: Int, coarseK: Int = 100,
      multiProbe: Boolean = false): DataFrame = {
    require(cfg.partitionKey.isEmpty,
      "topKPqRouted routes by the LSH shard column — a user-partitioned " +
        "lake has no LSH routing; use topKPq (full scan) or topKFiltered")
    val routed = lsh.shardOf(q)
    val probes =
      if (multiProbe) routed +: (0 until cfg.numHashes).map(j => routed ^ (1 << j))
      else Seq(routed)
    topKPqWhere("topKPqRouted", q, k, coarseK, col(partCol).isin(probes: _*))
  }

  private def topKPqWhere(op: String, q: Seq[Double], k: Int, coarseK: Int,
      pred: Column): DataFrame = {
    val model = cfg.pqCodebooks.getOrElse(throw new IllegalArgumentException(
      s"$op needs a materialized pq_code column: set pqCodebooks = Some(model)"))
    requirePqModelMatch() // stored codes must be this model's codes
    val adc = (0 until model.m).map { mi =>
      element_at(V.vecLit(model.lutFor(q, mi)),
        (shiftright(col("pq_code"), 8 * mi).bitwiseAND(lit(255)) + 1).cast("int"))
    }.reduce(_ + _)
    val coarse = read()
      .where(pred)
      .select(col("id"), adc.as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(coarseK)
      .select("id")
    read()
      .where(pred) // the rerank never reads outside the routed shards either
      .join(broadcast(coarse), Seq("id"))
      .withColumn("dist", V.round6z(distCol(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)
  }

  private def topKWhere(q: Seq[Double], k: Int, pred: Column): DataFrame =
    topKOver(read().where(pred), q, k)

  /** The one scoring tail every exact serve path shares (metric via
    * `distCol`, round-6 floats, (dist, id) total order, heap top-k) —
    * a tiebreak or rounding change here lands everywhere at once. */
  private def topKOver(base: DataFrame, q: Seq[Double], k: Int): DataFrame =
    base
      .withColumn("dist", V.round6z(distCol(q)))
      .orderBy(col("dist"), col("id"))
      .limit(k)

  // ---- recall-targeted dial selection --------------------------------

  private def recallPath: org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(cfg.location, "_recall")

  @volatile private var recallCalibCache: Option[Seq[Double]] = None

  /** CALIBRATE the multiprobe recall ladder so [[topKAtRecall]] can
    * pick `nprobe` for a TARGET instead of the user guessing blind.
    * One distributed pass: a deterministic sample of the lake's own
    * vectors (smallest `xxhash64(id)` — stable across sessions) is
    * broadcast as queries, the EXACT top-k per query is computed with
    * the bounded-heap aggregate carrying each hit's stored shard, and
    * recall at every nprobe level falls out of shard membership alone
    * — a hit in the first n probe shards IS returned by the n-probe
    * search (it outranks everything there by definition), so no pruned
    * query ever needs to run. Cost: ONE exact batch scan for ALL
    * ladder levels. Self-hit bias: each sampled query's own row hits
    * at nprobe 1, inflating measured recall by ≤ 1/k — calibrate with
    * the k you will serve. The result is persisted like the IVF/PQ
    * models (root sibling `_recall/calib.json`, tmp+rename swap,
    * stamped with the routing fingerprint and the lake's
    * `last_update`), so one calibration serves every later session;
    * data drift since the stamp shifts true recall — re-run on
    * maintenance cadence. Returns recall per nprobe (index 0 =
    * nprobe 1). */
  def calibrateRecall(k: Int = 20, sampleQueries: Int = 32): Seq[Double] = {
    require(cfg.partitionKey.isEmpty,
      "calibrateRecall needs LSH routing (user-keyed lakes have no probe ladder)")
    require(k >= 1 && sampleQueries >= 1, "calibrateRecall: k, sampleQueries >= 1")
    import spark.implicits._
    val base = read().select(col("id"), col("vector"), col(partCol))
    val sampled = base
      .select(col("id"), V.asDouble(col("vector")).as("qv"))
      .orderBy(abs(xxhash64(col("id"))), col("id"))
      .limit(sampleQueries)
      .collect() // bounded: sampleQueries rows
      .map(r => r.getAs[scala.collection.Seq[Double]]("qv").toSeq)
    require(sampled.nonEmpty, s"calibrateRecall at ${cfg.location}: empty lake")
    val qdf = broadcast(sampled.toSeq.zipWithIndex
      .map { case (qv, i) => (i.toLong, qv) }.toDF("qid", "qvec")
      .select(col("qid"), col("qvec"), V.l2Norm(col("qvec")).as("qnrm")))
    // exact per-query top-k, each hit tagged "shard:id" (the heap pair's
    // id slot is a string — carry the shard through it)
    val hits = base
      .select(col("id"), col(partCol),
        V.asDouble(col("vector")).as("vec"), V.l2Norm(col("vector")).as("nrm"))
      .crossJoin(qdf)
      .select(col("qid"), V.round6z(pairDist).as("dist"),
        concat_ws(":", col(partCol), col("id")).as("tag"))
      .groupBy("qid")
      .agg(graft.expressions.TopKAggregate.topK(struct(col("dist"), col("tag")), k).as("top"))
      .select(col("qid"), col("top"))
      .collect() // bounded: sampleQueries rows of <= k pairs
      .map(r => r.getLong(0).toInt ->
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
          .map(_.getString(1).split(":", 2)(0).toInt).toSeq)
      .toMap
    val maxN = 1 + cfg.numHashes
    val recalls = (1 to maxN).map { n =>
      val per = sampled.indices.flatMap { i =>
        hits.get(i).filter(_.nonEmpty).map { shards =>
          val probes = probeShards(sampled(i), n).toSet
          shards.count(probes).toDouble / shards.size
        }
      }
      per.sum / per.size
    }
    // persist like the IVF/PQ models: tmp + rename swap of a one-file
    // sidecar dir, fingerprinted against the routing config
    val fs = fsOfRoot
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_recall__tmp_${java.util.UUID.randomUUID()}")
    fs.mkdirs(tmp)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "calib.json"), false)
    try out.write(
      (s"""{"dim": ${cfg.dim}, "num_hashes": ${cfg.numHashes}, """ +
        s""""lsh_seed": ${cfg.seed}, "metric": "${cfg.metric}", """ +
        s""""k": $k, "sample": ${sampled.size}, """ +
        s""""stamp": "${lastUpdate().getOrElse("")}", """ +
        // the live data volume at calibration time — the cheap drift
        // denominator [[recallCalibStale]] compares against (metadata
        // listing only, no scan)
        s""""bytes": ${liveDataBytes()}, """ +
        s""""recalls": [${recalls.mkString(", ")}]}""").getBytes("UTF-8"))
    finally out.close()
    fs.delete(recallPath, true)
    fs.rename(tmp, recallPath)
    recallCalibCache = Some(recalls)
    recalls
  }

  /** Total bytes of live data files — the calibration-drift
    * denominator. Pure metadata (pooled LISTs over live directories,
    * the filesView posture); never opens a file. */
  private def liveDataBytes(): Long = {
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = readStateFrom(fs, entries)
    val live = mapDirsPooled(liveEntries(st)) { (d, g) =>
      val p = new org.apache.hadoop.fs.Path(genPath(g), d)
      if (!fs.exists(p)) Nil else dataFilesIn(fs, p).map(_.getLen)
    }.flatten.sum
    // legacy root-level data: a directory's own FileStatus length is
    // meaningless — branch on shape like filesView, never entries.find
    // (whose hit would report the dir entry's ~0 length for gigabytes
    // of pre-v2 partition data)
    val legacy = rootLevelDataFrom(entries).map { p =>
      if (p.getName.endsWith(".parquet"))
        entries.find(_.getPath == p).map(_.getLen).getOrElse(0L)
      else if (fs.exists(p)) dataFilesIn(fs, p).map(_.getLen).sum
      else 0L
    }.sum
    live + legacy
  }

  /** STALENESS of the persisted recall calibration — the policy that
    * decides when churn has invalidated the ladder ([[maintain]] is
    * the consumer; it re-calibrates exactly when this says so):
    *
    *  - None: no calibration persisted (nothing to be stale).
    *  - Some(false): FRESH — the lake's `last_update` change token
    *    still equals the one the calibration recorded (nothing at all
    *    changed: one sidecar read, the fast path), OR the token moved
    *    but the live data VOLUME drifted less than `drift` (default
    *    50%) from the calibrated volume — small appends and pure
    *    rewrites shift shard-membership distributions far too little
    *    to move a ladder measured over a vector sample.
    *  - Some(true): STALE — the volume drifted past the threshold
    *    (mass ingest/delete since calibration: the sampled queries and
    *    the shard distribution no longer describe this lake), or the
    *    token moved and the calibration predates volume recording.
    *
    * Cost: one sidecar read on the fresh-token path; one metadata
    * listing otherwise. Never a data scan. [[topKAtRecall]] keeps
    * serving under a stale ladder (its fallback contract is unchanged
    * and re-calibration is a write-path job, not something a read
    * should trigger) — staleness is a MAINTENANCE signal. */
  private[graft] def recallCalibStale(drift: Double = 0.5): Option[Boolean] = {
    val fs = fsOfRoot
    val p = new org.apache.hadoop.fs.Path(recallPath, "calib.json")
    if (!fs.exists(p)) return None
    val json = readFully(fs, p)
    val stamp = """"stamp"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    if (stamp.nonEmpty && lastUpdate().contains(stamp)) return Some(false)
    val calibBytes = """"bytes"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
    calibBytes match {
      case None => Some(true) // pre-volume artifact + moved token: recalibrate once
      case Some(b0) =>
        Some(math.abs(liveDataBytes() - b0).toDouble >
          drift * math.max(b0, 1L).toDouble)
    }
  }

  /** The (k, sampleQueries) the persisted calibration was measured
    * with — what a policy-driven re-calibration must reuse (a refresh
    * that silently changed k would move the ladder's self-hit bias). */
  private def recallCalibParams(): Option[(Int, Int)] = {
    val fs = fsOfRoot
    val p = new org.apache.hadoop.fs.Path(recallPath, "calib.json")
    if (!fs.exists(p)) return None
    val json = readFully(fs, p)
    def num(name: String): Option[Int] =
      (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(json)
        .map(_.group(1).toInt)
    for (k <- num("k"); s <- num("sample")) yield (k, s)
  }

  /** The persisted calibration, refused loudly when its routing
    * fingerprint differs from this session's config (a ladder measured
    * under foreign hyperplanes says nothing about ours). */
  private def loadRecallCalib(): Option[Seq[Double]] = {
    if (recallCalibCache.isDefined) return recallCalibCache
    val fs = fsOfRoot
    val p = new org.apache.hadoop.fs.Path(recallPath, "calib.json")
    if (!fs.exists(p)) return None
    val json = readFully(fs, p)
    def num(name: String): Option[Double] =
      (s""""$name"\\s*:\\s*(-?[\\d.eE+-]+)""").r.findFirstMatchIn(json)
        .map(_.group(1).toDouble)
    Seq(("dim", cfg.dim.toDouble), ("num_hashes", cfg.numHashes.toDouble),
      ("lsh_seed", cfg.seed.toDouble)).foreach { case (n, want) =>
      num(n).foreach(got => require(got == want,
        s"recall calibration at ${cfg.location} was measured under $n=" +
          s"${got.toLong} but this session uses ${want.toLong} — " +
          "re-run calibrateRecall() under the writer's config"))
    }
    // the ladder is metric-specific too: which shards hold a query's
    // true top-k depends on the distance ranking, so a cosine-measured
    // ladder says nothing about l2 serving
    ("\"metric\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
      .map(_.group(1)).foreach(got => require(got == cfg.metric,
        s"recall calibration at ${cfg.location} was measured under " +
          s"metric=$got but this session uses ${cfg.metric} — " +
          "re-run calibrateRecall() under the serving metric"))
    val rs = """"recalls"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.toDouble).toSeq)
    recallCalibCache = rs
    rs
  }

  /** RECALL-TARGETED kNN: serve `q` at the cheapest `nprobe` whose
    * CALIBRATED recall meets `targetRecall` — the dial-picking layer
    * over [[topK]]/[[topKMultiProbe]] (SURVEY §2.3's dials exist; this
    * chooses one). Needs one prior [[calibrateRecall]] (persisted —
    * any session after it just loads). A target the full Hamming-1
    * ladder cannot reach falls back to the EXACT scan — recall 1.0 by
    * construction, never a silent miss of the promise. Returns the
    * usual (row..., dist) top-k frame. */
  def topKAtRecall(q: Seq[Double], k: Int, targetRecall: Double): DataFrame = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1]; got $targetRecall")
    val recalls = loadRecallCalib().getOrElse(throw new IllegalStateException(
      s"topKAtRecall at ${cfg.location}: no calibration found — run " +
        "calibrateRecall() once (it persists in _recall/ for every " +
        "later session)"))
    val idx = recalls.indexWhere(_ >= targetRecall)
    if (idx < 0) topKExact(q, k)
    else topKWhere(q, k, col(partCol).isin(probeShards(q, idx + 1): _*))
  }

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

  /** A nested metadata field, read out of the opaque `"_json"` slot a
    * `metadata_json` ingest column stored ([[ingest]] scaladoc): pass a
    * dotted path (`"origin.source"`) or a full JsonPath (`"$.a.b"`).
    * Returns the value as a string column (null when absent) —
    * `get_json_object`, codegen'd, usable in filters/groupings/
    * projections like any column. Numeric fields: `.cast("long")` etc.
    * at the call site. */
  def metadataField(path: String): Column = {
    val p = if (path.startsWith("$")) path else "$." + path
    get_json_object(metadataJson, p)
  }

  /** The raw nested-metadata JSON document (null for rows ingested
    * without `metadata_json`). */
  def metadataJson: Column = col("metadata").getItem("_json")

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
    * each output file is whole, then the new generation is committed
    * with one sidecar create. For the targeted variant that skips
    * already-clean shards, see [[compactIncremental]].
    *
    * This is the maintenance operation the reference cannot express —
    * its sync already rewrites EVERY segment file on EVERY persist
    * (index.py:294-308); here rewriting is explicit, sized, and
    * distributed (one shuffle, no driver-side data).
    *
    * Refuses to touch a lake with a Structured Streaming `_spark_metadata`
    * sink log: the sink's manifest names the original files, and a
    * rewrite would silently orphan them — stop the stream and rename
    * the log away first (or read through a new location).
    *
    * Atomicity (layout v2): the rewrite lands in a NEW generation tree
    * and the COMMIT is one sidecar create — readers resolve their paths
    * from one sidecar version and nothing here deletes or renames a
    * byte of the old generation, so a reader racing compact sees either
    * the old tree or the new one, never a missing or half-swapped
    * directory (object-store safe: no rename anywhere). Dead
    * generations stay on disk until an operator-invoked [[vacuum]] —
    * the same retention posture as any log-structured table format.
    *
    * @param clusterBy optional clustering expressions (e.g. a timestamp,
    *        or a [[graft.operators.ZOrder]] interleave over metadata
    *        columns) — the OPTIMIZE-ZORDER analog, at two granularities:
    *        files are RANGE-SLICED over (shard, clusterBy) so each
    *        rewritten file covers one contiguous key band (the per-file
    *        `_zone` map keeps pruning after the rewrite — hash slicing
    *        would hand every file the shard's whole key range and undo
    *        time-correlated ingest's natural banding), and rows inside
    *        each file are locally sorted (parquet row-group stats
    *        tighten). Pure layout change: rows and routing untouched;
    *        file sizing still tracks `targetBytes` through the range
    *        sampler's row balancing.
    * @return number of data files after compaction */
  def compact(targetBytes: Long = 128L * 1024L * 1024L,
      clusterBy: Seq[Column] = Nil): Long = {
    if (!exists()) return 0L
    requireWriteConfigMatch() // a rewrite under a lesser config would strip columns
    withWriterLock("compact")(compactImpl(targetBytes, clusterBy))
  }

  /** INCREMENTAL compact: rewrite only the shards whose file count
    * exceeds what their bytes justify under `targetBytes` (with
    * `maxFilesPerShard` slack below which a shard is never worth
    * touching). Clean directories are not read, not rewritten, and stay
    * BIT-IDENTICAL — at 100 TB this is the difference between a
    * maintenance cycle costing O(dirty shards) and [[compact]]'s
    * full-table rewrite. Same commit protocol as every other rewrite
    * (new generation + one sidecar create). Returns the number of
    * shards rewritten. */
  def compactIncremental(targetBytes: Long = 128L * 1024L * 1024L,
      clusterBy: Seq[Column] = Nil, maxFilesPerShard: Int = 4): Long = {
    if (!exists()) return 0L
    requireWriteConfigMatch() // a rewrite under a lesser config would strip columns
    withWriterLock("compactIncremental") {
      val fs = fsOfRoot
      val st = readState()
      requireNoReshard(st, "compactIncremental")
      // per-shard (files, bytes) across every live copy of the shard
      val stats: Map[Option[String], (Long, Long)] = liveEntries(st)
        .map { case (d, g) =>
          val cs = fs.getContentSummary(
            new org.apache.hadoop.fs.Path(genPath(g), d))
          unescapePartitionValue(d.split("=", 2)(1)) ->
            (cs.getFileCount, cs.getLength)
        }
        .groupBy(_._1)
        .map { case (v, xs) =>
          v -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
      val dirty = stats.collect { case (v, (files, bytes))
        if files > math.max(maxFilesPerShard.toLong,
          math.max(1L, (bytes + targetBytes - 1) / targetBytes)) => v
      }.toSet
      if (dirty.isEmpty) return 0L
      val slice = read().where(affectedPartPred(dirty))
      val expected = slice.count()
      val content = slice.select((storedColsOf(st).map(col) :+ col(partCol)): _*)
      rewritePartitions(dirty, content, expected, "compactIncremental",
        slices = stats.collect { case (v, (_, bytes)) if dirty.contains(v) =>
          v -> math.max(1L, (bytes + targetBytes - 1) / targetBytes) }.toMap,
        clusterBy = clusterBy)
      dirty.size.toLong
    }
  }

  private def compactImpl(targetBytes: Long, clusterBy: Seq[Column]): Long = {
    val fs = fsOfRoot
    val st = readState()
    requireNoReshard(st, "compact")
    require(!fs.exists(
      new org.apache.hadoop.fs.Path(genPath(st.generation), "_spark_metadata")),
      "refusing to compact a streaming-sink lake: _spark_metadata manifest present")
    require(rootLevelData(fs).isEmpty,
      s"refusing maintenance at ${cfg.location}: root-level (pre-v2/foreign) " +
        "data present — the manifest does not govern it, so a rewrite could " +
        "not retire it; re-ingest into the generation layout first")

    // per-shard compressed bytes across every live copy. Directory
    // names carry ESCAPED partition values (Spark writes ':','%','=' etc
    // as %XX and null as the Hive sentinel) while read() yields decoded
    // values — decode here or the slice join below misses those shards
    val shardBytes: Map[Option[String], Long] = liveEntries(st)
      .map { case (d, g) =>
        unescapePartitionValue(d.split("=", 2)(1)) ->
          fs.getContentSummary(
            new org.apache.hadoop.fs.Path(genPath(g), d)).getLength
      }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
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
    val newGen = nextGen(st)
    val tmp = genPath(newGen)
    // null-safe LEFT join with a 1-slice default: a shard whose directory
    // name failed to map (or a null partition value) must still be
    // rewritten — dropping it here would turn into silent data loss at
    // the commit below
    val src = read()
    val srcRows = src.count()
    // Slice assignment decides what a compacted FILE spans, and that is
    // a zone-map question: hash slices give byte-balanced files where
    // every file spans the shard's ENTIRE key range — one compaction after
    // time-correlated ingest and readTimeRange is back to opening every
    // file. With clusterBy, slices are RANGE-assigned over
    // (shard, clusterBy): repartitionByRange samples the key
    // distribution and hands each task one contiguous band, so each
    // output file carries a TIGHT (min, max) for the clustering key and
    // the per-file zone map keeps pruning after the rewrite (files per
    // shard still tracks bytes — the sampler balances rows per slice).
    // partCol leads the sort below either way: the dynamic-partition
    // writer requires rows ordered by the partition column and ADDS ITS
    // OWN (non-stable) sort when the incoming order doesn't satisfy
    // that — which would undo the clustering.
    val sliced =
      if (clusterBy.isEmpty)
        src
          .join(sliceDf, col(partCol) <=> col(partCol + "_s"), "left")
          .withColumn("_slice", pmod(abs(hash(col("id"))), coalesce(col("n_slices"), lit(1L))))
          .repartition(totalSlices, col(partCol), col("_slice"))
          .select((storedColsOf(st).map(col) :+ col(partCol)): _*)
      else
        src
          .repartitionByRange(totalSlices, (col(partCol) +: clusterBy): _*)
          .select((storedColsOf(st).map(col) :+ col(partCol)): _*)
    (if (clusterBy.isEmpty) sliced
     else sliced.sortWithinPartitions((col(partCol) +: clusterBy): _*))
      .write.mode(SaveMode.Overwrite)
      .option("compression", cfg.codec)
      .partitionBy(partCol)
      .parquet(tmp.toString)

    // verify BEFORE the commit: any rewrite shortfall aborts with the
    // live state untouched instead of surfacing as permanent loss
    val tmpRows = spark.read.parquet(tmp.toString).count()
    if (tmpRows != srcRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compact aborted: rewrote $tmpRows rows but source has $srcRows (live state untouched)")
    }

    // COMMIT: one sidecar create names the new generation as the whole
    // live set; every older generation is dead-in-place (vacuum sweeps)
    writeState(LakeState(newGen, Nil, extraCols = st.extraCols))
    refreshSkipIndex(shardBytes.keySet) // full compact rewrote every shard
    refreshZoneMapShards(shardBytes.keySet)

    fs.listStatus(tmp).filter(_.isDirectory).map(d =>
      fs.listStatus(d.getPath).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")).toLong).sum
  }

  /** Inverse of Spark's partition-path escaping — delegates to the ONE
    * hardened implementation in the companion ([[Lake.unescapePartitionValue]]),
    * shared with the DSv2 format so the two surfaces can never decode
    * the same directory name differently. */
  private[graft] def unescapePartitionValue(raw: String): Option[String] =
    Lake.unescapePartitionValue(raw)

  /** INCREMENTAL RESHARD — grow the routing width from `cfg.numHashes`
    * to `newNumHashes` hyperplanes (2^Δ× the shards), the structural
    * answer to "what happens at 100× the data": shard count is
    * otherwise frozen at creation (the reference pins it the same way,
    * `approx_shards → 2^round(log2(...))`, index.py:454-455), so every
    * directory grows with the lake and single-probe topK degrades
    * linearly. Returns the Lake at the new width; the receiver is
    * STALE after a successful begin (every read and write it attempts
    * is refused by the per-operation width checks — construct at the
    * new width, or use the returned instance).
    *
    * Why refinement is exact and local: the seeded hyperplane sequence
    * is PREFIX-STABLE ([[graft.functions.Lsh.shardColFrom]] — LshSpec
    * pins it), so a row's width-(h+Δ) shard is its stored width-h
    * shard plus 2^h·bit_h + ... — per-row arithmetic, no global
    * re-route. Each directory therefore splits INDEPENDENTLY into its
    * 2^Δ refinements, which makes the rewrite incremental:
    *
    *  1. TRANSITION (one commit, writer-locked): the sidecar's
    *     declared width flips to the target, every live (directory,
    *     generation) pair is recorded `reshard_pending` at the old
    *     width, and the append target rolls to a fresh generation —
    *     post-transition appends (routed at the NEW width by any
    *     correctly-constructed writer; stale-width writers are refused
    *     per write) can never share a (dir, generation) identity with
    *     a pending entry. The by-value skip index is dropped (it would
    *     mis-prune mid-reshard) and rebuilt at completion.
    *  2. STEPS (`dirsPerCommit` directories per commit, resumable):
    *     read exactly the batch's source pairs, widen each row's
    *     shard, write the split directories into a fresh generation,
    *     verify count + scope, commit — the batch's sources retire
    *     from the manifest (dead in place, vacuum sweeps), pending
    *     shrinks. A crash strands at most one uncommitted generation
    *     (vacuum sweeps it) and the batch replays; `maxDirs` bounds
    *     one call's work so the rewrite can ride maintenance windows.
    *  3. COMPLETION (one commit): `reshard_pending` empties, the
    *     reshard fields drop, and the skip index rebuilds if step 1
    *     dropped one.
    *
    * READS STAY CORRECT THROUGHOUT: [[read]]/[[readAt]]/topK re-derive
    * the missing high bits per row for pending directories (and for
    * pre-reshard snapshots — time travel works across reshards), at
    * the honest transient cost that pending directories lose
    * DIRECTORY pruning until their step completes (the filter lands
    * post-derivation); probe cost decays to the new width's as steps
    * land. Appends, clones, and vacuum run between steps; structural
    * maintenance (compact/DML/retention/seal/feed-since-current) is
    * refused until completion, and the SQL format refuses mid-reshard
    * and pre-reshard-snapshot scans (it serves directory-NAMED
    * partition values and cannot re-derive — the error says to read
    * through the Scala API).
    *
    * REPLICATION: a reshard between two sync points makes the netted
    * feed O(data) once (every row lands in new files, most with a new
    * shard value). Replicas converge by resharding THEMSELVES to the
    * same width first (routing is deterministic, so source and replica
    * split identically — a post-reshard [[diffStats]] audit convicts
    * nothing) and then applying the feed as usual.
    *
    * RESUME: call again with the SAME `newNumHashes` from a session at
    * the new width (the `graft` catalog's `CALL reshard` resolves the
    * width from the sidecar automatically). A crashed step leaves the
    * writer lock stranded — [[repair]] clears it, then resume. */
  def reshard(newNumHashes: Int, maxDirs: Int = Int.MaxValue,
      dirsPerCommit: Int = 64): Lake = {
    require(cfg.partitionKey.isEmpty,
      "reshard applies to LSH-routed lakes; a user-keyed lake's " +
        "partitioning is the caller's to change")
    require(newNumHashes > 0 && newNumHashes <= 30, "numHashes in (0,30]")
    require(newNumHashes >= cfg.numHashes,
      s"reshard only REFINES the routing (cannot narrow " +
        s"${cfg.numHashes} -> $newNumHashes hyperplanes): merging " +
        "shards is a whole-lake rewrite — create a lake at the " +
        "narrower width and cloneTo it instead")
    require(dirsPerCommit > 0 && maxDirs >= 0,
      s"dirsPerCommit must be positive and maxDirs non-negative")
    routingChecked // both modes: the CALLER's width matches the sidecar
    if (newNumHashes == cfg.numHashes) { // resume (no-op when complete)
      reshardSteps(maxDirs, dirsPerCommit)
      return this
    }
    requireWriteConfigMatch()
    val target = new Lake(spark, cfg.copy(numHashes = newNumHashes))
    withReshardLock {
      val fs = fsOfRoot
      val st = readState()
      requireNoReshard(st, "reshard(begin)") // defensive; routingChecked
      // already refuses a session at neither endpoint of an in-flight one
      require(!fs.exists(new org.apache.hadoop.fs.Path(
        genPath(st.generation), "_spark_metadata")),
        s"refusing reshard at ${cfg.location}: the current generation " +
          "is an active streaming-sink tree — stop the stream first")
      require(rootLevelData(fs).isEmpty,
        s"refusing reshard at ${cfg.location}: root-level (pre-v2/" +
          "foreign) data present — the manifest does not govern it; " +
          "re-ingest into the generation layout first")
      val pending = liveEntries(st)
      val hadSkip = fs.exists(skipPath)
      writeState(LakeState(nextGen(st), pending,
        extraCols = st.extraCols,
        reshard = Some(Lake.ReshardState(
          cfg.numHashes, newNumHashes, pending, hadSkip))))
      if (hadSkip) { fs.delete(skipPath, true); () }
    }
    target.reshardSteps(maxDirs, dirsPerCommit)
    target
  }

  /** In-flight reshard introspection: (from_shards, to_shards,
    * pending directory count) — None when no reshard is in flight.
    * What `CALL reshard`'s result row and operator dashboards read;
    * one sidecar read. */
  def reshardStatus(): Option[(Long, Long, Long)] =
    readState().reshard.map(r =>
      (1L << r.fromBits, 1L << r.toBits, r.pending.size.toLong))

  /** Writer-lock acquisition with bounded backoff, for the reshard
    * path only: a long reshard shares the lake with LIVE appenders,
    * and each step's lock grab can collide with a shared append
    * marker — a transient state the next moment clears. Up to seven
    * attempts (~5 s of capped exponential backoff) before surfacing
    * the contention; a genuinely stranded lock still fails loudly,
    * with [[repair]] as the documented recovery. Other maintenance
    * keeps the throw-on-first-contention posture (a cron retries on
    * its next tick); reshard retries because ONE call is expected to
    * shepherd many steps through ambient ingest traffic. */
  private def withReshardLock[T](body: => T): T = {
    var attempt = 0
    while (true) {
      try return withWriterLock("reshard")(body)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= 6) throw e
          Thread.sleep(math.min(100L * (1L << attempt), 2000L))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The step loop half of [[reshard]], always running at the TARGET
    * width: one writer-locked committed batch per iteration, so
    * appends interleave between batches and a kill at any point
    * resumes from the last commit. */
  private def reshardSteps(maxDirs: Int, dirsPerCommit: Int): Unit = {
    var budget = maxDirs
    var rebuildSkip = false
    var done = false
    while (!done) {
      withReshardLock {
        val st = readState()
        st.reshard match {
          case None => done = true // complete (or never begun: no-op)
          case Some(r) =>
            require(r.toBits == cfg.numHashes,
              s"reshard resume at ${cfg.location}: the in-flight " +
                s"target is ${1L << r.toBits} shards but this session " +
                s"routes ${lsh.numShards} — resume with numHashes = " +
                s"${r.toBits}")
            if (r.pending.isEmpty) {
              writeState(st.copy(reshard = None))
              rebuildSkip = r.hadSkipIndex
              done = true
            } else if (budget <= 0) done = true
            else {
              val batch = r.pending.take(math.min(budget, dirsPerCommit))
              reshardStep(st, r, batch)
              budget -= batch.size
            }
        }
      }
    }
    // outside the step lock: buildSkipIndex takes its own writer lock
    if (rebuildSkip) { buildSkipIndex(); () }
  }

  /** One committed reshard batch: read EXACTLY the batch's (directory,
    * generation) sources at the old width, widen each row's shard by
    * the refinement bits, write the split directories into a fresh
    * generation, verify count and refinement scope, commit the batch's
    * retirement. Same staged-publish discipline as every rewrite: a
    * failure before the sidecar create leaves the live state
    * untouched and the stranded tree for vacuum. */
  private def reshardStep(st: LakeState, r: Lake.ReshardState,
      batch: Seq[(String, Long)]): Unit = {
    val fs = fsOfRoot
    val extras = extraFieldsOf(st)
    def pad(df: DataFrame): DataFrame =
      extras.filterNot(f => df.columns.contains(f.name))
        .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val slices = batch.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, pairs) =>
      val base = genPath(g)
      val raw = spark.read.option("mergeSchema", "true")
        .option("basePath", base.toString)
        .parquet(pairs.map(_._1).distinct
          .map(d => new org.apache.hadoop.fs.Path(base, d).toString): _*)
      pad(raw.withColumn(partCol, col(partCol).cast(IntegerType)))
    }
    val cols = storedColsOf(st) :+ partCol
    val src = slices.reduce(_ unionByName _).select(cols.map(col): _*)
    val expected = src.count()
    val newGen = nextGen(st)
    val tmp = genPath(newGen)
    if (expected > 0L) {
      src.withColumn(partCol,
          (col(partCol) + lsh.shardColFrom(col("vector"), r.fromBits))
            .cast(IntegerType))
        .repartition(col(partCol))
        .write.mode(SaveMode.Overwrite)
        .option("compression", cfg.codec)
        .partitionBy(partCol)
        .parquet(tmp.toString)
      val got = spark.read.parquet(tmp.toString).count()
      if (got != expected) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"reshard step aborted: wrote $got rows, expected $expected " +
            "(live state untouched)")
      }
      // refinement scope: every produced value must preserve its
      // source's low bits — anything else is a routing bug, refused
      // before the commit
      val mask = (1 << r.fromBits) - 1
      val oldVals = batch.flatMap(p =>
        unescapePartitionValue(p._1.split("=", 2)(1))).map(_.toInt).toSet
      val outOfScope = fs.listStatus(tmp)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => unescapePartitionValue(s.getPath.getName.split("=", 2)(1)))
        .map(_.toInt).filterNot(v => oldVals(v & mask))
      require(outOfScope.isEmpty,
        s"reshard step produced out-of-scope partitions: " +
          s"${outOfScope.mkString(", ")}")
    }
    val batchSet = batch.toSet
    val producedDirs: Seq[String] =
      if (expected == 0L) Nil
      else fs.listStatus(tmp).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath.getName)
    // COMMIT — the generation POINTER does not move: the split
    // directories land as EXPLICIT live entries in their fresh
    // (non-current) generation, the batch's source pairs fall out, and
    // the current generation — where appends land, and which a
    // mid-reshard ingestStream may have pinned with its _spark_metadata
    // manifest — is never touched. (An earlier version rolled the
    // pointer per step, which would have re-parented a stream-owned
    // generation into raw live entries and broken manifest-governed
    // file visibility.)
    writeState(LakeState(
      st.generation,
      st.live.filter(_._2 != st.generation).filterNot(batchSet) ++
        producedDirs.map(_ -> newGen),
      extraCols = st.extraCols, sidecarShards = st.sidecarShards,
      reshard = Some(r.copy(pending = r.pending.filterNot(batchSet)))))
    // auxiliary refresh: the skip index is absent mid-reshard (dropped
    // at transition); the FILE-keyed zone map refreshes for the
    // retired and produced values
    refreshZoneMapShards(
      producedDirs.map(d => unescapePartitionValue(d.split("=", 2)(1))).toSet ++
        batch.map(p => unescapePartitionValue(p._1.split("=", 2)(1))).toSet)
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
    requireWriteConfigMatch() // a rewrite under a lesser config would strip columns
    withWriterLock("deleteWhere")(deleteWhereImpl(pred))
  }

  /** RETENTION — delete every row whose `timestamp` is strictly older
    * than `olderThan`, at the cheapest PROVABLE cost tier:
    *
    *  1. WHOLESALE manifest retirement: a manifest entry (an
    *     older-generation directory) ALL of whose data files the zone
    *     map certifies fully expired (`max_ts < horizon` with
    *     `ts_cnt == cnt` — no null-timestamp row can hide) is retired
    *     by ONE sidecar commit. Zero file reads, zero rewrites:
    *     O(entries) metadata, the deleted row count comes from the
    *     map's own counters. With time-correlated appends and
    *     incremental compaction, old data concentrates in old
    *     generations, so steady-state retention at 100 TB is almost
    *     entirely this tier — TTL enforcement priced like a directory
    *     listing, not like a delete.
    *  2. Row-level delete for the remainder: straddling files,
    *     current-generation data, and anything the map cannot certify
    *     (unmapped files, pre-`ts_cnt` maps, null-bearing files) go
    *     through the usual transactional [[deleteWhere]] rewrite of
    *     exactly the affected partitions.
    *
    * Retired files stay on disk for time travel, dying in place like
    * any rewrite's old copies: [[vacuum]] frees their bytes once their
    * whole GENERATION falls out of the live manifest (compaction
    * migrates surviving directories forward, so old generations drain
    * naturally). The change feed carries both tiers as plain deletes,
    * so [[follow]]ers and [[syncFrom]] replicas apply the same
    * retention at their own pace. A lake without a zone map is still
    * correct — everything rides tier 2. Returns
    * (rowsRetiredWholesale, rowsDeletedByRewrite). */
  def expire(olderThan: java.time.Instant): (Long, Long) = {
    if (!exists()) return (0L, 0L)
    requireWriteConfigMatch()
    withWriterLock("expire")(expireImpl(olderThan))
  }

  private def expireImpl(olderThan: java.time.Instant): (Long, Long) = {
    val fs = fsOfRoot
    // same maintenance posture as compact/vacuum: data the manifest
    // does not govern cannot be retired, and a streaming-sink tree's
    // visibility belongs to its _spark_metadata manifest
    require(rootLevelData(fs).isEmpty,
      s"refusing expire at ${cfg.location}: root-level (pre-v2/foreign) " +
        "data present — re-ingest into the generation layout first")
    require(!currentGenerationStreamOwned,
      s"refusing expire at ${cfg.location}: the current generation is an " +
        "active streaming-sink tree")
    val horizon = java.sql.Timestamp.from(olderThan)
    val st = readState()
    requireNoReshard(st, "expire")
    // tier 1: only MANIFEST entries are wholesale candidates (the
    // current generation is live by listing rule, not by entry)
    val candidates =
      if (st.isSealed) st.live else st.live.filter(_._2 != st.generation)
    var retiredRows = 0L
    if (candidates.nonEmpty) {
      // per-file certificates from the zone map: (fully-expired, rows).
      // Absent/old/unreadable maps yield no certificates — never wrong,
      // merely tier-2 cost. merged=true: parts written before ts_cnt
      // null-fill it, which certifies nothing (null comparison).
      val certs: Map[String, (Boolean, Long)] =
        try readZone(fs, merged = true).map {
          _.select(col("file"), col("max_ts"), col("cnt"), col("ts_cnt"))
            .collect().map { r =>
              val provable = !r.isNullAt(1) && !r.isNullAt(3) &&
                r.getLong(3) == r.getLong(2) &&
                r.getTimestamp(1).before(horizon)
              zoneKey(r.getString(0)) -> ((provable, r.getLong(2)))
            }.toMap
        }.getOrElse(Map.empty)
        catch { case scala.util.control.NonFatal(_) => Map.empty }
      if (certs.nonEmpty) {
        val retired = candidates.filter { case (d, g) =>
          val files = try dataFilesIn(fs,
            new org.apache.hadoop.fs.Path(genPath(g), d)).toSeq
          catch { case _: java.io.FileNotFoundException => Nil }
          files.nonEmpty && files.forall(f =>
            certs.get(zoneKey(f.getPath.toString)).exists(_._1))
        }.toSet
        if (retired.nonEmpty) {
          retiredRows = retired.toSeq.flatMap { case (d, g) =>
            dataFilesIn(fs, new org.apache.hadoop.fs.Path(genPath(g), d))
              .map(f => certs(zoneKey(f.getPath.toString))._2)
          }.sum
          writeState(st.copy(live = st.live.filterNot(retired)))
          ()
        }
      }
    }
    // tier 2: whatever rows remain expired (straddlers, current-gen,
    // uncertified files) — discovery reads the post-retirement live set
    val rewritten = deleteWhereImpl(col("timestamp") < lit(horizon))
    (retiredRows, rewritten)
  }

  /** @param scope when set, bound the affected-shard DISCOVERY scan to
    *        these partition values (a skip-index candidate set from
    *        [[deleteIds]] — a superset of the shards truly holding
    *        matches, so the discovery result is unchanged) */
  private def deleteWhereImpl(pred: Column,
      scope: Option[Set[Option[String]]] = None): Long = {
    val discovery = scope match {
      case Some(c) => read().where(affectedPartPred(c))
      case None => read()
    }
    val affected = discovery.where(pred).select(partCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    if (affected.isEmpty) return 0L
    val slice = read().where(affectedPartPred(affected))
    val total = slice.count()
    val kept = slice.where(!coalesce(pred, lit(false)))
      .select((storedColsNow.map(col) :+ col(partCol)): _*)
    val keptCount = kept.count()
    val deleted = total - keptCount
    if (deleted == 0L) return 0L
    rewritePartitions(affected, kept, keptCount, "deleteWhere")
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
    requireWriteConfigMatch()
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
    if (!exists()) { // bootstrap: plain ingest (indexes refreshed likewise)
      val out = writeAppend(newDerived)
      refreshSkipIndex(out.shards); refreshZoneMap(out.files)
      return 0L
    }
    val newIds = broadcast(newDerived.select(col("id").as("__new_id")).distinct())
    // old-version probe, skip-index pruned when one is fresh: the exact
    // semi-join below kills bloom false positives, so the discovered
    // shard set is identical — only the files READ to discover it shrink
    val probe = {
      val fs = fsOfRoot
      val entries = listRoot(fs)
      skipCandidates(newDerived.select("id"),
        readStateFrom(fs, entries), entries)
    } match {
      case Some(c) if c.isEmpty => None // no stored shard can hold these ids
      case Some(c) => Some(read().where(affectedPartPred(c)))
      case None => Some(read())
    }
    val oldShards = probe.map(
      _.join(newIds, col("id") === col("__new_id"), "left_semi")
        .select(partCol).distinct().collect())
      .getOrElse(Array.empty[org.apache.spark.sql.Row])
    val newShards = newDerived.select(partCol).distinct().collect()
    val affected = (oldShards ++ newShards)
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    val slice = read().where(affectedPartPred(affected))
    val sliceCount = slice.count()
    val colsNow = storedColsNow
    val keptOld = slice
      .join(newIds, col("id") === col("__new_id"), "left_anti")
      .select((colsNow.map(col) :+ col(partCol)): _*)
    val keptCount = keptOld.count()
    rewritePartitions(affected,
      keptOld.unionByName(newDerived.select((colsNow.map(col) :+ col(partCol)): _*)),
      keptCount + newCount, "upsert")
    sliceCount - keptCount
  }

  /** ROW-LEVEL DML APPLY — the commit half of the SQL `UPDATE` /
    * `MERGE INTO` / subquery-`DELETE` surface
    * ([[graft.sources.GraftRowLevelBuilder]]): one transactional
    * rewrite that removes every id in `deletes` and lands every row in
    * `inserts` under upsert identity (an insert whose id already
    * exists replaces the stored version). Updates arrive pre-split as
    * delete(old id) + insert(new row), so `SET id` re-keying and
    * shard-moving `SET vector` need no special casing — the insert
    * re-derives and re-routes exactly like [[upsert]] (derived
    * columns `shard`/`packed`/`pq_code` are recomputed; DML
    * assignments to them are overwritten by design). Same discovery
    * (skip-index-prunable id probe), same rewrite machinery, locks,
    * and staged-publish commit as [[upsert]]/[[deleteWhere]]. Returns
    * (rows removed or replaced, rows landed). */
  private[graft] def applyRowDelta(deletes: DataFrame,
      inserts: DataFrame): (Long, Long) = {
    requireWriteConfigMatch()
    withWriterLock("rowLevelDml")(applyRowDeltaImpl(deletes, inserts))
  }

  private def applyRowDeltaImpl(deletes: DataFrame,
      inserts: DataFrame): (Long, Long) = {
    // a pure DELETE stages no row columns — there is nothing to derive
    val newDerived =
      if (!inserts.columns.exists(_.equalsIgnoreCase("vector"))) None
      else Some(graft.operators.Materialize.cut(withDerived(inserts)))
    val newCount = newDerived.fold(0L)(_.count())
    // duplicate TARGET ids in one statement would both survive the
    // rewrite (MERGE inserting two rows under one explicit id, or two
    // updates re-keyed onto one id) — no row order exists to pick a
    // winner, so refuse loudly, same contract as upsert
    val distinctIds = newDerived.fold(0L)(_.select("id").distinct().count())
    require(distinctIds == newCount,
      s"row-level DML lands duplicate ids ($newCount rows, " +
        s"$distinctIds distinct ids) — make the written ids unique")
    val delIds = graft.operators.Materialize.cut(
      deletes.select(col(deletes.columns.head).cast(StringType).as("id"))
        .where(col("id").isNotNull).distinct())
    val delCount = delIds.count()
    if (newCount == 0L && delCount == 0L) return (0L, 0L)
    if (!exists()) {
      // bootstrapping DML (a MERGE's not-matched inserts into a fresh
      // bootstrapped table): deletes have nothing to hit, inserts are
      // a plain first append — same branch as upsert's bootstrap
      newDerived.foreach { nd =>
        val out = writeAppend(nd)
        refreshSkipIndex(out.shards); refreshZoneMap(out.files)
      }
      return (0L, newCount)
    }
    val newIds = newDerived.fold(delIds.limit(0))(_.select("id"))
    val touched = broadcast(newIds.select(col("id").as("__chg_id"))
      .unionByName(delIds.select(col("id").as("__chg_id"))).distinct())
    // old-version probe, skip-index pruned when one is fresh (exact
    // semi-join kills bloom false positives — upsertImpl scaladoc)
    val probe = {
      val fs = fsOfRoot
      val entries = listRoot(fs)
      skipCandidates(newIds.unionByName(delIds.select("id")),
        readStateFrom(fs, entries), entries)
    } match {
      case Some(c) if c.isEmpty => None
      case Some(c) => Some(read().where(affectedPartPred(c)))
      case None => Some(read())
    }
    val oldShards = probe.map(
      _.join(touched, col("id") === col("__chg_id"), "left_semi")
        .select(partCol).distinct().collect())
      .getOrElse(Array.empty[org.apache.spark.sql.Row])
    val newShards = newDerived.fold(
      Array.empty[org.apache.spark.sql.Row])(
      _.select(partCol).distinct().collect())
    val affected = (oldShards ++ newShards)
      .map(r => Option(r.get(0)).map(_.toString)).toSet
    if (affected.isEmpty) return (0L, 0L) // deletes of absent ids only
    val slice = read().where(affectedPartPred(affected))
    val sliceCount = slice.count()
    val colsNow = storedColsNow
    val kept = slice
      .join(touched, col("id") === col("__chg_id"), "left_anti")
      .select((colsNow.map(col) :+ col(partCol)): _*)
    val keptCount = kept.count()
    if (sliceCount == keptCount && newCount == 0L) return (0L, 0L)
    rewritePartitions(affected,
      newDerived.fold(kept)(nd => kept.unionByName(
        nd.select((colsNow.map(col) :+ col(partCol)): _*))),
      keptCount + newCount, "rowLevelDml")
    (sliceCount - keptCount, newCount)
  }

  /** Null-safe membership predicate over decoded partition values. */
  private def affectedPartPred(affected: Set[Option[String]]): Column =
    affected.toSeq
      .map(v => col(partCol).cast(StringType) <=> lit(v.orNull))
      .reduce(_ || _)

  // ---------------------------------------------------------------- skip index

  private def skipPath: org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(cfg.location, "_skip")

  /** Every live shard's file set, keyed by decoded partition value:
    * the input to both building and freshness-checking the skip index.
    * One LIST per live directory — the same enumeration any scan pays —
    * issued from a bounded thread pool: serial per-directory LISTs
    * against an object store would cost |shards| round trips end to end
    * (FileSystem implementations are thread-safe for reads; s3a
    * documents this). */
  private def liveShardFiles(fs: org.apache.hadoop.fs.FileSystem,
      st: LakeState,
      only: Option[Set[Option[String]]] = None)
      : Map[Option[String], Seq[(String, Long)]] = {
    val all = liveEntries(st)
    val entries = only match {
      case Some(vals) => all.filter { case (d, _) =>
        vals.contains(unescapePartitionValue(d.split("=", 2)(1))) }
      case None => all
    }
    // entries the sidecar's FILE-level manifest records skip their LIST
    // (guide §6 — committed entries are immutable until vacuum); the
    // rest (current generation, pre-field sidecars) pay one pooled LIST
    val (recorded, toList) = entries.partition(st.liveFiles.contains)
    val served = recorded.map { case e @ (d, g) =>
      val p = fs.makeQualified(new org.apache.hadoop.fs.Path(genPath(g), d))
      unescapePartitionValue(d.split("=", 2)(1)) ->
        st.liveFiles(e).map(f =>
          (new org.apache.hadoop.fs.Path(p, f.name).toString, f.len))
    }
    (served ++ mapDirsPooled(toList) { (d, g) =>
      unescapePartitionValue(d.split("=", 2)(1)) ->
        dataFilesIn(fs, new org.apache.hadoop.fs.Path(genPath(g), d))
          .map(s => (s.getPath.toString, s.getLen))
    }).groupBy(_._1).map { case (v, xs) => v -> xs.flatMap(_._2) }
  }

  /** Data files of one directory (markers and hidden files excluded). */
  private def dataFilesIn(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(p).toSeq.filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))

  /** Run `per(dir, gen)` for each entry from a bounded thread pool —
    * one object-store LIST per directory is a round trip, and serial
    * LISTs would pay |dirs| of them end to end (FileSystem reads are
    * thread-safe; s3a documents this). ExecutionExceptions are
    * unwrapped so callers see the real cause. Shared by the skip-index
    * and change-feed listing paths. */
  private def mapDirsPooled[A](dirs: Seq[(String, Long)])(
      per: (String, Long) => A): Seq[A] = {
    if (dirs.isEmpty) return Nil
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, dirs.size))
    try {
      dirs.map { case (d, g) =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = per(d, g)
        })
      }.map(f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        })
    } finally pool.shutdown()
  }

  /** Build (or refresh) the per-shard id Bloom skip index at
    * `<root>/_skip` — see [[graft.operators.SkipIndex]]. Two
    * column-pruned passes over the lake (per-shard counts to size the
    * sketches, then one `BloomFilterAggregate` per shard — map-side
    * combinable, only sketches reach the driver), one small parquet
    * write. Runs under the writer lock so the fingerprints it records
    * describe a tree no rewrite is concurrently replacing. Sketches are
    * sized for the largest shard at `fpp`; a false positive costs one
    * needlessly-probed shard, never a wrong answer. Returns the number
    * of shards indexed.
    *
    * Maintenance ops (deleteWhere/deleteIds/upsert/compact/
    * compactIncremental) REFRESH the index for the shards they rewrote
    * ([[refreshSkipIndex]]) — the table format maintaining its own
    * stats. Plain appends do not: an appended shard's fingerprint stops
    * matching, so probes read exactly that shard until the next rebuild
    * or the next maintenance op that touches it. Either way a stale
    * entry can only cost reads, never correctness. */
  def buildSkipIndex(fpp: Double = 0.01): Long = {
    if (!exists()) return 0L
    withWriterLock("buildSkipIndex") {
      val fs = fsOfRoot
      require(rootLevelData(fs).isEmpty,
        s"refusing to index ${cfg.location}: root-level (pre-v2/foreign) " +
          "data present — the index cannot govern what the manifest does not")
      val st = readState()
      requireNoReshard(st, "buildSkipIndex")
      val files = liveShardFiles(fs, st)
      if (files.isEmpty) { fs.delete(skipPath, true); return 0L }
      writeSkipIndex(skipRows(read(), files, fpp))
      files.size.toLong
    }
  }

  /** Index rows (part, fp, cnt, sketch) for the shards in `scope`,
    * computed from `slice` (the lake, or a pruned subset covering
    * exactly `scope`): one per-shard counts pass to size the sketches,
    * then one `BloomFilterAggregate` per shard. */
  private def skipRows(slice: DataFrame,
      scope: Map[Option[String], Seq[(String, Long)]],
      fpp: Double): DataFrame = {
    val key = col(partCol).cast(StringType).as("part")
    val counts = slice.groupBy(key).count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val maxN = math.max(1L, if (counts.isEmpty) 1L else counts.values.max)
    val numBits = graft.operators.SkipIndex.optimalBits(maxN, fpp)
    val sketches = slice.groupBy(key)
      .agg(graft.operators.BloomJoin.bloomAgg(col("id"), maxN, numBits)
        .as("sketch"),
        org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
    import spark.implicits._
    val fps = scope.toSeq.map { case (v, fl) =>
      (v.orNull, graft.operators.SkipIndex.fingerprint(fl))
    }.toDF("part_f", "fp")
    sketches.join(broadcast(fps), col("part") <=> col("part_f"), "inner")
      .select(col("part"), col("fp"), col("cnt"), col("sketch"))
  }

  /** Replace `<root>/_skip` with `rows` via tmp + swap: a torn swap
    * (copy+delete rename) leaves either no index or a parse failure —
    * both degrade to the exact full probe. The plan in `rows` may read
    * the OLD index (refresh does); it executes during the tmp write,
    * before the old directory is touched. The tmp name is unique per
    * call: CONCURRENT refreshes (two shared-gate ingests refreshing
    * disjoint shards) must not tear each other's scratch — their swaps
    * then race last-wins, and the loser's refreshed shards merely read
    * as fingerprint-stale (= probed exactly, never wrong). Stranded
    * tmps from a crash are swept by [[vacuum]]. */
  private def writeSkipIndex(rows: DataFrame): Unit = {
    val fs = fsOfRoot
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_skip__tmp_${java.util.UUID.randomUUID()}")
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(skipPath, true)
    fs.rename(tmp, skipPath)
  }

  /** Post-maintenance index refresh, called by every rewrite path
    * after its commit (still under the writer lock): recompute sketches
    * for exactly the `affected` shards from the just-committed tree,
    * keep every other row as-is. Best-effort and only when an index
    * exists — a failure leaves fingerprint-mismatched (= stale = probed
    * exactly) entries, never wrong ones. Cost tracks the affected
    * shards, like the rewrite itself. Refreshed sketches use the
    * default 1% fpp regardless of the original build's setting (fpp is
    * not stored; a full [[buildSkipIndex]] restores a custom one). */
  private def refreshSkipIndex(affected: Set[Option[String]]): Unit = try {
    val fs = fsOfRoot
    if (affected.isEmpty || readSkipIndex(fs).isEmpty) return
    val partFiles = fs.listStatus(skipPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    val keep = spark.read.parquet(partFiles.toSeq: _*)
      .select("part", "fp", "cnt", "sketch")
      .where(!affected.toSeq.map(v => col("part") <=> lit(v.orNull))
        .reduce(_ || _))
    // list ONLY the affected directories: kept rows reuse their stored
    // fingerprints, so the refresh's LIST cost tracks the rewrite's
    val affectedLive = liveShardFiles(fs, readState(), only = Some(affected))
    val refreshed =
      if (affectedLive.isEmpty) keep // every affected shard fully emptied
      else keep.unionByName(skipRows(
        read().where(affectedPartPred(affectedLive.keySet)),
        affectedLive, fpp = 0.01))
    writeSkipIndex(refreshed)
  } catch { case scala.util.control.NonFatal(_) => () } // stale = safe

  // ------------------------------------------------- timestamp zone map --

  private def zonePath: org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(cfg.location, "_zone")

  /** One canonical spelling of a data-file path for zone-map matching:
    * `input_file_name()` (what the map stores) renders the file as a
    * percent-ENCODED URI while `Path.toString` (what the listings
    * produce) keeps raw characters — and the two also differ in
    * scheme/authority decoration. Parse as a real URI first (decodes
    * the escapes), fall back to Hadoop Path for raw strings a strict
    * URI parser rejects (e.g. literal spaces): both land on the DECODED
    * path component, identical and unique within the lake's one
    * filesystem. A mismatch here is silent pruning loss (the safe
    * direction, but permanently dead), hence the two-sided
    * normalization. */
  private def zoneKey(p: String): String = Lake.zoneKey(p)

  /** The zone map as a frame, reading its part files EXPLICITLY — the
    * `_`-prefixed dir is hidden from discovery-style listings (same
    * convention the skip index uses), and passing the dir itself trips
    * a cosmetic "all paths were ignored" warning. None = no usable
    * map. */
  private def readZone(fs: org.apache.hadoop.fs.FileSystem,
      merged: Boolean = false): Option[DataFrame] = {
    if (!fs.exists(zonePath)) return None
    val parts = fs.listStatus(zonePath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    if (parts.isEmpty) return None
    // `merged` (FIELD reads): refresh parts written under a DIFFERENT
    // field spec (a failed spec read, a racing rebuild) can be narrower
    // than the build part — single-footer inference from whichever file
    // lists first would silently drop the wide columns; merging
    // null-fills instead, and the spec_fp gate decides which rows to
    // trust. TIME reads skip the merge: file/min_ts/max_ts/cnt are
    // present in EVERY part ever written, and a per-serving-query
    // footer-merge job growing with append count is exactly the
    // control-plane cost the hot path must not pay.
    var r = spark.read
    if (merged) r = r.option("mergeSchema", "true")
    Some(r.parquet(parts.toSeq: _*))
  }

  /** Per-file (min_ts, max_ts, cnt) of `slice`'s `timestamp` column,
    * plus a (f<i>_min, f<i>_max) double pair per mapped metadata FIELD
    * and the SPEC FINGERPRINT the fields were computed under — the
    * gate that keeps a part computed under a different (or unreadable)
    * spec from ever mispruning: a field read trusts a row's ranges
    * only when its `spec_fp` matches the spec the reader resolved, and
    * everything else degrades to "scan". Map-side combinable; the
    * shuffle carries one row per file. */
  private def zoneRows(slice: DataFrame, fields: Seq[String]): DataFrame = {
    val aggs =
      Seq(min(col("timestamp")).as("min_ts"),
        max(col("timestamp")).as("max_ts"),
        org.apache.spark.sql.functions.count(lit(1)).as("cnt"),
        // non-null timestamp count: min/max ignore nulls, so only
        // ts_cnt == cnt PROVES a file holds no null-timestamp rows —
        // the certificate [[expire]]'s wholesale tier needs (a null
        // timestamp never matches `timestamp < horizon`, so a file
        // hiding one must NOT be dropped wholesale). Maps built before
        // this column simply yield no certificates (expire falls back
        // to the row-level tier) until rebuilt.
        org.apache.spark.sql.functions.count(col("timestamp")).as("ts_cnt")) ++
        fields.zipWithIndex.flatMap { case (p, i) =>
          val c = metadataField(p).cast(DoubleType)
          Seq(min(c).as(s"f${i}_min"), max(c).as(s"f${i}_max"))
        }
    slice.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("spec_fp", lit(zoneSpecFp(fields)))
  }

  /** Order-sensitive fingerprint of a field spec — what pins a zone
    * row's f<i> columns to the field list they were computed under. */
  private def zoneSpecFp(fields: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fields.mkString("\u0001").getBytes("UTF-8"))
    md.digest().take(6).map("%02x".format(_)).mkString
  }

  /** The metadata FIELD paths this lake's zone map carries, from the
    * `_spec.json` the build wrote into `_zone` (empty for a
    * timestamp-only map — including every map built before fields
    * existed). Refreshes recompute exactly these, so appended entries
    * always match the map's schema; a refresh whose spec read failed
    * writes `spec_fp` of the EMPTY list, which field reads reject into
    * "scan" rather than misprune. Escaped characters in paths
    * round-trip through [[unescapeJson]]. */
  /** The field spec with "present but unreadable" DISTINGUISHED from
    * "absent": None = the spec file exists but could not be read or
    * parsed (transient store failure, torn write). Callers that would
    * REBUILD the map must skip on None — rebuilding with Nil would
    * permanently and silently drop the operator-configured field
    * pruning on one store hiccup. Read-side callers may treat None as
    * Nil (degrade to unpruned scans, self-heals next read). */
  private def zoneSpecFieldsChecked(
      fs: org.apache.hadoop.fs.FileSystem): Option[Seq[String]] = {
    val spec = new org.apache.hadoop.fs.Path(zonePath, "_spec.json")
    if (!fs.exists(spec)) return Some(Nil)
    // anchored on the "fields" array itself (not a positional token
    // drop), so a future spec variant with extra keys parses the same
    try Some(""""fields"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(readFully(fs, spec))
      .map(a => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(a.group(1))
        .map(m => unescapeJson(m.group(1))).toSeq)
      .getOrElse(Nil))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def zoneSpecFields(fs: org.apache.hadoop.fs.FileSystem): Seq[String] =
    zoneSpecFieldsChecked(fs).getOrElse(Nil)

  /** Build the per-file TIMESTAMP ZONE MAP (`<root>/_zone`): (file,
    * min_ts, max_ts, cnt), one row per live data file. LSH sharding
    * scatters rows by VECTOR, so a time-window read
    * ([[readTimeRange]]) prunes nothing at the directory level — but
    * data files are IMMUTABLE in this layout (appends create, rewrites
    * create new names, only vacuum deletes), so a per-file time range
    * never goes stale: the read path simply intersects the map with
    * the live listing. Files ABSENT from the map are scanned
    * unconditionally (safe, merely unpruned); dead entries for retired
    * files are ignored by construction. [[ingest]] appends entries for
    * exactly the files it lands; rewrites re-map their affected shards
    * ([[refreshZoneMapShards]]); a rebuild here also compacts
    * accumulated dead entries away. With time-correlated appends (the
    * 100 TB norm: loaders ingest in rough time order) a window read
    * opens only the window's files — cost tracks the window, never
    * lake size.
    *
    * `fields` extends the map beyond time: dotted paths into the
    * nested-metadata JSON (the `metadata_json` ingest column), each
    * mapped as a per-file (min, max) DOUBLE range and served by
    * [[readFieldRange]]. This is pruning parquet itself cannot give —
    * JSON-extracted fields have NO column statistics, so "docs with
    * quality in [a, b]" opens every file without it. The spec rides in
    * the map (`_zone/_spec.json`), so every later append/rewrite
    * refresh recomputes the same fields, and every part stamps the
    * spec FINGERPRINT its ranges were computed under — field reads
    * trust only fingerprint-matching rows, so parts written under a
    * different or unreadable spec degrade those files to "scanned",
    * never to wrong pruning. Corollary: a field map whose parts
    * predate the fingerprint column (or any spec-format drift) serves
    * correct rows with NO pruning until rebuilt — re-run this after
    * upgrading a map's format. Returns the number of files mapped. */
  def buildZoneMap(fields: Seq[String] = Nil): Long = {
    require(fields.distinct.size == fields.size && fields.forall(_.nonEmpty),
      s"buildZoneMap fields must be distinct non-empty paths; got $fields")
    if (!exists()) return 0L
    withWriterLock("buildZoneMap") {
      val fs = fsOfRoot
      require(rootLevelData(fs).isEmpty,
        s"refusing to zone-map ${cfg.location}: root-level (pre-v2/foreign) " +
          "data present — the map cannot govern what the manifest does not")
      requireNoReshard(readState(), "buildZoneMap")
      val rows = zoneRows(read(), fields).cache()
      try {
        val n = rows.count()
        if (n == 0L) { fs.delete(zonePath, true); return 0L }
        writeZone(rows, fields)
        n
      } finally { rows.unpersist(); () }
    }
  }

  /** Replace `_zone` via unique tmp + swap — same torn-swap contract as
    * [[writeSkipIndex]]: a failure leaves no map or a parse error, both
    * degrading to the unpruned full scan. The field spec is written
    * INTO the tmp before the rename, so the map and its spec swap
    * together. */
  private def writeZone(rows: DataFrame, fields: Seq[String]): Unit = {
    val fs = fsOfRoot
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_zone__tmp_${java.util.UUID.randomUUID()}")
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fields.nonEmpty) {
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_spec.json"), false)
      try out.write(fields.map(f => s""""${escapeJson(f)}"""")
        .mkString("""{"fields": [""", ", ", "]}").getBytes("UTF-8"))
      finally out.close()
    }
    fs.delete(zonePath, true)
    fs.rename(tmp, zonePath)
  }

  /** Post-append zone refresh: map exactly the just-published files by
    * MOVING one new uniquely-named parquet part into `_zone` —
    * concurrent appends' refreshes never touch each other's entries,
    * and a racing full rebuild's swap at worst orphans this part's
    * entries (dead entries are ignored; the files would then read as
    * unmapped = scanned = still correct). Best-effort like the skip
    * refresh: any failure leaves the files unmapped, never mismapped. */
  private def refreshZoneMap(files: Seq[String]): Unit = try {
    val fs = fsOfRoot
    if (files.isEmpty || !fs.exists(zonePath)) return
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_zone__tmp_${java.util.UUID.randomUUID()}")
    zoneRows(spark.read.parquet(files: _*), zoneSpecFields(fs))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.listStatus(tmp)
      .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { p =>
        fs.rename(p.getPath, new org.apache.hadoop.fs.Path(zonePath,
          s"part-append-${java.util.UUID.randomUUID()}.parquet"))
        ()
      }
    fs.delete(tmp, true)
    compactZoneParts(fs)
    ()
  } catch { case scala.util.control.NonFatal(_) => () } // unmapped = safe

  /** Bound the `_zone` PART-FILE count on append-heavy lakes: each
    * append's refresh moves ONE new part in, so without a bound both
    * the per-query verdict pass and the many-small-files map read grow
    * with append count until the next full [[buildZoneMap]]. Past
    * `zonePartCap` parts, merge everything into one part via the same
    * unique-tmp + swap as [[writeZone]], carrying `_spec.json` across.
    * Schema-merged read (refresh parts written under a failed spec
    * read can be narrower than the build part — null-fill, the
    * `spec_fp` gate still decides trust per row). Concurrency is the
    * standing refresh contract: a concurrent append's part landing
    * inside the swap window is orphaned by the rename → its files
    * degrade to unmapped = scanned, never wrong; a concurrent read
    * between delete and rename sees no map → full scan. Dead entries
    * for retired files ride along harmlessly (the read side
    * intersects with the live listing); only [[buildZoneMap]] drops
    * them. Amortized cost: one O(map) merge every `zonePartCap`
    * appends — the map is one row per live file, tiny next to the
    * append itself. */
  private def compactZoneParts(fs: org.apache.hadoop.fs.FileSystem): Unit = try {
    val parts = fs.listStatus(zonePath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (parts.length <= Lake.zonePartCap) return
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(parts.map(_.getPath.toString).toSeq: _*)
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_zone__tmp_${java.util.UUID.randomUUID()}")
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val spec = new org.apache.hadoop.fs.Path(zonePath, "_spec.json")
    if (fs.exists(spec)) {
      val body = readFully(fs, spec)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_spec.json"), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    fs.delete(zonePath, true)
    fs.rename(tmp, zonePath)
    ()
  } catch { case scala.util.control.NonFatal(_) => () } // next refresh retries

  /** Post-rewrite zone refresh: a rewrite retires EVERY old file of its
    * affected shards and publishes only NEW names, so the affected
    * shards' live files are all unmapped by construction — map them
    * directly, no already-mapped probe (collecting the whole map to
    * compute an always-empty intersection would cost O(map) driver work
    * on every one-shard rewrite). Were a file somehow mapped twice, the
    * duplicate entries are byte-identical (files are immutable) and
    * collapse harmlessly on the read side; the retired files' old
    * entries are dead-harmless and compacted away by the next
    * [[buildZoneMap]]. Cost tracks the affected shards, like the
    * rewrite itself. */
  private def refreshZoneMapShards(affected: Set[Option[String]]): Unit = try {
    val fs = fsOfRoot
    if (affected.isEmpty || !fs.exists(zonePath)) return
    val live = liveShardFiles(fs, readState(), only = Some(affected))
      .values.flatten.map(_._1).toSeq
    refreshZoneMap(live)
  } catch { case scala.util.control.NonFatal(_) => () } // unmapped = safe

  /** Rows whose ingest `timestamp` lies in [from, to] — the zone-map
    * pruned time-window read: resolve the live file listing, drop every
    * file whose mapped [min_ts, max_ts] cannot intersect the window,
    * scan only the rest (plus any unmapped file — never wrong, merely
    * unpruned), and apply the exact residual filter. Falls back to the
    * plain filtered [[read]] when no map exists, the layout has
    * root-level foreign data, or the current generation is
    * stream-owned (its manifest governs file visibility — raw listings
    * would count uncommitted files). Same recall as
    * `read().where(timestamp between ...)` ALWAYS; the map only cuts
    * files opened. */
  def readTimeRange(from: java.time.Instant, to: java.time.Instant): DataFrame = {
    val (base, residual) = timeWindowBase(from, to, None, "readTimeRange")
    base.where(residual)
  }

  /** The zone-pruned scan underneath [[readTimeRange]] and
    * [[topKInRange]]: (base frame, residual window predicate). The base
    * is the file slice the map could not exclude — or the plain
    * [[read]] when no map exists / the layout forces the fallback —
    * optionally pre-cut to `dirNames` partition directories (the routed
    * shards' escaped dir names, a second file-level cut on top of the
    * zone cut). Callers must apply `residual` (and any shard predicate)
    * for exactness. */
  private def timeWindowBase(from: java.time.Instant, to: java.time.Instant,
      dirNames: Option[Set[String]], op: String): (DataFrame, Column) = {
    require(!from.isAfter(to), s"$op: from $from is after to $to")
    val lob = lit(java.sql.Timestamp.from(from))
    val hib = lit(java.sql.Timestamp.from(to))
    (zonePrunedBase("min_ts", "max_ts", lob, hib, dirNames, op),
      col("timestamp") >= lob && col("timestamp") <= hib)
  }

  /** The zone-pruned scan shared by every range surface: the file
    * slice whose mapped [`minCol`, `maxCol`] can intersect [lo, hi] —
    * or the plain [[read]] when no map exists / the layout forces the
    * fallback — optionally pre-cut to `dirNames` partition
    * directories. Control-plane cost is O(live files in scope), the
    * same order as the listing itself (and as Spark's own file index):
    * ONE pass over the map, PRE-FILTERED in the plan to the scoped
    * directories when a shard cut is given (a serving call must not
    * pull the whole lake's map to consult nprobe shards' verdicts; a
    * path-spelling miss in that filter only drops a verdict → that
    * file is scanned, never wrong). Below
    * `graft.zone.distributedVerdictMinFiles` live files the per-file
    * verdicts collect to the driver (no extra job — the cheap serve
    * path); at or above it the pass runs as a DISTRIBUTED join against
    * the listing and only the surviving file list returns, so driver
    * memory never grows a second O(files) structure at 100× file
    * counts. A file the map knows and marks disjoint is pruned; a
    * mapped-and-overlapping or UNMAPPED file is scanned — and so is
    * everything when the map lacks `minCol` entirely (the pass throws,
    * fallback = scan all).
    * `requireFp`: FIELD reads pass the fingerprint of the spec they
    * resolved, and a row whose `spec_fp` differs contributes NO
    * verdict (its f<i> columns may belong to a different field list —
    * a refresh that could not read the spec, or a rebuild racing this
    * read with reordered fields) → that file is scanned. The timestamp
    * columns are name-stable across every spec, so time reads pass
    * None and trust every row. Callers must apply their exact residual
    * predicate. */
  private def zonePrunedBase(minCol: String, maxCol: String,
      lo: Column, hi: Column, dirNames: Option[Set[String]],
      op: String, requireFp: Option[String] = None): DataFrame = {
    routingChecked
    val fs = fsOfRoot
    if (!exists() || !fs.exists(zonePath)) return read()
    val entries = listRoot(fs)
    val st = readStateFrom(fs, entries)
    if (rootLevelDataFrom(entries).nonEmpty ||
        fs.exists(new org.apache.hadoop.fs.Path(
          genPath(st.generation), "_spark_metadata")))
      return read()
    val dirs = dirNames match {
      case Some(keep) => liveEntries(st).filter(d => keep(d._1.split("/").last))
      case None => liveEntries(st)
    }
    val owners = fileOwners(fs, dirs, op, st.liveFiles)
    val kept: Map[String, Long] =
      try readZone(fs, merged = requireFp.isDefined).map { z =>
        val scoped = dirNames match {
          case Some(keep) =>
            z.where(keep.toSeq.map(d => col("file").contains(s"/$d/"))
              .reduce(_ || _))
          case None => z
        }
        val trusted = requireFp match {
          case Some(fp) => scoped.where(col("spec_fp") === fp)
          case None => scoped
        }
        // null bounds contribute a MISS (never mapped-and-unknown —
        // zoneRows always writes real min/max), identical on both
        // regimes below
        val hitCol =
          coalesce(col(maxCol) >= lo && col(minCol) <= hi, lit(false))
        // TWO verdict regimes, chosen by live-file count. Small scopes
        // (the overwhelmingly common serve: a routed read consults
        // nprobe shards' entries) collect the per-file verdicts — one
        // driver pass, no extra Spark job. Past the bound, the
        // per-file pass moves OFF the driver: the listing joins the
        // map on the normalized path and only the SURVIVING file list
        // comes back — which the driver must hold anyway to plan the
        // read. Driver memory stays O(listing), never
        // O(listing + verdict map), and the verdict scan parallelizes
        // with the map's partition count at 100× file counts.
        val minDistributed = spark.conf
          .get("graft.zone.distributedVerdictMinFiles", "4096").toInt
        if (owners.size < minDistributed) {
          val verdicts = trusted.select(col("file"), hitCol.as("hit"))
            .collect()
            .map(r => zoneKey(r.getString(0)) -> r.getBoolean(1))
            .toMap
          owners.filter { case (f, _) =>
            verdicts.getOrElse(zoneKey(f), true) }
        } else {
          // the zone side's paths normalize per row on executors; the
          // listing side normalizes while building the frame (already
          // driver-resident). A udf is fine HERE: this is control-plane
          // metadata (one row per file), never corpus rows.
          val zk = udf((s: String) => Lake.zoneKey(s))
          val listing = spark.createDataFrame(
            owners.keys.toSeq.map(f => (f, zoneKey(f))))
            .toDF("path", "zkey")
          // left join: an UNMAPPED file (no zone row) must be scanned
          // unconditionally — hit is null only for those
          val keptPaths = listing.join(
              trusted.select(zk(col("file")).as("zkey"), hitCol.as("hit")),
              Seq("zkey"), "left")
            .where(col("hit").isNull || col("hit"))
            .select("path").distinct()
            .collect().map(_.getString(0)).toSet
          owners.filter { case (f, _) => keptPaths(f) }
        }
      }.getOrElse(owners)
      catch { case scala.util.control.NonFatal(_) => owners }
    readFileSlice(kept, extraFieldsOf(st))
  }

  /** Rows whose NESTED-METADATA numeric field `path` lies in [lo, hi]
    * — the curation-side twin of [[readTimeRange]], pruned by the
    * field's per-file (min, max) range when [[buildZoneMap]] was given
    * the path in `fields`. This is selectivity parquet cannot provide:
    * the field lives inside an opaque JSON string, so without the map
    * every "quality in [a, b]" / "n_chars < n" curation pass opens
    * every file. Unmapped paths (or no map at all) fall back to the
    * plain filtered read — same rows, no cut. Rows whose field is
    * absent or non-numeric never match (null semantics, both paths). */
  def readFieldRange(path: String, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"readFieldRange: lo $lo > hi $hi")
    val field = metadataField(path).cast(DoubleType)
    val residual = field >= lit(lo) && field <= lit(hi)
    // zoneSpecFields' own missing-file check covers the no-map case
    // (no separate exists probes — each is a round trip on an object
    // store); an unmapped path falls back to the plain filtered read
    val spec = zoneSpecFields(fsOfRoot)
    val i = spec.indexOf(path)
    if (i < 0) return read().where(residual)
    zonePrunedBase(s"f${i}_min", s"f${i}_max", lit(lo), lit(hi),
      None, "readFieldRange", requireFp = Some(zoneSpecFp(spec)))
      .where(residual)
  }

  /** FRESHNESS-SCOPED kNN: the k nearest rows whose ingest `timestamp`
    * lies in [from, to] — "retrieve only from the last week's data",
    * the recency-constrained serving shape a continuously-loaded corpus
    * needs. TWO file-level cuts compose before any distance work: LSH
    * routing keeps only the probed shards' directories (`nprobe` is the
    * same recall ladder as [[topKMultiProbe]]) and the zone map drops
    * every file outside the window — with time-correlated appends the
    * scan is (window ∩ routed shards) files, not the lake. Exact over
    * the scoped set: the residual time filter runs before the top-k, so
    * recall within the window matches [[topK]]/[[topKMultiProbe]]'s
    * contract (never the post-filter-a-short-list bug). Returns the
    * usual (stored cols..., dist) top-k frame. */
  def topKInRange(q: Seq[Double], k: Int,
      from: java.time.Instant, to: java.time.Instant,
      nprobe: Int = 1): DataFrame = {
    require(cfg.partitionKey.isEmpty,
      "topKInRange routes by the LSH shard column — a user-partitioned " +
        "lake has no LSH routing; use topKFiltered with a timestamp " +
        "predicate")
    requireNprobe(nprobe)
    // LSH shard values are plain ints, so the dir names need no
    // Hive-escaping (a user-partitioned lake is refused above)
    val probes = probeShards(q, nprobe)
    val dirNames: Set[String] = probes.map(s => s"$partCol=$s").toSet
    val (base, residual) = timeWindowBase(from, to, Some(dirNames), "topKInRange")
    topKOver(base.where(residual && col(partCol).isin(probes: _*)), q, k)
  }

  /** Shards that might hold any id in `ids`, per the skip index:
    * `Some(values)` = probe only these (sketch hits plus every shard
    * whose fingerprint no longer matches — stale sketches never skip);
    * `None` = no usable index, probe everything. Absence, corruption,
    * or pre-v2 root data all yield `None`; a read error inside the
    * probe itself must never fail the calling op.
    *
    * The DataFrame overload runs the membership test as one narrow job
    * (upsert batches can be arbitrarily large); the Seq overload tests
    * driver-side against the already-collected sketches — a point-read
    * must not pay a Spark job just to decide where to point. */
  private def skipCandidates(ids: DataFrame, st: LakeState,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): Option[Set[Option[String]]] =
    skipProbe(st, entries) { sketches =>
      val bc = spark.sparkContext.broadcast(sketches)
      import spark.implicits._
      // one narrow pass over the ids: each task deserializes every
      // sketch ONCE, tests xxhash64(id) (the hash BloomFilterAggregate
      // stored) against each, and emits the indices of shards hit —
      // at most |sketches| ints per task, with early exit once all hit
      ids.select(xxhash64(col("id")).as("h")).as[Long]
        .mapPartitions { it =>
          val bfs = bc.value.map(b => org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(b)))
          val n = bfs.length
          val hit = new java.util.BitSet(n)
          var found = 0
          while (it.hasNext && found < n) {
            val h = it.next()
            var i = 0
            while (i < n) {
              if (!hit.get(i) && bfs(i).mightContainLong(h)) {
                hit.set(i); found += 1
              }
              i += 1
            }
          }
          Iterator.range(0, n).filter(hit.get)
        }.distinct().collect().toSet
    }

  private def skipCandidates(ids: Seq[String], st: LakeState,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): Option[Set[Option[String]]] =
    skipProbe(st, entries) { sketches =>
      val hashes = ids.map(org.apache.spark.sql.GraftShims.xxhash64String)
      sketches.zipWithIndex.collect { case (b, i) if {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(b))
        hashes.exists(bf.mightContainLong)
      } => i }.toSet
    }

  /** Shared core of [[skipCandidates]]: load + freshness-check the
    * index, delegate the sketch membership test, decode hit indices
    * back to partition values. */
  /** The stored index rows as (value → (fingerprint, sketch)); None
    * when absent or unreadable. The part FILES are read, not the
    * directory: the dir itself is underscore-prefixed (so the lake's
    * own data scans never see it), which Spark's DataSource path
    * filter treats as a non-data path — explicit file paths sidestep
    * that filter deterministically. */
  private def readSkipIndex(fs: org.apache.hadoop.fs.FileSystem)
      : Option[Map[Option[String], (String, Array[Byte])]] = {
    if (!fs.exists(skipPath)) return None
    val parts = fs.listStatus(skipPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    if (parts.isEmpty) return None
    Some(spark.read.parquet(parts.toSeq: _*)
      .select("part", "fp", "sketch").collect()
      .map(r => Option(r.getString(0)) ->
        (r.getString(1), r.getAs[Array[Byte]]("sketch"))).toMap)
  }

  /** `st`/`entries` are the CALLER's resolved state and root listing —
    * the probe and the scan it prunes must share one snapshot, or an
    * unlocked [[lookup]] racing a shard-moving upsert could probe the
    * pre-commit shards and scan the post-commit tree, missing a row
    * that was live at both instants. */
  private def skipProbe(st: LakeState,
      entries: Seq[org.apache.hadoop.fs.FileStatus])(
      hitIdx: Array[Array[Byte]] => Set[Int]): Option[Set[Option[String]]] = {
    val fs = fsOfRoot
    try {
      if (rootLevelDataFrom(entries).nonEmpty) return None
      val idx = readSkipIndex(fs) match {
        case Some(m) => m
        case None => return None
      }
      val live = liveShardFiles(fs, st)
      if (live.isEmpty) return Some(Set.empty)
      val (fresh, stale) = live.partition { case (v, fl) =>
        idx.get(v).exists(_._1 == graft.operators.SkipIndex.fingerprint(fl))
      }
      if (fresh.isEmpty) return None // nothing skippable: exact probe
      val freshSeq = fresh.keys.toSeq
      val hits = hitIdx(freshSeq.map(v => idx(v)._2).toArray)
      Some(hits.map(freshSeq).toSet ++ stale.keys)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Point-read by id — the serve-path row fetch. With a fresh skip
    * index the scan is pruned to the shards whose sketches match (for
    * a single id, typically ONE directory out of the whole lake); with
    * no index, a full exact probe. Identical rows either way. */
  def lookup(ids: Seq[String]): DataFrame = {
    require(ids.nonEmpty, "lookup needs at least one id")
    routingChecked
    // ONE state resolution feeds both the candidate probe and the scan:
    // lookup takes no lock, so resolving twice would let a concurrent
    // shard-moving upsert slip between them and the pruned scan miss a
    // row that was live at both instants
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = readStateFrom(fs, entries)
    val pred = col("id").isin(ids: _*)
    skipCandidates(ids, st, entries) match {
      case Some(c) if c.isEmpty => readFrom(st, entries).where(lit(false))
      case Some(c) => readFrom(st, entries).where(affectedPartPred(c) && pred)
      case None => readFrom(st, entries).where(pred)
    }
  }

  /** DELETE by id list: [[deleteWhere]] with the affected-shard
    * discovery pruned by the skip index — with a fresh index, a
    * targeted delete reads only the shards that might hold the ids
    * instead of probing the whole lake. Returns rows deleted. */
  def deleteIds(ids: Seq[String]): Long = {
    if (ids.isEmpty || !exists()) return 0L
    requireWriteConfigMatch() // a rewrite under a lesser config would strip columns
    val pred = col("id").isin(ids: _*)
    withWriterLock("deleteIds") {
      val fs = fsOfRoot
      val entries = listRoot(fs)
      skipCandidates(ids, readStateFrom(fs, entries), entries) match {
        case Some(c) if c.isEmpty => 0L
        case Some(c) => deleteWhereImpl(pred, scope = Some(c))
        case None => deleteWhereImpl(pred)
      }
    }
  }

  /** Shared targeted-rewrite machinery for [[deleteWhere]]/[[upsert]]/
    * [[compactIncremental]]: write `content` (covering EXACTLY the
    * `affected` partition values) into a NEW generation tree, verify
    * the row count, then COMMIT with one sidecar create whose manifest
    * keeps every unaffected directory at its existing location and
    * drops every affected one (the new tree, being current, is live by
    * rule). Unaffected directories are not read, not renamed, not
    * touched — bit-identical across the op. An affected value with no
    * rewritten directory means all its rows were removed: it simply
    * leaves the manifest. A crash anywhere before the commit leaves the
    * previous state fully live (the half-written generation is
    * unreferenced scratch for [[vacuum]]/[[repair]]).
    *
    * @param slices optional per-partition output-file counts (the
    *        [[compactIncremental]] sizing); default one file per
    *        partition
    * @param clusterBy optional within-file local sort, as [[compact]] */
  private def rewritePartitions(affected: Set[Option[String]],
      content: DataFrame, expectedRows: Long, tag: String,
      slices: Map[Option[String], Long] = Map.empty,
      clusterBy: Seq[Column] = Nil): Unit = {
    val fs = fsOfRoot
    val st = readState()
    requireNoReshard(st, tag)
    // the caller's content shape (stored cols + extras + partCol) is
    // what the slice-join below must re-project back to
    val outCols = content.columns.toSeq
    require(!fs.exists(
      new org.apache.hadoop.fs.Path(genPath(st.generation), "_spark_metadata")),
      "refusing to rewrite a streaming-sink lake: _spark_metadata manifest present")
    require(rootLevelData(fs).isEmpty,
      s"refusing maintenance at ${cfg.location}: root-level (pre-v2/foreign) " +
        "data present — the manifest does not govern it, so a rewrite could " +
        "not retire it; re-ingest into the generation layout first")
    val newGen = nextGen(st)
    val tmp = genPath(newGen)
    if (expectedRows > 0L) {
      val shaped =
        if (slices.isEmpty) content.repartition(col(partCol))
        else {
          import spark.implicits._
          val sliceDf = broadcast(
            slices.toSeq.map { case (sh, n) => (sh.orNull, n) }
              .toDF(partCol + "_s", "n_slices")
              .withColumn(partCol + "_s", col(partCol + "_s").cast(
                if (cfg.partitionKey.isEmpty) IntegerType else cfg.partitionKeyType)))
          val total = math.max(1,
            math.min(slices.values.sum, Int.MaxValue).toInt)
          // range slices under clusterBy (tight per-file key bands that
          // keep the zone map pruning after the rewrite — compactImpl
          // scaladoc), hash slices otherwise
          if (clusterBy.isEmpty)
            content
              .join(sliceDf, col(partCol) <=> col(partCol + "_s"), "left")
              .withColumn("_slice",
                pmod(abs(hash(col("id"))), coalesce(col("n_slices"), lit(1L))))
              .repartition(total, col(partCol), col("_slice"))
              .select(outCols.map(col): _*)
          else
            content
              .repartitionByRange(total, (col(partCol) +: clusterBy): _*)
              .select(outCols.map(col): _*)
        }
      (if (clusterBy.isEmpty) shaped
       else shaped.sortWithinPartitions((col(partCol) +: clusterBy): _*))
        .write.mode(SaveMode.Overwrite)
        .option("compression", cfg.codec)
        .partitionBy(partCol)
        .parquet(tmp.toString)
      val tmpRows = spark.read.parquet(tmp.toString).count()
      if (tmpRows != expectedRows) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"partition rewrite ($tag) aborted: wrote $tmpRows rows, expected $expectedRows (live state untouched)")
      }
      val outOfScope = fs.listStatus(tmp)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(s => unescapePartitionValue(s.getPath.getName.split("=", 2)(1)))
        .filterNot(affected.contains)
      require(outOfScope.isEmpty,
        s"rewrite produced out-of-scope partitions: ${outOfScope.mkString(", ")}")
    }
    // COMMIT: unaffected dirs keep their existing generation (now named
    // explicitly, since the current-tree becomes non-current); affected
    // dirs' old copies fall out of the manifest — dead in place
    val survivors = liveEntries(st).filter { case (d, _) =>
      !affected.contains(unescapePartitionValue(d.split("=", 2)(1)))
    }
    writeState(LakeState(newGen, survivors, extraCols = st.extraCols))
    refreshSkipIndex(affected)
    refreshZoneMapShards(affected)
  }

  /** Sweep DEAD storage — the VACUUM of this layout: generation trees
    * no longer referenced by the live sidecar (superseded by a
    * maintenance commit, or stranded by a crash before one) and
    * far-superseded sidecar versions. Nothing live is ever matched: the
    * live set is exactly (manifest entries ∪ current generation), and
    * this runs under the writer lock so no in-flight op's
    * not-yet-committed generation can be mistaken for dead.
    *
    * Retention window (`retainMs`): a reader that resolved its paths
    * BEFORE the vacuum and is still scanning a superseded generation
    * loses its files — the same tradeoff as any log-structured format's
    * VACUUM, and the same mitigation: only sweep generations that have
    * been dead LONGER than the window. A generation's death time is the
    * modification time of the first sidecar commit that no longer
    * references it (when every referencing commit has already aged out
    * of the kept-version window, the oldest retained commit's mtime
    * stands in — an upper bound, so the error direction is retaining
    * longer, never sweeping early). Set `retainMs` above your longest
    * query/job; dead-but-retained generations also keep [[readAt]]
    * snapshots servable for the window (snapshot SIDECARS are governed
    * by the separate `keptMetaVersions` count — a commit burst can
    * rotate one out sooner; the tree outliving its sidecar is harmless,
    * the version is simply refused by name). The default is 0 —
    * sweep everything dead now — because tests and single-session
    * maintenance want exactly that; production on shared storage
    * should pass hours.
    *
    * Crashed-writer recovery: a writer that died without reaching its
    * finally strands the `_lock` marker and every later mutation
    * (including this one) fails loudly. `vacuum(force = true)` skips
    * taking the lock and REMOVES the stranded marker — refusing when
    * the lock is younger than `lockMaxAgeMs` (default 10 min), because
    * a young lock usually means a LIVE writer that is merely slow, and
    * unlocking it would re-open the lost-update race the lock exists to
    * prevent. After confirming the writer is dead, pass
    * `lockMaxAgeMs = 0`.
    *
    * Returns the number of items removed (trees + sidecars + lock). */
  def vacuum(force: Boolean = false, lockMaxAgeMs: Long = 600000L,
      retainMs: Long = 0L): Long = {
    val fs = fsOfRoot
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    if (!fs.exists(root)) return 0L
    if (!force) return withWriterLock("vacuum")(sweepDead(fs, retainMs))
    val lock = new org.apache.hadoop.fs.Path(cfg.location, lockName)
    var removed = 0L
    // AGE-CHECK EVERYTHING FIRST, delete only after every check passes:
    // a "refused" force-vacuum must leave lock state untouched — deleting
    // the stale _lock and then throwing on a young append marker would
    // mutate the lake while telling the caller nothing happened
    val now = System.currentTimeMillis()
    val staleLock: Option[org.apache.hadoop.fs.Path] =
      if (!fs.exists(lock)) None
      else {
        val age = now - fs.getFileStatus(lock).getModificationTime
        if (age < lockMaxAgeMs) throw new IllegalStateException(
          s"vacuum(force) refused: writer lock $lock is only ${age} ms old " +
            s"(threshold $lockMaxAgeMs) — the writer may still be LIVE " +
            "(slow, not crashed), and unlocking it would re-open the " +
            "lost-update race. Wait it out, or pass lockMaxAgeMs = 0 after " +
            "confirming the writer is dead.")
        Some(lock)
      }
    // stranded SHARED append markers (a crashed appender's) block every
    // maintenance op the same way a stranded _lock does — un-strand them
    // under the same age discipline: a young marker is a LIVE appender
    // until proven otherwise
    val staleMarkers = appendMarkers(fs)
    staleMarkers.foreach { m =>
      val age = now - m.getModificationTime
      if (age < lockMaxAgeMs) throw new IllegalStateException(
        s"vacuum(force) refused: append marker ${m.getPath} is only " +
          s"${age} ms old (threshold $lockMaxAgeMs) — the appender may " +
          "still be LIVE; wait it out, or pass lockMaxAgeMs = 0 after " +
          "confirming it is dead.")
    }
    staleLock.foreach(l => if (fs.delete(l, false)) removed += 1L)
    staleMarkers.foreach(m =>
      if (fs.delete(m.getPath, false)) removed += 1L)
    // the sweep itself still runs LOCKED — force only un-strands the
    // dead writer's marker; sweeping unlocked would let a writer that
    // acquires the lock right now have its in-flight generation
    // mistaken for dead and deleted mid-op
    removed + withWriterLock("vacuum")(sweepDead(fs, retainMs))
  }

  private def sweepDead(fs: org.apache.hadoop.fs.FileSystem,
      retainMs: Long): Long = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    val st = readState()
    val liveGens = (st.live.map(_._2) :+ st.generation).toSet
    val now = System.currentTimeMillis()
    // The commit clock for the retention window: every retained sidecar
    // as (version, mtime, generations it references). Bounded work —
    // keptMetaVersions+1 small files plus one per retained SEALED sync
    // point, read once per sweep (the sidecar sweep below reuses it
    // even with no window; vacuum is operator-invoked, so the
    // seal-proportional cost sits off every hot path).
    lazy val commits: Seq[(Long, Long, Set[Long])] =
      metaVersions(fs).sortBy(_._1).map { case (v, p) =>
        val s = parseState(readFully(fs, p))
        (v, fs.getFileStatus(p).getModificationTime,
          (s.live.map(_._2) :+ s.generation).toSet)
      }
    def tombstone(g: Long) =
      new org.apache.hadoop.fs.Path(cfg.location, s"_dead.$g")
    def diedWithinWindow(g: Long): Boolean = retainMs > 0L && {
      val lastRef = commits.filter(_._3.contains(g))
        .map(_._1).maxOption.getOrElse(Long.MinValue)
      val byCommit =
        if (lastRef == Long.MinValue) None
        else commits.collectFirst { case (v, mt, _) if v > lastRef => mt }
      byCommit match {
        case Some(death) => now - death < retainMs
        case None =>
          // every commit that knew this generation's death has rotated
          // out of the retained sidecars. The retained commits' mtimes
          // are useless as a clock here — steady appends keep rotating
          // the window, so "oldest retained commit" stays perpetually
          // recent and the generation would be retained FOREVER. Stamp
          // a tombstone at first observation instead: an upper bound on
          // death time (retains longer, never sweeps early) that stops
          // moving once written.
          val ts = tombstone(g)
          if (!fs.exists(ts)) {
            fs.create(ts, true).close()
            true // just stamped: the window starts now
          } else now - fs.getFileStatus(ts).getModificationTime < retainMs
      }
    }
    var removed = 0L
    fs.listStatus(root).foreach { s =>
      s.getPath.getName match {
        case genDirRe(g) if s.isDirectory && !liveGens.contains(g.toLong)
            && !diedWithinWindow(g.toLong) =>
          if (fs.delete(s.getPath, true)) removed += 1L
          fs.delete(tombstone(g.toLong), false) // with its clock, if any
        case _ => ()
      }
    }
    // orphan tombstones (their generation already swept — e.g. by a
    // later retainMs=0 run — or never existed): plain cleanup. The
    // skip-index scratch dir is swept here too — a crash between its
    // write and its rename strands it, and nothing else removes it.
    val deadRe = """_dead\.(\d+)""".r
    fs.listStatus(root).foreach { s =>
      s.getPath.getName match {
        case deadRe(g) if s.isFile && !fs.exists(genPath(g.toLong)) =>
          fs.delete(s.getPath, false); ()
        case n if n.startsWith("_skip__tmp") || n.startsWith("_zone__tmp") =>
          if (fs.delete(s.getPath, true)) removed += 1L
        // append staging scratch: the sweep runs under the EXCLUSIVE
        // lock, which excludes every in-flight append — anything still
        // under _staging is a crashed appender's leftovers (an empty
        // parent is dropped silently, not counted as a swept item)
        case Lake.stagingDirName =>
          val hadContent = fs.listStatus(s.getPath).nonEmpty
          if (fs.delete(s.getPath, true) && hadContent) removed += 1L
        // row-level DML staging (_rlo/<queryId>): writers stage BEFORE
        // the statement's apply takes the writer lock, so a live
        // statement's dir is age-protected — only a dir idle >10 min
        // (a crashed statement: the write job's last staging write and
        // its locked apply are adjacent in time) is a stranded leftover.
        // If a pathological sweep ever catches a live one, the commit
        // fails LOUDLY on the missing files (GraftDeltaWrite), never
        // silently applying a partial delta.
        case "_rlo" if s.isDirectory =>
          fs.listStatus(s.getPath).foreach { q =>
            if (now - q.getModificationTime > 600000L &&
                fs.delete(q.getPath, true)) removed += 1L
          }
          if (fs.listStatus(s.getPath).isEmpty) {
            fs.delete(s.getPath, false); ()
          }
        case _ => ()
      }
    }
    if (commits.nonEmpty) {
      val latest = commits.map(_._1).max
      commits.filter { case (v, mt, _) =>
        v < latest - keptMetaVersions &&
          (retainMs <= 0L || now - mt >= retainMs)
      }.foreach { case (v, _, _) =>
        if (fs.delete(
            new org.apache.hadoop.fs.Path(cfg.location, s"_meta.$v.json"),
            false)) removed += 1L
      }
    }
    removed
  }

  /** Crash RECOVERY — in layout v2, a one-liner by construction: every
    * maintenance op writes a NEW generation and commits with one
    * sidecar create, so a crash at ANY point leaves the committed state
    * fully live and loses zero rows; there is no swap window and
    * nothing to roll back. What a crash strands is scratch — the
    * uncommitted generation tree and the writer lock — and repair
    * sweeps both (a force-[[vacuum]] with no lock-age threshold: repair
    * is the operator's explicit "the writer is dead" assertion).
    * Returns the number of items swept. */
  def repair(): Long = vacuum(force = true, lockMaxAgeMs = 0L)

  /** Integrity audit — the CHECK TABLE of this layout, one scan, one
    * row out: `(rows, misrouted, dup_ids, bad_packed, bad_pq,
    * bad_dim)`. Every stored invariant the maintenance ops rely on is
    * recomputed and counted rather than assumed:
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
    *    truth;
    *  - `bad_dim`: rows whose vector length ≠ the sidecar-pinned
    *    `cfg.dim` (a foreign file with wrong-dimension vectors — the
    *    session-vs-sidecar dim mismatch is already refused at read by
    *    the routing check, so what this catches is wrong-dim DATA
    *    under a correct config; a null vector also lands here).
    *
    * All checks are map-side expressions into one aggregate; at 100 TB
    * this costs exactly one full scan, the floor for any audit that
    * reads every row. Zero everywhere (and -1 for unconfigured
    * columns) = healthy. */
  /** Shards whose skip-index fingerprint no longer matches the live
    * file set; -1 = no index present (shared by [[validate]] and
    * [[maintain]]). Driver-side metadata only. */
  private def skipStaleCount(): Long = try {
    val fs = fsOfRoot
    readSkipIndex(fs) match {
      case None => -1L
      case Some(idx) =>
        liveShardFiles(fs, readState()).count { case (v, fl) =>
          !idx.get(v).exists(
            _._1 == graft.operators.SkipIndex.fingerprint(fl))
        }.toLong
    }
  } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Whether the `_zone` map has degraded enough that a rebuild is
    * justified: part-file bloat past the refresh auto-compact cap, or
    * dead-entry bloat (map rows from retired files at 2x the live
    * file count — rewrites leave old entries behind; only a rebuild
    * drops them). False when no map exists: [[maintain]] refreshes
    * what the operator built, it never builds new indexes. */
  private def zoneNeedsRebuild(): Boolean = try {
    val fs = fsOfRoot
    if (!fs.exists(zonePath)) return false
    val parts = fs.listStatus(zonePath)
      .count(p => p.isFile && p.getPath.getName.endsWith(".parquet"))
    if (parts > Lake.zonePartCap) return true
    val liveFiles = liveShardFiles(fs, readState()).values.map(_.size.toLong).sum
    val mapRows = readZone(fs).map(_.count()).getOrElse(0L)
    mapRows > 2L * math.max(1L, liveFiles)
  } catch { case scala.util.control.NonFatal(_) => false }

  /** ONE-CALL MAINTENANCE POLICY — what a platform team crons. Reads
    * the lake's own health signals and runs ONLY the work they
    * justify, so repeated calls on a converged lake are cheap no-ops
    * and a churned lake converges in one or two calls:
    *
    *  1. [[compactIncremental]] — rewrites only shards whose file
    *     count exceeds what their bytes justify (clean shards stay
    *     bit-identical);
    *  2. [[buildSkipIndex]] — only when [[skipStaleCount]] shows
    *     shards whose sketches no longer match their live files, and
    *     only if an index exists (maintain refreshes, never installs);
    *  3. [[buildZoneMap]] (with the map's own recorded field spec) —
    *     only on part-file or dead-entry bloat ([[zoneNeedsRebuild]]);
    *  4. [[vacuum]]`(retainMs)` — sweeps dead generations and
    *     superseded sidecars older than the consumer window.
    *
    * Each step takes the exclusive writer lock itself; a collision
    * with in-flight appends throws `ConcurrentModificationException`
    * like any maintenance op — retry on the next cadence tick. Work
    * per call is bounded by what actually churned: O(dirty shards)
    * rewrite + O(map)/O(shards) index refreshes + O(dead dirs) sweep.
    * Returns what ran. */
  /** Per-shard BYTE totals over the live set, summarized as
    * (max, median): the probe-cost signal behind the
    * `reshard_recommended` verdict — a single-probe topK reads one
    * shard directory, so its cost tracks the largest directory (the
    * worst-routed query) against the typical one. Pure listings,
    * O(live dirs), no row reads — cheap enough for every
    * [[maintain]]/[[validate]] tick. */
  private def shardSkewStats(st: LakeState): Option[(Long, Long)] = {
    val fs = fsOfRoot
    val perShard = liveEntries(st)
      .map { case (d, g) =>
        unescapePartitionValue(d.split("=", 2)(1)) ->
          (try fs.getContentSummary(
            new org.apache.hadoop.fs.Path(genPath(g), d)).getLength
          catch { case _: java.io.FileNotFoundException => 0L })
      }
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }
      .toSeq.sorted
    if (perShard.isEmpty) None
    else Some((perShard.max, perShard(perShard.size / 2)))
  }

  def maintain(targetBytes: Long = 128L * 1024L * 1024L,
      maxFilesPerShard: Int = 4,
      retainMs: Long = 7L * 24 * 3600 * 1000,
      clusterBy: Seq[Column] = Nil,
      ttlMs: Long = -1L,
      targetShardBytes: Long = Lake.defaultTargetShardBytes): Lake.MaintenanceReport = {
    if (!exists()) return Lake.MaintenanceReport(0L, false, false, 0L)
    // ONE sidecar read serves the tick's own telemetry (reshard state,
    // shard skew) — each sub-op below still re-reads under its own
    // lock, which is the serialization that matters. An in-flight
    // reshard owns the structure: the rewrite steps (compact/expire/
    // index builds) would be refused anyway, so skip them quietly,
    // keep the always-safe vacuum + recalibration, and surface the
    // pending count — the cron-driven maintain() tick stays a useful
    // health probe mid-reshard instead of a throw
    val tickState = readState()
    val reshardInFlight = tickState.reshard.map(r =>
      (1L << r.fromBits, 1L << r.toBits, r.pending.size.toLong))
    // retention FIRST: rows about to expire must not be paid for again
    // by the compaction rewrite below (and a wholesale retirement may
    // itself leave shards under the file-count slack). ttlMs < 0 = off.
    val expired =
      if (ttlMs < 0L || reshardInFlight.isDefined) 0L
      else {
        val (a, b) = expire(java.time.Instant.now().minusMillis(ttlMs))
        a + b
      }
    val compacted =
      if (reshardInFlight.isDefined) 0L
      else compactIncremental(targetBytes,
        clusterBy = clusterBy, maxFilesPerShard = maxFilesPerShard)
    val skip = reshardInFlight.isEmpty && skipStaleCount() > 0L && {
      buildSkipIndex(); true }
    val zone = reshardInFlight.isEmpty && zoneNeedsRebuild() && (zoneSpecFieldsChecked(fsOfRoot) match {
      // spec present but unreadable: SKIP this cycle's rebuild rather
      // than rebuild specless (which would silently drop the
      // operator-configured field pruning); the next maintain() retries
      case None => false
      case Some(fields) => buildZoneMap(fields); true
    })
    val swept = vacuum(retainMs = retainMs)
    // recall-ladder freshness: re-calibrate exactly when churn since
    // the last calibration crossed the drift threshold
    // ([[recallCalibStale]] scaladoc — a no-op maintain() pays one
    // sidecar read here, nothing else), reusing the persisted (k,
    // sample) so the refreshed ladder is comparable to the old one
    val recalibrated = recallCalibStale().contains(true) && {
      // a drained lake (churn = everything deleted) reads as maximally
      // stale but has nothing to sample — skip rather than fail the
      // whole maintenance tick; the stale calibration stays inert until
      // rows return (topKAtRecall on an empty lake returns empty rows
      // regardless of ladder)
      if (liveDataBytes() == 0L) false
      else recallCalibParams() match {
        case Some((k, sample)) => calibrateRecall(k, sample); true
        case None => calibrateRecall(); true
      }
    }
    // shard-health telemetry: the oversized-shard signal that says a
    // reshard is JUSTIFIED work — never auto-runs one (a reshard is an
    // operator decision: it rewrites the lake once and temporarily
    // refuses other maintenance); mid-reshard the recommendation stays
    // down and the pending count reports progress instead
    // NOTE the skew reads the PRE-maintenance state deliberately: the
    // tick's own compaction/expiry do not change per-shard BYTE skew
    // materially (they rewrite within shards), and one state serves
    // the whole report
    val skew = shardSkewStats(tickState)
    Lake.MaintenanceReport(compacted, skip, zone, swept, recalibrated,
      expired,
      maxShardBytes = skew.map(_._1).getOrElse(0L),
      medianShardBytes = skew.map(_._2).getOrElse(0L),
      reshardRecommended = reshardInFlight.isEmpty &&
        skew.exists(_._1 > targetShardBytes),
      reshardPendingDirs = reshardInFlight.map(_._3).getOrElse(0L))
  }

  def validate(targetShardBytes: Long = Lake.defaultTargetShardBytes): DataFrame = {
    val df = read()
    // ONE sidecar read serves every driver-side audit input below
    // (skew, reshard state, drift, the stored-column set) — on an
    // object store each readState is a remote GET, and an audit should
    // not pay five of them
    val auditState = readState()
    val skew = shardSkewStats(auditState)
    val pendingDirs = auditState.reshard.map(_.pending.size.toLong).getOrElse(0L)
    // FOOTER-DRIFT audit (round 11): the O(live files) mergeSchema
    // sweep that used to run on EVERY read now runs only here, where
    // an audit-priced pass belongs — count data columns any live
    // manifest-governed file carries beyond the declared stored set
    // (an out-of-contract foreign write; the pinned-schema read
    // serves such a file null-padded/projected instead of failing).
    // -1 = no live files to audit; unreadable footers surface as the
    // read error they are.
    val driftCols: Long = {
      val fs = fsOfRoot
      val files = liveShardFiles(fs, auditState)
        .values.flatten.map(_._1).toSeq
      if (files.isEmpty) -1L
      else {
        val merged = spark.read.option("mergeSchema", "true")
          .parquet(files: _*).schema.fieldNames.map(_.toLowerCase).toSet
        val declared = (storedColsOf(auditState) :+ partCol)
          .map(_.toLowerCase).toSet
        (merged -- declared).size.toLong
      }
    }
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
    // skip-index health, computed driver-side from listings (it is
    // metadata, not rows): shards whose recorded fingerprint no longer
    // matches the live file set; -1 = no index present
    val skipStale: Long = skipStaleCount()
    // functions.count is shadowed by Lake.count() inside this class
    val rowsAgg = org.apache.spark.sql.functions.count(lit(1))
    // schema-evolution drift visibility: rows all-null across every
    // registered extra column predate the evolution (or lost their
    // values); -1 = no extras registered
    val preEvolve: Column = currentExtraFields match {
      case Nil => unconfigured
      case ex => violations(ex.map(f => col(f.name).isNull).reduce(_ && _))
    }
    df.agg(
      rowsAgg.as("rows"),
      misrouted.as("misrouted"),
      (rowsAgg - countDistinct(col("id"))).as("dup_ids"),
      badPacked.as("bad_packed"),
      badPq.as("bad_pq"),
      violations(coalesce(size(col("vector")), lit(-1)) =!= cfg.dim)
        .as("bad_dim"),
      preEvolve.as("pre_evolve_rows"))
      .withColumn("skip_stale", lit(skipStale))
      // shard-health skew (driver-side listings, like skip_stale):
      // max vs median live bytes per shard — the probe-cost estimate a
      // single-probe query pays on its worst vs typical route — plus
      // the reshard signals; -1 = empty lake / no shards
      .withColumn("max_shard_bytes", lit(skew.map(_._1).getOrElse(-1L)))
      .withColumn("median_shard_bytes", lit(skew.map(_._2).getOrElse(-1L)))
      .withColumn("reshard_pending_dirs", lit(pendingDirs))
      // same threshold semantics as maintain(targetShardBytes) — pass
      // the deployment's tuned value for a consistent verdict (the
      // no-arg form and the SQL `validate` view use the default)
      .withColumn("reshard_recommended",
        lit(pendingDirs == 0L && skew.exists(_._1 > targetShardBytes)))
      .withColumn("drift_cols", lit(driftCols))
  }

  /** Test/tooling hook: the current generation's subtree path (appends
    * and the streaming sink land here). */
  private[graft] def currentGenDir: String =
    genPath(readState().generation).toString

  /** Test/tooling hook: every live partition directory as
    * (escaped-dir-name, full path) — one dir name may appear under
    * several generations. */
  private[graft] def liveDirPaths(): Seq[(String, org.apache.hadoop.fs.Path)] =
    liveEntries(readState()).map { case (d, g) =>
      d -> new org.apache.hadoop.fs.Path(genPath(g), d)
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

  /** True iff the lake holds DATA: a live manifest entry or a partition
    * directory / parquet file in the current generation's tree. A
    * location carrying only sidecar / `_SUCCESS` markers (e.g. after
    * `deleteWhere` retired every shard) counts as empty — the parquet
    * reader cannot infer a schema from markers alone, so every data
    * path must take the bootstrap branch. */
  def exists(): Boolean = {
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val st = readStateFrom(fs, entries)
    st.live.exists(_._2 != st.generation) ||
      treeHasData(fs, genPath(st.generation)) ||
      rootLevelDataFrom(entries).nonEmpty
  }

  /** The live-data pointer + config stamp, stored as VERSIONED sidecar
    * files `_meta.<v>.json` under the root — the commit point of every
    * maintenance op (layout v2). Replaces the reference's parquet-attrs
    * `last_update` stamp (index.py:296-305) and adds what the reference
    * has no answer for: object-store-atomic maintenance. Each write
    * CREATES a NEW version (exclusive create — an atomic PUT of a new
    * key on any store, never an in-place truncate a reader could catch
    * half-written); readers take the highest version. A handful of
    * superseded versions are kept for readers that listed just before a
    * commit; older ones are swept here and by [[vacuum]]. */
  private def fsOfRoot: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One listing of the root — the shared basis for sidecar-version
    * discovery, root-level-data detection, and generation-dir checks,
    * so a hot-path read() pays ONE LIST round trip, not one per
    * concern (an object-store latency tax otherwise). */
  private def listRoot(fs: org.apache.hadoop.fs.FileSystem): Seq[org.apache.hadoop.fs.FileStatus] = {
    val root = new org.apache.hadoop.fs.Path(cfg.location)
    def once(): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(root)) Nil else fs.listStatus(root).toSeq
    // a directory listing under concurrent churn is NOT a snapshot: a
    // readdir racing the sidecar rotation's create/delete can
    // transiently miss an entry that existed throughout. A listing that
    // shows generation data but NO sidecar is that race's signature —
    // a lake with a generation tree always has a sidecar (the first
    // append commits one before returning) except for the short
    // first-ingest window, so re-list briefly before believing it.
    // Downstream, a missed sidecar would not fail loudly: readState
    // would fall back to the DEFAULT state and a read would silently
    // serve only the current generation, dropping every manifest-named
    // directory.
    var entries = once()
    def hasSidecar(es: Seq[org.apache.hadoop.fs.FileStatus]): Boolean =
      es.exists(s => s.isFile && (s.getPath.getName == "_meta.json" ||
        metaNameRe.pattern.matcher(s.getPath.getName).matches()))
    // the race signature is DATA visible with no sidecar: generation
    // trees, or root-level data (an adopted pre-v2 flat lake whose
    // bootstrap/re-stamp rotations can transiently hide its versioned
    // sidecar from a racing readdir — gating on gen dirs alone would
    // hand such a reader the silent default state)
    def looksRacy(es: Seq[org.apache.hadoop.fs.FileStatus]): Boolean =
      es.nonEmpty && !hasSidecar(es) &&
        (es.exists(s => s.isDirectory &&
          Lake.genDirRe.pattern.matcher(s.getPath.getName).matches()) ||
          rootLevelDataFrom(es).nonEmpty)
    // retry gating: the race signature (gen data, no sidecar) has two
    // benign look-alikes — a FIRST ingest legitimately in flight (its
    // sidecar commits only after the data lands, possibly seconds
    // later) and a crash-stranded first ingest (permanent until
    // repair). Retrying forever against those taxes every read path
    // ~150 ms, but NEVER retrying reopens the silent default-state
    // read on a genuine rotation miss. The discriminator is history:
    // once THIS instance has seen a sidecar, a later sidecarless
    // listing can only be a transient miss (sidecars are rotated,
    // never all deleted) — always retry. Before any sidecar was ever
    // seen, pay the retries once (the first listing may genuinely
    // race a first commit) and then stop.
    if (hasSidecar(entries)) sidecarSeen = true
    var tries = 0
    while (tries < 3 && looksRacy(entries) &&
        (sidecarSeen || !sidecarlessChecked)) {
      tries += 1
      Thread.sleep(25L * tries)
      entries = once()
      if (hasSidecar(entries)) sidecarSeen = true
    }
    if (!sidecarSeen && looksRacy(entries)) sidecarlessChecked = true
    entries
  }

  /** listRoot retry-gating state (scaladoc at the use site): whether
    * this instance ever observed a committed sidecar (=> sidecarless
    * listings are transient misses, always worth retrying), and
    * whether the one pre-sidecar retry round was already spent. */
  @volatile private var sidecarSeen = false
  @volatile private var sidecarlessChecked = false

  /** (version, path) of every sidecar version in a root listing. */
  private def metaVersionsFrom(entries: Seq[org.apache.hadoop.fs.FileStatus]): Seq[(Long, org.apache.hadoop.fs.Path)] =
    entries.flatMap { s =>
      s.getPath.getName match {
        case metaNameRe(v) if s.isFile => Some(v.toLong -> s.getPath)
        case _ => None
      }
    }

  private def metaVersions(fs: org.apache.hadoop.fs.FileSystem): Seq[(Long, org.apache.hadoop.fs.Path)] =
    metaVersionsFrom(listRoot(fs))

  /** State parsed from the newest sidecar in a root listing (legacy
    * single-file sidecar read-compatibly; no sidecar = fresh lake). */
  private def readStateFrom(fs: org.apache.hadoop.fs.FileSystem,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): LakeState = {
    // the listed newest version can be rotated out between the listing
    // and this read when writers are stamping rapidly (rotation keeps
    // the newest few, so two commits in the window retire the listed
    // max) — re-list and re-pick instead of failing a healthy lake
    var es = entries
    var tries = 0
    while (true) {
      val versions = metaVersionsFrom(es)
      try {
        return if (versions.nonEmpty)
          parseState(readFully(fs, versions.maxBy(_._1)._2))
        else es.find(s => s.isFile && s.getPath.getName == "_meta.json")
          .map(s => parseState(readFully(fs, s.getPath)))
          .getOrElse(LakeState(1L, Nil))
      } catch {
        case _: java.io.FileNotFoundException if tries < 3 =>
          tries += 1
          Thread.sleep(25L * tries)
          es = listRoot(fs)
      }
    }
    LakeState(1L, Nil) // unreachable
  }

  /** Current on-disk state: generation (the append target — its whole
    * tree is live) plus the manifest of live directories in OLDER
    * generations as (escaped-dir-name, generation) pairs. A lake with
    * no sidecar yet is generation 1 with an empty manifest. */
  private def readState(): LakeState = {
    val fs = fsOfRoot
    readStateFrom(fs, listRoot(fs))
  }

  private def parseState(json: String): LakeState = {
    val gen = """"generation"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(1L)
    val live = """\[\s*"((?:[^"\\]|\\.)*)"\s*,\s*(\d+)\s*\]""".r
      .findAllMatchIn(json)
      .map(m => unescapeJson(m.group(1)) -> m.group(2).toLong).toSeq
    // no fallback to this field's short-lived predecessor ("has_data",
    // renamed same-round): its semantics included manifest entries, so
    // treating it as generation-specific would FALSELY refuse legitimate
    // manifest-only snapshots; absent field = no vacuumed-snapshot check
    val genHasData = """"gen_has_data"\s*:\s*(true|false)""".r
      .findFirstMatchIn(json).map(_.group(1) == "true")
    val isSealed = """"sealed"\s*:\s*true""".r.findFirstIn(json).isDefined
    // schema-evolution extras: each entry is one escaped
    // "name<U+0001>catalog-ddl" string (the \u0001 separator survives
    // escapeJson/unescapeJson and cannot appear in either part)
    val extraCols = """"extra_cols"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json)
      .map(m => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1))
        .map(e => unescapeJson(e.group(1)).split("\u0001", 2))
        .collect { case Array(n, t) => n -> t }.toSeq)
      .getOrElse(Nil)
    val sidecarShards = """"num_shards"\s*:\s*(-?\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toLong)
    val lastUpdate = """"last_update"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(json).map(_.group(1))
    // in-flight reshard: pending entries are {"d": dir, "g": gen}
    // OBJECTS, deliberately shaped so the `live` pair-regex above can
    // never absorb them (and vice versa)
    val reshard = for {
      from <- """"reshard_from"\s*:\s*(\d+)""".r
        .findFirstMatchIn(json).map(_.group(1).toLong)
      to <- """"reshard_to"\s*:\s*(\d+)""".r
        .findFirstMatchIn(json).map(_.group(1).toLong)
    } yield ReshardState(
      java.lang.Long.numberOfTrailingZeros(from),
      java.lang.Long.numberOfTrailingZeros(to),
      """\{\s*"d"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"g"\s*:\s*(\d+)\s*\}""".r
        .findAllMatchIn(json)
        .map(m => unescapeJson(m.group(1)) -> m.group(2).toLong).toSeq,
      """"reshard_skip"\s*:\s*true""".r.findFirstIn(json).isDefined)
    // FILE-level manifest entries: {"fd": dir, "fg": gen, "fn": "a;b",
    // "fl": "1;2", "fm": "3;4"} objects — keys deliberately distinct
    // from the reshard-pending {"d","g"} shape so neither regex can
    // absorb the other, names/lengths/mods as ';'-joined strings so no
    // nested array can collide with the `live` pair-regex above
    val liveFiles: Map[(String, Long), Seq[LiveFile]] =
      """\{\s*"fd"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"fg"\s*:\s*(\d+)\s*,\s*"fn"\s*:\s*"([^"]*)"\s*,\s*"fl"\s*:\s*"([^"]*)"\s*,\s*"fm"\s*:\s*"([^"]*)"\s*\}""".r
        .findAllMatchIn(json).flatMap { m =>
          // a torn/hand-edited entry (mismatched arity, non-numeric
          // length) is dropped, not thrown: absence just means the
          // reader lists that directory
          try {
            def parts(s: String): Seq[String] =
              if (s.isEmpty) Nil else s.split(";", -1).toSeq
            val names = parts(m.group(3))
            val lens = parts(m.group(4)).map(_.toLong)
            val mods = parts(m.group(5)).map(_.toLong)
            if (names.size != lens.size || names.size != mods.size) None
            else Some((unescapeJson(m.group(1)) -> m.group(2).toLong) ->
              names.indices.map(i => LiveFile(names(i), lens(i), mods(i))))
          } catch { case _: NumberFormatException => None }
        }.toMap
    LakeState(gen, live, genHasData, isSealed, extraCols, sidecarShards,
      reshard, lastUpdate, liveFiles)
  }

  /** Best-effort `last_update` stamp for the streaming path. The
    * read-modify-write runs UNDER the writer lock: an unlocked stamp
    * racing a maintenance commit could republish the stale pre-commit
    * state as the newest sidecar version — a lost update that the next
    * vacuum would turn into data loss (the `_spark_metadata` guard only
    * protects once the sink has written its manifest, which batch 0 may
    * not have yet). On contention the stamp is simply skipped; the next
    * data-carrying micro-batch retries. */
  private def stampQuietly(): Unit =
    try withWriterLock("stamp")(writeState(readState()))
    catch { case _: java.util.ConcurrentModificationException => () }

  /** Commit `st` (and refresh `last_update`): create sidecar version
    * latest+1. MAINTENANCE callers (and the streaming stamp via
    * [[stampQuietly]]) hold the exclusive writer lock, so
    * structure-changing read-modify-writes are serialized. SHARED-gate
    * appends ([[withAppendLock]]) may call this CONCURRENTLY — safe
    * because an append's stamp republishes the manifest it re-read
    * under the gate (maintenance excluded, so every racing append
    * carries the IDENTICAL manifest, stamps differing only in
    * `last_update`); version allocation arbitrates via
    * `create(overwrite=false)` + bump on POSIX/HDFS, and on a
    * plain-S3-semantics store (where two PUTs of the same name both
    * "succeed" — the documented lock residual) a clobbered append stamp
    * loses nothing but its duplicate timestamp. Returns the version
    * written. `sealedCommit` marks the version as a [[seal]] sync point
    * — exempt from the inline rotation below (only [[vacuum]] retires
    * sync points), and resolved manifest-only by readers. */
  private def writeState(st: LakeState, sealedCommit: Boolean = false): Long = {
    val fs = fsOfRoot
    // ONE root listing serves version discovery AND the stranded-tmp
    // sweep below — a second LIST per commit is pure object-store tax
    val rootEntries = listRoot(fs)
    val versions = metaVersionsFrom(rootEntries)
    val latest = if (versions.isEmpty) 0L else versions.map(_._1).max
    val pqField = cfg.pqCodebooks
      .map(m => s""", "pq_fingerprint": "${m.fingerprint}"""").getOrElse("")
    val seedField =
      if (cfg.partitionKey.isEmpty) s""", "lsh_seed": ${cfg.seed}""" else ""
    // self-description the SQL format needs to reconstruct THIS config
    // (GraftDataSource.resolveConfig): whether rows carry the packed
    // sign-bit column, and the user partition key's NAME (num_shards=-1
    // already says "user-keyed" but not what the column is called)
    val packField =
      if (cfg.packSignBits) s""", "pack_sign_bits": true""" else ""
    val partKeyField = cfg.partitionKey
      .map(k => s""", "partition_key": "${escapeJson(k)}"""").getOrElse("") +
      // ... and its TYPE: without it the SQL surface resolves a
      // Scala-created IntegerType-keyed lake with the StringType
      // default, and format reads / DML serve a string-typed key
      // column diverging from the Scala API's
      cfg.partitionKey.map(_ =>
        s""", "partition_key_type": "${escapeJson(cfg.partitionKeyType.catalogString)}"""")
        .getOrElse("")
    val sealedField = if (sealedCommit) s""", "sealed": true""" else ""
    val liveField = st.live
      .map { case (d, g) => s"""["${escapeJson(d)}", $g]""" }
      .mkString("[", ", ", "]")
    // gen_has_data: whether the CURRENT generation's tree held data at
    // commit time — readAt's loud-failure contract needs to tell
    // "snapshot of an empty/manifest-only lake" apart from "snapshot
    // whose own generation was vacuumed"
    val genHasData = treeHasData(fs, genPath(st.generation))
    // schema-evolution extras ride EVERY commit (states are re-read
    // before each writeState, so append stamps / seals / rewrites all
    // carry them forward); absent field = no extras, full back-compat
    val extraField =
      if (st.extraCols.isEmpty) ""
      else st.extraCols
        .map { case (n, t) => s""""${escapeJson(n + "\u0001" + t)}"""" }
        .mkString(""", "extra_cols": [""", ", ", "]")
    // declared routing width: mid-reshard states declare the TARGET
    // width (the transition commit is written by the pre-reshard
    // session, whose own lsh is still the narrow one); otherwise the
    // carried sidecar width and the writer's are equal by the
    // per-write guard, and fresh states fall back to the writer's
    val numShardsField: Long =
      if (cfg.partitionKey.isDefined) -1L
      else st.reshard.map(r => 1L << r.toBits)
        .orElse(st.sidecarShards.filter(_ > 0))
        .getOrElse(lsh.numShards.toLong)
    val reshardField = st.reshard.map { r =>
      val pend = r.pending
        .map { case (d, g) => s"""{"d": "${escapeJson(d)}", "g": $g}""" }
        .mkString("[", ", ", "]")
      s""", "reshard_from": ${1L << r.fromBits}, "reshard_to": ${1L << r.toBits}, "reshard_pending": $pend""" +
        (if (r.hadSkipIndex) s""", "reshard_skip": true""" else "")
    }.getOrElse("")
    // FILE-level manifest (guide §6): record each live entry's data
    // files AT COMMIT TIME so reads plan with zero per-directory
    // listings. Committed (dir, generation) entries are immutable until
    // vacuum retires them wholesale (appends land only in the CURRENT
    // generation; every rewrite publishes into a FRESH generation), so
    // entries carried forward reuse the lists already recorded — only
    // entries NEW to the manifest are listed, once, here on the write
    // path. States constructed without the carried map (most callers
    // build fresh LakeStates) recover it from the newest committed
    // sidecar: any committed copy is equally valid by the immutability
    // invariant. An entry whose file names cannot ride the ';'-joined
    // encoding (foreign tooling) is simply not recorded — readers fall
    // back to listing that directory, never misread it.
    val filesField: String = {
      if (st.live.isEmpty) ""
      else {
        val prev: Map[(String, Long), Seq[Lake.LiveFile]] =
          if (st.liveFiles.nonEmpty) st.liveFiles
          else readStateFrom(fs, rootEntries).liveFiles
        def safe(n: String): Boolean =
          !n.contains(';') && !n.contains('"') && !n.contains('\\') &&
            n.forall(_ >= ' ')
        // CURRENT-generation entries are excluded: that tree is
        // live-by-rule (appends land there without a commit), so a
        // recorded list would go stale the moment one lands — readers
        // list it, always
        val recorded = st.live.distinct.filter(_._2 != st.generation)
          .flatMap { case e @ (d, g) =>
          val files = prev.get(e).orElse {
            try Some(dataFilesIn(fs, new org.apache.hadoop.fs.Path(genPath(g), d))
              .map(s => Lake.LiveFile(s.getPath.getName, s.getLen,
                s.getModificationTime)))
            catch { case _: java.io.FileNotFoundException => None }
          }
          files.filter(_.forall(f => safe(f.name))).map(e -> _)
        }
        if (recorded.isEmpty) ""
        else recorded.map { case ((d, g), fl) =>
          s"""{"fd": "${escapeJson(d)}", "fg": $g, """ +
            s""""fn": "${fl.map(_.name).mkString(";")}", """ +
            s""""fl": "${fl.map(_.len).mkString(";")}", """ +
            s""""fm": "${fl.map(_.mod).mkString(";")}"}"""
        }.mkString(""", "files": [""", ", ", "]")
      }
    }
    val json = s"""{"last_update": "${java.time.Instant.now()}", "dim": ${cfg.dim}, "metric": "${cfg.metric}", "num_shards": $numShardsField$seedField$pqField$packField$partKeyField$sealedField$extraField$reshardField$filesField, "generation": ${st.generation}, "live": $liveField, "gen_has_data": $genHasData}"""
    // ATOMIC publish: the body lands in a root-sibling tmp (a name no
    // discovery regex matches) and is RENAMED into its version name.
    // A create-in-place briefly exposes an EMPTY `_meta.<v>.json`
    // (create() makes the entry before write/close lands the bytes),
    // and a reader catching that window parses the DEFAULT state —
    // silently serving only the current generation, or failing a
    // format resolution with "no dim" (observed under two concurrent
    // SQL writers). Version-allocation arbitration: HDFS rename
    // refuses an existing destination (bump and retry); POSIX rename
    // CLOBBERS — there, two stamps racing past the exists() pre-check
    // can land on one version and the earlier body is lost. That loss
    // is bounded by the stamping rules: only SHARED-gate appends ever
    // stamp concurrently (maintenance and seal hold the exclusive
    // writer lock), and racing append stamps carry the IDENTICAL
    // manifest (re-read under the gate, maintenance excluded), so a
    // clobber forfeits nothing but a duplicate last_update — the same
    // residual the previous in-place create had on plain-S3 stores,
    // now shared by local-FS runs and documented as such. On real
    // object stores the publish stays torn-free for a different
    // reason: rename is a server-side copy and object visibility is
    // all-or-nothing (no reader ever sees a partial object) — only
    // stream-copying stand-ins (the test BucketFs) retain a window,
    // which their PUT-semantics caveat already covers.
    val tmp = new org.apache.hadoop.fs.Path(cfg.location,
      s"_meta.tmp.${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    var v = latest + 1
    var done = false
    try {
      while (!done) {
        val dst = new org.apache.hadoop.fs.Path(cfg.location, s"_meta.$v.json")
        if (fs.exists(dst)) v += 1 // a racing stamp took this version
        else if (fs.rename(tmp, dst)) done = true
        else {
          // rename refusal without a visible destination: either the
          // rival's create won the same instant (bump) or the tmp is
          // gone (a real store failure — loud, never a silent no-stamp)
          require(fs.exists(tmp),
            s"sidecar publish at ${cfg.location}: staged version body " +
              s"$tmp vanished before rename — store failure")
          // bounded: a store whose rename persistently returns false
          // while the tmp survives would otherwise bump forever where
          // the old in-place create failed loudly with its IOException
          require(v < latest + 10000,
            s"sidecar publish at ${cfg.location}: rename refused " +
              s"${v - latest} consecutive versions with the staged body " +
              "still present — store rename is failing, not racing")
          v += 1
        }
      }
    } finally if (!done) {
      try { fs.delete(tmp, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // sweep far-superseded versions; keep a few for in-flight readers.
    // SEALED versions are exempt: they are the change-feed's sync
    // points, and consumers hold them across arbitrarily many commits —
    // only the operator-invoked vacuum() retires them. Sealedness is
    // memoized per version (immutable once written), so a long-lived
    // writer pays ONE control-file read per retained seal, not one per
    // commit; an UNREADABLE sidecar counts as sealed — failing open
    // here would let a transient read error delete a consumer's sync
    // point, the exact loss the exemption exists to prevent (vacuum
    // retires genuinely dead versions later).
    versions.filter(_._1 < v - keptMetaVersions)
      .filterNot { case (ver, p) =>
        sealedCache.getOrElseUpdate(ver,
          try parseState(readFully(fs, p)).isSealed
          catch { case scala.util.control.NonFatal(_) => true }) }
      .foreach(p => fs.delete(p._2, false))
    // stranded publish bodies (a JVM that died between staging and
    // rename) are inert — no regex matches them — but sweep the old
    // ones anyway (from the already-taken listing); age-gated so no
    // live writer's in-flight tmp is hit
    try rootEntries.foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith("_meta.tmp.") &&
          System.currentTimeMillis() - s.getModificationTime > 3600000L)
        fs.delete(s.getPath, false)
    } catch { case scala.util.control.NonFatal(_) => () }
    v
  }

  /** Version → isSealed memo for the rotation exemption above (a
    * version's sealedness never changes once written; entries for
    * vacuum-retired versions are just dead keys, bounded by seals ever
    * observed in this session). */
  private val sealedCache =
    scala.collection.concurrent.TrieMap.empty[Long, Boolean]

  private def readMetaSidecar(): Option[String] = {
    val fs = fsOfRoot
    val entries = listRoot(fs)
    val versions = metaVersionsFrom(entries)
    val p =
      if (versions.nonEmpty) Some(versions.maxBy(_._1)._2)
      else // pre-v2 single-file sidecar, read-only compatibility
        entries.find(s => s.isFile && s.getPath.getName == "_meta.json")
          .map(_.getPath)
    p.map(readFully(fs, _))
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
  private def jsonLongField(json: String, name: String): Option[Long] =
    (s""""$name"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(json)
      .map(_.group(1).toLong)

  /** Per-OPERATION routing-width check against a state already in
    * hand — zero extra I/O. [[routingChecked]] is once-per-instance
    * (lazy): it cannot catch a Lake instance whose lake was RESHARDED
    * underneath it by another session after construction, and such a
    * stale instance would prune the wrong directory on reads or
    * append mis-routed rows. Reads check here per [[readFrom]] call
    * (the state read was already paid); writes check inside
    * [[requireWriteConfigMatch]] (the sidecar read was already paid)
    * and again in [[writeAppend]] under the append gate (closing the
    * check-then-act window against a racing reshard transition). */
  private def requireStateWidth(st: LakeState, op: String): Unit =
    if (cfg.partitionKey.isEmpty)
      st.sidecarShards.filter(_ > 0).foreach(ns => require(
        ns == lsh.numShards,
        s"$op at ${cfg.location}: the lake is routed into $ns LSH " +
          s"shards but this session's config routes into " +
          s"${lsh.numShards} — the lake was likely resharded after " +
          "this Lake instance was constructed; build a fresh Lake at " +
          "the sidecar's width"))

  /** Structure-changing maintenance is mutually exclusive with an
    * in-flight incremental reshard: compaction/DML/retention group
    * directories BY VALUE, and mid-reshard the same value names both
    * an old-width pending directory and a new-width one — a rewrite
    * would merge mixed-width rows or strand pending references.
    * Appends, reads, clones, and vacuum stay available; everything
    * else waits for (or resumes) the reshard. */
  private def requireNoReshard(st: LakeState, op: String): Unit =
    st.reshard.foreach { r =>
      throw new IllegalStateException(
        s"$op on ${cfg.location} refused: an incremental reshard " +
          s"${1L << r.fromBits} -> ${1L << r.toBits} shards is in " +
          s"flight (${r.pending.size} directories still at the old " +
          "width) — finish it first: reshard(newNumHashes) resumes " +
          "and is interruptible")
    }

  private lazy val routingChecked: Unit =
    readMetaSidecar().foreach { json =>
      def longField(name: String): Option[Long] = jsonLongField(json, name)
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
    pqFingerprintMatch(if (cfg.pqCodebooks.isDefined) readMetaSidecar() else None)

  /** Fingerprint equality when BOTH sides carry one — shared by the
    * read guard ([[requirePqModelMatch]], which pays the sidecar read
    * only for PQ sessions) and the write guard (which already holds
    * the sidecar body — no second read, G4). */
  private def pqFingerprintMatch(json: Option[String]): Unit =
    cfg.pqCodebooks.foreach { m =>
      for {
        j <- json
        found <- """"pq_fingerprint"\s*:\s*"([0-9a-f]+)"""".r
          .findFirstMatchIn(j).map(_.group(1))
      } require(found == m.fingerprint,
        s"lake at ${cfg.location} stores pq_code under codebook fingerprint " +
          s"$found but this session's model fingerprints ${m.fingerprint}; " +
          "mixing codes from different trainings silently corrupts topKPq — " +
          "construct the Lake with the model that first wrote it")
    }

  /** WRITE-side config guard: the session's compression config and the
    * sidecar's recorded one must agree IN BOTH DIRECTIONS before any
    * write or rewrite — one sidecar read covers every check.
    *
    *  - Session LACKS a compression the sidecar declares: refuse —
    *    [[withDerived]] would append rows WITHOUT `pq_code`/`packed`
    *    (and rewrites would strip them), null-poisoning compressed
    *    search silently. This is the sharp direction for the SQL
    *    format (whose `resolveConfig` cannot rebuild codebooks from a
    *    fingerprint) and misconstructed Scala sessions, both of which
    *    pass the fingerprint-equality check vacuously.
    *  - Session DECLARES a compression the sidecar doesn't, over a
    *    lake that already holds data: refuse — the write would stamp
    *    the new config into the sidecar as authoritative, poisoning
    *    every pre-existing row (null `packed`/`pq_code`) AND locking
    *    the original, correct config out via the first rule. A
    *    data-less lake may upgrade freely (the next write defines the
    *    layout), and a pre-recording lake whose files genuinely carry
    *    the column is re-stamped deliberately with [[bootstrap]] under
    *    the full config — the documented one-time migration.
    *
    * READS stay open under any config — `pq_code`/`packed` are plain
    * columns to a plain read. */
  private def requireWriteConfigMatch(): Unit = {
    val json = readMetaSidecar()
    requireNoLesserConfig(json)
    json.foreach { j =>
      // routing width, per WRITE (not just per instance): a stale
      // session writing at the pre-reshard width would append
      // mis-routed rows or stamp the old width back over the sidecar
      if (cfg.partitionKey.isEmpty)
        jsonLongField(j, "num_shards").filter(_ > 0).foreach(ns =>
          require(ns == lsh.numShards,
            s"write at ${cfg.location} refused: the lake is routed " +
              s"into $ns LSH shards but this session writes at " +
              s"${lsh.numShards} — it was likely resharded after this " +
              "Lake instance was constructed; build a fresh Lake at " +
              "the sidecar's width"))
      val sidecarPq =
        """"pq_fingerprint"\s*:\s*"[0-9a-f]+"""".r.findFirstIn(j).isDefined
      val sidecarPacked =
        """"pack_sign_bits"\s*:\s*true""".r.findFirstIn(j).isDefined
      val upgrades =
        (if (cfg.pqCodebooks.isDefined && !sidecarPq) Seq("pqCodebooks") else Nil) ++
          (if (cfg.packSignBits && !sidecarPacked) Seq("packSignBits") else Nil)
      // check-then-act residual: two CONCURRENT first writes under the
      // shared append gate (one plain, one upgraded) can both see an
      // empty lake here and both land — whichever sidecar version wins
      // then misdescribes the loser's rows. Same class of residual as
      // the PUT-semantics lock notes: serialized first writes (the
      // universal case — someone creates the lake, then loaders attach)
      // are fully defended.
      if (upgrades.nonEmpty && exists())
        throw new IllegalArgumentException(
          s"lake at ${cfg.location} holds rows written WITHOUT " +
            s"${upgrades.mkString("/")}, but this session declares " +
            s"${upgrades.mkString("/")} — writing would stamp the new " +
            "config as authoritative and null-poison every existing row's " +
            "compressed search (then refuse the original config). Create " +
            "compressed lakes compressed from the start; if this lake's " +
            "files genuinely carry the column (written before the sidecar " +
            "recorded the flag), re-stamp once with bootstrap() under the " +
            "full config.")
    }
  }

  /** The LESSER direction of the write-config guard alone (sidecar
    * declares a compression this session's config lacks) — what
    * [[bootstrap]] checks, since bootstrap is itself the documented
    * upgrade path and must not trip the upgrade refusal. */
  private def requireNoLesserConfig(json: Option[String]): Unit = {
    pqFingerprintMatch(json)
    json.foreach { j =>
      val sidecarPq =
        """"pq_fingerprint"\s*:\s*"[0-9a-f]+"""".r.findFirstIn(j).isDefined
      val sidecarPacked =
        """"pack_sign_bits"\s*:\s*true""".r.findFirstIn(j).isDefined
      if (cfg.pqCodebooks.isEmpty && sidecarPq)
        throw new IllegalArgumentException(
          s"lake at ${cfg.location} stores pq_code (the sidecar records a " +
            "codebook fingerprint) but this session has no pqCodebooks — " +
            "writing would append/rewrite rows without their codes and " +
            "silently corrupt topKPq. Construct the Lake (or pass options) " +
            "with the lake's model; SQL-surface writes to PQ lakes need " +
            "the Scala session that holds it.")
      if (!cfg.packSignBits && sidecarPacked)
        throw new IllegalArgumentException(
          s"lake at ${cfg.location} stores the packed sign-bit column but " +
            "this session has packSignBits=false — writing would " +
            "append/rewrite rows without `packed` and silently corrupt " +
            "topKCompressed. Set packSignBits=true (option or config).")
    }
  }
}

object Lake {
  /** The ONE short-read-safe control-file reader (class Lake, the
    * DSv2 provider, and DerivedTable all read sidecar-sized files
    * through it — a short-read fix must land once). */
  private[graft] def readControlFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }

  private[graft] def escapeJson(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def unescapeJson(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => sb.append(e); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape-aware named string field over sidecar JSON — the ONE
    * correct way to read back a string the writer passed through
    * [[escapeJson]]: a naive `[^"]*` capture stops at an escaped quote
    * and resolves a corrupted value. Any new string field added to the
    * sidecar must be read through this (array-shaped fields like
    * `live`/`extra_cols` carry the same escape-aware element pattern
    * inline). */
  private[graft] def escapedStrField(json: String, name: String): Option[String] =
    (s""""${java.util.regex.Pattern.quote(name)}"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
      .findFirstMatchIn(json).map(m => unescapeJson(m.group(1)))

  /** Writer-lock marker file name, under the lake root. Underscore
    * prefix keeps it out of Spark's file index (never read as data). */
  private[graft] val lockName: String = "_lock"

  /** One canonical spelling of a data-file path for zone-map matching
    * (see the instance-side scaladoc at the call sites). STATIC so the
    * distributed verdict join's udf closure captures a plain function,
    * never the Lake instance (which holds the SparkSession and cannot
    * ship to executors). */
  private[graft] def zoneKey(p: String): String =
    (try Option(new java.net.URI(p).getPath)
     catch { case _: java.net.URISyntaxException => None })
      .getOrElse(new org.apache.hadoop.fs.Path(p).toUri.getPath)

  /** Hadoop's createFile builder key for a conditional (If-None-Match)
    * create, and the path-capability name a store advertises when it
    * honors it (HADOOP-19256, s3a since 3.4.x:
    * `Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_OVERWRITE`).
    * Spelled out so this compiles against hadoop-client-api without
    * the s3a jar on the classpath. */
  private[graft] val conditionalCreateKey: String =
    "fs.option.create.conditional.overwrite"

  /** What one [[Lake.maintain]] call actually ran — all-zero/false on
    * a converged lake. */
  final case class MaintenanceReport(
      compactedShards: Long, skipRefreshed: Boolean,
      zoneRebuilt: Boolean, vacuumSwept: Long,
      recallRecalibrated: Boolean = false,
      expiredRows: Long = 0L,
      maxShardBytes: Long = 0L,
      medianShardBytes: Long = 0L,
      reshardRecommended: Boolean = false,
      reshardPendingDirs: Long = 0L)

  /** Default oversized-shard threshold behind the
    * `reshard_recommended` signal ([[Lake.maintain]]'s
    * `targetShardBytes`): a single-probe query reads one shard
    * directory, so once the LARGEST directory crosses this, one more
    * hyperplane (which halves every directory) is justified work —
    * the same health-signal discipline as the compaction policy's
    * file-count slack. 8 GiB ≈ a few seconds of columnar scan per
    * probe on one executor; tune per latency budget. */
  val defaultTargetShardBytes: Long = 8L * 1024 * 1024 * 1024

  /** `_zone` part-file count past which an append's refresh compacts
    * the map into one part (see `compactZoneParts`). System-property
    * override exists for tests (compacting only past 64 real appends
    * would make the spec ingest 64 times). */
  private[graft] def zonePartCap: Int =
    sys.props.get("graft.zone.partCap").map(_.toInt).getOrElse(64)

  /** Shared append-marker names: `_append.<uuid>.lock` under the root.
    * Appends hold one of these (any number concurrently) instead of the
    * exclusive `_lock`; maintenance refuses while any is present. */
  private[graft] val appendMarkerRe = "_append\\.[0-9a-f-]+\\.lock".r

  /** Inverse of Spark's partition-path escaping (the behavior of
    * catalyst's `ExternalCatalogUtils.unescapePathName`, reimplemented
    * to stay off the internal API): `%XX` → char, the Hive null
    * sentinel → None. The single shared implementation for the Scala
    * read paths AND the DSv2 format's partition-value decoding. */
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

  /** Column names the engine DERIVES onto query outputs or uses as
    * rewrite-plan internals — refused by [[Lake.evolve]] (a stored
    * extra with one of these names would be clobbered by the
    * `withColumn` that derives it, or corrupt an internal join). */
  private[graft] val reservedDerivedCols: Set[String] = Set(
    "change", "dist", "packed", "pq_code", "qnrm", "qshard",
    "_mcmp", "_slice", "n_slices", "__routed", "shard_s", "key_s",
    "spec_fp", "skip_stale",
    // the DSv2 row-level DML metadata column (GraftTable.RidName): a
    // DATA column with this name would shadow it and break UPDATE/MERGE
    "_graft_rid")

  /** Staleness horizon for a sink attempt's pend marker: an attempt
    * HEARTBEATS its marker every `pendStaleMs / 4`, so a marker this
    * old means the attempt's JVM is dead (crash) rather than slow —
    * the discriminator that lets a replay sweep a torn attempt's files
    * without ever sweeping a live concurrent attempt's. System-property
    * override for tests (which simulate crashes with fresh markers). */
  private[graft] def pendStaleMs: Long =
    sys.props.get("graft.sink.pendStaleMs").map(_.toLong).getOrElse(45000L)

  /** The ONE netting definition — rows byte-identical between the
    * insert and delete sides cancel (so a pure compact/rewrite nets to
    * nothing), shared by [[Lake.changesBetween]]'s netted frame and
    * the public per-batch helper [[graft.streaming.LakeChanges.net]]
    * so the two surfaces can never diverge on row identity. Every
    * non-map column participates via null-safe equality; map columns
    * (unjoinable directly) compare through their sorted entry arrays.
    * Internal comparison columns carry the reserved \u0001 prefix,
    * which [[Lake.evolve]] refuses in user column names — no evolved
    * extra can collide. Scale shape: two hash anti-joins keyed on the
    * full row — the join keys ARE the data, so the shuffle is the
    * delta itself, never the lake. */
  private[graft] def netInsertsDeletes(ins: DataFrame,
      del: DataFrame, excludeKeys: Set[String] = Set.empty): DataFrame = {
    val dataCols = ins.columns.toSeq
    val mapCols = ins.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(_.name).toSet
    def prep(df: DataFrame): DataFrame =
      mapCols.foldLeft(df)((d, c) =>
        d.withColumn("\u0001mcmp_" + c, array_sort(map_entries(col(c)))))
    val li = prep(ins); val rd = prep(del)
    // excludeKeys drops columns from ROW IDENTITY only (they stay in
    // the output): the reshard re-key diff cancels a relocated row --
    // same content, new shard -- by netting with the partition column
    // excluded
    val keys = (dataCols.filterNot(mapCols) ++ mapCols.map("\u0001mcmp_" + _))
      .filterNot(excludeKeys)
    val cond = keys.map(k => li(k) <=> rd(k)).reduce(_ && _)
    li.join(rd, cond, "left_anti").withColumn("change", lit("insert"))
      .unionByName(
        rd.join(li, cond, "left_anti").withColumn("change", lit("delete")))
      .select((dataCols.map(col) :+ col("change")): _*)
  }

  /** Stable 12-hex sink identity from the user-visible sink id (the
    * query's checkpoint location): what names the sink's ledger files,
    * pend markers, and file-name tags. SHA-256-based so two checkpoints
    * differing anywhere get distinct identities. */
  private[graft] def sinkIdHex(sinkId: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(sinkId.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString

  /** What one staged append published: the partition values it landed
    * files in (skip-index refresh scope) and the published data-file
    * paths themselves (zone-map refresh scope). */
  private[graft] final case class Appended(
      shards: Set[Option[String]], files: Seq[String])

  /** Per-append staging subtree root: each batch append writes its
    * parquet under `_staging/<uuid>/` with its own committer scratch,
    * then moves the finished files into the live generation tree —
    * concurrent appends sharing one output directory would share
    * Hadoop's `_temporary` job-attempt dir and clobber each other's
    * in-flight task files at cleanup. */
  private[graft] val stagingDirName: String = "_staging"

  /** An incremental LSH reshard in flight: rows in the `pending`
    * (escaped-dir, generation) entries are still routed at
    * `fromBits` hyperplanes while the lake's declared width is already
    * `toBits` — reads re-derive the missing high bits per row
    * ([[Lsh.shardColFrom]], exact by plane prefix stability), and each
    * [[Lake.reshard]] step rewrites a batch of pending directories at
    * the full width and commits. `hadSkipIndex` remembers whether the
    * transition dropped an operator-built skip index (its by-value
    * shard entries would mis-prune mid-reshard), so completion can
    * rebuild it. */
  private[graft] final case class ReshardState(
      fromBits: Int, toBits: Int, pending: Seq[(String, Long)],
      hadSkipIndex: Boolean = false)

  /** One data file of a live manifest entry, as recorded in the
    * sidecar at commit time (name is directory-relative; len/mod are
    * the exact [[org.apache.hadoop.fs.FileStatus]] values a listing
    * would return — readers build scan splits from them, so `len`
    * must be the true byte length). */
  private[graft] final case class LiveFile(name: String, len: Long, mod: Long)

  /** Committed layout-v2 state: `generation` is the current append
    * target (its whole subtree is live); `live` names directories still
    * live in OLDER generations as (escaped-dir-name, generation) pairs
    * — the same dir name may appear under several generations (old
    * rewrite + later appends). `sidecarShards` is the num_shards the
    * sidecar DECLARED (None for fresh constructions and pre-field
    * sidecars): carried so per-operation width checks and snapshot
    * re-derivation can see the width a STATE was written at, not just
    * the session's. `reshard` is the in-flight incremental reshard, if
    * any. `liveFiles` is the FILE-level manifest (guide §6 "table
    * formats avoid directory listing altogether"): for each `live`
    * entry whose file set was recorded at commit time, the exact data
    * files a reader should open — so reads plan with ZERO per-directory
    * listings. Entries absent from the map (sidecars written before
    * this field existed, or an entry whose names could not be recorded
    * safely) fall back to listing; presence is an optimization, never
    * a semantics change, because a committed (dir, generation) entry
    * is immutable until vacuum retires it wholesale — the same
    * invariant the listing read already relied on. */
  private[graft] final case class LakeState(
      generation: Long, live: Seq[(String, Long)],
      genHasData: Option[Boolean] = None,
      isSealed: Boolean = false,
      extraCols: Seq[(String, String)] = Nil,
      sidecarShards: Option[Long] = None,
      reshard: Option[ReshardState] = None,
      lastUpdate: Option[String] = None,
      liveFiles: Map[(String, Long), Seq[LiveFile]] = Map.empty)

  /** Generation subtree directory names under the root. */
  private[graft] val genDirRe = "gen-(\\d+)".r

  /** Versioned sidecar file names; readers take the highest version —
    * each commit is an atomic CREATE of a new version, never an
    * in-place overwrite a reader could catch half-written. */
  private[graft] val metaNameRe = "_meta\\.(\\d+)\\.json".r

  /** Superseded sidecar versions kept for in-flight readers that
    * listed the root just before a commit; older ones are swept. */
  private[graft] val keptMetaVersions: Long = 4L

  /** Per-query serve state for [[Lake.topKStreamExpiring]]: the bounded
    * top-k heap (≤ k entries) plus the forward-only expiry deadline.
    * NOTE: this struct is the query's CHECKPOINTED state schema — any
    * field change breaks restart-from-checkpoint (Spark's state-schema
    * check fails the query at start); ship such changes with a new
    * checkpoint location. */
  final case class TopKServeState(
      top: Seq[(Double, String)], deadlineMs: Long = Long.MinValue)

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
