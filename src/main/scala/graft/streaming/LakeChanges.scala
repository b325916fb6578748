package graft.streaming

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.execution.datasources.{FilePartition, FileStatusCache, InMemoryFileIndex, PartitionedFile, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.{Lake, LakeConfig}
import graft.sources.GraftDataSource

/** The lake's CHANGE FEED as a Structured Streaming SOURCE — the
  * subscription form of [[graft.Lake.changesSince]] (which is
  * poll-only): downstream embed/index/tokenize jobs `readStream` the
  * lake and receive each committed delta as a micro-batch, turning the
  * lake into the front of a continuous pipeline.
  *
  * Offsets are SEALED SIDECAR VERSIONS. Each trigger, the shared
  * [[SealTracker]] takes a new [[graft.Lake.seal]] sync point iff the
  * lake's `last_update` stamp moved since the last one (an idle lake
  * seals nothing — no sidecar accumulation); a micro-batch (a, b] is
  * the file-level delta between the two sealed states. The first batch
  * (no checkpoint) is the full sealed snapshot as inserts
  * ([[graft.Lake.readAt]]), Delta-style, so a new consumer sees the
  * whole table then deltas; pass `initialSnapshot=false` for
  * deltas-only.
  *
  * TWO EXECUTION PATHS behind one format name, chosen by the `netted`
  * option — because the two feed shapes have fundamentally different
  * plan requirements:
  *
  *  - `netted=true` (default): the ROW-level netted delta — rows
  *    byte-identical across the interval's inserted and deleted files
  *    cancel, so a pure compact/rewrite is INVISIBLE to the feed. That
  *    cancellation is a cross-file anti-join
  *    ([[graft.Lake.changesBetween]]'s distributed plan); DSv2
  *    `MicroBatchStream` readers are per-file and cannot express a
  *    join, so this path rides the v1 `Source` API whose `getBatch`
  *    returns a DataFrame — the same reason Delta Lake's CDC stream
  *    remains a v1 source. The one `private[sql]` bridge this needs is
  *    [[org.apache.spark.sql.GraftShims.asStreamingFrame]].
  *  - `netted=false`: the RAW file-level delta (every changed file's
  *    rows as insert/delete, rewrite churn visible) — pure DSv2:
  *    [[LakeChangesMicroBatchStream]] plans one `FilePartition` slice
  *    per batch over exactly the changed files and DELEGATES reading
  *    to Spark's own vectorized parquet reader factory, with the
  *    (shard, change) pair carried as PARTITION VALUES (zero per-row
  *    cost — the same manifest-driven partition-spec trick as the
  *    batch `graft` format). Raw mode is the delta-APPLIER's shape
  *    (signed deltas cancel downstream, e.g. [[IncrementalAgg]]), and
  *    it scales strictly better: no shuffle at all, just file reads.
  *
  * Exactly-once: offsets are durable sync points — both sides of every
  * delta are immutable sealed file sets, so a replayed batch
  * reconstructs the identical rows (the [[graft.Lake.changesBetween]]
  * reproducibility contract). [[graft.Lake.vacuum]] is the only thing
  * that can break replay (it retires sealed versions); run it with
  * `retainMs` covering the stream's maximum downtime.
  *
  * Contention: `seal()` takes the exclusive writer lock. A tick that
  * loses to in-flight appends or maintenance SKIPS (the previous offset
  * stands; the delta is picked up next trigger); transient store IO
  * failures skip identically but are logged and BOUNDED
  * ([[SealTracker]]). What fails the stream, loudly and by design, is
  * a layout a seal cannot serve: subscribing to a lake whose current
  * generation is an active streaming-sink tree is refused when the
  * query starts, and an ingest stream taking over the generation
  * mid-subscription fails the query on its next tick.
  *
  * Cost at 100 TB: each micro-batch opens only the files the interval
  * changed — cost tracks churn, never lake size — and the one
  * driver-side control action per trigger is a sidecar read + (if data
  * moved) a seal commit.
  *
  * Options: `location` (required), `dim` (required), `numHashes`,
  * `metric`, `seed`, `packSignBits`, `partitionKey` (string-typed user
  * partitioning), `netted` (default true), `initialSnapshot` (default
  * true), `maxIoSkips` (default 12).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-changes")
  *     .option("location", path).option("dim", 64)
  *     .load()                     // (stored cols..., shard, change)
  * }}}
  */
class LakeChangeSourceProvider extends StreamSourceProvider with TableProvider
    with DataSourceRegister {
  import LakeChanges._

  override def shortName(): String = "graft-changes"

  // ---- v1 path (netted row-level feed; plan-based getBatch) ----------

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val cfg = configFrom(parameters)
    (shortName(), schemaFor(cfg,
      Lake(ctx.sparkSession, cfg).currentExtraFields))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakeChangeSource(ctx.sparkSession, configFrom(parameters), parameters)

  // ---- DSv2 path (raw file-level feed; MicroBatchStream) -------------

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val cfg = configFrom(options.asScala.toMap)
    schemaFor(cfg, Lake(SparkSession.active, cfg).currentExtraFields)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val parameters = new CaseInsensitiveStringMap(properties).asScala.toMap
    val netted = opt(parameters, "netted").forall(_.toBoolean)
    if (netted)
      // a capability-LESS table: DataStreamReader falls back to the v1
      // StreamSourceProvider path, which can run the netting anti-join
      new Table {
        override def name(): String = s"graft-changes (netted, v1 path)"
        override def schema(): StructType = {
          val cfg = configFrom(parameters)
          schemaFor(cfg, Lake(SparkSession.active, cfg).currentExtraFields)
        }
        override def capabilities(): java.util.Set[TableCapability] =
          java.util.Collections.emptySet()
      }
    else new LakeChangesTable(configFrom(parameters), parameters)
  }
}

object LakeChanges {
  /** NET a raw change-feed micro-batch: rows byte-identical between
    * the batch's insert and delete sides cancel, so a pure
    * compact/rewrite nets to nothing — the same row-identity rule as
    * the v1 netted source, by construction (both delegate to
    * [[graft.Lake.netInsertsDeletes]], the one netting definition).
    *
    * This is the DSv2-native way to consume the netted feed: the raw
    * `netted=false` stream (pure `MicroBatchStream`, one FilePartition
    * slice per batch, no `private[sql]` bridge) is the TRANSPORT, and
    * netting runs inside the consumer's own batch function — where a
    * join is a perfectly ordinary plan:
    *
    * {{{
    *   spark.readStream.format("graft-changes")
    *     .option("location", path).option("dim", 64)
    *     .option("netted", "false")
    *     .load()
    *     .writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
    *       val netted = LakeChanges.net(batch)   // ≡ netted=true rows
    *       ...
    *     }.start()
    * }}}
    *
    * Each raw micro-batch covers exactly one sealed interval (a, b] —
    * the same interval the v1 netted source would serve as one batch —
    * so per-batch netting and per-interval netting see identical file
    * sets and produce identical rows (ChangeFeedSpec pins the
    * equivalence, rewrite churn included). The v1 `netted=true` path
    * remains registered as COMPAT for consumers that want the netting
    * inside the source itself; it rides legacy extension points (see
    * the provider scaladoc) and this helper is the forward path.
    *
    * Scale shape: two hash anti-joins keyed on the full row — the
    * shuffle is the batch's own delta, never the lake. */
  def net(batch: DataFrame): DataFrame = {
    require(batch.columns.contains("change"),
      "LakeChanges.net expects a change-feed batch (missing `change` " +
        "column) — read it from format(\"graft-changes\") with " +
        "option netted=false")
    Lake.netInsertsDeletes(
      batch.where(col("change") === "insert").drop("change"),
      batch.where(col("change") === "delete").drop("change"))
  }

  private[streaming] def opt(parameters: Map[String, String], key: String): Option[String] = {
    val lower = key.toLowerCase(java.util.Locale.ROOT)
    parameters.collectFirst {
      case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == lower => v
    }
  }

  private[streaming] def configFrom(parameters: Map[String, String]): LakeConfig = {
    val location = opt(parameters, "location").getOrElse(throw
      new IllegalArgumentException("graft-changes needs option 'location'"))
    val dim = opt(parameters, "dim").getOrElse(throw
      new IllegalArgumentException("graft-changes needs option 'dim'")).toInt
    LakeConfig(
      location = location,
      dim = dim,
      numHashes = opt(parameters, "numHashes").map(_.toInt).getOrElse(8),
      metric = opt(parameters, "metric").getOrElse("cosine"),
      seed = opt(parameters, "seed").map(_.toLong).getOrElse(42L),
      partitionKey = opt(parameters, "partitionKey"),
      packSignBits = opt(parameters, "packSignBits").exists(_.toBoolean))
  }

  /** The feed's schema: stored columns (+ any [[graft.Lake.evolve]]d
    * extras, pinned at subscribe time — a mid-stream evolve surfaces
    * after restart), the partition column, `change` — the exact
    * [[graft.Lake.changesBetween]] output shape. */
  private[streaming] def schemaFor(cfg: LakeConfig,
      extras: Seq[StructField] = Nil): StructType =
    StructType((storedFieldsFor(cfg) ++ extras)
      :+ StructField(cfg.partitionKey.getOrElse("shard"), partTypeFor(cfg))
      :+ StructField("change", StringType))

  private[streaming] def storedFieldsFor(cfg: LakeConfig): Seq[StructField] =
    Lake.schema.fields.toSeq ++
      (if (cfg.packSignBits) Seq(StructField("packed", LongType)) else Nil)

  private[streaming] def partTypeFor(cfg: LakeConfig): DataType =
    if (cfg.partitionKey.isEmpty) IntegerType else StringType

  private[streaming] def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json().trim.toLong
  }
}

/** The one place seal sync points are taken and adopted — shared by
  * the v1 (netted) source and the DSv2 (raw) stream so the offset
  * discipline (idle-seals-nothing, restart adoption, stamp pinning,
  * writer-contention skip, bounded IO-failure skip) has a single
  * definition. */
private[streaming] final class SealTracker(lake: Lake, location: String,
    maxIoSkips: Int) {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[SealTracker])

  /** Stamp observed at our last successful seal — the no-change
    * detector: an idle lake's stamp never moves, so an idle stream
    * never accumulates sealed sidecars. In-memory state only
    * ACCELERATES the check; the durable form is the newest sealed
    * sidecar's recorded stamp, adopted on restart below. */
  @volatile private var lastSealedStamp: Option[String] = None
  @volatile private var lastSealed: Option[Long] = None
  @volatile private var ioSkips = 0

  /** Advance to (or hold) the newest sealed sync point. None = no lake
    * data yet. */
  def advance(): Option[Long] = {
    val stamp = lake.lastUpdate()
    if (stamp.isEmpty) return lastSealed // no lake yet
    if (lastSealed.isEmpty && lastSealedStamp.isEmpty) {
      // RESTART ADOPTION: if the newest sealed sync point already
      // captures the current stamp, resume from it instead of sealing a
      // fresh one — a crash-looping subscriber over an idle lake must
      // not grow the sealed-sidecar set (each spurious seal is retained
      // until vacuum), and the in-memory detector resets every restart
      lake.latestSealed().foreach { case (v, s) =>
        if (stamp.contains(s)) { lastSealed = Some(v); lastSealedStamp = Some(s) }
      }
    }
    if (stamp == lastSealedStamp) return lastSealed
    try {
      val v = lake.seal()
      // pin the stamp the seal ITSELF recorded (read from sidecar v) —
      // a post-release lastUpdate() re-read could capture a FOREIGN
      // stamp committed between the seal's lock release and the read,
      // adopting that writer's delta as already-sealed and withholding
      // it until some later write moves the stamp again
      lastSealedStamp = lake.stampOfVersion(v)
      lastSealed = Some(v)
      ioSkips = 0
    } catch {
      // writers win: in-flight appends or maintenance hold the gate —
      // skip the tick, the delta is picked up on the next trigger. A
      // TRANSIENT store IO failure skips identically, but logged and
      // BOUNDED: `maxIoSkips` consecutive IO failures mean the store is
      // permanently broken (revoked credentials, wrong region, lost
      // permissions) and the stream fails loudly instead of stalling
      // silently forever. Anything else (e.g. seal's refusal when an
      // ingest stream took over the current generation
      // mid-subscription) FAILS the stream immediately: skipping would
      // silently deliver nothing forever.
      case _: java.util.ConcurrentModificationException => ioSkips = 0
      case e: java.io.IOException =>
        ioSkips += 1
        log.warn(s"graft-changes at $location: seal skipped on " +
          s"store IO failure ($ioSkips consecutive of $maxIoSkips " +
          "tolerated)", e)
        if (ioSkips >= maxIoSkips) throw new java.io.IOException(
          s"graft-changes at $location: $ioSkips consecutive " +
            "store IO failures taking seal sync points — the store " +
            "looks permanently broken (credentials/region/permissions)" +
            ", failing the stream instead of stalling silently. Fix " +
            "the store and restart; the checkpoint resumes from the " +
            "last committed offset.", e)
    }
    lastSealed
  }
}

/** v1 `Source` — the NETTED row-level feed (see provider scaladoc for
  * why this path stays on the DataFrame-returning API). */
class LakeChangeSource(spark: SparkSession, cfg: LakeConfig,
    parameters: Map[String, String]) extends Source {
  import LakeChanges._

  private val lake = Lake(spark, cfg)
  // an actively stream-ingested generation cannot host seal sync points
  // (its manifest governs file visibility) — refuse at SUBSCRIBE time
  // with the real reason, not on the first data-carrying trigger via a
  // StreamingQueryException three layers down
  require(!lake.currentGenerationStreamOwned,
    s"graft-changes cannot subscribe at ${cfg.location}: the current " +
      "generation is a streaming-sink tree (its _spark_metadata manifest " +
      "governs file visibility, so seal sync points cannot be taken). " +
      "Stop the ingest stream and roll a batch generation first.")
  private val netted = opt(parameters, "netted").forall(_.toBoolean)
  private val initialSnapshot = opt(parameters, "initialSnapshot").forall(_.toBoolean)
  private val tracker = new SealTracker(lake, cfg.location,
    opt(parameters, "maxIoSkips").map(_.toInt).getOrElse(12))

  override val schema: StructType = schemaFor(cfg, lake.currentExtraFields)

  override def getOffset: Option[OffsetV1] =
    tracker.advance().map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    val batch = start match {
      case Some(s) if versionOf(s) == endV =>
        lake.changesBetween(endV, endV, netted) // empty, right schema
      case Some(s) => lake.changesBetween(versionOf(s), endV, netted)
      case None if initialSnapshot =>
        lake.readAt(endV).withColumn("change", lit("insert"))
      case None => lake.changesBetween(endV, endV, netted)
    }
    // pad any pinned column a replayed pre-evolve batch lacks (typed
    // null — the same fill every other read applies), then project into
    // the declared order and wrap as streaming
    val padded = schema.fields.toSeq
      .filterNot(f => batch.columns.contains(f.name))
      .foldLeft(batch)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    org.apache.spark.sql.GraftShims.asStreamingFrame(
      padded.select(schema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = ()
}

/** DSv2 table for the RAW (un-netted) feed: `MICRO_BATCH_READ` only —
  * batch reads of the lake go through the `graft` format. */
private[streaming] final class LakeChangesTable(cfg: LakeConfig,
    parameters: Map[String, String]) extends Table with SupportsRead {
  import LakeChanges._

  private lazy val extras: Seq[StructField] =
    Lake(SparkSession.active, cfg).currentExtraFields

  override def name(): String = s"graft-changes:${cfg.location}"
  override def schema(): StructType = schemaFor(cfg, extras)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schemaFor(cfg, extras)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          // the SAME pinned extras as readSchema(): the reader factory
          // must never re-read the sidecar lazily, or an evolve()
          // between resolution and batch 0 would shift every ordinal
          // past the extras (extras precede (shard, change) in the row)
          new LakeChangesMicroBatchStream(
            SparkSession.active, cfg, parameters, extras)
      }
    }
}

/** A sealed-version offset for the DSv2 stream; -1 = the pre-first-seal
  * sentinel (the v1 path's `None` start). */
private[streaming] final case class ChangeOffset(version: Long) extends OffsetV2 {
  override def json(): String = version.toString
}

/** DSv2 `MicroBatchStream` — the RAW file-level feed. Each micro-batch
  * (a, b] is planned as `FilePartition`s over exactly the files the
  * interval added (change=insert) or retired (change=delete), packed by
  * size with Spark's own partition packer; reading DELEGATES to the
  * stock vectorized parquet reader factory, with (shard, change)
  * carried as PARTITION VALUES — no per-row labeling cost, no shuffle,
  * no driver materialization. Cost tracks churn, never lake size. */
private[streaming] final class LakeChangesMicroBatchStream(
    spark: SparkSession, cfg: LakeConfig,
    parameters: Map[String, String],
    pinnedExtras: Seq[org.apache.spark.sql.types.StructField])
  extends MicroBatchStream {
  import LakeChanges._

  private val lake = Lake(spark, cfg)
  require(!lake.currentGenerationStreamOwned,
    s"graft-changes cannot subscribe at ${cfg.location}: the current " +
      "generation is a streaming-sink tree (its _spark_metadata manifest " +
      "governs file visibility, so seal sync points cannot be taken). " +
      "Stop the ingest stream and roll a batch generation first.")
  private val initialSnapshot = opt(parameters, "initialSnapshot").forall(_.toBoolean)
  private val tracker = new SealTracker(lake, cfg.location,
    opt(parameters, "maxIoSkips").map(_.toInt).getOrElse(12))

  override def initialOffset(): OffsetV2 = ChangeOffset(-1L)
  override def deserializeOffset(json: String): OffsetV2 =
    ChangeOffset(json.trim.toLong)
  override def latestOffset(): OffsetV2 =
    tracker.advance().map(ChangeOffset(_)).orNull
  override def commit(end: OffsetV2): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: OffsetV2, end: OffsetV2): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeOffset].version
    val e = end.asInstanceOf[ChangeOffset].version
    if (s == e) return Array.empty
    val (inserts, deletes) =
      if (s == -1L) {
        if (initialSnapshot) (lake.sealedFileStatuses(e), Nil) // snapshot
        else (Nil, Nil) // deltas-only: e becomes the baseline
      } else {
        val from = lake.sealedFileStatuses(s)
        val to = lake.sealedFileStatuses(e)
        val fromPaths = from.map(_._1).toSet
        val toPaths = to.map(_._1).toSet
        (to.filterNot(f => fromPaths(f._1)),
          from.filterNot(f => toPaths(f._1)))
      }
    val partType = partTypeFor(cfg)
    def pf(file: (String, Long, String), change: String): PartitionedFile =
      PartitionedFile(
        InternalRow(
          GraftDataSource.partValue(Some(file._3), partType),
          UTF8String.fromString(change)),
        org.apache.spark.paths.SparkPath.fromPathString(file._1),
        0L, file._2, Array.empty[String], 0L, file._2, Map.empty)
    val files = inserts.map(pf(_, "insert")) ++ deletes.map(pf(_, "delete"))
    FilePartition.getFilePartitions(spark, files,
      FilePartition.maxSplitBytes(spark, files.map(_.length).sum))
      .toArray
  }

  /** Built once per stream: the stock parquet reader factory over the
    * canonical stored schema + the (shard, change) partition pair —
    * every batch's `FilePartition`s carry their own files and partition
    * values, so one factory serves the stream's lifetime. Uses the
    * extras PINNED at scan resolution (constructor), never a fresh
    * sidecar read — see toMicroBatchStream. */
  override lazy val createReaderFactory: PartitionReaderFactory = {
    val dataSchema = StructType(storedFieldsFor(cfg) ++ pinnedExtras)
    val partSchema = StructType(Seq(
      StructField(cfg.partitionKey.getOrElse("shard"), partTypeFor(cfg)),
      StructField("change", StringType)))
    val emptyIndex = new InMemoryFileIndex(spark, Nil, Map.empty,
      Some(dataSchema), FileStatusCache.getOrCreate(spark),
      Some(PartitionSpec(partSchema, Nil)), None)
    new ParquetScanBuilder(spark, emptyIndex,
      StructType(dataSchema.fields ++ partSchema.fields), dataSchema,
      CaseInsensitiveStringMap.empty())
      .build().toBatch.createReaderFactory()
  }
}
