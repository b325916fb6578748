package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.{Lake, LakeConfig}

/** The lake's CHANGE FEED as a Structured Streaming SOURCE — the
  * subscription form of [[graft.Lake.changesSince]] (which is
  * poll-only): downstream embed/index/tokenize jobs `readStream` the
  * lake and receive each committed delta as a micro-batch, turning the
  * lake into the front of a continuous pipeline.
  *
  * Design (v1 `Source`, the API whose `getBatch` returns a DataFrame):
  * offsets are SEALED SIDECAR VERSIONS. Each trigger, [[LakeChangeSource
  * .getOffset]] takes a new [[graft.Lake.seal]] sync point iff the
  * lake's `last_update` stamp moved since the last one (an idle lake
  * seals nothing — no sidecar accumulation); `getBatch(a, b)` is then
  * EXACTLY [[graft.Lake.changesBetween]](a, b) — the netted file-diff
  * plan, fully distributed, reading only changed files — wrapped as a
  * streaming frame. The first batch (no checkpoint) is the full sealed
  * snapshot as inserts ([[graft.Lake.readAt]]), Delta-style, so a new
  * consumer sees the whole table then deltas; pass
  * `initialSnapshot=false` for deltas-only.
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
  * stands; the delta is picked up next trigger), and a transient store
  * IO failure skips identically — writers and store hiccups never fail
  * the stream. What DOES fail it, loudly and by design, is a layout
  * seal cannot serve: subscribing to a lake whose current generation is
  * an active streaming-sink tree is refused when the query starts (the
  * source's construction), and an
  * ingest stream taking over the generation mid-subscription fails the
  * query on its next tick (skipping would silently deliver nothing
  * forever). The inverse collision exists too: a writer that fires
  * during the feed's millisecond seal commit is refused like any lock
  * collision and retries — prefer a `Trigger.ProcessingTime` matched to
  * the downstream cadence over the default continuous trigger to make
  * that window rare. Restarts are cheap on an idle lake: the feed
  * adopts the newest sealed sync point when the lake's stamp still
  * matches it, so a crash-looping subscriber seals nothing new.
  *
  * Cost at 100 TB: each micro-batch opens only the files the interval
  * changed — cost tracks churn, never lake size — and the one
  * driver-side control action per trigger is a sidecar read + (if data
  * moved) a seal commit.
  *
  * Options: `location` (required), `dim` (required), `numHashes`,
  * `metric`, `seed`, `packSignBits`, `partitionKey` (string-typed user
  * partitioning), `netted` (default true), `initialSnapshot` (default
  * true). PQ-coded lakes are not constructible from string options
  * (codebooks are a trained model); subscribe with a plain config —
  * the `pq_code` column is simply absent from the feed's schema.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-changes")
  *     .option("location", path).option("dim", 64)
  *     .load()                     // (stored cols..., shard, change)
  * }}}
  */
class LakeChangeSourceProvider extends StreamSourceProvider with DataSourceRegister {
  import LakeChanges._

  override def shortName(): String = "graft-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schemaFor(configFrom(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakeChangeSource(ctx.sparkSession, configFrom(parameters), parameters)
}

object LakeChanges {
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

  /** The feed's schema: stored columns, the partition column, `change`
    * — the exact [[graft.Lake.changesBetween]] output shape. */
  private[streaming] def schemaFor(cfg: LakeConfig): StructType =
    StructType(
      (Lake.schema.fields.toSeq
        ++ (if (cfg.packSignBits) Seq(StructField("packed", LongType)) else Nil))
        :+ StructField(cfg.partitionKey.getOrElse("shard"),
          if (cfg.partitionKey.isEmpty) IntegerType else StringType)
        :+ StructField("change", StringType))

  private[streaming] def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json().trim.toLong
  }
}

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
  /** Consecutive store-IO seal failures tolerated before the stream is
    * FAILED instead of skipped: a transient hiccup skips like writer
    * contention, but a permanently broken store (revoked credentials —
    * AccessDeniedException extends IOException — wrong region, lost
    * permissions) would otherwise run the feed forever while delivering
    * nothing, indistinguishable from an idle lake. */
  private val maxIoSkips = opt(parameters, "maxIoSkips").map(_.toInt).getOrElse(12)
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[LakeChangeSource])
  @volatile private var ioSkips = 0

  override val schema: StructType = schemaFor(cfg)

  /** Stamp observed at our last successful seal — the no-change
    * detector: an idle lake's stamp never moves, so an idle stream
    * never accumulates sealed sidecars. In-memory state only
    * ACCELERATES the check; the durable form is the newest sealed
    * sidecar's recorded stamp, adopted on restart below. */
  @volatile private var lastSealedStamp: Option[String] = None
  @volatile private var lastSealed: Option[Long] = None

  override def getOffset: Option[OffsetV1] = {
    val stamp = lake.lastUpdate()
    if (stamp.isEmpty) return lastSealed.map(LongOffset(_)) // no lake yet
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
    if (stamp == lastSealedStamp) return lastSealed.map(LongOffset(_))
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
        log.warn(s"graft-changes at ${cfg.location}: seal skipped on " +
          s"store IO failure ($ioSkips consecutive of $maxIoSkips " +
          "tolerated)", e)
        if (ioSkips >= maxIoSkips) throw new java.io.IOException(
          s"graft-changes at ${cfg.location}: $ioSkips consecutive " +
            "store IO failures taking seal sync points — the store " +
            "looks permanently broken (credentials/region/permissions)" +
            ", failing the stream instead of stalling silently. Fix " +
            "the store and restart; the checkpoint resumes from the " +
            "last committed offset.", e)
    }
    lastSealed.map(LongOffset(_))
  }

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
    // project into the declared column order and wrap as streaming
    org.apache.spark.sql.GraftShims.asStreamingFrame(
      batch.select(schema.fieldNames.map(col).toSeq: _*))
  }

  override def stop(): Unit = ()
}
