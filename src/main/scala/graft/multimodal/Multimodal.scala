package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode/feature-extraction runs as a partition-wise operator so a real
  * decoder (JNI/ffmpeg/image lib) would amortize per-partition init —
  * the Scala analog of a Pandas-UDF `mapInPandas` batch.
  *
  * Decode is REAL where the public JDK has a decoder (since round 7):
  * images through `javax.imageio` ([[ImageIoDecoder]] — PNG/JPEG/GIF/
  * BMP, raster dims from the actual decode) and audio through
  * `javax.sound.sampled` ([[JdkDecoder]] — WAV/AIFF/AU, duration from
  * the parsed frame count), both zero-native-dep. VIDEO is the one
  * kind with no public-JDK decoder — permanently, not as a gap to
  * close here: its contract is [[FakeDecoder]]'s deterministic
  * md5-derived pseudo-features (visibly fake dims, never a silent
  * drop), the seam where a production deploy plugs an ffmpeg-backed
  * [[Decoder]] into the same partition-wise plumbing. Everything
  * around the decoders — schema, Dataset plumbing, per-partition
  * batching, downstream transforms (resize, frame sampling) — is the
  * real operator either way, and [[Multimodal.featureCols]] provides
  * an expression-only twin of the fake decode so the whole path is
  * DuckDB-oracle-checkable (MultimodalSpec covers the real decoders
  * against known payloads).
  */
final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])

final case class AssetFeatures(
    asset_id: Long, kind: String, byte_len: Long,
    width: Int, height: Int, duration_ms: Long)

/** Partition-wise decoder contract. A production implementation would
  * open its native library once per partition (see decodeAll). */
trait Decoder extends Serializable {
  def decode(a: Asset): AssetFeatures
}

/** REAL image decoder — the JDK's public `javax.imageio` registry
  * (PNG/JPEG/GIF/BMP, zero native deps): width/height come from the
  * actually-decoded raster, duration is 0 by definition for stills. A
  * payload imageio cannot parse, and the audio/video kinds (audio has
  * its own real decoder, [[JdkDecoder]]; video has no public-JDK
  * decoder), keep [[FakeDecoder]]'s deterministic
  * pseudo-features so the pipeline never drops an asset on a decode
  * gap — the fallback is visible in the features (fake dims), not
  * silent. Plugs into the SAME [[Multimodal.decodeAll]] partition-wise
  * plumbing as the stub. */
object ImageIoDecoder extends Decoder {
  /** null = no reader claims the payload; IIOException = a reader
    * CLAIMED it (valid signature) but the body is corrupt — both are
    * "undecodable", and the second must not fail the Spark task. */
  private[multimodal] def tryRead(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  def decode(a: Asset): AssetFeatures =
    if (a.kind != "image") FakeDecoder.decode(a)
    else tryRead(a.bytes) match {
      case Some(img) => AssetFeatures(a.asset_id, a.kind,
        a.bytes.length.toLong, img.getWidth, img.getHeight, 0L)
      case None => FakeDecoder.decode(a)
    }
}

/** REAL audio decoder — the JDK's public `javax.sound.sampled`
  * registry (WAV/AIFF/AU PCM, zero native deps): `duration_ms` comes
  * from the actually-parsed frame count and frame rate. Raster dims
  * are 0 by definition for audio — a real decode is visibly distinct
  * from [[FakeDecoder]]'s pseudo-dims there too. Every other kind
  * delegates to [[ImageIoDecoder]] (real rasters for images, fake
  * features for video — the one kind with no public-JDK decoder), so
  * ONE decoder instance serves a mixed-kind partition with the best
  * real decode available per kind; undecodable audio falls back to
  * the fake features like any other decode gap. */
object JdkDecoder extends Decoder {
  /** (frames, frameRate, channels) of a parseable PCM payload.
    * UnsupportedAudioFileException = no parser claims the bytes;
    * IOException = claimed (valid RIFF/AIFF header) but corrupt —
    * both are "undecodable" and must not fail the Spark task. */
  private[multimodal] def tryReadAudio(bytes: Array[Byte]): Option[(Long, Float, Int)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames < 0 || fmt.getFrameRate <= 0f) None
        else Some((frames, fmt.getFrameRate, fmt.getChannels))
      } finally in.close()
    } catch { case _: Exception => None }

  def decode(a: Asset): AssetFeatures =
    if (a.kind != "audio") ImageIoDecoder.decode(a)
    else tryReadAudio(a.bytes) match {
      case Some((frames, rate, _)) => AssetFeatures(a.asset_id, a.kind,
        a.bytes.length.toLong, 0, 0, math.round(frames * 1000.0 / rate))
      case None => FakeDecoder.decode(a)
    }
}

/** Decoded per-image pixel statistics (Rec.601 luma). */
final case class ImageStats(
    asset_id: Long, width: Int, height: Int, mean_luma: Double)

/** Decoded per-clip audio statistics (RMS over normalized PCM
  * samples in [-1, 1]). */
final case class AudioStats(
    asset_id: Long, frames: Long, rate_hz: Double, channels: Int, rms: Double)

/** STUB decoder — deterministic pseudo-features from md5(bytes).
  * Kept as the ORACLE path: [[Multimodal.featureCols]] is its
  * expression-only twin, so the whole decode pipeline stays
  * DuckDB-checkable; [[ImageIoDecoder]] is the real-decode
  * counterpart for genuine image payloads. */
object FakeDecoder extends Decoder {
  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Same arithmetic as [[Multimodal.featureCols]] — h31 of the payload
    * md5 prefix drives every pseudo-dimension. */
  def decode(a: Asset): AssetFeatures = {
    val h = java.lang.Long.parseLong(md5Hex(a.bytes).substring(0, 15), 16) % 2147483647L
    AssetFeatures(
      asset_id = a.asset_id,
      kind = a.kind,
      byte_len = a.bytes.length.toLong,
      width = (64 + h % 1856).toInt,
      height = (64 + (h / 7) % 1016).toInt,
      duration_ms = if (a.kind == "image") 0L else 1000L + h % 599000L)
  }
}

object Multimodal {

  /** Partition-wise decode: the real execution path for a native decoder
    * (one decoder init per partition, streamed rows — no collect). */
  def decodeAll(assets: Dataset[Asset], decoder: Decoder = FakeDecoder): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // a real Decoder would open its native context here, once
      it.map(decoder.decode)
    }
  }

  /** REAL pixel-stats extraction over image payloads: decode with
    * `javax.imageio` per partition (registry/classloader lookup
    * amortized across the partition's rows — the same reason a native
    * decoder binds per partition), stream rows, one tight luma loop
    * per raster, no collect anywhere. Non-images and undecodable
    * payloads are dropped (this op is about REAL pixels; the
    * never-drop path is [[decodeAll]] with its fake-feature
    * fallback). */
  def imageStats(assets: Dataset[Asset]): Dataset[ImageStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { a =>
        ImageIoDecoder.tryRead(a.bytes).map { img =>
          val w = img.getWidth; val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) * 0.299 +
                ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
              x += 1
            }
            y += 1
          }
          ImageStats(a.asset_id, w, h, sum / (w.toLong * h))
        }
      }
    }
  }

  /** REAL sample-stats extraction over audio payloads: parse with
    * `javax.sound.sampled` per partition, stream PCM frames through
    * the JDK's own conversion chain (normalized to 16-bit signed
    * little-endian at the source rate), one tight RMS loop per clip,
    * no collect anywhere. Non-audio and undecodable payloads are
    * dropped — this op is about REAL samples; the never-drop path is
    * [[decodeAll]] with its fake-feature fallback. The audio analog
    * of [[imageStats]]. */
  def audioStats(assets: Dataset[Asset]): Dataset[AudioStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        try {
          val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.bytes))
          try {
            val srcFmt = raw.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              srcFmt.getSampleRate, 16, srcFmt.getChannels, true, false)
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
            val buf = new Array[Byte](8192)
            var sumSq = 0.0
            var n = 0L
            var read = in.read(buf)
            while (read > 0) {
              var i = 0
              while (i + 1 < read) {
                val s = (((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)).toShort
                val x = s / 32768.0
                sumSq += x * x
                n += 1
                i += 2
              }
              read = in.read(buf)
            }
            // frames from the samples ACTUALLY streamed (n 16-bit
            // samples / channels), never the header's frame-length
            // field: a stream-style payload reports NOT_SPECIFIED (-1)
            // there, and the decoded count can't disagree with the rms
            if (n == 0) None
            else Some(AudioStats(a.asset_id, n / srcFmt.getChannels,
              srcFmt.getSampleRate.toDouble, srcFmt.getChannels,
              math.sqrt(sumSq / n)))
          } finally raw.close()
        } catch { case _: Exception => None }
      }
    }
  }

  /** Expression-only twin of [[FakeDecoder]] over (id, kind, payload
    * *text*) columns — used by the oracle-checked query so the decode
    * arithmetic is verifiable cross-engine. h = h60(md5-hex-prefix of
    * utf8 payload), dims derived with pure integer ops. */
  def featureCols(text: org.apache.spark.sql.Column, kind: org.apache.spark.sql.Column) = {
    // h31 (< 2^31) keeps every derived op exact in both engines:
    // Spark's `/` is double division, exact only below 2^53.
    val h = T.h31(text)
    Seq(
      length(text).cast("long").as("byte_len"), // ascii payloads: chars == bytes
      (lit(64) + h % 1856).cast("int").as("width"),
      (lit(64) + floor(h / 7).cast("long") % 1016).cast("int").as("height"),
      when(kind === "image", 0L).otherwise(lit(1000L) + h % 599000L).as("duration_ms"))
  }

  /** DuckDB mirror of [[featureCols]] for a text payload expression. */
  def sqlFeatureCols(e: String, kindE: String): Seq[String] = {
    val h = T.sqlH31(e)
    Seq(
      s"CAST(length($e) AS BIGINT) AS byte_len",
      s"CAST(64 + $h % 1856 AS INTEGER) AS width",
      s"CAST(64 + ($h // 7) % 1016 AS INTEGER) AS height",
      s"CAST(CASE WHEN $kindE = 'image' THEN 0 ELSE 1000 + $h % 599000 END AS BIGINT) AS duration_ms")
  }

  /** Resize-to-fit: integer-exact target dims for a max-side budget
    * (e.g. 224): out = dim * budget / max(w, h), integer division. */
  def resizeCols(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column, budget: Int) = {
    val m = greatest(w, h).cast("long")
    Seq(
      (w.cast("long") * budget / m).cast("int").as("out_w"),
      (h.cast("long") * budget / m).cast("int").as("out_h"))
  }

  def sqlResizeCols(w: String, h: String, budget: Int): Seq[String] = Seq(
    s"CAST(($w::BIGINT * $budget) // greatest($w, $h)::BIGINT AS INTEGER) AS out_w",
    s"CAST(($h::BIGINT * $budget) // greatest($w, $h)::BIGINT AS INTEGER) AS out_h")

  /** Frame sampling: one frame index per second of duration, capped —
    * `sequence`-generated, no UDF. */
  def frameSampleCol(durationMs: org.apache.spark.sql.Column, maxFrames: Int) =
    when(durationMs > 0,
      sequence(lit(0L),
        least(floor(durationMs / 1000).cast("long"), lit(maxFrames.toLong - 1)), lit(1L)))
      .otherwise(array().cast("array<bigint>"))

  def sqlFrameSampleLen(durationMs: String, maxFrames: Int): String =
    s"(CASE WHEN $durationMs > 0 THEN least($durationMs // 1000, ${maxFrames - 1}) + 1 ELSE 0 END)"

  /** Build an Asset dataset from documents (payload = utf8 text bytes,
    * kind assigned round-robin) — the fixture generator for specs and
    * the oracle query. */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes")).as[Asset]
  }
}
