package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Asset, FakeDecoder, ImageIoDecoder, JdkDecoder, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** A real in-memory PNG: solid `rgb` at `w`×`h`, round-tripped
    * through the JDK encoder. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real in-memory WAV: 16-bit signed mono PCM 440 Hz sine at
    * `amp`, round-tripped through the JDK encoder. */
  private def wav(seconds: Double, rateHz: Float, amp: Double): Array[Byte] = {
    val n = (seconds * rateHz).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rateHz) * amp * 32767).toInt.toShort
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private val docs = Seq(
    (0L, "the quick brown fox jumps"),
    (1L, "spark scan join merge sort"),
    (2L, "vector lake shard route"),
    (3L, "a much longer document with many more words in it than the others"))
    .toDF("doc_id", "text")

  test("mapPartitions decode equals the expression twin (same arithmetic)") {
    val assets = Multimodal.assetsFromDocuments(spark, docs)
    val viaPartitions = Multimodal.decodeAll(assets).collect()
      .map(f => f.asset_id -> f).toMap

    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val viaExprs = docs
      .select(Seq(col("doc_id"), kind.as("kind")) ++
        Multimodal.featureCols(col("text"), kind): _*)
      .collect()

    viaExprs.foreach { r =>
      val f = viaPartitions(r.getLong(0))
      assert(f.kind === r.getString(1))
      assert(f.byte_len === r.getLong(2), s"byte_len of ${r.getLong(0)}")
      assert(f.width === r.getInt(3), s"width of ${r.getLong(0)}")
      assert(f.height === r.getInt(4), s"height of ${r.getLong(0)}")
      assert(f.duration_ms === r.getLong(5), s"duration of ${r.getLong(0)}")
    }
  }

  test("decoder output ranges: width/height/duration bounded, image has no duration") {
    val feats = Multimodal.decodeAll(Multimodal.assetsFromDocuments(spark, docs)).collect()
    feats.foreach { f =>
      assert(f.width >= 64 && f.width < 64 + 1856)
      assert(f.height >= 64 && f.height < 64 + 1016)
      if (f.kind == "image") assert(f.duration_ms === 0L)
      else assert(f.duration_ms >= 1000L && f.duration_ms < 600000L)
    }
  }

  test("ImageIoDecoder decodes REAL PNG payloads: true raster dims through the same plumbing") {
    // a CLAIMED-but-corrupt image: valid PNG signature, truncated body —
    // ImageIO.read throws here (not null); the decode must not fail the
    // Spark task
    val truncated = png(64, 64, 0x123456).take(48)
    val assets = Seq(
      Asset(10L, "image", png(37, 21, 0x336699)),
      Asset(11L, "image", png(224, 224, 0xffffff)),
      Asset(12L, "audio", "not an image payload".getBytes("UTF-8")),
      Asset(13L, "image", "corrupt png bytes".getBytes("UTF-8")),
      Asset(14L, "image", truncated))
      .toDS()
    val feats = Multimodal.decodeAll(assets, ImageIoDecoder)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats(10L).width === 37 && feats(10L).height === 21)
    assert(feats(10L).duration_ms === 0L)
    assert(feats(11L).width === 224 && feats(11L).height === 224)
    // non-image and undecodable payloads fall back to the deterministic
    // pseudo-features — visible, never dropped
    assert(feats(12L) === FakeDecoder.decode(
      Asset(12L, "audio", "not an image payload".getBytes("UTF-8"))))
    assert(feats(13L) === FakeDecoder.decode(
      Asset(13L, "image", "corrupt png bytes".getBytes("UTF-8"))))
    assert(feats(14L) === FakeDecoder.decode(Asset(14L, "image", truncated)))
    // and imageStats drops the claimed-but-corrupt payload, no crash
    assert(Multimodal.imageStats(Seq(Asset(15L, "image", truncated)).toDS())
      .count() === 0L)
  }

  test("JdkDecoder decodes REAL WAV payloads: true duration through the same plumbing; images still real; video still fake") {
    val half = wav(0.5, 8000f, 0.5) // 4000 frames @ 8 kHz = exactly 500 ms
    val two = wav(2.0, 16000f, 0.25)
    val feats = Multimodal.decodeAll(Seq(
      Asset(20L, "audio", half),
      Asset(21L, "audio", two),
      Asset(22L, "audio", "not a wav".getBytes("UTF-8")), // unclaimed → fake
      Asset(23L, "image", png(37, 21, 0x336699)),          // delegates to imageio
      Asset(24L, "video", "v".getBytes("UTF-8"))           // no JDK decoder → fake
    ).toDS(), JdkDecoder).collect().map(f => f.asset_id -> f).toMap
    assert(feats(20L).duration_ms === 500L)
    assert(feats(21L).duration_ms === 2000L)
    // real audio decode is visibly raster-free, unlike the fake's pseudo-dims
    assert(feats(20L).width === 0 && feats(20L).height === 0)
    assert(feats(22L) === FakeDecoder.decode(Asset(22L, "audio",
      "not a wav".getBytes("UTF-8"))))
    assert(feats(23L).width === 37 && feats(23L).height === 21)
    assert(feats(24L) === FakeDecoder.decode(Asset(24L, "video",
      "v".getBytes("UTF-8"))))
  }

  test("audioStats reads real samples: sine RMS is amp/sqrt(2), non-audio and corrupt dropped") {
    val clip = wav(1.0, 8000f, 0.5) // whole number of 440 Hz cycles ≈ not exact, tolerance below
    val stats = Multimodal.audioStats(Seq(
      Asset(1L, "audio", clip),
      Asset(2L, "audio", "corrupt".getBytes("UTF-8")),
      Asset(3L, "image", png(2, 2, 0x000000)))
      .toDS()).collect().map(s => s.asset_id -> s).toMap
    assert(stats.keySet === Set(1L))
    assert(stats(1L).frames === 8000L)
    assert(stats(1L).rate_hz === 8000.0)
    assert(stats(1L).channels === 1)
    // RMS of a 0.5-amplitude sine = 0.5/√2 ≈ 0.35355; quantization and
    // the partial final cycle keep it within a loose-but-meaningful band
    assert(math.abs(stats(1L).rms - 0.5 / math.sqrt(2)) < 0.01,
      s"rms = ${stats(1L).rms}")
  }

  test("imageStats reads real pixels: solid-color luma is exact, non-images dropped") {
    // Rec.601 luma of solid red (255,0,0) = 76.245; white = 255
    val assets = Seq(
      Asset(1L, "image", png(8, 4, 0xff0000)),
      Asset(2L, "image", png(3, 3, 0xffffff)),
      Asset(3L, "video", "nope".getBytes("UTF-8")))
      .toDS()
    val stats = Multimodal.imageStats(assets).collect()
      .map(s => s.asset_id -> s).toMap
    assert(stats.keySet === Set(1L, 2L))
    assert(stats(1L).width === 8 && stats(1L).height === 4)
    assert(math.abs(stats(1L).mean_luma - 255 * 0.299) < 1e-9)
    assert(math.abs(stats(2L).mean_luma - 255.0) < 1e-9)
  }

  test("resize fits the max side to the budget, preserves aspect-ish") {
    val df = Seq((1920, 1080), (100, 400), (224, 224)).toDF("w", "h")
      .select(Seq(col("w"), col("h")) ++
        Multimodal.resizeCols(col("w"), col("h"), 224): _*)
    df.collect().foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(ow, oh) === 224, s"($w,$h) -> ($ow,$oh)")
      assert(ow <= 224 && oh <= 224)
    }
  }

  test("frame sampling: 1 fps capped at maxFrames, none for images") {
    val df = Seq(0L, 500L, 5500L, 600000L).toDF("d")
      .select(col("d"), Multimodal.frameSampleCol(col("d"), 32).as("frames"))
    val m = df.collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1)).toMap
    assert(m(0L).isEmpty)
    assert(m(500L).toSeq === Seq(0L)) // sub-second clip still yields frame 0
    assert(m(5500L).toSeq === (0L to 5L))
    assert(m(600000L).length === 32) // capped
  }

  test("custom decoder plugs into the partition-wise path") {
    object ConstDecoder extends graft.multimodal.Decoder {
      def decode(a: Asset) =
        graft.multimodal.AssetFeatures(a.asset_id, a.kind, a.bytes.length.toLong, 1, 2, 3L)
    }
    val out = Multimodal.decodeAll(
      Multimodal.assetsFromDocuments(spark, docs), ConstDecoder).collect()
    assert(out.forall(f => f.width == 1 && f.height == 2 && f.duration_ms == 3L))
  }

  test("FakeDecoder md5 matches jvm MessageDigest golden") {
    assert(FakeDecoder.md5Hex("hello".getBytes("UTF-8"))
      === "5d41402abc4b2a76b9719d911017c592")
  }
}
