package graft

import org.apache.spark.sql.functions._

import graft.ext.{MediaCodec, Multimodal}
import graft.ext.Multimodal.{MediaItem, MediaFeatures}

/** Multimodal plumbing: typed Dataset schema, per-partition decode,
  * frame sampling — with the stub decoder.
  */
class MultimodalSpec extends SparkSpec {

  private val d = sf()

  test("decode stub is deterministic and total over the media set") {
    val items = Multimodal.mediaFromDocuments(spark, d)
    val feats = Multimodal.extractFeatures(items)
    assert(feats.count() === items.count())
    val twice = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    assert(twice.toSeq === feats.collect().sortBy(_.media_id).toSeq)
    twice.foreach { f =>
      assert(f.width >= 1 && f.height >= 1)
      assert(f.mean_byte >= 0.0 && f.mean_byte <= 255.0)
      assert(f.n_bytes > 0)
    }
  }

  test("frame sampling keeps every step-th frame of video payloads only") {
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "video", Array.fill[Byte](Multimodal.FrameBytes * 3 + 10)(7)),
      MediaItem(2L, "image", Array.fill[Byte](4096)(1))).toDS()
    val frames = Multimodal.sampleFrames(items, step = 2).collect()
    assert(frames.forall(_.media_id === 1L))
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 2)) // 4 frames, keep 0 and 2
    assert(frames.find(_.frame_idx === 2).get.frame_bytes === Multimodal.FrameBytes.toLong)
  }

  test("frame dedup matches a driver-side replication over raw payloads") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val sets = docs.map { case (id, bytes) =>
      id -> bytes.grouped(Multimodal.DedupFrameBytes)
        .map(Multimodal.hash60Bytes).toSet
    }.toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      shared = (sets(a) intersect sets(b)).size
      if shared > 0
      ov = shared.toDouble / math.min(sets(a).size, sets(b).size)
      if ov >= Multimodal.FrameOverlapTau
    } yield (a, b, shared.toLong)).sorted
    val got = Multimodal.frameDedup.build(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(expected.nonEmpty, "fixture should yield frame-sharing pairs")
    assert(got === expected)
  }

  test("features query aggregates per kind with frame totals") {
    val agg = Multimodal.features.build(spark, d).collect()
    assert(agg.map(_.getString(0)).sorted.toSeq === Seq("audio", "image", "video"))
    val video = agg.find(_.getString(0) == "video").get
    assert(video.getLong(5) >= video.getLong(1)) // total_frames >= n_items
    val image = agg.find(_.getString(0) == "image").get
    assert(image.getLong(5) === image.getLong(1)) // 1 frame per non-video item
    assert(image.getLong(6) === 0L)               // no sampled frames for images
  }

  // ----------------------------------------------------------------
  // Real-codec decode: the parser must agree with INDEPENDENT
  // implementations — the JDK's own BMP writer (ImageIO) and WAV
  // writer (AudioSystem) — not just with MediaCodec's encoders (an
  // endianness or offset bug in a shared helper would cancel out in a
  // pure encode→decode round-trip).
  // ----------------------------------------------------------------

  test("BMP parser agrees with JDK ImageIO-written files") {
    for ((w, h) <- Seq((1, 1), (2, 3), (31, 17), (640, 480))) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) % 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK must ship the BMP plugin")
      val dec = MediaCodec.decode(0L, bos.toByteArray)
      assert(dec.kind === "image")
      assert(dec.width === Some(w), s"${w}x$h width")
      assert(dec.height === Some(h), s"${w}x$h height")
      assert(dec.bits_per_pixel === Some(24))
    }
  }

  test("WAV parser agrees with JDK AudioSystem-written files") {
    for ((channels, rate, n) <- Seq((1, 8000, 1), (2, 44100, 777), (1, 22050, 100))) {
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](n * channels * 2)
      for (i <- pcm.indices) pcm(i) = ((i * 37) % 256 - 128).toByte
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val dec = MediaCodec.decode(0L, bos.toByteArray)
      assert(dec.kind === "audio")
      assert(dec.channels === Some(channels))
      assert(dec.sample_rate === Some(rate))
      assert(dec.n_samples === Some(n.toLong))
    }
  }

  test("MediaCodec encoders emit files the JDK readers accept") {
    // symmetric check: our encoders must be REAL files, not merely
    // self-consistent — ImageIO/AudioSystem are the independent readers
    val bmp = MediaCodec.encodeBmp(31, 17, (x, y, c) => ((x + y + c) % 256).toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null && img.getWidth === 31 && img.getHeight === 17)
    val wav = MediaCodec.encodeWav(2, 16000, 50, i => (i * 3).toShort)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getChannels === 2)
    assert(ais.getFormat.getSampleRate === 16000f)
    assert(ais.getFrameLength === 50L)
  }

  test("multimodal_decode parses every payload with no binary fallbacks") {
    val rows = Multimodal.decodeQuery.build(spark, d).collect()
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length.toLong === nDocs)
    assert(rows.forall(r => r.getString(1) == "image" || r.getString(1) == "audio"),
      "every generated payload must sniff as its real format")
    // spot-check the generator algebra end-to-end for one of each kind
    val img = rows.find(_.getLong(0) % 2 == 0).get
    val id = img.getLong(0)
    assert(img.getInt(3) === (id % 31).toInt + 2)
    assert(img.getInt(4) === (id % 17).toInt + 1)
    val aud = rows.find(_.getLong(0) % 2 == 1).get
    val aid = aud.getLong(0)
    assert(aud.getInt(7) === Multimodal.WavRates((((aid - 1) / 2) % 4).toInt))
    assert(aud.getLong(8) === (aid % 100) + 1)
  }
}
