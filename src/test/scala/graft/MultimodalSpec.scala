package graft

import org.apache.spark.sql.functions._

import graft.ext.{MediaCodec, Multimodal}
import graft.ext.Multimodal.MediaItem

/** Multimodal plumbing: typed Dataset schema, per-partition decode,
  * frame sampling — with the real byte-level codec.
  */
class MultimodalSpec extends SparkSpec {

  private val d = sf()

  test("real decode is deterministic and total over the synthetic media set") {
    val items = Multimodal.syntheticMedia(spark, d)
    val dec = Multimodal.decodeMedia(items)
    assert(dec.count() === items.count())
    val twice = Multimodal.decodeMedia(items).collect().sortBy(_.media_id)
    assert(twice.toSeq === dec.collect().sortBy(_.media_id).toSeq)
    twice.foreach { f =>
      assert(f.n_bytes > 0)
      f.kind match {
        case "image" =>
          assert(f.width.exists(_ >= 1) && f.height.exists(_ >= 1))
          assert(f.bits_per_pixel === Some(24))
        case "audio" =>
          assert(f.channels.exists(_ >= 1) && f.sample_rate.exists(_ > 0))
          assert(f.n_samples.exists(_ >= 1))
        case k => fail(s"unexpected kind $k — every synthetic payload must sniff")
      }
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

  test("features query aggregates real decoded headers per kind") {
    val agg = Multimodal.features.build(spark, d).collect()
    assert(agg.map(_.getString(0)).sorted.toSeq === Seq("audio", "image"))
    val image = agg.find(_.getString(0) == "image").get
    assert(image.getInt(3) >= 2 && image.getInt(3) <= 32)   // min_width ∈ generator range
    assert(image.getInt(4) >= 1 && image.getInt(4) <= 17)   // max_height ∈ generator range
    assert(image.isNullAt(5) && image.isNullAt(6))          // no audio fields for images
    val audio = agg.find(_.getString(0) == "audio").get
    assert(audio.getLong(5) >= audio.getLong(1))            // ≥1 sample per clip
    assert(Multimodal.WavRates.contains(audio.getInt(6)))   // max rate is a real rate
    assert(audio.isNullAt(3) && audio.isNullAt(4))          // no image fields for audio
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

  test("WAV parser terminates on corrupt chunk sizes (no infinite RIFF walk)") {
    // A crafted chunk size like 0xFFFFFFF8 truncates to -8 via toInt,
    // so a naive `off += 8 + sz.toInt` advances by 0 forever. decode()
    // is the seam untrusted payloads reach — it must terminate and
    // still report whatever header fields it parsed before the junk.
    def wavWithChunk(id: String, szBytes: Array[Byte]): Array[Byte] = {
      val base = MediaCodec.encodeWav(1, 8000, 4, i => i.toShort)
      // insert the junk chunk between `fmt ` and `data` (data starts at 36)
      val junk = id.getBytes("US-ASCII") ++ szBytes ++ Array.fill[Byte](4)(0)
      base.take(36) ++ junk ++ base.drop(36)
    }
    for (sz <- Seq(
        Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte), // -8: zero step
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte), // huge: overflow
        Array[Byte](0x00, 0x00, 0x00, 0x80.toByte))) {                   // 2^31: Int-negative
      val dec = MediaCodec.decode(9L, wavWithChunk("LIST", sz))
      assert(dec.kind === "audio") // sniffed before the walk
      assert(dec.channels === Some(1) && dec.sample_rate === Some(8000),
        "fmt fields parsed before the corrupt chunk survive")
    }
    // and a well-formed odd-sized chunk still word-aligns correctly past it
    val odd = {
      val base = MediaCodec.encodeWav(2, 16000, 3, i => i.toShort)
      val junk = "LIST".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, 0) ++ Array.fill[Byte](4)(0) // size 3 + pad byte
      base.take(36) ++ junk ++ base.drop(36)
    }
    val ok = MediaCodec.decode(10L, odd)
    assert(ok.n_samples === Some(3L), "walk must skip odd chunks with padding")
  }

  test("pixel decoder reads the true top-origin grid (orientation, stride, offset)") {
    // asymmetric-in-y pixel fn: any bottom-up/top-down confusion or
    // stride slip changes the grid
    val w = 11; val h = 5 // stride 36 ≠ 3·11 — exercises row padding
    val bmp = MediaCodec.encodeBmp(w, h, (x, y, c) => (x * 3 + y * 50 + c).toByte)
    val g = MediaCodec.decodeBmpGray8x8(bmp).get
    for (y <- 0 until 8; x <- 0 until 8) {
      val (sx, sy) = (x * w / 8, y * h / 8)
      val want = (0 until 3).map(c => ((sx * 3 + sy * 50 + c) & 0xff)).sum
      assert(g(y * 8 + x) === want, s"cell ($x,$y) sampled from ($sx,$sy)")
    }
  }

  test("pixel decoder rejects junk instead of faulting") {
    val good = MediaCodec.encodeBmp(4, 4, (_, _, _) => 1.toByte)
    assert(MediaCodec.decodeBmpGray8x8(good).isDefined)
    assert(MediaCodec.decodeBmpGray8x8(good.take(53)).isEmpty, "short header")
    assert(MediaCodec.decodeBmpGray8x8(good.take(60)).isEmpty, "truncated pixel array")
    assert(MediaCodec.decodeBmpGray8x8("RIFFnotabmp".getBytes("US-ASCII")).isEmpty)
    val wrongBpp = good.clone(); wrongBpp(28) = 32.toByte
    assert(MediaCodec.decodeBmpGray8x8(wrongBpp).isEmpty, "non-24bpp")
  }

  test("aHash pairs are brightness-shift invariant and Hamming-verified") {
    val rows = Multimodal.perceptualDedup.build(spark, d).collect()
    assert(rows.nonEmpty, "fixture must produce near-dup image pairs")
    assert(rows.forall(_.getLong(2) <= Multimodal.AHashTau))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    // brightness invariance: +10 on every channel (no wrap) leaves
    // every above-mean bit — and hence the hash — unchanged
    def bands(bmp: Array[Byte]): Seq[Int] = {
      val g = MediaCodec.decodeBmpGray8x8(bmp).get
      val total = g.sum
      (0 until 8).map(y => (0 until 8).foldLeft(0)((b, x) =>
        if (g(y * 8 + x) * 64 > total) b | (1 << x) else b))
    }
    val base = MediaCodec.encodeBmp(9, 7, (x, y, c) => (x * 5 + y * 9 + c).toByte)
    val lit = MediaCodec.encodeBmp(9, 7, (x, y, c) => (x * 5 + y * 9 + c + 10).toByte)
    assert(bands(base) === bands(lit), "global brightness shift must not move the hash")
  }

  test("WAV sample decoder round-trips encoded PCM and rejects junk") {
    val wav = MediaCodec.encodeWav(2, 16000, 5, i => (i * 1000 - 2500).toShort)
    val got = MediaCodec.decodeWavSamples(wav).get
    assert(got.toSeq === (0L until 10L).map(i => (i * 1000 - 2500).toShort))
    assert(MediaCodec.decodeWavSamples(wav.take(43)).isEmpty, "short header")
    assert(MediaCodec.decodeWavSamples(wav.take(50)).isEmpty, "truncated data chunk")
    assert(MediaCodec.decodeWavSamples("BMnotawav".getBytes("US-ASCII")).isEmpty)
    // the hardened walk still finds samples past an odd-sized chunk
    val odd = wav.take(36) ++ "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array.fill[Byte](4)(0) ++ wav.drop(36)
    assert(MediaCodec.decodeWavSamples(odd).exists(_.length === 10))
  }

  test("audio envelope covers every audio payload with consistent integer invariants") {
    val rows = Multimodal.audioEnvelope.build(spark, d).collect()
    val nAudio = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 2 === 1).count()
    assert(rows.length.toLong === nAudio)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === ((id / 2) % 2 + 1) * (id % 100 + 1), s"audio $id sample count")
      assert(r.getLong(2) >= 0L)
      assert(r.getInt(3) >= 0 && r.getInt(3) < 8)
      assert(r.getInt(4) >= 0 && r.getInt(4) < 256)
    }
    // envelopes must actually discriminate across the set
    assert(rows.map(_.getInt(4)).distinct.length > 1, "envelope bits are constant — vacuous")
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
