package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
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
}
