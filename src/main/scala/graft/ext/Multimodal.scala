package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Inventory.Q

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition mappers.
  *
  * The decode step is STUBBED (this environment ships no codec
  * libraries): `decodeStub` derives deterministic fake dimensions and
  * features from the payload bytes. Everything around it — the typed
  * `Dataset[MediaItem]` schema, per-partition batching (decoder state
  * is initialized once per partition, the shape a real codec needs),
  * frame sampling, and the downstream relational aggregation — is real
  * and tested.
  *
  * Scale notes: `mapPartitions` keeps the decode embarrassingly
  * parallel with zero shuffle; payloads never serialize to the driver.
  * At 100 TB the payload column lives in its own parquet column chunk,
  * so metadata-only queries never read the bytes (column pruning), and
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory.
  */
object Multimodal {

  /** One media object: opaque payload + routing metadata. */
  final case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded (stub) per-item features. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** One sampled frame of a "video" payload. */
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame_bytes: Long, frame_crc: Long)

  private def crc(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue
  }

  /** 60-bit md5-derived payload hash — same construction as
    * `Dedup.hash60`, computed JVM-side for the per-partition mapper
    * (and reproducible as `('0x' || substr(md5(s),1,15))::BIGINT` in
    * the oracle).
    */
  def hash60Bytes(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** STUB decoder — a real implementation would hand `payload` to a
    * codec (ImageIO / ffmpeg / soundfile); this derives deterministic
    * fake dimensions from the payload hash so the pipeline is testable
    * AND oracle-reproducible.
    */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val h = hash60Bytes(item.payload)
    val mean =
      if (item.payload.isEmpty) 0.0
      else item.payload.map(b => (b & 0xff).toLong).sum.toDouble / item.payload.length
    MediaFeatures(
      media_id = item.media_id,
      kind = item.kind,
      n_bytes = item.payload.length.toLong,
      width = (h % 1920).toInt + 1,
      height = ((h >> 16) % 1080).toInt + 1,
      // ceil(len/FrameBytes): agrees with the count of frames
      // `sampleFrames` actually materializes (grouped(FrameBytes)),
      // including 0 frames for an empty payload
      n_frames =
        if (item.kind == "video") ((item.payload.length + FrameBytes - 1) / FrameBytes)
        else 1,
      mean_byte = mean)
  }

  val FrameBytes = 1024

  /** Decode features, one pass, decoder state per partition. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    items.mapPartitions { it =>
      // per-partition init point: a real codec opens its context here
      it.map(decodeStub)
    }
  }

  /** Sample every `step`-th fixed-size frame of "video" payloads. */
  def sampleFrames(items: Dataset[MediaItem], step: Int = 2): Dataset[MediaFrame] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFrame]
    items.filter((i: MediaItem) => i.kind == "video").mapPartitions { it =>
      it.flatMap { item =>
        item.payload.grouped(FrameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % step == 0 =>
            MediaFrame(item.media_id, idx, frame.length.toLong, crc(frame))
        }
      }
    }
  }

  /** The harness has no binary table; derive one deterministically
    * from `documents` (payload = UTF-8 bytes, kind by doc_id mod 3).
    */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaItem] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaItem]
    s.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** Decode-stub features aggregated per kind (plus frame counts for
    * videos), hash-match verified against a DuckDB replay of the stub.
    */
  val features: Q = Q(
    (s, d) => {
      val items = mediaFromDocuments(s, d)
      val feats = extractFeatures(items)
      val frames = sampleFrames(items)
        .groupBy(col("media_id")).agg(count(lit(1)).as("frames_sampled"))
      feats.toDF()
        .join(frames, Seq("media_id"), "left")
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"),
          sum(col("n_frames")).as("total_frames"),
          sum(coalesce(col("frames_sampled"), lit(0L))).as("total_frames_sampled"))
        .orderBy("kind")
    },
    // The stub's fake dimensions derive from the md5-based payload
    // hash, so DuckDB reproduces them exactly. grouped(1024) yields
    // ceil(len/1024) frames; sampling every 2nd gives ceil(frames/2).
    Some(s"""WITH m AS (
            |  SELECT doc_id AS media_id,
            |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
            |    octet_length(encode(text)) AS n_bytes,
            |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
            |  FROM documents
            |), f AS (
            |  SELECT media_id, kind, n_bytes,
            |    CAST(h % 1920 + 1 AS INTEGER) AS width,
            |    CAST((h >> 16) % 1080 + 1 AS INTEGER) AS height,
            |    CAST(CASE WHEN kind = 'video' THEN (n_bytes + $FrameBytes - 1) // $FrameBytes ELSE 1 END AS INTEGER) AS n_frames,
            |    CASE WHEN kind = 'video'
            |         THEN ((n_bytes + $FrameBytes - 1) // $FrameBytes + 1) // 2
            |         ELSE 0 END AS frames_sampled
            |  FROM m
            |)
            |SELECT kind, count(*) AS n_items, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
            |       min(width) AS min_width, max(height) AS max_height,
            |       CAST(sum(n_frames) AS BIGINT) AS total_frames,
            |       CAST(sum(frames_sampled) AS BIGINT) AS total_frames_sampled
            |FROM f GROUP BY kind ORDER BY kind""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq("multimodal_features" -> features)
}
