package graft.ext

/** Pure-JVM media codec for the multimodal pipeline: byte-level
  * ENCODERS that emit real, spec-conformant BMP and WAV files, and a
  * byte-level DECODER that parses their headers back — no codec
  * library, just the file formats' published layouts (BMP:
  * BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian, 24bpp rows
  * padded to 4 bytes; WAV: canonical 44-byte RIFF/WAVE PCM header).
  *
  * The decoder is validated two independent ways: MultimodalSpec
  * round-trips it against the JDK's own ImageIO BMP writer and
  * AudioSystem WAV writer (so an encoder/decoder bug pair that cancels
  * out here is still caught against an independent implementation),
  * and the `multimodal_decode` registry query decodes
  * fixture-generated payloads whose parameters the DuckDB oracle
  * recomputes arithmetically.
  *
  * Scale notes: decode is a per-row header read — embarrassingly
  * parallel inside `mapPartitions`, zero shuffle, and it never touches
  * the pixel/sample body beyond length checks, so cost is independent
  * of payload size.
  */
object MediaCodec {

  /** Decoded header fields; exactly one of the image/audio field
    * groups is populated, by `kind`.
    */
  final case class Decoded(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Option[Int],
      height: Option[Int],
      bits_per_pixel: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      n_samples: Option[Long])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Bytes per padded 24bpp BMP pixel row. */
  def bmpStride(width: Int): Int = (3 * width + 3) / 4 * 4

  /** A complete, viewer-openable 24bpp BMP. `pixel(x, y)` returns the
    * (b, g, r) byte for channel c via pixel(x, y, c); rows are stored
    * bottom-up per the format.
    */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int, Int) => Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"bmp dims must be positive: $width x $height")
    val stride = bmpStride(width)
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // file size
    putLe32(out, 10, 54) // pixel data offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive = bottom-up
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bpp
    putLe32(out, 30, 0) // BI_RGB
    putLe32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        var c = 0
        while (c < 3) {
          out(rowOff + 3 * x + c) = pixel(x, y, c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** A complete canonical 44-byte-header PCM WAV. `sample(i)` supplies
    * the i-th 16-bit sample value across interleaved channels.
    */
  def encodeWav(channels: Int, sampleRate: Int, nSamplesPerChannel: Long,
      sample: Long => Short): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamplesPerChannel >= 0)
    val blockAlign = channels * 2 // 16-bit PCM
    val dataSize = (nSamplesPerChannel * blockAlign).toInt
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // fmt chunk size
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * blockAlign) // byte rate
    putLe16(out, 32, blockAlign)
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0L
    val total = nSamplesPerChannel * channels
    while (i < total) {
      putLe16(out, (44 + 2 * i).toInt, sample(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Sniffs the magic bytes and parses the header. BMP: width/height
    * from BITMAPINFOHEADER offsets 18/22 (negative height = top-down
    * orientation, reported as |height|). WAV: walks the RIFF chunk
    * list to the `fmt ` and `data` chunks — ImageIO-style writers may
    * interleave LIST/fact chunks, so fixed offset 36 for `data` is NOT
    * assumed. Unknown payloads decode to a "binary" row with only
    * n_bytes set.
    */
  def decode(mediaId: Long, payload: Array[Byte]): Decoded = {
    val n = payload.length.toLong
    if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
      Decoded(mediaId, "image", n,
        width = Some(le32(payload, 18)),
        height = Some(math.abs(le32(payload, 22))),
        bits_per_pixel = Some(le16(payload, 28)),
        channels = None, sample_rate = None, n_samples = None)
    } else if (payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') {
      var off = 12
      var channels = 0
      var rate = 0
      var bits = 0
      var dataSize = -1L
      var walking = true
      while (walking && off + 8 <= payload.length && dataSize < 0) {
        val id = new String(payload.slice(off, off + 4), "US-ASCII")
        val sz = le32(payload, off + 4).toLong & 0xffffffffL
        if (id == "fmt " && off + 24 <= payload.length) {
          channels = le16(payload, off + 10)
          rate = le32(payload, off + 12)
          bits = le16(payload, off + 22)
        }
        if (id == "data") dataSize = sz
        else {
          // RIFF chunks are word-aligned; step in LONG — a corrupt or
          // crafted size like 0xFFFFFFF8 truncated via toInt is -8,
          // which would advance by 0 and spin the executor task
          // forever. Any non-forward or out-of-range step ends the
          // walk; fields parsed so far still describe the header.
          val next = off.toLong + 8L + sz + (sz & 1L)
          if (next <= off || next > payload.length.toLong) walking = false
          else off = next.toInt
        }
      }
      val blockAlign = channels * (bits / 8)
      Decoded(mediaId, "audio", n,
        width = None, height = None, bits_per_pixel = None,
        channels = Some(channels), sample_rate = Some(rate),
        n_samples = if (blockAlign > 0 && dataSize >= 0) Some(dataSize / blockAlign) else None)
    } else {
      Decoded(mediaId, "binary", n, None, None, None, None, None, None)
    }
  }

  /** SAMPLE-level WAV decode for the audio fingerprint: the 16-bit
    * PCM payload of the `data` chunk as signed sample values, located
    * via the same hardened RIFF walk as [[decode]] (odd-chunk
    * padding honored, crafted sizes bounded). Returns None unless the
    * payload is a well-formed 16-bit PCM WAV whose data chunk fits —
    * truncated or crafted payloads fall out instead of faulting.
    */
  def decodeWavSamples(payload: Array[Byte]): Option[Array[Short]] = {
    if (payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
      payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    var off = 12
    var bits = 0
    var dataOff = -1
    var dataSize = -1L
    var walking = true
    while (walking && off + 8 <= payload.length && dataOff < 0) {
      val id = new String(payload.slice(off, off + 4), "US-ASCII")
      val sz = le32(payload, off + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 24 <= payload.length) bits = le16(payload, off + 22)
      if (id == "data") { dataOff = off + 8; dataSize = sz }
      else {
        val next = off.toLong + 8L + sz + (sz & 1L)
        if (next <= off || next > payload.length.toLong) walking = false
        else off = next.toInt
      }
    }
    if (bits != 16 || dataOff < 0 || dataOff.toLong + dataSize > payload.length.toLong)
      return None
    val n = (dataSize / 2).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = le16(payload, dataOff + 2 * i).toShort
      i += 1
    }
    Some(out)
  }

  /** PIXEL-level BMP decode for the perceptual hash: an 8×8
    * nearest-neighbor downsample of the 24bpp image, each cell the
    * SUM of its pixel's three channel bytes (0..765) — channel-order
    * agnostic, which keeps the grid identical however the writer
    * ordered BGR. Rows are stored bottom-up (positive height), so the
    * logical top-origin row y lives at dataOffset + (h−1−y)·stride;
    * the sample index floor(x·w/8) stays in range for any w ≥ 1.
    * Returns None for anything that is not a well-formed bottom-up
    * 24bpp BMP with a complete pixel array — truncated or crafted
    * payloads fall out here instead of faulting the task.
    */
  def decodeBmpGray8x8(payload: Array[Byte]): Option[Array[Int]] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val dataOffset = le32(payload, 10)
    val w = le32(payload, 18)
    val h = le32(payload, 22)
    val bpp = le16(payload, 28)
    if (bpp != 24 || w <= 0 || h <= 0 || dataOffset < 54) return None
    val stride = bmpStride(w)
    if (dataOffset.toLong + stride.toLong * h > payload.length.toLong) return None
    val g = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      val rowOff = dataOffset + (h - 1 - sy) * stride
      var x = 0
      while (x < 8) {
        val px = rowOff + 3 * (x * w / 8)
        g(y * 8 + x) = (payload(px) & 0xff) + (payload(px + 1) & 0xff) + (payload(px + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(g)
  }
}
