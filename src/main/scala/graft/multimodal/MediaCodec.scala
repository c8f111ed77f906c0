package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real, pure-JVM media codecs for the multimodal operators.
  *
  * The test corpus has no media files, so payloads are SYNTHESIZED —
  * but unlike the former byte-arithmetic stub, they are genuine PNG
  * (via `javax.imageio`, gray + truecolor) and WAV (RIFF/PCM16)
  * files any external tool can open, and the read path genuinely
  * DECODES them: `ImageIO.read` for pixels, RIFF chunk-walk for
  * samples, header-only parses for metadata. What makes the operators
  * oracle-able is that the synthesized CONTENT follows closed-form
  * formulas in `doc_id` ([[grayAt]], [[rgbAt]], [[sampleAt]]), so
  * DuckDB reproduces the decoded statistics arithmetically — which
  * also pins, end to end, that encode→decode round-trips bit-exactly.
  *
  * Everything here is executor-side code invoked from
  * `mapPartitions` batches; it holds no Spark dependency.
  */
object MediaCodec {

  // ---- deterministic content formulas (shared with the oracles) ----

  def widthOf(id: Long): Int = 16 + (id % 9).toInt
  def heightOf(id: Long): Int = 12 + (id % 7).toInt

  def grayAt(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** (r, g, b) channels of the truecolor variant. */
  def rgbAt(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 37 + x * 11 + y * 17) % 256).toInt,
    ((id * 41 + x * 13 + y * 19) % 256).toInt)

  def numSamplesOf(id: Long): Int = 64 + (id % 9).toInt * 16

  /** Signed PCM16 sample i. */
  def sampleAt(id: Long, i: Int): Int =
    (((id * 131 + i * 17) % 65536) - 32768).toInt

  val WavSampleRate = 8000

  // ---- encoders (payload synthesis) --------------------------------

  def encodeGrayPng(id: Long): Array[Byte] = {
    val (w, h) = (widthOf(id), heightOf(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, grayAt(id, x, y))
    toPng(img)
  }

  /** The truecolor content formula as a BufferedImage — shared by
    * the lossless (PNG) and lossy (JPEG) encoders. */
  private def rgbImage(id: Long): BufferedImage = {
    val (w, h) = (widthOf(id), heightOf(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbAt(id, x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  def encodeRgbPng(id: Long): Array[Byte] = toPng(rgbImage(id))

  /** Encode an arbitrary channel-value matrix (the shape
    * [[decodeImage]] returns) back to PNG — the resize re-encode
    * path. */
  def encodeImage(w: Int, h: Int, channels: Int,
      value: (Int, Int, Int) => Int): Array[Byte] = {
    if (channels == 1) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, value(x, y, 0))
      toPng(img)
    } else {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y,
          (value(x, y, 0) << 16) | (value(x, y, 1) << 8) | value(x, y, 2))
      toPng(img)
    }
  }

  private def toPng(img: BufferedImage): Array[Byte] =
    toBytes(img, "png")

  private def toBytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no $fmt writer available")
    out.toByteArray
  }

  /** The LOSSY path: encode the truecolor content formula as baseline
    * JPEG via `javax.imageio`'s built-in writer (default quality).
    * Real multimodal corpora are JPEG-dominated; unlike the PNG path
    * the decoded pixels only APPROXIMATE [[rgbAt]], so the query
    * contract is a tolerance bound, not bit-exactness
    * (see Multimodal.mm_jpeg). */
  def encodeJpeg(id: Long): Array[Byte] = toBytes(rgbImage(id), "jpg")

  /** A canonical 44-byte-header RIFF/WAVE file: PCM16, mono,
    * [[WavSampleRate]] Hz, little-endian samples. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = numSamplesOf(id)
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavSampleRate)
      .putInt(WavSampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { buf.putShort(sampleAt(id, i).toShort); i += 1 }
    buf.array()
  }

  // ---- video: uncompressed RIFF/AVI --------------------------------

  def numFramesOf(id: Long): Int = 4 + (id % 5).toInt
  /** 8-bit grayscale pixel of frame f — the closed-form content
    * formula the oracle reproduces. */
  def frameGrayAt(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 29 + x * 7 + y * 13) % 256).toInt
  val AviFps = 10

  /** A minimal, tool-openable RIFF/AVI: one 'vids' stream of
    * UNCOMPRESSED 8-bit palettized DIB frames ('00db' chunks,
    * identity grayscale palette, bottom-up rows, 4-byte row stride —
    * the Windows DIB contract). Uncompressed by design: the frame
    * bytes ARE the content formula, so decode→stats oracles exactly
    * (the mm_jpeg pattern covers lossy; video's oracle-able form is
    * raw DIB). */
  def encodeAvi(id: Long): Array[Byte] = {
    val (w, h, n) = (widthOf(id), heightOf(id), numFramesOf(id))
    val stride = (w + 3) & ~3
    val frameBytes = stride * h
    val strfLen = 40 + 256 * 4
    val strlLen = 4 + (8 + 56) + (8 + strfLen)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + n * (8 + frameBytes)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffLen); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlLen); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(1000000 / AviFps) // µs per frame
      .putInt(frameBytes * AviFps).putInt(0).putInt(0)
      .putInt(n).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(strlLen); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag("DIB ")
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(AviFps) // scale, rate → fps
      .putInt(0).putInt(n).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(w.toShort).putShort(h.toShort) // rcFrame
    tag("strf"); buf.putInt(strfLen)
    buf.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(8) // planes, bpp
      .putInt(0) // BI_RGB
      .putInt(frameBytes).putInt(0).putInt(0)
      .putInt(256).putInt(256)
    var c = 0
    while (c < 256) { // identity grayscale palette (b, g, r, 0)
      buf.put(c.toByte).put(c.toByte).put(c.toByte).put(0.toByte)
      c += 1
    }
    tag("LIST"); buf.putInt(moviLen); tag("movi")
    var f = 0
    while (f < n) {
      tag("00db"); buf.putInt(frameBytes)
      var y = h - 1 // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) { buf.put(frameGrayAt(id, f, x, y).toByte); x += 1 }
        while (x < stride) { buf.put(0.toByte); x += 1 }
        y -= 1
      }
      f += 1
    }
    buf.array()
  }

  private def isAvi(b: Array[Byte]): Boolean =
    b.length > 24 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
      b(11) == ' '

  /** Bounds-checked, depth-bounded RIFF walk over an AVI payload:
    * `(frames, w, h, bitCount, frame-data offsets)`. Media columns
    * are UNTRUSTED corpus bytes — negative/oversized chunk lengths
    * and hostile LIST nesting must terminate loudly, never loop or
    * walk out of the array. */
  private def aviChunks(bytes: Array[Byte])
      : (Int, Int, Int, Int, Seq[Int]) = {
    require(isAvi(bytes), "not a RIFF/AVI payload")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var frames = -1
    var w = -1
    var h = -1
    var bitCount = -1
    val frameOffs = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(start: Long, end: Long, depth: Int): Unit = {
      require(depth < 8, "AVI LIST nesting exceeds sane depth")
      var pos = start
      while (pos + 8 <= end) {
        val p = pos.toInt
        val t = new String(bytes, p, 4, "US-ASCII")
        val len = bb.getInt(p + 4)
        require(len >= 0, "malformed AVI chunk length")
        require(pos + 8 + len <= end, s"truncated AVI chunk '$t'")
        t match {
          case "LIST" =>
            require(len >= 4, "malformed AVI LIST")
            walk(pos + 12, pos + 8 + len, depth + 1)
          case "avih" =>
            require(len >= 40, "truncated avih header")
            frames = bb.getInt(p + 8 + 16)
            w = bb.getInt(p + 8 + 32)
            h = bb.getInt(p + 8 + 36)
          case "strf" =>
            require(len >= 40, "truncated strf header")
            bitCount = bb.getShort(p + 8 + 14).toInt
          case "00db" | "00dc" =>
            frameOffs += (p + 8)
          case _ => () // unknown chunks skip by length
        }
        pos += 8L + len + (len & 1)
      }
    }
    walk(12L, math.min(bytes.length.toLong, 8L + bb.getInt(4)), 0)
    require(frames >= 0 && w > 0 && h > 0,
      "AVI payload carries no avih header")
    // sanity-bound hostile dimensions BEFORE any Int geometry math:
    // w = h = 46341 makes stride*h wrap negative and a later
    // offset + stride*h bounds check pass vacuously
    require(w <= 32767 && h <= 32767 && frames <= (1 << 20),
      s"implausible AVI geometry ${w}x$h x$frames frames")
    (frames, w, h, bitCount, frameOffs.toSeq)
  }

  /** Header-only video metadata: `(n_frames, width, height)` from the
    * avih chunk — dimension/length filters prune before any frame
    * byte is touched. */
  def sniffAvi(bytes: Array[Byte]): (Int, Int, Int) = {
    val (frames, w, h, _, _) = aviChunks(bytes)
    (frames, w, h)
  }

  /** Full frame decode: `(w, h, n_frames, value(f, x, y))` — 8-bit
    * palettized DIB frames, bottom-up rows, 4-byte stride (the
    * identity grayscale palette makes the index the value). */
  def decodeAviFrames(bytes: Array[Byte])
      : (Int, Int, Int, (Int, Int, Int) => Int) = {
    val (frames, w, h, bitCount, offs) = aviChunks(bytes)
    require(bitCount == 8,
      s"AVI frame decode supports 8-bit DIB frames, got $bitCount bpp")
    require(offs.size == frames,
      s"AVI declares $frames frames but carries ${offs.size}")
    val stride = (w + 3) & ~3
    // Long arithmetic: bounded w/h still deserve overflow-proof math
    offs.foreach(o => require(o + stride.toLong * h <= bytes.length,
      "truncated AVI frame data"))
    (w, h, frames, (f, x, y) =>
      bytes(offs(f) + (h - 1 - y) * stride + x) & 0xff)
  }

  // ---- header-only metadata (the cheap pre-decode pass) ------------

  /** `(fmt, dim1, dim2)`: png/jpeg → (width, height) from the IHDR
    * chunk / SOF marker; wav → (n_samples, sample_rate) from the
    * fmt/data chunks. Reads ONLY the header bytes — the point of
    * metadata-before-decode pruning is that a filter on dimensions
    * never touches pixel data. Malformed headers (negative or
    * truncated chunk lengths — which would otherwise walk `pos`
    * backwards or loop) fail fast with IllegalArgumentException:
    * media columns are UNTRUSTED corpus bytes, so the header walk
    * must terminate on any input. */
  def sniff(bytes: Array[Byte]): (String, Int, Int) =
    if (isPng(bytes)) {
      // IHDR is mandated first: verify its tag before trusting the
      // width/height big-endian at 16/20 (a PNG-prefixed garbage
      // payload must fail fast, not return garbage dimensions)
      require(new String(bytes, 12, 4, "US-ASCII") == "IHDR",
        "malformed PNG: missing IHDR chunk")
      val bb = java.nio.ByteBuffer.wrap(bytes, 16, 8)
      val (w, h) = (bb.getInt, bb.getInt)
      require(w > 0 && h > 0, "malformed PNG dimensions")
      ("png", w, h)
    } else if (isJpeg(bytes)) {
      // segment walk to the first frame header (SOF0..SOF15 minus
      // the non-frame C4/C8/CC): height/width big-endian at +5/+7
      var pos = 2
      var dims: (Int, Int) = null
      while (dims == null) {
        require(pos + 4 <= bytes.length, "truncated JPEG header")
        require((bytes(pos) & 0xff) == 0xff, "malformed JPEG marker")
        // spec-legal 0xFF fill bytes may pad between segments
        // (ISO 10918-1 B.1.1.2) — skip them, don't misread one as a
        // marker byte and misalign the walk
        while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
          pos += 1
        require(pos + 4 <= bytes.length, "truncated JPEG header")
        val marker = bytes(pos + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          require(pos + 9 <= bytes.length, "truncated JPEG SOF segment")
          val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
          dims = (w, h)
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          pos += 2 // standalone markers carry no length field
        } else {
          val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
          require(len >= 2, "malformed JPEG segment length")
          pos += 2 + len
        }
      }
      ("jpeg", dims._1, dims._2)
    } else if (isWav(bytes)) {
      val (rate, bits, _, dataLen) = wavChunks(bytes)
      ("wav", dataLen / (bits / 8), rate)
    } else
      throw new IllegalArgumentException(
        "unrecognized media payload (not PNG, JPEG or RIFF/WAVE)")

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 33 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && (b(4) & 0xff) == 0x0d &&
      (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a &&
      (b(7) & 0xff) == 0x0a // full 8-byte signature

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** The RIFF chunk walk, shared by [[sniff]] and [[decodeWav]]:
    * `(rate, bits, dataPos, dataLen)`. Positions are LONG so a huge
    * declared chunk length cannot wrap negative past the loop guard;
    * the fmt chunk must declare >= 16 bytes (reading rate/bits from
    * a following chunk's bytes is silent garbage otherwise) and the
    * data chunk must fit inside the payload (a truncated file fails
    * HERE, not as an index error mid-decode). */
  private def wavChunks(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos: Long = 12 // past RIFF....WAVE
    var rate = 0
    var bits = 16
    var dataPos = -1L
    var dataLen = -1
    while (dataLen < 0 && pos + 8 <= bytes.length) {
      val p = pos.toInt
      val tag = new String(bytes, p, 4, "US-ASCII")
      val len = bb.getInt(p + 4)
      require(len >= 0, "malformed WAV chunk length")
      if (tag == "fmt ") {
        require(len >= 16 && pos + 24 <= bytes.length,
          "truncated WAV fmt chunk")
        rate = bb.getInt(p + 12)
        bits = bb.getShort(p + 22).toInt
        require(bits > 0 && bits % 8 == 0, "malformed WAV bit depth")
      } else if (tag == "data") {
        require(pos + 8 + len <= bytes.length,
          "truncated WAV data chunk")
        dataPos = pos + 8
        dataLen = len
      }
      pos += 8L + len + (len & 1) // len >= 0, Long pos: no wrap
    }
    require(dataLen >= 0, "WAV payload has no data chunk")
    (rate, bits, dataPos.toInt, dataLen)
  }

  // ---- full decode -------------------------------------------------

  /** Decode an image payload to a channel-value matrix accessor:
    * `(width, height, channels, value(x, y, c))`. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Int, (Int, Int, Int) => Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode payload")
    val gray = img.getColorModel.getNumComponents == 1
    if (gray) {
      val raster = img.getRaster
      (img.getWidth, img.getHeight, 1, (x, y, _) => raster.getSample(x, y, 0))
    } else {
      // one color-model conversion per (x, y), not one per channel:
      // every hot loop reads all three channels of a pixel back to
      // back, and getRGB is the expensive call. The accessor is
      // stateful and NOT thread-safe — per-row executor use only.
      var lastKey = Long.MinValue
      var lastPx = 0
      (img.getWidth, img.getHeight, 3, (x, y, c) => {
        val key = (x.toLong << 32) | (y & 0xffffffffL)
        if (key != lastKey) { lastPx = img.getRGB(x, y); lastKey = key }
        c match {
          case 0 => (lastPx >> 16) & 0xff
          case 1 => (lastPx >> 8) & 0xff
          case _ => lastPx & 0xff
        }
      })
    }
  }

  /** Decode a WAV payload to its PCM16 samples (ONE chunk walk —
    * callers that already sniffed pay no re-parse). */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    val (_, bits, dataPos, dataLen) = wavChunks(bytes)
    require(bits == 16, s"PCM decode supports 16-bit samples, got $bits")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(dataLen / 2)(i => bb.getShort(dataPos + i * 2).toInt)
  }
}
