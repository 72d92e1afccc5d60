package graft.pipeline

/** REAL pure-JVM media codecs for the multimodal pipeline: netpbm images
  * (PGM/PPM, ASCII and binary) and RIFF/WAV PCM-16 audio. These formats
  * are fully specified by public documentation and need no native
  * libraries, so decode / resize / feature-extract can be exercised
  * end-to-end in any environment; compressed formats (JPEG/MP3/H.264)
  * still route through the declared stub in [[Multimodal]].
  *
  * All functions are total: malformed payloads return None, never throw —
  * at corpus scale a decoder that dies on one corrupt file kills a
  * 10k-partition job.
  */
object MediaCodecs {

  /** Decoded raster: `pixels` is row-major interleaved, `maxval`-scaled
    * unsigned bytes (maxval <= 255 enforced). */
  final case class ImageData(width: Int, height: Int, channels: Int,
                             pixels: Array[Byte])

  /** PCM audio: interleaved 16-bit samples. */
  final case class AudioData(sampleRate: Int, channels: Int,
                             samples: Array[Short])

  // ---- compressed rasters via the JDK's built-in ImageIO ----
  // PNG/JPEG/BMP/GIF readers ship with java.desktop — pure JVM, no native
  // libraries, headless-safe (decode never touches a display). This is a
  // REAL codec path, not a stub: pixels round-trip exactly for the
  // lossless containers (PNG/BMP/GIF).

  /** Container name for payloads ImageIO handles, by magic bytes;
    * None = not an ImageIO container (or too short to tell). */
  def imageIoFormat(p: Array[Byte]): Option[String] = {
    if (p == null || p.length < 4) return None
    if (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') Some("png")
    else if (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) Some("jpeg")
    else if (p(0) == 'B' && p(1) == 'M') Some("bmp")
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') Some("gif")
    else None
  }

  /** Decode a PNG/JPEG/BMP/GIF payload to the shared raster shape:
    * grayscale sources → 1 channel, everything else → interleaved RGB.
    * Total like every codec here (malformed/oversized → None). The
    * 64M-pixel cap bounds per-row decode memory at corpus scale. */
  def decodeImageIO(payload: Array[Byte]): Option[ImageData] = {
    if (imageIoFormat(payload).isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val gray = img.getColorModel.getNumComponents == 1
      val c = if (gray) 1 else 3
      val out = new Array[Byte](w * h * c)
      if (gray) {
        // Raw raster samples, not getRGB: getRGB routes 1-component images
        // through a gray→sRGB colorspace conversion, shifting luminance for
        // externally-produced gray PNGs. >8-bit gray scales down to 8.
        val raster = img.getRaster
        val shift = math.max(0, img.getColorModel.getComponentSize(0) - 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = ((raster.getSample(x, y, 0) >> shift) & 0xff).toByte
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val base = (y * w + x) * c
            out(base) = ((rgb >> 16) & 0xff).toByte
            out(base + 1) = ((rgb >> 8) & 0xff).toByte
            out(base + 2) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
      }
      Some(ImageData(w, h, c, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode the shared raster shape as PNG (lossless, pure JDK) — the
    * write side for resized compressed-container images. */
  def encodePng(img: ImageData): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      if (img.channels == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    if (img.channels == 1) {
      // Write raw samples via the raster (setRGB would push them through
      // the sRGB→gray conversion and break exact round-trips).
      val raster = bi.getRaster
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          raster.setSample(x, y, 0, img.pixels(y * img.width + x) & 0xff)
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val base = (y * img.width + x) * 3
          bi.setRGB(x, y, ((img.pixels(base) & 0xff) << 16) |
            ((img.pixels(base + 1) & 0xff) << 8) | (img.pixels(base + 2) & 0xff))
          x += 1
        }
        y += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Any supported still-image container → raster (netpbm first — cheap
    * sniff — then the ImageIO family). */
  def decodeAnyImage(payload: Array[Byte]): Option[ImageData] =
    decodeNetpbm(payload).orElse(decodeImageIO(payload))

  // ---- netpbm (PGM P2/P5, PPM P3/P6) ----

  def decodeNetpbm(payload: Array[Byte]): Option[ImageData] = {
    if (payload == null || payload.length < 2 || payload(0) != 'P') return None
    val channels = payload(1) match {
      case '2' | '5' => 1
      case '3' | '6' => 3
      case _ => return None
    }
    val binary = payload(1) == '5' || payload(1) == '6'
    try {
      var pos = 2
      // header tokens with '#' comments; binary raster starts after EXACTLY
      // one whitespace char following maxval
      def nextToken(): Option[Int] = {
        while (pos < payload.length &&
               (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
        if (pos == start) None
        else Some(new String(payload, start, pos - start, "US-ASCII").toInt)
      }
      val w = nextToken().getOrElse(return None)
      val h = nextToken().getOrElse(return None)
      val maxval = nextToken().getOrElse(return None)
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      // long math: a crafted header like 65536x65536 would overflow the
      // int raster size to ~0, "decode" ok, then crash resize with AIOOBE
      val nL = w.toLong * h * channels
      if (nL > payload.length.toLong) return None // also bounds Int overflow
      val n = nL.toInt
      val px = new Array[Byte](n)
      if (binary) {
        pos += 1 // the single whitespace after maxval
        if (payload.length - pos < n) return None
        System.arraycopy(payload, pos, px, 0, n)
      } else {
        var i = 0
        while (i < n) {
          val v = nextToken().getOrElse(return None)
          if (v < 0 || v > maxval) return None
          px(i) = v.toByte; i += 1
        }
      }
      Some(ImageData(w, h, channels, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Binary netpbm encode (P5 for 1 channel, P6 for 3). */
  def encodeNetpbm(img: ImageData): Array[Byte] = {
    val magic = if (img.channels == 1) "P5" else "P6"
    val header = s"$magic\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor resize (row-major interleaved, any channel count). */
  def resizeNearest(img: ImageData, outW: Int, outH: Int): ImageData = {
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    val c = img.channels
    val out = new Array[Byte](outW * outH * c)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val src = (sy * img.width + sx) * c
        val dst = (y * outW + x) * c
        var k = 0
        while (k < c) { out(dst + k) = img.pixels(src + k); k += 1 }
        x += 1
      }
      y += 1
    }
    ImageData(outW, outH, c, out)
  }

  /** Normalized luminance histogram (`bins` buckets over 0..255): a real,
    * deterministic image feature. RGB collapses via integer BT.601 weights
    * ((77r + 150g + 29b) >> 8 — exact, no float rounding ambiguity). */
  def luminanceHistogram(img: ImageData, bins: Int): Array[Float] = {
    require(bins > 0 && bins <= 256)
    val counts = new Array[Int](bins)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val lum = if (img.channels == 1) img.pixels(i) & 0xff
      else {
        val b = i * img.channels
        (77 * (img.pixels(b) & 0xff) + 150 * (img.pixels(b + 1) & 0xff) +
          29 * (img.pixels(b + 2) & 0xff)) >> 8
      }
      counts(lum * bins / 256) += 1
      i += 1
    }
    val out = new Array[Float](bins)
    i = 0
    while (i < bins) { out(i) = counts(i).toFloat / n; i += 1 }
    out
  }

  // ---- RIFF / WAV (PCM 16-bit) ----

  def decodeWavPcm16(payload: Array[Byte]): Option[AudioData] = {
    if (payload == null || payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      if (bb.getInt(0) != 0x46464952 /* "RIFF" */ ||
          bb.getInt(8) != 0x45564157 /* "WAVE" */) return None
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtOk = false
      var samples: Array[Short] = null
      // chunk walk: [id:4][size:4][data:size (padded to even)]
      while (pos + 8 <= payload.length && (samples == null || !fmtOk)) {
        val id = bb.getInt(pos)
        val size = bb.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > payload.length) return None
        if (id == 0x20746d66) { // "fmt "
          if (size < 16) return None
          if (bb.getShort(pos + 8) != 1) return None // PCM only
          channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
          fmtOk = channels > 0 && sampleRate > 0 && bits == 16
          if (!fmtOk) return None
        } else if (id == 0x61746164) { // "data"
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort(pos + 8 + i * 2); i += 1 }
        }
        pos += 8 + size + (size & 1)
      }
      if (fmtOk && samples != null) Some(AudioData(sampleRate, channels, samples))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PCM16 WAV encoder — the write half of [[decodeWavPcm16]] (canonical
    * 44-byte header + one data chunk), so synthetic audio fixtures go
    * through REAL container round-trips like the PNG/netpbm image path. */
  def encodeWavPcm16(audio: AudioData): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(audio.channels.toShort)
    bb.putInt(audio.sampleRate)
    bb.putInt(audio.sampleRate * audio.channels * 2) // byte rate
    bb.putShort((audio.channels * 2).toShort) // block align
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    audio.samples.foreach(bb.putShort)
    bb.array()
  }

  /** 64-bit temporal ENERGY fingerprint — the audio analogue of [[dHash64]]
    * (the published energy-delta fingerprint family, e.g. Haitsma &
    * Kalker 2002 reduced to one band): the signal splits into 65 equal
    * windows on the integer grid and bit i is set where window i+1's mean
    * squared energy exceeds window i's. Window energies are EXACT integer
    * sums of sample squares (channel-interleaved), so the hash is
    * bit-deterministic; comparisons of mean energies are invariant to
    * exact global gain (both sides scale together). Degenerate inputs
    * (< 65 frames) fall back to one-frame windows like [[blockMean]].
    * Pair with [[graft.pipeline.Dedup.hammingNearDups]] for audio
    * near-dup mining. */
  def audioFingerprint64(audio: AudioData): Long = {
    val ch = math.max(1, audio.channels)
    val frames = audio.samples.length / ch
    if (frames == 0) return 0L
    // exact per-window (sumSq, count); the mean comparison cross-multiplies
    // into 128 bits (sumSq can reach 2^30·samples — far past a Double's
    // 53-bit mantissa for long clips), done allocation-free with
    // Math.multiplyHigh + an unsigned low-word compare.
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val f0 = (w.toLong * frames / 65).toInt
      val f1 = math.max(f0 + 1, ((w + 1).toLong * frames / 65).toInt)
      val end = math.min(f1, frames)
      val start = math.min(f0, frames - 1)
      var f = start
      var s = 0L
      while (f < end) {
        var c = 0
        while (c < ch) {
          val v = audio.samples(f * ch + c).toLong
          s += v * v
          c += 1
        }
        f += 1
      }
      sums(w) = s
      counts(w) = (end - start).toLong * ch
      w += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      // mean(i+1) > mean(i)  ⇔  sums(i+1)·counts(i) > sums(i)·counts(i+1).
      // All operands are nonnegative, so the 128-bit products compare as
      // (signed high word, unsigned low word) — exact, zero allocation
      // (the earlier BigInt form allocated 128 objects per clip: noise at
      // 500 fixtures, real at 10^9 clips).
      val hiL = Math.multiplyHigh(sums(i + 1), counts(i))
      val loL = sums(i + 1) * counts(i)
      val hiR = Math.multiplyHigh(sums(i), counts(i + 1))
      val loR = sums(i) * counts(i + 1)
      if (hiL > hiR ||
          (hiL == hiR && java.lang.Long.compareUnsigned(loL, loR) > 0))
        h |= 1L << (63 - i)
      i += 1
    }
    h
  }

  /** RMS energy per window of `windowFrames` frames (channel-averaged,
    * normalized to [0,1]): a real, deterministic audio feature usable for
    * silence trimming / energy-based segmentation. */
  def rmsWindows(audio: AudioData, windowFrames: Int): Array[Float] = {
    require(windowFrames > 0)
    val c = audio.channels
    val frames = audio.samples.length / c
    val nWin = (frames + windowFrames - 1) / windowFrames
    val out = new Array[Float](nWin)
    var w = 0
    while (w < nWin) {
      val from = w * windowFrames
      val to = math.min(frames, from + windowFrames)
      var acc = 0.0
      var f = from
      while (f < to) {
        var k = 0
        while (k < c) {
          val s = audio.samples(f * c + k) / 32768.0
          acc += s * s; k += 1
        }
        f += 1
      }
      out(w) = math.sqrt(acc / ((to - from) * c)).toFloat
      w += 1
    }
    out
  }

  // ---- perceptual hashes (image near-dup primitives) ----

  /** Integer luma (ITU-R 601 weights, /1000 floor) at pixel (x, y) —
    * exact integer arithmetic so hashes are bit-deterministic. */
  private def grayAt(img: ImageData, x: Int, y: Int): Int =
    if (img.channels == 1) img.pixels(y * img.width + x) & 0xff
    else {
      val b = (y * img.width + x) * img.channels
      (299 * (img.pixels(b) & 0xff) + 587 * (img.pixels(b + 1) & 0xff) +
        114 * (img.pixels(b + 2) & 0xff)) / 1000
    }

  /** Floor-mean gray over the block grid cell (bx, by) of a gw×gh grid;
    * degenerate cells (image smaller than the grid) fall back to the
    * single nearest pixel, so every cell is defined for any ≥1×1 image. */
  private def blockMean(img: ImageData, bx: Int, by: Int,
                        gw: Int, gh: Int): Int = {
    val x0 = bx * img.width / gw
    val x1 = math.max(x0 + 1, (bx + 1) * img.width / gw)
    val y0 = by * img.height / gh
    val y1 = math.max(y0 + 1, (by + 1) * img.height / gh)
    var s = 0L; var n = 0L
    var y = math.min(y0, img.height - 1)
    val yEnd = math.min(y1, img.height)
    while (y < yEnd) {
      var x = math.min(x0, img.width - 1)
      val xEnd = math.min(x1, img.width)
      while (x < xEnd) { s += grayAt(img, x, y); n += 1; x += 1 }
      y += 1
    }
    if (n == 0) grayAt(img, math.min(x0, img.width - 1),
      math.min(y0, img.height - 1))
    else (s / n).toInt
  }

  /** 64-bit AVERAGE hash: 8×8 block means, bit set where the block mean
    * exceeds the floor-mean of the 64 block means. Bit (by*8 + bx) from
    * the MSB. Pure integer arithmetic — deterministic across JVMs. */
  def aHash64(img: ImageData): Long = {
    val m = Array.tabulate(8, 8)((by, bx) => blockMean(img, bx, by, 8, 8))
    val avg = m.flatten.map(_.toLong).sum / 64
    var h = 0L
    var i = 0
    while (i < 64) {
      if (m(i / 8)(i % 8) > avg) h |= 1L << (63 - i)
      i += 1
    }
    h
  }

  /** 64-bit DIFFERENCE hash: 9×8 block means, bit set where the left
    * block mean is less than its right neighbor (gradient direction) —
    * more robust than aHash to global brightness shifts. */
  def dHash64(img: ImageData): Long = {
    val m = Array.tabulate(8, 9)((by, bx) => blockMean(img, bx, by, 9, 8))
    var h = 0L
    var i = 0
    while (i < 64) {
      if (m(i / 8)(i % 8) < m(i / 8)(i % 8 + 1)) h |= 1L << (63 - i)
      i += 1
    }
    h
  }

  /** Fixed-point DCT-II basis for N=32: round(cos(pi*(2x+1)*u/64) * 2^14),
    * built from StrictMath (fdlibm — bit-identical on every JVM) so the
    * whole pHash pipeline is exact integer arithmetic. */
  private lazy val DctCos32: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 64.0) * (1 << 14)))

  /** 64-bit PERCEPTUAL hash (the published pHash recipe): downsample to a
    * 32×32 gray raster (floor block means — any input size), 2-D DCT-II,
    * keep the top-left 8×8 coefficients, set bit i where coefficient i
    * exceeds the MEDIAN of the 63 AC coefficients (DC excluded — it is
    * pure brightness). Bit (v*8 + u) from the MSB; the DC bit (MSB) is
    * always 0. Markedly more robust than [[aHash64]] to resize and
    * brightness/contrast perturbation: sign-vs-median of low-frequency
    * energy survives resampling that flips near-mean block bits.
    *
    * All-integer: gray is integer luma, the DCT uses the 2^14 fixed-point
    * cosine table (separable row/column passes, plain Long products — max
    * |coeff| < 2^14·2^14·255·32² « 2^63, no overflow), and the median is
    * an integer compare. Bit-deterministic across JVMs and platforms. */
  def pHash64(img: ImageData): Long = {
    val g = Array.tabulate(32 * 32)(i => blockMean(img, i % 32, i / 32, 32, 32).toLong)
    // separable DCT: rows first (32 rows × 8 output freqs), then columns
    val rows = Array.ofDim[Long](32 * 8)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var x = 0
        while (x < 32) { acc += DctCos32(u)(x) * g(y * 32 + x); x += 1 }
        rows(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var yy = 0
        while (yy < 32) { acc += DctCos32(v)(yy) * rows(yy * 8 + u); yy += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = ac(31) // the 32nd smallest of the 63 AC coefficients
    var h = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > median) h |= 1L << (63 - i)
      i += 1
    }
    h
  }
}
