package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def fakeImage(w: Int, h: Int, c: Int, extra: Int = 16): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(w); bb.putInt(h); bb.putInt(c)
    (1 to extra).foreach(i => bb.put(i.toByte))
    bb.array()
  }

  private lazy val media = {
    import spark.implicits._
    Seq(
      (1L, "image", fakeImage(640, 480, 3), "s1"),
      (2L, "image", fakeImage(32, 32, 1), "s1"),
      (3L, "image", Array[Byte](1, 2, 3), "s2"), // corrupt: too short
      (4L, "video", fakeImage(1920, 1080, 3, extra = 4000), "s2")
    ).toDF("media_id", "media_type", "payload", "source")
  }

  test("decode stub: metadata extracted, corrupt rows flagged not dropped") {
    val rows = Multimodal.withDecodedMeta(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[org.apache.spark.sql.Row]("decoded")).toMap
    assert(rows(1L).getAs[Int]("width") == 640 && rows(1L).getAs[Boolean]("ok"))
    assert(rows(2L).getAs[Int]("channels") == 1)
    assert(!rows(3L).getAs[Boolean]("ok")) // corrupt survives with ok=false
    assert(rows.size == 4)
  }

  test("feature stub: deterministic fixed-dim embeddings") {
    val f1 = Multimodal.withFeatureStub(media, dim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](4).toArray).toMap
    val f2 = Multimodal.withFeatureStub(media, dim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](4).toArray).toMap
    assert(f1.keySet == Set(1L, 2L, 3L, 4L))
    for (k <- f1.keySet) {
      assert(f1(k).length == 8)
      assert(f1(k).toSeq == f2(k).toSeq) // deterministic
    }
    assert(f1(1L).toSeq != f1(2L).toSeq)
  }

  // ---- real codecs (netpbm, WAV PCM-16) ----

  private def pgm(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val header = s"P5\n# a comment\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ px
  }

  private def wav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("REAL netpbm decode: P5 header with comment parses; meta routed by magic") {
    import spark.implicits._
    val img = pgm(4, 2, Array.tabulate(8)(i => (i * 30).toByte))
    val sound = wav(16000, 1, Array.fill(320)(8192.toShort))
    val df = Seq((10L, "image", img, "s"), (11L, "audio", sound, "s"))
      .toDF("media_id", "media_type", "payload", "source")
    val meta = Multimodal.withDecodedMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[org.apache.spark.sql.Row]("decoded")).toMap
    val im = meta(10L)
    assert(im.getAs[String]("format") == "pgm" && im.getAs[Boolean]("ok"))
    assert(im.getAs[Int]("width") == 4 && im.getAs[Int]("height") == 2)
    val au = meta(11L)
    assert(au.getAs[String]("format") == "wav" && au.getAs[Boolean]("ok"))
    assert(au.getAs[Int]("sample_rate") == 16000 && au.getAs[Long]("n_frames") == 320L)
  }

  test("REAL resize: 4x4 checkerboard downsampled 2x2 keeps exact corner pixels") {
    import spark.implicits._
    // rows: 0,255 alternating per 2x2 block
    val px = Array[Int](
      0, 0, 255, 255,
      0, 0, 255, 255,
      255, 255, 0, 0,
      255, 255, 0, 0).map(_.toByte)
    val df = Seq((1L, pgm(4, 4, px))).toDF("media_id", "payload")
    val out = Multimodal.resizeImages(df, 2, 2).select("resized_payload")
      .head().getAs[Array[Byte]](0)
    val dec = MediaCodecs.decodeNetpbm(out).get
    assert(dec.width == 2 && dec.height == 2)
    // nearest-neighbor: out(x,y) = in(2x, 2y) → 0, 255, 255, 0
    assert(dec.pixels.map(_ & 0xff).toSeq == Seq(0, 255, 255, 0))
  }

  test("REAL features: luminance histogram sums to 1; RMS of a constant tone is exact") {
    import spark.implicits._
    val px = Array.tabulate(16)(i => (i * 16).toByte) // uniform spread 0..240
    val df = Seq((1L, pgm(4, 4, px))).toDF("media_id", "payload")
    val hist = Multimodal.withImageFeatures(df, bins = 4).select("image_features")
      .head().getSeq[Float](0)
    assert(hist.length == 4 && math.abs(hist.sum - 1.0f) < 1e-6)
    assert(hist.forall(_ == 0.25f)) // 16 values spread evenly over 4 bins

    // constant amplitude 8192 → RMS = 8192/32768 = 0.25 in every window
    val adf = Seq((2L, wav(16000, 2, Array.fill(640)(8192.toShort))))
      .toDF("media_id", "payload")
    val rms = Multimodal.withAudioFeatures(adf, windowFrames = 160)
      .select("audio_rms").head().getSeq[Float](0)
    assert(rms.length == 2) // 320 frames / 160
    assert(rms.forall(v => math.abs(v - 0.25f) < 1e-6))
  }

  test("REAL ImageIO decode: PNG round-trips pixels exactly; JPEG/BMP route by magic") {
    import spark.implicits._
    // 3x2 RGB with distinct pixel values, lossless through PNG
    val px = Array.tabulate(3 * 2 * 3)(i => (i * 7 + 3).toByte)
    val img = MediaCodecs.ImageData(3, 2, 3, px)
    val png = MediaCodecs.encodePng(img)
    assert(MediaCodecs.imageIoFormat(png).contains("png"))
    val back = MediaCodecs.decodeImageIO(png).get
    assert(back.width == 3 && back.height == 2 && back.channels == 3)
    assert(back.pixels.sameElements(px), "PNG is lossless: exact pixel round-trip")

    // the pipeline routes it: decoded meta, features, resize all real
    val df = Seq((1L, "image", png, "t")).toDF("media_id", "media_type", "payload", "source")
    val meta = Multimodal.withDecodedMeta(df).select("decoded.*").collect().head
    assert(meta.getString(0) == "png" && meta.getInt(1) == 3 && meta.getInt(2) == 2
      && meta.getBoolean(6))
    val feat = Multimodal.withImageFeatures(df, bins = 4)
      .select("image_features").collect().head.getSeq[Float](0)
    assert(math.abs(feat.sum - 1.0) < 1e-5)
    val resized = Multimodal.resizeImages(df, 2, 1)
      .select("resized_payload").collect().head.getAs[Array[Byte]](0)
    val rImg = MediaCodecs.decodeImageIO(resized).get
    assert(rImg.width == 2 && rImg.height == 1, "resized compressed rasters re-encode as PNG")

    // JPEG encodes via ImageIO too (lossy — dims and routing only)
    val bi = new java.awt.image.BufferedImage(5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val jpg = bos.toByteArray
    assert(MediaCodecs.imageIoFormat(jpg).contains("jpeg"))
    val j = MediaCodecs.decodeImageIO(jpg).get
    assert(j.width == 5 && j.height == 4)

    // truncated PNG: total function, falls through to unknown
    val broken = png.take(png.length / 2)
    val bMeta = Multimodal.withDecodedMeta(
      Seq((2L, "image", broken, "t")).toDF("media_id", "media_type", "payload", "source"))
      .select("decoded.*").collect().head
    assert(!bMeta.getBoolean(6) && bMeta.getString(0) == "unknown")
  }

  test("corrupt netpbm/wav payloads flag ok=false, never throw") {
    import spark.implicits._
    val truncated = pgm(100, 100, Array.fill(10)(1.toByte)) // raster too short
    val badWav = "RIFFxxxxWAVEjunk".getBytes
    // 65536*65536*1 overflows int to 0 — must reject, not "decode" ok
    // with garbage dims that would AIOOBE in resize
    assert(MediaCodecs.decodeNetpbm(
      ("P5\n65536 65536\n255\n" + "x" * 64).getBytes("US-ASCII")).isEmpty)
    val df = Seq((1L, truncated), (2L, badWav)).toDF("media_id", "payload")
    val meta = Multimodal.withDecodedMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[org.apache.spark.sql.Row]("decoded")).toMap
    assert(!meta(1L).getAs[Boolean]("ok") && !meta(2L).getAs[Boolean]("ok"))
  }

  test("codec fuzz: random and adversarial byte payloads never throw (total functions)") {
    val rnd = new scala.util.Random(99)
    val payloads: Seq[Array[Byte]] =
      Seq.tabulate(200)(i => Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)) ++ Seq(
        Array.empty[Byte],
        "P5".getBytes, "P6\n".getBytes, "P5\n-3 4\n255\n".getBytes,
        "P5\n4 4\n99999\n0123456789abcdef".getBytes, // maxval > 255
        "P2\n2 2\n255\n1 2 3".getBytes,              // too few ASCII pixels
        "P2\n2 2\n255\n1 2 3 999".getBytes,          // pixel > maxval
        "P5\n# only a comment".getBytes,
        "RIFF".getBytes, ("RIFF" + " " * 40).getBytes,
        // fmt claims 16-bit but data chunk missing
        "RIFF$   WAVEfmt    ".getBytes)
    for (p <- payloads) {
      MediaCodecs.decodeNetpbm(p)   // must not throw
      MediaCodecs.decodeWavPcm16(p) // must not throw
    }
    // seeded P5/P6/WAV prefixes with corrupted tails
    for (i <- 1 to 100) {
      val good = if (i % 2 == 0) pgm(4, 4, Array.fill(16)(7.toByte))
                 else wav(8000, 1, Array.fill(32)(5.toShort))
      val cut = good.take(rnd.nextInt(good.length))
      val flipped = good.clone()
      flipped(rnd.nextInt(flipped.length)) = rnd.nextInt.toByte
      MediaCodecs.decodeNetpbm(cut); MediaCodecs.decodeWavPcm16(cut)
      MediaCodecs.decodeNetpbm(flipped); MediaCodecs.decodeWavPcm16(flipped)
    }
  }

  test("frame sampling: every stride-th fixed-size chunk becomes a row") {
    val frames = Multimodal.sampleFrames(
        media.filter(col("media_id") === 4), frameBytes = 1000, stride = 2)
      .select("media_id", "frame_idx", "frame_payload").collect()
    // payload = 4012 bytes → 5 chunks (4×1000 + 12) → kept idx 0, 2, 4
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq.sorted == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_payload").length <= 1000))
  }
}

class PerceptualHashSpec extends graft.SparkSpec {
  import MediaCodecs.{ImageData, aHash64, dHash64, pHash64, encodeNetpbm, resizeNearest}

  private def randImg(seed: Int, w: Int = 16, h: Int = 16): ImageData = {
    val rnd = new scala.util.Random(seed)
    ImageData(w, h, 1, Array.fill(w * h)(rnd.nextInt(256).toByte))
  }

  test("hashes are deterministic and identical images hash equal") {
    val a = randImg(3)
    assert(aHash64(a) == aHash64(randImg(3)))
    assert(dHash64(a) == dHash64(randImg(3)))
    assert(pHash64(a) == pHash64(randImg(3)))
  }

  /** Natural-image-like fixture for the robustness comparison: generated
    * directly in the 8×8 low-frequency DCT domain with strong ± amplitudes
    * (web images carry broad low-frequency energy; pure noise or a single
    * sinusoid would leave the median-split coefficients noise-dominated
    * and prove nothing — the r11 "smooth fixtures read as operator bugs"
    * lesson, in hash space). */
  private def dctImg(seed: Int, w: Int = 64, h: Int = 64): ImageData = {
    val rnd = new scala.util.Random(seed)
    val signs = Array.fill(8, 8)(if (rnd.nextBoolean()) 1 else -1)
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      var v = 128.0
      var u = 0
      while (u < 8) {
        var vv = 0
        while (vv < 8) {
          if (u != 0 || vv != 0)
            v += 14.0 * signs(u)(vv) *
              StrictMath.cos(StrictMath.PI * (2 * (x * 32 / w) + 1) * u / 64.0) *
              StrictMath.cos(StrictMath.PI * (2 * (y * 32 / h) + 1) * vv / 64.0)
          vv += 1
        }
        u += 1
      }
      // clamp to [15, 240]: +15 brightness headroom on both ends, so the
      // shift-invariance test below never clips
      math.max(15, math.min(240, v.toInt)).toByte
    }
    ImageData(w, h, 1, px)
  }

  private def gammaAdjust(img: ImageData, g: Double): ImageData =
    ImageData(img.width, img.height, img.channels, img.pixels.map { p =>
      val v = (255.0 * StrictMath.pow((p & 0xff) / 255.0, g)).toInt
      math.max(0, math.min(255, v)).toByte
    })

  test("pHash survives resize+gamma markedly better than aHash (the near-dup case)") {
    // the web-corpus perturbation: 64→31 downsample (misaligns aHash's 8×8
    // block grid) plus gamma 0.8. Deterministic integer pipeline → fixed
    // distances; margins carry slack over the measured values.
    val dists = (1 to 10).map { seed =>
      val a = dctImg(seed)
      val b = gammaAdjust(resizeNearest(a, 31, 31), 0.8)
      (java.lang.Long.bitCount(aHash64(a) ^ aHash64(b)),
        java.lang.Long.bitCount(pHash64(a) ^ pHash64(b)))
    }
    val sumA = dists.map(_._1).sum
    val sumP = dists.map(_._2).sum
    assert(sumP * 4 <= sumA * 3,
      s"pHash should beat aHash by ≥25% in total flipped bits: aHash=$dists sumA=$sumA sumP=$sumP")
    // pHash stays inside a tight near-dup threshold on ≥8/10 seeds; aHash
    // demonstrably breaks it on ≥5
    assert(dists.count(_._2 <= 8) >= 8, s"pHash dists: ${dists.map(_._2)}")
    assert(dists.count(_._1 > 8) >= 5, s"aHash dists: ${dists.map(_._1)}")
  }

  test("pHash is exactly invariant to a global brightness shift (DC excluded)") {
    val a = dctImg(21)
    val shifted = ImageData(a.width, a.height, 1,
      a.pixels.map(p => ((p & 0xff) + 15).toByte))
    // fixture pixels are clamped to [15, 240], so +15 never clips
    assert(pHash64(a) == pHash64(shifted))
  }

  test("a single-pixel perturbation moves few bits; distinct images many") {
    val a = randImg(7, 32, 32)
    val px = a.pixels.clone(); px(5) = (px(5) ^ 0x7f).toByte
    val b = ImageData(32, 32, 1, px)
    assert(java.lang.Long.bitCount(aHash64(a) ^ aHash64(b)) <= 4)
    val far = (1 to 10).map(s =>
      java.lang.Long.bitCount(aHash64(a) ^ aHash64(randImg(100 + s, 32, 32))))
    assert(far.sum / far.size >= 16, s"mean distance ${far.sum / far.size}")
  }

  test("dHash is invariant to a global brightness shift (no clipping)") {
    val rnd = new scala.util.Random(11)
    val px = Array.fill(16 * 16)(rnd.nextInt(200).toByte) // headroom for +20
    val a = ImageData(16, 16, 1, px)
    val shifted = ImageData(16, 16, 1,
      px.map(p => ((p & 0xff) + 20).toByte))
    assert(dHash64(a) == dHash64(shifted))
  }

  test("audio fingerprint: deterministic, exactly gain-invariant, container round-trip") {
    import MediaCodecs.{AudioData, audioFingerprint64, encodeWavPcm16, decodeWavPcm16}
    val rnd = new scala.util.Random(41)
    val samples = Array.fill(3000)((rnd.nextInt(16000) - 8000).toShort)
    val a = AudioData(16000, 1, samples)
    assert(audioFingerprint64(a) == audioFingerprint64(AudioData(16000, 1, samples.clone())))
    // EXACT global gain invariance: x2 without clipping scales every
    // window energy by exactly 4, so all delta comparisons are unchanged
    val doubled = AudioData(16000, 1, samples.map(s => (s * 2).toShort))
    assert(audioFingerprint64(a) == audioFingerprint64(doubled))
    // encode → decode round-trips samples and the fingerprint
    val back = decodeWavPcm16(encodeWavPcm16(a)).get
    assert(back.samples.toSeq == samples.toSeq)
    assert(audioFingerprint64(back) == audioFingerprint64(a))
    // distinct noise is far apart
    val other = AudioData(16000, 1,
      Array.fill(3000)((rnd.nextInt(16000) - 8000).toShort))
    assert(java.lang.Long.bitCount(
      audioFingerprint64(a) ^ audioFingerprint64(other)) >= 12)
    // degenerate: shorter than 65 frames still defined, no throw
    audioFingerprint64(AudioData(8000, 1, Array.fill(10)(5.toShort)))
    audioFingerprint64(AudioData(8000, 2, Array.empty[Short]))
  }

  test("audio fingerprint survives gain/resample/pad perturbations where a raw sample hash breaks") {
    import MediaCodecs.{AudioData, audioFingerprint64}
    // structured fixture: 65 windows × 400 frames with well-separated
    // per-window amplitude levels (what real audio looks like at
    // fingerprint granularity — a white-noise fixture would make every
    // window's mean energy ~equal and the comparisons noise-dominated,
    // the same concentration-of-measure trap as smooth ANN fixtures)
    val nFrames = 65 * 400
    val levels = Array.tabulate(65)(w => 300 + ((w * 97 + 13) % 64) * 120)
    def mkSamples(n: Int): Array[Short] = Array.tabulate(n) { t =>
      val w = math.min(64, t * 65 / n)
      val r = new scala.util.Random(t * 31L + 7)
      (levels(w) * (if (t % 2 == 0) 1 else -1) + r.nextInt(21) - 10).toShort
    }
    val samples = mkSamples(nFrames)
    val base = audioFingerprint64(AudioData(16000, 1, samples))
    def rawHash64(s: Array[Short]): Long = {
      val bb = java.nio.ByteBuffer.allocate(s.length * 2)
      s.foreach(bb.putShort)
      java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5").digest(bb.array())).getLong
    }
    val rawBase = rawHash64(samples)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // gain x2 (no clipping at these levels): EXACT invariance
    val gained = samples.map(s => (s * 2).toShort)
    assert(audioFingerprint64(AudioData(16000, 1, gained)) == base)
    assert(ham(rawHash64(gained), rawBase) >= 16, "raw hash should shatter")
    // resample 2:1 (drop every other sample): windows keep their TIME span
    // and their mean energy, so the delta bits stay inside the near-dup
    // band (driver queries pair at maxHamming=3)
    val decimated = Array.tabulate(nFrames / 2)(i => samples(i * 2))
    val hDec = ham(audioFingerprint64(AudioData(8000, 1, decimated)), base)
    assert(hDec <= 3, s"resample moved $hDec bits")
    assert(ham(rawHash64(decimated), rawBase) >= 16)
    // short pad (40 near-silent trailing frames, 10% of one window):
    // boundaries shift by <=40 frames, window means barely move
    val padded = samples ++ Array.fill(40)(0.toShort)
    val hPad = ham(audioFingerprint64(AudioData(16000, 1, padded)), base)
    assert(hPad <= 3, s"pad moved $hPad bits")
    assert(ham(rawHash64(padded), rawBase) >= 16)
  }

  test("withAudioFingerprints + hammingNearDups: grouped identical clips pair; non-audio null") {
    import spark.implicits._
    import MediaCodecs.{AudioData, encodeWavPcm16}
    val rows = (0L until 20L).map { i =>
      val rnd = new scala.util.Random((i % 5) * 77L + 1)
      (i, encodeWavPcm16(AudioData(16000, 1,
        Array.fill(1500)((rnd.nextInt(12000) - 6000).toShort))))
    } :+ ((99L, Array[Byte](9, 9, 9)))
    val hashed = Multimodal.withAudioFingerprints(rows.toDF("id", "payload"))
    val nullRow = hashed.filter(col("id") === 99L).head()
    assert(nullRow.isNullAt(nullRow.fieldIndex("afp64")))
    val pairs = Dedup.hammingNearDups(hashed, "id", "afp64", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0L until 20L; b <- a + 1 until 20L; if a % 5 == b % 5
    } yield (a, b)).toSet
    assert(pairs == want)
  }

  test("withImageHashes + hammingNearDups: grouped identical images pair at hamming 0") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      val img = randImg((i % 8).toInt)
      (i, encodeNetpbm(img))
    } :+ ((99L, Array[Byte](1, 2, 3))) // non-image: null hashes, never pairs
    val df = rows.toDF("id", "payload")
    val hashed = Multimodal.withImageHashes(df)
    val nullRow = hashed.filter(col("id") === 99L).head()
    assert(nullRow.isNullAt(nullRow.fieldIndex("ahash64")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("phash64")))
    val pairs = Dedup.hammingNearDups(hashed, "id", "ahash64", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0L until 40L; b <- a + 1 until 40L; if a % 8 == b % 8
    } yield (a, b)).toSet
    assert(pairs == want)
    // the DCT hash pairs the same identical-image groups at hamming 0
    val pPairs = Dedup.hammingNearDups(hashed, "id", "phash64", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(pPairs))
    // larger maxHamming stays best-effort (the simhash contract): no
    // throw, and the exact-dup pairs are still all found
    val loose = Dedup.hammingNearDups(hashed, "id", "ahash64", maxHamming = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(loose))
  }
}
