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

  test("frame sampling: every stride-th fixed-size chunk becomes a row") {
    val frames = Multimodal.sampleFrames(
        media.filter(col("media_id") === 4), frameBytes = 1000, stride = 2)
      .select("media_id", "frame_idx", "frame_payload").collect()
    // payload = 4012 bytes → 5 chunks (4×1000 + 12) → kept idx 0, 2, 4
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq.sorted == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_payload").length <= 1000))
  }
}
