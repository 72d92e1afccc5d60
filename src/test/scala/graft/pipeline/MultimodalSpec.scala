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

  test("frame sampling: every stride-th fixed-size chunk becomes a row") {
    val frames = Multimodal.sampleFrames(
        media.filter(col("media_id") === 4), frameBytes = 1000, stride = 2)
      .select("media_id", "frame_idx", "frame_payload").collect()
    // payload = 4012 bytes → 5 chunks (4×1000 + 12) → kept idx 0, 2, 4
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq.sorted == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_payload").length <= 1000))
  }
}
