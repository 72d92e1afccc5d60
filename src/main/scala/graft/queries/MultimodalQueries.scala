package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import QuerySupport._

/** Driver surface for the multimodal-column plumbing: binary payloads are
  * synthesized DETERMINISTICALLY from the documents table (12-byte LE
  * header + UTF-8 text bytes), then run through the real pipeline —
  * mapPartitions decode, frame sampling explode, per-media aggregation.
  * The DuckDB oracle computes the expected metadata arithmetically, so the
  * whole binary path (encode → decode → sample → agg) is hash-verified
  * end-to-end even though the codec kernel itself is a sandbox stub.
  */
object MultimodalQueries {

  private val FrameBytes = 64
  private val Stride = 2

  /** payload = [w:i32][h:i32][c:i32] LE ++ utf8(text), with (w,h,c) derived
    * from doc_id — the decode stub recovers exactly these values. */
  private val payloadUdf = udf { (id: Long, text: String) =>
    val w = (id % 640 + 1).toInt
    val h = (id % 480 + 1).toInt
    val c = (id % 3 + 1).toInt
    val txt = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = java.nio.ByteBuffer.allocate(12 + txt.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(w).putInt(h).putInt(c).put(txt)
    bb.array()
  }

  /** A real PNG whose dims derive from doc_id: gradient gray raster,
    * encoded by the pure-JDK codec. The decode side must recover the
    * dims through ACTUAL PNG parsing — no header arithmetic shortcut. */
  private val pngUdf = udf { id: Long =>
    val w = (id % 13 + 2).toInt
    val h = (id % 7 + 2).toInt
    val px = Array.tabulate(w * h)(i => ((i * 11 + id) % 256).toByte)
    graft.pipeline.MediaCodecs.encodePng(
      graft.pipeline.MediaCodecs.ImageData(w, h, 1, px))
  }

  // pseudo-random 16x16 gray netpbm seeded by doc_id % 50: the 50 groups
  // carry IDENTICAL images within and essentially-random (64 iid bits)
  // perceptual hashes across, so near-dup pairs are exactly the
  // same-group pairs (cross-group collision odds ~1e-12 at a FIXED seed)
  private val phashImgUdf = udf { id: Long =>
    val rnd = new scala.util.Random((id % 50) * 7919L + 13L)
    val px = Array.fill(16 * 16)(rnd.nextInt(256).toByte)
    graft.pipeline.MediaCodecs.encodeNetpbm(
      graft.pipeline.MediaCodecs.ImageData(16, 16, 1, px))
  }

  // pseudo-random 1s mono WAV seeded by doc_id % 40: identical samples
  // within a group (fingerprints collide at hamming 0), iid across groups
  // (64 essentially-random energy-delta bits at a FIXED seed) — same
  // design as the image-hash fixture
  private val audioUdf = udf { id: Long =>
    val rnd = new scala.util.Random((id % 40) * 104729L + 5)
    val samples = Array.fill(2000)((rnd.nextInt(16000) - 8000).toShort)
    graft.pipeline.MediaCodecs.encodeWavPcm16(
      graft.pipeline.MediaCodecs.AudioData(16000, 1, samples))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // audio near-dup via the temporal energy fingerprint: real WAV
    // round-trip (encode → container parse → fingerprint), banded Hamming
    // pairs. Strict: the injected group structure is the exact pair set
    "multimodal_audio_pairs" -> ((s: SparkSession, dir: String) => {
      val docs = table(s, dir, "documents")
      val media = docs.select(col("doc_id"),
        audioUdf(col("doc_id")).as("payload"))
      val hashed = Multimodal.withAudioFingerprints(media)
      graft.pipeline.Dedup.hammingNearDups(hashed, "doc_id", "afp64",
          maxHamming = 3)
        .orderBy("a", "b")
    }),
    // perceptual-hash image near-dup (the multimodal SimHash analogue):
    // aHash64 over decoded pixels, banded Hamming pairs. Strict: the
    // injected group structure makes the pair set arithmetically exact
    "multimodal_phash_pairs" -> ((s: SparkSession, dir: String) => {
      val docs = table(s, dir, "documents")
      val media = docs.select(col("doc_id"),
        phashImgUdf(col("doc_id")).as("payload"))
      val hashed = Multimodal.withImageHashes(media)
      graft.pipeline.Dedup.hammingNearDups(hashed, "doc_id", "ahash64",
          maxHamming = 3)
        .orderBy("a", "b")
    }),

    // DCT pHash variant of the same fixture: identical-within-group images
    // hash identically (hamming 0), cross-group 16x16 noise rasters land
    // far apart in DCT space at a FIXED seed — so the exact pair set is
    // again the same-group pairs. Strict.
    "multimodal_phash_dct_pairs" -> ((s: SparkSession, dir: String) => {
      val docs = table(s, dir, "documents")
      val media = docs.select(col("doc_id"),
        phashImgUdf(col("doc_id")).as("payload"))
      val hashed = Multimodal.withImageHashes(media)
      graft.pipeline.Dedup.hammingNearDups(hashed, "doc_id", "phash64",
          maxHamming = 3)
        .orderBy("a", "b")
    }),

    // REAL compressed-raster decode: deterministic PNGs (dims a function
    // of doc_id) go through ImageIO; the oracle predicts the dims
    // arithmetically, so a strict match proves the codec actually parsed
    // the container. Strict.
    "multimodal_png" -> ((s: SparkSession, dir: String) => {
      val docs = table(s, dir, "documents")
      val media = docs.select(
        col("doc_id").as("media_id"),
        lit("image").as("media_type"),
        pngUdf(col("doc_id")).as("payload"),
        lit(null).cast("string").as("source"))
      Multimodal.withDecodedMeta(media)
        .select(col("media_id").as("doc_id"),
          col("decoded.format").as("format"),
          col("decoded.width").cast("long").as("width"),
          col("decoded.height").cast("long").as("height"),
          col("decoded.channels").cast("long").as("channels"))
        .orderBy("doc_id")
    }),

    "multimodal_decode" -> ((s: SparkSession, dir: String) => {
      val docs = table(s, dir, "documents")
      val media = docs.select(
        col("doc_id").as("media_id"),
        lit("image").as("media_type"),
        payloadUdf(col("doc_id"), col("text")).as("payload"),
        lit(null).cast("string").as("source"))
      val decoded = Multimodal.withDecodedMeta(media)
      val framed = Multimodal.sampleFrames(decoded, FrameBytes, Stride)
      framed.filter(col("decoded.ok"))
        .groupBy(col("media_id"))
        .agg(
          min(col("decoded.width")).cast("long").as("width"),
          min(col("decoded.height")).cast("long").as("height"),
          min(col("decoded.channels")).cast("long").as("channels"),
          count(lit(1)).as("n_frames"))
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          col("channels"), col("n_frames"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "multimodal_audio_pairs" ->
      """SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS INT) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 40 = b.doc_id % 40
        |ORDER BY a, b""".stripMargin,

    "multimodal_phash_pairs" ->
      """SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS INT) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 50 = b.doc_id % 50
        |ORDER BY a, b""".stripMargin,

    "multimodal_phash_dct_pairs" ->
      """SELECT a.doc_id AS a, b.doc_id AS b, CAST(0 AS INT) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 50 = b.doc_id % 50
        |ORDER BY a, b""".stripMargin,

    "multimodal_png" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(doc_id % 13 + 2 AS BIGINT) AS width,
        |  CAST(doc_id % 7 + 2 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    // width/height/channels mirror the header derivation; n_frames =
    // ceil(nf/2) kept of nf = ceil(payloadBytes/64) frames, with
    // payloadBytes = 12 + strlen(text) (DuckDB strlen = UTF-8 bytes)
    "multimodal_decode" ->
      s"""SELECT doc_id,
         |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
         |  CAST(doc_id % 480 + 1 AS BIGINT) AS height,
         |  CAST(doc_id % 3 + 1 AS BIGINT) AS channels,
         |  CAST(CEIL(CEIL((12.0 + strlen(text)) / $FrameBytes) / $Stride) AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
