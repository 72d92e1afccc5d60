package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * are opaque BINARY columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-batched transforms.
  *
  * Still images decode for REAL through [[MediaCodecs]]: netpbm PGM/PPM
  * plus PNG/JPEG/BMP/GIF via the JDK's built-in ImageIO readers (pure
  * JVM, headless-safe) — decode, nearest-neighbor resize, luminance-
  * histogram features, and lossless PNG re-encode are all exact and
  * tested. RIFF/WAV PCM-16 audio decodes for real too. Only compressed
  * AUDIO/VIDEO (MP3/H.264 — no JVM codecs exist) falls back to the
  * clearly-marked header STUB; a real deployment swaps that one branch,
  * the Spark plumbing (schema, partition batching, null/error
  * discipline) stays.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("source", StringType, nullable = true)))

  /** `width`/`height`/`channels` describe images; audio maps frames →
    * `n_frames`, rate → `sample_rate`, with width/height 0. `format` is
    * the detected container: pgm|ppm|png|jpeg|bmp|gif|wav|raw12(stub)|unknown. */
  val decodedMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** ==== STUB ==== decode kernel for formats whose codecs are not on the
    * JVM: parses a fake 12-byte LE header [w:i32][h:i32][c:i32]. A real
    * deployment swaps this single function for an image codec (e.g. via
    * JavaCV); everything else stays. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int, Boolean) = {
    if (payload == null || payload.length < 12) (0, 0, 0, false)
    else {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt; val h = bb.getInt; val c = bb.getInt
      if (w <= 0 || h <= 0 || c <= 0 || c > 16) (0, 0, 0, false)
      else (w, h, c, true)
    }
  }

  /** Magic-sniff is only a HINT: a failed real-codec parse falls through
    * to the stub rather than rejecting, because arbitrary binary (e.g. the
    * raw12 test fixtures) can legitimately start with 'P' or 'R'. */
  private def decodeMeta(payload: Array[Byte]): Row = {
    MediaCodecs.decodeNetpbm(payload) match {
      case Some(img) =>
        val fmt = if (img.channels == 1) "pgm" else "ppm"
        return Row(fmt, img.width, img.height, img.channels, 0, 0L, true)
      case None => ()
    }
    // compressed rasters decode for REAL through the JDK's ImageIO
    MediaCodecs.decodeImageIO(payload) match {
      case Some(img) =>
        return Row(MediaCodecs.imageIoFormat(payload).get,
          img.width, img.height, img.channels, 0, 0L, true)
      case None => ()
    }
    MediaCodecs.decodeWavPcm16(payload) match {
      case Some(a) =>
        return Row("wav", 0, 0, a.channels, a.sampleRate,
          (a.samples.length / a.channels).toLong, true)
      case None => ()
    }
    val (w, h, c, ok) = decodeStub(payload)
    Row(if (ok) "raw12" else "unknown", w, h, c, 0, 0L, ok)
  }

  /** Decode metadata for every row, partition-batched (the mapInPandas
    * shape: one buffer of rows per partition, codec state reused). Netpbm
    * and WAV decode for real; other formats hit the header stub. */
  def withDecodedMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add("decoded", decodedMetaType)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition codec state would be initialized here
      rows.map(r => Row.fromSeq(r.toSeq :+ decodeMeta(r.getAs[Array[Byte]](pIdx))))
    }(Encoders.row(schema))
  }

  /** Perceptual 64-bit image hashes over decoded payloads (netpbm first,
    * then ImageIO containers): adds `ahash64` (block-mean average hash),
    * `dhash64` (gradient difference hash) and `phash64` (32×32 DCT hash —
    * the published robust recipe, exact-integer so cross-engine
    * deterministic) BIGINT columns, null for rows whose payload is not a
    * decodable image. Row-local; pair them with [[Dedup.hammingNearDups]]
    * for image near-dup mining — the multimodal analogue of SimHash over
    * text. Prefer `phash64` for web-scale near-dup: it survives the
    * resize/re-compression perturbations that flip near-mean aHash bits. */
  def withImageHashes(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    // one INDEPENDENT UDF per hash family (r18 optimization): the old
    // single tuple-UDF computed all three hashes for every consumer —
    // column pruning cannot reach inside a UDF, so a pipeline reading only
    // `ahash64` still paid the DCT pHash per row. Separate columns let
    // pruning drop the unused families (each surviving one re-decodes the
    // payload, which is the right trade: the near-dup queries read exactly
    // one family, so they now pay one decode + one hash instead of one
    // decode + all three). Values are unchanged per family.
    def hashWith(h: MediaCodecs.ImageData => Long) = udf { payload: Array[Byte] =>
      val img =
        if (payload == null) None
        else MediaCodecs.decodeNetpbm(payload)
          .orElse(MediaCodecs.decodeImageIO(payload))
      img.map(h): Option[Long]
    }
    df.withColumn("ahash64", hashWith(MediaCodecs.aHash64)(col(payloadCol)))
      .withColumn("dhash64", hashWith(MediaCodecs.dHash64)(col(payloadCol)))
      .withColumn("phash64", hashWith(MediaCodecs.pHash64)(col(payloadCol)))
  }

  /** 64-bit temporal energy fingerprint over decodable PCM16 WAV payloads:
    * adds `afp64` BIGINT (null for non-audio rows) — the audio sibling of
    * the image hash columns; pair with [[Dedup.hammingNearDups]] for
    * audio near-dup mining. Row-local. */
  def withAudioFingerprints(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val fp = udf { payload: Array[Byte] =>
      MediaCodecs.decodeWavPcm16(payload)
        .map(a => MediaCodecs.audioFingerprint64(a)): Option[Long]
    }
    df.withColumn("afp64", fp(col(payloadCol)))
  }

  /** REAL resize: image payloads (netpbm OR png/jpeg/bmp/gif via ImageIO)
    * are decoded, nearest-neighbor-resized to (w, h) and re-encoded —
    * netpbm stays binary P5/P6, compressed containers re-encode as
    * lossless PNG. Non-image rows get null. Row-local → scales
    * embarrassingly. */
  def resizeImages(df: DataFrame, w: Int, h: Int,
                   payloadCol: String = "payload"): DataFrame = {
    val resizeUdf = udf { payload: Array[Byte] =>
      MediaCodecs.decodeNetpbm(payload) match {
        case Some(img) =>
          MediaCodecs.encodeNetpbm(MediaCodecs.resizeNearest(img, w, h))
        case None =>
          MediaCodecs.decodeImageIO(payload)
            .map(img => MediaCodecs.encodePng(MediaCodecs.resizeNearest(img, w, h)))
            .orNull
      }
    }
    df.withColumn("resized_payload", resizeUdf(col(payloadCol)))
  }

  /** REAL image features: normalized luminance histogram over `bins`
    * buckets for any decodable image payload; null otherwise. */
  def withImageFeatures(df: DataFrame, bins: Int = 16,
                        payloadCol: String = "payload"): DataFrame = {
    val histUdf = udf { payload: Array[Byte] =>
      MediaCodecs.decodeAnyImage(payload)
        .map(MediaCodecs.luminanceHistogram(_, bins)).orNull
    }
    df.withColumn("image_features", histUdf(col(payloadCol)))
  }

  /** REAL audio features: per-window RMS energy for WAV PCM-16 payloads
    * (silence detection / energy segmentation); null otherwise. */
  def withAudioFeatures(df: DataFrame, windowFrames: Int,
                        payloadCol: String = "payload"): DataFrame = {
    val rmsUdf = udf { payload: Array[Byte] =>
      MediaCodecs.decodeWavPcm16(payload)
        .map(MediaCodecs.rmsWindows(_, windowFrames)).orNull
    }
    df.withColumn("audio_rms", rmsUdf(col(payloadCol)))
  }

  /** ==== STUB ==== feature extractor: deterministic pseudo-embedding from
    * payload bytes (rolling hash per dimension). Signature/batching match a
    * real model-backed extractor (batch inference per partition). */
  def withFeatureStub(df: DataFrame, dim: Int,
                      payloadCol: String = "payload"): DataFrame = {
    val featUdf = udf { payload: Array[Byte] =>
      val out = new Array[Float](dim)
      if (payload != null) {
        var h = 1125899906842597L
        var i = 0
        while (i < payload.length) {
          h = h * 31 + payload(i)
          out(i % dim) += (h & 0xffff) / 65536.0f - 0.5f
          i += 1
        }
      }
      out
    }
    df.withColumn("features", featUdf(col(payloadCol)))
  }

  /** Frame sampling for chunked payloads (video stand-in): split the binary
    * payload into fixed-size frames and keep every `stride`-th — one output
    * row per kept frame, real explode semantics. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int,
                   payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val frameUdf = udf { payload: Array[Byte] =>
      if (payload == null) Seq.empty[(Int, Array[Byte])]
      else payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => (i, chunk) }
        .toSeq
    }
    df.withColumn("frame", explode(frameUdf(col(payloadCol))))
      .withColumn("frame_idx", col("frame._1"))
      .withColumn("frame_payload", col("frame._2"))
      .drop("frame")
  }
}
