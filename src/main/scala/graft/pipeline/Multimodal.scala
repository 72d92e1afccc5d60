package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * are opaque BINARY columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-batched transforms.
  *
  * The image/audio codecs are NOT available in this environment, so the
  * decode kernels are deterministic STUBS (clearly marked) behind the real
  * Spark plumbing — schema, batching shape (one in-memory batch per
  * partition iterator, like `mapInPandas`), and partitioning are what a
  * codec-backed deployment would reuse unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("source", StringType, nullable = true)))

  val decodedMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** ==== STUB ==== decode kernel: parses a fake 12-byte LE header
    * [w:i32][h:i32][c:i32] from the payload. A real deployment swaps this
    * single function for an image codec (e.g. via JavaCV); everything else
    * (schema, partition batching, null/error discipline) stays. */
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

  /** Decode metadata for every row, partition-batched (the mapInPandas
    * shape: one buffer of rows per partition, codec state reused). */
  def withDecodedMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema.add("decoded", decodedMetaType)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition codec state would be initialized here (stub: none)
      rows.map { r =>
        val (w, h, c, ok) = decodeStub(r.getAs[Array[Byte]](pIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, c, ok))
      }
    }(Encoders.row(schema))
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
