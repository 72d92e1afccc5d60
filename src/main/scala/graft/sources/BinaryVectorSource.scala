package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

/** Reader/writer for the reference's out-of-core binary vector file format:
  * `[u32 num_vectors][u32 dimension][f32 × N × D]` little-endian
  * (reference: rust_lib/src/streaming_build.rs:3,17-29; README.md:220;
  * error fixtures streaming_build.test:8-26).
  *
  * The read is distributed: the driver reads only the 8-byte header, then
  * executors read disjoint byte ranges (the file must be visible to
  * executors — local FS or a mounted share; a DataFrame written as parquet
  * is the preferred at-scale representation, this source exists for
  * compatibility with reference fixtures).
  */
object BinaryVectorSource {

  final case class Header(numVectors: Int, dim: Int)

  def readHeader(path: String): Header = {
    val f = new java.io.File(path)
    if (!f.exists()) throw new IllegalArgumentException(s"input file not found: $path")
    if (f.length() < 8) throw new IllegalArgumentException(s"input file empty or truncated: $path")
    val raf = new RandomAccessFile(f, "r")
    try {
      val buf = new Array[Byte](8)
      raf.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val n = bb.getInt; val d = bb.getInt
      if (n < 0 || d <= 0) throw new IllegalArgumentException(
        s"invalid header in $path: n=$n dim=$d")
      val expected = 8L + n.toLong * d * 4
      if (f.length() < expected) throw new IllegalArgumentException(
        s"truncated vector file $path: ${f.length()} bytes, need $expected")
      Header(n, d)
    } finally raf.close()
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Distributed read → DataFrame(id BIGINT, vector ARRAY<FLOAT>); ids are
    * 0-based row positions (the format's implicit labels). */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    val h = readHeader(path)
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        math.ceil(h.numVectors / 65536.0).toInt))
    val perPart = math.ceil(h.numVectors.toDouble / parts).toInt
    val ranges = (0 until parts)
      .map(p => (p * perPart, math.min(h.numVectors, (p + 1) * perPart)))
      .filter { case (s, e) => e > s }
    val dim = h.dim
    val rdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size))
      .mapPartitions { it =>
        it.flatMap { case (start, end) =>
          val raf = new RandomAccessFile(path, "r")
          // close on TASK COMPLETION, not iterator exhaustion: a limit/take
          // (or task failure) stops pulling early and would leak the handle
          // until the executor hits its descriptor ulimit
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ =>
              scala.util.Try(raf.close())))
          val rowBytes = dim * 4
          raf.seek(8L + start.toLong * rowBytes)
          val buf = new Array[Byte](rowBytes)
          new Iterator[Row] {
            private var i = start
            override def hasNext: Boolean = { if (i >= end) { raf.close(); false } else true }
            override def next(): Row = {
              raf.readFully(buf)
              val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
              val v = new Array[Float](dim)
              var j = 0
              while (j < dim) { v(j) = bb.getFloat; j += 1 }
              val r = Row(i.toLong, v.toSeq)
              i += 1
              r
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Test-fixture writer (same format). */
  def write(path: String, vectors: Seq[Array[Float]]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      def writeIntLE(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      writeIntLE(vectors.size)
      writeIntLE(if (vectors.isEmpty) 0 else vectors.head.length)
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      for (v <- vectors; x <- v) {
        bb.clear(); bb.putFloat(x)
        out.write(bb.array())
      }
    } finally out.close()
  }

  /** Export a DataFrame's vectors to the reference's binary file format —
    * the interchange path BACK to reference tooling (its streaming build
    * consumes exactly this layout, rust_lib/src/streaming_build.rs:17-29).
    * Rows are written in ascending `idCol` order; positions become the
    * format's implicit 0-based labels, so a subsequent [[read]] yields
    * ids 0..n-1 in the same order.
    *
    * The format is one headered file, so the final write is inherently a
    * single stream: rows are pulled with `toLocalIterator` (one partition
    * in memory at a time, one row buffered). Use it for bounded exports —
    * eval sets, fixtures, reference interop — not corpus-scale dumps
    * (parquet stays the at-scale representation).
    */
  def export(df: DataFrame, idCol: String, vecCol: String, path: String): Header = {
    import org.apache.spark.sql.functions.col
    val slim = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
    val n = slim.count()
    require(n > 0, "cannot export an empty vector set (the format needs dim > 0)")
    require(n <= Int.MaxValue, s"format caps num_vectors at u32 range, got $n")
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(new FileOutputStream(path), 1 << 16))
    try {
      def writeIntLE(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      val it = slim.toLocalIterator()
      var dim = -1
      var bb: ByteBuffer = null
      var wrote = 0L
      var headerWritten = false
      while (it.hasNext) {
        val row = it.next()
        val v = row.getSeq[Float](1)
        if (!headerWritten) {
          dim = v.length
          require(dim > 0, "cannot export zero-dimension vectors")
          writeIntLE(n.toInt); writeIntLE(dim)
          bb = ByteBuffer.allocate(dim * 4).order(ByteOrder.LITTLE_ENDIAN)
          headerWritten = true
        }
        require(v.length == dim,
          s"ragged vector set: row ${row.get(0)} has dim ${v.length}, expected $dim")
        bb.clear()
        v.foreach(bb.putFloat)
        out.write(bb.array())
        wrote += 1
      }
      assert(wrote == n, s"row count changed during export: $wrote != $n")
      Header(n.toInt, dim)
    } finally out.close()
  }

  /** S11 `diskann_streaming_build`: out-of-core build binary file → index
    * dataset; returns one row (num_vectors, dimension, sample_size) with
    * sample_size = max(√N, 1000) when unspecified (reference:
    * src/diskann_functions.cpp:133-211, rust_lib/src/streaming_build.rs:72-106).
    * The reference needs a pilot-sample + stream-insert second pass to bound
    * memory; the Spark build is partition-parallel with bounded task memory
    * by construction, so `sample_size` is honored as metadata only.
    */
  def diskannStreamingBuild(spark: SparkSession, input: String, output: String,
                            params: Map[String, String] = Map.empty): DataFrame = {
    val h = readHeader(input)
    val sample = params.get("sample_size").map(_.toInt).filter(_ > 0)
      .getOrElse(math.max(math.sqrt(h.numVectors.toDouble).toInt, 1000))
    val df = read(spark, input)
    graft.index.AnnIndexManager.create(spark,
      params.getOrElse("name", s"streaming_build_${h.numVectors}"),
      df, "id", "vector", "DISKANN",
      params - "sample_size" - "name" + ("sample_size" -> sample.toString), output)
    import spark.implicits._
    Seq((h.numVectors.toLong, h.dim, sample)).toDF("num_vectors", "dimension", "sample_size")
  }
}
