package graft.sources

import graft.SparkSpec

import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_src_spec").toString

  private val vecs = Seq.tabulate(257)(i =>
    Array.tabulate(5)(j => i * 10f + j)) // non-trivial partition boundaries

  test("binary vector file round-trip (F10 format)") {
    val p = s"$tmp/rt.bin"
    BinaryVectorSource.write(p, vecs)
    val h = BinaryVectorSource.readHeader(p)
    assert(h.numVectors == 257 && h.dim == 5)
    val rows = BinaryVectorSource.read(spark, p, numPartitions = 4)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 257)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getSeq[Float](1).toArray.toSeq == vecs(i).toSeq)
    }
  }

  test("export: DataFrame -> binary file -> read round-trips in id order") {
    import spark.implicits._
    val p = s"$tmp/export.bin"
    // deliberately shuffled input ids: export must order by id
    val df = scala.util.Random.shuffle(vecs.zipWithIndex.toList)
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
      .repartition(4)
    val h = BinaryVectorSource.export(df, "id", "embedding", p)
    assert(h.numVectors == 257 && h.dim == 5)
    val back = BinaryVectorSource.read(spark, p).collect().sortBy(_.getLong(0))
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getSeq[Float](1).toArray.toSeq == vecs(i).toSeq)
    }
    // the exported file feeds the reference-shaped streaming build directly
    val res = BinaryVectorSource.diskannStreamingBuild(spark, p,
      s"$tmp/export_idx", Map("name" -> "export_rt", "shards" -> "2")).collect()
    assert(res.head.getLong(0) == 257L && res.head.getInt(1) == 5)

    // ragged and empty inputs fail fast
    val ragged = Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f))).toDF("id", "embedding")
    assert(intercept[IllegalArgumentException] {
      BinaryVectorSource.export(ragged, "id", "embedding", s"$tmp/ragged.bin")
    }.getMessage.contains("ragged"))
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "embedding")
    assert(intercept[IllegalArgumentException] {
      BinaryVectorSource.export(empty, "id", "embedding", s"$tmp/empty.bin")
    }.getMessage.contains("empty"))
  }

  test("missing and empty input files error (streaming_build.test:8-26)") {
    val missing = intercept[IllegalArgumentException] {
      BinaryVectorSource.readHeader(s"$tmp/nope.bin")
    }
    assert(missing.getMessage.contains("not found"))

    val empty = s"$tmp/empty.bin"
    Files.createFile(java.nio.file.Paths.get(empty))
    val e = intercept[IllegalArgumentException] {
      BinaryVectorSource.readHeader(empty)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("truncated file detected") {
    val p = s"$tmp/trunc.bin"
    BinaryVectorSource.write(p, vecs)
    val raf = new java.io.RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 10); raf.close()
    val e = intercept[IllegalArgumentException] {
      BinaryVectorSource.readHeader(p)
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("diskann streaming build: index created, result row matches S11 shape") {
    val p = s"$tmp/build.bin"
    BinaryVectorSource.write(p, vecs)
    val res = BinaryVectorSource.diskannStreamingBuild(spark, p, s"$tmp/built",
      Map("metric" -> "l2", "name" -> "src_built")).head()
    assert(res.getLong(0) == 257)
    assert(res.getInt(1) == 5)
    assert(res.getInt(2) == 1000) // max(sqrt(257), 1000)

    val idx = graft.index.AnnIndexManager.load(spark, s"$tmp/built")
    assert(idx.meta.engine == "DISKANN" && idx.meta.numVectors == 257)
    val top = idx.scan(vecs(42), 1).head()
    assert(top.getLong(0) == 42L) // self is nearest
  }
}
