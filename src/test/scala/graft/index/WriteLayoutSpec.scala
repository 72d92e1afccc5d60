package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** File-layout contract for index creation: a multi-cell (IVF) create must
  * write ~one parquet file per cell, not one per (task x cell). Without the
  * pre-write hash-clustering on list_id, every input task writes its own
  * fragment into every cell dir it touches — tens of thousands of files at
  * the scale contract's nlist ~ sqrt(n), NameNode poison and a per-probe
  * open() tax at 100 TB. */
class WriteLayoutSpec extends SparkSpec {

  private def parquetFiles(root: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
  }

  test("IVF create writes at most ~one data file per cell") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(5)
    // 24 input partitions x 16 cells would give up to 384 files unclustered
    val df = Seq.tabulate(4000)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
      .toDF("id", "vec").repartition(24)
    val tmp = Files.createTempDirectory("graft_layout_ivf")
    val idx = AnnIndexManager.create(spark, "layout_ivf", df, "id", "vec", "IVF",
      Map("metric" -> "l2", "nlist" -> "16", "nprobe" -> "4"), s"$tmp/idx")
    val files = parquetFiles(java.nio.file.Paths.get(s"$tmp/idx/data"))
    val cells = idx.live.select("list_id").distinct().count()
    assert(files.size <= cells + 4, // slack for empty-cell/task skew edges
      s"IVF data dir holds ${files.size} files for $cells cells — the " +
        "per-cell write clustering regressed (expected ~one file per cell)")
    AnnIndexManager.unregister("layout_ivf")
  }

  test("FLAT create keeps the parallel no-shuffle write (files ~ tasks, one dir)") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(6)
    val df = Seq.tabulate(2000)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
      .toDF("id", "vec").repartition(8)
    val tmp = Files.createTempDirectory("graft_layout_flat")
    AnnIndexManager.create(spark, "layout_flat", df, "id", "vec", "FLAT",
      Map("metric" -> "l2"), s"$tmp/idx")
    val files = parquetFiles(java.nio.file.Paths.get(s"$tmp/idx/data"))
    // single cell → all files under list_id=0; the write must NOT have
    // been funneled through one task (that would serialize FLAT creates)
    assert(files.size > 1, "FLAT create collapsed to a single writer task")
    AnnIndexManager.unregister("layout_flat")
  }
}
