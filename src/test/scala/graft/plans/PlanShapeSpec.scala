package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan shape contracts — the scale posture as executable
  * assertions, not just PLANS.md prose. A refactor that silently adds a
  * shuffle to a row-local operator, drops a broadcast, or loses partition
  * pruning fails here long before it shows up as a 100 TB incident. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r.findAllIn(plan(df)).length

  private lazy val docs = {
    import spark.implicits._
    (1L to 200L).map(i => (i, s"alpha beta gamma delta token$i more words here"))
      .toDF("doc_id", "text")
  }

  test("chunkDocuments: zero shuffles, one codegen span above the scan") {
    val p = plan(graft.pipeline.CorpusPipeline.chunkDocuments(
      docs, "doc_id", "text", 8, 4))
    assert(!p.contains("Exchange"), s"chunking must be row-local:\n$p")
    assert(p.contains("*(1)"), s"chunking must stay inside one codegen span:\n$p")
  }

  test("shardCorpus: exactly one exchange (hash by shard), sort is partition-local") {
    val df = graft.pipeline.CorpusPipeline.shardCorpus(docs, "doc_id", 4)
    assert(shuffles(df) == 1, s"shard assignment needs ONE shuffle:\n${plan(df)}")
    assert(plan(df).contains("hashpartitioning(shard"),
      s"the exchange must partition by shard:\n${plan(df)}")
    // the sort below the window must be partition-local (global=false)
    assert("Sort \\[shard.* false, 0".r.findFirstIn(plan(df)).isDefined,
      s"per-shard sort must not be global:\n${plan(df)}")
  }

  test("deterministicSample: a scan-adjacent filter, no shuffle") {
    val df = graft.pipeline.CorpusPipeline.deterministicSample(docs, "doc_id", 0.5)
    assert(!plan(df).contains("Exchange"), s"id-hash sampling is row-local:\n${plan(df)}")
  }

  test("decontaminate: benchmark side broadcasts, corpus text never sort-merges") {
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val df = graft.pipeline.Dedup.contaminationHits(
      docs, "doc_id", "text", bench, "text", shingleSize = 2)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"benchmark shingles must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus text must not sort-merge:\n$p")
  }

  test("IVF scan: probed cells reach the parquet scan as partition filters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_planshape").toString
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val emb = Seq.tabulate(400)(i => (i.toLong, Array.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
    val idx = graft.index.AnnIndexManager.create(spark, "planshape_ivf", emb,
      "id", "vec", "IVF", Map("metric" -> "l2", "nlist" -> "8", "nprobe" -> "2"),
      s"$tmp/ivf")
    val p = plan(idx.scan(Array.fill(8)(0.5f), 5))
    assert(p.contains("PartitionFilters: [list_id"),
      s"nprobe pruning must reach the scan:\n$p")
    graft.index.AnnIndexManager.unregister("planshape_ivf")
  }

  test("grouped top-k: no Window over the full relation (map-side heaps + final shuffle)") {
    import spark.implicits._
    val scored = (1L to 300L).map(i => (i % 5, i, i * 1.5)).toDF("g", "id", "d")
    val df = graft.operators.TopK.grouped(scored, "g", "d", "id", 3)
    assert(!plan(df).contains("WindowExec"),
      s"grouped top-k must not window-sort the relation:\n${plan(df)}")
  }
}
