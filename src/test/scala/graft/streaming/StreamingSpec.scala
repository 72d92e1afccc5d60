package graft.streaming

import graft.SparkSpec
import graft.index.AnnIndexManager
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_stream_spec").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("embedding", ArrayType(FloatType))))

  private def writeBatch(dir: String, rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    rows.toDF("id", "embedding").coalesce(1).write.mode("append").parquet(dir)
  }

  test("incremental append maintenance via foreachBatch (§2.8)") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(50)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_idx", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_idx")

    val srcDir = s"$tmp/stream_src"
    val next = Seq.tabulate(30)(i => ((100 + i).toLong, vec()))
    writeBatch(srcDir, next)

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val query = IndexMaintenance.attachAppend(stream, idx, "id", "embedding",
      s"$tmp/ckpt1")
    query.awaitTermination(60000)
    assert(idx.meta.numVectors == 80)
    // new ids are searchable
    val hit = idx.scan(next.head._2, 1).head()
    assert(hit.getLong(0) == 100L)
  }

  test("CDC maintenance: inserts append, deletes tombstone") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(20)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_cdc", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_cdc")

    val srcDir = s"$tmp/cdc_src"
    val cdcSchema = schema.add("op", StringType)
    initial.take(5).map { case (id, v) => (id, v, "delete") }
      .toDF("id", "embedding", "op").coalesce(1).write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(cdcSchema).parquet(srcDir)
    val query = IndexMaintenance.attachCdc(stream, idx, "id", "embedding", "op",
      s"$tmp/ckpt2")
    query.awaitTermination(60000)
    assert(idx.meta.numDeleted == 5)
    val ids = idx.scan(initial.head._2, 20).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(0L, 1L, 2L, 3L, 4L)).isEmpty)
    assert(ids.size == 15)
  }

  test("replayed micro-batch is skipped: numVectors and results unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(4)(rnd.nextFloat())
    val initial = Seq.tabulate(40)(i => (i.toLong, vec()))
    val idx = AnnIndexManager.create(spark, "st_replay", initial.toDF("id", "embedding"),
      "id", "embedding", "FLAT", Map("metric" -> "l2"), s"$tmp/st_replay")

    val batch = Seq.tabulate(10)(i => ((200 + i).toLong, vec())).toDF("id", "embedding")
    IndexMaintenance.applyAppendBatch(idx, batch, batchId = 0, "id", "embedding")
    assert(idx.meta.numVectors == 50)
    assert(idx.lastAppliedBatch == 0)
    val q = initial.head._2
    val resBefore = idx.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // replay the same micro-batch (failure-recovery redelivery)
    IndexMaintenance.applyAppendBatch(idx, batch, batchId = 0, "id", "embedding")
    assert(idx.meta.numVectors == 50, "replayed batch must not double-insert")
    val resAfter = idx.scan(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(resAfter == resBefore)

    // a replayed CDC batch is skipped the same way
    val cdc = initial.take(3).map { case (id, v) => (id, v, "delete") }
      .toDF("id", "embedding", "op")
    IndexMaintenance.applyCdcBatch(idx, cdc, batchId = 1, "id", "embedding", "op")
    assert(idx.meta.numDeleted == 3 && idx.lastAppliedBatch == 1)
    IndexMaintenance.applyCdcBatch(idx, cdc, batchId = 1, "id", "embedding", "op")
    assert(idx.meta.numDeleted == 3, "replayed CDC batch must not double-count deletes")

    // restart with the SAME checkpoint source: a fresh index handle reloaded
    // from disk still sees the watermark
    val reloaded = AnnIndexManager.load(spark, s"$tmp/st_replay")
    assert(reloaded.lastAppliedBatch == 1)
  }

  test("streaming windowed aggregation over events (engine capability demo)") {
    import spark.implicits._
    // nanos ts as long, matching the driver events table shape
    val srcDir = s"$tmp/ev_src"
    val base = 1700000000000000000L
    Seq.tabulate(100)(i => (i.toLong, base + i.toLong * 60L * 1000000000L, i % 3))
      .map { case (id, ts, t) => (id, ts, s"type_$t", 1.0) }
      .toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val agg = spark.readStream.schema(evSchema).parquet(srcDir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_agg")
      .option("checkpointLocation", s"$tmp/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT * FROM ev_agg").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum == 100)
  }
}
