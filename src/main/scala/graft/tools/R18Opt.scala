package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Targeted per-line timing for the r18 optimization round: times named
  * declared queries with the exact Bench methodology (noop sink, one
  * untimed warmup, min over reps) without paying for a full bench run —
  * the iteration loop for before/after numbers on a single line. Final
  * evidence still comes from full `graft.Bench` runs.
  *
  * Run: sbt "runMain graft.tools.R18Opt name1,name2,... [reps]"
  */
object R18Opt {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val q = graft.SparkEntry.queries
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"r18opt: $name")
      def run(): Unit = noop(q(name)(spark, sfDir))
      run() // untimed warmup
      val samples = Seq.fill(reps) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[r18opt] $name%-32s min=${samples.min}%.4f s spread=" +
        f"${samples.max / samples.min}%.2fx samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }
    spark.stop()
  }
}
