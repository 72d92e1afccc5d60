package graft.tools

/** Spark-free micro-probe of the online-insert kernel: builds the exact
  * CDC bench shard shape (20k rows, d=64, maxDegree=32, bc=64) once, then
  * times `Vamana.insertIntoShard` of 200 points — isolating the
  * graph-insert CPU from the Spark-side decode/encode/write of the
  * rewrite job it runs inside.
  *
  * Run: sbt "runMain graft.tools.R18InsertProbe [reps]"
  */
object R18InsertProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    def vec(id: Long, d: Int): Array[Float] = {
      val r = new scala.util.Random(id * 2654435761L + 42)
      Array.fill(d)(r.nextFloat())
    }
    val n = 20000
    val d = 64
    val params = graft.index.Vamana.Params(maxDegree = 32,
      buildComplexity = 64, alpha = 1.2)
    val ids = Array.tabulate(n)(_.toLong)
    val vecs = Array.tabulate(n)(i => vec(i.toLong, d))
    var t0 = System.nanoTime()
    val sh = graft.index.Vamana.buildShard(ids, vecs, params, "l2")
    println(f"[insert-probe] buildShard 20k d64: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    for (r <- 0 until reps) {
      val newIds = Array.tabulate(200)(i => (100000 + r * 200 + i).toLong)
      val newVecs = newIds.map(vec(_, d))
      t0 = System.nanoTime()
      graft.index.Vamana.insertIntoShard(sh, newIds, newVecs, params, "l2")
      println(f"[insert-probe] insertIntoShard 200@20k: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
