package graft.tools

/** Measures single-thread Vamana shard build time across (n, dim) shapes —
  * the empirical basis for the default shard sizing in
  * `AnnIndexManager.create` (one task builds one shard; wall time per task
  * must stay in minutes at 100 TB, not hours).
  *
  * Run: `sbt "runMain graft.tools.ShardSizing"`
  */
object ShardSizing {
  def main(args: Array[String]): Unit = {
    val p = graft.index.Vamana.Params(maxDegree = 64, buildComplexity = 128, alpha = 1.2)
    // warm up JIT
    locally {
      val rnd = new scala.util.Random(1)
      val v = Array.fill(2000)(Array.fill(64)(rnd.nextFloat()))
      graft.index.Vamana.buildShard(Array.tabulate(2000)(_.toLong), v, p, "l2")
    }
    for ((n, d) <- Seq((10000, 64), (25000, 64), (50000, 64),
                       (5000, 768), (10000, 768), (20000, 768))) {
      val rnd = new scala.util.Random(42)
      val vecs = Array.fill(n)(Array.fill(d)(rnd.nextFloat()))
      val ids = Array.tabulate(n)(_.toLong)
      val t0 = System.nanoTime()
      graft.index.Vamana.buildShard(ids, vecs, p, "l2")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[shard] n=$n%6d d=$d%4d  ${sec}%8.1f s  (${sec / n * 1e6}%6.1f us/insert)")
    }
  }
}
