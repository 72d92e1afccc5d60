package graft.tools

/** r19: measures the repeat-pair rate of `Vamana.insertIntoShard` distance
  * evals at the CDC bench shape (200 inserts into a 20k-row d64 shard) —
  * the go/no-go measurement for a bounded big-shard pair memo (the r18
  * follow-up). Counts total kernel evals, unique unordered pairs, and the
  * wall with/without a bounded open-addressing memo wrapper.
  *
  * Run: sbt "runMain graft.tools.R19MemoProbe [reps]"
  */
object R19MemoProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
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
    println(f"[memo-probe] buildShard 20k d64: ${(System.nanoTime() - t0) / 1e9}%.3f s")

    // instrumented rep: count evals + unique pairs through a full map
    {
      val newIds = Array.tabulate(200)(i => (100000 + i).toLong)
      val newVecs = newIds.map(vec(_, d))
      val idx = new java.util.IdentityHashMap[Array[Float], Integer](2 * (n + 200))
      var i = 0
      while (i < n) { idx.put(vecs(i), Integer.valueOf(i)); i += 1 }
      i = 0
      while (i < 200) { idx.put(newVecs(i), Integer.valueOf(n + i)); i += 1 }
      var evals = 0L
      var misses = 0L // pairs where an arg is not an in-shard array
      val seen = new java.util.HashSet[Long]()
      val counting: (Array[Float], Array[Float]) => Double = (a, b) => {
        evals += 1
        val ia = idx.get(a); val ib = idx.get(b)
        if (ia == null || ib == null) misses += 1
        else {
          val x = math.min(ia.intValue(), ib.intValue()).toLong
          val y = math.max(ia.intValue(), ib.intValue()).toLong
          seen.add(x * 1000000L + y)
        }
        graft.functions.VectorKernels.l2Sq(a, b)
      }
      graft.index.Vamana.insertIntoShardWith(sh, newIds, newVecs, params, counting)
      println(f"[memo-probe] evals=$evals unique=${seen.size} misses=$misses " +
        f"repeatRate=${1.0 - seen.size.toDouble / (evals - misses)}%.3f")
    }

    // wall A/B: raw kernel vs bounded open-addressing memo, interleaved
    for (r <- 0 until reps) {
      val newIds = Array.tabulate(200)(i => (100000 + r * 200 + i).toLong)
      val newVecs = newIds.map(vec(_, d))
      val raw = graft.functions.VectorKernels.orderingDistance("l2") _
      t0 = System.nanoTime()
      graft.index.Vamana.insertIntoShardWith(sh, newIds, newVecs, params, raw)
      val tRaw = (System.nanoTime() - t0) / 1e9
      // memoized variant
      val memo = graft.index.Vamana.boundedMemoDist(
        sh.vectors ++ newVecs, raw)
      t0 = System.nanoTime()
      graft.index.Vamana.insertIntoShardWith(sh, newIds, newVecs, params, memo)
      val tMemo = (System.nanoTime() - t0) / 1e9
      println(f"[memo-probe] rep $r raw=$tRaw%.3f memo=$tMemo%.3f")
    }
  }
}
