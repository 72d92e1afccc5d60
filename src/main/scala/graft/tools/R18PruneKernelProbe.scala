package graft.tools

/** Interleaved same-JVM A/B of the RobustPrune removal predicate at the
  * bench's d768 shape: (a) full l2Sq through the Function2 dist value,
  * (b) early-abort l2SqScaledWithin through a Function3 closure, (c)
  * static direct l2Sq call. Decides whether the r18 early-abort wiring
  * helps, hurts, or is noise — immune to cross-run host drift.
  *
  * Run: sbt "runMain graft.tools.R18PruneKernelProbe [dim] [pairs]"
  */
object R18PruneKernelProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(768)
    val nPairs = args.drop(1).headOption.map(_.toInt).getOrElse(200000)
    val rnd = new scala.util.Random(7)
    val n = 512
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val ai = Array.fill(nPairs)(rnd.nextInt(n))
    val bi = Array.fill(nPairs)(rnd.nextInt(n))
    val bounds = Array.fill(nPairs)(100.0 + rnd.nextDouble() * 60.0)
    val alpha = 1.2
    val dist: (Array[Float], Array[Float]) => Double =
      graft.functions.VectorKernels.orderingDistance("l2") _
    // the REJECTED r18 candidate, kept inline as evidence: early-abort
    // blocked l2 prune predicate (monotone partial sums). Measured 35-60%
    // SLOWER per pair on the bench's uniform-random data — distances
    // concentrate, so the abort almost never fires before the last block
    // and the blocked loop + closure overhead is pure cost.
    def l2SqScaledWithin(a: Array[Float], b: Array[Float],
                         scale: Double, bound: Double): Boolean = {
      var acc = 0.0
      var i = 0
      val n = a.length
      while (i < n) {
        val lim = math.min(n, i + 64)
        while (i < lim) {
          val d = a(i).toDouble - b(i).toDouble
          acc += d * d
          i += 1
        }
        if (scale * acc > bound) return false
      }
      scale * acc <= bound
    }
    val withinAbort: (Array[Float], Array[Float], Double) => Boolean =
      (a, b, bound) => l2SqScaledWithin(a, b, alpha, bound)
    var sink = 0

    def run(name: String)(f: Int => Boolean): Unit = {
      // warm
      var i = 0
      while (i < nPairs) { if (f(i)) sink += 1; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < nPairs) { if (f(i)) sink += 1; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prune-kernel] $name%-22s ${dt}%.4f s  (${dt / nPairs * 1e9}%.0f ns/pair)")
    }

    val cached: (Array[Float], Array[Float]) => Double =
      (a, b) => graft.functions.VectorKernels.l2Sq(a, b)
    for (round <- 1 to 3) {
      run(s"fn2-orderingDist r$round") { i =>
        alpha * dist(vecs(ai(i)), vecs(bi(i))) <= bounds(i) }
      run(s"fn2-cached-l2 r$round") { i =>
        alpha * cached(vecs(ai(i)), vecs(bi(i))) <= bounds(i) }
      run(s"fn3-early-abort r$round") { i =>
        withinAbort(vecs(ai(i)), vecs(bi(i)), bounds(i)) }
      run(s"static-l2Sq r$round") { i =>
        alpha * graft.functions.VectorKernels.l2Sq(vecs(ai(i)), vecs(bi(i))) <= bounds(i) }
    }
    if (sink == -1) println(sink)
  }
}
