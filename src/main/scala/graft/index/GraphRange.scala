package graft.index

/** Expanding-beam range search controller for graph engines (the pattern
  * behind faiss's HNSW `range_search`: IndexHNSW.cpp grows the candidate
  * budget geometrically until the result frontier passes the radius).
  *
  * Graph adjacency gives top-k guidance but no radius certificate, so a
  * graph range scan is either exhaustive (the exact default,
  * [[AnnIndex.rangeScan]]) or approximate. This controller re-runs the
  * engine's bounded-pool beam at doubling widths and stops when either
  * (a) the pool is not full — the beam explored the whole reachable
  * component, nothing else can match — or (b) the pool's WORST distance
  * exceeds `radius · (1 + eps)` — the beam frontier has moved past the
  * query ball with an eps safety margin, so anything still unseen is
  * (heuristically) farther than the radius. Work is geometric in the
  * final width: total cost ≤ 2× the last beam, never the full index.
  *
  * `radius` and `eps` are on the ENGINE distance scale (squared-L2 for
  * l2, 1−cos for cosine), matching [[AnnIndex.rangeScan]].
  */
private[index] object GraphRange {

  /** @param searchAt beam of width l → pool ascending by distance
    * @return all pool entries with distance ≤ radius, ascending */
  def expanding(radius: Double, eps: Double, initL: Int, maxL: Int)(
      searchAt: Int => collection.Seq[(Int, Double)]): collection.Seq[(Int, Double)] = {
    require(eps >= 0.0, s"eps must be >= 0, got $eps")
    var l = math.max(1, initL)
    var res = searchAt(l)
    var done = false
    while (!done) {
      val frontierPassed = res.nonEmpty && res.last._2 > radius * (1 + eps)
      if (res.length < l || frontierPassed || l >= maxL) done = true
      else { l = math.min(maxL, l * 2); res = searchAt(l) }
    }
    res.filter(_._2 <= radius)
  }
}
