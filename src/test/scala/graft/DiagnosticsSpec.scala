package graft

import org.scalatest.funsuite.AnyFunSuite

/** The parameter-sweep diagnostics live OUTSIDE SparkEntry.queries (no
  * oracle form by construction — see IndexQueries.diagnostics), so the
  * driver never runs them; this spec keeps them exercised: each must run
  * against the sf0.001 testdata and return k ranked rows with sane values,
  * the contract a tuning sweep relies on. */
class DiagnosticsSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("diagnostics stay disjoint from queries and each has a strict sibling") {
    val overlap = SparkEntry.diagnostics.keySet & SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"diagnostics also in queries: $overlap")
    // every diagnostic's machinery is pinned by a strict sibling
    val siblings = Map(
      "ann_ivf_probe" -> "ann_ivf_topk",
      "ann_vamana_probe" -> "ann_vamana_topk",
      "ann_hnsw_probe" -> "ann_hnsw_topk",
      "ann_recall_probe" -> "ann_recall_exact",
      // approximate beam range vs the exact-scan strict sibling
      "ann_range_beam" -> "ann_range_vamana",
      // partial-overfetch staged MaxSim vs the strict relational rerank
      "maxsim_ann_probe" -> "maxsim_rerank")
    assert(SparkEntry.diagnostics.keySet == siblings.keySet)
    for ((d, s) <- siblings)
      assert(SparkEntry.queries.contains(s), s"$d: missing strict sibling $s")
  }

  test("every diagnostic runs and returns non-empty, non-degenerate results") {
    assume(new java.io.File(sfDir).exists(), s"driver testdata missing: $sfDir")
    val spark = SparkSpec.session
    for ((name, fn) <- SparkEntry.diagnostics) {
      val rows = fn(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      assert(rows.forall(r => !r.anyNull), s"$name returned null fields")
    }
  }
}
