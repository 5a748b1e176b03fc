package graft

/** Plan-shape regression guard: the scale arguments in COVERAGE.md are
  * asserted against the actual physical plans, so a refactor that
  * silently reintroduces a full-corpus window top-k or loses a broadcast
  * fails CI — plan shape IS the 100 TB contract.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("ANN top-k runs through the bounded aggregator, never a window") {
    Seq("q_ann_brute", "q_ann_lsh", "q_ann_ivf", "q_knn_label").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_topkagg"),
        s"$q lost the map-side bounded top-k (shuffle would carry the corpus)")
      assert(!p.contains("Window [") || q == "q_knn_label",
        s"$q regressed to a row_number window over the query id")
    }
  }

  test("ANN brute/IVF keep exactly one hash exchange (the top-k combine)") {
    Seq("q_ann_brute", "q_ann_ivf").foreach { q =>
      val n = "Exchange hashpartitioning".r.findAllIn(plan(q)).size
      assert(n === 1,
        s"$q has $n hash exchanges; IVF cell assignment must stay a narrow projection")
    }
  }

  test("dimension lookups broadcast (no shuffle on the fact side)") {
    assert(plan("q_derived_fields").contains("BroadcastHashJoin"))
    assert(plan("q_resume_antijoin").contains("BroadcastHashJoin"))
  }

  test("exact dedup partial-aggregates map-side before its one exchange") {
    val p = plan("q_dedup_exact")
    assert(p.contains("partial_count") || p.contains("partial_"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
  }
}
