package graft.queries

import graft.SparkSpec

/** Plan-shape tests for the TPC-H join suite (q153–q155): the star
  * schema's contract is that DIMENSIONS broadcast and the FACT table
  * shuffles at most for its aggregation — a SortMergeJoin appearing on
  * the fact side at dimension scale means a broadcast threshold or
  * join-order regression the oracle's value compare can't see.
  */
class TpchJoinSpec extends SparkSpec {

  private def plan(q: CoreQueries.Q): String =
    q(spark, sf0001).queryExecution.executedPlan.toString

  test("q153: segment + date filters push into the scans") {
    val p = plan(RelationalQueries.q153)
    assert(p.contains("BroadcastHashJoin"), "customer dim must broadcast")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_mktsegment")),
      "segment filter must reach the customer scan")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "ship-date filter must reach the lineitem scan")
  }

  test("q154: all five dimension joins broadcast; no sort-merge on the fact") {
    val p = plan(RelationalQueries.q154)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >= 4 broadcast joins in the star, saw $bhj")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join at dimension scale means a broadcast regression")
  }

  test("q155: returnflag and date filters push down; top-20 is TakeOrdered") {
    val p = plan(RelationalQueries.q155)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_returnflag")),
      "returnflag filter must reach the lineitem scan")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must plan as TakeOrderedAndProject, not a full sort")
  }
}
