package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PrefixFilterJoin — the exactness contract: the prefix-filtered join
  * must return EXACTLY the pairs a brute-force all-pairs Jaccard scan
  * returns (completeness is the part a bug would silently break: a
  * too-short prefix drops qualifying pairs with no other symptom).
  */
class PrefixFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(sets: Seq[(Long, Set[String])], tNum: Int, tDen: Int) =
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if tDen * inter >= tNum * (sa.size + sb.size - inter)
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet

  private def run(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val df = sets.toDF("id", "toks")
    PrefixFilterJoin.join(df, "id", "toks", tNum, tDen)
      .select("a_id", "b_id", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  private def check(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int): Unit = {
    val got = try run(sets, tNum, tDen) finally graft.core.Pins.release()
    val want = brute(sets.map { case (i, ts) => (i, ts.toSet) }, tNum, tDen)
    assert(got == want,
      s"τ=$tNum/$tDen: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("equals brute force on the sf0.001 corpus shingle sets, τ=1/2 and τ=7/10") {
    val sets = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.TextOps.shinglesNative(col("text"), 3).as("toks"))
      .as[(Long, Seq[String])].collect().toSeq
    check(sets, 1, 2)
    check(sets, 7, 10)
  }

  test("adversarial shapes: df ties, singletons, identical sets, τ=1") {
    // every token equally frequent — the df order degenerates to the
    // token tiebreak and the prefix must still be a COMMON total order
    val ties = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("d", "e", "f", "g"),
      4L -> Seq("f", "g", "h", "i"))
    check(ties, 1, 2)
    // singleton sets: p = 1 − 1 + 1 = 1, the whole set is its prefix
    val singles = Seq(1L -> Seq("x"), 2L -> Seq("x"), 3L -> Seq("y"))
    check(singles, 1, 1)
    check(singles, 1, 2)
    // identical sets at τ=1: prefix shrinks to the single rarest token,
    // which identical sets necessarily share
    val ident = Seq(
      1L -> Seq("p", "q", "r"), 2L -> Seq("p", "q", "r"),
      3L -> Seq("p", "q", "s"), 4L -> Seq("t", "u", "v"))
    check(ident, 1, 1)
    check(ident, 2, 3)
  }

  test("length filter prunes without dropping boundary pairs") {
    // (2,4): jac would need inter ≥ 2 with union ≥ 4 → τ=1/2 boundary
    // reachable only when the small set is CONTAINED in the large one
    val sets = Seq(
      1L -> Seq("a", "b"),
      2L -> Seq("a", "b", "c", "d"),     // contains 1 → jac = 2/4 = 1/2 ✓
      3L -> Seq("a", "e", "f", "g", "h") /* jac(1,3)=1/6, len 2 vs 5 pruned */)
    check(sets, 1, 2)
    val got = run(sets, 1, 2)
    assert(got.contains((1L, 2L, 2L, 2L, 4L)), "containment boundary pair dropped")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L), "length-incompatible pair kept")
  }

  test("jac column is the rounded exact ratio") {
    val df = Seq(1L -> Seq("a", "b", "c"), 2L -> Seq("a", "b", "d")).toDF("id", "toks")
    val row = PrefixFilterJoin.join(df, "id", "toks", 1, 2)
      .select("inter", "jac").as[(Long, Double)].head()
    graft.core.Pins.release()
    assert(row == ((2L, 0.5)), s"got $row") // inter 2, union 4
  }

  test("plan: the pinned sorted-set relation feeds all three references — no re-derivation") {
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.TextOps.shinglesNative(col("text"), 3).as("toks"))
    val joined = PrefixFilterJoin.join(docs, "doc_id", "toks", 1, 2)
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Scan parquet"),
        "the join plan must read the ONE pinned sorted-set relation, " +
          "never re-derive it from the corpus scan")
      assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 3,
        "prefix explode + both verify sides must all read the pin")
    } finally graft.core.Pins.release()
  }
}
