package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe (r14): same-session A/B of candidate rewrites — the
  * only measurement that resolves sub-0.5 s deltas on this noisy box.
  * Alternates A and B per rep so co-tenant drift hits both equally. */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def tbl(name: String) = graft.core.Tables.load(s, d, name)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q297: FULL r13 form (wide fold, join before, eval pin) vs HEAD
    def basketsR13: DataFrame = graft.core.Pins.pin(
      tbl("lineitem")
        .join(tbl("orders").select(col("o_orderkey").as("l_orderkey"),
          unix_micros(col("o_orderdate")).as("us")), Seq("l_orderkey"))
        .crossJoin(broadcast(tbl("orders")
          .agg(min(unix_micros(col("o_orderdate"))).as("t0"),
            max(unix_micros(col("o_orderdate"))).as("t1"))
          .select(expr("t0 + (t1 - t0) * 7 div 10").as("cut"))))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"),
          max((col("us") >= col("cut")).cast("long")).as("is_post")))
    def q297A(): Unit = {
      val b = basketsR13
      val recs = graft.queries.RelationalQueries.q297Model(b)
      val evalPairs = graft.core.Pins.pin(
        b.filter(col("is_post") === 1L && size(col("ps")) > 1)
          .select(col("l_orderkey"), col("ps"), explode(col("ps")).as("i"))
          .join(broadcast(recs.groupBy(col("i"))
            .agg(sort_array(collect_list(struct(col("rank"), col("j"))))
              .as("rl"))), Seq("i"), "left")
          .select(col("l_orderkey"), col("i"),
            col("rl").isNotNull.cast("long").as("has_recs"),
            expr("""coalesce(aggregate(rl, CAST(99 AS BIGINT), (acc, r) ->
                    CASE WHEN array_contains(ps, r.j) AND r.rank < acc
                         THEN r.rank ELSE acc END), CAST(99 AS BIGINT))""")
              .as("min_rank")))
      noop(evalPairs.agg(count(lit(1)).as("n_eval"),
        sum(col("has_recs")).as("n_covered"),
        sum(when(col("min_rank") <= 1L, 1L).otherwise(0L)).as("h1"),
        sum(when(col("min_rank") <= 2L, 1L).otherwise(0L)).as("h2"),
        sum(when(col("min_rank") <= 3L, 1L).otherwise(0L)).as("h3"))
        .select(col("n_eval"), col("n_covered"),
          col("h1").as("hits_at_1"), col("h2").as("hits_at_2"),
          col("h3").as("hits_at_3"),
          expr("n_covered * 1000000 div greatest(1, n_eval)")
            .as("coverage_ppm"),
          expr("h1 * 1000000 div greatest(1, n_covered)").as("hit1_ppm"),
          expr("h2 * 1000000 div greatest(1, n_covered)").as("hit2_ppm"),
          expr("h3 * 1000000 div greatest(1, n_covered)").as("hit3_ppm")))
    }
    def q297B(): Unit =
      noop(graft.queries.RelationalQueries.q297(s, d)) // current = with repartition

    // ---- q144: signatures WITHOUT vs WITH the spread (current = with)
    def q144A(): Unit = {
      val sig = graft.core.Pins.pin(graft.operators.MinHashLsh.signatures(
        tbl("documents"), numHashes = 8, shingleN = 3)
        .filter(col("mh").isNotNull))
      val bands = graft.operators.MinHashLsh.bandTable(sig, 4, 2)
      val cands = bands.as("a").join(bands.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val m = size(filter(zip_with(col("ma"), col("mb"), (x, y) => x === y),
        x => x))
      val inter = size(array_intersect(col("sa"), col("sb")))
      noop(cands
        .join(sig.select(col("doc_id").as("a_id"), col("shh").as("sa"),
          col("mh").as("ma")), "a_id")
        .join(sig.select(col("doc_id").as("b_id"), col("shh").as("sb"),
          col("mh").as("mb")), "b_id")
        .select(m.cast("long").as("n_matches"),
          (m.cast("double") / 8.0).as("est"),
          (inter.cast("double") /
            (size(col("sa")) + size(col("sb")) - inter)).as("jac"))
        .groupBy(col("n_matches"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(abs(col("est") - col("jac"))), 4).as("mean_abs_err"),
          round(avg(col("est") - col("jac")), 4).as("mean_bias"))
        .orderBy(col("n_matches")))
    }
    def q144B(): Unit =
      noop(graft.SparkEntry.queries("q144_minhash_calibration")(s, d))

    def ab(label: String, a: () => Unit, b: () => Unit, n: Int = 4): Unit = {
      a(); graft.core.Pins.release() // warmups
      b(); graft.core.Pins.release()
      var ta = 0.0; var tb = 0.0
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      (1 to n).foreach { _ =>
        var t0 = System.nanoTime(); a(); graft.core.Pins.release()
        val da = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); graft.core.Pins.release()
        val db = (System.nanoTime() - t0) / 1e9
        ta += da; tb += db
        bestA = math.min(bestA, da); bestB = math.min(bestB, db)
      }
      println(f"[probe] $label%-14s A avg ${ta / n}%6.3f best $bestA%6.3f | " +
        f"B avg ${tb / n}%6.3f best $bestB%6.3f")
    }
    ab("q297 rep", q297A _, q297B _)
    ab("q144 spread", q144A _, q144B _)
    s.stop()
  }
}
