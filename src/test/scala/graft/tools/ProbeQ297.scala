package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe (r14): A/B the q297 basket-fold forms in ONE session —
  * r13 (join orders before the fold, max(us>=cut) through it) vs r14
  * (fold lineitem alone, attach is_post to the folded rows). */
object ProbeQ297 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    import graft.queries.RelationalQueries._
    def t(name: String) = graft.core.Tables.load(s, d, name)
    def cut = broadcast(t("orders")
      .agg(min(unix_micros(col("o_orderdate"))).as("t0"),
        max(unix_micros(col("o_orderdate"))).as("t1"))
      .select(expr("t0 + (t1 - t0) * 7 div 10").as("cut")))
    def basketsOld: DataFrame = graft.core.Pins.pin(
      t("lineitem")
        .join(t("orders").select(col("o_orderkey").as("l_orderkey"),
          unix_micros(col("o_orderdate")).as("us")), Seq("l_orderkey"))
        .crossJoin(cut)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"),
          max((col("us") >= col("cut")).cast("long")).as("is_post")))
    def basketsNew: DataFrame = q297Baskets(s, d)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def full(b: DataFrame): Unit = noop(q297Eval(b, q297Model(b)))
    // warmup both
    full(basketsOld); graft.core.Pins.release()
    full(basketsNew); graft.core.Pins.release()
    val n = 4
    var told = 0.0; var tnew = 0.0
    var pold = 0.0; var pnew = 0.0
    (1 to n).foreach { _ =>
      var t0 = System.nanoTime(); val bo = basketsOld
      var t1 = System.nanoTime(); full(bo)
      var t2 = System.nanoTime(); graft.core.Pins.release()
      pold += (t1 - t0) / 1e9; told += (t2 - t0) / 1e9
      t0 = System.nanoTime(); val bn = basketsNew
      t1 = System.nanoTime(); full(bn)
      t2 = System.nanoTime(); graft.core.Pins.release()
      pnew += (t1 - t0) / 1e9; tnew += (t2 - t0) / 1e9
    }
    println(f"[probe] old pin ${pold / n}%6.3f  full ${told / n}%6.3f")
    println(f"[probe] new pin ${pnew / n}%6.3f  full ${tnew / n}%6.3f")
    s.stop()
  }
}
