package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables

/** Scratch A/B harness (contents change per experiment; never part of
  * the declared surface). Current experiment: q175 form shootout —
  * (a) round-10 five independent two-level folds union'd,
  * (b) round-11 full tagged-union single fold,
  * (c) per-table stack: one scan + one fold per TABLE (3 branches). */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def t(n: String) = Tables.load(s, d, n)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // (a) round-10 form
    def g3(df: DataFrame, det: String, dep: String, name: String) =
      df.select(col(det).as("det"), col(dep).as("dep"))
        .groupBy(col("det"), col("dep")).agg(count(lit(1)).as("c"))
        .groupBy(col("det")).agg(sum(col("c")).as("rows"), max(col("c")).as("keep"))
        .agg(sum(col("rows")).as("n_rows"),
          count(lit(1)).as("n_det"), sum(col("keep")).as("kept"))
        .select(lit(name).as("fd"), col("n_rows"), col("n_det"),
          (col("n_rows") - col("kept")).as("viol_rows"),
          when(col("n_rows") === col("kept"), 1L).otherwise(0L).as("holds"),
          expr("(1000000 * (n_rows - kept)) div n_rows").as("g3_ppm"))
    def oldForm = {
      val li = t("lineitem"); val ord = t("orders"); val ev = t("events")
      g3(li, "l_orderkey", "l_suppkey", "a")
        .unionByName(g3(li, "l_partkey", "l_suppkey", "b"))
        .unionByName(g3(ord, "o_orderkey", "o_custkey", "c"))
        .unionByName(g3(ord, "o_custkey", "o_orderpriority", "d"))
        .unionByName(g3(ev, "user_id", "event_type", "e"))
        .orderBy(col("fd"))
    }

    // (c) per-table: fold the stacked pair ONCE per table, union the
    // tag-sized results (branches independent → parallel stages)
    def fold2(u: DataFrame) =
      u.groupBy(col("tag"), col("det"), col("dep"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("tag"), col("det"))
        .agg(sum(col("c")).as("rows"), max(col("c")).as("keep"))
        .groupBy(col("tag"))
        .agg(sum(col("rows")).as("n_rows"), count(lit(1)).as("n_det"),
          sum(col("keep")).as("kept"))
    def perTable = {
      val li = t("lineitem").selectExpr(
        "stack(2, 0L, l_orderkey, l_suppkey, 1L, l_partkey, l_suppkey) AS (tag, det, dep)")
      val ord = t("orders").selectExpr(
        """stack(2, 2L, o_orderkey, CAST(o_custkey AS STRING),
                    3L, o_custkey, o_orderpriority) AS (tag, det, dep)""")
      val ev = t("events").selectExpr("4L AS tag", "user_id AS det",
        "event_type AS dep")
      fold2(li).unionByName(fold2(ord)).unionByName(fold2(ev))
        .orderBy(col("tag"))
    }

    for (r <- 1 to 4) {
      println(s"--- round $r")
      time("old 5-branch")(noop(oldForm))
      time("new fused (shipped)")(
        noop(graft.SparkEntry.queries("q175_fd_profile")(s, d)))
      time("per-table stack")(noop(perTable))
    }
    s.stop()
  }
}
