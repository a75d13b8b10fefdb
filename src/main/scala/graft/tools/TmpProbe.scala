package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables

/** Scratch A/B harness (contents change per experiment; never part of
  * the declared surface). Current experiment: q175 PER-STAGE
  * decomposition (round-12 verdict task 1) — cumulative prefixes of
  * the shipped tagged-union plan, warm rounds in one session, so the
  * wall attributes to scan / pair fold / det fold / final fold + sort
  * rather than to the query as a blob. Run IDLE beside the committed
  * bench session: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.TmpProbe`. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def t(n: String) = Tables.load(s, d, n)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the shipped q175 plan's cumulative prefixes
    def union5 = {
      val li = t("lineitem"); val ord = t("orders"); val ev = t("events")
      li.selectExpr(
          """stack(2, 0L, l_orderkey, l_suppkey,
                      1L, l_partkey,  l_suppkey) AS (tag, det, dep_l)""",
          "CAST(NULL AS STRING) AS dep_s")
        .unionByName(ord.selectExpr(
          """stack(2, 2L, o_orderkey, o_custkey, CAST(NULL AS STRING),
                      3L, o_custkey,  CAST(NULL AS BIGINT), o_orderpriority)
             AS (tag, det, dep_l, dep_s)"""))
        .unionByName(ev.selectExpr("4L AS tag", "user_id AS det",
          "CAST(NULL AS BIGINT) AS dep_l", "event_type AS dep_s"))
    }
    def pairFold = union5
      .groupBy(col("tag"), col("det"), col("dep_l"), col("dep_s"))
      .agg(count(lit(1)).as("c"))
    def detFold = pairFold.groupBy(col("tag"), col("det"))
      .agg(sum(col("c")).as("rows"), max(col("c")).as("keep"))
    def tagFold = detFold.groupBy(col("tag"))
      .agg(sum(col("rows")).as("n_rows"), count(lit(1)).as("n_det"),
        sum(col("keep")).as("kept"))

    // variant B: ONE exchange — pre-partition by (tag, det) (a subset
    // partitioning satisfies the pair grouping's ClusteredDistribution,
    // so BOTH fold levels run partition-local) + integer dep encoding
    // (priorities/event types are ≤ 5-value domains; injective per tag)
    def union5Int = {
      val li = t("lineitem"); val ord = t("orders"); val ev = t("events")
      li.selectExpr(
          """stack(2, 0L, l_orderkey, l_suppkey,
                      1L, l_partkey,  l_suppkey) AS (tag, det, dep)""")
        .unionByName(ord.selectExpr(
          """stack(2, 2L, o_orderkey, o_custkey,
                      3L, o_custkey,
                      CAST(ascii(substr(o_orderpriority, 1, 1)) AS BIGINT))
             AS (tag, det, dep)"""))
        // the shipped q175 CASE verbatim, so the probe times the same
        // expression the committed plan runs (round-13 ADVICE)
        .unionByName(ev.selectExpr("4L AS tag", "user_id AS det",
          """CASE event_type WHEN 'view' THEN 1L WHEN 'click' THEN 2L
             WHEN 'purchase' THEN 3L WHEN 'signup' THEN 4L
             WHEN 'error' THEN 5L
             ELSE CAST(conv(substring(md5(event_type), 1, 13), 16, 10) AS BIGINT)
             END AS dep"""))
    }
    def oneExchange = union5Int
      .repartition(col("tag"), col("det"))
      .groupBy(col("tag"), col("det"), col("dep"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("tag"), col("det"))
      .agg(sum(col("c")).as("rows"), max(col("c")).as("keep"))
      .groupBy(col("tag"))
      .agg(sum(col("rows")).as("n_rows"), count(lit(1)).as("n_det"),
        sum(col("keep")).as("kept"))

    for (round <- 1 to sys.env.getOrElse("WARM_ROUNDS", "5").toInt) {
      time(f"q175 s1 scan+stack        r$round")(noop(union5))
      time(f"q175 s2 +pair fold        r$round")(noop(pairFold))
      time(f"q175 s3 +det fold         r$round")(noop(detFold))
      time(f"q175 s4 +tag fold         r$round")(noop(tagFold))
      time(f"q175 s5 full (declared)   r$round")(
        graft.Bench.action(
          graft.SparkEntry.queries("q175_fd_profile")(s, d)))
      time(f"q175 B  one-exchange+int  r$round")(noop(oneExchange))
      graft.core.Pins.release()
    }
    s.stop()
  }
}
