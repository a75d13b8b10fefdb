package graft.tools
import org.apache.spark.sql.functions._
import graft.core.Tables
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
    def h(step: Int, cur: org.apache.spark.sql.Column, nxt: org.apache.spark.sql.Column) =
      md5(concat(lit(s"w|$step|"), cur.cast("string"), lit("|"), nxt.cast("string")))
    for (r <- 1 to 3) {
      println(s"--- round $r")
      var ep: org.apache.spark.sql.DataFrame = null
      time("ep pin") {
        ep = graft.core.Pins.pin(t("orders")
          .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("p")))
      }
      val byP = ep.groupBy(col("p"))
        .agg(min(struct(h(1, col("p"), col("u")).as("h"), col("u").as("id"))).as("m1"),
          min(struct(h(3, col("p"), col("u")).as("h"), col("u").as("id"))).as("m3"))
      time("byP fold (struct)") { byP.write.format("noop").mode("overwrite").save() }
      val byU = ep.groupBy(col("u"))
        .agg(min(struct(h(2, col("u"), col("p")).as("h"), col("p").as("id"))).as("m2"))
      time("byU fold (struct)") { byU.write.format("noop").mode("overwrite").save() }
      var c13: org.apache.spark.sql.DataFrame = null
      time("c13 pin") {
        c13 = graft.core.Pins.pin(byP.select(col("p"), col("m1.id").as("c1"), col("m3.id").as("c3")))
      }
      val c2 = byU.select(col("u"), col("m2.id").as("c2"))
      val byPs = ep.groupBy(col("p"))
        .agg(min(concat(h(1, col("p"), col("u")), lpad(col("u").cast("string"), 20, "0"))).as("m1"),
          min(concat(h(3, col("p"), col("u")), lpad(col("u").cast("string"), 20, "0"))).as("m3"))
      time("byP fold (string)") { byPs.write.format("noop").mode("overwrite").save() }
      val byPx = ep.groupBy(col("p")).agg(min_by(col("u"), h(1, col("p"), col("u"))).as("m1"))
      time("byP fold (min_by 1x)") { byPx.write.format("noop").mode("overwrite").save() }
      val byP0 = ep.groupBy(col("p")).agg(count(lit(1)).as("n"))
      time("byP count-only") { byP0.write.format("noop").mode("overwrite").save() }
      val byP1 = ep.groupBy(col("p")).agg(min(h(1, col("p"), col("u"))).as("m"))
      time("byP min(md5) only") { byP1.write.format("noop").mode("overwrite").save() }
      time("assembly + sort") {
        c13.select(col("p").as("start"), col("c1").as("u1"))
          .join(broadcast(c2.withColumnRenamed("u", "u1")), Seq("u1"))
          .withColumnRenamed("c2", "p2")
          .join(broadcast(c13.select(col("p").as("p2"), col("c3").as("u3"))), Seq("p2"))
          .select(col("start"), col("u1"), col("p2"), col("u3"))
          .orderBy(col("start")).write.format("noop").mode("overwrite").save()
      }
      graft.core.Pins.release()
    }
    s.stop()
  }
}
