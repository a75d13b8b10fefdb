package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextOps

/** Scratch probe (r15): q121 funnel-tail restructure — B replaces the
  * four per-gate LEFT JOINs with a union of failing-doc tag rows, one
  * (doc_id) fold, and a single join back to the spine. */
object TmpQ304 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def t(n: String) = Tables.load(s, d, n)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String): Unit =
      noop(graft.SparkEntry.queries(name)(s, d))

    def q121B(): Unit = {
      val base = graft.core.Pins.pin(t("documents")
        .select(col("doc_id"), col("source"), col("text")))
      val tc = base.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("k"))
      val gopherF = tc.groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_tokens"),
          sum(col("k") * length(col("term"))).as("n_chars"),
          sum(when(col("term").isin(TextOps.EnStops.map(x => x: Any): _*),
            col("k")).otherwise(0L)).as("stop_k"),
          max(col("k")).as("max_k"))
        .filter(!(col("n_tokens") >= 50 && col("n_tokens") <= 100000 &&
          col("n_chars") >= col("n_tokens") * 3 &&
          col("n_chars") <= col("n_tokens") * 10 &&
          col("stop_k") >= 2 &&
          col("max_k") * 5 <= col("n_tokens")))
        .select(col("doc_id"), lit("g").as("w"))
      val dupF = base.select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("doc_id"))))
        .filter(col("rn") > 1)
        .select(col("doc_id"), lit("d").as("w"))
      val ch = base.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 8)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(1), floor(size(col("t")) / 8).cast("int")),
            i => md5(concat_ws(" ",
              slice(col("t"), (i - lit(1)) * lit(8) + lit(1), lit(8)))))).as("h"))
      val nd = ch.distinct().groupBy(col("h")).agg(count(lit(1)).as("nd"))
      val chunkF = ch.join(nd, "h").groupBy(col("doc_id"))
        .agg((sum(when(col("nd") >= 2, 1L).otherwise(0L)) * 2 >
          count(lit(1))).as("f"))
        .filter(col("f"))
        .select(col("doc_id"), lit("c").as("w"))
      val sh = base.select(col("doc_id"), col("source"),
        explode(array_distinct(TextOps.shinglesNative(col("text"), 3))).as("g"))
      val bench = sh.filter(col("source") === "src0").select(col("g")).distinct()
      val contamF = sh.filter(col("source") =!= "src0")
        .join(broadcast(bench), "g")
        .select(col("doc_id")).distinct()
        .select(col("doc_id"), lit("x").as("w"))
      val fl = gopherF.unionByName(dupF).unionByName(chunkF).unionByName(contamF)
        .groupBy(col("doc_id"))
        .agg(max(when(col("w") === "g", 1L).otherwise(0L)).as("f_gopher"),
          max(when(col("w") === "d", 1L).otherwise(0L)).as("f_dup"),
          max(when(col("w") === "c", 1L).otherwise(0L)).as("f_chunk"),
          max(when(col("w") === "x", 1L).otherwise(0L)).as("f_contam"))
      noop(base.select(col("doc_id"), col("source"))
        .join(fl, Seq("doc_id"), "left")
        .na.fill(0L, Seq("f_gopher", "f_dup", "f_chunk", "f_contam"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("f_gopher")).as("n_gopher_fail"),
          sum(col("f_dup")).as("n_exact_dup"),
          sum(col("f_chunk")).as("n_chunk_dup"),
          sum(col("f_contam")).as("n_contaminated"),
          sum(when(col("f_gopher") === 0 && col("f_dup") === 0 &&
            col("f_chunk") === 0 && col("f_contam") === 0, 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy(col("source")))
    }

    def ab(label: String, a: () => Unit, b: () => Unit, n: Int = 7): Unit = {
      a(); graft.core.Pins.release()
      b(); graft.core.Pins.release()
      val as = new scala.collection.mutable.ArrayBuffer[Double]
      val bs = new scala.collection.mutable.ArrayBuffer[Double]
      (1 to n).foreach { _ =>
        var t0 = System.nanoTime(); a(); graft.core.Pins.release()
        as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); graft.core.Pins.release()
        bs += (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-12s A best ${as.min}%6.3f ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"B best ${bs.min}%6.3f ${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    ab("q121 union", () => run("q121_curation_funnel"), q121B _)
    s.stop()
  }
}
