package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch probe (r14): same-session A/B — q123 and q55 spreads.
  * A = unspread r13 form, B = current HEAD (spread). */
object ProbeAB4 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    def tbl(name: String) = Tables.load(s, d, name)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String): Unit =
      noop(graft.SparkEntry.queries(name)(s, d))

    def q123A(): Unit = {
      val sig = graft.core.Pins.pin(graft.operators.MinHashLsh.signatures(
        tbl("documents").select(col("doc_id"), col("text")), 8, 3))
      val bt = graft.operators.MinHashLsh.bandTable(sig, 4, 2)
      val cand = bt.as("a").hint("merge")
        .join(bt.as("b").hint("merge"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(substring_index(col("a.bk"), "|", 1).cast("int").as("band"),
          col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      val shh = sig.select(col("doc_id"), col("shh"))
      noop(cand
        .join(shh.select(col("doc_id").as("a_id"), col("shh").as("sha")), "a_id")
        .join(shh.select(col("doc_id").as("b_id"), col("shh").as("shb")), "b_id")
        .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jac", round(col("common").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("common")), 4))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("jac") >= 0.5, 1L).otherwise(0L)).as("n_verified"))
        .select(col("band"), col("n_candidates"), col("n_verified"),
          round(col("n_verified").cast("double") / col("n_candidates"), 4)
            .as("precision"))
        .orderBy(col("band")))
    }
    def q55A(): Unit = {
      val docs = tbl("documents")
      val stored = graft.operators.MinHashLsh.signatures(
        docs.filter(col("doc_id") % 2 === 0), 8, 3)
      val incoming = graft.operators.MinHashLsh.signatures(
        docs.filter(col("doc_id") % 2 === 1), 8, 3)
      noop(graft.operators.MinHashLsh.nearDupAgainst(incoming, stored, 4, 2, 0.5)
        .orderBy(col("new_id"), col("dup_of")))
    }

    def ab(label: String, a: () => Unit, b: () => Unit, n: Int = 5): Unit = {
      a(); graft.core.Pins.release()
      b(); graft.core.Pins.release()
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      val as = new scala.collection.mutable.ArrayBuffer[Double]
      val bs = new scala.collection.mutable.ArrayBuffer[Double]
      (1 to n).foreach { _ =>
        var t0 = System.nanoTime(); a(); graft.core.Pins.release()
        val da = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b(); graft.core.Pins.release()
        val db = (System.nanoTime() - t0) / 1e9
        as += da; bs += db
        bestA = math.min(bestA, da); bestB = math.min(bestB, db)
      }
      println(f"[probe] $label%-12s A best $bestA%6.3f ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"B best $bestB%6.3f ${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    ab("q123 spread", q123A _, () => run("q123_lsh_precision"))
    ab("q55 spread", q55A _, () => run("q55_incremental_neardup"))
    s.stop()
  }
}
