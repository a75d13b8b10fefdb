package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.Tables

/** Scratch probe (r15): q289 — A = HOF d2 assignment (r14 form), B =
  * native ArraySqDistLong kernel (HEAD); q296 — A = HEAD, B = spread
  * events before the sketch fold. */
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

    // warm the memoized k-center model before timing either side
    run("q289_kcenter_coreset")
    graft.core.Pins.release()
    // A: the r14 HOF assignment over the same memoized centers — we
    // reconstruct it by calling the public query pieces with the HOF d2
    def q289A(): Unit = {
      val grid = t("embeddings").select(col("vec_id"),
        expr("transform(embedding, e -> CAST(round(e * 1000) AS BIGINT))")
          .as("x"))
      val centers = graft.queries.PipelineQueries.kcenterFor(s, d)
      def d2Hof(cx: Seq[Long]) =
        expr(s"""aggregate(zip_with(x, array(${cx.mkString("L,")}L),
                |  (a, b) -> (a - b) * (a - b)),
                |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)
      val centerDf = s.createDataFrame(
        centers.map(c => (c._1, c._2))).toDF("rank", "center_id")
      val ds = array(centers.map(c => d2Hof(c._3)): _*)
      noop(grid
        .select(col("vec_id"), ds.as("ds"))
        .withColumn("rank", expr("array_position(ds, array_min(ds))"))
        .withColumn("d2", expr("element_at(ds, CAST(rank AS INT))"))
        .groupBy(col("rank"))
        .agg(count(lit(1)).as("n_assigned"), max(col("d2")).as("max_d2"))
        .join(broadcast(centerDf), Seq("rank"))
        .select(col("rank"), col("center_id"), col("n_assigned"),
          col("max_d2"))
        .orderBy(col("rank")))
    }

    def q296B(): Unit = {
      val k = 512
      noop(graft.operators.MinHashLsh.spreadSmallInput(t("events"))
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          md5(concat(lit("kll71|"), col("event_id").cast("string"))).as("h"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"))
        .agg(graft.operators.Histogram.longHistogram(col("cents")).as("hist"),
          graft.operators.TopK.minKByString(k)(col("h"), col("cents"))
            .as("smp"))
        .withColumn("es", array_sort(map_entries(col("hist"))))
        .withColumn("n",
          expr("aggregate(es, 0L, (a, e) -> a + e.value)"))
        .withColumn("p50_exact_cents",
          expr("""aggregate(es,
                   named_struct('cum', 0L, 'p', CAST(NULL AS BIGINT)),
                   (a, e) -> named_struct('cum', a.cum + e.value,
                     'p', CASE WHEN a.p IS NULL
                                 AND (a.cum + e.value) * 2 >= n
                               THEN e.key ELSE a.p END),
                   a -> a.p)"""))
        .withColumn("cs", array_sort(expr("transform(smp, x -> x._2)")))
        .withColumn("p50_est_cents",
          element_at(col("cs"), ceil(size(col("cs")) * lit(0.5)).cast("int")))
        .withColumn("abs_err_ppm",
          expr("""abs(p50_est_cents - p50_exact_cents) * 1000000
                  div greatest(1, abs(p50_exact_cents))"""))
        .select(col("event_type"), col("n"), col("p50_exact_cents"),
          col("p50_est_cents"), col("abs_err_ppm"))
        .orderBy(col("event_type")))
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
    ab("q289 kernel", q289A _, () => run("q289_kcenter_coreset"))
    ab("q296 spread", () => run("q296_sketch_error"), q296B _)
    s.stop()
  }
}
