package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe (r14): per-stage timing of q200_dbscan at sf0.1.
  * Run: sbt "Test/runMain graft.tools.ProbeQ200". Not shipped. */
object ProbeQ200 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup whole query once
    time("warmup full q200") {
      noop(graft.SparkEntry.queries("q200_dbscan")(s, d)); graft.core.Pins.release()
    }
    time("full q200 (2nd)") {
      noop(graft.SparkEntry.queries("q200_dbscan")(s, d)); graft.core.Pins.release()
    }

    // stage decomposition
    val eps2 = 1300000L
    val minPts = 4
    val qv = time("qv pin") {
      graft.core.Pins.pin(
        s.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => round(x.cast("double") * 1000).cast("long")).as("v")))
    }
    val edges = time("sqDistPairs pin") {
      graft.core.Pins.pin(
        graft.operators.SimilarityJoin.sqDistPairs(
          qv.as[(Long, Array[Long])], eps2))
    }
    val sym = time("sym pin") {
      graft.core.Pins.pin(
        edges.select(col("a_id").as("x"), col("b_id").as("y"))
          .unionByName(edges.select(col("b_id").as("x"), col("a_id").as("y"))))
    }
    val core = time("core pin") {
      graft.core.Pins.pin(
        sym.groupBy(col("x")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= minPts - 1).select(col("x")))
    }
    val coreEdges = edges
      .join(core.withColumnRenamed("x", "a_id"), Seq("a_id"), "left_semi")
      .join(core.withColumnRenamed("x", "b_id"), Seq("b_id"), "left_semi")
    val cc = time("connectedComponents") {
      val r = graft.operators.DedupClusters.connectedComponents(coreEdges)
      noop(r); r
    }
    val ccr = cc.select(col("doc_id").as("node"), col("component").as("label"))
    val coreCl = time("coreCl pin") {
      graft.core.Pins.pin(
        core.select(col("x").as("node"))
          .join(ccr, Seq("node"), "left")
          .select(col("node"), coalesce(col("label"), col("node")).as("cluster")))
    }
    val borderCl = sym
      .join(coreCl.select(col("node").as("y"), col("cluster")), Seq("y"))
      .join(coreCl.select(col("node").as("x")), Seq("x"), "left_anti")
      .groupBy(col("x")).agg(min(col("cluster")).as("cluster"))
    time("final assemble+sort") {
      noop(qv.select(col("vec_id"))
        .join(coreCl.select(col("node").as("vec_id"),
          col("cluster").as("c_core")), Seq("vec_id"), "left")
        .join(borderCl.select(col("x").as("vec_id"),
          col("cluster").as("c_border")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("c_core").isNotNull, lit("core"))
            .when(col("c_border").isNotNull, lit("border"))
            .otherwise(lit("noise")).as("role"),
          coalesce(col("c_core"), col("c_border")).as("cluster"))
        .orderBy(col("vec_id")))
    }
    graft.core.Pins.release()
    s.stop()
  }
}
