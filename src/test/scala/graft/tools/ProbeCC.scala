package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe (r14): connectedComponents round-by-round cost on
  * q200's core-core ε-graph. Run: sbt "Test/runMain graft.tools.ProbeCC". */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val eps2 = 1300000L
    val minPts = 4
    val qv = graft.core.Pins.pin(
      s.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x.cast("double") * 1000).cast("long")).as("v")))
    val edges = graft.core.Pins.pin(
      graft.operators.SimilarityJoin.sqDistPairs(qv.as[(Long, Array[Long])], eps2))
    println(s"[probe] n edges = ${edges.count()}")
    val sym0 = edges.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionByName(edges.select(col("b_id").as("x"), col("a_id").as("y")))
    val core = graft.core.Pins.pin(
      sym0.groupBy(col("x")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= minPts - 1).select(col("x")))
    println(s"[probe] n core = ${core.count()}")
    val coreEdges = edges
      .join(core.withColumnRenamed("x", "a_id"), Seq("a_id"), "left_semi")
      .join(core.withColumnRenamed("x", "b_id"), Seq("b_id"), "left_semi")
    println(s"[probe] n coreEdges = ${coreEdges.count()}")

    // replicate connectedComponents with per-phase timing
    val pairs = coreEdges
    val e2 = pairs.select(col("a_id").cast("long").as("u"), col("b_id").cast("long").as("v"))
    val sym = time("sym checkpoint") {
      e2.union(e2.select(col("v").as("u"), col("u").as("v"))).localCheckpoint()
    }
    var labels = time("labels init checkpoint") {
      sym.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label")).localCheckpoint()
    }
    var iter = 0
    var converged = false
    while (!converged && iter < 30) {
      val viaNeighbors = sym.join(labels, col("v") === col("node"))
        .select(col("u").as("node"), col("label"))
      val next = time(s"round $iter: join+agg+ckpt") {
        labels.union(viaNeighbors)
          .groupBy("node").agg(min("label").as("label"))
          .localCheckpoint()
      }
      val changed = time(s"round $iter: delta count") {
        next.join(labels.withColumnRenamed("label", "prev"), "node")
          .filter(col("label") < col("prev")).limit(1).count()
      }
      graft.core.Pins.releaseCheckpoint(labels)
      labels = next
      converged = changed == 0L
      iter += 1
    }
    println(s"[probe] rounds = $iter")
    graft.core.Pins.release()
    s.stop()
  }
}
