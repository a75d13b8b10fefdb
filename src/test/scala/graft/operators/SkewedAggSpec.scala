package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import scala.util.Random

class SkewedAggSpec extends SparkSpec {
  import spark.implicits._

  test("twoPhaseAgg equals direct aggregation (skewed key included)") {
    val rnd = new Random(5)
    // one hot key with 10k rows, many cold keys
    val rows = (0 until 10000).map(i => ("hot", i.toLong)) ++
      (0 until 2000).map(i => ("k" + rnd.nextInt(100), i.toLong))
    val d = rows.toDF("k", "v").repartition(16)
    val got = SkewedAgg.twoPhaseAgg(d, Seq(col("k")), col("v"), "v")
      .select("k", "sum_v", "cnt_v").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exp = d.groupBy("k").agg(sum("v").as("s"), count("v").as("c"))
      .select("k", "s", "c").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == exp)
  }

  test("saltedJoin equals plain join") {
    val left = (0 until 5000).map(i => (i % 7, i.toLong)).toDF("key", "lv")
      .repartition(8)
    val right = (0 until 7).map(i => (i, s"r$i")).toDF("key", "rv")
    val got = SkewedAgg.saltedJoin(left, right, "key")
      .select("key", "lv", "rv").as[(Int, Long, String)].collect().sorted.toSeq
    val exp = left.join(right, "key")
      .select("key", "lv", "rv").as[(Int, Long, String)].collect().sorted.toSeq
    assert(got == exp)
  }

  test("q38 construction launches no extra Spark job (corpus count is in-plan)") {
    // spark.read.parquet itself costs a footer/listing job, for EVERY
    // query — so the lazy-construction guard is comparative: building
    // q38 (which used to run an eager docs.count()) must launch exactly
    // as many jobs as building a plain single-table documents query.
    def jobsDuring(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try { f; Thread.sleep(300) } // listener bus drains async
      finally spark.sparkContext.removeSparkListener(listener)
      n.get()
    }
    jobsDuring(()) // warm anything pending
    val baseline = jobsDuring(graft.queries.PipelineQueries.q27(spark, sf0001))
    val q38Jobs = jobsDuring {
      val df = graft.queries.PipelineQueries.q38(spark, sf0001)
      assert(df.columns.toSeq == Seq("lang", "r", "term", "max_tfidf"))
    }
    assert(q38Jobs <= baseline,
      s"q38 construction ran $q38Jobs jobs vs $baseline for a plain query " +
        "— an eager pre-scan is back")
  }

  test("audit rejects duplicate rule names up front") {
    val d = Seq((1, "a")).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Expectations.audit(d, Seq(
        Expectations.Rule("r", col("x") > 0),
        Expectations.Rule("r", col("y").isNotNull)))
    }
    assert(e.getMessage.contains("duplicate rule names"))
  }

  test("parseObserved reports total and dropped line counts") {
    val body = (1 to 5).map(i => s"$i\t1497717708\tx$i.gz").mkString("\n") +
      "\n# comment\nbadline\n"
    val obs = Observation("manifest")
    val parsed = ManifestParser.parseObserved(
      body.split("\n", -1).toSeq.toDF("value"), obs)
    assert(parsed.count() == 5)
    val m = obs.get
    assert(m("lines_total") == 8L)   // 5 rows + comment + bad + trailing empty
    assert(m("lines_dropped") == 3L)
  }
}
