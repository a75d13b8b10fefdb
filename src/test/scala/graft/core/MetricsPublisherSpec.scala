package graft.core

import graft.SparkSpec
import graft.plans.Scheduler

import scala.concurrent.duration._

class MetricsPublisherSpec extends SparkSpec {

  test("scheduler iteration with one failing source: counters published, gauge gated") {
    val metrics = new Metrics(spark)
    val sink = new InMemoryMetricsSink
    val publisher = new MetricsPublisher(spark, metrics, sink)
    var clock = 1000L
    var srcBFails = true

    val mk: (String, () => Boolean) => (() => Boolean) = (label, body) => () => {
      val ok = body()
      if (!ok) metrics.downloadFailed(label).add(1)
      ok
    }
    Scheduler.loop(
      sources = Seq(
        mk("Maxmind", () => true),
        mk("RouteViewIPv4", () => if (srcBFails) { srcBFails = false; false } else true)),
      iterations = 2,
      onAllSuccess = () => metrics.markAllSuccess(clock),
      onIteration = (_, _) => { publisher.publishNow(); clock += 10 },
      sleep = _ => ())

    val pubs = sink.publications
    assert(pubs.size == 2)
    // iteration 1: RouteViewIPv4 failed → failure counter 1, gauge unset
    val first = pubs.head._2
    assert(first("downloader_download_failed_total{RouteViewIPv4}") == 1L)
    assert(!first.contains("downloader_last_success_time_seconds"))
    // iteration 2: all succeed → gauge set to the iteration's clock, no
    // new failures
    val second = pubs(1)._2
    assert(second("downloader_download_failed_total{RouteViewIPv4}") == 1L)
    assert(second("downloader_last_success_time_seconds") == 1010L)
  }

  test("render emits prometheus exposition with reference metric/label names") {
    val metrics = new Metrics(spark)
    metrics.downloadFailed("RouteViewIPv6").add(2)
    metrics.errorCount("Web Get").add(1)
    metrics.routeviewsUrlError("Couldnt get list").add(1)
    metrics.markAllSuccess(1234567890L)
    val r = metrics.render
    assert(r.contains("downloader_download_failed_total{download_type=\"RouteViewIPv6\"} 2"))
    assert(r.contains("downloader_error_total{source=\"Web Get\"} 1"))
    assert(r.contains(
      "downloader_downloader_routeviews_url_error_total{source=\"Couldnt get list\"} 1"))
    assert(r.contains("downloader_last_success_time_seconds 1234567890"))
  }

  test("executor-side increments aggregate into the published snapshot") {
    val metrics = new Metrics(spark)
    val acc = metrics.errorCount("task-side")
    spark.sparkContext.parallelize(1 to 100, 4).foreach(_ => acc.add(1))
    assert(metrics.snapshot("downloader_error_total{task-side}") == 100L)
  }

  test("listener publishes after every spark job") {
    val metrics = new Metrics(spark)
    val sink = new InMemoryMetricsSink
    val publisher = new MetricsPublisher(spark, metrics, sink).start()
    try {
      val before = sink.publications.size
      spark.range(10).count()
      val deadline = System.currentTimeMillis() + 10000
      while (sink.publications.size <= before && System.currentTimeMillis() < deadline)
        Thread.sleep(50) // listener bus delivers asynchronously
      assert(sink.publications.size > before)
    } finally publisher.stop()
  }

  test("textfile sink writes the exposition atomically at the target path") {
    val metrics = new Metrics(spark)
    metrics.downloadFailed("X").add(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_prom")
    val path = dir.resolve("sub/graft.prom").toString
    new TextFileMetricsSink(path).publish(metrics.render, metrics.snapshot)
    val got = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(got.contains("downloader_download_failed_total{download_type=\"X\"} 1"))
    assert(!java.nio.file.Files.exists(dir.resolve("sub/.graft.prom.tmp")))
  }

  test("render escapes quotes, backslashes and newlines in label values") {
    val metrics = new Metrics(spark)
    metrics.errorCount("bad\"quote\\slash\nline").add(1)
    val r = metrics.render
    assert(r.contains("""downloader_error_total{source="bad\"quote\\slash\nline"} 1"""))
  }

  test("http endpoint serves current exposition at /metrics") {
    val metrics = new Metrics(spark)
    metrics.downloadFailed("RouteViewIPv4").add(3)
    val ep = new MetricsHttpEndpoint(metrics, port = 0).start()
    try {
      def scrape(): String = new String(
        java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${ep.boundPort}/metrics")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray()).body(), "UTF-8")
      assert(scrape().contains(
        "downloader_download_failed_total{download_type=\"RouteViewIPv4\"} 3"))
      metrics.downloadFailed("RouteViewIPv4").add(1)
      assert(scrape().contains(
        "downloader_download_failed_total{download_type=\"RouteViewIPv4\"} 4"),
        "scrape must render CURRENT values, not a snapshot at start()")
    } finally ep.stop()
  }

  test("scheduler sleeps between iterations but not after the last") {
    val sleeps = collection.mutable.ArrayBuffer.empty[FiniteDuration]
    Scheduler.loop(Seq(() => true), 3, sleep = sleeps.append(_),
      rng = new scala.util.Random(0))
    assert(sleeps.length == 2)
  }
}
