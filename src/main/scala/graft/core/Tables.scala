package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet fixture tables (TESTDATA.md).
  *
  * Every table is a plain parquet scan; Catalyst pushes projections and
  * filters into the scan (verify with `.explain("formatted")` →
  * `PushedFilters` / `ReadSchema`). At 100 TB these would be
  * partitioned/bucketed catalog tables; the loader is the single seam
  * where that swap happens.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-session RELATION cache (r14, guide §6 file-listing caching):
  // `spark.read.parquet` re-lists the path and re-reads footers for
  // schema inference on EVERY call, and a 300-query bench (or any
  // multi-query session) loads the same ten tables thousands of times —
  // measured ~0.1 s of driver-side construction per query, almost all
  // of it here. The cached value is the analyzed LOGICAL relation
  // (schema + file index), NOT data or results: every action still
  // scans the parquet. The cache key includes the path's modification
  // time (one stat per load, ~µs, vs a full list + footer read), so a
  // REWRITTEN table (overwrite-mode specs, refreshed stores) misses the
  // cache instead of reading a stale file index. WeakHashMap on the
  // session so stopped sessions (each test suite makes one) release
  // their entries.
  private val relationCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = relationCache.synchronized {
      var m = relationCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relationCache.put(spark, m)
      }
      m
    }
    val mtime =
      try {
        val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        path.getFileSystem(spark.sessionState.newHadoopConf())
          .getFileStatus(path).getModificationTime
      } catch { case scala.util.control.NonFatal(_) => -1L }
    perSession.computeIfAbsent(s"$dir/$name@$mtime",
      _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The fixture `events` table stores TIMESTAMP(NANOS) which Spark's
    // parquet reader rejects; read nanos as LONG and rebuild a micros
    // timestamp. Integer `div` — ns epoch values (~1.7e18) overflow the
    // 53-bit double mantissa, so a floating divide would corrupt them.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    normalizeNtz(df)
  }

  /** SURVEY §1.3's "all timestamps normalized to UTC", enforced at the
    * loader seam: any TIMESTAMP_NTZ column (Spark 4 infers it for
    * un-annotated parquet timestamps when
    * `spark.sql.parquet.inferTimestampNTZ.enabled` is true — e.g. in a
    * user session not built via [[Sessions]]) is cast to TIMESTAMP.
    * With the engine's UTC session timezone the micros value is
    * unchanged; only the type is, so `unix_micros`/`window`/watermarks
    * accept it. No-op (same DataFrame reference) when nothing needs
    * casting — the common path adds zero plan nodes.
    */
  def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else ntz.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** Exact row count from parquet FOOTER metadata — the "table
    * statistics" seam: a dimension's cardinality (q245's |catalog|)
    * is catalog metadata, not a query, so reading it must not
    * schedule a Spark job (a per-rep count() job is pure dispatch
    * overhead locally and a needless cluster round-trip at 100 TB,
    * where a real catalog serves the same number from table stats).
    * Falls back to a plain count() for stores without footers. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = path.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        else Seq(fs.getFileStatus(path))
      // a nested/partitioned layout (or files without the .parquet
      // suffix) yields an EMPTY top-level list — that's "no footers
      // visible", not "zero rows": fall back to count() rather than
      // silently returning 0 (q245 divides by this)
      if (files.isEmpty) load(spark, dir, name).count()
      else files.map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    } catch {
      case scala.util.control.NonFatal(_) => load(spark, dir, name).count()
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
