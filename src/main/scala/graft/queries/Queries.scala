package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Dsl, Tables}
import graft.functions.{TextOps, VectorOps}
import graft.operators.{CurrentPointer, HashDedup, Watermark}

/** The declared query set Q1–Q18 (SURVEY §2.3) — the t2 correctness
  * contract. Each entry is a Spark DataFrame program plus an equivalent
  * ANSI/DuckDB SQL oracle over the same parquet tables.
  *
  * Determinism rules (SURVEY §7 "hard parts"): total ORDER BY on every
  * query; UTC session timezone; float aggregates routed through exact
  * DECIMAL sums ([[graft.core.Dsl]]) then ROUND(x, 2) (similarities:
  * ROUND(x, 4)); timestamps emitted as epoch microseconds (BIGINT) to
  * dodge parquet physical-unit mismatches.
  */
object CoreQueries {
  import Dsl._
  type Q = (SparkSession, String) => DataFrame

  /** [[Dsl.sum2]] re-exported for the extension query set. */
  def sum2ref(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = sum2(c)

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---------------------------------------------------------------- Q1
  /** Manifest parse: regex projection + comment drop + safe cast
    * (reference `routeviews.go:77,95-106`), modeled over `events.props`. */
  val q01: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("k", regexp_extract(col("props"), """"k": (\d+)""", 1).cast("long"))
      .filter(col("event_type") =!= "error" && col("k").isNotNull)
      .select(col("event_id"), col("k"), col("event_type"))
      .orderBy(col("event_id"))

  val q01Sql: String =
    """SELECT event_id,
      |       TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
      |       event_type
      |FROM events
      |WHERE event_type <> 'error'
      |  AND TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** Incremental watermark filter (`routeviews.go:107`). */
  val q02: Q = (s, d) =>
    Watermark.filterNew(t(s, d, "events"), col("event_id"), 500L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  val q02Sql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events WHERE event_id > 500 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** Gated watermark advance (`routeviews.go:56-62`). */
  val q03: Q = (s, d) =>
    Watermark.gatedAdvance(t(s, d, "events"),
        Seq(col("user_id")), col("event_id"), col("event_type") === "error")
      .orderBy(col("user_id"))

  val q03Sql: String =
    """SELECT user_id,
      |       max(event_id) AS max_seq,
      |       min(CASE WHEN event_type = 'error' THEN event_id END) AS first_failed,
      |       least(max(event_id),
      |             coalesce(min(CASE WHEN event_type = 'error' THEN event_id END) - 1,
      |                      max(event_id))) AS watermark
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Exact hash dedup, self-excluded anti-join semantics
    * (`common.go:162-190`). */
  val q04: Q = (s, d) => {
    val docs = t(s, d, "documents").withColumn("h", md5(col("text")))
    HashDedup.uniques(docs, col("h"), Nil)
      .select(col("doc_id"), col("h"))
      .orderBy(col("doc_id"))
  }

  val q04Sql: String =
    """SELECT a.doc_id, md5(a.text) AS h
      |FROM documents a
      |WHERE NOT EXISTS (SELECT 1 FROM documents b
      |                  WHERE md5(b.text) = md5(a.text) AND b.doc_id <> a.doc_id)
      |ORDER BY a.doc_id""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Within-scope dedup keeping lowest id (`common.go:113-130`,
    * scope regex semantics of `maxmind.go:13`). */
  val q05: Q = (s, d) =>
    HashDedup.keepFirst(t(s, d, "documents"),
        Seq(col("lang")), md5(col("text")), col("doc_id"))
      .orderBy(col("lang"), col("hash"))

  val q05Sql: String =
    """SELECT lang, md5(text) AS hash, min(doc_id) AS keep_id
      |FROM documents GROUP BY lang, md5(text) ORDER BY lang, hash""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** "Current pointer": latest event per user (`common.go:115-122`,
    * `UpdateCurrent.sh:5-10`) via partial-aggregable max_by. */
  val q06: Q = (s, d) => {
    val ev = t(s, d, "events")
    CurrentPointer.latest(ev,
        Seq(col("user_id")),
        Seq(col("ts"), col("event_id")),
        struct(col("event_id"), unix_micros(col("ts")).as("ts_us"),
               col("event_type"), col("value")))
      .select(col("user_id"), col("latest.event_id"), col("latest.ts_us"),
              col("latest.event_type"), col("latest.value"))
      .orderBy(col("user_id"))
  }

  val q06Sql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Top-k (`UpdateCurrent.sh` tail -1 generalization): top-10 users by
    * total value. TakeOrderedAndProject — no global sort at scale. */
  val q07: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(sum2(col("value")).as("total"))
      .orderBy(col("total").desc, col("user_id"))
      .limit(10)

  val q07Sql: String =
    """SELECT user_id,
      |       round(CAST(sum(CAST(value AS DECIMAL(15,2))) AS DOUBLE), 2) AS total
      |FROM events GROUP BY user_id
      |ORDER BY total DESC, user_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Labeled error/metrics counters (`metrics.go:29-52`). */
  val q08: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           sum2(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  val q08Sql: String =
    """SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |       round(CAST(sum(CAST(value AS DECIMAL(15,2))) AS DOUBLE), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Date-partitioned layout derivation, UTC (`downloader.go:64`,
    * `common.go:95-101`). */
  val q09: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"),
               dayofmonth(col("ts")).as("dom"))
      .agg(count(lit(1)).as("n"), sum2(col("value")).as("v"))
      .orderBy(col("y"), col("m"), col("dom"))

  val q09Sql: String =
    """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |       CAST(day(ts) AS INT) AS dom, count(*) AS n,
      |       round(CAST(sum(CAST(value AS DECIMAL(15,2))) AS DOUBLE), 2) AS v
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- Q10
  /** Multi-way equi-join enrichment; dims are broadcast. */
  val q10: Q = (s, d) => {
    val o = t(s, d, "orders"); val c = t(s, d, "customer")
    val n = t(s, d, "nation"); val r = t(s, d, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum2(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  val q10Sql: String =
    """SELECT r_name,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE), 2) AS revenue,
      |       count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // --------------------------------------------------------------- Q11
  /** TPC-H Q1-style pricing summary; exact decimal arithmetic end-to-end
    * so partial/final aggregation order is irrelevant. */
  val q11: Q = (s, d) => {
    val one = lit(1).cast(DecimalType(5, 4))
    val price = dec2(col("l_extendedprice"))
    val discF = one - dec4(col("l_discount"))
    val taxF = one + dec4(col("l_tax"))
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec2(col("l_quantity"))).cast("double"), 2).as("sum_qty"),
        round(sum(price).cast("double"), 2).as("sum_base_price"),
        round(sum(price * discF).cast("double"), 2).as("sum_disc_price"),
        round(sum(price * discF * taxF).cast("double"), 2).as("sum_charge"),
        round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 2).as("avg_qty"),
        round(sum(price).cast("double") / count(lit(1)), 2).as("avg_price"),
        round(sum(dec4(col("l_discount"))).cast("double") / count(lit(1)), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q11Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE), 2) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))
      |      * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE), 2) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))
      |      * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))
      |      * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DOUBLE), 2) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / count(*), 2) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / count(*), 2) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / count(*), 2) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------- Q12
  /** Semi/anti join counts per nation (dedup anti-join generalization,
    * `common.go:183-190`). Anti side derived as total − semi to keep it
    * a single extra aggregation instead of a second join. */
  val q12: Q = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders").select(col("o_custkey"))
    val n = t(s, d, "nation")
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
    val total = c.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    total.join(withO, Seq("c_nationkey"), "left")
      .withColumn("n_with_orders", coalesce(col("n_with_orders"), lit(0L)))
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), col("n_with_orders"),
              (col("n_cust") - col("n_with_orders")).as("n_without"))
      .orderBy(col("n_name"))
  }

  val q12Sql: String =
    """SELECT n_name,
      |  count(*) FILTER (WHERE EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      |  count(*) FILTER (WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------- Q13
  /** Frame-spec window analytics: running revenue + lag per customer. */
  val q13: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(dec2(col("o_totalprice"))).over(wRun).cast("double"), 2).as("running"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q13Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running,
      |  lag(o_totalprice) OVER (PARTITION BY o_custkey
      |                          ORDER BY o_orderdate, o_orderkey) AS prev_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------- Q14
  /** ROLLUP revenue by region/nation. */
  val q14: Q = (s, d) => {
    val o = t(s, d, "orders"); val c = t(s, d, "customer")
    val n = t(s, d, "nation"); val r = t(s, d, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum2(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q14Sql: String =
    """SELECT r_name, n_name,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- Q15
  /** Set operations: EXCEPT and INTERSECT over event audiences. */
  val q15: Q = (s, d) => {
    val ev = t(s, d, "events")
    def ids(et: String) = ev.filter(col("event_type") === et).select(col("user_id"))
    val exceptPart = ids("click").except(ids("purchase"))
      .select(lit("click_not_purchase").as("op"), col("user_id"))
    val intersectPart = ids("view").intersect(ids("click"))
      .select(lit("view_and_click").as("op"), col("user_id"))
    exceptPart.unionByName(intersectPart).orderBy(col("op"), col("user_id"))
  }

  val q15Sql: String =
    """SELECT 'click_not_purchase' AS op, user_id FROM
      |  (SELECT user_id FROM events WHERE event_type = 'click'
      |   EXCEPT
      |   SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'view_and_click' AS op, user_id FROM
      |  (SELECT user_id FROM events WHERE event_type = 'view'
      |   INTERSECT
      |   SELECT user_id FROM events WHERE event_type = 'click')
      |ORDER BY op, user_id""".stripMargin

  // --------------------------------------------------------------- Q16
  /** Text analysis: per-language top-5 terms by frequency. */
  val q16: Q = (s, d) => {
    val wr = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    t(s, d, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(wr).cast("long"))
      .filter(col("r") <= 5)
      .orderBy(col("lang"), col("r"))
  }

  val q16Sql: String =
    """SELECT lang, term, n, r FROM (
      |  SELECT lang, term, n,
      |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS r
      |  FROM (SELECT lang, term, count(*) AS n
      |        FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
      |              FROM documents)
      |        GROUP BY lang, term))
      |WHERE r <= 5 ORDER BY lang, r""".stripMargin

  // --------------------------------------------------------------- Q17
  /** Similarity search: top-5 cosine neighbors of probe vec_id=0. */
  val q17: Q = (s, d) =>
    VectorOps.knnBruteForce(t(s, d, "embeddings"), "vec_id", "embedding", 0L, 5)

  val q17Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |     p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
      |SELECT e.vec_id,
      |       round(list_inner_product(e.v, p.pv)
      |             / (sqrt(list_inner_product(e.v, e.v))
      |                * sqrt(list_inner_product(p.pv, p.pv))), 4) AS sim
      |FROM e, p WHERE e.vec_id <> 0
      |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin

  // --------------------------------------------------------------- Q18
  /** Tumbling 1-hour window counts/sums — the batch-equivalent of the
    * Structured Streaming job in [[graft.streaming.EventStream]]. */
  val q18: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum2(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
              col("n_events"), col("sum_value"))
      .orderBy(col("win_us"), col("event_type"))

  val q18Sql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS win_us, event_type,
      |       count(*) AS n_events,
      |       round(CAST(sum(CAST(value AS DECIMAL(15,2))) AS DOUBLE), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** name → (query, oracle) */
  val entries: Seq[(String, Q, String)] = Seq(
    ("q01_manifest_parse", q01, q01Sql),
    ("q02_watermark_filter", q02, q02Sql),
    ("q03_watermark_advance", q03, q03Sql),
    ("q04_hash_dedup_antijoin", q04, q04Sql),
    ("q05_dedup_keep_first", q05, q05Sql),
    ("q06_latest_per_group", q06, q06Sql),
    ("q07_top_k", q07, q07Sql),
    ("q08_error_metrics", q08, q08Sql),
    ("q09_partitioned_layout", q09, q09Sql),
    ("q10_join_inner_equi", q10, q10Sql),
    ("q11_agg_tpch_pricing", q11, q11Sql),
    ("q12_join_semi_anti", q12, q12Sql),
    ("q13_window_analytic", q13, q13Sql),
    ("q14_rollup", q14, q14Sql),
    ("q15_set_ops", q15, q15Sql),
    ("q16_text_analysis", q16, q16Sql),
    ("q17_similarity_knn", q17, q17Sql),
    ("q18_streaming_tumbling", q18, q18Sql))
}
