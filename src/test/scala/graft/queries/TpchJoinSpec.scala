package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Plan-shape tests for the TPC-H join suite (q153–q155): the star
  * schema's contract is that DIMENSIONS broadcast and the FACT table
  * shuffles at most for its aggregation — a SortMergeJoin appearing on
  * the fact side at dimension scale means a broadcast threshold or
  * join-order regression the oracle's value compare can't see.
  */
class TpchJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(q: CoreQueries.Q): String =
    q(spark, sf0001).queryExecution.executedPlan.toString

  test("q153: segment + date filters push into the scans") {
    val p = plan(RelationalQueries.q153)
    assert(p.contains("BroadcastHashJoin"), "customer dim must broadcast")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_mktsegment")),
      "segment filter must reach the customer scan")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "ship-date filter must reach the lineitem scan")
  }

  test("q154: all five dimension joins broadcast; no sort-merge on the fact") {
    val p = plan(RelationalQueries.q154)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >= 4 broadcast joins in the star, saw $bhj")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join at dimension scale means a broadcast regression")
  }

  test("q155: returnflag and date filters push down; top-20 is TakeOrdered") {
    val p = plan(RelationalQueries.q155)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_returnflag")),
      "returnflag filter must reach the lineitem scan")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must plan as TakeOrderedAndProject, not a full sort")
  }

  test("q179: the 7-table Q8 star keeps lineitem as the probe of a broadcast cascade") {
    val p = plan(RelationalQueries.q179)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >= 4 broadcast joins in the Q8 star, saw $bhj")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join at dimension scale means a broadcast regression")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate")),
      "order-date window must reach the orders scan")
    // shares are well-formed: numerator never exceeds the market total
    val rows = RelationalQueries.q179(spark, sf0001)
      .select("num", "den", "share_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (num, den, ppm) =>
      assert(num >= 0 && num <= den, s"share numerator outside [0, den]: $num/$den")
      assert(ppm == BigInt(1000000) * num / den, s"ppm $ppm not the exact floor")
    }
  }

  test("q184: the zero-order bucket survives the outer join; buckets cover every customer") {
    val rows = RelationalQueries.q184(spark, sf0001)
      .select("c_count", "custdist")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = graft.core.Tables.load(spark, sf0001, "customer").count()
    assert(rows.map(_._2).sum == nCust, "histogram must cover every customer exactly once")
    val nWithOrders = graft.core.Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").distinct().count()
    val zero = rows.toMap.getOrElse(0L, 0L)
    assert(zero == nCust - nWithOrders,
      s"zero bucket $zero must be exactly the order-less customers (${nCust - nWithOrders})")
  }

  test("q185: the integer cross-multiplied correlation matches a brute-force 0.2*avg recompute") {
    val li = graft.core.Tables.load(spark, sf0001, "lineitem")
      .join(graft.core.Tables.load(spark, sf0001, "part")
        .filter(col("p_brand") === "Brand#4"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val byPart = li.groupBy(_._1)
    val small = li.filter { case (pk, qty, _) =>
      val g = byPart(pk); 5L * g.length * qty < g.map(_._2).sum
    }
    val got = RelationalQueries.q185(spark, sf0001)
      .select("n_small", "rev_cents", "avg_yearly_cents")
      .as[(Long, Long, Long)].head()
    assert(got == ((small.length.toLong, small.map(_._3).sum, small.map(_._3).sum / 7)),
      s"q185 $got diverges from brute force")
  }

  test("q187: shares account for each parent up to floor loss; leaf shares rebuild the hierarchy") {
    val rows = RelationalQueries.q187(spark, sf0001)
      .select("r_name", "n_name", "rev_cents", "share_of_region_ppm", "region_share_ppm")
      .as[(String, String, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (r, ns) =>
      val sum = ns.map(_._4).sum
      assert(sum <= 1000000L && sum > 1000000L - ns.length,
        s"region $r: nation shares sum $sum outside the floor-loss band")
      // every nation in a region reports the SAME region share
      assert(ns.map(_._5).distinct.length == 1, s"region $r: inconsistent region share")
    }
    val regionShares = rows.groupBy(_._1).map(_._2.head._5)
    val total = regionShares.sum
    assert(total <= 1000000L && total > 1000000L - regionShares.size,
      s"region shares sum $total outside the floor-loss band")
    // exactness of one cell against a direct recompute
    val byN = rows.map(r => (r._1, r._2) -> r).toMap
    val (r0, n0) = (rows.head._1, rows.head._2)
    val regionTotal = rows.filter(_._1 == r0).map(_._3).sum
    assert(byN((r0, n0))._4 == 1000000L * byN((r0, n0))._3 / regionTotal,
      "share_of_region_ppm must be the exact floor ratio")
  }

  test("q195: every level conserves total revenue; each parent is exactly the sum of its children") {
    val rows = RelationalQueries.q195(spark, sf0001)
      .select("level", "node", "rev_cents", "n_orders", "n_customers")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byLevel = rows.groupBy(_._1)
    val leafTotal = byLevel(0L).map(_._3).sum
    byLevel.foreach { case (l, ns) =>
      assert(ns.map(_._3).sum == leafTotal, s"level $l loses revenue mass")
      assert(ns.map(_._4).sum == byLevel(0L).map(_._4).sum, s"level $l loses orders") }
    // parent = sum of children, level by level
    (0 until 3).foreach { l =>
      val parents = byLevel((l + 1).toLong).map(r => r._2 -> (r._3, r._4)).toMap
      byLevel(l.toLong).groupBy(_._2 / 10).foreach { case (p, kids) =>
        assert(parents(p) == ((kids.map(_._3).sum, kids.map(_._4).sum)),
          s"level ${l + 1} node $p is not the fold of its level-$l children")
      }
    }
    // distinct-descendant counts: level-0 nodes are single customers
    assert(byLevel(0L).forall(_._5 == 1L), "a leaf rolls up exactly one account")
  }

  test("q201: the OR of band predicates matches a brute-force replay; part disjunction pushes to its scan") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("c"),
        round(col("l_discount") * 100).cast("long").as("disc"))
      .as[(Long, Long, Long, Long)].collect()
    val parts = Tables.load(spark, sf0001, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .as[(Long, String, Int)].collect().map(p => p._1 -> ((p._2, p._3))).toMap
    def hit(pk: Long, q: Long): Boolean = parts.get(pk).exists { case (b, sz) =>
      (b == "Brand#12" && sz >= 1 && sz <= 5 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && sz >= 1 && sz <= 10 && q >= 10 && q <= 20) ||
      (b == "Brand#34" && sz >= 1 && sz <= 15 && q >= 20 && q <= 30)
    }
    val expectN = li.count(r => hit(r._1, r._2)).toLong
    val expectRev = li.filter(r => hit(r._1, r._2)).map(r => r._3 * (100 - r._4)).sum
    val Array((n, rev)) = RelationalQueries.q201(spark, sf0001)
      .as[(Long, Long)].collect()
    assert((n, rev) == ((expectN, expectRev)), s"($n,$rev) vs brute ($expectN,$expectRev)")
    val plan = RelationalQueries.q201(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part side must broadcast")
    assert("PushedFilters: \\[[^\\]]*Or".r.findFirstIn(plan).isDefined,
      "the brand/size disjunction must push to the part scan")
  }

  test("q202: every reported customer beats the exact threshold and never ordered urgent") {
    val cust = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val urgent = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).as[Long].collect().toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val (s0, n0) = (pos.sum, pos.length.toLong)
    val qual = cust.filter(c => c._3 * n0 > s0 && !urgent(c._1))
    val expect = qual.groupBy(_._2).map { case (nk, cs) =>
      (nk, cs.length.toLong, cs.map(_._3).sum) }.toSeq.sortBy(_._1)
    val got = RelationalQueries.q202(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect, s"q202 diverges from brute force")
    val plan = RelationalQueries.q202(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "the never-ordered-urgent side must be an anti join")
    assert(plan.contains("EqualTo(o_orderpriority,1-URGENT)") ||
      plan.contains("1-URGENT"), "the priority filter must reach the orders side")
  }

  /** Build a plan with broadcasts + AQE off: the dimension-scale testdata
    * broadcasts everything, which hides the join algorithm the same plan
    * takes at fact scale — the shape under -1 threshold IS the 100 TB
    * shape (explicit broadcast() hints still win, which is the point:
    * only the dims we CHOSE to broadcast may broadcast). */
  private def scalePlan(q: CoreQueries.Q): String = {
    val conf = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try q(spark, sf0001).queryExecution.executedPlan.toString
    finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
      graft.core.Pins.release()
    }
  }

  test("q157: one pinned fact lineage feeds all three references; semi/anti carry the suppkey residual on the orderkey key") {
    val p = scalePlan(RelationalQueries.q157)
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 3,
      "residual plan must scan only orders+supplier+nation — the three " +
        "lineitem references read the ONE pinned materialization")
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) == 3,
      "all three fact references must read the pinned lineage")
    assert(p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("LeftSemi") && l.contains("NOT")),
      "EXISTS must plan as an orderkey-keyed semi join with the suppkey != residual")
    assert(p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("LeftAnti") && l.contains("NOT")),
      "NOT EXISTS must plan as an orderkey-keyed anti join with the suppkey != residual")
    assert(p.contains("BroadcastHashJoin"),
      "the supplier dim must broadcast (explicit hint) even at -1 threshold")
  }

  test("q158: the one-scan rewrite touches the fact once — one scan, one fact exchange") {
    val p = scalePlan(RelationalQueries.q158)
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 4,
      "exactly lineitem+orders+supplier+nation, each scanned once")
    val factExch = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey"))
    assert(factExch == 1,
      s"the fact must shuffle exactly once (the explicit orderkey " +
        s"repartition feeding groupBy+window+join); saw $factExch")
  }

  test("q162: both role chains broadcast; the fact shuffles on one key; ship-date pushes down") {
    val p = scalePlan(RelationalQueries.q162)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2,
      s"the suppkey→nation and custkey→nation role maps must both broadcast " +
        s"(explicit hints survive -1 threshold); saw $bhj")
    val factExch = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey"))
    assert(factExch == 1,
      s"lineitem must shuffle exactly once (the orders equi-join); saw $factExch")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "ship-date range must reach the lineitem scan")
  }

  test("q157 and q158 return identical results") {
    val a = RelationalQueries.q157(spark, sf0001).collect().toSeq
    val b = RelationalQueries.q158(spark, sf0001).collect().toSeq
    graft.core.Pins.release()
    assert(a.nonEmpty && a == b)
  }

  test("q209: dominance matches a brute-force replay; red-part and date filters push; the final join is LeftSemi") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long").as("q"))
      .as[(Long, Long, Long)].collect()
    val redSet = Tables.load(spark, sf0001, "part")
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      .as[Long].collect().toSet
    val sp = li.filter(r => redSet(r._1)).groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).sum).toMap
    val pTot = sp.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val domSet = sp.collect {
      case ((pk, sk), q) if q * 2 > pTot(pk) => sk }.toSet
    val natSet = Tables.load(spark, sf0001, "nation")
      .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
      .select(col("n_nationkey")).as[Int].collect().toSet
    val expect = Tables.load(spark, sf0001, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .as[(Long, String, Int)].collect()
      .filter(r => natSet(r._3) && domSet(r._1))
      .map(r => (r._1, r._2)).sortBy(_._2).toSeq
    val got = RelationalQueries.q209(spark, sf0001)
      .as[(Long, String)].collect().toSeq
    assert(got == expect, s"dominance replay: $got vs $expect")
    val plan = RelationalQueries.q209(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "the dominant-supplier probe must stay a semi-join")
    assert("PushedFilters: \\[[^\\]]*StringStartsWith\\(p_name,red\\)".r
      .findFirstIn(plan).isDefined, "the red-part prefix must push to the part scan")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      "the ship-date window must push to the fact scan")
  }

  test("q210: ties at the minimum all survive the join-back; real data matches a brute argmin replay") {
    // crafted: two suppliers tied at unit price 100, one above —
    // BOTH tied rows must appear (the max_by/limit-1 failure mode)
    // (qty, price): SupA 10 @ 10.00 -> up 100; SupB 10 @ 20.00 -> 200;
    // SupC 2 @ 30.00 -> 1500
    val li = Seq(
      (1L, 10L, 1L, 1, 10.0, 10.00, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1996-03-01 00:00:00")),
      (2L, 10L, 2L, 1, 10.0, 20.00, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1996-03-02 00:00:00")),
      (3L, 10L, 3L, 1, 2.0, 30.00, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1996-03-03 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
    val part = Seq((10L, "red widget", "Brand#11", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val sup = Seq((1L, "SupA", 0, 5.0), (2L, "SupB", 0, 7.0), (3L, "SupC", 0, 9.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val dir = java.nio.file.Files.createTempDirectory("graft_q2").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    sup.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // unit prices: SupA 1000c/10=100, SupB 2000c/10=200... recompute:
    // extendedprice 10,20,30 -> 1000,2000,3000 cents; qty 10,10,2 ->
    // up = 100, 200, 1500
    val got0 = RelationalQueries.q210(spark, dir)
      .select("s_name", "best_up").as[(String, Long)].collect()
    assert(got0.toSet == Set(("SupA", 100L)), s"single argmin: ${got0.mkString(",")}")
    // force a TIE: SupB's price drops to match SupA's unit price
    val li2 = li.withColumn("l_extendedprice",
      when(col("l_suppkey") === 2L, 10.00).otherwise(col("l_extendedprice")))
    li2.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got1 = RelationalQueries.q210(spark, dir)
      .select("s_name", "best_up").as[(String, Long)].collect()
    assert(got1.toSet == Set(("SupA", 100L), ("SupB", 100L)),
      s"both tied argmins must survive: ${got1.mkString(",")}")
    // real-data brute replay
    val lines = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("c"),
        round(col("l_quantity")).cast("long").as("q"))
      .as[(Long, Long, Long, Long)].collect().filter(_._4 > 0)
    val redSet = Tables.load(spark, sf0001, "part")
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      .as[Long].collect().toSet
    val supUp = lines.filter(r => redSet(r._1)).groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(r => r._3 / r._4).min).toMap
    val best = supUp.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val expect = supUp.collect {
      case ((pk, sk), u) if u == best(pk) => (pk, sk) }.toSet
    val real = RelationalQueries.q210(spark, sf0001)
      .selectExpr("p_partkey", "s_name").as[(Long, String)].collect()
      .map { case (pk, sn) => (pk, sn.drop("Supplier#".length).toLong) }.toSet
    assert(real == expect, s"argmin replay: missing ${(expect -- real).take(3)}, extra ${(real -- expect).take(3)}")
  }

  test("q213: classes partition all customers and revenue; the boundary-crossing customer lands in A; replay agrees") {
    val per = Tables.load(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .as[(Long, Long)].collect().sortBy(r => (-r._2, r._1))
    val tot = per.map(_._2).sum
    var cum = 0L
    val classes = per.map { case (_, rev) =>
      val cls = if (cum * 5 < tot * 4) "A"
        else if (cum * 20 < tot * 19) "B" else "C"
      cum += rev
      (cls, rev)
    }
    val expect = classes.groupBy(_._1).map { case (c0, g) =>
      c0 -> ((g.length.toLong, g.map(_._2).sum)) }
    val got = RelationalQueries.q213(spark, sf0001)
      .select("cls", "n_customers", "rev_cents", "share_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == expect,
      s"class replay: ${got.mkString(",")} vs $expect")
    // partition: counts and revenue must cover everything exactly
    assert(got.map(_._2).sum == per.length.toLong && got.map(_._3).sum == tot)
    // A's revenue crosses 80%: A-share >= 800000 ppm floor, and
    // removing A's LAST (smallest-revenue) member drops below 80%
    val aRev = expect("A")._2
    assert(aRev * 5 >= tot * 4, "class A must reach the 80% mark")
    val aSmallest = classes.filter(_._1 == "A").map(_._2).min
    assert((aRev - aSmallest) * 5 < tot * 4,
      "class A must contain ONLY customers needed to reach 80%")
  }

  test("q218: every reported part beats the exact share threshold; the plan derives the total from the fold, not a second fact scan") {
    val natSet = Tables.load(spark, sf0001, "nation")
      .filter(col("n_name").isin("NATION_2", "NATION_9", "NATION_17"))
      .select(col("n_nationkey")).as[Int].collect().toSet
    val supSet = Tables.load(spark, sf0001, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).as[(Long, Int)].collect()
      .filter(r => natSet(r._2)).map(_._1).toSet
    val per = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .as[(Long, Long, Long)].collect()
      .filter(r => supSet(r._2)).groupBy(_._1)
      .view.mapValues(_.map(_._3).sum).toMap
    val tot = per.values.sum
    val np = per.size.toLong
    val expect = per.filter { case (_, v) => v * np > tot * 2 }
      .toSeq.sortBy { case (pk, v) => (-v, pk) }
    val got = RelationalQueries.q218(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    graft.core.Pins.release()
    assert(got == expect, s"share replay: got ${got.take(3)} vs ${expect.take(3)}")
    // one-fold-two-consumers: the residual plan reads the PIN — zero
    // parquet scans — and the global total never rescans the fact
    val plan = RelationalQueries.q218(spark, sf0001)
      .queryExecution.executedPlan.toString
    graft.core.Pins.release()
    assert(!plan.contains("Scan parquet"),
      "the pinned fold must feed both the group rows and the total")
  }

  test("q220: an order with many late lines counts once; the late test rides the semi's residual; replay agrees") {
    // crafted: order 1 has THREE late lines (counts once), order 2
    // one on-time line, order 3 a line exactly AT the +30 boundary
    // (> is strict -> not late)
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    val ord = Seq(
      (1L, 7L, "O", 10.0, d0("1996-02-01"), "1-URGENT"),
      (2L, 7L, "O", 10.0, d0("1996-02-01"), "1-URGENT"),
      (3L, 7L, "O", 10.0, d0("1996-02-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, d0("1996-03-15")), (1L, d0("1996-04-01")), (1L, d0("1996-05-01")),
      (2L, d0("1996-02-10")),
      (3L, d0("1996-03-02"))) // Feb 1 + 30 = Mar 2 exactly -> NOT late
      .map { case (k, sd) => (k, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("graft_q4").toString
    ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q220(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1-URGENT" -> 1L),
      s"three late lines must count one order; boundary is strict: $got")
    // real-data replay + plan pins
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1996-07-01"))
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(CAST(o_orderdate AS DATE) AS STRING)")
      .as[(Long, String, String)].collect()
    val lines = Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_orderkey", "CAST(CAST(l_shipdate AS DATE) AS STRING)")
      .as[(Long, String)].collect().groupBy(_._1)
    val expect = ords.filter { case (k, _, od) =>
      lines.get(k).exists(_.exists(l =>
        java.time.LocalDate.parse(l._2)
          .isAfter(java.time.LocalDate.parse(od).plusDays(30))))
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val real = RelationalQueries.q220(spark, sf0001).as[(String, Long)].collect().toMap
    assert(real == expect, s"late-order replay: $real vs $expect")
    val plan = RelationalQueries.q220(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS must stay a semi-join")
    assert("LeftSemi[^\\n]*l_shipdate|Join condition[^\\n]*l_shipdate".r
      .findFirstIn(plan).isDefined ||
      plan.linesIterator.exists(l => l.contains("LeftSemi") && l.contains("shipdate")),
      "the late test must ride the semi-join condition")
  }

  test("q222: chain broadcasts + pushed part filter; profit matches a BigDecimal replay") {
    val p = plan(RelationalQueries.q222)
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3, s"part/supplier/nation must broadcast, saw $bhj BHJ")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.toLowerCase.contains("p_name")),
      "the %red% filter must reach the part scan")
    // BigDecimal replay of one (nation, year) cell on sf0.001
    val rows = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "part")
        .filter(col("p_name").contains("red")), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sf0001, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, sf0001, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long"),
        col("l_extendedprice").cast("decimal(15,2)").cast("string"),
        col("l_discount").cast("decimal(6,4)").cast("string"),
        col("p_retailprice").cast("decimal(15,2)").cast("string"),
        col("l_quantity").cast("long"))
      .as[(String, Long, String, String, String, Long)].collect()
    val expect = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map { r =>
      BigDecimal(r._3) * (BigDecimal(1) - BigDecimal(r._4)) -
        BigDecimal(r._5) * BigDecimal(r._6)
    }.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = RelationalQueries.q222(spark, sf0001)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect.toMap, s"profit replay: ${got.size} vs ${expect.size} cells")
    assert(got.keys.map(_._2).toSet.size > 1, "needs multiple order years")
  }

  test("q223: planted promo/non-promo lines hit the exact ppm; single fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q14").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, "PROMO"), (2L, "STANDARD"))
      .toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // promo: 100.00 * (1 - 0.1000) = 90.000000; other: 200.00 * 1 = 200.000000
    Seq((10L, 1L, 1L, 1, 1.0, 100.0, 0.10, 0.0, "N", "O", d0("1997-09-15")),
        (11L, 2L, 1L, 1, 1.0, 200.0, 0.00, 0.0, "N", "O", d0("1997-09-16")),
        (12L, 1L, 1L, 1, 1.0, 999.0, 0.00, 0.0, "N", "O", d0("1997-10-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((pu, tu, ppm)) = RelationalQueries.q223(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(pu == 90000000L && tu == 290000000L,
      s"micro-unit sums: $pu / $tu")
    assert(ppm == 90000000L * 1000000L / 290000000L,
      s"ppm must be the exact floor division: $ppm")
    val p = plan(RelationalQueries.q223)
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 2,
      "exactly one lineitem scan + one part scan")
  }

  test("q224: ALL tied maximisers are reported; residual plan reads the pin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q15").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, "Supplier#1", 1, 0.0), (2L, "Supplier#2", 1, 0.0),
        (3L, "Supplier#3", 1, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // suppliers 1 and 2 tie at 150.000000; supplier 3 trails
    Seq((10L, 1L, 1L, 1, 1.0, 100.0, 0.00, 0.0, "N", "O", d0("1997-02-01")),
        (11L, 1L, 1L, 1, 1.0, 50.0, 0.00, 0.0, "N", "O", d0("1997-02-02")),
        (12L, 1L, 2L, 1, 1.0, 150.0, 0.00, 0.0, "N", "O", d0("1997-03-01")),
        (13L, 1L, 3L, 1, 1.0, 10.0, 0.00, 0.0, "N", "O", d0("1997-03-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q224(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    graft.core.Pins.release()
    assert(got == Seq((1L, "Supplier#1", 150000000L), (2L, "Supplier#2", 150000000L)),
      s"both tied maximisers must report: $got")
    // one-fold-two-consumers: the scalar max re-aggregates the PIN
    val p = plan(RelationalQueries.q224)
    graft.core.Pins.release()
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem")) == 0,
      "the fact fold must feed both consumers through the pin")
  }

  test("q225: arrears suppliers are anti-joined out; distinct pairs, not fact rows, aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q16").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, "S1", 1, 10.0), (2L, "S2", 1, -5.0), (3L, "S3", 1, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "blue bolt", "Brand#1", "STANDARD", 4, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // suppliers 1,2,3 all shipped part 1 (supplier 1 twice - distinct matters)
    Seq((10L, 1L, 1L), (11L, 1L, 1L), (12L, 1L, 2L), (13L, 1L, 3L))
      .map { case (o, pk, sk) =>
        (o, pk, sk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d0("1997-01-01")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q225(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("Brand#1", "STANDARD", 4L, 2L)),
      s"S2 (arrears) must not count; S1 counts once: $got")
    val p = plan(RelationalQueries.q225)
    assert(p.contains("LeftAnti"), "the NOT IN must stay an anti-join")
  }

  test("q226: the quantity fold runs on the fact BEFORE any join; > is strict") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q18").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, 7L, "O", 10.0, d0("1997-01-01"), "1-URGENT"),
        (2L, 8L, "O", 10.0, d0("1997-01-02"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 1 sums to exactly 300 (strict > excludes), order 2 to 301
    Seq((1L, 150.0), (1L, 150.0), (2L, 150.0), (2L, 151.0))
      .map { case (o, q) =>
        (o, 1L, 1L, 1, q, 10.0, 0.0, 0.0, "N", "O", d0("1997-01-01")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q226(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4)) == Seq((8L, 2L, 301L)),
      s"only the 301-qty order survives the strict threshold: $got")
    // the fold-then-filter must sit BELOW the orders join in the plan
    val p = plan(RelationalQueries.q226)
    val aggLine = p.linesIterator.indexWhere(l => l.contains("total_qty"))
    assert(p.contains("total_qty"), "fact pre-fold must exist")
    assert(p.linesIterator.exists(l => l.contains("Filter") || l.contains("(total_qty")),
      "threshold must filter the fold, not a joined row")
  }

  test("q232: every predicate reaches the fact scan; band boundaries are exact decimal") {
    val p = plan(RelationalQueries.q232)
    assert(p.linesIterator.exists(l => l.contains("PushedFilters")
      && l.contains("l_shipdate") && l.contains("l_quantity")),
      "ship-year and quantity-cap must push to the lineitem scan")
    // boundary fixture: 0.05 and 0.07 are IN the band, 0.04/0.08 out,
    // quantity 24 is OUT (strict <)
    val dir = java.nio.file.Files.createTempDirectory("graft_q6").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, 0.05, 10.0), (2L, 0.07, 10.0), (3L, 0.04, 10.0), (4L, 0.08, 10.0),
        (5L, 0.06, 24.0))
      .map { case (o, disc, qty) =>
        (o, 1L, 1L, 1, qty, 100.0, disc, 0.0, "N", "O", d0("1997-06-01")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((n, u6, rev)) = RelationalQueries.q232(spark, dir)
      .as[(Long, Long, Double)].collect()
    // rows 1 and 2 only: 100*0.05 + 100*0.07 = 12.000000
    assert(n == 2L && u6 == 12000000L && rev == 12.0,
      s"band boundary: n=$n u6=$u6 rev=$rev")
  }

  test("q233: one fact-orders join, CASE pair folds map-side; planted matrix is exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q12").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, 7L, "O", 1.0, d0("1997-02-01"), "1-URGENT"),
        (2L, 7L, "O", 1.0, d0("1997-02-01"), "5-LOW"),
        (3L, 7L, "O", 1.0, d0("1997-02-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 1: one late line (urgent/late); order 2: one ontime (low/ontime);
    // order 3: boundary +30 exactly -> ontime (strict >), high/ontime
    Seq((1L, d0("1997-04-01")), (2L, d0("1997-02-10")), (3L, d0("1997-03-03")))
      .map { case (k, sd) => (k, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q233(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("late", 1L, 0L), ("ontime", 1L, 1L)),
      s"planted lateness/priority matrix: $got")
    val p = plan(RelationalQueries.q233)
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 2,
      "exactly one lineitem scan + one orders scan")
    assert(p.linesIterator.exists(l => l.contains("PushedFilters")
      && l.contains("o_orderdate")), "order-year must push to the orders scan")
  }

  test("q244: multi-line orders count a part once; a planted always-together pair hits cos2 = 1e6") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cf").toString
    def d0(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // parts 1,2 co-occur in ALL their orders (cos2 = 1e6); part 3 joins once;
    // order 30 lists part 1 TWICE (distinct must collapse it)
    Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (20L, 3L), (30L, 1L),
        (30L, 1L), (30L, 2L))
      .map { case (o, pk) => (o, pk, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        d0("1997-01-01")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.q244(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.core.Pins.release()
    // (1,2): n_co=3, c1=3, c2=3 -> 9e6/9 = 1e6; (1,3)/(2,3): 1e6/3 = 333333
    assert(got == Seq((1L, 2L, 3L, 3L, 3L, 1000000L),
      (1L, 3L, 1L, 3L, 1L, 333333L), (2L, 3L, 1L, 3L, 1L, 333333L)),
      s"planted cosine geometry: $got")
  }
}
