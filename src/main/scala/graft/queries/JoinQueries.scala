package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Join surface (J1/J2 shapes) + relational aggregates on the TPC-H-ish
  * tables. All money/quantity sums go through exact integer cents. */
object JoinQueries {

  val queries: Map[String, QFn] = Map(
    // J2 shape: capped key set ⋈ full table, key side broadcast — the
    // trace-fetch join (`analyzer.py:1021-1046`), keys ≤ 100 rows
    "j2_key_broadcast_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val keys = ev.orderBy(desc("value"), asc("event_id"))
        .limit(100).select("event_id")
      ev.join(broadcast(keys), Seq("event_id"))
        .select(col("event_id"), col("value")).orderBy("event_id")
    }),

    // J1: left-semi join (mask back-projection shape) on orders
    "j1_semijoin_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val keys = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
      li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("cnt"))
    }),

    // TPC-H Q1 shape: wide aggregate, exact cents arithmetic
    "tpch_q1_pricing" -> ((s, dir) => {
      // Money sums must stay EXACT past long range at 100 TB: per-row
      // products reach ~2e11, so a single long accumulator overflows
      // past ~5e7 rows per group. A decimal(38,0) accumulator is exact
      // but BigDecimal-backed (precision > 18 leaves Spark's compact
      // long representation) — measured ~4× the whole-query cost at
      // sf0.1. Instead each product is split hi = p div 1e6 /
      // lo = p % 1e6 and both halves sum as PLAIN LONGS (fully
      // codegen'd, map-side combined); the exact value is recombined in
      // decimal(38,0) only on the handful of OUTPUT groups. Overflow
      // bounds: hi ≤ 2e5, lo < 1e6 → both half-sums hold to ~1e13 rows
      // per group (~2 PB of lineitem), and the recombined decimal →
      // double cast matches the oracle's hugeint → double conversion
      // bit for bit.
      val SPLIT = 1000000L
      val li = t(s, dir, "lineitem")
        .withColumn("qc", cents(col("l_quantity")))
        .withColumn("epc", cents(col("l_extendedprice")))
        .withColumn("dc", cents(col("l_discount")))
        .withColumn("tc", cents(col("l_tax")))
        .withColumn("pdp", col("epc") * (lit(100L) - col("dc")))
        .withColumn("pcp", col("pdp") * (lit(100L) + col("tc")))
      def halves(c: String) = Seq(
        sum(expr(s"$c div $SPLIT")).as(s"${c}_hi"),
        sum(expr(s"$c % $SPLIT")).as(s"${c}_lo"))
      def exact(c: String) =
        (col(s"${c}_hi").cast("decimal(38,0)") * lit(SPLIT)
          + col(s"${c}_lo")).cast("double")
      val aggs = Seq(sum(col("qc")).as("sq")) ++
        halves("epc") ++ halves("pdp") ++ halves("pcp") ++
        Seq(sum(col("dc")).as("sd"), count(lit(1)).as("count_order"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("sq") / 100.0).as("sum_qty"),
          (exact("epc") / 100.0).as("sum_base_price"),
          (exact("pdp") / 10000.0).as("sum_disc_price"),
          (exact("pcp") / 1000000.0).as("sum_charge"),
          (col("sq") / 100.0 / col("count_order")).as("avg_qty"),
          (exact("epc") / 100.0 / col("count_order")).as("avg_price"),
          (col("sd") / 100.0 / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // 3-way join with small-side broadcast: revenue by market segment
    "tpch_join_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .withColumn("epc", cents(col("l_extendedprice")))
        .withColumn("dc", cents(col("l_discount")))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg((sum((col("epc") * (lit(100L) - col("dc")))
          .cast("decimal(38,0)")).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // Broadcast dimension chain: supplier → nation → region
    "dim_broadcast_chain" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("cnt"))
        .orderBy("r_name")
    }),

    // TPC-H Q5 shape: 6-table join, dims broadcast, facts shuffled,
    // exact-cents revenue per nation
    "tpch_q5_local_supplier" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .withColumn("epc", cents(col("l_extendedprice")))
        .withColumn("dc", cents(col("l_discount")))
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("n_name")
        .agg((sum((col("epc") * (lit(100L) - col("dc")))
          .cast("decimal(38,0)")).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    }),

    // Grouped join: order count and exact total by priority
    "orders_by_priority" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("tpc", cents(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          (sum(col("tpc")) / 100.0).as("total_price"))
        .orderBy("o_orderpriority"))
  )

  val oracle: Map[String, String] = Map(
    "j2_key_broadcast_join" ->
      """SELECT e.event_id AS event_id, e.value AS value FROM events e JOIN (SELECT event_id FROM events ORDER BY value DESC, event_id LIMIT 100) k USING (event_id) ORDER BY event_id""",
    "j1_semijoin_orders" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)",
    "tpch_q1_pricing" ->
      """WITH c AS (SELECT l_returnflag, l_linestatus, CAST(round(l_quantity*100) AS BIGINT) qc, CAST(round(l_extendedprice*100) AS BIGINT) epc, CAST(round(l_discount*100) AS BIGINT) dc, CAST(round(l_tax*100) AS BIGINT) tc FROM lineitem),
        |g AS (SELECT l_returnflag, l_linestatus, CAST(sum(qc) AS BIGINT) sq, CAST(sum(epc) AS DOUBLE) sp, CAST(sum(epc*(100 - dc)) AS DOUBLE) sdp, CAST(sum(epc*(100 - dc)*(100 + tc)) AS DOUBLE) scp, CAST(sum(dc) AS BIGINT) sd, count(*) count_order FROM c GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, sq/100.0 AS sum_qty, sp/100.0 AS sum_base_price, sdp/10000.0 AS sum_disc_price, scp/1000000.0 AS sum_charge, sq/100.0/count_order AS avg_qty, sp/100.0/count_order AS avg_price, sd/100.0/count_order AS avg_disc, count_order FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_join_revenue" ->
      """SELECT c_mktsegment, CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue, count(*) AS n FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey JOIN customer c ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "dim_broadcast_chain" ->
      """SELECT r_name, count(*) AS cnt FROM supplier s JOIN nation n ON s_nationkey = n_nationkey JOIN region r ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name""",
    "tpch_q5_local_supplier" ->
      """SELECT n_name, CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "orders_by_priority" ->
      """SELECT o_orderpriority, count(*) AS cnt, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_price FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
