package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stock relational capabilities the reference delegates to Spark SQL
  * (SURVEY §0, §2.4 A7/A8, §2.5 W2/SO1/TK1): aggregation, equi-joins with
  * broadcast, window functions, top-k, set ops. These stay declarative so
  * Catalyst handles pushdown/pruning/broadcast for free. */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Order-independent 2-dp rounded sum of a double column: a plain
    * `round(sum(double), 2)` depends on aggregation order and can land
    * on a .005 boundary (exactly how `events_sessionize` went hash-red
    * in r5 — this helper applies that fix to the whole class). The
    * per-row double→decimal cast is rounding-mode-independent (a double
    * can never be a tie at scale 10: the 10^-11 halves are not binary
    * fractions), the decimal sum is exact in both engines, and the
    * rounded 2-dp decimal maps to the same nearest double everywhere.
    * DuckDB mirror: `CAST(ROUND(SUM(CAST(x AS DECIMAL(28,10))), 2) AS DOUBLE)`. */
  private def exactRoundedSum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    round(sum(c.cast("decimal(28,10)")), scale).cast("double")

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary: hash aggregate with partial
    // (map-side) aggregation; double aggregates routed through exact
    // decimal so the oracle compare is order-insensitive (see
    // exactRoundedSum; avg = exact decimal sum ÷ count in double, where
    // both engines divide the same exact operands).
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactRoundedSum(col("l_quantity")).as("sum_qty"),
          exactRoundedSum(col("l_extendedprice")).as("sum_base_price"),
          exactRoundedSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          round(sum(col("l_discount").cast("decimal(28,10)")).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    // Multi-way equi-join; `region`/`nation` are tiny → broadcast joins.
    "q3_join_agg" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          exactRoundedSum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
    },
    // Supplier rollup through the region/nation dims (closes the table
    // matrix: every driver-provided table now has an oracle-checked
    // query). Broadcast dim joins + exact decimal balance sums.
    "q5_supplier_stats" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          exactRoundedSum(col("s_acctbal")).as("total_acctbal"),
          round(min(col("s_acctbal")), 2).as("min_acctbal"),
          round(max(col("s_acctbal")), 2).as("max_acctbal"))
    },
    // Top-k: orderBy + limit → Spark plans TakeOrderedAndProject (no full
    // sort shuffle). Deterministic tie-break on the unique key.
    "topk_orders" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    },
    // Window functions over the events stream table: per-user running
    // value sum + event ordinal.
    "window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("running_value",
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
    },
    // Semi/anti joins (J9 in SURVEY — delegated to Spark): customers with
    // and without orders, unioned with a marker.
    "semi_anti_union" -> { (s, dir) =>
      val cust = Tables.customer(s, dir).select(col("c_custkey"))
      val ord = Tables.orders(s, dir).select(col("o_custkey"))
      val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(true))
      val withoutOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(false))
      withOrders.union(withoutOrders)
    },
    // Grouping-sets-style rollup (A8 — stock Spark).
    "rollup_agg" -> { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), exactRoundedSum(col("o_totalprice")).as("total"))
    },
    // Time-bucketed aggregation over events (batch analogue of the
    // streaming windowed agg; ns-vs-us timestamp precision normalized by
    // truncating to the hour in both engines).
    "events_hourly" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), exactRoundedSum(col("value")).as("total_value"))
    },
    // As-of join (the brief's canonical "operator Spark lacks"): each
    // purchase paired with the user's latest click at-or-before it.
    // Spark-first — no custom exec: union both sides tagged, one window
    // pass carries the last click forward (clicks sort before purchases
    // at equal ts_us via the kind column; event_id breaks exact ties).
    // ONE shuffle on user_id, linear scan per partition — at 100 TB this
    // is the sort-merge as-of, no per-row probe or range join needed.
    "events_asof" -> { (s, dir) =>
      val e = Tables.eventsUs(s, dir)
      val u = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), lit(0).as("kind"), col("event_id"))
        .unionAll(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), lit(1).as("kind"), col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("prior",
          last(when(col("kind") === 0, struct(col("ts_us"), col("event_id"))),
            ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          col("prior.event_id").as("click_id"),
          expr("(ts_us - prior.ts_us) div 1000000").as("gap_sec"))
    },
    // Semi-structured extraction: the events `props` column is a JSON
    // document; parse with the codegen'd get_json_object (no UDF) and
    // aggregate exact integers. At 100 TB this is a stateless per-row
    // expression + one partial-aggregated shuffle on event_type.
    "events_props_json" -> { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables.events(s, dir)
        .withColumn("k", k)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
    },
    // First-touch funnel: how far each user progressed through the strict
    // view -> click -> purchase sequence, judged on first-occurrence
    // times. One shuffle on user_id (conditional min aggregation), then a
    // trivially small aggregation on the 4-row stage key — no joins, no
    // per-user event ordering materialized.
    "events_funnel" -> { (s, dir) =>
      Tables.eventsUs(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts_us"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts_us"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts_us"))).as("t_purchase"))
        .withColumn("stage",
          when(col("t_view").isNull, lit(0))
            .when(col("t_click").isNull || col("t_click") <= col("t_view"), lit(1))
            .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), lit(2))
            .otherwise(lit(3)))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"))
    },
    // Weekly retention cohorts: users grouped by first-touch week, the
    // distinct-user count per (cohort, weeks-since-first-touch) cell.
    // Two shuffles: first-touch min per user, then the cohort-cell
    // distinct count — integer µs week arithmetic throughout, so the
    // oracle is exact.
    "events_retention" -> { (s, dir) =>
      val e = Tables.eventsUs(s, dir)
      val first = e.groupBy(col("user_id")).agg(min(col("ts_us")).as("t0"))
      e.join(first, "user_id")
        .select(col("user_id"),
          expr("t0 div 604800000000").as("cohort_week"),
          expr("(ts_us div 604800000000) - (t0 div 604800000000)").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    // Gap-based sessionization: a new session starts after > 8h of
    // per-user inactivity (the fixture's median inter-event gap is ~7.3h).
    // lag + running sum of session starts + one aggregation. Session
    // boundaries are integer µs arithmetic (exact); session_value sums
    // the double `value` column THROUGH decimal(18,6) — a double sum is
    // aggregation-order-dependent (r5's one hash-red row landed a session
    // on a .005 boundary), while decimal sums are exact and
    // order-independent in both Spark and DuckDB. The final cast back to
    // double keeps the published schema; a rounded 2-dp decimal maps to
    // the same nearest double in both engines.
    "events_sessionize" -> { (s, dir) =>
      val e = Tables.eventsUs(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val gapUs = 8L * 3600 * 1000000
      e.withColumn("prev", lag(col("ts_us"), 1).over(w))
        .withColumn("newsess",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L).otherwise(0L))
        .withColumn("sess_idx",
          sum(col("newsess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_idx"))
        .agg(count(lit(1)).as("n_events"),
          expr("(max(ts_us) - min(ts_us)) div 1000000").as("duration_sec"),
          round(sum(col("value").cast("decimal(18,6)")), 2)
            .cast("double").as("session_value"))
    })

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
        | ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_agg" ->
      """SELECT r_name, n_name,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q5_supplier_stats" ->
      """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
        | CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_acctbal,
        | ROUND(MIN(s_acctbal), 2) AS min_acctbal,
        | ROUND(MAX(s_acctbal), 2) AS max_acctbal
        |FROM supplier
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "window_running" ->
      """SELECT event_id, user_id, value,
        | ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        | ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin,
    "semi_anti_union" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        | COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_asof" ->
      """WITH u AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS ts_us, 0 AS kind, event_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_ns(ts)//1000, 1, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |  last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER win AS c_ts,
        |  last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER win AS c_id
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, c_id AS click_id,
        |  (ts_us - c_ts) // 1000000 AS gap_sec
        |FROM w WHERE kind = 1""".stripMargin,
    "events_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
        |  COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_distinct_k
        |FROM events GROUP BY event_type""".stripMargin,
    "events_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts)//1000 END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts)//1000 END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts)//1000 END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT CASE WHEN t_view IS NULL THEN 0
        |            WHEN t_click IS NULL OR t_click <= t_view THEN 1
        |            WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
        |            ELSE 3 END AS stage,
        |  COUNT(*) AS n_users
        |FROM f GROUP BY 1""".stripMargin,
    "events_retention" ->
      """WITH b AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
        |f AS (SELECT user_id, MIN(ts_us) AS t0 FROM b GROUP BY user_id),
        |c AS (SELECT b.user_id,
        |  f.t0 // 604800000000 AS cohort_week,
        |  (b.ts_us // 604800000000) - (f.t0 // 604800000000) AS week_offset
        |  FROM b JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY cohort_week, week_offset""".stripMargin,
    "events_sessionize" ->
      """WITH b AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts)//1000 AS ts_us FROM events),
        |l AS (SELECT *,
        |  lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM b),
        |n AS (SELECT *,
        |  CASE WHEN prev IS NULL OR ts_us - prev > 28800000000::BIGINT THEN 1 ELSE 0 END AS newsess
        |  FROM l),
        |s AS (SELECT *,
        |  SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
        |  FROM n)
        |SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx, COUNT(*) AS n_events,
        |  (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_sec,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sess_idx""".stripMargin)
}
