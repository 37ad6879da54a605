package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Relational / changelog / layout extension queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleRelational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ relational (joins etc.)
    "ext_segment_revenue" -> ((s, dir) => Relational.segmentRevenue(s, dir)),
    "ext_status_revenue" -> ((s, dir) => Relational.statusRevenue(s, dir)),
    "ext_top_parts_per_brand" -> ((s, dir) => Relational.topPartsPerBrand(s, dir)),
    "ext_top_lineitems" -> ((s, dir) => Relational.topLineitems(s, dir)),
    "ext_suppliers_per_region" -> ((s, dir) => Relational.suppliersPerRegion(s, dir)),
    "ext_revenue_rollup" -> ((s, dir) => Relational.revenueRollup(s, dir)),
    "ext_lineitem_cube" -> ((s, dir) => Relational.lineitemCube(s, dir)),
    "ext_status_setops" -> ((s, dir) => Relational.statusSetOps(s, dir)),
    "ext_anti_customers" -> ((s, dir) => Relational.customersWithoutOrders(s, dir)),
    "ext_q21_sole_late" -> ((s, dir) => Relational.soleLateSuppliers(s, dir)),
    "ext_q22_idle_rich" -> ((s, dir) => Relational.idleRichCustomers(s, dir)),
    "ext_q15_top_supplier" -> ((s, dir) => Relational.topSupplier(s, dir)),
    "ext_q20_dominant_suppliers" -> ((s, dir) => Relational.dominantSuppliers(s, dir)),
    "ext_semi_customers" -> ((s, dir) => Relational.customersWithOpenOrders(s, dir)),
    "ext_q5_local_revenue" -> ((s, dir) => Relational.localRevenue(s, dir)),
    "ext_q2_min_cost" -> ((s, dir) => Relational.minCostSuppliers(s, dir)),
    "ext_q13_order_counts" -> ((s, dir) => Relational.orderCountHistogram(s, dir)),
    "ext_q14_promo_share" -> ((s, dir) => Relational.promoShare(s, dir)),
    "ext_q19_disjunctive" -> ((s, dir) => Relational.disjunctiveRevenue(s, dir)),
    "ext_q11_important_parts" -> ((s, dir) => Relational.importantParts(s, dir)),
    "ext_q7_volume_shipping" -> ((s, dir) => Relational.volumeShipping(s, dir)),
    "ext_q16_supplier_variety" -> ((s, dir) => Relational.supplierVariety(s, dir)),
    "ext_q9_product_profit" -> ((s, dir) => Relational.productProfit(s, dir)),
    "ext_q8_market_share" -> ((s, dir) => Relational.marketShare(s, dir)),
    "ext_q6_forecast" -> ((s, dir) => Relational.forecastRevenue(s, dir)),
    "ext_q10_returned_items" -> ((s, dir) => Relational.returnedItemRevenue(s, dir)),
    "ext_q12_priority_lines" -> ((s, dir) => Relational.priorityLineCounts(s, dir)),
    "ext_yoy_revenue" -> ((s, dir) => Relational.yoyRevenue(s, dir)),
    "ext_integrity_audit" -> ((s, dir) => Relational.integrityAudit(s, dir)),
    "ext_basket_pairs" -> ((s, dir) => Relational.basketPairs(s, dir)),
    "ext_basket_audit" -> ((s, dir) => Relational.basketAudit(s, dir)),
    "ext_fulfillment_lag" -> ((s, dir) => Relational.fulfillmentLag(s, dir)),
    "ext_weekday_revenue" -> ((s, dir) => Relational.weekdayRevenue(s, dir)),
    "ext_key_skew" -> ((s, dir) => Relational.keySkew(s, dir)),
    "layout_zorder" -> ((s, dir) =>
      graft.engine.ingest.Layout.zorderStats(s, dir)),
    "ext_scd2" -> ((s, dir) => Relational.scd2(s, dir)),
    "ext_q3_unshipped" -> ((s, dir) => Relational.unshippedOrders(s, dir)),
    "ext_q1_pricing" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "ext_q18_large_orders" -> ((s, dir) => Relational.largeOrders(s, dir)),
    "ext_q17_small_qty" -> ((s, dir) => Relational.smallQtyRevenue(s, dir)),
    "ext_q4_late_priorities" -> ((s, dir) => Relational.latePriorities(s, dir)),
    "ext_range_frame_revenue" -> ((s, dir) => Relational.nearbyRevenue(s, dir)),
    "ext_cdc_merge" -> ((s, dir) => Changelog.mergedSnapshot(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "ext_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "ext_status_revenue" ->
      """SELECT o_orderstatus, l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_revenue_c,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus, l_returnflag
        |ORDER BY o_orderstatus, l_returnflag""".stripMargin,

    "ext_top_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, price_c, rank FROM (
        |  SELECT p_brand, p_partkey, p_name,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rank
        |  FROM part)
        |WHERE rank <= 3 ORDER BY p_brand, rank""".stripMargin,

    "ext_top_lineitems" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        |FROM lineitem
        |ORDER BY price_c DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "ext_suppliers_per_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "ext_revenue_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "ext_status_setops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT * FROM (
        |  SELECT 'except_f_minus_o' AS op,
        |         (SELECT count(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM o)) AS n_custkeys
        |  UNION ALL
        |  SELECT 'intersect_f_o',
        |         (SELECT count(*) FROM (SELECT * FROM f INTERSECT SELECT * FROM o))
        |  UNION ALL
        |  SELECT 'union_f_o',
        |         (SELECT count(DISTINCT o_custkey) FROM (SELECT * FROM f UNION ALL SELECT * FROM o))
        |) ORDER BY op""".stripMargin,

    // Co-purchased part pairs, top-20 by distinct containing orders.
    // Baskets above the derived cap (8 * bit-length of order count,
    // floor 8; ScaleKnobs.basketCap) are excluded from pair expansion —
    // the same rule the engine derives, replayed from DuckDB's own
    // count(*). TPC-H baskets hold <= 7 distinct parts, so the filter
    // excludes nothing at any testdata scale.
    "ext_basket_pairs" ->
      """WITH cap AS (
        |  SELECT CASE WHEN c <= 1 THEN 8
        |    ELSE 8 * greatest(1, length(bin(c - 1))) END AS bc
        |  FROM (SELECT count(*)::BIGINT AS c FROM orders)
        |), sz AS (
        |  SELECT l_orderkey AS ok, count(DISTINCT l_partkey) AS sz
        |  FROM lineitem GROUP BY 1
        |), p AS (
        |  SELECT a.l_orderkey AS ok, a.l_partkey AS part_a,
        |    b.l_partkey AS part_b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN sz ON a.l_orderkey = sz.ok
        |  WHERE sz.sz <= (SELECT bc FROM cap)
        |)
        |SELECT part_a, part_b, count(DISTINCT ok)::BIGINT AS n_orders
        |FROM p GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,

    // Basket-size census: what the derived cap excludes (zero at TPC-H
    // geometry — the audit exists to prove it, and to show the excluded
    // C(sz, 2) mass the first time a mega-basket appears at scale).
    "ext_basket_audit" ->
      """WITH cap AS (
        |  SELECT CASE WHEN c <= 1 THEN 8
        |    ELSE 8 * greatest(1, length(bin(c - 1))) END AS bc
        |  FROM (SELECT count(*)::BIGINT AS c FROM orders)
        |), sz AS (
        |  SELECT l_orderkey AS ok, count(DISTINCT l_partkey)::BIGINT AS sz
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT count(*)::BIGINT AS n_baskets,
        |  CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pair_baskets,
        |  max(sz)::BIGINT AS max_basket,
        |  (SELECT bc FROM cap)::BIGINT AS basket_cap,
        |  CAST(sum(CASE WHEN sz > (SELECT bc FROM cap) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_cap,
        |  CAST(sum(CASE WHEN sz > (SELECT bc FROM cap)
        |    THEN sz * (sz - 1) // 2 ELSE 0 END) AS BIGINT)
        |    AS excluded_pair_mass,
        |  CAST(sum(CASE WHEN sz BETWEEN 2 AND (SELECT bc FROM cap)
        |    THEN sz * (sz - 1) // 2 ELSE 0 END) AS BIGINT)
        |    AS kept_pair_mass
        |FROM sz""".stripMargin,

    // One row per declared constraint; healthy tables report zeros.
    "ext_integrity_audit" ->
      """SELECT 'customer_negative_balance' AS check_name,
        |  count(*)::BIGINT AS n_rows,
        |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations,
        |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS violation_ppm
        |FROM customer
        |UNION ALL
        |SELECT 'lineitem_fk_orders', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |       * 1000000 // count(*) AS BIGINT)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'lineitem_qty_domain', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
        |               THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
        |               THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_fk_customer', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |       * 1000000 // count(*) AS BIGINT)
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'orders_pk_unique', CAST(sum(n) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000
        |       // sum(n) AS BIGINT)
        |FROM (SELECT o_orderkey, count(*)::BIGINT AS n
        |      FROM orders GROUP BY 1)
        |ORDER BY check_name""".stripMargin,

    // Monthly revenue with exact (year-1, month) alignment.
    "ext_yoy_revenue" ->
      """WITH mth AS (
        |  SELECT year(o_orderdate)::BIGINT AS y,
        |    month(o_orderdate)::BIGINT AS m, count(*)::BIGINT AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS revenue_c
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT a.y, a.m, a.n_orders, a.revenue_c,
        |  b.revenue_c AS prev_revenue_c,
        |  a.revenue_c - b.revenue_c AS yoy_delta_c
        |FROM mth a LEFT JOIN mth b ON b.y = a.y - 1 AND b.m = a.m
        |ORDER BY a.y, a.m""".stripMargin,

    "ext_lineitem_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "ext_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "ext_semi_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    // ISO day-of-week seasonality, integer cents.
    "ext_weekday_revenue" ->
      """SELECT isodow(o_orderdate)::BIGINT AS dow_iso,
        |  count(*)::BIGINT AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_c
        |FROM orders GROUP BY 1 ORDER BY dow_iso""".stripMargin,

    // Count-of-counts skew census, one block per lineitem join key.
    "ext_key_skew" -> Seq("l_orderkey", "l_partkey", "l_suppkey")
      .map(keySkewOracle)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    // Order-to-ship day lag percentiles off the count-of-counts census.
    "ext_fulfillment_lag" ->
      """WITH f AS (
        |  SELECT o_orderpriority,
        |    datediff('day', o_orderdate::DATE, l_shipdate::DATE)::BIGINT
        |      AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), q AS (
        |  SELECT o_orderpriority, lag_days, count(*)::BIGINT AS cnt
        |  FROM f GROUP BY 1, 2
        |), w AS (
        |  SELECT o_orderpriority, lag_days, cnt,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag_days
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS n_lines,
        |    min(lag_days) OVER (PARTITION BY o_orderpriority) AS min_lag,
        |    max(lag_days) OVER (PARTITION BY o_orderpriority) AS max_lag
        |  FROM q
        |)
        |SELECT o_orderpriority, CAST(n_lines AS BIGINT) AS n_lines,
        |  min_lag,
        |  min(CASE WHEN cum >= (n_lines + 1) // 2 THEN lag_days END)::BIGINT
        |    AS p50_lag,
        |  min(CASE WHEN cum >= (n_lines * 99 + 99) // 100 THEN lag_days
        |      END)::BIGINT AS p99_lag,
        |  max_lag
        |FROM w GROUP BY o_orderpriority, n_lines, min_lag, max_lag
        |ORDER BY o_orderpriority""".stripMargin,

    "layout_zorder" ->
      s"""WITH z AS (
         |  SELECT l_partkey::BIGINT AS x, l_suppkey::BIGINT AS y,
         |    ${graft.engine.ingest.Layout.zValueSql("l_partkey::BIGINT", "l_suppkey::BIGINT")} AS z
         |  FROM lineitem
         |)
         |SELECT z >> 16 AS z_bucket, count(*)::BIGINT AS n_rows,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max,
         |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,

    "ext_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_base_price_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS sum_disc_price_bp,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) *
        |           (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS sum_charge_mp,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Q21 shape: EXISTS (another supplier) + NOT EXISTS (another LATE
    // supplier) on the same fact; one blame row per (order, supplier).
    "ext_q21_sole_late" ->
      """WITH late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |), blamed AS (
        |  SELECT t.l_orderkey, t.l_suppkey FROM late t
        |  WHERE EXISTS (
        |    SELECT 1 FROM lineitem x
        |    WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey != t.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late y
        |    WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey != t.l_suppkey)
        |)
        |SELECT s.s_name, count(*)::BIGINT AS numwait
        |FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name LIMIT 100""".stripMargin,

    // Q22 shape: uncorrelated scalar-subquery average gate (exact, by
    // cross-multiplication) + NOT EXISTS anti join, per-nation census.
    "ext_q22_idle_rich" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        |  FROM customer
        |)
        |SELECT c_nationkey, count(*)::BIGINT AS n_custs,
        |  CAST(sum(bal_c) AS BIGINT) AS total_bal_c
        |FROM c
        |WHERE bal_c * (SELECT count(*) FROM c WHERE bal_c > 0)
        |        > (SELECT sum(bal_c) FROM c WHERE bal_c > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Q15 shape: per-supplier quarterly revenue, rows selected by the
    // scalar-subquery MAX (ties surface; no sort-limit).
    "ext_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |         AS BIGINT) AS total_rev_bp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, r.total_rev_bp
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev_bp = (SELECT max(total_rev_bp) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    // Q20 shape: per-(part, supplier) 1995 quantity, per-part total via a
    // window over the aggregate, exact 20% share gate (qty·5 > total).
    "ext_q20_dominant_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS supp_qty_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2
        |), dom AS (
        |  SELECT l_suppkey, supp_qty_c
        |  FROM (SELECT l_suppkey, supp_qty_c,
        |          sum(supp_qty_c) OVER (PARTITION BY l_partkey) AS part_qty_c
        |        FROM ps)
        |  WHERE supp_qty_c * 5 > part_qty_c
        |)
        |SELECT s.s_suppkey, s.s_name,
        |  count(*)::BIGINT AS n_dominant_parts,
        |  CAST(sum(d.supp_qty_c) AS BIGINT) AS dominant_qty_c
        |FROM dom d JOIN supplier s ON d.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY n_dominant_parts DESC, s.s_suppkey""".stripMargin,

    // Q5 shape: six-table join, supplier constrained to the customer's
    // own nation (the dual-role nation equality).
    "ext_q5_local_revenue" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue_bp DESC, n_name""".stripMargin,

    // Q2 shape: cheapest-offer supplier per STANDARD part among EUROPE
    // suppliers; offer = min lineitem price per (part, supplier).
    "ext_q2_min_cost" ->
      """WITH sup AS (
        |  SELECT s.s_suppkey, s.s_name, n.n_name,
        |    CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |), offers AS (
        |  SELECT p.p_partkey, p.p_brand, p.p_size,
        |    s.s_suppkey, s.s_name, s.n_name, s.acctbal_c,
        |    CAST(min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS min_offer_c
        |  FROM lineitem l
        |  JOIN sup s ON l.l_suppkey = s.s_suppkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'STANDARD'
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7
        |)
        |SELECT acctbal_c, s_name, n_name, p_partkey, p_brand, p_size,
        |       min_offer_c
        |FROM (SELECT *,
        |        min(min_offer_c) OVER (PARTITION BY p_partkey) AS part_min_c
        |      FROM offers)
        |WHERE min_offer_c = part_min_c
        |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // Q13 shape: order-count histogram over ALL customers (zero-order
    // customers included), non-LOW priority orders only.
    "ext_q13_order_counts" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt
        |  FROM orders WHERE o_orderpriority <> '5-LOW' GROUP BY 1
        |)
        |SELECT coalesce(pc.cnt, 0)::BIGINT AS c_count,
        |       count(*)::BIGINT AS custdist
        |FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q14 shape: promo revenue share as exact integer ppm.
    "ext_q14_promo_share" ->
      """WITH m AS (
        |  SELECT (p.p_type = 'PROMO') AS is_promo,
        |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS rev_bp
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-04-01'
        |)
        |SELECT
        |  CAST(sum(CASE WHEN is_promo THEN rev_bp ELSE 0 END) AS BIGINT)
        |    AS promo_rev_bp,
        |  CAST(sum(rev_bp) AS BIGINT) AS total_rev_bp,
        |  -- HUGEINT ppm: the engine computes this through DECIMAL(38,0)
        |  -- for the same reason — a month's revenue-bp sum × 1e6 clears
        |  -- 2^63 at the sf10 fact (r13 finding); values identical
        |  CAST(sum(CASE WHEN is_promo THEN rev_bp ELSE 0 END)::HUGEINT
        |       * 1000000 // sum(rev_bp) AS BIGINT) AS promo_ppm
        |FROM m""".stripMargin,

    // Q19 shape: OR of three (brand, size, qty) conjunction groups.
    "ext_q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // Q7 shape: bilateral nation-pair revenue by flow direction and
    // ship year — the disjunction spans two dimension roles.
    "ext_q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l.l_shipdate)::INT AS l_year,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Q16 shape: distinct suppliers per surviving part class, denylist
    // (negative balance) excluded via anti join.
    "ext_q16_supplier_variety" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q9 shape: product-line (LIKE-pruned) profit by supplier nation
    // and order year.
    "ext_q9_product_profit" ->
      """SELECT n.n_name, year(o.o_orderdate)::INT AS o_year,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,

    // Q8 shape: one nation's share of one region's product-line revenue
    // per order year, exact integer ppm.
    "ext_q8_market_share" ->
      """WITH base AS (
        |  SELECT year(o.o_orderdate)::INT AS o_year, n1.n_name AS supp_nation,
        |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS rev_bp
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE p.p_name LIKE '%gear%'
        |    AND o.o_custkey IN (
        |      SELECT c.c_custkey FROM customer c
        |      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |      JOIN region r ON n2.n_regionkey = r.r_regionkey
        |      WHERE r.r_name = 'ASIA')
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_bp
        |                ELSE 0 END) AS BIGINT) AS nation_rev_bp,
        |  CAST(sum(rev_bp) AS BIGINT) AS total_rev_bp,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_bp
        |                ELSE 0 END)::HUGEINT * 1000000 // sum(rev_bp)
        |    AS BIGINT) AS share_ppm
        |FROM base GROUP BY 1 ORDER BY o_year""".stripMargin,

    // Q11 shape: per-part value from one nation's suppliers, HAVING
    // against a global scalar — kept when value > 2 × the mean part
    // value (exact integer cross-multiplication, scale-stable gate).
    "ext_q11_important_parts" ->
      """WITH pp AS (
        |  SELECT l.l_partkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS value_c
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_3'
        |  GROUP BY 1
        |)
        |SELECT l_partkey AS p_partkey, value_c
        |FROM pp
        |WHERE value_c * (SELECT count(*) FROM pp)
        |      > (SELECT sum(value_c) FROM pp) * 2
        |ORDER BY value_c DESC, p_partkey""".stripMargin,

    // Q6 shape: single-scan range-predicate revenue, discount band in
    // integer cents, no join.
    "ext_q6_forecast" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        |      BETWEEN 5 AND 7""".stripMargin,

    // Q10 shape: returned-item revenue per customer for one quarter,
    // top 20 by revenue cost.
    "ext_q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c,
        |  n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_bp DESC, c_custkey LIMIT 20""".stripMargin,

    // Q12 shape: join + pivoted CASE-WHEN split counts per class
    // (returnflag stands in for the schema's absent shipmode).
    "ext_q12_priority_lines" ->
      """SELECT l.l_returnflag,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "ext_q4_late_priorities" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "ext_range_frame_revenue" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)::INT AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(sum(price_c) OVER w AS BIGINT) AS nearby_revenue_c,
        |  CAST(count(*) OVER w AS BIGINT) AS n_nearby
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "ext_q17_small_qty" ->
      """SELECT count(*) AS n_small_lines,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_c
        |FROM lineitem l
        |WHERE CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * 5 <
        |  (SELECT avg(CAST(floor(i.l_quantity * 100 + 0.5) AS BIGINT))
        |   FROM lineitem i WHERE i.l_partkey = l.l_partkey)""".stripMargin,

    "ext_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_qty_c
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 12000
        |)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_c,
        |  sum_qty_c
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price_c DESC, o_orderkey LIMIT 20""".stripMargin,

    "ext_q3_unshipped" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_bp DESC, l_orderkey LIMIT 10""".stripMargin,

    "ext_scd2" ->
      """WITH o AS (
        |  SELECT c_custkey::BIGINT AS key, c_mktsegment AS old_seg FROM customer
        |), n AS (
        |  SELECT c_custkey::BIGINT AS key,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'NEW-' || c_mktsegment
        |         ELSE c_mktsegment END AS new_seg
        |  FROM customer WHERE c_custkey % 13 != 0
        |), j AS (
        |  SELECT coalesce(o.key, n.key) AS key, old_seg, new_seg
        |  FROM o FULL JOIN n ON o.key = n.key
        |)
        |SELECT key, seg, version, is_current FROM (
        |  SELECT key, old_seg AS seg, 1::BIGINT AS version, false AS is_current
        |  FROM j
        |  WHERE old_seg IS NOT NULL AND (new_seg IS NULL OR new_seg != old_seg)
        |  UNION ALL
        |  SELECT key, old_seg, 1::BIGINT, true FROM j WHERE new_seg = old_seg
        |  UNION ALL
        |  SELECT key, new_seg,
        |    (CASE WHEN old_seg IS NOT NULL THEN 2 ELSE 1 END)::BIGINT, true
        |  FROM j
        |  WHERE new_seg IS NOT NULL AND (old_seg IS NULL OR new_seg != old_seg)
        |) ORDER BY key, version""".stripMargin,

    // CDC latest-wins: the oracle states the ONE-SHOT fold over the full
    // changelog; the engine runs the incremental base+delta merge — their
    // equality (delta LSNs strictly newer under the time split) is the
    // invariant being checked.
    "ext_cdc_merge" -> (eventsE +
      """, c AS (
        |  SELECT event_id, user_id, tsu, event_type, value_c,
        |    CASE WHEN event_id % 13 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM e
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tsu DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM c
        |)
        |SELECT user_id, event_type, value_c, tsu AS last_ts_us,
        |  n_ops::BIGINT AS n_ops
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin),

  )
}
