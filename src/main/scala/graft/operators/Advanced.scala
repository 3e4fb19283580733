package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact._

/** Advanced relational operators: grouping sets, as-of join, range
  * join, correlated scalar subquery, HAVING — the remainder of the
  * "operators the reference does NOT implement" checklist
  * (SURVEY.md §2).
  *
  * The as-of and range joins follow the compose-first rule (§7.3):
  * both are expressed with built-in operators in shapes that keep the
  * shuffle bounded — as-of as a union + last-ignoring-nulls window
  * (one shuffle on the key, merge-join-like), range as an equi-join on
  * time buckets with neighbor-bucket expansion (never a nested-loop
  * inequality join).
  */
object Advanced {

  /** GROUPING SETS ((status), (status, priority), ()) over orders. */
  def orderGroupingSets(t: Tables): DataFrame =
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")),
          Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumD2(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** As-of join: each event picks the most recent order of the same
    * key at or before its timestamp (events.user_id = orders.o_custkey).
    *
    * Shape: orders deduped to one per (key, time) -> union both sides
    * tagged -> per-key window carrying the last non-null order payload
    * forward in (time, order-first) order -> keep event rows. One
    * shuffle on the key; state per key is a single struct — the
    * merge-join formulation of ASOF, linear at any scale. */
  def asofOrders(t: Tables): DataFrame = {
    val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = t.orders
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1) // deterministic pick on timestamp ties
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        struct(col("o_orderkey"), col("o_totalprice")).as("ord"),
        lit(0).as("is_event"), lit(null).cast("bigint").as("event_id"))
    val events = t.events.select(col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast(orders.schema("ord").dataType).as("ord"),
      lit(1).as("is_event"), col("event_id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event")) // order first on equal t (<=)
      .rowsBetween(Window.unboundedPreceding, 0)
    orders.unionByName(events)
      .withColumn("asof", last(col("ord"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("asof.o_orderkey").as("o_orderkey"),
        col("asof.o_totalprice").as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Range join: error events within 30 minutes AFTER a purchase by the
    * same user. Bucketized: equi-join on (user, 30-minute bucket) with
    * the purchase side exploded into its own + the next bucket, then
    * the exact range predicate — join fan-out stays bounded by bucket
    * population, no nested-loop inequality join. */
  def purchaseErrorPairs(t: Tables, windowMinutes: Int = 30): DataFrame = {
    val bucketSec = windowMinutes * 60L
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        explode(array(
          (unix_timestamp(col("ts")) / bucketSec).cast("long"),
          (unix_timestamp(col("ts")) / bucketSec).cast("long") + 1))
          .as("bucket"))
    val errors = t.events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts").as("error_ts"),
        (unix_timestamp(col("ts")) / bucketSec).cast("long").as("bucket"))
    purchases.join(errors, Seq("user_id", "bucket"))
      .filter(col("error_ts") >= col("purchase_ts") &&
        col("error_ts") <=
          col("purchase_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        col("purchase_ts"), col("error_ts"))
      .distinct() // a pair can match in two buckets
      .orderBy(col("purchase_id"), col("error_id"))
  }

  /** LEFT OUTER flavor of [[purchaseErrorPairs]]: every purchase
    * appears, with null error columns when no error followed within
    * the window — "which conversions had NO incident" is the question
    * outer range joins answer. The inequality never becomes a
    * nested-loop outer join: the bounded bucketized INNER join runs
    * first, then purchases left-join the matched pairs on the
    * purchase key (an equi-join), preserving outer semantics at
    * equi-join cost. */
  def purchaseErrorPairsOuter(t: Tables,
      windowMinutes: Int = 30): DataFrame = {
    val matched = purchaseErrorPairs(t, windowMinutes)
      .select(col("purchase_id").as("m_pid"), col("error_id"),
        col("error_ts"))
    t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .join(matched, col("purchase_id") === col("m_pid"), "left")
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        col("purchase_ts"), col("error_ts"))
      .orderBy(col("purchase_id"), col("error_id"))
  }

  /** TPC-H Q17 shape: correlated scalar subquery (decorrelated into a
    * broadcast-able per-part aggregate join). */
  def smallQuantityRevenue(t: Tables): DataFrame = {
    val perPart = t.lineitem.groupBy(col("l_partkey").as("pk"))
      .agg((avgD2(col("l_quantity")) * 0.2).as("qty_threshold"))
    val brand = t.part.filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    t.lineitem
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sumD2(col("l_extendedprice")) / 7.0).as("avg_yearly"))

  }

  /** TPC-H Q18 shape: HAVING over a grouped fact table, joined back to
    * dimensions. */
  def largeOrders(t: Tables, minQty: Int = 220): DataFrame = {
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sumD2(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** Typed-Aggregator UDAF surface: discount-weighted mean price per
    * return flag (zero-weight rows excluded so both engines avoid the
    * 0/0 case). Values match the oracle bitwise because the buffer is
    * exact scaled-integer arithmetic (see
    * [[graft.functions.WeightedMean]]). */
  def weightedMeanPrice(t: Tables): DataFrame = {
    val wm = udaf(graft.functions.WeightedMean)
    t.lineitem
      .filter(col("l_discount") > 0)
      .groupBy(col("l_returnflag"))
      .agg(wm(col("l_extendedprice"), col("l_discount"))
        .as("discount_weighted_price"))
      .orderBy(col("l_returnflag"))
  }

  /** ROLLUP over the (year, month) time hierarchy with grouping()
    * indicators — subtotal rows per year and a grand total in one
    * pass (Expand-based, same shuffle as the plain aggregate). */
  def timeRollup(t: Tables): DataFrame =
    t.orders
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        col("o_totalprice"))
      .rollup(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
        grouping(col("yr")).cast("int").as("g_yr"),
        grouping(col("mo")).cast("int").as("g_mo"))
      .select(col("yr").cast("int"), col("mo").cast("int"),
        col("n_orders"), col("revenue"), col("g_yr"), col("g_mo"))
      .orderBy(col("g_yr"), col("g_mo"), col("yr").asc_nulls_first,
        col("mo").asc_nulls_first)

  /** Pivot with MULTIPLE aggregates per pivot value (count + exact
    * sum per event type) — one Expand-free pivot plan producing
    * `{value}_{alias}` columns; the oracle states the same table with
    * FILTERed aggregates. Counts are coalesced to 0 to match SQL
    * count semantics on absent combinations. */
  def pivotMultiAgg(t: Tables): DataFrame =
    t.events
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("view", "purchase"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum"))
      .select(col("day"),
        coalesce(col("view_n"), lit(0L)).as("view_n"),
        col("view_sum").cast("double").as("view_sum"),
        coalesce(col("purchase_n"), lit(0L)).as("purchase_n"),
        col("purchase_sum").cast("double").as("purchase_sum"))
      .orderBy(col("day"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_time_rollup" -> ((s, d) => timeRollup(Tables(s, d))),
    "q115_pivot_multi_agg" -> ((s, d) => pivotMultiAgg(Tables(s, d))),
    "q51_weighted_mean" -> ((s, d) => weightedMeanPrice(Tables(s, d))),
    "q19_grouping_sets" -> ((s, d) => orderGroupingSets(Tables(s, d))),
    "q46_asof_join" -> ((s, d) => asofOrders(Tables(s, d))),
    "q47_range_join" -> ((s, d) => purchaseErrorPairs(Tables(s, d))),
    "q128_outer_range_join" ->
      ((s, d) => purchaseErrorPairsOuter(Tables(s, d))),
    "q48_scalar_subquery" -> ((s, d) => smallQuantityRevenue(Tables(s, d))),
    "q49_having_large_orders" -> ((s, d) => largeOrders(Tables(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q114_time_rollup" -> {
      def d(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         |  CAST(month(o_orderdate) AS INTEGER) AS mo,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  ${d("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")} AS revenue,
         |  CAST(grouping(year(o_orderdate)) AS INTEGER) AS g_yr,
         |  CAST(grouping(month(o_orderdate)) AS INTEGER) AS g_mo
         |FROM orders
         |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
         |ORDER BY g_yr, g_mo, yr NULLS FIRST, mo NULLS FIRST""".stripMargin
    },
    "q115_pivot_multi_agg" -> {
      def d(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
      s"""SELECT CAST(ts AS DATE) AS day,
         |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view_n,
         |  ${d("SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view')")}
         |    AS view_sum,
         |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         |    AS purchase_n,
         |  ${d("SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase')")}
         |    AS purchase_sum
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q51_weighted_mean" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS discount_weighted_price
        |FROM lineitem
        |WHERE l_discount > 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q19_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus),
        |  (o_orderstatus, o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q46_asof_join" ->
      """WITH orders2 AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN orders2 o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q47_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
        |  p.ts AS purchase_ts, e.ts AS error_ts
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        |  AND p.event_type = 'purchase' AND e.event_type = 'error'
        |  AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 30 MINUTE
        |ORDER BY purchase_id, error_id""".stripMargin,
    "q128_outer_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
        |  p.ts AS purchase_ts, e.ts AS error_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        |  AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 30 MINUTE
        |ORDER BY purchase_id, error_id NULLS FIRST""".stripMargin,
    "q48_scalar_subquery" ->
      """SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND l1.l_quantity < (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) * 0.2
        |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q49_having_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 220)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin
  )
}
