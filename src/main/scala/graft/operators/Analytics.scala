package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics headliners (SURVEY §2 #21–27): TPC-H-shaped scans/joins and
  * event-stream window analytics.
  *
  * Oracle-parity rules (SURVEY §5):
  *  - Money inputs are exact 2-decimal values, so we cast them to
  *    DECIMAL *before* any arithmetic; products/sums stay exact in both
  *    engines and the final CAST(… AS DOUBLE) is correctly rounded the
  *    same way (sum·10^scale stays < 2^53 at test SFs). Casting the
  *    *result* of a double multiply to decimal is NOT cross-engine-safe:
  *    products of 2-decimal values routinely land on .xxx5 halfway
  *    points where Spark (shortest-repr, HALF_UP) and DuckDB (exact
  *    binary) round differently.
  *  - No DATE/TIMESTAMP output columns — strings or epoch-second
  *    BIGINTs only.
  *  - events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a ns
  *    LONG (see [[Tables.events]]); all time arithmetic is integer math
  *    on epoch seconds, mirrored with epoch_ns()//1e9 in DuckDB.
  *
  * Scale notes: q1/q6 are scan + partial agg only (map-side combine,
  * one shuffle on a tiny key space). q3/q5 broadcast every dimension;
  * the only big shuffle is lineitem⋈orders on the order key, which AQE
  * skew-splits. Window queries shuffle once on user_id.
  */
object Analytics {

  /** Exact-decimal casts: l_extendedprice < 1.1e5 fits (9,2); rates in
    * [0,1] fit (4,2). Kept tight so Spark's decimal-widening rules
    * never exceed precision 38 (which would trigger lossy rounding). */
  private def money(c: Column): Column = c.cast("decimal(9,2)")
  private def money2(c: Column): Column = c.cast("decimal(12,2)")
  private def rate(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  /** #21 TPC-H Q1 shape: pricing summary report. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val discounted = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discounted).cast("double").as("sum_disc_price"),
        sum(discounted * (one + rate(col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val revenueTerm: Column =
    money(col("l_extendedprice")) * (one - rate(col("l_discount")))
  private val revenueTermSql =
    "CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** #22 TPC-H Q3 shape: top-10 orders by revenue.
    *
    * No forced broadcast hints: customer is O(SF) (fact-sized at SF100),
    * so a hard `broadcast()` would OOM executors at scale. AQE converts
    * the join to broadcast at runtime whenever the filtered side
    * actually fits; otherwise both joins shuffle on their keys.
    * orders⋈customer runs first (smaller shuffle) and the result meets
    * lineitem on the order key. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(revenueTerm).as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
      .select(
        col("l_orderkey"),
        col("rev").cast("double").as("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
  }

  val q3ShippingSql: String =
    s"""SELECT l_orderkey,
      |  CAST(SUM($revenueTermSql) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY SUM($revenueTermSql) DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** #23 TPC-H Q5 shape: revenue by nation within a region+year, with
    * the customer-and-supplier-in-same-nation constraint.
    *
    * Broadcast hints ONLY on the genuinely bounded dims (region = 5
    * rows, nation = 25 rows — O(1), not O(SF)). customer and supplier
    * grow with SF, so their join strategy is left to AQE: at test SF
    * they broadcast at runtime; at SF100 they shuffle instead of
    * OOMing. Join order: customer⋈orders first (pre-lineitem, so the
    * big lineitem shuffle carries only matching orders), then
    * lineitem, then supplier. */
  def q5Local(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(s,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revenueTerm).cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  val q5LocalSql: String =
    s"""SELECT n_name,
      |  CAST(SUM($revenueTermSql) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** #24 TPC-H Q6 shape: selective scan — filter + two-column
    * projection; the parquet scan must show PushedFilters and a pruned
    * ReadSchema. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    l.filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(
        sum(money(col("l_extendedprice")) * rate(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val q6ForecastSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.02 AND l_discount <= 0.06
      |  AND l_quantity < 24""".stripMargin

  /** #25 Window functions: per-user running spend + event sequence
    * number. Single shuffle on user_id; in-partition sort is by the
    * (globally time-ordered) event_id, never by raw ns timestamps. */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("event_id")
    e.select(
        col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(9,2)").as("v"))
      .withColumn("running_value", sum(col("v")).over(w).cast("double"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .drop("v")
      .orderBy("event_id")
  }

  val eventsWindowSql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER w AS DOUBLE) AS running_value,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY event_id""".stripMargin

  /** #26 Event-time tumbling-window aggregation (batch analogue of the
    * streaming agg in graft.streaming). Hour buckets as epoch-second
    * BIGINTs derived with integer math. */
  def eventsTumbling(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(
        (expr("ts_s div 3600") * 3600).as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(9,2)")).cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  val eventsTumblingSql: String =
    """SELECT ((epoch_ns(ts)//1000000000)//3600)*3600 AS hour_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin

  /** #27 Gap-based sessionization (1h inactivity gap). All timestamp
    * arithmetic happens on pre-floored epoch seconds so both engines
    * compare identical integers. */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"),
        col("value").cast("decimal(9,2)").as("v"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    e.withColumn("gap", col("ts_s") - lag("ts_s", 1).over(w))
      .withColumn("is_new", when(col("gap").isNull || col("gap") > 3600, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(w))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum("v").cast("double").as("sum_value"),
        min("ts_s").as("start_s"),
        max("ts_s").as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
      .orderBy("user_id", "session_id")
  }

  val eventsSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts)//1000000000 AS ts_s,
      |         CAST(value AS DECIMAL(9,2)) AS v
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN ts_s - LAG(ts_s) OVER w IS NULL
      |                   OR ts_s - LAG(ts_s) OVER w > 3600 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |), sessions AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value,
      |  MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
      |  MAX(ts_s) - MIN(ts_s) AS duration_s
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Q18 shape: large-order customers — semi-join against a
    * HAVING-filtered aggregate. The aggregate side is tiny after the
    * HAVING cut, so AQE broadcasts the semi-join probe; the only big
    * shuffle is the lineitem groupBy with map-side partial sums. */
  def q18Large(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val big = l.groupBy("l_orderkey")
      .agg(sum(money(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 250)
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("total_qty")).cast("double").as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("sum_qty"))
  }

  val q18LargeSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |         SUM(CAST(l_quantity AS DECIMAL(9,2))) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 250
      |)
      |SELECT c_custkey, c_name, COUNT(*) AS n_orders,
      |       CAST(SUM(total_qty) AS DOUBLE) AS sum_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY sum_qty DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q7 shape: shipping volume between two nation pairs — double
    * dimension resolve on one fact row (supplier nation × customer
    * nation), broadcast dims, one fact shuffle. */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables.load(spark, dir, "supplier")
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        expr("year(l_shipdate)").cast("int").as("ship_year"))
      .agg(sum(revenueTerm).cast("double").as("volume"),
        count(lit(1)).as("n"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  val q7VolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS ship_year,
      |  CAST(SUM($revenueTermSql) AS DOUBLE) AS volume,
      |  COUNT(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin

  /** Q4 shape: order-priority count over an EXISTS semi-join — the
    * schema has no commit/receipt dates, so "late" means a lineitem
    * shipped more than 30 days after the order date. Plan: the orders
    * side is date-pruned first, lineitem is projected to two columns,
    * and the semi-join shuffles on the order key (AQE broadcasts the
    * pruned orders side at small SF); no row from lineitem survives
    * past the probe — exactly what LeftSemi exists for. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1995-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q22 shape: above-average-balance customers who never placed an
    * URGENT order — scalar subquery + NOT EXISTS anti-join (every
    * customer in the synthetic data has SOME order, so the urgency
    * filter keeps the anti-join non-vacuous). The average test is
    * cross-multiplied (bal·cnt > total on exact decimals) so both
    * engines decide it with integer-exact arithmetic instead of a
    * rounded decimal division; the one-row aggregate broadcasts and
    * the anti-join probes orders on the customer key. */
  def q22Global(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    val bal = money2(col("c_acctbal"))
    val avgSide = c.filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("total"), count(lit(1)).as("cnt"))
    c.crossJoin(broadcast(avgSide))
      .filter(bal * col("cnt") > col("total"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(bal).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val q22GlobalSql: String =
    """WITH t AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS total, COUNT(*) AS cnt
      |  FROM customer WHERE c_acctbal > 0
      |)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer c, t
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * t.cnt > t.total
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // #88 events_pivot — wide per-entity feature table via PIVOT
  // ---------------------------------------------------------------------

  /** Known pivot domain, listed EXPLICITLY — never derived: deriving
    * it means a distinct-values job collected to the driver, which is
    * unbounded on a 100 TB column. */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user event-type count matrix — the "wide feature table" move
    * every training pipeline makes before joining features. Spelled
    * as conditional aggregates rather than `.pivot(...)`: with the
    * domain known, `sum(when(...))` is ONE map-side-combined
    * aggregate (one shuffle, PlanSpec-asserted), while Spark's pivot
    * rewrite plans a two-level aggregate (two shuffles) even when the
    * values are given. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val counts = EventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(counts.head, counts.tail: _*)
      .orderBy("user_id")
  }

  val eventsPivotSql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n  ")
    s"""SELECT user_id,
      |  $cols
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #89 q17_smallqty — correlated scalar-aggregate subquery (Q17 shape)
  // ---------------------------------------------------------------------

  /** Q17: revenue from small-quantity orders of one brand's parts —
    * the correlated `l_quantity < 0.2·avg(qty per part)` subquery,
    * decorrelated the way the optimizer should: filter to the brand's
    * lineitems ONCE (broadcast the brand's part keys), compute the
    * per-part (sum, count) on that already-filtered relation, join it
    * back, and compare with the cross-multiplied integer-decimal test
    * `qty·n·5 < sum_qty` (0.2·avg as a division would round IEEE;
    * the cross-multiply is exact in both engines). */
  def q17Smallqty(spark: SparkSession, dir: String): DataFrame = {
    val pk = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
    val lb = Tables.load(spark, dir, "lineitem")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), money(col("l_quantity")).as("qty"),
        money(col("l_extendedprice")).as("price"))
    val perPart = lb.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_qty"))
    lb.join(perPart, "l_partkey")
      .filter(col("qty") * col("n_qty") * 5 < col("sum_qty"))
      .agg(count(lit(1)).as("n_lines"),
        (coalesce(sum(col("price")), lit(0).cast("decimal(9,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
  }

  val q17SmallqtySql: String =
    """WITH lb AS (
      |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(9,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(9,2)) AS price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#1'
      |), pp AS (
      |  SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_qty
      |  FROM lb GROUP BY l_partkey
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(COALESCE(SUM(lb.price), 0) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lb JOIN pp ON lb.l_partkey = pp.l_partkey
      |WHERE lb.qty * pp.n_qty * 5 < pp.sum_qty""".stripMargin

  // ---------------------------------------------------------------------
  // #91 events_retention — cohort retention matrix
  // ---------------------------------------------------------------------

  /** Weekly cohort retention: users bucketed by signup week, activity
    * bucketed by whole weeks since THAT user's signup, distinct-user
    * counts per (cohort_week, week_offset) cell. The per-user anchor
    * join shuffles on user_id (both sides the natural key — no
    * broadcast assumption: at scale the anchor side is every user);
    * pre-signup noise events are filtered BEFORE the division so the
    * week arithmetic never touches the negative domain where the
    * engines' integer divisions disagree. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_s"))
    val signup = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_s").as("su"))
    e.join(signup, "user_id")
      .filter(col("ts_s") >= col("su"))
      .select(expr("su div 604800").as("cohort_week"),
        expr("(ts_s - su) div 604800").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val eventsRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS ts_s FROM events
      |), s AS (
      |  SELECT user_id, MIN(ts_s) AS su FROM e WHERE event_type = 'signup'
      |  GROUP BY user_id
      |)
      |SELECT su // 604800 AS cohort_week,
      |  (ts_s - su) // 604800 AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN s ON e.user_id = s.user_id
      |WHERE ts_s >= su
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // #92–98 round-6c analytics widening: Q8/Q9/Q10/Q13/Q14/Q15/Q19 shapes
  // ---------------------------------------------------------------------

  /** #92 TPC-H Q10 shape: top-20 customers by revenue lost to returns
    * in 1996-H1. Plan: orders is date-pruned at the scan, lineitem is
    * returnflag-filtered before the join, nation (25 rows, O(1))
    * broadcasts; customer is O(SF) so its join is left to AQE. The
    * final top-20 is a TakeOrderedAndProject, never a global sort. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = Tables.load(spark, dir, "nation")
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revenueTerm).as("rev"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"), col("c_acctbal"), col("n_name"))
  }

  val q10ReturnsSql: String =
    s"""SELECT c_custkey, c_name,
      |  CAST(SUM($revenueTermSql) AS DOUBLE) AS revenue, c_acctbal, n_name
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY SUM($revenueTermSql) DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** #93 TPC-H Q13 shape: distribution of per-customer order counts
    * (left join keeps order-less customers as count 0). The schema has
    * no o_comment, so the exclusion predicate is on o_orderpriority.
    * Two shuffles by nature (per-customer count, then histogram);
    * the second key space is tiny so its exchange is trivial. */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select("c_custkey")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** #94 TPC-H Q14 shape: promo revenue share for one ship month.
    * Decimal-exact sums cast to double BEFORE the ratio so both
    * engines divide the identical IEEE values. The conditional sum
    * uses CASE-without-ELSE (nulls ignored by SUM in both engines) to
    * avoid zero-literal decimal-typing differences. */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part").select("p_partkey", "p_type")
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueTerm)).cast("double").as("promo_rev"),
        sum(revenueTerm).cast("double").as("total_rev"))
      .withColumn("promo_share", lit(100.0) * col("promo_rev") / col("total_rev"))
  }

  val q14PromoSql: String =
    s"""SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_share
      |FROM (
      |  SELECT
      |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueTermSql END) AS DOUBLE) AS promo_rev,
      |    CAST(SUM($revenueTermSql) AS DOUBLE) AS total_rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-02-01') t""".stripMargin

  /** #95 TPC-H Q15 shape: the supplier(s) hitting the max quarterly
    * revenue. The max is a 1-row aggregate broadcast back into the
    * per-supplier frame (exact decimal equality — cross-engine-safe,
    * unlike double comparison); supplier joins after the filter so
    * only winners reach it. */
  def q15Topsupp(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey").agg(sum(revenueTerm).as("total"))
    val mx = rev.agg(max("total").as("mx"))
    val s = Tables.load(spark, dir, "supplier")
    rev.join(broadcast(mx), col("total") === col("mx"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total").cast("double").as("total_rev"))
      .orderBy("s_suppkey")
  }

  val q15TopsuppSql: String =
    s"""WITH rev AS (
      |  SELECT l_suppkey, SUM($revenueTermSql) AS total
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total = (SELECT MAX(total) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** #96 TPC-H Q19 shape: OR-of-ANDs over brand/size/quantity. The
    * join predicate itself stays a plain equi-join on partkey; the
    * disjunction is a post-join filter, so Catalyst still plans a
    * hash join (not a nested-loop) and pushes the derivable
    * per-side conjuncts (p_size >= 1, quantity bounds) to the scans. */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    val l = Tables.load(spark, dir, "lineitem")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(coalesce(sum(revenueTerm), lit(0).cast("decimal(14,4)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctSql: String =
    s"""SELECT CAST(COALESCE(SUM($revenueTermSql), 0) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** #97 TPC-H Q8 shape: NATION_3's yearly share of the ASIA ECONOMY
    * market. part is type-filtered before the lineitem join (AQE
    * broadcasts the survivors); nation×2 and region broadcast
    * unconditionally (O(1) dims); customer/supplier joins are left to
    * AQE. Share = double ÷ double of exact decimal sums; a year with
    * no NATION_3 sales yields NULL in both engines. */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nc = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val ns = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("sn_key"))
      .groupBy(expr("year(o_orderdate)").cast("int").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", revenueTerm))
          .cast("double").as("nation_rev"),
        sum(revenueTerm).cast("double").as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy("o_year")
  }

  val q8ShareSql: String =
    s"""SELECT o_year, nation_rev, total_rev, nation_rev / total_rev AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN $revenueTermSql END) AS DOUBLE) AS nation_rev,
      |    CAST(SUM($revenueTermSql) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region ON nc.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  GROUP BY 1) t
      |ORDER BY o_year""".stripMargin

  /** #98 TPC-H Q9 shape: profit by supplier nation × order year for
    * parts named like %red%. The schema has no partsupp, so supply
    * cost is proxied as 10% of p_retailprice per unit — the oracle
    * computes the identical proxy, and every term stays decimal-exact
    * ((9,2)·(9,2)·(4,2) products are well inside precision 38 in both
    * engines) until the final double cast. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), money(col("p_retailprice")).as("unit_price"))
    val s = Tables.load(spark, dir, "supplier")
    val ns = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val l = Tables.load(spark, dir, "lineitem")
    val profit = revenueTerm -
      money(col("l_quantity")) * col("unit_price") * rate(lit(0.10))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("sn_key"))
      .groupBy(col("supp_nation"),
        expr("year(o_orderdate)").cast("int").as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy("supp_nation", "o_year")
  }

  val q9ProfitSql: String =
    s"""SELECT ns.n_name AS supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM($revenueTermSql
      |    - CAST(l_quantity AS DECIMAL(9,2)) * CAST(p_retailprice AS DECIMAL(9,2))
      |      * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2
      |ORDER BY supp_nation, o_year""".stripMargin

  /** #101 Multi-level aggregate in ONE pass: the Q1 pricing summary
    * with ROLLUP over (returnflag, linestatus) — detail rows,
    * per-flag subtotals and the grand total share a single shuffle
    * (Spark expands the grouping sets map-side; no re-aggregation
    * job per level, which is what a hand-written UNION ALL of three
    * GROUP BYs would cost at 100 TB). grouping_id disambiguates the
    * NULL-key subtotal rows from genuine NULL data in both engines
    * (same MSB-first bit encoding). */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val discounted = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(discounted).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q1RollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM($revenueTermSql) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // #104–108 completing the TPC-H shape sweep: Q2/Q11/Q12/Q20/Q21
  // (adapted — the schema has no partsupp/shipmode/receiptdate, so
  // supply cost ⇒ s_acctbal, shipmode classes ⇒ returnflag, late ⇒
  // shipped > 60 days after the order date)
  // ---------------------------------------------------------------------

  /** #104 Q2 shape: per part (size=10), the supplier(s) with the
    * maximum account balance among those that actually shipped it,
    * EUROPE only — the correlated-max decorrelated to a per-part
    * aggregate joined back on exact decimal equality (doubles would
    * be a cross-engine tie hazard). Top-20 by balance. */
  def q2Mincost(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_size") === 10).select("p_partkey")
    val r = Tables.load(spark, dir, "region").filter(col("r_name") === "EUROPE")
    val n = Tables.load(spark, dir, "nation")
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        money(col("s_acctbal")).as("bal"))
    val pairs = Tables.load(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("bal"))
      .distinct()
    val mx = pairs.groupBy(col("p_partkey").as("mk")).agg(max("bal").as("mb"))
    pairs.join(mx, col("p_partkey") === col("mk") && col("bal") === col("mb"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"),
        col("bal").cast("double").as("s_acctbal"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(20)
  }

  val q2MincostSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT p_partkey, s_suppkey, s_name, n_name,
      |    CAST(s_acctbal AS DECIMAL(9,2)) AS bal
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_size = 10 AND r_name = 'EUROPE'
      |), mx AS (
      |  SELECT p_partkey AS mk, MAX(bal) AS mb FROM pairs GROUP BY p_partkey
      |)
      |SELECT p_partkey, s_suppkey, s_name, n_name,
      |  CAST(bal AS DOUBLE) AS s_acctbal
      |FROM pairs JOIN mx ON p_partkey = mk AND bal = mb
      |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
      |LIMIT 20""".stripMargin

  /** #105 Q11 shape: parts whose inventory value (Σ qty·price)
    * exceeds 1/10000 of the corpus total — the scalar-subquery
    * HAVING, decided with cross-multiplied exact decimals (val·10000
    * > total) instead of a rounded fraction. One-row total broadcasts
    * back into the per-part frame. */
  def q11Value(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.load(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(money(col("l_quantity")) * money(col("l_extendedprice"))).as("value"))
    val total = pv.agg(sum("value").as("total"))
    pv.crossJoin(broadcast(total))
      .filter(col("value") * 10000 > col("total"))
      .select(col("l_partkey"), col("value").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11ValueSql: String =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS value
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
      |FROM pv
      |WHERE value * 10000 > (SELECT SUM(value) FROM pv)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** #106 Q12 shape: late-shipment priority accounting — for 1996
    * ship dates more than 60 days after the order date, count
    * critical (1-URGENT/2-HIGH) vs other orders per returnflag (the
    * schema's stand-in for shipmode). The dual conditional counts
    * share one aggregate. */
  def q12Lateship(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate",
      "o_orderpriority")
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12LateshipSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** #107 Q20 shape: suppliers that shipped more than 100 units of
    * %red% parts in 1996 — the nested IN-subquery-with-HAVING,
    * planned as a semi-join against the aggregated inner frame. */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val pk = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%red%")).select("p_partkey")
    val heavy = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(money(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 100)
    Tables.load(spark, dir, "supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val q20ExcessSql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 100)
      |ORDER BY s_suppkey""".stripMargin

  /** #108 Q21 shape: the sole-blame supplier report — suppliers late
    * on multi-supplier orders where NO other supplier was late. The
    * EXISTS + NOT-EXISTS pair collapses to one per-order aggregate
    * (n_supp ≥ 2 ∧ n_late = 1 ⟺ some other supplier exists and none
    * of them was late), so Spark pays one extra join instead of two
    * correlated probes; the oracle spells the same predicate with
    * EXISTS/NOT EXISTS and DuckDB decorrelates it itself. */
  def q21Blame(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val li = Tables.load(spark, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max((col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS"))
        .cast("int")).as("late"))
    // per-order supplier/lateness counts as whole-partition windows:
    // one orderkey shuffle instead of a second aggregate + join-back
    // (two shuffles) — the frame is already one row per (order, supp)
    val w = Window.partitionBy("l_orderkey")
    li.withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("late").over(w))
      .filter(col("late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .join(Tables.load(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  val q21BlameSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_orderkey, l_suppkey
      |)
      |SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late = 1
      |  AND EXISTS (SELECT 1 FROM li l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM li l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.late = 1)
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 20""".stripMargin

  /** #109 Q16 shape: supplier-diversity count per (brand, size) for
    * mid-size parts, excluding blacklisted suppliers (NOT IN — the
    * schema's stand-in for the complaints filter is a negative
    * account balance), completing the 22/22 TPC-H shape sweep. The
    * NOT IN plans as an anti-join BEFORE the distinct-count
    * aggregate; supplier diversity shuffles once on the (brand,
    * size) key space. */
  def q16Partcount(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_size").between(20, 30))
      .select("p_partkey", "p_brand", "p_size")
    val bad = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_key"))
    Tables.load(spark, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val q16PartcountSql: String =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size BETWEEN 20 AND 30
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** #117 Market-basket pair mining (co-occurrence affinity): counts
    * of part pairs bought in the same order, with item supports and a
    * permille confidence P(b|a) = n_ab·1000 div n_a (integer on both
    * engines; lift is consumer-derivable from n_ab/n_a/n_b without
    * risking a BIGINT overflow on the n_ab·n_orders·10^6 product at
    * 100 TB row counts).
    *
    * Candidate generation collapses each order to its sorted distinct
    * part set (ONE fact-scale shuffle, on the natural high-cardinality
    * l_orderkey; collect_set partials combine map-side) and explodes
    * the C(|basket|, 2) ordered pairs from the array — fan-out is
    * Σ|basket|², bounded by the per-order line cap (≤7 lines/order in
    * this schema), NEVER an all-pairs part×part. The self-join
    * formulation would shuffle the fact twice more (its distinct keys
    * on (orderkey, partkey), which doesn't co-locate the orderkey
    * join). A source without a basket-size cap gets one first (the
    * corpus_domain_cap shape) because a single mega-basket fans
    * quadratically. Supports reuse the basket arrays (no second fact
    * scan); the O(|parts|) support frame is unhinted — AQE broadcasts
    * it at bench SF, shuffle join at SF100 (same policy as the
    * customer/supplier dims). Top-k via TakeOrderedAndProject over
    * the (n_ab DESC, part_a, part_b) total order — never a full
    * sort. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .select("parts")
    val support = baskets
      .select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n_i"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(parts, (a, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |            b -> struct(a AS part_a, b AS part_b))))""".stripMargin))
        .as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(support.select(col("l_partkey").as("part_a"), col("n_i").as("n_a")), "part_a")
      .join(support.select(col("l_partkey").as("part_b"), col("n_i").as("n_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr("n_ab * 1000 div n_a").as("conf_pm"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(25)
  }

  val basketPairsSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), support AS (
      |  SELECT l_partkey, COUNT(*) AS n_i FROM li GROUP BY 1
      |), pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |         COUNT(*) AS n_ab
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |)
      |SELECT part_a, part_b, n_ab, sa.n_i AS n_a, sb.n_i AS n_b,
      |  n_ab * 1000 // sa.n_i AS conf_pm
      |FROM pairs
      |JOIN support sa ON sa.l_partkey = part_a
      |JOIN support sb ON sb.l_partkey = part_b
      |ORDER BY n_ab DESC, part_a, part_b
      |LIMIT 25""".stripMargin

  /** #116 RFM customer segmentation: recency (days since last order,
    * integer date math against the corpus max — no wall clock, so
    * the result is reproducible), frequency (order count), monetary
    * (exact decimal spend), each cut into quartiles over a TOTAL
    * order (metric, custkey — a partial order would let the two
    * engines tile ties differently).
    *
    * The quartiles are deliberately NOT `ntile(4).over(Window
    * .orderBy(...))` — an un-partitioned window is a single-task
    * global sort (the trap this library avoids everywhere). Each
    * metric instead goes through [[Skew.globalRank]] (range-
    * repartitioned parallel rank + broadcast partition offsets) and
    * [[Skew.ntileOfRank]], whose integer algebra reproduces SQL
    * NTILE bit-for-bit — which the DuckDB oracle, written with real
    * NTILE, then PROVES. The 1-row max-date and n-row count
    * subqueries broadcast. */
  def customersRfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val maxd = o.agg(max("o_orderdate").as("maxd"))
    // per is materialized once (Checkpoints.pin, eager): it feeds both
    // the row-count scalar and the 3-stage rank chain, and each
    // globalRank stage checkpoints its own ranged frame — so the three
    // range-boundary sampling passes read fixed blocks instead of
    // re-executing the growing lineage (~6 recomputes for 3 sorts
    // before). The frames are slim (customer-cardinality, 6 narrow
    // columns), so materializing them is cheap at any SF. (Plain
    // persist() is NOT safe here: it defeats exchange reuse inside
    // globalRank and the duplicated range exchanges can sample
    // divergent boundaries — see Skew.globalRank.)
    val per = graft.Checkpoints.pin(o.groupBy("o_custkey")
      .agg(
        max("o_orderdate").as("lastd"),
        count(lit(1)).as("f_cnt"),
        sum(money2(col("o_totalprice"))).as("m_total"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey"),
        expr("datediff(maxd, lastd)").cast("long").as("r_days"),
        col("f_cnt"), col("m_total")))
    val n = per.agg(count(lit(1)).as("__total"))
    def tiled(df: DataFrame, tileName: String, sort: Column*): DataFrame =
      Skew.globalRank(df, 8, sort: _*)
        .crossJoin(broadcast(n))
        .withColumn(tileName, Skew.ntileOfRank(col("rank"), col("__total"), 4))
        .drop("rank", "__total")
    val r1 = tiled(per, "r_tile", col("r_days"), col("o_custkey"))
    val r2 = tiled(r1, "f_tile", col("f_cnt").desc, col("o_custkey"))
    val r3 = tiled(r2, "m_tile", col("m_total").desc, col("o_custkey"))
    r3.select(col("o_custkey"), col("r_days"), col("f_cnt"),
        col("m_total").cast("double").as("m_total"),
        col("r_tile"), col("f_tile"), col("m_tile"))
      .orderBy("o_custkey")
  }

  val customersRfmSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    MAX(o_orderdate) AS lastd,
      |    COUNT(*) AS f_cnt,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS m_total
      |  FROM orders GROUP BY o_custkey
      |), r AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', lastd, (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT) AS r_days,
      |    f_cnt, m_total
      |  FROM per
      |)
      |SELECT o_custkey, r_days, f_cnt, CAST(m_total AS DOUBLE) AS m_total,
      |  CAST(NTILE(4) OVER (ORDER BY r_days, o_custkey) AS INT) AS r_tile,
      |  CAST(NTILE(4) OVER (ORDER BY f_cnt DESC, o_custkey) AS INT) AS f_tile,
      |  CAST(NTILE(4) OVER (ORDER BY m_total DESC, o_custkey) AS INT) AS m_tile
      |FROM r
      |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basket_pairs" -> basketPairs,
    "events_pivot" -> eventsPivot,
    "events_retention" -> eventsRetention,
    "q17_smallqty" -> q17Smallqty,
    "q10_returns" -> q10Returns,
    "q1_rollup" -> q1Rollup,
    "q2_mincost" -> q2Mincost,
    "customers_rfm" -> customersRfm,
    "q16_partcount" -> q16Partcount,
    "q11_value" -> q11Value,
    "q12_lateship" -> q12Lateship,
    "q20_excess" -> q20Excess,
    "q21_blame" -> q21Blame,
    "q13_custdist" -> q13Custdist,
    "q14_promo" -> q14Promo,
    "q15_topsupp" -> q15Topsupp,
    "q19_disjunct" -> q19Disjunct,
    "q8_share" -> q8Share,
    "q9_profit" -> q9Profit,
    "q1_pricing" -> q1Pricing,
    "q3_shipping" -> q3Shipping,
    "q5_local" -> q5Local,
    "q6_forecast" -> q6Forecast,
    "events_window" -> eventsWindow,
    "events_tumbling" -> eventsTumbling,
    "events_sessions" -> eventsSessions,
    "q18_large" -> q18Large,
    "q7_volume" -> q7Volume,
    "q4_priority" -> q4Priority,
    "q22_global" -> q22Global)

  val oracle: Map[String, String] = Map(
    "basket_pairs" -> basketPairsSql,
    "events_pivot" -> eventsPivotSql,
    "events_retention" -> eventsRetentionSql,
    "q17_smallqty" -> q17SmallqtySql,
    "q10_returns" -> q10ReturnsSql,
    "q1_rollup" -> q1RollupSql,
    "q2_mincost" -> q2MincostSql,
    "customers_rfm" -> customersRfmSql,
    "q16_partcount" -> q16PartcountSql,
    "q11_value" -> q11ValueSql,
    "q12_lateship" -> q12LateshipSql,
    "q20_excess" -> q20ExcessSql,
    "q21_blame" -> q21BlameSql,
    "q13_custdist" -> q13CustdistSql,
    "q14_promo" -> q14PromoSql,
    "q15_topsupp" -> q15TopsuppSql,
    "q19_disjunct" -> q19DisjunctSql,
    "q8_share" -> q8ShareSql,
    "q9_profit" -> q9ProfitSql,
    "q1_pricing" -> q1PricingSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local" -> q5LocalSql,
    "q6_forecast" -> q6ForecastSql,
    "events_window" -> eventsWindowSql,
    "events_tumbling" -> eventsTumblingSql,
    "events_sessions" -> eventsSessionsSql,
    "q18_large" -> q18LargeSql,
    "q7_volume" -> q7VolumeSql,
    "q4_priority" -> q4PrioritySql,
    "q22_global" -> q22GlobalSql)
}
