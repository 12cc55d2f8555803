package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics beyond the reference surface (SURVEY §2
  * #59–60): an as-of join and an ordered-funnel operator over the
  * `events` table.
  *
  * Both are single-shuffle plans: every window/aggregate partitions on
  * `user_id` only, so at 100 TB the one exchange is on the natural
  * high-cardinality key and successive window + groupBy stages reuse
  * the same hash partitioning (no second exchange — PlanSpec asserts
  * this).
  *
  * Oracle-parity: `event_id` is the global time order (TESTDATA events
  * are generated time-sorted), so ordering/frames use `event_id`, never
  * raw ns timestamps; all time arithmetic is integer epoch-second math;
  * "no match" sentinels are COALESCE(-1) on both engines so no nullable
  * integer column reaches the pandas float64 coercion in the compare.
  */
object Sequence {

  /** #59 As-of join, composed from window primitives rather than a
    * custom physical operator: Spark has no ASOF JOIN, but for the
    * "most recent prior event of class X" shape the
    * max-over-preceding-frame formulation is plan-equivalent to a
    * sort-merge as-of (one shuffle + one in-partition sort) and keeps
    * whole-stage codegen. Each `purchase` event is joined to the most
    * recent preceding `click` by the same user; `max` is order-safe
    * because event_id and ts_s are jointly monotone per user. */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_s"))
    val prior = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("click_id",
        max(when(col("event_type") === "click", col("event_id"))).over(prior))
      .withColumn("click_ts_s",
        max(when(col("event_type") === "click", col("ts_s"))).over(prior))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ts_s"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("click_ts_s"), lit(-1L)).as("click_ts_s"),
        coalesce(col("ts_s") - col("click_ts_s"), lit(-1L)).as("wait_s"))
      .orderBy("event_id")
  }

  val eventsAsofSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts)//1000000000 AS ts_s
      |  FROM events
      |), w AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type = 'click' THEN event_id END)
      |      OVER pre AS click_id,
      |    MAX(CASE WHEN event_type = 'click' THEN ts_s END)
      |      OVER pre AS click_ts_s
      |  FROM e
      |  WINDOW pre AS (PARTITION BY user_id ORDER BY event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, ts_s,
      |  COALESCE(click_id, -1) AS click_id,
      |  COALESCE(click_ts_s, -1) AS click_ts_s,
      |  COALESCE(ts_s - click_ts_s, -1) AS wait_s
      |FROM w
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** #60 Ordered funnel view → click → purchase per user: stage k
    * requires an event strictly after the user's stage-(k-1) event.
    * Three whole-partition windows over the same user_id partitioning
    * (the second/third read the previous stage's column, so no
    * self-joins), then a groupBy on the already-partitioned key —
    * one shuffle end to end. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val u = Window.partitionBy("user_id")
    e.withColumn("t1",
        min(when(col("event_type") === "view", col("event_id"))).over(u))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("event_id") > col("t1"),
          col("event_id"))).over(u))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("event_id") > col("t2"),
          col("event_id"))).over(u))
      .groupBy("user_id")
      .agg(
        coalesce(min("t1"), lit(-1L)).as("view_id"),
        coalesce(min("t2"), lit(-1L)).as("click_id"),
        coalesce(min("t3"), lit(-1L)).as("purchase_id"))
      .withColumn("stage",
        when(col("purchase_id") >= 0, 3)
          .when(col("click_id") >= 0, 2)
          .when(col("view_id") >= 0, 1)
          .otherwise(0))
      .orderBy("user_id")
  }

  val eventsFunnelSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type FROM events
      |), w1 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN event_id END)
      |    OVER (PARTITION BY user_id) AS t1 FROM e
      |), w2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND event_id > t1
      |    THEN event_id END) OVER (PARTITION BY user_id) AS t2 FROM w1
      |), w3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND event_id > t2
      |    THEN event_id END) OVER (PARTITION BY user_id) AS t3 FROM w2
      |), g AS (
      |  SELECT user_id,
      |    COALESCE(MIN(t1), -1) AS view_id,
      |    COALESCE(MIN(t2), -1) AS click_id,
      |    COALESCE(MIN(t3), -1) AS purchase_id
      |  FROM w3 GROUP BY user_id
      |)
      |SELECT user_id, view_id, click_id, purchase_id,
      |  CAST(CASE WHEN purchase_id >= 0 THEN 3
      |            WHEN click_id >= 0 THEN 2
      |            WHEN view_id >= 0 THEN 1
      |            ELSE 0 END AS INT) AS stage
      |FROM g
      |ORDER BY user_id""".stripMargin

  /** Range-join window: errors within (0, RangeGapS] seconds after a
    * purchase. */
  val RangeGapS = 300L

  /** #65 Range join, bucketized: a raw `a.ts < b.ts ≤ a.ts + Δ`
    * condition gives Spark no equality key, so it plans a broadcast
    * nested-loop (quadratic per user at scale). Flooring both sides
    * to Δ-wide buckets restores a hash key: an in-range error lands
    * either in its purchase's bucket or the next one, so the probe
    * side explodes ×2 on {bkt, bkt+1}, the join runs on
    * (user_id, bkt) equality, and the exact inequality filters the
    * (≤2×) candidates. One equality shuffle; fan-out is a constant 2
    * regardless of Δ, data volume, or skew. */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_s"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
      .withColumn("bkt", explode(array(
        expr(s"p_ts div $RangeGapS"), expr(s"p_ts div $RangeGapS + 1"))))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts_s").as("e_ts"))
      .withColumn("bkt", expr(s"e_ts div $RangeGapS"))
    purchases.join(errors, Seq("user_id", "bkt"))
      .filter(col("e_ts") > col("p_ts") &&
        col("e_ts") - col("p_ts") <= RangeGapS)
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        (col("e_ts") - col("p_ts")).as("gap_s"))
      .orderBy("purchase_id", "error_id")
  }

  val eventsRangeJoinSql: String =
    s"""WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts)//1000000000 AS ts_s
      |  FROM events
      |)
      |SELECT p.event_id AS purchase_id, x.event_id AS error_id,
      |  p.user_id, x.ts_s - p.ts_s AS gap_s
      |FROM e p JOIN e x
      |  ON p.user_id = x.user_id
      | AND p.event_type = 'purchase' AND x.event_type = 'error'
      | AND x.ts_s > p.ts_s AND x.ts_s - p.ts_s <= $RangeGapS
      |ORDER BY purchase_id, error_id""".stripMargin

  // ---------------------------------------------------------------------
  // #85 events_gap_quantiles — EXACT quantiles by value-histogram
  // selection, never a global sort
  // ---------------------------------------------------------------------

  /** Exact p50/p90/p99 of per-user inter-event gaps, by event type.
    *
    * The naive exact-quantile plan (rank every gap with a window over
    * the event type) sorts ALL rows inside a handful of partitions —
    * the classic skew trap. Here the rank selection runs on the VALUE
    * HISTOGRAM instead: gaps aggregate to (event_type, gap, count)
    * with map-side combine — bounded by the gap value domain, not the
    * row count — and the cumulative walk + quantile pick happen on
    * that tiny frame. Same exact answer (smallest value whose
    * cumulative count reaches ⌈n·p/100⌉, cross-multiplied integer
    * test), 100 TB-safe: the only row-scale shuffle is the per-user
    * lag window on the natural high-cardinality key.
    *
    * This is the discrete-domain exact path; for continuous domains
    * swap the histogram for the KMV-style sketch (#63) and accept the
    * estimate. */
  def eventsGapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_s"))
    val perUser = Window.partitionBy("user_id", "event_type")
      .orderBy("event_id")
    val gaps = e
      .withColumn("prev_ts", lag("ts_s", 1).over(perUser))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"), (col("ts_s") - col("prev_ts")).as("gap"))
    val hist = gaps.groupBy("event_type", "gap")
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum("cnt").over(Window.partitionBy("event_type").orderBy("gap")))
    val n = hist.groupBy("event_type").agg(sum("cnt").as("n"))
    def q(p: Int) =
      min(when(col("cum") * 100 >= col("n") * p, col("gap"))).as(s"p$p")
    cum.join(n, "event_type")
      .groupBy("event_type")
      .agg(max("n").as("n_gaps"), q(50), q(90), q(99))
      .orderBy("event_type")
  }

  val eventsGapQuantilesSql: String =
    s"""WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts)//1000000000 AS ts_s
      |  FROM events
      |), g AS (
      |  SELECT event_type,
      |    ts_s - lag(ts_s) OVER (PARTITION BY user_id, event_type
      |                           ORDER BY event_id) AS gap
      |  FROM e
      |), gg AS (
      |  SELECT event_type, gap FROM g WHERE gap IS NOT NULL
      |), hist AS (
      |  SELECT event_type, gap, COUNT(*) AS cnt FROM gg GROUP BY event_type, gap
      |), cum AS (
      |  SELECT event_type, gap, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap) AS cum
      |  FROM hist
      |), n AS (
      |  SELECT event_type, SUM(cnt) AS n FROM hist GROUP BY event_type
      |)
      |SELECT cum.event_type,
      |  CAST(MAX(n.n) AS BIGINT) AS n_gaps,
      |  MIN(CASE WHEN cum.cum * 100 >= n.n * 50 THEN cum.gap END) AS p50,
      |  MIN(CASE WHEN cum.cum * 100 >= n.n * 90 THEN cum.gap END) AS p90,
      |  MIN(CASE WHEN cum.cum * 100 >= n.n * 99 THEN cum.gap END) AS p99
      |FROM cum JOIN n ON cum.event_type = n.event_type
      |GROUP BY cum.event_type
      |ORDER BY cum.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // #110 events_anomaly — 3σ outliers with exact-moment accumulation
  // ---------------------------------------------------------------------

  /** Per-type 3σ outlier flags with NUMERICALLY DETERMINISTIC
    * moments: value is quantized to integer cents (exact — the
    * corpus is 2-decimal money), the per-type count/Σv/Σv² are
    * EXACT DECIMAL(38,0) sums (order-independent, unlike double
    * accumulation, whose result depends on Spark's partition merge
    * order — the cross-engine/cross-run hazard for any variance
    * test), and doubles appear only in the final comparison
    * (n·v−S)² > 9·(n·Q−S²), derived from identical exact inputs in
    * both engines. The 5-row stats frame broadcasts back; the scan
    * is one pass + one tiny aggregate. Σv² ≤ n·(10^4·v_max)² keeps
    * DECIMAL(38,0) exact past 10^19 rows per type. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(9,2)") * 100).cast("decimal(18,0)").as("v"))
    val stats = e.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,0)")).as("s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("q"))
    val nd = col("n").cast("double")
    val vd = col("v").cast("double")
    val sd = col("s").cast("double")
    val qd = col("q").cast("double")
    val dd = nd * vd - sd
    e.join(broadcast(stats), col("event_type") === col("et"))
      .filter(dd * dd > lit(9.0) * (nd * qd - sd * sd))
      .select(col("event_id"), col("event_type"), col("v").cast("long").as("v_cents"))
      .orderBy("event_id")
  }

  val eventsAnomalySql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS DECIMAL(18,0)) AS v
      |  FROM events
      |), stats AS (
      |  SELECT event_type AS et, COUNT(*) AS n,
      |    SUM(CAST(v AS DECIMAL(38,0))) AS s,
      |    SUM(CAST(v * v AS DECIMAL(38,0))) AS q
      |  FROM e GROUP BY event_type
      |)
      |SELECT event_id, event_type, CAST(v AS BIGINT) AS v_cents
      |FROM e JOIN stats ON event_type = et
      |WHERE (CAST(n AS DOUBLE) * CAST(v AS DOUBLE) - CAST(s AS DOUBLE))
      |    * (CAST(n AS DOUBLE) * CAST(v AS DOUBLE) - CAST(s AS DOUBLE))
      |  > 9.0 * (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
      |           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #115 events_paths — top-k 3-step behavior paths
  // ---------------------------------------------------------------------

  val PathTopK = 20

  /** Most common 3-step event-type paths across users (the Sankey /
    * behavior-flow source): consecutive triples via two lead()
    * windows over each user's event_id order, then one
    * map-side-combined count and a TakeOrderedAndProject cut. One
    * user_id shuffle for the windows + one tiny aggregate — path
    * mining 100 TB of clickstream is the window sort, nothing else.
    * event_id is the total order (jointly monotone with ts per user,
    * and unique — no timestamp ties to disambiguate). */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)
  }

  val eventsPathsSql: String =
    s"""WITH o AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS t2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS t3
      |  FROM events
      |)
      |SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      |FROM o WHERE t3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n DESC, path
      |LIMIT $PathTopK""".stripMargin

  // ---------------------------------------------------------------------
  // #118 events_actives — rolling 7-day distinct actives (DAU/WAU)
  // ---------------------------------------------------------------------

  /** Daily + rolling-7-day distinct active users (DAU / WAU) with a
    * permille stickiness ratio (DAU·1000 div WAU — the product
    * engagement metric, integer on both engines).
    *
    * A COUNT(DISTINCT) over a sliding range frame is unsupported as a
    * window, and the usual emulation — a day×events range self-join —
    * re-scans the fact once per window day. Here the fact first thins
    * to DISTINCT (user, day) pairs: ONE map-side-combined aggregate
    * whose output is bounded by |users|·|days|, not row count — at
    * 100 TB this is the only row-scale shuffle. Each pair then fans
    * out to the ≤7 window-END days it supports (a constant ×7 explode
    * of the already-thinned frame), and a second distinct+count
    * collapses users active on several days of the same window. Days
    * outside the observed corpus vanish in the inner join with the
    * DAU frame. */
  def eventsActives(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_s div 86400").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(6))).as("wday"))
      .distinct()
      .groupBy(col("wday").as("day"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000 div wau").as("stickiness_pm"))
      .orderBy("day")
  }

  val eventsActivesSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |         epoch_ns(ts)//1000000000//86400 AS day
      |  FROM events
      |), dau AS (
      |  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
      |), fan AS (
      |  SELECT DISTINCT user_id, day + off AS wday
      |  FROM ud CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6]) AS off) o
      |), wau AS (
      |  SELECT wday AS day, COUNT(*) AS wau FROM fan GROUP BY wday
      |)
      |SELECT dau.day, dau.dau, wau.wau,
      |  dau.dau * 1000 // wau.wau AS stickiness_pm
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY dau.day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_actives" -> ((s, d) => eventsActives(s, d)),
    "events_paths" -> ((s, d) => eventsPaths(s, d)),
    "events_asof" -> ((s, d) => eventsAsof(s, d)),
    "events_funnel" -> ((s, d) => eventsFunnel(s, d)),
    "events_range_join" -> ((s, d) => eventsRangeJoin(s, d)),
    "events_gap_quantiles" -> ((s, d) => eventsGapQuantiles(s, d)),
    "events_anomaly" -> ((s, d) => eventsAnomaly(s, d)))

  val oracle: Map[String, String] = Map(
    "events_actives" -> eventsActivesSql,
    "events_paths" -> eventsPathsSql,
    "events_asof" -> eventsAsofSql,
    "events_funnel" -> eventsFunnelSql,
    "events_range_join" -> eventsRangeJoinSql,
    "events_gap_quantiles" -> eventsGapQuantilesSql,
    "events_anomaly" -> eventsAnomalySql)
}
