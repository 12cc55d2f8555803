package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1_pricing aggregates all flag/status groups with consistent totals") {
    val rows = Analytics.q1Pricing(spark, sf).collect()
    assert(rows.length >= 3)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === filtered)
    rows.foreach { r =>
      // discounting can only reduce price; tax only increases it
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("basket_pairs matches brute-force within-order pair counting") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val support = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).sorted
      for { i <- ps.indices; j <- (i + 1) until ps.length } yield (ps(i), ps(j))
    }
    val expected = pairs.groupBy(identity).toSeq
      .map { case ((a, b), xs) =>
        val nab = xs.length.toLong
        (a, b, nab, support(a), support(b), nab * 1000 / support(a))
      }
      .sortBy { case (a, b, n, _, _, _) => (-n, a, b) }.take(25)
    val got = Analytics.basketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
    // confidence is a permille of the antecedent's support
    got.foreach { case (_, _, nab, na, nb, c) =>
      assert(nab <= na && nab <= nb && c >= 0 && c <= 1000)
    }
  }

  test("q3_shipping returns top-10 sorted by revenue desc") {
    val rows = Analytics.q3Shipping(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5_local joins resolve to existing nations") {
    val rows = Analytics.q5Local(spark, sf).collect()
    assert(rows.nonEmpty)
    val nations = Tables.load(spark, sf, "nation")
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(nations.contains(r.getAs[String]("n_name"))))
  }

  test("q6_forecast matches a hand-rolled recomputation") {
    val row = Analytics.q6Forecast(spark, sf).collect().head
    val n = row.getAs[Long]("n")
    val manual = Tables.load(spark, sf, "lineitem")
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"),
        col("l_discount"), col("l_quantity"))
      .collect().count { r =>
        val sd = r.getAs[String]("sd")
        val d = r.getAs[Double]("l_discount"); val q = r.getAs[Double]("l_quantity")
        sd >= "1997-01-01" && sd < "1998-01-01" && d >= 0.02 && d <= 0.06 && q < 24
      }
    assert(n === manual)
  }

  test("events_window running sum is monotone per user for positive values") {
    val df = Analytics.eventsWindow(spark, sf)
    val bad = df.filter(col("running_value") < 0).count()
    assert(bad === 0)
    assert(df.count() === Tables.events(spark, sf).count())
  }

  test("events_sessions covers every event exactly once") {
    val sessions = Analytics.eventsSessions(spark, sf)
    val totalEvents = sessions.agg(sum("n_events")).collect().head.getLong(0)
    assert(totalEvents === Tables.events(spark, sf).count())
    // durations are non-negative and sessions have >= 1 event
    assert(sessions.filter(col("duration_s") < 0 || col("n_events") < 1).count() === 0)
  }

  test("events_tumbling buckets align to hour boundaries") {
    val df = Analytics.eventsTumbling(spark, sf)
    assert(df.filter(expr("hour_start % 3600 != 0")).count() === 0)
  }
}
