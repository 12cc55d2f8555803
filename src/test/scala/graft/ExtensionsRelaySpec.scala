package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL extension registration + flagship relay composition. */
class ExtensionsRelaySpec extends AnyFunSuite {

  /** getOrCreate would hand back the shared extension-less test
    * session; clear the active/default slots so the builder constructs
    * a fresh session (same SparkContext) with GraftExtensions applied,
    * then restore the shared one for other suites. */
  private lazy val spark: SparkSession = SparkSpec.synchronized {
    val prior = SparkSpec.session // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.setDefaultSession(prior)
    SparkSession.setActiveSession(prior)
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("SQL functions are registered and composable in pure SQL") {
    val out = spark.sql(
      """SELECT cast(x.m as string) AS m
        |FROM (SELECT explode(graft_frames(cast('5 hello6 world!' AS BINARY))) AS m) x
        |ORDER BY m""".stripMargin).collect().map(_.getString(0))
    assert(out.toSeq === Seq("hello", "world!"))
  }

  test("SQL gzip/decompress round-trip") {
    val r = spark.sql(
      "SELECT cast(graft_decompress(graft_gzip(cast('spool' AS BINARY))) AS string)")
      .collect().head.getString(0)
    assert(r === "spool")
  }

  test("SQL gelf chunk parse") {
    val r = spark.sql(
      """SELECT c.id, c.seq, c.total, cast(c.payload as string) AS p
        |FROM (SELECT graft_gelf_chunk(unhex('1E0F000000000000002A0103') || cast('xyz' as binary)) AS c)""".stripMargin)
      .collect().head
    assert(r.getLong(0) === 42L)
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 3)
    assert(r.getString(3) === "xyz")
  }

  test("SQL vector kernels: dot, norm, hyperplane code") {
    val r = spark.sql(
      """SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |       graft_norm_sq(array(3L, 4L)) AS n,
        |       graft_hyperplane_code(array(1000L, -2000L, 500L, 0L), 4) AS c"""
        .stripMargin).collect().head
    assert(r.getLong(0) === 32L)
    assert(r.getLong(1) === 25L)
    // code value: deterministic, within the 4-plane range
    assert(r.getInt(2) >= 0 && r.getInt(2) < 16)
  }

  test("band join is auto-rewritten to a bucketized hash join with identical results") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts_s"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts_s").as("pts"))
    val x = e.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("ts_s").as("ets"))
    // the NATURAL band join — no equality key anywhere
    val joined = p.join(x,
        col("ets") > col("pts") && col("ets") - col("pts") <= lit(3600L))
      .orderBy("pid", "eid")
    joined.collect() // settle AQE
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val events = e.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = for {
      (pid, t1, pts) <- events if t1 == "purchase"
      (eid, t2, ets) <- events if t2 == "error" && ets > pts && ets - pts <= 3600L
    } yield (pid, eid)
    val got = joined.select("pid", "eid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === expected.sorted.toSeq)
    assert(got.nonEmpty)
  }

  test("TopKPerKey plans through the injected strategy (no self-registration)") {
    // this session got TopKStrategy via GraftExtensions; confirm the
    // node plans even though experimental.extraStrategies is untouched
    assert(!spark.experimental.extraStrategies.contains(plans.TopKStrategy))
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val analyzed = docs.queryExecution.analyzed
    val node = plans.TopKPerKeyNode(
      Seq(analyzed.output(1)),
      Seq(SortOrder(analyzed.output(0), Ascending)), 2, analyzed)
    val out = GraftShims.ofRows(spark, node)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"), plan)
  }

  test("row_number-filter-drop idiom auto-rewrites to the TopK heap plan") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val idiom = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("doc_id")
    idiom.collect()
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"), plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "), plan)
    // value-identical to the un-rewritten window in the plain session
    val plain = SparkSpec.session
    val expected = Tables.load(plain, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(idiom.collect().map(_.toSeq).toSeq === expected.toSeq)
  }

  test("TopK rewrite guards: kept rank or extra rn use leaves the window intact") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    // rank kept in the output → no rewrite
    val keepsRank = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("doc_id", "rn")
    keepsRank.collect()
    assert(!keepsRank.queryExecution.executedPlan.toString.contains("TopKPartial"))
    // residual conjunct composes: rewrite fires, extra filter survives
    val mixed = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("n_chars") > 100).drop("rn")
    mixed.collect()
    val mixedPlan = mixed.queryExecution.executedPlan.toString
    assert(mixedPlan.contains("TopKPartial"), mixedPlan)
    val viaWindow = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("n_chars") > 100).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(mixed.collect().map(_.toSeq).toSet === viaWindow)
  }

  test("relay end-to-end covers every event exactly once") {
    val out = operators.Relay.relayPipeline(spark, sf)
    val n = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(n === Tables.events(spark, sf).count())
    // severe messages route to the TLS port
    assert(out.filter(col("dest") === 6514).count() > 0)
    assert(out.filter(!col("log_group").startsWith("graft/syslog/")).count() === 0)
  }
}
