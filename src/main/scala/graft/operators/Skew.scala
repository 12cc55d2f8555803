package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation utilities (SURVEY §2 #42).
  *
  * AQE's skew handling covers JOIN skew, and algebraic aggregates
  * (sum/count/min/max) are already skew-tolerant through map-side
  * partial aggregation. The remaining hazard at 100 TB is *holistic*
  * aggregation on a hot key — `collect_list`/`array_agg` of one chatty
  * syslog source funnels that key's every row through a single reducer.
  *
  * `saltedAgg` runs such aggregates in two stages: stage 1 groups on
  * (key, salt) — the hot key's rows spread over `buckets` reducers —
  * stage 2 merges the per-salt partials. The caller provides the
  * per-salt aggregate and the merge expression, keeping this a general
  * pattern rather than a one-off.
  */
object Skew {

  /** Two-stage salted aggregation.
    *
    * @param df       input
    * @param keys     grouping keys
    * @param buckets  salt fan-out (≈ reducers the hottest key may use)
    * @param partial  per-(key,salt) aggregate columns (stage 1)
    * @param merge    per-key merge of the stage-1 columns (stage 2)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  // NOTE: there is deliberately NO complete-list variant
  // ("saltedSortedCollect") in this API anymore: a per-key COMPLETE
  // ordered list is unbounded by definition, so some reducer must
  // materialize the hot key's full row set — an OOM-by-design shape
  // that does not belong in a public scale library (its algebra is
  // still proven in ScaleSpec, quarantined to test scope). Callers
  // needing full per-key ordering should sort-and-write
  // (`repartition(key).sortWithinPartitions(key, order)` — spillable)
  // rather than collect; callers needing a bounded prefix use
  // [[saltedTopN]].

  /** Stage 1 of [[saltedTopN]], exposed so the scale property is
    * directly assertable: one row per (key, salt) whose `part` array
    * holds that salt bucket's N smallest (order, payload) structs.
    * The cap is algebraically free for top-N — rows beyond rank N in
    * ANY salt bucket can never reach the global top N, because at
    * least N rows of the same bucket precede them.
    *
    * The cap is applied BEFORE any aggregation buffer exists: a
    * per-(key, salt) `row_number() <= N` window filter feeds the
    * collect. The window's sort is a spillable external sort, so a
    * hot key costs disk, never an OOM — whereas capping with
    * `slice(array_sort(collect_list(...)))` would first materialize
    * the full (key, salt) group (hotRows/buckets elements) in one
    * in-memory aggregation buffer and only then discard rows. The
    * window and the groupBy hash-partition on the same (key, salt)
    * keys, so the filter adds a sort but no extra exchange. */
  def saltedTopNPartials(df: DataFrame, keys: Seq[String], buckets: Int,
                         n: Int, payload: Column, order: Column): DataFrame = {
    require(buckets > 0 && n > 0)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    // (order, payload) ordering matches array_sort's struct order, so
    // ties cut the same multiset the sort-then-slice algebra would
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keys.map(col) :+ col("__salt")): _*)
      .orderBy(order, payload)
    salted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(slice(array_sort(collect_list(struct(order.as("o"), payload.as("p")))),
        1, n).as("part"))
  }

  /** Skew-safe top-N collect: the N smallest payloads per key by
    * `order`, computed so no reducer buffer anywhere holds more than
    * buckets·N elements of any key. Stage 1 spreads the hot key over
    * `buckets` reducers, rank-filters each salt bucket to N rows
    * through a spillable window sort, and collects the ≤ N survivors;
    * stage 2 merges ≤ `buckets` arrays of ≤ N structs and re-slices.
    * At 100 TB a hot syslog source costs a disk-backed sort across
    * `buckets` tasks instead of OOMing one reducer. */
  def saltedTopN(df: DataFrame, keys: Seq[String], buckets: Int, n: Int,
                 payload: Column, order: Column): DataFrame =
    saltedTopNPartials(df, keys, buckets, n, payload, order)
      .groupBy(keys.map(col): _*)
      .agg(transform(slice(array_sort(flatten(collect_list(col("part")))), 1, n),
        x => x.getField("p")).as("items"))

  /** #42 as an oracle-checked query: the 10 earliest event_ids per
    * event_type through the salted two-stage top-N. event_type is
    * the textbook hot key (5 values over the whole table — a single
    * reducer would take a fifth of the corpus); the salt spreads each
    * type over 8 reducers, each per-salt partial is capped at N, and
    * the oracle (a plain window rank) proves the two-stage result is
    * EXACTLY the unsalted answer — salting and capping change the
    * plan, never the algebra. */
  val SkewTopN = 10

  def skewSaltedCollect(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"))
    saltedTopN(e, Seq("event_type"), 8, SkewTopN,
      payload = col("event_id"), order = col("event_id"))
      .select(col("event_type"),
        posexplode(col("items")).as(Seq("pos", "event_id")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("event_id"))
      .orderBy("event_type", "rank")
  }

  val skewSaltedCollectSql: String =
    s"""SELECT event_type, CAST(rn AS INT) AS rank, event_id
      |FROM (
      |  SELECT event_type, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
      |  FROM events)
      |WHERE rn <= $SkewTopN
      |ORDER BY event_type, rank""".stripMargin

  /** Distributed GLOBAL rank without the single-partition window:
    * `Window.orderBy(...)` with no partition key funnels every row
    * through one task — the global-sort trap. This ranks in parallel
    * instead: range-repartition on the sort key (Spark's sampled
    * range partitioner keeps partitions balanced), rank within each
    * partition, and add the partition's global offset (a
    * `numPartitions`-row cumulative count, broadcast back). Two
    * exchanges total — the range shuffle and the tiny offset frame —
    * and every sort is partition-local.
    *
    * The sort key must be a TOTAL order (add a unique tiebreak
    * column) or ranks are nondeterministic across engines and runs.
    * Output: the input columns plus `rank` (1-based, dense over the
    * total order). */
  def globalRank(df: DataFrame, parts: Int, sortCols: Column*): DataFrame = {
    // MATERIALIZED once: the offsets count and the rank join both
    // consume `parted`, and each would otherwise plan its own range
    // exchange. Range-boundary sampling is seeded by the underlying
    // RDD id, so two exchanges can draw DIFFERENT boundaries —
    // exchange reuse usually dedups them, but is not guaranteed (it
    // observably breaks over an InMemoryRelation input), and
    // divergent boundaries make __pid inconsistent between the two
    // branches → corrupt ranks. The pin fixes one partition
    // assignment for both consumers, and as a bonus truncates
    // lineage so chained globalRank calls never re-sample their
    // whole upstream chain ([[graft.Checkpoints]]: reliable
    // checkpoint when spark.graft.checkpoint.dir is set, else
    // localCheckpoint).
    val parted = graft.Checkpoints.pin(
      df.repartitionByRange(parts, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    // per-partition offsets via a triangle join over the ≤ `parts`-row
    // counts frame (parts² tiny rows) — NOT an unpartitioned running
    // window, which would both emit the scary "No Partition Defined"
    // warning and add an Exchange SinglePartition for 8 rows
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    val inPart = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
    parted.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__off") + row_number().over(inPart))
      .drop("__pid", "__off")
  }

  /** NTILE(k) derived arithmetically from a 1-based global rank over
    * n rows — bit-identical to SQL NTILE (first `n mod k` tiles get
    * the extra row): with q = n div k and r = n mod k, ranks up to
    * r·(q+1) land in tile ⌈rank/(q+1)⌉, the rest in
    * r + ⌈(rank − r·(q+1))/q⌉. All-integer on positives. */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    // exact integer division for positives: subtract the remainder
    // first so the double division is of an exact multiple (Column./
    // on longs is double division — floor(a/b) alone can round across
    // the boundary at large magnitudes)
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val qq = idiv(n, lit(k))
    val r = n % k
    val cut = r * (qq + 1)
    when(rank <= cut, idiv(rank + qq, qq + 1))
      .otherwise(r + idiv(rank - cut + qq - 1, qq))
      .cast("int")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("skew_salted_collect" -> ((s, d) => skewSaltedCollect(s, d)))

  val oracle: Map[String, String] =
    Map("skew_salted_collect" -> skewSaltedCollectSql)
}
