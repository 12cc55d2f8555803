package graft.operators

import org.apache.spark.sql.SparkSession

/** Bucketed co-located joins (SURVEY §2 #43).
  *
  * At 100 TB the repeated lineitem⋈orders shuffle dominates any
  * pipeline that touches both facts more than once. Writing both
  * tables bucketed by the join key (`bucketBy(n, key)` + saveAsTable)
  * gives every subsequent join identical partitioning on both sides —
  * Spark plans a SortMergeJoin with NO Exchange on either input
  * (verified in the spec by asserting the physical plan is
  * shuffle-free).
  *
  * Bucket-count guidance: pick n so each bucket is 100–500 MB at the
  * target SF and keep it a multiple of cluster parallelism; both
  * tables MUST use the same n and key for co-location.
  */
object Bucketing {

  /** Write the two fact tables bucketed by order key into the current
    * catalog (idempotent). Returns the table names.
    *
    * Stale-location handling: the in-memory catalog forgets tables
    * across sessions while the warehouse directory persists, so a
    * previous run's table directory can block `saveAsTable`. Rather
    * than deleting paths derived from session config (which may be a
    * shared or non-local warehouse the helper does not own), the
    * tables are written under an EXPLICIT per-table location inside
    * `scratchDir` — a directory the caller designates as scratch —
    * and only that per-table directory is ever cleared.
    *
    * The default scratch path embeds the JVM's Spark application id
    * (falling back to user.name), so two concurrent sessions using the
    * default can never delete each other's live bucketed data; callers
    * sharing tables ACROSS sessions must pass an explicit scratchDir.
    * The scratch is resolved and cleared through the Hadoop Path API
    * (the AnnIndex/SpoolWriter seam), so a cluster caller can point it
    * at a shared URI-schemed store — on a real cluster the default
    * tmpdir is driver-local and the bucketed write would land where
    * the executors can't co-read it. */
  def writeBucketedFacts(spark: SparkSession, dir: String, buckets: Int,
                         prefix: String = "graft",
                         scratchDir: String = null): (String, String) = {
    val scratch = Option(scratchDir).getOrElse(
      sys.props("java.io.tmpdir") + "/graft-bucketed-" +
        sys.props.getOrElse("user.name", "anon") + "-" +
        spark.sparkContext.applicationId)
    val lt = s"${prefix}_lineitem_b"
    val ot = s"${prefix}_orders_b"
    def write(table: String, src: String, key: String): Unit =
      if (!spark.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(scratch, table)
        val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
        graft.Tables.load(spark, dir, src)
          .write.bucketBy(buckets, key).sortBy(key)
          .option("path", loc.toString)
          .format("parquet").saveAsTable(table)
      }
    write(lt, "lineitem", "l_orderkey")
    write(ot, "orders", "o_orderkey")
    (lt, ot)
  }

  /** The co-located join: both sides pre-bucketed on the key. */
  def bucketedJoin(spark: SparkSession, lt: String, ot: String) =
    spark.table(lt).join(spark.table(ot),
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))

  /** #43 as an oracle-checked query: per-priority line counts and
    * exact-decimal quantity sums THROUGH the bucketed tables — the
    * oracle joins the raw parquet directly, proving the bucketed
    * write+join is value-identical to the plain join (the spec
    * separately asserts its plan is exchange-free). The scratch
    * tables are per-application (see writeBucketedFacts), so Verify
    * runs are isolated like any other caller. */
  def bucketedJoinAgg(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (lt, ot) = writeBucketedFacts(spark, dir, buckets = 8)
    bucketedJoin(spark, lt, ot)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(9,2)")).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  val bucketedJoinAggSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("bucketed_join" -> ((s, d) => bucketedJoinAgg(s, d)))

  val oracle: Map[String, String] =
    Map("bucketed_join" -> bucketedJoinAggSql)
}
