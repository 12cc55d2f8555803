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
    * sharing tables ACROSS sessions must pass an explicit scratchDir. */
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
        val loc = new java.io.File(scratch, table)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(loc)
        }
        graft.Tables.load(spark, dir, src)
          .write.bucketBy(buckets, key).sortBy(key)
          .option("path", loc.getAbsolutePath)
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
}
