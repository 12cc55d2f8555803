package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scan-side 100 TB evidence the flat test parquet cannot show: a
  * date-partitioned fact layout must be pruned (a) statically, at
  * planning time, from a literal predicate, and (b) dynamically
  * (DPP), at runtime, from a selective dimension join — the two
  * mechanisms that keep a 100 TB scan from reading 100 TB. */
class PartitionPruneSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("graft_part_fact").toString
    Tables.events(spark, sf)
      .withColumn("day", expr("CAST(ts_s div 86400 AS INT)"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  private lazy val days: Array[Int] =
    spark.read.parquet(factDir).select("day").distinct()
      .collect().map(_.getInt(0)).sorted

  test("static partition pruning: a literal day predicate reads one partition") {
    assert(days.length > 1, "need multiple partitions for the test to mean anything")
    val pick = days.head
    // AQE wraps stages in QueryStageExec nodes that hide the scan
    // from plan traversal; pruning is a planning-time property anyway
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = spark.read.parquet(factDir)
      .filter(col("day") === pick).agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(sys.error(s"no file scan in:\n$plan"))
    assert(scan.toString.contains("PartitionFilters: [isnotnull(day"), scan.toString)
    // the pruning actually happened: only the one partition's files read
    val numFiles = scan.metrics("numFiles").value
    val totalFiles = new java.io.File(factDir).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.listFiles()
        .count(_.getName.endsWith(".parquet")).toLong).sum
    assert(numFiles < totalFiles, s"read $numFiles of $totalFiles files")
    assert(scan.metrics("numPartitions").value === 1L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dynamic partition pruning: a selective dim join prunes fact partitions at runtime") {
    val dimDir = Files.createTempDirectory("graft_part_dim").toString
    import spark.implicits._
    days.zipWithIndex.map { case (d, i) => (d, s"name_$i") }.toSeq
      .toDF("day_key", "dim_name").write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("dim_name") === "name_0")
    val joined = fact.join(dim, col("day") === col("day_key"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in:\n$plan")
  }

  test("runtime bloom-filter join pruning: a selective build side injects might_contain on the probe scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val probe = Tables.events(spark, sf).select("event_id", "user_id")
      val build = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("eid"))
      val joined = probe.join(build, col("event_id") === col("eid"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the probe side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
