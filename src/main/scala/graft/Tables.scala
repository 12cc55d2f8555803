package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take the table directory as a parameter rather than
  * binding a global catalog, so the same code runs at any scale factor
  * (and, on a real cluster, against any warehouse path).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a raw ns LONG and derive `ts_s`
    * (epoch seconds, exact integer math — mirrors DuckDB's
    * epoch_ns(ts)//1e9). Downstream operators use `ts_s`/`ts` (ns long)
    * so no µs-vs-ns precision skew can reach an oracle comparison.
    *
    * NOTE: `nanosAsLong` is a session-global flag, normally set once at
    * session construction by [[GraftSession]]. The set here is a
    * defensive idempotent repeat for sessions built elsewhere; it
    * affects how ALL nanos-timestamp parquet is read for the rest of
    * the session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_s", org.apache.spark.sql.functions.expr("ts div 1000000000"))
  }
}
