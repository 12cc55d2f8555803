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

  /** events.ts normalized to the ns-since-epoch LONG contract every
    * operator is written against, regardless of which parquet flavor
    * the generator emitted:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so the
    *    `nanosAsLong` legacy flag (set here and in [[GraftSession]])
    *    reads the raw ns long directly — no conversion needed.
    *  - TIMESTAMP(MICROS), NTZ or UTC-adjusted: cast to the session
    *    (UTC) instant and widen `unix_micros × 1000` back to ns. The
    *    ×1000 is exact integer math, and DuckDB's `epoch_ns(ts)` on
    *    the same naive-µs column produces the identical value, so no
    *    µs-vs-ns precision skew can reach an oracle comparison.
    *
    * `ts_s` (epoch seconds) is `ts div 1e9` in both cases — mirrors
    * DuckDB's epoch_ns(ts)//1e9 exactly.
    *
    * NOTE: `nanosAsLong` is a session-global flag, normally set once at
    * session construction by [[GraftSession]]. The set here is a
    * defensive idempotent repeat for sessions built elsewhere; it
    * affects how ALL nanos-timestamp parquet is read for the rest of
    * the session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val ns = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // ns long already
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp_ltz)) * 1000L"))
    }
    ns.withColumn("ts_s", org.apache.spark.sql.functions.expr("ts div 1000000000"))
  }
}
