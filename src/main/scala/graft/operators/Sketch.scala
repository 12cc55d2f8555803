package graft.operators

import graft.Tables
import graft.functions.SketchFunctions.{kmin_values, poly_hash, PolyP}
import graft.functions.TextFunctions.{normText, normTextSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #63 sketch_distinct — per-source distinct-token estimation with the
  * bounded-state KMV sketch ([[graft.functions.SketchFunctions]]).
  *
  * The exact `count_distinct` column rides along as the accuracy
  * witness: at the test SFs both are cheap, and the oracle checking
  * est vs exact side by side documents the sketch's error honestly.
  * At 100 TB you would keep only the sketch column — the whole point
  * is that its shuffle traffic is k·8 bytes per (group, map task)
  * while exact distinct expands every (source, token) pair.
  *
  * DuckDB oracle: the k smallest distinct hashes per group via
  * DISTINCT + window rank, then the identical integer estimate
  * formula — the sketch's merge algebra is exactly "min-k of the
  * union", so a sorted-rank reformulation reproduces it bit-for-bit.
  */
object Sketch {

  val K = 64

  def sketchDistinct(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(normText(col("text")), " ")).as("tok"))
      .withColumn("hv", poly_hash(col("tok")))
    toks.groupBy("source")
      .agg(
        kmin_values(col("hv"), K).as("kmins"),
        count_distinct(col("tok")).as("n_exact"))
      .select(
        col("source"),
        size(col("kmins")).as("n_kept"),
        when(size(col("kmins")) >= K, element_at(col("kmins"), K))
          .otherwise(lit(-1L)).as("kth_min"),
        when(size(col("kmins")) < K, size(col("kmins")).cast("long"))
          .otherwise(expr(s"CAST(${K - 1} AS BIGINT) * ${PolyP}L div element_at(kmins, $K)"))
          .as("distinct_est"),
        col("n_exact"))
      .orderBy("source")
  }

  val sketchDistinctSql: String =
    s"""WITH toks AS (
      |  SELECT source, unnest(string_split($normTextSql, ' ')) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT DISTINCT source,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(tok, ''), ch -> CAST(ord(ch) AS BIGINT))),
      |      (acc, c) -> (acc * 131 + c) % $PolyP) AS hv
      |  FROM toks
      |), r AS (
      |  SELECT source, hv,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
      |  FROM h
      |), k AS (
      |  SELECT source, COUNT(*) AS n_kept,
      |    MAX(CASE WHEN rn = $K THEN hv END) AS hk
      |  FROM r WHERE rn <= $K GROUP BY source
      |), x AS (
      |  SELECT source, COUNT(DISTINCT tok) AS n_exact FROM toks GROUP BY source
      |)
      |SELECT k.source,
      |  CAST(k.n_kept AS INT) AS n_kept,
      |  COALESCE(k.hk, -1) AS kth_min,
      |  CAST(CASE WHEN k.n_kept < $K THEN k.n_kept
      |            ELSE (CAST(${K - 1} AS BIGINT) * $PolyP) // k.hk END AS BIGINT) AS distinct_est,
      |  x.n_exact
      |FROM k JOIN x ON k.source = x.source
      |ORDER BY k.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_distinct" -> ((s, d) => sketchDistinct(s, d)))

  val oracle: Map[String, String] = Map(
    "sketch_distinct" -> sketchDistinctSql)
}
