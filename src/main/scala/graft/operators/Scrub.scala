package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus scrubbing operators (SURVEY §2 #46–47): PII
  * redaction and repetition/boilerplate scoring — the standard
  * pre-training cleanup steps (C4/RefinedWeb-style) that sit next to
  * dedup and quality filtering in any large-scale pipeline.
  *
  * Both are oracle-checked end-to-end. PII inputs are synthesized
  * deterministically INSIDE the query (the synthetic corpus carries no
  * real PII), so the oracle verifies synthesis + redaction together —
  * same contract as the syslog parse family (SURVEY §5).
  *
  * Scale: pii_scrub is map-only (three codegen'd regexes per row) —
  * scan-bound at 100 TB. repetition shuffles twice on (doc_id, tok)
  * then doc_id, both with map-side partial aggregation; the per-doc
  * word-frequency state never exceeds the vocabulary of one document.
  *
  * Regex portability: patterns restricted to the RE2-compatible subset
  * (no backreferences, no lookaround) so Java's engine and DuckDB's
  * RE2 match identically.
  */
object Scrub {

  // ---------------------------------------------------------------------
  // #46 text_pii_scrub
  // ---------------------------------------------------------------------

  /** Case-insensitive via explicit classes (RE2 and Java agree on
    * these; no `(?i)` needed). Phones match both international
    * `+`-prefixed runs and bare NNN-NNN-NNNN forms — real PII rarely
    * arrives lowercase with a `+`. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "(\\+\\d[\\d-]{7,}\\d|\\b\\d{3}-\\d{3}-\\d{4}\\b)"
  val Ipv4Re  = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Inject deterministic PII after the document text (shared contract
    * with the oracle below). */
  private val withPii: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    lit(" from 192.168."), col("doc_id") % 256, lit("."), col("doc_id") % 100)

  private val withPiiSql =
    """text || ' contact user' || doc_id || '@mail.example.com or +1-555-'
      | || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      | || ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)"""
      .stripMargin.replace("\n", "")

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), withPii.as("raw"))
    // Replacement order matters: emails first (their local part may
    // contain digits), then phones (anchored on '+'), then bare IPv4s.
    d.select(
        col("doc_id"),
        regexp_count(col("raw"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("raw"), lit(PhoneRe)).as("n_phones"),
        regexp_count(col("raw"), lit(Ipv4Re)).as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>").as("scrubbed"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    s"""WITH d AS (SELECT doc_id, $withPiiSql AS raw FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '$PhoneRe')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(raw, '$Ipv4Re')) AS INT) AS n_ips,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
      |      '$PhoneRe', '<PHONE>', 'g'),
      |    '$Ipv4Re', '<IP>', 'g') AS scrubbed
      |FROM d
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #47 text_repetition — duplicate-word / top-word boilerplate score
  // ---------------------------------------------------------------------

  private def norm(c: Column): Column =
    graft.functions.TextFunctions.normText(c)
  private val normSql = graft.functions.TextFunctions.normTextSql

  /** Word-level repetition: distinct-word ratio and most-frequent-word
    * share. `repetitive` flags docs whose top word exceeds 20% of all
    * words — single integer comparisons, no float thresholds. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(norm(col("text")), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_words"),
        explode(col("toks")).as("tok"))
    t.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("freq"), first("n_words").as("n_words"))
      .groupBy("doc_id")
      .agg(
        first("n_words").as("n_words"),
        count(lit(1)).cast("int").as("n_distinct"),
        max("freq").cast("int").as("max_freq"))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"), col("max_freq"),
        (col("max_freq").cast("double") / col("n_words")).as("top_ratio"),
        (col("max_freq") * 5 > col("n_words")).cast("int").as("repetitive"))
      .orderBy("doc_id")
  }

  val repetitionSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
      |), t AS (
      |  SELECT doc_id, len(toks) AS n_words, unnest(toks) AS tok FROM d
      |), f AS (
      |  SELECT doc_id, tok, COUNT(*) AS freq, MAX(n_words) AS n_words
      |  FROM t GROUP BY doc_id, tok
      |)
      |SELECT doc_id,
      |  CAST(MAX(n_words) AS INT) AS n_words,
      |  CAST(COUNT(*) AS INT) AS n_distinct,
      |  CAST(MAX(freq) AS INT) AS max_freq,
      |  CAST(MAX(freq) AS DOUBLE) / MAX(n_words) AS top_ratio,
      |  CAST(CASE WHEN MAX(freq) * 5 > MAX(n_words) THEN 1 ELSE 0 END AS INT)
      |    AS repetitive
      |FROM f
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> piiScrub,
    "text_repetition" -> repetition)

  val oracle: Map[String, String] = Map(
    "text_pii_scrub" -> piiScrubSql,
    "text_repetition" -> repetitionSql)
}
