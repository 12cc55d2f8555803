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

  // ---------------------------------------------------------------------
  // #83 text_gopher_rules — the Gopher/C4-style rule battery
  // ---------------------------------------------------------------------

  /** Common-word presence set (the "must contain 2 of these" rule). */
  private val CommonWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The standard web-corpus rule battery (word-count bounds, mean
    * word length, alpha-word fraction, symbol ratio, bullet/ellipsis
    * line fractions, common-word presence) as ONE map-only scan —
    * every threshold is a cross-multiplied integer comparison, so
    * both engines decide each rule on identical integers and the
    * whole battery is scan-bound at 100 TB (flags, not filters:
    * composing pipelines choose which rules to enforce).
    *
    * Line-based rules read the RAW text (normalization collapses
    * newlines); word-based rules read the shared normText. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOn(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id"))

  /** Same battery over any (doc_id, text) frame — the spec feeds
    * crafted docs that trip each rule individually. */
  def gopherRulesOn(docs: DataFrame): DataFrame = {
    val cw = CommonWords.map(w => lit(w))
    docs
      .withColumn("norm", norm(col("text")))
      .select(
        col("doc_id"),
        size(split(col("norm"), " ")).as("n_words"),
        (length(col("norm")) - (size(split(col("norm"), " ")) - 1))
          .as("word_chars"),
        regexp_count(col("norm"), lit("(?:^| )[^ ]*?[a-z]")).as("n_alpha"),
        (regexp_count(col("norm"), lit("#")) +
          regexp_count(col("norm"), lit("\\.\\.\\."))).as("n_sym"),
        size(split(col("text"), "\n")).as("n_lines"),
        expr("size(filter(split(text, '\n'), " +
          "l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%'))").as("n_bullet"),
        expr("size(filter(split(text, '\n'), " +
          "l -> rtrim(l) LIKE '%...'))").as("n_ellipsis"),
        least(size(array_intersect(
          array_distinct(split(col("norm"), " ")), array(cw: _*))), lit(8))
          .as("cw_hits"))
      .withColumn("r_word_count",
        (col("n_words") >= 50 && col("n_words") <= 100000).cast("int"))
      .withColumn("r_mean_word_len",
        (col("word_chars") >= col("n_words") * 3 &&
          col("word_chars") <= col("n_words") * 10).cast("int"))
      .withColumn("r_alpha",
        (col("n_alpha") * 5 >= col("n_words") * 4).cast("int"))
      .withColumn("r_symbol",
        (col("n_sym") * 10 <= col("n_words")).cast("int"))
      .withColumn("r_lines",
        (col("n_bullet") * 10 <= col("n_lines") * 9 &&
          col("n_ellipsis") * 10 <= col("n_lines") * 3).cast("int"))
      .withColumn("r_common_words", (col("cw_hits") >= 2).cast("int"))
      .withColumn("gopher_ok",
        (col("r_word_count") === 1 && col("r_mean_word_len") === 1 &&
          col("r_alpha") === 1 && col("r_symbol") === 1 &&
          col("r_lines") === 1 && col("r_common_words") === 1).cast("int"))
  }

  val gopherRulesSql: String = {
    val lex = CommonWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, text, $normSql AS norm,
      |    string_split($normSql, ' ') AS toks,
      |    string_split(text, chr(10)) AS lines
      |  FROM documents
      |), c AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS INT) AS n_words,
      |    CAST(length(norm) - (len(toks) - 1) AS INT) AS word_chars,
      |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS INT)
      |      AS n_alpha,
      |    CAST(len(regexp_extract_all(norm, '#'))
      |       + len(regexp_extract_all(norm, '\\.\\.\\.')) AS INT) AS n_sym,
      |    CAST(len(lines) AS INT) AS n_lines,
      |    CAST(len(list_filter(lines,
      |      l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS INT) AS n_bullet,
      |    CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS INT)
      |      AS n_ellipsis,
      |    CAST(LEAST(len(list_intersect(list_distinct(toks), $lex)), 8) AS INT)
      |      AS cw_hits
      |  FROM d
      |)
      |SELECT *,
      |  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS INT)
      |    AS r_word_count,
      |  CAST(CASE WHEN word_chars >= n_words * 3 AND word_chars <= n_words * 10
      |       THEN 1 ELSE 0 END AS INT) AS r_mean_word_len,
      |  CAST(CASE WHEN n_alpha * 5 >= n_words * 4 THEN 1 ELSE 0 END AS INT)
      |    AS r_alpha,
      |  CAST(CASE WHEN n_sym * 10 <= n_words THEN 1 ELSE 0 END AS INT) AS r_symbol,
      |  CAST(CASE WHEN n_bullet * 10 <= n_lines * 9
      |         AND n_ellipsis * 10 <= n_lines * 3
      |       THEN 1 ELSE 0 END AS INT) AS r_lines,
      |  CAST(CASE WHEN cw_hits >= 2 THEN 1 ELSE 0 END AS INT) AS r_common_words,
      |  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
      |         AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
      |         AND n_alpha * 5 >= n_words * 4
      |         AND n_sym * 10 <= n_words
      |         AND n_bullet * 10 <= n_lines * 9
      |         AND n_ellipsis * 10 <= n_lines * 3
      |         AND cw_hits >= 2
      |       THEN 1 ELSE 0 END AS INT) AS gopher_ok
      |FROM c
      |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> piiScrub,
    "text_repetition" -> repetition,
    "text_gopher_rules" -> gopherRules)

  val oracle: Map[String, String] = Map(
    "text_pii_scrub" -> piiScrubSql,
    "text_repetition" -> repetitionSql,
    "text_gopher_rules" -> gopherRulesSql)
}
