package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering (SURVEY §2 #176–177).
  *
  * The quality gate most large LLM corpora actually shipped with is a
  * LEARNED one: GPT-3 trained a linear classifier with curated text
  * (WebText/Wikipedia/books) as the positive class and raw CommonCrawl
  * as the negative, then kept crawl documents the classifier scored
  * high (Brown et al. 2020, Appendix A); LLaMA's Wikipedia-reference
  * classifier and CCNet's LM filter are the same shape. The rule
  * batteries here (#36 quality, #83 Gopher, #162 URL) are hand-written
  * gates; this family adds the distilled, data-driven one — train a
  * multinomial Naive Bayes model on a labeled split, score held-out
  * documents, keep by log-odds sign.
  *
  * Naive Bayes over unigram token counts with Laplace +1 smoothing:
  *
  *   score(doc) = Σ_tok [ log P(tok|cur) − log P(tok|crawl) ]
  *                + log P(cur) − log P(crawl)
  *   log P(tok|cls) = log (c_cls(tok) + 1) − log (N_cls + V)
  *
  * Every log is the #136 fixed-point `log2fp` kernel (integer
  * arithmetic on a shared 1024-entry mantissa table), so the score is
  * ONE BIGINT both engines compute bit-identically — no
  * transcendental crosses the engine boundary, the rule every
  * oracle-compared op here follows. A token unseen in training
  * contributes log2fp(1) − log2fp(1) = 0 to the numerator sum and is
  * handled by the class-denominator term, which is factored out as
  * n_tokens · dd_fp (dd_fp = log2fp(N_cur+V) − log2fp(N_crawl+V)).
  *
  * Labels and signal: the corpus has no curated/crawl column, so the
  * label derives from the source id (sources ≡ 0 mod 4 are the
  * "curated" corpora — membership labeling is exactly how GPT-3's
  * positive set was defined) and each document appends six marker
  * tokens drawn 80/20 from its class lexicon vs the other class's (the
  * #35 langid / #156 URL synthesis pattern: both engines build the
  * same spiked text from the same integer residues, so the oracle
  * verifies the NB algebra, not the synthesis). The 20% flips keep
  * every lexicon word present in BOTH classes — the smoothing path is
  * exercised, not just defined — and the shared base text is the
  * non-discriminative mass a real classifier wades through.
  *
  * Scale shape (100 TB): training is ONE token explode into a
  * map-side-combined (tok → per-class counts) aggregate — the #136
  * vocab pass with two columns; the model is vocab-sized, so scoring
  * joins tokens to the model on the 8-byte-ish token key (corpus-wide
  * vocab canNOT be broadcast at 100 TB; AQE broadcasts it at test
  * scale on its own) and aggregates per doc. The two scalar frames
  * (smoothing constants, priors) are 1-row cross joins. No stage
  * touches more than the token stream the quality battery already
  * scans.
  */
object Classifier {

  /** Positive-class lexicon (curated corpora markers). */
  val HiLexicon: Seq[String] = Seq("citation", "reference", "figure", "appendix")
  /** Negative-class lexicon (crawl-spam markers). */
  val LoLexicon: Seq[String] = Seq("clickbait", "promo", "giveaway", "jackpot")
  /** Markers appended per doc. */
  val MarkersPerDoc = 6
  /** Eval split: doc_id % EvalMod == 0 is held out. */
  val EvalMod = 5
  /** Model export size. */
  val TopK = 20

  private def elem(dialect: String, arr: Seq[String], idx: String): String = {
    val lit = arr.map(w => s"'$w'").mkString(", ")
    if (dialect == "spark") s"element_at(array($lit), $idx)"
    else s"([$lit])[$idx]"
  }

  /** `is_cur` 0/1 label from the source id: sources ≡ 0 (mod 4) are
    * the curated corpora. Same text in both dialects. TRY_CAST, not
    * CAST: a source name without the numeric suffix (spec-planted
    * corpora) labels crawl instead of throwing under ANSI mode —
    * identical on the real `srcN` sources. */
  private val isCurSql: String =
    "CASE WHEN TRY_CAST(substring(source, 4) AS INT) % 4 = 0 THEN 1 ELSE 0 END"

  /** Spiked text over (doc_id, text, is_cur): six markers, each drawn
    * from the own-class lexicon on residue < 8 (mod 10) and from the
    * OTHER class's on the 20% flips. */
  private def spikedSql(dialect: String): String = {
    val markers = (0 until MarkersPerDoc).map { k =>
      val idx = s"CAST((doc_id + $k) % 4 + 1 AS INT)"
      val ownHi = s"(CASE WHEN (doc_id * 7 + ${13 * k}) % 10 < 8 " +
        s"THEN is_cur ELSE 1 - is_cur END) = 1"
      s"CASE WHEN $ownHi THEN ${elem(dialect, HiLexicon, idx)} " +
        s"ELSE ${elem(dialect, LoLexicon, idx)} END"
    }
    markers.mkString("concat(text, ' ', ", ", ' ', ", ")")
  }

  // ---------------------------------------------------------------------
  // Shared oracle CTE chain (token stream → counts → weights → stats)
  // ---------------------------------------------------------------------

  /** Spiked-token CTEs over an arbitrary (doc_id, text, source)
    * relation, ending in `${p}tt(doc_id, is_cur, tok)` — the oracle
    * twin of [[tokensFrom]], prefixable so a composing oracle (the
    * #151 pipeline) can score ITS survivor relation with the same
    * tokenization the model CTEs trained on.
    *
    * Deliberately NOT materialized: each token CTE is referenced
    * exactly once by its successor, so inlining streams it — while
    * AS MATERIALIZED would pin the full multi-million-row token
    * relation in memory (measured: the 130k-doc distinct-corpus
    * replay OOM'd DuckDB with two materialized token streams held at
    * once). The recursion-re-evaluation hazard the memory rule guards
    * against is handled downstream: the recursive pack walk reads
    * pl_sp, and materializing THAT boundary (plus the multi-referenced
    * model aggregates) is what keeps the chain evaluated once. */
  private[graft] def tokenCtes(p: String, rel: String): String =
    s"""${p}d AS (
       |  SELECT doc_id, text, $isCurSql AS is_cur FROM $rel
       |), ${p}s AS (
       |  SELECT doc_id, is_cur, ${spikedSql("duck")} AS spiked FROM ${p}d
       |), ${p}t AS (
       |  SELECT doc_id, is_cur, unnest(string_split(spiked, ' ')) AS tok FROM ${p}s
       |), ${p}tt AS (
       |  SELECT * FROM ${p}t WHERE tok <> ''
       |)""".stripMargin

  /** Model CTE chain (no WITH prefix): train-split token counts →
    * weights `${p}w(tok, c_cur, c_cra, w_fp)` → scalar constants
    * `${p}cst(dd_fp, pd_fp)`. */
  private[graft] def modelCtes(p: String): String = {
    val lg = TextFunctions.log2fpSqlDuck _
    s"""${tokenCtes(p, "documents")}, ${p}counts AS MATERIALIZED (
       |  SELECT tok, CAST(SUM(is_cur) AS BIGINT) AS c_cur,
       |    CAST(SUM(1 - is_cur) AS BIGINT) AS c_cra
       |  FROM ${p}tt WHERE doc_id % $EvalMod <> 0 GROUP BY tok
       |), ${p}w AS MATERIALIZED (
       |  SELECT tok, c_cur, c_cra,
       |    ${lg("c_cur + 1")} - ${lg("c_cra + 1")} AS w_fp
       |  FROM ${p}counts
       |), ${p}stats AS MATERIALIZED (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c_cur) AS BIGINT) AS n_cur,
       |    CAST(SUM(c_cra) AS BIGINT) AS n_cra
       |  FROM ${p}counts
       |), ${p}prior AS MATERIALIZED (
       |  SELECT CAST(SUM(is_cur) AS BIGINT) AS d_cur,
       |    CAST(SUM(1 - is_cur) AS BIGINT) AS d_cra
       |  FROM ${p}d WHERE doc_id % $EvalMod <> 0
       |), ${p}cst AS MATERIALIZED (
       |  SELECT ${lg("n_cur + v")} - ${lg("n_cra + v")} AS dd_fp,
       |         ${lg("d_cur")} - ${lg("d_cra")} AS pd_fp,
       |         d_cur, d_cra
       |  FROM ${p}stats, ${p}prior
       |)""".stripMargin
  }

  /** Token frame (doc_id, is_cur, tok) over an arbitrary
    * (doc_id, text, source) frame — the single tokenization both the
    * batch queries and the streaming admission twin
    * ([[graft.streaming.ClassifierStream]]) ride, so they can never
    * tokenize or spike divergently. */
  private[graft] def tokensFrom(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), expr(isCurSql).as("is_cur"))
      .select(col("doc_id"), col("is_cur"),
        explode(split(expr(spikedSql("spark")), " ")).as("tok"))
      .filter(col("tok") =!= "")

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    tokensFrom(Tables.load(spark, dir, "documents"))

  /** Model frame (tok, c_cur, c_cra, w_fp) from the train split. */
  private[graft] def model(spark: SparkSession, dir: String): DataFrame = {
    val lg = TextFunctions.log2fpExpr _
    tokens(spark, dir)
      .filter(col("doc_id") % EvalMod =!= 0)
      .groupBy("tok")
      .agg(sum(col("is_cur")).as("c_cur"),
        sum(lit(1) - col("is_cur")).as("c_cra"))
      .withColumn("w_fp",
        expr(lg("c_cur + 1")) - expr(lg("c_cra + 1")))
  }

  /** 1-row constants frame (dd_fp, pd_fp, d_cur, d_cra): the
    * class-denominator and prior log-odds terms, plus the raw class
    * priors — a composing gate (#151's classifier stage) needs them to
    * detect the one-class-degenerate case, where dd_fp/pd_fp hold
    * out-of-domain log2fp(0) garbage and no 2-class filter exists. */
  private[graft] def constants(spark: SparkSession, dir: String): DataFrame =
    constantsFrom(model(spark, dir), spark, dir)

  /** [[constants]] over a caller-supplied model frame — a composing
    * consumer that already holds (and pinned) the model derives both
    * its w_fp join AND these constants from the ONE materialization
    * instead of re-training the corpus-scale model per consumer
    * (the Checkpoints pin-on-multi-consumer discipline). */
  private[graft] def constantsFrom(model: DataFrame, spark: SparkSession,
                                   dir: String): DataFrame = {
    val lg = TextFunctions.log2fpExpr _
    model
      .agg(count(lit(1)).as("v"), sum("c_cur").as("n_cur"),
        sum("c_cra").as("n_cra"))
      .crossJoin(
        Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % EvalMod =!= 0)
          .agg(sum(expr(isCurSql)).as("d_cur"),
            sum(lit(1) - expr(isCurSql)).as("d_cra")))
      .select(
        (expr(lg("n_cur + v")) - expr(lg("n_cra + v"))).as("dd_fp"),
        (expr(lg("d_cur")) - expr(lg("d_cra"))).as("pd_fp"),
        col("d_cur"), col("d_cra"))
  }

  // ---------------------------------------------------------------------
  // #176 corpus_classifier_train — NB training + lexicon export
  // ---------------------------------------------------------------------

  /** The TopK most discriminative tokens — ranked by |disc_fp| where
    * disc_fp = w_fp − dd_fp is the token's actual per-occurrence
    * log-odds CONTRIBUTION to a document score. Ranking by raw |w_fp|
    * would surface the 1:3 class-size imbalance (every shared base
    * token carries w ≈ log2(1/3)); subtracting the denominator term
    * centers shared tokens at ≈ 0 so the planted class markers top
    * the export — the learned lexicon a reviewer audits. */
  def classifierTrain(spark: SparkSession, dir: String): DataFrame =
    model(spark, dir)
      .crossJoin(constants(spark, dir))
      .withColumn("disc_fp", col("w_fp") - col("dd_fp"))
      .orderBy(abs(col("disc_fp")).desc, col("tok"))
      .limit(TopK)
      .select(col("tok"), col("c_cur"), col("c_cra"), col("disc_fp"))

  val classifierTrainSql: String =
    s"""WITH ${modelCtes("")}
       |SELECT tok, c_cur, c_cra, w_fp - dd_fp AS disc_fp FROM w, cst
       |ORDER BY abs(w_fp - dd_fp) DESC, tok LIMIT $TopK""".stripMargin

  // ---------------------------------------------------------------------
  // #177 corpus_classifier_score — held-out scoring + keep verdict
  // ---------------------------------------------------------------------

  /** Held-out docs scored by the trained model: fixed-point log-odds,
    * predicted class, and correctness against the true label. */
  def classifierScore(spark: SparkSession, dir: String): DataFrame = {
    val w = model(spark, dir)
    val cst = constants(spark, dir)
    val scored = tokens(spark, dir)
      .filter(col("doc_id") % EvalMod === 0)
      .join(w.select("tok", "w_fp"), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(min("is_cur").as("is_cur"), count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_fp"), lit(0L))).as("sum_w"))
    scored.crossJoin(cst)
      .withColumn("score_fp",
        col("sum_w") - col("n_toks") * col("dd_fp") + col("pd_fp"))
      .select(col("doc_id"),
        when(col("is_cur") === 1, "curated").otherwise("crawl").as("label"),
        col("n_toks"), col("score_fp"),
        when(col("score_fp") > 0, "curated").otherwise("crawl").as("pred"),
        when((col("score_fp") > 0) === (col("is_cur") === 1), 1)
          .otherwise(0).as("correct"))
      .orderBy("doc_id")
  }

  val classifierScoreSql: String =
    s"""WITH ${modelCtes("")}, scored AS (
       |  SELECT e.doc_id, MIN(e.is_cur) AS is_cur, COUNT(*) AS n_toks,
       |    CAST(SUM(COALESCE(w.w_fp, 0)) AS BIGINT) AS sum_w
       |  FROM tt e LEFT JOIN w ON e.tok = w.tok
       |  WHERE e.doc_id % $EvalMod = 0
       |  GROUP BY e.doc_id
       |), fin AS (
       |  SELECT doc_id, is_cur, n_toks,
       |    sum_w - n_toks * dd_fp + pd_fp AS score_fp
       |  FROM scored, cst
       |)
       |SELECT doc_id,
       |  CASE WHEN is_cur = 1 THEN 'curated' ELSE 'crawl' END AS label,
       |  n_toks, score_fp,
       |  CASE WHEN score_fp > 0 THEN 'curated' ELSE 'crawl' END AS pred,
       |  CASE WHEN (score_fp > 0) = (is_cur = 1) THEN 1 ELSE 0 END AS correct
       |FROM fin
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_classifier_train" -> classifierTrain,
    "corpus_classifier_score" -> classifierScore)

  val oracle: Map[String, String] = Map(
    "corpus_classifier_train" -> classifierTrainSql,
    "corpus_classifier_score" -> classifierScoreSql)
}
