package graft.operators

import graft.Tables
import graft.functions.TextFunctions.{normText, normTextSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators (SURVEY §2 #61–62): corpus-wide top-k
  * word n-grams and per-document tf-idf-style keyword extraction.
  *
  * Scale notes:
  *  - corpus_ngrams is the canonical map-side-combine shape: n-gram
  *    generation is map-only (chained zip_with over shifted slices —
  *    each lambda touches only its lambda vars, so no Catalyst
  *    re-inlining blowup), the count aggregate combines partially
  *    before its single shuffle on the n-gram, and the global top-k is
  *    TakeOrderedAndProject (per-partition heaps + driver merge of k
  *    rows), never a full sort.
  *  - text_keywords ranks by (tf DESC, df ASC, token ASC) — the
  *    rare-and-frequent heuristic with NO floating log: a pure-integer
  *    surrogate for tf-idf that both engines order identically
  *    (IEEE log would round differently at ranking boundaries).
  *    document frequency reuses the same exploded token relation, so
  *    Spark computes it with one extra aggregate, not a second scan.
  */
object Ngrams {

  val N = 5
  val TopK = 20

  /** #61 Top-k most frequent word 5-grams across the corpus, with the
    * number of distinct documents containing each. N-gram generation
    * is one codegen'd [[graft.functions.TextFunctions.WordNgrams]]
    * pass (the chained-zip_with formulation paid 4 interpreted lambda
    * evals per word — 2× the whole query). */
  def corpusNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.word_ngrams(
          normText(col("text")), N)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n"), asc("gram"))
      .limit(TopK)

  val corpusNgramsSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split($normTextSql, ' ') AS w FROM documents
      |), g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - ${N - 2}), i ->
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
      |  )) AS gram
      |  FROM d
      |)
      |SELECT gram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM g
      |GROUP BY gram
      |ORDER BY n DESC, gram
      |LIMIT $TopK""".stripMargin

  /** #62 Per-document top-3 keywords by (tf DESC, df ASC, tok ASC). */
  def textKeywords(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val docFreq = toks.select("tok", "doc_id").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tf"), asc("df"), asc("tok"))
    tf.join(docFreq, "tok")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"))
      .orderBy("doc_id", "rnk")
  }

  val textKeywordsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split($normTextSql, ' ')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
      |), df AS (
      |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
      |), ranked AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS INT) AS rnk
      |  FROM tf JOIN df ON tf.tok = df.tok
      |)
      |SELECT doc_id, rnk, tok, tf, df
      |FROM ranked
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // #86 text_bigram_score — corpus-LM naturalness without a model
  // ---------------------------------------------------------------------

  /** Per-doc "does this read like the corpus" score from corpus-wide
    * bigram statistics — the model-free stand-in for LM-perplexity
    * quality filtering: a doc whose word bigrams are mostly corpus
    * singletons (n_unique) is gibberish/OCR-noise-shaped, one whose
    * bigram corpus frequencies are high is template/boilerplate-
    * shaped. All ranking integers (no IEEE log): cf_sum is the
    * summed corpus count of the doc's bigram OCCURRENCES, `natural`
    * flags docs with ≤ 20 % corpus-unique bigrams.
    *
    * Scale: bigram counts are one map-side-combined aggregate (same
    * shape as corpus_ngrams); the stats join shuffles (doc_id, bigram)
    * pairs on the bigram key — linear in corpus size, uniform by
    * construction; the per-doc roll-up shuffles on doc_id. */
  def textBigramScore(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.word_ngrams(
          normText(col("text")), 2)).as("bg"))
    val cnt = bi.groupBy("bg").agg(count(lit(1)).as("cf"))
    bi.join(cnt, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("cf").as("cf_sum"),
        sum(when(col("cf") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("natural_ok",
        (col("n_unique") * 5 <= col("n_bigrams")).cast("int"))
      .orderBy("doc_id")
  }

  val textBigramScoreSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split($normTextSql, ' ') AS w FROM documents
      |), g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i+1])) AS bg
      |  FROM d
      |  WHERE len(w) >= 2
      |), cnt AS (
      |  SELECT bg, COUNT(*) AS cf FROM g GROUP BY bg
      |)
      |SELECT g.doc_id,
      |  COUNT(*) AS n_bigrams,
      |  CAST(SUM(cnt.cf) AS BIGINT) AS cf_sum,
      |  CAST(SUM(CASE WHEN cnt.cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(CASE WHEN SUM(CASE WHEN cnt.cf = 1 THEN 1 ELSE 0 END) * 5
      |              <= COUNT(*) THEN 1 ELSE 0 END AS INT) AS natural_ok
      |FROM g JOIN cnt ON g.bg = cnt.bg
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #103 vocab_merges — BPE merge candidates (first tokenizer-training
  // iteration)
  // ---------------------------------------------------------------------

  val MergeTopK = 30

  /** The first BPE iteration as a relational plan: adjacent
    * character-pair frequencies over the corpus, weighted by word
    * occurrence counts — the argmax pair is the merge a
    * byte-pair-encoding trainer would apply first. The corpus
    * collapses to its VOCABULARY before any pair generation (one
    * map-side-combined aggregate), so the pair explosion is bounded
    * by Σ|word| over distinct words — vocabulary-sized, not
    * corpus-sized, which is what makes tokenizer training on 100 TB
    * feasible in one pass. Output: pair, total weighted count,
    * distinct word types containing it; final cut is a
    * TakeOrderedAndProject. */
  def vocabMerges(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(normText(col("text")), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(length(col("word")) >= 2)
    vocab
      .select(col("word"), col("cnt"),
        explode(expr("sequence(1, length(word) - 1)")).as("i"))
      .withColumn("pair", expr("substring(word, CAST(i AS INT), 2)"))
      .groupBy("pair")
      .agg(sum("cnt").as("total"), count_distinct(col("word")).as("n_word_types"))
      .orderBy(desc("total"), asc("pair"))
      .limit(MergeTopK)
  }

  val vocabMergesSql: String =
    s"""WITH toks AS (
      |  SELECT unnest(string_split($normTextSql, ' ')) AS word FROM documents
      |), vocab AS (
      |  SELECT word, COUNT(*) AS cnt FROM toks
      |  GROUP BY word HAVING length(word) >= 2
      |), pairs AS (
      |  SELECT word, cnt,
      |    unnest(list_transform(range(1, length(word)), i ->
      |      substring(word, CAST(i AS INT), 2))) AS pair
      |  FROM vocab
      |)
      |SELECT pair, CAST(SUM(cnt) AS BIGINT) AS total, COUNT(DISTINCT word) AS n_word_types
      |FROM pairs
      |GROUP BY pair
      |ORDER BY total DESC, pair
      |LIMIT $MergeTopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_ngrams" -> ((s, d) => corpusNgrams(s, d)),
    "text_keywords" -> ((s, d) => textKeywords(s, d)),
    "text_bigram_score" -> ((s, d) => textBigramScore(s, d)),
    "vocab_merges" -> ((s, d) => vocabMerges(s, d)))

  val oracle: Map[String, String] = Map(
    "corpus_ngrams" -> corpusNgramsSql,
    "text_keywords" -> textKeywordsSql,
    "text_bigram_score" -> textBigramScoreSql,
    "vocab_merges" -> vocabMergesSql)
}
