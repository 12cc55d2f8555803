package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer family: full multi-round merge
  * TRAINING (#127) and merge APPLICATION (#128), completing the
  * tokenizer story #103 (vocab_merges) opens — #103 ranks the
  * first-iteration candidates; these run the whole greedy loop and
  * then tokenize the corpus with the learned table.
  *
  * Semantics are classic subword BPE (Sennrich et al. 2016, the
  * subword-nmt formulation): start from characters, repeatedly take
  * the most frequent adjacent token pair (ties: lexicographically
  * smallest pair — deterministic cross-engine) and merge every
  * occurrence; apply merges to text in learned order, one full pass
  * per merge. Token sequences are encoded as start-marked strings —
  * every token PREFIXED with '_' ("hello" → "_h_e_l_l_o") — so
  * applying one merge is one literal string replace of "_l_r" with
  * "_lr". The leading marker anchors the pattern at a token start (a
  * space-joined encoding would let "p ar" falsely match the SUFFIX of
  * tokens "sp ar"), the marker inside the pattern anchors the right
  * token, and the replacement ("_lr") can never contain the pattern
  * (one marker vs two) — so a single left-to-right non-overlapping
  * replace IS the iterated leftmost merge of exactly that token pair,
  * identical in Spark and DuckDB (both scan the original string, so
  * consecutive shared-token occurrences resolve leftmost-first like
  * real BPE). That identity is what makes the whole iterative
  * algorithm SQL-expressible: the oracle is a generated per-round
  * CTE chain (pairs → argmax → replace), value-checked end-to-end
  * rather than declared rows-only.
  *
  * Scale design:
  *  - training never touches corpus rows after the first aggregation:
  *    the corpus collapses to its VOCABULARY (word types + counts,
  *    the #103 move — bounded by the language, not the corpus). A
  *    vocabulary under [[LocalVocabCap]] word types then loops on the
  *    driver (the ann_ivf trained-centroid pattern — the loop's input
  *    is a KB-to-MB scalar table and 20 distributed rounds would be
  *    pure job-latency); a web-scale multilingual vocabulary loops
  *    distributed, each round two tiny jobs (pair count + argmax)
  *    plus one narrow merge map over the pinned frame. Same
  *    algorithm, same tie-breaks, spec-pinned equal.
  *  - encoding is map-only: the learned merges fold into a chain of
  *    20 codegen'd literal `replace` calls over one corpus scan — no
  *    shuffle, no UDF, no per-row state.
  *
  * Word boundaries: words are tokenized independently. The encoder
  * joins words with a '|' guard token before start-marking characters;
  * merges are learned on bare words, so no merge pattern can span the
  * guard, and the guard tokens are subtracted from the final count.
  * (The corpus normalizer emits only [a-z0-9 ], so '|' cannot occur
  * in a word — asserted cheaply by the spec.)
  */
object Bpe {

  /** Number of merge rounds learned (and applied). */
  val TrainRounds = 20

  private def normText(c: Column): Column =
    graft.functions.TextFunctions.normText(c)
  private val normSql = graft.functions.TextFunctions.normTextSql

  /** "hello" → "_h_e_l_l_o" (start-marked char tokens). */
  private def markedChars(c: Column): Column =
    regexp_replace(c, "(.)", "_$1")

  /** Adjacent token pairs ("l r" strings) of a start-marked string:
    * markers become spaces, then the shared 2-gram kernel. Tokens
    * never contain '_' or ' ', so the translation is exact. */
  private def markedPairs(c: Column): Column =
    graft.functions.TextFunctions.word_ngrams(trim(translate(c, "_", " ")), 2)

  /** replace() pattern/replacement for one learned merge "l r". */
  private def mergePattern(pair: String): String = "_" + pair.replace(" ", "_")
  private def mergeResult(pair: String): String = "_" + pair.replace(" ", "")

  /** Vocabulary sizes up to this many word types run the greedy loop
    * on the driver (a ~MB-scale scalar table, the ann_ivf-centroid
    * pattern); above it, the loop stays distributed. Both paths are
    * the same algorithm with the same tie-breaks — the spec pins them
    * equal — so the switch changes latency, never results. */
  val LocalVocabCap = 131072

  /** Learned merge table: (pair "l r", summed count) in rank order.
    * Stops early if the vocabulary runs out of adjacent pairs (the
    * oracle's per-round LEFT JOIN mirrors the no-op).
    *
    * The corpus-scale work is the ONE vocabulary aggregation; the
    * greedy loop itself touches only word types. A small vocabulary
    * (every monolingual corpus; the cap is 128k types) collects to
    * the driver and loops there — 20 distributed rounds would spend
    * their whole wall on job round-trips for KB-sized frames. Web-
    * scale multilingual vocabularies (typos, URLs — hundreds of
    * millions of types) take the distributed loop. */
  private[graft] def trainedMergePairs(
      spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(normText(col("text")), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // ONE bounded collect decides the path AND fetches the local
    // vocabulary (r22): ≤ cap+1 rows ever reach the driver — cap rows
    // mean the set is COMPLETE (train on it), cap+1 means truncated
    // (discard, take the distributed loop, which re-aggregates once).
    // The former persist().count() + collect() spent two jobs plus a
    // cache round-trip to learn the same thing.
    val head = vocab.limit(LocalVocabCap + 1).collect()
    if (head.length <= LocalVocabCap)
      localTrain(head.map(r => (r.getString(0), r.getLong(1))))
    else distributedTrain(
      vocab.select(markedChars(col("word")).as("s"), col("cnt")))
  }

  /** Driver-side greedy loop (textbook subword-nmt over token
    * vectors); identical tie-breaks to [[distributedTrain]]. */
  private[graft] def localTrain(
      vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    var words = vocab.map { case (w, c) => (w.toVector.map(_.toString), c) }
    val merges = Seq.newBuilder[(String, Long)]
    var done = false
    var round = 0
    while (round < TrainRounds && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = toks(i) + " " + toks(i + 1)
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, c) = counts.minBy { case (p, c) => (-c, p) }
        merges += ((pair, c))
        val Array(l, r) = pair.split(" ", 2)
        words = words.map { case (toks, cnt) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              buf += l + r; i += 2
            } else { buf += toks(i); i += 1 }
          }
          (buf.toVector, cnt)
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Cluster-side greedy loop over the start-marked vocabulary frame.
    *
    * Each round's frame goes through [[graft.Checkpoints.pin]], not a
    * bare persist: chained persists keep the full plan tree alive, and
    * a 20-deep nest of cached ADAPTIVE plans renders its explain
    * string at 2^rounds cost (each AQE level prints its child twice —
    * final + initial plan), which OOMs the driver on plan STRINGS
    * before any data moves. The pin truncates lineage to the
    * materialized blocks, so round r's plan is one Project over a
    * flat scan regardless of r. */
  private[graft] def distributedTrain(marked: DataFrame): Seq[(String, Long)] = {
    var cur = graft.Checkpoints.pin(marked)
    val merges = Seq.newBuilder[(String, Long)]
    var done = false
    var round = 0
    while (round < TrainRounds && !done) {
      val top = cur
        .select(explode(markedPairs(col("s"))).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("pair"))
        .limit(1).collect().headOption
      top match {
        case None => done = true
        case Some(r) =>
          val pair = r.getString(0)
          merges += ((pair, r.getLong(1)))
          cur = graft.Checkpoints.pin(
            cur.withColumn("s",
              call_function("replace", col("s"), lit(mergePattern(pair)),
                lit(mergeResult(pair)))))
      }
      round += 1
    }
    merges.result()
  }

  // ---------------------------------------------------------------------
  // #127 vocab_train — full multi-round BPE merge training
  // ---------------------------------------------------------------------

  def vocabTrain(spark: SparkSession, dir: String): DataFrame = {
    val rows = trainedMergePairs(spark, dir).zipWithIndex.map {
      case ((pair, c), i) =>
        val Array(l, r) = pair.split(" ", 2)
        Row(i + 1, l, r, c)
    }
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("merge_rank")
  }

  /** Per-round CTEs shared by both oracles: v0 (start-marked vocabulary),
    * then for each round r: pair explode → argmax → merge-applied
    * vocabulary. The LEFT JOIN + CASE keeps rounds past pair
    * exhaustion as no-ops, mirroring the Scala early stop. */
  private def trainCtes: String = {
    val v0 =
      s"""WITH toks AS MATERIALIZED (
        |  SELECT unnest(string_split($normSql, ' ')) AS word FROM documents
        |), vocab AS MATERIALIZED (
        |  SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
        |), v0 AS MATERIALIZED (
        |  SELECT regexp_replace(word, '(.)', '_\\1', 'g') AS s, cnt
        |  FROM vocab
        |)""".stripMargin
    val rounds = (1 to TrainRounds).map { r =>
      s""", p$r AS MATERIALIZED (
        |  SELECT unnest(list_transform(range(1, len(toks)), i ->
        |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS pair, cnt
        |  FROM (SELECT string_split(trim(replace(s, '_', ' ')), ' ') AS toks, cnt
        |        FROM v${r - 1})
        |), m$r AS MATERIALIZED (
        |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM p$r
        |  GROUP BY pair ORDER BY c DESC, pair LIMIT 1
        |), v$r AS MATERIALIZED (
        |  SELECT CASE WHEN m.pair IS NULL THEN v.s
        |         ELSE replace(v.s, '_' || replace(m.pair, ' ', '_'),
        |                      '_' || replace(m.pair, ' ', '')) END AS s,
        |    v.cnt
        |  FROM v${r - 1} v LEFT JOIN m$r m ON TRUE
        |)""".stripMargin
    }.mkString
    v0 + rounds
  }

  val vocabTrainSql: String = {
    val unions = (1 to TrainRounds).map { r =>
      s"""SELECT $r AS merge_rank, split_part(pair, ' ', 1) AS lhs,
        |  split_part(pair, ' ', 2) AS rhs, c AS pair_count FROM m$r""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\n")
    s"""$trainCtes
      |SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, pair_count
      |FROM ($unions)
      |ORDER BY merge_rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #128 text_bpe_tokens — tokenize the corpus with the learned merges
  // ---------------------------------------------------------------------

  /** BPE token count of a NORMALIZED text column under the learned
    * merges, as one codegen'd expression (marker count = token count:
    * every token carries exactly one '_', minus the n_words−1 '|'
    * guard tokens). Factored out (r21) so the corpus pipeline can
    * encode only its SURVIVOR set's `norm` column in place instead of
    * re-scanning and encoding the whole corpus and joining back. */
  private[operators] def bpeTokensOf(norm: Column,
                                     merges: Seq[(String, Long)]): Column = {
    val s0 = markedChars(call_function("replace", norm, lit(" "), lit("|")))
    val sFinal = merges.foldLeft(s0) { case (c, (pair, _)) =>
      call_function("replace", c, lit(mergePattern(pair)), lit(mergeResult(pair)))
    }
    (length(sFinal)
      - length(call_function("replace", sFinal, lit("_"), lit("")))
      - (size(split(norm, " ")) - 1))
  }

  /** Per-doc token accounting frame (doc_id, source, n_words,
    * n_chars, n_tokens) — the shared scan behind #128 and the
    * token-budget allocator (#129 in Corpus). Map-only. */
  private[operators] def tokenFrame(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMergePairs(spark, dir)
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        normText(col("text")).as("norm"))
    d.select(
      col("doc_id"),
      col("source"),
      col("lang"),
      size(split(col("norm"), " ")).as("n_words"),
      length(call_function("replace", col("norm"), lit(" "), lit("")))
        .as("n_chars"),
      bpeTokensOf(col("norm"), merges).as("n_tokens"))
  }

  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    tokenFrame(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_tokens"))
      .withColumn("compression_permille",
        expr("n_tokens * 1000L div n_chars"))
      .orderBy("doc_id")

  /** Training chain + 20 apply-CTEs ending at a per-doc frame
    * `tf(doc_id, source, n_words, n_chars, n_tokens)` — the SQL twin
    * of [[tokenFrame]], shared by #128's oracle and the token-budget
    * allocator's (#129). */
  private[operators] def tokenFrameCtes: String = {
    val applies = (1 to TrainRounds).map { r =>
      s""", e$r AS MATERIALIZED (
        |  SELECT doc_id, source, lang, norm,
        |    CASE WHEN m.pair IS NULL THEN e.s
        |         ELSE replace(e.s, '_' || replace(m.pair, ' ', '_'),
        |                      '_' || replace(m.pair, ' ', '')) END AS s
        |  FROM e${r - 1} e LEFT JOIN m$r m ON TRUE
        |)""".stripMargin
    }.mkString
    s"""$trainCtes, e0 AS MATERIALIZED (
      |  SELECT doc_id, source, lang, $normSql AS norm,
      |    regexp_replace(replace($normSql, ' ', '|'), '(.)', '_\\1', 'g') AS s
      |  FROM documents
      |)$applies, tf AS MATERIALIZED (
      |  SELECT doc_id, source, lang,
      |    CAST(len(string_split(norm, ' ')) AS INT) AS n_words,
      |    CAST(length(replace(norm, ' ', '')) AS INT) AS n_chars,
      |    CAST(length(s) - length(replace(s, '_', ''))
      |         - (len(string_split(norm, ' ')) - 1) AS INT) AS n_tokens
      |  FROM e$TrainRounds
      |)""".stripMargin
  }

  val bpeTokensSql: String =
    s"""$tokenFrameCtes
      |SELECT doc_id, n_words, n_chars, n_tokens,
      |  CAST(n_tokens AS BIGINT) * 1000 // n_chars AS compression_permille
      |FROM tf
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #150 vocab_fertility — tokenizer-economy audit by language
  // ---------------------------------------------------------------------

  /** Tokenizer fertility audit (the standard multilingual tokenizer-
    * economy metric — tokens per word — popularized by the BLOOM/XLM
    * tokenizer analyses): per LABELED language, corpus totals from
    * the SAME [[tokenFrame]] scan #128/#129 ride, plus the two
    * integer-permille ratios a tokenizer report needs — fertility
    * (1000·tokens/words; a language the vocab under-serves trends
    * toward character-fallback values near 1000·chars/words) and
    * chars-per-token (1000·chars/tokens, the compression the vocab
    * actually buys per language). One map-only scan + one #langs-row
    * aggregate; all-integer floor division (identical in DuckDB) with
    * a NULLIF guard so a degenerate empty slice reads NULL, never a
    * divide-by-zero. Invariants (BpeSpec): every word is at least one
    * token and every token at least one char, so both ratios are
    * ≥ 1000‰ by construction. */
  def vocabFertility(spark: SparkSession, dir: String): DataFrame =
    tokenFrame(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("words"),
        sum(col("n_chars").cast("long")).as("chars"),
        sum(col("n_tokens").cast("long")).as("tokens"))
      .withColumn("fertility_permille",
        expr("tokens * 1000L div nullif(words, 0L)"))
      .withColumn("chars_per_token_permille",
        expr("chars * 1000L div nullif(tokens, 0L)"))
      .orderBy("lang")

  val vocabFertilitySql: String =
    s"""$tokenFrameCtes
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_words) AS BIGINT) AS words,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  CAST(SUM(n_tokens) AS BIGINT) * 1000
      |    // NULLIF(CAST(SUM(n_words) AS BIGINT), 0) AS fertility_permille,
      |  CAST(SUM(n_chars) AS BIGINT) * 1000
      |    // NULLIF(CAST(SUM(n_tokens) AS BIGINT), 0) AS chars_per_token_permille
      |FROM tf
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_train" -> ((s, d) => vocabTrain(s, d)),
    "text_bpe_tokens" -> ((s, d) => bpeTokens(s, d)),
    "vocab_fertility" -> ((s, d) => vocabFertility(s, d)))

  val oracle: Map[String, String] = Map(
    "vocab_train" -> vocabTrainSql,
    "text_bpe_tokens" -> bpeTokensSql,
    "vocab_fertility" -> vocabFertilitySql)
}
