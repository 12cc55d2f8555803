package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece tokenizer family (SURVEY §2 #181–183) — the THIRD major
  * subword family next to BPE (#127/#128/#150) and Unigram-LM
  * (#163–165/#171): BERT's tokenizer (Schuster & Nakajima 2012; Wu et
  * al. 2016 §4.1; the HuggingFace WordPieceTrainer formulation).
  * WordPiece differs from BPE on BOTH halves:
  *
  *  - TRAINING selects the merge maximizing the likelihood score
  *    count(l,r) / (count(l) · count(r)) — the pair whose fusion most
  *    exceeds its parts' independence — not raw pair frequency. The
  *    score is computed as log2fp(c_pair) − log2fp(c_l) − log2fp(c_r)
  *    on the #136 fixed-point kernel, so the argmax compares BIGINTs
  *    both engines compute bit-identically (ties: lexicographically
  *    smallest pair, the #127 rule); the quantized score IS the
  *    model's definition here, so cross-engine determinism is exact
  *    by construction.
  *  - INFERENCE is greedy longest-match-first against the final piece
  *    inventory with `##` continuation marking — a DIFFERENT
  *    segmentation algorithm from training's merge replay (BERT's
  *    actual runtime behavior), so the inventory export and the
  *    tokenizer are separately verified.
  *
  * Word-initial vs continuation pieces are DISTINCT symbols with
  * distinct counts (BERT's `un` vs `##un`): the marked-string encoding
  * (#127's '_' token markers) carries this as a '^' prefix INSIDE the
  * first token — "hello" → "_^h_e_l_l_o" — so the same literal-replace
  * merge kernel BPE proved SQL-exact applies unchanged while `^h` and
  * `h` count separately everywhere. The corpus normalizer emits only
  * [a-z0-9 ], so '^' (like '_'/'|') cannot occur in a word. Display
  * form strips '^' for initial pieces and prefixes '##' otherwise.
  *
  * Scale design is #127's: training never touches corpus rows after
  * the ONE vocabulary aggregation (word types, bounded by the
  * language); under [[Bpe.LocalVocabCap]] types the greedy loop runs
  * on the driver over the KB-scale vocab, above it distributed with
  * per-round pins — same algorithm, same tie-breaks. Inference is
  * vocabulary-collapsed too: the greedy fold runs once per word TYPE
  * over the broadcast inventory (≤ charset·2 + rounds symbols), and
  * word occurrences rejoin their type (#165's move).
  */
object Wordpiece {

  /** Merge rounds learned. */
  val TrainRounds = 20

  private def norm(c: org.apache.spark.sql.Column) = TextFunctions.normText(c)
  private val normSql = TextFunctions.normTextSql

  /** Display form: '^'-marked initial pieces print bare, continuation
    * pieces with BERT's '##'. */
  private def disp(raw: String): String =
    if (raw.startsWith("^")) raw.drop(1) else "##" + raw

  private def wordVocab(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(split(norm(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** "hello" → tokens ["^h","e","l","l","o"]. */
  private def markedTokens(w: String): Vector[String] =
    w.toVector.zipWithIndex.map { case (c, i) =>
      if (i == 0) "^" + c else c.toString
    }

  private def mergePattern(pair: String): String = "_" + pair.replace(" ", "_")
  private def mergeResult(pair: String): String = "_" + pair.replace(" ", "")

  /** Learned merges: (pair "l r", pair count, score_fp) in rank
    * order. Driver loop under the vocab cap, distributed above it —
    * the #127 dual path with the WordPiece argmax. */
  private[graft] def trainedWpMerges(
      spark: SparkSession, dir: String): Seq[(String, Long, Long)] = {
    val vocab = wordVocab(spark, dir)
    val types = vocab.persist().count()
    val out =
      if (types <= Bpe.LocalVocabCap)
        localTrain(vocab.collect().map(r => (r.getString(0), r.getLong(1))))
      else distributedTrain(vocab.select(
        concat(lit("_^"), expr("substring(word, 1, 1)"),
          regexp_replace(expr("substring(word, 2)"), "(.)", "_$1")).as("s"),
        col("cnt")))
    vocab.unpersist()
    out
  }

  /** Driver-side greedy loop; identical tie-breaks to the distributed
    * path (score desc, pair asc). */
  private[graft] def localTrain(
      vocab: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    var words = vocab.map { case (w, c) => (markedTokens(w), c) }
    val merges = Seq.newBuilder[(String, Long, Long)]
    var done = false
    var round = 0
    while (round < TrainRounds && !done) {
      val pairs = scala.collection.mutable.Map.empty[String, Long]
      val toks = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (ts, c) =>
        ts.foreach(t => toks(t) = toks.getOrElse(t, 0L) + c)
        var i = 0
        while (i < ts.length - 1) {
          val k = ts(i) + " " + ts(i + 1)
          pairs(k) = pairs.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val lg = TextFunctions.log2fpLong _
        val scored = pairs.map { case (p, cp) =>
          val Array(l, r) = p.split(" ", 2)
          (p, cp, lg(cp) - lg(toks(l)) - lg(toks(r)))
        }
        val (pair, cp, score) = scored.minBy { case (p, _, s) => (-s, p) }
        merges += ((pair, cp, score))
        val Array(l, r) = pair.split(" ", 2)
        words = words.map { case (ts, cnt) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
              buf += l + r; i += 2
            } else { buf += ts(i); i += 1 }
          }
          (buf.toVector, cnt)
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Cluster-side loop over the marked vocabulary frame: per round one
    * token-count aggregate, one pair-count aggregate, one scored
    * argmax (all vocabulary-sized), then the narrow merge map over the
    * pinned frame (#127's Checkpoints discipline). */
  private[graft] def distributedTrain(
      marked: DataFrame): Seq[(String, Long, Long)] = {
    val lg = TextFunctions.log2fpExpr _
    var cur = graft.Checkpoints.pin(marked)
    val merges = Seq.newBuilder[(String, Long, Long)]
    var done = false
    var round = 0
    while (round < TrainRounds && !done) {
      val toks = cur
        .select(explode(split(trim(translate(col("s"), "_", " ")), " "))
          .as("tok"), col("cnt"))
        .groupBy("tok").agg(sum("cnt").as("c"))
      val pairs = cur
        .select(explode(TextFunctions.word_ngrams(
          trim(translate(col("s"), "_", " ")), 2)).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("cp"))
      val top = pairs
        .join(toks.select(col("tok"), col("c").as("lc")),
          expr("tok = split_part(pair, ' ', 1)"))
        .join(toks.select(col("tok").as("rtok"), col("c").as("rc")),
          expr("rtok = split_part(pair, ' ', 2)"))
        .select(col("pair"), col("cp"),
          (expr(lg("cp")) - expr(lg("lc")) - expr(lg("rc"))).as("score_fp"))
        .orderBy(desc("score_fp"), asc("pair"))
        .limit(1).collect().headOption
      top match {
        case None => done = true
        case Some(r) =>
          val pair = r.getString(0)
          merges += ((pair, r.getLong(1), r.getLong(2)))
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
  // #181 vocab_wordpiece — likelihood-scored merge training
  // ---------------------------------------------------------------------

  def vocabWordpiece(spark: SparkSession, dir: String): DataFrame = {
    val rows = trainedWpMerges(spark, dir).zipWithIndex.map {
      case ((pair, cp, score), i) =>
        val Array(l, r) = pair.split(" ", 2)
        Row(i + 1, disp(l + r), disp(l), disp(r), cp, score)
    }
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("piece", StringType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false),
      StructField("score_fp", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("merge_rank")
  }

  /** Per-round oracle CTEs: v0 ('^'-marked start-marked vocabulary),
    * then per round token counts → pair counts → scored argmax →
    * merge apply (LEFT JOIN no-op past pair exhaustion, #127's
    * pattern). */
  private def trainCtes: String = {
    val lg = TextFunctions.log2fpSqlDuck _
    val v0 =
      s"""toks AS MATERIALIZED (
         |  SELECT unnest(string_split($normSql, ' ')) AS word FROM documents
         |), vocab AS MATERIALIZED (
         |  SELECT word, COUNT(*) AS cnt FROM toks WHERE word <> '' GROUP BY word
         |), v0 AS MATERIALIZED (
         |  SELECT '_^' || substring(word, 1, 1) ||
         |    regexp_replace(substring(word, 2), '(.)', '_\\1', 'g') AS s, cnt
         |  FROM vocab
         |)""".stripMargin
    val rounds = (1 to TrainRounds).map { r =>
      s""", tk$r AS MATERIALIZED (
         |  SELECT tok, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT unnest(string_split(trim(replace(s, '_', ' ')), ' ')) AS tok, cnt
         |    FROM v${r - 1}
         |  ) GROUP BY tok
         |), p$r AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cp FROM (
         |    SELECT unnest(list_transform(range(1, len(tks)), i ->
         |      tks[CAST(i AS INT)] || ' ' || tks[CAST(i AS INT) + 1])) AS pair, cnt
         |    FROM (SELECT string_split(trim(replace(s, '_', ' ')), ' ') AS tks, cnt
         |          FROM v${r - 1})
         |  ) GROUP BY pair
         |), m$r AS MATERIALIZED (
         |  SELECT pair, cp, ${lg("cp")} - ${lg("lc")} - ${lg("rc")} AS score_fp
         |  FROM (
         |    SELECT p.pair, p.cp, l.c AS lc, r2.c AS rc
         |    FROM p$r p
         |    JOIN tk$r l ON l.tok = split_part(p.pair, ' ', 1)
         |    JOIN tk$r r2 ON r2.tok = split_part(p.pair, ' ', 2)
         |  )
         |  ORDER BY score_fp DESC, pair LIMIT 1
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

  /** SQL display form over a raw-symbol expression. */
  private def dispSql(raw: String): String =
    s"CASE WHEN substring($raw, 1, 1) = '^' THEN substring($raw, 2) " +
      s"ELSE '##' || $raw END"

  val vocabWordpieceSql: String = {
    val unions = (1 to TrainRounds).map { r =>
      s"""SELECT $r AS merge_rank, replace(pair, ' ', '') AS praw,
         |  split_part(pair, ' ', 1) AS lraw, split_part(pair, ' ', 2) AS rraw,
         |  cp AS pair_count, score_fp FROM m$r""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\n")
    s"""WITH $trainCtes
       |SELECT CAST(merge_rank AS INT) AS merge_rank,
       |  ${dispSql("praw")} AS piece, ${dispSql("lraw")} AS lhs,
       |  ${dispSql("rraw")} AS rhs, pair_count, score_fp
       |FROM ($unions)
       |ORDER BY merge_rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #182 text_wordpiece_tokens — greedy longest-match segmentation
  // ---------------------------------------------------------------------

  /** The final piece inventory as raw symbols: the alphabet (every
    * '^c' / 'c' form the vocabulary exhibits) plus every merge result
    * — real WordPiece vocabularies keep ALL merge products, including
    * ones later merges subsume. Model-sized: ≤ 2·charset + rounds. */
  /** Frozen-model inventory for admission-time consumers (#192's
    * streaming twin): train once, hand back (pieces, max piece len). */
  private[graft] def frozenInventory(spark: SparkSession,
                                     dir: String): (Seq[String], Int) =
    inventory(spark, dir, trainedWpMerges(spark, dir))

  private def inventory(spark: SparkSession, dir: String,
      merges: Seq[(String, Long, Long)]): (Seq[String], Int) = {
    val alpha = wordVocab(spark, dir)
      .select(explode(expr(
        """transform(sequence(1, length(word)), i ->
          |  CASE WHEN i = 1 THEN concat('^', substring(word, i, 1))
          |       ELSE substring(word, i, 1) END)""".stripMargin)).as("tok"))
      .distinct().collect().map(_.getString(0)).toSeq
    val inv = (alpha ++ merges.map(_._1.replace(" ", ""))).distinct.sorted
    (inv, inv.map(_.stripPrefix("^").length).max)
  }

  /** Greedy longest-match fold over columns (word, inv): at each
    * uncovered position take the LONGEST inventory symbol matching
    * ('^'-form at position 1), append its display form. A match always
    * exists at l = 1 — the vocabulary's own characters seed the
    * alphabet — so in-vocab words never need an [UNK] (spec-pinned). */
  private[graft] def segFoldSql(maxL: Int): String = {
    def lFind =
      s"""aggregate(sequence($maxL, 1, -1), 0, (b, l) ->
         |  CASE WHEN b > 0 THEN b
         |       WHEN a.pos + l - 1 <= length(word) AND array_contains(inv,
         |         CASE WHEN a.pos = 1 THEN concat('^', substring(word, a.pos, l))
         |              ELSE substring(word, a.pos, l) END)
         |       THEN l ELSE 0 END)""".stripMargin
    s"""aggregate(sequence(1, length(word)),
       |  named_struct('pos', 1, 'n', 0, 'out', ''),
       |  (a, i) -> IF(i <> a.pos, a, named_struct(
       |    'pos', a.pos + $lFind,
       |    'n', a.n + 1,
       |    'out', concat(a.out, ' ',
       |      CASE WHEN a.pos = 1 THEN '' ELSE '##' END,
       |      substring(word, a.pos, $lFind)))),
       |  a -> a)""".stripMargin
  }

  /** Unordered per-word segmentation (word, cnt, n_pieces, pieces) —
    * shared by #182 (adds the sort) and #183's rollup. */
  private def segmented(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedWpMerges(spark, dir)
    val (inv, maxL) = inventory(spark, dir, merges)
    wordVocab(spark, dir)
      .withColumn("inv", typedlit(inv))
      .withColumn("seg", expr(segFoldSql(maxL)))
      .select(col("word"), col("cnt"),
        expr("seg.n").cast("int").as("n_pieces"),
        expr("trim(seg.out)").as("pieces"))
  }

  def wordpieceTokens(spark: SparkSession, dir: String): DataFrame =
    segmented(spark, dir).orderBy("word")

  /** Training chain + inventory + the greedy march as a recursive CTE
    * (the #163 recursion pattern: pos advances by the longest match,
    * completed rows stop at pos = length + 1). */
  private def segCtes: String = {
    val mergeUnions = (1 to TrainRounds)
      .map(r => s"SELECT replace(pair, ' ', '') AS tok FROM m$r")
      .mkString(" UNION ")
    s"""$trainCtes, alpha AS (
       |  SELECT DISTINCT CASE WHEN i = 1 THEN '^' ELSE '' END ||
       |    substring(word, CAST(i AS INT), 1) AS tok
       |  FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM vocab)
       |), inv AS MATERIALIZED (
       |  SELECT list(DISTINCT tok) AS pieces,
       |    CAST(MAX(length(replace(tok, '^', ''))) AS BIGINT) AS maxl
       |  FROM (SELECT tok FROM alpha UNION $mergeUnions)
       |), seg AS (
       |  SELECT word, cnt, CAST(1 AS BIGINT) AS pos, 0 AS n, '' AS out
       |  FROM vocab
       |  UNION ALL
       |  SELECT word, cnt, pos + l, n + 1,
       |    out || ' ' || CASE WHEN pos = 1 THEN '' ELSE '##' END ||
       |      substring(word, CAST(pos AS INT), CAST(l AS INT))
       |  FROM (
       |    SELECT s.word, s.cnt, s.pos, s.n, s.out,
       |      list_max(list_filter(range(1, i.maxl + 1), l ->
       |        s.pos + l - 1 <= length(s.word) AND list_contains(i.pieces,
       |          CASE WHEN s.pos = 1 THEN '^' ELSE '' END ||
       |            substring(s.word, CAST(s.pos AS INT), CAST(l AS INT))))) AS l
       |    FROM seg s, inv i
       |    WHERE s.pos <= length(s.word)
       |  )
       |)""".stripMargin
  }

  val wordpieceTokensSql: String =
    s"""WITH RECURSIVE $segCtes
       |SELECT word, cnt, CAST(n AS INT) AS n_pieces, trim(out) AS pieces
       |FROM seg WHERE pos = length(word) + 1
       |ORDER BY word""".stripMargin

  // ---------------------------------------------------------------------
  // #183 vocab_wordpiece_fertility — per-language tokenizer economy
  // ---------------------------------------------------------------------

  /** The #150/#165 fertility audit for the third family: word
    * occurrences rejoin their type's greedy segmentation (the
    * vocabulary-collapsed fold never reruns per occurrence), one
    * #langs-row aggregate. All three tokenizer families now report
    * the same per-language economy metric. */
  def wordpieceFertility(spark: SparkSession, dir: String): DataFrame = {
    val seg = segmented(spark, dir).select("word", "n_pieces")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(norm(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(seg, "word")
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("words"),
        sum(col("n_pieces").cast("long")).as("pieces"))
      .withColumn("fertility_permille",
        expr("pieces * 1000L div nullif(words, 0L)"))
      .orderBy("lang")
  }

  val wordpieceFertilitySql: String =
    s"""WITH RECURSIVE $segCtes, occ AS (
       |  SELECT doc_id, lang, word FROM (
       |    SELECT doc_id, lang, unnest(string_split($normSql, ' ')) AS word
       |    FROM documents
       |  ) WHERE word <> ''
       |)
       |SELECT o.lang, CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS words,
       |  CAST(SUM(g.n) AS BIGINT) AS pieces,
       |  CAST(SUM(g.n) AS BIGINT) * 1000
       |    // NULLIF(CAST(COUNT(*) AS BIGINT), 0) AS fertility_permille
       |FROM occ o JOIN (
       |  SELECT word, n FROM seg WHERE pos = length(word) + 1
       |) g USING (word)
       |GROUP BY o.lang
       |ORDER BY o.lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_wordpiece" -> ((s, d) => vocabWordpiece(s, d)),
    "text_wordpiece_tokens" -> ((s, d) => wordpieceTokens(s, d)),
    "vocab_wordpiece_fertility" -> ((s, d) => wordpieceFertility(s, d)))

  val oracle: Map[String, String] = Map(
    "vocab_wordpiece" -> vocabWordpieceSql,
    "text_wordpiece_tokens" -> wordpieceTokensSql,
    "vocab_wordpiece_fertility" -> wordpieceFertilitySql)
}
