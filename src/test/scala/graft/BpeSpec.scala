package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** BPE tokenizer family (#127 vocab_train, #128 text_bpe_tokens):
  * the operators are a string-replace encoding of classic subword
  * BPE, so the spec proves the encoding against an independent
  * token-VECTOR reference implementation (trained and applied the
  * textbook way — no strings-with-markers anywhere). */
class BpeSpec extends SparkSpec {

  /** Textbook BPE: greedy pair counting over a weighted vocabulary,
    * leftmost non-overlapping merge application. */
  private def refTrain(vocab: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var words: Map[String, (Vector[String], Long)] =
      vocab.map { case (w, c) => w -> (w.toVector.map(_.toString), c) }
    val merges = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (toks, c) =>
        (0 until toks.length - 1).foreach { i =>
          val k = (toks(i), toks(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count; ties by the smallest "l r" string (the operator's
        // orderBy(desc(c), asc(pair)) contract)
        val ((l, rr), c) = counts.toSeq
          .minBy { case ((l, rr), c) => (-c, s"$l $rr") }
        merges += ((l, rr, c))
        words = words.map { case (w, (toks, cnt)) =>
          val buf = ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rr) {
              buf += l + rr; i += 2
            } else { buf += toks(i); i += 1 }
          }
          w -> (buf.toVector, cnt)
        }
      }
      r += 1
    }
    (merges.result(), words.map { case (w, (toks, _)) => w -> toks })
  }

  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  test("trained merge table equals the textbook reference, round for round") {
    val vocab = Tables.load(spark, sf, "documents")
      .select(explode(split(functions.TextFunctions.normText(col("text")), " "))
        .as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expected, _) = refTrain(vocab, operators.Bpe.TrainRounds)
    val got = operators.Bpe.vocabTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }

  test("encoded token counts equal the reference tokenizer applied per word") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)))
    val vocab = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val (_, tokenized) = refTrain(vocab, operators.Bpe.TrainRounds)
    val expected = docs.map { case (id, n) =>
      id -> n.split(" ").map(w => tokenized(w).length).sum
    }.toMap
    val out = operators.Bpe.bpeTokens(spark, sf).collect()
    assert(out.length === docs.length)
    out.foreach { r =>
      val (id, nWords, nChars, nToks) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(nToks === expected(id), s"doc $id")
      assert(nToks <= nChars) // merges only ever shrink
      assert(nToks >= nWords) // every word is at least one token
      assert(r.getLong(4) === nToks.toLong * 1000 / nChars)
    }
  }

  test("round-1 merge is vocab_merges' top candidate (the #103 twin)") {
    val top103 = operators.Ngrams.vocabMerges(spark, sf).collect().head
    val r1 = operators.Bpe.vocabTrain(spark, sf).collect().head
    assert(r1.getString(1) + r1.getString(2) === top103.getString(0))
    assert(r1.getLong(3) === top103.getLong(1))
  }

  test("local and distributed training paths produce identical merges") {
    // the size switch must never change results: force both paths on
    // the same vocabulary and compare the full merge tables
    val vocabDf = Tables.load(spark, sf, "documents")
      .select(explode(split(functions.TextFunctions.normText(col("text")), " "))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val local = operators.Bpe.localTrain(
      vocabDf.collect().map(r => (r.getString(0), r.getLong(1))))
    val marked = vocabDf.select(
      regexp_replace(col("word"), "(.)", "_$1").as("s"), col("cnt"))
    val distributed = operators.Bpe.distributedTrain(marked)
    assert(local === distributed)
  }

  test("vocab_fertility: per-lang totals reconcile with the per-doc frame; ratios respect the structural floors") {
    val perDoc = operators.Bpe.bpeTokens(spark, sf)
      .select("n_words", "n_chars", "n_tokens").collect()
    val fert = operators.Bpe.vocabFertility(spark, sf).collect()
    // totals across languages = totals across docs (no doc lost or
    // double-counted by the lang grouping)
    assert(fert.map(_.getLong(fert.head.fieldIndex("n_docs"))).sum ===
      perDoc.length.toLong)
    assert(fert.map(_.getLong(fert.head.fieldIndex("tokens"))).sum ===
      perDoc.map(_.getInt(2).toLong).sum)
    assert(fert.map(_.getLong(fert.head.fieldIndex("words"))).sum ===
      perDoc.map(_.getInt(0).toLong).sum)
    assert(fert.map(_.getLong(fert.head.fieldIndex("chars"))).sum ===
      perDoc.map(_.getInt(1).toLong).sum)
    // structural floors: every word is >= 1 token (merges never cross
    // the word guard) and every token >= 1 char, so both permille
    // ratios are >= 1000 for every language
    fert.foreach { r =>
      assert(r.getLong(r.fieldIndex("fertility_permille")) >= 1000L,
        s"fertility < 1 token/word for ${r.getString(0)}")
      assert(r.getLong(r.fieldIndex("chars_per_token_permille")) >= 1000L,
        s"token longer than its chars for ${r.getString(0)}")
    }
  }

  test("marker-anchored replace is one exact BPE merge round") {
    import spark.implicits._
    val cases = Seq(
      // consecutive occurrences both merge (original-string scan)
      ("_a_t_a_t", "_a_t", "_at", "_at_at"),
      // shared-token overlap resolves leftmost-first: [a,a,a] -> [aa,a]
      ("_a_a_a", "_a_a", "_aa", "_aa_a"),
      // a pattern must NOT match a token SUFFIX: tokens [sp, ar]
      ("_sp_ar", "_p_ar", "_par", "_sp_ar"),
      // nor bridge the '|' word guard: tokens [o, |, w]
      ("_o_|_w", "_o_w", "_ow", "_o_|_w"))
    cases.foreach { case (s, pat, rep, want) =>
      val got = Seq(s).toDF("s")
        .select(call_function("replace", col("s"), lit(pat), lit(rep)))
        .collect().head.getString(0)
      assert(got === want, s"replace($s, $pat, $rep)")
    }
  }
}
