package graft

/** #181–183 WordPiece family: training, greedy segmentation and
  * fertility re-derived by independent Scala loops (independent
  * log2fp included), plus the local/distributed path pin and the
  * reconstruction invariants. */
class WordpieceSpec extends SparkSpec {

  /** Independent log2fp (loop-and-Long, the LmScoreSpec discipline). */
  private def log2fp(x: Long): Long = {
    require(x >= 1)
    val q = functions.TextFunctions.LogQ
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val mant =
      if (bits > 11) x / (1L << (bits - 11)) else x * (1L << (11 - bits))
    val idx = (mant - q).toInt
    val t = math.floor(
      q * (StrictMath.log((q + idx).toDouble / q) / StrictMath.log(2.0))).toLong
    q.toLong * (bits - 1) + t
  }

  private def normalize(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  private lazy val vocab: Map[String, Long] =
    Tables.load(spark, sf, "documents").select("text").collect()
      .flatMap(r => normalize(r.getString(0)).split(" "))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }

  /** Independent WordPiece trainer: '^'-marked tokens, likelihood
    * argmax log2fp(cp) − log2fp(cl) − log2fp(cr), ties pair-asc. */
  private lazy val expMerges: Seq[(String, Long, Long)] = {
    var words = vocab.toSeq.map { case (w, c) =>
      (w.toVector.zipWithIndex.map { case (ch, i) =>
        if (i == 0) "^" + ch else ch.toString
      }, c)
    }
    val out = Seq.newBuilder[(String, Long, Long)]
    for (_ <- 1 to operators.Wordpiece.TrainRounds) {
      val pairs = scala.collection.mutable.Map.empty[String, Long]
      val toks = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (ts, c) =>
        ts.foreach(t => toks(t) = toks.getOrElse(t, 0L) + c)
        ts.sliding(2).filter(_.size == 2)
          .foreach(p => pairs(p.mkString(" ")) = pairs.getOrElse(p.mkString(" "), 0L) + c)
      }
      if (pairs.nonEmpty) {
        val scored = pairs.toSeq.map { case (p, cp) =>
          val Array(l, r) = p.split(" ", 2)
          (p, cp, log2fp(cp) - log2fp(toks(l)) - log2fp(toks(r)))
        }
        val (pair, cp, sc) = scored.minBy { case (p, _, s) => (-s, p) }
        out += ((pair, cp, sc))
        val Array(l, r) = pair.split(" ", 2)
        words = words.map { case (ts, c) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
              buf += l + r; i += 2
            } else { buf += ts(i); i += 1 }
          }
          (buf.toVector, c)
        }
      }
    }
    out.result()
  }

  private def disp(raw: String): String =
    if (raw.startsWith("^")) raw.drop(1) else "##" + raw

  test("vocab_wordpiece matches the independent likelihood-argmax trainer") {
    val got = operators.Wordpiece.vocabWordpiece(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    val exp = expMerges.zipWithIndex.map { case ((pair, cp, sc), i) =>
      val Array(l, r) = pair.split(" ", 2)
      (i + 1, disp(l + r), disp(l), disp(r), cp, sc)
    }
    assert(got == exp)
    // the likelihood criterion is NOT plain frequency: scores must be
    // the fixed-point log-likelihood of each selected pair
    assert(got.map(_._6).forall(_ != 0L))
  }

  test("distributed training path equals the driver loop") {
    import org.apache.spark.sql.functions._
    val marked = Tables.load(spark, sf, "documents")
      .select(explode(split(functions.TextFunctions.normText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("_^"), expr("substring(word, 1, 1)"),
        regexp_replace(expr("substring(word, 2)"), "(.)", "_$1")).as("s"),
        col("cnt"))
    val dist = operators.Wordpiece.distributedTrain(marked)
    val local = operators.Wordpiece.localTrain(vocab.toSeq)
    assert(dist == local)
    assert(local == expMerges)
  }

  test("text_wordpiece_tokens: greedy longest-match matches; pieces reconstruct words") {
    // independent inventory + greedy march
    val inv = (vocab.keys.flatMap { w =>
      w.zipWithIndex.map { case (c, i) => if (i == 0) "^" + c else c.toString }
    }.toSet ++ expMerges.map(_._1.replace(" ", ""))).toSet
    val maxL = inv.map(_.stripPrefix("^").length).max
    def greedy(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val l = (math.min(maxL, w.length - pos) to 1 by -1).find { l =>
          val sym = w.substring(pos, pos + l)
          inv.contains(if (pos == 0) "^" + sym else sym)
        }.get // l = 1 always matches: the word's own chars seed the alphabet
        out += (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
        pos += l
      }
      out.toSeq
    }
    val got = operators.Wordpiece.wordpieceTokens(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val exp = vocab.toSeq.sortBy(_._1).map { case (w, c) =>
      val ps = greedy(w)
      (w, c, ps.size, ps.mkString(" "))
    }
    assert(got == exp)
    // reconstruction: stripping '##' and joining yields the word back;
    // exactly the first piece is unmarked
    got.foreach { case (w, _, n, pieces) =>
      val ps = pieces.split(" ").toSeq
      assert(ps.size == n)
      assert(ps.head.nonEmpty && !ps.head.startsWith("##"))
      assert(ps.tail.forall(_.startsWith("##")), s"$w: $pieces")
      assert(ps.head + ps.tail.map(_.drop(2)).mkString == w)
    }
  }

  test("vocab_wordpiece_fertility: per-language rollup from occurrences") {
    val segN = operators.Wordpiece.wordpieceTokens(spark, sf).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    val occ = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .flatMap(r => normalize(r.getString(2)).split(" ").filter(_.nonEmpty)
        .map(w => (r.getLong(0), r.getString(1), w)))
    val exp = occ.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, g) =>
      val words = g.length.toLong
      val pieces = g.map(t => segN(t._3).toLong).sum
      (lang, g.map(_._1).distinct.length.toLong, words, pieces,
        pieces * 1000 / words)
    }
    val got = operators.Wordpiece.wordpieceFertility(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // every word is at least one piece: fertility ≥ 1000‰
    got.foreach { case (lang, _, _, _, f) => assert(f >= 1000L, lang) }
  }
}
