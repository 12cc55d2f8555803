package graft

import graft.operators.{Corpus, Similarity, Url}
import org.apache.spark.sql.functions._

/** Round-15 additions: URL canonicalization/dedup, temperature-scaled
  * mixing, split drift audit, embedding decontamination. The DuckDB
  * oracle proves cross-engine value equality; these specs pin the
  * SEMANTIC invariants the oracle can't state. */
class CorpusExtrasSpec extends SparkSpec {

  test("url canon: scheme/host lowered, tracking/fragment/default-port gone, params sorted") {
    val rows = Url.urlCanon(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val canon = r.getAs[String]("canon_url")
      assert(!canon.contains("#"), s"fragment survived: $canon")
      assert(!canon.contains("utm_"), s"tracking param survived: $canon")
      assert(!canon.contains("gclid"), s"tracking param survived: $canon")
      assert(!canon.contains(":80/") && !canon.endsWith(":80"), canon)
      assert(!canon.contains(":443"), canon)
      val scheme = canon.split("://")(0)
      assert(scheme == scheme.toLowerCase)
      val host = r.getAs[String]("host")
      assert(host == host.toLowerCase && !host.startsWith("www."))
      // non-root path never ends in '/'
      val afterScheme = canon.split("://")(1)
      val pathStart = afterScheme.indexOf('/')
      val pathAndQuery = afterScheme.substring(pathStart)
      val path = pathAndQuery.split("\\?")(0)
      if (path != "/") assert(!path.endsWith("/"), canon)
      // surviving params sorted
      if (canon.contains("?")) {
        val ps = canon.split("\\?")(1).split("&").toSeq
        assert(ps == ps.sorted, s"params unsorted: $canon")
        assert(ps.forall(_.nonEmpty))
      }
    }
  }

  test("url canon: variants differing only in noise collapse to one canonical form") {
    // doc_ids congruent mod 60 share (source, scheme, id, query shape)
    // and differ only in port/slash/fragment noise — their canonical
    // URLs must be identical while the raw URLs differ.
    val byCanon = Url.urlCanon(spark, sf)
      .withColumn("cls", col("doc_id") % 60)
      .groupBy("cls")
      .agg(countDistinct("canon_url").as("n_canon"),
        countDistinct("url").as("n_raw"), count(lit(1)).as("n"))
      .collect()
    byCanon.foreach { r =>
      assert(r.getAs[Long]("n_canon") == 1L,
        s"class ${r.get(0)} split into ${r.get(1)} canonical forms")
    }
    // and the canonicalization is not vacuous: some class has raw variety
    assert(byCanon.exists(r => r.getAs[Long]("n_raw") > 1L))
  }

  test("url dedup: exactly one keeper per canonical URL, keeper is min doc_id") {
    val d = Url.urlDedup(spark, sf)
    val perUrl = d.groupBy("canon_url").agg(
      sum("kept").as("keepers"),
      min("doc_id").as("min_id"),
      max(when(col("kept") === 1, col("doc_id"))).as("kept_id"),
      count(lit(1)).as("n"), max("n_variants").as("nv")).collect()
    perUrl.foreach { r =>
      assert(r.getAs[Long]("keepers") == 1L)
      assert(r.getAs[Long]("kept_id") == r.getAs[Long]("min_id"))
      assert(r.getAs[Long]("n") == r.getAs[Long]("nv"))
    }
    assert(perUrl.exists(_.getAs[Long]("n") > 1L), "no duplicates exercised")
  }

  test("url filter: rule precedence, planted casualties caught, canon-driven blocking") {
    val v = Url.urlFilter(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
        r.getAs[String]("verdict"))).toSeq
    val byId = v.map(t => t._1 -> t._3).toMap
    v.foreach { case (id, host, verdict) =>
      val expected =
        if (Url.BlockedHosts.contains(host)) "blocked_domain"
        else if (id % 13 == 0) "banned_word"   // planted /Casino-bonus
        else if (id % 17 == 0) "bad_extension" // planted .exe
        else "kept"
      assert(verdict == expected, s"doc $id host $host")
    }
    // precedence is exercised, not just defined: a doc that is BOTH
    // blocked-domain (host src4 = id%20==4) and spam-path (id%13==0)
    // must fall to the domain rule — id 104 is the smallest such.
    // contains() first: forall alone is vacuously true if the corpus
    // ever shrinks below doc 104 (ADVICE r15)
    assert(byId.contains(104L), "precedence case doc 104 missing from corpus")
    assert(byId(104L) == "blocked_domain")
    Seq("blocked_domain", "banned_word", "bad_extension", "kept").foreach { w =>
      assert(v.exists(_._3 == w), s"verdict $w never exercised")
    }
  }

  test("temperature mix: kept = min(n, target), √-flattening vs proportional") {
    val m = Corpus.corpusMixTemperature(spark, sf)
    val perLang = m.groupBy("lang").agg(
      count(lit(1)).as("n"), max("target_l").as("target"),
      sum("kept").as("kept")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n"),
        r.getAs[Long]("target"), r.getAs[Long]("kept"))).toSeq
    val total = perLang.map(_._2).sum
    val budget = total * Corpus.MixTemperatureBudgetPermille / 1000
    // recompute the quota with the operator's own published formula
    val w = perLang.map { case (_, n, _, _) =>
      math.floor(math.sqrt(n.toDouble) *
        Corpus.MixTemperatureWeightScale).toLong }
    val bigW = w.sum
    perLang.zip(w).foreach { case ((lang, n, target, kept), wl) =>
      assert(target == math.min(n, budget * wl / bigW), lang)
      assert(kept == math.min(n, target), lang)
    }
    assert(perLang.map(_._3).sum <= budget)
    // temperature property: the dominant stratum's kept SHARE is below
    // its corpus share; the scarcest stratum's is above.
    val dom = perLang.maxBy(_._2)
    val tail = perLang.minBy(_._2)
    assert(dom._4.toDouble / budget < dom._2.toDouble / total,
      "dominant lang not downweighted")
    assert(tail._4.toDouble / budget > tail._2.toDouble / total,
      "scarce lang not upweighted")
  }

  test("drift: descending order, top entry positive, deterministic") {
    val rows = Corpus.corpusDrift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Corpus.DriftTopK)
    val drifts = rows.map(_.getAs[Long]("drift_q10")).toSeq
    assert(drifts == drifts.sortBy(-_))
    assert(drifts.head > 0, "no over-represented train token found")
    val toks = rows.map(_.getAs[String]("tok")).toSeq
    assert(toks.distinct.size == toks.size)
    val again = Corpus.corpusDrift(spark, sf).collect()
      .map(_.getAs[Long]("drift_q10")).toSeq
    assert(again == drifts)
  }

  test("unigram segmentation matches an independent driver-side Viterbi") {
    import graft.operators.Unigram._
    // rebuild the model with plain Scala loops — nothing shared with
    // the Column/SQL formulation except the published constants
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val words = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    val pieceCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; l <- 1 to MaxPieceLen; s <- 0 to w.length - l)
      pieceCounts(w.substring(s, s + l)) =
        pieceCounts.getOrElse(w.substring(s, s + l), 0L) + c
    val chars = pieceCounts.filter(_._1.length == 1)
    val multi = pieceCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(SubK)
    val kept = chars.toMap ++ multi.toMap
    val n = kept.values.sum
    // the operator's log2fp kernel, reimplemented straight off its doc
    def log2fp(x: Long): Long = {
      val bits = java.lang.Long.toBinaryString(x).length
      val mant = if (bits > 11) x / (1L << (bits - 11)) else x * (1L << (11 - bits))
      1024L * (bits - 1) + math.floor(1024 *
        (StrictMath.log(mant.toDouble / 1024) / StrictMath.log(2.0))).toLong
    }
    val cost = kept.map { case (p, c) => p -> (log2fp(n) - log2fp(c)) }
    def viterbi(w: String): Long = {
      val dp = Array.fill(w.length + 1)(Long.MaxValue)
      dp(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(MaxPieceLen, i)) {
        cost.get(w.substring(i - l, i)).foreach { pc =>
          if (dp(i - l) != Long.MaxValue)
            dp(i) = math.min(dp(i), dp(i - l) + pc * EncBase + 1)
        }
      }
      dp(w.length)
    }
    val got = unigramTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == words.size)
    got.foreach { case (w, cnt, np, cq) =>
      assert(cnt == words(w))
      val best = viterbi(w)
      assert(np == best % EncBase, s"word $w pieces")
      assert(cq == best / EncBase, s"word $w cost")
      assert(np >= 1 && np <= w.length)
    }
    // segmentation is non-trivial: some word needs >1 piece, some
    // multi-char piece wins somewhere
    assert(got.exists(_._3 > 1))
    assert(got.exists { case (w, _, np, _) => np < w.length })
  }

  test("vocab_unigram: chars all kept, multi-char capped, costs monotone in count") {
    import graft.operators.Unigram._
    val inv = vocabUnigram(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap(
        _.getString(0).trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val chars = words.flatMap(_.toSeq).toSet
    // every corpus character is in the inventory (the segmentability
    // guarantee the DP relies on); multi-char pieces respect the cap
    assert(chars.subsetOf(inv.filter(_._1.length == 1).map(_._1.head).toSet))
    assert(inv.count(_._1.length > 1) <= SubK)
    assert(inv.forall(p => p._1.length <= MaxPieceLen && p._2 > 0 && p._3 >= 0))
    // cost is anti-monotone in count (same log2fp kernel both ways)
    inv.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, s"${a._1} vs ${b._1}")
      case _ =>
    }
  }

  test("vocab_unigram_em matches an independent driver-side hard-EM recompute") {
    import graft.operators.Unigram._
    // seed model: plain-Scala rebuild, nothing shared with the
    // Column/SQL formulation (the Viterbi test's construction)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val words = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    val pieceCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; l <- 1 to MaxPieceLen; s <- 0 to w.length - l)
      pieceCounts(w.substring(s, s + l)) =
        pieceCounts.getOrElse(w.substring(s, s + l), 0L) + c
    val charSet = pieceCounts.keySet.filter(_.length == 1).toSet
    val seedMulti = pieceCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(SubK)
    val seedKept = pieceCounts.filter(_._1.length == 1).toMap ++ seedMulti.toMap
    def log2fp(x: Long): Long = {
      val bits = java.lang.Long.toBinaryString(x).length
      val mant = if (bits > 11) x / (1L << (bits - 11)) else x * (1L << (11 - bits))
      1024L * (bits - 1) + math.floor(1024 *
        (StrictMath.log(mant.toDouble / 1024) / StrictMath.log(2.0))).toLong
    }
    def recost(counts: Map[String, Long]): Map[String, Long] = {
      val n = counts.values.sum
      counts.map { case (p, c) => p -> (log2fp(n) - log2fp(c)) }
    }
    // one hard-EM round: Viterbi under `costs`, back-walk with the
    // SHORTEST-matching-length tie-break, frequency-weighted counts,
    // char floor 1, 4/5 prune of used multis, recost
    def emRoundRef(costs: Map[String, Long]): Map[String, Long] = {
      val Max = Long.MaxValue
      def dpArr(w: String): Array[Long] = {
        val dp = Array.fill(w.length + 1)(Max)
        dp(0) = 0L
        for (i <- 1 to w.length; l <- 1 to math.min(MaxPieceLen, i))
          costs.get(w.substring(i - l, i)).foreach { pc =>
            if (dp(i - l) != Max)
              dp(i) = math.min(dp(i), dp(i - l) + pc * EncBase + 1)
          }
        dp
      }
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words if w.length < EncBase) {
        val dp = dpArr(w)
        var i = w.length
        while (i > 0) {
          val l = (1 to MaxPieceLen).find { l =>
            i - l >= 0 && costs.get(w.substring(i - l, i)).exists(pc =>
              dp(i - l) != Max && dp(i - l) + pc * EncBase + 1 == dp(i))
          }.get
          val p = w.substring(i - l, i)
          used(p) = used.getOrElse(p, 0L) + c
          i -= l
        }
      }
      val charCounts = charSet.map(p =>
        p -> math.max(used.getOrElse(p, 0L), 1L)).toMap
      val mult = used.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
      val keepN = math.max(mult.size * EmKeepNum.toInt / EmKeepDen.toInt, 1)
      charCounts ++ mult.take(keepN).toMap
    }
    var counts = seedKept
    var costs = recost(seedKept)
    for (_ <- 1 to EmIters) {
      counts = emRoundRef(costs)
      costs = recost(counts)
    }
    val got = vocabUnigramEm(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === counts.keySet)
    got.foreach { case (p, c, cq) =>
      assert(c === counts(p), s"piece $p count")
      assert(cq === costs(p), s"piece $p cost")
    }
    // EM refines, not just relabels: the inventory shrank vs the seed,
    // multi-char pieces survive, and chars are all still present
    assert(got.length < seedKept.size)
    assert(got.exists(_._1.length > 1))
    assert(charSet.subsetOf(got.map(_._1).toSet))
  }

  test("embed decontamination LSH path: precision 1.0, measured recall, drop-in schema") {
    val exact = Similarity.corpusDecontaminateEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getInt(3))).sortBy(_._1)
    val lsh = Similarity.corpusDecontaminateEmbedLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getInt(3))).sortBy(_._1)
    // drop-in: same train-vector set, same schema
    assert(lsh.map(_._1).toSeq == exact.map(_._1).toSeq)
    val exactBy = exact.map(t => t._1 -> t).toMap
    lsh.foreach { case (id, nHits, witness, contaminated) =>
      val (_, eHits, _, eCont) = exactBy(id)
      // precision 1.0: every LSH hit passed the exact gate, so LSH can
      // never flag a vector the exact path wouldn't, nor find MORE hits
      assert(nHits <= eHits, s"vec $id")
      assert(contaminated <= eCont, s"vec $id")
      assert(contaminated == (if (nHits > 0) 1 else 0))
      // any reported witness is a TRUE gated pair (subset of exact
      // hits), even when the exact path's min witness was missed
      if (nHits > 0) assert(witness.isDefined && eHits > 0)
    }
    // recall: bucketed candidates must find most of the exact flags
    val flaggedExact = exact.count(_._4 == 1)
    val flaggedLsh = lsh.count(_._4 == 1)
    assert(flaggedExact > 0)
    assert(flaggedLsh * 10 >= flaggedExact * 6,
      s"recall collapsed: $flaggedLsh of $flaggedExact")
    info(s"lsh recall: $flaggedLsh/$flaggedExact flagged vectors")
  }

  test("unigram fertility: every lang covered, both ratios >= 1000 permille") {
    import graft.operators.Unigram._
    val rows = unigramFertility(spark, sf).collect()
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == langs)
    rows.foreach { r =>
      val (words, chars, pieces) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pieces >= words, r.toString) // every word >= 1 piece
      assert(chars >= pieces, r.toString) // every piece >= 1 char
      assert(r.getLong(4) >= 1000L && r.getLong(5) >= 1000L)
    }
  }

  test("embed decontamination matches a local brute-force recomputation") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray))
      .sortBy(_._1)
    val evs = all.filter(_._1 % 10 == 0)
    def nn(v: Array[Long]) = v.map(x => x * x).sum
    val expected = all.filter(_._1 % 10 != 0).map { case (id, v) =>
      val hits = evs.filter { case (_, e) =>
        val dot = v.zip(e).map { case (a, b) => a * b }.sum
        dot >= 0 && Constants.CosGateNum * dot * dot >= Constants.CosGateThr * nn(v) * nn(e)
      }.map(_._1)
      (id, hits.length.toLong, if (hits.isEmpty) None else Some(hits.min))
    }
    val got = Similarity.corpusDecontaminateEmbed(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_hits"),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getAs[Int]("contaminated")))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gi, gn, gw, gc), (ei, en, ew)) =>
      assert(gi == ei); assert(gn == en, s"vec $gi")
      assert(gw == ew, s"vec $gi witness")
      assert(gc == (if (en > 0) 1 else 0))
    }
    assert(expected.exists(_._2 > 0), "no contamination exercised at sf0.001")
  }
}
