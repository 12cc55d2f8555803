package graft

import org.apache.spark.sql.functions._

/** Corpus-cleaning composition (#44) invariants. */
class CorpusSpec extends SparkSpec {

  test("every document gets exactly one verdict; tags only on kept docs") {
    val out = operators.Corpus.corpusClean(spark, sf)
    assert(out.count() === Tables.load(spark, sf, "documents").count())
    assert(out.filter(col("verdict") === "kept" && col("lang_tag").isNull)
      .count() === 0)
    assert(out.filter(col("verdict") =!= "kept" && col("lang_tag").isNotNull)
      .count() === 0)
  }

  test("corpus_pipeline: bin caps, eval exclusion, fertility bound, deterministic") {
    val C = operators.Corpus
    val out = C.corpusPipeline(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nDocs = r.getLong(2); val ws = r.getLong(3); val bpe = r.getLong(4)
      val firstDoc = r.getLong(5)
      // greedy packing: a bin only exceeds the cap when a single
      // oversized doc forced it
      if (nDocs > 1) assert(ws <= C.PackTokens)
      // every word is at least one BPE token (the fertility invariant)
      assert(bpe >= ws)
      // the eval split is decontamination reference, never pipeline
      // input — no bin can start at an eval doc
      assert(firstDoc % C.BenchmarkMod !== 0L)
    }
    // bin ids are the consecutive walk 0..n-1 within each source
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq)
    }
    // seeded shuffle + hash mixing: the composition is deterministic
    val again = C.corpusPipeline(spark, sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("corpus_pipeline: planted scenario drops exactly one doc per gate, hand-computed") {
    import spark.implicits._
    val C = operators.Corpus
    // One planted casualty per stage, everything hand-checkable:
    //  - 55 is the URL casualty: 55 % 101 == 55, so its synthesized
    //    url_key is 54 — a RECRAWL of doc 54's page under different
    //    noise (54: 'HTTPS://WWW.SRC14.EXAMPLE.COM/docs/article-54';
    //    55: 'https://www.src14.example.com:443/docs/article-54?utm_
    //    source=feed&gclid=XYZ') — both canonicalize to
    //    'https://src14.example.com/docs/article-54' and the min-id
    //    keeper drops 55 at stage 0 despite its quality-passing text;
    //  - 54 itself then fails quality (2 words), proving URL keeping
    //    is BLIND to content exactly like a real frontier;
    //  - 6 fails quality (2 words);
    //  - 1 and 2 are exact twins (same norm; 2's RAW text is longer,
    //    so keep-best must keep the HIGHER id — first-arrival would
    //    keep 1);
    //  - 3 and 4 are near-dups (12 words, only the last differs:
    //    10/12 shared shingles, J≈0.83); the higher id 4 drops;
    //  - 5 copies five consecutive words from eval doc 97 (bloom has
    //    no false negatives, so it MUST flag);
    //  - 97 is the eval split (97 % BenchmarkMod == 0): reference
    //    only, never pipeline input;
    //  - 7 and 8 are clean filler making the stage-4 survivor count
    //    EVEN, which at en=400‰ makes the mix quota exact (no floor
    //    loss) so stage 5 keeps all survivors.
    val d1 = "alpha bravo charlie delta echo foxtrot gamma hotelx india juliet kilo lima"
    val docs = Seq(
      (1L, d1),
      (2L, d1.toUpperCase.replace(" ", "  ")), // same norm, longer raw
      (3L, "mike november oscar papa qq rr ss tt uu vv ww one"),
      (4L, "mike november oscar papa qq rr ss tt uu vv ww two"),
      (5L, "c5a c5b xray yankee zulu quebec romeo c5c c5d c5e c5f c5g"),
      (6L, "tiny doc"),
      (7L, "f7a f7b f7c f7d f7e f7f f7g f7h f7i f7j f7k f7l"),
      (8L, "f8a f8b f8c f8d f8e f8f f8g f8h f8i f8j f8k f8l"),
      (54L, "recrawl stub"),
      (55L, "u55a u55b u55c u55d u55e u55f u55g u55h u55i u55j u55k u55l"),
      (97L, "xray yankee zulu quebec romeo sierra tango uniform victor whiskey aaa bbb"))
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s1"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val f = C.pipelineFrames(spark, dir)
    assert(ids(f.train) === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 54L, 55L))
    assert(ids(f.s0) === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 54L),
      "URL dedup must drop the recrawl twin, keeping the min-id fetch")
    assert(ids(f.q) === Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
    // single-source corpus = one-class training split: the classifier
    // stage must detect the degenerate model and pass through (scoring
    // with a log2fp(0) prior would be garbage-in)
    assert(ids(f.c) === ids(f.q), "one-class corpus must pass the classifier gate through")
    assert(ids(f.s2) === Set(2L, 3L, 4L, 5L, 7L, 8L), "keep-best must keep the longer raw twin")
    assert(ids(f.s3) === Set(2L, 3L, 5L, 7L, 8L), "near-dup must drop the higher id of the pair")
    assert(ids(f.s4) === Set(2L, 3L, 7L, 8L), "bloom must flag the eval-copying doc")
    assert(ids(f.s5) === Set(2L, 3L, 7L, 8L), "even survivor count at 400 permille keeps all")

    val audit = C.corpusPipelineAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(audit.toSeq === Seq(
      (0L, "input", 10L, 100L), (1L, "url_dedup", 9L, 88L),
      (2L, "quality", 7L, 84L), (3L, "classifier", 7L, 84L),
      (4L, "exact_dedup", 6L, 72L), (5L, "near_dup", 5L, 60L),
      (6L, "decontaminate", 4L, 48L), (7L, "mix", 4L, 48L)))

    val bins = C.corpusPipeline(spark, dir).collect()
    assert(bins.length === 1) // 48 tokens fit one 256-token bin
    val b = bins.head
    assert(b.getString(0) === "s1" && b.getLong(1) === 0L)
    assert(b.getLong(2) === 4L && b.getLong(3) === 48L)
    assert(b.getLong(4) >= 48L) // fertility: >= one BPE token per word
    assert(b.getLong(5) === 2L) // first_doc = the kept exact-twin rep
  }

  test("corpus_pipeline_audit: stage walk is monotone and coheres with the bins") {
    val C = operators.Corpus
    val audit = C.corpusPipelineAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(audit.map(t => (t._1, t._2)).toSeq === Seq(
      (0L, "input"), (1L, "url_dedup"), (2L, "quality"),
      (3L, "classifier"), (4L, "exact_dedup"), (5L, "near_dup"),
      (6L, "decontaminate"), (7L, "mix")))
    // every stage is a filter of its predecessor: docs and tokens
    // can only shrink
    audit.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew docs")
      assert(b._4 <= a._4, s"stage ${b._2} grew tokens")
    }
    // stage 0 is exactly the train split
    val train = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % C.BenchmarkMod =!= 0).count()
    assert(audit.head._3 === train)
    // the composition actually curates: some stage drops documents
    assert(audit.last._3 < audit.head._3)
    // the audit's final stage IS the packer's input: bins conserve
    // its docs and whitespace tokens exactly
    val bins = C.corpusPipeline(spark, sf).collect()
    assert(bins.map(_.getLong(2)).sum === audit.last._3)
    assert(bins.map(_.getLong(3)).sum === audit.last._4)

    // the caller-supplied-frames overload: a deployment running the
    // pipeline once audits the SAME materialization and gets the
    // identical report
    val fromFrames = C.auditFrom(C.pipelineFrames(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fromFrames.toSeq === audit.toSeq)
  }

  test("corpus_decontaminate_fuzzy flags exactly the train docs minhash-paired with a bench doc") {
    val mod = operators.Corpus.FuzzyBenchMod
    def isBench(id: Long) = id % mod == 0
    // the oracle-proven #29b pair join is the ground truth: a train doc
    // is contaminated iff it appears in a verified pair with a bench doc
    val pairs = operators.Dedup.dedupMinhashPoly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (pairs.collect { case (a, b, m) if !isBench(a) && isBench(b) => (a, b, m) } ++
      pairs.collect { case (a, b, m) if isBench(a) && !isBench(b) => (b, a, m) })
      .groupBy(_._1)
    val got = operators.Corpus.corpusDecontaminateFuzzy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val flagged = got.filter(_._2 == 1)
    assert(flagged.map(_._1).toSet === expected.keySet)
    flagged.foreach { case (id, _, n, best, bid) =>
      val g = expected(id)
      assert(n === g.length.toLong)
      assert(best === g.map(_._3).max)
      assert(bid === g.map(_._2).min)
    }
    // selective but non-vacuous; clean rows carry zeroed sentinels
    assert(flagged.nonEmpty && flagged.length < got.length / 5)
    got.filter(_._2 == 0).foreach { case (_, _, n, b, bid) =>
      assert(n === 0L && b === 0L && bid === -1L)
    }
  }

  test("corpus_exact_substr spans equal a brute-force recomputation") {
    val L = operators.Corpus.ExactSubstrLen
    // independent reference: collect the normalized docs, enumerate
    // every L-window, keep windows seen in >= 2 distinct docs, merge
    // per-doc positions into maximal spans
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        functions.TextFunctions.normText(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val winDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, t) <- docs; i <- 0 to t.length - L)
      winDocs.updateWith(t.substring(i, i + L)) {
        case Some(s) => Some(s + id); case None => Some(Set(id))
      }
    val dup = winDocs.filter(_._2.size >= 2).keySet
    val expected = docs.flatMap { case (id, t) =>
      val hits = (0 to t.length - L).filter(i => dup(t.substring(i, i + L)))
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (i <- hits) {
        // 1-based inclusive, matching the operator's substring positions
        val (s, e) = (i + 1L, i.toLong + L)
        if (spans.nonEmpty && s <= spans.last._2 + 1) {
          val last = spans.remove(spans.length - 1)
          spans += ((last._1, math.max(last._2, e)))
        } else spans += ((s, e))
      }
      spans.map { case (s, e) => (id, s, e, e - s + 1) }
    }.sortBy(r => (r._1, r._2))
    val got = operators.Corpus.corpusExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty) // corpus must actually exercise the operator
  }

  test("corpus_exact_substr_scrub excises exactly the operator's spans") {
    val spans = operators.Corpus.corpusExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(v => (v._2, v._3)).sorted).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        functions.TextFunctions.normText(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = operators.Corpus.corpusExactSubstrScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got.length === docs.size) // every doc is present
    got.foreach { case (id, nsp, rch, clean, cch) =>
      val t = docs(id)
      val sp = spans.getOrElse(id, Array.empty[(Long, Long)])
      // independent splice: drop [s, e] (1-based inclusive) segments
      val expected = {
        val sb = new StringBuilder; var pos = 1L
        for ((s, e) <- sp) { sb ++= t.substring(pos.toInt - 1, s.toInt - 1); pos = e + 1 }
        sb ++= t.substring(pos.toInt - 1); sb.toString
      }
      assert(clean === expected, s"doc $id")
      assert(nsp === sp.length.toLong)
      assert(rch === sp.map { case (s, e) => e - s + 1 }.sum)
      assert(cch === clean.length.toLong && cch === t.length - rch)
    }
    assert(got.exists(_._2 > 0)) // the corpus exercises the excision
  }

  test("corpus_shuffle is a deterministic seeded permutation; audit matches brute force") {
    val out = operators.Corpus.corpusShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = Tables.load(spark, sf, "documents").count()
    assert(out.map(_._1).toSeq === (1L to n)) // exact 1..N permutation
    assert(out.map(_._2).distinct.length === n.toInt)
    // the order is the LCG key order, reproducible across invocations
    val again = operators.Corpus.corpusShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq === out.map(t => (t._1, t._2)).toSeq)
    // actually shuffles: not the identity order (a multiplier that
    // never wraps the modulus degenerates to exactly that)
    assert(out.map(_._2).toSeq !== out.map(_._2).sorted.toSeq)
    // a different seed produces a different permutation
    val other = operators.Corpus.corpusShuffle(spark, sf, seed = 777L)
      .collect().map(_.getLong(1))
    assert(other.toSeq !== out.map(_._2).toSeq)
    // audit equals a brute-force scan of the shuffled order
    val bySrc = out.sortBy(_._1).map(_._3)
    val adjExpected = bySrc.zip(bySrc.tail).filter(p => p._1 == p._2)
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val audit = operators.Corpus.corpusShuffleAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._2).sum === n)
    audit.foreach { case (src, _, adj) =>
      assert(adj === adjExpected.getOrElse(src, 0L), s"source $src")
    }
  }

  test("corpus_exact_substr spans are maximal: >= L chars, disjoint with a gap") {
    val L = operators.Corpus.ExactSubstrLen
    val got = operators.Corpus.corpusExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (_, s, e, n) =>
      assert(n >= L && n === e - s + 1)
    }
    got.groupBy(_._1).values.foreach { spans =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1) // merged iff touching
        case _ =>
      }
    }
  }

  test("near-dup drops are exactly the Jaccard pair higher ids") {
    val out = operators.Corpus.corpusClean(spark, sf)
    val dropped = out.filter(col("verdict") === "near_dup")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = operators.Dedup.dedupJaccard(spark, sf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(dropped === expected)
  }

  test("kept docs survive all three gates") {
    val out = operators.Corpus.corpusClean(spark, sf)
    val kept = out.filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quality = graft.functions.TextFunctions.quality(spark, sf)
      .filter(col("quality_ok") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(quality))
  }

  test("leak report: per-bench saturation equals a brute-force recompute and inverts #55") {
    val C = operators.Corpus
    // normalized texts via the operator's own kernel (the gram ALGEBRA
    // is what this recomputes independently — sliding windows, set
    // intersections, counts in plain Scala)
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        functions.TextFunctions.normText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < C.DecontamN) Set.empty
      else w.sliding(C.DecontamN).map(_.mkString(" ")).toSet
    }
    val g = d.map { case (id, t) => id -> grams(t) }
    val bench = g.filter(_._1 % C.BenchmarkMod == 0)
    val train = g.filter(_._1 % C.BenchmarkMod != 0)
    val got = C.corpusLeakReport(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.map(_._1).toSet === bench.keySet, "one row per bench doc")
    got.foreach { case (b, nGrams, nTrainDocs, nLeaked, witness, permille) =>
      val bg = bench(b)
      val hitters = train.filter { case (_, tg) => (tg & bg).nonEmpty }
      val leaked = bg.filter(gr => train.values.exists(_.contains(gr)))
      assert(nGrams === bg.size.toLong, s"bench $b n_grams")
      assert(nTrainDocs === hitters.size.toLong, s"bench $b n_train_docs")
      assert(nLeaked === leaked.size.toLong, s"bench $b n_leaked_grams")
      assert(witness === (if (hitters.isEmpty) None else Some(hitters.keys.min)),
        s"bench $b witness")
      assert(permille ===
        (if (bg.isEmpty) None else Some(leaked.size.toLong * 1000 / bg.size)),
        s"bench $b permille")
    }
    // inversion vs #55: every contaminated train doc's witness bench
    // must report at least one hitting train doc no later than it
    val flags = C.corpusDecontaminate(spark, sf)
      .filter(col("contaminated") === 1)
      .select("doc_id", "bench_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byBench = got.map(t => t._1 -> t).toMap
    flags.foreach { case (t, b) =>
      val row = byBench(b)
      assert(row._3 >= 1L && row._5.exists(_ <= t), s"train $t vs bench $b")
    }
    // the corpus actually plants leakage (or the report is untested)
    assert(got.exists(_._3 > 0), "no bench doc leaks at this SF")
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    val out = operators.Corpus.corpusDecontaminate(spark, sf)
    val docs = Tables.load(spark, sf, "documents").count()
    val benchDocs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0).count()
    // benchmark docs are excluded from the output
    assert(out.count() === docs - benchDocs)
    assert(out.filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0)
      .count() === 0)
    // an exact copy of a benchmark doc MUST be flagged: every doc's
    // text equal to a benchmark doc's normalized text is contaminated
    val norm = graft.functions.TextFunctions.normText(col("text"))
    val d = Tables.load(spark, sf, "documents").select(col("doc_id"), norm.as("n"))
    val benchTexts = d.filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0)
      .select(col("n").as("bn"))
    val copies = d.join(benchTexts, col("n") === col("bn"))
      .filter(col("doc_id") % operators.Corpus.BenchmarkMod =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (copies.nonEmpty) {
      val flagged = out.filter(col("contaminated") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(copies.subsetOf(flagged))
    }
    // flag agrees with n_shared; bench_id present iff contaminated
    assert(out.filter(col("contaminated") === 1 && col("n_shared") < 1).count() === 0)
    assert(out.filter(col("contaminated") === 0 &&
      (col("n_shared") > 0 || col("bench_id").isNotNull)).count() === 0)
  }

  test("content-keyed split: duplicates co-locate, ratios near 90/5/5") {
    val out = operators.Corpus.corpusSplit(spark, sf)
    // identical normalized content -> identical split (no leakage)
    val dups = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
      .join(out, Seq("doc_id"))
      .groupBy("norm").agg(countDistinct("split").as("nsplits"))
    assert(dups.filter(col("nsplits") > 1).count() === 0)
    // buckets in range; train is the large majority
    assert(out.filter(col("bucket") < 0 || col("bucket") > 99).count() === 0)
    val n = out.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.8 && train / n < 0.97, s"train=${train / n}")
  }

  test("passage dedup: first occurrence survives, later copies drop") {
    import spark.implicits._
    val w = operators.Corpus.PassageWords
    val shared = (1 to w).map(i => s"tok$i").mkString(" ")
    val uniqueA = (1 to w).map(i => s"aa$i").mkString(" ")
    val uniqueB = (1 to w).map(i => s"bb$i").mkString(" ")
    // doc 1 = shared + uniqueA; doc 2 = shared + uniqueB (boilerplate
    // header repeated across pages); doc 3 = a short tail-only doc
    val docs = Seq(
      (1L, s"$shared $uniqueA"), (2L, s"$shared $uniqueB"),
      (3L, "tiny tail doc")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-passage").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.Corpus.corpusPassageDedup(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((2L, 2L, s"$shared $uniqueA"))) // first copy: all kept
    assert(out(2L) === ((2L, 1L, uniqueB))) // shared passage dropped
    assert(out(3L) === ((1L, 1L, "tiny tail doc"))) // short docs intact
  }

  test("sequence packing: bins respect the token cap, docs stay in order") {
    val cap = operators.Corpus.PackTokens
    val out = operators.Corpus.corpusPack(spark, sf).collect()
    // every multi-doc bin is under the cap (an oversize single doc may
    // exceed it — it occupies the bin alone, like the reference sink)
    out.filter(_.getLong(2) > 1).foreach(r =>
      assert(r.getLong(3) <= cap, r.toString))
    // bins are dense per source, starting at 0
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.toSeq === (0L until bins.length).toSeq)
    }
    // greedy invariant: a bin plus its successor's first doc would
    // breach the cap (otherwise the successor would have joined it) —
    // checked via total conservation: token sums match the corpus
    val total = out.map(_.getLong(3)).sum
    val expected = Tables.load(spark, sf, "documents")
      .select(size(split(
        graft.functions.TextFunctions.normText(col("text")), " "))
        .cast("long").as("t"))
      .agg(sum("t")).collect().head.getLong(0)
    assert(total === expected)
  }

  test("domain cap: at most DomainCap kept per source, by n_chars priority") {
    val out = operators.Corpus.corpusDomainCap(spark, sf)
    val cap = operators.Corpus.DomainCap
    val perSource = out.filter(col("kept") === 1)
      .groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= cap))
    // every kept doc outranks (longer-or-equal) every dropped doc of
    // its source
    val worstKept = out.filter(col("kept") === 1)
      .groupBy("source").agg(min("n_chars").as("min_kept"))
    val bestDropped = out.filter(col("kept") === 0)
      .groupBy("source").agg(max("n_chars").as("max_dropped"))
    val bad = worstKept.join(bestDropped, "source")
      .filter(col("max_dropped") > col("min_kept"))
    assert(bad.count() === 0)
  }

  test("chunks tile every doc: stride positions, caps, and end coverage") {
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.normText(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val out = operators.Corpus.corpusChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val W = operators.Corpus.ChunkWords
    val S = operators.Corpus.ChunkStride
    out.groupBy(_._1).foreach { case (doc, chunks) =>
      val words = texts(doc)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0 until sorted.length))
      sorted.foreach { case (_, k, n, text) =>
        val expect = words.slice(k * S, math.min(k * S + W, words.length))
        assert(text === expect.mkString(" "), s"doc $doc chunk $k")
        assert(n === expect.length)
      }
      // the last chunk reaches the end of the doc; no useless extra
      val last = sorted.last
      assert(last._2 * S + last._3 === words.length)
      if (sorted.length > 1)
        assert((sorted.length - 2) * S + W < words.length)
    }
    assert(out.map(_._1).toSet === texts.keySet)
  }

  test("bloom decontamination never misses an exactly-contaminated doc") {
    val exact = operators.Corpus.corpusDecontaminate(spark, sf)
      .filter(col("contaminated") === 1)
      .select("doc_id", "n_shared").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    val bloom = operators.Corpus.corpusDecontaminateBloom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val flagged = bloom.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    // no false negatives: every truly shared n-gram lights all K of
    // its own positions, so exact ⇒ bloom-flagged with at least as
    // many gram hits
    exact.foreach { case (doc, nShared) =>
      assert(flagged.contains(doc), s"doc $doc exact but not bloom-flagged")
      assert(flagged(doc) >= nShared, s"doc $doc hits ${flagged(doc)} < $nShared")
    }
    // both sides cover the same train split
    assert(bloom.length ===
      operators.Corpus.corpusDecontaminate(spark, sf).count())
  }

  test("overlap matrix covers every ordered source pair with exact containment algebra") {
    val out = operators.Corpus.corpusOverlap(spark, sf).collect()
    val nSrc = Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(out.length.toLong === nSrc * (nSrc - 1) / 2)
    out.foreach { r =>
      val (sa, sb, shared, ta, tb, pm) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sa < sb)
      assert(shared <= math.min(ta, tb))
      assert(pm === shared * 1000 / math.min(ta, tb))
    }
  }

  test("overlap counts a planted cross-source duplicate exactly once") {
    import spark.implicits._
    // sf0.001 has no cross-source exact dups (overlap is all zeros
    // there), so plant one: the same text under two sources, plus a
    // within-source dup pair that must NOT count toward overlap
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    Seq(
      (1L, "shared page text", "en", "srcA", 16L),
      (2L, "shared page text", "en", "srcB", 16L),
      (3L, "only in a", "en", "srcA", 9L),
      (4L, "only in a", "en", "srcA", 9L),
      (5L, "only in b", "en", "srcB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = operators.Corpus.corpusOverlap(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) === ("srcA", "srcB"))
    assert(r.getLong(2) === 1L) // the planted shared text, counted once
    assert(r.getLong(3) === 2L) // srcA distinct texts (dup pair collapses)
    assert(r.getLong(4) === 2L)
    assert(r.getLong(5) === 500L) // 1 of min(2,2) in permille
  }

  test("token budget water-fill: exact sum, per-source bounds, fairness") {
    val out = operators.Corpus.corpusTokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val budget = total / operators.Corpus.TokenBudgetDen
    // the allocation spends the budget EXACTLY (remainder distributed)
    assert(out.map(_._4).sum === budget)
    out.foreach { case (src, toks, level, alloc, pm) =>
      assert(alloc <= toks, s"$src over-allocated")
      // max-min fairness: either fully kept (small source) or pinned
      // to the water level (+1 for remainder slots)
      assert(alloc === toks || alloc === level || alloc === level + 1,
        s"$src alloc $alloc not fair for toks=$toks level=$level")
      if (toks <= level) assert(alloc === toks, s"$src under level but cut")
      assert(pm === alloc * 1000 / toks)
    }
  }

  test("token budget keeps a small source whole while capping large ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-budget").toString
    // tiny source (one short doc) vs two fat sources: the fair level
    // must exceed the tiny source's total, so it survives uncut
    val docs =
      Seq((1L, "tiny doc here", "en", "small", 13L)) ++
        (2L to 41L).map(i => (i, "a much longer document with many words " +
          s"repeated $i times over", "en", if (i % 2 == 0) "fatA" else "fatB", 60L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = operators.Corpus.corpusTokenBudget(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (smallToks, smallAlloc) = out("small")
    assert(smallAlloc === smallToks) // fully kept
    val (fatToks, fatAlloc) = out("fatA")
    assert(fatAlloc < fatToks) // capped
  }

  test("profile histogram median equals the sort-based lower median") {
    val out = operators.Corpus.corpusProfile(spark, sf).collect()
    val byGroup = Tables.load(spark, sf, "documents")
      .select(col("source"), col("lang"), length(col("text")).as("nc"))
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    assert(out.nonEmpty && out.length === byGroup.size)
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val ncs = byGroup(k).map(_.getInt(2)).sorted
      assert(r.getLong(2) === ncs.length.toLong)           // n_docs
      assert(r.getLong(4) === ncs.map(_.toLong).sum)       // total_chars
      assert(r.getInt(5) === ncs.head)                     // min_chars
      assert(r.getInt(6) === ncs.last)                     // max_chars
      assert(r.getInt(7) === ncs((ncs.length + 1) / 2 - 1)) // lower median
    }
  }
}
