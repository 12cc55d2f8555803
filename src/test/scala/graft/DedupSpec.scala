package graft

import org.apache.spark.sql.functions._

/** Dedup family (#28–32) invariants at sf0.001 (500 docs / 500 vecs —
  * same table sizes as sf0.01 for these tables). */
class DedupSpec extends SparkSpec {

  test("dedup_exact keeps one id per fingerprint and covers the corpus") {
    val out = operators.Dedup.dedupExact(spark, sf)
    val docs = Tables.load(spark, sf, "documents").count()
    assert(out.agg(sum("n_dups")).collect().head.getLong(0) === docs)
    assert(out.select("fingerprint").distinct().count() === out.count())
  }

  test("jaccard pairs are symmetric-free and above threshold") {
    val out = operators.Dedup.dedupJaccard(spark, sf).collect()
    out.foreach { r =>
      val (a, b, shared, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(5 * shared >= 4 * (na + nb - shared))
      assert(shared <= math.min(na, nb))
    }
  }

  test("prefix-filtered jaccard equals the undamped inverted-index join") {
    // The prefix filter is exact, not heuristic: candidates generated
    // from each doc's rarest `nt - ⌈0.8·nt⌉ + 1` tokens must yield the
    // IDENTICAL J ≥ 0.8 pair set as indexing every token (the
    // AllPairs/PPJoin theorem). Recompute the undamped join inline at
    // test scale and compare full rows.
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        functions.TextFunctions.normText(col("text")).as("norm"))
      .select(col("doc_id"), col("lang"), col("source"),
        array_sort(array_distinct(split(col("norm"), " "))).as("toks"))
      .withColumn("nt", size(col("toks")))
      .select(col("doc_id"), col("lang"), col("source"), col("nt"),
        explode(col("toks")).as("tok"))
    val undamped = d.as("a")
      .join(d.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.nt")).as("na"), first(col("b.nt")).as("nb"))
      .filter(lit(5) * col("shared") >= lit(4) * (col("na") + col("nb") - col("shared")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong, r.getInt(4).toLong))
      .toSet
    val damped = operators.Dedup.dedupJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(damped === undamped)
  }

  test("jaccard prefix filtering bounds the candidate join") {
    // Damping invariants: every doc indexes only its prefix tokens
    // (≈ 0.2·nt + 1 of the rarest), and the candidate-pair count never
    // exceeds the undamped inverted-index pair count.
    val pfx = operators.Dedup.jaccardPrefix(spark, sf)
    val perDoc = pfx.groupBy("doc_id")
      .agg(count(lit(1)).as("np"), first("nt").as("nt"))
      .collect()
    perDoc.foreach { r =>
      val (np, nt) = (r.getLong(1), r.getInt(2))
      assert(np === nt - ((4 * nt + 4) / 5) + 1,
        s"doc ${r.getLong(0)}: prefix $np of $nt tokens")
      assert(np <= nt)
    }
    val nDocs = Tables.load(spark, sf, "documents").count()
    val cand = operators.Dedup.jaccardCandidates(spark, sf).count()
    assert(cand < nDocs * (nDocs - 1) / 2, s"candidates $cand not damped")
  }

  test("minhash signature length and determinism") {
    val sigs = operators.Dedup.minhashSignatures(spark, sf)
      .select("doc_id", "sig").limit(5).collect()
    sigs.foreach(r => assert(r.getSeq[Long](1).length === operators.Dedup.MinhashSeeds))
    val again = operators.Dedup.minhashSignatures(spark, sf)
      .select("doc_id", "sig").limit(5).collect()
    assert(sigs.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("minhash candidates are high-estimated-similarity pairs") {
    val out = operators.Dedup.dedupMinhash(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) * 2 >= operators.Dedup.MinhashSeeds)
    }
  }

  test("simhash pairs respect the hamming cap and are found by banding") {
    val out = operators.Dedup.dedupSimhash(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) <= operators.Dedup.MaxHamming))
  }

  test("portable-hash minhash finds the same near-dup pairs as xxhash64 minhash") {
    val fast = operators.Dedup.dedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val poly = operators.Dedup.dedupMinhashPoly(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(poly.nonEmpty)
    // different hash families, same banding algebra: the planted
    // near-dup pairs must be found by both (probabilistic candidates
    // may differ at the margin, so compare the intersection floor)
    val agree = (fast & poly).size.toDouble / math.max(fast.size, poly.size)
    assert(agree >= 0.8, s"agreement=$agree fast=${fast.size} poly=${poly.size}")
  }

  test("portable-hash simhash agrees with xxhash64 simhash on near-dup pairs") {
    val fast = operators.Dedup.dedupSimhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val poly = operators.Dedup.dedupSimhashPoly(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(poly.nonEmpty)
    assertBandingAgreement(fast, poly)
  }

  private def assertBandingAgreement(fast: Set[(Long, Long)],
                                     poly: Set[(Long, Long)]): Unit = {
    // different hash families AND signature widths (64-bit/hamming≤3
    // vs 30-bit/hamming≤2 — the narrower signature is the looser bar,
    // so poly legitimately admits extra marginal pairs): the check is
    // that poly COVERS the tighter xxhash64 pair set
    val coverage = (fast & poly).size.toDouble / fast.size
    assert(coverage >= 0.7, s"coverage=$coverage fast=${fast.size} poly=${poly.size}")
  }

  test("simhash near-dups are a subset of minhash near-dups") {
    val mh = operators.Dedup.dedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = operators.Dedup.dedupSimhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.subsetOf(mh))
  }

  test("embedding near-dup threshold is exact integer math") {
    val out = operators.Dedup.dedupEmbedding(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dot, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dot >= 0)
      assert(400L * dot * dot >= 49L * na * nb)
    }
  }

  test("lsh-bucketed embedding near-dup: exact precision, majority recall") {
    val exact = operators.Dedup.dedupEmbedding(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = operators.Dedup.dedupEmbeddingLsh(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // precision is 1.0 by construction (same exact verify)
    assert(lsh.subsetOf(exact))
    // 1-bit multi-probe over 4 planes recovers a majority of true pairs
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("lsh pair emission is unique by construction (the removed dropDuplicates)") {
    // The r11 plan drops the pair dedup on a proof: the index side
    // lands in its exact bucket, the probe side fans out DISTINCT xor
    // masks, so a fixed pair collides on exactly one mask and the
    // vec_id ordering pins which side indexes. If banding or probing
    // ever changes that, duplicate rows appear here first.
    val rows = operators.Dedup.dedupEmbeddingLsh(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length,
      s"${rows.length - rows.distinct.length} duplicate pairs emitted")
    // and the mask set itself is duplicate-free at representative
    // plane counts (the combinatorial generator's invariant)
    Seq(4, 8, 20).foreach { p =>
      val masks = operators.Dedup.probeMasks(p, 2)
      assert(masks.length === masks.distinct.length)
      assert(masks.length === 1 + p + p * (p - 1) / 2)
      assert(masks.forall(m => java.lang.Integer.bitCount(m) <= 2))
    }
  }

  test("dedup_clusters matches a brute-force union-find of the pair graph") {
    val pairs = operators.Dedup.dedupMinhashPoly(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // driver-side union-find over the (tiny) collected pair list
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => d -> find(d)).toMap
    val out = operators.Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = out.map(t => t._1 -> t._2).toMap
    // every doc present exactly once; suspects carry the component
    // minimum, singletons label themselves
    assert(out.length === Tables.load(spark, sf, "documents").count())
    expected.foreach { case (d, root) =>
      assert(got(d) === root, s"doc $d: got ${got(d)}, expected $root")
    }
    out.foreach { case (d, c, canon) =>
      assert(c <= d)
      if (!expected.contains(d)) assert(c === d)
      assert(canon === (if (d == c) 1 else 0))
    }
    // exactly one canonical doc per cluster
    val canonical = out.filter(_._3 == 1).map(_._1).toSet
    assert(canonical === out.map(_._2).toSet)
  }

  test("connectedComponents resolves a 40-hop chain (deeper than any fixed round cap)") {
    // chain-shaped components (serial crawls of one article) defeat
    // per-round min-label propagation under ANY fixed round cap: a
    // 40-hop chain needs 40 propagation rounds but only ~log₂(40)
    // large-star/small-star rounds. Ids are permuted (i·37 mod 41) so
    // min-labels must travel AGAINST the chain direction too.
    import spark.implicits._
    def perm(i: Long): Long = (i * 37) % 41
    val pairs = (0L until 40L).map(i => (perm(i), perm(i + 1))).toDF("a", "b")
    val labels = operators.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one component, minimum id 0: every non-root node labels 0
    assert(labels.size === 40)
    assert(labels.values.toSet === Set(0L))
    assert(!labels.contains(0L))
    // and a multi-component graph keeps components separate
    val two = Seq((5L, 9L), (9L, 7L), (20L, 30L)).toDF("a", "b")
    val l2 = operators.Dedup.connectedComponents(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 === Map(9L -> 5L, 7L -> 5L, 30L -> 20L))
  }

  test("dedup_fuzzy matches a brute-force blocked Levenshtein scan") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val norm = r.getString(2).trim.toLowerCase.replaceAll("\\s+", " ")
        (r.getLong(0), r.getString(1),
          norm.substring(0, math.min(operators.Dedup.FuzzyPrefix, norm.length)))
      }
    val expected = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2 &&
        a._3.take(operators.Dedup.FuzzyBlock) == b._3.take(operators.Dedup.FuzzyBlock)
      d = lev(a._3, b._3) if d <= operators.Dedup.FuzzyMaxDist
    } yield (a._1, b._1, d)).sortBy(t => (t._1, t._2))
    val got = operators.Dedup.dedupFuzzy(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === expected.toSeq)
  }

  test("lsh_recall: truth equals a brute-force shingle-Jaccard recomputation") {
    // the operator's truth side is prefix-filtered; at spec scale,
    // recompute exact global 2-gram-shingle J >= 0.8 pairs by brute
    // force and check the counts line up
    val sh = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        array_distinct(functions.TextFunctions.word_ngrams(
          functions.TextFunctions.normText(col("text")), 2)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val nTrue = (for {
      (a, ta) <- sh; (b, tb) <- sh
      if a < b
      shared = (ta & tb).size
      if 5 * shared >= 4 * (ta.size + tb.size - shared)
    } yield 1).size
    val row = operators.Dedup.dedupLshRecall(spark, sf).collect().head
    assert(row.getLong(0) === nTrue.toLong)
    assert(row.getLong(2) <= math.min(row.getLong(0), row.getLong(1)))
    assert(row.getLong(3) === row.getLong(2) * 1000 / row.getLong(0))
    assert(row.getLong(4) === row.getLong(2) * 1000 / row.getLong(1))
  }

  test("keep_best covers the corpus and agrees with a window-ranked recomputation") {
    import org.apache.spark.sql.expressions.Window
    val out = operators.Dedup.dedupKeepBest(spark, sf)
    val exact = operators.Dedup.dedupExact(spark, sf)
    // identical grouping to dedup_exact: same group count, full coverage
    assert(out.count() === exact.count())
    assert(out.agg(sum("n_dups")).collect().head.getLong(0) ===
      Tables.load(spark, sf, "documents").count())
    // cross-check the aggregate-max selection against an independent
    // window row_number() formulation of the same (quality_ok desc,
    // n_chars desc, doc_id asc) rule built from the #36 scorer
    val scored = functions.TextFunctions.quality(spark, sf)
      .select(col("doc_id"), col("n_chars"), col("quality_ok"))
    val grouped = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        md5(functions.TextFunctions.normText(col("text"))).as("fp"))
      .join(scored, Seq("doc_id"))
    val w = Window.partitionBy("fp")
      .orderBy(col("quality_ok").desc, col("n_chars").desc, col("doc_id"))
    val expectKeep = grouped.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotKeep = out.select("keep_id").collect().map(_.getLong(0)).toSet
    assert(gotKeep === expectKeep)
  }
}
