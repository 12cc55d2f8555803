package graft

import org.apache.spark.sql.functions._

/** #194–196: the composed crawl pipeline, its audit, and the sized
  * bloom row — every stage re-derived by independent Scala set logic
  * over the collected URL space (the canon algebra itself is
  * UrlSpec/oracle territory; here the STAGE algebra is the subject). */
class CrawlSpec extends SparkSpec {
  import operators.{Crawl, Url}

  // the shared URL space: (doc_id, canon_url, host, domain) for every
  // corpus doc, built once from the pipeline's own synthesis exprs
  private lazy val space: Seq[(Long, String, String, String)] =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))
      .select(col("doc_id"), expr(Url.canonUrlSql("spark")).as("canon_url"))
      .withColumn("host", expr(
        "split_part(split_part(split_part(canon_url, '://', 2), '/', 1), ':', 1)"))
      .withColumn("domain", expr("split_part(host, '.', 1)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def path(canon: String): String =
    canon.split("://", 2)(1).split("\\?", 2)(0)

  test("crawl_pipeline: every stage matches an independent set-logic recompute") {
    val frontier = space.filter(_._1 % 7 == 0)
    val history = space.filter(_._1 % 7 != 0)

    // stage 1: min-doc_id keeper per canonical URL
    val exp1 = frontier.groupBy(_._2).map(_._2.minBy(_._1)._1).toSet

    // stage 2: the rule battery, re-derived with plain string ops
    def verdict(canon: String, host: String): String =
      if (Url.BlockedHosts.contains(host)) "blocked_domain"
      else if (Url.BannedWords.exists(canon.toLowerCase.contains)) "banned_word"
      else if (Url.BlockedExtensions.exists(path(canon).endsWith)) "bad_extension"
      else "kept"
    val exp2 = frontier.filter(r => exp1(r._1) && verdict(r._2, r._3) == "kept")
      .map(_._1).toSet

    // stage 3 CONTRACT (positions are the oracle's to value-check):
    // no false negatives — every candidate whose canonical URL is in
    // the crawl history must drop; FPs bounded by the sized geometry
    val seenCanon = history.map(_._2).toSet
    val trulySeen = frontier.filter(r => exp2(r._1) && seenCanon(r._2))
      .map(_._1).toSet

    val f = Crawl.pipelineFrames(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(f.input) == frontier.map(_._1).toSet)
    assert(ids(f.s1) == exp1)
    assert(ids(f.s2) == exp2)
    val got3 = ids(f.s3)
    assert(trulySeen.intersect(got3).isEmpty, "false negative: seen URL scheduled")
    val unseen = exp2.diff(trulySeen)
    val fps = unseen.diff(got3)
    assert(fps.size * 1000 <= 30 * unseen.size.max(1),
      s"bloom FPs ${fps.size}/${unseen.size} above 3x the 1% target")

    // stage 4: inner join on domain loses nothing (every source is a
    // graph node); host_pos = doc_id rank within domain; rank_fp is
    // the domain's #178 rank
    val s4 = f.s4.select("doc_id", "domain", "rank_fp", "host_pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(s4.map(_._1).toSet == got3)
    val ranks = operators.Graph.pagerank(spark, sf)
      .select("host", "rank_fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    s4.foreach { case (id, dom, rf, _) => assert(rf == ranks(dom), s"doc $id") }
    s4.groupBy(_._2).foreach { case (_, rows) =>
      val byId = rows.sortBy(_._1).map(_._4).toSeq
      assert(byId == (1 to rows.length), s"host_pos not a doc_id rank")
    }

    // stage 5: brute-force water-fill — level = max L with
    // sum(min(c_d, L)) <= budget, remainder +1 to first capped domains
    // in name order; kept = first alloc queue positions per domain
    val counts = s4.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val budget = counts.values.sum / Crawl.FetchBudgetDen
    val level = (0L to counts.values.max)
      .filter(l => counts.values.map(math.min(_, l)).sum <= budget).max
    val atLevel = counts.values.map(math.min(_, level)).sum
    var rem = budget - atLevel
    val alloc = scala.collection.mutable.Map[String, Long]()
    counts.keys.toSeq.sorted.foreach { d =>
      val capped = counts(d) > level
      val extra = if (capped && rem > 0) { rem -= 1; 1L } else 0L
      alloc(d) = math.min(counts(d), level) + extra
    }
    assert(alloc.values.sum == budget, "allocation must sum to the budget")
    val exp5 = s4.filter { case (_, d, _, pos) => pos <= alloc(d) }.map(_._1).toSet
    assert(ids(f.s5) == exp5)
    // max-min fairness: no domain starves while another exceeds level+1
    val kept = s4.filter(r => exp5(r._1)).groupBy(_._2).view.mapValues(_.length.toLong)
    kept.foreach { case (d, n) =>
      assert(n == math.min(counts(d), level) || n == level + 1, s"domain $d")
    }
  }

  test("crawl_pipeline_audit: exact attrition walk; every gate cuts") {
    val f = Crawl.pipelineFrames(spark, sf)
    val audit = operators.Crawl.auditFrom(f).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val frames = Seq(f.input, f.s1, f.s2, f.s3, f.s4, f.s5)
    val expCounts = frames.map(_.count())
    val expDomains = frames.map(_.select("domain").distinct().count())
    assert(audit.map(_._3).toSeq == expCounts)
    assert(audit.map(_._4).toSeq == expDomains)
    assert(audit.map(_._2).toSeq == Seq("input", "url_dedup", "rule_filter",
      "seen_bloom", "rank_join", "fetch_budget"))
    // gates cut (planted casualties at every scale); the rank join is
    // lossless by construction
    assert(expCounts(1) < expCounts(0), "dedup cut nothing")
    assert(expCounts(2) < expCounts(1), "rule filter cut nothing")
    assert(expCounts(3) < expCounts(2), "seen bloom cut nothing")
    assert(expCounts(4) == expCounts(3), "rank join must be lossless")
    assert(expCounts(5) < expCounts(4), "budget cut nothing")
  }

  test("corpus_url_bloom_sized: geometry from the helper; no FN; FP at target") {
    val r = Url.urlBloomSized(spark, sf).collect().head
    val (nKeys, mBits, k) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val (expK, expM) = Url.bloomGeometry(nKeys, Url.SizedBloomTargetFpPermille)
    assert(k == expK && mBits == expM)
    val (nProbes, nBloom, nTruly, nFp) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    // classic bloom contract: bloom_seen >= truly_seen, and every
    // excess hit is exactly one counted false positive
    assert(nBloom - nTruly == nFp && nFp >= 0)
    assert(nProbes > nTruly, "no unseen probes: FP rate unmeasurable")
    // achieved FP rate within 3x the 1% operating point (deterministic
    // data; measured 0 at spec scale — the slack guards sf changes)
    assert(nFp * 1000 <= 30 * (nProbes - nTruly))
  }

  test("crawl_frontier_cycles: history monotone, re-discoveries collapse, discovery decays") {
    val cycles = Crawl.frontierCycles(spark, sf)
    assert(cycles.length == Crawl.NumCycles)

    def canons(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("canon_url").collect().map(_.getString(0)).toSet

    // history monotonicity: the accumulated bit-set never shrinks and
    // strictly grows while admissions continue
    val bitCounts = cycles.map(_.bitsAfter.count())
    bitCounts.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, "bloom bits regressed between cycles")
    }
    assert(bitCounts.head > 0, "cycle 0 admitted nothing into history")

    // re-discovery collapse: a canonical admitted in an earlier cycle
    // can NEVER be admitted again (bloom has no false negatives), so
    // cumulative admitted canonicals are pairwise disjoint per cycle
    val admittedCanons = cycles.map(cy => canons(cy.admitted))
    for (i <- 1 until cycles.length; j <- 0 until i)
      assert(admittedCanons(i).intersect(admittedCanons(j)).isEmpty,
        s"cycle $i re-admitted a canonical from cycle $j")

    // cross-cycle twins exist and are caught: at least one later
    // cycle's batch re-discovers an earlier admission (the d/d+120/
    // d+240 collapse classes span the %7 cycles), and every such
    // re-discovery was rejected — visible as admitted < discovered
    // dedup+rule survivors in that cycle
    val space = this.space
    val batchCanonsByCycle = (0 until Crawl.NumCycles)
      .map(c => space.filter(_._1 % 7 == c).map(_._2).toSet)
    val rediscovered = (1 until Crawl.NumCycles).map { c =>
      batchCanonsByCycle(c)
        .intersect(admittedCanons.take(c).reduce(_ ++ _)).size
    }
    assert(rediscovered.sum > 0,
      "spec corpus plants no cross-cycle re-discoveries — the walk is vacuous")

    // convergence: the frontier dries up — the last cycle admits
    // strictly fewer than the cold-start cycle, and no new domains
    // appear once cycle 0 has seen them all
    val rows = Crawl.crawlFrontierCycles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L until Crawl.NumCycles).toSeq)
    assert(rows.forall(_._2 > 0), "empty discovery increment")
    assert(rows.last._3 < rows.head._3,
      "admitted did not decay across the walk")
    assert(rows.head._6 > 0, "cycle 0 found no domains")
    assert(rows.tail.map(_._6).sum < rows.head._6,
      "no domain-discovery decay — convergence invisible")
    // the audit rows agree with the walk's own frames
    rows.zip(cycles).foreach { case ((_, disc, adm, oq, sched, _), cy) =>
      assert(disc == cy.batch.count())
      assert(adm == cy.admitted.count())
      assert(oq == cy.overQuota.count())
      assert(sched == cy.scheduled.count())
    }

    // the per-cycle quota (#212): over_quota = the exact per-domain
    // excess past CycleDomainQuota, recomputed independently from the
    // admitted frames; the quota BINDS at spec scale (cycle 0's domains
    // average ~3 admissions), and kept + over = admitted per cycle
    rows.zip(cycles).foreach { case ((cid, _, adm, oq, _, _), cy) =>
      val perDomain = cy.admitted.select("domain").collect()
        .map(_.getString(0)).groupBy(identity).map(_._2.length)
      val expOver = perDomain.map(n =>
        math.max(0L, n - Crawl.CycleDomainQuota)).sum
      assert(oq == expOver, s"cycle $cid over_quota")
      assert(cy.kept.count() + oq == adm, s"cycle $cid kept+over=admitted")
      // kept per domain never exceeds the quota, and keeps are each
      // domain's SMALLEST admitted doc_ids (the deterministic spend)
      val keptBy = cy.kept.select("domain", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (d, g) => d -> g.map(_._2).sorted.toSeq }
      val admBy = cy.admitted.select("domain", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (d, g) => d -> g.map(_._2).sorted.toSeq }
      keptBy.foreach { case (d, ks) =>
        assert(ks.size <= Crawl.CycleDomainQuota, s"cycle $cid domain $d")
        assert(ks == admBy(d).take(ks.size), s"cycle $cid domain $d spend order")
      }
    }
    assert(rows.map(_._4).sum > 0,
      "the per-cycle quota never bound — the politeness cut is vacuous")
  }

  test("crawl_quota_tiers: tiers/quotas/counts match the independent recompute; rank scales the budget; the cut binds") {
    val T = Crawl.QuotaTiers
    val base = Crawl.TieredBaseQuota
    // independent NTILE over the collected rank table (best rank
    // first, domain tie-break): tile k of n rows holds ceil(n/T) rows
    // for the first n%T tiles, floor(n/T) after — the standard
    // definition both engines implement
    val ranks = Crawl.domainRanks(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (d, rfp) => (-rfp, d) }
    val n = ranks.length
    val (big, extra) = (n / T + 1, n % T)
    def tileOf(i: Int): Int =
      if (i < extra * big) i / big + 1
      else extra + (i - extra * big) / (big - 1) + 1
    val tier = ranks.zipWithIndex
      .map { case ((d, _), i) => d -> tileOf(i) }.toMap
    val rankOf = ranks.toMap
    def quotaOf(d: String): Long = base << (T - tier(d))

    // per-domain admitted counts from the pipeline's own stage-3 frame
    val admitted = Crawl.pipelineFrames(spark, sf).s3
      .select("domain").collect().map(_.getString(0))
      .groupBy(identity).map { case (d, g) => d -> g.length.toLong }

    val got = Crawl.crawlQuotaTiers(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == admitted.keySet,
      "one report row per domain with admissions")
    got.foreach { case (d, (rfp, t, q, nAdm, nKept, nOver)) =>
      assert(rfp == rankOf(d), s"$d rank")
      assert(t == tier(d), s"$d tier")
      assert(q == quotaOf(d), s"$d quota")
      assert(nAdm == admitted(d), s"$d admitted")
      assert(nKept == math.min(admitted(d), quotaOf(d)), s"$d kept")
      assert(nOver == math.max(0L, admitted(d) - quotaOf(d)), s"$d over")
      assert(nKept + nOver == nAdm, s"$d conservation")
    }
    // the row exists to SCALE the budget by rank: all tiers occur
    // among reporting domains, quotas strictly double tier-to-tier,
    // and the cut actually binds somewhere
    assert(got.values.map(_._2).toSet == (1 to T).toSet,
      "not every tier reports at spec scale")
    (1 until T).foreach(k =>
      assert((base << (T - k)) == 2 * (base << (T - k - 1))))
    assert(got.values.map(_._6).sum > 0, "the tiered cut never bound")
    // and the tiering MATTERS: some domain keeps more than the flat
    // base quota would allow — the rank-scaled budget in action
    assert(got.values.exists(v => v._5 > base),
      "no domain used a rank-scaled budget")
  }

  test("quotaCut: a planted one-domain flood is capped exactly; quiet domains untouched") {
    import spark.implicits._
    // 10-URL flood on one domain + 2 on a quiet one, out-of-order ids
    val admitted = Seq(
      (7L, "flood"), (1L, "flood"), (9L, "flood"), (3L, "flood"),
      (5L, "flood"), (2L, "flood"), (8L, "flood"), (4L, "flood"),
      (6L, "flood"), (10L, "flood"),
      (101L, "quiet"), (102L, "quiet"))
      .toDF("doc_id", "domain")
    val (kept, over) = Crawl.quotaCut(admitted, 4L)
    val keptRows = kept.select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val overRows = over.select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // the flood keeps exactly its 4 smallest doc_ids — (batch, doc)
    // spend order, the #204 protocol's batch spelling
    assert(keptRows.filter(_._2 == "flood").map(_._1).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    assert(overRows.filter(_._2 == "flood").map(_._1).sorted.toSeq
      == (5L to 10L).toSeq)
    // the quiet domain rides through whole — budgets are per-domain
    assert(keptRows.filter(_._2 == "quiet").map(_._1).sorted.toSeq
      == Seq(101L, 102L))
    assert(!overRows.exists(_._2 == "quiet"))
  }

  test("bloomGeometry: the published operating points, exact integer m") {
    assert(Url.bloomGeometry(1000, 100) == ((3, 4800L)))
    assert(Url.bloomGeometry(1000, 10) == ((7, 9600L)))
    assert(Url.bloomGeometry(1000, 1) == ((10, 14400L)))
    // ceiling division, never zero bits
    assert(Url.bloomGeometry(1, 10) == ((7, 10L)))
    assert(Url.bloomGeometry(0, 10) == ((7, 1L)))
  }
}
