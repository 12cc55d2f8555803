package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed crawl-scheduler pipeline (SURVEY §2 #194–195) — the
  * scheduler-side sibling of #151's `corpus_pipeline`: everything a
  * crawl operator runs between "a batch of discovered URLs" and "the
  * fetch list this cycle", as ONE oracle-checked plan. The reference
  * relay has no crawler; this composes the crawl-side operators the
  * LLM-data family added (#156/#157 canonicalization + URL dedup,
  * #162 rule battery, #185/#196 bloom seen-set, #178 PageRank,
  * #186 frontier queues, #129 water-fill) in the order production
  * crawlers run them (Heritrix/Nutch frontier discipline; Cho et al.
  * 1998 for rank-ordered scheduling):
  *
  *   0. input — the discovered batch: docs with doc_id % 7 = 0, the
  *      #185 probe split (gcd(60,7)=1 so canonical collapse classes
  *      span the split: the batch genuinely mixes re-discoveries of
  *      crawled pages with never-seen ones), with the #162 spiked
  *      synthesis (spam paths, binary extensions) so every gate has
  *      planted casualties;
  *   1. `url_dedup` — canonical-URL identity within the batch (#157's
  *      min-doc_id keeper over #156's canonical form): the only key
  *      that exists pre-fetch;
  *   2. `rule_filter` — the #162 battery on the canonical form
  *      (blocked domains > banned words > binary extensions), the
  *      cheapest gate a crawler has;
  *   3. `seen_bloom` — drop URLs already crawled: bloom seen-set
  *      probe against the crawl history (docs % 7 ≠ 0), with the
  *      geometry SIZED to the history by [[Url.bloomGeometry]] at the
  *      1% operating point — the #196 sizing, so the stage holds at
  *      any corpus scale where #185's fixed M=128 would saturate
  *      (every bit lit → every probe "seen" → the pipeline empties;
  *      the documented ×32 failure mode of fixed-M filters). The
  *      bloom trade rides into the audit: a false positive silently
  *      skips a new page, so stage-3 attrition = revisits + FP count;
  *   4. `rank_join` — the #186 composition: each survivor joins its
  *      registrable domain's PageRank (#178's fixed-point kernel over
  *      the corpus domain graph) and takes a per-domain queue
  *      position (window PARTITIONED by domain — never a global
  *      sort);
  *   5. `fetch_budget` — politeness/budget truncation: the global
  *      fetch budget (Σ candidates div [[FetchBudgetDen]]) water-fills
  *      across domains ([[Corpus.waterFillAlloc]], #129's exact
  *      integer level search — max-min fair, so one giant domain
  *      cannot monopolize the cycle while small domains starve), and
  *      each domain keeps its first `alloc` queue positions.
  *
  * Output = the fetch schedule: (doc_id, canon_url, host, rank_fp,
  * host_pos), rank-ordered. The audit (#195, the #154 shape) walks
  * (stage_id, stage, n_urls, n_domains) over the same pinned stage
  * frames — [[crawlPipelineAudit]] has a Frames overload so a caller
  * who ran the pipeline audits the SAME materialization.
  *
  * Scale shape (100 TB): stages 0–3 are map-only string algebra plus
  * ONE hash groupBy (the dedup keeper) and a broadcast-sized bloom
  * bit-set join; the rank table is domain-sized (broadcast); the
  * water-fill runs entirely on the #domains-row frame. The only
  * corpus-scale shuffle outside the dedup is PageRank's edge
  * aggregation, which collapses docs to the domain graph once
  * (#178's shape). Every window is per-domain.
  */
object Crawl {

  /** Global fetch budget = Σ per-domain candidates div this (the #129
    * denominator discipline: binds at every scale factor). */
  val FetchBudgetDen = 3

  /** Bloom operating point for the seen-set: 1% target FP. */
  val SeenBloomFpPermille: Int = Url.SizedBloomTargetFpPermille

  private val hostSql =
    "split_part(split_part(split_part(canon_url, '://', 2), '/', 1), ':', 1)"

  private[graft] final case class Frames(
      input: DataFrame, s1: DataFrame, s2: DataFrame, s3: DataFrame,
      s4: DataFrame, s5: DataFrame, ranks: DataFrame)

  /** Canonical-URL dedup, min-doc_id keeper, as ONE sortless window
    * pass: a row survives iff its doc_id is its canon_url group's
    * minimum — exactly the rows the former
    * groupBy(canon_url).agg(min) + doc_id LEFT SEMI join kept, for
    * one exchange of the frame instead of two (plus the keeper-set
    * broadcast/shuffle the join needed). */
  private[graft] def minDocKeeper(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("canon_url")
    batch.withColumn("mnd", min("doc_id").over(w))
      .filter(col("doc_id") === col("mnd")).drop("mnd")
  }

  private[graft] def pipelineFrames(spark: SparkSession,
                                    dir: String): Frames = {
    // the canonical URL space for the WHOLE corpus — history and
    // frontier both read it, so the map-only synth+canon pass is
    // pinned once (Checkpoints discipline)
    val c = graft.Checkpoints.pin(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))
        .select(col("doc_id"), expr(Url.canonUrlSql("spark")).as("canon_url"))
        .withColumn("host", expr(hostSql))
        .withColumn("domain", expr("split_part(host, '.', 1)")))

    // stage 0: the discovered batch — a narrow filter over the pinned
    // canonical frame; every consumer re-reads cached blocks, so a
    // second materialization bought nothing (r21, the cycles-walk
    // rationale)
    val input = c.filter(col("doc_id") % 7 === 0)

    // stage 1: canonical-URL dedup within the batch (min-doc_id
    // keeper). LAZY (r21): its only consumer inside the pipeline is
    // stage 2, whose own pin materializes this chain exactly once.
    // r22: the keeper is a sortless min-WINDOW filter — one exchange
    // of the slim batch rows by canon_url — instead of the former
    // key-aggregate + doc_id semi-join (two exchanges plus a
    // broadcast that stops being one when the keeper set reaches
    // history scale).
    val s1 = minDocKeeper(input)

    // stage 2: the #162 rule battery on the canonical form
    val s2 = graft.Checkpoints.pin(
      s1.withColumn("verdict", expr(Url.filterVerdictSql("spark")))
        .filter(col("verdict") === "kept")
        .drop("verdict"))

    // stage 3: sized bloom seen-set — history bits from crawled docs,
    // geometry from the DISTINCT history-key count (#196)
    val k = Url.BloomGeometryTable(SeenBloomFpPermille)._1
    val history = c.filter(col("doc_id") % 7 =!= 0)
    val geo = history.agg(countDistinct("canon_url").as("n_keys"))
      .select(expr(Url.bloomMBitsSql("n_keys", SeenBloomFpPermille, "spark"))
        .as("m_bits"))
    val bits = Url.bloomPositionsSized(
        history.select("canon_url").crossJoin(broadcast(geo)), k)
      .select("j", "pos").distinct()
    // no broadcast hint on the bit-set: the SIZED filter grows with
    // the history (~10 bits/key at the 1% point), so AQE broadcasts
    // it while small and falls back to a shuffled semi-join on
    // (j, pos) when a 100 TB history's bits outgrow the threshold —
    // a forced broadcast would be exactly wrong at the scale this
    // stage exists for (#185's FIXED M stays broadcast by geometry)
    val seen = Url.bloomPositionsSized(
        s2.select("doc_id", "canon_url").crossJoin(broadcast(geo)), k)
      .join(bits, Seq("j", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("k_hits"))
      .filter(col("k_hits") === k)
      .select("doc_id")
    val s3 = graft.Checkpoints.pin(s2.join(seen, Seq("doc_id"), "left_anti"))

    // stages 4-5: the scheduler half, factored so the streaming
    // per-cycle scheduler (#202) runs the SAME definition per
    // micro-batch
    val ranks = domainRanks(spark, dir)
    val (s4, s5) = scheduleFrom(s3, ranks)

    Frames(input, s1, s2, s3, s4, s5, ranks)
  }

  /** The #178 PageRank of every registrable domain — the frozen rank
    * table both the batch stage 4 and the streaming scheduler join. */
  private[graft] def domainRanks(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerankRounds(Graph.corpusEdges(spark, dir), Graph.Iters).last
      .select(col("host").as("domain"), col("rank_fp"))

  /** Stages 4–5 over a kept-URL frame (columns incl. doc_id, domain):
    * stage 4 — domain-rank join (broadcast: the rank table is
    * domain-sized) + per-domain queue position; stage 5 —
    * water-filled per-domain fetch budget (#129's exact integer
    * algebra on the domains-sized frame), first `alloc` queue
    * positions kept. ONE definition: the batch pipeline runs it over
    * the whole frontier, the streaming scheduler ([[
    * graft.streaming.CrawlStream.scheduleQuery]]) over each cycle's
    * admitted arrivals — schedule semantics cannot drift between
    * them. */
  private[graft] def scheduleFrom(kept: DataFrame,
                                  ranks: DataFrame): (DataFrame, DataFrame) = {
    val s4 = graft.Checkpoints.pin(
      kept.join(broadcast(ranks), Seq("domain"))
        .withColumn("host_pos", expr(
          "CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS INT)")))
    val per = s4.groupBy("domain").agg(count(lit(1)).as("n_urls"))
    val alloc = Corpus.waterFillAlloc(per, "domain", "n_urls", FetchBudgetDen)
    // s5 stays LAZY (r21): every caller — the #194 output sort, the
    // audit count, the cycles walk's schedule count, the streaming
    // sink — consumes it exactly once, and it is a broadcast join +
    // filter over the PINNED s4, so materializing it bought nothing
    // but an extra eager job per call (per cycle, in the walk).
    val s5 = s4.join(broadcast(alloc.select("domain", "alloc")), Seq("domain"))
      .filter(col("host_pos") <= col("alloc"))
      .drop("alloc")
    (s4, s5)
  }

  // ---------------------------------------------------------------------
  // #194 crawl_pipeline — the fetch schedule
  // ---------------------------------------------------------------------

  def crawlPipeline(spark: SparkSession, dir: String): DataFrame =
    pipelineFrames(spark, dir).s5
      .select(col("doc_id"), col("canon_url"), col("host"),
        col("rank_fp"), col("host_pos"))
      .orderBy(col("rank_fp").desc, col("host"), col("doc_id"))

  // ---------------------------------------------------------------------
  // #195 crawl_pipeline_audit — the attrition walk
  // ---------------------------------------------------------------------

  /** Per-stage attrition over CALLER-SUPPLIED frames — run the
    * pipeline once, audit the same materialization (the #154 shape
    * with the shared-Frames discipline). */
  private[graft] def auditFrom(f: Frames): DataFrame = {
    val stages = Seq(
      0 -> ("input", f.input), 1 -> ("url_dedup", f.s1),
      2 -> ("rule_filter", f.s2), 3 -> ("seen_bloom", f.s3),
      4 -> ("rank_join", f.s4), 5 -> ("fetch_budget", f.s5))
    stages.map { case (i, (name, df)) =>
      df.agg(count(lit(1)).as("n_urls"),
          countDistinct("domain").as("n_domains"))
        .select(lit(i.toLong).as("stage_id"), lit(name).as("stage"),
          col("n_urls"), col("n_domains"))
    }.reduce(_ unionByName _).orderBy("stage_id")
  }

  def crawlPipelineAudit(spark: SparkSession, dir: String): DataFrame =
    auditFrom(pipelineFrames(spark, dir))

  // ---------------------------------------------------------------------
  // #216 crawl_quota_tiers — rank-tiered politeness budgets (round 20,
  // beyond the verdict list; the §7 candidate #212 points at: a flat
  // per-domain quota treats a top-ranked hub and a spam farm alike,
  // while production politeness budgets scale with domain importance —
  // Heritrix's per-queue budgets, Cho et al. 1998's rank-ordered
  // allocation). The tiering is a FROZEN-artifact decision: tiers come
  // from the webgraph snapshot's rank table (the #194 stage-4 rank
  // join's own input), not from the cycle's traffic.
  // ---------------------------------------------------------------------

  /** Rank tiers (NTILE over the rank table, best rank first). */
  val QuotaTiers = 3
  /** Bottom-tier per-cycle quota; each tier up DOUBLES it (base <<
    * (Tiers − tier)): top tier 4×, middle 2×, bottom 1× at the
    * defaults. 1 binds at the 500-doc corpus (cycle-0 domains carry
    * ~3 admissions) and at every stress decade. */
  val TieredBaseQuota = 1L

  /** The per-domain budget table: every ranked domain with its tier
    * (NTILE(QuotaTiers) over rank_fp DESC, domain — the tie-break
    * makes the tiling deterministic cross-engine) and its quota
    * (TieredBaseQuota << (QuotaTiers − tier)). Domain-sized: the
    * single-partition NTILE window runs on the model frame, the
    * waterFill precedent — never on corpus rows. */
  private[graft] def tierQuotas(ranks: DataFrame, base: Long): DataFrame =
    ranks.withColumn("tier", expr(
      s"CAST(ntile($QuotaTiers) OVER (ORDER BY rank_fp DESC, domain) AS INT)"))
      .withColumn("quota", expr(
        s"shiftleft(CAST($base AS BIGINT), $QuotaTiers - tier)"))

  /** #216 crawl_quota_tiers — the per-domain politeness allocation
    * report over the #194 admitted set: (domain, rank_fp, tier,
    * quota, n_admitted, n_kept, n_over_quota), one row per domain
    * with admissions this cycle. n_kept counts the admissions inside
    * the domain's TIERED budget (q_pos ≤ quota, doc_id spend order —
    * the #212 cut with a rank-scaled cap), n_over_quota the excess a
    * flat-rate storm pushes past it; a top-tier hub keeps 4× what a
    * bottom-tier domain keeps under the same flood. Scale shape: the
    * corpus-scale work is #194's own stages (shared pipelineFrames);
    * the report adds one broadcast budget join + a domain-partitioned
    * ROW_NUMBER + a #domains-row aggregate.
    *
    * Report scope (ADVICE r20, documented rather than changed): the
    * budget join is INNER, so an admitted domain absent from the
    * webgraph rank table is out of report scope by design — stage 4
    * drops unranked domains from scheduling anyway, so they have no
    * politeness budget to report against. The STREAMING gate's
    * defaultQuota fallback covers the different live-traffic concern
    * (an unranked flooder must still be capped at admission time). */
  def crawlQuotaTiers(spark: SparkSession, dir: String): DataFrame = {
    val f = pipelineFrames(spark, dir)
    // r21: reuse the rank table pipelineFrames already trained — the
    // second domainRanks call re-ran the whole PageRank chain (edge
    // pin, node pin, 5 rounds) for an identical deterministic result
    val budgets = tierQuotas(f.ranks, TieredBaseQuota)
    val ranked = f.s3.withColumn("q_pos", expr(
      "CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS INT)"))
    ranked.join(broadcast(budgets), Seq("domain"))
      .groupBy("domain", "rank_fp", "tier", "quota")
      .agg(count(lit(1)).as("n_admitted"),
        sum(when(col("q_pos") <= col("quota"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("q_pos") > col("quota"), 1L).otherwise(0L))
          .as("n_over_quota"))
      .orderBy("domain")
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle — the full chain as CTEs (stage names mirror the
  // Scala frames; pagerank rides Graph.pagerankCtes verbatim)
  // ---------------------------------------------------------------------

  private val pipelineCtes: String = {
    val p = graft.functions.SketchFunctions.PolyP
    val hashDuck = graft.functions.SketchFunctions.polyHashSqlDuck("canon_url")
    val k = Url.BloomGeometryTable(SeenBloomFpPermille)._1
    s"""u AS (
       |  SELECT doc_id, ${Url.crawlSynthSql("duck")} AS url FROM documents
       |), c0 AS MATERIALIZED (
       |  SELECT doc_id, ${Url.canonUrlSql("duck")} AS canon_url FROM u
       |), ch AS MATERIALIZED (
       |  SELECT doc_id, canon_url, $hostSql AS host FROM c0
       |), cd AS MATERIALIZED (
       |  SELECT doc_id, canon_url, host, split_part(host, '.', 1) AS domain
       |  FROM ch
       |), f0 AS MATERIALIZED (
       |  SELECT * FROM cd WHERE doc_id % 7 = 0
       |), k1 AS (
       |  SELECT canon_url, MIN(doc_id) AS doc_id FROM f0 GROUP BY canon_url
       |), s1 AS MATERIALIZED (
       |  SELECT f0.* FROM f0 JOIN k1 ON f0.doc_id = k1.doc_id
       |), s2 AS MATERIALIZED (
       |  SELECT doc_id, canon_url, host, domain FROM s1
       |  WHERE ${Url.filterVerdictSql("duck")} = 'kept'
       |), geo AS (
       |  SELECT ${Url.bloomMBitsSql("n_keys", SeenBloomFpPermille, "duck")}
       |    AS m_bits
       |  FROM (SELECT CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_keys
       |        FROM cd WHERE doc_id % 7 <> 0)
       |), hh AS (
       |  SELECT doc_id, $hashDuck AS hv FROM cd
       |), pos AS MATERIALIZED (
       |  SELECT doc_id, j, ((hv * (2*j + 3) + (13*j + 5)) % $p) % m_bits AS pos
       |  FROM hh CROSS JOIN geo
       |  CROSS JOIN (SELECT unnest(range(0, $k)) AS j)
       |), bits AS MATERIALIZED (
       |  SELECT DISTINCT j, pos FROM pos WHERE doc_id % 7 <> 0
       |), bseen AS (
       |  SELECT p.doc_id
       |  FROM pos p JOIN bits b ON p.j = b.j AND p.pos = b.pos
       |  WHERE p.doc_id IN (SELECT doc_id FROM s2)
       |  GROUP BY p.doc_id HAVING COUNT(*) = $k
       |), s3 AS MATERIALIZED (
       |  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM bseen)
       |), ${Graph.pagerankCtes}, pr AS (
       |  SELECT host AS domain, rank_fp FROM r${Graph.Iters}
       |), s4 AS MATERIALIZED (
       |  SELECT s3.*, pr.rank_fp,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s3.domain ORDER BY s3.doc_id)
       |         AS INT) AS host_pos
       |  FROM s3 JOIN pr ON pr.domain = s3.domain
       |), per AS (
       |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls
       |  FROM s4 GROUP BY domain
       |), ${Corpus.waterFillCtes("per", "domain", "n_urls", FetchBudgetDen)},
       |s5 AS MATERIALIZED (
       |  SELECT s4.* FROM s4 JOIN wf_alloc a ON a.domain = s4.domain
       |  WHERE s4.host_pos <= a.alloc
       |)""".stripMargin
  }

  val crawlPipelineSql: String =
    s"""WITH $pipelineCtes
       |SELECT doc_id, canon_url, host, rank_fp, host_pos FROM s5
       |ORDER BY rank_fp DESC, host, doc_id""".stripMargin

  val crawlPipelineAuditSql: String = {
    def row(i: Int, name: String, cte: String) =
      s"""SELECT CAST($i AS BIGINT) AS stage_id, '$name' AS stage,
         |  CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains
         |FROM $cte""".stripMargin
    s"""WITH $pipelineCtes
       |${Seq(row(0, "input", "f0"), row(1, "url_dedup", "s1"),
             row(2, "rule_filter", "s2"), row(3, "seen_bloom", "s3"),
             row(4, "rank_join", "s4"), row(5, "fetch_budget", "s5"))
           .mkString("\nUNION ALL\n")}
       |ORDER BY stage_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #203 crawl_frontier_cycles — the multi-cycle frontier driver with
  // the convergence audit (VERDICT r18 missing #1): #194 schedules ONE
  // cycle; a real frontier ITERATES — each cycle's admitted URLs
  // become the next cycle's history, the bloom bits advance, and the
  // operator watches the discovery-rate decay (new URLs / new domains
  // per cycle) to know when the crawl has converged (Cho et al. 1998;
  // Heritrix's recrawl scheduling). This is the #189 convergence-audit
  // shape applied to the frontier instead of PageRank.
  // ---------------------------------------------------------------------

  /** Cycles walked by the deterministic driver: discovery increment c
    * = docs with doc_id % 7 = c, c < NumCycles. The %7 key is the
    * family's standard split (gcd with the mod-60 canonical collapse
    * classes is 1, so re-discovery pairs SPAN cycles — d and d+120 /
    * d+240 share a canonical URL but land in cycles 0/1/2), and cycle
    * 0 is exactly #194's discovered batch, so the walk EXTENDS the
    * single-cycle pipeline rather than forking a second URL space. */
  val NumCycles = 3

  /** Per-domain admission quota PER CYCLE (#212, round 20 — the
    * deterministic batch spelling of the #204/#210 streaming gate:
    * the walk caps each domain's admissions within a cycle before
    * scheduling, and the quota RESETS at the cycle boundary — exactly
    * [[graft.streaming.CrawlStream.quotaVerdictsEpoch]] with
    * epoch = cycle, the parity the recycling spec pins). 2 binds at
    * the 500-doc spec/sf corpus (cycle-0 domains average ~3
    * admissions) and at every ×N stress decade. */
  val CycleDomainQuota = 2L

  private[graft] final case class CycleFrames(
      batch: DataFrame, admitted: DataFrame, kept: DataFrame,
      overQuota: DataFrame, scheduled: DataFrame,
      newDomains: DataFrame, bitsAfter: DataFrame)

  /** The quota cut over a cycle's admitted frame: per-domain queue
    * positions in doc_id order, first `quota` kept, the rest
    * re-verdicted `over_quota` — one window over the admitted rows
    * (domain-partitioned, never a global sort), the #204 spend rule
    * as batch algebra. The ranked frame pins once; both sides derive
    * from it. */
  private[graft] def quotaCut(admitted: DataFrame,
                              quota: Long): (DataFrame, DataFrame) = {
    val ranked = quotaRanked(admitted)
    (ranked.filter(col("q_pos") <= quota).drop("q_pos"),
      ranked.filter(col("q_pos") > quota).drop("q_pos"))
  }

  /** The pinned rank frame behind [[quotaCut]]: admitted rows plus
    * their per-domain queue position, materialized ONCE so kept /
    * over-quota / audit consumers all read the same blocks. Factored
    * out (r21) so the cycles walk can derive its `admitted` view from
    * this pin instead of pinning the pre-window frame a second time —
    * one materialization per cycle, not two. */
  private[graft] def quotaRanked(admitted: DataFrame): DataFrame =
    graft.Checkpoints.pin(
      admitted.withColumn("q_pos", expr(
        "CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS INT)")))

  /** The multi-cycle walk. The crawl starts COLD (no history — cycle
    * 0 probes an empty bloom and admits every rule-passing distinct
    * canonical), and the seen-set advances with each cycle's ADMITTED
    * set. The filter is sized ONCE for the crawl plan's capacity (the
    * corpus's distinct canonical count at the #196 operating point) —
    * the production discipline: a bloom is sized for expected
    * insertions up front, then bits advance monotonically; re-sizing
    * per cycle would re-hash the whole history every cycle.
    *
    * Scale shape (100 TB): the probe positions for the WHOLE walk are
    * computed in ONE pass over the corpus and pinned (each cycle then
    * reads its slice by doc_id semi-join); per cycle the work is one
    * dedup groupBy, the map-only rule battery, the un-hinted
    * (j, pos)-join against the accumulated bits relation (AQE
    * broadcasts while small, shuffles at history scale — batch stage
    * 3's exact plan), the broadcast domain-rank join, and windows/
    * water-fill on domain-sized frames. Bits accumulate by
    * union+distinct — monotone, never rebuilt. */
  private[graft] def frontierCycles(spark: SparkSession, dir: String,
                                    quota: Long = CycleDomainQuota)
      : Seq[CycleFrames] = {
    import spark.implicits._
    val c = graft.Checkpoints.pin(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))
        .select(col("doc_id"), expr(Url.canonUrlSql("spark")).as("canon_url"))
        .withColumn("host", expr(hostSql))
        .withColumn("domain", expr("split_part(host, '.', 1)")))
    val k = Url.BloomGeometryTable(SeenBloomFpPermille)._1
    val geo = c.agg(countDistinct("canon_url").as("n_keys"))
      .select(expr(Url.bloomMBitsSql("n_keys", SeenBloomFpPermille, "spark"))
        .as("m_bits"))
    val pos = graft.Checkpoints.pin(
      Url.bloomPositionsSized(
          c.select("doc_id", "canon_url").crossJoin(broadcast(geo)), k)
        .select("doc_id", "j", "pos"))
    val ranks = graft.Checkpoints.pin(domainRanks(spark, dir))
    var bits = Seq.empty[(Int, Long)].toDF("j", "pos")
    var doms = Seq.empty[String].toDF("domain")
    (0 until NumCycles).map { cid =>
      // batch is a narrow filter over the pinned canonical frame `c` —
      // re-reading cached blocks per consumer is cheaper than a second
      // materialization at every scale (r21: the pin here cost one
      // eager job per cycle for a zero-shuffle projection)
      val batch = c.filter(col("doc_id") % 7 === cid)
      // deliberately NOT the [[minDocKeeper]] window spelling (r22):
      // this d1 sits under a TWICE-consumed lazy subtree (the seen
      // probe and the quota pin both evaluate r1), so the window's
      // exchange would run twice per cycle — measured +20% on the
      // walk, control-normalized — where the keeper semi-join
      // re-probes a broadcast against cached blocks for ~free.
      val keep = batch.groupBy("canon_url").agg(min("doc_id").as("doc_id"))
      val d1 = batch.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      val r1 = d1.withColumn("verdict", expr(Url.filterVerdictSql("spark")))
        .filter(col("verdict") === "kept").drop("verdict")
      val seen = pos.join(r1.select("doc_id"), Seq("doc_id"), "left_semi")
        .join(bits, Seq("j", "pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("k_hits"))
        .filter(col("k_hits") === k).select("doc_id")
      // the per-cycle politeness quota (#212): admissions stand — the
      // URL was deduplicated, rule-checked and bloom-new, and its bits
      // advance the history exactly as before — but only each domain's
      // first `quota` admissions (doc_id order) reach the scheduler
      // this cycle; the cut is the #204 gate's position, BETWEEN
      // admission and scheduling. r21: ONE pin carries the cycle's
      // admitted set — the rank frame — and admitted/kept/over are
      // projections of it (before, admitted and ranked were pinned
      // back-to-back: two materializations of the same rows per cycle).
      val ranked = quotaRanked(r1.join(seen, Seq("doc_id"), "left_anti"))
      val admitted = ranked.drop("q_pos")
      val kept = ranked.filter(col("q_pos") <= quota).drop("q_pos")
      val overQuota = ranked.filter(col("q_pos") > quota).drop("q_pos")
      val (_, s5) = scheduleFrom(kept, ranks)
      val newDom = admitted.select("domain").distinct()
        .join(doms, Seq("domain"), "left_anti")
      val bitsAfter = graft.Checkpoints.pin(
        bits.unionByName(
          pos.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
            .select("j", "pos")).distinct())
      // doms stays LAZY (r21): each cycle's admitted frame is pinned,
      // so the accumulated domain set is a shallow distinct-union over
      // ≤ NumCycles pinned frames — materializing the #domains-row
      // frame cost one eager job per cycle for nothing
      doms = doms.unionByName(admitted.select("domain")).distinct()
      bits = bitsAfter
      CycleFrames(batch, admitted, kept, overQuota, s5, newDom, bitsAfter)
    }
  }

  /** #203 crawl_frontier_cycles — one audit row per cycle: (cycle_id,
    * n_discovered, n_admitted, n_over_quota, n_scheduled,
    * n_new_domains). The convergence read: admitted/new-domain counts
    * DECAY as the accumulated history absorbs re-discoveries — the
    * rate an operator watches to call a crawl converged —  and
    * n_over_quota (round 20, #212) is the politeness cut between
    * admission and scheduling: admissions a one-domain storm pushed
    * past [[CycleDomainQuota]] this cycle. All counts are cycle-scoped
    * aggregates over the walk's pinned frames; the row frame itself is
    * NumCycles rows of broadcast-combined scalars. */
  def crawlFrontierCycles(spark: SparkSession, dir: String): DataFrame = {
    // r21: ONE tagged-union aggregate instead of 5 broadcast-exchange
    // scalar aggregates crossJoined PER CYCLE (15 eager broadcast jobs
    // → one two-stage count job over the walk's pinned frames; values
    // byte-identical — conditional counts of the same five frames).
    // The zero row per cycle keeps the group present even if a frame
    // family were empty, exactly like the old scalar aggregates.
    import spark.implicits._
    val tagged = frontierCycles(spark, dir).zipWithIndex.map { case (cy, cid) =>
      Seq(cy.batch -> "d", cy.admitted -> "a", cy.overQuota -> "o",
        cy.scheduled -> "s", cy.newDomains -> "n").map { case (df, t) =>
        df.select(lit(cid.toLong).as("cycle_id"), lit(t).as("k"))
      }.reduce(_ unionByName _)
        .unionByName(Seq((cid.toLong, "z")).toDF("cycle_id", "k"))
    }.reduce(_ unionByName _)
    tagged.groupBy("cycle_id")
      .agg(
        sum(when(col("k") === "d", 1L).otherwise(0L)).as("n_discovered"),
        sum(when(col("k") === "a", 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("k") === "o", 1L).otherwise(0L)).as("n_over_quota"),
        sum(when(col("k") === "s", 1L).otherwise(0L)).as("n_scheduled"),
        sum(when(col("k") === "n", 1L).otherwise(0L)).as("n_new_domains"))
      .orderBy("cycle_id")
  }

  /** Oracle: the walk unrolled cycle by cycle (the pagerankCtes
    * discipline) — positions once, per-cycle dedup/rules/seen/
    * QUOTA/schedule, bits rederived from all prior admitted sets
    * (equivalent to the monotone union; the quota cuts scheduling,
    * never history), water-fill CTEs prefix-isolated per cycle. */
  val crawlFrontierCyclesSql: String = {
    val p = graft.functions.SketchFunctions.PolyP
    val hashDuck = graft.functions.SketchFunctions.polyHashSqlDuck("canon_url")
    val k = Url.BloomGeometryTable(SeenBloomFpPermille)._1
    val head =
      s"""fu AS (
         |  SELECT doc_id, ${Url.crawlSynthSql("duck")} AS url FROM documents
         |), fc0 AS MATERIALIZED (
         |  SELECT doc_id, ${Url.canonUrlSql("duck")} AS canon_url FROM fu
         |), fch AS MATERIALIZED (
         |  SELECT doc_id, canon_url, $hostSql AS host FROM fc0
         |), fcd AS MATERIALIZED (
         |  SELECT doc_id, canon_url, host, split_part(host, '.', 1) AS domain
         |  FROM fch
         |), fgeo AS (
         |  SELECT ${Url.bloomMBitsSql("n_keys", SeenBloomFpPermille, "duck")}
         |    AS m_bits
         |  FROM (SELECT CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_keys
         |        FROM fcd)
         |), fhh AS (
         |  SELECT doc_id, $hashDuck AS hv FROM fcd
         |), fpos AS MATERIALIZED (
         |  SELECT doc_id, j, ((hv * (2*j + 3) + (13*j + 5)) % $p) % m_bits AS pos
         |  FROM fhh CROSS JOIN fgeo
         |  CROSS JOIN (SELECT unnest(range(0, $k)) AS j)
         |), ${Graph.pagerankCtes}, pr AS (
         |  SELECT host AS domain, rank_fp FROM r${Graph.Iters}
         |)""".stripMargin
    val cycles = (0 until NumCycles).map { i =>
      val priorAdmitted = (0 until i).map(j => s"SELECT doc_id FROM fa$j")
        .mkString(" UNION ALL ")
      val bitsCte =
        if (i == 0) ""
        else
          s"""fbits$i AS MATERIALIZED (
             |  SELECT DISTINCT p.j, p.pos FROM fpos p
             |  WHERE p.doc_id IN ($priorAdmitted)
             |), """.stripMargin
      val seenCte =
        if (i == 0) s"fseen$i AS (SELECT doc_id FROM fr$i WHERE FALSE)"
        else
          s"""fseen$i AS (
             |  SELECT p.doc_id
             |  FROM fpos p JOIN fbits$i bb ON p.j = bb.j AND p.pos = bb.pos
             |  WHERE p.doc_id IN (SELECT doc_id FROM fr$i)
             |  GROUP BY p.doc_id HAVING COUNT(*) = $k
             |)""".stripMargin
      val ndCte =
        if (i == 0) s"fnd$i AS (SELECT DISTINCT domain FROM fa$i)"
        else {
          val prior = (0 until i).map(j => s"SELECT domain FROM fa$j")
            .mkString(" UNION ")
          s"""fnd$i AS (
             |  SELECT DISTINCT domain FROM fa$i
             |  EXCEPT ($prior)
             |)""".stripMargin
        }
      s"""fb$i AS MATERIALIZED (
         |  SELECT * FROM fcd WHERE doc_id % 7 = $i
         |), fk$i AS (
         |  SELECT canon_url, MIN(doc_id) AS doc_id FROM fb$i GROUP BY canon_url
         |), fd$i AS (
         |  SELECT fb$i.* FROM fb$i JOIN fk$i ON fb$i.doc_id = fk$i.doc_id
         |), fr$i AS MATERIALIZED (
         |  SELECT doc_id, canon_url, host, domain FROM fd$i
         |  WHERE ${Url.filterVerdictSql("duck")} = 'kept'
         |), $bitsCte$seenCte, fa$i AS MATERIALIZED (
         |  SELECT * FROM fr$i
         |  WHERE doc_id NOT IN (SELECT doc_id FROM fseen$i)
         |), fqr$i AS MATERIALIZED (
         |  SELECT fa$i.*,
         |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS q_pos
         |  FROM fa$i
         |), fkept$i AS MATERIALIZED (
         |  SELECT doc_id, canon_url, host, domain FROM fqr$i
         |  WHERE q_pos <= $CycleDomainQuota
         |), fs4_$i AS MATERIALIZED (
         |  SELECT fkept$i.*, pr.rank_fp,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY fkept$i.domain
         |         ORDER BY fkept$i.doc_id) AS INT) AS host_pos
         |  FROM fkept$i JOIN pr ON pr.domain = fkept$i.domain
         |), fper$i AS (
         |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls
         |  FROM fs4_$i GROUP BY domain
         |), ${Corpus.waterFillCtes(s"fper$i", "domain", "n_urls",
                FetchBudgetDen, s"fwf$i")},
         |fs5_$i AS MATERIALIZED (
         |  SELECT fs4_$i.* FROM fs4_$i
         |  JOIN fwf${i}_alloc a ON a.domain = fs4_$i.domain
         |  WHERE fs4_$i.host_pos <= a.alloc
         |), $ndCte""".stripMargin
    }.mkString(",\n")
    val rows = (0 until NumCycles).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS cycle_id,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fb$i) AS n_discovered,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fa$i) AS n_admitted,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fqr$i
         |   WHERE q_pos > $CycleDomainQuota) AS n_over_quota,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fs5_$i) AS n_scheduled,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fnd$i) AS n_new_domains""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $head,
       |$cycles
       |$rows
       |ORDER BY cycle_id""".stripMargin
  }

  /** Oracle: the #194 chain + NTILE tiers over `pr` + the per-domain
    * spend positions over s3 — the tier/quota/cut algebra replayed
    * relation-for-relation. */
  val crawlQuotaTiersSql: String =
    s"""WITH $pipelineCtes, tq AS (
       |  SELECT domain, rank_fp,
       |    CAST(NTILE($QuotaTiers) OVER (ORDER BY rank_fp DESC, domain)
       |      AS INT) AS tier
       |  FROM pr
       |), tqq AS (
       |  SELECT domain, rank_fp, tier,
       |    CAST($TieredBaseQuota << ($QuotaTiers - tier) AS BIGINT) AS quota
       |  FROM tq
       |), tqr AS (
       |  SELECT domain,
       |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS q_pos
       |  FROM s3
       |)
       |SELECT t.domain, t.rank_fp, t.tier, t.quota,
       |  CAST(COUNT(*) AS BIGINT) AS n_admitted,
       |  CAST(SUM(CASE WHEN r.q_pos <= t.quota THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN r.q_pos > t.quota THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_over_quota
       |FROM tqq t JOIN tqr r ON r.domain = t.domain
       |GROUP BY t.domain, t.rank_fp, t.tier, t.quota
       |ORDER BY t.domain""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crawl_pipeline" -> crawlPipeline,
    "crawl_pipeline_audit" -> crawlPipelineAudit,
    "crawl_frontier_cycles" -> crawlFrontierCycles,
    "crawl_quota_tiers" -> crawlQuotaTiers)

  val oracle: Map[String, String] = Map(
    "crawl_pipeline" -> crawlPipelineSql,
    "crawl_pipeline_audit" -> crawlPipelineAuditSql,
    "crawl_frontier_cycles" -> crawlFrontierCyclesSql,
    "crawl_quota_tiers" -> crawlQuotaTiersSql)
}
