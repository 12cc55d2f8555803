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
      s4: DataFrame, s5: DataFrame)

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

    // stage 0: the discovered batch
    val input = graft.Checkpoints.pin(c.filter(col("doc_id") % 7 === 0))

    // stage 1: canonical-URL dedup within the batch (min-doc_id keeper)
    val keep = input.groupBy("canon_url").agg(min("doc_id").as("doc_id"))
    val s1 = graft.Checkpoints.pin(
      input.join(keep.select("doc_id"), Seq("doc_id"), "left_semi"))

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

    Frames(input, s1, s2, s3, s4, s5)
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
    val s5 = graft.Checkpoints.pin(
      s4.join(broadcast(alloc.select("domain", "alloc")), Seq("domain"))
        .filter(col("host_pos") <= col("alloc"))
        .drop("alloc"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crawl_pipeline" -> crawlPipeline,
    "crawl_pipeline_audit" -> crawlPipelineAudit)

  val oracle: Map[String, String] = Map(
    "crawl_pipeline" -> crawlPipelineSql,
    "crawl_pipeline_audit" -> crawlPipelineAuditSql)
}
