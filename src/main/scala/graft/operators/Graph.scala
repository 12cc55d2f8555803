package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-graph link analysis for crawl-frontier prioritization
  * (SURVEY §2 #178).
  *
  * A crawl pipeline doesn't just FILTER its frontier (#162) and dedup
  * it (#157) — it ORDERS it: PageRank over the domain-level link graph
  * is the classic crawl prioritization signal (Page et al. 1999; Cho
  * et al. 1998 use it to schedule fetches), and domain-level rank is
  * what CommonCrawl publishes with each snapshot (its host- and
  * domain-level webgraph ranks). This operator derives the domain
  * graph FROM the corpus (each document contributes out-links from its
  * host) and runs a fixed number of damped power-iteration rounds.
  *
  * Integer-exact iteration: ranks are fixed-point BIGINTs (FP = 2^20
  * per node initially). One round is
  *
  *   rank'(v) = Base + Σ_{u→v} (85 · w(u,v) · rank(u)) ÷ (100 · out(u))
  *
  * with ÷ the floor division both engines spell natively (`div` /
  * `//`), Base = ⌊0.15 · FP⌋ the per-node teleport mass, and the sum a
  * BIGINT Σ — order-independent, so the result is bit-identical across
  * engines and partitionings. No float ever appears; the oracle
  * replays the rounds as an unrolled CTE chain (the #127 BPE-training
  * precedent).
  *
  * Link synthesis: documents carry no outlinks, so each doc emits
  * three deterministic targets `src((doc_id·31 + off) % nsrc)` (the
  * #156 URL-synthesis pattern — both engines build the same edges from
  * the same residues, so the oracle verifies the PageRank algebra, not
  * the synthesis). Multi-edges aggregate to weights; every source has
  * documents, so every node has out-degree ≥ 1 and the dangling-mass
  * case cannot arise by construction (documented, not silently
  * assumed: the left join on in-edges still defaults missing inbound
  * mass to 0).
  *
  * Scale shape (100 TB): the ONLY corpus-scale stage is the edge
  * aggregation — one map-side-combined groupBy (src, dst) that
  * collapses ~N docs to the domain graph (≪ corpus: domains are
  * millions where docs are billions). Every iteration joins the
  * domain-sized rank frame to the domain-sized edge list and
  * aggregates by dst — no stage after edge extraction ever rescans the
  * corpus. Ranks are localCheckpoint'd per round (the #79
  * connected-components discipline) so the Catalyst plan stays
  * constant-size at any iteration count.
  */
object Graph {

  /** Fixed-point scale: initial rank per node. */
  val FP: Long = 1L << 20
  /** Teleport mass per node: ⌊0.15 · FP⌋ (d = 0.85). */
  val Base: Long = 15L * FP / 100L
  /** Power-iteration rounds. */
  val Iters = 5
  /** Out-links per document: target residue offsets. */
  val LinkOffsets: Seq[Int] = Seq(3, 10, 17)

  private def tgtSql(dialect: String, off: Int): String = {
    val cast = if (dialect == "spark") "STRING" else "VARCHAR"
    s"concat('src', CAST((doc_id * 31 + $off) % nsrc AS $cast))"
  }

  // ---------------------------------------------------------------------
  // #178 corpus_pagerank — damped PageRank over the domain graph
  // ---------------------------------------------------------------------

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select("doc_id", "source")
    val nsrc = d.agg(countDistinct("source").as("nsrc"))
    // the ONE corpus-scale stage: docs collapse to the weighted domain
    // graph. Pinned (Checkpoints discipline) because every iteration
    // and the final report consume it — an unpinned lineage would
    // rescan the corpus once per round.
    val edges = graft.Checkpoints.pin(d.crossJoin(nsrc)
      .select(col("source").as("src"),
        explode(array(LinkOffsets.map(o => expr(tgtSql("spark", o))): _*))
          .as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w")))
    val out = edges.groupBy("src").agg(sum("w").as("out_w"))
    val inw = edges.groupBy("dst").agg(sum("w").as("in_w"))
      .withColumnRenamed("dst", "host")
    val nodes = edges.select(col("src").as("host")).distinct()
    // the rounds stay LAZY: at a fixed small Iters the nested plan is
    // bounded (5 joins of domain-sized frames over the pinned edge
    // blocks — one job instead of one per round); a caller raising
    // Iters past ~10 should pin per round (the #79/#127 discipline,
    // where unbounded nesting is the driver-side hazard)
    var ranks = nodes.withColumn("rank_fp", lit(FP))
    for (_ <- 1 to Iters) {
      val contrib = edges.join(out, "src")
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .select(col("dst"),
          expr("(85 * w * rank_fp) div (100 * out_w)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "host"), Seq("host"), "left")
        .select(col("host"),
          (lit(Base) + coalesce(col("s"), lit(0L))).as("rank_fp"))
    }
    ranks
      .join(out.withColumnRenamed("src", "host"), Seq("host"))
      .join(inw, Seq("host"), "left")
      .select(col("host"), col("rank_fp"), col("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
      .orderBy(col("rank_fp").desc, col("host"))
  }

  val pagerankSql: String = {
    val targets = LinkOffsets.map(o => tgtSql("duck", o)).mkString(", ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT nd.host, $Base + COALESCE(c.s, 0) AS rank_fp
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst,
         |      CAST(SUM((85 * e.w * r.rank_fp) // (100 * o.out_w)) AS BIGINT) AS s
         |    FROM e JOIN o ON e.src = o.src JOIN r${i - 1} r ON e.src = r.host
         |    GROUP BY e.dst
         |  ) c ON c.dst = nd.host
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, source FROM documents
       |), n1 AS (
       |  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS nsrc FROM d
       |), e0 AS (
       |  SELECT source AS src, unnest([$targets]) AS dst FROM d, n1
       |), e AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst
       |), o AS (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src
       |), iw AS (
       |  SELECT dst AS host, CAST(SUM(w) AS BIGINT) AS in_w FROM e GROUP BY dst
       |), nd AS (
       |  SELECT DISTINCT source AS host FROM d
       |), r0 AS (
       |  SELECT host, CAST($FP AS BIGINT) AS rank_fp FROM nd
       |), $rounds
       |SELECT r.host, r.rank_fp, o.out_w, COALESCE(iw.in_w, 0) AS in_w
       |FROM r$Iters r
       |JOIN o ON o.src = r.host
       |LEFT JOIN iw ON iw.host = r.host
       |ORDER BY r.rank_fp DESC, r.host""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #186 corpus_frontier_rank — rank-prioritized fetch queues
  // ---------------------------------------------------------------------

  /** The frontier composition: #162's rule battery decides WHAT may be
    * fetched, #178's PageRank decides in WHAT ORDER — kept URLs join
    * their registrable domain's rank and take a per-domain queue
    * position (crawl schedulers interleave per-host queues by host
    * priority; Cho et al. 1998's PageRank-ordered crawling). The
    * window is PARTITIONED BY domain — a global fetch_order would be
    * a single-partition sort at 100 TB; the per-domain position plus
    * the domain's rank is everything the scheduler's interleave
    * needs. The filter output's host ('srcN.example.com') joins the
    * rank graph's node ('srcN') on the registrable-domain prefix —
    * one broadcast-sized join (the rank table is domain-sized). */
  def frontierRank(spark: SparkSession, dir: String): DataFrame =
    Url.urlFilter(spark, dir)
      .filter(col("verdict") === "kept")
      .withColumn("domain", expr("split_part(host, '.', 1)"))
      .join(pagerank(spark, dir)
        .select(col("host").as("domain"), col("rank_fp")), Seq("domain"))
      .withColumn("host_pos", expr(
        "CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS INT)"))
      .select(col("doc_id"), col("host"), col("rank_fp"), col("host_pos"))
      .orderBy(col("rank_fp").desc, col("host"), col("doc_id"))

  val frontierRankSql: String =
    s"""WITH f AS ($urlFilterOracle), pr AS ($pagerankSql)
       |SELECT f.doc_id, f.host, pr.rank_fp,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY pr.host ORDER BY f.doc_id) AS INT)
       |    AS host_pos
       |FROM f JOIN pr ON split_part(f.host, '.', 1) = pr.host
       |WHERE f.verdict = 'kept'
       |ORDER BY pr.rank_fp DESC, f.host, f.doc_id""".stripMargin

  private def urlFilterOracle: String = Url.oracle("corpus_url_filter")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pagerank" -> pagerank,
    "corpus_frontier_rank" -> frontierRank)

  val oracle: Map[String, String] = Map(
    "corpus_pagerank" -> pagerankSql,
    "corpus_frontier_rank" -> frontierRankSql)
}
