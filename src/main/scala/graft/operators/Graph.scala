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
  * the synthesis). Multi-edges aggregate to weights.
  *
  * Dangling mass (r17): the shared kernel [[pagerankOn]] runs the
  * STANDARD correction — nodes are src ∪ dst, and rank parked on
  * out-degree-0 sinks redistributes uniformly each round,
  * (85·D) div (100·N) per node (Page et al. 1999 §2.7; floor division
  * so both engines agree bit-for-bit). On the corpus domain graph
  * every node has out-degree ≥ 1 by construction (dst residues range
  * over the source ids), so the term is structurally zero there and
  * the oracle replay needs no dangling CTE — the GraphSpec planted
  * sink graph is where the correction is value-verified against an
  * independent recompute.
  *
  * Scale shape (100 TB): the ONLY corpus-scale stage is the edge
  * aggregation — one map-side-combined groupBy (src, dst) that
  * collapses ~N docs to the domain graph (≪ corpus: domains are
  * millions where docs are billions). Every iteration joins the
  * domain-sized rank frame to the domain-sized edge list and
  * aggregates by dst — no stage after edge extraction ever rescans
  * the corpus. The edge frame is pinned (Checkpoints discipline); the
  * rounds themselves stay LAZY, which at the fixed small [[Iters]]
  * keeps the whole iteration one bounded job — a caller raising Iters
  * past ~10 should pin per round (the #79/#127 discipline, where
  * unbounded plan nesting is the driver-side hazard).
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

  /** One PageRank run over a weighted edge frame (src, dst, w): the
    * shared kernel behind #178, #189 and the planted-sink spec.
    * Nodes = src ∪ dst (a sink that only ever appears as a target is
    * still a node); each round is
    *
    *   rank'(v) = Base + Σ_{u→v} (85·w(u,v)·rank(u)) div (100·out(u))
    *            + (85·D) div (100·N)
    *
    * with D = Σ rank over out-degree-0 sinks — the dangling mass that
    * would otherwise leak out of the system each round. All floor
    * division and BIGINT sums: bit-identical across engines and
    * partitionings. Returns the per-round rank frames r_0..r_iters
    * (all lazy; callers consume the last for the rank report, adjacent
    * pairs for the convergence audit). */
  private[graft] def pagerankRounds(edges: DataFrame,
                                    iters: Int): Seq[DataFrame] = {
    val out = edges.groupBy("src").agg(sum("w").as("out_w"))
    val nodes = graft.Checkpoints.pin(edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct())
    // Whether the graph has sinks is a STATIC property, probed once on
    // the domain-sized node frame (one tiny job against the pinned
    // edge blocks). Sink-free graphs — the corpus domain graph by
    // construction — keep the r16 plan exactly: folding an
    // always-empty dangling aggregate into every round would make
    // each lazy rank plan reference its predecessor TWICE (once for
    // flow, once for the dangling scalar), doubling the nested plan
    // per round — measured 2.5× on the benched corpus query for a
    // term that is provably zero there.
    val sinks = nodes.join(out.withColumnRenamed("src", "host"),
      Seq("host"), "left_anti")
    val hasSinks = !sinks.isEmpty
    // pinned when consumed per round: the dangling aggregate reads it
    // every iteration
    val sinksP = if (hasSinks) graft.Checkpoints.pin(sinks) else sinks
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.withColumn("rank_fp", lit(FP))
    val rounds = Seq.newBuilder[DataFrame]
    rounds += ranks
    for (_ <- 1 to iters) {
      val contrib = edges.join(out, "src")
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .select(col("dst"),
          expr("(85 * w * rank_fp) div (100 * out_w)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      val flowed = nodes
        .join(contrib.withColumnRenamed("dst", "host"), Seq("host"), "left")
      ranks =
        if (!hasSinks)
          flowed.select(col("host"),
            (lit(Base) + coalesce(col("s"), lit(0L))).as("rank_fp"))
        else {
          // dangling share: one scalar aggregate over the sink ranks,
          // redistributed uniformly (Page et al. 1999 §2.7). The rank
          // frame is PINNED per round on this path — each round reads
          // its predecessor twice (flow + dangling scalar), so a lazy
          // chain would double per round; pinning keeps growth linear
          // at one domain-sized materialization per round (the #79
          // discipline).
          val dang = ranks.join(sinksP, Seq("host"), "left_semi")
            .agg(coalesce(sum("rank_fp"), lit(0L)).as("d_mass"))
          graft.Checkpoints.pin(
            flowed.crossJoin(dang).crossJoin(n)
              .select(col("host"),
                (lit(Base) + coalesce(col("s"), lit(0L)) +
                  expr("(85 * d_mass) div (100 * n_nodes)")).as("rank_fp")))
        }
      rounds += ranks
    }
    rounds.result()
  }

  /** The corpus domain-graph edge frame — the ONE corpus-scale stage:
    * docs collapse to the weighted domain graph. Pinned (Checkpoints
    * discipline) because every iteration and the final report consume
    * it — an unpinned lineage would rescan the corpus once per round. */
  private[graft] def corpusEdges(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select("doc_id", "source")
    val nsrc = d.agg(countDistinct("source").as("nsrc"))
    graft.Checkpoints.pin(d.crossJoin(nsrc)
      .select(col("source").as("src"),
        explode(array(LinkOffsets.map(o => expr(tgtSql("spark", o))): _*))
          .as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w")))
  }

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = corpusEdges(spark, dir)
    val out = edges.groupBy("src").agg(sum("w").as("out_w"))
    val inw = edges.groupBy("dst").agg(sum("w").as("in_w"))
      .withColumnRenamed("dst", "host")
    // out-degrees join LEFT so a sink node (ranked by the kernel's
    // dangling-mass path) still reports, with out_w = 0 — the corpus
    // graph is sink-free, but the report must honor the kernel's
    // sink-aware contract for any caller-supplied graph
    pagerankRounds(edges, Iters).last
      .join(out.withColumnRenamed("src", "host"), Seq("host"), "left")
      .join(inw, Seq("host"), "left")
      .select(col("host"), col("rank_fp"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
      .orderBy(col("rank_fp").desc, col("host"))
  }

  /** The unrolled-round CTE chain shared by the #178 rank oracle and
    * the #189 convergence oracle — every CTE MATERIALIZED (the
    * memory-hard rule: the converge select references each r_k twice
    * and an inlined chain re-evaluates the corpus-scale e0 per
    * reference). The dangling term is structurally zero on this graph
    * (every node has out-links — see the object scaladoc), so the
    * replay carries no dangling CTE. */
  private[graft] val pagerankCtes: String = {
    val targets = LinkOffsets.map(o => tgtSql("duck", o)).mkString(", ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT nd.host, $Base + COALESCE(c.s, 0) AS rank_fp
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst,
         |      CAST(SUM((85 * e.w * r.rank_fp) // (100 * o.out_w)) AS BIGINT) AS s
         |    FROM e JOIN o ON e.src = o.src JOIN r${i - 1} r ON e.src = r.host
         |    GROUP BY e.dst
         |  ) c ON c.dst = nd.host
         |)""".stripMargin
    }.mkString(", ")
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, source FROM documents
       |), n1 AS MATERIALIZED (
       |  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS nsrc FROM d
       |), e0 AS MATERIALIZED (
       |  SELECT source AS src, unnest([$targets]) AS dst FROM d, n1
       |), e AS MATERIALIZED (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst
       |), o AS MATERIALIZED (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src
       |), iw AS MATERIALIZED (
       |  SELECT dst AS host, CAST(SUM(w) AS BIGINT) AS in_w FROM e GROUP BY dst
       |), nd AS MATERIALIZED (
       |  SELECT DISTINCT source AS host FROM d
       |), r0 AS MATERIALIZED (
       |  SELECT host, CAST($FP AS BIGINT) AS rank_fp FROM nd
       |), $rounds""".stripMargin
  }

  val pagerankSql: String =
    s"""WITH $pagerankCtes
       |SELECT r.host, r.rank_fp, COALESCE(o.out_w, 0) AS out_w,
       |  COALESCE(iw.in_w, 0) AS in_w
       |FROM r$Iters r
       |LEFT JOIN o ON o.src = r.host
       |LEFT JOIN iw ON iw.host = r.host
       |ORDER BY r.rank_fp DESC, r.host""".stripMargin

  // ---------------------------------------------------------------------
  // #189 corpus_pagerank_converge — the measurement that justifies Iters
  // ---------------------------------------------------------------------

  /** Per-round convergence audit: Σ|r_k − r_{k−1}|, max per-node
    * delta, and the count of still-moving nodes, one row per round —
    * the report a deployment reads to decide its iteration budget
    * (ranks are fixed-point BIGINTs, so "delta below a permille of
    * total mass" is an exact integer predicate here, not a float
    * tolerance). Each round's delta is one domain-sized self-join of
    * adjacent lazy rank frames over the SAME pinned edge blocks the
    * rank query iterates — no extra corpus scan. */
  def pagerankConverge(spark: SparkSession, dir: String): DataFrame = {
    val rounds = pagerankRounds(corpusEdges(spark, dir), Iters)
    rounds.sliding(2).zipWithIndex.map { case (Seq(prev, next), i) =>
      next.withColumnRenamed("rank_fp", "r_next")
        .join(prev.withColumnRenamed("rank_fp", "r_prev"), Seq("host"))
        .agg(
          sum(abs(col("r_next") - col("r_prev"))).as("sum_abs_delta"),
          max(abs(col("r_next") - col("r_prev"))).as("max_abs_delta"),
          sum((col("r_next") =!= col("r_prev")).cast("long")).as("n_moved"))
        .select(lit(i + 1L).as("iter"), col("sum_abs_delta"),
          col("max_abs_delta"), col("n_moved"))
    }.reduce(_ unionByName _).orderBy("iter")
  }

  val pagerankConvergeSql: String = {
    val per = (1 to Iters).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS iter,
         |  CAST(SUM(ABS(a.rank_fp - b.rank_fp)) AS BIGINT) AS sum_abs_delta,
         |  CAST(MAX(ABS(a.rank_fp - b.rank_fp)) AS BIGINT) AS max_abs_delta,
         |  CAST(SUM(CASE WHEN a.rank_fp <> b.rank_fp THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved
         |FROM r$i a JOIN r${i - 1} b ON a.host = b.host""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $pagerankCtes
       |$per
       |ORDER BY iter""".stripMargin
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
    "corpus_pagerank_converge" -> pagerankConverge,
    "corpus_frontier_rank" -> frontierRank)

  val oracle: Map[String, String] = Map(
    "corpus_pagerank" -> pagerankSql,
    "corpus_pagerank_converge" -> pagerankConvergeSql,
    "corpus_frontier_rank" -> frontierRankSql)
}
