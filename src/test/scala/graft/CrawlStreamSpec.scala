package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Crawl, Url}
import graft.streaming.CrawlStream

/** #200 streaming crawl-frontier admission: verdict-for-verdict parity
  * with the batch #194 gate stages, plus cross-restart URL-state
  * survival. */
class CrawlStreamSpec extends SparkSpec {

  private lazy val frontier = Tables.load(spark, sf, "documents")
    .filter(col("doc_id") % 7 === 0)
    .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("verdict classes equal the batch stage diffs; dup provenance is the keeper") {
    val in = Files.createTempDirectory("graft_crawl_in")
    val out = Files.createTempDirectory("graft_crawl_out")
    val ckpt = Files.createTempDirectory("graft_crawl_ck")
    val hb = CrawlStream.historyBloom(spark, sf)
    def drain(): Unit = {
      val q = CrawlStream.admissionQuery(spark, in.toString, frontier.schema,
        hb, ckpt.toString, out.toString)
      assert(q.awaitTermination(120000))
    }
    // two doc_id-ordered increments: cross-batch first-claim state is
    // exercised (canonical collapse classes span the median split)
    val sorted = frontier.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = sorted(sorted.length / 2)
    frontier.filter(col("doc_id") < mid)
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    frontier.filter(col("doc_id") >= mid)
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()

    val got = spark.read.parquet(out.toString)
      .select("doc_id", "verdict", "dup_of").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

    val f = Crawl.pipelineFrames(spark, sf)
    val input = ids(f.input); val s1 = ids(f.s1)
    val s2 = ids(f.s2); val s3 = ids(f.s3)
    assert(got.keySet == input, "one verdict per discovered URL")
    def cls(v: String) = got.collect { case (id, (`v`, _)) => id }.toSet
    assert(cls("dup_url") == input -- s1, "stage-1 diff")
    assert(cls("blocked_domain") ++ cls("banned_word") ++ cls("bad_extension")
      == s1 -- s2, "stage-2 diff")
    assert(cls("seen") == s2 -- s3, "stage-3 diff (bloom, FPs included)")
    assert(cls("admitted") == s3, "admitted = the schedule's input")

    // every dup names the batch keeper: the min doc_id of its
    // canonical class — and only dups carry provenance
    val canon = frontier
      .select(col("doc_id"), expr(Url.canonUrlSql("spark")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val keeper = canon.groupBy(_._2).map { case (c, g) => c -> g.keys.min }
    got.foreach { case (id, (v, dupOf)) =>
      if (v == "dup_url") assert(dupOf.contains(keeper(canon(id))), s"dup $id")
      else assert(dupOf.isEmpty, s"non-dup $id carries provenance")
    }

    // cross-restart: every page re-discovered under a fresh doc id —
    // all must reject against generation-1 owners
    frontier.withColumn("doc_id", col("doc_id") + lit(1000000L))
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val gen2 = spark.read.parquet(out.toString)
      .filter(col("doc_id") >= 1000000L)
      .select("verdict", "dup_of").collect()
    assert(gen2.length == input.size)
    assert(gen2.forall(_.getString(0) == "dup_url"),
      "a re-discovered URL was admitted after the restart — state lost")
    assert(gen2.forall(r => !r.isNullAt(1) && r.getLong(1) < 1000000L),
      "provenance points inside generation 2")
  }

  test("packed seen-set probe ≡ the r18 Array[Boolean] spelling; capacity require is loud") {
    import graft.functions.SketchFunctions.PolyP
    val hb = CrawlStream.historyBloom(spark, sf)
    val k = CrawlStream.BloomK
    val m = hb.mBits

    // the OLD spelling, reconstructed as ground truth: one JVM boolean
    // per filter bit, set from an independent recompute of the history
    // positions (the exact r18 construction), probed with the same
    // affine position math driver-side
    val history = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))
      .select(expr(Url.canonUrlSql("spark")).as("canon_url"))
    val geo = history.agg(countDistinct("canon_url").as("n_keys"))
      .select(expr(Url.bloomMBitsSql(
        "n_keys", Crawl.SeenBloomFpPermille, "spark")).as("m_bits"))
    val bools = new Array[Boolean]((k * m).toInt)
    graft.operators.Url.bloomPositionsSized(
        history.crossJoin(broadcast(geo)), k)
      .select("j", "pos").distinct().collect()
      .foreach(r => bools((r.getInt(0) * m + r.getLong(1)).toInt) = true)
    def oldSeen(canon: String): Boolean = {
      val hv = graft.functions.SketchFunctions.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(canon), PolyP)
      (0 until k).forall { j =>
        val pos = ((hv * (2L * j + 3L) + (13L * j + 5L)) % PolyP) % m
        bools((j * m + pos).toInt)
      }
    }

    // run the PACKED probe through the production verdict collapse
    // (verdicts() is plain batch algebra over UrlObs rows) and assert
    // the seen class equals the old probe's, URL for URL
    import spark.implicits._
    val arr = CrawlStream.arrivals(frontier)
    val keeper = arr.groupBy("k1", "k2").agg(min("doc_id").as("owner"))
    val obs = arr.join(keeper, Seq("k1", "k2"))
      .select(col("doc_id"), col("canon_url"), col("host"), col("domain"),
        col("owner")).as[CrawlStream.UrlObs]
    val got = CrawlStream.verdicts(obs, hb)
      .select("doc_id", "canon_url", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.nonEmpty)
    var seenChecked = 0
    got.foreach { case (id, canon, verdict) =>
      if (verdict == "seen" || verdict == "admitted") {
        assert((verdict == "seen") == oldSeen(canon),
          s"packed probe diverges from the Array[Boolean] spelling on $id")
        seenChecked += 1
      }
    }
    assert(seenChecked > 0, "no URL reached the seen gate")
    assert(got.exists(_._3 == "seen") && got.exists(_._3 == "admitted"),
      "the corpus must exercise both probe outcomes")

    // footprint: the packed artifact is exactly 1 bit per filter bit
    assert(hb.words.length.toLong == (hb.totalBits + 63) >> 6)

    // capacity: a geometry past the Int-word-indexed cap must refuse
    // loudly at construction, never truncate silently
    val err = intercept[IllegalArgumentException] {
      CrawlStream.HistoryBloom(Array(0L), Long.MaxValue / k)
    }
    assert(err.getMessage.contains("capacity"))
  }

  test("frontier recycling: 3 chained cycles, admitted/quota/scheduled sets equal the batch walk, discovery decays") {
    // the streaming twin of #203: the batch walk advances bloom bits
    // per cycle; the chained stream advances its URL-claim STATE — a
    // canonical claimed in cycle c rejects any cycle-c+k re-discovery
    // as dup_url, which is the same rejection the batch walk's bloom
    // calls `seen`. Classes differ by mechanism; the ADMITTED (and
    // hence scheduled) sets must be equal cycle for cycle — modulo
    // bloom false positives, which the sized geometry measures at 0
    // (a batch-side FP would over-reject vs the stream and fail this
    // leg loudly). Every cycle boundary here is also a checkpoint
    // RESTART, so the leg proves state survival three times over.
    //
    // Round 20: the #210 epoch gate CHAINS between admission and
    // schedule (epochQuotaQuery — epoch_id = batch_id = cycle), and
    // the batch walk applies the same per-(domain, cycle) quota
    // (#212's quotaCut), so the leg now also pins: the stream's
    // over_quota set == the walk's per cycle, the post-quota admitted
    // set == the walk's kept, and the scheduler — reading the
    // epoch-quota log instead of the raw verdict log — fetches the
    // QUOTA-AWARE schedule.
    val in = Files.createTempDirectory("graft_rc_in")
    val vout = Files.createTempDirectory("graft_rc_v")
    val qout = Files.createTempDirectory("graft_rc_q")
    val sout = Files.createTempDirectory("graft_rc_s")
    val ckA = Files.createTempDirectory("graft_rc_cka")
    val ckQ = Files.createTempDirectory("graft_rc_ckq")
    val ckS = Files.createTempDirectory("graft_rc_cks")
    // cold start at the #203 capacity geometry: sized for the crawl
    // plan, every bit dark — no pre-stream history
    val corpus = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), expr(Url.crawlSynthSql("spark")).as("url"))
    val m = corpus
      .select(expr(Url.canonUrlSql("spark")).as("canon_url"))
      .agg(countDistinct("canon_url").as("n_keys"))
      .select(expr(Url.bloomMBitsSql(
        "n_keys", Crawl.SeenBloomFpPermille, "spark")).as("m_bits"))
      .head().getLong(0)
    val hb = CrawlStream.emptyBloom(m)
    val ranks = graft.Checkpoints.pin(Crawl.domainRanks(spark, sf))
    val walk = Crawl.frontierCycles(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    (0 until Crawl.NumCycles).foreach { c =>
      corpus.filter(col("doc_id") % 7 === c)
        .coalesce(1).write.mode("append").parquet(in.toString)
      val qa = CrawlStream.admissionQuery(spark, in.toString,
        corpus.schema, hb, ckA.toString, vout.toString)
      assert(qa.awaitTermination(120000))
      val qq = CrawlStream.epochQuotaQuery(spark, vout.toString,
        ckQ.toString, qout.toString, quota = Crawl.CycleDomainQuota,
        epochSecs = 100L)
      assert(qq.awaitTermination(120000))
      val qs = CrawlStream.scheduleQuery(spark, qout.toString, ranks,
        ckS.toString, sout.toString)
      assert(qs.awaitTermination(120000))
    }

    val log = spark.read.parquet(vout.toString)
    val qlog = spark.read.parquet(qout.toString)
    val sched = spark.read.parquet(sout.toString)
    (0 until Crawl.NumCycles).foreach { c =>
      val cycle = log.filter(col("batch_id") === c.toLong)
      // one verdict per discovered URL of the increment
      assert(ids(cycle) == ids(walk(c).batch), s"cycle $c coverage")
      // the recycling equivalence: admitted sets equal — the batch
      // walk's advancing bloom and the stream's claim state reject
      // the same URLs
      assert(ids(cycle.filter(col("verdict") === "admitted"))
        == ids(walk(c).admitted), s"cycle $c admitted set")
      // the chained epoch gate charges this cycle's window exactly
      // (epoch_id = batch_id = cycle) and its quota cut equals the
      // batch walk's per-(domain, cycle) quotaCut, row for row
      val qcycle = qlog.filter(col("batch_id") === c.toLong)
      assert(qcycle.filter(col("epoch_id") =!= col("batch_id")).count() == 0,
        s"cycle $c charged a foreign window")
      assert(ids(qcycle.filter(col("verdict") === "admitted"))
        == ids(walk(c).kept), s"cycle $c post-quota admitted set")
      assert(ids(qcycle.filter(col("verdict") === "over_quota"))
        == ids(walk(c).overQuota), s"cycle $c over_quota set")
      // and the chained scheduler fetches exactly the batch schedule
      // (quota-aware: it reads the epoch-quota log)
      assert(ids(sched.filter(col("cycle_id") === c.toLong))
        == ids(walk(c).scheduled), s"cycle $c schedule")
      // the seen-vs-dup adjudication is visible: past cycle 0, the
      // batch walk's `seen` rejections surface here as dup_url whose
      // owner lives in an EARLIER cycle (owner cycle = dup_of % 7)
      if (c > 0) {
        val crossOwners = cycle.filter(col("verdict") === "dup_url" &&
          col("dup_of") % 7 < c.toLong).count()
        assert(crossOwners > 0, s"cycle $c carries no cross-cycle rejections")
      }
    }
    // convergence, read from the stream's own log: admitted decays
    val admittedPerCycle = (0 until Crawl.NumCycles).map(c =>
      log.filter(col("batch_id") === c.toLong &&
        col("verdict") === "admitted").count())
    assert(admittedPerCycle.last < admittedPerCycle.head,
      s"no decay: $admittedPerCycle")
    assert(admittedPerCycle.head > 0)
  }

  test("per-domain quota: flood capped at exactly the quota, order-deterministic, cross-restart, domains independent") {
    import spark.implicits._
    val vin = Files.createTempDirectory("graft_q_v")
    val qout = Files.createTempDirectory("graft_q_o")
    val ck = Files.createTempDirectory("graft_q_ck")
    val quota = 4L
    var lastStateRows = -1L
    def drain(): Unit = {
      val q = CrawlStream.quotaQuery(spark, vin.toString, ck.toString,
        qout.toString, quota)
      assert(q.awaitTermination(120000))
      lastStateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    }
    def rows(ids: Seq[Long], domain: String, verdict: String, batchId: Long) =
      ids.map(i => (i, s"https://$domain.example.com/p$i",
        s"$domain.example.com", domain, verdict, None: Option[Long], batchId))
    def write(rs: Seq[(Long, String, String, String, String, Option[Long], Long)]): Unit =
      rs.toDF("doc_id", "canon_url", "host", "domain", "verdict",
          "dup_of", "batch_id")
        .coalesce(1).write.mode("append").parquet(vin.toString)

    // increment 1: a 10-URL flood on one domain, 3 admissions on a
    // quiet domain, and dup/rule verdicts that must pass through
    write(rows(1L to 10L, "flood", "admitted", 0) ++
      rows(101L to 103L, "quiet", "admitted", 0) ++
      Seq((200L, "https://flood.example.com/dup", "flood.example.com",
            "flood", "dup_url", Some(1L), 0L),
          (201L, "https://flood.example.com/x.exe", "flood.example.com",
            "flood", "bad_extension", None: Option[Long], 0L)))
    drain()
    val got1 = spark.read.parquet(qout.toString)
      .select("doc_id", "domain", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val flood1 = got1.filter(r => r._1 <= 10L)
    assert(flood1.count(_._3 == "admitted") == quota,
      "flood admitted past the quota")
    assert(flood1.filter(_._3 == "admitted").map(_._1).toSet
      == (1L to quota).toSet, "quota must spend in (batch, doc) order")
    assert(flood1.count(_._3 == "over_quota") == 10 - quota)
    assert(got1.filter(_._2 == "quiet").forall(_._3 == "admitted"),
      "an independent domain was throttled by the flood's counter")
    assert(got1.find(_._1 == 200L).get._3 == "dup_url" &&
      got1.find(_._1 == 201L).get._3 == "bad_extension",
      "non-admitted verdicts must pass through untouched")
    assert(lastStateRows == 2, s"state rows $lastStateRows != distinct domains")

    // increment 2 across a RESTART: the flood's counter is spent —
    // every fresh flood URL rejects; the quiet domain still has
    // headroom for exactly quota − 3 more
    write(rows(11L to 15L, "flood", "admitted", 1) ++
      rows(104L to 105L, "quiet", "admitted", 1))
    drain()
    val got2 = spark.read.parquet(qout.toString)
      .filter(col("doc_id") >= 11L)
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((11L to 15L).forall(got2(_) == "over_quota"),
      "flood quota state lost across restart")
    assert(got2(104L) == "admitted" && got2(105L) == "over_quota",
      "quiet domain must admit exactly its remaining headroom")
    assert(lastStateRows == 2, "state rows grew past distinct domains")

    // the chained handoff: the scheduler reads the quota log
    // unchanged and only admitted rows reach a fetch list
    val sout = Files.createTempDirectory("graft_q_s")
    val ckS = Files.createTempDirectory("graft_q_cks")
    val ranks = Seq(("flood", 1000L), ("quiet", 900L)).toDF("domain", "rank_fp")
    val sq = CrawlStream.scheduleQuery(spark, qout.toString, ranks,
      ckS.toString, sout.toString)
    assert(sq.awaitTermination(120000))
    val scheduled = spark.read.parquet(sout.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val admittedAll = spark.read.parquet(qout.toString)
      .filter(col("verdict") === "admitted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scheduled.subsetOf(admittedAll),
      "an over-quota URL reached a fetch list")
    assert(scheduled.nonEmpty)
  }

  test("epoch-windowed quota: exact per-epoch caps, windows never leak, closed windows evict") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val quota = 3L
    val epochSecs = 100L
    val input = MemoryStream[(Long, String, String, String, String,
      Option[Long], Long, java.sql.Timestamp)]
    val q = CrawlStream.quotaVerdictsEpoch(
        input.toDS().toDF("doc_id", "canon_url", "host", "domain",
          "verdict", "dup_of", "batch_id", "arrival_ts")
          .as[CrawlStream.TimedVerdictRow], quota, epochSecs)
      .writeStream.format("memory").queryName("epoch_quota")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def rows(ids: Seq[Long], dom: String, t: Long, b: Long) =
      ids.map(i => (i, s"https://$dom/p$i", dom, dom, "admitted",
        None: Option[Long], b, ts(t)))
    try {
      // window 0 ([0, 100)s): a 6-URL flood on d + 1 quiet row on e
      input.addData(rows(1L to 6L, "d", 10, 0) ++ rows(Seq(101L), "e", 10, 0))
      q.processAllAvailable()
      // window 1: the SAME domain floods again — fresh budget
      input.addData(rows(11L to 16L, "d", 110, 1))
      q.processAllAvailable()
      // window 2: one more arrival; processing it advances the
      // watermark past window 0's end, evicting its counters
      input.addData(rows(Seq(21L), "d", 210, 2))
      q.processAllAvailable()
      // a STRAGGLER for the long-closed window 0, arriving after the
      // watermark (now 210 s) passed it: window 0's counter was
      // evicted, so if this row reached the group function with fresh
      // state it would spend budget at used = 0 — one epoch admitting
      // up to 2× quota (r19 ADVICE). Measured behavior on this Spark
      // version: the stateful operator DROPS late input before the
      // function runs (asserted below — no output row, no resurrected
      // state); the in-function `late` guard is defense in depth.
      input.addData(rows(Seq(31L), "d", 15, 3))
      q.processAllAvailable()

      val got = spark.table("epoch_quota")
        .select("doc_id", "verdict", "epoch_id").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      // per-epoch caps, spend in doc order
      assert((1L to 3L).forall(got(_) == ("admitted", 0L)))
      assert((4L to 6L).forall(got(_) == ("over_quota", 0L)))
      assert(got(101L) == ("admitted", 0L), "independent domain throttled")
      // the reset: window 1 admits a fresh quota for the same domain
      assert((11L to 13L).forall(got(_) == ("admitted", 1L)))
      assert((14L to 16L).forall(got(_) == ("over_quota", 1L)))
      assert(got(21L) == ("admitted", 2L))
      // the post-eviction straggler never re-opened window 0's budget:
      // the operator dropped it at the watermark (no verdict row), and
      // window 0's admissions stand exactly where they were
      assert(!got.contains(31L),
        s"late straggler reached the output: ${got.get(31L)}")
      assert(got.values.count(_ == ("admitted", 0L)) == 4, // 3×d + 1×e
        "window 0 admitted past its quota after eviction")
      // eviction: processing window 2 advances the watermark to 110 s
      // (closing window 0 in that batch), and the follow-up no-data
      // micro-batch advances it to 210 s, closing window 1 too — only
      // the one still-open window's counter remains
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows == 1L,
        s"state rows $stateRows != 1 live window — closed epochs not evicted")

      // boundary row AT the watermark (r21 semantics, ADVICE r21): the
      // watermark stands at 210 s after window 2's arrival; a row with
      // ts == 210 (same, still-open window) is LATE — it must not
      // spend window 2's budget. Proof by spending: 3 live follow-ups
      // (quota 3, one admission already used by id 21) — if the
      // boundary row had spent budget, id 43 would read over_quota.
      input.addData(rows(Seq(41L), "d", 210, 4))
      q.processAllAvailable()
      input.addData(rows(Seq(42L, 43L, 44L), "d", 260, 5))
      q.processAllAvailable()
      val got2 = spark.table("epoch_quota")
        .select("doc_id", "verdict", "epoch_id").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got2.get(41L).forall(_ == ("late", 2L)),
        s"boundary ts == wm row not late: ${got2.get(41L)}")
      assert(got2(42L) == ("admitted", 2L))
      assert(got2(43L) == ("admitted", 2L),
        "boundary row spent window 2's budget")
      assert(got2(44L) == ("over_quota", 2L))
    } finally q.stop()
  }

  test("tiered epoch quota: per-domain budgets cap independently, reset per window, unknown domains take the default") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the #216 budget shape: a top-tier hub at 4, a bottom-tier
    // domain at 1; 'new' is unranked and takes the default 2
    val budgets = Map("hub" -> 4L, "spam" -> 1L)
    val epochSecs = 100L
    val input = MemoryStream[(Long, String, String, String, String,
      Option[Long], Long, java.sql.Timestamp)]
    val q = CrawlStream.quotaVerdictsEpochBudgets(
        input.toDS().toDF("doc_id", "canon_url", "host", "domain",
          "verdict", "dup_of", "batch_id", "arrival_ts")
          .as[CrawlStream.TimedVerdictRow],
        budgets, defaultQuota = 2L, epochSecs)
      .writeStream.format("memory").queryName("tiered_quota")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def rows(ids: Seq[Long], dom: String, t: Long, b: Long) =
      ids.map(i => (i, s"https://$dom/p$i", dom, dom, "admitted",
        None: Option[Long], b, ts(t)))
    try {
      // window 0: the SAME 6-URL storm on all three domains — the
      // tiered budgets must cap them DIFFERENTLY
      input.addData(rows(1L to 6L, "hub", 10, 0) ++
        rows(11L to 16L, "spam", 10, 0) ++ rows(21L to 26L, "new", 10, 0))
      q.processAllAvailable()
      // window 1: the same storm again — every budget resets
      input.addData(rows(31L to 36L, "hub", 110, 1) ++
        rows(41L to 46L, "spam", 110, 1))
      q.processAllAvailable()

      val got = spark.table("tiered_quota")
        .select("doc_id", "verdict", "epoch_id").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // window 0: kept = 4 / 1 / 2 by budget, spend in doc order
      assert((1L to 4L).forall(got(_) == (("admitted", 0L))))
      assert((5L to 6L).forall(got(_) == (("over_quota", 0L))))
      assert(got(11L) == (("admitted", 0L)))
      assert((12L to 16L).forall(got(_) == (("over_quota", 0L))),
        "bottom-tier domain kept past its budget")
      assert((21L to 22L).forall(got(_) == (("admitted", 0L))))
      assert((23L to 26L).forall(got(_) == (("over_quota", 0L))),
        "unranked domain did not take the default quota")
      // window 1: fresh budgets, same caps
      assert((31L to 34L).forall(got(_) == (("admitted", 1L))))
      assert((35L to 36L).forall(got(_) == (("over_quota", 1L))))
      assert(got(41L) == (("admitted", 1L)))
      assert((42L to 46L).forall(got(_) == (("over_quota", 1L))))
    } finally q.stop()

    // and the production budget table derives from #216's tier
    // arithmetic: every ranked domain present, quotas ∈ {base << k}
    val tb = CrawlStream.tierBudgets(spark, sf)
    val T = operators.Crawl.QuotaTiers
    val base = operators.Crawl.TieredBaseQuota
    val ranked = operators.Crawl.domainRanks(spark, sf)
      .select("domain").collect().map(_.getString(0)).toSet
    assert(tb.keySet == ranked)
    assert(tb.values.toSet.subsetOf(
      (1 to T).map(t => base << (T - t)).toSet))
    assert(tb.values.toSet.size > 1, "tiering produced one flat quota")
  }

  test("per-cycle scheduler: each increment schedules like batch stages 4-5; budget exact and fair") {
    val in = Files.createTempDirectory("graft_crsch_in")
    val vout = Files.createTempDirectory("graft_crsch_v")
    val sout = Files.createTempDirectory("graft_crsch_s")
    val ckA = Files.createTempDirectory("graft_crsch_cka")
    val ckS = Files.createTempDirectory("graft_crsch_cks")
    val hb = CrawlStream.historyBloom(spark, sf)
    val ranks = graft.Checkpoints.pin(Crawl.domainRanks(spark, sf))
    def drainAdmission(): Unit = {
      val q = CrawlStream.admissionQuery(spark, in.toString, frontier.schema,
        hb, ckA.toString, vout.toString)
      assert(q.awaitTermination(120000))
    }
    def drainSchedule(): Unit = {
      val q = CrawlStream.scheduleQuery(spark, vout.toString, ranks,
        ckS.toString, sout.toString)
      assert(q.awaitTermination(120000))
    }
    // two discovery increments, each scheduled as its own cycle
    val sorted = frontier.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = sorted(sorted.length / 2)
    frontier.filter(col("doc_id") < mid)
      .coalesce(1).write.mode("append").parquet(in.toString)
    drainAdmission(); drainSchedule()
    frontier.filter(col("doc_id") >= mid)
      .coalesce(1).write.mode("append").parquet(in.toString)
    drainAdmission(); drainSchedule()

    val verdictsByBatch = spark.read.parquet(vout.toString)
      .filter(col("verdict") === "admitted")
      .select("batch_id", "doc_id", "domain").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val domainOf = spark.read.parquet(vout.toString)
      .select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val schedule = spark.read.parquet(sout.toString)
      .select("cycle_id", "doc_id", "host_pos", "rank_fp")
    // collect per cycle keyed by the admitted sets (cycle ids restart
    // per drain, so match cycles to increments by content)
    val byCycle = schedule.collect()
      .map(r => (r.getLong(0), r.getLong(1), domainOf(r.getLong(1)),
        r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byCycle.keySet.size === 2, s"expected 2 cycles: ${byCycle.keySet}")

    val rankOf = ranks.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    verdictsByBatch.values.foreach { adm =>
      val admIds = adm.map(_._2).toSet
      // find the cycle whose scheduled ids are a subset of this
      // increment's admitted set
      val cyc = byCycle.values.find(_.forall(s => admIds.contains(s._2)))
      assert(cyc.nonEmpty, "no cycle schedules this increment")
      val rows = cyc.get
      // per-domain: contiguous 1..k positions in doc_id order, a
      // prefix of the cycle's admitted queue
      val domQueue = adm.groupBy(_._3).map { case (d, g) =>
        d -> g.map(_._2).toSeq.sorted
      }
      rows.groupBy(_._3).foreach { case (d, g) =>
        val kept = g.sortBy(_._4)
        assert(kept.map(_._4).toSeq == (1 to kept.size), s"$d positions")
        assert(kept.map(_._2).toSeq == domQueue(d).take(kept.size), s"$d prefix")
        g.foreach(s => assert(s._5 == rankOf(d), s"$d rank"))
      }
      // the cycle budget is EXACT: sum of kept = admitted div den
      val budget = adm.size / Crawl.FetchBudgetDen
      assert(rows.size === budget, s"budget ${rows.size} != $budget")
      // max-min fair: capped domains' allocations within 1 of each other
      val keptPer = rows.groupBy(_._3).map { case (d, g) => d -> g.size }
      val capped = keptPer.filter { case (d, k) => k < domQueue(d).size }
      if (capped.size > 1)
        assert(capped.values.max - capped.values.min <= 1, s"unfair: $capped")
    }
  }
}
