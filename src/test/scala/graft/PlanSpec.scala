package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the properties that make the operators
  * scale-safe (SURVEY §4) asserted on the plans themselves, so a
  * regression that silently adds a shuffle, loses parquet pushdown, or
  * degrades a dimension join to a cartesian product fails CI — not a
  * 100 TB run. */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.collect() // run so AQE settles on the final plan
    // AdaptiveSparkPlan prints "== Final Plan ==" followed by
    // "== Initial Plan ==" — keep only the final plan so each
    // operator is counted once.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Count shuffle exchanges (excludes BroadcastExchange). */
  private def shuffles(plan: String): Int =
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition")
      .map(p => p.r.findAllIn(plan).length).sum

  test("q6: filters and column pruning reach the parquet scan") {
    val plan = planString(operators.Analytics.q6Forecast(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // pruned ReadSchema: none of the unused wide columns are read
    assert(!plan.contains("l_orderkey") && !plan.contains("l_comment"), plan)
  }

  test("syslog_parse: map-only parse, single shuffle for the sort") {
    val plan = planString(operators.Syslog.syslogParse(spark, sf))
    assert(shuffles(plan) <= 1, plan)
  }

  test("dedup_exact: one aggregation shuffle + presentation sort") {
    val plan = planString(operators.Dedup.dedupExact(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("events_tumbling: one aggregation shuffle + presentation sort") {
    val plan = planString(operators.Analytics.eventsTumbling(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("relay: frame+parse shuffle-free; shuffles only for synthesis groupBy, record agg, sort") {
    val plan = planString(operators.Relay.relayPipeline(spark, sf))
    // 4 = synthesis groupBy(user_id) + two-phase exact countDistinct
    // (hash on (source,dest,hostname) then (source,dest)) + range sort.
    // Every one carries partial aggregates; framing+parse add none.
    assert(shuffles(plan) <= 4, plan)
  }

  test("q4: EXISTS compiles to a semi-join, orders date filter pushed down") {
    val plan = planString(operators.Analytics.q4Priority(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"), plan)
  }

  test("q22: NOT EXISTS compiles to an anti-join; scalar aggregate broadcasts") {
    val plan = planString(operators.Analytics.q22Global(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q5: dimension joins broadcast, no cartesian product") {
    val plan = planString(operators.Analytics.q5Local(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("record_envelope: one aggregation shuffle + presentation sort") {
    val plan = planString(operators.Envelope.recordEnvelope(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("dedup_minhash: signature agg + band self-join stay within budget") {
    val plan = planString(operators.Dedup.dedupMinhash(spark, sf))
    // signature groupBy(doc_id), band join (both sides), candidate
    // dedup, doc-level sig view for the post-dedup join-back (the r11
    // slimming: one MORE exchange than the fat-band plan, but the cap
    // window / band join / pair dedup now move (doc_id, band,
    // band_hash) instead of dragging the 32-slot signatures — ×32
    // max-task shuffle fell 100/106 → 4/9 MiB), final sort — never an
    // all-pairs cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    assert(shuffles(plan) <= 7, plan)
  }

  test("record_gzip: split-window + per-part gzip stay within budget") {
    val plan = planString(operators.Envelope.recordGzip(spark, sf))
    // (source,dest) window for part assignment + per-part aggregation
    // reusing that partitioning + presentation sort
    assert(shuffles(plan) <= 2, plan)
  }

  test("firehose_retry: two greedy drains stay within budget") {
    val plan = planString(operators.Envelope.firehoseRetry(spark, sf))
    // split window, per-dest pack (drain 1), per-dest re-pack of the
    // failed subset (drain 2), the two batch aggregations, final sort —
    // the sequential fold never leaves the per-dest partition
    assert(shuffles(plan) <= 5, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_embedding_lsh: equality join on the bucket code only — never all-pairs") {
    val plan = planString(operators.Dedup.dedupEmbeddingLsh(spark, sf))
    // the bench headliner for embedding near-dup: candidates must come
    // from the LSH bucket equality join (shuffle or broadcast HASH
    // join keyed on the code), never a cartesian/nested-loop product
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // duplicate-collapse window + bucket cap + probe explode + bucket
    // join + pair dedup + group expansion joins + sort stay in budget:
    // every exchange here moves slim rep/id rows, and the collapse is
    // what keeps duplicate-heavy corpora from multiplying the
    // candidate stage (round-8 stress finding)
    assert(shuffles(plan) <= 10, plan)
  }

  test("dedup_semantic: keeper side group-limited pre-shuffle, no cartesian pair join") {
    val plan = planString(operators.Similarity.dedupSemantic(spark, sf))
    // the rk <= SemKeeperCap filter must compile to Spark's two-phase
    // WindowGroupLimit so the keeper side is bounded at cap rows per
    // cluster BEFORE its exchange — the property that keeps the pair
    // join's build side at cap*K rows at ANY corpus size
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains(s"row_number(), ${operators.Similarity.SemKeeperCap}"),
      plan)
    // the only cross joins are the k-row centroid broadcasts the
    // k-means family already audits; the PAIR join itself must be an
    // equality join on cid (broadcast or shuffled), never a cartesian
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_jaccard: prefix-filtered candidates, no cartesian") {
    val plan = planString(operators.Dedup.dedupJaccard(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("corpus_decontaminate: benchmark n-grams broadcast, no cartesian") {
    val plan = planString(operators.Corpus.corpusDecontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("pii_scrub: map-only redaction, single shuffle for the sort") {
    val plan = planString(operators.Scrub.piiScrub(spark, sf))
    assert(shuffles(plan) <= 1, plan)
  }

  test("events_asof: window + final sort only — the as-of never self-joins") {
    val plan = planString(operators.Sequence.eventsAsof(spark, sf))
    assert(shuffles(plan) <= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_funnel: three windows and the groupBy share one user_id shuffle") {
    val plan = planString(operators.Sequence.eventsFunnel(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("basket_pairs: one fact shuffle to baskets, in-array pair explosion, top-k heap") {
    val plan = planString(operators.Analytics.basketPairs(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // basket groupBy + pair count + support count + (≤2) support joins;
    // the fact itself crosses an exchange exactly once
    assert(shuffles(plan) <= 5, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("events_actives: fact thins to distinct (user, day) in one shuffle; no range self-join") {
    val plan = planString(operators.Sequence.eventsActives(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // distinct(user,day) + dau agg + post-explode distinct + wau agg +
    // dau⋈wau + presentation sort — all on already-thinned frames
    assert(shuffles(plan) <= 6, plan)
  }

  test("events_range_join: bucketized to an equality hash join, never nested-loop") {
    val plan = planString(operators.Sequence.eventsRangeJoin(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(shuffles(plan) <= 3, plan)
  }

  test("corpus_ngrams: global top-k via per-partition heaps, not a full sort") {
    val plan = planString(operators.Ngrams.corpusNgrams(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // n-gram generation map-only; count+distinct two-phase agg only
    assert(shuffles(plan) <= 3, plan)
  }

  test("text_keywords: tf/df equality join, no cartesian") {
    val plan = planString(operators.Ngrams.textKeywords(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(shuffles(plan) <= 7, plan)
  }

  test("sketch_distinct: bounded-state sketch aggregate stays in budget") {
    val plan = planString(operators.Sketch.sketchDistinct(spark, sf))
    // TypedImperativeAggregate runs via ObjectHashAggregate
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(shuffles(plan) <= 4, plan)
  }

  test("corpus_passage_dedup: groupBy-MIN ownership, join-back, no cartesian") {
    val plan = planString(operators.Corpus.corpusPassageDedup(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // passage min-agg (partial/final) + join-back + doc reassembly + sort
    assert(shuffles(plan) <= 4, plan)
    // ownership agg carries a map-side partial (bounds hot passages)
    assert(plan.contains("partial_min") || plan.contains("partial min"), plan)
  }

  test("corpus_domain_cap: single window shuffle + presentation sort") {
    val plan = planString(operators.Corpus.corpusDomainCap(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("spool source scan: pruning and header pushdown visible in the plan") {
    val scratch = graft.sources.Spool.writeSpoolDir(spark, sf)
    val df = spark.read.format("graft-spool").load(scratch)
      .filter(org.apache.spark.sql.functions.col("log_stream") === "10.0.0.1")
      .select("message")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("log_stream"), plan)
    // pruned to the filter column + projection — the other 7 never read
    assert(plan.contains("ReadSchema: struct<log_stream:string,message:string>"),
      plan)
  }

  test("ann_bruteforce: corpus never shuffles its vectors (broadcast query side)") {
    val plan = planString(operators.Similarity.annBruteforce(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    // shuffles: window by query_id + final sort only
    assert(shuffles(plan) <= 2, plan)
  }

  test("ann_int8: codes-sidecar scan broadcasts queries; full vectors join back broadcast-only") {
    val plan = planString(operators.Similarity.annInt8(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // approx pass: query codes broadcast against the corpus codes;
    // rerank: candidate rows broadcast against the vector table —
    // the corpus itself never hash-shuffles for a join
    assert(!plan.contains("SortMergeJoin"), plan)
    // shuffles: approx top-R window, rerank top-k window, final sort
    assert(shuffles(plan) <= 3, plan)
  }

  test("q17: brand part keys broadcast; correlated subquery decorrelated to one extra shuffle") {
    val plan = planString(operators.Analytics.q17Smallqty(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // per-part agg + its join back + final single-row agg
    assert(shuffles(plan) <= 4, plan)
  }

  test("corpus_decontaminate_fuzzy: bench bands broadcast — the corpus never shuffles for the join") {
    val plan = planString(operators.Corpus.corpusDecontaminateFuzzy(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // signature agg on doc_id + hit agg + left join-back + final sort;
    // the train×bench candidate join itself is broadcast, shuffle-free
    assert(shuffles(plan) <= 5, plan)
  }

  test("corpus_decontaminate_bloom: position set broadcast, no cartesian") {
    val plan = planString(operators.Corpus.corpusDecontaminateBloom(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("events_gap_quantiles: histogram agg precedes the cumulative window") {
    val plan = planString(operators.Sequence.eventsGapQuantiles(spark, sf))
    // per-user lag window + histogram agg + tiny-frame cum window +
    // final agg/sort — bounded budget, no cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    assert(shuffles(plan) <= 6, plan)
  }

  test("events_pivot: one aggregation shuffle + presentation sort") {
    val plan = planString(operators.Analytics.eventsPivot(spark, sf))
    assert(shuffles(plan) <= 2, plan)
  }

  test("text_bigram_score: uniform bigram-keyed equality join, no cartesian") {
    val plan = planString(operators.Ngrams.textBigramScore(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sketch_heavy: cells broadcast back; top-k never sorts all tokens") {
    val plan = planString(operators.Sketch.sketchHeavy(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // token agg + cells agg (+ AQE may reuse); estimate min-agg
    assert(shuffles(plan) <= 4, plan)
    // the CmsTopK cut is a bounded TakeOrderedAndProject, not a sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q10: returnflag + date filters pushed; top-20 is TakeOrdered, nation broadcast") {
    val plan = planString(operators.Analytics.q10Returns(spark, sf))
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q19: disjunctive filter keeps an equi hash join, no nested loop") {
    // at spec SF the disjunction matches zero rows and AQE would
    // collapse the whole tree to EmptyRelation — audit the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan =
        operators.Analytics.q19Disjunct(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      // the OR is not pushable per-conjunct, but partkey equi-join remains
      assert(plan.contains("HashJoin"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q15: max-revenue subquery broadcasts one row back; supplier joins after filter") {
    val plan = planString(operators.Analytics.q15Topsupp(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // per-supplier agg + supplier join + presentation sort only
    assert(shuffles(plan) <= 4, plan)
  }

  test("corpus_diversity: pre-shuffle state bounded by a partial WindowGroupLimit") {
    val plan = planString(operators.Similarity.corpusDiversity(spark, sf))
    // rank is kept in the output, so the TopKPerKey rewrite correctly
    // skips this plan; Spark's two-phase WindowGroupLimit must bound
    // the per-task rows to quota·keys before the cluster shuffle
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q20: nested IN-with-HAVING plans as a semi-join against the aggregated frame") {
    val plan = planString(operators.Analytics.q20Excess(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q16: NOT IN blacklist plans as an anti-join before the distinct count") {
    // at spec SF the blacklist is empty and AQE (correctly) erases the
    // anti-join entirely — audit the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = operators.Analytics.q16Partcount(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("corpus_decontaminate_embed: compiled probe over a broadcast suite, no corpus shuffle") {
    val plan = planString(operators.Similarity.corpusDecontaminateEmbed(spark, sf))
    // the eval suite must arrive as ONE broadcast row (nested-loop
    // against a 1-row build side = map-only probe)...
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // ...probed by the compiled kernel, not an interpreted HOF chain
    // (the 34x regression the EvalHitsL swap fixed)
    assert(plan.toLowerCase.contains("evalhits"), plan)
    // shuffles: the suite's SinglePartition collect + presentation
    // sort — the train corpus itself never exchanges
    assert(shuffles(plan) <= 2, plan)
  }

  test("text_url_canon / corpus_url_filter: map-only string algebra + presentation sort") {
    Seq(operators.Url.urlCanon(spark, sf),
      operators.Url.urlFilter(spark, sf)).foreach { df =>
      val plan = planString(df)
      assert(shuffles(plan) <= 1, plan)
      assert(!plan.contains("Join"), plan)
    }
  }

  test("corpus_url_dedup: map-side partial aggregation before the canon_url shuffle") {
    val plan = planString(operators.Url.urlDedup(spark, sf))
    // duplicates collapse BEFORE the exchange — the property that made
    // the twin-amplified x32 sweep ship 1 MiB of total shuffle
    assert(plan.contains("partial_min") || plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(shuffles(plan) <= 4, plan)
  }

  test("corpus_drift: single token aggregate, top-k never full-sorts") {
    val plan = planString(operators.Corpus.corpusDrift(spark, sf))
    // orderBy+limit must plan as TakeOrdered (per-partition heaps),
    // not a corpus-wide range sort
    assert(plan.contains("TakeOrdered"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    // token counts agg + the 1-row totals' SinglePartition
    assert(shuffles(plan) <= 2, plan)
  }

  test("corpus_mix_temperature: quota broadcasts back; one rank window over the corpus") {
    val plan = planString(operators.Corpus.corpusMixTemperature(spark, sf))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // lang-count agg (+1-row total), rank window, presentation sort
    assert(shuffles(plan) <= 5, plan)
  }

  test("ann_ivfpq: model sides broadcast, both ranks bounded-heap, no cartesian") {
    val plan = planString(operators.Similarity.annIvfPq(spark, sf))
    // coarse centroids / residual codebooks / cross table / LUT /
    // probes / shortlist are all model-sized broadcasts
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the ADC shortlist rank and the exact rerank rank both ride the
    // TopKRewrite bounded-heap plan (never a full per-query sort)
    assert(plan.contains("TopKPerKey") || plan.contains("WindowGroupLimit"), plan)
  }

  test("blanket audit: no declared query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin with a tiny broadcast side is a
    // legitimate tool (ann query fan-out, centroid assignment); an
    // un-broadcast CartesianProduct never is. Planning only — no
    // execution — so the whole 100-query surface stays cheap to audit.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  test("q13: left join preserves order-less customers; two agg shuffles by nature") {
    val plan = planString(operators.Analytics.q13Custdist(spark, sf))
    assert(plan.contains("LeftOuter") || plan.contains("BuildRight"), plan)
    assert(shuffles(plan) <= 4, plan)
  }
}
