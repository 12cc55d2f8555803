package graft

import org.apache.spark.sql.functions._

/** Scale-technique specs (#42 salting, #43 bucketing). */
class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val e = Tables.events(spark, sf)
    val direct = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("su"))
      .orderBy("event_type").collect()
    val salted = operators.Skew.saltedAgg(e, Seq("event_type"), 8)(
      Seq(count(lit(1)).as("pn"), sum("user_id").as("psu")),
      Seq(sum("pn").as("n"), sum("psu").as("su")))
      .orderBy("event_type").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("salted sorted collect equals direct ordered collect") {
    // QUARANTINED composition (was Skew.saltedSortedCollect): a
    // complete per-key ordered list is unbounded by definition, so the
    // variant was removed from the public API (VERDICT r12 #7); the
    // algebra proof — salting never changes an ordered collect's
    // result — stays here, built from the still-public saltedAgg
    val e = Tables.events(spark, sf).limit(2000)
    val direct = e.groupBy("user_id")
      .agg(transform(array_sort(collect_list(struct(col("event_id").as("o"),
        col("event_type").as("p")))), x => x.getField("p")).as("items"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val salted = operators.Skew.saltedAgg(e, Seq("user_id"), 8)(
        Seq(collect_list(struct(col("event_id").as("o"),
          col("event_type").as("p"))).as("part")),
        Seq(transform(array_sort(flatten(collect_list(col("part")))),
          x => x.getField("p")).as("items")))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(salted.toSeq === direct.toSeq)
  }

  test("saltedTopN bounds stage-2 input at buckets·N per key on a crafted hot key") {
    import spark.implicits._
    val buckets = 8
    val n = operators.Skew.SkewTopN
    val rows = 200000
    // one key owning ~95% of the table — the hot-source mode the
    // uncapped collect would funnel into a single reducer's array
    val df = spark.range(rows)
      .select(when(col("id") % 20 =!= 0, lit("hot"))
        .otherwise(concat(lit("cold"), col("id") % 50)).as("key"),
        col("id").as("v"))
      .repartition(16)
    // the scale property, asserted on the ACTUAL stage-2 input frame:
    // per (key, salt) exactly one row whose array never exceeds N —
    // so the stage-2 merge of any key handles ≤ buckets·N elements,
    // independent of how many rows the hot key has
    val partials = operators.Skew.saltedTopNPartials(
      df, Seq("key"), buckets, n, col("v"), col("v"))
    val stat = partials.agg(
      count(lit(1)).as("rows"), max(size(col("part"))).as("maxLen")).head
    assert(stat.getLong(0) <= 51L * buckets,
      s"stage-2 input rows ${stat.getLong(0)} exceed keys×buckets")
    assert(stat.getInt(1) <= n, s"a partial kept ${stat.getInt(1)} > N=$n rows")
    // and the STAGE-1 buffer is bounded too (ADVICE r12): the
    // row_number()<=N filter plans as WindowGroupLimit — a bounded
    // per-group heap during the sort — so no task ever materializes a
    // hot (key, salt) group's full row set before the cap applies
    val plan = partials.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not plan as WindowGroupLimit:\n$plan")
    // and the algebra is unchanged: the capped two-stage result equals
    // the plain window top-N on the hot key and a cold key
    val out = operators.Skew.saltedTopN(
        df, Seq("key"), buckets, n, col("v"), col("v"))
      .select(col("key"), explode(col("items")).as("v"))
    val hot = out.filter(col("key") === "hot").collect().map(_.getLong(1)).sorted
    assert(hot.toSeq === (1L to 20L).filter(_ % 20 != 0).take(n).map(identity))
    val cold0 = out.filter(col("key") === "cold0").collect().map(_.getLong(1)).sorted
    assert(cold0.toSeq === (0L until rows by 20).filter(_ % 50 == 0).take(n))
  }

  test("TopKPerKey shuffles only survivors: partial heaps cut the exchange to ~k·partitions·keys") {
    import spark.implicits._
    // AQE wraps stages in leaf QueryStageExec nodes, hiding the
    // exchange from plan traversal; the metric is the same either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val parts = 8
    val n = 200000
    // one pathologically hot key + 50 cold keys
    val df = spark.range(n)
      .select((when(col("id") % 4 === 0, lit("hot"))
        .otherwise(concat(lit("cold"), col("id") % 50))).as("key"),
        col("id").as("v"))
      .repartition(parts)
    val out = plans.TopKPerKey.topK(df, Seq(col("key")), Seq(col("v")), 10)
    val rows = out.collect()
    // correctness on the hot key: global minima, not per-partition luck
    assert(rows.filter(_.getString(0) == "hot").map(_.getLong(1)).sorted.toSeq
      === (0 until 40 by 4).map(_.toLong))
    // the scale property: the exchange moved only heap survivors
    val executed = out.queryExecution.executedPlan
    // take the exchange directly ABOVE TopKPartial (the repartition
    // exchange below it moves all n rows by design)
    val shuffled = executed.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.child.isInstanceOf[plans.TopKPartialExec] =>
        e.metrics.collectFirst {
          case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
        }.getOrElse(sys.error(s"no records metric in ${e.metrics.keys}"))
    }.getOrElse(sys.error(s"no exchange above TopKPartial:\n$executed"))
    val bound = 10L * parts * 51 // k × partitions × distinct keys
    assert(shuffled <= bound && shuffled < n / 10,
      s"shuffled $shuffled of $n rows (bound $bound)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("globalRank + ntileOfRank equal the single-partition window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sizes exercising every n mod k residue, including n < parts
    for (n <- Seq(5, 97, 100, 1003)) {
      val df = spark.range(n.toLong)
        .select((col("id") * 37 % 101).as("metric"), col("id"))
      val viaWindow = df
        .withColumn("rank", row_number().over(Window.orderBy(col("metric"), col("id"))))
        .withColumn("tile", ntile(4).over(Window.orderBy(col("metric"), col("id"))))
        .select("id", "rank", "tile").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
      val viaRank = operators.Skew.globalRank(df, 8, col("metric"), col("id"))
        .withColumn("tile",
          operators.Skew.ntileOfRank(col("rank"), lit(n.toLong), 4))
        .select("id", "rank", "tile").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(viaRank.map(t => (t._1, t._2.toInt, t._3)).toSeq === viaWindow.toSeq, s"n=$n")
    }
  }

  test("AQE splits a skewed join partition (the skew story the big joins rely on)") {
    import spark.implicits._
    // one hot key owning ~95% of the left side, thresholds lowered so
    // the skew optimizer can act at test scale
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("pl"))
      val right = spark.range(500).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      // collect (not count) so AQE settles on THIS query execution
      assert(joined.collect().length === 190000 + 25)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew-split marker in the settled plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hll registers: the sketch exchange is bounded by m·groups·partitions, not tokens") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val parts = 8
      val nTokens = 50000
      val groups = 4
      // 50k distinct tokens over 4 sources: the register aggregate's
      // exchange must carry partial register files, never token rows
      val toks = spark.range(nTokens)
        .select(concat(lit("s"), col("id") % groups).as("source"),
          concat(lit("tok"), col("id")).as("tok"))
        .repartition(parts)
        .withColumn("hv", graft.functions.SketchFunctions.poly_hash(col("tok")))
        .withColumn("j", col("hv") % operators.Sketch.HllRegisters)
        .withColumn("w", expr(s"hv div ${operators.Sketch.HllRegisters}"))
        .withColumn("lb", col("w").bitwiseAND(-col("w")))
        .withColumn("rho", lit(1)) // rank itself is irrelevant to the shuffle bound
      val regs = toks.groupBy("source", "j").agg(max("rho").as("r"))
      assert(regs.count() === groups.toLong * operators.Sketch.HllRegisters)
      val executed = regs.queryExecution.executedPlan
      val shuffled = executed.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          e.metrics.collectFirst {
            case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
          }.getOrElse(sys.error(s"no records metric in ${e.metrics.keys}"))
      }.getOrElse(sys.error(s"no exchange above a partial aggregate:\n$executed"))
      val bound = groups.toLong * operators.Sketch.HllRegisters * parts
      assert(shuffled <= bound && shuffled < nTokens.toLong,
        s"shuffled $shuffled rows (bound $bound, tokens $nTokens)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("count-min cells: the sketch exchange is bounded by d·w·partitions, not tokens") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val parts = 8
      val nTokens = 100000
      // 100k distinct tokens with skewed counts — the relation whose
      // CMS must NOT shuffle per token
      val occ = spark.range(nTokens)
        .select(concat(lit("tok"), col("id")).as("tok"),
          (col("id") % 97 + 1).as("cnt_exact"))
        .withColumn("hv", graft.functions.SketchFunctions.poly_hash(col("tok")))
        .repartition(parts)
      val cells = operators.Sketch.cmsCellsOf(operators.Sketch.cmsRows(occ))
      val collected = cells.collect()
      // the sketch is full: every (row, bucket) cell exists and the
      // mass balances exactly
      assert(collected.length === operators.Sketch.CmsRows * operators.Sketch.CmsWidth)
      val mass = (1L to nTokens.toLong).map(i => (i - 1) % 97 + 1).sum
      assert(collected.map(_.getLong(2)).sum === mass * operators.Sketch.CmsRows)
      // the scale property: the aggregate's exchange carries partial
      // cells (≤ d·w per task), never the d·nTokens input rows
      val executed = cells.queryExecution.executedPlan
      // the repartition exchange below carries all input rows by
      // design; measure the exchange ABOVE the partial aggregate
      val shuffled = executed.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          e.metrics.collectFirst {
            case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
          }.getOrElse(sys.error(s"no records metric in ${e.metrics.keys}"))
      }.getOrElse(sys.error(s"no exchange above a partial aggregate:\n$executed"))
      val bound = operators.Sketch.CmsRows.toLong * operators.Sketch.CmsWidth * parts
      assert(shuffled <= bound && shuffled < nTokens.toLong,
        s"shuffled $shuffled rows (bound $bound, tokens $nTokens)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup_fuzzy caps hot boilerplate blocks: pairs bounded by cap²/2, not corpus²") {
    // a crafted boilerplate corpus: 3·cap docs share one (lang,
    // 12-char prefix) block — the templated-header skew mode. Without
    // the per-block cap the candidate join emits C(3·cap, 2) ≈ 294k
    // pairs through one reducer; with it, exactly C(cap, 2) from the
    // cap lowest doc_ids.
    import spark.implicits._
    import operators.Dedup.{FuzzyBlockCap => cap}
    val n = 3L * cap
    val docs = spark.range(n).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      concat(lit("<!doctype html><head><title>boilerplate page "),
        lit("x".repeat(operators.Dedup.FuzzyPrefix))).as("text"))
    val out = operators.Dedup.dedupFuzzyFrom(docs)
    assert(out.count() === cap.toLong * (cap - 1) / 2)
    // only the cap lowest doc_ids of the block participate
    assert(out.agg(max("doc_b")).head.getLong(0) === cap - 1L)
  }

  test("LSH band buckets are capped: only the cap lowest ids of a hot bucket survive") {
    // a degenerate LSH bucket (empty-ish docs minhashing identically,
    // boilerplate-saturated chunks) is the dedup_fuzzy skew class in
    // band space: one bucket a constant fraction of the corpus. The
    // shared capPerBucket pass bounds every band self-join in the
    // minhash/simhash family; here a 300-doc hot bucket next to cold
    // singleton buckets keeps exactly its cap lowest doc_ids while the
    // cold buckets pass through untouched.
    val hot = spark.range(300).select(lit(0L).as("band"),
      lit(42L).as("band_hash"), col("id").as("doc_id"))
    val cold = spark.range(10).select(lit(1L).as("band"),
      col("id").as("band_hash"), (col("id") + 1000L).as("doc_id"))
    val capped = operators.Dedup.capPerBucket(
      hot.unionAll(cold), Seq("band", "band_hash"), 64)
    assert(capped.count() === 74)
    assert(capped.filter(col("band") === 0L).count() === 64)
    assert(capped.filter(col("band") === 0L)
      .agg(max("doc_id")).head.getLong(0) === 63L)
    assert(capped.filter(col("band") === 1L).count() === 10)
  }

  test("embedding LSH collapses byte-identical vectors and expands exact pairs back") {
    // 5 + 3 + 1 copies of three orthogonal vectors: the collapse must
    // bucket 3 reps (not 9 rows), cross-group pairs must fail the
    // cosine threshold (cos = 0), and the expansion must emit exactly
    // the within-group identity pairs with dot = na = nb
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_elsh").toString
    def vec(axis: Int): Seq[Float] =
      (0 until 64).map(i => if (i == axis) 1f else 0f)
    val rows =
      (0 until 5).map(i => (i.toLong, vec(0))) ++
      (5 until 8).map(i => (i.toLong, vec(1))) ++
      Seq((8L, vec(2)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.Dedup.dedupEmbeddingLsh(spark, dir).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect =
      (for { a <- 0 until 5; b <- a + 1 until 5 } yield (a.toLong, b.toLong)).toSet ++
      (for { a <- 5 until 8; b <- a + 1 until 8 } yield (a.toLong, b.toLong)).toSet
    assert(pairs === expect)
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) && r.getLong(3) === r.getLong(4), r)
    }
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (lt, ot) = operators.Bucketing.writeBucketedFacts(spark, sf, 4)
      val joined = operators.Bucketing.bucketedJoin(spark, lt, ot)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and the join actually works
      assert(joined.count() === Tables.load(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
