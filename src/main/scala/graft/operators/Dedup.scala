package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY §2 #28–32) over the `documents` and
  * `embeddings` tables.
  *
  * Scale design (SURVEY §4): nothing here is O(n²) on the corpus.
  *  - exact: one hash aggregate on the normalized-text digest.
  *  - jaccard: candidate pairs come from a prefix-filtered inverted
  *    index (rare-first global token order, AllPairs/PPJoin prefix
  *    theorem) bucketed by (lang, source) — stopword-hot tokens never
  *    enter the self-join, so candidates are bounded by rare-token
  *    document frequency, not n².
  *  - minhash: signatures via codegen'd map-side-combined aggregates;
  *    band candidates shuffle on (band, band_hash), uniform by
  *    construction.
  *  - simhash: 64-bit signature per row, candidates via 4×16-bit
  *    rotated-chunk equality (pigeonhole: covers hamming ≤ 3).
  *  - embedding: exact integer cosine test on quantized vectors —
  *    cross-engine bit-exact (no float threshold flakiness); at scale
  *    the candidate pairs come from ann_lsh buckets (Similarity.scala),
  *    here all-pairs only at oracle scale.
  *
  * The reference relay has no dedup; these are the LLM-training-data
  * operators the builder prompt adds as first-class.
  */
object Dedup {

  /** Shared normalization — single-sourced from TextFunctions so
    * dedup keys can never drift from the split/scrub operators'. */
  private def norm(c: Column): Column =
    graft.functions.TextFunctions.normText(c)
  private val normSql = graft.functions.TextFunctions.normTextSql

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), norm(col("text")).as("norm"))

  /** Distinct token set as a sorted array column. */
  private val toks = array_sort(array_distinct(split(col("norm"), " ")))

  /** Distinct word-2-gram shingles. The synthetic corpus draws from a
    * ~30-word vocabulary, so unigram token sets are near-identical
    * across ALL docs (est. J ≥ 0.5 for >60% of pairs) — shingling
    * restores selectivity exactly as it does on real web text, and the
    * corpus' planted near-duplicates (25 pairs at sf0.01) separate
    * cleanly from the J≤0.2 background.
    *
    * Performance: one codegen'd WordNgrams pass per document. (The
    * round-2 zip_with(words, shift(words)) formulation avoided the
    * measured O(words²) element_at pitfall but still paid an
    * interpreted lambda per element; the primitive loop replaces it
    * value-for-value.) */
  private val shinglesOf = (norm: Column) =>
    array_distinct(graft.functions.TextFunctions.word_ngrams(norm, 2))

  /** doc_id + distinct word-2-gram shingle array. */
  private[graft] def shingled(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("toks", shinglesOf(col("norm")))
      .select("doc_id", "toks")

  // ---------------------------------------------------------------------
  // #28 dedup_exact
  // ---------------------------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("norm")).as("fingerprint"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups", "fingerprint")
      .orderBy("keep_id")

  val dedupExactSql: String =
    s"""WITH d AS (SELECT doc_id, $normSql AS norm FROM documents)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups,
      |  md5(norm) AS fingerprint
      |FROM d
      |GROUP BY norm
      |ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------------
  // #124 dedup_keep_best — quality-aware canonical selection
  // ---------------------------------------------------------------------

  /** Exact dedup that keeps the BEST copy of each duplicate group
    * instead of the arbitrary min-id one: real pretraining pipelines
    * retain the highest-quality duplicate (the clean mirror, not the
    * ad-wrapped scrape). Groups share a normalized text, so the #36
    * quality verdict (computed on the norm) is constant within a
    * group — the raw-text length then breaks the tie (most original
    * characters = least lossy copy), doc_id last for determinism.
    *
    * Scale: ONE scan and ONE hash aggregate — the selection is a
    * map-side-combinable max(struct(quality_ok, n_chars, -doc_id)),
    * never a per-group window sort, so it costs exactly what
    * dedup_exact (#28) costs at any corpus size. The integer ranking
    * tuple is reproduced verbatim in the DuckDB oracle (no float
    * scores to drift cross-engine).
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.functions.TextFunctions
    val scored = Tables.load(spark, dir, "documents")
      .withColumn("norm", norm(col("text")))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fingerprint"),
        length(col("text")).as("n_chars"),
        size(split(col("norm"), " ")).as("n_words"),
        regexp_count(col("norm"), lit("[^a-z0-9 ]")).as("n_punct"),
        regexp_count(concat(lit(" "), col("norm"), lit(" ")),
          lit(tf.StopTokRe)).as("n_stop"))
      .withColumn("quality_ok",
        (col("n_words") >= 10 &&
          col("n_stop").cast("double") / col("n_words") < 0.5 &&
          col("n_punct") * 5 <= col("n_words")).cast("int"))
    scored
      .groupBy("fingerprint")
      .agg(
        max(struct(
          col("quality_ok").as("q"),
          col("n_chars").as("nc"),
          (lit(0L) - col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_dups"))
      .select(
        (lit(0L) - col("best.nid")).as("keep_id"),
        col("n_dups"),
        col("best.q").as("quality_ok"),
        col("best.nc").as("n_chars"),
        col("fingerprint"))
      .orderBy("keep_id")
  }

  val dedupKeepBestSql: String = {
    val lex = graft.functions.TextFunctions.Lexicons.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, md5($normSql) AS fingerprint,
      |    CAST(length(text) AS INT) AS n_chars,
      |    string_split($normSql, ' ') AS toks, $normSql AS norm
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, fingerprint, n_chars,
      |    CASE WHEN len(toks) >= 10
      |          AND CAST(len(list_filter(toks, t -> list_contains($lex, t))) AS DOUBLE) / len(toks) < 0.5
      |          AND len(regexp_extract_all(norm, '[^a-z0-9 ]')) * 5 <= len(toks)
      |         THEN 1 ELSE 0 END AS quality_ok
      |  FROM d
      |), r AS (
      |  SELECT doc_id, fingerprint, n_chars, quality_ok,
      |    row_number() OVER (PARTITION BY fingerprint
      |      ORDER BY quality_ok DESC, n_chars DESC, doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY fingerprint) AS n_dups
      |  FROM s
      |)
      |SELECT doc_id AS keep_id, CAST(n_dups AS BIGINT) AS n_dups,
      |  quality_ok, n_chars, fingerprint
      |FROM r WHERE rk = 1
      |ORDER BY keep_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #31 dedup_jaccard — exact token-set Jaccard on prefix-filtered
  // candidates (AllPairs/PPJoin-style)
  // ---------------------------------------------------------------------

  /** Jaccard threshold as a fraction: J ≥ JaccNum/JaccDen (= 0.8). */
  val JaccNum = 4
  val JaccDen = 5

  /** Per-document prefix tokens under the global rare-first order.
    *
    * Candidate generation without document-frequency damping is
    * quadratic on real text: a stopword token appearing in d docs
    * contributes d² join rows, and (lang, source) bucketing bounds
    * nothing because hot tokens are hot inside every bucket. Prefix
    * filtering fixes this exactly (not heuristically): order all
    * tokens by (document frequency, token) ascending and index only
    * each doc's first `nt - ⌈t·nt⌉ + 1` tokens. If J(a,b) ≥ t, then
    * |a∩b| ≥ t·max(na,nb), so a and b cannot both skip their rarest
    * shared token — their prefixes must intersect (the AllPairs/PPJoin
    * prefix-filter theorem). Rare-first makes those prefix tokens the
    * lowest-df ones, so the self-join fan-out per token is bounded by
    * the df of *rare* tokens instead of stopwords. */
  def jaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    jaccardPrefixFrom(docs(spark, dir))

  /** (doc_id, lang, source, toks, nt): the shingled view every
    * jaccard stage derives from. Split out so a caller holding many
    * consumers (dedupJaccardFrom) can shingle ONCE into a cached
    * frame — the shingle projection (regex normalization upstream,
    * 2-gram construction, distinct, sort) is the most expensive
    * per-row step in the pipeline. */
  private def shingledDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("lang"), col("source"), toks.as("toks"))
      .withColumn("nt", size(col("toks")))

  /** As [[jaccardPrefix]], over any (doc_id, lang, source, norm)
    * frame — the property spec feeds randomized corpora through this. */
  def jaccardPrefixFrom(d: DataFrame): DataFrame =
    jaccardPrefixShingled(shingledDocs(d))

  private def jaccardPrefixShingled(s: DataFrame): DataFrame = {
    val t = s
      .select(col("doc_id"), col("lang"), col("source"), col("nt"),
        explode(col("toks")).as("tok"))
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    // prefix length nt - ⌈(JaccNum/JaccDen)·nt⌉ + 1, all-integer
    t.join(dfreq, "tok")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("nt") - expr(s"($JaccNum * nt + ${JaccDen - 1}) div $JaccDen") + 1)
      .select("doc_id", "lang", "source", "nt", "tok")
  }

  /** Distinct candidate pairs: prefixes collide on a token within the
    * same (lang, source) bucket, and sizes are compatible — J ≥ 4/5
    * forces 5·min(na,nb) ≥ 4·max(na,nb), so wildly different-length
    * docs never even pair up. */
  def jaccardCandidates(spark: SparkSession, dir: String): DataFrame =
    jaccardCandidatesFrom(docs(spark, dir))

  def jaccardCandidatesFrom(d: DataFrame): DataFrame =
    jaccardCandidatesShingled(shingledDocs(d))

  private def jaccardCandidatesShingled(s: DataFrame): DataFrame = {
    val pfx = jaccardPrefixShingled(s)
    pfx.as("a")
      .join(pfx.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(JaccDen) * least(col("a.nt"), col("b.nt")) >=
            lit(JaccNum) * greatest(col("a.nt"), col("b.nt")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Integer-exact threshold test for J ≥ 0.8:
    * shared/(na+nb-shared) ≥ 4/5 ⟺ 5·shared ≥ 4·(na+nb-shared).
    * Verification joins the candidate pairs back to the full (distinct)
    * token arrays and intersects — the prefix filter loses no J ≥ 0.8
    * pair, so the output is identical to the undamped inverted-index
    * join, at a candidate count bounded by rare-token df instead of n². */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame =
    dedupJaccardFrom(docs(spark, dir))

  def dedupJaccardFrom(d: DataFrame): DataFrame = {
    // Duplicate collapse (the §4b scale pattern, as in
    // dedupEmbeddingLsh): byte-identical normalized texts carry
    // identical token sets, so every df count, prefix row and
    // candidate pair multiplies by the copy count on duplicate-heavy
    // corpora. Collapse to one representative per (lang, source,
    // norm), run the prefix-filtered index on reps only, expand the
    // verified pairs through the identity groups after. The output is
    // EXACTLY the full-corpus result — provable, unlike the capped
    // band families: the prefix theorem is lossless under ANY fixed
    // global token order (so the rep-level df order changes candidates
    // but never the verified J ≥ 0.8 set), a within-group pair is
    // J = 1 by identity (shared = na = nb), and a cross-group pair has
    // its reps' exact J. The sf-gate oracle hash-compares this against
    // the uncollapsed full-corpus SQL, pinning the equivalence.
    //
    // The collapse window partitions on md5(norm) — the same digest
    // grouping dedup_exact uses — so the shuffle key is lang, source
    // and a 16-byte digest instead of the full document body; norm
    // rides along as a data column only.
    // Materialize the collapse ONCE (the embedding-LSH §6 finding,
    // same shape here): tagged feeds the member map and the rep set,
    // and Spark reuses only the exchange across those branches — each
    // would re-run the window AND the regex normalization it rides
    // on. The shingled rep view `full` is then computed ONCE into a
    // cached frame that EVERY downstream consumer derives from — the
    // prefix index, both verify sides, and the within-group
    // expansion: shingling (2-gram construction + distinct + sort
    // over the full text) is the most expensive per-row step in the
    // pipeline (~16 CPU-s at ×10), and the uncached plan evaluated it
    // in three separate branches. The explicit partition count
    // matters as much as the cache: the collapse shuffle is slim in
    // BYTES, so AQE coalesces it to 1-3 partitions, and the
    // compute-heavy shingle fill would run on one task (measured:
    // 16 s single-task stages; AQE also coalesces a bare
    // repartition(col), so the count is pinned).
    val wG = Window.partitionBy(col("lang"), col("source"), md5(col("norm")))
    val tagged = d.withColumn("rep", min("doc_id").over(wG))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mem = tagged.select(col("doc_id"), col("rep"))
    val nPart = d.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val full = shingledDocs(
        tagged.filter(col("doc_id") === col("rep"))
          .select("doc_id", "lang", "source", "norm")
          .repartition(nPart, col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repPairs = jaccardCandidatesShingled(full)
      .join(full.as("fa"), col("doc_a") === col("fa.doc_id"))
      .join(full.as("fb"), col("doc_b") === col("fb.doc_id"))
      .select(col("doc_a").as("ra"), col("doc_b").as("rb"),
        size(array_intersect(col("fa.toks"), col("fb.toks")))
          .cast("long").as("shared"),
        col("fa.nt").cast("long").as("na"), col("fb.nt").cast("long").as("nb"))
      .filter(lit(JaccDen) * col("shared") >=
        lit(JaccNum) * (col("na") + col("nb") - col("shared")))
    val cross = repPairs
      .join(mem.as("ma"), col("ra") === col("ma.rep"))
      .join(mem.as("mb"), col("rb") === col("mb.rep"))
      .select(
        least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("shared"),
        when(col("ma.doc_id") < col("mb.doc_id"), col("na"))
          .otherwise(col("nb")).as("na"),
        when(col("ma.doc_id") < col("mb.doc_id"), col("nb"))
          .otherwise(col("na")).as("nb"))
    val within = mem.as("x")
      .join(mem.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .join(full.select(col("doc_id").as("rep"), col("nt")), "rep")
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("nt").cast("long").as("shared"),
        col("nt").cast("long").as("na"), col("nt").cast("long").as("nb"))
    cross.unionAll(within).orderBy("doc_a", "doc_b")
  }

  val dedupJaccardSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(string_split($normSql, ' ')) AS toks
      |  FROM documents
      |), dn AS (
      |  SELECT doc_id, lang, source, toks, len(toks) AS nt FROM d
      |), t AS (
      |  SELECT doc_id, lang, source, nt, unnest(toks) AS tok
      |  FROM dn
      |), dfq AS (
      |  SELECT tok, COUNT(*) AS df FROM t GROUP BY tok
      |), pfx AS (
      |  SELECT doc_id, lang, source, nt, tok FROM (
      |    SELECT t.doc_id, t.lang, t.source, t.nt, t.tok,
      |      row_number() OVER (PARTITION BY t.doc_id ORDER BY dfq.df, t.tok) AS rn
      |    FROM t JOIN dfq ON t.tok = dfq.tok)
      |  WHERE rn <= nt - (($JaccNum * nt + ${JaccDen - 1}) // $JaccDen) + 1
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pfx a JOIN pfx b
      |    ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
      |   AND a.doc_id < b.doc_id
      |   AND $JaccDen * LEAST(a.nt, b.nt) >= $JaccNum * GREATEST(a.nt, b.nt)
      |), v AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(len(list_intersect(fa.toks, fb.toks)) AS BIGINT) AS shared,
      |    CAST(fa.nt AS BIGINT) AS na, CAST(fb.nt AS BIGINT) AS nb
      |  FROM cand c
      |  JOIN dn fa ON c.doc_a = fa.doc_id
      |  JOIN dn fb ON c.doc_b = fb.doc_id
      |)
      |SELECT doc_a, doc_b, shared, na, nb
      |FROM v
      |WHERE $JaccDen * shared >= $JaccNum * (na + nb - shared)
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // #29 dedup_minhash — MinHash signatures + LSH banding (rows+spec)
  // ---------------------------------------------------------------------

  val MinhashSeeds = 32
  val Bands = 8 // 8 bands × 4 rows

  /** Per-bucket participant cap for every LSH band self-join: at most
    * this many docs of any one band bucket enter the candidate join.
    * On real web text a degenerate bucket (empty-ish documents all
    * minhashing to the same signature, a boilerplate-saturated chunk)
    * is the same skew class as dedup_fuzzy's hot prefix block — that
    * bucket alone is O(f²·n²) candidate pairs into one reducer, and
    * AQE's skew split rescues the shuffle, not the row count. Admitting
    * only the cap lowest doc_ids bounds pairs per bucket by cap²/2
    * regardless of corpus size; the rank pass moves O(bucket) slim
    * rows, never pairs. The cut is deterministic (lowest doc_ids), so
    * the DuckDB oracles reproduce it bit-for-bit. Docs cut from a hot
    * bucket keep their OTHER bands (minhash has 8, simhash 4/3), so a
    * true near-dup pair only goes undetected if it loses ALL its
    * shared buckets to the cap — the standard banding-cap trade-off. */
  val BandBucketCap = 1024

  /** Keep the `cap` lowest ids of each bucket (deterministic rank
    * within the bucket key). One window pass over slim rows; the
    * sort is per-bucket and bounded by the hot bucket itself. */
  private[graft] def capPerBucket(df: DataFrame, keys: Seq[String],
                                  cap: Int, idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(idCol)
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= cap)
      .drop("__rnk")
  }

  /** Signatures via explode + 32 codegen'd min(xxhash64(seed, base))
    * aggregates: each shingle is string-hashed ONCE, the per-seed
    * variants hash the resulting long. Partial aggregation (map-side
    * combine) means only the 32-long signature per doc crosses the
    * wire — HOF lambdas would be interpreted and 10× slower here. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val t = shingled(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("base", xxhash64(col("tok")))
    val mins = (0 until MinhashSeeds).map(i =>
      min(xxhash64(lit(i), col("base"))).as(s"m$i"))
    t.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashSeeds).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** `nBands`/`cap` default to the production constants; the overrides
    * exist for [[graft.LshSweep]]'s operating-curve measurements (more
    * bands = longer match windows per band = higher recall at J 0.5,
    * more candidates; the cap trades tail recall for a hard per-bucket
    * pair bound). */
  def dedupMinhash(spark: SparkSession, dir: String,
                   nBands: Int = Bands, cap: Int = BandBucketCap): DataFrame = {
    require(MinhashSeeds % nBands == 0, s"bands $nBands must divide $MinhashSeeds")
    val rows = MinhashSeeds / nBands
    val sigs = minhashSignatures(spark, dir).select("doc_id", "sig")
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${nBands - 1}),
           |  b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))""".stripMargin))
        .as(Seq("band", "band_hash")))
    bandPairsVerified(bands, cap)
  }

  /** The shared LSH candidate tail: cap hot buckets, self-join on
    * (band, band_hash) with doc_a < doc_b, dedup candidate pairs,
    * count signature agreement, keep est. J ≥ 0.5. ONE definition of
    * the pair-join + verify semantics for both hash families — a
    * threshold or tiebreak change applied here cannot leave a twin
    * behind (the streaming admission mirrors the same threshold,
    * MinhashStream). */
  private def bandPairsVerified(bands: DataFrame,
                                cap: Int = BandBucketCap): DataFrame = {
    // Slim rows through the hot path (round 11): the cap window, the
    // bucket self-join and the pair dedup move (doc_id, band,
    // band_hash) only — the 32-slot signatures previously rode
    // through every one of those exchanges, multiplying shuffle bytes
    // ~15× for data whose only consumer is the verify step.
    // Signatures join back AFTER the pair dedup from the doc-level
    // sig view; its dropDuplicates sits on the signature
    // aggregation's existing doc_id partitioning, so the slimming
    // costs no extra pass over the expensive subtree (the doc_id
    // exchange is reused across both branches).
    val slim = bands.select("doc_id", "band", "band_hash")
    val capped = capPerBucket(slim, Seq("band", "band_hash"), cap)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // every band row of a doc carries the same sig: any row serves
    val sigs = bands.select("doc_id", "sig").dropDuplicates("doc_id")
    cand
      .join(sigs.as("fa"), col("doc_a") === col("fa.doc_id"))
      .join(sigs.as("fb"), col("doc_b") === col("fb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        col("fa.sig").as("sa"), col("fb.sig").as("sb"))
      .withColumn("matches", expr(
        "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
      .filter(col("matches") * 2 >= MinhashSeeds) // est. J ≥ 0.5
      .select(col("doc_a"), col("doc_b"), col("matches").cast("long").as("matches"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------------
  // #29b dedup_minhash_poly — the SAME MinHash-LSH banding pipeline
  // with a portable hash family (rolling poly hash mod 1e9+7 for
  // shingles, affine per-seed permutations), so shingle → signature →
  // band → candidate → match-count is DuckDB-verifiable END TO END.
  // The xxhash64 variant above stays the fast path; this one is the
  // correctness witness for the banding algebra itself.
  // ---------------------------------------------------------------------

  private val PolyP = 1000000007L

  /** Exploded shingles with the portable rolling poly hash — shared by
    * the minhash and simhash portable twins. Hashing is the codegen'd
    * [[graft.functions.SketchFunctions.PolyHash]] expression, not the
    * equivalent `aggregate(split(tok,''),…)` HOF: the lambda form is
    * interpreted per CHARACTER, and on the token-exploded fact it was
    * the dominant cost of every portable-hash pipeline (minhash/simhash
    * twins, fuzzy decontamination, dedup_clusters). Same value, same
    * DuckDB oracle, one codegen'd kernel call per token. */
  private def polyHashed(spark: SparkSession, dir: String): DataFrame =
    shingled(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("hv", graft.functions.SketchFunctions.poly_hash(col("tok")))

  /** (doc_id, sig, band, band_hash) for every document under the
    * portable hash family — the shared banding frame consumed by the
    * #29b pair join and the fuzzy decontamination (Corpus #119). */
  private[operators] def minhashPolyBands(spark: SparkSession, dir: String): DataFrame =
    minhashPolyBandsFrom(docs(spark, dir))

  /** [[minhashPolyBands]] over an ARBITRARY (doc_id, norm) frame —
    * the seam the composed curation pipeline (Corpus #151) needs to
    * run near-dup detection on upstream-stage SURVIVORS instead of
    * the raw table. */
  private[operators] def minhashPolyBandsFrom(normDocs: DataFrame): DataFrame = {
    val rows = MinhashSeeds / Bands
    val h = normDocs
      .withColumn("toks", shinglesOf(col("norm")))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("hv", graft.functions.SketchFunctions.poly_hash(col("tok")))
    // h < p and a < 70 keep a·h + b far below 2^63 in both engines
    val mins = (0 until MinhashSeeds).map(i =>
      min((col("hv") * (2L * i + 3) + (13L * i + 5)) % PolyP).as(s"m$i"))
    val sigs = h.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashSeeds).map(i => col(s"m$i")): _*).as("sig"))
    // Horner fold over exactly the band's `rows` signature slots —
    // derived from the constants, so changing MinhashSeeds/Bands can
    // never silently hash across band boundaries or drop slots
    sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${Bands - 1}), b ->
           |  aggregate(slice(sig, b * $rows + 1, $rows), CAST(0 AS BIGINT),
           |            (acc, x) -> (acc * 131 + x) % $PolyP))""".stripMargin))
        .as(Seq("band", "band_hash")))
  }

  def dedupMinhashPoly(spark: SparkSession, dir: String): DataFrame =
    bandPairsVerified(minhashPolyBands(spark, dir))

  /** Verified #29b pairs (doc_a < doc_b, matches ≥ half the seeds)
    * over an arbitrary (doc_id, norm) frame — consumed by the
    * composed pipeline (Corpus #151). */
  private[operators] def minhashPolyPairsFrom(normDocs: DataFrame): DataFrame =
    bandPairsVerified(minhashPolyBandsFrom(normDocs))

  /** The shared minhash-poly CTE prefix `d → sh → h → sig → sigl →
    * bands` (per-doc signatures + band hashes) — consumed by
    * [[minhashPolyCtes]] and by the fuzzy decontamination oracle
    * (Corpus #119), which joins train bands against bench bands
    * instead of the doc_a < doc_b pair join. */
  private[operators] def minhashBandsCtes(src: String = "documents"): String = {
    val rows = MinhashSeeds / Bands
    s"""d AS (
      |  SELECT doc_id, string_split($normSql, ' ') AS words FROM $src
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
      |  )) AS tok
      |  FROM d
      |), h AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(tok, ''), ch -> CAST(ord(ch) AS BIGINT))),
      |    (acc, c) -> (acc * 131 + c) % $PolyP) AS hv
      |  FROM sh
      |), sig AS (
      |  SELECT doc_id, i, MIN((hv * (2*i + 3) + (13*i + 5)) % $PolyP) AS m
      |  FROM h CROSS JOIN (SELECT unnest(range(0, $MinhashSeeds)) AS i)
      |  GROUP BY doc_id, i
      |), sigl AS (
      |  SELECT doc_id, list(m ORDER BY i) AS ms FROM sig GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, b,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_slice(ms, b*$rows + 1, b*$rows + $rows)),
      |      (acc, x) -> (acc * 131 + x) % $PolyP) AS bh,
      |    ms
      |  FROM sigl CROSS JOIN (SELECT unnest(range(0, $Bands)) AS b)
      |)""".stripMargin
  }

  /** The minhash-poly CTE chain `d → sh → h → sig → sigl → bands →
    * cand → m` (everything up to the per-pair match counts), shared by
    * the #29b pair oracle and the #79 cluster oracle that builds its
    * component closure on the same pairs. */
  private[operators] def minhashPolyCtes(src: String = "documents"): String =
    s"""${minhashBandsCtes(src)}, capped AS (
      |  SELECT doc_id, b, bh, ms FROM (
      |    SELECT *, row_number() OVER (PARTITION BY b, bh ORDER BY doc_id) AS rnk
      |    FROM bands)
      |  WHERE rnk <= $BandBucketCap
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |    a.ms AS ma, b2.ms AS mb
      |  FROM capped a JOIN capped b2
      |    ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id
      |), m AS (
      |  SELECT doc_a, doc_b,
      |    len(list_filter(range(1, ${MinhashSeeds + 1}), i -> ma[i] = mb[i])) AS matches
      |  FROM cand
      |)""".stripMargin

  val dedupMinhashPolySql: String =
    s"""WITH ${minhashPolyCtes()}
      |SELECT doc_a, doc_b, CAST(matches AS BIGINT) AS matches
      |FROM m
      |WHERE matches * 2 >= $MinhashSeeds
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // #30 dedup_simhash — 64-bit SimHash + rotated-chunk LSH (rows+spec)
  // ---------------------------------------------------------------------

  val SimhashBits = 64
  val SimhashChunks = 4 // 4 × 16-bit chunks: covers hamming ≤ 3
  val MaxHamming = 3

  /** 64 codegen'd per-bit sign sums (map-side combined), folded into
    * the signature long with one cheap 64-element HOF per doc. */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val t = shingled(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until SimhashBits).map(j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1L).otherwise(-1L))
        .as(s"b$j"))
    t.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        array((0 until SimhashBits).map(j => col(s"b$j")): _*).as("bits"))
      .withColumn("simhash", expr(
        s"""aggregate(sequence(0, ${SimhashBits - 1}), CAST(0 AS BIGINT),
          |  (acc, j) -> acc | IF(element_at(bits, j + 1) > 0,
          |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
      .select("doc_id", "simhash")
  }

  /** `nChunks` defaults to the production constant; the override is
    * [[graft.LshSweep]]'s recall/cost knob — k chunks pigeonhole-cover
    * hamming ≤ k−1, so fewer chunks miss some ≤-MaxHamming pairs and
    * more chunks find them all at a higher candidate cost. */
  def dedupSimhash(spark: SparkSession, dir: String,
                   nChunks: Int = SimhashChunks): DataFrame = {
    require(SimhashBits % nChunks == 0, s"chunks $nChunks must divide $SimhashBits")
    val chunkBits = SimhashBits / nChunks
    val sigs = simhashSignatures(spark, dir).select("doc_id", "simhash")
    // chunk width/mask derived from the constants so changing the
    // signature size or chunk count can never silently misalign
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"""transform(sequence(0, ${nChunks - 1}),
           |  k -> (simhash >> (k * $chunkBits))
           |       & ${if (chunkBits == 64) -1L else (1L << chunkBits) - 1})""".stripMargin))
        .as(Seq("k", "chunk")))
    val capped = capPerBucket(chunks, Seq("k", "chunk"), BandBucketCap)
    capped.as("a")
      .join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // hamming gate BEFORE the pair dedup: the same pair surfaces in
      // up to nChunks bands so dropDuplicates is load-bearing here
      // (unlike the embedding LSH's provably-unique pairs), but the
      // bit_count gate is a codegen'd per-row predicate while the
      // dedup is a full shuffle of every candidate pair — filtering
      // first shrinks that shuffle to the ≤-MaxHamming survivors
      // (orders of magnitude fewer on a duplicate-amplified corpus).
      // hamming is a pure function of the pair, so dedup-then-filter
      // and filter-then-dedup emit identical rows.
      .filter(col("hamming") <= MaxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------------
  // #30b dedup_simhash_poly — the SAME SimHash pipeline (per-bit sign
  // sums → signature → rotated-chunk banding → hamming verify) with
  // the portable poly hash and a 30-bit signature, so SimHash's
  // banding algebra is DuckDB-verifiable END TO END — the simhash
  // analogue of #29b. The xxhash64 64-bit variant above stays the
  // fast path.
  // ---------------------------------------------------------------------

  val SimPolyBits = 30
  val SimPolyChunks = 3 // 3 × 10-bit chunks: pigeonhole covers hamming ≤ 2
  val SimPolyMaxHamming = 2
  private val SimPolyChunkBits = SimPolyBits / SimPolyChunks

  def dedupSimhashPoly(spark: SparkSession, dir: String): DataFrame = {
    val h = polyHashed(spark, dir)
    val bitSums = (0 until SimPolyBits).map(j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j"))
    val sigs = h.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        array((0 until SimPolyBits).map(j => col(s"b$j")): _*).as("bits"))
      .withColumn("sh", expr(
        s"""aggregate(sequence(0, ${SimPolyBits - 1}), CAST(0 AS BIGINT),
           |  (acc, j) -> acc | IF(element_at(bits, j + 1) > 0,
           |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
      .select("doc_id", "sh")
    val chunks = sigs.select(col("doc_id"), col("sh"),
      posexplode(expr(
        s"""transform(sequence(0, ${SimPolyChunks - 1}),
           |  k -> (sh >> (k * $SimPolyChunkBits))
           |       & ${(1L << SimPolyChunkBits) - 1})""".stripMargin))
        .as(Seq("k", "chunk")))
    val capped = capPerBucket(chunks, Seq("k", "chunk"), BandBucketCap)
    capped.as("a")
      .join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      // same reorder as dedupSimhash: gate on hamming first so the
      // load-bearing pair dedup shuffles only the survivors (this was
      // the 1 GiB task peak of the ×10 sweep — the dedup aggregate
      // over every multi-band candidate pair)
      .filter(col("hamming") <= SimPolyMaxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  val dedupSimhashPolySql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split($normSql, ' ') AS words FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
      |  )) AS tok
      |  FROM d
      |), h AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(tok, ''), ch -> CAST(ord(ch) AS BIGINT))),
      |    (acc, c) -> (acc * 131 + c) % $PolyP) AS hv
      |  FROM sh
      |), bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
      |  FROM h CROSS JOIN (SELECT unnest(range(0, $SimPolyBits)) AS j)
      |  GROUP BY doc_id, j
      |), sig AS (
      |  SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS s
      |  FROM bits GROUP BY doc_id
      |), ch AS (
      |  SELECT doc_id, k,
      |    (s >> (k * $SimPolyChunkBits)) & ${(1L << SimPolyChunkBits) - 1} AS chunk, s
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, $SimPolyChunks)) AS k)
      |), capped AS (
      |  SELECT doc_id, k, chunk, s FROM (
      |    SELECT *, row_number() OVER (PARTITION BY k, chunk ORDER BY doc_id) AS rnk
      |    FROM ch)
      |  WHERE rnk <= $BandBucketCap
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
      |  FROM capped a JOIN capped b
      |    ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, hamming
      |FROM cand
      |WHERE hamming <= $SimPolyMaxHamming
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // #32 dedup_embedding — exact integer cosine threshold
  // ---------------------------------------------------------------------

  /** cos ≥ 0.35 ⟺ dot ≥ 0 ∧ 400·dot² ≥ 49·na·nb on vectors quantized
    * q = ⌊1000x⌋ — all-integer, bit-exact in both engines. The scale
    * and gate numerology are single-sourced in [[graft.Constants]]
    * (QuantizeScale/CosGateNum/CosGateThr) for every consumer. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr(graft.Constants.QuantizeExprSql).as("q"))
      .withColumn("nn", graft.functions.VectorFunctions.norm_sq_l(col("q")))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        graft.functions.VectorFunctions.dot_l(col("a.q"), col("b.q")).as("dot"),
        col("a.nn").as("na"), col("b.nn").as("nb"))
      .filter(col("dot") >= 0 &&
        lit(graft.Constants.CosGateNum) * col("dot") * col("dot") >=
          lit(graft.Constants.CosGateThr) * col("na") * col("nb"))
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingSql: String =
    s"""WITH q AS (
      |  SELECT vec_id,
      |    ${graft.Constants.QuantizeDuckSql} AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, v,
      |    list_sum(list_transform(v, x -> x * x)) AS nn
      |  FROM q
      |), p AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) AS dot,
      |    a.nn AS na, b.nn AS nb
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |)
      |SELECT vec_a, vec_b, CAST(dot AS BIGINT) AS dot,
      |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
      |FROM p
      |WHERE dot >= 0 AND ${graft.Constants.CosGateNum} * dot * dot >= ${graft.Constants.CosGateThr} * na * nb
      |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------
  // #32b dedup_embedding_lsh — the 100 TB path for embedding near-dup:
  // hyperplane-LSH buckets generate the candidate pairs, then the SAME
  // exact integer cosine test as dedup_embedding verifies them.
  // All-pairs never happens: the join shuffles on the bucket code only.
  // ---------------------------------------------------------------------

  /** Plane count for the dedup buckets. Buckets ≈ corpus/2^planes, so
    * this must GROW with the corpus (≈ log2(n / target bucket size));
    * 4 planes match the sub-10k-vector test corpora. The probe-mask
    * fan-out is radius-bounded, so raising planes at 100 TB leaves the
    * per-bucket cost flat while the bucket count absorbs the growth. */
  val EmbedLshPlanes = 4
  /** Probe radius: candidates cover code pairs within this hamming
    * distance (recall knob; radius 2 keeps every pair the old
    * probe-both-sides-1-bit formulation found). */
  val EmbedLshProbe = 2

  /** XOR masks of weight ≤ radius over `planes` bits, generated
    * combinatorially (Σ C(planes, w) masks) — never by filtering the
    * full 2^planes range, which stops being enumerable at the 20+
    * planes a 100 TB corpus needs. */
  private[graft] def probeMasks(planes: Int, radius: Int): Seq[Int] =
    (0 to radius).flatMap(w =>
      (0 until planes).combinations(w)
        .map(_.foldLeft(0)((m, b) => m | (1 << b))).toSeq)

  /** Asymmetric multi-probe (the standard LSH self-join shape): the
    * INDEX side lands once in its exact bucket; the PROBE side fans
    * out to every bucket within hamming ≤ r of its code. A pair
    * collides iff its code XOR is one of the probe masks — the same
    * hamming ≤ 2 coverage as probing BOTH sides 1 bit each, at
    * 1 + p + p(p−1)/2 probe rows on one side instead of the (1+p)²
    * product of both fan-outs (2.3× fewer candidates here; the gap
    * widens with p). Probe rows carry only (vec_id, bucket) — the
    * 64-long vectors join back AFTER pair dedup, so the fan-out never
    * shuffles vector payloads. Verification is the same exact integer
    * cosine test as dedup_embedding, so precision is 1.0 by
    * construction; the probe radius only trades recall.
    *
    * Duplicate collapse (round-8 stress finding): byte-identical
    * quantized vectors land in the SAME bucket by construction, so a
    * duplicate-heavy corpus — the normal state of web-scale data, and
    * the ×32 stress corpus's worst case — multiplies every index row,
    * probe row and candidate pair by the copy count (the local sweep
    * turned that into an unbounded sort spill). The pipeline therefore
    * buckets only one REPRESENTATIVE per distinct q (grouping on the
    * exact array — collision-free), verifies rep pairs, and expands
    * back through the identity groups afterwards: candidates scale
    * with DISTINCT vectors, while the expansion emits exactly the
    * pairs the all-pairs twin defines (copies are near-dups of each
    * other by identity: dot = na = nb passes the threshold always).
    * The index side additionally runs through [[capPerBucket]] — the
    * same deterministic hot-bucket bound as the minhash/simhash
    * bands — for near-identical floods that are not byte-identical. */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String,
                        planes: Int = -1,
                        radius: Int = EmbedLshProbe): DataFrame = {
    // default: self-scaling plane count (== EmbedLshPlanes at every
    // tested SF; ceil(log2(n/500)) past ~8k vectors, so buckets grow
    // with the corpus and per-bucket join cost stays flat). Sized
    // from the DISTINCT vector count: the collapse below means reps
    // are what populate buckets, and sizing from the raw count would
    // over-plane a duplicate-heavy corpus by log2(dup factor) bits —
    // recall drops with every extra plane (§4b sweep). The sizing
    // scalar is memoized per data directory
    // (Similarity.distinctQuantizedCount) — the approx-distinct scan
    // runs once per dataset, not once per invocation (VERDICT r10).
    val p =
      if (planes > 0) planes
      else graft.operators.Similarity.planesFor(
        graft.operators.Similarity.distinctQuantizedCount(spark, dir))
    // ONE window definition for the collapse, materialized ONCE: the
    // rep tagging feeds six plan branches (index, probe, both verify
    // sides, both expansion sides), and Spark reuses only the
    // EXCHANGE across them — each branch would re-sort 64-long array
    // keys and re-run the window (measured: the dominant repeated
    // cost of the r10 plan). Pinning the 3-column frame runs the
    // sort+window once; Checkpoints.pin (not a raw persist) because a
    // lazy plan has no unpersist point, so repeated invocations would
    // stack cached copies in the session until clearCache.
    val tagged = graft.Checkpoints.pin(
      graft.operators.Similarity.quantized(spark, dir)
        .withColumn("rep", min("vec_id").over(Window.partitionBy("q"))))
    val mem = tagged.select(col("vec_id"), col("rep"), col("nn"))
    val reps = tagged
      .filter(col("vec_id") === col("rep"))
      .withColumn("code", graft.operators.Similarity.codeExpr(p))
      .select(col("vec_id"), col("q"), col("nn"), col("code"))
    val masks = probeMasks(p, radius)
    val indexed = capPerBucket(
      reps.select(col("vec_id"), col("code").as("bucket")),
      Seq("bucket"), BandBucketCap, idCol = "vec_id")
    val probed = reps.select(col("vec_id"),
      explode(array(masks.map(m => col("code").bitwiseXOR(lit(m))): _*))
        .as("bucket"))
    // No pair-dedup needed: for a fixed pair the XOR of the two codes
    // equals exactly ONE probe mask (index side lands in its exact
    // bucket, probe side fans out DISTINCT masks), and the vec_id <
    // ordering pins which side indexes — so each unordered rep pair
    // is emitted at most once by construction. The dropDuplicates
    // this replaces shuffled the largest intermediate of the whole
    // plan (every candidate pair) through a two-phase hash aggregate
    // for zero semantic effect (VERDICT r10 cold-pass diagnosis).
    val cand = indexed.as("a")
      .join(probed.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ra"), col("b.vec_id").as("rb"))
    // join-back side needs no bucket codes — derive from the quantized
    // vectors directly so the code computation runs on the rep branch
    // only; all frames here are rep-level (distinct vectors)
    val vecs = reps.select(col("vec_id"), col("q"), col("nn"))
    // verification gate FIRST (one fused expression — the dot loop
    // runs once per candidate; see CosineGateL), then the survivors'
    // dot is materialized for the output (survivors are few)
    val repPairs = cand
      .join(vecs.as("va"), col("ra") === col("va.vec_id"))
      .join(vecs.as("vb"), col("rb") === col("vb.vec_id"))
      .filter(graft.functions.VectorFunctions.cosine_gate_l(
        col("va.q"), col("vb.q"), col("va.nn"), col("vb.nn"),
        num = graft.Constants.CosGateNum, thr = graft.Constants.CosGateThr))
      .select(col("ra"), col("rb"),
        graft.functions.VectorFunctions.dot_l(col("va.q"), col("vb.q")).as("dot"),
        col("va.nn").as("na"), col("vb.nn").as("nb"))
    // expansion: every member pair across two verified rep groups is a
    // near-dup with the same dot (members are byte-identical to their
    // rep); swap na/nb when member ids invert the rep order
    val cross = repPairs
      .join(mem.as("ma"), col("ra") === col("ma.rep"))
      .join(mem.as("mb"), col("rb") === col("mb.rep"))
      .select(
        least(col("ma.vec_id"), col("mb.vec_id")).as("vec_a"),
        greatest(col("ma.vec_id"), col("mb.vec_id")).as("vec_b"),
        col("dot"),
        when(col("ma.vec_id") < col("mb.vec_id"), col("na")).otherwise(col("nb")).as("na"),
        when(col("ma.vec_id") < col("mb.vec_id"), col("nb")).otherwise(col("na")).as("nb"))
    // within-group pairs: identical vectors, dot = na = nb = ‖q‖²
    val within = mem.as("x")
      .join(mem.as("y"),
        col("x.rep") === col("y.rep") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.nn").as("dot"), col("x.nn").as("na"), col("y.nn").as("nb"))
    cross.unionAll(within).orderBy("vec_a", "vec_b")
  }

  // ---------------------------------------------------------------------
  // #79 dedup_clusters — connected-component canonicalization
  // ---------------------------------------------------------------------

  /** Near-dup PAIRS are only half the dedup story: to drop duplicates
    * a pipeline must resolve the pair graph into components and keep
    * one canonical doc per component — pair lists are not transitive
    * (A~B and B~C commonly arrive without an A~C pair, and dropping
    * "the b side of every pair" would then drop both B and C or
    * neither deterministically). Components are resolved with
    * alternating large-star/small-star ([[connectedComponents]]):
    * round count is O(log d) in the component diameter — a 100 TB
    * near-dup graph routinely has chain-shaped components (serial
    * crawls of the same article) that defeat any fixed-round
    * min-label propagation — and non-convergence is a loud error,
    * never a silently wrong cluster id. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashPoly(spark, dir).select("doc_a", "doc_b")
    val labels = connectedComponents(pairs)
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "d"),
        col("doc_id") === col("d"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("int"))
      .orderBy("doc_id")
  }

  /** Connected components by alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): edges are kept in canonical large→small orientation;
    * large-star hangs every node's larger neighbours off its
    * neighbourhood minimum, small-star re-parents its smaller
    * neighbours the same way. Each round halves chain depth in the
    * style of pointer doubling, so the fixpoint arrives in O(log d)
    * rounds (vs O(d) for per-round min-label propagation), and the
    * fixpoint is a star forest: every non-root node carries exactly
    * one edge to its component minimum.
    *
    * Scale: only nodes that appear in a pair enter the loop (the
    * suspect set, orders of magnitude smaller than the corpus); each
    * round is two groupBy-min + join stages shuffling on node id. Each
    * round's frame is pinned ([[graft.Checkpoints]]: reliable
    * checkpoint when `spark.graft.checkpoint.dir` is set, else
    * localCheckpoint) — the star operators
    * reference their input several times, so without TRUNCATING the
    * logical plan (persist alone does not) the analysis tree grows
    * ~10× per round and Catalyst, not the data, becomes the
    * bottleneck; checkpointing keeps every round's plan constant-size
    * (the standard Spark iterative-graph pattern; superseded round
    * blocks are freed by the ContextCleaner). Convergence is the
    * structural star-forest test itself — no label may appear as a
    * relabelled node (one per-node aggregation + isEmpty per round) —
    * which is
    * BOTH the stopping rule and the correctness proof: a star forest
    * is a fixpoint of the alternation and, since every round preserves
    * components (Kiveris Thm. 1), its roots are exactly the component
    * minima. Testing doneness directly beats the edge-multiset
    * checksum alternative structurally (a checksum only detects the
    * fixpoint one no-change round AFTER it is reached — a full wasted
    * large+small-star round at the scale where rounds are the cost)
    * and keeps silent under-convergence impossible by construction.
    * The round cap is a backstop far above the O(log d) bound, not a
    * correctness knob.
    *
    * @param pairs 2-column frame of undirected edges (long ids)
    * @return (doc_id, lbl) for every NON-ROOT node in the pair graph,
    *   lbl = its component's minimum id; roots (the minima) are absent
    *   — callers coalesce missing ids to themselves. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.map(col)
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    // star forest ⇔ no assigned label (v) is itself relabelled (u)
    // AND no node carries two labels (out-degree 1). BOTH halves
    // matter: a chain fails only the first, a node inside two pair
    // edges ((9,5),(9,7)) fails only the second, and either shape
    // still changes under another star round. Probed as ONE per-node
    // aggregation over the checkpointed round (each edge contributes
    // its u to the relabelled side and its v to the label side; a
    // node is a violation iff it is relabelled twice — two labels —
    // or appears on both sides — a chain): one map-side-combined
    // shuffle of slim rows, vs the two self-semi-joins (4 exchanges)
    // this replaces — the probe was doubling driver round-trips in
    // the library's most iterative operator. Still the convergence
    // test AND the correctness proof in one pass.
    def isStarForest(df: DataFrame): Boolean =
      df.select(col("u"), lit(1L).as("cu"), lit(0L).as("cv"))
        .unionAll(df.select(col("v").as("u"), lit(0L).as("cu"), lit(1L).as("cv")))
        .groupBy("u").agg(sum("cu").as("cu"), sum("cv").as("cv"))
        .where(col("cu") > 1 || (col("cu") > 0 && col("cv") > 0))
        .isEmpty
    // large-star: for each node u emit (v, min(N(u) ∪ {u})) for every
    // neighbour v > u — larger neighbours re-hang off the local min.
    // Output is canonically oriented by construction (v > u ≥ m) but
    // NOT dedup'd: duplicate edges are harmless to small-star's min
    // aggregation and its canon dedups the round's result, so a
    // distinct here would be a pure extra shuffle per round.
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    // small-star: for each node u (edges oriented u > v) emit
    // (v, min(N⁻(u))) for every smaller neighbour plus (u, min) itself
    def smallStar(edges: DataFrame): DataFrame = {
      val mins = edges.groupBy("u").agg(min("v").as("m"))
      canon(edges.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v"))))
    }
    var edges = graft.Checkpoints.pin(canon(pairs.select(ca.as("u"), cb.as("v"))))
    var converged = isStarForest(edges)
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      edges = graft.Checkpoints.pin(smallStar(largeStar(edges)))
      converged = isStarForest(edges)
      rounds += 1
    }
    require(converged,
      s"connectedComponents: not a star forest within $maxRounds rounds")
    edges.select(col("u").as("doc_id"), col("v").as("lbl"))
  }

  /** DuckDB witnesses the same components with a recursive closure
    * (UNION-distinct terminates on cycles): reach(doc, r) enumerates
    * every r that reaches doc through the pair graph; MIN(r) per doc
    * is exactly the propagated fixpoint label. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${minhashPolyCtes()},
      |pairs AS (
      |  SELECT doc_a, doc_b FROM m WHERE matches * 2 >= $MinhashSeeds
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs
      |), reach(doc_id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc_id
      |)
      |SELECT doc_id, MIN(r) AS cluster_id,
      |  CAST(CASE WHEN doc_id = MIN(r) THEN 1 ELSE 0 END AS INT) AS is_canonical
      |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #111 dedup_fuzzy — edit-distance near-dup (prefix-blocked
  // Levenshtein), the missing modality between exact and token-set
  // ---------------------------------------------------------------------

  /** Compared prefix length and edit budget. */
  val FuzzyPrefix = 80
  val FuzzyBlock = 12
  val FuzzyMaxDist = 8
  /** Per-block participant cap: at most this many docs of any one
    * (lang, prefix) block enter the candidate self-join. */
  val FuzzyBlockCap = 256

  /** Edit-distance near-dup over normalized text prefixes: candidates
    * are blocked on (lang, first FuzzyBlock chars) — docs whose edits
    * touch the very head of the text are invisible to this blocker,
    * the standard blocking trade-off, while OCR noise / trailing
    * edits (the common near-dup mode) collide reliably — then
    * verified with levenshtein ≤ FuzzyMaxDist on the first
    * FuzzyPrefix chars (O(prefix²) per candidate, bounded).
    *
    * Hot-block cap: on web text a templated boilerplate head
    * ("<!doctype html><h" …) makes one block a constant fraction of
    * the corpus, and that block alone is O(f²·n²) candidate pairs
    * into a single reducer — AQE's skew split rescues the shuffle,
    * not the row count. Each block therefore admits only its
    * FuzzyBlockCap lowest doc_ids (rank within block, deterministic,
    * so the DuckDB oracle reproduces the cut bit-for-bit): candidate
    * pairs per block are bounded by cap²/2 regardless of corpus
    * size, and the rank pass itself moves O(block) slim rows — never
    * pairs. Docs cut from a hot block lose near-dup detection against
    * that boilerplate prefix only, the standard cap trade-off.
    *
    * Both engines implement classic Levenshtein, so the verify
    * predicate is oracle-exact. */
  def dedupFuzzy(spark: SparkSession, dir: String): DataFrame =
    dedupFuzzyFrom(
      Tables.load(spark, dir, "documents").select("doc_id", "lang", "text"))

  /** As [[dedupFuzzy]], over any (doc_id, lang, text) frame — the
    * scale spec feeds a crafted boilerplate corpus through this. */
  def dedupFuzzyFrom(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("doc_id"), col("lang"),
        substring(graft.functions.TextFunctions.normText(col("text")),
          1, FuzzyPrefix).as("p"))
      .withColumn("blk", substring(col("p"), 1, FuzzyBlock))
    val capped = capPerBucket(d, Seq("lang", "blk"), FuzzyBlockCap)
    // thresholded levenshtein (banded DP, returns -1 past the budget):
    // O(prefix·(2k+1)) with early exit instead of the full O(prefix²)
    // table per pair — most pairs in a capped hot block are dissimilar
    // and exit after a few rows. Surviving rows and their distances
    // are identical to the unthresholded spelling (oracle-pinned).
    capped.as("a").join(capped.as("b"),
        col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.p"), col("b.p"), FuzzyMaxDist).as("dist"))
      .filter(col("dist") >= 0)
      .orderBy("doc_a", "doc_b")
  }

  val dedupFuzzySql: String =
    s"""WITH n AS (
      |  SELECT doc_id, lang,
      |    substring(${graft.functions.TextFunctions.normTextSql}, 1, $FuzzyPrefix) AS p
      |  FROM documents
      |), b AS (
      |  SELECT *, substring(p, 1, $FuzzyBlock) AS blk FROM n
      |), capped AS (
      |  SELECT doc_id, lang, p, blk FROM (
      |    SELECT *, row_number() OVER (PARTITION BY lang, blk ORDER BY doc_id) AS rnk
      |    FROM b)
      |  WHERE rnk <= $FuzzyBlockCap
      |)
      |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
      |  CAST(levenshtein(a.p, c.p) AS INT) AS dist
      |FROM capped a JOIN capped c
      |  ON a.lang = c.lang AND a.blk = c.blk AND a.doc_id < c.doc_id
      |WHERE levenshtein(a.p, c.p) <= $FuzzyMaxDist
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // #131 dedup_lsh_recall — MinHash-LSH detector quality vs exact truth
  // ---------------------------------------------------------------------

  /** Recall AND precision of the MinHash-LSH near-dup detector (#29b)
    * against exact Jaccard truth computed ON THE DETECTOR'S OWN
    * feature space — global-scope word-2-gram shingles at J ≥ 0.8.
    * (#31's pair set is NOT that truth: it measures unigram token
    * sets within (lang, source) buckets — a recall number against a
    * different feature space and scope would be meaningless.) This is
    * the measurement a pipeline runs before trusting banded LSH at a
    * scale where exact Jaccard is unaffordable: of the true J ≥ 0.8
    * shingle pairs, how many did banding catch (recall); of the
    * flagged pairs, how many are truly J ≥ 0.8 (precision — the
    * detector verifies at estimated J ≥ 0.5, so this reads below
    * 1000). One summary row, integer permille. Complements the
    * parameter-sweep curves in graft.LshSweep by pinning the
    * PRODUCTION operating point inside the oracle battery.
    *
    * Scale: the truth set reuses the AllPairs prefix-filter theorem
    * (#31's machinery) on the shingle space — globally rather than
    * per-bucket, which is safe precisely because shingles are
    * high-selectivity (the reason minhash uses them): candidates are
    * bounded by rare-shingle document frequency, never corpus². The
    * final comparison is one join on slim pair sets + three 1-row
    * aggregates, broadcast-composed. */
  def dedupLshRecall(spark: SparkSession, dir: String): DataFrame = {
    // Duplicate collapse, global flavor (the #31 proof, one rep per
    // distinct norm): without it, ×N duplicate amplification inflates
    // every shingle's df ×N and the prefix self-join's candidates ×N²
    // — the ×10 sweep ran this path into the ground before the
    // collapse. Rep-level truth expands exactly: within-group pairs
    // are J = 1 by identity, cross-group pairs carry their reps' J.
    val wG = Window.partitionBy(md5(col("norm")))
    val tagged = graft.Checkpoints.pin(
      docs(spark, dir).withColumn("rep", min("doc_id").over(wG))
        .select(col("doc_id"), col("rep"), col("norm")))
    val members = tagged.select(col("doc_id"), col("rep"))
    val sh = tagged.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), shinglesOf(col("norm")).as("toks"))
      .withColumn("nt", size(col("toks")))
    val shP = graft.Checkpoints.pin(sh)
    val t = shP.select(col("doc_id"), col("nt"), explode(col("toks")).as("tok"))
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    val pfx = t.join(dfreq, "tok")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("nt") - expr(s"($JaccNum * nt + ${JaccDen - 1}) div $JaccDen") + 1)
      .select("doc_id", "nt", "tok")
    val cand = pfx.as("a")
      .join(pfx.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(JaccDen) * least(col("a.nt"), col("b.nt")) >=
            lit(JaccNum) * greatest(col("a.nt"), col("b.nt")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val repPairs = cand
      .join(shP.select(col("doc_id").as("doc_a"), col("toks").as("ta")), Seq("doc_a"))
      .join(shP.select(col("doc_id").as("doc_b"), col("toks").as("tb")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("ta"), col("tb"))))
      .filter(lit(JaccDen) * col("shared") >=
        lit(JaccNum) * (size(col("ta")) + size(col("tb")) - col("shared")))
      .select(col("doc_a").as("ra"), col("doc_b").as("rb"))
    val cross = repPairs
      .join(members.select(col("rep").as("ra"), col("doc_id").as("da")), Seq("ra"))
      .join(members.select(col("rep").as("rb"), col("doc_id").as("db")), Seq("rb"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val truth = cross.unionByName(within)
    val det = dedupMinhashPoly(spark, dir).select("doc_a", "doc_b")
    val hits = truth.join(det, Seq("doc_a", "doc_b"))
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(broadcast(det.agg(count(lit(1)).as("n_detected"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
      .select(col("n_true"), col("n_detected"), col("n_hit"),
        expr("n_hit * 1000 div n_true").as("recall_permille"),
        expr("n_hit * 1000 div n_detected").as("precision_permille"))
  }

  val dedupLshRecallSql: String =
    s"""WITH det AS MATERIALIZED ($dedupMinhashPolySql),
      |dd AS (SELECT doc_id, $normSql AS norm FROM documents),
      |tg AS MATERIALIZED (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(norm)) AS rep, norm
      |  FROM dd
      |), sh2 AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(words)),
      |    i -> words[i] || ' ' || words[i+1])) AS toks
      |  FROM (SELECT doc_id, string_split(norm, ' ') AS words
      |        FROM tg WHERE doc_id = rep)
      |), st AS (
      |  SELECT doc_id, len(toks) AS nt, unnest(toks) AS tok FROM sh2
      |), dfq AS (
      |  SELECT tok, COUNT(*) AS df FROM st GROUP BY tok
      |), pfx AS (
      |  SELECT doc_id, nt, st.tok
      |  FROM st JOIN dfq USING (tok)
      |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY df, tok)
      |    <= nt - ($JaccNum * nt + ${JaccDen - 1}) // $JaccDen + 1
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pfx a JOIN pfx b
      |    ON a.tok = b.tok AND a.doc_id < b.doc_id
      |   AND $JaccDen * least(a.nt, b.nt) >= $JaccNum * greatest(a.nt, b.nt)
      |), rp AS MATERIALIZED (
      |  SELECT cand.doc_a AS ra, cand.doc_b AS rb
      |  FROM cand
      |  JOIN sh2 x ON x.doc_id = cand.doc_a
      |  JOIN sh2 y ON y.doc_id = cand.doc_b
      |  WHERE $JaccDen * len(list_intersect(x.toks, y.toks))
      |    >= $JaccNum * (len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks)))
      |), truth AS MATERIALIZED (
      |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
      |    greatest(a.doc_id, b.doc_id) AS doc_b
      |  FROM rp JOIN tg a ON a.rep = rp.ra JOIN tg b ON b.rep = rp.rb
      |  UNION ALL
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM tg x JOIN tg y ON x.rep = y.rep AND x.doc_id < y.doc_id
      |), h AS (
      |  SELECT COUNT(*) AS n_hit
      |  FROM truth t JOIN det d ON t.doc_a = d.doc_a AND t.doc_b = d.doc_b
      |)
      |SELECT
      |  (SELECT COUNT(*) FROM truth) AS n_true,
      |  (SELECT COUNT(*) FROM det) AS n_detected,
      |  h.n_hit,
      |  h.n_hit * 1000 // (SELECT COUNT(*) FROM truth) AS recall_permille,
      |  h.n_hit * 1000 // (SELECT COUNT(*) FROM det) AS precision_permille
      |FROM h""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_recall" -> ((s: SparkSession, d: String) => dedupLshRecall(s, d)),
    "dedup_fuzzy" -> dedupFuzzy,
    "dedup_exact" -> dedupExact,
    "dedup_keep_best" -> dedupKeepBest,
    "dedup_jaccard" -> dedupJaccard,
    "dedup_minhash" -> ((s: SparkSession, d: String) => dedupMinhash(s, d)),
    "dedup_minhash_poly" -> dedupMinhashPoly,
    "dedup_simhash" -> ((s: SparkSession, d: String) => dedupSimhash(s, d)),
    "dedup_simhash_poly" -> dedupSimhashPoly,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => dedupEmbeddingLsh(s, d)),
    "dedup_clusters" -> dedupClusters)

  val oracle: Map[String, String] = Map(
    "dedup_lsh_recall" -> dedupLshRecallSql,
    "dedup_fuzzy" -> dedupFuzzySql,
    "dedup_exact" -> dedupExactSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_minhash_poly" -> dedupMinhashPolySql,
    "dedup_simhash_poly" -> dedupSimhashPolySql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_clusters" -> dedupClustersSql)
}
