package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup (SURVEY §2 #156–157).
  *
  * Web-scale training corpora are keyed by URL before any content
  * fingerprint exists: successive crawls of the same page differ in
  * tracking parameters, fragments, default ports, and host case, so
  * the FIRST dedup a crawl pipeline runs is canonical-URL identity
  * (CommonCrawl's dedup and every SURT-style crawl frontier do this;
  * the reference has no analogue — this extends the corpus family).
  *
  * Canonical form (the published crawl-dedup rules):
  *   - scheme and host lowercased; a leading `www.` stripped;
  *   - default ports dropped (`:80` for http, `:443` for https),
  *     non-default ports kept;
  *   - the fragment dropped (never sent to the server);
  *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`);
  *   - surviving query parameters sorted byte-wise (param order is
  *     semantically irrelevant; sorting makes equal parameter SETS
  *     equal strings);
  *   - a trailing slash stripped from non-root paths (path case is
  *     preserved — RFC 3986 paths are case-sensitive).
  *
  * The documents table has no URL column, so each doc synthesizes one
  * deterministically in-query (the media/#112 pattern): messy variants
  * — upper-case scheme/host, redundant default ports, tracking params,
  * fragments, trailing slashes — that all collapse under the rules
  * above. Both engines build the SAME url string from the same integer
  * residues, so the oracle verifies the canonicalization algebra, not
  * the synthesis.
  *
  * Scale shape: #156 is pure per-row string algebra — map-only,
  * codegen'd, scan-bound at 100 TB. #157 adds ONE hash groupBy on
  * canon_url (the min-doc_id keeper rule of #28), the cheapest dedup
  * shuffle there is: keys are short strings, partial aggregation
  * collapses duplicates map-side before the shuffle.
  */
object Url {

  /** Tracking params dropped by canonicalization: any `utm_*` plus
    * these exact keys. */
  val TrackingExact: Seq[String] = Seq("fbclid", "gclid")

  // --- shared synthesis: one messy URL per doc, same in both engines.
  // Residues: %2 scheme case/kind, %5 port variant, %3 query shape,
  // %4 fragment, %7 trailing slash; id-in-page = doc_id % 20 so docs
  // congruent mod 60 within a source collapse to one canonical URL.
  private def idstr(dialect: String): String =
    if (dialect == "spark") "CAST(doc_id % 20 AS STRING)"
    else "CAST(doc_id % 20 AS VARCHAR)"

  private def synthSql(dialect: String, spiked: Boolean = false,
                       novelProbes: Boolean = false): String = {
    // `novelProbes` (the #185 seen-bloom query only): half the probe
    // batch (doc_id % 7 = 0 AND % 2 = 0) fetches a NEVER-crawled page
    // id (1000 + doc_id, disjoint from the %20 article ids), so the
    // frontier genuinely mixes revisits with new pages — without it
    // the 60-page corpus makes every probe a revisit
    val cast = if (dialect == "spark") "STRING" else "VARCHAR"
    val id =
      if (novelProbes)
        s"CASE WHEN doc_id % 7 = 0 AND doc_id % 2 = 0 " +
          s"THEN CAST(1000 + doc_id AS $cast) ELSE ${idstr(dialect)} END"
      else idstr(dialect)
    // `spiked` (the #162 filter query only) plants the content the
    // rule battery exists to catch: a spam path segment on %13 docs
    // and a binary-download extension on %17 docs — #156/#157 keep
    // the unspiked synthesis, so their oracles are untouched
    val spam = if (spiked)
      "\n       |  CASE WHEN doc_id % 13 = 0 THEN '/Casino-bonus' ELSE '' END," else ""
    val ext = if (spiked)
      "\n       |  CASE WHEN doc_id % 17 = 0 THEN '.exe' ELSE '' END," else ""
    s"""concat(
       |  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END, '://',
       |  'WWW.', upper(source), '.Example.COM',
       |  CASE WHEN doc_id % 5 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
       |       WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END,$spam
       |  '/Docs/Article-', $id,$ext
       |  CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
       |  CASE WHEN doc_id % 3 = 0 THEN concat('?utm_source=feed&gclid=XYZ&id=', $id)
       |       WHEN doc_id % 3 = 1 THEN concat('?id=', $id, '&utm_campaign=news&b=2')
       |       ELSE '' END,
       |  CASE WHEN doc_id % 4 = 0 THEN '#Section-2' ELSE '' END)""".stripMargin
  }

  /** Canonicalization over a column named `url` — rendered for either
    * engine from ONE rule set, dialect differences confined to
    * function names (filter/list_filter, array_sort/list_sort,
    * array_join/array_to_string). `split_part` is literal-delimiter
    * and 1-based in both engines and returns '' past the last part,
    * which is exactly the absent-component behavior the rules need. */
  private def canonSql(dialect: String): String = {
    val (fFilter, fSort, fJoin) =
      if (dialect == "spark") ("filter", "array_sort", "array_join")
      else ("list_filter", "list_sort", "array_to_string")
    val fSplit = if (dialect == "spark") "split" else "string_split"
    // Spark's SQL parser processes backslash escapes inside string
    // literals ('\\.' → \.); DuckDB's does not — render the regex so
    // BOTH engines see `^www\.` after their own literal parsing.
    val wwwRe = if (dialect == "spark") "'^www\\\\.'" else "'^www\\.'"
    // components (url is well-formed by synthesis: scheme://auth/path…)
    val scheme = "lower(split_part(url, '://', 1))"
    val rest = "split_part(split_part(url, '://', 2), '#', 1)" // frag dropped
    val auth = s"split_part($rest, '/', 1)"
    val tail = s"substring($rest, length($auth) + 1)" // '/path[?query]'
    val host = s"regexp_replace(lower(split_part($auth, ':', 1)), $wwwRe, '')"
    val port = s"split_part($auth, ':', 2)"
    val path = s"split_part($tail, '?', 1)"
    val query = s"split_part($tail, '?', 2)"
    val portKeep =
      s"""CASE WHEN $port = '' THEN ''
         |     WHEN $scheme = 'https' AND $port = '443' THEN ''
         |     WHEN $scheme = 'http' AND $port = '80' THEN ''
         |     ELSE concat(':', $port) END""".stripMargin
    val pathKeep =
      s"CASE WHEN $path <> '/' THEN regexp_replace($path, '/$$', '') ELSE $path END"
    val dropExact = TrackingExact.map(k => s"'$k'").mkString("(", ", ", ")")
    val params =
      s"""$fSort($fFilter($fSplit($query, '&'),
         |  p -> p <> '' AND substring(p, 1, 4) <> 'utm_'
         |       AND NOT split_part(p, '=', 1) IN $dropExact))""".stripMargin
    // coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    // array_join([]) is '' — normalize both to ''
    val queryKeep =
      s"CASE WHEN coalesce($fJoin($params, '&'), '') = '' THEN '' " +
        s"ELSE concat('?', $fJoin($params, '&')) END"
    s"concat($scheme, '://', $host, $portKeep, $pathKeep, $queryKeep)"
  }

  /** The #156 canonicalization over a column named `url`, exported for
    * composition: the pipeline's URL stage (#151 stage 0) and the
    * streaming admission twin's URL gate key on the same rules. */
  private[graft] def canonUrlSql(dialect: String): String = canonSql(dialect)

  // --- #171 pipeline synthesis: the composed pipeline's URL stage.
  //
  // Semantic content (scheme kind, host, page id) keys on `url_key`;
  // presentation NOISE (scheme/host case, redundant default port,
  // tracking params, fragment, trailing slash) keys on doc_id residues
  // — so every doc's RAW url is messy in its own way, canonicalization
  // must do real work on every row, and two docs collide iff they
  // share url_key. The planted recrawl twins are docs with
  // doc_id % 101 == 55, which re-fetch the page of doc_id − 1: raw
  // strings differ (different noise residues), canonical forms are
  // equal, and the min-id keeper drops the twin at stage 0 — the
  // same-page-crawled-twice scenario URL dedup exists for. Unlike
  // #156's synthesis (mod-60 collapse classes, built to stress the
  // dedup aggregate), page ids here are doc-unique so the pipeline's
  // downstream stages keep their planted one-casualty-per-gate
  // structure.
  private[graft] val PipelineTwinMod = 101L
  private[graft] val PipelineTwinRes = 55L

  /** `url_key` from doc_id: the recrawl twin re-fetches its
    * predecessor's page. Same text in both dialects. */
  private[graft] def pipelineUrlKeySql: String =
    s"CASE WHEN doc_id % $PipelineTwinMod = $PipelineTwinRes " +
      "THEN doc_id - 1 ELSE doc_id END"

  /** Messy raw URL over (doc_id, url_key) columns. */
  private[graft] def pipelineSynthSql(dialect: String): String = {
    val cast = if (dialect == "spark") "STRING" else "VARCHAR"
    s"""concat(
       |  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
       |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.SRC' ELSE 'www.src' END,
       |  CAST(url_key % 20 AS $cast),
       |  CASE WHEN doc_id % 3 = 0 THEN '.EXAMPLE.COM' ELSE '.example.com' END,
       |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
       |  '/docs/article-', CAST(url_key AS $cast),
       |  CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
       |  CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&gclid=XYZ' ELSE '' END,
       |  CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #156 text_url_canon — per-doc canonical URL + registrable host
  // ---------------------------------------------------------------------

  def urlCanon(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(synthSql("spark")).as("url"))
      .select(col("doc_id"), col("url"),
        expr(canonSql("spark")).as("canon_url"))
      .withColumn("host", expr("split_part(split_part(canon_url, '://', 2), '/', 1)"))
      .withColumn("host", expr("split_part(host, ':', 1)"))
      .orderBy("doc_id")

  val urlCanonSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, ${synthSql("duck")} AS url FROM documents
       |), c AS (
       |  SELECT doc_id, url, ${canonSql("duck")} AS canon_url FROM u
       |)
       |SELECT doc_id, url, canon_url,
       |  split_part(split_part(split_part(canon_url, '://', 2), '/', 1), ':', 1) AS host
       |FROM c
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #157 corpus_url_dedup — canonical-URL identity dedup (keep min id)
  // ---------------------------------------------------------------------

  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(synthSql("spark")).as("url"))
      .select(col("doc_id"), expr(canonSql("spark")).as("canon_url"))
    val keep = c.groupBy("canon_url")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_variants"))
    c.join(keep, "canon_url")
      .select(col("doc_id"), col("canon_url"),
        (col("doc_id") === col("keep_id")).cast("int").as("kept"),
        col("n_variants"))
      .orderBy("doc_id")
  }

  val urlDedupSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, ${synthSql("duck")} AS url FROM documents
       |), c AS (
       |  SELECT doc_id, ${canonSql("duck")} AS canon_url FROM u
       |), k AS (
       |  SELECT canon_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_variants
       |  FROM c GROUP BY canon_url
       |)
       |SELECT c.doc_id, c.canon_url,
       |  CASE WHEN c.doc_id = k.keep_id THEN 1 ELSE 0 END AS kept,
       |  k.n_variants
       |FROM c JOIN k USING (canon_url)
       |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #162 corpus_url_filter — URL rule battery (the RefinedWeb/C4-style
  // frontier filter: drop by domain blocklist, banned words in the
  // URL, and non-document extensions — decided BEFORE fetching the
  // page, so it is the cheapest quality gate a crawl pipeline has)
  // ---------------------------------------------------------------------

  /** Blocked registrable hosts (post-canonicalization, so WWW./case/
    * port variants of a blocked domain cannot slip through). */
  val BlockedHosts: Seq[String] = Seq("src4.example.com", "src13.example.com")
  /** Banned words anywhere in the canonical URL (lowercased host +
    * case-preserved path, so the match is case-insensitive via an
    * explicit lower()). */
  val BannedWords: Seq[String] = Seq("casino", "viagra")
  /** Non-document extensions dropped at the frontier. */
  val BlockedExtensions: Seq[String] = Seq(".exe", ".zip", ".dmg")

  /** Verdict precedence (first match wins): blocked_domain >
    * banned_word > bad_extension > kept — domain blocks are the
    * strongest signal and make the others unreachable for that host.
    * The battery runs on the CANONICAL url (#156), the same
    * normalization the dedup keys on. Map-only string algebra. */
  private[graft] def filterVerdictSql(dialect: String): String = {
    val fEnds = if (dialect == "spark") "endswith" else "ends_with"
    val hosts = BlockedHosts.map(h => s"'$h'").mkString("(", ", ", ")")
    val words = BannedWords
      .map(w => s"contains(lower(canon_url), '$w')").mkString(" OR ")
    val path = "split_part(split_part(canon_url, '://', 2), '?', 1)"
    val exts = BlockedExtensions
      .map(e => s"$fEnds($path, '$e')").mkString(" OR ")
    s"""CASE WHEN host IN $hosts THEN 'blocked_domain'
       |     WHEN $words THEN 'banned_word'
       |     WHEN $exts THEN 'bad_extension'
       |     ELSE 'kept' END""".stripMargin
  }

  def urlFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(synthSql("spark", spiked = true)).as("url"))
      .select(col("doc_id"), expr(canonSql("spark")).as("canon_url"))
      .withColumn("host",
        expr("split_part(split_part(split_part(canon_url, '://', 2), '/', 1), ':', 1)"))
      .withColumn("verdict", expr(filterVerdictSql("spark")))
      .select(col("doc_id"), col("host"), col("verdict"))
      .orderBy("doc_id")

  val urlFilterSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, ${synthSql("duck", spiked = true)} AS url FROM documents
       |), c AS (
       |  SELECT doc_id, ${canonSql("duck")} AS canon_url FROM u
       |), h AS (
       |  SELECT doc_id, canon_url,
       |    split_part(split_part(split_part(canon_url, '://', 2), '/', 1), ':', 1) AS host
       |  FROM c
       |)
       |SELECT doc_id, host, ${filterVerdictSql("duck")} AS verdict
       |FROM h
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #185 corpus_url_seen_bloom — bloom seen-set frontier probe
  // ---------------------------------------------------------------------

  /** Bloom geometry for the URL seen-set (the #84 affine family over
    * the shared poly hash). Deliberately UNDERSIZED (see
    * [[urlSeenBloom]]) so the FP path is exercised at test scale;
    * production sizes via [[bloomGeometry]] — the #196 sized row and
    * the crawl pipeline's stage 3 ([[Crawl]]) do. */
  val UrlBloomK = 3
  val UrlBloomM = 128

  /** Standard bloom sizing, baked as exact integer constants: the
    * optimal geometry m = −n·ln(p)/(ln 2)², k = (m/n)·ln 2 evaluated
    * at the published operating points and stored as (k, bits-per-key
    * in TENTHS) — no transcendentals ever run in-plan (the log2fp
    * mantissa-table discipline), so both engines derive the same m
    * from the same key count.
    *   100‰ target → k=3,  4.8 bits/key
    *    10‰ target → k=7,  9.6 bits/key
    *     1‰ target → k=10, 14.4 bits/key */
  val BloomGeometryTable: Map[Int, (Int, Int)] =
    Map(100 -> (3, 48), 10 -> (7, 96), 1 -> (10, 144))

  /** (k, mBits) for `nKeys` expected insertions at the target FP rate
    * — the sizing every fixed-M caveat in this family (#84's
    * decontamination bits, #185's M=128) points at. mBits =
    * ⌈nKeys · bitsPerKey⌉ in exact integer math. */
  def bloomGeometry(nKeys: Long, targetFpPermille: Int): (Int, Long) = {
    val (k, bpkTenths) = BloomGeometryTable(targetFpPermille)
    (k, math.max(1L, (nKeys * bpkTenths + 9) / 10))
  }

  /** The m-bits formula rendered for either engine over a key-count
    * column — `(n · bpk + 9) div 10`, the [[bloomGeometry]] integer
    * spelling. */
  private[graft] def bloomMBitsSql(nCol: String, targetFpPermille: Int,
                                   dialect: String): String = {
    val bpk = BloomGeometryTable(targetFpPermille)._2
    val d = if (dialect == "spark") "div" else "//"
    s"CASE WHEN ($nCol * $bpk + 9) $d 10 < 1 THEN 1 " +
      s"ELSE ($nCol * $bpk + 9) $d 10 END"
  }

  /** The crawl-pipeline synthesis: spiked (filter casualties) AND
    * novel probes (genuinely new pages in the frontier batch) — the
    * one URL space the composed pipeline's every stage reads. */
  private[graft] def crawlSynthSql(dialect: String): String =
    synthSql(dialect, spiked = true, novelProbes = true)

  /** Per-URL bloom probe positions over the portable poly hash: K
    * rows (j, pos) per input row, pos = ((hv·(2j+3) + 13j+5) mod P)
    * mod mBits — the #185 affine family, parameterized so the sized
    * consumers (#196, crawl stage 3) can pass their own k and a
    * data-derived m (carried as column `m_bits`). */
  private[graft] def bloomPositionsSized(df: DataFrame, k: Int): DataFrame = {
    import graft.functions.SketchFunctions.{poly_hash, PolyP}
    val h = df.withColumn("hv", poly_hash(col("canon_url")))
    h.select(h.columns.map(col) :+
        explode(expr(s"sequence(0, ${k - 1})")).as("j"): _*)
      .withColumn("pos",
        ((col("hv") * (col("j") * 2 + 3) + (col("j") * 13 + 5)) % PolyP)
          % col("m_bits"))
  }

  /** Bloom URL seen-set with a false-positive audit: a crawl frontier
    * at 100 TB cannot hold its exact seen-URL set in memory per
    * worker, so real crawlers probe a bloom filter (Heritrix/Nutch's
    * already-seen structure; the #84 trade restated for URLs — the
    * broadcast is ≤ K·M bits FIXED regardless of crawl history size,
    * where #157's exact dedup state grows with it). History = docs
    * with doc_id % 7 ≠ 0 (already fetched, their canonical URLs light
    * the bits); the new batch (doc_id % 7 = 0) probes. The split key
    * is 7 deliberately: canonical URLs collapse on (source, doc_id
    * mod 60) classes, and gcd(60, 7) = 1, so classes SPAN the split —
    * probes genuinely re-visit crawled pages (a %3 split would align
    * with the collapse classes and make truly_seen structurally
    * impossible). M = 128 (≈ 2 bits per historical page) deliberately
    * UNDERSIZES the filter so the collision path is actually exercised
    * at test scale (the FP audit is the point of the row; production
    * sizes M to its history — ~10 bits/key for 1% FP — and reads the
    * same audit). Classic bloom semantics, oracle-exact INCLUDING the
    * false positives: no false negatives (truly_seen ⇒ bloom_seen,
    * spec-asserted), collisions deterministic integer math in both
    * engines. */
  def urlSeenBloom(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchFunctions.{poly_hash, PolyP}
    // pinned (r21, the Crawl.pipelineFrames canonical-frame
    // discipline): four consumers read this synth+canon map pass
    // (history bits, exact-truth set, probe positions, the report
    // join) — unpinned, the string-heavy canonicalization ran four
    // times per evaluation
    val c = graft.Checkpoints.pin(Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr(synthSql("spark", novelProbes = true)).as("url"))
      .select(col("doc_id"), expr(canonSql("spark")).as("canon_url")))
    def positions(df: DataFrame): DataFrame = {
      val h = df.withColumn("hv", poly_hash(col("canon_url")))
      h.select(h.columns.map(col) :+
          explode(expr(s"sequence(0, ${UrlBloomK - 1})")).as("j"): _*)
        .withColumn("pos",
          ((col("hv") * (col("j") * 2 + 3) + (col("j") * 13 + 5)) % PolyP)
            % UrlBloomM)
    }
    val crawled = c.filter(col("doc_id") % 7 =!= 0)
    val probes = c.filter(col("doc_id") % 7 === 0)
    val bits = positions(crawled.select("canon_url"))
      .select("j", "pos").distinct()
    val bloomSeen = positions(probes)
      .join(broadcast(bits), Seq("j", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("k_hits"))
      .filter(col("k_hits") === UrlBloomK)
      .select(col("doc_id"), lit(1).as("bloom_seen"))
    val seenExact = crawled.select("canon_url").distinct()
      .withColumn("truly", lit(1))
    probes
      .join(bloomSeen, Seq("doc_id"), "left")
      .join(seenExact, Seq("canon_url"), "left")
      .select(col("doc_id"), col("canon_url"),
        coalesce(col("bloom_seen"), lit(0)).as("bloom_seen"),
        coalesce(col("truly"), lit(0)).as("truly_seen"))
      .withColumn("false_positive",
        (col("bloom_seen") === 1 && col("truly_seen") === 0).cast("int"))
      .orderBy("doc_id")
  }

  val urlSeenBloomSql: String = {
    val p = graft.functions.SketchFunctions.PolyP
    val hashDuck = graft.functions.SketchFunctions.polyHashSqlDuck("canon_url")
    s"""WITH u AS (
       |  SELECT doc_id, ${synthSql("duck", novelProbes = true)} AS url FROM documents
       |), c AS (
       |  SELECT doc_id, ${canonSql("duck")} AS canon_url FROM u
       |), h AS (
       |  SELECT doc_id, canon_url, $hashDuck AS hv
       |  FROM c
       |), pos AS (
       |  SELECT doc_id, canon_url, j,
       |    ((hv * (2*j + 3) + (13*j + 5)) % $p) % $UrlBloomM AS pos
       |  FROM h CROSS JOIN (SELECT unnest(range(0, $UrlBloomK)) AS j)
       |), bits AS (
       |  SELECT DISTINCT j, pos FROM pos WHERE doc_id % 7 <> 0
       |), bs AS (
       |  SELECT p.doc_id
       |  FROM pos p JOIN bits b ON p.j = b.j AND p.pos = b.pos
       |  WHERE p.doc_id % 7 = 0
       |  GROUP BY p.doc_id
       |  HAVING COUNT(*) = $UrlBloomK
       |), seen AS (
       |  SELECT DISTINCT canon_url FROM c WHERE doc_id % 7 <> 0
       |)
       |SELECT c.doc_id, c.canon_url,
       |  CAST(CASE WHEN bs.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS bloom_seen,
       |  CAST(CASE WHEN seen.canon_url IS NOT NULL THEN 1 ELSE 0 END AS INT) AS truly_seen,
       |  CAST(CASE WHEN bs.doc_id IS NOT NULL AND seen.canon_url IS NULL
       |       THEN 1 ELSE 0 END AS INT) AS false_positive
       |FROM c
       |LEFT JOIN bs ON bs.doc_id = c.doc_id
       |LEFT JOIN seen ON seen.canon_url = c.canon_url
       |WHERE c.doc_id % 7 = 0
       |ORDER BY c.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // #196 corpus_url_bloom_sized — the sizing trade as an operator
  // ---------------------------------------------------------------------

  /** Target FP for the sized row: 10‰ (1%), the production default. */
  val SizedBloomTargetFpPermille = 10

  /** The #185 probe with [[bloomGeometry]]-SIZED geometry and the
    * achieved-FP audit in one summary row: m derives from the DISTINCT
    * history-key count at the 1% operating point (k=7, 9.6 bits/key),
    * so unlike the deliberately-undersized #185 the filter scales with
    * its history — the saturation mode #84/#185 document (fixed M, ×32
    * history → every bit lit → every probe "seen") cannot occur. The
    * row reports (n_keys, m_bits, k, n_probes, n_bloom_seen,
    * n_truly_seen, n_false_pos, fp_permille over truly-unseen probes);
    * the spec asserts fp_permille ≤ target and zero false negatives.
    * Collisions are deterministic integer math — DuckDB reproduces the
    * exact FP count, not just its rate. */
  def urlBloomSized(spark: SparkSession, dir: String): DataFrame = {
    val k = BloomGeometryTable(SizedBloomTargetFpPermille)._1
    // pinned (r21): five consumers — the sizing aggregate, history
    // bits, probe positions, the exact-truth set, the report join —
    // otherwise each re-ran the synth+canon pass (urlSeenBloom note)
    val c = graft.Checkpoints.pin(Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr(synthSql("spark", novelProbes = true)).as("url"))
      .select(col("doc_id"), expr(canonSql("spark")).as("canon_url")))
    val crawled = c.filter(col("doc_id") % 7 =!= 0)
    val probes = c.filter(col("doc_id") % 7 === 0)
    val geo = crawled.agg(countDistinct("canon_url").as("n_keys"))
      .select(col("n_keys"),
        expr(bloomMBitsSql("n_keys", SizedBloomTargetFpPermille, "spark"))
          .as("m_bits"))
    val bits = bloomPositionsSized(
        crawled.select("canon_url").crossJoin(broadcast(geo)), k)
      .select("j", "pos").distinct()
    // no broadcast hint on the SIZED bit-set (unlike #185's fixed
    // K·M ≤ 384 rows above): it grows with the history, so AQE
    // broadcasts while small and shuffles the (j, pos) semi-join
    // when a production history's bits outgrow the threshold
    val bloomSeen = bloomPositionsSized(
        probes.crossJoin(broadcast(geo)), k)
      .join(bits, Seq("j", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("k_hits"))
      .filter(col("k_hits") === k)
      .select(col("doc_id"), lit(1).as("bs"))
    val seenExact = crawled.select("canon_url").distinct()
      .withColumn("truly", lit(1))
    probes
      .join(bloomSeen, Seq("doc_id"), "left")
      .join(seenExact, Seq("canon_url"), "left")
      .select(coalesce(col("bs"), lit(0)).as("bs"),
        coalesce(col("truly"), lit(0)).as("truly"))
      .agg(count(lit(1)).as("n_probes"),
        sum("bs").as("n_bloom_seen"),
        sum("truly").as("n_truly_seen"),
        sum(when(col("bs") === 1 && col("truly") === 0, 1L).otherwise(0L))
          .as("n_false_pos"))
      .crossJoin(broadcast(geo))
      .select(col("n_keys"), col("m_bits"), lit(k).as("k"),
        col("n_probes"), col("n_bloom_seen"), col("n_truly_seen"),
        col("n_false_pos"),
        expr("n_false_pos * 1000 div nullif(n_probes - n_truly_seen, 0)")
          .as("fp_permille"))
  }

  val urlBloomSizedSql: String = {
    val p = graft.functions.SketchFunctions.PolyP
    val hashDuck = graft.functions.SketchFunctions.polyHashSqlDuck("canon_url")
    val k = BloomGeometryTable(SizedBloomTargetFpPermille)._1
    s"""WITH u AS (
       |  SELECT doc_id, ${synthSql("duck", novelProbes = true)} AS url FROM documents
       |), c AS MATERIALIZED (
       |  SELECT doc_id, ${canonSql("duck")} AS canon_url FROM u
       |), geo AS (
       |  SELECT n_keys,
       |    ${bloomMBitsSql("n_keys", SizedBloomTargetFpPermille, "duck")} AS m_bits
       |  FROM (SELECT CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_keys
       |        FROM c WHERE doc_id % 7 <> 0)
       |), h AS (
       |  SELECT doc_id, canon_url, $hashDuck AS hv FROM c
       |), pos AS MATERIALIZED (
       |  SELECT doc_id, j,
       |    ((hv * (2*j + 3) + (13*j + 5)) % $p) % m_bits AS pos
       |  FROM h CROSS JOIN geo
       |  CROSS JOIN (SELECT unnest(range(0, $k)) AS j)
       |), bits AS MATERIALIZED (
       |  SELECT DISTINCT j, pos FROM pos WHERE doc_id % 7 <> 0
       |), bs AS (
       |  SELECT p.doc_id
       |  FROM pos p JOIN bits b ON p.j = b.j AND p.pos = b.pos
       |  WHERE p.doc_id % 7 = 0
       |  GROUP BY p.doc_id HAVING COUNT(*) = $k
       |), seen AS (
       |  SELECT DISTINCT canon_url FROM c WHERE doc_id % 7 <> 0
       |), per AS (
       |  SELECT CASE WHEN bs.doc_id IS NOT NULL THEN 1 ELSE 0 END AS b,
       |    CASE WHEN seen.canon_url IS NOT NULL THEN 1 ELSE 0 END AS t
       |  FROM c
       |  LEFT JOIN bs ON bs.doc_id = c.doc_id
       |  LEFT JOIN seen ON seen.canon_url = c.canon_url
       |  WHERE c.doc_id % 7 = 0
       |)
       |SELECT g.n_keys, g.m_bits, CAST($k AS INT) AS k,
       |  CAST(COUNT(*) AS BIGINT) AS n_probes,
       |  CAST(SUM(b) AS BIGINT) AS n_bloom_seen,
       |  CAST(SUM(t) AS BIGINT) AS n_truly_seen,
       |  CAST(SUM(CASE WHEN b = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_false_pos,
       |  CAST(SUM(CASE WHEN b = 1 AND t = 0 THEN 1 ELSE 0 END) * 1000
       |    // NULLIF(COUNT(*) - SUM(t), 0) AS BIGINT) AS fp_permille
       |FROM per CROSS JOIN geo g
       |GROUP BY g.n_keys, g.m_bits""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_url_canon" -> ((s: SparkSession, d: String) => urlCanon(s, d)),
    "corpus_url_dedup" -> ((s: SparkSession, d: String) => urlDedup(s, d)),
    "corpus_url_filter" -> ((s: SparkSession, d: String) => urlFilter(s, d)),
    "corpus_url_seen_bloom" -> ((s: SparkSession, d: String) => urlSeenBloom(s, d)),
    "corpus_url_bloom_sized" -> ((s: SparkSession, d: String) => urlBloomSized(s, d)))

  def oracle: Map[String, String] = Map(
    "text_url_canon" -> urlCanonSql,
    "corpus_url_dedup" -> urlDedupSql,
    "corpus_url_filter" -> urlFilterSql,
    "corpus_url_seen_bloom" -> urlSeenBloomSql,
    "corpus_url_bloom_sized" -> urlBloomSizedSql)
}
