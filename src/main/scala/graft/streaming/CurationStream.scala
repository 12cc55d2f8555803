package graft.streaming

import graft.operators.{Classifier, Corpus, Dedup}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming composed-curation admission (SURVEY §2 #155) — the
  * streaming twin of the batch pipeline's GATE stages (#151 stages
  * 1–4): documents arrive in micro-batches and each gets ONE verdict
  * — `dup_exact`, `near_dup`, `contaminated`, or `admitted` — with
  * the same precedence the batch composition applies them in
  * (exact dedup before near-dup before decontamination; reference:
  * a relay admits each message once, kinesyslog's spool dedup is the
  * degenerate single-gate case). The downstream ORDERING stages
  * (mix/shuffle/pack) are batch-order concepts with no admission
  * meaning, exactly the scoping #149 applied to SemDeDup.
  *
  * Composition semantics, not three parallel streams: a document
  * only CLAIMS dedup buckets if it passed the quality gate (batch
  * stage 1 removes rejects before any dedup sees them), and
  * contaminated documents DO claim buckets (batch computes near-dup
  * drops on pre-decontamination survivors, so a contaminated doc can
  * legitimately be the reason a later twin is rejected).
  *
  * One stateful operator serves both dedup gates by unifying their
  * key spaces: each quality-passing doc emits 1 exact-fingerprint
  * row (kind 0, key = the doc's 128-bit xxhash64-pair over the
  * normalized text) plus `Bands` LSH band rows (kind = band+1, key =
  * the band hash from [[MinhashStream]]'s shared signature algebra),
  * and a single flatMapGroupsWithState keyed by (kind, k1, k2)
  * assigns every bucket a first-writer owner — the same
  * claim-and-verify protocol as #82, with exact rows auto-verified
  * (a fingerprint collision IS the duplicate). State is one owner
  * (+ 32-slot signature on band buckets) per claimed bucket: bounded
  * by distinct documents seen — the union of #49's and #82's bounds,
  * never stream length times bands. At 100 TB the horizon is the
  * knob, exactly as #82 documents: swap NoTimeout for an ingest-time
  * timeout so buckets expire past the dedup window, with the batch
  * pipeline over the spooled corpus owning history beyond it.
  *
  * Decontamination is STATELESS here: the eval split's bloom bitset
  * (K·M bits — 24 KiB at the #84 geometry, FIXED regardless of
  * eval-set size) is collected once at stream construction and rides
  * the plan as a single array literal, probed per row with
  * exists/forall over the shared poly-hash positions — the frozen-
  * artifact pattern of #140's LM and #149's centroids. Admission is
  * causal (first arrival wins a bucket) where the batch keep-best
  * picks the LONGEST twin; exact twins share their normalized text,
  * hence identical signatures and grams, so every downstream gate is
  * invariant to which representative survives — the containment the
  * spec proves is at the fingerprint level.
  */
object CurationStream {

  /** One gate row per (doc, bucket): kind 0 = exact fingerprint,
    * kind b+1 = LSH band b. `sig` is empty on exact rows. */
  case class GateRow(doc_id: Long, kind: Int, k1: Long, k2: Long,
                     sig: Array[Long], contaminated: Boolean)

  /** A doc entering the URL gate: payload (text + source, both
    * carried through so the downstream classifier stage can score
    * admitted docs) + its canonical-URL 128-bit key. */
  case class UrlDoc(doc_id: Long, text: String, source: String,
                    k1: Long, k2: Long)
  /** URL-gate output: the doc (payload carried through — admitted
    * rows feed the classifier/content-gate queries downstream) and its
    * bucket owner; owner == doc_id means this doc holds the canonical
    * URL. */
  case class UrlVerdict(doc_id: Long, text: String, source: String,
                        owner: Long)
  /** Per-bucket observation: who owns the bucket and how many
    * signature slots agree with the owner (exact rows auto-verify
    * with the full count). */
  case class GateObs(doc_id: Long, kind: Int, owner: Long, matches: Int,
                     contaminated: Boolean)

  /** The frozen decontamination bitset: the eval split's (j, pos)
    * bloom positions as K·M booleans, index j·M + pos. Driver-bounded
    * by geometry (K·M = 196608 at the #84 constants), never by
    * eval-set size. */
  def evalBloomBits(spark: SparkSession, dir: String): Array[Boolean] = {
    val arr = new Array[Boolean](Corpus.BloomK * Corpus.BloomM)
    Corpus.evalBitsFrame(spark, dir).collect().foreach { r =>
      // j is the exploded sequence's int; pos is long poly arithmetic
      arr((r.getInt(0).toLong * Corpus.BloomM + r.getLong(1)).toInt) = true
    }
    arr
  }

  /** Stateless contamination probe over a `grams` array column: any
    * gram whose K positions are ALL lit in `bits` flags the doc —
    * the identical affine row-hash family over the shared poly gram
    * hash that #84 and the batch pipeline broadcast-join against. */
  private def contaminatedCol(grams: Column, bits: Column): Column =
    exists(
      transform(grams, g => graft.functions.SketchFunctions.poly_hash(g)),
      hv => forall(sequence(lit(0L), lit((Corpus.BloomK - 1).toLong)), j => {
        val p = lit(graft.functions.SketchFunctions.PolyP)
        val pos = ((hv * (j * 2L + 3L) + (j * 13L + 5L)) % p) % Corpus.BloomM
        element_at(bits, (j * Corpus.BloomM + pos + 1L).cast("int"))
      }))

  /** Quality gate → per-doc gate rows (1 exact + `Bands` band rows).
    * The two branches re-execute the shared prefix (a streaming
    * self-union has no subplan reuse), so each computes only what it
    * ships: contamination rides the EXACT row alone (one per doc —
    * the verdict collapse takes max(), so band rows carry false and
    * skip the gram/bloom probe entirely), and the exact branch never
    * builds the 32-slot signature (column pruning drops it before
    * the shingle hashing). */
  def gateRows(docs: DataFrame, bloomBits: Array[Boolean]): Dataset[GateRow] = {
    import docs.sparkSession.implicits._
    val tf = graft.functions.TextFunctions
    val base = Corpus.qualityGate(
      docs.select(col("doc_id"), tf.normText(col("text")).as("norm")))
      .withColumn("toks", array_distinct(tf.word_ngrams(col("norm"), 2)))
      .filter(size(col("toks")) > 0)
    val exact = base.select(col("doc_id"), lit(0).as("kind"),
      xxhash64(col("norm")).as("k1"), xxhash64(lit("fp2"), col("norm")).as("k2"),
      array().cast("array<bigint>").as("sig"),
      contaminatedCol(Corpus.ngrams(col("norm"), Corpus.DecontamN),
        typedLit(bloomBits)).as("contaminated"))
    val bands = MinhashStream.explodeBands(
      MinhashStream.withSignature(base.select("doc_id", "toks")))
      .select(col("doc_id"), (col("band") + 1).cast("int").as("kind"),
        col("band_hash").as("k1"), lit(0L).as("k2"),
        col("sig"), lit(false).as("contaminated"))
    exact.unionByName(bands).as[GateRow]
  }

  /** First writer claims each bucket; everyone reports the owner and
    * their verification strength against it (within a micro-batch
    * the smallest doc_id claims, deterministic like #82). */
  def observations(rows: Dataset[GateRow]): Dataset[GateObs] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(r => (r.kind, r.k1, r.k2))
      .flatMapGroupsWithState[MinhashStream.BucketOwner, GateObs](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, rs, state) =>
        val sorted = rs.toArray.sortBy(_.doc_id)
        val st =
          if (state.exists) state.get
          else MinhashStream.BucketOwner(sorted.head.doc_id, sorted.head.sig)
        if (!state.exists) state.update(st)
        sorted.iterator.map { r =>
          val m =
            if (r.kind == 0) Dedup.MinhashSeeds
            else {
              var agree = 0
              var i = 0
              while (i < r.sig.length) {
                if (r.sig(i) == st.sig(i)) agree += 1
                i += 1
              }
              agree
            }
          GateObs(r.doc_id, r.kind, st.owner, m, r.contaminated)
        }
      }
  }

  // ---------------------------------------------------------------------
  // #172 streaming URL admission gate — batch stage 0 as its own
  // upstream query
  // ---------------------------------------------------------------------

  /** Canonical-URL gate rows: docs with a `url` column keyed by the
    * 128-bit hash pair of their CANONICAL url (#156's rules — the
    * same normalization the batch pipeline's stage 0 dedups on, so a
    * tracking-param/case/port variant of a seen page maps to the
    * seen bucket). */
  def urlDocs(docs: DataFrame): Dataset[UrlDoc] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("canon",
        expr(graft.operators.Url.canonUrlSql("spark")))
      .select(col("doc_id"), col("text"), col("source"),
        xxhash64(col("canon")).as("k1"),
        xxhash64(lit("url2"), col("canon")).as("k2"))
      .as[UrlDoc]
  }

  /** First writer owns each canonical URL (within a micro-batch the
    * smallest doc_id, deterministic like the content gates); state is
    * ONE long per distinct canonical URL ever seen — the frontier's
    * seen-set, the smallest state any gate here carries. */
  def urlObservations(docs: Dataset[UrlDoc]): Dataset[UrlVerdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.k1, d.k2))
      .flatMapGroupsWithState[Long, UrlVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, ds, state) =>
        val sorted = ds.toArray.sortBy(_.doc_id)
        val owner = if (state.exists) state.get else sorted.head.doc_id
        if (!state.exists) state.update(owner)
        sorted.iterator.map(d => UrlVerdict(d.doc_id, d.text, d.source, owner))
      }
  }

  /** The URL admission stage as its own query, CHAINED to
    * [[admissionQuery]] through storage: verdict rows (url_dup /
    * url_admitted, with owner provenance) append to `verdictDir`, and
    * admitted docs' payloads append to `admittedDir` — the content
    * gates' input. This is the layout real crawl stacks run (frontier
    * URL dedup BEFORE fetch/ingest, content gates downstream) and it
    * reproduces the batch stage order exactly: a URL-rejected doc
    * never reaches the content gates, so it can never claim an exact
    * or band bucket the way an in-line gate would — and each query
    * keeps the single-stateful-operator shape Structured Streaming
    * plans without restriction. The admitted handoff is a materialized
    * stage boundary, the streaming analogue of the batch pipeline's
    * Checkpoints.pin between stages. */
  def urlAdmissionQuery(spark: SparkSession, inputDir: String,
                        schema: StructType, checkpointDir: String,
                        verdictDir: String, admittedDir: String): StreamingQuery =
    urlObservations(urlDocs(
      spark.readStream.schema(schema).parquet(inputDir)))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: Dataset[UrlVerdict], batchId: Long) =>
        // pinned: two writes read this frame, and each foreachBatch
        // action re-executes the micro-batch plan INCLUDING the
        // upstream stateful URL-dedup operator — unpinned, the state
        // pass ran twice per trigger (the r18 soak finding on the
        // media twin; claim semantics are idempotent, so this is a
        // 2×-work fix, not a correctness one)
        val df = graft.Checkpoints.pin(batch.toDF())
        df.select(col("doc_id"),
          when(col("owner") =!= col("doc_id"), "url_dup")
            .otherwise("url_admitted").as("verdict"),
          when(col("owner") =!= col("doc_id"), col("owner")).as("dup_of"),
          lit(batchId).as("batch_id"))
          .write.mode("append").parquet(verdictDir)
        df.filter(col("owner") === col("doc_id"))
          .select("doc_id", "text", "source")
          .write.mode("append").parquet(admittedDir)
      }
      .start()

  // ---------------------------------------------------------------------
  // Streaming classifier stage — batch stage 3 (quality → CLASSIFIER →
  // dedup gates) as its own chained query
  // ---------------------------------------------------------------------

  /** The frozen-classifier admission stage, CHAINED between
    * [[urlAdmissionQuery]] and [[admissionQuery]] exactly where the
    * batch pipeline runs it (#151 stage 3, the GPT-3 learned filter):
    * quality-passing docs get a `clf_admitted`/`clf_reject` verdict
    * from the FROZEN #176 model ([[ClassifierStream.scoreBatch]] — the
    * single scoring seam, so this stage and #184 can never score
    * divergently), and only admitted payloads reach the dedup gates —
    * a classifier-condemned doc can never claim an exact or band
    * bucket, the batch stage order. Quality rejects stay silent here
    * (the batch twin: they fall at stage 2, before this gate sees
    * them) and re-running the quality gate downstream in
    * [[admissionQuery]] is a no-op on the survivors.
    *
    * Scoring is STATELESS (frozen weights pinned once, two scalar
    * constants + the one-class degenerate pass-through flag collected
    * at query start); the only streaming state is source progress —
    * so the stage adds NO stateful operator to the chain. */
  def clfAdmissionQuery(spark: SparkSession, inputDir: String,
                        schema: StructType, modelDir: String,
                        checkpointDir: String, verdictDir: String,
                        admittedDir: String): StreamingQuery = {
    val w = graft.Checkpoints.pin(
      Classifier.model(spark, modelDir).select("tok", "w_fp"))
    val cst = Classifier.constants(spark, modelDir).head()
    val (ddFp, pdFp) = (cst.getLong(0), cst.getLong(1))
    val degenerate = cst.getLong(2) == 0L || cst.getLong(3) == 0L
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tf = graft.functions.TextFunctions
        // both pinned: qualified feeds the scorer AND the admitted
        // handoff join; scored feeds the verdict write AND that join —
        // unpinned, the quality gate + scoring plan ran twice per
        // trigger (stateless source, so a 2×-work fix only)
        val qualified = graft.Checkpoints.pin(Corpus.qualityGate(
          batch.withColumn("norm", tf.normText(col("text")))).drop("norm"))
        val scored = graft.Checkpoints.pin(
          ClassifierStream.scoreBatch(qualified, w, ddFp, pdFp)
            .withColumn("keep",
              (lit(degenerate) || col("score_fp") > 0).cast("int")))
        scored.select(col("doc_id"),
          when(col("keep") === 1, "clf_admitted")
            .otherwise("clf_reject").as("verdict"),
          col("score_fp"), lit(batchId).as("batch_id"))
          .write.mode("append").parquet(verdictDir)
        qualified.join(scored.filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")
          .select("doc_id", "text")
          .write.mode("append").parquet(admittedDir)
      }
      .start()
  }

  /** File-based ingest: one verdict row per quality-passing doc per
    * increment — (doc_id, verdict, dup_of, batch_id) appended to
    * `outDir`, the admission record. Verdict precedence mirrors the
    * batch stage order: dup_exact, then near_dup (signature-verified
    * against the bucket owner, matches·2 ≥ seeds like the batch
    * verify), then contaminated, else admitted. Runs downstream of
    * [[urlAdmissionQuery]] and [[clfAdmissionQuery]] when the corpus
    * carries URLs and a frozen classifier (batch twin: the
    * stage-0-then-content order of #151). */
  def admissionQuery(spark: SparkSession, inputDir: String, schema: StructType,
                     checkpointDir: String, outDir: String,
                     bloomBits: Array[Boolean]): StreamingQuery =
    observations(gateRows(
      spark.readStream.schema(schema).parquet(inputDir), bloomBits))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GateObs], batchId: Long) =>
        batch.toDF()
          .groupBy("doc_id")
          .agg(
            min(when(col("kind") === 0 && col("owner") =!= col("doc_id"),
              col("owner"))).as("dup_exact"),
            min(when(col("kind") > 0 && col("owner") =!= col("doc_id") &&
              col("matches") * 2 >= Dedup.MinhashSeeds,
              col("owner"))).as("dup_near"),
            max(col("contaminated").cast("int")).as("cont"))
          .select(col("doc_id"),
            when(col("dup_exact").isNotNull, "dup_exact")
              .when(col("dup_near").isNotNull, "near_dup")
              .when(col("cont") === 1, "contaminated")
              .otherwise("admitted").as("verdict"),
            coalesce(col("dup_exact"), col("dup_near")).as("dup_of"),
            lit(batchId).as("batch_id"))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
