package graft

import java.nio.file.Files

import graft.operators.Corpus
import graft.streaming.{CurationStream, MinhashStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** #155 CurationStream — the streaming admission twin of the batch
  * pipeline's gate stages (#151 stages 1–4): verdict partition,
  * per-gate correctness against independent batch recomputations,
  * fingerprint-level containment of the batch survivor set, and
  * cross-restart bucket-state survival. */
class CurationStreamSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", "long").add("text", "string")
  private val clfSchema = new StructType()
    .add("doc_id", "long").add("text", "string").add("source", "string")
  private val urlSchema = new StructType()
    .add("doc_id", "long").add("text", "string").add("source", "string")
    .add("url", "string")

  private def trainDocs = Tables.load(spark, sf, "documents")
    .filter(col("doc_id") % Corpus.BenchmarkMod =!= 0)
    .select("doc_id", "text", "source")

  /** Train docs carrying the batch pipeline's synthesized raw URL —
    * the crawl-shaped input the chained URL + classifier + content
    * admission runs on (#171/#172's twin corpus). */
  private def trainDocsWithUrl = trainDocs
    .withColumn("url_key", expr(operators.Url.pipelineUrlKeySql))
    .withColumn("url", expr(operators.Url.pipelineSynthSql("spark")))
    .select("doc_id", "text", "source", "url")

  test("single increment: chained URL + classifier + content gates match the batch twin") {
    val in = Files.createTempDirectory("graft_cur_in")
    val urlOut = Files.createTempDirectory("graft_cur_urlout")
    val admittedDir = Files.createTempDirectory("graft_cur_admitted")
    val clfOut = Files.createTempDirectory("graft_cur_clfout")
    val clfAdmitted = Files.createTempDirectory("graft_cur_clfadm")
    val out = Files.createTempDirectory("graft_cur_out")
    val ckptU = Files.createTempDirectory("graft_cur_cku")
    val ckptC = Files.createTempDirectory("graft_cur_ckc")
    val ckpt = Files.createTempDirectory("graft_cur_ck")
    trainDocsWithUrl.coalesce(1).write.mode("append").parquet(in.toString)
    // stage 0: the URL gate drains first; its admitted handoff is the
    // classifier stage's input (the batch stage boundary, materialized)
    val qu = CurationStream.urlAdmissionQuery(spark, in.toString, urlSchema,
      ckptU.toString, urlOut.toString, admittedDir.toString)
    assert(qu.awaitTermination(120000))
    // stage 3: the frozen-classifier gate; only its admitted payloads
    // reach the dedup/decontamination gates (the batch stage order)
    val qc = CurationStream.clfAdmissionQuery(spark, admittedDir.toString,
      clfSchema, sf, ckptC.toString, clfOut.toString, clfAdmitted.toString)
    assert(qc.awaitTermination(120000))
    val bits = CurationStream.evalBloomBits(spark, sf)
    val q = CurationStream.admissionQuery(spark, clfAdmitted.toString, schema,
      ckpt.toString, out.toString, bits)
    assert(q.awaitTermination(120000))

    val frames = Corpus.pipelineFrames(spark, sf)

    // URL verdicts: rejected set = exactly the batch stage-0
    // casualties, each with provenance naming the batch keeper
    val urlVerdicts = spark.read.parquet(urlOut.toString)
      .select("doc_id", "verdict", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val trainIds = trainDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val s0Ids = frames.s0.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(urlVerdicts.map(_._1).toSet === trainIds,
      "every arrival gets a URL verdict")
    assert(urlVerdicts.filter(_._2 == "url_dup").map(_._1).toSet
      === trainIds -- s0Ids, "URL casualties must match batch stage 0")
    urlVerdicts.filter(_._2 == "url_dup").foreach { case (d, _, dupOf) =>
      assert(dupOf.isDefined && s0Ids.contains(dupOf.get) && dupOf.get < d,
        s"url_dup $d provenance ${dupOf}")
    }
    assert(urlVerdicts.exists(_._2 == "url_dup"),
      "the sf corpus plants recrawl twins; none rejected")

    // classifier verdicts: one per quality-passing URL survivor; the
    // reject set is exactly the batch stage-3 casualties (q minus c),
    // and only clf-admitted payloads flowed on
    val qIds = frames.q.select("doc_id").collect().map(_.getLong(0)).toSet
    val cIds = frames.c.select("doc_id").collect().map(_.getLong(0)).toSet
    val clfVerdicts = spark.read.parquet(clfOut.toString)
      .select("doc_id", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(clfVerdicts.map(_._1).toSet === qIds,
      "every quality-passing URL survivor gets a classifier verdict")
    assert(clfVerdicts.filter(_._2 == "clf_reject").map(_._1).toSet
      === qIds -- cIds, "clf_reject set must match batch stage 3 casualties")
    assert(clfVerdicts.exists(_._2 == "clf_reject"),
      "the sf corpus carries crawl-labeled docs; none rejected")
    assert(spark.read.parquet(clfAdmitted.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet === cIds)

    val verdicts = spark.read.parquet(out.toString)
      .select("doc_id", "verdict", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val norms = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        functions.TextFunctions.normText(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // one content verdict per classifier-admitted doc, none for
    // quality or classifier rejects
    assert(verdicts.map(_._1).toSet === cIds)
    assert(verdicts.length === cIds.size)

    val admitted = verdicts.filter(_._2 == "admitted").map(_._1)
    val dupExact = verdicts.filter(_._2 == "dup_exact")
    val nearDup = verdicts.filter(_._2 == "near_dup")
    val contaminated = verdicts.filter(_._2 == "contaminated").map(_._1).toSet

    // exact gate: admitted norms are unique; every dup_exact names an
    // earlier-id doc with the identical normalized text
    assert(admitted.map(norms).distinct.length === admitted.length)
    dupExact.foreach { case (d, _, dupOf) =>
      assert(dupOf.isDefined && dupOf.get < d)
      assert(norms(dupOf.get) === norms(d), s"dup_exact $d vs ${dupOf.get}")
    }

    // near-dup gate: every rejection signature-verifies against its
    // recorded owner under the stream's own hash family (recomputed
    // via the shared batch-mode band algebra)
    val sigs = MinhashStream.bandRows(
      Tables.load(spark, sf, "documents").select("doc_id", "text"))
      .collect().map(r => r.doc_id -> r.sig).groupBy(_._1)
      .view.mapValues(_.head._2).toMap
    nearDup.foreach { case (d, _, dupOf) =>
      assert(dupOf.isDefined && dupOf.get < d)
      val (a, b) = (sigs(d), sigs(dupOf.get))
      val m = a.zip(b).count { case (x, y) => x == y }
      assert(m * 2 >= operators.Dedup.MinhashSeeds,
        s"near_dup $d vs ${dupOf.get}: $m slots agree")
      assert(norms(d) !== norms(dupOf.get), "exact twin escaped the exact gate")
    }

    // contamination gate: stateless and deterministic — the verdict
    // set is exactly #84's flags restricted to non-dup quality-passers
    val bloomFlagged = Corpus.corpusDecontaminateBloom(spark, sf)
      .filter(col("flagged") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dupIds = (dupExact ++ nearDup).map(_._1).toSet
    assert(contaminated === (bloomFlagged & cIds) -- dupIds)

    // headline containment at the fingerprint level: every batch
    // pipeline survivor's normalized text is stream-admitted or
    // stream-near-dup-rejected (the #82-documented owner-verify
    // divergence), and no admitted doc is batch-flagged
    val s4Norms = frames.s4.select("norm").collect().map(_.getString(0)).toSet
    val streamKeptNorms =
      (admitted ++ nearDup.map(_._1)).map(norms).toSet
    s4Norms.foreach(n => assert(streamKeptNorms.contains(n),
      "a batch survivor fingerprint has no stream representative"))
    val flaggedNorms = bloomFlagged.map(norms)
    admitted.foreach(d => assert(!flaggedNorms.contains(norms(d)),
      s"admitted doc $d carries a contaminated fingerprint"))
  }

  test("cross-restart: second-increment exact twins all reject against first-drain owners") {
    val in = Files.createTempDirectory("graft_cur2_in")
    val out = Files.createTempDirectory("graft_cur2_out")
    val ckpt = Files.createTempDirectory("graft_cur2_ck")
    val bits = CurationStream.evalBloomBits(spark, sf)
    def drain(): Unit = {
      val q = CurationStream.admissionQuery(spark, in.toString, schema,
        ckpt.toString, out.toString, bits)
      assert(q.awaitTermination(120000))
    }
    trainDocs.coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val firstVerdicts = spark.read.parquet(out.toString).count()
    // increment 2: the same texts under shifted ids — every one is an
    // exact twin of a first-drain arrival, so the exact gate must
    // reject ALL of them against generation-1 owners; admitting any
    // proves bucket state was lost across the restart
    trainDocs.withColumn("doc_id", col("doc_id") + lit(1000000L))
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val second = spark.read.parquet(out.toString)
      .filter(col("doc_id") >= 1000000L)
    assert(second.count() === firstVerdicts)
    assert(second.filter(col("verdict") === "dup_exact").count()
      === firstVerdicts,
      "a shifted exact twin was not rejected by the exact gate")
    assert(second.filter(col("dup_of") >= 1000000L).count() === 0,
      "a twin's provenance points inside its own generation")
  }

  test("URL gate cross-restart: noise variants of seen pages reject against first-drain owners") {
    val in = Files.createTempDirectory("graft_url2_in")
    val urlOut = Files.createTempDirectory("graft_url2_out")
    val admitted = Files.createTempDirectory("graft_url2_adm")
    val ckpt = Files.createTempDirectory("graft_url2_ck")
    def drain(): Unit = {
      val q = CurationStream.urlAdmissionQuery(spark, in.toString, urlSchema,
        ckpt.toString, urlOut.toString, admitted.toString)
      assert(q.awaitTermination(120000))
    }
    trainDocsWithUrl.coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val gen1 = spark.read.parquet(urlOut.toString).count()
    // increment 2: every page recrawled as a NEW doc — the original
    // raw urls re-sent under shifted ids (same canonical form, fresh
    // doc identity, the pure recrawl case). Every one must reject
    // against the generation-1 bucket owner; admitting any proves the
    // URL seen-set was lost across the restart.
    trainDocsWithUrl
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val second = spark.read.parquet(urlOut.toString)
      .filter(col("doc_id") >= 1000000L)
    assert(second.count() === gen1)
    assert(second.filter(col("verdict") === "url_dup").count() === gen1,
      "a recrawled URL was not rejected after the restart")
    assert(second.filter(col("dup_of") >= 1000000L).count() === 0,
      "URL provenance points inside its own generation — state lost")
    // and the admitted handoff gained nothing in generation 2
    assert(spark.read.parquet(admitted.toString)
      .filter(col("doc_id") >= 1000000L).count() === 0)
  }
}
