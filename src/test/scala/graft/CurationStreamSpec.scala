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

  private def trainDocs = Tables.load(spark, sf, "documents")
    .filter(col("doc_id") % Corpus.BenchmarkMod =!= 0)
    .select("doc_id", "text")

  test("single increment: verdicts partition the quality gate and every gate matches its batch twin") {
    val in = Files.createTempDirectory("graft_cur_in")
    val out = Files.createTempDirectory("graft_cur_out")
    val ckpt = Files.createTempDirectory("graft_cur_ck")
    trainDocs.coalesce(1).write.mode("append").parquet(in.toString)
    val bits = CurationStream.evalBloomBits(spark, sf)
    val q = CurationStream.admissionQuery(spark, in.toString, schema,
      ckpt.toString, out.toString, bits)
    assert(q.awaitTermination(120000))
    val verdicts = spark.read.parquet(out.toString)
      .select("doc_id", "verdict", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq

    val frames = Corpus.pipelineFrames(spark, sf)
    val norms = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        functions.TextFunctions.normText(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // one verdict per quality-passing doc, none for quality rejects
    val qIds = frames.q.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(verdicts.map(_._1).toSet === qIds)
    assert(verdicts.length === qIds.size)

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
    assert(contaminated === (bloomFlagged & qIds) -- dupIds)

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
}
