package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** #184 streaming classifier admission: frozen-model verdicts replay
  * the batch scorer exactly, unseen tokens ride the smoothing path,
  * and the checkpoint survives a restart. */
class ClassifierStreamSpec extends SparkSpec {

  test("streaming NB admission replays batch scores; OOV sums zero weight") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cls_in")
    val out = Files.createTempDirectory("graft_cls_out")
    val ckpt = Files.createTempDirectory("graft_cls_ck")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string").add("source", "string")
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    def feed(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.mode("append").parquet(in.toString)
    def drain(): Unit = {
      val q = streaming.ClassifierStream.scoreQuery(
        spark, in.toString, schema, sf, out.toString, ckpt.toString)
      assert(q.awaitTermination(120000))
    }
    // replay the training corpus across two drains (checkpoint
    // restart): every eval-split doc's frozen-model verdict must equal
    // the batch #177 scorer's
    val (first, second) = docs.partition(_._1 < 250)
    feed(first.toSeq); drain()
    feed(second.toSeq); drain()
    val got = spark.read.parquet(out.toString)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4)))).toMap
    assert(got.size == docs.length) // one verdict per doc, none dropped
    val batch = operators.Classifier.classifierScore(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    batch.foreach { case (id, (nToks, score, pred)) =>
      val (gn, gs, gp, adm) = got(id)
      assert((gn, gs, gp) == ((nToks, score, pred)), s"doc $id")
      assert(adm == (if (score > 0) 1 else 0))
    }
    // the stream covers MORE than the eval split: train docs are
    // scored too (the batch query holds them out for honesty, the
    // admission gate sees everything)
    assert(got.size > batch.size)
    // OOV drop: base tokens unseen in training sum zero weight, so the
    // score is the pure markers + constants algebra — recompute it
    // independently. doc_id 1000005 % 4 markers come from its own
    // class per the 80/20 residues; source src3 → crawl.
    val oovId = 1000005L
    feed(Seq((oovId, "zzzzz qqqqq", "src3"))); drain()
    val w = operators.Classifier.model(spark, sf)
      .select("tok", "w_fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cst = operators.Classifier.constants(spark, sf).head()
    val (dd, pd) = (cst.getLong(0), cst.getLong(1))
    val hi = operators.Classifier.HiLexicon
    val lo = operators.Classifier.LoLexicon
    val markers = (0 until operators.Classifier.MarkersPerDoc).map { k =>
      val own = (oovId * 7 + 13 * k) % 10 < 8
      val isCur = false // src3 → crawl
      val useHi = if (own) isCur else !isCur
      val idx = ((oovId + k) % 4).toInt
      if (useHi) hi(idx) else lo(idx)
    }
    val expToks = 2 + markers.size
    val expScore = markers.map(m => w.getOrElse(m, 0L)).sum -
      expToks * dd + pd // the two OOV base tokens contribute 0
    val oov = spark.read.parquet(out.toString)
      .filter(col("doc_id") === oovId).collect().head
    assert(oov.getLong(1) == expToks.toLong)
    assert(oov.getLong(2) == expScore)
  }
}
