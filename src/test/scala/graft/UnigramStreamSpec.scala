package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** #166 streaming fertility-gated admission: frozen-model semantics,
  * batch-replay exactness, OOV/long-word handling, both admission
  * gates exercised. */
class UnigramStreamSpec extends SparkSpec {

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", "long").add("text", "string")

  test("stream replays the batch family's per-doc piece counts exactly") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_uni_in")
    val out = Files.createTempDirectory("graft_uni_out")
    val ckpt = Files.createTempDirectory("graft_uni_ck")
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def feed(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
    def drain(): Unit = {
      val q = streaming.UnigramStream.admitQuery(
        spark, in.toString, schema, sf, out.toString, ckpt.toString)
      assert(q.awaitTermination(120000))
    }
    // two drains across a checkpoint restart: frozen-model verdicts
    // cannot depend on arrival order
    val (first, second) = docs.partition(_._1 < 250)
    feed(first.toSeq); drain()
    feed(second.toSeq); drain()
    val got = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_oov_words"),
          r.getAs[Long]("pieces"), r.getAs[Int]("admitted")))).toMap
    // expected from the BATCH family: doc words joined to the
    // word-level segmentation (#163)
    val seg = operators.Unigram.unigramTokens(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val expected = docs.map { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> ((ws.length.toLong, 0L, ws.map(seg).sum))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, (nw, oov, pieces)) =>
      val g = got(id)
      assert(g._1 == nw && g._2 == oov && g._3 == pieces, s"doc $id")
      // the training corpus itself must pass its own gates
      assert(g._4 == 1, s"doc $id rejected on its own training corpus")
    }
  }

  test("OOV chars, over-length words, and fertility gate all reject") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_uni_in2")
    val out = Files.createTempDirectory("graft_uni_out2")
    val ckpt = Files.createTempDirectory("graft_uni_ck2")
    val longWord = "z" * 1500 // over EncBase: unsegmentable by the guard
    Seq(
      // all words carry a character the [a-z0-9] corpus never saw
      (1L, "héllo wörld émigré naïve déjà vù écu über ñandu œuvre"),
      (2L, s"$longWord $longWord $longWord $longWord"),
      // in-vocabulary doc: must be admitted
      (3L, "key agg row scan slow fast table value part hash")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(in.toString)
    val q = streaming.UnigramStream.admitQuery(
      spark, in.toString, schema, sf, out.toString, ckpt.toString)
    assert(q.awaitTermination(120000))
    val rows = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_oov_words"),
          r.getAs[Int]("admitted")))).toMap
    assert(rows(1L)._2 == rows(1L)._1 && rows(1L)._3 == 0, rows(1L).toString)
    assert(rows(2L)._2 == 4L && rows(2L)._3 == 0, rows(2L).toString)
    assert(rows(3L)._2 == 0L && rows(3L)._3 == 1, rows(3L).toString)
  }
}
