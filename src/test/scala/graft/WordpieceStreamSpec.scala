package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** #192 streaming WordPiece admission: frozen-vocabulary semantics,
  * batch-replay exactness across a checkpoint restart, OOV and
  * fertility gates exercised, no length guard (long words march). */
class WordpieceStreamSpec extends SparkSpec {

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", "long").add("text", "string")

  test("stream replays #182's per-word piece counts exactly across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_wp_in")
    val out = Files.createTempDirectory("graft_wp_out")
    val ckpt = Files.createTempDirectory("graft_wp_ck")
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def feed(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(in.toString)
    def drain(): Unit = {
      val q = streaming.WordpieceStream.admitQuery(
        spark, in.toString, schema, sf, out.toString, ckpt.toString)
      assert(q.awaitTermination(120000))
    }
    // two drains across a checkpoint restart: frozen-vocabulary
    // verdicts cannot depend on arrival order
    val (first, second) = docs.partition(_._1 < 250)
    feed(first.toSeq); drain()
    feed(second.toSeq); drain()
    val got = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_oov_words"),
          r.getAs[Long]("pieces"), r.getAs[Int]("admitted")))).toMap
    // expected from the BATCH family: doc words joined to the
    // word-level greedy segmentation (#182)
    val seg = operators.Wordpiece.wordpieceTokens(spark, sf).collect()
      .map(r => r.getString(0) -> r.getInt(2).toLong).toMap
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

  test("OOV chars reject; long in-alphabet words march (no length guard)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_wp_in2")
    val out = Files.createTempDirectory("graft_wp_out2")
    val ckpt = Files.createTempDirectory("graft_wp_ck2")
    // 'a' IS in the corpus alphabet ('z' never occurs at spec scale —
    // it would be char-OOV, testing the wrong gate); the march must
    // complete, unlike #166's DP which guards on EncBase length
    val longWord = "a" * 1500
    Seq(
      // every word carries a character the [a-z0-9] corpus never saw:
      // the greedy march sticks, all words count OOV, the doc rejects
      (1L, "héllo wörld émigré naïve déjà vù écu über ñandu œuvre"),
      // long words segment fine — but at ~1500 pieces per word the
      // fertility gate rejects (char fallback is exactly the junk
      // signal fertility exists to read)
      (2L, s"$longWord $longWord $longWord $longWord"),
      // in-vocabulary doc: must be admitted
      (3L, "key agg row scan slow fast table value part hash")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(in.toString)
    val q = streaming.WordpieceStream.admitQuery(
      spark, in.toString, schema, sf, out.toString, ckpt.toString)
    assert(q.awaitTermination(120000))
    val rows = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_oov_words"),
          r.getAs[Long]("pieces"), r.getAs[Int]("admitted")))).toMap
    assert(rows(1L)._2 == rows(1L)._1 && rows(1L)._4 == 0, rows(1L).toString)
    // the long words marched (not OOV), produced >= 1 piece per char
    // group, and the fertility gate rejected the doc
    assert(rows(2L)._2 == 0L && rows(2L)._3 >= 4L && rows(2L)._4 == 0,
      rows(2L).toString)
    assert(rows(3L)._2 == 0L && rows(3L)._4 == 1, rows(3L).toString)
  }
}
