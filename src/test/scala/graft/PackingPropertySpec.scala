package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized (seeded, reproducible) check of the greedy batch-packing
  * fold: the SQL `aggregate` expression that assigns spool records to
  * Firehose batches must agree record-for-record with a plain Scala
  * reference implementation of the same drain loop (spool.py:163-186
  * semantics: pack in drain order, open a new batch when either the
  * count cap is hit or the next record would exceed the size cap;
  * a single oversize record still ships alone). */
class PackingPropertySpec extends SparkSpec {

  /** Reference greedy packer over records already in drain order. */
  private def greedy(bytes: Seq[Long], maxCount: Int, maxSize: Long): Seq[Long] = {
    var batch = 0L
    var c = 0
    var s = 0L
    bytes.map { b =>
      if (c > 0 && (c >= maxCount || s + b > maxSize)) {
        batch += 1; c = 1; s = b
      } else {
        c += 1; s += b
      }
      batch
    }
  }

  test("SQL packing fold matches the reference greedy loop on random spools") {
    import spark.implicits._
    val rnd = new Random(1234)
    for (round <- 1 to 3) {
      val maxCount = rnd.nextInt(6) + 2
      val maxSize = (rnd.nextInt(900) + 100).toLong
      val recs = for {
        dest <- Seq(514, 601, 6514)
        i <- 0 until rnd.nextInt(40) + 10
      } yield {
        // occasional single oversize record (must ship alone)
        val b = if (rnd.nextInt(20) == 0) maxSize + rnd.nextInt(200) + 1
                else rnd.nextInt(300).toLong + 1
        (s"10.0.0.${rnd.nextInt(20)}", dest, i.toLong, b, i.toLong)
      }
      val df = recs.toDF("source", "dest", "part_id", "part_bytes", "first_event")
      val got = operators.Envelope.packRecords(df, maxCount, maxSize)
        .select("dest", "source", "part_id", "batch_id")
        .collect()
        .map(r => ((r.getInt(0), r.getString(1), r.getLong(2)), r.getLong(3)))
        .toMap
      // drain order within a dest is (source, part_id, bytes, first_event)
      // ascending — mirror the operator's array_sort over the struct
      recs.groupBy(_._2).foreach { case (dest, rs) =>
        val ordered = rs.sortBy(r => (r._1, r._3, r._4, r._5))
        val want = greedy(ordered.map(_._4), maxCount, maxSize)
        ordered.zip(want).foreach { case (r, wantBatch) =>
          assert(got((dest, r._1, r._3)) === wantBatch,
            s"round $round dest $dest record ${(r._1, r._3)}")
        }
      }
    }
  }

  test("corpus_pack fold matches the reference greedy loop on random corpora") {
    import spark.implicits._
    val rnd = new Random(5678)
    for (round <- 1 to 3) {
      val cap = (rnd.nextInt(400) + 50).toLong
      val docs = for {
        src <- Seq("a", "b", "c")
        i <- 0 until rnd.nextInt(60) + 5
      } yield {
        // text with a known whitespace-token count (oversize possible)
        val nTok = if (rnd.nextInt(15) == 0) cap.toInt + rnd.nextInt(50) + 1
                   else rnd.nextInt(80) + 1
        (i.toLong * 3 + Seq("a", "b", "c").indexOf(src), src,
          Seq.fill(nTok)("w").mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-pack-prop").toString
      docs.toDF("doc_id", "source", "text")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = operators.Corpus.corpusPack(spark, dir, cap)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      docs.groupBy(_._2).foreach { case (src, ds) =>
        val ordered = ds.sortBy(_._1)
        val toks = ordered.map(_._3.split(" ").length.toLong)
        // corpus_pack has no count cap: reuse greedy with maxCount = ∞
        val bins = greedy(toks, Int.MaxValue, cap)
        val expected = bins.zip(toks).groupBy(_._1)
          .map { case (b, xs) => (src, b) -> (xs.length.toLong, xs.map(_._2).sum) }
        expected.foreach { case (k, v) =>
          assert(out(k) === v, s"round $round bin $k")
        }
      }
    }
  }
}
