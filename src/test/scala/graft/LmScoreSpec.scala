package graft

import org.apache.spark.sql.functions._

/** #136 text_surprisal + #137 corpus_dsir invariants. Both pipelines
  * are pinned against an INDEPENDENT driver-side Scala recompute of
  * the fixed-point log2 scoring (plain loops over collected rows —
  * nothing shared with the Column/SQL formulation except the
  * mantissa-table definition), so a drift in either the log2fp
  * rendering or the plan algebra fails loudly here before the oracle
  * ever sees it. */
class LmScoreSpec extends SparkSpec {

  private val Q = functions.TextFunctions.LogQ
  private val table: IndexedSeq[Long] =
    (0 until Q).map(i => math.floor(
      Q * (StrictMath.log((Q + i).toDouble / Q) / StrictMath.log(2.0))).toLong)

  /** Independent log2fp: same definition, loop-and-Long arithmetic. */
  private def lg(x: Long): Long = {
    require(x >= 1, s"log2fp domain: $x")
    val qb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val mant = ((x * Q) / (1L << qb) - Q).toInt
    Q.toLong * qb + table(mant)
  }

  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  private def docToks(): Seq[(Long, String, Seq[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        norm(r.getString(2)).split(" ", -1).toSeq.filter(_.nonEmpty)))

  test("log2fp column kernel matches the independent Long recompute") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 1023L, 1024L, 1025L, 123456789L,
      (1L << 40) - 1, 1L << 40)
    val got = xs.toDF("x")
      .select(expr(functions.TextFunctions.log2fpExpr("x")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map(lg))
    // monotone across a dense range (quantization must never invert)
    val dense = (1L to 5000L).toDF("x")
      .select(expr(functions.TextFunctions.log2fpExpr("x")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(dense.zip(dense.tail).forall { case (a, b) => a <= b })
  }

  test("text_surprisal equals the driver-side unigram-LM recompute") {
    val toks = docToks()
    val vocab = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = vocab.values.sum
    val out = functions.TextFunctions.surprisal(spark, sf).collect()
    assert(out.length === toks.count(_._3.nonEmpty))
    val expected = toks.filter(_._3.nonEmpty).map { case (id, _, ts) =>
      id -> ts.map(t => lg(n) - lg(vocab(t))).sum
    }.toMap
    out.foreach { r =>
      val (id, nt, bits, mean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(bits === expected(id), s"doc $id")
      assert(mean === bits.toDouble / (nt * Q))
    }
  }

  test("corpus_dsir weights match the recompute; selection is the exact top decile") {
    val B = operators.Corpus.DsirBuckets
    val toks = docToks()
    def hash(s: String): Long = {
      var acc = 0L
      s.foreach(ch => acc = (acc * 131 + ch.toLong) % 1000000007L)
      acc % B
    }
    val feats = toks.flatMap { case (_, lang, ts) => ts.map(t => (hash(t), lang)) }
    val cr = feats.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = feats.filter(_._2 == "en").groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nr = cr.values.sum
    val nt = ct.values.sum
    val expected = toks.filter(_._3.nonEmpty).map { case (id, _, ts) =>
      id -> ts.map { t =>
        val f = hash(t)
        (lg(ct.getOrElse(f, 0L) + 1) - lg(nt + B)) -
          (lg(cr(f) + 1) - lg(nr + B))
      }.sum
    }.toMap
    val out = operators.Corpus.corpusDsir(spark, sf).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      assert(r.getLong(3) === expected(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // the selected set is exactly the top ceil(ndocs/10) by (w desc, id)
    val k = (500 + operators.Corpus.DsirKeepDen - 1) / operators.Corpus.DsirKeepDen
    val ranked = out.sortBy(r => (-r.getLong(3), r.getLong(0)))
    assert(ranked.take(k.toInt).forall(_.getInt(4) == 1))
    assert(ranked.drop(k.toInt).forall(_.getInt(4) == 0))
    assert(out.map(_.getInt(4).toLong).sum === k)
  }

  test("corpus_ccnet_buckets is the exact per-lang surprisal tercile split") {
    val out = operators.Corpus.corpusCcnetBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getString(5)))
    out.groupBy(_._2).foreach { case (lang, rows) =>
      // independent NTILE: sort by (mean_bits, doc_id), first n mod 3
      // terciles get the extra row
      val sorted = rows.sortBy(r => (r._3, r._1))
      val n = sorted.length
      val (q, rem) = (n / 3, n % 3)
      val expected = Seq("head", "middle", "tail").zipWithIndex.flatMap {
        case (b, i) => Seq.fill(q + (if (i < rem) 1 else 0))(b)
      }
      assert(sorted.map(_._4).toSeq === expected, s"lang $lang")
      // bucket sizes differ by at most one
      val sizes = sorted.groupBy(_._4).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"lang $lang sizes $sizes")
    }
  }
}
