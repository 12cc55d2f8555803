package graft

import org.apache.spark.sql.functions._

/** PII scrubbing (#46) and repetition scoring (#47) invariants; the
  * DuckDB oracle checks both end-to-end over synthesized inputs. */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("pii_scrub redacts every injected email/phone/ip") {
    val out = operators.Scrub.piiScrub(spark, sf)
    assert(out.filter(col("n_emails") < 1).count() === 0)
    assert(out.filter(col("n_phones") < 1).count() === 0)
    assert(out.filter(col("n_ips") < 1).count() === 0)
    // nothing PII-shaped survives in the scrubbed text
    assert(out.filter(col("scrubbed").rlike(operators.Scrub.EmailRe)).count() === 0)
    assert(out.filter(col("scrubbed").rlike(operators.Scrub.PhoneRe)).count() === 0)
    assert(out.filter(col("scrubbed").rlike(operators.Scrub.Ipv4Re)).count() === 0)
    assert(out.filter(!col("scrubbed").contains("<EMAIL>")).count() === 0)
  }

  test("mixed-case emails and bare phone numbers are redacted") {
    val r = Seq((1L, "Contact John.Doe@Example.COM or 555-867-5309 now"))
      .toDF("doc_id", "text")
    val scrubbed = r.select(
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), operators.Scrub.EmailRe, "<EMAIL>"),
          operators.Scrub.PhoneRe, "<PHONE>"),
        operators.Scrub.Ipv4Re, "<IP>").as("s"))
      .collect().head.getString(0)
    assert(scrubbed === "Contact <EMAIL> or <PHONE> now")
  }

  test("pii_scrub leaves clean text untouched") {
    val r = Seq((1L, "no personal info here at all"))
      .toDF("doc_id", "text")
    val scrubbed = r.select(
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), operators.Scrub.EmailRe, "<EMAIL>"),
          operators.Scrub.PhoneRe, "<PHONE>"),
        operators.Scrub.Ipv4Re, "<IP>").as("s"))
      .collect().head.getString(0)
    assert(scrubbed === "no personal info here at all")
  }

  test("repetition: hand-computed ratios") {
    val out = operators.Scrub.repetition(spark, sf)
      .filter(col("n_words") > 0).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWords, nDistinct, maxFreq) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(nDistinct <= nWords && maxFreq <= nWords && maxFreq >= 1)
      assert(r.getDouble(4) === maxFreq.toDouble / nWords)
      assert(r.getInt(5) === (if (maxFreq * 5 > nWords) 1 else 0))
    }
  }

  test("gopher rules: each rule trips on its crafted counter-example") {
    // 5 + 11×4 + 1 = 50 words, mean word length 4.4, two common words
    val goodDoc = (Seq("the", "cat", "sat", "with", "food") ++
      Seq.fill(11)(Seq("some", "words", "keep", "ratio")).flatten ++
      Seq("extra")).mkString(" ")
    val crafted = Seq(
      1L -> goodDoc, // passes everything
      2L -> "the cat sat with us", // too short
      3L -> (Seq("the", "of") ++ Seq.fill(58)("a")).mkString(" "), // mean word len < 3
      4L -> (Seq("the", "of") ++ Seq.fill(58)("12345")).mkString(" "), // alpha fraction
      5L -> (Seq("the", "of") ++ Seq.fill(50)("word") ++ Seq.fill(8)("#")).mkString(" "), // symbols
      6L -> (Seq.fill(20)("- the item of note").mkString("\n")), // all bullet lines
      7L -> Seq.fill(60)("zork").mkString(" ")) // no common words
    val out = operators.Scrub.gopherRulesOn(
      crafted.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): (Int, Int, Int, Int, Int, Int, Int) = {
      val r = out(id)
      (r.getInt(r.fieldIndex("r_word_count")),
        r.getInt(r.fieldIndex("r_mean_word_len")),
        r.getInt(r.fieldIndex("r_alpha")),
        r.getInt(r.fieldIndex("r_symbol")),
        r.getInt(r.fieldIndex("r_lines")),
        r.getInt(r.fieldIndex("r_common_words")),
        r.getInt(r.fieldIndex("gopher_ok")))
    }
    assert(flags(1L) === ((1, 1, 1, 1, 1, 1, 1)))
    assert(flags(2L)._1 === 0)
    assert(flags(3L)._2 === 0)
    assert(flags(4L)._3 === 0)
    assert(flags(5L)._4 === 0)
    assert(flags(6L)._5 === 0)
    assert(flags(7L)._6 === 0)
    Seq(2L, 3L, 4L, 5L, 6L, 7L).foreach(id => assert(flags(id)._7 === 0))
  }
}
