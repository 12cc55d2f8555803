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
}
