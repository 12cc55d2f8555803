package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized (seeded, reproducible) check of the AllPairs/PPJoin
  * prefix-filter guarantee: on corpora with Zipf-skewed vocabularies
  * and planted near-duplicates, the prefix-filtered J ≥ 0.8 pair set
  * must equal the undamped inverted-index join's — losslessness is a
  * theorem, so ANY divergence is a bug in the prefix length, the
  * global token order, or the length filter. */
class JaccardPropertySpec extends SparkSpec {

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String, String, String)] = {
    // Zipf-skewed vocabulary: low-index words are stopword-hot
    val vocab = (0 until 60).map(i => s"w$i")
    def word(): String = {
      val r = rnd.nextDouble()
      val idx = math.min((math.pow(vocab.size + 1.0, r) - 1).toInt, vocab.size - 1)
      vocab(idx)
    }
    val langs = Seq("en", "es")
    val sources = Seq("s1", "s2")
    val base = (0 until nDocs).map { i =>
      val words = Seq.fill(rnd.nextInt(30) + 5)(word())
      (i.toLong, langs(rnd.nextInt(2)), sources(rnd.nextInt(2)),
        words.mkString(" "))
    }
    // plant near-duplicates: copy an earlier doc, mutate ~10% of words
    val planted = (0 until nDocs / 5).map { k =>
      val (id0, lang, src, text) = base(rnd.nextInt(nDocs))
      val ws = text.split(" ").map(w =>
        if (rnd.nextDouble() < 0.1) word() else w)
      ((nDocs + k).toLong, lang, src, ws.mkString(" "))
    }
    // plant EXACT duplicates: guarantees the round-8 collapse-and-
    // expand path (groups > 1) is exercised against the brute force
    val copies = (0 until nDocs / 10).map { k =>
      val (_, lang, src, text) = base(rnd.nextInt(nDocs))
      ((nDocs + nDocs / 5 + k).toLong, lang, src, text)
    }
    base ++ planted ++ copies
  }

  test("prefix filtering is lossless on randomized Zipf corpora with planted near-dups") {
    import spark.implicits._
    val rnd = new Random(4242)
    for (round <- 1 to 3) {
      val corpus = randomCorpus(rnd, 50)
      val d = corpus.toDF("doc_id", "lang", "source", "norm")
      val t = d
        .select(col("doc_id"), col("lang"), col("source"),
          array_sort(array_distinct(split(col("norm"), " "))).as("toks"))
        .withColumn("nt", size(col("toks")))
        .select(col("doc_id"), col("lang"), col("source"), col("nt"),
          explode(col("toks")).as("tok"))
      val undamped = t.as("a")
        .join(t.as("b"),
          col("a.tok") === col("b.tok") &&
            col("a.lang") === col("b.lang") &&
            col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"),
          first(col("a.nt")).as("na"), first(col("b.nt")).as("nb"))
        .filter(lit(5) * col("shared") >= lit(4) * (col("na") + col("nb") - col("shared")))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val damped = operators.Dedup.dedupJaccardFrom(d)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(damped === undamped, s"round $round")
      // the planted copies guarantee the comparison is not vacuous
      assert(undamped.nonEmpty, s"round $round: no pairs generated")
    }
  }
}
