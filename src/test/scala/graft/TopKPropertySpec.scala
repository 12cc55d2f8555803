package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized (seeded, reproducible) check of the TopKPerKey physical
  * operator: for arbitrary key/value distributions, partition layouts
  * and k, the partial-heap → exchange → final-merge pipeline must
  * agree row-for-row with a plain sort-and-take reference. Exercises
  * skew (Zipf-ish keys), duplicate ordering values broken by a
  * tiebreaker column, k larger than some groups, and k = 1. */
class TopKPropertySpec extends SparkSpec {

  test("TopKPerKey matches sort-and-take on random skewed inputs") {
    import spark.implicits._
    val rnd = new Random(4242)
    for (round <- 1 to 4) {
      val k = Seq(1, 3, 7, 25)(round - 1)
      val nKeys = rnd.nextInt(20) + 3
      val rows = (0 until rnd.nextInt(4000) + 500).map { i =>
        // Zipf-ish: low key ids are hot
        val key = s"k${(math.sqrt(rnd.nextInt(nKeys * nKeys)).toInt)}"
        // small value range forces ties; unique i is the tiebreaker
        (key, rnd.nextInt(50).toLong, i.toLong)
      }
      val df = rows.toDF("key", "v", "tie")
        .repartition(rnd.nextInt(7) + 2)
      val got = plans.TopKPerKey.topK(df,
        Seq(col("key")), Seq(col("v").desc, col("tie")), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, -t._2, t._3))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(t => (-t._2, t._3)).take(k)
      }.sortBy(t => (t._1, -t._2, t._3))
      assert(got.toSeq === want, s"round $round k=$k")
    }
  }
}
