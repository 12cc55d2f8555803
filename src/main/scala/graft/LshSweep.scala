package graft

/** Diagnostic main: sweep dedup_embedding_lsh (planes, radius) configs,
  * reporting recall vs the exact all-pairs result and candidate-stage
  * cost, to pick the bucket/probe operating point empirically.
  *
  *   sbt "runMain graft.LshSweep [recallDir] [timeDir]"
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val recallDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val timeDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val exact = operators.Dedup.dedupEmbedding(spark, recallDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val configs = Seq((4, 2), (6, 2), (6, 3), (8, 3), (10, 3))
    configs.foreach { case (p, r) =>
      val lsh = operators.Dedup.dedupEmbeddingLsh(spark, recallDir, p, r)
        .select("vec_a", "vec_b").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      val recall = (exact & lsh).size.toDouble / exact.size
      // timed pass at the bench SF (one warmup + one timed)
      def pass(): Double = {
        val t0 = System.nanoTime()
        operators.Dedup.dedupEmbeddingLsh(spark, timeDir, p, r)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      val secs = Seq(pass(), pass()).min
      println(f"[sweep] planes=$p radius=$r recall=$recall%.3f time=$secs%.2f s")
    }
    spark.stop()
  }
}
