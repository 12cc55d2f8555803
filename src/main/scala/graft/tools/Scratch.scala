package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Disposable micro-timing harness for optimization-round experiments.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - s) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val srcIdSql =
      s"CASE WHEN doc_id % ${graft.operators.MediaHash.TwinMod} = " +
      s"${graft.operators.MediaHash.TwinRes} THEN doc_id - 1 ELSE doc_id END"
    def assetsShipped = graft.operators.MediaHash.assets(spark, dir)

    // variant: spread the SLIM pre-join side by src_id, so the join
    // output is already wide and the kernel needs no byte re-shuffle
    def assetsSpread = {
      val d = Tables.load(spark, dir, "documents")
      val b2 = d.select(col("doc_id"),
          expr(srcIdSql).as("src_id"),
          (col("doc_id") % graft.operators.MediaHash.TwinMod ===
            graft.operators.MediaHash.TwinRes).as("is_twin"))
        .repartition(spark.sparkContext.defaultParallelism, col("src_id"))
      b2.join(d.select(col("doc_id").as("src_id"), col("text")), Seq("src_id"))
        .select(col("doc_id"),
          when(col("is_twin"), concat(col("text"), lit("x")))
            .otherwise(col("text")).as("content"))
    }

    def kernelNoRepart(assets: org.apache.spark.sql.DataFrame) = {
      assets
        .select(col("doc_id"), col("content").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val bands = graft.operators.MediaHash.ahashBands(bytes)
            (id, bands(0), bands(1), bands(2), bands(3))
          }
        }.toDF("doc_id", "b0", "b1", "b2", "b3")
    }

    def kernelShipped(assets: org.apache.spark.sql.DataFrame) =
      graft.operators.MediaHash.ahashKernel(assets)

    // warmups
    noop(kernelShipped(assetsShipped)); noop(kernelNoRepart(assetsSpread))
    for (p <- 1 to 3) {
      t(s"A shipped  kernel(repart)+assets pass$p")(noop(kernelShipped(assetsShipped)))
      t(s"B spread   kernel(norepart)+assetsSpread pass$p")(noop(kernelNoRepart(assetsSpread)))
      t(s"C norepart kernel(norepart)+assetsShipped pass$p")(noop(kernelNoRepart(assetsShipped)))
    }
    // sanity: equal hashes
    val a = kernelShipped(assetsShipped); val b = kernelNoRepart(assetsSpread)
    println(s"[scratch] diff=${a.exceptAll(b).count()} + ${b.exceptAll(a).count()} (want 0+0)")
    spark.stop()
  }
}
