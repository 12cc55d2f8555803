package graft.tools

import graft.GraftSession
import graft.operators.{MediaHash, MediaPipeline, Multimodal}
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

    // warmup whole query once
    t("warm media_pipeline")(noop(MediaPipeline.mediaPipeline(spark, dir)))

    val g = t("pin gAssets")(graft.Checkpoints.pin(MediaHash.gAssets(spark, dir)))
    val ah = t("pin ahashKernel")(graft.Checkpoints.pin(MediaHash.ahashKernel(g)))
    val gh = t("pin ghashKernel")(graft.Checkpoints.pin(MediaHash.ghashKernel(g)))
    val ap = MediaHash.dedupFromHashes(ah).select("doc_a", "doc_b")
    val gp = MediaHash.dedupFromHashes(gh).select("doc_a", "doc_b")
    t("aPairs noop")(noop(ap))
    t("gPairs noop")(noop(gp))
    val pairs = ap.unionByName(gp).distinct()
    t("union distinct noop")(noop(pairs))
    val keep = MediaHash.clustersFromPairs(g, pairs)
      .filter(col("is_canonical") === 1).select("doc_id", "n_members")
    t("clusters+keep noop")(noop(keep))
    val s1 = t("pin s1")(graft.Checkpoints.pin(g.join(keep, Seq("doc_id"))))
    val media = s1.select(col("doc_id"), lit("image").as("kind"),
      unhex(concat(lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
        lpad(hex((col("doc_id") * MediaPipeline.WMul % 1920 + 32).cast("int")), 8, "0"),
        lpad(hex((col("doc_id") * MediaPipeline.HMul % 1080 + 32).cast("int")), 8, "0"),
        lit("0806000000"))).as("bytes")).as[Multimodal.MediaRow]
    val dims = Multimodal.decode(media).toDF()
      .select(col("doc_id"), col("width"), col("height"))
    t("decode dims noop")(noop(dims))
    t("full media_pipeline")(noop(MediaPipeline.mediaPipeline(spark, dir)))
    spark.stop()
  }
}
