package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Disposable micro-timing harness for optimization-round experiments.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - s) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val L = 25
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.normText(col("text")).as("t"))
      .filter(length(col("t")) >= L)
    t("warm docs")(noop(docs))
    t("docs noop")(noop(docs))
    val reps = docs.repartition(nPart, col("t")).groupBy("t")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("gs"))
      .repartition(nPart, col("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("reps build+count")(println("reps=" + reps.count()))
    val wins = reps
      .select(col("rep"), col("gs"),
        explode(expr(s"sequence(1, length(t) - $L + 1)")).as("pos"),
        col("t"))
      .select(col("rep"), col("gs"), col("pos").cast("long").as("pos"),
        expr(s"substring(t, pos, $L)").as("win"))
    t("wins count")(println("wins=" + wins.count()))
    t("wins explode+substr noop")(noop(wins))
    t("wins hash only noop")(noop(
      wins.select(xxhash64(col("win")).as("wh"), col("rep"), col("gs"))))
    t("phaseA distinct+agg")(noop(
      wins.select(xxhash64(col("win")).as("wh"), col("rep"), col("gs"))
        .distinct()
        .groupBy("wh")
        .agg(count(lit(1)).as("ntexts"), max("gs").as("mgs"))
        .filter(col("ntexts") >= 2 || col("mgs") >= 2)
        .select("wh")))
    t("full query")(noop(
      graft.operators.Corpus.corpusExactSubstr(spark, dir)))
    spark.stop()
  }
}
