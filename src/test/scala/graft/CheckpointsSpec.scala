package graft

import org.apache.spark.sql.functions.sum

/** [[Checkpoints.pin]] is the deployment switch between local-mode
  * localCheckpoint and cluster-durable reliable checkpoint (ADVICE:
  * unreplicated localCheckpoint blocks die with their executor under
  * dynamic allocation / spot loss). */
class CheckpointsSpec extends SparkSpec {

  private def filesUnder(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(filesUnder)
  }

  test("pin writes reliable checkpoint files when spark.graft.checkpoint.dir is set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set("spark.graft.checkpoint.dir", dir.getAbsolutePath)
    try {
      val pinned = Checkpoints.pin((1 to 100).toDF("x").selectExpr("x * 2 AS y"))
      assert(pinned.agg(sum("y")).head.getLong(0) === 10100L)
      // durability evidence: checkpoint data landed on the (shared) fs
      assert(filesUnder(dir).nonEmpty, s"no checkpoint files under $dir")
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }

  test("pin falls back to localCheckpoint when the conf is unset") {
    import spark.implicits._
    val pinned = Checkpoints.pin((1 to 10).toDF("x"))
    assert(pinned.count() === 10L)
  }
}
