package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization point for iterative / multi-
  * consumer plans (connected components, chained global ranks).
  *
  * `localCheckpoint()` stores blocks unreplicated on executors: fine
  * in local mode and on static clusters, but with dynamic allocation
  * or spot nodes an executor loss makes the truncated lineage
  * unrecoverable and fails the whole job. So the materialization
  * strategy is a deployment decision, not a code one:
  *
  *  - `spark.graft.checkpoint.dir` set (a cluster running over
  *    HDFS/object storage): reliable `checkpoint()` into that
  *    directory — files survive executor loss; the one-time extra
  *    recompute per pin is the durability price.
  *  - unset (local mode, the oracle/bench gate): `localCheckpoint()`,
  *    which is both faster and leaves nothing to clean up.
  *
  * Both are EAGER: callers rely on pin-time materialization so later
  * consumers (range-boundary sampling, star rounds) read fixed blocks
  * rather than re-executing a growing plan.
  *
  * Cleanup note for the reliable path: Spark does not delete
  * checkpoint files when the frame goes out of scope unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set at
  * context creation — iterative callers (connected components pins a
  * frame per round) should set it, or point the dir at
  * storage with a TTL/lifecycle rule; otherwise rounds accumulate
  * until the application exits.
  */
object Checkpoints {
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
