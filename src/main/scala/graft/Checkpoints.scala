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
  *    directory — files survive executor loss. The frame is cached
  *    around the checkpoint so the materializing action and the
  *    checkpoint-write job compute it once, not twice; the cache is
  *    dropped as soon as the checkpoint files hold the data.
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
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The spark.graft.checkpoint.dir value this object last applied to
    * the context (setCheckpointDir nests a UUID subdir under it, so
    * the raw context value can't be string-compared to the conf). */
  private var appliedDir: Option[String] = None

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir is first-writer-wins on a bare context; if
        // some other component already pointed the context elsewhere
        // (or the graft conf changed mid-session), honor the graft
        // conf loudly rather than silently pinning into the old dir.
        Checkpoints.synchronized {
          if (!appliedDir.contains(dir)) {
            val current = spark.sparkContext.getCheckpointDir
            if (current.isDefined)
              log.warn(s"graft: context checkpoint dir ${current.get} does " +
                s"not come from spark.graft.checkpoint.dir=$dir; overriding " +
                "so pins land in the configured directory")
            spark.sparkContext.setCheckpointDir(dir)
            appliedDir = Some(dir)
          }
        }
        // Eager checkpoint() otherwise computes the frame twice (the
        // materializing action plus the checkpoint-write job). Cache
        // first so the second pass reads blocks, then release the
        // cache once the checkpoint files hold the data.
        df.persist()
        try df.checkpoint()
        finally df.unpersist(blocking = false)
      case None => df.localCheckpoint()
    }
  }
}
