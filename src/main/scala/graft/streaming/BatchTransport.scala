package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** One spool record inside a put batch — the unit of partial failure
  * in the PutRecordBatch contract (reference spool.py:150-211). */
case class ShipRecord(source: String, partId: String, partBytes: Long)

/** Per-record outcome of one shipped batch. */
case class ShipStatus(dest: String, batch_id: Long, part_id: String,
                      part_bytes: Long, ok: Boolean)

/** Pluggable transport behind the streaming Firehose drain
  * ([[SpoolDrainStream.shipQuery]]) — the seam where the reference
  * calls boto3 `put_record_batch` (spool.py:150-211). A public-
  * knowledge Spark library cannot ship to AWS, so the drain exposes
  * the contract instead: implementations ship one packed batch and
  * report per-record success, and the drain re-enters the failed
  * records into the next packing pass (the #53 retry path).
  *
  * Contract:
  *  - `ship` runs on EXECUTORS (inside the micro-batch plan), so
  *    implementations must be Serializable and must not capture a
  *    SparkSession.
  *  - Return flags align 1:1 with `records` (same order).
  *  - Replays happen: Structured Streaming may re-run a micro-batch
  *    after a crash, and Spark may retry a task. `attempt` is stable
  *    across replays of the same micro-batch and distinct across
  *    queries/micro-batches (the drain derives it from its checkpoint
  *    identity + micro-batch id): implementations must be idempotent
  *    per (dest, attempt, batchId) — e.g. overwrite a deterministic
  *    object name rather than append.
  */
trait BatchTransport extends Serializable {
  def ship(dest: String, batchId: Long, attempt: String,
           records: Seq[ShipRecord]): Seq[Boolean]
}

object BatchTransport {
  /** Retry-generation name grammar: `name.gz` → `retry1-name.gz` →
    * `retry2-name.gz` … The generation rides at the FRONT of the
    * name because the spool source's checkpointed watermark is a
    * lexicographic file-name high-water mark (SpoolSource.scala NAME
    * mode): retries land in a SEPARATE retry spool, and gen-major
    * names keep that spool name-ordered across generations (every
    * `retry2-*` sorts above every `retry1-*`), so a later generation
    * can never slide under the retry drain's watermark. Single-digit
    * generations only — `retry10-` would sort below `retry2-` and
    * violate the ordering the watermark depends on. */
  val MaxRetryGenerations = 9
  private val RetryName = """^retry(\d)-(.*)\.gz$""".r

  /** (base name without .gz, retry generation) of a spool file name. */
  def parseRetry(name: String): (String, Int) = name match {
    case RetryName(gen, base) => (base, gen.toInt)
    case _ => (name.stripSuffix(".gz"), 0)
  }

  def retryName(name: String): String = {
    val (base, gen) = parseRetry(name)
    require(gen + 1 <= MaxRetryGenerations,
      s"retry generation ${gen + 1} exceeds $MaxRetryGenerations for $name")
    s"retry${gen + 1}-$base.gz"
  }
}

/** Reference transport: "delivery" is one manifest file per batch in
  * `outDir`, listing the part_ids it accepted — enough to audit
  * exactly-once delivery in a spec, and the shape a real
  * implementation (HTTP endpoint, cloud SDK) would take.
  *
  * `failOnce` lists part_ids to reject (the deterministic stand-in
  * for Firehose partial failures); their `retryN-` reincarnations
  * don't match and succeed, exercising the full re-drive loop.
  * Writing overwrites a name derived from (dest, attempt, batchId),
  * so replays are idempotent per the trait contract. */
class FilesystemTransport(outDir: String, failOnce: Set[String] = Set.empty)
    extends BatchTransport {
  override def ship(dest: String, batchId: Long, attempt: String,
                    records: Seq[ShipRecord]): Seq[Boolean] = {
    val ok = records.map(r => !failOnce.contains(r.partId))
    new File(outDir).mkdirs()
    val name = dest.replaceAll("[^A-Za-z0-9._-]", "_") +
      s"-$attempt-b$batchId.txt"
    val accepted = records.zip(ok).collect { case (r, true) => r.partId }
    Files.write(Paths.get(outDir, name),
      accepted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ok
  }
}
