package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, GZIPOutputStream}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DataSourceV2 writer for the spool directory format — the SINK
  * direction of `graft-spool`:
  *
  *   df.write.format("graft-spool").mode("append").save(dir)
  *
  * Input schema is the event-level view (the same columns the reader
  * emits, minus `src_file`): (owner, log_group, log_stream,
  * message_type, subscription_filters?, id, message, timestamp).
  * Each writer task re-implements the reference sink's flush rule
  * (sink.py:148-217): events buffer per (log_group, log_stream)
  * header and a CloudWatch record file is flushed whenever the
  * accumulated UTF-8 JSON — record envelope included — would exceed
  * the record cap (`maxRecordBytes` option, default the Firehose
  * per-record limit MAX_RECORD_SIZE = 1,024,000, reference
  * constant.py) — so no spool file ever outgrows the Firehose record
  * limit, no matter how hot a stream is.
  *
  * Scale: writers are per-task (no driver funnel); a task's state is
  * bounded by (#headers in its partition × record cap). Partition the
  * frame by (log_group, log_stream) upstream to get one writer per
  * stream and per-stream file locality. Files are written to a
  * dot-prefixed temp name and RENAMED into their final task-unique
  * name (`part-{pid}-{tid}-{seq}.gz`) on close, so a concurrently
  * tailing drain never lists a partial gzip; speculative duplicates
  * cannot collide; abort() removes the task's published files (an
  * unrenamed temp from a hard crash is invisible to readers — the
  * listing filters on the `.gz` suffix).
  */
class SpoolWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new SpoolWrite(path, info.schema(),
    Option(info.options.get("maxRecordBytes")).map(_.toLong)
      .getOrElse(graft.Constants.MaxRecordSize.toLong),
    SerializableHadoopConf.fromSession())
}

class SpoolWrite(path: String, schema: StructType, maxRecordBytes: Long,
                 conf: SerializableHadoopConf)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  SpoolWrite.requireWritable(schema)
  /** Max epoch seal known present in the dir; None until the first
    * streaming commit lists the directory (see commit's Scaladoc).
    * Driver-only state — StreamingWrite commits run serially there. */
  private var sealHighWater: Option[Long] = None
  // both parent traits default this; re-state to disambiguate
  override def useCommitCoordinator(): Boolean = true
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SpoolWriterFactory(path, schema, maxRecordBytes, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()

  /** Streaming sink: each epoch's tasks spool their records with
    * epoch-unique file names. Semantics are the reference spool's —
    * at-least-once (an epoch replayed after a crash re-spools; the
    * downstream drain already tolerates duplicate records, which is
    * why the reference keys records with unique ids). Exactly-once
    * would need a commit log the spool format deliberately lacks. */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = this
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new SpoolStreamingWriterFactory(path, schema, maxRecordBytes, conf)

  /** Seal the epoch: runs on the DRIVER strictly after every task of
    * the epoch has published its files, so the marker's presence
    * guarantees no epoch-N file can still appear — the invariant the
    * drain's sealed-epoch watermark rests on (SpoolMicroBatchStream).
    * Overwrite makes a replayed commit idempotent.
    *
    * Restart guard: epochIds are per-checkpoint, so a query restarted
    * with a FRESH checkpoint into a non-empty spool dir starts again
    * at epoch 0 — its seals land below the dir's existing max, and a
    * drain whose watermark is already past that max would silently
    * never pick the new epochs up. That is data loss by
    * configuration, so committing an epoch at or below an existing
    * higher seal fails loudly instead: resume from the original
    * checkpoint, or point the fresh query at a fresh spool dir.
    *
    * The guard's directory listing runs ONCE, on the first commit of
    * this writer's lifetime: seals and data files accumulate for the
    * stream's life, so an every-epoch listStatus would make commit
    * latency grow with the directory (pathological on object stores).
    * After that first check this writer is the only seal producer, so
    * an in-memory high-water mark carries the invariant forward. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    val dir = new Path(path)
    val maxSealed = sealHighWater.getOrElse {
      if (!fs.exists(dir)) -1L
      else fs.listStatus(dir).toSeq.flatMap(s => s.getPath.getName match {
        case SpoolMicroBatchStream.SealRe(n) => Some(n.toLong)
        case _ => None
      }).foldLeft(-1L)(math.max)
    }
    if (maxSealed > epochId)
      throw new IllegalStateException(
        s"graft-spool: committing epoch $epochId but $path already holds " +
          s"seals up to epoch $maxSealed — this query was restarted with a " +
          "fresh checkpoint into a non-empty spool dir, and a sealed-epoch " +
          "drain past the old watermark would never read the new epochs. " +
          "Resume from the original checkpoint or use a fresh spool dir.")
    val p = new Path(path, SpoolMicroBatchStream.sealName(epochId))
    val out = fs.create(p, true)
    out.close()
    sealHighWater = Some(math.max(maxSealed, epochId))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class SpoolStreamingWriterFactory(path: String, schema: StructType,
                                  maxRecordBytes: Long,
                                  conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SpoolDataWriter(path, schema, maxRecordBytes, partitionId, taskId,
      namePrefix = f"epoch-$epochId%06d-", conf)
}

object SpoolWrite {
  val Required: Seq[(String, DataType)] = Seq(
    "owner" -> StringType, "log_group" -> StringType,
    "log_stream" -> StringType, "message_type" -> StringType,
    "id" -> StringType, "message" -> StringType, "timestamp" -> LongType)

  def requireWritable(schema: StructType): Unit =
    Required.foreach { case (name, dt) =>
      val f = schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"graft-spool write needs column `$name`; got ${schema.simpleString}"))
      require(f.dataType == dt,
        s"graft-spool column `$name` must be ${dt.simpleString}, " +
          s"got ${f.dataType.simpleString}")
    }
}

class SpoolWriterFactory(path: String, schema: StructType, maxRecordBytes: Long,
                         conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SpoolDataWriter(path, schema, maxRecordBytes, partitionId, taskId,
      namePrefix = "", conf)
}

case class SpoolCommit(files: Seq[String]) extends WriterCommitMessage

class SpoolDataWriter(path: String, schema: StructType, maxRecordBytes: Long,
                      partitionId: Int, taskId: Long, namePrefix: String,
                      serConf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val idx = SpoolWrite.Required.map { case (n, _) =>
    n -> schema.fieldIndex(n)
  }.toMap
  private val subsIdx = schema.fields.indexWhere(_.name == "subscription_filters")

  private case class Header(owner: String, group: String, stream: String,
                            msgType: String, subs: Seq[String])
  /** Buffered event JSON fragments + their byte size, per header. */
  private val buf = mutable.LinkedHashMap.empty[Header, (mutable.ArrayBuffer[String], Long)]
  private val written = mutable.ArrayBuffer.empty[String]
  private var seq = 0
  private val conf: Configuration = serConf.value

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** JSON string or literal null (Spark's append path fills columns
    * the frame omits with nulls — never crash on them). */
  private def jstr(s: String): String =
    if (s == null) "null" else "\"" + jsonEscape(s) + "\""

  override def write(row: InternalRow): Unit = {
    def str(name: String): String = {
      val i = idx(name)
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    }
    val subs =
      if (subsIdx < 0 || row.isNullAt(subsIdx)) Seq.empty[String]
      else {
        val a = row.getArray(subsIdx)
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
    val h = Header(str("owner"), str("log_group"), str("log_stream"),
      str("message_type"), subs)
    val ts = if (row.isNullAt(idx("timestamp"))) "null"
      else row.getLong(idx("timestamp")).toString
    val ev = s"""{"id":${jstr(str("id"))},""" +
      s""""message":${jstr(str("message"))},"timestamp":$ts}"""
    // size in UTF-8 BYTES (non-ASCII payloads are up to 4 bytes/char —
    // char counting would let a buffer serialize past the cap), and
    // the buffer starts at the rendered envelope's size so the
    // flushed record NEVER exceeds maxRecordBytes, wrapper included
    val evBytes = ev.getBytes("UTF-8").length.toLong
    val (events, bytes) =
      buf.getOrElseUpdate(h, (mutable.ArrayBuffer.empty, envelopeBytes(h)))
    // flush-before-append keeps every record under the cap (the
    // reference sizes the gzipped record; uncompressed JSON is the
    // deterministic, strictly-conservative bound)
    if (events.nonEmpty && bytes + evBytes + 1 > maxRecordBytes) flush(h)
    val (events2, bytes2) =
      buf.getOrElseUpdate(h, (mutable.ArrayBuffer.empty, envelopeBytes(h)))
    events2 += ev
    buf(h) = (events2, bytes2 + evBytes + 1)
  }

  private def render(h: Header, eventsJson: String): String = {
    val subsJson = h.subs.map(jstr).mkString(",")
    s"""{"owner":${jstr(h.owner)},"logGroup":${jstr(h.group)},""" +
      s""""logStream":${jstr(h.stream)},"subscriptionFilters":[$subsJson],""" +
      s""""messageType":${jstr(h.msgType)},""" +
      s""""logEvents":[$eventsJson]}"""
  }

  private def envelopeBytes(h: Header): Long =
    render(h, "").getBytes("UTF-8").length.toLong

  private def flush(h: Header): Unit = buf.remove(h).foreach { case (events, _) =>
    if (events.nonEmpty) {
      val record = render(h, events.mkString(","))
      val name = f"${namePrefix}part-$partitionId%05d-$taskId-$seq%05d.gz"
      seq += 1
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos) { `def`.setLevel(Deflater.BEST_COMPRESSION) }
      gz.write(record.getBytes("UTF-8")); gz.close()
      // write to a dot-prefixed temp and rename: publication is atomic
      // on local/HDFS filesystems, so a concurrently tailing drain can
      // never open a half-written gzip (the listing filter also skips
      // non-.gz names, covering filesystems with copy-based rename)
      val tmp = new Path(path, s".$name.tmp")
      val fin = new Path(path, name)
      val fs = tmp.getFileSystem(conf)
      val out = fs.create(tmp, false)
      try out.write(bos.toByteArray) finally out.close()
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"spool publish failed: $tmp -> $fin")
      written += fin.toString
    }
  }

  override def commit(): WriterCommitMessage = {
    buf.keys.toSeq.foreach(flush)
    SpoolCommit(written.toSeq)
  }

  override def abort(): Unit = {
    written.foreach { f =>
      val p = new Path(f)
      p.getFileSystem(conf).delete(p, false); ()
    }
  }

  override def close(): Unit = ()
}
