package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY §2 #39).
  *
  * Media assets ride through the pipeline as opaque `binary` columns
  * with typed metadata structs. The Spark-side plumbing — schema,
  * partition-parallel batched decode, UDF signature and batch shape —
  * is real. The image codec is a REAL pure-JVM header parse for
  * JPEG (SOFn) and PNG (IHDR); payloads that are not a recognizable
  * image (including this container's synthesized text-as-bytes corpus)
  * and the audio/video kinds fall back to `fakeDims`, a deterministic
  * stub standing in for codecs that are not in this container.
  *
  * Scale notes: decode runs via `mapPartitions` over Arrow-sized
  * batches (the Scala analogue of `mapInPandas`), so each task
  * amortizes per-batch codec setup and memory stays bounded by
  * `DecodeBatchSize × max asset size`. Assets never shuffle — the only
  * shuffled columns are the small metadata structs.
  */
object Multimodal {

  /** Batched-decode batch size (the mapInPandas batch shape). */
  val DecodeBatchSize = 32

  case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte])
  case class DecodedRow(doc_id: Long, kind: String, n_bytes: Int,
                        magic: String, width: Int, height: Int,
                        batch_index: Int)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Pure-JVM image dimension read — the real codec for `kind = image`:
    *  - PNG: the IHDR chunk is mandated first (PNG spec §5.6/§11.2.2),
    *    so width/height are the two big-endian u32s at offsets 16/20;
    *  - JPEG: walk the marker segments from SOI to the first SOFn frame
    *    header (ITU T.81 §B.2.2: precision byte, then Y lines and X
    *    samples as big-endian u16s), skipping standalone markers and
    *    fill bytes.
    * Returns None when the payload is not a recognizable image; the
    * caller falls back to the stub dims. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    if (bytes.length >= 24 && bytes.view.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR")
      Some((u32(16).toInt, u32(20).toInt))
    else if (bytes.length >= 10 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: Option[(Int, Int)] = None
      while (res.isEmpty && i + 9 < bytes.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // fill byte before a marker
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9))
          i += 2 // standalone marker: no length field
        else {
          val len = u16(i + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) res = Some((u16(i + 7), u16(i + 5)))
          else if (len < 2) i = bytes.length // corrupt length: bail
          i += 2 + len
        }
      }
      res
    } else None
  }

  /** STUB dims for non-image kinds and unrecognizable payloads:
    * deterministic pseudo-dimensions from the content bytes. */
  def fakeDims(bytes: Array[Byte]): (Int, Int) = {
    val h = bytes.take(16).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
    ((math.abs(h) % 1920).toInt + 1, (math.abs(h / 1920) % 1080).toInt + 1)
  }

  /** Batch codec: real header parse for images, stub otherwise. The
    * signature (batch of byte arrays in, metadata rows out) is the
    * contract shared with a future audio/video decode. */
  def decodeBatch(batch: Seq[MediaRow], batchIndex: Int): Seq[DecodedRow] =
    batch.map { m =>
      val (w, h) =
        (if (m.kind == "image") imageDims(m.bytes) else None)
          .getOrElse(fakeDims(m.bytes))
      DecodedRow(m.doc_id, m.kind, m.bytes.length,
        m.bytes.take(4).map(b => f"${b & 0xff}%02x").mkString,
        w, h, batchIndex)
    }

  /** Documents-as-media source: text bytes standing in for image
    * payloads, kind derived deterministically. */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRow]
  }

  /** Partition-parallel batched decode (#39). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).zipWithIndex.flatMap { case (batch, i) =>
        decodeBatch(batch.toSeq, i)
      }
    }
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decode(mediaDataset(spark, dir))
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("magic"),
        col("width"), col("height"))
      .orderBy("doc_id")

  /** Oracle-checked projection: everything except the stub codec's
    * pseudo-dimensions (width/height — spec-checked for determinism
    * and bounds instead) is recomputable in SQL from the source
    * columns, so the batched-decode plumbing (row fan-in/out, byte
    * length, magic prefix, kind routing) gets a real correctness
    * gate. */
  def multimodalMetaChecked(spark: SparkSession, dir: String): DataFrame =
    multimodalMeta(spark, dir)
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("magic"))

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  lower(substring(hex(encode(text)), 1, 8)) AS magic
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> multimodalMetaChecked)

  val oracle: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql)
}
