package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY §2 #39).
  *
  * Media assets ride through the pipeline as opaque `binary` columns
  * with typed metadata structs. The Spark-side plumbing — schema,
  * partition-parallel batched decode, UDF signature and batch shape —
  * is real; only the codec itself is a deterministic STUB (media
  * libraries are not in this container): `fakeDecode` derives
  * "dimensions" from the byte prefix, standing in for e.g. a JPEG
  * header parse.
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

  /** STUB codec: deterministic pseudo-dimensions from content bytes.
    * Replace with a real header parse / frame sample when codecs are
    * available — the signature (batch of byte arrays in, metadata rows
    * out) is the contract. */
  def fakeDecode(batch: Seq[MediaRow], batchIndex: Int): Seq[DecodedRow] =
    batch.map { m =>
      val h = m.bytes.take(16).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
      DecodedRow(m.doc_id, m.kind, m.bytes.length,
        m.bytes.take(4).map(b => f"${b & 0xff}%02x").mkString,
        (math.abs(h) % 1920).toInt + 1, (math.abs(h / 1920) % 1080).toInt + 1,
        batchIndex)
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
        fakeDecode(batch.toSeq, i)
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
