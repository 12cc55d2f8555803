package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY §2 #39).
  *
  * Media assets ride through the pipeline as opaque `binary` columns
  * with typed metadata structs. The Spark-side plumbing — schema,
  * partition-parallel batched decode, UDF signature and batch shape —
  * is real, and so are the codecs: pure-JVM header parses for JPEG
  * (SOFn) / PNG (IHDR) images, WAV (RIFF fmt-chunk sample rate +
  * channels) audio, and MP4 (moov→trak→tkhd dimensions) video.
  * Payloads not recognizable as their kind (including this
  * container's synthesized text-as-bytes corpus) fall back to
  * `fakeDims`, a deterministic stub.
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
      // i+9 <= length: the SOF dims end at bytes(i+8), so a JPEG
      // truncated right after the X-samples field still parses
      while (res.isEmpty && i + 9 <= bytes.length && u8(i) == 0xff) {
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

  /** Pure-JVM WAV header read — the real codec for `kind = audio`:
    * RIFF/WAVE container, chunks walked from offset 12 as
    * [id:4][size:u32le][data] (RIFF spec); the mandatory `fmt ` chunk
    * carries channels (u16le @ +2) and sample rate (u32le @ +4).
    * Returns (sample_rate, channels) in the generic (primary,
    * secondary) dimension slots. */
  def wavMeta(bytes: Array[Byte]): Option[(Int, Int)] = {
    def ascii(i: Int, n: Int) = new String(bytes.slice(i, i + n), "US-ASCII")
    def u16le(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32le(i: Int): Long = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    if (bytes.length < 36 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      return None
    var i = 12L
    while (i + 8 <= bytes.length) {
      val id = ascii(i.toInt, 4)
      val size = u32le(i.toInt + 4)
      if (id == "fmt " && size >= 16 && i + 16 <= bytes.length)
        return Some((u32le(i.toInt + 12).toInt, u16le(i.toInt + 10)))
      // Long arithmetic: a corrupt u32 size near 2^32 truncated to Int
      // would advance by <= 0 (infinite loop) or index negatively —
      // the walk must terminate and fall back to fakeDims instead
      i += 8L + size + (size & 1)
    }
    None
  }

  /** Pure-JVM MP4 dimension read — the real codec for `kind = video`:
    * ISO BMFF box walk ([size:u32be][type:4], size 1 = 64-bit
    * largesize) down moov → trak → tkhd, whose presentation width and
    * height are 16.16 fixed-point u32s at +76/+80 (version 0) or
    * +88/+92 (version 1) from the box header (ISO 14496-12 §8.3.2). */
  def mp4Dims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    def ascii(i: Int) = new String(bytes.slice(i, i + 4), "US-ASCII")
    def findBox(from: Long, end: Long, tpe: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= end) {
        val size0 = u32(i.toInt)
        val (hdr, size) =
          if (size0 == 1 && i + 16 <= end) // 64-bit largesize
            (16L, (u32(i.toInt + 8) << 32) | u32(i.toInt + 12))
          else (8L, if (size0 == 0) end - i else size0)
        if (size < hdr || i + size > end) return None // corrupt: bail
        if (ascii(i.toInt + 4) == tpe) return Some((i + hdr, i + size))
        i += size
      }
      None
    }
    if (bytes.length < 16 || ascii(4) != "ftyp") return None
    val end = bytes.length.toLong
    for {
      (moovStart, moovEnd) <- findBox(0, end, "moov")
      (trakStart, trakEnd) <- findBox(moovStart, moovEnd, "trak")
      (tkhdStart, tkhdEnd) <- findBox(trakStart, trakEnd, "tkhd")
      // an empty tkhd (size 8) puts start == end at the buffer edge —
      // guard before the version read, not just before the dims read
      if tkhdStart < tkhdEnd
      version = u8(tkhdStart.toInt)
      off = tkhdStart + (if (version == 1) 88 else 76)
      if off + 8 <= tkhdEnd
      w = (u32(off.toInt) >> 16).toInt
      h = (u32(off.toInt + 4) >> 16).toInt
      if w > 0 && h > 0
    } yield (w, h)
  }

  /** STUB dims for unrecognizable payloads: deterministic
    * pseudo-dimensions from the content bytes. */
  def fakeDims(bytes: Array[Byte]): (Int, Int) = {
    // floorMod, not abs: the fold wraps freely, and
    // math.abs(Long.MinValue) is still negative — abs-based dims
    // would break the documented [1,1920]x[1,1080] bound there
    val h = bytes.take(16).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
    (java.lang.Math.floorMod(h, 1920L).toInt + 1,
      java.lang.Math.floorMod(h / 1920, 1080L).toInt + 1)
  }

  /** Batch codec: real header parse per kind — JPEG/PNG dimensions
    * for images, WAV (sample_rate, channels) for audio, MP4 tkhd
    * dimensions for video — with the deterministic stub as the
    * fallback for unrecognizable payloads (e.g. this container's
    * synthesized text-as-bytes corpus). */
  def decodeBatch(batch: Seq[MediaRow], batchIndex: Int): Seq[DecodedRow] =
    batch.map { m =>
      val real = m.kind match {
        case "image" => imageDims(m.bytes)
        case "audio" => wavMeta(m.bytes)
        case "video" => mp4Dims(m.bytes)
        case _ => None
      }
      val (w, h) = real.getOrElse(fakeDims(m.bytes))
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

  // ---------------------------------------------------------------------
  // #112 media_resize — real-PNG decode → aspect-preserving fit
  // ---------------------------------------------------------------------

  /** Resize target box. */
  val ResizeBox = 224

  /** Aspect-preserving resize planning over REAL PNG headers
    * synthesized in-query (sig + IHDR with doc_id-derived u32be
    * dims), so the actual [[imageDims]] codec sits inside the
    * oracle-verified path — the oracle re-derives the dims from the
    * synthesis contract and replays the same integer fit math
    * (truncating div on positives — engine-identical). The pixel
    * resample itself is the stubbed stage (no raster libs in this
    * container); what a 100 TB run needs verified is exactly this
    * metadata path: decode → plan → (stub) kernel, map-only. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), lit("image").as("kind"),
        unhex(concat(
          lit("89504E470D0A1A0A"), // PNG signature
          lit("0000000D"), lit("49484452"), // IHDR length + tag
          lpad(hex((col("doc_id") % 1920 + 32).cast("int")), 8, "0"),
          lpad(hex((col("doc_id") % 1080 + 32).cast("int")), 8, "0"),
          lit("0806000000"))).as("bytes"))
      .as[MediaRow]
    decode(media).toDF()
      .withColumn("out_w",
        when(col("width") >= col("height"), lit(ResizeBox))
          .otherwise(greatest(lit(1),
            expr(s"(width * $ResizeBox) div height"))))
      .withColumn("out_h",
        when(col("width") >= col("height"), greatest(lit(1),
          expr(s"(height * $ResizeBox) div width")))
          .otherwise(lit(ResizeBox)))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w").cast("int").as("out_w"), col("out_h").cast("int").as("out_h"))
      .orderBy("doc_id")
  }

  val mediaResizeSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 1920 + 32 AS INT) AS width,
      |    CAST(doc_id % 1080 + 32 AS INT) AS height
      |  FROM documents
      |)
      |SELECT doc_id, width, height,
      |  CAST(CASE WHEN width >= height THEN $ResizeBox
      |            ELSE GREATEST(1, (width * $ResizeBox) // height) END AS INT) AS out_w,
      |  CAST(CASE WHEN width >= height THEN GREATEST(1, (height * $ResizeBox) // width)
      |            ELSE $ResizeBox END AS INT) AS out_h
      |FROM d
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // #113 media_frames — stride frame sampling from typed metadata
  // ---------------------------------------------------------------------

  val FrameStride = 10

  /** Frame-sample planning for video rows: every FrameStride-th frame
    * index from the typed metadata (n_frames derived from payload
    * size — the stand-in for a real container's stts entry count).
    * Map-only explode: sampling 100 TB of video metadata is
    * scan-bound, and the (doc_id, frame_idx) output is the join key
    * the (stubbed) frame-decode kernel would consume. */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2) // the corpus' video rows
      .select(col("doc_id"),
        (expr("octet_length(CAST(text AS BINARY))") .cast("long")
          .as("nb")))
      .withColumn("n_frames", expr("nb div 100") + 1)
      .select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $FrameStride)")).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  val mediaFramesSql: String =
    s"""WITH v AS (
      |  SELECT doc_id,
      |    octet_length(encode(text)) // 100 + 1 AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2
      |)
      |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(unnest(range(0, n_frames, $FrameStride)) AS BIGINT) AS frame_idx
      |FROM v
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // #114 media_features — per-asset byte histogram (feature-extract)
  // ---------------------------------------------------------------------

  /** Feature extraction over opaque binary: 16-bin high-nibble byte
    * histogram per asset, computed by the same batched mapPartitions
    * kernel shape a real featurizer (CLIP embedding, mel filterbank)
    * would use — per-partition, bounded memory, assets never shuffle
    * (only the 16-row-per-asset feature frame does). The oracle
    * recomputes the histogram from the hex encoding, so the binary
    * kernel is value-verified end to end. */
  /** The histogram kernel over an arbitrary (doc_id, content) frame —
    * shared by #114 and the #190 media pipeline's content gate: rows
    * (doc_id, bin, cnt), zero-count bins omitted, assets never
    * shuffled (the fold is in-task). */
  private[graft] def featuresFrom(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("doc_id"), col("content").cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val counts = new Array[Long](16)
          bytes.foreach(b => counts((b & 0xff) >>> 4) += 1)
          counts.iterator.zipWithIndex.collect {
            case (c, bin) if c > 0 => (id, bin, c)
          }
        }
      }.toDF("doc_id", "bin", "cnt")
      .select(col("doc_id"), col("bin").cast("int").as("bin"), col("cnt"))
  }

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    featuresFrom(mediaDataset(spark, dir).toDF()
      .select(col("doc_id"), col("bytes").as("content")))
      .orderBy("doc_id", "bin")

  val mediaFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
      |), n AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, length(hx) + 1, 2),
      |      i -> substring(hx, CAST(i AS INT), 1))) AS ch
      |  FROM b
      |)
      |SELECT doc_id,
      |  CAST(strpos('0123456789ABCDEF', ch) - 1 AS INT) AS bin,
      |  COUNT(*) AS cnt
      |FROM n
      |GROUP BY doc_id, ch
      |ORDER BY doc_id, bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> multimodalMetaChecked,
    "media_resize" -> mediaResize,
    "media_frames" -> mediaFrames,
    "media_features" -> mediaFeatures)

  val oracle: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql,
    "media_resize" -> mediaResizeSql,
    "media_frames" -> mediaFramesSql,
    "media_features" -> mediaFeaturesSql)
}
