package graft.operators

import graft.Tables
import graft.functions.BinaryFunctions._
import graft.functions.GelfFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GELF v1.1 (SURVEY §2 #7, #8, #12).
  *
  * - gelf_parse: JSON event parse with typed columns + additional
  *   (`_`-prefixed) field handling and the reference's timestamp
  *   fallback chain: JSON `timestamp` field, else the receive time;
  *   non-JSON payloads keep the raw message and the receive time
  *   (reference: kinesyslog/message.py:80-91).
  * - gelf_chunks: chunk datagrams carry the binary `0x1E0F` header
  *   (id/seq/count); reassembly groups by id, ignores duplicate
  *   seqs, emits complete messages only (gelf.py:11-50).
  * - decompress_auto: zlib/gzip magic-sniffed datagram decompression
  *   (protocol.py:246-261) — rows-only, gzip bytes are
  *   library-specific.
  *
  * Scale: parse is map-only; reassembly shuffles once on the 8-byte
  * message id (uniform by construction). No driver-side state: the
  * reference's in-memory chunk dict becomes a hash aggregate.
  */
object Gelf {

  // -- #7 gelf_parse ----------------------------------------------------

  /** Public: the streaming GELF path (streaming.SyslogPipeline) reuses
    * the same typed schema. */
  val GelfSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("host", StringType),
    StructField("short_message", StringType),
    // GELF timestamps are spec-valid as FRACTIONAL seconds; the
    // reference preserves them (message.py:85 → assign_uuid's
    // int(round(ts*1000))). LongType here would fail the field on
    // real input like 1704412800.5 and silently lose the sender time.
    StructField("timestamp", DoubleType),
    StructField("level", IntegerType),
    StructField("_event_id", LongType),
    StructField("_user", LongType)))

  /** Synthesized GELF datagram per event; every 11th is not JSON,
    * every 13th omits the timestamp field (exercising both fallback
    * arms); every 4th carries a fractional `.5` timestamp. */
  private def gelfLine = {
    val tsFrac = when(col("event_id") % 4 === 0, ".5").otherwise(lit(""))
    val good = format_string(
      """{"version":"1.1","host":"host-%d","short_message":"%s id=%d","timestamp":%d%s,"level":%d,"_event_id":%d,"_user":%d}""",
      col("user_id"), col("event_type"), col("event_id"), col("ts_s"), tsFrac,
      col("event_id") % 8, col("event_id"), col("user_id"))
    val noTs = format_string(
      """{"version":"1.1","host":"host-%d","short_message":"%s id=%d","level":%d,"_event_id":%d,"_user":%d}""",
      col("user_id"), col("event_type"), col("event_id"),
      col("event_id") % 8, col("event_id"), col("user_id"))
    when(col("event_id") % 11 === 0,
        format_string("not-json %s id=%d", col("event_type"), col("event_id")))
      .when(col("event_id") % 13 === 0, noTs)
      .otherwise(good)
  }

  /** @param exactExtra count `_`-additional fields with a full MapType
    *   JSON parse instead of the codegen'd regexp. The regexp is exact
    *   on the synthesized corpus and ~2× cheaper (no second
    *   CodegenFallback JsonToStructs in the plan), but a string VALUE
    *   containing an embedded `,"_x":` sequence over-counts — pass
    *   `exactExtra = true` when feeding EXTERNAL GELF data. */
  def gelfParse(spark: SparkSession, dir: String,
                exactExtra: Boolean = false): DataFrame = {
    // sort-first: the deterministic sort samples the cheap scan, not
    // the JSON parse (a trailing orderBy re-executes the projection
    // for range-partition sampling)
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_s"))
      .orderBy("event_id")
      .withColumn("recv_s", col("ts_s") + 2)
      .withColumn("raw", gelfLine)
    // ONE JSON parse per row (JsonToStructs is CodegenFallback — the
    // single most expensive expression in this plan; a second
    // MapType parse just to count `_`-keys doubled the cost). GELF
    // additional fields are top-level `_`-prefixed keys on a flat
    // object, so a codegen'd regexp_count over the raw text counts
    // them without re-parsing. Known approximation: a string VALUE
    // containing an escaped `,\"_x\":` sequence would over-count —
    // acceptable for a summary statistic; switch back to a full
    // MapType parse if exact key counting on adversarial input ever
    // matters more than 2× parse throughput.
    val parsed = e.withColumn("j", from_json(col("raw"), GelfSchema))
    parsed.select(
        col("event_id"),
        col("j.version").as("version"),
        col("j.host").as("host"),
        col("j.short_message").as("short_message"),
        coalesce(round(col("j.timestamp") * 1000).cast("long"),
          col("recv_s") * 1000).as("ts_ms"),
        col("j.level").as("level"),
        (if (exactExtra)
          size(filter(map_keys(coalesce(
            from_json(col("raw"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)),
            map())), k => k.startsWith("_")))
        else
          when(col("raw").startsWith("{"),
            regexp_count(col("raw"), lit("[,{]\\s*\"_[^\"]*\"\\s*:")))
            .otherwise(0)).cast("int").as("n_extra"))
  }

  val gelfParseSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts)//1000000000 AS ts_s
      |  FROM events
      |)
      |SELECT event_id,
      |  CASE WHEN event_id % 11 = 0 THEN NULL ELSE '1.1' END AS version,
      |  CASE WHEN event_id % 11 = 0 THEN NULL
      |       ELSE 'host-' || user_id END AS host,
      |  CASE WHEN event_id % 11 = 0 THEN NULL
      |       ELSE event_type || ' id=' || event_id END AS short_message,
      |  CASE WHEN event_id % 11 = 0 OR event_id % 13 = 0
      |       THEN (ts_s + 2) * 1000
      |       ELSE ts_s * 1000 + CASE WHEN event_id % 4 = 0 THEN 500 ELSE 0 END
      |       END AS ts_ms,
      |  CASE WHEN event_id % 11 = 0 THEN NULL
      |       ELSE CAST(event_id % 8 AS INT) END AS level,
      |  CAST(CASE WHEN event_id % 11 = 0 THEN 0 ELSE 2 END AS INT) AS n_extra
      |FROM e
      |ORDER BY event_id""".stripMargin

  // -- #8 gelf_chunks ---------------------------------------------------

  /** Documents split into 1–3 chunks carrying real binary headers;
    * every 7th multi-chunk doc loses its last chunk (incomplete →
    * never emitted), every 5th doc duplicates its first chunk
    * (duplicate seq → ignored). */
  def gelfChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("total", (col("n_chars") % 3 + 1).cast("int"))
    val chunks = d
      .select(col("doc_id"), col("text"), col("total"),
        explode(sequence(lit(0), col("total") - 1)).as("seq"))
      .withColumn("start",
        (col("seq") * length(col("text")) / col("total")).cast("int") + 1)
      .withColumn("end",
        ((col("seq") + 1) * length(col("text")) / col("total")).cast("int"))
      .withColumn("payload",
        col("text").substr(col("start"), col("end") - col("start") + 1))
      // drop the last chunk of every 7th multi-chunk doc
      .filter(!(col("doc_id") % 7 === 0 && col("total") > 1 &&
        col("seq") === col("total") - 1))
    val dup = chunks.filter(col("doc_id") % 5 === 0 && col("seq") === 0)
    val withHeader = chunks.unionAll(dup)
      .withColumn("hex",
        concat(lit("1E0F"),
          lpad(hex(col("doc_id")), 16, "0"),
          lpad(hex(col("seq")), 2, "0"),
          lpad(hex(col("total")), 2, "0")))
      .withColumn("datagram", concat(unhex(col("hex")), col("payload").cast("binary")))
    // --- the operator under test: binary header parse + reassembly ---
    withHeader
      .select(gelf_chunk_parse(col("datagram")).as("c"))
      .select(col("c.id").as("id"), col("c.seq").as("seq"),
        col("c.total").as("total"), col("c.payload").cast("string").as("payload"))
      .groupBy("id")
      .agg(
        array_sort(array_distinct(collect_list(struct(col("seq"), col("payload")))))
          .as("parts"),
        max("total").as("total"))
      .filter(size(col("parts")) === col("total"))
      .select(col("id").as("doc_id"),
        array_join(col("parts").getField("payload"), "").as("message"))
      .orderBy("doc_id")
  }

  val gelfChunksSql: String =
    """SELECT doc_id, text AS message
      |FROM documents
      |WHERE NOT (doc_id % 7 = 0 AND (n_chars % 3 + 1) > 1)
      |ORDER BY doc_id""".stripMargin

  // -- #8b gelf_chunks_packed — chunked AND compressed composition ------

  /** Chunked messages whose payload is the zlib/gzip-COMPRESSED
    * document: real graylog senders compress the whole GELF document
    * first and chunk the compressed bytes, so the receiver must
    * reassemble BEFORE it sniffs and decompresses — the reference
    * feeds the reassembled chunk buffer back through its magic-sniff
    * path (protocol.py:281-287 → 217-224). Chunk payloads are split
    * on COMPRESSED byte offsets (a chunk boundary lands mid-stream;
    * per-chunk decompression would see garbage), reassembly
    * byte-concatenates in seq order, and only the complete blob goes
    * through decompress_auto → UTF-8. Every 3rd doc zlib, every 3rd
    * gzip, the rest uncompressed (the sniff's pass-through arm);
    * the #8 drop/duplicate quirks (lost last chunk every 7th
    * multi-chunk doc, duplicated first chunk every 5th) apply
    * unchanged. The oracle's byte-exact gate is the `message` column
    * itself: it must hash-equal the original document text for every
    * surviving row (the per-row `roundtrip_ok` witness lives in #12,
    * which tests the codec without chunking). */
  def gelfChunksPacked(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("total", (col("n_chars") % 3 + 1).cast("int"))
      .withColumn("raw", col("text").cast("binary"))
      .withColumn("packed",
        when(col("doc_id") % 3 === 0, zlib_compress(col("raw")))
          .when(col("doc_id") % 3 === 1, gzip_compress(col("raw")))
          .otherwise(col("raw")))
      .withColumn("plen", octet_length(col("packed")))
    val chunks = d
      .select(col("doc_id"), col("packed"), col("plen"), col("total"),
        explode(sequence(lit(0), col("total") - 1)).as("seq"))
      .withColumn("start",
        (col("seq") * col("plen") / col("total")).cast("int") + 1)
      .withColumn("end",
        ((col("seq") + 1) * col("plen") / col("total")).cast("int"))
      .withColumn("payload",
        col("packed").substr(col("start"), col("end") - col("start") + 1))
      .filter(!(col("doc_id") % 7 === 0 && col("total") > 1 &&
        col("seq") === col("total") - 1))
    val dup = chunks.filter(col("doc_id") % 5 === 0 && col("seq") === 0)
    val withHeader = chunks.unionAll(dup)
      .withColumn("hex",
        concat(lit("1E0F"),
          lpad(hex(col("doc_id")), 16, "0"),
          lpad(hex(col("seq")), 2, "0"),
          lpad(hex(col("total")), 2, "0")))
      .withColumn("datagram", concat(unhex(col("hex")), col("payload")))
    // --- the operator under test: reassemble, THEN sniff+decompress ---
    withHeader
      .select(gelf_chunk_parse(col("datagram")).as("c"))
      .select(col("c.id").as("id"), col("c.seq").as("seq"),
        col("c.total").as("total"), col("c.payload").as("payload"))
      .groupBy("id")
      .agg(
        array_sort(array_distinct(collect_list(struct(col("seq"), col("payload")))))
          .as("parts"),
        max("total").as("total"))
      .filter(size(col("parts")) === col("total"))
      .withColumn("blob", expr(
        "aggregate(parts.payload, cast('' AS binary), (acc, x) -> concat(acc, x))"))
      .withColumn("out", decompress_auto(col("blob")))
      .select(col("id").as("doc_id"),
        (col("id") % 3).cast("int").as("codec"),
        col("out").cast("string").as("message"))
      .orderBy("doc_id")
  }

  val gelfChunksPackedSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 3 AS INT) AS codec,
      |  text AS message
      |FROM documents
      |WHERE NOT (doc_id % 7 = 0 AND (n_chars % 3 + 1) > 1)
      |ORDER BY doc_id""".stripMargin

  // -- #12 decompress_auto ----------------------------------------------

  /** Magic-sniff decompression round-trip. Output columns are all
    * SQL-recomputable from the source (compressed byte lengths are
    * library-specific, so they live in the specs instead) — the oracle
    * therefore gates codec routing AND a successful round-trip per
    * row: `roundtrip_ok` must be 1 everywhere to hash-match the
    * oracle's literal 1. */
  def decompressAuto(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("raw", col("text").cast("binary"))
      .withColumn("packed",
        when(col("doc_id") % 3 === 0, zlib_compress(col("raw")))
          .when(col("doc_id") % 3 === 1, gzip_compress(col("raw")))
          .otherwise(col("raw")))
    d.withColumn("out", decompress_auto(col("packed")))
      .select(
        col("doc_id"),
        (col("doc_id") % 3).cast("int").as("codec"),
        octet_length(col("out")).as("out_len"),
        (col("out") === col("raw")).cast("int").as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  val decompressAutoSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 3 AS INT) AS codec,
      |  octet_length(encode(text)) AS out_len,
      |  1 AS roundtrip_ok
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gelf_parse" -> ((s: SparkSession, d: String) => gelfParse(s, d)),
    "gelf_chunks" -> gelfChunks,
    "gelf_chunks_packed" -> gelfChunksPacked,
    "decompress_auto" -> decompressAuto)

  val oracle: Map[String, String] = Map(
    "gelf_parse" -> gelfParseSql,
    "gelf_chunks" -> gelfChunksSql,
    "gelf_chunks_packed" -> gelfChunksPackedSql,
    "decompress_auto" -> decompressAutoSql)
}
