package graft

import graft.functions.GelfFunctions._
import org.apache.spark.sql.functions._

/** GELF chunk wire-format fixtures (#8) and parse fallbacks (#7). */
class GelfSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(id: Long, seq: Int, total: Int, payload: String): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put(0x1e.toByte).put(0x0f.toByte)
    bb.putLong(id).put(seq.toByte).put(total.toByte)
    bb.put(payload.getBytes("UTF-8"))
    bb.array()
  }

  test("chunk header parses id/seq/total/payload big-endian") {
    val r = Seq(chunk(0x1234L, 1, 3, "abc")).toDF("d")
      .select(gelf_chunk_parse(col("d")).as("c"))
      .select("c.id", "c.seq", "c.total", "c.payload").collect().head
    assert(r.getLong(0) === 0x1234L)
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 3)
    assert(new String(r.getAs[Array[Byte]](3), "UTF-8") === "abc")
  }

  test("seq/total bytes are unsigned") {
    val r = Seq(chunk(1L, 200, 255, "x")).toDF("d")
      .select(gelf_chunk_parse(col("d")).as("c"))
      .select("c.seq", "c.total").collect().head
    assert(r.getInt(0) === 200)
    assert(r.getInt(1) === 255)
  }

  test("wrong magic or short datagram yields null") {
    val bad1 = Array[Byte](0x1e, 0x10, 1, 2, 3)
    val bad2 = Array[Byte](0x1e, 0x0f, 1)
    val rows = Seq(bad1, bad2).toDF("d")
      .select(gelf_chunk_parse(col("d"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("gelf_chunks drops incomplete ids and ignores duplicate seqs") {
    val out = operators.Gelf.gelfChunks(spark, sf)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), (col("n_chars") % 3 + 1).as("total"))
    val expectedMissing = docs.filter(col("doc_id") % 7 === 0 && col("total") > 1)
    val joined = out.join(docs, Seq("doc_id"))
      .filter(col("message") =!= col("text"))
    assert(joined.count() === 0)
    assert(out.count() === docs.count() - expectedMissing.count())
  }

  test("gelf_parse falls back to recv time for non-JSON and missing ts") {
    val out = operators.Gelf.gelfParse(spark, sf).filter(col("event_id") % 11 === 0)
    assert(out.filter(col("version").isNotNull).count() === 0)
    assert(out.filter(col("ts_ms").isNull).count() === 0)
  }

  test("gelf_parse preserves fractional sender timestamps (spec-valid)") {
    // reference: ujson float -> int(round(ts*1000)) in assign_uuid
    val e = Tables.events(spark, sf)
      .filter(col("event_id") % 4 === 0 && col("event_id") % 11 =!= 0 &&
        col("event_id") % 13 =!= 0)
      .select(col("event_id"), (col("ts_s") * 1000 + 500).as("want"))
    val out = operators.Gelf.gelfParse(spark, sf)
      .select(col("event_id"), col("ts_ms"))
    assert(e.join(out, Seq("event_id"))
      .filter(col("ts_ms") =!= col("want")).count() === 0)
  }

  test("exact-parse n_extra agrees with the regexp fast path on this corpus") {
    val fast = operators.Gelf.gelfParse(spark, sf)
      .select("event_id", "n_extra")
    val exact = operators.Gelf.gelfParse(spark, sf, exactExtra = true)
      .select(col("event_id"), col("n_extra").as("n_exact"))
    assert(fast.join(exact, Seq("event_id"))
      .filter(col("n_extra") =!= col("n_exact")).count() === 0)
  }
}
