package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** #193 streaming composed media admission: batch-order verdict
  * precedence (dedup first, gates after), per-asset gate equality
  * with the single-sourced battery, protocol-simulated dup verdicts,
  * batch-survivor containment, and cross-restart owner survival. */
class MediaPipelineStreamSpec extends SparkSpec {
  import operators.MediaHash.{Bands, Bits, HamMax, TwinMod, TwinRes}

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", "long").add("content", "binary")

  // independent synthesis at sf0.01 (the gate battery needs the dim
  // residues to wrap — sf0.001's id range has no aspect casualties);
  // round 20: the CROP-TWIN corpus (the #207 gAssets contract), so the
  // dual-modality admission gate has planted casualties of BOTH
  // transform classes
  private val dir = "/root/testdata/sf0.01"
  private lazy val docs: Map[Long, String] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  private lazy val contents: Map[Long, Array[Byte]] =
    docs.flatMap { case (id, _) =>
      val isReenc = id % TwinMod == TwinRes
      val isCrop = !isReenc && id % operators.MediaHash.GTwinMod ==
        operators.MediaHash.GTwinRes
      val srcId = if (isReenc || isCrop) id - 1 else id
      docs.get(srcId).map { src =>
        val s =
          if (isReenc) src + "x"
          else if (isCrop) {
            val cps = src.codePoints().toArray
            val drop = math.min(operators.MediaHash.RecallCropBytes, cps.length)
            new String(cps, drop, cps.length - drop)
          } else src
        id -> s.getBytes("UTF-8")
      }
    }
  private def ahash(bytes: Array[Byte]): Array[Long] = {
    val cells = new Array[Long](Bits)
    bytes.zipWithIndex.foreach { case (b, i) => cells(i % Bits) += (b & 0xff) }
    val total = cells.sum
    val bands = new Array[Long](Bands)
    for (i <- 0 until Bits)
      if (Bits * cells(i) > total) bands(i / 16) |= 1L << (i % 16)
    bands
  }
  private def ghash(bytes: Array[Byte]): Array[Long] = {
    val P = functions.SketchFunctions.PolyP
    val bins = new Array[Long](Bits)
    bytes.map(_ & 0xff).toSeq.sliding(operators.MediaHash.GramW)
      .filter(_.length == operators.MediaHash.GramW)
      .foreach { w =>
        val h = w.foldLeft(0L)((acc, v) => (acc * 131 + v) % P)
        bins((h % Bits).toInt) += 1
      }
    val cnt = bins.sum
    val bands = new Array[Long](Bands)
    for (i <- 0 until Bits)
      if (Bits * bins(i) > cnt) bands(i / 16) |= 1L << (i % 16)
    bands
  }
  /** The dual 8-word hash the round-20 gate claims buckets with. */
  private def dualHash(bytes: Array[Byte]): Array[Long] =
    ahash(bytes) ++ ghash(bytes)
  /** Per-modality Hamming: band < 4 compares the aHash words, band ≥ 4
    * the gHash words (the stream's confirm rule). */
  private def modHamming(a: Array[Long], b: Array[Long], band: Int): Int = {
    val off = if (band < Bands) 0 else Bands
    (off until off + Bands)
      .map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum
  }

  /** Independent gate battery (the media_pipeline spec's recompute). */
  private def gate(id: Long, bytes: Array[Byte]): String = {
    val MP = operators.MediaPipeline
    val (w, h) = ((id * MP.WMul % 1920 + 32).toInt, (id * MP.HMul % 1080 + 32).toInt)
    if (w < MP.MinDim || h < MP.MinDim) "too_small"
    else if (w > h * MP.AspectMax || h > w * MP.AspectMax) "bad_aspect"
    else {
      val c = new Array[Long](16)
      bytes.foreach(b => c((b & 0xff) >>> 4) += 1)
      val tot = c.sum
      if (tot == 0) "low_entropy"
      else {
        val mx = c.max
        if (mx * 1000 / tot > MP.ContentMaxPermille) "low_entropy" else "ok"
      }
    }
  }

  test("single drain: dedup-first precedence, gate equality, batch containment") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mps_in")
    val out = Files.createTempDirectory("graft_mps_out")
    val ckpt = Files.createTempDirectory("graft_mps_ck")
    contents.toSeq.sortBy(_._1).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(in.toString)
    val q = streaming.MediaPipelineStream.admissionQuery(
      spark, in.toString, schema, ckpt.toString, out.toString)
    assert(q.awaitTermination(180000))

    val rows = spark.read.parquet(out.toString).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))
    }.toMap
    assert(rows.size === contents.size, "one verdict per asset")

    // independent DUAL-modality protocol simulation (single batch:
    // smallest doc_id claims each of its 8 buckets; a collision
    // confirms on ITS modality's Hamming) → expected dup set + owners
    val ids = contents.keys.toSeq.sorted
    val hashes = contents.map { case (id, b) => id -> dualHash(b) }
    val bucketOwner = scala.collection.mutable.Map.empty[(Int, Long), Long]
    ids.foreach { id =>
      hashes(id).zipWithIndex.foreach { case (v, b) =>
        bucketOwner.getOrElseUpdate((b, v), id); ()
      }
    }
    val expDup = ids.flatMap { id =>
      val owners = hashes(id).zipWithIndex
        .map { case (v, b) => (bucketOwner((b, v)), b) }
        .filter { case (o, b) =>
          o != id && modHamming(hashes(id), hashes(o), b) <= HamMax
        }.map(_._1)
      if (owners.isEmpty) None else Some(id -> owners.min)
    }.toMap
    expDup.foreach { case (id, owner) =>
      assert(rows(id) === (("dup", Some(owner))), s"asset $id")
    }
    assert(expDup.nonEmpty, "the corpus plants near-twins; none rejected")
    // the round-20 point, at the GATE: at least one planted crop twin
    // rejects as a dup that the aHash-only protocol would have
    // admitted — the cropped re-upload no longer enters storage
    val aOnlyDup = ids.flatMap { id =>
      val owners = hashes(id).zipWithIndex.take(Bands)
        .map { case (v, b) => (bucketOwner((b, v)), b) }
        .filter { case (o, b) =>
          o != id && modHamming(hashes(id), hashes(o), b) <= HamMax
        }.map(_._1)
      if (owners.isEmpty) None else Some(id)
    }.toSet
    val cropCaught = ids.filter { id =>
      id % TwinMod != TwinRes &&
        id % operators.MediaHash.GTwinMod == operators.MediaHash.GTwinRes &&
        expDup.contains(id) && !aOnlyDup(id)
    }
    assert(cropCaught.nonEmpty,
      "no crop twin rejects through the gHash side of the gate")
    cropCaught.foreach(id => assert(rows(id)._1 == "dup", s"crop twin $id"))

    // every non-dup asset's verdict is EXACTLY the independent gate
    // battery (per-asset pure function — the single-sourced seam)
    ids.filterNot(expDup.contains).foreach { id =>
      val exp = gate(id, contents(id)) match {
        case "ok" => "admitted"
        case g => g
      }
      assert(rows(id)._1 === exp, s"asset $id gate")
      assert(rows(id)._2.isEmpty, s"asset $id dup_of on a non-dup")
    }
    // all four verdict classes actually occur at this scale
    Seq("admitted", "dup", "too_small", "bad_aspect", "low_entropy").foreach {
      v => assert(rows.values.exists(_._1 == v), s"no $v verdict")
    }

    // batch containment: every batch media_pipeline survivor is
    // stream-admitted or stream-dup (the #188 owner-vs-canonical
    // divergence is the only allowed difference)
    val batchSurvivors = operators.MediaPipeline.mediaPipeline(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    batchSurvivors.foreach { id =>
      assert(Set("admitted", "dup").contains(rows(id)._1),
        s"batch survivor $id stream verdict ${rows(id)._1}")
    }
    // and no stream-admitted asset fails the independent battery
    rows.collect { case (id, ("admitted", _)) =>
      assert(gate(id, contents(id)) == "ok", s"admitted $id fails a gate")
    }
  }

  test("cross-restart: second-increment twins reject against first-drain owners") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mps2_in")
    val out = Files.createTempDirectory("graft_mps2_out")
    val ckpt = Files.createTempDirectory("graft_mps2_ck")
    def drain(): Unit = {
      val q = streaming.MediaPipelineStream.admissionQuery(
        spark, in.toString, schema, ckpt.toString, out.toString)
      assert(q.awaitTermination(180000))
    }
    contents.toSeq.sortBy(_._1).toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val gen1 = spark.read.parquet(out.toString).count()
    // same BYTES under shifted ids: every arrival is an exact
    // perceptual twin of a generation-1 asset — all must reject as
    // dups against generation-1 owners (identical hash ⇒ identical
    // buckets ⇒ Hamming 0), before any gate runs
    contents.toSeq.sortBy(_._1).map { case (id, b) => (id + 1000000L, b) }
      .toDF("doc_id", "content")
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val second = spark.read.parquet(out.toString)
      .filter(col("doc_id") >= 1000000L)
    assert(second.count() === gen1)
    assert(second.filter(col("verdict") === "dup").count() === gen1,
      "a shifted twin was not rejected — bucket state lost across restart")
    assert(second.filter(col("dup_of") >= 1000000L).count() === 0,
      "dup provenance points inside its own generation")
  }
}
