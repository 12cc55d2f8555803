package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** #188 streaming media dedup at ingest: the in-row hash equals the
  * batch kernel, and the claim-and-verify verdicts match a full
  * independent simulation of the protocol across a checkpoint
  * restart. */
class MediaHashStreamSpec extends SparkSpec {
  import operators.MediaHash.{Bits, Bands, HamMax, TwinMod, TwinRes}

  private lazy val docs: Map[Long, String] =
    Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val contents: Map[Long, Array[Byte]] =
    docs.map { case (id, _) =>
      val srcId = if (id % TwinMod == TwinRes) id - 1 else id
      val s = if (id % TwinMod == TwinRes) docs(srcId) + "x" else docs(srcId)
      id -> s.getBytes("UTF-8")
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

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("in-row aHash fold equals the batch explode/aggregate kernel") {
    import spark.implicits._
    val rows = contents.toSeq.sortBy(_._1)
      .map { case (id, b) => (id, new String(b, "UTF-8")) }
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        expr(operators.MediaHash.ahashInRowSql("CAST(text AS BINARY)"))
          .as("hash"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    contents.foreach { case (id, b) =>
      assert(got(id).sameElements(ahash(b)), s"doc $id")
    }
  }

  test("streaming verdicts match the protocol simulation across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mh_in")
    val out = Files.createTempDirectory("graft_mh_out")
    val ckpt = Files.createTempDirectory("graft_mh_ck")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("content", "binary")
    val ordered = contents.toSeq.sortBy(_._1)
    val (drop1, drop2) = ordered.partition(_._1 < 250)
    def feed(rows: Seq[(Long, Array[Byte])]): Unit =
      rows.toDF("doc_id", "content").coalesce(1)
        .write.mode("append").parquet(in.toString)
    def drain(): Unit = {
      val q = streaming.MediaHashStream.dedupQuery(
        spark, in.toString, schema, ckpt.toString, out.toString)
      assert(q.awaitTermination(120000))
    }
    feed(drop1); drain()
    feed(drop2); drain()
    // independent full simulation: per batch, per bucket, the state
    // owner is the prior claim or the batch's min id; every member
    // verifies against the owner's FULL hash
    val hashes = contents.map { case (id, b) => id -> ahash(b) }
    val state = scala.collection.mutable.Map.empty[(Int, Long), (Long, Array[Long])]
    val exp = scala.collection.mutable.Map.empty[Long, Option[Long]]
    Seq(drop1, drop2).foreach { batch =>
      val byBucket = scala.collection.mutable.Map
        .empty[(Int, Long), List[Long]].withDefaultValue(Nil)
      batch.foreach { case (id, _) =>
        hashes(id).zipWithIndex.foreach { case (v, b) =>
          byBucket((b, v)) = id :: byBucket((b, v))
        }
      }
      val obs = scala.collection.mutable.Map
        .empty[Long, List[(Long, Int)]].withDefaultValue(Nil)
      byBucket.foreach { case (key, members) =>
        val sorted = members.sorted
        val owner = state.getOrElseUpdate(key,
          (sorted.head, hashes(sorted.head)))
        sorted.foreach { id =>
          obs(id) = (owner._1, hamming(hashes(id), owner._2)) :: obs(id)
        }
      }
      batch.foreach { case (id, _) =>
        val dup = obs(id).filter { case (o, d) => o != id && d <= HamMax }
          .map(_._1).sorted.headOption
        exp(id) = dup
      }
    }
    val got = spark.read.parquet(out.toString).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getInt(2))).toMap
    assert(got.keySet == contents.keySet)
    contents.keys.foreach { id =>
      assert(got(id)._1 == exp(id), s"doc $id")
      assert(got(id)._2 == (if (exp(id).isEmpty) 1 else 0))
    }
    // semantics: every rejection is TRUE (within radius of its named
    // earlier owner) and the planted twins arriving after their
    // source are rejected
    got.foreach { case (id, (dup, _)) =>
      dup.foreach { o =>
        assert(o < id || (o != id && hamming(hashes(id), hashes(o)) <= HamMax))
        assert(hamming(hashes(id), hashes(o)) <= HamMax, s"$id vs $o")
      }
    }
    val lateTwins = contents.keys
      .filter(id => id % TwinMod == TwinRes && id >= 250 && docs.contains(id - 1))
    val rejected = lateTwins.count(id => got(id)._1.nonEmpty)
    assert(lateTwins.nonEmpty && rejected.toDouble / lateTwins.size >= 0.8,
      s"late-twin rejection $rejected/${lateTwins.size}")
  }

  test("planted transform variants: stream recall matches the protocol; chains resolve admitted") {
    // the #198 recall claim carried into the STREAM: generation 1 is
    // the corpus, generation 2 delivers a gain (+8 per byte) and a
    // re-encode (one appended byte) variant of every asset under
    // fresh ids — the transformations the batch gate survives at
    // >= 900‰ must also reject at the streaming gate, where each
    // arrival compares only to its bucket OWNERS
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mhr_in")
    val out = Files.createTempDirectory("graft_mhr_out")
    val ckpt = Files.createTempDirectory("graft_mhr_ck")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("content", "binary")
    def gain(b: Array[Byte]): Array[Byte] =
      b.map(x => (((x & 0xff) + operators.MediaHash.RecallGainShift) & 0xff).toByte)
    def reenc(b: Array[Byte]): Array[Byte] = b :+ 'x'.toByte
    val gen1 = contents.toSeq.sortBy(_._1)
    val gen2 = gen1.map { case (id, b) => (id + 1000000L, gain(b)) } ++
      gen1.map { case (id, b) => (id + 2000000L, reenc(b)) }
    def feed(rows: Seq[(Long, Array[Byte])]): Unit =
      rows.toDF("doc_id", "content").coalesce(1)
        .write.mode("append").parquet(in.toString)
    def drain(): Unit = {
      val q = streaming.MediaHashStream.dedupQuery(
        spark, in.toString, schema, ckpt.toString, out.toString)
      assert(q.awaitTermination(120000))
    }
    feed(gen1); drain()
    feed(gen2); drain()

    // independent protocol simulation over both generations
    val all = (gen1 ++ gen2).toMap
    val hs = all.map { case (id, b) => id -> ahash(b) }
    val state = scala.collection.mutable.Map.empty[(Int, Long), (Long, Array[Long])]
    val exp = scala.collection.mutable.Map.empty[Long, Option[Long]]
    Seq(gen1, gen2).foreach { batch =>
      val byBucket = scala.collection.mutable.Map
        .empty[(Int, Long), List[Long]].withDefaultValue(Nil)
      batch.foreach { case (id, _) =>
        hs(id).zipWithIndex.foreach { case (v, b) =>
          byBucket((b, v)) = id :: byBucket((b, v))
        }
      }
      val obs = scala.collection.mutable.Map
        .empty[Long, List[(Long, Int)]].withDefaultValue(Nil)
      byBucket.foreach { case (key, members) =>
        val sorted = members.sorted
        val owner = state.getOrElseUpdate(key, (sorted.head, hs(sorted.head)))
        sorted.foreach { id =>
          obs(id) = (owner._1, hamming(hs(id), owner._2)) :: obs(id)
        }
      }
      batch.foreach { case (id, _) =>
        exp(id) = obs(id).filter { case (o, d) => o != id && d <= HamMax }
          .map(_._1).sorted.headOption
      }
    }
    val log = spark.read.parquet(out.toString)
      .select("doc_id", "dup_of").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    all.keys.foreach(id => assert(log(id) == exp(id), s"doc $id"))

    // per-transform recall at the streaming gate
    def recall(base: Long): Double = {
      val ids = gen1.map(_._1 + base)
      ids.count(id => log(id).nonEmpty).toDouble / ids.size
    }
    assert(recall(1000000L) >= 0.9, s"gain stream recall ${recall(1000000L)}")
    assert(recall(2000000L) >= 0.9, s"reencode stream recall ${recall(2000000L)}")

    // #199 on the REAL stream log: every chain resolves to an
    // admitted root (variants of rejected originals chain through
    // them transitively)
    val resolved = operators.MediaHash.dupResolve(
        log.toSeq.toDF("doc_id", "dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    resolved.values.toSet.foreach { (root: Long) =>
      assert(log(root).isEmpty, s"root $root not admitted")
    }
    // and resolution agrees with a sequential walk of the log
    def walk(id: Long): Long =
      log(id) match { case Some(p) => walk(p); case None => id }
    all.keys.foreach(id => assert(resolved(id) == walk(id), s"walk $id"))
  }
}
