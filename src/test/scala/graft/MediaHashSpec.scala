package graft

/** #179/#180 average-hash media near-dup: hashes and the banded dedup
  * join re-derived by independent Scala loops, plus a brute-force
  * completeness proof of the pigeonhole banding. */
class MediaHashSpec extends SparkSpec {
  import operators.MediaHash._

  // independent synthesis + kernel replay
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

  /** Independent aHash: 64 cells by position mod 64, bit on strict
    * mean exceed (64·cell > total), banded 16 bits each. */
  private def ahash(bytes: Array[Byte]): Array[Long] = {
    val cells = new Array[Long](Bits)
    bytes.zipWithIndex.foreach { case (b, i) => cells(i % Bits) += (b & 0xff) }
    val total = cells.sum
    val bands = new Array[Long](Bands)
    for (i <- 0 until Bits)
      if (Bits * cells(i) > total) bands(i / 16) |= 1L << (i % 16)
    bands
  }

  private lazy val hashes: Map[Long, Array[Long]] =
    contents.map { case (id, b) => id -> ahash(b) }

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("media_ahash matches the independent byte-fold recompute") {
    val got = operators.MediaHash.mediaAhash(spark, sf).collect()
      .map(r => r.getLong(0) -> Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == docs.keys.toSeq.sorted)
    got.foreach { case (id, h) => assert(h.sameElements(hashes(id)), s"doc $id") }
    // every band fits 16 bits
    got.foreach { case (_, h) => h.foreach(b => assert(b >= 0 && b < 65536)) }
  }

  test("mapPartitions kernel equals the explode/aggregate spelling on every asset") {
    // three spellings of one algebra: the production mapPartitions
    // kernel (ahashKernel), the explode/aggregate reference
    // (bandsDf → hashesFrom, the shape the DuckDB oracle replays), and
    // the spec's own loop — all pinned equal per asset
    val M = operators.MediaHash
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val kernel = rows(M.ahashKernel(M.assets(spark, sf)))
    val reference = rows(M.hashesFrom(M.bandsDf(spark, sf)))
    assert(kernel === reference)
    kernel.foreach { case (id, (b0, b1, b2, b3)) =>
      assert(Array(b0, b1, b2, b3).sameElements(hashes(id)), s"doc $id")
    }
  }

  test("media_ahash_dedup equals the brute-force Hamming-radius pair set") {
    // brute force ALL pairs at spec scale: banding + cap must lose
    // nothing here (no bucket reaches the cap at sf0.001 — asserted,
    // so the pigeonhole completeness claim is actually exercised)
    val ids = contents.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      d = hamming(hashes(ids(i)), hashes(ids(j)))
      if d <= HamMax
    } yield (ids(i), ids(j), d)).toSeq.sorted
    val bucketSizes = hashes.toSeq
      .flatMap { case (id, h) => h.zipWithIndex.map { case (v, b) => (b, v) -> id } }
      .groupBy(_._1).map(_._2.size)
    assert(bucketSizes.max <= BucketCap, "cap reached: completeness claim untested")
    val got = operators.MediaHash.mediaAhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)
    // the planted one-byte re-encodes are caught: every twin pair is
    // within the radius of its source (the append shifts one cell and
    // the global mean — at most a few threshold bits move)
    val twins = ids.filter(id => id % TwinMod == TwinRes && docs.contains(id - 1))
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    val found = twins.count(id => gotPairs.contains((id - 1, id)))
    assert(twins.nonEmpty && found.toDouble / twins.size >= 0.8,
      s"twin recall $found/${twins.size}")
  }

  test("short and empty assets bucket on all 4 bands (crafted-corpus dedupFrom)") {
    // the corpus carries no asset under 49 bytes, so the always-4-band
    // bucketing contract (engine posexplode == oracle hb CTE) is pinned
    // here on a crafted corpus: band 3 of a 48-byte asset has no cells
    // (value 0), and that zero band must still bucket — dropping
    // empty-cell bands (the pre-r18 oracle read of `bnd`) would lose
    // the A/B pair below, whose ONLY agreeing band is the empty one.
    import spark.implicits._
    val a = Array.fill[Byte](48)(10)
    val b = { val x = Array.fill[Byte](48)(10); x(0) = 0; x(16) = 0; x(32) = 0; x }
    val e1 = Array.empty[Byte]
    val e2 = Array.empty[Byte]
    val far = Array.tabulate[Byte](128)(i => (i * 37 % 251).toByte)
    val crafted = Seq(1L -> a, 2L -> b, 3L -> e1, 4L -> e2, 5L -> far)
    val hs = crafted.map { case (id, bytes) => id -> ahash(bytes) }.toMap

    // construction sanity: A/B differ in every populated band, agree
    // only on the empty band 3, and sit exactly at the radius
    assert((0 to 2).forall(k => hs(1L)(k) != hs(2L)(k)))
    assert(hs(1L)(3) == 0 && hs(2L)(3) == 0)
    assert(hamming(hs(1L), hs(2L)) == HamMax)

    val df = crafted.toDF("doc_id", "content")

    // kernel: EVERY asset hashes — a zero-byte asset to (0,0,0,0),
    // matching the oracle h CTE's assets-LEFT-JOIN zero-coalesce
    // (the in-row HOF spelling pins the same empty case explicitly)
    import org.apache.spark.sql.functions.{col, expr}
    val ker = operators.MediaHash.ahashKernel(df).collect()
      .map(r => r.getLong(0) -> Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(ker.keySet == crafted.map(_._1).toSet)
    crafted.foreach { case (id, _) =>
      assert(ker(id).sameElements(hs(id)), s"doc $id") }
    assert(ker(3L).forall(_ == 0L))
    val inRow = df.select(col("doc_id"),
      expr(operators.MediaHash.ahashInRowSql("content")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    crafted.foreach { case (id, _) =>
      assert(inRow(id) == hs(id).toSeq, s"in-row doc $id") }

    // dedup over the crafted corpus equals brute-force Hamming ≤ 3:
    // A–B survives only because the empty band buckets, and the two
    // empty assets pair at distance 0
    val ids = crafted.map(_._1)
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      d = hamming(hs(ids(i)), hs(ids(j))) if d <= HamMax
    } yield (ids(i), ids(j), d)).sorted
    val got = operators.MediaHash.dedupFrom(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)
    assert(got.contains((1L, 2L, HamMax)), "empty-band pair lost")
    assert(got.contains((3L, 4L, 0)), "empty-asset pair lost")
  }

  test("media_ahash_clusters matches an independent union-find over the pair truth") {
    val ids = contents.keys.toSeq.sorted
    // independent union-find over the brute-force Hamming pairs
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for {
      i <- ids.indices
      j <- (i + 1) until ids.size
      if hamming(hashes(ids(i)), hashes(ids(j))) <= HamMax
    } {
      val (ra, rb) = (find(ids(i)), find(ids(j)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val cluster = ids.map(i => i -> find(i)).toMap
    val sizes = cluster.values.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val exp = ids.map { i =>
      val c = cluster(i)
      (i, c, sizes(c), if (i == c) 1 else 0, contents(i).length)
    }
    val got = operators.MediaHash.mediaAhashClusters(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(got == exp)
    // the storage bill shrinks: canonical bytes < all bytes, and every
    // non-canonical is in a ≥2-member cluster
    assert(got.filter(_._4 == 1).map(_._5.toLong).sum <
      got.map(_._5.toLong).sum)
    got.filter(_._4 == 0).foreach { case (id, _, n, _, _) =>
      assert(n >= 2, s"doc $id")
    }
  }

  test("media_pipeline: per-stage survivors match the independent recompute; every gate cuts") {
    // run at sf0.01: the aspect and content gates need the dim residues
    // to wrap / the histogram tail to exist, which sf0.001's id range
    // cannot produce (the dim-contract multipliers only de-correlate
    // width and height past id ~275)
    val dir = "/root/testdata/sf0.01"
    val MP = operators.MediaPipeline
    val docs01 = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // round 20: the pipeline runs the CROP-TWIN corpus (gAssets — the
    // #207 synthesis: re-encode twins %11 ≡ 6 take precedence, crop
    // twins %13 ≡ 7 drop the first 8 characters)
    val contents01 = docs01.flatMap { case (id, _) =>
      val isReenc = id % TwinMod == TwinRes
      val isCrop = !isReenc && id % operators.MediaHash.GTwinMod ==
        operators.MediaHash.GTwinRes
      val srcId = if (isReenc || isCrop) id - 1 else id
      docs01.get(srcId).map { src =>
        val s =
          if (isReenc) src + "x"
          else if (isCrop) {
            val cps = src.codePoints().toArray
            val drop = math.min(RecallCropBytes, cps.length)
            new String(cps, drop, cps.length - drop)
          } else src
        id -> s.getBytes("UTF-8")
      }
    }
    val hashes01 = contents01.map { case (id, b) => id -> ahash(b) }
    val P = functions.SketchFunctions.PolyP
    def ghashOf(bytes: Array[Byte]): Array[Long] = {
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
    val ghashes01 = contents01.map { case (id, b) => id -> ghashOf(b) }
    val ids = contents01.keys.toSeq.sorted

    // stage 1 truth: union-find over the UNION of both modalities'
    // brute-force Hamming pair sets (the #211 detector union)
    def unionFind(pairOk: (Long, Long) => Boolean)
        : (Map[Long, Long], Map[Long, Long]) = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      for {
        i <- ids.indices
        j <- (i + 1) until ids.size
        if pairOk(ids(i), ids(j))
      } {
        val (ra, rb) = (find(ids(i)), find(ids(j)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val cl = ids.map(i => i -> find(i)).toMap
      (cl, cl.values.groupBy(identity).map { case (c, g) => c -> g.size.toLong })
    }
    val (cluster, csizes) = unionFind((a, b) =>
      hamming(hashes01(a), hashes01(b)) <= HamMax ||
        hamming(ghashes01(a), ghashes01(b)) <= HamMax)
    val keepers = ids.filter(i => cluster(i) == i)

    // the round-20 point: at least one planted CROP twin is cut at
    // stage 1 that the aHash-only stage (the pre-r20 pipeline) KEPT —
    // the cropped re-upload no longer survives the composed recipe
    val (aCluster, _) = unionFind((a, b) =>
      hamming(hashes01(a), hashes01(b)) <= HamMax)
    val aOnlyKeepers = ids.filter(i => aCluster(i) == i).toSet
    val cropCasualties = ids.filter { id =>
      id % TwinMod != TwinRes &&
        id % operators.MediaHash.GTwinMod == operators.MediaHash.GTwinRes &&
        cluster(id) != id && aOnlyKeepers(id)
    }
    assert(cropCasualties.nonEmpty,
      "no crop twin was cut by the union that aHash alone kept — " +
        "the gHash side of stage 1 is vacuous")

    // stages 2-4 truth: dim contract, geometry gates, histogram gate
    def dims(id: Long): (Int, Int) =
      ((id * MP.WMul % 1920 + 32).toInt, (id * MP.HMul % 1080 + 32).toInt)
    val afterSize = keepers.filter { id =>
      val (w, h) = dims(id); w >= MP.MinDim && h >= MP.MinDim
    }
    val afterAspect = afterSize.filter { id =>
      val (w, h) = dims(id)
      w <= h * MP.AspectMax && h <= w * MP.AspectMax
    }
    def top(bytes: Array[Byte]): (Int, Long) = {
      val c = new Array[Long](16)
      bytes.foreach(b => c((b & 0xff) >>> 4) += 1)
      val tot = c.sum
      val bin = c.zipWithIndex.filter(_._1 > 0)
        .maxBy { case (cnt, b) => (cnt, -b) }._2
      (bin, c(bin) * 1000 / tot)
    }
    val afterContent = afterAspect.filter(id =>
      top(contents01(id))._2 <= MP.ContentMaxPermille)

    // every stage CUTS something (planted casualties at this scale)
    assert(keepers.size < ids.size, "dedup stage cut nothing")
    assert(afterSize.size < keepers.size, "size gate cut nothing")
    assert(afterAspect.size < afterSize.size, "aspect gate cut nothing")
    assert(afterContent.size < afterAspect.size, "content gate cut nothing")

    // the pipeline's survivor rows match the recompute per field
    val got = MP.mediaPipeline(spark, dir).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getLong(7)))
    assert(got.map(_._1) == afterContent)
    got.foreach { case (id, nm, w, h, ow, oh, tb, ts) =>
      assert(nm == csizes(cluster(id)), s"doc $id members")
      assert((w, h) == dims(id), s"doc $id dims")
      val (ew, eh) =
        if (w >= h) (operators.Multimodal.ResizeBox,
          math.max(1, h * operators.Multimodal.ResizeBox / w))
        else (math.max(1, w * operators.Multimodal.ResizeBox / h),
          operators.Multimodal.ResizeBox)
      assert((ow, oh) == (ew, eh), s"doc $id fit")
      assert((tb, ts) == top(contents01(id)), s"doc $id histogram")
    }

    // the audit is exactly the recomputed attrition walk
    val audit = MP.mediaPipelineAudit(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expBytes = Seq(ids, keepers, afterSize, afterAspect, afterContent)
      .map(g => g.map(contents01(_).length.toLong).sum)
    assert(audit.map(_._3) ==
      Seq(ids.size, keepers.size, afterSize.size, afterAspect.size,
        afterContent.size).map(_.toLong))
    assert(audit.map(_._4) == expBytes)
    assert(audit.map(_._2) ==
      Seq("input", "dedup_keeper", "size_gate", "aspect_gate", "content_gate"))

    // the caller-supplied-frames overload returns the identical report
    val fromFrames = MP.auditFrom(MP.pipelineFrames(spark, dir)).collect()
      .toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fromFrames == audit)

    // the per-asset gate battery (gateFrame, shared with the #193
    // streaming twin) labels keepers EXACTLY as the staged chain cuts
    // them: survivors = keepers gated 'ok', and each casualty's label
    // names its first failing stage
    import spark.implicits._
    val gates = MP.gateFrame(
      keepers.map(id => (id, contents01(id))).toDF("doc_id", "content"))
      .select("doc_id", "gate").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keepers.filter(id => gates(id) == "ok") == afterContent)
    assert(keepers.filter(id => gates(id) == "too_small")
      == keepers.diff(afterSize))
    assert(afterSize.filter(id => gates(id) == "bad_aspect")
      == afterSize.diff(afterAspect))
    assert(afterAspect.filter(id => gates(id) == "low_entropy")
      == afterAspect.diff(afterContent))
  }

  test("media_ahash_recall matches an independent per-transform fold") {
    // independent transforms over the collected asset bytes: the spec
    // folds value SEQUENCES (array sums by position), a different
    // spelling from the kernel's iterator fold
    def ahashOfVals(vals: Seq[Int]): Array[Long] = {
      val cells = new Array[Long](Bits)
      vals.zipWithIndex.foreach { case (v, i) => cells(i % Bits) += v }
      val total = cells.sum
      val bands = new Array[Long](Bands)
      for (i <- 0 until Bits)
        if (Bits * cells(i) > total) bands(i / 16) |= 1L << (i % 16)
      bands
    }
    val transforms = Map[String, Array[Byte] => Seq[Int]](
      "gain" -> (b => b.map(x => (x & 0xff) + RecallGainShift).toSeq),
      "crop" -> (b => b.drop(RecallCropBytes).map(_ & 0xff).toSeq),
      "reencode" -> (b => b.map(_ & 0xff).toSeq :+ RecallReencodeByte))
    // per-transform expected summary over every corpus asset
    val exp = transforms.map { case (name, t) =>
      val rows = contents.values.toSeq.map { bytes =>
        val base = ahash(bytes)
        val th = ahashOfVals(t(bytes))
        val ham = hamming(base, th)
        val hit = base.zip(th).exists { case (x, y) => x == y }
        (ham, hit)
      }
      val nDet = rows.count { case (h, hit) => hit && h <= HamMax }
      name -> (rows.size.toLong,
        rows.count(_._1 <= HamMax).toLong,
        rows.count(_._2).toLong,
        nDet.toLong,
        nDet.toLong * 1000 / rows.size,
        rows.map(_._1).max)
    }
    val got = operators.MediaHash.mediaAhashRecall(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(got.keySet == transforms.keySet)
    exp.foreach { case (name, e) => assert(got(name) == e, s"transform $name") }

    // the gate justification the row exists for: the transformations
    // aHash is designed to survive (uniform gain, the one-byte
    // re-encode) stay inside the banded gate at high recall, while the
    // alignment-destroying crop falls out — the scheme's documented
    // boundary (geometric transforms belong to embedding dedup)
    assert(got("gain")._5 >= 900, s"gain recall ${got("gain")._5}")
    assert(got("reencode")._5 >= 900, s"reencode recall ${got("reencode")._5}")
    assert(got("crop")._5 < got("gain")._5)
  }

  test("media_ghash_recall: independent shingle-histogram recompute; crop caught, hashes distinctive") {
    // independent gHash: materialized sliding windows over value
    // sequences (a different spelling from the kernel's ring-buffer
    // iterator fold)
    val P = functions.SketchFunctions.PolyP
    def ghashOfVals(vals: Seq[Int]): Array[Long] = {
      val bins = new Array[Long](Bits)
      vals.sliding(operators.MediaHash.GramW)
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
    val transforms = Map[String, Array[Byte] => Seq[Int]](
      "gain" -> (b => b.map(x => (x & 0xff) + RecallGainShift).toSeq),
      "crop" -> (b => b.drop(RecallCropBytes).map(_ & 0xff).toSeq),
      "reencode" -> (b => b.map(_ & 0xff).toSeq :+ RecallReencodeByte))
    val baseHash = contents.map { case (id, b) =>
      id -> ghashOfVals(b.map(_ & 0xff).toSeq)
    }
    val exp = transforms.map { case (name, t) =>
      val rows = contents.toSeq.map { case (id, bytes) =>
        val base = baseHash(id)
        val th = ghashOfVals(t(bytes))
        (hamming(base, th), base.zip(th).exists { case (x, y) => x == y })
      }
      val nDet = rows.count { case (h, hit) => hit && h <= HamMax }
      name -> (rows.size.toLong, rows.count(_._1 <= HamMax).toLong,
        rows.count(_._2).toLong, nDet.toLong,
        nDet.toLong * 1000 / rows.size, rows.map(_._1).max)
    }
    val got = operators.MediaHash.mediaGhashRecall(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(got.keySet == transforms.keySet)
    exp.foreach { case (name, e) => assert(got(name) == e, s"transform $name") }

    // the row this modality exists for: CROP recall is substantial at
    // the production gate where both position-keyed folds measure 0 —
    // and the family's other transforms stay covered
    assert(got("crop")._5 >= 500, s"crop recall ${got("crop")._5}")
    assert(got("gain")._5 >= 900, s"gain recall ${got("gain")._5}")
    assert(got("reencode")._5 >= 900, s"reencode recall ${got("reencode")._5}")

    // a recall gate is vacuous if the hash maps everything together:
    // distinct assets must NOT collide at the same gate (the byte-value
    // histogram failure mode this modality was chosen over — it scored
    // crop 1000 permille but merged 99.8% of random pairs)
    val ids = contents.keys.toSeq.sorted
    val rng = new scala.util.Random(7)
    var collide = 0; var pairs = 0
    (1 to 1000).foreach { _ =>
      val a = ids(rng.nextInt(ids.size)); val b = ids(rng.nextInt(ids.size))
      if (a != b && a != b + 1 && b != a + 1) { // skip planted twins
        pairs += 1
        val (ha, hb) = (baseHash(a), baseHash(b))
        if (hamming(ha, hb) <= HamMax &&
          ha.zip(hb).exists { case (x, y) => x == y }) collide += 1
      }
    }
    assert(pairs > 900)
    assert(collide * 1000 <= 20 * pairs,
      s"gHash merges $collide of $pairs random pairs — not distinctive")

    // kernel edges: sub-shingle and empty assets hash to all-zero
    // bands in both spellings
    Seq(Array.emptyByteArray, Array[Byte](1, 2, 3)).foreach { b =>
      assert(operators.MediaHash.ghashBands(b.iterator.map(_ & 0xff))
        .toSeq == Seq(0L, 0L, 0L, 0L))
      assert(ghashOfVals(b.map(_ & 0xff).toSeq).toSeq == Seq(0L, 0L, 0L, 0L))
    }
  }

  test("ghashBands array overload (rolling hash, r21) equals the iterator fold byte-for-byte") {
    // the hot-path spelling drops the outgoing byte's 131^(W-1) term
    // instead of re-running the W-term Horner per window; prove the
    // modular algebra identical on edge lengths, random content, and
    // high bytes (sign-extension trap: bytes ≥ 0x80)
    val rng = new scala.util.Random(21)
    val cases: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray, Array[Byte](1), Array[Byte](1, 2, 3),
        Array[Byte](0, 0, 0, 0), Array.fill(64)(0xff.toByte)) ++
        (1 to 20).map(n => Array.fill(rng.nextInt(400) + 1)(rng.nextInt(256).toByte))
    cases.foreach { b =>
      assert(operators.MediaHash.ghashBands(b).toSeq ==
        operators.MediaHash.ghashBands(b.iterator.map(_ & 0xff)).toSeq,
        s"mismatch on len=${b.length}")
    }
  }

  test("media_ghash_dedup equals the brute-force pair set; planted crop AND re-encode twins caught") {
    val P = functions.SketchFunctions.PolyP
    def ghashOf(bytes: Array[Byte]): Array[Long] = {
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
    // independent synthesis replay: re-encode twins (%11 ≡ 6, append
    // 'x') take precedence over crop twins (%13 ≡ 7, drop the first 8
    // CHARACTERS — codepoint-safe, the SQL substring semantics)
    val gdocs: Map[Long, Array[Byte]] = docs.flatMap { case (id, _) =>
      val isReenc = id % TwinMod == TwinRes
      val isCrop = !isReenc && id % operators.MediaHash.GTwinMod ==
        operators.MediaHash.GTwinRes
      val srcId = if (isReenc || isCrop) id - 1 else id
      docs.get(srcId).map { src =>
        val s =
          if (isReenc) src + "x"
          else if (isCrop) {
            val cps = src.codePoints().toArray
            val drop = math.min(RecallCropBytes, cps.length)
            new String(cps, drop, cps.length - drop)
          } else src
        id -> s.getBytes("UTF-8")
      }
    }
    val ghashes = gdocs.map { case (id, b) => id -> ghashOf(b) }
    // the banding is pigeonhole-complete at ham ≤ 3 over 4 bands, so
    // the truth is the full brute-force radius set — provided no
    // bucket reaches the cap (asserted, so completeness is exercised)
    val ids = gdocs.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      d = hamming(ghashes(ids(i)), ghashes(ids(j)))
      if d <= HamMax
    } yield (ids(i), ids(j), d)).toSeq.sorted
    val bucketSizes = ghashes.toSeq
      .flatMap { case (id, h) => h.zipWithIndex.map { case (v, b) => (b, v) -> id } }
      .groupBy(_._1).map(_._2.size)
    assert(bucketSizes.max <= BucketCap, "cap reached: completeness claim untested")
    val got = operators.MediaHash.mediaGhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)
    // BOTH planted transform classes are caught by the one detector:
    // crop twins at the #205-measured rate, re-encode twins near-all
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    val cropTwins = ids.filter(id => id % TwinMod != TwinRes &&
      id % operators.MediaHash.GTwinMod == operators.MediaHash.GTwinRes &&
      gdocs.contains(id - 1))
    val cropFound = cropTwins.count(id => gotPairs.contains((id - 1, id)))
    assert(cropTwins.nonEmpty && cropFound.toDouble / cropTwins.size >= 0.7,
      s"crop-twin recall $cropFound/${cropTwins.size}")
    val reencTwins = ids.filter(id => id % TwinMod == TwinRes &&
      gdocs.contains(id - 1))
    val reencFound = reencTwins.count(id => gotPairs.contains((id - 1, id)))
    assert(reencTwins.nonEmpty && reencFound.toDouble / reencTwins.size >= 0.8,
      s"re-encode twin recall $reencFound/${reencTwins.size}")

    // #211 media_dedup_union: the dual-modality pair graph equals the
    // union of the two brute-force radius sets over the SAME corpus,
    // with per-modality provenance exact — and each modality
    // contributes pairs the other misses (the union is not vacuous)
    val ahashes = gdocs.map { case (id, b) => id -> ahash(b) }
    val expUnion = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = hamming(ahashes(ids(i)), ahashes(ids(j))) <= HamMax
      g = hamming(ghashes(ids(i)), ghashes(ids(j))) <= HamMax
      if a || g
    } yield (ids(i), ids(j), if (a) 1 else 0, if (g) 1 else 0)).toSeq.sorted
    val gotUnion = operators.MediaHash.mediaDedupUnion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    assert(gotUnion == expUnion)
    assert(gotUnion.exists(p => p._3 == 1 && p._4 == 0), "no aHash-only pair")
    assert(gotUnion.exists(p => p._3 == 0 && p._4 == 1), "no gHash-only pair")
  }

  test("media_radius_sweep: pigeonhole boundary measured, gates agree, modality knee visible") {
    val sweep = operators.MediaHash.mediaRadiusSweep(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val radii = 0 to operators.MediaHash.MaxSweepRadius
    val keys = for {
      m <- Seq("ahash", "ghash"); t <- Seq("gain", "crop", "reencode")
    } yield (m, t)
    assert(sweep.keySet == keys.flatMap(k => radii.map(r => (k._1, k._2, r))).toSet)

    keys.foreach { case (m, t) =>
      // monotone in radius, both curves
      radii.sliding(2).foreach { case Seq(a, b) =>
        assert(sweep((m, t, a))._2 <= sweep((m, t, b))._2, s"$m/$t within")
        assert(sweep((m, t, a))._3 <= sweep((m, t, b))._3, s"$m/$t detected")
      }
      // the pigeonhole claim, MEASURED: at radius ≤ Bands−1 the banded
      // gate equals ground truth on every row
      (0 to HamMax).foreach { r =>
        assert(sweep((m, t, r))._2 == sweep((m, t, r))._3,
          s"$m/$t radius $r: banding lost a within-radius pair")
      }
    }
    // the boundary is real: somewhere past HamMax detection falls
    // behind truth (otherwise the sweep proves nothing about banding)
    assert(keys.exists { case (m, t) =>
      ((HamMax + 1) to operators.MediaHash.MaxSweepRadius)
        .exists(r => sweep((m, t, r))._3 < sweep((m, t, r))._2)
    }, "no row shows the pigeonhole boundary binding past HamMax")

    // the production gates are points ON these curves: n_detected at
    // radius HamMax equals the #198/#205 rows
    val gateA = operators.MediaHash.mediaAhashRecall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val gateG = operators.MediaHash.mediaGhashRecall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    Seq("gain", "crop", "reencode").foreach { t =>
      assert(sweep(("ahash", t, HamMax))._3 == gateA(t), s"ahash $t gate")
      assert(sweep(("ghash", t, HamMax))._3 == gateG(t), s"ghash $t gate")
    }

    // the modality knee: gHash catches crops at the production radius
    // that aHash misses even at the sweep's widest — the one-table
    // justification for carrying both folds
    assert(sweep(("ghash", "crop", HamMax))._3 >
      sweep(("ahash", "crop", operators.MediaHash.MaxSweepRadius))._3,
      "gHash's crop advantage not visible in the sweep")
  }

  test("media_dup_resolve: roots admitted, chains walked, crafted chain exact") {
    // batch reproduction of the stream's first-claim verdicts,
    // independently: owner = min doc_id per (band, value) bucket,
    // dup_of = min owner within the confirm radius over the doc's bands
    val buckets = hashes.toSeq
      .flatMap { case (id, h) => h.zipWithIndex.map { case (v, b) => ((b, v), id) } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val expVerdict: Map[Long, Option[Long]] = hashes.map { case (id, h) =>
      val owners = h.zipWithIndex
        .map { case (v, b) => buckets((b, v)) }
        .filter(o => o != id && hamming(hashes(o), h) <= HamMax)
      id -> (if (owners.isEmpty) None else Some(owners.min))
    }
    def walk(id: Long): Long =
      expVerdict(id) match { case Some(p) => walk(p); case None => id }

    val got = operators.MediaHash.mediaDupResolve(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getInt(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == hashes.keys.toSeq.sorted)
    got.foreach { case (id, dupOf, admitted, root) =>
      assert(dupOf == expVerdict(id), s"verdict $id")
      assert(admitted == (if (dupOf.isEmpty) 1 else 0))
      assert(root == walk(id), s"root $id")
      // the property the view exists for: every root is admitted
      assert(expVerdict(root).isEmpty, s"root $root of $id not admitted")
    }

    // crafted transitive chains through the generic resolver: 12→9→5→1
    // (1 admitted), 21→20, AND an out-of-ARRIVAL-order chain 3→7→50
    // (50 claimed its bucket before the smaller-id 3 and 7 arrived —
    // the file-landing-order case a min-label pass would mislabel):
    // resolution = admitted ancestor, ordering-free
    import spark.implicits._
    val crafted = Seq(
      (1L, None), (5L, Some(1L)), (9L, Some(5L)), (12L, Some(9L)),
      (20L, None), (21L, Some(20L)),
      (50L, None), (7L, Some(50L)), (3L, Some(7L)))
      .toDF("doc_id", "dup_of")
    val resolved = operators.MediaHash.dupResolve(crafted).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(resolved == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 12L -> 1L,
      20L -> 20L, 21L -> 20L, 50L -> 50L, 7L -> 50L, 3L -> 50L))

    // dangling parent = truncated/filtered log: fail fast instead of
    // silently mislabeling the orphan as its own admitted root (the
    // r18 ADVICE finding — the doubling join would drop 33 and the
    // final coalesce would report root = 33 with admitted = 0)
    val truncated = Seq((1L, None), (33L, Some(99L)))
      .toDF("doc_id", "dup_of")
    val err = intercept[IllegalArgumentException] {
      operators.MediaHash.dupResolve(truncated).collect()
    }
    assert(err.getMessage.contains("absent from the input"))
  }
}
