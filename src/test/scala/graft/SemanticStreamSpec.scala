package graft

import java.nio.file.Files

import graft.operators.Similarity
import graft.streaming.SemanticStream
import org.apache.spark.sql.functions._

/** #149 SemanticStream — the frozen-centroid streaming admission twin
  * of #148: single-batch containment vs the batch operator, greedy
  * invariants, and cross-restart state survival. */
class SemanticStreamSpec extends SparkSpec {
  import org.apache.spark.sql.types.StructType

  private val schema = new StructType()
    .add("vec_id", "long").add("embedding", "array<float>")

  private def quantize(e: Seq[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 1000).toLong).toArray
  private def gate(a: Array[Long], b: Array[Long]): Boolean = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = a.map(x => x * x).sum
    val nb = b.map(x => x * x).sum
    dot >= 0 && 400L * dot * dot >= 49L * na * nb
  }

  test("single-batch stream: admitted set contains every batch-kept vector and is pairwise non-duplicate") {
    val in = Files.createTempDirectory("graft_sem_in")
    val out = Files.createTempDirectory("graft_sem_out")
    val ckpt = Files.createTempDirectory("graft_sem_ck")
    val src = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    src.coalesce(1).write.mode("append").parquet(in.toString)
    val q = SemanticStream.admissionQuery(spark, in.toString, schema,
      ckpt.toString, out.toString, sf)
    assert(q.awaitTermination(120000))
    val verdicts = spark.read.parquet(out.toString)
      .select("vec_id", "cid", "admitted", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val vecs = src.collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1))).toMap
    assert(verdicts.length === vecs.size)
    // greedy guarantees: per-cluster admitted sets are independent,
    // every rejection gates with its recorded keeper
    verdicts.groupBy(_._2).values.foreach { members =>
      val admitted = members.filter(_._3 == 1).map(_._1)
      for (i <- admitted.indices; j <- i + 1 until admitted.length)
        assert(!gate(vecs(admitted(i)), vecs(admitted(j))),
          s"admitted pair ${admitted(i)},${admitted(j)} passes the gate")
    }
    verdicts.filter(_._3 == 0).foreach { case (v, _, _, dupOf) =>
      assert(dupOf.isDefined)
      assert(gate(vecs(v), vecs(dupOf.get)),
        s"$v rejected against non-duplicate keeper ${dupOf.get}")
    }
    // dominance drops a superset of greedy: every batch-KEPT vector
    // must be stream-admitted (same clusters, same in-batch order)
    val batchKept = Similarity.dedupSemantic(spark, sf)
      .filter(col("kept") === 1).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val streamAdmitted = verdicts.filter(_._3 == 1).map(_._1).toSet
    batchKept.foreach(v =>
      assert(streamAdmitted.contains(v), s"batch-kept $v was rejected"))
    // and the clusters agree with the batch assignment
    val batchCid = Similarity.dedupSemantic(spark, sf)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    verdicts.foreach { case (v, cid, _, _) =>
      assert(batchCid(v) === cid, s"$v assigned to $cid vs batch ${batchCid(v)}")
    }
  }

  test("cross-restart: a second increment of identical twins is fully rejected against first-drain keepers") {
    val in = Files.createTempDirectory("graft_sem2_in")
    val out = Files.createTempDirectory("graft_sem2_out")
    val ckpt = Files.createTempDirectory("graft_sem2_ck")
    val src = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    def drain(): Unit = {
      val q = SemanticStream.admissionQuery(spark, in.toString, schema,
        ckpt.toString, out.toString, sf)
      assert(q.awaitTermination(120000))
    }
    src.coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    // increment 2: the same vectors under shifted ids — every one is
    // an exact twin (cos = 1) of a first-drain arrival, so whichever
    // keeper its cluster holds must reject it; admitting ANY proves
    // state loss across the restart
    src.withColumn("vec_id", col("vec_id") + lit(1000000L))
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    val verdicts = spark.read.parquet(out.toString)
    assert(verdicts.count() === src.count() * 2)
    val secondGen = verdicts.filter(col("vec_id") >= 1000000L)
    assert(secondGen.count() === src.count())
    assert(secondGen.filter(col("admitted") === 1).count() === 0,
      "an identical twin was admitted - keeper state lost across restart")
    // provenance points into the first generation
    assert(secondGen.filter(col("dup_of") >= 1000000L).count() === 0)
  }
}
