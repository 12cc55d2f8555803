package graft

import java.nio.file.Files

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** #175 AnnStream — streaming ANN serving from the persisted index:
  * batch/stream answer equality, out-of-corpus queries, exactly-once
  * batch layout. */
class AnnStreamSpec extends SparkSpec {

  private val schema = new StructType()
    .add("vec_id", "long").add("embedding", "array<float>")

  test("streamed top-k equals the batch prebuilt answer; OOD twin query serves exactly") {
    val in = Files.createTempDirectory("graft_ann_in")
    val out = Files.createTempDirectory("graft_ann_out")
    val ck = Files.createTempDirectory("graft_ann_ck")
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    def drain(): Unit = {
      val q = streaming.AnnStream.serveQuery(spark, in.toString, schema,
        sf, out.toString, ck.toString)
      assert(q.awaitTermination(120000))
    }
    // drop 1: two of the standard query vectors; drop 2: the other
    // three PLUS an out-of-corpus arrival that is an exact twin of
    // corpus vector 7 under a fresh id — the serving case (queries
    // are requests, not corpus members)
    emb.filter(col("vec_id") < 2)
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()
    emb.filter(col("vec_id") >= 2 && col("vec_id") < Similarity.NumQueries)
      .unionByName(emb.filter(col("vec_id") === 7)
        .withColumn("vec_id", lit(999999L)))
      .coalesce(1).write.mode("append").parquet(in.toString)
    drain()

    val served = spark.read.parquet(out.toString)
      .select("query_id", "rank", "vec_id", "dot", "nq", "nc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // batch/stream equality on the standard queries: the stream rode
    // the SAME plan over the SAME frozen index, so rows match exactly
    val batch = AnnIndex.annIvfPqPrebuilt(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(served.filter(_._1 < Similarity.NumQueries).sorted.toSeq
      === batch.sorted.toSeq)

    // the OOD twin: cosine-1 top hit (dot² = nq·nc at rank 1 — the
    // index found the vector this request duplicates), full k depth,
    // and its own id never self-matches (it is not a corpus member)
    val ood = served.filter(_._1 == 999999L).sortBy(_._2)
    assert(ood.length === Similarity.TopK)
    val top = ood.head
    assert(top._4 > 0 && top._4 * top._4 === top._5 * top._6,
      s"rank-1 not an exact twin: $top")
    assert(ood.forall(_._3 != 999999L))
  }
}
