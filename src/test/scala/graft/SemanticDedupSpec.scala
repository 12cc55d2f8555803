package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** #148 dedup_semantic (SemDeDup, Abbas et al. 2023): structural
  * invariants the DuckDB hash-match can't articulate — the kept set's
  * within-cluster independence, dropped-row soundness, and exact
  * agreement of the gate with #32 dedup_embedding's pair set. */
class SemanticDedupSpec extends SparkSpec {

  private def quantize(e: Seq[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 1000).toLong).toArray
  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def nrm(a: Array[Long]): Long = dot(a, a)
  private def gate(a: Array[Long], b: Array[Long]): Boolean = {
    val d = dot(a, b)
    d >= 0 && 400L * d * d >= 49L * nrm(a) * nrm(b)
  }

  test("dedup_semantic: every vector verdicted once; kept sets are within-cluster independent; drops are sound") {
    val out = Similarity.dedupSemantic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1))).toMap
    // partition: one verdict per embedding row, kept ∈ {0,1}
    assert(out.length === vecs.size)
    assert(out.map(_._1).distinct.length === vecs.size)
    assert(out.forall(t => t._3 == 0 || t._3 == 1))
    val byCluster = out.groupBy(_._2)
    // clusters small enough that the keeper cap never bound here —
    // the independence invariant is exact
    assert(byCluster.values.map(_.length).max <= Similarity.SemKeeperCap)
    byCluster.values.foreach { members =>
      val kept = members.filter(_._3 == 1).map(_._1)
      // independence: no two survivors of one cluster pass the gate
      // (the earlier-ranked would have dropped the later)
      for (i <- kept.indices; j <- i + 1 until kept.length)
        assert(!gate(vecs(kept(i)), vecs(kept(j))),
          s"kept pair ${kept(i)},${kept(j)} passes the cosine gate")
      // soundness: every dropped member has a same-cluster duplicate
      members.filter(_._3 == 0).foreach { case (v, _, _) =>
        assert(members.exists(m => m._1 != v && gate(vecs(m._1), vecs(v))),
          s"dropped $v has no duplicate in its cluster")
      }
    }
    // at least something survives and (on this corpus, which carries
    // near-dup pairs by construction) something is dropped
    assert(out.count(_._3 == 1) > 0)
    assert(out.count(_._3 == 0) > 0)
  }

  test("dedup_semantic agrees with the exact pair set: drops only real #32 duplicates, and finds every same-cluster one") {
    val verdicts = Similarity.dedupSemantic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val cluster = verdicts.map(t => t._1 -> t._2).toMap
    val dropped = verdicts.filter(_._3 == 0).map(_._1).toSet
    val exactPairs = Dedup.dedupEmbedding(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inExactPair = exactPairs.flatMap(p => Seq(p._1, p._2)).toSet
    // precision 1.0: the gate is shared, so a dropped vector is a
    // member of at least one exact duplicate pair
    dropped.foreach(v =>
      assert(inExactPair.contains(v), s"dropped $v is in no exact pair"))
    // completeness within clustering: an exact pair the clustering
    // co-locates loses exactly one side (SemDeDup's recall loss is
    // ONLY cluster splits, never a missed in-cluster pair)
    exactPairs.filter(p => cluster(p._1) == cluster(p._2)).foreach { p =>
      assert(dropped.contains(p._1) || dropped.contains(p._2),
        s"co-clustered exact pair $p fully survived")
    }
  }
}
