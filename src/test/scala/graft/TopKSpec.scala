package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKPerKey whole-plan operator (SURVEY §2 #74). */
class TopKSpec extends SparkSpec {

  test("topK equals the window row_number formulation on real data") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val viaTopK = plans.TopKPerKey.topK(docs,
      Seq(col("source")), Seq(col("n_chars").desc, col("doc_id")), 5)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaWindow = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaTopK.toSeq === viaWindow.toSeq)
  }

  test("physical plan: partial + final heaps around one exchange, no sort of the data") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val df = plans.TopKPerKey.topK(docs,
      Seq(col("source")), Seq(col("n_chars").desc, col("doc_id")), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    // the win over the window formulation: no Sort operator anywhere
    assert(!plan.contains("Sort "), plan)
  }

  test("hot key: one group with 20k rows still yields exactly k, correctly") {
    import spark.implicits._
    val skewed = (1 to 20000).map(i => ("hot", i.toLong))
      .++(Seq(("cold", 1L), ("cold", 2L)))
      .toDF("key", "v").repartition(8)
    val out = plans.TopKPerKey.topK(skewed,
      Seq(col("key")), Seq(col("v")), 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(out.toSeq === Seq(("cold", 1L), ("cold", 2L),
      ("hot", 1L), ("hot", 2L), ("hot", 3L)))
  }

  test("partial flush-on-cap never drops a winner") {
    import spark.implicits._
    // more distinct keys in one partition than MaxBufferedKeys forces
    // the flush path at a tiny cap via the heap helper directly
    val rows = (1 to 1000).flatMap(i => Seq((s"k$i", i.toLong), (s"k$i", i + 1000L)))
    val df = rows.toDF("key", "v").coalesce(1)
    val schema = df.queryExecution.analyzed.output
    val iter = df.queryExecution.toRdd.mapPartitions { it =>
      plans.TopKHeap.topKPerKey(it,
        Seq(schema.head), Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          schema(1), org.apache.spark.sql.catalyst.expressions.Ascending)),
        k = 1, schema, maxKeys = 7, sortedEmit = false)
        .map(_.copy())
    }.collect()
    // flushes emitted intermediate winners; each key's true best must
    // still be present among the emitted rows
    val best = iter.groupBy(_.getUTF8String(0).toString)
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).min }
    assert(best.size === 1000)
    (1 to 1000).foreach(i => assert(best(s"k$i") === i.toLong))
  }

  test("corpus_domain_topk matches corpus_domain_cap's kept set") {
    val topk = SparkEntry.queries("corpus_domain_topk")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val window = SparkEntry.queries("corpus_domain_cap")(spark, sf)
      .filter(col("kept") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(topk === window)
  }
}
