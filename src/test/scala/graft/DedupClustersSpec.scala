package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** L2-terminal: pair → cluster resolution (min-label propagation). */
class DedupClustersSpec extends SparkSuite {

  private def pairsDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  test("a chain component resolves to its minimum id within the round bound") {
    // diameter 7 — near the PropagationRounds=8 bound on purpose
    val chain = pairsDf((1L to 7L).map(i => (i, i + 1)): _*)
    val labels = Dedup.clusterLabels(chain).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to 8L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate cluster ids") {
    val labels = Dedup.clusterLabels(pairsDf((10L, 20L), (20L, 15L), (30L, 40L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(10L -> 10L, 20L -> 10L, 15L -> 10L, 30L -> 30L, 40L -> 30L))
  }

  test("dedup_clusters covers the whole corpus with one kept doc per cluster") {
    val df = SparkEntry.queries("dedup_clusters")(spark, sf0001).cache()
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(df.count() === nDocs) // every doc is assigned, dup or not
    // exactly one kept doc per cluster, and it is the cluster minimum
    val byCluster = df.groupBy("cluster_id")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("n_kept"),
        min("doc_id").as("min_doc"))
    assert(byCluster.filter(col("n_kept") =!= 1).count() === 0)
    assert(byCluster.filter(col("min_doc") =!= col("cluster_id")).count() === 0)
    // the corpus actually contains duplicates → at least one multi-doc cluster
    assert(df.filter(!col("kept")).count() > 0)
  }
}
