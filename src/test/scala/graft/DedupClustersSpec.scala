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
    // diameter 16 — the documented bound (pointer jumps double the
    // covered distance per round on an ascending chain)
    val chain = pairsDf((1L to 16L).map(i => (i, i + 1)): _*)
    val labels = Dedup.clusterLabels(chain).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to 17L).map(_ -> 1L).toMap)
  }

  test("an adversarially permuted chain still resolves within the rounds") {
    // same 17-node chain but ids deliberately scrambled so the min sits
    // mid-chain and pointer targets zig-zag — the layout where naive
    // doubling arguments are weakest
    val ids = Seq(9L, 3L, 14L, 1L, 12L, 6L, 17L, 2L, 10L, 5L, 16L, 4L, 13L, 8L, 15L, 7L, 11L)
    val chain = pairsDf(ids.zip(ids.tail).map { case (a, b) => (math.min(a, b), math.max(a, b)) }: _*)
    val labels = Dedup.clusterLabels(chain).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === ids.map(_ -> 1L).toMap)
  }

  test("the hot-bucket cap drops boilerplate floods; sub-cap buckets still pair") {
    // the 100 TB guard made observable: a band bucket holding more
    // docs than MaxBucketDocs (200) fans out quadratically and carries
    // no NEAR-dup signal (such floods are exact dups — L1's job), so
    // LSH must drop it; the same corpus under the cap must produce
    // every pair
    import spark.implicits._
    def corpus(n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
      (1 to n).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    assert(Dedup.minhashPairs(spark, corpus(250)).count() === 0,
      "an over-cap bucket must be dropped before the self-join")
    assert(Dedup.minhashPairs(spark, corpus(100)).count() === 100L * 99 / 2,
      "a sub-cap bucket must yield every verified pair")
  }

  test("a chain past the fixed-round bound converges via the adaptive tail") {
    // diameter 40 outruns the 5 fixed rounds (2^5 = 32 on ascending
    // chains); the fixpoint check must detect it and buy the extra
    // rounds instead of shipping silently split clusters
    val chain = pairsDf((1L to 40L).map(i => (i, i + 1)): _*)
    val labels = Dedup.clusterLabels(chain).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to 41L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate cluster ids") {
    val labels = Dedup.clusterLabels(pairsDf((10L, 20L), (20L, 15L), (30L, 40L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(10L -> 10L, 20L -> 10L, 15L -> 10L, 30L -> 30L, 40L -> 30L))
  }

  test("clusterLabels frees every superseded checkpoint and never sweeps caller caches") {
    // each round localCheckpoints; superseded rounds must release
    // their block-manager storage (only the RETURNED labels checkpoint
    // may stay), and the freeing must target exactly the operator's
    // own checkpoint RDDs — a pre-existing caller cache survives
    val sc = spark.sparkContext
    val base = pairsDf((1L to 100L).map(i => (i, i + 1)): _*).cache()
    base.count() // caller-owned, materialized cache
    val before = sc.getPersistentRDDs.keySet
    Dedup.clusterLabels(base).count()
    val fresh = sc.getPersistentRDDs.keySet -- before
    assert(fresh.size <= 1, s"leaked ${fresh.size} checkpoint RDD block sets")
    assert(base.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the caller's cache must survive clusterLabels")
    base.unpersist()
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
    // CONVERGENCE is asserted, not assumed: the fixed PropagationRounds
    // bound silently mislabels if a component's diameter exceeds it, and
    // the fixpoint test is one tiny self-join — a row whose label's own
    // label differs is an unconverged chain
    val l = df.select(col("doc_id").as("b_doc"), col("cluster_id").as("b_lbl"))
    val unconverged = df
      .join(l, col("cluster_id") === col("b_doc"))
      .filter(col("b_lbl") =!= col("cluster_id")).count()
    assert(unconverged === 0, s"$unconverged labels did not reach their fixpoint")
  }
}
