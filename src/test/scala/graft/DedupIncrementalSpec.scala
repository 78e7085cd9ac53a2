package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** L2c: incremental near-dedup — delta batch screened against the
  * persisted band-key index without re-signaturing the corpus. The
  * delta is the FIXED md5-order [[Dedup.deltaIds]] sample (SURVEY §5:
  * never a corpus fraction), recomputed driver-side here so the tests
  * pin the sample definition itself, not just its consequences. */
class DedupIncrementalSpec extends SparkSuite {

  private def inlineVerdict() =
    SparkEntry.queries("dedup_incremental")(spark, sf0001)

  /** The fixed delta sample, recomputed driver-side (md5('d' || id)
    * order, first DeltaSample ids). */
  private lazy val deltaSet: Set[Long] = {
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.sortBy(id => (graft.functions.Portable.md5Hex("d" + id), id))
      .take(Dedup.DeltaSample).toSet
  }

  private def corpusDocs() =
    sources.Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))

  test("the index-backed run is output-identical to an independently built index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    val delta = deltaSet
    Dedup.buildDedupIndex(corpusDocs().filter(!col("doc_id").isin(delta.toSeq: _*)), dir)
    val fromIndex = Dedup.incrementalFromIndex(spark, sf0001, dir)
      .collect().map(_.toSeq).toSet
    val seat = inlineVerdict().collect().map(_.toSeq).toSet
    assert(fromIndex === seat)
    assert(fromIndex.nonEmpty, "the sf0.001 corpus must contain delta duplicates")
  }

  test("the index-backed plan reads band keys from the index, not the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx2").toString
    val delta = deltaSet
    Dedup.buildDedupIndex(corpusDocs().filter(!col("doc_id").isin(delta.toSeq: _*)), dir)
    val plan = Dedup.incrementalFromIndex(spark, sf0001, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir), "corpus band keys must come from the index parquet scan")
  }

  test("the delta sample is fixed-size and every verdict row obeys arrival order") {
    assert(deltaSet.size === Dedup.DeltaSample)
    val rows = inlineVerdict().collect()
    rows.foreach { r =>
      val (doc, dup) = (r.getLong(0), r.getLong(1))
      assert(deltaSet.contains(doc), s"doc $doc is not in the delta batch")
      assert(!deltaSet.contains(dup) || dup < doc,
        s"partner $dup of $doc is neither indexed nor an earlier delta doc")
      assert(r.getDouble(3) >= 0.7)
    }
  }

  test("the verdict agrees with the full-corpus pair relation") {
    // restriction consistency: a delta doc is reported IFF the full
    // minhash pipeline verifies some pair linking it to an earlier
    // doc, and the chosen partner is the (indexed-first, min-id) best
    val delta = deltaSet
    val pairs = Dedup.minhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directed = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a) // (partner, doc)
    }.filter { case (p, d) => delta.contains(d) && (!delta.contains(p) || p < d) }
    val expected = directed.groupBy(_._2).map { case (d, ps) =>
      d -> ps.map(_._1).minBy(p => (if (delta.contains(p)) 1 else 0, p))
    }
    val got = inlineVerdict().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
