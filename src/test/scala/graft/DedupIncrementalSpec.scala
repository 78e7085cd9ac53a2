package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** L2c: incremental near-dedup — delta batch screened against the
  * persisted band-key index without re-signaturing the corpus. */
class DedupIncrementalSpec extends SparkSuite {

  private def inlineVerdict() =
    SparkEntry.queries("dedup_incremental")(spark, sf0001)

  test("the index-backed run is output-identical to the inline query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    val old = sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 5 =!= 0)
    Dedup.buildDedupIndex(old, dir)
    val fromIndex = Dedup.incrementalFromIndex(spark, sf0001, dir)
      .collect().map(_.toSeq).toSet
    val inline = inlineVerdict().collect().map(_.toSeq).toSet
    assert(fromIndex === inline)
    assert(fromIndex.nonEmpty, "the sf0.001 corpus must contain delta duplicates")
  }

  test("the index-backed plan reads band keys from the index, not the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx2").toString
    Dedup.buildDedupIndex(
      sources.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 =!= 0), dir)
    val plan = Dedup.incrementalFromIndex(spark, sf0001, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir), "corpus band keys must come from the index parquet scan")
  }

  test("every verdict row is a delta doc matched to a genuinely earlier partner") {
    val rows = inlineVerdict().collect()
    rows.foreach { r =>
      val (doc, dup) = (r.getLong(0), r.getLong(1))
      assert(doc % 5 === 0, s"doc $doc is not in the delta batch")
      assert(dup % 5 != 0 || dup < doc,
        s"partner $dup of $doc is neither indexed nor an earlier delta doc")
      assert(r.getDouble(3) >= 0.7)
    }
  }

  test("the verdict agrees with the full-corpus pair relation") {
    // restriction consistency: a delta doc is reported IFF the full
    // minhash pipeline verifies some pair linking it to an earlier
    // doc, and the chosen partner is the (indexed-first, min-id) best
    val pairs = Dedup.minhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directed = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a) // (partner, doc)
    }.filter { case (p, d) => d % 5 == 0 && (p % 5 != 0 || p < d) }
    val expected = directed.groupBy(_._2).map { case (d, ps) =>
      d -> ps.map(_._1).minBy(p => (if (p % 5 == 0) 1 else 0, p))
    }
    val got = inlineVerdict().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
