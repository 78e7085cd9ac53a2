package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus ingestion with ONLINE near-dedup — the streaming
  * closure of the L2c incremental-dedup loop: every micro-batch of
  * arriving documents is screened against the persisted band-key
  * index ([[graft.operators.Dedup.buildDedupIndex]] layout), duplicate
  * docs are quarantined with their matched partner, and novel docs
  * extend BOTH the kept corpus and the index — so the next batch is
  * screened against everything kept so far, with signature work per
  * batch ∝ batch size, never corpus size.
  *
  * State layout under `statePath` (all three are plain parquet tables
  * partitioned by `batch_id`):
  *   - `corpus/`  (doc_id, text)           — kept (novel) docs
  *   - `index/`   (doc_id, band_key)       — their LSH band keys
  *   - `dups/`    (doc_id, dup_of, n_common, jaccard) — quarantine log
  *
  * EXACTLY-ONCE: the same idempotent recipe as
  * [[EventsStreaming.warehouseSinkExactlyOnce]] — each batch lands in
  * its own `batch_id=N` partition with mode=overwrite, and every READ
  * of prior state filters `batch_id < N`, so a replayed batch sees
  * exactly the state its first attempt saw and overwrites its own
  * output instead of appending a duplicate (ingestBatch is
  * deterministic in (rows, batchId) — spec-asserted by double-apply).
  *
  * Arrival order inside a batch is doc_id order (the cross-batch
  * order is batch order); a delta doc's chosen partner is an indexed
  * doc first, then the earliest same-batch doc. A same-batch partner
  * may itself have been quarantined (both collided with nothing
  * indexed but with each other) — the kept corpus stays dup-free
  * either way. */
object CorpusIngest {

  /** Apply one micro-batch to the dedup state — deterministic and
    * idempotent per (batch rows, batchId). Public so a batch backfill
    * can drive the exact same code path as the stream. */
  def ingestBatch(batch: DataFrame, batchId: Long, statePath: String): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))

    def priorState(sub: String, schemaOf: DataFrame): DataFrame = {
      val root = new org.apache.hadoop.fs.Path(s"$statePath/$sub")
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(root))
        spark.read.parquet(root.toString)
          .filter(col("batch_id") < batchId).drop("batch_id")
      else schemaOf.limit(0)
    }

    val emptyDocs = docs.limit(0)
    val corpus = priorState("corpus", emptyDocs)
    val oldKeys = priorState("index",
      emptyDocs.select(col("doc_id"), lit("").as("band_key")))

    val dups = Dedup.screenDelta(oldKeys, corpus, docs)
    dups.write.mode("overwrite").parquet(s"$statePath/dups/batch_id=$batchId")

    val novel = docs.join(
      spark.read.parquet(s"$statePath/dups/batch_id=$batchId").select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    novel.write.mode("overwrite").parquet(s"$statePath/corpus/batch_id=$batchId")
    // index keys come off the MATERIALIZED corpus partition (one read
    // of batch-sized output) rather than re-running the novel plan
    Dedup.buildDedupIndex(
      spark.read.parquet(s"$statePath/corpus/batch_id=$batchId"),
      s"$statePath/index/batch_id=$batchId")
  }

  /** Start the ingestion stream over a (doc_id, text) source. */
  def start(docs: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, statePath)
      }
      .start()
}
