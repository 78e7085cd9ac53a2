package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** L12: the multimodal binary-column plumbing. The decode itself is a
  * deterministic stub (no codecs in the container); schema, batching,
  * and the mapPartitions seam are the real thing under test. */
class MultimodalSpec extends SparkSuite {

  test("attachMedia produces binary payload + typed metadata") {
    val df = Multimodal.attachMedia(spark, sf0001)
    val schema = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    assert(schema("fmt") === "string")
    assert(schema("width") === "int" && schema("height") === "int")
    assert(df.count() === 500)
    assert(df.filter(col("width") < 64 || col("height") < 48).count() === 0)
  }

  test("decodeStub is deterministic and batched per partition") {
    import spark.implicits._
    val media = Multimodal.attachMedia(spark, sf0001)
      .select(col("doc_id"), col("payload"), col("fmt"), col("width"), col("height"))
      .as[Multimodal.MediaRow]
    val out1 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    assert(out1.length === 500)
    assert(out1.map(_.checksum).toSeq === out2.map(_.checksum).toSeq)
    assert(out1.forall(_.features.length === 4))
    assert(out1.forall(r => r.n_bytes > 0))
  }

  test("sampleChunks explodes payloads into strided fixed-size chunks") {
    val media = Multimodal.attachMedia(spark, sf0001)
    val chunks = Multimodal.sampleChunks(media, chunkBytes = 32, stride = 2)
    assert(chunks.columns.toSeq === Seq("doc_id", "fmt", "chunk_idx", "chunk"))
    assert(chunks.filter(pmod(col("chunk_idx"), lit(2)) =!= 0).count() === 0)
    assert(chunks.count() > 500) // at least one sampled chunk per doc
  }
}
