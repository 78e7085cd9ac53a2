package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KLL quantile sketches (SURVEY §2.2 A14, the percentile
  * leg): the pre-aggregated sketch-table pattern a 100 TB warehouse
  * runs for distincts (`hll_sketch_agg` per day partition +
  * `hll_union_agg` rollup) applied to QUANTILES — store ONE fixed-size
  * Datasketches KLL per day partition, answer any cross-partition
  * percentile question by UNIONING sketches, never by re-scanning raw
  * events. Spark ships the HLL pair as SQL functions but no KLL
  * aggregate, so these are typed `Aggregator`s over the BUNDLED
  * datasketches-java KLL (the same library the HLL functions use),
  * registered as `kll_agg` / `kll_union_agg` / `kll_quantile`.
  *
  * KLL (Karnin–Lang–Liberty, FOCS 2016) guarantees RANK error — at
  * k=200, ±1.65% with 99% confidence, independent of stream size —
  * and is fully mergeable: the union of per-partition partials carries
  * the same guarantee as a direct single-pass build, which is the
  * whole point of storing partials. The sketch buffer rides Spark's
  * partial-aggregation machinery as compact bytes (serialize on
  * exchange only; within a partition the heap sketch updates in
  * place), so a day's sketch is a few KB at any event volume.
  *
  * Beside the EXACT seats, not replacing them: `events_quantiles` /
  * `user_quantiles` stay the oracle-checked truth (SURVEY §4 — a
  * sketch estimate is not hashable cross-engine), these are the
  * *test-only* scale twins, spec-bounded against exact ranks in
  * ExtensionsSpec (the A14 HLL precedent). */
object QuantileSketch {

  /** k=200 — the Datasketches default accuracy/size point: ±1.65%
    * rank error at 99% confidence, ~3 KB compact at n=10⁶. */
  val DefaultK = 200

  private def empty(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(DefaultK)
  private def heapify(b: Array[Byte]): KllDoublesSketch =
    if (b == null || b.isEmpty) empty() else KllDoublesSketch.heapify(Memory.wrap(b))

  /** Build a KLL sketch over a double column. The buffer round-trips
    * through compact bytes between reduce calls — byte-array buffers
    * are what `Aggregator` can encode losslessly (Encoders.BINARY);
    * the heapify/update/serialize cycle is the price of mergeability
    * through Spark's aggregation buffers, linear per row at sketch
    * size (a few KB), and only the partial path pays it. */
  class BuildAgg extends Aggregator[Double, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(buf: Array[Byte], v: Double): Array[Byte] = {
      val s = heapify(buf); s.update(v); s.toByteArray
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { val s = heapify(a); s.merge(heapify(b)); s.toByteArray }
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union stored sketches — the rollup side: GROUP BY / window over a
    * sketch TABLE, no raw re-scan. Empty inputs union to the empty
    * sketch (a partition with no rows contributes nothing). */
  class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(buf: Array[Byte], v: Array[Byte]): Array[Byte] =
      if (v == null || v.isEmpty) buf
      else if (buf.isEmpty) v
      else { val s = heapify(buf); s.merge(heapify(v)); s.toByteArray }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = reduce(a, b)
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Register `kll_agg(value)`, `kll_union_agg(sketch)` and
    * `kll_quantile(sketch, rank)` with the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("kll_agg",
      org.apache.spark.sql.functions.udaf(new BuildAgg, Encoders.scalaDouble))
    spark.udf.register("kll_union_agg",
      org.apache.spark.sql.functions.udaf(new UnionAgg, Encoders.BINARY))
    spark.udf.register("kll_quantile",
      (b: Array[Byte], rank: Double) =>
        if (b == null || b.isEmpty) Double.NaN else heapify(b).getQuantile(rank))
    ()
  }
}
