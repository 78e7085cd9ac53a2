package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic LABEL-CORRELATED embedding corpus — the fixture the
  * dyn-K IVF measurements need next to the random ScaleUp tiles (r14
  * verdict task 1): isotropic random vectors are IVF's worst case (no
  * cluster structure for centroids to find — every Voronoi cell
  * boundary cuts through uniform mass, so probed-cell recall decays
  * with K no matter how the centroids are placed), while real text /
  * image embeddings are heavily clustered — the SemDeDup regime the
  * index family is built for. Without this fixture, "real embeddings
  * behave better" stays an assertion; with it, it is a measured row
  * in IVF_DYNK_R15.json and a ScaleSpec contract.
  *
  * Geometry: `clusters` md5-derived centers, components uniform in
  * [-1, 1]; vector t belongs to cluster (t % clusters) and is its
  * center plus per-(vector, component) uniform noise scaled by
  * `noise`. All randomness is md5 hashes of (role, id, component) —
  * no RNG state, so the corpus is reproducible from its parameters
  * alone and generation is one embarrassingly-parallel projection
  * over spark.range (no driver-side data). Returns (vec_id BIGINT,
  * label BIGINT, v ARRAY<DOUBLE>) — the embV shape every Similarity
  * path consumes, plus the planted label for recall-vs-structure
  * analysis. */
object ClusteredFixture {

  /** md5-derived uniform in [-1, 1] from a seed-string SQL expression:
    * first 8 hex chars as an integer over 2^32, affine to [-1, 1]. */
  private def u(seedSql: String): String =
    s"(CAST(conv(substring(md5($seedSql), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0 * 2.0 - 1.0)"

  def generate(spark: SparkSession, n: Long, dims: Int = 64,
      clusters: Int = 400, noise: Double = 0.25): DataFrame = {
    val center = u(s"concat('c_', CAST(vec_id % $clusters AS STRING), '_', CAST(j AS STRING))")
    val jitter = u(s"concat('n_', CAST(vec_id AS STRING), '_', CAST(j AS STRING))")
    // components stay INSIDE the SQ8 quantizer's design range: center +
    // noise·jitter spans [-(1+noise), 1+noise], and floor(x·127) clamps
    // at [-128, 127], so the raw sum would saturate a nontrivial
    // fraction of components — the clustered recall measurements would
    // then partly price CLIPPING distortion rather than the near-tie
    // quantization-noise effect the fixture exists to exercise (r15
    // advice). Dividing by (1+noise) rescales the whole corpus
    // uniformly: cosine geometry (cluster structure, near-tie margins
    // RELATIVE to vector norm) is scale-invariant, saturation is gone.
    spark.range(n)
      .select(col("id").as("vec_id"), (col("id") % clusters).as("label"))
      .withColumn("v",
        expr(s"transform(sequence(1, $dims), j -> ($center + $noise * $jitter) / ${1.0 + noise})"))
  }
}
