package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns with codegen'd builtins
  * (`zip_with` + `aggregate` fold left-to-right — deterministic
  * summation order, unlike a shuffle-order-dependent SQL SUM).
  *
  * Used by the embedding operators (SURVEY.md §2.3 L5–L7). A custom
  * Catalyst Expression with doGenCode is the next optimization step if
  * the fold shows up in profiles; semantics stay identical.
  */
object VectorOps {

  /** Reference fold forms (interpreted HigherOrderFunctions). Kept for
    * spec-level cross-checks against the codegen'd expressions. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def foldCosine(a: Column, b: Column): Column =
    foldDot(a, b) / (sqrt(foldDot(a, a)) * sqrt(foldDot(b, b)))

  /** Codegen'd fast paths (VecDot/VecCosine); the caller must have run
    * VecExpressions.register(spark) once per session. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)

  /** Deterministic pseudo-random hyperplane: component d of plane
    * (table t, plane p) = md5("plane_t_p_d")[0:6] / 16^6 - 0.5.
    * Bit-reproducible in DuckDB as
    * ('0x'||substr(md5('plane_'||t||'_'||p||'_'||d),1,6))::BIGINT/16777216.0-0.5. */
  def hyperplane(t: Int, p: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      java.lang.Long.parseLong(Portable.md5Hex(s"plane_${t}_${p}_${d}").substring(0, 6), 16)
        .toDouble / 16777216.0 - 0.5
    }

  /** md5-derived coordinate pair (i, j), i ≠ j, for the sparse
    * comparison plane (table t, plane p): i uniform over [0, dims),
    * j uniform over the remaining dims-1 coordinates. Mirrors in SQL as
    * `('0x'||substr(md5('pair_t_p_a'),1,6))::BIGINT % dims` (and `_b`
    * over dims-1 with the ≥-shift). */
  def sparsePair(t: Int, p: Int, dims: Int): (Int, Int) = {
    val i = (java.lang.Long.parseLong(
      Portable.md5Hex(s"pair_${t}_${p}_a").substring(0, 6), 16) % dims).toInt
    val j0 = (java.lang.Long.parseLong(
      Portable.md5Hex(s"pair_${t}_${p}_b").substring(0, 6), 16) % (dims - 1)).toInt
    (i, if (j0 >= i) j0 + 1 else j0)
  }

  /** Sign-bucket of an embedding under `nPlanes` planes of table t.
    *
    * Planes below `densePlanes` are the md5 hyperplanes (one dims-wide
    * dot each). Planes at or past it are SPARSE hyperplanes e_i − e_j
    * with md5-chosen coordinates — `sign(v[i] − v[j])`, an O(1)
    * comparison of two stored values instead of an O(dims) dot. The
    * self-join LSH path (dedup_embed) grows its bucket count with the
    * corpus to hold occupancy constant; with every plane dense that
    * made per-vector work Θ(log N)·dims (measured 122× wall at 100×
    * data). Capping the dense planes keeps per-vector hashing work
    * CONSTANT as buckets double: extra bits cost one double-compare.
    * Sparse bits are weaker splitters per bit than dense ones for
    * arbitrary angles, but for the near-duplicate pairs the self-join
    * must keep (cosine ≥ threshold) the compared coordinates are
    * nearly equal on both sides, so a planted near-dup flips a sparse
    * bit only when |v_i − v_j| is inside the perturbation — recall is
    * spec-measured (ScaleSpec). A degenerate corpus where one md5
    * pair's coordinates tie everywhere costs one bit of one table
    * (occupancy 2×), never correctness: the cosine verify is exact. */
  def signBucket(emb: Column, t: Int, nPlanes: Int, dims: Int,
      densePlanes: Int = Int.MaxValue): Column =
    (0 until nPlanes).map { p =>
      if (p < densePlanes) {
        val w = typedlit(hyperplane(t, p, dims))
        when(dot(emb, w) > 0, lit(1 << p)).otherwise(lit(0))
      } else {
        val (i, j) = sparsePair(t, p, dims)
        when(element_at(emb, i + 1) > element_at(emb, j + 1), lit(1 << p))
          .otherwise(lit(0))
      }
    }.reduce(_ + _)

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    VecExpressions.register(spark)
}
