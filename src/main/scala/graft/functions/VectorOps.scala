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

  /** Sign-bucket of an embedding under `nPlanes` hyperplanes of table t. */
  def signBucket(emb: Column, t: Int, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { p =>
      val w = typedlit(hyperplane(t, p, dims))
      when(dot(emb, w) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    VecExpressions.register(spark)
}
