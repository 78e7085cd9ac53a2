package graft

import graft.functions.{VecCosine, VecDot, VecDotI8}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions, so a
  * cluster deployment gets `vec_dot` / `vec_cosine` / `vec_dot_i8`
  * and the bloom build/probe pair in plain SQL via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (the same builders VecExpressions.register installs per-session for
  * library use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecCosine(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot_i8"),
      new ExpressionInfo(classOf[VecDotI8].getName, "vec_dot_i8"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotI8(exprs(0), exprs(1))))
    // Spark's own bloom pair, promoted out of the catalyst-internal
    // registry (they power AQE runtime filters but are invisible to
    // SQL) — the decontamination bloom pre-filter needs both
    e.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
