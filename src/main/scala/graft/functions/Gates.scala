package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{assert_true, concat, lit}

/** In-plan quality gates for the audit queries (r9 verdict #3: the
  * audits — dedup_audit, ann_audit, semantic_assign_audit — REPORTED
  * agreement/recall but nothing failed when they degraded; a silent
  * quality regression would ship a bad number instead of turning the
  * round red).
  *
  * The gate is part of the RETURNED PLAN, not a driver-side check:
  * each floor becomes a `filter(assert_true(cond, msg) IS NULL)` over
  * the one-row audit result — `assert_true` yields NULL when the
  * condition holds (so the filter keeps every row and the output
  * schema/content are byte-identical to the ungated query) and aborts
  * the whole job with `msg` when it does not (a FALSE or NULL
  * condition both throw — callers guard denominators explicitly so an
  * empty-universe NULL ratio reads as "nothing to audit", not a
  * failure). Because the gate rides the plan, EVERY execution path
  * enforces it: the driver's Verify run, the bench, a user calling
  * the query — no separate monitoring job to forget.
  *
  * Floors are COLLAPSE detectors, not aspirational targets: they sit
  * far from every healthy measurement but far above (or, for ceiling
  * metrics, far below) what a broken implementation produces (random
  * routing pays ≈ the full best-cosine mass in regret; a dead
  * candidate stage ≈ 0 recall). A gated metric must also be
  * SCALE-STABLE — the r10 lesson: exact-cell agreement decays with
  * K by construction (0.76 at sf0.01 → 0.168 at 100×), so its fixed
  * 0.5 floor false-fired at sf0.1 and was replaced by the routing
  * regret ceiling (Similarity.AssignRegretCeiling). The per-scale
  * quality FLOORS stay in ScaleSpec where the sample is big enough
  * to make them tight.
  */
object Gates {

  /** Append floor checks to `df`'s plan; rows flow through unchanged
    * while every condition holds, and execution aborts with the
    * gate's message (value included) the moment one does not. */
  def floors(df: DataFrame, checks: (Column, Column)*): DataFrame =
    checks.foldLeft(df) { case (d, (cond, msg)) =>
      d.filter(assert_true(cond, msg).isNull)
    }

  /** Standard message: "<query>: <metric> below floor <f>, got <value>". */
  def msg(query: String, metric: String, floor: Double, value: Column): Column =
    concat(lit(s"$query audit gate: $metric below floor $floor, got "),
      value.cast("string"))

  /** Ceiling twin for metrics where HIGH is broken (routing regret). */
  def msgCeil(query: String, metric: String, ceiling: Double, value: Column): Column =
    concat(lit(s"$query audit gate: $metric above ceiling $ceiling, got "),
      value.cast("string"))
}
