package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Remaining analytics families (SURVEY.md §2.2): exact interpolated
  * quantiles (A15) and set operations INTERSECT/EXCEPT (A16). Both
  * sort-free on the Spark side beyond what the semantics require:
  * percentile is a per-group aggregate (no global sort), and the set
  * ops are hash-based distinct joins.
  */
object SetQuantile {

  val defs: Seq[QueryDef] = Seq(

    // A15 — exact interpolated quantiles per group (linear interp,
    // the same definition as DuckDB's quantile_cont).
    QueryDef(
      "events_quantiles",
      """SELECT event_type,
        |       floor(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 AS p50,
        |       floor(quantile_cont(value, 0.9) * 1000000.0) / 1000000.0 AS p90,
        |       COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          quant6(expr("percentile(value, 0.5)")).as("p50"),
          quant6(expr("percentile(value, 0.9)")).as("p90"),
          countAll.as("n"))
    },

    // A16 — set operations over customer activity years. Year filters
    // are HALF-OPEN TIMESTAMP RANGES, not year(): wrapping the column
    // in a function defeats parquet predicate pushdown, so every
    // variant would scan all of orders (PlanSpec asserts PushedFilters).
    QueryDef(
      "set_ops",
      """SELECT
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') AS n_1997,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |                         INTERSECT
        |                         SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01') t) AS n_both,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |                         EXCEPT
        |                         SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01') t) AS n_churned""".stripMargin) {
      (spark, dir) =>
        val o = Tables.orders(spark, dir)
        def custsIn(y: Int) = o.filter(
          col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp")
            && col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        val c97 = custsIn(1997)
        val c98 = custsIn(1998)
        val n97 = c97.agg(count(lit(1)).as("n_1997"))
        val nBoth = c97.intersect(c98).agg(count(lit(1)).as("n_both"))
        val nChurned = c97.except(c98).agg(count(lit(1)).as("n_churned"))
        n97.crossJoin(nBoth).crossJoin(nChurned)
    })
}
