package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics (SURVEY.md §2.2 A41): weighted PageRank
  * over the nation-level trade graph.
  *
  * Two design decisions carry the 100 TB argument:
  *
  *  - **Aggregate first, iterate second.** The graph's nodes are a
  *    bounded dimension domain (25 nations) but its edge WEIGHTS
  *    summarize the full fact table (who ships to whom, how often).
  *    The expensive part — lineitem⋈orders⋈customer⋈supplier — runs
  *    ONCE as ordinary keyed/broadcast joins into a ≤ |domain|² edge
  *    list; the 5 power iterations then run on that tiny aggregate
  *    (localCheckpoint'd so the fact join is not re-planned per
  *    iteration). Corpus-scale iteration machinery — bounded rounds +
  *    pointer jumping + checkpoint hygiene — lives in dedup_clusters;
  *    this operator is the OTHER standard shape: centrality on an
  *    aggregated entity graph.
  *
  *  - **Integer mass, not double scores.** PageRank is usually
  *    Σ-of-doubles per node — order-dependent partial sums that can
  *    drift between engines (the Portable.dsum rule). Here each node
  *    starts with BASE = 10⁹ integer mass units and every step is
  *    exact BIGINT arithmetic: contrib(u→v) = (mass·w) div out(u),
  *    new = (15·BASE) div 100 + (85·Σcontrib) div 100. Integer sums
  *    are order-independent, so Spark and DuckDB (``div`` / ``//``,
  *    both truncating for non-negative operands) agree bit-for-bit
  *    after any number of iterations — the oracle replays the same 5
  *    unrolled iterations. Truncation dust and dangling-node decay
  *    are deterministic and identical in both engines (PageRank
  *    normalization is a presentation concern; rank ORDER is the
  *    product). Overflow headroom: mass ≤ ~25·10⁹, w ≤ |lineitem|,
  *    so mass·w stays far below 2⁶³ at any tested SF.
  */
object Graph {

  private val Base = 1000000000L // integer mass per node
  private val Iters = 5

  /** One power iteration in exact integer arithmetic. `nodes` is the
    * 25-row nation key set, `edges` (src, dst, w) with `outw` already
    * attached to each edge's source. */
  private def step(nodes: DataFrame, edges: DataFrame, mass: DataFrame): DataFrame = {
    val in = edges
      .join(mass, col("src") === col("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("(mass * w) div outw")).as("inmass"))
    nodes
      .join(in, col("nkey") === col("dst"), "left")
      .select(col("nkey").as("node"),
        expr(s"${15 * Base / 100} + (85 * coalesce(inmass, cast(0 as bigint))) div 100")
          .as("mass"))
  }

  val defs: Seq[QueryDef] = Seq(

    // A41 — weighted PageRank on the customer-nation → supplier-nation
    // trade graph, 5 iterations, exact integer mass (see object doc).
    QueryDef(
      "trade_pagerank", {
        val edgeCtes =
          s"""edges AS (SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
             |          FROM lineitem
             |          JOIN orders   ON l_orderkey = o_orderkey
             |          JOIN customer ON o_custkey  = c_custkey
             |          JOIN supplier ON l_suppkey  = s_suppkey
             |          GROUP BY 1, 2),
             |ew AS (SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw FROM edges),
             |m0 AS (SELECT n_nationkey AS node, CAST($Base AS BIGINT) AS mass FROM nation)""".stripMargin
        val iterCtes = (1 to Iters).map { i =>
          s"""m$i AS (SELECT n.node,
             |            CAST(${15 * Base / 100} + (85 * COALESCE(c.inmass, 0)) // 100 AS BIGINT) AS mass
             |       FROM (SELECT node FROM m0) n
             |       LEFT JOIN (SELECT e.dst AS node, SUM((m.mass * e.w) // e.outw) AS inmass
             |                  FROM ew e JOIN m${i - 1} m ON e.src = m.node
             |                  GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeCtes,
           |$iterCtes
           |SELECT n_name, mass
           |FROM m$Iters JOIN nation ON node = n_nationkey""".stripMargin
      }) { (spark, dir) =>
      val edges = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(countAll.as("w"))
        // attach each source's total outgoing weight; ≤ |domain|² rows
        .withColumn("outw",
          sum(col("w")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        // the fact join runs ONCE; iterations must not re-plan it
        .localCheckpoint(true)
      val nation = Tables.nation(spark, dir)
      val nodes = nation.select(col("n_nationkey").as("nkey"))
      val m0 = nodes.select(col("nkey").as("node"), lit(Base).as("mass"))
      val mFinal = (1 to Iters).foldLeft(m0)((m, _) => step(nodes, broadcast(edges), m))
      mFinal
        .join(broadcast(nation), col("node") === col("n_nationkey"))
        .select(col("n_name"), col("mass"))
    })
}
