package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

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
  *    product). Overflow headroom: mass ≤ ~25·BASE and w ≤ |lineitem|,
  *    so mass·w needs 25·BASE·|lineitem| < 2⁶³ — with BASE = 10⁹
  *    that holds to |lineitem| ≈ 3.7·10⁸ (every tested SF, ~50 GB of
  *    fact); a 100 TB deployment drops BASE to 10⁶ (mass scales
  *    linearly in BASE, so ranks and relative masses are unchanged;
  *    BASE is resolution, not semantics) or splits the contribution
  *    as (mass div outw)·w at the cost of coarser truncation dust.
  */
object Graph {

  /** Pointer-doubling transitive closure over (node, anc) parent
    * edges: round r extends every known pair with the ancestor's own
    * known ancestors, so covered chain distance doubles per round —
    * `rounds` rounds reach depth 2^rounds exactly. Each round is one
    * keyed self-join + distinct, localCheckpoint'd so lineage stays
    * flat and superseded rounds free their storage.
    *
    * `rounds` is a BUDGET, not a schedule: the closure grows
    * monotonically, so an unchanged pair count after a round means
    * the fixpoint was reached and the remaining rounds would be
    * no-op self-joins — exit instead. The count reads the
    * just-materialized stage (no extra compute), and on a shallow
    * tree (depth d needs only ceil(log2 d) + 1 rounds) this halves
    * the serial job chain; the truncation contract is unchanged —
    * data deeper than 2^rounds still exhausts the budget and is
    * caught by [[closureComplete]]. */
  def ancestorClosure(edges: DataFrame, rounds: Int): DataFrame = {
    var closure = edges.stage()
    var size = closure.count()
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      closure = closure.unionByName(jump(closure)).distinct().stage()
      val grown = closure.count()
      converged = grown == size
      size = grown
    }
    closure
  }

  private def jump(closure: DataFrame): DataFrame =
    closure.as("x")
      .join(closure.as("y"), col("x.anc") === col("y.node"))
      .select(col("x.node").as("node"), col("y.anc").as("anc"))

  /** Pointer-JUMPING path rollup for a single-parent edge set (a
    * forest: every node has at most one `anc`) — the scale form of
    * [[ancestorClosure]] when only per-node aggregates of the chain
    * are wanted, not the pair set. The closure materializes N·depth
    * rows and re-shuffles all of them every round; here each node
    * carries a 4-field state — `ptr` (the furthest ancestor reached,
    * i.e. ancestor #depth), `depth` (ancestors covered), `mn` (min
    * ancestor covered) — and a round substitutes ptr's OWN state
    * (one N-row self-join, no distinct), doubling the covered
    * segment. State stays N rows at every round, so at 100 TB the
    * per-round shuffle is the node table, not the closure.
    *
    * Exits as soon as a round moves no pointer (every chain hit a
    * root — fixpoint); `rounds` bounds the worst case exactly like
    * the closure budget (coverage 2^rounds), and the same loud-
    * failure contract applies: [[forestComplete]] is true iff no
    * ptr is still an internal node. On completion `ptr` IS the
    * root; `mn` equals it when parent ids decrease along chains
    * (this repo's synthesized trees) but stays correct as "min
    * ancestor" for arbitrary id orders.
    *
    * `checkConvergence = false` skips the per-round moved count: the
    * loop runs the full `rounds` budget with ONE job per round
    * instead of two. That is the right mode when the caller can
    * BOUND the depth from the data (part_hierarchy: parent =
    * node div 4 makes depth(n) exactly floor(log4 n), so
    * rounds = ceil(log2 bound) is provably sufficient and the
    * fixpoint probe would only ever confirm it); extra rounds past
    * the fixpoint are no-op substitutions (every ptr is a root,
    * the left join matches nothing), so the result is identical —
    * spec-asserted against the checked form. The moved count stays
    * the default for unknown-depth forests, where it is both the
    * early exit and the [[forestComplete]] truncation signal. */
  def forestRollup(edges: DataFrame, rounds: Int,
      checkConvergence: Boolean = true): DataFrame = {
    var state = edges.select(col("node"), col("anc").as("ptr"),
      lit(1L).as("depth"), col("anc").as("mn")).stage()
    var moved = 1L
    var r = 0
    while (moved > 0 && r < rounds) {
      val t = state.select(col("node").as("t_node"), col("ptr").as("t_ptr"),
        col("depth").as("t_depth"), col("mn").as("t_mn"))
      val next = state.join(t, col("ptr") === col("t_node"), "left")
        .select(col("node"),
          coalesce(col("t_ptr"), col("ptr")).as("ptr"),
          (col("depth") + coalesce(col("t_depth"), lit(0L))).as("depth"),
          least(col("mn"), coalesce(col("t_mn"), col("mn"))).as("mn"),
          col("t_node").isNotNull.as("moved"))
        .stage()
      if (checkConvergence) moved = next.filter(col("moved")).count()
      state = next.drop("moved")
      r += 1
    }
    state
  }

  /** True iff [[forestRollup]]'s budget covered every chain: a ptr
    * still present in the edge set's `node` column is an internal
    * node whose segment was truncated. Same cost order as one round. */
  def forestComplete(state: DataFrame, edges: DataFrame): Boolean =
    state.select(col("ptr")).as("s")
      .join(edges.select(col("node")).as("en"),
        col("s.ptr") === col("en.node"), "left_semi")
      .isEmpty

  /** The DEPTH CONTRACT made checkable: true iff the closure is a
    * fixpoint (one more jump adds no pair), i.e. every chain fit
    * inside the round budget. A fixed-round closure on unknown-depth
    * data runs this once afterwards and fails loudly instead of
    * silently truncating — the dedup_clusters convergence pattern
    * applied to the other iterative operator. One extra self-join +
    * except; same cost order as a single round. */
  def closureComplete(closure: DataFrame): Boolean =
    jump(closure).except(closure).isEmpty

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
        .stage()
      val nation = Tables.nation(spark, dir)
      val nodes = nation.select(col("n_nationkey").as("nkey"))
      val m0 = nodes.select(col("nkey").as("node"), lit(Base).as("mass"))
      val mFinal = (1 to Iters).foldLeft(m0)((m, _) => step(nodes, broadcast(edges), m))
      mFinal
        .join(broadcast(nation), col("node") === col("n_nationkey"))
        .select(col("n_name"), col("mass"))
    },

    // A50 — triangle counting + local clustering coefficient on the
    // brand co-visit graph: brands are linked when their relative
    // co-occurrence support across orders clears an integer threshold
    // (10000·n_ab ≥ 222·n_total ≈ the median support — halves the
    // complete brand graph into real structure; rational arithmetic,
    // no FP boundary), and each node reports how many of its
    // neighbor pairs are themselves linked — the community-density
    // signal recommendation and fraud graphs read. Same
    // aggregate-first discipline as trade_pagerank: the fact join
    // collapses to a ≤|brands|² edge list ONCE, all triangle work
    // runs on that bounded aggregate. Enumeration is the ordered
    // node-iterator: every triangle x<y<z found exactly once as a
    // wedge at its SMALLEST node (pairs of higher neighbors, keyed on
    // x) closed by a semi-join against the edge set — fan-out is
    // C(higher-degree, 2), never |V|³; at a 100 TB entity graph the
    // same shape orients by DEGREE instead of id (Schank-Wagner),
    // bounding wedge fan-out by O(√E) with zero plan changes. The
    // oracle enumerates the same x<y<z triples by brute three-way
    // join — two algorithms, one answer.
    QueryDef(
      "graph_triangles",
      s"""WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
         |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_total FROM ob),
         |pr AS (SELECT a.b AS ba, bb.b AS bb2, COUNT(*) AS n_ab
         |       FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
         |       GROUP BY 1, 2),
         |e AS (SELECT ba AS a, bb2 AS b FROM pr
         |      WHERE 10000 * n_ab >= 222 * (SELECT n_total FROM n)),
         |deg AS (SELECT node, COUNT(*) AS degree
         |        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) u
         |        GROUP BY node),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM e e1
         |        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         |tn AS (SELECT node, COUNT(*) AS n_tri
         |       FROM (SELECT x AS node FROM tri
         |             UNION ALL SELECT y FROM tri
         |             UNION ALL SELECT z FROM tri) u
         |       GROUP BY node)
         |SELECT deg.node AS brand, CAST(deg.degree AS BIGINT) AS degree,
         |       CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_triangles,
         |       ${graft.functions.Portable.Quant6Sql(
               "2.0 * COALESCE(tn.n_tri, 0) / nullif(deg.degree * (deg.degree - 1), 0)")} AS clust_coeff
         |FROM deg LEFT JOIN tn ON tn.node = deg.node""".stripMargin) { (spark, dir) =>
      // shared one-exchange (o, b) relation (r16 — see
      // Behavior.orderBrands: repartition(o) before the distinct makes
      // the distinct, the self-join, and the per-order count all run
      // on a single shuffle; the old persist() still paid a fresh
      // o-exchange per self-join side)
      val ob = Behavior.orderBrands(spark, dir)
      val nTotal = ob.select(col("o")).distinct()
        .agg(countAll.cast("long").as("n_total"))
      val edges = ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .groupBy(col("a.b").as("a"), col("bb.b").as("b"))
        .agg(countAll.as("n_ab"))
        .crossJoin(broadcast(nTotal))
        .filter(lit(10000L) * col("n_ab") >= lit(222L) * col("n_total"))
        .select(col("a"), col("b"))
        // ≤ |brands|² rows — the bounded aggregate every later stage
        // joins; materialized once so the three consumers below do not
        // re-run the fact self-join
        .stage()
      val deg = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
        .groupBy(col("node")).agg(countAll.as("degree"))
      val tri = edges.as("e1")
        .join(edges.as("e2"),
          col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        .join(edges.as("e3"),
          col("e3.a") === col("y") && col("e3.b") === col("z"),
          "left_semi")
      val tn = tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node")).agg(countAll.as("n_tri"))
      deg.join(tn, Seq("node"), "left")
        .select(col("node").as("brand"), col("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
          quant6(lit(2.0) * coalesce(col("n_tri"), lit(0L)).cast("double")
            / nullif((col("degree") * (col("degree") - 1)).cast("double"), lit(0.0)))
            .as("clust_coeff"))
    },

    // A45 — hierarchical rollup (the recursive-CTE capability Spark
    // lacks natively): every part hangs in a synthesized quaternary
    // tree (parent = partkey div 4, roots 1..3), and the query rolls
    // subtree size, subtree retail value, and max depth up to each
    // root. The engine answer to recursion is POINTER JUMPING
    // ([[forestRollup]], r10 — the tree is single-parent, so per-node
    // (ptr, depth, min-anc) state replaces the N·depth pair closure):
    // each round substitutes ptr's own state, covered depth doubles,
    // and state stays N rows. The budget is derived from max(partkey)
    // (depth is exactly floor(log4 n) for this parent rule), so the
    // loop pays ceil(log2 depthBound) one-job rounds and NO fixpoint
    // probes — at sf0.1 that is 3 rounds for depth 7, and a 1000×
    // corpus adds two rounds, not a rescan. [[ancestorClosure]]
    // remains the operator for multi-parent ancestor SETS; its
    // budget-truncation contract carries over here as
    // [[forestComplete]] (spec-proven to flag a depth-40 chain under
    // 5 rounds and clear it under 6).
    // The oracle is DuckDB's native WITH RECURSIVE walking each
    // node's parent chain — recursion semantics proven, not imitated.
    // Depth-0 roots keep themselves (left join + coalesce); min(anc)
    // IS the root because parents strictly decrease along the chain.
    QueryDef(
      "part_hierarchy",
      """WITH RECURSIVE anc AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS node, CAST(p_partkey // 4 AS BIGINT) AS anc
        |  FROM part WHERE p_partkey // 4 >= 1
        |  UNION ALL
        |  SELECT node, anc // 4 FROM anc WHERE anc // 4 >= 1),
        |pa AS (SELECT node, MIN(anc) AS root, COUNT(*) AS depth FROM anc GROUP BY node),
        |f AS (SELECT CAST(p.p_partkey AS BIGINT) AS node,
        |             COALESCE(pa.root, CAST(p.p_partkey AS BIGINT)) AS root,
        |             COALESCE(pa.depth, 0) AS depth, p.p_retailprice
        |      FROM part p LEFT JOIN pa ON CAST(p.p_partkey AS BIGINT) = pa.node)
        |SELECT root, COUNT(*) AS n_nodes,
        |       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS subtree_retail,
        |       CAST(MAX(depth) AS BIGINT) AS max_depth
        |FROM f GROUP BY root""".stripMargin) { (spark, dir) =>
      val part = Tables.part(spark, dir)
        .select(col("p_partkey").cast("long").as("node"), col("p_retailprice"))
      val edges = part
        .select(col("node"), expr("node div 4").as("anc"))
        .filter(col("anc") >= 1)
      // single-parent tree → the N-rows-per-round pointer-jumping
      // rollup, not the N·depth closure (ancestorClosure remains the
      // operator for genuinely multi-parent ancestor sets); min-anc
      // and chain length come straight off the rolled state.
      // The round budget is DERIVED, not probed (r10 verdict: the
      // fixed-budget-plus-fixpoint-probe loop paid ~2 jobs/round and
      // one wasted no-op round): parent = node div 4 makes depth(n)
      // exactly floor(log4 n), so the deepest chain under max(node)
      // is bounded by one tiny column-pruned scalar aggregate and
      // ceil(log2 bound) doubling rounds provably reach every root —
      // the moved-count probe and its per-round job are skipped
      // (checkConvergence = false; identity spec-asserted). The agg
      // is the writeZOrdered scalar-broadcast pattern: one driver
      // scalar off a single-column scan, never a per-row collect.
      // max(node) is NULL on an empty part table — fall back to the
      // 1-round budget instead of throwing (r11 advice); the rollup
      // over zero edges is a no-op either way.
      val maxRow = part.agg(max(col("node"))).head()
      val maxNode = if (maxRow.isNullAt(0)) 1L else maxRow.getLong(0)
      val depthBound = math.max(1, (math.log(math.max(maxNode, 4).toDouble)
        / math.log(4.0)).floor.toInt + 1) // +1 absorbs float rounding at powers of 4
      val rounds = (32 - Integer.numberOfLeadingZeros(depthBound - 1)) max 1
      val pa = forestRollup(edges, rounds, checkConvergence = false)
        .select(col("node"), col("mn").as("root"), col("depth"))
      part.join(pa, Seq("node"), "left")
        .select(
          coalesce(col("root"), col("node")).as("root"),
          coalesce(col("depth"), lit(0L)).as("depth"),
          col("p_retailprice"))
        .groupBy(col("root"))
        .agg(countAll.as("n_nodes"),
          dsum(col("p_retailprice")).as("subtree_retail"),
          max(col("depth")).cast("long").as("max_depth"))
    })
}
