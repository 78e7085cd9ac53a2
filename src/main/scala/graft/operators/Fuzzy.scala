package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Approximate string matching (SURVEY.md §2.3 L27) — the
  * entity-resolution / record-linkage seat: find all pairs of distinct
  * part names within edit distance 2, without ever comparing all pairs.
  *
  * Algorithm: FastSS deletion neighborhoods (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007). If
  * levenshtein(a, b) <= k, then some string is reachable from BOTH a
  * and b by at most k character deletions (each substitution costs one
  * deletion on each side, each insert/delete one deletion on one
  * side), so the deletion-variant sets of a true pair intersect.
  * Candidates therefore come from an EQUI-join on the variant string;
  * the exact `levenshtein` verify then removes the superset's false
  * positives — the same generate-candidates-keyed/verify-exact
  * cascade as dedup_minhash, applied to edit distance.
  *
  * Scale shape: variant generation is a map-only higher-order-function
  * expression (sequence/transform/flatten — native expressions, no
  * UDF) over the DISTINCT-name dictionary, which is vocabulary-sized,
  * not corpus-sized (the corpus-sized `part` table collapses to it
  * with one map-side-partial groupBy). O(len²) variants per name for
  * k=2; the candidate join keys on the variant (hot short variants are
  * AQE's skew case), pairs dedupe with one distinct, and the verify is
  * a per-pair scalar — work ∝ candidate mass, never |dict|².
  */
object Fuzzy {

  /** All strings obtained from `name` by deleting at most 2 chars
    * (1-based substring arithmetic; array_distinct because different
    * deletion positions can yield the same string). */
  private val variantsExpr =
    """array_distinct(concat(
      |  array(name),
      |  transform(sequence(1, length(name)),
      |    i -> concat(substring(name, 1, i-1), substring(name, i+1, length(name)))),
      |  if(length(name) < 2, array(),
      |     flatten(transform(sequence(1, length(name) - 1),
      |       i -> transform(sequence(i + 1, length(name)),
      |         j -> concat(substring(name, 1, i-1),
      |                     substring(name, i+1, j-i-1),
      |                     substring(name, j+1, length(name)))))))
      |))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // L27 — fuzzy self-join of the part-name dictionary at k=2. The
    // oracle intentionally uses the OTHER algorithm (brute-force
    // pairwise levenshtein over the dictionary — fine at oracle
    // scale): matching outputs from two different algorithms is the
    // point of the check.
    QueryDef(
      "fuzzy_match",
      """WITH nm AS (SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
        |       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        |FROM nm a JOIN nm b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin) { (spark, dir) =>
      val nm = Tables.part(spark, dir)
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
        .cache()
      val v = nm.select(col("name"), explode(expr(variantsExpr)).as("variant"))
      val cand = v.as("a").join(v.as("b"),
          col("a.variant") === col("b.variant") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
      cand
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 2)
        .join(nm.select(col("name").as("name_a"), col("n_parts").as("n_parts_a")), "name_a")
        .join(nm.select(col("name").as("name_b"), col("n_parts").as("n_parts_b")), "name_b")
        .select(col("name_a"), col("name_b"), col("dist"),
          col("n_parts_a"), col("n_parts_b"))
    })
}
