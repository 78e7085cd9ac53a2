package graft

import org.apache.spark.sql.functions._

/** The ScaleUp tiling invariants past the old 26-tile cap (r8 verdict
  * task 5): tiles must stay mutually shingle-disjoint (duplicate mass
  * ×K linear, never the quadratic K-copy pathology) while preserving
  * per-row structure (lengths, whitespace, embedding norms), and
  * tiles < 26 must stay byte-identical to the pre-r9 single-rotation
  * scheme so sweep artifacts remain comparable across rounds. */
class ScaleUpSpec extends SparkSuite {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-").toString
    // 66 tiles crosses BOTH wrap points the composition exists for:
    // 26 (text single-rotation wrap) and 64 (embedding shift wrap)
    ScaleUp.write(spark, sf0001, dir, 66)
    dir
  }

  private val DK = 10000000L
  private val VK = 10000000L

  private def docs(tile: Int) = spark.read.parquet(s"$out/documents.parquet")
    .filter(col("doc_id") >= tile * DK && col("doc_id") < (tile + 1) * DK)
    .select((col("doc_id") - tile * DK).as("base_id"), col("text"))

  // letter-bearing word bigrams — the 2-token shadow of every real
  // shingle (ShingleLen 5, substring windows 8): if no bigram is
  // shared, no >=2-token letter shingle can be either. Pure-numeric
  // bigrams are excluded: caesar never touched digits, so those were
  // shared across tiles under the old scheme too.
  private def bigrams(tile: Int) = docs(tile)
    .select(explode(expr(
      """transform(sequence(0, greatest(size(split(text, ' ')) - 2, 0)),
        |  i -> concat(element_at(split(text, ' '), i + 1), ' ',
        |              element_at(split(text, ' '), i + 2)))""".stripMargin)).as("bg"))
    .filter(col("bg").rlike("[A-Za-z].* .*[A-Za-z]"))
    .distinct()

  test("tiles below 26 are byte-identical to the single-rotation scheme") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String, k: Int) = s.drop(k) + s.take(k)
    val joined = docs(0).as("a").join(docs(1).as("b"), "base_id")
    val n = joined.count()
    assert(n > 0)
    val same = joined.filter(
      translate(col("a.text"), lower + upper, rot(lower, 1) + rot(upper, 1))
        === col("b.text")).count()
    assert(same === n,
      "tile 1 must equal the old whole-text rotation (both parities shift by 1)")
  }

  test("tiles past 26 share no letter-bearing bigrams with any earlier shift-mate") {
    // tile 27 has (sOdd, sEven) = (1, 2); its nearest collision
    // candidates are tile 1 (1, 1) — same odd shift — and tile 0.
    // A shared bigram would mean a shared dedup shingle.
    assert(bigrams(27).join(bigrams(1), Seq("bg"), "inner").count() === 0,
      "tile 27 and tile 1 share odd-parity words only — bigrams must all differ")
    assert(bigrams(27).join(bigrams(0), Seq("bg"), "inner").count() === 0)
    // structure preserved: per-base-doc byte length is rotation-invariant
    val l27 = docs(27).select(col("base_id"), length(col("text")).as("l27"))
    val l0 = docs(0).select(col("base_id"), length(col("text")).as("l0"))
    assert(l27.join(l0, "base_id").filter(col("l27") =!= col("l0")).count() === 0,
      "caesar + word split/rejoin must preserve byte length exactly")
  }

  test("embedding tiles past 64 are norm-preserving and decorrelated") {
    def vecs(tile: Int) = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") >= tile * VK && col("vec_id") < (tile + 1) * VK)
      .select((col("vec_id") - tile * VK).as("base_id"),
        col("embedding").cast("array<double>").as("v"))
    // tile 65 = shift 1 + sign pattern j=1; tile 1 = shift 1, no signs.
    val j = vecs(65).as("a").join(vecs(1).as("b"), "base_id")
      .select(
        expr("aggregate(a.v, 0d, (s, x) -> s + x * x)").as("na"),
        expr("aggregate(b.v, 0d, (s, x) -> s + x * x)").as("nb"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0d, (s, x) -> s + x)").as("dot"))
      .select(col("na"), col("nb"),
        (col("dot") / sqrt(col("na") * col("nb"))).as("cos"))
      .cache()
    val n = j.count()
    assert(n > 0)
    assert(j.filter(abs(col("na") - col("nb")) > col("nb") * lit(1e-6)).count() === 0,
      "sign flips must preserve the norm exactly (same components, signs only)")
    val badCos = j.filter(abs(col("cos")) > 0.8).count()
    assert(badCos.toDouble / n < 0.01,
      s"tile 65 must be decorrelated from tile 1, but $badCos/$n pairs have |cos| > 0.8 " +
        "— the sign pattern is no longer flipping ~half the components")
    j.unpersist()
  }
}
