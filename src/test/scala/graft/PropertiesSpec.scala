package graft

import graft.functions.{Portable, VecCosine, VecDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks on the numeric kernels the oracle parity
  * depends on (quantization, vector expressions, portable hashing).
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge artifact is not in the offline cache). */
class PropertiesSpec extends SparkSuite {

  private val genParams = Gen.Parameters.default

  /** Deterministic forAll: 200 seeded samples per generator. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 200).foreach { i =>
      g.apply(genParams, Seed(i.toLong)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach { i =>
      for {
        a <- ga.apply(genParams, Seed(i.toLong))
        b <- gb.apply(genParams, Seed(i.toLong + 1000))
      } f(a, b)
    }

  private val finiteD: Gen[Double] = Gen.chooseNum(-1e6, 1e6)
  private val vec: Gen[List[Double]] = Gen.listOfN(16, finiteD)

  private def evalDot(a: Seq[Double], b: Seq[Double]): Double =
    VecDot(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType))).eval(null).asInstanceOf[Double]

  private def evalCos(a: Seq[Double], b: Seq[Double]): Double =
    VecCosine(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType))).eval(null).asInstanceOf[Double]

  test("quant6 is a lower bound within 1e-6 and idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // evaluate the PRODUCTION Column expression over sampled inputs
    val xs = (0 until 200).flatMap(i => finiteD.apply(genParams, Seed(i.toLong)))
    val qs = xs.toDF("x").select(Portable.quant6(col("x"))).collect().map(_.getDouble(0))
    xs.zip(qs).foreach { case (x, q) =>
      assert(q <= x)
      assert(x - q < 1e-6 + math.ulp(x) * 2)
    }
    // idempotence: quantizing the quantized values is a no-op
    val qqs = qs.toSeq.toDF("x").select(Portable.quant6(col("x"))).collect().map(_.getDouble(0))
    assert(qqs.toSeq === qs.toSeq)
  }

  test("VecDot eval matches a left-to-right Scala fold bit-for-bit") {
    forAll2(vec, vec) { (a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      assert(evalDot(a, b) === expected)
    }
  }

  test("VecCosine is symmetric-magnitude and scale-invariant") {
    forAll(vec) { a =>
      if (a.exists(_ != 0.0)) {
        val self = evalCos(a, a)
        assert(math.abs(self - 1.0) < 1e-9)
        val scaled = evalCos(a, a.map(_ * 2.0))
        assert(math.abs(scaled - 1.0) < 1e-9)
      }
    }
  }

  test("the salted two-phase top-k equals the naive single window under heavy ties") {
    // the load-bearing primitive behind every ANN top-k: the per-salt
    // pre-cut provably keeps any row the global (score desc, nid)
    // order would keep BECAUSE nid makes the comparator total. Stress
    // the argument where it is sharpest — 5 distinct scores over 300
    // rows per case, so nearly every comparison is a tie broken only
    // by nid — and vary k across cases.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, floor => _, _}
    val scoreGen = Gen.chooseNum(0, 4)
    (0 until 8).foreach { c =>
      val rows = (0 until 300).flatMap { i =>
        scoreGen.apply(genParams, Seed(c * 1000L + i))
          .map(s => (i % 3L, i.toLong, s.toDouble))
      }
      val df = rows.toDF("qid", "nid", "score")
      val k = 1 + c * 3 % 11
      val salted = graft.operators.Similarity.saltedTopK(df, col("score"), k)
        .select("qid", "nid", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
      val naive = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("qid", "nid", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(salted === naive, s"case $c (k=$k): salted pre-cut diverged")
    }
  }

  test("dynPlanes keeps expected LSH bucket occupancy in (TargetOcc/2, TargetOcc] and is minimal") {
    import graft.operators.Similarity
    val occ = Similarity.TargetBucketOcc.toLong
    forAll(Gen.chooseNum(1L, 1000000000L)) { n =>
      val p = Similarity.dynPlanes(n)
      assert(p >= 4 && p <= 19)
      if (p < 19) {
        // enough buckets: expected occupancy n / 2^p <= TargetOcc
        assert((occ << p) >= n, s"n=$n p=$p under-bucketed")
        // minimal: one fewer plane would over-fill (unless at the floor)
        if (p > 4) assert((occ << (p - 1)) < n, s"n=$n p=$p not minimal")
      }
      // monotone in n (spot step)
      assert(Similarity.dynPlanes(n + 1) >= p)
    }
    // the oracle-gate pins: these exact values are baked into the
    // r1-r7 correctness history (sf0.01 = 500 vectors → the original
    // fixed 4-plane grid)
    assert(Similarity.dynPlanes(500) === 4)
  }

  test("md5Hex is stable and 32 lowercase hex chars for any string") {
    forAll(Gen.asciiPrintableStr) { s =>
      val h = Portable.md5Hex(s)
      assert(h.length === 32)
      assert(h.forall(c => "0123456789abcdef".contains(c)))
      assert(h === Portable.md5Hex(s))
    }
  }
}
