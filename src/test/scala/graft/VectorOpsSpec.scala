package graft

import graft.functions.{Portable, VectorOps}
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSuite {

  test("cosine of known vectors (codegen expression)") {
    import spark.implicits._
    VectorOps.ensureRegistered(spark)
    val df = Seq((Seq(1.0, 0.0), Seq(0.5, 0.5))).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(got - math.sqrt(2) / 2) < 1e-12)
  }

  test("codegen cosine is bit-identical to the fold form on real embeddings") {
    VectorOps.ensureRegistered(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = emb.filter(col("vec_id") < 50).select(col("vec_id").as("ida"), col("emb").as("ea"))
    val b = emb.filter(col("vec_id").between(50, 99)).select(col("vec_id").as("idb"), col("emb").as("eb"))
    val diff = a.crossJoin(b)
      .select(
        (VectorOps.cosine(col("ea"), col("eb")) -
          VectorOps.foldCosine(col("ea"), col("eb"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff === 0.0)
  }

  test("md5Hex matches Spark's md5() bit-for-bit") {
    import spark.implicits._
    val got = Seq("abc").toDF("s").select(md5(col("s"))).collect()(0).getString(0)
    assert(got === Portable.md5Hex("abc"))
    assert(got === "900150983cd24fb0d6963f7d28e17f72") // known md5("abc")
  }

  test("hyperplanes are deterministic and centered") {
    val w1 = VectorOps.hyperplane(0, 1, 64)
    val w2 = VectorOps.hyperplane(0, 1, 64)
    assert(w1 === w2)
    assert(w1.forall(v => v >= -0.5 && v < 0.5))
    assert(w1.toSet.size > 32) // not collapsed
  }
}
