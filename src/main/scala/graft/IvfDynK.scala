package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measured evidence for the persisted IVF index at the PRODUCTION
  * centroid count K = dynCentroids(N) with two-level assignment (r13
  * verdict task 3): every oracle-checked IVF seat runs the fixed
  * harness K=16, where probing 4-12 of 16 cells reads 25-75% of the
  * corpus — declared scaffolding, not the 100 TB plan. This main runs
  * the REAL shape on the 10× ScaleUp tile set: K = dynCentroids(N)
  * cells (≈ N/32), two-level assignment at build time
  * (`buildIvfIndex(..., twoLevel)` — coarse √K routing instead of a
  * flat N×K scan), then reports
  *  - build wall time, two-level vs flat (the routing's measured win);
  *  - cell-occupancy stats from the persisted layout (cells, mean,
  *    max, p99, skew = max·K/N — the `ann_cell_census` gate metric:
  *    a hot cell is a probe straggler);
  *  - search wall + recall@5 vs brute force at several nProbe points
  *    (probed fraction nProbe/K is the cost knob);
  *  - the fixed-K=16 index at its shipped nProbe=10 as the baseline.
  * Prints one JSON line. Run: dev/ivf_dynk.sh (materializes the tile
  * set via graft.ScaleUp if absent, then this main).
  */
object IvfDynK {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = Stress.session()
    graft.functions.VectorOps.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val n = emb.count()
    val k = Similarity.dynCentroids(n)
    val g = Similarity.dynCoarse(k)
    System.err.println(s"[ivfdynk] n=$n K=$k g=$g sf=$sfDir")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val cent = Similarity.seedCentroids(emb, k)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_dynk").toString
    val (_, buildTwoSec) = timed {
      Similarity.buildIvfIndex(emb, cent, s"$root/two", twoLevel = Some((k, g)))
    }
    val (_, buildFlatSec) = timed {
      Similarity.buildIvfIndex(emb, cent, s"$root/flat")
    }
    System.err.println(
      f"[ivfdynk] build two-level $buildTwoSec%.1fs vs flat $buildFlatSec%.1fs")

    // occupancy of the persisted two-level layout (the ann_cell_census
    // metric over the index that actually serves)
    val occ = spark.read.parquet(s"$root/two/cells")
      .groupBy(col("cid")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("cells"), sum(col("c")).as("total"),
        max(col("c")).as("mx"), min(col("c")).as("mn"),
        expr("percentile(c, 0.99)").as("p99"))
      .head()
    val cells = occ.getAs[Long]("cells")
    val occMax = occ.getAs[Long]("mx")
    require(occ.getAs[Long]("total") == n,
      s"cell layout lost vectors: ${occ.getAs[Long]("total")} of $n")
    val skew = occMax.toDouble * cells / n

    val queries = Similarity.defaultQueries(emb).cache()
    queries.count()
    val exact = Similarity.bruteForce(emb, queries)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()

    def measure(path: String, nProbe: Int): String = {
      def run() = Similarity.searchIvfIndex(spark, path, emb, queries, nProbe)
      try {
        run().write.format("noop").mode("overwrite").save() // warm
        val (_, s1) = timed(run().write.format("noop").mode("overwrite").save())
        val (_, s2) = timed(run().write.format("noop").mode("overwrite").save())
        val sec = math.min(s1, s2)
        val hit = run().select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val recall = hit.toDouble / nExact
        System.err.println(f"[ivfdynk] $path nProbe=$nProbe sec=$sec%.2f recall@5=$recall%.3f")
        f"""{"n_probe":$nProbe,"sec":$sec%.2f,"recall5":$recall%.4f}"""
      } catch {
        // the search's own sampled score-recall gate aborting IS a
        // result at an aggressive nProbe — record it, don't die
        case e: Throwable =>
          System.err.println(s"[ivfdynk] $path nProbe=$nProbe GATED: ${e.getMessage}")
          s"""{"n_probe":$nProbe,"gated":true}"""
      }
    }

    // probed-fraction ladder on the dynK index: ~1%, ~5%, ~10% of cells
    val probes = Seq(math.max(4, k / 100), math.max(8, k / 20), math.max(16, k / 10))
    val dynPoints = probes.distinct.map(p => measure(s"$root/two", p))

    // the shipped fixed-K baseline: K=16 flat build, nProbe=10 (the
    // ann_ivf_sq8 harness point) — at 10/16 cells it scans 62% of the
    // corpus, which is exactly why K must grow with N
    Similarity.buildIvfIndex(emb, Similarity.seedCentroids(emb), s"$root/k16")
    val basePoint = measure(s"$root/k16", 10)

    println(
      s"""{"metric":"ivf_dynk","sf":"$sfDir","n_vectors":$n,"k":$k,"coarse_g":$g,""" +
        f""""build_two_level_sec":$buildTwoSec%.1f,"build_flat_sec":$buildFlatSec%.1f,""" +
        f""""occupancy":{"cells":$cells,"mean":${n.toDouble / math.max(cells, 1)}%.1f,"max":$occMax,""" +
        f""""p99":${occ.getAs[Double]("p99")}%.1f,"skew_max_x":$skew%.2f},""" +
        s""""dynk_points":[${dynPoints.mkString(",")}],"k16_baseline":$basePoint}""")
    spark.stop()
  }
}
