package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Throwaway stage profiler for the lifecycle seat (dev-only). */
object LifecycleProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorOps.ensureRegistered(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    for (round <- 1 to 3) {
      println(s"== round $round ==")
      val root = s"/tmp/graft_prof_lifecycle_$round"
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val base = new org.apache.hadoop.fs.Path(s"$root/base")
      t("build") {
        Similarity.buildIvfIndex(emb.filter(pmod(col("vec_id"), lit(10)) =!= 7),
          Similarity.seedCentroids(emb), base.toString)
      }
      val work = new org.apache.hadoop.fs.Path(s"$root/work")
      t("copy") {
        org.apache.hadoop.fs.FileUtil.copy(fs, base, fs, work, false, conf)
      }
      t("appends") {
        Seq(7L, 17L, 27L).foreach { m =>
          Similarity.appendToIvfIndex(spark,
            emb.filter(pmod(col("vec_id"), lit(30)) === m), work.toString)
        }
      }
      t("compact") { Similarity.compactIndex(spark, work.toString) }
      t("search") {
        Similarity.searchIvfIndex(spark, work.toString, emb,
          emb.filter(col("vec_id") % 100 === 0))
          .write.format("noop").mode("overwrite").save()
      }
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
