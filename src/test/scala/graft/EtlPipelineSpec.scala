package graft

import graft.operators.CourseFlatten
import graft.sources.{CourseraJson, Sinks}
import org.apache.spark.sql.functions._

/** The reference's two services chained end-to-end, Spark-native:
  * extract (raw JSON, timestamped snapshot) → transform (pick latest,
  * flatten to the pinned 15 columns, header CSV) → load (append into
  * the warehouse) — extract-service/main.py:212-221 +
  * transform-service/main.py:79-175 as one integration flow. */
class EtlPipelineSpec extends SparkSuite {

  private def responseJson(label: String, n: Int): String = {
    val entities = (0 until n).map { i =>
      s"""{ "name": "Course $i", "id": "$label-e$i", "slug": "course-$i",
         |  "url": "/learn/course-$i", "imageUrl": "/img/$i.jpg",
         |  "partnerIds": ["p$i"],
         |  "partners": [ { "name": "Partner $i", "id": "p$i" } ],
         |  "difficultyLevel": "Beginner", "isPartOfCourseraPlus": ${i % 2 == 0},
         |  "productCard": { "marketingProductType": "COURSE",
         |    "productTypeAttributes": { "isPathwayContent": false } } }""".stripMargin
    }.mkString(",\n")
    s"""[ { "data": { "DiscoveryCollections": { "queryCollections": [
       |  { "label": "$label", "id": "c-$label", "entities": [ $entities ] } ] } } } ]""".stripMargin
  }

  test("extract -> latest snapshot -> flatten -> CSV -> warehouse append") {
    val base = java.nio.file.Files.createTempDirectory("graft_etl").toString

    // EXTRACT: two timestamped raw responses; the older one is stale.
    def writeRaw(ts: String, body: String): Unit = {
      val dir = java.nio.file.Paths.get(s"$base/raw/snapshot=$ts")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("response.json"), body)
    }
    writeRaw("20250101_000000", responseJson("Stale", 2))
    writeRaw("20250315_120000", responseJson("Fresh", 3))

    // TRANSFORM: pick the latest snapshot (R6), read with the explicit
    // schema (R1), flatten (R2-R5).
    val latest = Sinks.latestSnapshotPath(spark, s"$base/raw")
    assert(latest.isDefined && latest.get.endsWith("snapshot=20250315_120000"))
    val flat = CourseFlatten.flatten(
      CourseraJson.readCollections(spark, latest.get))
    assert(flat.count() === 3)
    assert(flat.select("collection_label").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("Fresh"))

    // LOAD: header CSV (R7) + warehouse append twice (R8).
    Sinks.writeCourseCsv(flat, s"$base/csv")
    val csvBack = spark.read.option("header", "true").csv(s"$base/csv")
    assert(csvBack.columns.toSeq === Sinks.courseColumns)
    assert(csvBack.count() === 3)

    Sinks.appendParquet(flat, s"$base/warehouse/courses")
    Sinks.appendParquet(flat, s"$base/warehouse/courses")
    val wh = spark.read.parquet(s"$base/warehouse/courses")
    assert(wh.count() === 6) // WRITE_APPEND semantics
    assert(wh.filter(col("partners") === "Partner 1").count() === 2)
  }
}
