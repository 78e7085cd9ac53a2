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

  /** A response at volume with SYSTEMATICALLY missing optional fields —
    * the R5 default matrix the reference hits on real API data
    * (transform-service/main.py:123-128's .get defaults): entity i
    * omits difficultyLevel when 2|i, isPartOfCourseraPlus when 3|i,
    * courseCount when 5|i, isCostFree when 7|i, and BOTH partner
    * arrays when 11|i. */
  private def volumeJson(nCollections: Int, perCollection: Int): String = {
    val colls = (0 until nCollections).map { c =>
      val entities = (0 until perCollection).map { j =>
        val i = c * perCollection + j
        val parts = scala.collection.mutable.ListBuffer[String]()
        parts += s""""name": "Course $i""""
        parts += s""""id": "e$i""""
        parts += s""""slug": "course-$i""""
        parts += s""""url": "/learn/course-$i""""
        parts += s""""imageUrl": "/img/$i.jpg""""
        if (i % 11 != 0) {
          parts += s""""partnerIds": ["p${i % 17}", "q${i % 13}"]"""
          parts += s""""partners": [ { "name": "Partner ${i % 17}", "id": "p${i % 17}" } ]"""
        }
        if (i % 2 != 0)
          parts += s""""difficultyLevel": "${Seq("Beginner", "Intermediate", "Advanced")(i % 3)}""""
        if (i % 3 != 0) parts += s""""isPartOfCourseraPlus": ${i % 4 == 0}"""
        if (i % 5 != 0) parts += s""""courseCount": "${i % 30}""""
        if (i % 7 != 0) parts += s""""isCostFree": "${i % 2 == 0}""""
        parts += s""""productCard": { "marketingProductType": "COURSE", "productTypeAttributes": { "isPathwayContent": ${i % 2 == 1} } }"""
        parts.mkString("{ ", ", ", " }")
      }.mkString(",\n")
      s"""{ "label": "Coll$c", "id": "c-$c", "entities": [ $entities ] }"""
    }.mkString(",\n")
    s"""[ { "data": { "DiscoveryCollections": { "queryCollections": [ $colls ] } } } ]"""
  }

  test("volume fixture: 300 entities with missing-field mixtures flatten to the pinned defaults") {
    import spark.implicits._
    val nColl = 3
    val per = 100
    val base = java.nio.file.Files.createTempDirectory("graft_vol").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/response.json"), volumeJson(nColl, per))

    // nothing may land in _corrupt_record; every entity must survive
    assert(CourseraJson.corruptRecords(spark, s"$base/response.json").count() === 0)
    val flat = CourseFlatten.flatten(
      CourseraJson.readCollections(spark, s"$base/response.json")).cache()
    assert(flat.count() === nColl * per)

    // pinned expected output, computed independently from the same
    // default matrix the reference implements
    val expected = (0 until nColl * per).map { i =>
      (s"Coll${i / per}", s"c-${i / per}", s"Course $i", s"e$i", s"course-$i",
        s"/learn/course-$i", s"/img/$i.jpg",
        if (i % 11 == 0) "" else s"Partner ${i % 17}",
        if (i % 11 == 0) "" else s"p${i % 17}, q${i % 13}",
        if (i % 2 == 0) "N/A" else Seq("Beginner", "Intermediate", "Advanced")(i % 3),
        if (i % 3 == 0) false else i % 4 == 0,
        if (i % 5 == 0) "N/A" else s"${i % 30}",
        if (i % 7 == 0) "N/A" else s"${i % 2 == 0}",
        "COURSE", i % 2 == 1)
    }.toDF(
      "collection_label", "collection_id", "course_name", "course_id", "slug",
      "url", "image_url", "partners", "partner_ids", "difficulty_level",
      "is_part_of_coursera_plus", "course_count", "is_cost_free",
      "marketing_product_type", "is_pathway_content")
    assert(flat.exceptAll(expected).count() === 0,
      "flatten emitted rows the reference semantics would not")
    assert(expected.exceptAll(flat).count() === 0,
      "flatten missed or altered rows vs the reference semantics")

    // end-to-end through the CSV sink + inferred read-back (R7):
    // booleans survive autodetect-style inference, every row lands
    Sinks.writeCourseCsv(flat, s"$base/csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/csv")
    assert(back.count() === nColl * per)
    assert(back.columns.toSeq === Sinks.courseColumns)
    val types = back.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("is_part_of_coursera_plus") === "boolean")
    assert(types("is_pathway_content") === "boolean")
    assert(back.filter(col("is_part_of_coursera_plus")).count() ===
      flat.filter(col("is_part_of_coursera_plus")).count())
  }
}
