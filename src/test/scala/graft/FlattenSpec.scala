package graft

import graft.operators.CourseFlatten
import graft.sources.{CourseraJson, Sinks}
import org.apache.spark.sql.functions._

/** R1–R5 + R7: the flatten operator over both nested sources — the
  * star-schema-built nesting and a real JSON fixture in the exact
  * reference response shape (transform-service/main.py:94-136). */
class FlattenSpec extends SparkSuite {

  test("flatten emits the pinned 15-column schema in order") {
    val df = CourseFlatten.flatten(CourseFlatten.nestedCollections(spark, sf0001))
    assert(df.columns.toSeq === Sinks.courseColumns)
  }

  test("defaults: missing optionals become N/A (R5)") {
    val df = CourseFlatten.flatten(CourseFlatten.nestedCollections(spark, sf0001))
    assert(df.filter(col("difficulty_level").isNull).count() === 0)
    assert(df.filter(col("course_count") === "N/A").count() > 0)
  }

  test("malformed JSON surfaces as corrupt records instead of crashing (R10)") {
    val dir = java.nio.file.Files.createTempDirectory("coursera_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/coursera_response_x.json"),
      """{ this is not valid json at all""")
    val corrupt = CourseraJson.corruptRecords(spark, dir)
    assert(corrupt.count() === 1)
    assert(CourseraJson.readCollections(spark, dir).count() === 0) // no crash
  }

  test("JSON fixture in the reference response shape round-trips (R1)") {
    val fixture =
      """[ { "data": { "DiscoveryCollections": { "queryCollections": [
        |  { "label": "Data Science", "id": "c1", "entities": [
        |    { "name": "ML Basics", "id": "e1", "slug": "ml-basics",
        |      "url": "/learn/ml-basics", "imageUrl": "/img/e1.jpg",
        |      "partnerIds": ["p1", "p2"],
        |      "partners": [ { "name": "Uni A", "id": "p1" },
        |                    { "name": "Lab B", "id": "p2" } ],
        |      "difficultyLevel": "Beginner",
        |      "isPartOfCourseraPlus": true,
        |      "isCostFree": "true",
        |      "productCard": { "marketingProductType": "COURSE",
        |        "productTypeAttributes": { "isPathwayContent": false } } },
        |    { "name": "No Extras", "id": "e2", "slug": "no-extras",
        |      "url": "/learn/no-extras", "imageUrl": "/img/e2.jpg",
        |      "partnerIds": [], "partners": [],
        |      "productCard": { "marketingProductType": "SPECIALIZATION",
        |        "productTypeAttributes": { "isPathwayContent": true } } }
        |  ] } ] } } } ]""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("coursera_json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/coursera_response_20250101_000000.json"), fixture)

    val nested = CourseraJson.readCollections(spark, dir)
    val flat = CourseFlatten.flatten(nested).orderBy("course_id").collect()
    assert(flat.length === 2)
    val e1 = flat(0)
    assert(e1.getAs[String]("collection_label") === "Data Science")
    assert(e1.getAs[String]("partners") === "Uni A, Lab B")
    assert(e1.getAs[String]("partner_ids") === "p1, p2")
    assert(e1.getAs[String]("difficulty_level") === "Beginner")
    assert(e1.getAs[String]("marketing_product_type") === "COURSE")
    val e2 = flat(1)
    assert(e2.getAs[String]("difficulty_level") === "N/A") // R5 default
    assert(e2.getAs[String]("course_count") === "N/A")
    assert(e2.getAs[String]("partners") === "")
    assert(e2.getAs[String]("partner_ids") === "")
    // missing isPartOfCourseraPlus defaults to false (.get(..., False))
    assert(e2.getAs[Boolean]("is_part_of_coursera_plus") === false)
    assert(e2.getAs[Boolean]("is_pathway_content") === true) // R4 nested path
  }
}
