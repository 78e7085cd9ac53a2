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

  test("GraphQL error envelope: list-wrapped error member surfaces, not an empty page") {
    // extract-service/main.py:160-164: the API signals failure as a
    // LIST whose member carries an "error" key (+ optional "message").
    // Under the explicit schema an unknown key is ignored, NOT corrupt
    // — so error/message must be schema fields or an error page would
    // silently read as zero collections with no signal at all.
    val dir = java.nio.file.Files.createTempDirectory("coursera_err").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/coursera_response_err.json"),
      """[ { "error": "RATE_LIMITED", "message": "slow down" },
        |  { "error": "UPSTREAM_TIMEOUT" } ]""".stripMargin)
    val errs = CourseraJson.responseErrors(spark, dir).orderBy("error").collect()
    assert(errs.length === 2)
    assert(errs(0).getAs[String]("error") === "RATE_LIMITED")
    assert(errs(0).getAs[String]("message") === "slow down")
    // the reference's .get("message", "Unknown error") default
    assert(errs(1).getAs[String]("error") === "UPSTREAM_TIMEOUT")
    assert(errs(1).getAs[String]("message") === "Unknown error")
    // the error page parses (not corrupt) but yields no collections
    assert(CourseraJson.corruptRecords(spark, dir).count() === 0)
    assert(CourseraJson.readCollections(spark, dir).count() === 0)
    // and a clean response has no error members
    assert(CourseraJson.responseErrors(
      spark, CourseraJson.writeFixture()).count() === 0)
  }

  test("flatten_json_file: the oracle fixture reads and flattens end-to-end (R1)") {
    val path = CourseraJson.writeFixture()
    val flat = CourseFlatten.flatten(CourseraJson.readCollections(spark, path))
    assert(flat.columns.toSeq === Sinks.courseColumns)
    val rows = flat.orderBy("course_id").collect()
    assert(rows.length === 5)
    // the partnerIds ≠ partners[].id divergence rides through: partner
    // names come from partners[], ids from the SEPARATE partnerIds
    // array (transform/main.py:107-110)
    val fe = rows.find(_.getAs[String]("course_id") == "crs-202").get
    assert(fe.getAs[String]("partners") === "")
    assert(fe.getAs[String]("partner_ids") === "p-7, p-8")
    val dl = rows.find(_.getAs[String]("course_id") == "crs-201").get
    assert(dl.getAs[String]("partners") === "Gamma College")
    assert(dl.getAs[String]("partner_ids") === "")
  }

  test("flatten tolerates an entity with no productCard at all") {
    val dir = java.nio.file.Files.createTempDirectory("coursera_nopc").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/coursera_response_x.json"),
      """[ { "data": { "DiscoveryCollections": { "queryCollections": [
        |  { "label": "L", "id": "c1", "entities": [
        |    { "name": "Bare", "id": "e1", "slug": "bare",
        |      "url": "/learn/bare", "imageUrl": "/img/e1.jpg" } ] } ] } } } ]""".stripMargin)
    val flat = CourseFlatten.flatten(CourseraJson.readCollections(spark, dir)).collect()
    assert(flat.length === 1)
    assert(flat(0).getAs[String]("marketing_product_type") === null)
    assert(flat(0).getAs[String]("difficulty_level") === "N/A")
    assert(flat(0).getAs[String]("partners") === "")
  }
}
