package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R1 (SURVEY.md §2.1): reader for the reference's raw API response
  * JSON — the exact nesting extract-service/main.py:46-145 requests and
  * transform-service/main.py:94-98 loads:
  *
  *   [ { data: { DiscoveryCollections: { queryCollections: [
  *       { label, id, entities: [ { name, id, slug, url, imageUrl,
  *         partnerIds[], partners[{name,id}], difficultyLevel?,
  *         isPartOfCourseraPlus?, courseCount?, isCostFree?,
  *         productCard: { marketingProductType,
  *                        productTypeAttributes: { isPathwayContent } } } ] } ] } } } ]
  *
  * The schema is EXPLICIT: at 100 TB, schema inference means reading
  * everything twice, and a silent drift in the upstream API would
  * otherwise corrupt the table instead of surfacing as nulls in
  * `_corrupt_record` (R10-adjacent bad-record handling).
  */
object CourseraJson {

  val partnerSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("id", StringType)))

  val entitySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("id", StringType),
    StructField("slug", StringType),
    StructField("url", StringType),
    StructField("imageUrl", StringType),
    StructField("partnerIds", ArrayType(StringType)),
    StructField("partners", ArrayType(partnerSchema)),
    StructField("difficultyLevel", StringType),
    StructField("isPartOfCourseraPlus", BooleanType),
    StructField("courseCount", StringType),
    StructField("isCostFree", StringType),
    StructField("productCard", StructType(Seq(
      StructField("marketingProductType", StringType),
      StructField("productTypeAttributes", StructType(Seq(
        StructField("isPathwayContent", BooleanType)))))))))

  val collectionSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("id", StringType),
    StructField("entities", ArrayType(entitySchema))))

  val responseSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("DiscoveryCollections", StructType(Seq(
        StructField("queryCollections", ArrayType(collectionSchema)))))))),
    // GraphQL error envelope (extract-service/main.py:160-164): an
    // error response is a list whose member carries an "error" key
    // (+ optional "message"). These MUST be in the schema — under
    // PERMISSIVE an unknown key is silently ignored, not corrupt, so
    // without them an error page would read as an empty page.
    StructField("error", StringType),
    StructField("message", StringType),
    StructField("_corrupt_record", StringType)))

  /** Raw read, keeping corrupt rows (R10: the Spark-native form of
    * extract-service/main.py:159-174's response validation — bad
    * records surface as `_corrupt_record` instead of crashing). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(responseSchema)
      .option("multiLine", "true") // the reference uploads one indented JSON doc
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Rows the reader could not parse against the response schema.
    * Spark refuses queries that reference ONLY the internal corrupt
    * column on a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    * caching the parsed result first is the documented pattern. */
  def corruptRecords(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path).cache()
      .filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))

  /** Error-envelope members (extract-service/main.py:160-164): one row
    * per response member carrying an "error" key, with the reference's
    * `.get("message", "Unknown error")` default. The reference RAISES
    * on the first such member; a caller here gets the full error set
    * and decides — `responseErrors(...).isEmpty` is the go/no-go. */
  def responseErrors(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .filter(col("error").isNotNull)
      .select(col("error"), coalesce(col("message"), lit("Unknown error")).as("message"))

  /** Read raw response JSON → one row per collection (label, id,
    * entities[]) — the shape CourseFlatten.flatten expects. */
  def readCollections(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .select(explode(col("data.DiscoveryCollections.queryCollections")).as("c"))
      .select(col("c.label").as("label"), col("c.id").as("id"), col("c.entities").as("entities"))

  /** Deterministic on-disk response fixture for the oracle-checked
    * `flatten_json_file` query (r7 verdict "What's missing" #1: R1 had
    * never read a REAL nested JSON file end-to-end under the oracle —
    * the flatten was only ever fed star-schema-synthesized input). The
    * timestamped name mirrors the reference's raw-layer naming
    * (extract-service/main.py:195-220). Content is a compile-time
    * constant so the DuckDB oracle replays `read_json` on the identical
    * bytes; every optional field is present in ≥1 and absent in ≥1
    * entity (so both engines' missing-field defaults are exercised and
    * DuckDB's key-union inference sees each field), and one entity
    * carries the partnerIds ≠ partners[].id divergence
    * (transform-service/main.py:107-110 joins entity["partnerIds"],
    * NOT partners[].id — the two can differ in a real response).
    *
    * The file is CHECKED INTO the repo (r8 ADVICE): the oracle's
    * read_json must work on a standalone replay — a fresh box, a
    * cleaned /tmp, no Spark run first — and a shared /tmp path could
    * race concurrent sessions. [[writeFixture]] only rewrites it when
    * the bytes differ from [[fixtureJson]] (the compile-time source of
    * truth), so the committed file can never drift silently. The repo
    * root defaults to the driver contract's /root/repo; a checkout
    * elsewhere sets GRAFT_REPO_ROOT so the oracle (whose SQL embeds
    * this absolute path at generation time) still reads the committed
    * file rather than a stray copy. */
  val FixturePath: String =
    sys.env.getOrElse("GRAFT_REPO_ROOT", "/root/repo") +
      "/data/fixtures/coursera_response_20260101_000000.json"

  val fixtureJson: String =
    """[
      |  {
      |    "data": {
      |      "DiscoveryCollections": {
      |        "queryCollections": [
      |          {
      |            "label": "Data Science",
      |            "id": "col-ds",
      |            "entities": [
      |              {
      |                "name": "Practical Spark",
      |                "id": "crs-101",
      |                "slug": "practical-spark",
      |                "url": "/learn/practical-spark",
      |                "imageUrl": "/img/crs-101.jpg",
      |                "partnerIds": ["p-9", "p-10"],
      |                "partners": [
      |                  {"name": "Acme University", "id": "p-9"},
      |                  {"name": "Beta Institute", "id": "p-10"}
      |                ],
      |                "difficultyLevel": "Intermediate",
      |                "isPartOfCourseraPlus": true,
      |                "courseCount": "12",
      |                "isCostFree": "false",
      |                "productCard": {
      |                  "marketingProductType": "SPECIALIZATION",
      |                  "productTypeAttributes": {"isPathwayContent": false}
      |                }
      |              },
      |              {
      |                "name": "Streaming Systems",
      |                "id": "crs-102",
      |                "slug": "streaming-systems",
      |                "url": "/learn/streaming-systems",
      |                "imageUrl": "/img/crs-102.jpg",
      |                "partnerIds": ["p-10"],
      |                "partners": [{"name": "Beta Institute", "id": "p-10"}],
      |                "isPartOfCourseraPlus": false,
      |                "productCard": {
      |                  "marketingProductType": "COURSE",
      |                  "productTypeAttributes": {"isPathwayContent": true}
      |                }
      |              }
      |            ]
      |          },
      |          {
      |            "label": "Machine Learning",
      |            "id": "col-ml",
      |            "entities": [
      |              {
      |                "name": "Deep Learning Basics",
      |                "id": "crs-201",
      |                "slug": "deep-learning-basics",
      |                "url": "/learn/deep-learning-basics",
      |                "imageUrl": "/img/crs-201.jpg",
      |                "partners": [{"name": "Gamma College", "id": "p-11"}],
      |                "difficultyLevel": "Advanced",
      |                "isPartOfCourseraPlus": true,
      |                "courseCount": "7",
      |                "isCostFree": "true",
      |                "productCard": {
      |                  "marketingProductType": "SPECIALIZATION",
      |                  "productTypeAttributes": {"isPathwayContent": true}
      |                }
      |              },
      |              {
      |                "name": "Feature Engineering",
      |                "id": "crs-202",
      |                "slug": "feature-engineering",
      |                "url": "/learn/feature-engineering",
      |                "imageUrl": "/img/crs-202.jpg",
      |                "partnerIds": ["p-7", "p-8"],
      |                "difficultyLevel": "Intermediate",
      |                "isCostFree": "false",
      |                "productCard": {
      |                  "marketingProductType": "COURSE",
      |                  "productTypeAttributes": {"isPathwayContent": false}
      |                }
      |              }
      |            ]
      |          }
      |        ]
      |      }
      |    }
      |  },
      |  {
      |    "data": {
      |      "DiscoveryCollections": {
      |        "queryCollections": [
      |          {
      |            "label": "Business",
      |            "id": "col-biz",
      |            "entities": [
      |              {
      |                "name": "Lean Operations",
      |                "id": "crs-301",
      |                "slug": "lean-operations",
      |                "url": "/learn/lean-operations",
      |                "imageUrl": "/img/crs-301.jpg",
      |                "partnerIds": [],
      |                "partners": [],
      |                "difficultyLevel": "Beginner",
      |                "courseCount": "3",
      |                "isCostFree": "true",
      |                "productCard": {
      |                  "marketingProductType": "CERTIFICATE",
      |                  "productTypeAttributes": {"isPathwayContent": true}
      |                }
      |              }
      |            ]
      |          }
      |        ]
      |      }
      |    }
      |  }
      |]
      |""".stripMargin

  /** Ensure the on-disk fixture matches [[fixtureJson]] (write only on
    * difference — the committed file is normally already identical, so
    * concurrent sessions read, not write); returns the path. */
  def writeFixture(path: String = FixturePath): String = {
    val p = java.nio.file.Paths.get(path)
    val bytes = fixtureJson.getBytes("UTF-8")
    val same = java.nio.file.Files.exists(p) &&
      java.util.Arrays.equals(java.nio.file.Files.readAllBytes(p), bytes)
    if (!same) {
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
    }
    path
  }
}
