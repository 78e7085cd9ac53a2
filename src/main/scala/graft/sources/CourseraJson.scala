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

  /** Read raw response JSON → one row per collection (label, id,
    * entities[]) — the shape CourseFlatten.flatten expects. */
  def readCollections(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .select(explode(col("data.DiscoveryCollections.queryCollections")).as("c"))
      .select(col("c.label").as("label"), col("c.id").as("id"), col("c.entities").as("entities"))
}
