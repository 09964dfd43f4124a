package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables
import graft.functions.Fns._

/** Semi-structured ingestion: JSON payload columns and CSV/JSON file
  * round-trips — the raw-source layer in front of the staging models
  * (the reference's source('raw_data', ...) declarations feed staging
  * from loads of exactly these shapes).
  */
object SemiStructured {

  /** Parse the events.props JSON payload with an explicit schema
    * (from_json, codegen'd; never schema-inference on the hot path) and
    * aggregate the extracted field per event type. */
  def jsonExtract(events: DataFrame): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    events
      .withColumn("props_k", from_json(col("props"), schema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("props_k")).as("n_parsed"),
        sum(col("props_k").cast("long")).as("sum_k"),
        min(col("props_k")).as("min_k"),
        max(col("props_k")).as("max_k"),
        r4(sum(col("props_k").cast("long")) / count(col("props_k"))).as("avg_k"))
      .orderBy("event_type")
  }

  /** CSV round-trip: write a frame as headered CSV, read it back with an
    * explicit schema. At scale this is the landing-zone pattern — schema
    * pinned, no inference pass over terabytes of text. */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.sparkSession.read.option("header", "true").schema(df.schema).csv(path)
  }

  /** JSON-lines round-trip with pinned schema. */
  def jsonRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Landing-zone CSV read with malformed-row quarantine: PERMISSIVE
    * parse against a pinned schema plus a `_corrupt_record` column, split
    * into (clean, quarantined) — a bad upstream export must never abort a
    * 100 TB load OR silently null-fill its rows. Spark only populates
    * `_corrupt_record` when the parsed frame is materialized from the
    * raw text (selecting only the corrupt column is disallowed on an
    * unmaterialized scan), so the split frames share one cached parse.
    * The third element is the release handle: call `release.unpersist()`
    * once the load has landed — no hidden cache outlives the caller. */
  def csvReadWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType): (DataFrame, DataFrame, DataFrame) = {
    val withCorrupt = schema.add(StructField("_corrupt_record",
      org.apache.spark.sql.types.StringType))
    val parsed = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache()
    val clean = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantined, parsed)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_extract" -> ((s, d) => jsonExtract(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_json_extract" ->
      """WITH p AS (
           SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS props_k
           FROM events)
         SELECT event_type,
           CAST(COUNT(props_k) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(props_k AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(props_k) AS min_k, MAX(props_k) AS max_k,
           FLOOR((CAST(SUM(CAST(props_k AS BIGINT)) AS DOUBLE) / COUNT(props_k)) * 10000 + 0.5) / 10000 AS avg_k
         FROM p GROUP BY event_type ORDER BY event_type"""
  )
}
