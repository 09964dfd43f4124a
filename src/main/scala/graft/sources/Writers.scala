package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout writers — the physical design levers that matter at
  * 100 TB, mirroring the reference's clustering config
  * (`cluster_by=['date_key','customer_key']` in dbt_project.yml /
  * fact_sales_daily.sql):
  *
  *  - partitionBy(date) → partition pruning: a date-filtered query reads
  *    only the matching directories (PartitionFilters in the scan);
  *  - bucketBy(key) on both sides of a recurring join → co-located
  *    shuffle-free joins (no Exchange in the plan);
  *  - sortWithinPartitions → run-length/delta-friendly parquet pages and
  *    rowgroup min/max skipping on the sort key.
  */
object Writers {

  /** Write a fact partitioned by month (derived from a date column). */
  def writePartitionedByMonth(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("part_month", date_format(col(dateCol), "yyyy-MM"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_month")
      .parquet(path)

  /** Read a partitioned fact back; date-range filters on `part_month`
    * prune partitions at planning time. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-clustered write — the dbt `cluster_by` twin for keys too
    * high-cardinality to partition by: repartitionByRange gives every
    * output file a narrow, pairwise-disjoint key range, and the
    * within-partition sort tightens parquet rowgroup min/max stats, so a
    * key-range filter skips whole files/rowgroups at scan time instead
    * of reading 100 TB to drop 99.9% of it. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
                     clusterCols: String*): Unit = {
    val cols = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Persist as a bucketed+sorted table (catalog-managed): both sides of
    * a recurring equi-join bucketed the same way join with zero shuffle. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Feature-export write path — the engine-side twin of the reference's
    * export_features_to_warehouse (feature_store_manager.py:758-797):
    * the computed feature frame is stamped with the export metadata the
    * reference adds (extraction timestamp + the order-insensitive
    * feature-version hash of [[graft.ml.FeatureViews.featureVersion]])
    * and written partitioned by entity hash-bucket, so a serving-side
    * point lookup prunes to 1/nBuckets of the table and a full refresh
    * overwrites bucket directories in place. Returns
    * (records_exported, features_count) — the reference's result dict.
    *
    * The caller supplies the extraction timestamp (the reference stamps
    * datetime.now()); keeping it a parameter keeps the written bytes
    * deterministic for replay/testing. */
  def exportFeatures(features: DataFrame, entityCol: String, path: String,
                     extractionTs: java.sql.Timestamp,
                     nBuckets: Int = 16): (Long, Int) = {
    val featCols = features.columns.filterNot(_ == entityCol).toSeq
    val version = graft.ml.FeatureViews.featureVersion(featCols)
    features
      .withColumn("entity_bucket", pmod(col(entityCol), lit(nBuckets)).cast("int"))
      .withColumn("feature_extraction_ts", lit(extractionTs))
      .withColumn("feature_version", lit(version))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("entity_bucket")
      .parquet(path)
    // count from the INPUT frame (one aggregate over the source plan) —
    // re-reading the just-written dataset doubled the export's IO for a
    // number the write already determined; features_count = featCols so
    // it agrees with the version hash's notion of the feature set (the
    // entity column is an address, not a feature)
    (features.count(), featCols.length)
  }
}
