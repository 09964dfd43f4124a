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
}
