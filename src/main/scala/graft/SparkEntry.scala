package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Analytics, Catalog, ConfigFacts, Diagnostics, Graph, Joins, Marts, Masking, Quality, Sampling, Scd2, Warehouse}
import graft.ml.{Approx, CrossVal, Features, Inference, Monitoring, TopK, TrainPrep}
import graft.dedup.Dedup
import graft.ann.{Ann, ChunkRetrieval, Embeddings}
import graft.text.{Bpe, CorpusStats, Filters, Packing, SubwordBpe, TextOps, Vocab}
import graft.multimodal.Multimodal
import graft.sources.SemiStructured
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Warehouse.starJoin(Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d), Tables.region(spark, d))
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Warehouse.queries ++ Scd2.queries ++ Analytics.queries ++ Features.queries ++
      Dedup.queries ++ Ann.queries ++ TextOps.queries ++ Multimodal.queries ++
      Joins.queries ++ Sampling.queries ++ ConfigFacts.queries ++ Marts.queries ++
      Quality.queries ++ Approx.queries ++ TopK.queries ++ SemiStructured.queries ++
      Monitoring.queries ++ Filters.queries ++ Packing.queries ++ Embeddings.queries ++ Vocab.queries ++ TrainPrep.queries ++
      Inference.queries ++ Graph.queries ++ Diagnostics.queries ++ CorpusStats.queries ++ Catalog.queries ++ Masking.queries ++ CrossVal.queries ++ Bpe.queries ++ ChunkRetrieval.queries ++ SubwordBpe.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Warehouse.oracles ++ Scd2.oracles ++ Analytics.oracles ++ Features.oracles ++
      Dedup.oracles ++ Ann.oracles ++ TextOps.oracles ++ Multimodal.oracles ++
      Joins.oracles ++ Sampling.oracles ++ ConfigFacts.oracles ++ Marts.oracles ++
      Quality.oracles ++ Approx.oracles ++ TopK.oracles ++ SemiStructured.oracles ++
      Monitoring.oracles ++ Filters.oracles ++ Packing.oracles ++ Embeddings.oracles ++ Vocab.oracles ++ TrainPrep.oracles ++
      Inference.oracles ++ Graph.oracles ++ Diagnostics.oracles ++ CorpusStats.oracles ++ Catalog.oracles ++ Masking.oracles ++ CrossVal.oracles ++ Bpe.oracles ++ ChunkRetrieval.oracles ++ SubwordBpe.oracles
}
