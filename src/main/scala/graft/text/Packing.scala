package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Sequence packing for pretraining: assign documents to fixed token-budget
  * context windows ("packs"), the step between curation and tokenization
  * in an LLM data pipeline.
  *
  * Exact greedy first-fit packing is inherently sequential (each pack
  * boundary depends on every prior document), so it cannot distribute.
  * The scale-correct relaxation used here: shard the corpus into
  * independent streams by doc-id hash, and within each stream assign
  * packs by cumulative token offset (`floor(start_offset / budget)`) —
  * each stream is one window partition, streams pack in parallel, and
  * the only shuffle is the per-stream sort. At 100 TB the stream count
  * scales with the cluster (here 8 keeps the oracle small); occupancy
  * loss vs exact greedy is bounded by one straddling doc per boundary.
  */
object Packing {

  /** Per-pack assignment summary: one row per (stream, pack) with doc
    * span, token fill, and occupancy against the budget. */
  def packSequences(documents: DataFrame, budget: Int = 512,
                    nStreams: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("stream_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("stream_id", (col("doc_id") % nStreams).cast("int"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor((col("end_off") - col("n_tokens")) / budget).cast("long"))
      .groupBy(col("stream_id"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill_ratio", r6(col("n_tokens") / budget.toDouble))
      .orderBy("stream_id", "pack_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(doc_id % 8 AS INT) AS stream_id
           FROM documents),
         o AS (SELECT *,
             SUM(n_tokens) OVER (PARTITION BY stream_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
           FROM t),
         p AS (SELECT stream_id,
             CAST(FLOOR(CAST(end_off - n_tokens AS DOUBLE) / 512) AS BIGINT) AS pack_id,
             n_tokens, doc_id
           FROM o)
         SELECT stream_id, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           ${sqlR("CAST(SUM(n_tokens) AS DOUBLE) / 512", 6)} AS fill_ratio
         FROM p GROUP BY 1, 2 ORDER BY stream_id, pack_id"""
  )
}
