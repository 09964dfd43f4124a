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

  /** Ranked round-robin shard assignment: every doc ranked globally by
    * estimated token count (the q_token_count est-BPE device:
    * ceil(n_chars/4)), then dealt to `nShards` shards round-robin in rank
    * order — the distributable relaxation of greedy LPT balancing, with
    * per-shard token totals within one max-doc of each other (each shard
    * takes one doc from every consecutive size band).
    *
    * The global rank is the classic 100 TB trap: ROW_NUMBER over an
    * unpartitioned window is a single-task sort of the corpus. Here it
    * derives from the exact distributed [[graft.functions.PrefixSum]]
    * cumulative count over the DISTINCT token-count values (NDV-scale,
    * range-bucketed past 1M NDV) plus a within-tie ROW_NUMBER partitioned
    * by the token count — every window partitions on a real key. */
  def shardPlan(documents: DataFrame, nShards: Int = 16): DataFrame = {
    // NULL text would rank NULLS FIRST in Spark but NULLS LAST in the
    // oracle's ROW_NUMBER — drop it instead of depending on a nullable
    // column's engine-specific sort position (the QI-null-ordering class)
    val base = documents.filter(col("text").isNotNull)
      .select(col("doc_id"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_tokens"))
    // NDV-scale distinct frame, pinned per the PrefixSum caller contract
    val dist = base.groupBy(col("est_tokens")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val cum = graft.functions.PrefixSum.cumulative(dist, "est_tokens", "cnt")
    val wTie = Window.partitionBy(col("est_tokens")).orderBy(col("doc_id"))
    base
      .join(cum.select(col("est_tokens"), col("cnt"), col("cum")), Seq("est_tokens"))
      .withColumn("rnk", col("cum") - col("cnt") + row_number().over(wTie))
      .withColumn("shard", ((col("rnk") - 1) % nShards).cast("int"))
      .select(col("doc_id"), col("est_tokens"), col("rnk"), col("shard"))
      .orderBy("rnk")
  }

  /** The shard-grain balance mart over [[shardPlan]]: per-shard doc and
    * token totals plus the fill ratio against the ideal even split —
    * the number a training launcher checks before committing a shard
    * layout. `nShards`-row output; the ideal is a broadcast scalar. */
  def shardBalance(documents: DataFrame, nShards: Int = 16): DataFrame = {
    val plan = shardPlan(documents, nShards)
    val tot = plan.agg(sum(col("est_tokens")).as("tot"))
    plan.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("shard_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("shard_tokens"),
        r6(col("shard_tokens") * lit(nShards.toDouble) / col("tot")).as("balance_ratio"))
      .orderBy("shard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d))),
    "q_shard_plan" -> ((s, d) => shardPlan(Tables.documents(s, d))),
    "q_shard_balance" -> ((s, d) => shardBalance(Tables.documents(s, d)))
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
         FROM p GROUP BY 1, 2 ORDER BY stream_id, pack_id""",
    // ROW_NUMBER over the full corpus is legal in the one-node oracle;
    // the Spark side derives the same rank distributively (PrefixSum +
    // within-tie window) — that equivalence IS what the hash gate checks.
    "q_shard_plan" ->
      """WITH t AS (SELECT doc_id,
             CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_tokens
           FROM documents WHERE text IS NOT NULL)
         SELECT doc_id, est_tokens,
           ROW_NUMBER() OVER (ORDER BY est_tokens, doc_id) AS rnk,
           CAST((ROW_NUMBER() OVER (ORDER BY est_tokens, doc_id) - 1) % 16 AS INT) AS shard
         FROM t ORDER BY rnk""",
    "q_shard_balance" ->
      s"""WITH t AS (SELECT doc_id,
             CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_tokens
           FROM documents WHERE text IS NOT NULL),
         r AS (SELECT est_tokens,
             CAST((ROW_NUMBER() OVER (ORDER BY est_tokens, doc_id) - 1) % 16 AS INT) AS shard
           FROM t),
         tot AS (SELECT SUM(est_tokens) AS tot FROM t)
         SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(est_tokens) AS BIGINT) AS shard_tokens,
           ${sqlR("CAST(SUM(est_tokens) AS DOUBLE) * 16.0 / MAX(tot.tot)", 6)} AS balance_ratio
         FROM r, tot GROUP BY shard ORDER BY shard"""
  )
}
