package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Graph analytics over the warehouse's entity relationships.
  *
  * The reference models customer/supplier interaction strength only
  * implicitly (supplier volume ranks in its feature store,
  * core/ml_pipeline_framework.py:188-218 merchant_volume_rank); a
  * centrality score over the trade graph is the natural mart on top:
  * weighted PageRank on the bipartite customer↔supplier graph induced
  * by line items.
  *
  * Scale design (the same iterative shape as
  * [[graft.dedup.Dedup.nearDupClusters]]):
  *   - The edge list with precomputed contribution fractions (w/out_w)
  *     is built ONCE and localCheckpoint'ed — iterations never re-run
  *     the join lineage, and per-round planning stays O(1).
  *   - Each iteration is one co-partitioned join (ranks ⋈ edges on the
  *     source key) plus one aggregation on the destination key — the
  *     only shuffles, both on node id, both AQE-coalesced.
  *   - Rank mass per destination is summed as DECIMAL(38,18), so the
  *     result is independent of partition order (bit-stable on any
  *     cluster size) and reproducible by the oracle's chained CTEs.
  *   - A fixed iteration count (default 5) keeps the job graph static;
  *     every node of the bipartite graph has in- and out-edges, so
  *     there is no dangling-mass correction term.
  */
object Graph {

  /** Weighted PageRank over the customer↔supplier bipartite graph.
    * Node ids: customers → 2·custkey, suppliers → 2·suppkey+1. Edge
    * weight = number of line items between the pair, both directions.
    * Emits one row per node: type, original key, and the rank scaled
    * by node count (≈1.0 for an average node). */
  def pageRank(lineitem: DataFrame, orders: DataFrame,
               iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
    val directed = pairs.select(explode(array(
        struct((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"), col("w")),
        struct((col("l_suppkey") * 2 + 1).as("src"), (col("o_custkey") * 2).as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    // contribution fraction per edge is iteration-invariant: frac = w/Σw(src)
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    // The out-weight window leaves the frame hash-partitioned by src, and
    // localCheckpoint preserves that partitioning — so every iteration's
    // ranks⋈edges join can reuse it and only shuffle the (small) ranks
    // side; on a small ranks frame AQE broadcasts that side instead. The
    // per-round contribution aggregation partial-aggregates map-side, so
    // the dst exchange moves at most partitions×nodes rows, not edges.
    val edges = directed
      .withColumn("frac", col("w").cast("double") / sum(col("w")).over(wS).cast("double"))
      .select(col("src"), col("dst"), col("frac"))
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("nid")).distinct()
    val nB = broadcast(nodes.agg(count(lit(1)).cast("double").as("nn")))
    var ranks = nodes.crossJoin(nB)
      .select(col("nid"), (lit(1d) / col("nn")).as("p"))
    // NO per-iteration checkpoint: the iteration count is FIXED (no
    // convergence read needs a materialization), the per-round plan is
    // two operators over the checkpointed edge frame, and five lazy
    // checkpoints cost five sequential driver jobs where one job can
    // pipeline all five joins+aggregations back to back (measured 6.3 s
    // -> the iterative floor at sf0.1; values are unchanged — the
    // decimal mass sums are partition-order-free).
    for (_ <- 1 to iterations) {
      ranks = edges.join(ranks, col("src") === col("nid"))
        .groupBy(col("dst"))
        .agg(sum((col("p") * col("frac")).cast("decimal(38,18)")).cast("double").as("mass"))
        .crossJoin(nB)
        .select(col("dst").as("nid"),
          ((lit(1d) - damping) / col("nn") + lit(damping) * col("mass")).as("p"))
    }
    val result = ranks.crossJoin(nB)
      .select(
        when(col("nid") % 2 === 0, "customer").otherwise("supplier").as("node_type"),
        floor(col("nid") / 2).cast("long").as("entity_key"),
        r6(col("p") * col("nn")).as("rank_scaled"))
      .orderBy("node_type", "entity_key")
      .localCheckpoint()
    edges.unpersist()
    result
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> ((s, d) => pageRank(Tables.lineitem(s, d), Tables.orders(s, d)))
  )

  /** Oracle: the same 5 iterations unrolled as chained CTEs, with the
    * identical decimal-summed mass and identical frac/term structure. */
  val oracles: Map[String, String] = {
    val iter = (k: Int) =>
      s"""it$k AS (
         SELECT e.dst AS nid,
           (1 - 0.85) / nn.n + 0.85 * CAST(SUM(CAST(p.p * e.frac AS DECIMAL(38,18))) AS DOUBLE) AS p
         FROM edges e JOIN it${k - 1} p ON p.nid = e.src CROSS JOIN nn
         GROUP BY e.dst, nn.n)"""
    Map(
      "q_pagerank" ->
        s"""WITH pairs AS (
             SELECT o_custkey, l_suppkey, CAST(COUNT(*) AS BIGINT) w
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY 1, 2),
           directed AS (
             SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, w FROM pairs
             UNION ALL
             SELECT l_suppkey * 2 + 1, o_custkey * 2, w FROM pairs),
           edges AS (
             SELECT src, dst,
               CAST(w AS DOUBLE) / CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS frac
             FROM directed),
           nodes AS (SELECT DISTINCT src AS nid FROM edges),
           nn AS (SELECT CAST(COUNT(*) AS DOUBLE) n FROM nodes),
           it0 AS (SELECT nid, 1.0 / nn.n AS p FROM nodes CROSS JOIN nn),
           ${(1 to 5).map(iter).mkString(",\n           ")}
           SELECT
             CASE WHEN nid % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
             CAST(FLOOR(nid / 2.0) AS BIGINT) AS entity_key,
             FLOOR(p * nn.n * 1000000 + 0.5) / 1000000 AS rank_scaled
           FROM it5 CROSS JOIN nn ORDER BY 1, 2"""
    )
  }
}
