package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DISTRIBUTED cumulative counts over a (group..., value, cnt)
  * distinct-value frame — the two-level prefix sum that replaces a
  * partition-less `Window.orderBy(value)`:
  *
  *  1. one approx-percentile pass over the distinct-value frame yields
  *     `buckets`-1 range boundaries per group (a bounded sketch — never
  *     an NDV-sized buffer), pinned by an eager localCheckpoint so every
  *     plan branch buckets identically;
  *  2. each row gets a broadcast-computed bucket id (count of boundaries
  *     below its value — ties stay deterministic because equal values get
  *     equal buckets), and the cumulative sum runs under
  *     `Window.partitionBy(group..., bucket).orderBy(value)` — parallel
  *     across buckets, disk-backed within one;
  *  3. per-bucket subtotals (≤ groups × buckets rows) turn into running
  *     offsets via a broadcast triangular self-join, and the global
  *     cumulative count is offset + local cumulative.
  *
  * The result is bit-identical to the single-partition window (the
  * boundaries only PLACE the cut points; sums are exact longs) while the
  * serial term drops from one NDV-sized external sort to NDV/buckets.
  * On a 1000-executor cluster reading a continuous column (NDV ≈ rows),
  * that is the difference between one straggler task sorting the whole
  * distinct frame and a fleet of range-local sorts.
  *
  * `valueCol` must be non-null (callers filter); `cntCol` must be a
  * bigint count. Adds the column `cum`; internal columns are dropped.
  */
object PrefixSum {

  def cumulative(frame: DataFrame, valueCol: String, cntCol: String,
                 groupCols: Seq[String] = Nil, buckets: Int = 32): DataFrame = {
    val pcts = (1 until buckets).map(i => i.toDouble / buckets)
      .mkString("array(", ",", ")")
    val bAgg = expr(s"approx_percentile($valueCol, $pcts, 1000)").as("pfx_bs")
    // ONE boundary set for every branch: approx_percentile's merge order
    // is not guaranteed deterministic across recomputations, and the
    // bucketed frame feeds both the windowed branch and the subtotal
    // branch — a checkpoint of this tiny frame (one row per group) makes
    // the bucket assignment a constant of the query.
    val bounds =
      (if (groupCols.isEmpty) frame.agg(bAgg)
       else frame.groupBy(groupCols.map(col): _*).agg(bAgg))
        .localCheckpoint()
    val withB =
      if (groupCols.isEmpty) frame.crossJoin(broadcast(bounds))
      else frame.join(broadcast(bounds), groupCols)
    val bucketed = withB.withColumn("pfx_bucket",
      expr(s"aggregate(pfx_bs, 0, (a, x) -> a + (CASE WHEN $valueCol > x THEN 1 ELSE 0 END))"))
    val keys = groupCols :+ "pfx_bucket"
    val wLoc = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("pfx_local", sum(col(cntCol)).over(wLoc))
    // Subtotals are ≤ groups × buckets rows; checkpointing them keeps the
    // triangular offset join from recomputing the underlying aggregate
    // twice more (once per self-join side).
    val tot = bucketed.groupBy(keys.map(col): _*)
      .agg(sum(col(cntCol)).as("pfx_tot"))
      .localCheckpoint()
    val totB = tot.select(
      groupCols.map(g => col(g).as(s"pfx_b_$g")) ++
        Seq(col("pfx_bucket").as("pfx_b_bucket"), col("pfx_tot").as("pfx_b_tot")): _*)
    val joinCond = groupCols
      .map(g => col(g) === col(s"pfx_b_$g"))
      .foldLeft(col("pfx_b_bucket") < col("pfx_bucket"))(_ && _)
    val off = tot.join(broadcast(totB), joinCond, "left")
      .groupBy(keys.map(col): _*)
      .agg(coalesce(sum(col("pfx_b_tot")), lit(0L)).as("pfx_off"))
    local.join(broadcast(off), keys)
      .withColumn("cum", col("pfx_local") + col("pfx_off"))
      .drop("pfx_bs", "pfx_bucket", "pfx_local", "pfx_off")
  }
}
