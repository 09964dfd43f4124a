package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DISTRIBUTED cumulative counts over a (group..., value, cnt)
  * distinct-value frame — the two-level prefix sum that replaces a
  * partition-less `Window.orderBy(value)`:
  *
  *  1. a cheap eager probe (per-group distinct counts) picks the branch;
  *     on the bucketed side `buckets`-1 approx-percentile range
  *     boundaries per group are pinned by an EAGER localCheckpoint so
  *     every plan branch buckets identically (lazy would race on a
  *     cluster — see the inline note);
  *  2. each row gets a broadcast-computed bucket id (count of boundaries
  *     below its value — ties stay deterministic because equal values get
  *     equal buckets), and the cumulative sum runs under
  *     `Window.partitionBy(group..., bucket).orderBy(value)` — parallel
  *     across buckets, disk-backed within one;
  *  3. per-bucket subtotals (≤ groups × buckets rows) turn into running
  *     offsets via a broadcast triangular self-join, and the global
  *     cumulative count is offset + local cumulative.
  *
  * ADAPTIVE: when the probe shows every group's NDV under
  * `fallbackNdv`, the machinery above is pure overhead — a single
  * window over a bounded frame sorts in well under the bucketed
  * path's fixed cost (two more localCheckpoints, the boundary sketch
  * and three exchanges), and the fallback branch skips the boundary
  * estimation entirely. At 100× scale (NDV ≈ rows for a continuous
  * column) the probe
  * reads past the threshold and the bucketed path engages — the
  * difference between one straggler task sorting the whole distinct
  * frame and a fleet of range-local sorts. PlanQualitySpec pins both
  * sides of the branch.
  *
  * The result is bit-identical either way (the boundaries only PLACE
  * the cut points; sums are exact longs).
  *
  * `valueCol` must be non-null (callers filter); `cntCol` must be a
  * bigint count. Adds the column `cum`; internal columns are dropped.
  *
  * EAGER: every entry point in this object runs Spark jobs at
  * DataFrame-CONSTRUCTION time (the NDV probe; on the bucketed branch
  * also the boundary-sketch checkpoint) — it is not a pure plan-to-plan
  * transform. Callers pay the input lineage at build time (pin it first
  * if it is expensive — see [[exactPercentilesOnCounts]]), and none of
  * these devices can be applied to a streaming DataFrame.
  */
object PrefixSum {

  /** NDV below which the single-window form wins. The bucketed path's
    * fixed cost is substantial regardless of data size — two more
    * localCheckpoints, an NDV probe, four broadcasts and ~8 AQE stage
    * jobs, measured at ~1s of driver-serial overhead — while a one-task
    * external sort of a ≤1M-row distinct frame is comfortably under
    * that (≈0.5s), and under a grouped `partitionBy` the "straggler" is
    * one task per GROUP, running in parallel. Past ~1M distinct values
    * the serial sort term starts to dominate any fleet (a continuous
    * column at 100 TB has NDV ≈ rows, i.e. billions — deep into the
    * bucketed regime either way), so the cutover sits where the two
    * curves cross, not at the smallest "safe" value. */
  val DefaultFallbackNdv = 1L << 20

  /** `frame` SHOULD be materialized (localCheckpoint/cache) by the
    * caller: the probe runs eagerly against it and the window/subtotal/
    * boundary branches each re-execute its lineage otherwise —
    * [[exactPercentiles]] pins for you; direct callers (e.g.
    * quantileBins) pin at the call site. */
  def cumulative(frame: DataFrame, valueCol: String, cntCol: String,
                 groupCols: Seq[String] = Nil, buckets: Int = 32,
                 fallbackNdv: Long = DefaultFallbackNdv): DataFrame = {
    // Branch on a CHEAP probe first (per-group row counts of the distinct
    // frame — no sketch work), so the fallback side never pays for
    // boundary estimation at all; the approx_percentile pass below runs
    // only once the bucketed path is already decided.
    // the output column must not silently REPLACE a caller's: withColumn
    // overwrites same-named columns without warning, which would corrupt
    // the caller's data instead of erroring
    require(!frame.columns.contains("cum"),
      "PrefixSum.cumulative adds a column named 'cum'; the input frame already has one — rename it first")
    val ndvAgg = count(lit(1)).as("pfx_ndv")
    val maxNdv =
      (if (groupCols.isEmpty) frame.agg(ndvAgg)
       else frame.groupBy(groupCols.map(col): _*).agg(ndvAgg))
        .agg(max(col("pfx_ndv"))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    if (maxNdv <= fallbackNdv) {
      // The probe just proved the frame is ≤ fallbackNdv rows, so the
      // single-task sort is the cheaper plan by design (see the ADAPTIVE
      // note above). With no groupCols the partition spec is Fns.onePart
      // — a non-foldable constant that keeps WindowExec's "No Partition
      // Defined" warning reserved for REAL unbounded windows.
      val parts =
        if (groupCols.isEmpty) Seq(Fns.onePart(col(valueCol)))
        else groupCols.map(col)
      val w = Window.partitionBy(parts: _*).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return frame.withColumn("cum", sum(col(cntCol)).over(w))
    }
    val pcts = (1 until buckets).map(i => i.toDouble / buckets)
      .mkString("array(", ",", ")")
    val bAgg = expr(s"approx_percentile($valueCol, $pcts, 1000)").as("pfx_bs")
    // ONE boundary set for every branch: approx_percentile's merge order
    // is not guaranteed deterministic across recomputations, and the
    // bucketed frame feeds both the windowed branch and the subtotal
    // branch — a checkpoint of this tiny frame (one row per group) makes
    // the bucket assignment a constant of the query. This checkpoint
    // must stay EAGER: a lazy one can be materialized by TWO concurrent
    // broadcast-collect jobs (the final plan's own exchange plus the one
    // frozen inside the subtotal frame's checkpoint plan), and on a
    // multi-executor cluster the racing copies can hold DIFFERENT
    // boundary arrays — local-mode tests can never exhibit it. The
    // eager job is tiny because callers pin `frame` first (see the
    // method contract).
    val bounds =
      (if (groupCols.isEmpty) frame.agg(bAgg)
       else frame.groupBy(groupCols.map(col): _*).agg(bAgg))
        .localCheckpoint()
    // Group-key joins are NULL-SAFE (<=>): a NULL group key is a real
    // group to groupBy/Window.partitionBy (and to the percentile()
    // aggregate this device replaces) — a plain equi-join would silently
    // drop it on the bucketed branch only, making the two branches
    // disagree.
    def nullSafeOn(cols: Seq[String], prefix: String) =
      cols.map(g => col(g) <=> col(s"$prefix$g")).reduce(_ && _)
    val withB =
      if (groupCols.isEmpty) frame.crossJoin(broadcast(bounds))
      else {
        val b = bounds.select(
          groupCols.map(g => col(g).as(s"pfx_j_$g")) :+ col("pfx_bs"): _*)
        frame.join(broadcast(b), nullSafeOn(groupCols, "pfx_j_"))
          .drop(groupCols.map(g => s"pfx_j_$g"): _*)
      }
    val bucketed = withB.withColumn("pfx_bucket",
      expr(s"aggregate(pfx_bs, 0, (a, x) -> a + (CASE WHEN $valueCol > x THEN 1 ELSE 0 END))"))
    val keys = groupCols :+ "pfx_bucket"
    val wLoc = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("pfx_local", sum(col(cntCol)).over(wLoc))
    // Subtotals are ≤ groups × buckets rows; checkpointing them keeps the
    // triangular offset join from recomputing the underlying aggregate
    // twice more (once per self-join side). LAZY is safe HERE (unlike
    // bounds): the subtotal values are exact sums, so even a racing
    // double materialization yields identical content.
    val tot = bucketed.groupBy(keys.map(col): _*)
      .agg(sum(col(cntCol)).as("pfx_tot"))
      .localCheckpoint(false)
    val totB = tot.select(
      groupCols.map(g => col(g).as(s"pfx_b_$g")) ++
        Seq(col("pfx_bucket").as("pfx_b_bucket"), col("pfx_tot").as("pfx_b_tot")): _*)
    val joinCond = groupCols
      .map(g => col(g) <=> col(s"pfx_b_$g"))
      .foldLeft(col("pfx_b_bucket") < col("pfx_bucket"))(_ && _)
    val off = tot.join(broadcast(totB), joinCond, "left")
      .groupBy(keys.map(col): _*)
      .agg(coalesce(sum(col("pfx_b_tot")), lit(0L)).as("pfx_off"))
    val offB = off.select(
      keys.map(k => col(k).as(s"pfx_o_$k")) :+ col("pfx_off"): _*)
    local.join(broadcast(offB), nullSafeOn(keys, "pfx_o_"))
      .drop(keys.map(k => s"pfx_o_$k"): _*)
      .withColumn("cum", col("pfx_local") + col("pfx_off"))
      .drop("pfx_bs", "pfx_bucket", "pfx_local", "pfx_off")
  }

  /** Exact per-group percentiles with Spark `Percentile` interpolation —
    * the distributed replacement for `expr("percentile(v, p)")`, whose
    * value→count buffer is an NDV-sized in-memory map ON ONE REDUCER (the
    * OOM funnel every profile-at-scale query hits). Here the distinct
    * frame's cumulative counts come from [[cumulative]] (range-bucketed
    * past `fallbackNdv`), each requested rank lands on the value-run
    * covering it, and the interpolation (hi−r)·v_lo + (r−lo)·v_hi is the
    * same arithmetic `Percentile.getPercentile` evaluates — including its
    * equal-endpoint short-circuit (when both rank endpoints land on the
    * same value-run the result IS that value; the reconstruction form
    * can be 1 ulp off for non-dyadic p) — bit-identical output, never a
    * single-reducer buffer.
    *
    * Returns one row per group: `groupCols` ++ one double column per
    * `(label, p)` plus `pct_n` (the non-null count the percentile ranks
    * were computed over; callers usually `.drop("pct_n")`). NULL values
    * are excluded, matching the aggregate's semantics; NULL GROUP KEYS
    * are kept as their own group, matching groupBy. Empty input yields
    * an empty frame (grouped) — callers that need a NULL row for the
    * global case guard upstream.
    */
  def exactPercentiles(df: DataFrame, valueCol: String,
                       groupCols: Seq[String],
                       percentiles: Seq[(String, Double)],
                       buckets: Int = 32,
                       fallbackNdv: Long = DefaultFallbackNdv): DataFrame = {
    // Pin the distinct frame: it feeds the totals aggregate plus the
    // NDV probe and cumulative window inside [[cumulative]] — three
    // executions of the upstream scan without pinning (for skewProfile
    // the upstream is itself the full per-key count aggregate). The
    // frame is NDV-scale, the same magnitude the cumulative shuffle
    // already moves; the lineage-truncation trade is the one the dedup
    // cluster propagation already makes.
    // LAZY checkpoint: the device's first eager job (the NDV probe in
    // [[cumulative]]) materializes the distinct frame as a side effect,
    // so pinning costs no extra pass of its own — every later branch
    // (cumulative window, totals, boundary sketch) reuses the pinned RDD.
    val vals = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("pct_cnt"))
      .localCheckpoint(false)
    exactPercentilesOnCounts(vals, valueCol, "pct_cnt", groupCols,
      percentiles, buckets, fallbackNdv)
  }

  /** [[exactPercentiles]] over a PRE-AGGREGATED distinct-value frame:
    * `vals` must hold one row per (groupCols..., valueCol) with `cntCol`
    * its bigint multiplicity, no NULL values (NULL group keys are fine),
    * and SHOULD already be materialized (localCheckpoint/cache) — the
    * device runs eager probe jobs against it, so an unpinned lineage is
    * recomputed several times. Callers that already need the distinct
    * frame for other per-value passes (a profile computing moments,
    * outlier counts and quartiles, e.g. [[graft.ml.Features.featureStats]])
    * build + pin it ONCE and share it, instead of paying a second
    * distinct shuffle inside this device. */
  def exactPercentilesOnCounts(vals: DataFrame, valueCol: String,
                               cntCol: String,
                               groupCols: Seq[String],
                               percentiles: Seq[(String, Double)],
                               buckets: Int = 32,
                               fallbackNdv: Long = DefaultFallbackNdv): DataFrame = {
    val totals =
      (if (groupCols.isEmpty) vals.agg(sum(col(cntCol)).as("pct_n"))
       else vals.groupBy(groupCols.map(col): _*).agg(sum(col(cntCol)).as("pct_n")))
    val runs0 = cumulative(vals, valueCol, cntCol, groupCols, buckets, fallbackNdv)
      .withColumn("pct_end", col("cum") - 1)
      .withColumn("pct_start", col("pct_end") - col(cntCol) + 1)
    val runs =
      if (groupCols.isEmpty) runs0.crossJoin(broadcast(totals))
      else {
        // null-safe: a NULL group key is a real group (see cumulative)
        val t = totals.select(
          groupCols.map(g => col(g).as(s"pct_j_$g")) :+ col("pct_n"): _*)
        runs0.join(broadcast(t),
            groupCols.map(g => col(g) <=> col(s"pct_j_$g")).reduce(_ && _))
          .drop(groupCols.map(g => s"pct_j_$g"): _*)
      }
    // working columns are pct_-prefixed like everything else in this
    // device: an unprefixed withColumn("lo"/"r"/…) would silently
    // REPLACE a caller's same-named group column and group on rank
    // indices instead of erroring
    val specs = percentiles.zipWithIndex.map { case ((_, p), i) =>
      struct(lit(i).as("ei"), lit(p).as("p"))
    }
    val placed = runs
      .withColumn("pct_pp", explode(array(specs: _*)))
      .withColumn("pct_r", col("pct_pp.p") * (col("pct_n") - 1).cast("double"))
      .withColumn("pct_lo", floor(col("pct_r")))
      .withColumn("pct_hi", ceil(col("pct_r")))
      .filter(col("pct_lo").between(col("pct_start"), col("pct_end")) ||
              col("pct_hi").between(col("pct_start"), col("pct_end")))
      .groupBy((groupCols.map(col) :+ col("pct_pp.ei").as("pct_ei")): _*)
      .agg(
        max(when(col("pct_lo").between(col("pct_start"), col("pct_end")),
          col(valueCol))).as("pct_vlo"),
        max(when(col("pct_hi").between(col("pct_start"), col("pct_end")),
          col(valueCol))).as("pct_vhi"),
        max(col("pct_r")).as("pct_r"), max(col("pct_lo")).as("pct_lo"),
        max(col("pct_hi")).as("pct_hi"),
        max(col("pct_n")).as("pct_n"))
      // Equal-endpoint short-circuit, as Percentile.getPercentile does:
      // when both rank endpoints fall in the same duplicated-value run,
      // return the value itself — the reconstruction (hi−r)·v + (r−lo)·v
      // is 1 ulp off for non-dyadic p, which an r6 half-boundary turns
      // into an oracle hash drift.
      .withColumn("pct_q",
        when(col("pct_lo") === col("pct_hi") || col("pct_vlo") === col("pct_vhi"),
          col("pct_vlo"))
          .otherwise((col("pct_hi") - col("pct_r")) * col("pct_vlo") +
                     (col("pct_r") - col("pct_lo")) * col("pct_vhi")))
    val pivots = percentiles.zipWithIndex.map { case ((label, _), i) =>
      max(when(col("pct_ei") === i, col("pct_q"))).as(label)
    } :+ max(col("pct_n")).as("pct_n")
    if (groupCols.isEmpty) placed.agg(pivots.head, pivots.tail: _*)
    else placed.groupBy(groupCols.map(col): _*).agg(pivots.head, pivots.tail: _*)
  }
}
