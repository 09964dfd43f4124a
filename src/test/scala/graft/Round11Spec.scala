package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

/** Behavioral invariants for the round-11 additions beyond their
  * row-level oracles — the IVF-PQ search family first. */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("round11-spec").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("pqRefine with an unbounded shortlist degenerates to exact IVF search (the probing ceiling)") {
    // shortlist >= every cell population => refine re-ranks ALL probed
    // candidates with exact cosine == ivfSearch's own result
    val ref = Ann.pqRefine(emb, shortlist = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val ivf = Ann.ivfSearch(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ref.sorted.toSeq == ivf.sorted.toSeq)
  }

  test("pqEval: refinement never loses a hit the ADC ranking had (per-probe monotonicity)") {
    // any brute-force-true neighbor in the ADC top-k is also in the
    // 50-row shortlist, and globally at most k-1 vectors outrank it on
    // exact cosine — so it must survive the exact re-rank
    val ev = Ann.pqEval(emb).collect()
    assert(ev.nonEmpty)
    ev.foreach { r =>
      assert(r.getAs[Long]("n_ref_hits") >= r.getAs[Long]("n_adc_hits"),
        s"probe ${r.getAs[Long]("probe_id")} lost hits in refinement")
    }
  }

  test("pqSearch: ADC candidates come only from the probe's cells, k rows per probe max") {
    val out = Ann.pqSearch(emb).collect()
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rows) =>
      assert(rows.length <= 10, s"probe $p returned ${rows.length} rows")
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
      assert(!rows.exists(_.getLong(2) == p), s"probe $p returned itself")
    }
  }
}
