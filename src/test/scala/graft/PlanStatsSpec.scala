package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PlanStats

class PlanStatsSpec extends AnyFunSuite {
  import TestSession._

  test("rowCount memoizes by canonical plan across independently-built frames") {
    PlanStats.clear()
    val expected = Tables.embeddings(spark, sf).count()

    // first probe populates the cache
    assert(PlanStats.rowCount(Tables.embeddings(spark, sf)) == expected)

    // second probe on a SEPARATELY-constructed identical read must hit the
    // cache — observed as zero new Spark jobs. Build the frame BEFORE
    // registering the listener: constructing a parquet read can launch a
    // schema-inference job, which is outside the cache's contract.
    val again = Tables.embeddings(spark, sf)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(PlanStats.rowCount(again) == expected)
      Thread.sleep(1500) // listener bus is async; give events time to drain
      assert(jobs.get() == 0, "cached rowCount should not launch Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)

    // distinct plans do not collide
    val filtered = Tables.embeddings(spark, sf).filter("label < 2")
    val nf = PlanStats.rowCount(filtered)
    assert(nf < expected && nf == filtered.count())

    // clear() forgets everything (and a re-probe still answers correctly)
    PlanStats.clear()
    assert(PlanStats.rowCount(Tables.embeddings(spark, sf)) == expected)
  }

  test("same-typed reads of DIFFERENT directories do not collide") {
    // Canonicalization erases column names and HadoopFsRelation.toString
    // omits the path, so sf0.001 and sf0.01 embeddings canonicalize to the
    // SAME plan string — the key must still tell them apart via the file
    // location, or the second probe silently returns the first's count.
    PlanStats.clear()
    // orders, not embeddings: the doc tables are generated at the SAME
    // row count for sf0.001 and sf0.01, which would mask a collision
    val small = Tables.orders(spark, "/root/testdata/sf0.001")
    val big = Tables.orders(spark, "/root/testdata/sf0.01")
    val nSmall = PlanStats.rowCount(small)
    val nBig = PlanStats.rowCount(big)
    assert(nSmall == small.count() && nBig == big.count())
    assert(nSmall != nBig, "different datasets must not share a cache entry")
  }

  test("frames built from in-memory data are counted correctly, uncached") {
    // A LocalRelation's rows are invisible to the plan string: two
    // same-schema literal frames with different data must each count
    // their own rows (the device declines to cache rather than collide).
    PlanStats.clear()
    import spark.implicits._
    assert(PlanStats.rowCount(Seq(1, 2, 3).toDF("v")) == 3L)
    assert(PlanStats.rowCount(Seq(4, 5).toDF("v")) == 2L)
  }
}
