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
}
