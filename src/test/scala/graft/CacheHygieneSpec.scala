package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operators must not leak persisted frames into the caller's session:
  * composing queries in one long-lived session would otherwise
  * accumulate cached partitions until memory pressure (and the ±2×
  * run-to-run bench variance that comes with cache churn). Every query
  * that historically persisted intermediates is collected here and the
  * session cache manager must be empty afterwards. */
class CacheHygieneSpec extends AnyFunSuite {
  import TestSession._

  private val formerlyLeaky =
    Seq("q_dedup_minhash", "q_ngram_jaccard", "q_dedup_clusters", "q_drift_sweep",
      "q_scd2_integrity",
      // session-2 consumers of the checkpointed propagation loop
      "q_embed_survivors", "q_dedup_survivors",
      // QA frames that checkpoint their capped candidate/bucket frames
      "q_minhash_est", "q_jaccard_hist")

  test("session cache manager is empty after each query's collect") {
    formerlyLeaky.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sf).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left persisted frames in the session cache")
    }
  }
}
