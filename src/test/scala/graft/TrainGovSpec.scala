package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.TrainPrep
import graft.operators.Quality
import graft.text.Vocab

/** Behavioral invariants for the round-9 training-prep / governance
  * additions beyond their row-level oracles: leakage exclusion in the
  * target encoder, the embargo gap's temporal ordering, the k-anonymity
  * floor, and hashing-trick mass conservation. */
class TrainGovSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("train-gov-spec").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("targetEncode: loo_enc equals the brute-force leave-one-out mean; 1-row class smooths to the prior") {
    val orders = Tables.orders(spark, sf)
    val enc = TrainPrep.targetEncode(orders).collect()
    val raw = orders.select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byCat = raw.groupBy(_._2)
    val prior = raw.map(_._3).sum / raw.length
    assert(enc.length == raw.length)
    enc.foreach { r =>
      val (cat, t) = (r.getAs[String]("o_orderpriority"), r.getAs[Double]("o_totalprice"))
      val others = byCat(cat).filter(_._1 != r.getAs[Long]("o_orderkey")).map(_._3)
      if (others.nonEmpty) {
        val loo = others.sum / others.length
        assert(math.abs(r.getAs[Double]("loo_enc") - loo) < 1e-2,
          s"loo mismatch for key ${r.getAs[Long]("o_orderkey")}")
      } else {
        assert(r.isNullAt(r.fieldIndex("loo_enc")))
        // m-smoothing of an empty LOO set collapses to the global prior
        assert(math.abs(r.getAs[Double]("te_smooth") - prior) < 1e-2)
      }
      // the encoder never reproduces the own row's target unless the
      // class genuinely centers there: smoothed value stays between the
      // prior and the LOO mean (convex combination)
      val lo = math.min(r.getAs[Double]("prior"),
        Option(r.get(r.fieldIndex("loo_enc"))).map(_.asInstanceOf[Double]).getOrElse(r.getAs[Double]("prior")))
      val hi = math.max(r.getAs[Double]("prior"),
        Option(r.get(r.fieldIndex("loo_enc"))).map(_.asInstanceOf[Double]).getOrElse(r.getAs[Double]("prior")))
      assert(r.getAs[Double]("te_smooth") >= lo - 1e-6 && r.getAs[Double]("te_smooth") <= hi + 1e-6)
    }
  }

  test("timeSplitEmbargo: splits are temporally ordered with a full embargo gap and partition the table") {
    val events = Tables.events(spark, sf)
    val n = events.count()
    val s = TrainPrep.timeSplitEmbargo(events).collect()
    assert(s.length == n)
    val byS = s.groupBy(_.getAs[String]("split")).view.mapValues(_.map(_.getAs[Long]("ts_s"))).toMap
    assert(byS.contains("train") && byS.contains("test"))
    val trainMax = byS("train").max
    val testMin = byS("test").min
    assert(testMin - trainMax >= 1L, "test must start strictly after train")
    byS.get("embargo").foreach { emb =>
      assert(emb.forall(t => t > trainMax && t < testMin))
      // the quarantined region spans less than the embargo window itself
      assert(testMin - trainMax <= 2 * 86400L)
    }
    // ~70% of the SPAN is train-side; sanity floor on both populations
    assert(byS("train").length > 0 && byS("test").length > 0)
  }

  test("kAnonymity: floor equals the min set size; shares sum to 1; flags match the threshold") {
    val cust = Tables.customer(spark, sf)
    val a = Quality.kAnonymity(cust, Seq("c_nationkey", "c_mktsegment"), k = 5).collect()
    val minN = a.map(_.getAs[Long]("n_rows")).min
    assert(a.forall(_.getAs[Long]("k_anonymity") == minN))
    assert(math.abs(a.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    assert(a.forall(r => r.getAs[Boolean]("violates_k") == (r.getAs[Long]("n_rows") < 5)))
    assert(a.map(_.getAs[Long]("n_rows")).sum == cust.count())
  }

  test("featureHashing: bucket counts conserve the token stream; buckets bounded; signed count parity-consistent") {
    val docs = Tables.documents(spark, sf)
    val fh = Vocab.featureHashing(docs, dims = 64).collect()
    assert(fh.forall(r => r.getAs[Int]("bucket") >= 0 && r.getAs[Int]("bucket") < 64))
    val tokTotals = graft.text.TextPrep.withWords(docs)
      .select(col("doc_id"), size(col("words")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    fh.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      assert(rows.map(_.getAs[Long]("cnt")).sum == tokTotals(id),
        s"doc $id: hashed counts must conserve the token count")
      assert(math.abs(rows.map(_.getAs[Double]("tf")).sum - 1.0) < 1e-3)
      rows.foreach { r =>
        val (c, sc) = (r.getAs[Long]("cnt"), r.getAs[Long]("signed_cnt"))
        assert(math.abs(sc) <= c && ((c - sc) % 2 == 0),
          "signed count must be reachable from cnt by ±1 terms")
      }
    }
  }
}
