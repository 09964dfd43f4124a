package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Marts
import graft.ml.Inference
import graft.text.TextOps
import graft.ann.Ann

/** Session-4 operators: TPC-H-shape marts (order priority, promo share,
  * top supplier, customer distribution, order backlog), Gopher quality
  * gates, calibration bins, and the wide-band LSH rung. */
class Session4Spec extends AnyFunSuite {
  import TestSession._

  test("order priority mart counts exactly the orders with a >60-day-late line") {
    val orders = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val out = Marts.orderPriority(orders, li).collect()
    assert(out.nonEmpty)
    // independent recompute: distinct late orderkeys via an inner join
    val expected = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"))
      .select("o_orderkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_delayed_orders")).sum == expected)
    out.foreach(r => assert(r.getAs[String]("quarter").matches("\\d{4}-Q[1-4]")))
  }

  test("promo share: promo revenue never exceeds total, share in [0,100]") {
    val out = Marts.promoShare(
      Tables.lineitem(spark, sf), Tables.part(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("promo_revenue") <= r.getAs[Double]("total_revenue"))
      val s = r.getAs[Double]("promo_share_pct")
      assert(s >= 0.0 && s <= 100.0)
    }
    // every lineitem lands in exactly one month
    assert(out.map(_.getAs[Long]("n_lines")).sum ==
      Tables.lineitem(spark, sf).count())
  }

  test("top supplier: each nation's winners carry that nation's max revenue") {
    val out = Marts.topSupplier(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf)).collect()
    assert(out.nonEmpty)
    // independent recompute of the per-nation max over the same window
    val perSupp = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(graft.functions.Fns.decSum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(max(col("revenue")).as("mx"))
      .collect().map(r => r.getAs[String]("n_name") -> r.getAs[Double]("mx")).toMap
    out.foreach(r =>
      assert(r.getAs[Double]("revenue") == perSupp(r.getAs[String]("nation_name"))))
  }

  test("customer order distribution conserves customers and orders") {
    val out = Marts.customerOrderDist(
      Tables.customer(spark, sf), Tables.orders(spark, sf)).collect()
    assert(out.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sf).count())
    assert(out.map(r => r.getAs[Long]("n_orders") * r.getAs[Long]("n_customers")).sum ==
      Tables.orders(spark, sf).count())
  }

  test("order backlog: cumulative flows conserve, backlog never negative") {
    val orders = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val out = Marts.orderBacklog(orders, li).collect()
    assert(out.nonEmpty)
    val last = out.last
    assert(last.getAs[Long]("cum_placed") == orders.count())
    // orders fulfill on their last ship date; orders with no lineitems stay open
    val withLines = li.select("l_orderkey").distinct().count()
    assert(last.getAs[Long]("cum_fulfilled") == withLines)
    assert(last.getAs[Long]("backlog") == orders.count() - withLines)
    out.foreach(r => assert(r.getAs[Long]("backlog") >= 0L,
      s"negative backlog at ${r.getAs[java.sql.Date]("day")}"))
    // cumulative columns are monotone non-decreasing in day order
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_placed") <= b.getAs[Long]("cum_placed"))
        assert(a.getAs[Long]("cum_fulfilled") <= b.getAs[Long]("cum_fulfilled"))
      case _ =>
    }
  }

  test("gopher gates: keep is the conjunction, crafted docs fail the right rule") {
    import spark.implicits._
    val fifty = (1 to 50)
      .map(i => s"the quality of training and corpus text in word$i").mkString(" ")
    val docs = Seq(
      // passes everything: long english prose
      (1L, fifty, "en", "a", 100L),
      // too short
      (2L, "the of and tiny", "en", "b", 20L),
      // symbol-heavy: hashes outnumber a tenth of the words
      (3L, fifty + " " + ("# # # # # # # # # # # # # # # # # # # # " * 10), "en", "c", 100L),
      // no stopwords at all
      (4L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "d", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextOps.gopherGates(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("pass_word_count") && !rows(2L).getAs[Boolean]("keep"))
    assert(!rows(3L).getAs[Boolean]("pass_symbol") && !rows(3L).getAs[Boolean]("keep"))
    assert(!rows(4L).getAs[Boolean]("pass_stop") && !rows(4L).getAs[Boolean]("keep"))
    // on the real corpus: keep == AND of the five flags, everywhere
    TextOps.gopherGates(Tables.documents(spark, sf)).collect().foreach { r =>
      val expect = r.getAs[Boolean]("pass_word_count") &&
        r.getAs[Boolean]("pass_word_len") && r.getAs[Boolean]("pass_symbol") &&
        r.getAs[Boolean]("pass_alpha") && r.getAs[Boolean]("pass_stop")
      assert(r.getAs[Boolean]("keep") == expect)
    }
  }

  test("calibration bins partition the orders, rates and gaps consistent") {
    val orders = Tables.orders(spark, sf)
    val out = Inference.calibrationBins(orders).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum == orders.count())
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      val mp = r.getAs[Double]("mean_predicted")
      val obs = r.getAs[Double]("observed_rate")
      assert(mp >= 0.0 && mp <= 1.0)
      assert(obs >= 0.0 && obs <= 1.0)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
      // gap is |mean - observed| up to the edge rounding
      assert(math.abs(r.getAs[Double]("abs_gap") - math.abs(mp - obs)) < 2e-6)
      // bin b holds scores in [b/10, (b+1)/10) (bin 9 closed above)
      assert(mp >= bin / 10.0 - 1e-9 &&
        (mp < (bin + 1) / 10.0 + 1e-9 || bin == 9))
    }
  }

  test("adaptiveLshParams: 16-bit ladder below saturation, widening rungs past it") {
    // the in-regime ladder is unchanged (oracles mirror it)
    assert(Ann.adaptiveLshParams(1000L) == (16, 4))
    assert(Ann.adaptiveLshParams((1L << 4) * 100 + 1) == (16, 8))
    assert(Ann.adaptiveLshParams((1L << 8) * 100 + 1) == (16, 16))
    assert(Ann.adaptiveLshParams((1L << 16) * 100) == (16, 16))
    // past 2^16*cap the signature widens: 2 bands of the smallest b
    // with n <= 2^b * cap
    assert(Ann.adaptiveLshParams((1L << 16) * 100 + 1) == (34, 17))
    assert(Ann.adaptiveLshParams((1L << 17) * 100 + 1) == (36, 18))
    assert(Ann.adaptiveLshParams((1L << 20) * 100) == (40, 20))
    // bounded: band values must stay in an int
    assert(Ann.adaptiveLshParams(Long.MaxValue / 4) == (60, 30))
  }

  test("wide-band LSH rung still recalls exact duplicates") {
    // exact duplicates agree on every sign bit, so every band matches at
    // ANY width — the wide rung must recall all of them (buckets of 2
    // never trip the cap). This exercises the >16-bit branch end to end.
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    val dup = emb.union(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val pairs = Ann.lshNearDup(dup, nBits = 34, bandBits = 17, threshold = 0.999)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      assert(pairs.contains((id, id + 1000000L)),
        s"duplicate pair for vec $id not recalled by the 2x17-bit rung")
    }
    assert(n > 0)
  }

  test("wide-rung AUTO-selection: bandBits=0 with an injected count past " +
       "2^16*cap chooses and runs the widened signature end to end") {
    // Real test-scale data can never cross the 2^16*cap ≈ 6.5M-vector
    // rung, so the previous coverage forced (34, 17) by hand — proving
    // the store works at that width but not that the SELECTOR picks it.
    // countOverride injects the corpus count that drives adaptiveLshParams
    // while the data stays small: the bandBits=0 path must (a) select the
    // 2x17-bit rung for the injected count and (b) still recall every
    // exact duplicate through the widened signature it selected.
    val injected = (1L << 16) * 100 + 1
    assert(Ann.adaptiveLshParams(injected) == (34, 17))
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val dup = emb.union(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val auto = Ann.lshNearDup(dup, bandBits = 0, threshold = 0.999,
        countOverride = Some(injected))
      .select("vec_a", "vec_b", "n_shared_bands").collect()
    val pairSet = auto.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      assert(pairSet.contains((id, id + 1000000L)),
        s"duplicate pair for vec $id not recalled by the auto-selected wide rung")
    }
    // the 2x17-bit rung has exactly 2 bands — an exact duplicate shares
    // both; any pair sharing MORE than 2 bands proves a narrower (more
    // bands) parameterization ran instead of the auto-selected wide one
    assert(auto.forall(_.getAs[Long]("n_shared_bands") <= 2),
      "a pair shares >2 bands — the wide 2-band rung was not the one that ran")
    val dupPairs = auto.filter(r =>
      pairSet.contains((r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))) &&
        r.getAs[Long]("vec_b") - r.getAs[Long]("vec_a") == 1000000L)
    assert(dupPairs.forall(_.getAs[Long]("n_shared_bands") == 2),
      "exact duplicates must share both wide bands")
  }
}
