package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotScaled, Fns}

/** Property tests for the cross-engine determinism invariants the whole
  * oracle strategy rests on: exact decimal sums and scaled-integer dots
  * must be invariant to partitioning (= summation order), and the
  * floor-rounding helpers must be pure functions of the input bits.
  * (Plain scalacheck Gens sampled with fixed seeds — the scalatestplus
  * bridge isn't on the offline classpath.)
  */
class DeterminismPropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("decSum is partition-order invariant (exact decimal arithmetic)") {
    val gen = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6).map(v => math.round(v * 100) / 100.0))
    samples(gen, 5).foreach { xs =>
      val one = xs.toDF("v").repartition(1)
        .agg(Fns.decSum(col("v"))).collect()(0).getDouble(0)
      val many = xs.toDF("v").repartition(7)
        .agg(Fns.decSum(col("v"))).collect()(0).getDouble(0)
      assert(one == many, s"decSum differed across partitionings: $one vs $many")
    }
  }

  test("DotScaled matches an independent per-term reference computation") {
    DotScaled.register(spark)
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1f, 1f))
    samples(Gen.zip(vecGen, vecGen), 10).foreach { case (a, b) =>
      val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .selectExpr("graft_dot(a, b) AS d").collect()(0).getLong(0)
      val want = a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * DotScaled.Scale).toLong
      }.sum
      assert(got == want)
    }
  }

  test("r4 floor-rounding is reproduced by the oracle formula") {
    samples(Gen.chooseNum(-1e6, 1e6), 50).foreach { x =>
      val viaSpark = Seq(x).toDF("v").select(Fns.r4(col("v"))).collect()(0).getDouble(0)
      val viaFormula = math.floor(x * 10000d + 0.5d) / 10000d
      assert(viaSpark == viaFormula)
    }
  }

  test("new corpus/vector operators are invariant to input partitioning") {
    // the 100 TB determinism property: a cluster repartitioning the input
    // (different task boundaries, different reduce orders) must emit the
    // byte-identical result the oracle hashed
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => graft.text.Filters.repetition(d),
      d => graft.text.Filters.decontaminate(d),
      d => graft.text.Packing.packSequences(d)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    assert(run(graft.ann.Embeddings.quantizeInt8(emb.repartition(1))) ==
      run(graft.ann.Embeddings.quantizeInt8(emb.repartition(13))))
  }

  test("round-5 operators are invariant to input partitioning") {
    val docs = Tables.documents(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val ev = Tables.events(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => graft.text.Vocab.tfidf(d),
      d => graft.text.Vocab.chunkDocs(d),
      d => graft.text.Vocab.bigramVocab(d, k = 15),
      d => graft.text.Vocab.unigramLm(d),
      d => graft.text.Vocab.mixPlan(d),
      d => graft.text.Vocab.mixTake(d),
      d => graft.text.CorpusStats.sourceOverlap(d),
      d => graft.text.CorpusStats.lengthHistogram(d)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    // split-long moment sums: the invariant the 2^20 fixed-point floor
    // buys — any partitioning sums the same integers
    assert(run(graft.ml.TrainPrep.featureCorr(li.repartition(1))) ==
      run(graft.ml.TrainPrep.featureCorr(li.repartition(13))))
    assert(run(graft.ml.TrainPrep.imputePlan(ev.repartition(1))) ==
      run(graft.ml.TrainPrep.imputePlan(ev.repartition(13))))
    assert(run(graft.ml.TrainPrep.trainingAssembly(
        Tables.orders(spark, sf).repartition(1))) ==
      run(graft.ml.TrainPrep.trainingAssembly(
        Tables.orders(spark, sf).repartition(13))))
  }

  test("inference/graph operators are invariant to input partitioning") {
    val ord = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(run(graft.ml.Inference.ensembleScore(ord.repartition(1))) ==
      run(graft.ml.Inference.ensembleScore(ord.repartition(13))))
    assert(run(graft.ml.Inference.aggFeatureStore(ord.repartition(1))) ==
      run(graft.ml.Inference.aggFeatureStore(ord.repartition(13))))
    assert(run(graft.operators.Diagnostics.skewProfile(li.repartition(1), "l_partkey")) ==
      run(graft.operators.Diagnostics.skewProfile(li.repartition(13), "l_partkey")))
    val emb = Tables.embeddings(spark, sf)
    assert(run(graft.ann.Embeddings.pqCodes(emb.repartition(1))) ==
      run(graft.ann.Embeddings.pqCodes(emb.repartition(13))))
    // the iterative op: decimal mass sums make every round's ranks exact,
    // so the whole 5-round fixpoint is partitioning-invariant
    assert(run(graft.operators.Graph.pageRank(li.repartition(1), ord.repartition(1))) ==
      run(graft.operators.Graph.pageRank(li.repartition(13), ord.repartition(5))))
  }

  test("event-analytics operators are invariant to input partitioning") {
    val ev = Tables.events(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      e => graft.operators.Analytics.retentionCohorts(e),
      e => graft.operators.Analytics.eventTransitions(e),
      e => graft.operators.Analytics.activeUsers(e),
      e => graft.operators.Analytics.anomalySeasonal(e),
      e => graft.ml.Features.funnelOrdered(e),
      e => graft.operators.Scd2.asOfLookup(e),
      e => graft.operators.Analytics.attribution(e)
    ).foreach { op =>
      assert(run(op(ev.repartition(1))) == run(op(ev.repartition(13))))
    }
    val li = Tables.lineitem(spark, sf)
    assert(run(graft.operators.Diagnostics.columnStats(li.repartition(1))) ==
      run(graft.operators.Diagnostics.columnStats(li.repartition(13))))
    assert(run(graft.operators.Diagnostics.zorderKey(li.repartition(1))) ==
      run(graft.operators.Diagnostics.zorderKey(li.repartition(13))))
  }

  test("round-6 operators are invariant to input partitioning") {
    val ev = Tables.events(spark, sf)
    val li = Tables.lineitem(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(run(graft.ml.Monitoring.modelConsistency(ev.repartition(1))) ==
      run(graft.ml.Monitoring.modelConsistency(ev.repartition(13))))
    assert(run(graft.ml.Monitoring.alertSummary(ev.repartition(1))) ==
      run(graft.ml.Monitoring.alertSummary(ev.repartition(13))))
    // decimal moment sums make the hash-bagged correlations exact
    // under any task layout
    assert(run(graft.ml.Monitoring.featureImportance(li.repartition(1))) ==
      run(graft.ml.Monitoring.featureImportance(li.repartition(13))))
    // catalog sweep: the audit must not depend on how sources are split
    val s1 = graft.operators.Catalog.sweep(spark, sf).collect().map(_.toString).sorted.toSeq
    val s2 = graft.operators.Catalog.sweep(spark, sf).collect().map(_.toString).sorted.toSeq
    val declared = graft.operators.Catalog.default.facts.size +
      graft.operators.Catalog.default.dims.size
    assert(s1 == s2 && s1.size == declared)
  }

  test("session-6 extension operators are invariant to input partitioning") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val ev = Tables.events(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => graft.text.Vocab.bigramLm(d),
      d => graft.ml.TrainPrep.classWeights(d)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      e => graft.operators.Sampling.groupSplit(e),
      e => graft.operators.Joins.windowSliding(e)
    ).foreach { op =>
      assert(run(op(ev.repartition(1))) == run(op(ev.repartition(13))))
    }
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      e => graft.ann.Ann.lshNearDup(e),
      e => graft.ann.Ann.labelCentroids(e),
      e => graft.ann.Ann.hierAssign(e),
      e => graft.ann.Ann.embedSurvivors(e),
      e => graft.ann.Ann.cellQuality(e)
    ).foreach { op =>
      assert(run(op(emb.repartition(1))) == run(op(emb.repartition(13))))
    }
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => graft.dedup.Dedup.minhashAccuracy(d),
      d => graft.dedup.Dedup.jaccardHistogram(d),
      d => graft.text.CorpusStats.corpusDrift(d),
      d => graft.text.Filters.winnowContam(d)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    assert(run(graft.ann.Ann.annEval(emb.repartition(1))) ==
      run(graft.ann.Ann.annEval(emb.repartition(13))))
    assert(run(graft.ml.TrainPrep.quantileBins(ev.repartition(1))) ==
      run(graft.ml.TrainPrep.quantileBins(ev.repartition(13))))
    assert(run(graft.operators.Analytics.eventHeatmap(ev.repartition(1))) ==
      run(graft.operators.Analytics.eventHeatmap(ev.repartition(13))))
    val ord = Tables.orders(spark, sf)
    assert(run(graft.operators.Analytics.revenuePercentiles(
        ord.repartition(1), Tables.customer(spark, sf), Tables.nation(spark, sf))) ==
      run(graft.operators.Analytics.revenuePercentiles(
        ord.repartition(13), Tables.customer(spark, sf), Tables.nation(spark, sf))))
  }

  test("round-10 operators are invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val ord = Tables.orders(spark, sf)
    assert(run(graft.ml.Inference.customerDerived(ord.repartition(1))) ==
      run(graft.ml.Inference.customerDerived(ord.repartition(13))))
    val cust = Tables.customer(spark, sf)
    assert(run(graft.operators.Masking.maskTable(cust.repartition(1),
        graft.operators.Masking.policy("customer"))) ==
      run(graft.operators.Masking.maskTable(cust.repartition(13),
        graft.operators.Masking.policy("customer"))))
    assert(run(graft.operators.Masking.maskAudit(spark, sf)) ==
      run(graft.operators.Masking.maskAudit(spark, sf)))
    val emb = Tables.embeddings(spark, sf)
    assert(run(graft.ann.Ann.semanticDedup(emb.repartition(1))) ==
      run(graft.ann.Ann.semanticDedup(emb.repartition(13))))
    assert(run(graft.ann.Ann.indexStaleness(emb.repartition(1))) ==
      run(graft.ann.Ann.indexStaleness(emb.repartition(13))))
    assert(run(graft.ann.Ann.semanticIncrement(emb.repartition(1))) ==
      run(graft.ann.Ann.semanticIncrement(emb.repartition(13))))
    val docs = Tables.documents(spark, sf)
    assert(run(graft.text.Vocab.dsirSelect(docs.repartition(1))) ==
      run(graft.text.Vocab.dsirSelect(docs.repartition(13))))
  }

  test("stats-ops operators are invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val docs = Tables.documents(spark, sf)
    val ev = Tables.events(spark, sf)
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      graft.ml.TrainPrep.linregFit(_),
      graft.ml.TrainPrep.linregScore(_),
      graft.text.Vocab.cooccurTopk(_),
      graft.text.TextOps.charEntropy(_),
      graft.text.Vocab.bm25(_),
      graft.text.Vocab.vocabPrune(_),
      graft.text.Vocab.zipfFit(_),
      graft.text.Vocab.sourceKl(_),
      graft.dedup.Dedup.paraDedup(_),
      graft.text.TextOps.readability(_),
      graft.text.Packing.shardPlan(_),
      graft.text.Packing.shardBalance(_)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    assert(run(graft.ml.Approx.hllRollup(ev.repartition(1))) ==
      run(graft.ml.Approx.hllRollup(ev.repartition(13))))
    val emb = Tables.embeddings(spark, sf)
    assert(run(graft.ann.Ann.annNdcg(emb.repartition(1))) ==
      run(graft.ann.Ann.annNdcg(emb.repartition(13))))
    assert(run(graft.ann.Embeddings.embedCov(emb.repartition(1))) ==
      run(graft.ann.Embeddings.embedCov(emb.repartition(13))))
    assert(run(graft.dedup.Dedup.containment(docs.repartition(1))) ==
      run(graft.dedup.Dedup.containment(docs.repartition(13))))
    assert(run(graft.text.TextOps.langConfusion(docs.repartition(1))) ==
      run(graft.text.TextOps.langConfusion(docs.repartition(13))))
    assert(run(graft.text.TextOps.gateFunnel(docs.repartition(1))) ==
      run(graft.text.TextOps.gateFunnel(docs.repartition(13))))
    assert(run(graft.ml.Features.sessionPaths(ev.repartition(1))) ==
      run(graft.ml.Features.sessionPaths(ev.repartition(13))))
  }

  test("session-3 operators are invariant to input partitioning") {
    val docs = Tables.documents(spark, sf)
    val ev = Tables.events(spark, sf)
    val ord = Tables.orders(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => graft.text.CorpusStats.ngramNovelty(d),
      d => graft.text.Filters.winnowOverlap(d),
      d => graft.text.Vocab.pplFilter(d),
      d => graft.text.Vocab.epochPlan(d)
    ).foreach { op =>
      assert(run(op(docs.repartition(1))) == run(op(docs.repartition(13))))
    }
    assert(run(graft.operators.Analytics.newVsReturning(ev.repartition(1))) ==
      run(graft.operators.Analytics.newVsReturning(ev.repartition(13))))
    assert(run(graft.operators.Marts.periodGrowth(
        ord.repartition(1), Tables.customer(spark, sf))) ==
      run(graft.operators.Marts.periodGrowth(
        ord.repartition(13), Tables.customer(spark, sf))))
    assert(run(graft.operators.Marts.paretoShare(
        ord.repartition(1), Tables.customer(spark, sf), Tables.nation(spark, sf))) ==
      run(graft.operators.Marts.paretoShare(
        ord.repartition(13), Tables.customer(spark, sf), Tables.nation(spark, sf))))
  }

  test("pagerank conserves total rank mass") {
    val ranks = graft.operators.Graph.pageRank(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf))
    // rank_scaled = p * N, so the mean over nodes must be ~1 (total mass 1)
    val mean = ranks.agg(avg(col("rank_scaled"))).collect()(0).getDouble(0)
    assert(math.abs(mean - 1.0) < 1e-4, s"mean scaled rank $mean drifted from 1")
    // and the hub side (suppliers, ~15x fewer nodes than customers here)
    // must concentrate mass: every supplier above the uniform baseline
    val supMin = ranks.filter(col("node_type") === "supplier")
      .agg(min(col("rank_scaled"))).collect()(0).getDouble(0)
    assert(supMin > 1.0, s"supplier min scaled rank $supMin should exceed uniform 1.0")
  }

  test("surrogate keys are stable and distinct keys never collide on test data") {
    val sk = Tables.orders(spark, sf)
      .select(Fns.surrogateKey(col("o_orderkey")).as("k"))
    assert(sk.distinct().count() == sk.count())
  }

  test("two graft_dot calls compile into one codegen stage with distinct results") {
    DotScaled.register(spark)
    // fixed names in doGenCode would declare duplicate Java locals here
    // and Janino would silently fall back to the interpreted path
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d1, graft_dot(a, c) AS d2 FROM (SELECT
        |array(cast(1.0 as float), cast(2.0 as float)) a,
        |array(cast(3.0 as float), cast(4.0 as float)) b,
        |array(cast(5.0 as float), cast(6.0 as float)) c)""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == (math.floor(3.0 * DotScaled.Scale) +
      math.floor(8.0 * DotScaled.Scale)).toLong)
    assert(r.getLong(1) == (math.floor(5.0 * DotScaled.Scale) +
      math.floor(12.0 * DotScaled.Scale)).toLong)
  }

  test("graft_dot rejects non-float arrays and wrong arity at analysis time") {
    DotScaled.register(spark)
    val doubles = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d), array(2.0d))").collect()
    }
    assert(doubles.getMessage.toLowerCase.contains("type"),
      s"expected a type error, got: ${doubles.getMessage}")
    val arity = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(cast(1.0 as float)))").collect()
    }
    assert(arity.getMessage.contains("2 arguments"),
      s"expected the arity message, got: ${arity.getMessage}")
  }

  test("surrogate keys keep NULL positions distinct (dbt placeholder device)") {
    import spark.implicits._
    val df = Seq(("x", null: String), (null: String, "x"))
      .toDF("a", "b")
      .select(Fns.surrogateKey(col("a"), col("b")).as("k"))
    val ks = df.collect().map(_.getString(0))
    assert(ks(0) != ks(1), "NULL lost its position: (x,NULL) and (NULL,x) collided")
  }
}
