package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, Embeddings}
import graft.dedup.Dedup
import graft.text.{TextOps, Vocab}

/** Degenerate-input behavior: a 100 TB pipeline's filters routinely leave
  * an operator with an empty or single-row partition-of-the-corpus (one
  * source, one day, one language). Every operator must return an empty /
  * well-defined frame there, never throw. */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("edge-spec").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def emptyDocs = Tables.documents(spark, sf).limit(0)
  private def oneDoc = Tables.documents(spark, sf).limit(1)
  private def emptyEmb = Tables.embeddings(spark, sf).limit(0)

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs).count() == 0)
    assert(Dedup.simhash(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs).count() == 0)
    assert(Dedup.nearDupClusters(emptyDocs).count() == 0)
    assert(Dedup.survivors(emptyDocs).count() == 0)
  }

  test("dedup family is well-defined on a single document") {
    assert(Dedup.exact(oneDoc).count() == 1)
    assert(Dedup.minhashLsh(oneDoc).count() == 0)    // no pairs
    assert(Dedup.nearDupClusters(oneDoc).count() == 0) // no edges -> no labels
  }

  test("vocab/curation operators are well-defined on empty and tiny corpora") {
    assert(Vocab.tfidf(emptyDocs).count() == 0)
    assert(Vocab.chunkDocs(emptyDocs).count() == 0)
    assert(Vocab.bigramVocab(emptyDocs).count() == 0)
    assert(Vocab.unigramLm(emptyDocs).count() == 0)
    assert(Vocab.mixPlan(emptyDocs).count() == 0)
    assert(TextOps.curate(emptyDocs).count() == 0)
    assert(Vocab.tfidf(oneDoc).count() > 0)
    assert(Vocab.chunkDocs(oneDoc).count() > 0)
  }

  test("ann family returns empty on an empty embedding table") {
    assert(Ann.bruteForceTopK(emptyEmb).count() == 0)
    assert(Ann.ivfAssign(emptyEmb).count() == 0)
    assert(Ann.knnGraph(emptyEmb).count() == 0)
    assert(Embeddings.quantizeInt8(emptyEmb).count() == 0)
    assert(Embeddings.randomProjection(emptyEmb).count() == 0)
  }

  test("session-2 operators are well-defined on empty inputs") {
    assert(Ann.lshNearDup(emptyEmb).count() == 0)
    assert(Ann.embedSurvivors(emptyEmb).count() == 0)
    assert(Ann.labelCentroids(emptyEmb).count() == 0)
    assert(Ann.hierAssign(emptyEmb).count() == 0)
    assert(Ann.cellQuality(emptyEmb).count() == 0)
    assert(Dedup.minhashAccuracy(emptyDocs).count() == 0)
    assert(Dedup.jaccardHistogram(emptyDocs).count() == 0)
    assert(Vocab.bigramLm(emptyDocs).count() == 0)
    assert(graft.text.CorpusStats.corpusDrift(emptyDocs).count() == 0)
    val emptyEv = Tables.events(spark, sf).limit(0)
    assert(graft.ml.TrainPrep.quantileBins(emptyEv).count() == 0)
    assert(graft.operators.Sampling.groupSplit(emptyEv).count() == 0)
    assert(graft.operators.Joins.windowSliding(emptyEv).count() == 0)
  }

  test("quantizeInt8 defines the all-zero vector: scale=0, q_l1=0, err=0, cos=1") {
    import spark.implicits._
    val zero = Seq((0L, Array.fill(8)(0.0f)), (1L, Array(1.0f, -2.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(zero).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val z = out(0L)
    assert(z.getAs[Double]("scale") == 0.0)
    assert(z.getAs[Long]("q_l1") == 0L)
    assert(z.getAs[Double]("max_abs_err") == 0.0)
    assert(z.getAs[Double]("cos_recon") == 1.0)
    assert(z.getAs[Double]("l2_norm") == 0.0)
    // the non-degenerate row is untouched by the guard
    val n = out(1L)
    assert(n.getAs[Double]("scale") > 0.0 && n.getAs[Long]("q_l1") > 0L)
  }

  test("session-3 operators are well-defined on empty inputs") {
    val emptyEv = Tables.events(spark, sf).limit(0)
    val emptyOrd = Tables.orders(spark, sf).limit(0)
    val cust = Tables.customer(spark, sf)
    val nat = Tables.nation(spark, sf)
    assert(graft.operators.Analytics.newVsReturning(emptyEv).count() == 0)
    assert(graft.operators.Marts.periodGrowth(emptyOrd, cust).count() == 0)
    assert(graft.operators.Marts.paretoShare(emptyOrd, cust, nat).count() == 0)
    assert(graft.text.CorpusStats.ngramNovelty(emptyDocs).count() == 0)
    assert(graft.text.Filters.winnowOverlap(emptyDocs).count() == 0)
    assert(Vocab.pplFilter(emptyDocs).count() == 0)
    assert(Vocab.epochPlan(emptyDocs).count() == 0)
    // one doc: novelty is defined (all shingles unique), no overlap pairs
    val nov = graft.text.CorpusStats.ngramNovelty(oneDoc).collect()
    assert(nov.length == 1 && nov(0).getAs[Double]("novelty") == 1.0)
    assert(graft.text.Filters.winnowOverlap(oneDoc).count() == 0)
  }

  test("inference/graph/pq family is well-defined on empty inputs") {
    val emptyOrders = Tables.orders(spark, sf).limit(0)
    val emptyLi = Tables.lineitem(spark, sf).limit(0)
    val emptyEv = Tables.events(spark, sf).limit(0)
    assert(graft.ml.Inference.ensembleScore(emptyOrders).count() == 0)
    assert(graft.ml.Inference.aggFeatureStore(emptyOrders).count() == 0)
    assert(graft.ann.Embeddings.pqCodes(emptyEmb).count() == 0)
    assert(graft.text.Vocab.mixTake(emptyDocs).count() == 0)
    assert(graft.operators.Scd2.asOfLookup(emptyEv).count() == 0)
    assert(graft.operators.Graph.pageRank(emptyLi, emptyOrders).count() == 0)
    // skew profile keeps its single stats row (counts zero) on empty input
    val sp = graft.operators.Diagnostics.skewProfile(emptyLi, "l_partkey").collect()
    assert(sp.length == 1 && sp(0).getAs[Long]("n_keys") == 0L)
  }

  test("model-evaluation marts are well-defined on empty orders") {
    val emptyOrders = Tables.orders(spark, sf).limit(0)
    // no folds exist -> no fold rows
    assert(graft.ml.CrossVal.cvMetrics(emptyOrders).count() == 0)
    // the grids keep their model x level / model x feature shape with
    // zero counts (n_rows = 0, null metrics) — they never throw
    val rob = graft.ml.CrossVal.modelRobustness(emptyOrders).collect()
    assert(rob.length == 12 && rob.forall(_.getAs[Long]("n_rows") == 0L))
    val mfi = graft.ml.CrossVal.missingFeatureImpact(emptyOrders).collect()
    assert(mfi.length == 12 && mfi.forall(_.getAs[Long]("n_rows") == 0L))
  }
}
