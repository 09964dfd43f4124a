package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, ChunkRetrieval}
import graft.functions.DotScaled
import graft.streaming.VecStream
import graft.text.Filters

/** Behavioral invariants for the round-12 additions: chunk-grain hybrid
  * retrieval, the streaming query-serving twin of pqSearch, and the
  * Bloom decontamination screen. */
class Round12Spec extends AnyFunSuite {
  import TestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = { DotScaled.register(spark); Tables.embeddings(spark, sf) }

  test("chunk retrieval serves at most one chunk per source document, contiguously ranked") {
    val out = ChunkRetrieval.chunkRetrieval(docs).collect()
    assert(out.nonEmpty)
    val perProbe = out.groupBy(_.getAs[Long]("probe_id"))
    perProbe.foreach { case (p, rows) =>
      val docIds = rows.map(_.getAs[Long]("doc_id"))
      assert(docIds.distinct.length == docIds.length,
        s"probe $p serves ${docIds.length - docIds.distinct.length} duplicate documents")
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length),
        s"probe $p ranks are not contiguous")
      rows.foreach { r =>
        assert(r.getAs[Long]("doc_id") == r.getAs[Long]("chunk_id") / 1024,
          "chunk_id does not encode its source document")
        assert(r.getAs[Long]("doc_id") != p, s"probe $p retrieved itself")
      }
    }
  }

  test("every served chunk carries a rank from at least one arm, and rrf matches the rank algebra") {
    val out = ChunkRetrieval.chunkRetrieval(docs).collect()
    out.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val vec = Option(r.getAs[Integer]("vec_rank")).map(_.toInt)
      assert(lex.nonEmpty || vec.nonEmpty, "a fused candidate came from neither arm")
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-6,
        s"rrf ${r.getAs[Double]("rrf_score")} != 1/(60+lex)+1/(60+vec) = $expect")
    }
  }

  test("chunk eval joins both grains per probe with precisions in [0,1]") {
    val ev = ChunkRetrieval.chunkEval(docs, emb).collect()
    assert(ev.nonEmpty)
    ev.foreach { r =>
      Seq("p_chunk", "p_doc").foreach { c =>
        val v = r.getAs[Any](c)
        if (v != null) {
          val d = v.asInstanceOf[Double]
          assert(d >= 0.0 && d <= 1.0, s"$c out of range: $d")
        }
      }
    }
  }

  test("streamed query serving == batch pqSearch bit-for-bit (and holds zero aggregation state)") {
    // the zero-state requirement is asserted INSIDE servedQueries
    // (lastProgress.stateOperators must be empty or it throws)
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val streamed = VecStream.servedQueries(spark, sf, corpus)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val batch = Ann.pqSearch(emb)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streamed ADC top-k diverges from batch pqSearch")
  }

  test("bloom screen never misses: every exact contamination hit is a bloom hit") {
    val out = Filters.decontamBloom(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bloom") >= r.getAs[Long]("n_exact"),
        s"doc ${r.getAs[Long]("doc_id")}: bloom missed an exact hit — impossible for a bloom filter")
      assert(r.getAs[Long]("fp_shingles") ==
        r.getAs[Long]("n_bloom") - r.getAs[Long]("n_exact"))
      if (r.getAs[Boolean]("is_contaminated"))
        assert(r.getAs[Boolean]("bloom_contaminated"),
          "bloom containment can only be >= exact containment")
    }
  }

  test("bpe sample eval: agreement bounded by rounds, both tokenizers compress") {
    val r = graft.text.Bpe.bpeSampleEval(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_rounds") >= 8L) // full outer of two 8-row tables
    assert(row.getAs[Long]("n_agree") >= 0L &&
      row.getAs[Long]("n_agree") <= row.getAs[Long]("n_rounds"))
    assert(row.getAs[Long]("tokens_full") <= row.getAs[Long]("n_words"))
    assert(row.getAs[Long]("tokens_sample") <= row.getAs[Long]("n_words"))
    assert(row.getAs[Long]("excess_tokens") ==
      row.getAs[Long]("tokens_sample") - row.getAs[Long]("tokens_full"))
  }

  test("streamed BPE apply gate == batch bpeApply bit-for-bit (zero aggregation state)") {
    import graft.streaming.DocStream
    val merges = graft.text.Bpe.bpeTrain(docs)
    val streamed = DocStream.tokenizedArrivals(spark, sf, merges,
        queryName = "r12_bpe_gate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sorted.toSeq
    val batch = graft.text.Bpe.bpeApply(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streamed bloom screen == batch decontamBloom on the shared columns") {
    import graft.streaming.DocStream
    import graft.text.{Filters, TextPrep}
    val withD = docs.withColumn("d", graft.functions.Fns.hexDigit("doc_id", 1))
    val evalSh = TextPrep.shingles(withD.filter(col("d") === 0))
      .select("shingle").distinct()
    val bits = Filters.bloomBits(evalSh)
    val streamed = DocStream.screenedArrivals(spark, sf, bits,
        queryName = "r12_bloom_gate")
      .select("doc_id", "n_shingles", "n_bloom", "bloom_containment", "bloom_contaminated")
    val batch = Filters.decontamBloom(docs)
      .select(col("doc_id").as("b_id"), col("n_shingles").as("b_sh"),
        col("n_bloom").as("b_bl"), col("bloom_containment").as("b_ct"),
        col("bloom_contaminated").as("b_fl"))
    // the batch mart covers only the train split; every one of its rows
    // must match the streamed gate's row for the same doc exactly
    val joined = batch.join(streamed, col("b_id") === col("doc_id"))
    assert(joined.count() == batch.count(), "streamed gate missed train docs")
    val diff = joined.filter(
      col("b_sh") =!= col("n_shingles") || col("b_bl") =!= col("n_bloom") ||
        col("b_ct") =!= col("bloom_containment") ||
        col("b_fl") =!= col("bloom_contaminated")).count()
    assert(diff == 0L, s"$diff documents diverge between streamed and batch screens")
  }

  test("measured bloom false-positive rate stays under the sizing bound") {
    import graft.text.TextPrep
    val withD = docs.withColumn("d", graft.functions.Fns.hexDigit("doc_id", 1))
    val nEval = TextPrep.shingles(withD.filter(col("d") === 0))
      .select("shingle").distinct().count()
    val out = Filters.decontamBloom(docs)
      .agg(sum(col("fp_shingles")).as("fp"),
        sum(col("n_shingles") - col("n_exact")).as("clean")).collect()(0)
    val fp = out.getAs[Long]("fp").toDouble
    val clean = out.getAs[Long]("clean").toDouble
    assert(clean > 0)
    // p_bit = 1 - exp(-k n / m); FPR <= (p_bit)^k, doubled for slack
    val pBit = 1.0 - math.exp(-4.0 * nEval / 65536.0)
    val bound = 2.0 * math.pow(pBit, 4) + 4.0 / clean // + resolution slack
    assert(fp / clean <= bound,
      s"measured FPR ${fp / clean} exceeds bound $bound (nEval=$nEval)")
  }
}
