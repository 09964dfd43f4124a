package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ann.Embeddings
import graft.text.{Filters, Packing}

class FiltersSpec extends AnyFunSuite {
  import TestSession._

  test("repetition: constructed repeats score as expected, distinct text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),        // maximal repetition
      (2L, "x y z w"),        // fully distinct
      (3L, "q w"))            // too short for 3-grams
      .toDF("doc_id", "text")
    val out = Filters.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 4)
    assert(r1.getAs[Double]("dup_word_frac") == 0.75)
    assert(r1.getAs[Double]("top_word_frac") == 1.0)
    assert(r1.getAs[Double]("dup_2gram_frac") == 0.666667)
    assert(r1.getAs[Double]("dup_3gram_frac") == 0.5)
    assert(r1.getAs[Boolean]("is_repetitive"))
    val r2 = out(2L)
    Seq("dup_word_frac", "dup_2gram_frac", "dup_3gram_frac").foreach { c =>
      assert(r2.getAs[Double](c) == 0.0, c)
    }
    assert(!r2.getAs[Boolean]("is_repetitive"))
    // 2 words: one 2-gram (top frac 1), zero 3-grams -> coalesced 0 fracs
    val r3 = out(3L)
    assert(r3.getAs[Double]("top_2gram_frac") == 1.0)
    assert(r3.getAs[Double]("dup_3gram_frac") == 0.0)
    assert(r3.getAs[Double]("top_3gram_frac") == 0.0)
  }

  test("piiScrub: redacted text carries no live patterns, counts match placeholders") {
    val out = Filters.piiScrub(Tables.documents(spark, sf)).collect()
    val emailRe = Filters.emailRe.r
    val phoneRe = Filters.phoneRe.r
    var emails, phones = 0L
    out.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(emailRe.findFirstIn(red).isEmpty, s"live email in doc ${r.getAs[Long]("doc_id")}")
      assert(phoneRe.findFirstIn(red).isEmpty, s"live phone in doc ${r.getAs[Long]("doc_id")}")
      val nE = r.getAs[Int]("n_emails")
      val nP = r.getAs[Int]("n_phones")
      assert(red.split("\\[EMAIL\\]", -1).length - 1 == nE)
      assert(red.split("\\[PHONE\\]", -1).length - 1 == nP)
      assert(r.getAs[Boolean]("has_pii") == (nE + nP > 0))
      emails += nE; phones += nP
    }
    // the md5 gate injects emails for ~4/16 and phones for ~4/16 of docs
    assert(emails > 0 && phones > 0)
    assert(emails + phones < out.length)
  }

  test("packSequences: every doc packed once, streams partition the corpus, packs contiguous") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val out = Packing.packSequences(docs, budget = 512, nStreams = 8).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    val byStream = out.groupBy(_.getAs[Int]("stream_id"))
    assert(byStream.keySet.subsetOf((0 until 8).toSet))
    byStream.foreach { case (s, packs) =>
      val ids = packs.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L, s"stream $s starts at pack ${ids.head}")
      // doc sizes are < budget here, so offsets can't skip a whole window
      assert(ids.sameElements(0L until ids.length), s"stream $s packs not contiguous")
      // doc ranges of consecutive packs must not overlap
      val spans = packs.sortBy(_.getAs[Long]("pack_id"))
        .map(p => (p.getAs[Long]("first_doc"), p.getAs[Long]("last_doc")))
      spans.toSeq.sliding(2).foreach {
        case Seq((_, lastA), (firstB, _)) => assert(lastA < firstB)
        case _ =>
      }
    }
    out.foreach { p =>
      assert(math.abs(p.getAs[Double]("fill_ratio") -
        p.getAs[Long]("n_tokens").toDouble / 512) < 1e-6)
    }
  }

  test("decontaminate: eval split excluded, overlap bounded, duplicates of eval docs flagged") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nEval = docs.filter(
      expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1") === 0).count()
    val out = Filters.decontaminate(docs).collect()
    // output covers exactly the train split
    assert(out.length == nDocs - nEval)
    out.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val o = r.getAs[Long]("n_overlap")
      val c = r.getAs[Double]("containment")
      assert(o <= n)
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Boolean]("is_contaminated") == (c >= 0.2))
    }
    // the synthetic corpus carries near-duplicates across the split, so
    // the screen must actually fire somewhere (and not everywhere)
    val flagged = out.count(_.getAs[Boolean]("is_contaminated"))
    assert(flagged > 0 && flagged < out.length / 2, s"flagged=$flagged of ${out.length}")
  }

  test("corpusReport: funnel counts reconcile with the corpus and the curate decisions") {
    import graft.text.TextOps
    val docs = Tables.documents(spark, sf)
    val rows = TextOps.corpusReport(docs).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val curated = TextOps.curate(docs)
    assert(rows.map(_.getAs[Long]("n_kept")).sum ==
      curated.filter(org.apache.spark.sql.functions.col("keep")).count())
    assert(rows.map(_.getAs[Long]("n_duplicates")).sum ==
      curated.filter(org.apache.spark.sql.functions.col("is_duplicate")).count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_duplicates") +
        r.getAs[Long]("n_low_quality") <= n)
      assert(math.abs(r.getAs[Double]("keep_rate") -
        r.getAs[Long]("n_kept").toDouble / n) < 1e-6)
      val q = r.getAs[Double]("avg_quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("winnowing: any shared run of k+w-1 words is caught; clean docs are not") {
    import spark.implicits._
    // doc 16 -> md5 digit of "16" is 'c'? the eval split is md5-digit==0;
    // construct ids so the quote-carrying doc and the clean doc are NOT
    // in the eval split while doc `evalId` is. Find ids by the same rule
    // the operator uses.
    def digit(id: Long): Int =
      "0123456789abcdef".indexOf(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0))
    val evalId = (1L to 200L).find(digit(_) == 0).get
    val ids = (1L to 200L).filter(i => digit(i) != 0 && i != evalId).take(2)
    val quote = "the winnowing guarantee promises any shared run of eight words is caught"
    val docs = Seq(
      (evalId, s"benchmark question text $quote and its answer", "en", "eval", 50L),
      // 8+ consecutive words copied from the eval doc inside unrelated text
      (ids(0), s"a long training document that quotes $quote somewhere deep inside more filler words", "en", "tr", 90L),
      (ids(1), "completely unrelated clean training text about spark physical planning and shuffles going on for a while", "en", "tr", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.text.Filters.winnowContam(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(ids(0)).getAs[Boolean]("is_contaminated"),
      s"verbatim 12-word quote missed: ${out(ids(0))}")
    assert(!out(ids(1)).getAs[Boolean]("is_contaminated"))
    assert(!out.contains(evalId)) // eval split never scored
  }

  test("winnowOverlap: docs sharing a long verbatim run pair up; clean docs never appear") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta", "en", "a", 90L),
      (2L, s"totally different framing text with $shared closing words here now", "en", "b", 95L),
      (3L, "clean text about catalyst optimizer rules and broadcast joins sharing absolutely nothing verbatim with anybody else", "en", "c", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Filters.winnowOverlap(docs).collect()
    assert(out.length == 1, s"expected exactly the (1,2) pair, got ${out.toSeq}")
    val r = out(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    // a 20-word shared run spans many w-windows -> several shared fingerprints
    assert(r.getAs[Long]("n_shared") >= 2)
    val share = r.getAs[Double]("overlap_share")
    assert(share > 0.0 && share <= 1.0)
    // share is n_shared over the SMALLER full fingerprint count
    assert(math.abs(share - r.getAs[Long]("n_shared").toDouble /
      math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b"))) <= 1e-6)
  }

  test("quantizeInt8: reconstruction error bounded by scale/2, cosine preserved") {
    val out = Embeddings.quantizeInt8(Tables.embeddings(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val dim = r.getAs[Int]("dim")
      assert(scale > 0)
      assert(r.getAs[Double]("l2_norm") > 0)
      // symmetric rounding puts every coordinate within half a step
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-6)
      // int8 codes are clamped by construction
      assert(r.getAs[Long]("q_l1") <= 127L * dim)
      // 8-bit reconstruction of a 64-dim unit-ish vector stays >0.99 cosine
      assert(r.getAs[Double]("cos_recon") > 0.99,
        s"vec ${r.getAs[Long]("vec_id")} cos ${r.getAs[Double]("cos_recon")}")
    }
  }
}
