package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the heavy dedup queries (not part of the
  * shipped API; mirrors Bench's session setup). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warm parquet/codegen
    docs.count()
    t("minhash_pairs") { graft.dedup.Dedup.minhashLsh(docs).count() }
    spark.catalog.clearCache()
    t("shingles") { graft.text.TextPrep.shinglesAll(docs).count() }
    t("bands") { graft.dedup.Dedup.bandStore(docs).count() }
    t("minhash_warm") { graft.dedup.Dedup.minhashLsh(docs).count() }
    spark.catalog.clearCache()
    t("clusters_warm") { graft.dedup.Dedup.nearDupClusters(docs).count() }
    spark.catalog.clearCache()
    t("jaccard_warm") { graft.dedup.Dedup.ngramJaccard(docs).count() }
    if (sys.env.contains("SPARK_GRAFT_CORR")) {
      val li = graft.Tables.lineitem(spark, sfDir)
      li.count()
      t("corr_warm") { graft.ml.TrainPrep.featureCorr(li).collect().length.toLong }
      t("corr_warm2") { graft.ml.TrainPrep.featureCorr(li).collect().length.toLong }
    }
    if (sys.env.contains("SPARK_GRAFT_PR")) {
      val li = graft.Tables.lineitem(spark, sfDir)
      val ord = graft.Tables.orders(spark, sfDir)
      li.count(); ord.count()
      (0 to 5).foreach { it =>
        t(s"pagerank_it$it") {
          graft.operators.Graph.pageRank(li, ord, iterations = it).count()
        }
      }
    }
    if (sys.env.contains("SPARK_GRAFT_S2")) {
      // session-2 heavy family: run each twice, read the second (warm) line
      val emb = graft.Tables.embeddings(spark, sfDir)
      val ev = graft.Tables.events(spark, sfDir)
      emb.count(); ev.count()
      for (round <- 1 to 2) {
        t(s"embed_lsh_$round") { graft.ann.Ann.lshNearDup(emb).count() }
        t(s"embed_survivors_$round") { graft.ann.Ann.embedSurvivors(emb).count() }
        t(s"embed_incr_$round") {
          val tagged = emb.withColumn("dg", graft.functions.Fns.hexDigit("vec_id", 1))
          val bb = graft.ann.Ann.adaptiveBandBits(emb.count())
          graft.ann.Ann.lshIncrement(tagged.filter(col("dg") < 2).drop("dg"), emb,
            graft.ann.Ann.lshBandStore(tagged.filter(col("dg") >= 2).drop("dg"), bandBits = bb),
            bandBits = bb).count()
        }
        t(s"minhash_est_$round") { graft.dedup.Dedup.minhashAccuracy(docs).count() }
        t(s"jaccard_hist_$round") { graft.dedup.Dedup.jaccardHistogram(docs).count() }
        t(s"bigram_lm_$round") { graft.text.Vocab.bigramLm(docs).count() }
        t(s"quantile_bins_$round") { graft.ml.TrainPrep.quantileBins(ev).count() }
        t(s"window_sliding_$round") { graft.operators.Joins.windowSliding(ev).count() }
        t(s"group_split_$round") { graft.operators.Sampling.groupSplit(ev).count() }
        t(s"corpus_drift_$round") { graft.text.CorpusStats.corpusDrift(docs).count() }
        t(s"ann_eval_$round") { graft.ann.Ann.annEval(emb).count() }
        t(s"cell_quality_$round") { graft.ann.Ann.cellQuality(emb).count() }
        t(s"hier_assign_$round") { graft.ann.Ann.hierAssign(emb).count() }
        t(s"label_centroids_$round") { graft.ann.Ann.labelCentroids(emb).count() }
        t(s"event_heatmap_$round") { graft.operators.Analytics.eventHeatmap(ev).count() }
        t(s"rev_pctile_$round") {
          graft.operators.Analytics.revenuePercentiles(
            graft.Tables.orders(spark, sfDir), graft.Tables.customer(spark, sfDir),
            graft.Tables.nation(spark, sfDir)).count()
        }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_FS")) {
      // phase breakdown of the melted feature-stats device
      def inputs() = Seq(
        "customer.c_acctbal" -> graft.Tables.customer(spark, sfDir).select("c_acctbal"),
        "events.value" -> graft.Tables.events(spark, sfDir).select("value"),
        "lineitem.l_extendedprice" -> graft.Tables.lineitem(spark, sfDir).select("l_extendedprice"),
        "orders.o_totalprice" -> graft.Tables.orders(spark, sfDir).select("o_totalprice"))
      inputs().map(_._2.count()).sum // warm scans
      for (round <- 1 to 2) {
        t(s"fs_vals_distinct_$round") {
          val melted = inputs().map { case (n, dfc) =>
            dfc.select(lit(n).as("feature"), col(dfc.columns.head).as("v")) }
            .reduce(_ unionAll _)
          melted.groupBy(col("feature"), col("v")).agg(count(lit(1)).as("cnt")).count()
        }
        t(s"fs_full_$round") { graft.ml.Features.featureStats(inputs()).count() }
        // quartile-device sub-phase over a pre-pinned distinct frame
        // (the device's dominant cost; moments measure <0.3 s inline)
        val c = col("v")
        val melted = inputs().map { case (n, dfc) =>
          dfc.select(lit(n).as("feature"), col(dfc.columns.head).as("v")) }
          .reduce(_ unionAll _)
        val vals = melted.filter(c.isNotNull).groupBy(col("feature"), c)
          .agg(count(lit(1)).as("cnt")).localCheckpoint(false)
        vals.count()
        t(s"fs_qs_$round") {
          graft.functions.PrefixSum.exactPercentilesOnCounts(
            vals, "v", "cnt", Seq("feature"),
            Seq("q25_0" -> 0.25, "q50_0" -> 0.5, "q75_0" -> 0.75)).count()
        }
        t(s"fs_qs_bucketed_$round") {
          graft.functions.PrefixSum.exactPercentilesOnCounts(
            vals, "v", "cnt", Seq("feature"),
            Seq("q25_0" -> 0.25, "q50_0" -> 0.5, "q75_0" -> 0.75),
            fallbackNdv = 1000L).count()
        }
        t(s"fs_mfi_$round") {
          graft.ml.CrossVal.missingFeatureImpact(
            graft.Tables.orders(spark, sfDir)).count()
        }
      }
    }
    if (sys.env.contains("SPARK_GRAFT_STREAM")) {
      // streaming twins: wall-clock to drain the full finite input
      // through the memory sink (micro-batch count ~constant, so this
      // measures per-batch state + aggregation growth with input size).
      // A streaming query's STATE-STORE count is pinned from
      // spark.sql.shuffle.partitions at first start (per checkpoint), so
      // the local profile can size it to the twins' tiny local state
      // instead of the batch suite's 32 — the stream-stream join pays a
      // fixed per-(store x partition) setup cost (4 stores/join) that
      // dominates its sf0.1 floor. On a cluster this is the same knob:
      // size streaming shuffle partitions to state volume and key
      // cardinality, not to batch-analytics defaults.
      sys.env.get("SPARK_GRAFT_STREAM_PARTS").foreach(p =>
        spark.conf.set("spark.sql.shuffle.partitions", p))
      for (round <- 1 to 2) {
        t(s"stream_windowed_$round") {
          graft.streaming.EventStream.windowedCounts(spark, sfDir, s"pw$round").count()
        }
        t(s"stream_sliding_$round") {
          graft.streaming.EventStream.slidingCounts(spark, sfDir, s"ps$round").count()
        }
        t(s"stream_dedup_$round") {
          graft.streaming.EventStream.dedupedEvents(spark, sfDir, s"pd$round").count()
        }
        t(s"stream_sessions_$round") {
          graft.streaming.EventStream.sessionized(spark, sfDir, s"pse$round").count()
        }
        t(s"stream_scd2_$round") {
          graft.streaming.EventStream.scd2Stream(spark, sfDir, s"psc$round").count()
        }
        t(s"stream_perfmon_$round") {
          graft.streaming.EventStream.performanceMonitor(spark, sfDir, s"ppm$round").count()
        }
        t(s"stream_ssjoin_$round") {
          graft.streaming.EventStream.touchPurchaseJoin(spark, sfDir, s"pj$round").count()
        }
        t(s"stream_ssjoin_outer_$round") {
          graft.streaming.EventStream.touchPurchaseJoinOuter(spark, sfDir, s"pjo$round").count()
        }
        t(s"stream_qstate_$round") {
          graft.streaming.EventStream.quantileStateStream(spark, sfDir, s"pq$round").count()
        }
        t(s"stream_veccode_$round") {
          val embAll = graft.Tables.embeddings(spark, sfDir)
          val dg = graft.functions.Fns.hexDigit("vec_id", 1)
          graft.streaming.VecStream.codedArrivals(spark, sfDir,
            embAll.filter(dg >= 2), newVecFilter = Some(dg < 2),
            queryName = s"pvc$round").count()
        }
        t(s"stream_heavyhitters_$round") {
          import spark.implicits._
          val words = graft.text.TextPrep
            .withWords(docs.filter(col("text").isNotNull))
            .select(col("lang"), explode(col("words")).as("word"))
          // finite-input drive via the file-source staged docs is what
          // the other twins do; heavy hitters consume a MemoryStream in
          // specs, so here the token stream is staged through a temp
          // parquet to exercise the same micro-batch path
          val dir = java.nio.file.Files.createTempDirectory("graft-hh").toString
          words.write.mode("overwrite").parquet(s"$dir/words.parquet")
          // deleteOnExit runs in reverse registration order (the Staging
          // device's discipline): register parents before children so the
          // staged token-parquet copy doesn't leak a full copy per round
          val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          try walk.sorted().forEach(p => p.toFile.deleteOnExit()) finally walk.close()
          val schema = spark.read.parquet(s"$dir/words.parquet").schema
          val streamed = spark.readStream.schema(schema).parquet(s"$dir/words.parquet")
            .as[graft.streaming.WordIn]
          val q = graft.streaming.TopKStream.heavyHitters(streamed)
            .toDF().writeStream.outputMode("update")
            .format("memory").queryName(s"phh$round").start()
          try q.processAllAvailable() finally q.stop()
          spark.table(s"phh$round").count()
        }
      }
    }
    if (sys.env.contains("SPARK_GRAFT_ANN")) {
      // hash-sampled vs Lloyd-refined IVF centroids through the SAME
      // probed-search plan: per-probe recall@10 vs exact brute force
      val emb = graft.Tables.embeddings(spark, sfDir)
      emb.count()
      def recall(cents: Option[org.apache.spark.sql.DataFrame]): (Double, Double) = {
        val r = graft.ann.Ann.annEval(emb, cents = cents)
          .agg(avg(col("recall")), min(col("recall"))).first()
        (r.getDouble(0), r.getDouble(1))
      }
      for (round <- 1 to 2) {
        t(s"ann_eval_hash_$round") {
          val (m, mn) = recall(None)
          println(f"ANN_RECALL hash-ranked   mean=$m%.4f min=$mn%.4f"); 10L
        }
        for (iters <- Seq(1, 2, 4)) {
          t(s"ann_eval_lloyd${iters}_$round") {
            val (m, mn) = recall(Some(
              graft.ann.Ann.lloydCentroids(emb, k = 16, iters = iters)))
            println(f"ANN_RECALL lloyd-$iters%d-iter mean=$m%.4f min=$mn%.4f"); 10L
          }
        }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_R14")) {
      // round-14 ladder: the promoted cell-route arm vs the brute arm,
      // the stamped-parts loaded serve, multiprobe dedup, and the
      // measured recall of all three candidate generators at this scale
      import graft.ann.ChunkRetrieval
      docs.count()
      for (round <- 1 to 2) {
        t(s"chunk_retrieval_ann_$round") {
          ChunkRetrieval.chunkRetrievalAnn(docs).collect().length.toLong }
        spark.catalog.clearCache()
        t(s"chunk_retrieval_brute_$round") {
          ChunkRetrieval.chunkRetrieval(docs).collect().length.toLong }
        spark.catalog.clearCache()
        t(s"chunk_parts_loaded_$round") {
          ChunkRetrieval.chunkPartsLoaded(spark, docs).collect().length.toLong }
        spark.catalog.clearCache()
        t(s"chunk_dedup_mp_$round") {
          ChunkRetrieval.chunkMpDedup(docs).count() }
        spark.catalog.clearCache()
        t(s"dedup_recall_$round") {
          val rows = ChunkRetrieval.dedupRecall(docs).collect()
          rows.foreach(r => println(s"RECALL ${r.getAs[String]("method")} " +
            f"${r.getAs[Double]("recall")}%.4f of ${r.getAs[Long]("true_pairs")} pairs"))
          rows.length.toLong }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_R14B")) {
      // second round-14 wave: serve/delta-serve behind the promoted arm
      // and the batched tokenizer's apply path
      import graft.ann.ChunkRetrieval
      import graft.text.SubwordBpe
      docs.count()
      for (round <- 1 to 2) {
        t(s"chunk_serve_ann_$round") {
          ChunkRetrieval.chunkServeAnn(docs).collect().length.toLong }
        spark.catalog.clearCache()
        t(s"chunk_delta_serve_ann_$round") {
          ChunkRetrieval.chunkDeltaServeAnn(docs).collect().length.toLong }
        spark.catalog.clearCache()
        t(s"bpe_subword_batched_apply_$round") {
          SubwordBpe.subwordApplyBatched(docs,
            SubwordBpe.subwordTrainBatched(docs)).count() }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_RECALL")) {
      import graft.ann.ChunkRetrieval
      docs.count()
      for (round <- 1 to 2) {
        t(s"chunk_dedup_mp_$round") { ChunkRetrieval.chunkMpDedup(docs).count() }
        spark.catalog.clearCache()
        t(s"dedup_recall_$round") {
          val rows = ChunkRetrieval.dedupRecall(docs).collect()
          rows.foreach(r => println(s"RECALL ${r.getAs[String]("method")} " +
            f"${r.getAs[Double]("recall")}%.4f of ${r.getAs[Long]("true_pairs")} pairs"))
          rows.length.toLong }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_BPEB")) {
      // batched-vs-sequential subword training: wall time at matched
      // merge budgets (sequential = 1 merge/round-trip, batched = up to
      // cap per round-trip); rows = merges actually landed
      import graft.text.SubwordBpe
      docs.count()
      def guarded(name: String)(f: => Long): Unit =
        try t(name)(f) catch { case e: Throwable =>
          println(s"PHASE $name FAILED: ${e.getClass.getSimpleName}")
          spark.catalog.clearCache()
        }
      for (m <- Seq(8, 64, 256)) {
        guarded(s"seq_${m}_merges") { SubwordBpe.subwordTrain(docs, m).count() }
        spark.catalog.clearCache()
        guarded(s"batched_${m}_budget") {
          SubwordBpe.subwordTrainBatched(docs, rounds = m / 4, cap = 4).count() }
        spark.catalog.clearCache()
      }
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      val q = graft.text.Vocab.tfidf(docs)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      println("TFIDF_SCANS=" + "Scan parquet".r.findAllIn(plan).size)
      println(plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("Exchange")).mkString("\n"))
    }
    spark.stop()
  }
}
