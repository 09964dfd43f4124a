package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timer: run named sub-stages of an operator under the
  * bench session config to localize a regression. Not part of the
  * driver contract. Usage: runMain graft.tools.Probe <sfDir> <what> */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.drop(1).headOption.getOrElse("chunk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (for {a <- si.completionTime; b <- si.submissionTime} yield (a - b) / 1e3).getOrElse(-1.0)
        if (secs > 0.5)
          println(f"STAGE ${si.stageId}%4d $secs%7.2f s tasks=${si.numTasks}%4d ${si.name.take(60)}")
      }
    })
    val docs = graft.Tables.documents(spark, sfDir)
    what match {
      case "vec2" =>
        t("warmup")(docs.count())
        def projSign(i: Int, j: Int): Int = {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$i:$j".getBytes("UTF-8"))
          if (((h(0) >> 4) & 0xf) % 2 == 0) 1 else -1
        }
        import graft.text.TextPrep
        def hashEmbed(tokens: org.apache.spark.sql.DataFrame, key: String) = {
          val b = tokens.withColumn("hx", md5(col("word").cast("binary")))
            .withColumn("bucket", pmod((expr("instr('0123456789abcdef', substr(hx, 1, 1))") - 1) * 16 +
              expr("instr('0123456789abcdef', substr(hx, 2, 1))") - 1, lit(64)))
            .withColumn("sgn", when((expr("instr('0123456789abcdef', substr(hx, 3, 1))") - 1) % 2 === 0, lit(1L)).otherwise(lit(-1L)))
          val projs = (0 until 16).map { j =>
            val arr = (0 until 64).map(projSign(_, j)).mkString("array(", ",", ")")
            sum(col("sgn") * expr(s"element_at($arr, cast(bucket as int) + 1)")).as(s"p$j")
          }
          val nsq = (0 until 16).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _)
          b.groupBy(col(key)).agg(projs.head, projs.tail: _*)
            .withColumn("nsq", nsq.cast("long")).filter(col("nsq") > 0)
        }
        val cw = TextPrep.withWords(docs.filter(col("text").isNotNull)).filter(col("norm") =!= "")
        val chunksDf = cw.withColumn("n", size(col("words")))
          .select(col("doc_id"), col("words"),
            posexplode(expr("sequence(0, n - 1, 48)")).as(Seq("chunk_idx", "start")))
          .select((col("doc_id") * 1024L + col("chunk_idx")).cast("long").as("chunk_id"),
            expr("slice(words, start + 1, 64)").as("cwords"))
        val ceL = hashEmbed(chunksDf.select(col("chunk_id"), explode(col("cwords")).as("word")), "chunk_id")
        val t0 = System.nanoTime()
        val ceC = ceL.localCheckpoint(false)
        println(f"PROBE ce lazy-ckpt build ${(System.nanoTime()-t0)/1e9}%8.2f s")
        t("ce materialize")(ceC.count())
        val peL = hashEmbed(cw.filter(col("doc_id") < 10).select(col("doc_id"), explode(col("words")).as("word")), "doc_id")
          .select(col("doc_id").as("probe_id") +: (0 until 16).map(j => col(s"p$j").as(s"q$j")) :+ col("nsq").as("pnsq"): _*)
        val peC = peL.localCheckpoint(false)
        t("pe materialize")(peC.count())
        val sc2 = ceC.crossJoin(broadcast(peC))
          .filter(floor(col("chunk_id") / 1024L) =!= col("probe_id"))
          .withColumn("dotp", (0 until 16).map(j => col(s"p$j") * col(s"q$j")).reduce(_ + _).cast("long"))
          .withColumn("cosine", graft.functions.Fns.r6(col("dotp").cast("double") /
            (sqrt(col("nsq").cast("double")) * sqrt(col("pnsq").cast("double")))))
          .select(col("probe_id"), col("chunk_id").as("vec_id"), col("cosine"))
        t("heap over ckpt frames")(graft.ann.ChunkRetrieval.probeHeap(sc2, 50).count())
        t("heap over ckpt warm")(graft.ann.ChunkRetrieval.probeHeap(sc2, 50).count())
      case "chunk" =>
        t("warmup")(docs.count())
        t("vecArm")(graft.ann.ChunkRetrieval.probeVecArm(docs).count())
        t("vecArm warm")(graft.ann.ChunkRetrieval.probeVecArm(docs).count())
        t("lexArm")(graft.ann.ChunkRetrieval.probeLexArm(docs).count())
        t("lexArm warm")(graft.ann.ChunkRetrieval.probeLexArm(docs).count())
        t("fused")(graft.ann.ChunkRetrieval.probeFused(docs).count())
        t("retrieval")(graft.ann.ChunkRetrieval.chunkRetrieval(docs).count())
        t("retrieval warm")(graft.ann.ChunkRetrieval.chunkRetrieval(docs).count())
      case "clusters" =>
        t("warmup")(docs.count())
        t("mpdedup")(graft.ann.ChunkRetrieval.chunkMpDedup(docs).count())
        t("pairs")(graft.ann.ChunkRetrieval.probeMpPairs(docs).count())
        t("clusters")(graft.ann.ChunkRetrieval.chunkDupClusters(docs).count())
        t("clusters warm")(graft.ann.ChunkRetrieval.chunkDupClusters(docs).count())
      case "clfinal" =>
        import graft.ann.ChunkRetrieval._
        t("warmup")(docs.count())
        val md = chunkMpDedup(docs)
        t("mpdedup")(md.count())
        val pw = new java.io.PrintWriter("/tmp/clfinal_mpdedup.txt")
        pw.println(md.queryExecution.executedPlan.toString)
        pw.close()
        val (cf, bits, _, _) = bandFitFrame(docs)
        val c5 = mpVerifiedPairs(cf, bits, 0.95, 1, 6)
          .groupBy(col("chunk_id")).agg(count(lit(1)).as("n"))
        t("cand5+groupBy")(c5.count())
        val pw2 = new java.io.PrintWriter("/tmp/clfinal_cand5.txt")
        pw2.println(c5.queryExecution.executedPlan.toString)
        pw2.close()
      case "clvar" =>
        import graft.ann.ChunkRetrieval._
        t("warmup")(docs.count())
        val (cf, bits, _, _) = bandFitFrame(docs)
        t("cand5 no filter")(mpVerifiedPairs(cf, bits, 0.95, 1, 6).count())
        val (cf2, bits2, _, _) = bandFitFrame(docs)
        t("pairs < filter")(mpVerifiedPairs(cf2, bits2, 0.95, 1, 6)
          .filter(col("chunk_id") < col("ca")).count())
        val (cf3, bits3, _, _) = bandFitFrame(docs)
        t("pairs proj only")(mpVerifiedPairs(cf3, bits3, 0.95, 1, 6)
          .select(col("chunk_id").as("doc_a"), col("ca").as("doc_b")).count())
      case "clplan" =>
        docs.count()
        val p1 = graft.ann.ChunkRetrieval.chunkMpDedup(docs)
        println("=== mpdedup static plan ===")
        p1.explain("formatted")
        val p2 = graft.ann.ChunkRetrieval.probeMpPairs(docs)
        println("=== pairs static plan ===")
        p2.explain("formatted")
      case "recall" =>
        t("warmup")(docs.count())
        t("recall")(graft.ann.ChunkRetrieval.dedupRecall(docs).count())
        t("recall warm")(graft.ann.ChunkRetrieval.dedupRecall(docs).count())
      case "parts" =>
        t("warmup")(docs.count())
        t("parts_loaded")(graft.ann.ChunkRetrieval.chunkPartsLoaded(spark, docs).count())
        t("parts_loaded warm")(graft.ann.ChunkRetrieval.chunkPartsLoaded(spark, docs).count())
      case "delta" =>
        t("warmup")(docs.count())
        t("delta_serve")(graft.ann.ChunkRetrieval.chunkDeltaServe(docs).count())
        t("delta_serve_ann")(graft.ann.ChunkRetrieval.chunkDeltaServeAnn(docs).count())
      case "surv" =>
        t("warmup")(docs.count())
        t("bandfit")({
          val (cf, _, _, _) = graft.ann.ChunkRetrieval.bandFitFrame(docs); cf.count()
        })
        t("pairs")(graft.ann.ChunkRetrieval.probeMpPairs(docs).count())
        t("clusters")(graft.ann.ChunkRetrieval.chunkDupClusters(docs).count())
        t("survivors")(graft.ann.ChunkRetrieval.chunkSurvivors(docs).count())
      case "bpe" =>
        t("warmup")(docs.count())
        t("train")(graft.text.Bpe.bpeTrain(docs).count())
        t("apply")({
          val m = graft.text.Bpe.bpeTrain(docs)
          graft.text.Bpe.bpeApply(docs, m).count()
        })
        t("sample")(graft.text.Bpe.bpeSampleEval(docs).count())
      case "pr" =>
        val li = graft.Tables.lineitem(spark, sfDir)
        val or = graft.Tables.orders(spark, sfDir)
        t("warmup")(li.count() + or.count())
        t("pagerank")(graft.operators.Graph.pageRank(li, or).count())
        t("pagerank warm")(graft.operators.Graph.pageRank(li, or).count())
      case "eval" =>
        t("warmup")(docs.count())
        graft.functions.DotScaled.register(spark)
        val emb = graft.Tables.embeddings(spark, sfDir)
        t("retrieval")(graft.ann.ChunkRetrieval.chunkRetrieval(docs).count())
        t("hybridRrf")(graft.ann.Ann.hybridRrf(docs, emb).count())
        t("chunk_eval")(graft.ann.ChunkRetrieval.chunkEval(docs, emb).count())
      case "embed" =>
        t("warmup")(docs.count())
        import graft.ann.ChunkRetrieval._
        val f = chunkFactorFor(docs)
        t("chunks")(chunks(docs, f).count())
        t("chunkEmbeds16")(chunkEmbeds(chunks(docs, f)).count())
        t("bandfit96")({
          val (cf, _, _, _) = bandFitFrame(docs); cf.count()
        })
      case "serve" =>
        t("warmup")(docs.count())
        t("dedup")(graft.ann.ChunkRetrieval.chunkDedup(docs).count())
        t("dominated")(graft.ann.ChunkRetrieval.probeDominated(docs).count())
        t("survivors")(graft.ann.ChunkRetrieval.probeSurvivors(docs).count())
        t("survivors warm")(graft.ann.ChunkRetrieval.probeSurvivors(docs).count())
        t("serve")(graft.ann.ChunkRetrieval.chunkServe(docs).count())
        t("serve warm")(graft.ann.ChunkRetrieval.chunkServe(docs).count())
      case _ => ()
    }
    spark.stop()
  }
}
