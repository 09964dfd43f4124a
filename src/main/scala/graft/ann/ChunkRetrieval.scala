package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._
import graft.text.TextPrep

/** Hybrid retrieval at CHUNK grain — the production RAG serving shape:
  * queries retrieve PASSAGES, not documents. Composes the
  * [[graft.text.Vocab.chunkDocs]] chunker (64-word windows, stride 48)
  * with the [[Ann.hybridRrf]] fusion device, then dedups the result list
  * to at most one chunk per source document (the standard serving
  * constraint: a result page should not be one document's five
  * overlapping windows).
  *
  * The vector arm needs a chunk embedding the engine can build
  * deterministically from text alone (the embeddings table is
  * doc-grain): each chunk's token stream is feature-hashed into 64
  * signed-count buckets (the [[graft.text.Vocab.featureHashing]] md5
  * device) and JL-projected to 16 coordinates with the
  * [[Embeddings.randomProjection]] ±1 sign matrix — ALL integer
  * arithmetic until the final cosine, so both engines score
  * bit-identically. Probe vectors ride the identical pipeline over the
  * probe document's full token stream.
  *
  * Scale design (100 TB): chunks ≈ tokens/stride rows, all grains keyed
  * by chunk_id = doc_id·1024 + chunk_idx (docs are corpus-bounded at
  * 1024·48 words here; a production corpus sizes the factor to its max
  * doc length). The lexical arm is probe-bounded exactly like
  * [[Ann.hybridRrf]]: probe terms and their chunk-df are ≤
  * nProbes·kTerms broadcast artifacts, candidates one
  * (probe, chunk, term) partial agg. The vector arm is one streamed
  * pass over the chunk-embedding frame against nProbes broadcast probe
  * vectors into the bounded [[TopKNeighbors]] heap — no shuffle of
  * scored rows; the corpus-scale refinement is the existing IVF cell
  * route ([[Ann.ivfSearch]]) over the same chunk embeddings. Fusion and
  * dedup act on two ≤ arm-rows-per-probe frames. */
object ChunkRetrieval {

  private val width = 64
  private val stride = 48
  private val chunkFactor = 1024L
  private val dims = 64    // feature-hash buckets
  private val outDims = 16 // JL coordinates

  /** Chunk grain with tokens: (doc_id, chunk_id, cwords) — the
    * chunkDocs windows carrying their word arrays. */
  private[ann] def chunks(documents: DataFrame): DataFrame =
    TextPrep.withWords(documents.filter(col("text").isNotNull))
      .filter(col("norm") =!= "")
      .withColumn("n", size(col("words")))
      .select(col("doc_id"), col("words"),
        posexplode(expr(s"sequence(0, n - 1, $stride)")).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"),
        (col("doc_id") * chunkFactor + col("chunk_idx")).cast("long").as("chunk_id"),
        expr(s"slice(words, start + 1, $width)").as("cwords"))

  /** Feature-hash + JL projection of a token stream: one row per key
    * with the 16 integer coordinates (as ONE array column) and their
    * exact squared norm. Two-stage: signed counts per (key, bucket)
    * first (map-side combined), then the per-key sparse bucket list
    * folds through a SINGLE 16×64 sign-matrix literal. The one-stage
    * form (16 separate aggregate expressions each embedding its own
    * 64-literal array, repeated again in the norm filter) cost the
    * DRIVER ~5 s of optimizer/planning per evaluation — measured, no
    * task time — where this tree plans in milliseconds; the integer
    * sums are associative, so the values are bit-identical. Zero-norm
    * keys (all tokens cancelled) drop: they cannot be cosine-scored. */
  private def hashEmbed(tokens: DataFrame, key: String): DataFrame = {
    val signs = (0 until outDims).map(j =>
        (0 until dims).map(Embeddings.projSign(_, j)).mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    tokens
      .withColumn("hx", md5(col("word").cast("binary")))
      .withColumn("bucket", pmod(
        (expr("instr('0123456789abcdef', substr(hx, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substr(hx, 2, 1))") - 1, lit(dims)))
      .withColumn("sgn",
        when((expr("instr('0123456789abcdef', substr(hx, 3, 1))") - 1) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
      .groupBy(col(key), col("bucket")).agg(sum(col("sgn")).as("sv"))
      .groupBy(col(key))
      .agg(collect_list(struct(col("bucket"), col("sv"))).as("bvs"))
      .withColumn("p", expr(
        s"""transform($signs, row -> aggregate(bvs, cast(0 as bigint),
           (a, e) -> a + e.sv * element_at(row, cast(e.bucket as int) + 1)))"""))
      .withColumn("nsq",
        expr("aggregate(p, cast(0 as bigint), (a, x) -> a + x * x)"))
      .filter(col("nsq") > 0)
      .select(col(key), col("p"), col("nsq"))
  }

  /** Vector arm: exact cosine of every chunk against the nProbes
    * broadcast probe vectors, top-`arm` per probe via the bounded heap.
    *
    * The embedding lineage feeding this arm is kept cheap to PLAN by
    * [[hashEmbed]]'s two-stage shape (signed counts per (key, bucket),
    * then one sparse fold through a SINGLE 16×64 sign-matrix literal) —
    * the earlier one-stage form carried 16 aggregate expressions each
    * embedding its own 64-literal array and cost the DRIVER ~29 s of
    * optimizer/codegen per evaluation (no single Spark STAGE over
    * 0.5 s — pure plan-processing cost); the restructured tree plans in
    * milliseconds and is bit-identical. In production the chunk frame
    * is additionally a persisted artifact (built once, served many) —
    * see [[graft.sources.Artifacts]] — but no checkpoint is needed for
    * planning anymore. */
  private def vecArm(documents: DataFrame, nProbes: Int, arm: Int): DataFrame = {
    val ce = hashEmbed(chunks(documents)
      .select(col("chunk_id"), explode(col("cwords")).as("word")), "chunk_id")
    val pe = hashEmbed(TextPrep.withWords(documents.filter(col("text").isNotNull))
        .filter(col("norm") =!= "").filter(col("doc_id") < nProbes)
        .select(col("doc_id"), explode(col("words")).as("word")), "doc_id")
      .select(col("doc_id").as("probe_id"), col("p").as("q"),
        col("nsq").as("pnsq"))
    val scored = ce.crossJoin(broadcast(pe))
      .filter(floor(col("chunk_id") / chunkFactor) =!= col("probe_id"))
      .withColumn("dotp", expr(
        "aggregate(zip_with(p, q, (x, y) -> x * y), cast(0 as bigint), (a, t) -> a + t)"))
      .withColumn("cosine", r6(col("dotp").cast("double") /
        (sqrt(col("nsq").cast("double")) * sqrt(col("pnsq").cast("double")))))
    Ann.topkPerProbe(scored.select(col("probe_id"),
      col("chunk_id").as("vec_id"), col("cosine")), arm)
  }

  /** Lexical arm: the [[Ann.hybridRrf]] BM25 shape with chunks as the
    * retrieval unit — chunk-grain tf/dl/df/avgdl, probe terms still from
    * the probe document's own vocabulary. */
  private def lexArm(documents: DataFrame, nProbes: Int, kTerms: Int,
                     arm: Int): DataFrame = {
    val docs = documents.filter(col("text").isNotNull)
    val ctoks = chunks(docs)
      .select(col("doc_id"), col("chunk_id"),
        size(col("cwords")).cast("long").as("dl"),
        explode(col("cwords")).as("word"))
    val wP = Window.partitionBy(col("probe_id"))
      .orderBy(col("ptf").desc, col("word"))
    val pt = TextPrep.withWords(docs)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .filter(col("doc_id") < nProbes && !col("word").isin(TextPrep.stopEn: _*))
      .groupBy(col("doc_id").as("probe_id"), col("word"))
      .agg(count(lit(1)).as("ptf"))
      .withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= kTerms)
      .select("probe_id", "word")
    val dfw = ctoks.join(broadcast(pt.select("word").distinct()), Seq("word"))
      .groupBy(col("word")).agg(countDistinct(col("chunk_id")).as("df"))
    val stats = chunks(docs)
      .agg(count(lit(1)).as("nn"),
        sum(size(col("cwords")).cast("decimal(18,0)")).cast("double").as("sdl"))
    val tfd = ctoks.join(broadcast(pt), Seq("word"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("chunk_id"), col("word"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val scored = tfd.join(broadcast(dfw), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sdl") / col("nn"))
      .withColumn("contrib", TextPrep.bm25Contrib(
        col("tf"), col("df"), col("dl"), col("nn"), col("avgdl")))
      .groupBy(col("probe_id"), col("chunk_id"))
      .agg(sum(col("contrib").cast("decimal(20,12)")).cast("double").as("score0"))
      .select(col("probe_id"), col("chunk_id").as("vec_id"),
        r6(col("score0")).as("cosine"))
    Ann.topkPerProbe(scored, arm)
  }

  /** The fused chunk candidate frame:
    * (probe_id, chunk_id, lex_rank, vec_rank, rrf). */
  private def fused(documents: DataFrame, nProbes: Int, kTerms: Int,
                    arm: Int, rrfK: Int): DataFrame = {
    val lex = lexArm(documents, nProbes, kTerms, arm)
      .select(col("probe_id").as("lp"), col("neighbor_id").as("ld"),
        col("rank").as("lex_rank"))
    val vec = vecArm(documents, nProbes, arm)
      .select(col("probe_id").as("vp"), col("neighbor_id").as("vd"),
        col("rank").as("vec_rank"))
    lex.join(vec,
        col("lp") === col("vp") && col("ld") === col("vd"), "full_outer")
      .select(coalesce(col("lp"), col("vp")).as("probe_id"),
        coalesce(col("ld"), col("vd")).as("chunk_id"),
        col("lex_rank"), col("vec_rank"))
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)))
  }

  /** Top-k chunks per probe with at-most-one-chunk-per-document: RRF
    * fusion of both arms, then the best-scoring chunk of each source
    * document survives (rrf desc, chunk_id asc — the min-struct pick,
    * no rank window over the fused frame), then the final rank. */
  def chunkRetrieval(documents: DataFrame, nProbes: Int = 10, k: Int = 10,
                     kTerms: Int = 8, arm: Int = 50, rrfK: Int = 60): DataFrame = {
    // the fused frame (≤ 2·arm rows per probe) feeds BOTH the per-doc
    // best pick and the final join — pin it so the two consumers share
    // one evaluation of the arms
    val f = fused(documents, nProbes, kTerms, arm, rrfK).localCheckpoint(false)
    val best = f
      .groupBy(col("probe_id").as("bp"),
        floor(col("chunk_id") / chunkFactor).cast("long").as("doc_id"))
      .agg(min(struct((col("rrf") * -1d).as("nr"), col("chunk_id").as("cid"))).as("w"))
      .select(col("bp"), col("doc_id"), col("w.cid").as("bc"))
    val wR = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf").desc, col("chunk_id"))
    f.join(best, col("probe_id") === col("bp") && col("chunk_id") === col("bc"))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("chunk_id"), r6(col("rrf")).as("rrf_score"),
        col("lex_rank"), col("vec_rank"))
      .orderBy("probe_id", "rank")
  }

  /** Chunk-grain vs doc-grain label-relevance precision@k — the serving
    * decision beside [[Ann.hybridEval]]: does passage retrieval with
    * doc dedup preserve the doc-grain hybrid list's precision? Per
    * probe: size and p@k of the deduped chunk list (labels via the
    * chunk's source document) against the same for [[Ann.hybridRrf]]'s
    * doc list. Cost bounded by probes × k on top of the two lists. */
  def chunkEval(documents: DataFrame, embeddings: DataFrame,
                nProbes: Int = 10, k: Int = 10, kTerms: Int = 8,
                arm: Int = 50, rrfK: Int = 60): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val probeLab = labels.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("pl_id"), col("label").as("plabel"))
    def prec(list: DataFrame, docCol: String, nm: String): DataFrame =
      list.join(broadcast(labels.withColumnRenamed("vec_id", "cand_id")),
          col(docCol) === col("cand_id"))
        .join(broadcast(probeLab), col("probe_id") === col("pl_id"))
        .groupBy(col("probe_id"))
        .agg(count(lit(1)).as(s"n_$nm"),
          sum((col("label") === col("plabel")).cast("long")).as(s"${nm}_hits"))
        .select(col("probe_id"), col(s"n_$nm"),
          r6(try_divide(col(s"${nm}_hits").cast("double"), col(s"n_$nm")))
            .as(s"p_$nm"))
    val c = prec(chunkRetrieval(documents, nProbes, k, kTerms, arm, rrfK),
      "doc_id", "chunk")
    val d = prec(Ann.hybridRrf(documents, embeddings, nProbes, k, kTerms,
      arm, rrfK), "doc_id", "doc")
    c.join(d, Seq("probe_id"), "full_outer").orderBy("probe_id")
  }

  // dev-probe seams (graft.tools.Probe): the private stages, unchanged
  private[graft] def probeHeap(scored: DataFrame, k: Int): DataFrame =
    Ann.topkPerProbe(scored, k)
  private[graft] def probeVecArm(docs: DataFrame): DataFrame = vecArm(docs, 10, 50)
  private[graft] def probeLexArm(docs: DataFrame): DataFrame = lexArm(docs, 10, 8, 50)
  private[graft] def probeFused(docs: DataFrame): DataFrame = fused(docs, 10, 8, 50, 60)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_retrieval" -> ((s, d) => chunkRetrieval(Tables.documents(s, d))),
    "q_chunk_eval" -> ((s, d) =>
      chunkEval(Tables.documents(s, d), Ann.loadEmb(s, d)))
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** The bucket/sign fragments of the md5 hashing-trick device (the
    * q_feature_hashing oracle's). */
  private val bucketSql =
    "((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 + " +
      "instr('0123456789abcdef', substr(hx, 2, 1)) - 1) % 64"
  private val sgnSql =
    "CASE WHEN (instr('0123456789abcdef', substr(hx, 3, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END"

  private def projArr(j: Int): String =
    (0 until dims).map(Embeddings.projSign(_, j)).mkString("[", ",", "]")

  /** Shared oracle chain: chunk grain → hash/JL embeddings → both arms →
    * fusion → doc dedup; ends at `kfin(probe_id, chunk_id, lex_rank,
    * vec_rank, rrf, rank)` already doc-deduped and ranked. */
  private lazy val chunkCtes: String = {
    val pCols = (0 until outDims).map(j =>
      s"CAST(SUM(sgn * list_extract(${projArr(j)}, CAST(bucket AS INT) + 1)) AS BIGINT) AS p$j")
      .mkString(",\n             ")
    val qCols = (0 until outDims).map(j => s"p$j AS q$j").mkString(", ")
    val nsq = (0 until outDims).map(j => s"p$j * p$j").mkString(" + ")
    val dotPq = (0 until outDims).map(j => s"c.p$j * e.q$j").mkString(" + ")
    s"""kw AS (SELECT doc_id, string_split($normSql, ' ') AS words FROM documents
           WHERE text IS NOT NULL AND $normSql <> ''),
         kch AS (SELECT doc_id, doc_id * $chunkFactor + st.s // $stride AS chunk_id,
             list_slice(words, CAST(st.s AS INT) + 1, CAST(st.s AS INT) + $width) AS cwords
           FROM kw, LATERAL (SELECT UNNEST(range(0, len(words), $stride)) AS s) st),
         ktok AS (SELECT doc_id, chunk_id, CAST(len(cwords) AS BIGINT) AS dl,
             unnest(cwords) AS word FROM kch),
         kcb AS (SELECT chunk_id, $bucketSql AS bucket, $sgnSql AS sgn
           FROM (SELECT chunk_id, md5(word) AS hx FROM ktok)),
         kce0 AS (SELECT chunk_id,
             $pCols
           FROM kcb GROUP BY 1),
         kce AS (SELECT *, CAST($nsq AS BIGINT) AS nsq FROM kce0 WHERE $nsq > 0),
         kpw AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS word
           FROM documents
           WHERE text IS NOT NULL AND $normSql <> '' AND doc_id < 10),
         kpb AS (SELECT doc_id, $bucketSql AS bucket, $sgnSql AS sgn
           FROM (SELECT doc_id, md5(word) AS hx FROM kpw)),
         kpe0 AS (SELECT doc_id,
             $pCols
           FROM kpb GROUP BY 1),
         kpe AS (SELECT doc_id AS probe_id, $qCols, CAST($nsq AS BIGINT) AS pnsq
           FROM kpe0 WHERE $nsq > 0),
         kvs AS (SELECT e.probe_id, c.chunk_id,
             FLOOR(CAST($dotPq AS DOUBLE)
               / (sqrt(CAST(c.nsq AS DOUBLE)) * sqrt(CAST(e.pnsq AS DOUBLE)))
               * 1000000 + 0.5) / 1000000 AS cosine
           FROM kce c, kpe e WHERE c.chunk_id // $chunkFactor <> e.probe_id),
         kvr AS (SELECT probe_id, chunk_id, ROW_NUMBER() OVER
             (PARTITION BY probe_id ORDER BY cosine DESC, chunk_id) AS vec_rank
           FROM kvs),
         kvarm AS (SELECT * FROM kvr WHERE vec_rank <= 50),
         kdt AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS word
           FROM documents WHERE text IS NOT NULL AND $normSql <> ''),
         kpt0 AS (SELECT doc_id AS probe_id, word, CAST(COUNT(*) AS BIGINT) AS ptf
           FROM kdt WHERE doc_id < 10
             AND word NOT IN (${TextPrep.stopEnSql})
           GROUP BY 1, 2),
         kptk AS (SELECT probe_id, word FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ptf DESC, word) AS rn
           FROM kpt0) WHERE rn <= 8),
         kdfw AS (SELECT word, CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS df FROM ktok
           WHERE word IN (SELECT DISTINCT word FROM kptk) GROUP BY 1),
         kst AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(CAST(len(cwords) AS HUGEINT)) AS DOUBLE) AS sdl FROM kch),
         ktfd AS (SELECT kptk.probe_id, ktok.chunk_id, ktok.word,
             CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
           FROM ktok JOIN kptk ON ktok.word = kptk.word AND ktok.doc_id <> kptk.probe_id
           GROUP BY 1, 2, 3),
         ksc AS (SELECT t.probe_id, t.chunk_id,
             ${TextPrep.bm25ContribSql("t.tf", "d.df", "t.dl", "kst.nn", "(kst.sdl / kst.nn)")} AS contrib
           FROM ktfd t JOIN kdfw d ON t.word = d.word, kst),
         kls AS (SELECT probe_id, chunk_id,
             ${sqlR("CAST(SUM(CAST(contrib AS DECIMAL(20,12))) AS DOUBLE)", 6)} AS score
           FROM ksc GROUP BY 1, 2),
         klr AS (SELECT probe_id, chunk_id,
             ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY score DESC, chunk_id) AS lex_rank
           FROM kls),
         klarm AS (SELECT * FROM klr WHERE lex_rank <= 50),
         kfus AS (SELECT COALESCE(l.probe_id, v.probe_id) AS probe_id,
             COALESCE(l.chunk_id, v.chunk_id) AS chunk_id, l.lex_rank, v.vec_rank,
             COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0.0) +
               COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0.0) AS rrf
           FROM klarm l FULL OUTER JOIN kvarm v
             ON l.probe_id = v.probe_id AND l.chunk_id = v.chunk_id),
         kdd AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY probe_id, chunk_id // $chunkFactor ORDER BY rrf DESC, chunk_id) AS dr
           FROM kfus),
         kfin AS (SELECT probe_id, chunk_id, lex_rank, vec_rank, rrf,
             ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY rrf DESC, chunk_id) AS rank
           FROM kdd WHERE dr = 1)"""
  }

  val oracles: Map[String, String] = Map(
    "q_chunk_retrieval" ->
      s"""WITH $chunkCtes
         SELECT probe_id, CAST(rank AS INT) AS rank,
           CAST(chunk_id // $chunkFactor AS BIGINT) AS doc_id, chunk_id,
           ${sqlR("rrf", 6)} AS rrf_score,
           CAST(lex_rank AS INT) AS lex_rank, CAST(vec_rank AS INT) AS vec_rank
         FROM kfin WHERE rank <= 10 ORDER BY probe_id, rank""",
    "q_chunk_eval" ->
      s"""WITH ${Ann.normCte}, ${Ann.hybridCtes}, $chunkCtes,
         hfr AS (SELECT probe_id, doc_id, ROW_NUMBER() OVER
             (PARTITION BY probe_id ORDER BY rrf DESC, doc_id) AS rank FROM hrrf),
         dlist AS (SELECT probe_id, doc_id FROM hfr WHERE rank <= 10),
         clist AS (SELECT probe_id, chunk_id // $chunkFactor AS doc_id
           FROM kfin WHERE rank <= 10),
         elab AS (SELECT vec_id, label FROM embeddings),
         eplab AS (SELECT vec_id AS probe_id, label AS plabel FROM embeddings WHERE vec_id < 10),
         cstat AS (SELECT c.probe_id, CAST(COUNT(*) AS BIGINT) AS n_chunk,
             CAST(SUM(CASE WHEN l.label = p.plabel THEN 1 ELSE 0 END) AS BIGINT) AS chunk_hits
           FROM clist c JOIN elab l ON l.vec_id = c.doc_id
             JOIN eplab p ON p.probe_id = c.probe_id GROUP BY 1),
         dstat AS (SELECT d.probe_id, CAST(COUNT(*) AS BIGINT) AS n_doc,
             CAST(SUM(CASE WHEN l.label = p.plabel THEN 1 ELSE 0 END) AS BIGINT) AS doc_hits
           FROM dlist d JOIN elab l ON l.vec_id = d.doc_id
             JOIN eplab p ON p.probe_id = d.probe_id GROUP BY 1)
         SELECT COALESCE(c.probe_id, d.probe_id) AS probe_id,
           n_chunk,
           CASE WHEN n_chunk > 0 THEN ${sqlR("CAST(chunk_hits AS DOUBLE) / n_chunk", 6)} END AS p_chunk,
           n_doc,
           CASE WHEN n_doc > 0 THEN ${sqlR("CAST(doc_hits AS DOUBLE) / n_doc", 6)} END AS p_doc
         FROM cstat c FULL OUTER JOIN dstat d ON c.probe_id = d.probe_id
         ORDER BY 1"""
  )
}
