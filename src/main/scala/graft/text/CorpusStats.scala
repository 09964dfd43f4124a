package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.Fns._

/** Corpus-composition statistics a large-scale curation run reads before
  * (and after) committing a training mixture.
  *
  * - [[sourceOverlap]]: which SOURCES duplicate each other — the
  *   near-dup pair stream labeled with each side's source and rolled up
  *   to a (source_a, source_b) matrix. The reference pipeline dedups
  *   inside one warehouse; a multi-source corpus additionally needs the
  *   cross-source view to decide which feed to drop.
  * - [[lengthHistogram]]: per-source power-of-two token-length buckets —
  *   the distribution that picks packing budgets and length filters.
  *
  * Scale shape: overlap reuses the capped LSH candidate stream (the only
  * data-sized shuffle; pair count is bucket-bounded) plus two broadcast
  * joins of the tiny doc→source map — at corpus scale that map is big,
  * so both joins are plain shuffles on doc id, still one exchange each.
  * The histogram is one token-stream pass into ≤64 buckets per source.
  */
object CorpusStats {

  /** Near-dup overlap matrix between sources. Pairs are oriented
    * source_a <= source_b so each unordered source pair appears once. */
  def sourceOverlap(documents: DataFrame, bucketLimit: Int = 100): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    val pairs = Dedup.minhashLsh(documents, bucketLimit)
      .join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "src_a"), "doc_a")
      .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "src_b"), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
    pairs.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", col("source_a") =!= col("source_b"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source token-length histogram over power-of-two buckets:
    * bucket k holds docs with 2^k <= tokens < 2^(k+1) (k=0 also takes
    * empty docs). The bucket is binary-digit-count arithmetic —
    * floor(log2) computed EXACTLY in integers, because floating log2
    * differs in the last ulp across libm implementations at exact
    * powers of two, which would flip boundary docs between buckets
    * across engines. Emits count + token mass + within-source share. */
  def lengthHistogram(documents: DataFrame): DataFrame = {
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    TextPrep.withWords(documents)
      .select(col("source"), size(col("words")).cast("long").as("toks"))
      .withColumn("bucket", (length(bin(col("toks"))) - 1).cast("int"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .withColumn("doc_share",
        r6(col("n_docs").cast("double") / sum(col("n_docs")).over(wS)))
      .orderBy("source", "bucket")
  }

  /** Corpus-composition drift: per-source KL divergence (bits) of the
    * source's unigram distribution from the whole-corpus distribution —
    * the "did this crawl/source shift vocabulary" check a recurring
    * ingestion run reads before mixing, plus each source's most
    * divergent token. One token-stream pass: corpus word totals ride a
    * window over the word partitioning the (source, word) aggregation
    * already shuffles to; per-source KL sums run in DECIMAL (order-
    * independent). Only words PRESENT in the source contribute (p>0),
    * and q>0 always since the corpus contains the source — no smoothing
    * needed. */
  def corpusDrift(documents: DataFrame): DataFrame = {
    val wW = org.apache.spark.sql.expressions.Window.partitionBy(col("word"))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val wR = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("contrib_r").desc, col("word"))
    val csw = TextPrep.withWords(documents)
      .select(col("source"), explode(col("words")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    val total = csw.agg(sum(col("c")).as("t"))
    val scored = csw
      .withColumn("cw", sum(col("c")).over(wW))
      .withColumn("ts", sum(col("c")).over(wS))
      .withColumn("n_types", count(lit(1)).over(wS))
      .crossJoin(broadcast(total))
      // p·log2(p/q) with p = c/ts (source), q = cw/t (corpus)
      .withColumn("contrib",
        (col("c") / col("ts")) *
          (log((col("c") / col("ts")) / (col("cw") / col("t"))) / log(lit(2.0))))
      .withColumn("contrib_r", r6(col("contrib")))
      .withColumn("rn", row_number().over(wR))
    scored.groupBy(col("source"))
      .agg(max(col("ts")).as("n_tokens"),
        max(col("n_types")).as("n_types"),
        sum(col("contrib").cast("decimal(20,12)")).as("kl0"),
        max(when(col("rn") === 1, col("word"))).as("top_term"),
        max(when(col("rn") === 1, col("contrib_r"))).as("top_term_kl"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        r6(col("kl0").cast("double")).as("kl_bits"),
        col("top_term"), col("top_term_kl"))
      .orderBy("source")
  }

  /** N-gram novelty: per document, the share of its DISTINCT word-3-gram
    * shingles that appear nowhere else in the corpus (df = 1) — the
    * diversity/boilerplate signal: template text scores near 0 (all its
    * shingles recur elsewhere), fresh prose near 1. One shingle stream:
    * the df count is a window over the SAME hashed-shingle partitioning
    * the per-doc distinct already shuffled to (ReuseExchange, no second
    * tokenization pass), and shingles travel as xxhash64 int64 keys —
    * 8-byte shuffle keys, count-equal to raw text modulo 64-bit
    * collisions (the [[graft.dedup.Dedup.ngramJaccard]] trade). Docs
    * under 3 words have no shingles: novelty 0, never flagged. */
  def ngramNovelty(documents: DataFrame, boilerplateMax: Double = 0.2): DataFrame = {
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    val perDoc = TextPrep.shinglesAll(documents)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .distinct()
      .withColumn("df", count(lit(1)).over(wS))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
    documents.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shingles", "n_unique"))
      .withColumn("novelty",
        r6(when(col("n_shingles") > 0,
          col("n_unique").cast("double") / col("n_shingles")).otherwise(lit(0d))))
      .withColumn("is_boilerplate",
        col("n_shingles") > 0 && col("novelty") <= boilerplateMax)
      .orderBy("doc_id")
  }

  /** Corpus VERSION diff — the dataset-versioning mart a training-data
    * pipeline reads before promoting a corpus snapshot: per source, how
    * many docs were added / removed / changed (content-hash compare, the
    * q_row_hash_cdc device at doc grain) and the token-mass delta the
    * mixture weights must absorb. One FULL OUTER join co-keyed on doc_id
    * is the only doc-grain shuffle; no window touches raw docs, so the
    * shape is two scans + one exchange at any corpus size.
    *
    * Snapshots are derived deterministically from the one test corpus
    * (the md5-gate device every incremental twin uses): the OLD snapshot
    * is docs with md5 digit1 < 14 (~7/8), the NEW is digit1 >= 2 (~7/8),
    * and within NEW the docs with digit2 < 4 carry revised text — so all
    * four statuses are exercised. A production caller passes two real
    * snapshot frames through [[corpusDiffOf]]. */
  def corpusDiff(documents: DataFrame): DataFrame = {
    val h1 = hexDigit("doc_id", 1)
    val h2 = hexDigit("doc_id", 2)
    val olds = documents.filter(h1 < 14)
    val news = documents.filter(h1 >= 2)
      .withColumn("text",
        when(h2 < 4, concat(col("text"), lit(" [rev]"))).otherwise(col("text")))
    corpusDiffOf(olds, news)
  }

  /** [[corpusDiff]] over two explicit snapshot frames (doc_id, source,
    * text). */
  def corpusDiffOf(olds: DataFrame, news: DataFrame): DataFrame = {
    def tok(t: Column) =
      when(t.isNotNull, size(split(normText(t), " "))).otherwise(0).cast("long")
    val a = olds.select(col("doc_id"), col("source").as("source_a"),
      rowHash(col("text")).as("ha"), tok(col("text")).as("ta"))
    val b = news.select(col("doc_id"), col("source").as("source_b"),
      rowHash(col("text")).as("hb"), tok(col("text")).as("tb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("st",
        when(col("ha").isNull, lit("added"))
          .when(col("hb").isNull, lit("removed"))
          .when(col("ha") =!= col("hb"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy(coalesce(col("source_a"), col("source_b")).as("source"))
      .agg(
        sum(when(col("st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(coalesce(col("ta"), lit(0L))).as("tokens_old"),
        sum(coalesce(col("tb"), lit(0L))).as("tokens_new"))
      .withColumn("token_delta", col("tokens_new") - col("tokens_old"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_diff" -> ((s, d) => corpusDiff(Tables.documents(s, d))),
    "q_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))),
    "q_length_hist" -> ((s, d) => lengthHistogram(Tables.documents(s, d))),
    "q_corpus_drift" -> ((s, d) => corpusDrift(Tables.documents(s, d))),
    "q_ngram_novelty" -> ((s, d) => ngramNovelty(Tables.documents(s, d)))
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val oracles: Map[String, String] = Map(
    // md5-gate snapshots + doc-grain content-hash FULL OUTER diff; the
    // '_graft_null_' placeholder mirrors Fns.rowHash.
    "q_corpus_diff" -> {
      val dig = (pos: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $pos, 1)) - 1)"
      val tokOf = (t: String) =>
        s"CASE WHEN $t IS NOT NULL THEN CAST(len(string_split(trim(regexp_replace(lower($t), '\\s+', ' ', 'g')), ' ')) AS BIGINT) ELSE 0 END"
      s"""WITH olds AS (SELECT doc_id, source,
             md5(COALESCE(text, '_graft_null_')) AS ha, ${tokOf("text")} AS ta
           FROM documents WHERE ${dig(1)} < 14),
         rev AS (SELECT doc_id, source,
             CASE WHEN ${dig(2)} < 4 THEN text || ' [rev]' ELSE text END AS t2
           FROM documents WHERE ${dig(1)} >= 2),
         news AS (SELECT doc_id, source,
             md5(COALESCE(t2, '_graft_null_')) AS hb, ${tokOf("t2")} AS tb
           FROM rev),
         f AS (SELECT COALESCE(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.ha <> n.hb THEN 'changed'
                  ELSE 'unchanged' END AS st,
             COALESCE(o.ta, 0) AS ta, COALESCE(n.tb, 0) AS tb
           FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id)
         SELECT source,
           CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           CAST(SUM(ta) AS BIGINT) AS tokens_old,
           CAST(SUM(tb) AS BIGINT) AS tokens_new,
           CAST(SUM(tb) - SUM(ta) AS BIGINT) AS token_delta
         FROM f GROUP BY 1 ORDER BY 1"""
    },
    "q_source_overlap" ->
      s"""WITH ${Dedup.minhashCtes},
         mp AS (SELECT da AS doc_a, db AS doc_b FROM pairs GROUP BY 1, 2),
         s AS (SELECT doc_id, source FROM documents),
         lab AS (SELECT LEAST(sa.source, sb.source) AS source_a,
                        GREATEST(sa.source, sb.source) AS source_b
                 FROM mp JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b)
         SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           source_a <> source_b AS cross_source
         FROM lab GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_length_hist" ->
      s"""WITH n AS (SELECT source, $normSql AS norm FROM documents),
         wt AS (SELECT source, CAST(len(string_split(norm, ' ')) AS BIGINT) AS toks FROM n),
         b AS (SELECT source, toks,
             CAST(length(bin(toks)) - 1 AS INT) AS bucket
           FROM wt),
         g AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS n_tokens
           FROM b GROUP BY 1, 2)
         SELECT source, bucket, n_docs, n_tokens,
           ${sqlR("CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source)", 6)} AS doc_share
         FROM g ORDER BY source, bucket""",
    "q_ngram_novelty" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         sh AS (SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
           FROM w, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
           WHERE len(words) >= 3),
         d AS (SELECT doc_id, shingle,
             CAST(COUNT(*) OVER (PARTITION BY shingle) AS BIGINT) AS df
           FROM sh),
         agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
           FROM d GROUP BY 1),
         o AS (SELECT doc_id, source,
             CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
             CAST(COALESCE(n_unique, 0) AS BIGINT) AS n_unique
           FROM documents LEFT JOIN agg USING (doc_id))
         SELECT doc_id, source, n_shingles, n_unique,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_unique AS DOUBLE) / n_shingles ELSE 0 END", 6)} AS novelty,
           n_shingles > 0 AND
             ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_unique AS DOUBLE) / n_shingles ELSE 0 END", 6)} <= 0.2
             AS is_boilerplate
         FROM o ORDER BY doc_id""",
    "q_corpus_drift" ->
      s"""WITH n AS (SELECT source, $normSql AS norm FROM documents),
         w AS (SELECT source, unnest(string_split(norm, ' ')) AS word FROM n),
         csw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM csw),
         sc AS (SELECT source, word, c,
             CAST(SUM(c) OVER (PARTITION BY word) AS BIGINT) AS cw,
             CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS ts,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_types
           FROM csw),
         k AS (SELECT *,
             (CAST(c AS DOUBLE) / ts) *
               (ln((CAST(c AS DOUBLE) / ts) / (CAST(cw AS DOUBLE) / t)) / ln(2)) AS contrib
           FROM sc, tot),
         r AS (SELECT *, ${sqlR("contrib", 6)} AS contrib_r,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY ${sqlR("contrib", 6)} DESC, word) AS rn
           FROM k)
         SELECT source, MAX(ts) AS n_tokens, MAX(n_types) AS n_types,
           ${sqlR("CAST(SUM(CAST(contrib AS DECIMAL(20,12))) AS DOUBLE)", 6)} AS kl_bits,
           MAX(CASE WHEN rn = 1 THEN word END) AS top_term,
           MAX(CASE WHEN rn = 1 THEN contrib_r END) AS top_term_kl
         FROM r GROUP BY source ORDER BY source"""
  )
}
