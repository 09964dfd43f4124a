package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus ingestion against a PERSISTED dedup index — the
  * production shape for continuous training-data intake: new documents
  * arrive as a stream, are banded row-locally (stateless, so the whole
  * hash path runs inside the micro-batch with no streaming aggregation
  * state), and stream-static join the existing corpus's band store
  * ([[graft.dedup.Dedup.bandStore]]) to surface near-dup candidates the
  * moment a document lands. The static side is the thing a real
  * deployment keeps as a bucketed table; Spark re-reads it per
  * micro-batch with no state growth on the stream side.
  */
object DocStream {

  /** Streaming read of the documents table (same [[Staging.stageParquet]]
    * scratch staging as [[EventStream.readEvents]] — production points
    * this at the landing directory). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val streamDir = Staging.stageParquet(dir, "documents", "graft-docstream")
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir)
  }

  /** Row-local LSH banding: the EXACT same signature math as
    * [[graft.dedup.Dedup.lshBands]] (2 salted md5s per shingle, 8-hex
    * chunks parsed to int64, min per chunk, re-hexed band digests) but
    * computed with array higher-order functions INSIDE one row — no
    * explode, no groupBy, hence stateless and streamable. Batch-side
    * lshBands keeps the explode+hash-aggregate form (faster on a full
    * corpus scan); DocStreamSpec asserts the two produce identical
    * (doc_id, band_idx, bh) rows. */
  def bandsRowLocal(documents: DataFrame): DataFrame = {
    val shingles =
      """transform(sequence(0, size(words) - 3),
        |  i -> concat_ws(' ', words[i], words[i+1], words[i+2]))""".stripMargin
    def chunkMin(salt: Int, k: Int): String =
      s"""array_min(transform(sh, s ->
         |  cast(conv(substring(md5(cast(concat('$salt:', s) as binary)), ${k * 8 + 1}, 8), 16, 10) as bigint)))""".stripMargin
    def rehex(e: String): String = s"lower(lpad(hex($e), 8, '0'))"
    val withSig = documents
      .withColumn("words", split(graft.functions.Fns.normText(col("text")), " "))
      .filter(expr("size(words) >= 3"))
      .withColumn("sh", expr(shingles))
      .select(col("doc_id") +: (0 to 7).map { k =>
        val salt = if (k < 4) 0 else 1
        expr(chunkMin(salt, k % 4)).as(s"h$k")
      }: _*)
    withSig.select(col("doc_id"), explode(expr(
      (0 to 3).map(b =>
        s"struct(cast($b as int) as band_idx, md5(cast(concat(${rehex(s"h${2 * b}")}, ${rehex(s"h${2 * b + 1}")}) as binary)) as bh)")
        .mkString("array(", ", ", ")"))).as("s"))
      .select(col("doc_id"), col("s.band_idx").as("band_idx"), col("s.bh").as("bh"))
  }

  /** Stream new documents against a static band store: emits one
    * candidate row per shared (band, bucket) the moment the new doc's
    * micro-batch lands. Pure Append mode — the only state Spark keeps is
    * the file-source log. Candidate DEDUP (one row per pair) happens
    * downstream exactly as in the batch incremental path; at ingest time
    * you want the raw hits immediately.
    *
    * `newDocFilter` optionally restricts the streamed side (the test
    * harness passes the md5-digit split that mirrors
    * q_dedup_incremental); by default EVERY streamed document is
    * matched — a production ingest points this at its landing directory
    * and must not silently lose documents to a baked-in test split. */
  def bandMatches(spark: SparkSession, dir: String, storedBands: DataFrame,
                  newDocFilter: Option[Column] = None,
                  queryName: String = "stream_bandmatch"): DataFrame = {
    val base = readDocuments(spark, dir)
    val newDocs = newDocFilter.map(base.filter).getOrElse(base)
    val hits = bandsRowLocal(newDocs).as("n")
      .join(storedBands.withColumnRenamed("doc_id", "corpus_doc")
        .withColumnRenamed("bh", "cbh").withColumnRenamed("band_idx", "cband"),
        col("band_idx") === col("cband") && col("bh") === col("cbh"))
      .select(col("doc_id").as("new_doc"), col("corpus_doc"),
        col("band_idx"), col("bh"))
    val q = hits.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Stream arriving documents through a FROZEN learned BPE merge table
    * (the [[graft.text.Bpe.bpeTrain]] artifact — tokenizers are trained
    * offline and applied at ingest): the ranked merge table collapses to
    * one stream-static broadcast row and every document re-tokenizes
    * with the row-local replay fold the moment its micro-batch lands.
    * Emits the bpeApply columns per arrival; zero aggregation state,
    * bit-equal to batch [[graft.text.Bpe.bpeApply]] (Round12Spec). */
  def tokenizedArrivals(spark: SparkSession, dir: String, merges: DataFrame,
                        newDocFilter: Option[Column] = None,
                        queryName: String = "stream_bpe"): DataFrame = {
    val base = readDocuments(spark, dir)
    val docs = newDocFilter.map(base.filter).getOrElse(base)
    val out = graft.text.Bpe.applyMart(docs, merges)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Stream arriving documents through a FROZEN SUBWORD merge table
    * (the [[graft.text.SubwordBpe.subwordTrain]] artifact — the
    * production tokenizer grain): every arriving document re-tokenizes
    * ROW-LOCALLY with the rank-ordered replay fold over the one-row
    * broadcast artifact. Emits the subwordApply columns per arrival;
    * zero aggregation state asserted inside the operator, bit-equal to
    * batch [[graft.text.SubwordBpe.subwordApply]] (Round14Spec). */
  def subwordArrivals(spark: SparkSession, dir: String, merges: DataFrame,
                      newDocFilter: Option[Column] = None,
                      queryName: String = "stream_subword"): DataFrame = {
    val base = readDocuments(spark, dir)
    val docs = newDocFilter.map(base.filter).getOrElse(base)
    val out = graft.text.SubwordBpe.applyMart(docs, merges)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try {
      q.processAllAvailable()
      val st = Option(q.lastProgress).flatMap(p => Option(p.stateOperators))
        .getOrElse(Array.empty)
      require(st.isEmpty,
        s"subword tokenization must hold zero aggregation state, found ${st.length} operators")
    } finally q.stop()
    spark.table(queryName)
  }

  /** Stream arriving documents through the fixed-width Bloom
    * decontamination screen (the [[graft.text.Filters.bloomBits]]
    * artifact — 8 KB regardless of eval-set size, which is what makes
    * this gate broadcastable forever): per document the distinct
    * word-3-gram set is built ROW-LOCALLY (array_distinct over a
    * transform — no explode, no streaming aggregation) and each shingle
    * tests its four md5-digit bit positions against the broadcast bit
    * array. Emits (doc_id, n_shingles, n_bloom, bloom_containment,
    * bloom_contaminated) per arrival — the production path of
    * q_decontam_bloom with the exact-calibration join dropped; the
    * shared columns are bit-equal to the batch screen (Round12Spec). */
  def screenedArrivals(spark: SparkSession, dir: String, bits: DataFrame,
                       containmentThreshold: Double = 0.2,
                       newDocFilter: Option[Column] = None,
                       queryName: String = "stream_bloom"): DataFrame = {
    val base = readDocuments(spark, dir)
    val docs = newDocFilter.map(base.filter).getOrElse(base)
    val hit = graft.text.Filters.bloomHitSql("s")
    val out = docs
      .withColumn("words", split(graft.functions.Fns.normText(col("text")), " "))
      .withColumn("sh", expr(
        """CASE WHEN text IS NULL OR size(words) < 3
             THEN CAST(array() AS array<string>)
             ELSE array_distinct(transform(sequence(0, size(words) - 3),
               i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) END"""))
      .crossJoin(broadcast(bits))
      .withColumn("n_shingles", size(col("sh")).cast("long"))
      .withColumn("n_bloom", expr(s"size(filter(sh, s -> $hit))").cast("long"))
      .withColumn("bloom_containment",
        graft.functions.Fns.r6(when(col("n_shingles") > 0,
          col("n_bloom") / col("n_shingles")).otherwise(lit(0d))))
      .withColumn("bloom_contaminated",
        col("bloom_containment") >= containmentThreshold)
      .select("doc_id", "n_shingles", "n_bloom",
        "bloom_containment", "bloom_contaminated")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
