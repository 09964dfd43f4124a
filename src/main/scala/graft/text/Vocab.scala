package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Vocabulary-level corpus analytics a tokenizer/training-data pipeline
  * runs before committing to a token budget: per-document TF-IDF salience,
  * sliding-window chunking for context-length-bounded training examples,
  * and bigram merge-candidate statistics (the first step of a BPE-style
  * merge table build).
  *
  * Scale design: everything is one pass over the exploded token stream
  * with hash-partial aggregation; the only shuffles are on (doc, word) /
  * word / bigram keys. The per-doc rank windows partition by doc_id, so
  * no single-partition global sorts appear anywhere except over the tiny
  * top-k result frames.
  */
object Vocab {

  /** Top-k TF-IDF terms per document: tf = in-doc term count,
    * idf = ln(N/df). The df count is a window over the SAME word
    * partitioning the tf stream already shuffles to, so the token stream
    * is scanned once (no second lineage for a df table); ties rank on
    * the ROUNDED score then word asc, so ordering is reproducible across
    * engines. */
  def tfidf(documents: DataFrame, k: Int = 3): DataFrame = {
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val tf = TextPrep.withWords(documents)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val wW = Window.partitionBy(col("word"))
    val wD = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("word"))
    tf.withColumn("df", count(lit(1)).over(wW))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        r6(col("tf") * log(col("n_docs").cast("double") / col("df"))))
      .withColumn("rank", row_number().over(wD))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"), col("word"),
        col("tf"), col("df"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Sliding-window chunker: fixed `size`-word windows every `stride`
    * words (overlap = size - stride), the standard preprocessing step
    * that turns long documents into context-length-bounded training
    * examples. Emits one row per chunk with its word span and content
    * hash — shuffle-free (pure explode over the word array). */
  def chunkDocs(documents: DataFrame, width: Int = 64, stride: Int = 48): DataFrame =
    TextPrep.withWords(documents)
      .withColumn("n", expr("size(words)"))
      .select(col("doc_id"), col("n"), col("words"),
        posexplode(expr(s"sequence(0, n - 1, $stride)")).as(Seq("chunk_idx", "start_word")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_word").cast("long").as("start_word"),
        least(lit(width), col("n") - col("start_word")).cast("long").as("n_words"),
        md5(expr(s"concat_ws(' ', slice(words, start_word + 1, $width))")
          .cast("binary")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Global bigram merge-candidate table: top-k adjacent word pairs by
    * frequency with each pair's corpus share and the running cumulative
    * share — what a BPE-style tokenizer build inspects to pick merge
    * rules and what a coverage curve is read off of. The cumulative sum
    * runs over INTEGER counts (exact, order-independent given the
    * deterministic rank order); only the final division touches doubles. */
  def bigramVocab(documents: DataFrame, k: Int = 40): DataFrame = {
    val bi = TextPrep.withWords(documents)
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(words) - 2), i -> concat_ws(' ', words[i], words[i+1]))")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
    val total = bi.agg(sum(col("n")).as("total"))
    // onePart (Fns) is a no-op on the k-row post-limit frame but gives
    // WindowExec a non-foldable partition spec, so "No Partition Defined"
    // noise stops wallpapering the logs where a REAL unbounded window
    // would hide (a bare lit(0) is stripped by EliminateWindowPartitions)
    val wR = Window.partitionBy(onePart(col("n"))).orderBy(col("n").desc, col("bigram"))
    val wC = Window.partitionBy(onePart(col("n"))).orderBy(col("n").desc, col("bigram"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // top-k via orderBy+limit (TakeOrderedAndProject: bounded per-partition
    // heaps, no full vocabulary sort); the global-ordered rank/cumsum
    // windows then only ever see the k surviving rows.
    bi.orderBy(col("n").desc, col("bigram")).limit(k)
      .withColumn("rank", row_number().over(wR))
      .withColumn("cum_n", sum(col("n")).over(wC))
      .crossJoin(broadcast(total))
      .select(col("rank").cast("int").as("rank"), col("bigram"), col("n"),
        r6(col("n").cast("double") / col("total")).as("share"),
        r6(col("cum_n").cast("double") / col("total")).as("cum_share"))
      .orderBy("rank")
  }

  /** CCNet-style unigram LM quality score: per-document cross-entropy
    * (bits/token) under the corpus's own unigram distribution — high
    * scores mark rare-token/unusual documents, the classic cheap quality
    * signal before an expensive LM filter. One token-stream pass: the
    * corpus count is a window over the word partitioning the tf stream
    * already shuffles to; per-doc log sums run in DECIMAL so the result
    * is order-independent and engine-exact. */
  def unigramLm(documents: DataFrame): DataFrame = {
    val tf = TextPrep.withWords(documents)
      .select(col("doc_id"), explode(col("words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val wW = Window.partitionBy(col("word"))
    val total = tf.agg(sum(col("tf")).as("t_tokens"))
    tf.withColumn("cw", sum(col("tf")).over(wW))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum((col("tf") * (log(col("cw").cast("double") / col("t_tokens")) / log(lit(2.0))))
          .cast("decimal(20,12)")).as("nll0"))
      .select(col("doc_id"), col("n_tokens"),
        r6((col("nll0").cast("double") * -1d) / col("n_tokens")).as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** Bigram LM quality score — the order-2 twin of [[unigramLm]]: per-doc
    * cross-entropy (bits per bigram token) under the corpus's own bigram
    * distribution, p(w2|w1) = c(w1 w2) / c(w1 ·). Catches word-salad text
    * a unigram model scores as normal (plausible words, implausible
    * transitions). Both corpus counts are windows over keys the bigram
    * stream already groups by (bigram, then its prefix word) — no second
    * tokenization pass; per-doc log sums run in DECIMAL so the score is
    * partition-order-independent. Docs under 2 words have no bigrams and
    * drop out, mirroring [[bigramVocab]]'s filter. No smoothing is
    * needed: every doc's bigrams are in the corpus counts by
    * construction, so p > 0 always. */
  def bigramLm(documents: DataFrame): DataFrame = {
    val tf = TextPrep.withWords(documents)
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words) - 2), i -> concat_ws(' ', words[i], words[i+1]))")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("tf"))
    val wB = Window.partitionBy(col("bigram"))
    val wP = Window.partitionBy(col("w1"))
    tf.withColumn("cb", sum(col("tf")).over(wB))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("c1", sum(col("tf")).over(wP))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum((col("tf") * (log(col("cb").cast("double") / col("c1")) / log(lit(2.0))))
          .cast("decimal(20,12)")).as("nll0"))
      .select(col("doc_id"), col("n_bigrams"),
        r6((col("nll0").cast("double") * -1d) / col("n_bigrams")).as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** Pretraining mixture plan under sqrt-temperature sampling: per-source
    * target weight ∝ √(available tokens), scaled to the largest total
    * corpus no source has to oversample for (take ≤ avail everywhere —
    * the binding source is the smallest one). Because weights are √-
    * proportional, take_s = √avail_s · √min_avail exactly, so the whole
    * plan is closed-form IEEE sqrt/mul arithmetic — no iteration, and
    * bit-identical in any engine. */
  def mixPlan(documents: DataFrame): DataFrame = {
    val bySrc = TextPrep.withWords(documents)
      .groupBy(col("source"))
      .agg(sum(size(col("words")).cast("long")).as("avail_tokens"))
    val consts = bySrc.agg(
      sum(sqrt(col("avail_tokens").cast("double")).cast("decimal(20,12)")).as("z0"),
      min(col("avail_tokens")).as("min_avail"))
    bySrc.crossJoin(broadcast(consts))
      .select(col("source"), col("avail_tokens"),
        r6(sqrt(col("avail_tokens").cast("double")) / col("z0").cast("double")).as("weight"),
        floor(sqrt(col("avail_tokens").cast("double")) *
          sqrt(col("min_avail").cast("double"))).cast("long").as("take_tokens"),
        r6(sqrt(col("min_avail").cast("double")) /
          sqrt(col("avail_tokens").cast("double"))).as("sampling_rate"))
      .orderBy("source")
  }

  /** Materialized mixture take: realize [[mixPlan]]'s per-source
    * sampling rates as a deterministic doc-level Bernoulli sample
    * (md5-uniform u < rate, 2^-16 grain — the [[graft.operators.
    * Sampling.hashBucket]] device at finer resolution) and report the
    * per-source funnel: docs/tokens available vs taken, target vs
    * realized rate. One token-stream pass + a broadcast of the tiny
    * per-source rate table; the sample is reproducible on any engine,
    * cluster size, or run — the property that makes a 100 TB mixture
    * auditable. */
  def mixTake(documents: DataFrame): DataFrame = {
    def hv(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), $i, 1)) - 1)"
    val wt = TextPrep.withWords(documents)
      .select(col("doc_id"), col("source"), size(col("words")).cast("long").as("toks"))
    val bySrc = wt.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("avail_tokens"))
    val consts = bySrc.agg(min(col("avail_tokens")).as("min_avail"))
    val rated = bySrc.crossJoin(broadcast(consts))
      .select(col("source"),
        (sqrt(col("min_avail").cast("double")) /
          sqrt(col("avail_tokens").cast("double"))).as("rate"))
    wt.join(broadcast(rated), "source")
      .withColumn("u",
        expr(s"(${hv(1)} * 4096 + ${hv(2)} * 256 + ${hv(3)} * 16 + ${hv(4)})") / lit(65536d))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("avail_tokens"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("docs_taken"),
        sum(when(col("u") < col("rate"), col("toks")).otherwise(0L)).as("tokens_taken"),
        max(col("rate")).as("rate0"))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("docs_taken"), col("tokens_taken"),
        r6(col("rate0")).as("target_rate"),
        r6(col("tokens_taken").cast("double") / col("avail_tokens")).as("realized_rate"))
      .orderBy("source")
  }

  /** CCNet-style perplexity bucketing: every doc assigned to the
    * head / middle / tail third of the corpus by its [[bigramLm]]
    * cross-entropy (head = lowest bits/token = most fluent), with the
    * keep decision (drop the tail) — the quality gate CCNet applies
    * before training. Tertile CUTOFFS come from the exact distributed
    * cumulative count of [[graft.functions.PrefixSum]] over the distinct
    * rounded scores (range-bucketed parallel sorts — never an NDV-sized
    * in-memory percentile buffer, and no single-partition window
    * either), then two edges broadcast and the bucket
    * assigned row-locally; ties bucket deterministically by value
    * comparison in both engines. Docs under 2 words have no bigrams and
    * drop out, mirroring [[bigramLm]]. */
  def pplFilter(documents: DataFrame): DataFrame = {
    // The scored frame is DOC-scale (one row per doc) but its lineage is
    // the full bigram-LM pass — four shuffles over the exploded bigram
    // stream. It feeds TWO consumers: the tertile-edge computation (via
    // dist, which the prefix-sum device reads twice — NDV probe +
    // cumulative window — plus the total once more) and the final per-doc
    // bucketing. One LAZY localCheckpoint here pins the SCORED frame, so
    // the LM pass runs exactly once for the whole query (pinning only
    // `dist`, as this used to, still re-ran the LM pass for the final
    // bucketing scan). The device's eager probe job materializes the pin;
    // everything downstream — dist, edges, bucketing — re-reads the
    // cached doc-scale leaf. Same persistence footprint as pinning dist
    // (distinct rounded scores are ~doc-count anyway).
    val scored = bigramLm(documents).localCheckpoint(false)
    val dist = scored.groupBy(col("bits_per_token").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = graft.functions.PrefixSum.cumulative(dist, "v", "c")
    val n = dist.agg(sum(col("c")).as("n"))
    val edges = cum.crossJoin(broadcast(n))
      .select(col("v"), col("cum"), col("n"), explode(array(lit(1), lit(2))).as("k"))
      .filter(col("cum") >= expr("(k * n + 2) div 3"))
      .groupBy(col("k")).agg(min(col("v")).as("e"))
    val edgeRow = edges.agg(
      max(when(col("k") === 1, col("e"))).as("e1"),
      max(when(col("k") === 2, col("e"))).as("e2"))
    scored.crossJoin(broadcast(edgeRow))
      .select(col("doc_id"), col("n_bigrams"), col("bits_per_token"),
        when(col("bits_per_token") < col("e1"), lit("head"))
          .when(col("bits_per_token") < col("e2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .withColumn("keep", col("bucket") =!= "tail")
      .orderBy("doc_id")
  }

  /** Data-constrained epoch plan — the multi-epoch extension of
    * [[mixPlan]] (Muennighoff et al.'s repeat-data regime): a token
    * budget of `budgetMult`× the corpus is allocated √-proportionally,
    * but no source repeats more than `maxEpochs` times (returns on
    * repeated data decay); small sources hit the cap and the plan
    * reports the realized share so the trainer sees the shortfall.
    * Everything is closed-form from one per-source token count: two
    * broadcast scalar frames (√-weight normalizer + realized total), all
    * shares from exact integer/decimal sums. */
  def epochPlan(documents: DataFrame, budgetMult: Int = 2,
                maxEpochs: Double = 4.0): DataFrame = {
    val bySrc = TextPrep.withWords(documents)
      .groupBy(col("source"))
      .agg(sum(size(col("words")).cast("long")).as("avail_tokens"))
    val consts = bySrc.agg(
      sum(sqrt(col("avail_tokens").cast("double")).cast("decimal(20,12)")).as("z0"),
      sum(col("avail_tokens")).as("total"))
    val planned = bySrc.crossJoin(broadcast(consts))
      .withColumn("weight", sqrt(col("avail_tokens").cast("double")) / col("z0").cast("double"))
      .withColumn("target_tokens",
        col("weight") * (col("total") * budgetMult).cast("double"))
      .withColumn("epochs_uncapped", col("target_tokens") / col("avail_tokens"))
      .withColumn("epochs", least(lit(maxEpochs), col("epochs_uncapped")))
      .withColumn("take_tokens",
        floor(col("epochs") * col("avail_tokens")).cast("long"))
    val realized = planned.agg(sum(col("take_tokens")).as("take_total"))
    planned.crossJoin(broadcast(realized))
      .select(col("source"), col("avail_tokens"),
        r6(col("weight")).as("weight"),
        floor(col("target_tokens")).cast("long").as("target_tokens"),
        r4(col("epochs")).as("epochs"),
        (col("epochs_uncapped") > maxEpochs).as("capped"),
        col("take_tokens"),
        r6(col("take_tokens").cast("double") / col("take_total")).as("realized_share"))
      .orderBy("source")
  }

  /** Top-k PMI collocations (Church & Hanks 1990): pointwise mutual
    * information log2(P(w1,w2) / (P(w1)·P(w2))) over the corpus bigram
    * stream, with a minimum pair-count floor so rare coincidences don't
    * dominate (the classic PMI failure mode). Raw frequency ranks
    * boilerplate ([[bigramVocab]]); PMI ranks ASSOCIATION — the pairs
    * that co-occur far above chance — which is what a phrase/merge-rule
    * miner actually wants.
    *
    * Scale shape: the min-count filter runs ON the bigram aggregate
    * before any join, so the joins against the unigram table carry only
    * the surviving pairs (tiny, AQE-broadcastable); the unigram and
    * bigram counts are each one partial-aggregated shuffle over the
    * token stream; final top-k is a TakeOrderedAndProject. Ties rank on
    * the ROUNDED score then (w1, w2), so ordering is reproducible across
    * engines. */
  def pmiCollocations(documents: DataFrame, k: Int = 40, minCount: Int = 5): DataFrame = {
    val words = TextPrep.withWords(documents)
    val uni = words.select(explode(col("words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val uniTot = uni.agg(sum(col("c")).as("n_uni"))
    val biTot = words.agg(
      sum(greatest(size(col("words")) - 1, lit(0)).cast("long")).as("n_bi"))
    val bi = words.filter(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(words) - 2), i -> struct(words[i] as w1, words[i+1] as w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val scored = bi
      .join(uni.select(col("word").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("word").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(uniTot)).crossJoin(broadcast(biTot))
      .withColumn("pmi", r6(
        log((col("c12").cast("double") / col("n_bi")) /
          ((col("c1").cast("double") / col("n_uni")) *
            (col("c2").cast("double") / col("n_uni")))) / log(lit(2.0))))
    // lit(0) partition: no-op on the post-limit k rows, silences WindowExec
    val wR = Window.partitionBy(onePart(col("pmi"))).orderBy(col("pmi").desc, col("w1"), col("w2"))
    scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rank", row_number().over(wR))
      .select(col("rank").cast("int").as("rank"), col("w1"), col("w2"),
        col("c12"), col("c1"), col("c2"), col("pmi"))
      .orderBy("rank")
  }

  /** Temperature-scaled source mixing weights — the multilingual/
    * multi-source sampling scheme of mC4 / XLM-R (Conneau et al. 2019):
    * p_i(τ) ∝ n_i^τ, swept over τ ∈ {0.25, 0.5, 0.75, 1.0} so the
    * mixture designer reads the full flattening curve (τ=1 is natural
    * proportions, τ→0 approaches uniform; [[mixPlan]] is the τ=0.5
    * point). The powers are COMPOSED FROM sqrt ONLY (n^0.25 =
    * √√n, n^0.75 = √n·√√n) — IEEE sqrt is correctly rounded in every
    * engine, unlike pow, so the sweep is bit-reproducible with no
    * transcendental-parity caveat. Normalizer sums run in DECIMAL so
    * they are partition-order-independent.
    *
    * Scale shape: one aggregation to source grain, one tiny normalizer
    * row broadcast back, 4 rows out per source. */
  def mixTemperature(documents: DataFrame): DataFrame = {
    val g = TextPrep.withWords(documents)
      .select(col("source"), size(col("words")).cast("long").as("n_tok"))
      .groupBy("source").agg(sum(col("n_tok")).as("avail_tokens"))
    val n = col("avail_tokens").cast("double")
    val pows = Seq(
      0.25 -> sqrt(sqrt(n)),
      0.5 -> sqrt(n),
      0.75 -> (sqrt(n) * sqrt(sqrt(n))),
      1.0 -> n)
    val p = pows.foldLeft(g) { case (df, (t, e)) =>
      df.withColumn(s"p_${(t * 100).toInt}", e) }
    val zAggs = pows.map { case (t, _) =>
      sum(col(s"p_${(t * 100).toInt}").cast("decimal(20,12)")).cast("double")
        .as(s"z_${(t * 100).toInt}") } :+ sum(col("avail_tokens")).as("n_total")
    val z = p.agg(zAggs.head, zAggs.tail: _*)
    val rows = pows.map { case (t, _) =>
      val tag = (t * 100).toInt
      struct(lit(t).as("tau"),
        (col(s"p_$tag") / col(s"z_$tag")).as("w0"))
    }
    p.crossJoin(broadcast(z))
      .select(col("source"), col("avail_tokens"), col("n_total"),
        explode(array(rows: _*)).as("r"))
      .select(col("source"), col("r.tau").as("tau"), col("avail_tokens"),
        r6(col("r.w0")).as("weight"),
        r6(col("r.w0") / (col("avail_tokens").cast("double") / col("n_total")))
          .as("upsample_factor"))
      .orderBy("source", "tau")
  }

  /** Hashing-trick document features (Weinberger et al. 2009, "Feature
    * Hashing for Large Scale Multitask Learning" — the Vowpal Wabbit
    * device): each token is hashed into one of `dims` buckets by two md5
    * hex digits, and a third digit's parity supplies the ±1 sign whose
    * signed sum cancels collisions in expectation. The fixed-width
    * feature space is what makes a 100 TB-corpus vocabulary trainable
    * without building or broadcasting a vocab table at all — the
    * complement of the exact top-k vocab ([[bigramVocab]] / q_tfidf).
    * Emitted long-form (doc_id, bucket) — the sparse-row layout a trainer
    * consumes — with raw count, signed count, and in-doc term frequency.
    *
    * Scale shape: row-local hashing on the exploded token stream, ONE
    * partial-aggregated shuffle to (doc, bucket) grain, then the per-doc
    * token total as a window over that already-bucketed frame (≤ `dims`
    * rows per doc — bounded state, no second pass over the tokens). */
  def featureHashing(documents: DataFrame, dims: Int = 64): DataFrame = {
    val toks = hashedTokens(documents, dims)
      .withColumn("sgn",
        when((expr("instr('0123456789abcdef', substr(hx, 3, 1))") - 1) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
    val perDoc = toks.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("sgn")).as("signed_cnt"))
    val wD = Window.partitionBy(col("doc_id"))
    perDoc.withColumn("n_tok", sum(col("cnt")).over(wD))
      .select(col("doc_id"), col("bucket").cast("int").as("bucket"),
        col("cnt"), col("signed_cnt"),
        r6(col("cnt").cast("double") / col("n_tok")).as("tf"))
      .orderBy("doc_id", "bucket")
  }

  /** The hashing-trick token stream both [[featureHashing]] and
    * [[dsirSelect]] build on: every token with its md5 hex string and
    * two-hex-digit bucket in [0, dims). ONE definition so the two
    * operators stay bit-identical to the shared oracle device. */
  private def hashedTokens(documents: DataFrame, dims: Int,
                           extra: Seq[String] = Nil): DataFrame =
    TextPrep.withWords(documents)
      .select(col("doc_id") +: extra.map(col) :+ explode(col("words")).as("word"): _*)
      .withColumn("hx", md5(col("word").cast("binary")))
      .withColumn("bucket", pmod(
        (expr("instr('0123456789abcdef', substr(hx, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substr(hx, 2, 1))") - 1, lit(dims)))

  /** The smoothed log-importance-ratio per bucket from a
    * (doc_id, source, bucket, cnt)-grain frame: λ_b = ln p_target(b) −
    * ln p_raw(b), add-1 over `dims` buckets. `dims` rows out — the
    * broadcast artifact both [[dsirSelect]] and the streaming gate
    * ([[graft.streaming.ScoreStream]]) apply. */
  private def lamOf(perDoc: DataFrame, targetSource: String, dims: Int): DataFrame = {
    val mass = perDoc.groupBy(col("bucket"))
      .agg(sum(when(col("source") === targetSource, col("cnt")).otherwise(0L)).as("ct"),
        sum(when(col("source") =!= targetSource, col("cnt")).otherwise(0L)).as("cr"))
    val tot = mass.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    mass.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("ct") + lit(1d)) / (col("nt") + lit(dims.toDouble))) -
          log((col("cr") + lit(1d)) / (col("nr") + lit(dims.toDouble)))).as("lam"))
  }

  /** The TRAINED DSIR artifact on its own — (bucket, lam), `dims` rows:
    * what a deployment persists after fitting on the training corpus and
    * ships to the ingestion gate. Same math as the artifact
    * [[dsirSelect]] builds inline. */
  def dsirWeights(documents: DataFrame, targetSource: String = "src0",
                  dims: Int = 64): DataFrame =
    lamOf(hashedTokens(documents, dims, Seq("source"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt")), targetSource, dims)

  /** DSIR data selection (Xie et al. 2023, arXiv:2302.03169 — "Data
    * Selection for Language Models via Importance Resampling"),
    * deterministic top-fraction variant: docs of `targetSource` define
    * the target domain; every OTHER doc is scored by its hashed-unigram
    * importance weight log w(x) = Σ_b cnt(x,b)·(ln p_target(b) −
    * ln p_raw(b)) under add-1-smoothed bucket unigram models (the same
    * md5 two-hex-digit bucket device [[featureHashing]] oracles), and
    * the top `takeFrac` of raw docs by that weight are selected (the
    * paper's Gumbel-noised sampling replaced by exact top-fraction so
    * the mart is deterministic and oracle-checkable; ties at the edge
    * score are all kept).
    *
    * Scale: both bucket LMs are `dims`-row broadcast artifacts built by
    * partial-aggregated counts over the one exploded token pass the
    * score join then reuses; the selection EDGE comes from the exact
    * distributed cumulative count of [[graft.functions.PrefixSum]] over
    * the distinct rounded scores (range-bucketed parallel sorts — no
    * single-partition rank window over the corpus-grain scored frame),
    * then one broadcast edge row and a row-local `selected` flag.
    * Nothing in the plan grows super-linearly with the corpus; the
    * importance-weight artifact never grows at all. */
  def dsirSelect(documents: DataFrame, targetSource: String = "src0",
                 dims: Int = 64, takeFrac: Double = 0.25): DataFrame = {
    // ONE pass over the exploded token stream, aggregated straight to
    // (doc, source, bucket) grain; both the bucket LMs and the per-doc
    // scores derive from this frame, so the two consumers share the
    // same canonical exchange (ReuseExchange) instead of re-tokenizing
    val perDoc = hashedTokens(documents, dims, Seq("source"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val lam = lamOf(perDoc, targetSource, dims)
    val scored = perDoc.filter(col("source") =!= targetSource)
      .join(broadcast(lam), "bucket")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt")).as("n_tok"),
        sum((col("cnt") * col("lam")).cast("decimal(20,12)")).as("s0"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        r6(col("s0").cast("double")).as("dsir_score"))
      .localCheckpoint(false)
    val dist = scored.groupBy(col("dsir_score").as("v")).agg(count(lit(1)).as("c"))
    val cum = graft.functions.PrefixSum.cumulative(dist, "v", "c")
    val n = dist.agg(sum(col("c")).as("n"))
    // edge = smallest score whose ascending cumulative count reaches into
    // the top floor(takeFrac·n) docs; selected = score ≥ edge
    val edgeRow = cum.crossJoin(broadcast(n))
      .filter(col("cum") >= col("n") - floor(lit(takeFrac) * col("n")) + 1)
      .agg(min(col("v")).as("edge"))
    scored.crossJoin(broadcast(edgeRow))
      .select(col("doc_id"), col("source"), col("n_tok"), col("dsir_score"),
        // edge is NULL when floor(takeFrac·n) = 0 — nothing to take, so
        // the flag must be FALSE, not NULL
        coalesce(col("dsir_score") >= col("edge"), lit(false)).as("selected"))
      .orderBy("doc_id")
  }

  /** Windowed skip-gram co-occurrence — the word2vec/GloVe training-pair
    * extraction (Mikolov et al. 2013): every unordered word pair within
    * `window` positions of each other in a document, counted corpus-wide;
    * the global top `k` pairs by count (count desc, then a/b asc — no
    * ties possible since (a,b) is the group key). Same-word pairs are
    * excluded; least/greatest canonicalizes direction so "the cat" and
    * "cat the" count to one key.
    *
    * Scale shape: pair generation is ROW-LOCAL — a flatten/transform
    * expression over the words array, bounded at `window` pairs per
    * token — NOT a positional self-join of the exploded token stream,
    * which would shuffle the corpus on doc_id and rescan it per offset.
    * Pair counts partial-aggregate map-side (the pair-key space is
    * vocab², but the OBSERVED pairs are Zipf-concentrated, so map-side
    * combine absorbs most of the mass), and the global top-k is
    * TakeOrderedAndProject — per-partition heaps, no full sort. */
  def cooccurTopk(documents: DataFrame, window: Int = 3, k: Int = 50): DataFrame = {
    TextPrep.withWords(documents)
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(words) - 1), i ->
              filter(transform(sequence(1, $window), d ->
                CASE WHEN i + d <= size(words) - 1 AND words[i] <> words[i + d]
                     THEN struct(least(words[i], words[i + d]) AS a,
                                 greatest(words[i], words[i + d]) AS b)
                END), p -> p IS NOT NULL)))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(k)
  }

  /** BM25 retrieval scoring (Robertson & Spärck Jones probabilistic
    * relevance; k1=1.2, b=0.75 — the Lucene/Elasticsearch defaults) of
    * every document against the corpus-head seed query: the `nQuery`
    * most frequent non-stopword terms (count desc, word asc — the
    * deterministic stand-in for a user query; swap in any bounded term
    * list). The retrieval primitive of similarity-driven curation:
    * "rank the corpus against this seed".
    *
    * Scale shape: the seed query and its document frequencies are
    * bounded BROADCAST artifacts (`nQuery` rows); the broadcast
    * semi-join prunes the token stream to query terms BEFORE the one
    * (doc, term) shuffle; doc length rides that same pass as a
    * functional-dependency max (no second corpus scan for dl); the
    * final score folds ≤ `nQuery` decimal-routed terms per doc. Docs
    * sharing no term with the query emit no row (standard inverted-index
    * semantics), mirrored by the oracle. k1/b are fixed literals so the
    * IEEE expression tree matches the oracle's exactly. */
  def bm25(documents: DataFrame, nQuery: Int = 10): DataFrame = {
    val stopEn = TextPrep.stopEn
    // NULL text would put size(NULL) = -1 into dl and the avgdl sum,
    // where the oracle's SUM(len(words)) skips NULL rows — drop it up
    // front in BOTH corpus passes (same hardening as linreg/shardPlan)
    val docs = documents.filter(col("text").isNotNull)
    val toks = TextPrep.withWords(docs)
      .select(col("doc_id"), size(col("words")).cast("long").as("dl"),
        explode(col("words")).as("word"))
    val q = toks.filter(!col("word").isin(stopEn: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("word")).limit(nQuery).select("word")
    val tf = toks.join(broadcast(q), Seq("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dft = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = TextPrep.withWords(docs)
      .agg(count(lit(1)).as("nn"),
        sum(size(col("words")).cast("decimal(18,0)")).cast("double").as("sdl"))
    tf.join(broadcast(dft), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sdl") / col("nn"))
      .withColumn("contrib", TextPrep.bm25Contrib(
        col("tf"), col("df"), col("dl"), col("nn"), col("avgdl")))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("n_terms"),
        sum(col("contrib").cast("decimal(20,12)")).cast("double").as("score0"))
      .select(col("doc_id"), col("dl"), col("n_terms"), r6(col("score0")).as("bm25"))
      .orderBy("doc_id")
  }

  /** Vocabulary-size planning for tokenizer training: for each token-mass
    * coverage target, the smallest frequency-ranked vocabulary that
    * reaches it — reported as the count threshold (`min_count`, the
    * granularity tokenizers actually prune at), the vocab size at that
    * cut, and the realized coverage / OOV share. The mart a tokenizer
    * build reads before committing to a vocab budget.
    *
    * Scale shape: the cumulative token mass runs over the distinct count
    * VALUES (the NDV of word frequencies — hundreds even for a 100 TB
    * corpus, Zipf guarantees it), via the exact PrefixSum device on the
    * count-descending key — the VOCAB itself (billions of types) is
    * never sorted or collected; the target selection is the same
    * explode-filter-max edge device as quantileBins, in exact decimal.
    */
  def vocabPrune(documents: DataFrame,
                 targets: Seq[Int] = Seq(50, 75, 90, 95, 99)): DataFrame = {
    val wc = TextPrep.withWords(documents)
      .select(explode(col("words")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    // distinct frequency values with type and token mass; v = -c so the
    // ascending prefix sum accumulates from the MOST frequent type down
    val dist = wc.groupBy(col("c")).agg(count(lit(1)).as("nw"))
      .withColumn("toks", col("c") * col("nw"))
      .withColumn("v", -col("c"))
      .localCheckpoint(false)
    val cumW = graft.functions.PrefixSum.cumulative(
        dist.select(col("v"), col("nw")), "v", "nw")
      .select(col("v"), col("cum").as("words_cum"))
    val cumT = graft.functions.PrefixSum.cumulative(
        dist.select(col("v"), col("toks")), "v", "toks")
      .select(col("v").as("v2"), col("cum").as("toks_cum"))
    val tot = dist.agg(sum(col("toks")).as("tot"))
    val grid = cumW.join(cumT, col("v") === col("v2")).drop("v2")
      .crossJoin(broadcast(tot))
      .select((-col("v")).as("min_count"), col("words_cum"),
        col("toks_cum"), col("tot"))
    // highest threshold whose coverage still meets the target = smallest
    // vocabulary; comparison in exact decimal, no float coverage math
    val picked = grid
      .withColumn("q100", explode(array(targets.map(lit): _*)))
      .filter(col("toks_cum").cast("decimal(38,0)") * 100 >=
        col("q100").cast("decimal(38,0)") * col("tot"))
      .groupBy(col("q100")).agg(max(col("min_count")).as("min_count"))
    picked.join(grid, Seq("min_count"))
      .select((col("q100").cast("double") / 100d).as("target"),
        col("min_count"), col("words_cum").as("vocab_size"),
        r6(col("toks_cum").cast("double") / col("tot")).as("coverage"),
        r6(lit(1.0) - col("toks_cum").cast("double") / col("tot")).as("oov_share"))
      .orderBy("target")
  }

  /** Zipf power-law fit of the vocabulary — the corpus-naturalness
    * diagnostic (natural language sits near slope −1 on log rank vs log
    * frequency; machine-generated or templated corpora bend away):
    * every type gets its exact frequency rank, then a one-pass
    * closed-form simple regression of ln(freq) on ln(rank) with the
    * Pearson r² of the fit.
    *
    * Device composition: the rank is the [[graft.text.Packing.shardPlan]]
    * shape (PrefixSum cumulative over the frequency NDV + within-tie
    * keyed ROW_NUMBER — no partitionless window over the vocabulary),
    * and the fit is the q_linreg_fit shape (decimal-routed moment sums,
    * one-row closed-form solve mirrored in the oracle, NULL on a
    * degenerate design). */
  def zipfFit(documents: DataFrame): DataFrame = {
    val wc = TextPrep.withWords(documents)
      .select(explode(col("words")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val dist = wc.groupBy(col("c")).agg(count(lit(1)).as("nw"))
      .withColumn("v", -col("c"))
      .localCheckpoint(false)
    val cum = graft.functions.PrefixSum.cumulative(
        dist.select(col("v"), col("nw")), "v", "nw")
      .select((-col("v")).as("c"), col("cum"), col("nw"))
    val wTie = Window.partitionBy(col("c")).orderBy(col("word"))
    val pts = wc.join(cum, Seq("c"))
      .withColumn("rnk", col("cum") - col("nw") + row_number().over(wTie))
      .select(log(col("rnk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    def dsum(cc: org.apache.spark.sql.Column) =
      sum(cc.cast("decimal(27,12)")).cast("double")
    val s = pts.agg(count(lit(1)).cast("double").as("n"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("x") * col("y")).as("sxy"),
      dsum(col("y") * col("y")).as("syy"))
    s.withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0,
            col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("n").cast("long").as("n_types"),
        r6(col("slope")).as("slope"),
        r6((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        r6(((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
          when((col("n") * col("sxx") - col("sx") * col("sx")) *
               (col("n") * col("syy") - col("sy") * col("sy")) =!= 0.0,
            (col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")))).as("r2_fit"))
  }

  /** Per-source KL divergence from the corpus unigram blend over the
    * hashed buckets (add-1 smoothed) — the mixture-MONITORING twin of
    * DSIR: dsirSelect scores DOCUMENTS for selection against a target;
    * this mart scores SOURCES for drift/contamination (a feed whose
    * token distribution pulls away from the blend it is supposed to
    * supply — the alarm a data-mixture owner watches between retrains).
    *
    * Scale shape: one exploded-token pass partial-aggregates to the
    * (source, bucket) grain (|sources|×dims rows — broadcast-sized);
    * the dense zero-filled spine makes add-1 smoothing see EMPTY
    * buckets identically in both engines; KL terms are row-local
    * doubles decimal-routed per source. Nothing here grows with the
    * corpus except the one token scan. */
  def sourceKl(documents: DataFrame, dims: Int = 64): DataFrame = {
    val bt = hashedTokens(documents, dims, Seq("source"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val spine = documents.select(col("source")).distinct()
      .crossJoin(broadcast(documents.sparkSession.range(0, dims)
        .select(col("id").cast("int").as("bucket"))))
    val dense = spine.join(bt, Seq("source", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val srcTot = dense.groupBy(col("source")).agg(sum(col("cnt")).as("nt"))
    val corpus = dense.groupBy(col("bucket")).agg(sum(col("cnt")).as("cc"))
    val corpTot = corpus.agg(sum(col("cc")).as("nc"))
    dense.join(srcTot, Seq("source"))
      .join(broadcast(corpus), Seq("bucket"))
      .crossJoin(broadcast(corpTot))
      .withColumn("p", (col("cnt") + lit(1d)) / (col("nt") + lit(dims.toDouble)))
      .withColumn("q", (col("cc") + lit(1d)) / (col("nc") + lit(dims.toDouble)))
      .withColumn("term", col("p") * log(col("p") / col("q")))
      .groupBy(col("source"))
      .agg(max(col("nt")).as("n_tokens"),
        sum(col("term").cast("decimal(20,12)")).cast("double").as("kl0"))
      .select(col("source"), col("n_tokens"), r6(col("kl0")).as("kl_vs_corpus"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_kl" -> ((s, d) => sourceKl(Tables.documents(s, d))),
    "q_zipf_fit" -> ((s, d) => zipfFit(Tables.documents(s, d))),
    "q_vocab_prune" -> ((s, d) => vocabPrune(Tables.documents(s, d))),
    "q_bm25" -> ((s, d) => bm25(Tables.documents(s, d))),
    "q_cooccur_topk" -> ((s, d) => cooccurTopk(Tables.documents(s, d))),
    "q_ppl_filter" -> ((s, d) => pplFilter(Tables.documents(s, d))),
    "q_epoch_plan" -> ((s, d) => epochPlan(Tables.documents(s, d))),
    "q_tfidf" -> ((s, d) => tfidf(Tables.documents(s, d))),
    "q_chunk_docs" -> ((s, d) => chunkDocs(Tables.documents(s, d))),
    "q_bigram_vocab" -> ((s, d) => bigramVocab(Tables.documents(s, d))),
    "q_unigram_lm" -> ((s, d) => unigramLm(Tables.documents(s, d))),
    "q_bigram_lm" -> ((s, d) => bigramLm(Tables.documents(s, d))),
    "q_mix_plan" -> ((s, d) => mixPlan(Tables.documents(s, d))),
    "q_mix_take" -> ((s, d) => mixTake(Tables.documents(s, d))),
    "q_feature_hashing" -> ((s, d) => featureHashing(Tables.documents(s, d))),
    "q_pmi_collocations" -> ((s, d) => pmiCollocations(Tables.documents(s, d))),
    "q_mix_temperature" -> ((s, d) => mixTemperature(Tables.documents(s, d))),
    "q_dsir_select" -> ((s, d) => dsirSelect(Tables.documents(s, d)))
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val oracles: Map[String, String] = Map(
    "q_source_kl" ->
      s"""WITH nr0 AS (SELECT source, $normSql AS norm FROM documents),
         w AS (SELECT source, unnest(string_split(norm, ' ')) AS word FROM nr0),
         h AS (SELECT source,
             ((instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16 +
               instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) % 64 AS bucket
           FROM w),
         bt AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM h GROUP BY 1, 2),
         spine AS (SELECT s.source, CAST(r.b AS INT) AS bucket
           FROM (SELECT DISTINCT source FROM documents) s,
             (SELECT UNNEST(range(64)) AS b) r),
         dense AS (SELECT spine.source, spine.bucket, COALESCE(bt.cnt, 0) AS cnt
           FROM spine LEFT JOIN bt ON spine.source = bt.source AND spine.bucket = bt.bucket),
         st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS nt FROM dense GROUP BY 1),
         cb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cc FROM dense GROUP BY 1),
         ctot AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc FROM cb),
         t AS (SELECT d.source, st.nt,
             ((CAST(d.cnt AS DOUBLE) + 1.0) / (CAST(st.nt AS DOUBLE) + 64.0)) AS p,
             ((CAST(cb.cc AS DOUBLE) + 1.0) / (CAST(ctot.nc AS DOUBLE) + 64.0)) AS q
           FROM dense d JOIN st ON d.source = st.source
             JOIN cb ON d.bucket = cb.bucket, ctot)
         SELECT source, MAX(nt) AS n_tokens,
           ${sqlR("CAST(SUM(CAST(p * ln(p / q) AS DECIMAL(20,12))) AS DOUBLE)", 6)} AS kl_vs_corpus
         FROM t GROUP BY 1 ORDER BY 1""",
    "q_zipf_fit" ->
      s"""WITH w AS (SELECT string_split($normSql, ' ') AS words FROM documents),
         tk AS (SELECT unnest(words) AS word FROM w),
         wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1),
         r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rnk FROM wc),
         p AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM r),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y * y AS DECIMAL(27,12))) AS DOUBLE) AS syy
           FROM p),
         b AS (SELECT *,
             (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS slope
           FROM s)
         SELECT CAST(n AS BIGINT) AS n_types,
           ${sqlR("slope", 6)} AS slope,
           ${sqlR("(sy - slope * sx) / n", 6)} AS intercept,
           ${sqlR("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)", 6)} AS r2_fit
         FROM b""",
    "q_vocab_prune" ->
      s"""WITH w AS (SELECT string_split($normSql, ' ') AS words FROM documents),
         tk AS (SELECT unnest(words) AS word FROM w),
         wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1),
         d AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nw,
             c * CAST(COUNT(*) AS BIGINT) AS toks FROM wc GROUP BY 1),
         cum AS (SELECT c,
             SUM(nw) OVER (ORDER BY c DESC) AS words_cum,
             SUM(toks) OVER (ORDER BY c DESC) AS toks_cum
           FROM d),
         t AS (SELECT SUM(toks) AS tot FROM d),
         tgt AS (SELECT UNNEST([50, 75, 90, 95, 99]) AS q100),
         pick AS (SELECT q100, MAX(c) AS min_count
           FROM cum, t, tgt WHERE 100 * toks_cum >= q100 * tot GROUP BY 1)
         SELECT CAST(p.q100 AS DOUBLE) / 100 AS target,
           p.min_count,
           CAST(cum.words_cum AS BIGINT) AS vocab_size,
           ${sqlR("CAST(cum.toks_cum AS DOUBLE) / t.tot", 6)} AS coverage,
           ${sqlR("1.0 - CAST(cum.toks_cum AS DOUBLE) / t.tot", 6)} AS oov_share
         FROM pick p JOIN cum ON cum.c = p.min_count, t
         ORDER BY target""",
    "q_bm25" ->
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
         tk AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, unnest(words) AS word FROM w),
         q AS (SELECT word FROM tk
           WHERE word NOT IN (${TextPrep.stopEnSql})
           GROUP BY word ORDER BY COUNT(*) DESC, word LIMIT 10),
         tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
           FROM tk WHERE word IN (SELECT word FROM q) GROUP BY 1, 2),
         dft AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(CAST(len(words) AS HUGEINT)) AS DOUBLE) AS sdl FROM w),
         sc AS (SELECT t.doc_id, t.dl,
             ${TextPrep.bm25ContribSql("t.tf", "d.df", "t.dl", "st.nn", "(st.sdl / st.nn)")} AS contrib
           FROM tf t JOIN dft d ON t.word = d.word, st)
         SELECT doc_id, CAST(MAX(dl) AS BIGINT) AS dl, CAST(COUNT(*) AS BIGINT) AS n_terms,
           ${sqlR("CAST(SUM(CAST(contrib AS DECIMAL(20,12))) AS DOUBLE)", 6)} AS bm25
         FROM sc GROUP BY 1 ORDER BY 1""",
    "q_cooccur_topk" ->
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS words FROM documents),
         t AS (SELECT doc_id, CAST(r.i AS INT) AS i, words[CAST(r.i AS INT) + 1] AS word
           FROM w, LATERAL (SELECT UNNEST(range(len(words))) AS i) r
           WHERE len(words) >= 2),
         p AS (SELECT least(t1.word, t2.word) AS a, greatest(t1.word, t2.word) AS b
           FROM t t1 JOIN t t2 ON t1.doc_id = t2.doc_id
             AND t2.i BETWEEN t1.i + 1 AND t1.i + 3
           WHERE t1.word <> t2.word)
         SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2
         ORDER BY n DESC, a, b LIMIT 50""",
    "q_pmi_collocations" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         uni AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT unnest(words) AS word FROM w) GROUP BY 1),
         ut AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
         bt AS (SELECT CAST(SUM(GREATEST(len(words) - 1, 0)) AS BIGINT) AS n_bi FROM w),
         ww AS (SELECT * FROM w WHERE len(words) >= 2),
         b AS (SELECT words[i] AS w1, words[i+1] AS w2
           FROM ww, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
         bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM b GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         sc AS (SELECT bc.w1, bc.w2, c12, u1.c AS c1, u2.c AS c2,
             ${sqlR("ln((CAST(c12 AS DOUBLE) / n_bi) / " +
                "((CAST(u1.c AS DOUBLE) / n_uni) * (CAST(u2.c AS DOUBLE) / n_uni))) / ln(2.0)", 6)} AS pmi
           FROM bc JOIN uni u1 ON bc.w1 = u1.word
                   JOIN uni u2 ON bc.w2 = u2.word, ut, bt),
         r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM sc)
         SELECT CAST(rank AS INT) AS rank, w1, w2, c12, c1, c2, pmi
         FROM r WHERE rank <= 40 ORDER BY rank""",
    "q_mix_temperature" -> {
      val pd = "CAST(avail_tokens AS DOUBLE)"
      val taus = Seq(
        "0.25" -> s"sqrt(sqrt($pd))", "0.5" -> s"sqrt($pd)",
        "0.75" -> s"sqrt($pd) * sqrt(sqrt($pd))", "1.0" -> pd)
      val pCols = taus.map { case (t, e) =>
        s"$e AS p_${(t.toDouble * 100).toInt}" }.mkString(", ")
      val zCols = taus.map { case (t, _) =>
        val tag = (t.toDouble * 100).toInt
        s"CAST(SUM(CAST(p_$tag AS DECIMAL(20,12))) AS DOUBLE) AS z_$tag" }.mkString(", ")
      val arms = taus.map { case (t, _) =>
        val tag = (t.toDouble * 100).toInt
        s"""SELECT source, CAST($t AS DOUBLE) AS tau, avail_tokens,
            p_$tag / z_$tag AS w0, n_total FROM p, z"""
      }.mkString(" UNION ALL ")
      s"""WITH n AS (SELECT source, $normSql AS norm FROM documents),
         w AS (SELECT source, CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tok FROM n),
         g AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS avail_tokens FROM w GROUP BY 1),
         p AS (SELECT source, avail_tokens, $pCols FROM g),
         z AS (SELECT $zCols, CAST(SUM(avail_tokens) AS BIGINT) AS n_total FROM p),
         e AS ($arms)
         SELECT source, tau, avail_tokens,
           ${sqlR("w0", 6)} AS weight,
           ${sqlR("w0 / (CAST(avail_tokens AS DOUBLE) / n_total)", 6)} AS upsample_factor
         FROM e ORDER BY source, tau"""
    },
    "q_feature_hashing" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
         h AS (SELECT doc_id, md5(word) AS hx FROM w),
         b AS (SELECT doc_id,
             ((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
               instr('0123456789abcdef', substr(hx, 2, 1)) - 1) % 64 AS bucket,
             CASE WHEN (instr('0123456789abcdef', substr(hx, 3, 1)) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
           FROM h),
         g AS (SELECT doc_id, bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(sgn) AS BIGINT) AS signed_cnt
           FROM b GROUP BY 1, 2),
         t AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tok FROM g)
         SELECT doc_id, CAST(bucket AS INT) AS bucket, cnt, signed_cnt,
           ${sqlR("CAST(cnt AS DOUBLE) / n_tok", 6)} AS tf
         FROM t ORDER BY doc_id, bucket""",
    "q_tfidf" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
         tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
         d AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df,
                  (SELECT COUNT(*) FROM documents) AS n_docs FROM tf),
         sc AS (SELECT doc_id, word, tf, df,
                  ${sqlR("tf * ln(CAST(n_docs AS DOUBLE) / df)", 6)} AS tfidf FROM d),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank FROM sc)
         SELECT doc_id, CAST(rank AS INT) AS rank, word, tf, df, tfidf
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "q_chunk_docs" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         c AS (SELECT doc_id, len(words) AS n, words, CAST(st AS BIGINT) AS start_word,
                  CAST(st // 48 AS INT) AS chunk_idx
               FROM w, UNNEST(generate_series(0, len(words) - 1, 48)) AS t(st))
         SELECT doc_id, chunk_idx, start_word,
           CAST(LEAST(64, n - start_word) AS BIGINT) AS n_words,
           md5(array_to_string(list_slice(words, start_word + 1, start_word + 64), ' ')) AS chunk_hash
         FROM c ORDER BY doc_id, chunk_idx""",
    "q_unigram_lm" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
         tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
         c AS (SELECT *, CAST(SUM(tf) OVER (PARTITION BY word) AS BIGINT) AS cw FROM tf),
         t AS (SELECT CAST(SUM(tf) AS BIGINT) AS t_tokens FROM tf),
         d AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                 SUM(CAST(tf * (ln(CAST(cw AS DOUBLE) / t_tokens) / ln(2)) AS DECIMAL(20,12))) AS nll0
               FROM c, t GROUP BY doc_id)
         SELECT doc_id, n_tokens,
           ${sqlR("(CAST(nll0 AS DOUBLE) * -1) / n_tokens", 6)} AS bits_per_token
         FROM d ORDER BY doc_id""",
    "q_bigram_lm" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         w2 AS (SELECT * FROM w WHERE len(words) >= 2),
         b AS (SELECT doc_id, words[i] || ' ' || words[i+1] AS bigram
               FROM w2, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
         tf AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS tf FROM b GROUP BY 1, 2),
         c AS (SELECT *, CAST(SUM(tf) OVER (PARTITION BY bigram) AS BIGINT) AS cb,
                 split_part(bigram, ' ', 1) AS w1
               FROM tf),
         c2 AS (SELECT *, CAST(SUM(tf) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c),
         d AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                 SUM(CAST(tf * (ln(CAST(cb AS DOUBLE) / c1) / ln(2)) AS DECIMAL(20,12))) AS nll0
               FROM c2 GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
           ${sqlR("(CAST(nll0 AS DOUBLE) * -1) / n_bigrams", 6)} AS bits_per_token
         FROM d ORDER BY doc_id""",
    "q_ppl_filter" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         w2 AS (SELECT * FROM w WHERE len(words) >= 2),
         b AS (SELECT doc_id, words[i] || ' ' || words[i+1] AS bigram
               FROM w2, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
         tf AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS tf FROM b GROUP BY 1, 2),
         c AS (SELECT *, CAST(SUM(tf) OVER (PARTITION BY bigram) AS BIGINT) AS cb,
                 split_part(bigram, ' ', 1) AS w1
               FROM tf),
         c2 AS (SELECT *, CAST(SUM(tf) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c),
         d AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                 SUM(CAST(tf * (ln(CAST(cb AS DOUBLE) / c1) / ln(2)) AS DECIMAL(20,12))) AS nll0
               FROM c2 GROUP BY doc_id),
         sc AS (SELECT doc_id, n_bigrams,
                 ${sqlR("(CAST(nll0 AS DOUBLE) * -1) / n_bigrams", 6)} AS bits_per_token
               FROM d),
         vc AS (SELECT bits_per_token AS v, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY 1),
         cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM vc),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc),
         ed AS (SELECT k, MIN(v) AS e
               FROM cm, nn, generate_series(1, 2) t(k)
               WHERE cum >= (k * n + 2) // 3
               GROUP BY k),
         er AS (SELECT MAX(CASE WHEN k = 1 THEN e END) AS e1,
                 MAX(CASE WHEN k = 2 THEN e END) AS e2 FROM ed)
         SELECT doc_id, n_bigrams, bits_per_token,
           CASE WHEN bits_per_token < e1 THEN 'head'
                WHEN bits_per_token < e2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CASE WHEN bits_per_token < e1 THEN 'head'
                WHEN bits_per_token < e2 THEN 'middle'
                ELSE 'tail' END <> 'tail' AS keep
         FROM sc, er ORDER BY doc_id""",
    "q_epoch_plan" ->
      s"""WITH n AS (SELECT source, $normSql AS norm FROM documents),
         w AS (SELECT source, len(string_split(norm, ' ')) AS n_tok FROM n),
         g AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS avail_tokens FROM w GROUP BY 1),
         k AS (SELECT CAST(SUM(CAST(sqrt(CAST(avail_tokens AS DOUBLE)) AS DECIMAL(20,12))) AS DOUBLE) AS z0,
                 CAST(SUM(avail_tokens) AS BIGINT) AS total FROM g),
         p AS (SELECT source, avail_tokens,
             sqrt(CAST(avail_tokens AS DOUBLE)) / z0 AS weight,
             sqrt(CAST(avail_tokens AS DOUBLE)) / z0 * CAST(total * 2 AS DOUBLE) AS target_tokens
           FROM g, k),
         p2 AS (SELECT *,
             target_tokens / avail_tokens AS epochs_uncapped,
             LEAST(4.0, target_tokens / avail_tokens) AS epochs
           FROM p),
         p3 AS (SELECT *,
             CAST(FLOOR(epochs * avail_tokens) AS BIGINT) AS take_tokens
           FROM p2),
         tt AS (SELECT CAST(SUM(take_tokens) AS BIGINT) AS take_total FROM p3)
         SELECT source, avail_tokens,
           ${sqlR("weight", 6)} AS weight,
           CAST(FLOOR(target_tokens) AS BIGINT) AS target_tokens,
           ${sqlR("epochs", 4)} AS epochs,
           epochs_uncapped > 4.0 AS capped,
           take_tokens,
           ${sqlR("CAST(take_tokens AS DOUBLE) / take_total", 6)} AS realized_share
         FROM p3, tt ORDER BY source""",
    "q_mix_plan" ->
      s"""WITH n AS (SELECT source, $normSql AS norm FROM documents),
         w AS (SELECT source, len(string_split(norm, ' ')) AS n_tok FROM n),
         g AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS avail_tokens FROM w GROUP BY 1),
         k AS (SELECT CAST(SUM(CAST(sqrt(CAST(avail_tokens AS DOUBLE)) AS DECIMAL(20,12))) AS DOUBLE) AS z0,
                 CAST(MIN(avail_tokens) AS BIGINT) AS min_avail FROM g)
         SELECT source, avail_tokens,
           ${sqlR("sqrt(CAST(avail_tokens AS DOUBLE)) / z0", 6)} AS weight,
           CAST(FLOOR(sqrt(CAST(avail_tokens AS DOUBLE)) * sqrt(CAST(min_avail AS DOUBLE))) AS BIGINT) AS take_tokens,
           ${sqlR("sqrt(CAST(min_avail AS DOUBLE)) / sqrt(CAST(avail_tokens AS DOUBLE))", 6)} AS sampling_rate
         FROM g, k ORDER BY source""",
    "q_mix_take" -> {
      def hv(i: Int) =
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
      s"""WITH n AS (SELECT doc_id, source, $normSql AS norm FROM documents),
         wt AS (SELECT doc_id, source,
             CAST(len(string_split(norm, ' ')) AS BIGINT) AS toks FROM n),
         g AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS avail_tokens FROM wt GROUP BY 1),
         k AS (SELECT CAST(MIN(avail_tokens) AS BIGINT) AS min_avail FROM g),
         rated AS (SELECT source,
             sqrt(CAST(min_avail AS DOUBLE)) / sqrt(CAST(avail_tokens AS DOUBLE)) AS rate
           FROM g, k),
         u AS (SELECT wt.*, rated.rate,
             (${hv(1)} * 4096 + ${hv(2)} * 256 + ${hv(3)} * 16 + ${hv(4)}) / 65536.0 AS u
           FROM wt JOIN rated USING (source))
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS avail_tokens,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS docs_taken,
           CAST(SUM(CASE WHEN u < rate THEN toks ELSE 0 END) AS BIGINT) AS tokens_taken,
           ${sqlR("MAX(rate)", 6)} AS target_rate,
           ${sqlR("CAST(SUM(CASE WHEN u < rate THEN toks ELSE 0 END) AS DOUBLE) / SUM(toks)", 6)} AS realized_rate
         FROM u GROUP BY source ORDER BY source"""
    },
    "q_bigram_vocab" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         w2 AS (SELECT * FROM w WHERE len(words) >= 2),
         b AS (SELECT words[i] || ' ' || words[i+1] AS bigram
               FROM w2, UNNEST(generate_series(1, len(words) - 1)) AS t(i)),
         c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
         r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rank FROM c),
         k AS (SELECT *, CAST(SUM(n) OVER (ORDER BY rank) AS BIGINT) AS cum_n
               FROM r WHERE rank <= 40)
         SELECT CAST(rank AS INT) AS rank, bigram, n,
           ${sqlR("CAST(n AS DOUBLE) / total", 6)} AS share,
           ${sqlR("CAST(cum_n AS DOUBLE) / total", 6)} AS cum_share
         FROM k, tot ORDER BY rank""",
    "q_dsir_select" ->
      s"""WITH nr0 AS (SELECT doc_id, source, $normSql AS norm FROM documents),
         w AS (SELECT doc_id, source, unnest(string_split(norm, ' ')) AS word FROM nr0),
         h AS (SELECT doc_id, source,
             ((instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16 +
               instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) % 64 AS bucket
           FROM w),
         mass AS (SELECT bucket,
             CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS cr
           FROM h GROUP BY 1),
         tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr FROM mass),
         lam AS (SELECT bucket,
             ln((ct + 1.0) / (nt + 64.0)) - ln((cr + 1.0) / (nr + 64.0)) AS lam
           FROM mass, tot),
         pd AS (SELECT doc_id, source, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM h WHERE source <> 'src0' GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS n_tok,
             ${sqlR("CAST(SUM(CAST(cnt * lam AS DECIMAL(20,12))) AS DOUBLE)", 6)} AS dsir_score
           FROM pd JOIN lam USING (bucket) GROUP BY 1, 2),
         vc AS (SELECT dsir_score AS v, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY 1),
         cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM vc),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc),
         er AS (SELECT MIN(v) AS edge FROM cm, nn
           WHERE cum >= n - CAST(FLOOR(0.25 * n) AS BIGINT) + 1)
         SELECT doc_id, source, n_tok, dsir_score,
           COALESCE(dsir_score >= edge, FALSE) AS selected
         FROM sc, er ORDER BY doc_id"""
  )
}
