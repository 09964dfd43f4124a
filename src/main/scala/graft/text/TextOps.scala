package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All per-document column
  * expressions — embarrassingly parallel, no shuffles at all (the
  * fingerprint min/max shingle agg is the one exception: a single
  * groupBy doc_id combine).
  */
object TextOps {

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "les", "des", "et", "du", "une"))

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("(", ", ", ")")

  /** Adds s_en/s_es/s_de/s_fr stopword-hit counts and predicted_lang to
    * a withWords frame. Pure column expressions. */
  private[graft] def withLangScores(d0: DataFrame): DataFrame =
    d0.withColumn("s_en", expr(s"size(filter(words, w -> w IN ${inList(stop("en"))}))"))
      .withColumn("s_es", expr(s"size(filter(words, w -> w IN ${inList(stop("es"))}))"))
      .withColumn("s_de", expr(s"size(filter(words, w -> w IN ${inList(stop("de"))}))"))
      .withColumn("s_fr", expr(s"size(filter(words, w -> w IN ${inList(stop("fr"))}))"))
      .withColumn("predicted_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))

  /** Stopword-hit language ID heuristic (n-gram-free variant suited to
    * whitespace-tokenized corpora). Deterministic priority on ties. */
  def langId(documents: DataFrame): DataFrame =
    withLangScores(TextPrep.withWords(documents)).select(
      col("doc_id"), col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
      col("predicted_lang"), col("lang").as("labeled_lang"))
      .withColumn("is_match", col("predicted_lang") === col("labeled_lang"))
      .orderBy("doc_id")

  /** Adds the quality signal + score + tier columns to a withWords frame.
    * Pure column expressions. */
  // try_divide throughout: an EMPTY document (text = '', zero words) has
  // length/word-count divisors of 0 — ANSI `/` would abort the whole
  // query where the DuckDB oracle yields NULL for that row; try_divide
  // IS DuckDB's division-by-zero semantics and is bit-identical on every
  // non-empty doc. Empty docs are in-contract (lengthHistogram bins them).
  private[graft] def withQualitySignals(d0: DataFrame): DataFrame =
    d0.withColumn("n_chars_raw", length(col("text")))
      .withColumn("n_words", size(col("words")))
      .withColumn("avg_word_len",
        r4(try_divide(length(col("norm")) - (col("n_words") - 1), col("n_words"))))
      .withColumn("punct_ratio",
        r4(try_divide(length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")), length(col("text")))))
      .withColumn("stop_ratio",
        r4(try_divide(expr(s"size(filter(words, w -> w IN ${inList(stop("en"))}))"), col("n_words"))))
      .withColumn("digit_ratio",
        r4(try_divide(length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")), length(col("text")))))
      .withColumn("quality_score", r4(
        lit(0.4) * col("stop_ratio") +
          lit(0.3) * (lit(1.0) - col("punct_ratio")) +
          lit(0.3) * least(col("n_words") / 100d, lit(1.0))))
      .withColumn("quality_tier",
        when(col("quality_score") >= 0.7, "HIGH")
          .when(col("quality_score") >= 0.4, "MEDIUM")
          .otherwise("LOW"))

  /** Quality scoring: length/stopword/punctuation signals combined into a
    * [0,1] score with tier bucketing (README "99% data quality score";
    * quality filters are the first stage of any LLM data pipeline). */
  def quality(documents: DataFrame): DataFrame =
    withQualitySignals(TextPrep.withWords(documents))
      .select("doc_id", "n_chars_raw", "n_words", "avg_word_len", "punct_ratio",
        "stop_ratio", "digit_ratio", "quality_score", "quality_tier")
      .orderBy("doc_id")

  /** End-to-end corpus curation — the composition every LLM data
    * pipeline runs before training: language gate + quality threshold +
    * exact-dedup canonical-only, each doc tagged keep/drop with the
    * first failing reason. Fused into ONE pass over the corpus (quality
    * and language are row-wise expressions; the dedup canonical window
    * on the content hash is the single shuffle). */
  def curate(documents: DataFrame, minQuality: Double = 0.4,
             keepLang: String = "en"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("norm_hash"))
    withLangScores(withQualitySignals(TextPrep.withWords(documents)))
      .withColumn("norm_hash", md5(col("norm").cast("binary")))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
      .withColumn("keep", !col("is_duplicate") &&
        col("quality_score") >= minQuality && col("predicted_lang") === keepLang)
      .withColumn("drop_reason",
        when(col("is_duplicate"), "duplicate")
          .when(col("quality_score") < minQuality, "low_quality")
          .when(col("predicted_lang") =!= keepLang, "non_english")
          .otherwise("kept"))
      .select("doc_id", "predicted_lang", "quality_score", "quality_tier",
        "canonical_id", "is_duplicate", "keep", "drop_reason")
      .orderBy("doc_id")
  }

  /** Corpus report card — the per-(source, language) datasheet a corpus
    * release ships with: document/token volume, quality-score average
    * and tier mix, and the curation funnel (kept / duplicate /
    * low-quality / wrong-language) from the same fused signal pass
    * [[curate]] runs. One row-wise scan + the canonical-dedup window +
    * one bounded groupBy. */
  def corpusReport(documents: DataFrame, minQuality: Double = 0.4,
                   keepLang: String = "en"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("norm_hash"))
    withLangScores(withQualitySignals(TextPrep.withWords(documents)))
      .withColumn("norm_hash", md5(col("norm").cast("binary")))
      .withColumn("is_dup", col("doc_id") =!= min(col("doc_id")).over(w))
      .withColumn("keep", !col("is_dup") &&
        col("quality_score") >= minQuality && col("predicted_lang") === keepLang)
      .groupBy(col("source"), col("predicted_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        r4(sum(col("quality_score").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_quality"),
        sum(when(col("quality_tier") === "HIGH", 1L).otherwise(0L)).as("n_high_tier"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_duplicates"),
        sum(when(!col("is_dup") && col("quality_score") < minQuality, 1L)
          .otherwise(0L)).as("n_low_quality"))
      .withColumn("keep_rate", r6(col("n_kept") / col("n_docs")))
      .orderBy("source", "predicted_lang")
  }

  /** Adds the Gopher signal + pass-flag columns (Rae et al. 2021,
    * arXiv:2112.11446, table A1 — the published rule set most
    * pretraining pipelines start from) to a withWords frame: word count
    * in [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    * (# and …) ≤ 0.1, ≥ 80% of words contain an alphabetic character,
    * ≥ 2 stopword hits. All row-local column expressions over one
    * tokenized pass — shuffle-free at any corpus size; thresholds
    * compare identically-rounded doubles in both engines, so no gate
    * sits on a float boundary. Shared by [[gopherGates]] and the fused
    * [[gateFunnel]]. */
  private[graft] def withGopherSignals(d0: DataFrame): DataFrame =
    d0.withColumn("n_words", size(col("words")))
      .withColumn("mean_word_len",
        r4((length(col("norm")) - (col("n_words") - 1)) / col("n_words")))
      .withColumn("n_symbols",
        ((length(col("text")) - length(expr("replace(text, '#', '')"))) +
          (length(col("text")) - length(expr("replace(text, '...', '')"))) / lit(3))
          .cast("long"))
      .withColumn("symbol_ratio", r4(col("n_symbols") / col("n_words")))
      .withColumn("n_alpha_words", expr("size(filter(words, w -> w rlike '[a-z]'))"))
      .withColumn("alpha_frac", r4(col("n_alpha_words") / col("n_words")))
      .withColumn("n_stop",
        expr(s"size(filter(words, w -> w IN ${inList(stop("en"))}))"))
      .withColumn("pass_word_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("pass_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("pass_alpha", col("alpha_frac") >= 0.8)
      .withColumn("pass_stop", col("n_stop") >= 2)
      .withColumn("keep",
        col("pass_word_count") && col("pass_word_len") && col("pass_symbol") &&
          col("pass_alpha") && col("pass_stop"))

  /** Gopher-style quality gates as a per-doc audit mart — each rule its
    * own flag so the funnel is auditable (see [[withGopherSignals]]). */
  def gopherGates(documents: DataFrame): DataFrame =
    withGopherSignals(TextPrep.withWords(documents))
      .select("doc_id", "n_words", "mean_word_len", "n_symbols", "symbol_ratio",
        "n_alpha_words", "alpha_frac", "n_stop", "pass_word_count",
        "pass_word_len", "pass_symbol", "pass_alpha", "pass_stop", "keep")
      .orderBy("doc_id")

  /** Token counting: whitespace tokens, BPE-ish regex tokens
    * (letter-runs | digit-runs | other), and the chars/4 estimate. */
  def tokenCount(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_chars", length(col("text")))
      .withColumn("ws_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("re_tokens", regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
      .withColumn("est_bpe_tokens", ceil(col("n_chars") / 4d).cast("long"))
      .select("doc_id", "n_chars", "ws_tokens", "re_tokens", "est_bpe_tokens")
      .orderBy("doc_id")

  /** Document fingerprint: whole-content md5 + winnowing-style min/max
    * shingle hashes (sketch of the shingle set; equal min+max is a cheap
    * near-dup pre-filter). */
  def fingerprint(documents: DataFrame): DataFrame = {
    val content = TextPrep.withWords(documents)
      .select(col("doc_id"), md5(col("norm").cast("binary")).as("content_md5"))
    val sketch = TextPrep.shingles(documents)
      .withColumn("sh", md5(col("shingle").cast("binary")))
      .groupBy("doc_id")
      .agg(min(col("sh")).as("min_shingle_hash"),
        max(col("sh")).as("max_shingle_hash"),
        count(lit(1)).as("n_shingles"))
    content.join(sketch, Seq("doc_id"), "left").orderBy("doc_id")
  }

  /** Character-level Shannon entropy gate — the standard cheap
    * gibberish/boilerplate detector (low entropy = repeated characters /
    * template text; natural English sits near 2.8-3.0 nats/char at the
    * character level). Flags docs below `minEntropy` nats.
    *
    * Scale shape: per-(doc, char) counts partial-aggregate on the
    * exploded char stream (state bounded by alphabet size per doc); the
    * per-doc total is a window over that ALREADY-bucketed frame (≤
    * |alphabet| rows per doc — no second pass over characters). Entropy
    * terms are row-local doubles routed through the DECIMAL(20,12) sum
    * (partition-order-independent, the psiDrift device), r6 for oracle
    * parity. The keep/drop flag derives from the ROUNDED value so both
    * engines gate identically at the threshold. */
  def charEntropy(documents: DataFrame, minEntropy: Double = 2.0): DataFrame = {
    val counts = documents
      .withColumn("norm", normText(col("text")))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"), explode(split(col("norm"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val wD = Window.partitionBy(col("doc_id"))
    counts
      .withColumn("n", sum(col("c")).over(wD))
      .withColumn("term",
        (col("c").cast("double") / col("n")) * log(col("c").cast("double") / col("n")))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars_norm"),
        count(lit(1)).as("n_distinct_chars"),
        (-sum(col("term").cast("decimal(20,12)")).cast("double")).as("ent0"))
      .select(col("doc_id"), col("n_chars_norm"), col("n_distinct_chars"),
        r6(col("ent0")).as("entropy"),
        (r6(col("ent0")) < minEntropy).as("low_entropy"))
      .orderBy("doc_id")
  }

  /** The ROW-LOCAL char-entropy fold over a `chars` array column — the
    * shared device of [[graft.streaming.ScoreStream.entropyGate]] (which
    * must not shuffle) and the [[gateFunnel]] (which wants all gates in
    * one pass). Exact-decimal term casts make it bit-equal to the batch
    * [[charEntropy]] groupBy form: decimal addition is associative and
    * commutative, so first-occurrence fold order vs shuffle order is
    * immaterial. O(len × |alphabet|) per row — the documented trade for
    * shuffle-freedom. Returns the DECIMAL(20,12) negated-entropy sum. */
  private[graft] def entropyFold(charsCol: String): org.apache.spark.sql.Column = expr(
    s"""aggregate(array_distinct($charsCol), cast(0 as decimal(20, 12)),
       |  (acc, c) -> cast(acc + cast(
       |    (cast(size(filter($charsCol, x -> x = c)) as double) / size($charsCol))
       |      * ln(cast(size(filter($charsCol, x -> x = c)) as double) / size($charsCol))
       |    as decimal(20, 12)) as decimal(20, 12)))""".stripMargin)

  /** Language-ID confusion matrix with per-cell label/prediction mass —
    * the classifier-eval mart over [[langId]] at corpus scale: one row
    * per (labeled, predicted) pair, its count, the label row total and
    * prediction column total, and the recall/precision shares those
    * imply (the diagonal rows ARE per-language recall and precision).
    * Scale shape: one row-local scoring pass, one |langs|²-bounded
    * aggregate, windows only over that bounded frame. */
  def langConfusion(documents: DataFrame): DataFrame = {
    val cm = withLangScores(TextPrep.withWords(documents))
      .groupBy(col("lang").as("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    val wP = Window.partitionBy(col("predicted_lang"))
    val wL = Window.partitionBy(col("labeled_lang"))
    cm.withColumn("n_labeled", sum(col("n")).over(wL))
      .withColumn("n_predicted", sum(col("n")).over(wP))
      .select(col("labeled_lang"), col("predicted_lang"), col("n"),
        col("n_labeled"), col("n_predicted"),
        r6(col("n") / col("n_labeled")).as("recall_share"),
        r6(col("n") / col("n_predicted")).as("precision_share"))
      .orderBy("labeled_lang", "predicted_lang")
  }

  /** The curation FUNNEL report — sequential attrition through the
    * pipeline's gates (Gopher rules → English → char entropy →
    * quality score), one row per stage with survivor count and the
    * share of total / of the previous stage. The number a pipeline
    * owner actually reads before a training run: where the corpus is
    * lost. ALL gates evaluate in ONE fused row-local pass (the entropy
    * gate uses the row-local [[entropyFold]] device, spec-proven
    * bit-equal to the batch form), so the whole funnel costs one scan
    * and one 1-row aggregate regardless of gate count. */
  def gateFunnel(documents: DataFrame, minQuality: Double = 0.4): DataFrame = {
    val flags = withLangScores(withQualitySignals(withGopherSignals(
        TextPrep.withWords(documents))))
      .withColumn("chars", split(col("norm"), ""))
      .withColumn("entropy",
        when(length(col("norm")) > 0, r6((-entropyFold("chars")).cast("double"))))
      .withColumn("g1", col("keep"))
      .withColumn("g2", col("g1") && col("predicted_lang") === "en")
      .withColumn("g3", coalesce(col("g2") && col("entropy") >= 2.0, lit(false)))
      .withColumn("g4", col("g3") && col("quality_score") >= minQuality)
    def n(c: String) = sum(when(col(c), 1L).otherwise(0L))
    val agg = flags.agg(count(lit(1)).as("n0"),
      n("g1").as("n1"), n("g2").as("n2"), n("g3").as("n3"), n("g4").as("n4"))
    def st(i: Int, gate: String, nc: String, pc: String) =
      struct(lit(i).as("stage"), lit(gate).as("gate"), col(nc).as("n_docs"),
        col(pc).as("n_prev"), col("n0").as("n_total"))
    agg.select(explode(array(
        st(0, "total", "n0", "n0"),
        st(1, "gopher_rules", "n1", "n0"),
        st(2, "english", "n2", "n1"),
        st(3, "char_entropy", "n3", "n2"),
        st(4, "quality_score", "n4", "n3"))).as("s"))
      .select(col("s.stage").as("stage"), col("s.gate").as("gate"),
        col("s.n_docs").as("n_docs"),
        // try_divide on both: an EMPTY corpus has n_total = 0, and ANSI
        // `/` would abort the report instead of yielding NULL shares
        r6(try_divide(col("s.n_docs"), col("s.n_total"))).as("share_total"),
        r6(try_divide(col("s.n_docs"), col("s.n_prev"))).as("share_prev"))
      .orderBy("stage")
  }

  /** Flesch reading-ease features (Flesch 1948 — the readability signal
    * curation pipelines keep alongside the quality score): sentences as
    * terminal-punctuation runs, syllables as vowel GROUPS per word (the
    * standard cheap heuristic), words from the shared tokenizer. Score
    * + grade bucket from the ROUNDED value so both engines bucket
    * identically. Pure row-local expressions — shuffle-free at any
    * corpus size; the floors (≥1 sentence/syllable) keep degenerate
    * docs defined instead of dividing by zero. */
  def readability(documents: DataFrame): DataFrame =
    // NULL text would make n_words = size(NULL) = -1 and score the doc
    // flesch ≈ 292 / 'easy' where the oracle's len(NULL) propagates
    // NULL — drop it up front, mirrored in the oracle (same hardening
    // class as linreg/shardPlan, commit 80e9ea4)
    TextPrep.withWords(documents.filter(col("text").isNotNull))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_sentences",
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)))
      .withColumn("n_syllables",
        greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1)))
      .withColumn("flesch", r4(lit(206.835)
        - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
        - lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))))
      .withColumn("grade",
        when(col("flesch") >= 70.0, "easy")
          .when(col("flesch") >= 50.0, "standard")
          .otherwise("difficult"))
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "grade")
      .orderBy("doc_id")

  /** Two-phase training-data SCHEDULE — the annealing plan modern
    * pretraining runs end on (a final ~10% of tokens drawn from the
    * highest-quality slice; e.g. MiniCPM / Llama-3 style "anneal" or
    * "midtraining" phases): per source, the full-corpus pretrain token
    * mass plus an anneal allocation proportional to that source's
    * TOP-QUARTILE-quality token mass, capped at what it actually has.
    * Eligibility is data-adaptive (score ≥ the corpus p75 via the
    * PrefixSum exact-percentile device, a 1-row broadcast) rather than
    * the fixed HIGH tier — a corpus whose scores all sit in one tier
    * still gets a real anneal slice. Composes [[quality]]'s row-wise
    * score pass with the mixture-budget arithmetic of
    * [[graft.text.Vocab.mixPlan]]; all artifacts past the one
    * per-source aggregate are 1-row broadcasts. NULL text is excluded
    * up front (mirrored in the oracle). */
  def annealPlan(documents: DataFrame, annealFrac: Double = 0.1): DataFrame = {
    val scored = withQualitySignals(
        TextPrep.withWords(documents.filter(col("text").isNotNull)))
      .select(col("source"), col("n_words").cast("long").as("toks"),
        col("quality_score"))
    val thr = graft.functions.PrefixSum.exactPercentiles(
        scored.select(col("quality_score").as("qs")), "qs", Nil,
        Seq("p75_0" -> 0.75)).drop("pct_n")
      .select(r6(col("p75_0")).as("q_p75"))
    val d = scored.crossJoin(broadcast(thr))
    val bySrc = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("total_tokens"),
      sum(when(col("quality_score") >= col("q_p75"), col("toks")).otherwise(0L))
        .as("high_tokens"),
      max(col("q_p75")).as("q_p75"))
    val consts = bySrc.agg(
      sum(col("total_tokens")).as("corpus_tokens"),
      sum(col("high_tokens")).as("high_total"))
    bySrc.crossJoin(broadcast(consts))
      .withColumn("anneal_budget",
        floor(col("corpus_tokens").cast("double") * lit(annealFrac)).cast("long"))
      .withColumn("anneal_take",
        when(col("high_total") > 0,
          least(col("high_tokens"),
            floor(col("anneal_budget").cast("double") * col("high_tokens") /
              col("high_total")).cast("long")))
          .otherwise(lit(0L)))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("high_tokens").as("top_q_tokens"), col("q_p75"),
        col("anneal_budget"), col("anneal_take"),
        r6(try_divide(col("anneal_take").cast("double"), col("anneal_budget")))
          .as("anneal_share"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_anneal_plan" -> ((s, d) => annealPlan(Tables.documents(s, d))),
    "q_readability" -> ((s, d) => readability(Tables.documents(s, d))),
    "q_lang_confusion" -> ((s, d) => langConfusion(Tables.documents(s, d))),
    "q_gate_funnel" -> ((s, d) => gateFunnel(Tables.documents(s, d))),
    "q_char_entropy" -> ((s, d) => charEntropy(Tables.documents(s, d))),
    "q_lang_id" -> ((s, d) => langId(Tables.documents(s, d))),
    "q_text_quality" -> ((s, d) => quality(Tables.documents(s, d))),
    "q_token_count" -> ((s, d) => tokenCount(Tables.documents(s, d))),
    "q_fingerprint" -> ((s, d) => fingerprint(Tables.documents(s, d))),
    "q_corpus_curate" -> ((s, d) => curate(Tables.documents(s, d))),
    "q_corpus_report" -> ((s, d) => corpusReport(Tables.documents(s, d))),
    "q_gopher_gates" -> ((s, d) => gopherGates(Tables.documents(s, d)))
  )

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private def hits(lang: String): String =
    s"len(list_filter(words, w -> w IN ${inList(stop(lang))}))"

  val oracles: Map[String, String] = Map(
    // The q_text_quality score chain (r4-rounded signals feeding the
    // r4-rounded score) carried with source, aggregated to the
    // per-source schedule; the budget arithmetic repeats the identical
    // double expression tree on both engines.
    "q_anneal_plan" ->
      s"""WITH w AS (SELECT doc_id, source, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
         sig AS (SELECT source, CAST(len(words) AS BIGINT) AS toks,
             FLOOR((0.4 * (FLOOR((CAST(${hits("en")} AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000)
               + 0.3 * (1.0 - (FLOOR((CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000))
               + 0.3 * LEAST(CAST(len(words) AS DOUBLE) / 100, 1.0)) * 10000 + 0.5) / 10000 AS q
           FROM w),
         thr AS (SELECT ${sqlR("quantile_cont(q, 0.75)", 6)} AS q_p75 FROM sig),
         s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN q >= q_p75 THEN toks ELSE 0 END) AS BIGINT) AS top_q_tokens,
             MAX(q_p75) AS q_p75
           FROM sig, thr GROUP BY 1),
         c AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus_tokens,
             CAST(SUM(top_q_tokens) AS BIGINT) AS high_total FROM s),
         p AS (SELECT s.*,
             CAST(FLOOR(CAST(corpus_tokens AS DOUBLE) * CAST(0.1 AS DOUBLE)) AS BIGINT) AS anneal_budget,
             high_total
           FROM s, c),
         t AS (SELECT *, CASE WHEN high_total > 0
               THEN LEAST(top_q_tokens,
                 CAST(FLOOR(CAST(anneal_budget AS DOUBLE) * top_q_tokens / high_total) AS BIGINT))
               ELSE 0 END AS anneal_take
           FROM p)
         SELECT source, n_docs, total_tokens, top_q_tokens, q_p75, anneal_budget, anneal_take,
           ${sqlR("CAST(anneal_take AS DOUBLE) / anneal_budget", 6)} AS anneal_share
         FROM t ORDER BY source""",
    "q_readability" ->
      s"""WITH w AS (SELECT doc_id, text, string_split($normSql, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
         d AS (SELECT doc_id,
             CAST(len(words) AS INT) AS n_words,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT) AS n_sentences,
             CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS INT) AS n_syllables
           FROM w),
         f AS (SELECT *,
             ${sqlR("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)", 4)} AS flesch
           FROM d)
         SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
           CASE WHEN flesch >= 70.0 THEN 'easy'
                WHEN flesch >= 50.0 THEN 'standard'
                ELSE 'difficult' END AS grade
         FROM f ORDER BY doc_id""",
    "q_lang_confusion" ->
      s"""WITH w AS (SELECT doc_id, lang, string_split($normSql, ' ') AS words FROM documents),
         sc AS (SELECT doc_id, lang,
             CAST(${hits("en")} AS INT) s_en, CAST(${hits("es")} AS INT) s_es,
             CAST(${hits("de")} AS INT) s_de, CAST(${hits("fr")} AS INT) s_fr
           FROM w),
         pr AS (SELECT lang AS labeled_lang,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS predicted_lang
           FROM sc),
         cm AS (SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM pr GROUP BY 1, 2)
         SELECT labeled_lang, predicted_lang, n,
           CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT) AS n_labeled,
           CAST(SUM(n) OVER (PARTITION BY predicted_lang) AS BIGINT) AS n_predicted,
           ${sqlR("CAST(n AS DOUBLE) / (SUM(n) OVER (PARTITION BY labeled_lang))", 6)} AS recall_share,
           ${sqlR("CAST(n AS DOUBLE) / (SUM(n) OVER (PARTITION BY predicted_lang))", 6)} AS precision_share
         FROM cm ORDER BY labeled_lang, predicted_lang""",
    "q_gate_funnel" ->
      s"""WITH w AS (SELECT doc_id, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents),
         d AS (SELECT doc_id, norm,
             CAST(len(words) AS INT) AS n_words,
             FLOOR((CAST(length(norm) - (len(words) - 1) AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS mean_word_len,
             CAST((length(text) - length(replace(text, '#', ''))) +
                  (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_symbols,
             CAST(len(list_filter(words, w2 -> regexp_matches(w2, '[a-z]'))) AS INT) AS n_alpha_words,
             CAST(${hits("en")} AS INT) AS n_stop,
             FLOOR((CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000 AS punct_ratio,
             FLOOR((CAST(${hits("en")} AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS stop_ratio,
             CAST(${hits("es")} AS INT) AS s_es, CAST(${hits("de")} AS INT) AS s_de,
             CAST(${hits("fr")} AS INT) AS s_fr
           FROM w),
         ch AS (SELECT doc_id, substr(norm, CAST(r.i AS INT) + 1, 1) AS ch
           FROM (SELECT doc_id, norm FROM w) nm,
             LATERAL (SELECT UNNEST(range(len(norm))) AS i) r
           WHERE len(norm) > 0),
         cc AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
         ct AS (SELECT doc_id, c,
             (CAST(c AS DOUBLE) / (SUM(c) OVER (PARTITION BY doc_id)))
               * ln(CAST(c AS DOUBLE) / (SUM(c) OVER (PARTITION BY doc_id))) AS term
           FROM cc),
         en AS (SELECT doc_id,
             ${sqlR("-(CAST(SUM(CAST(term AS DECIMAL(20,12))) AS DOUBLE))", 6)} AS entropy
           FROM ct GROUP BY 1),
         fl AS (SELECT d.doc_id,
             (d.n_words >= 50 AND d.n_words <= 100000
               AND d.mean_word_len >= 3.0 AND d.mean_word_len <= 10.0
               AND FLOOR((CAST(d.n_symbols AS DOUBLE) / d.n_words) * 10000 + 0.5) / 10000 <= 0.1
               AND FLOOR((CAST(d.n_alpha_words AS DOUBLE) / d.n_words) * 10000 + 0.5) / 10000 >= 0.8
               AND d.n_stop >= 2) AS g1,
             (CASE WHEN d.n_stop >= d.s_es AND d.n_stop >= d.s_de AND d.n_stop >= d.s_fr THEN 'en'
                   WHEN d.s_es >= d.s_de AND d.s_es >= d.s_fr THEN 'es'
                   WHEN d.s_de >= d.s_fr THEN 'de'
                   ELSE 'fr' END) = 'en' AS is_en,
             en.entropy,
             FLOOR((0.4 * d.stop_ratio + 0.3 * (1.0 - d.punct_ratio)
               + 0.3 * LEAST(CAST(d.n_words AS DOUBLE) / 100, 1.0)) * 10000 + 0.5) / 10000 AS quality_score
           FROM d LEFT JOIN en ON d.doc_id = en.doc_id),
         fg AS (SELECT doc_id, g1,
             g1 AND is_en AS g2,
             COALESCE(g1 AND is_en AND entropy >= 2.0, FALSE) AS g3,
             COALESCE(g1 AND is_en AND entropy >= 2.0, FALSE) AND quality_score >= 0.4 AS g4
           FROM fl),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
           FROM fg)
         SELECT stage, gate, n_docs,
           ${sqlR("CAST(n_docs AS DOUBLE) / n_total", 6)} AS share_total,
           CASE WHEN n_prev = 0 THEN NULL
                ELSE ${sqlR("CAST(n_docs AS DOUBLE) / n_prev", 6)} END AS share_prev
         FROM (
           SELECT 0 AS stage, 'total' AS gate, n0 AS n_docs, n0 AS n_prev, n0 AS n_total FROM agg
           UNION ALL SELECT 1, 'gopher_rules', n1, n0, n0 FROM agg
           UNION ALL SELECT 2, 'english', n2, n1, n0 FROM agg
           UNION ALL SELECT 3, 'char_entropy', n3, n2, n0 FROM agg
           UNION ALL SELECT 4, 'quality_score', n4, n3, n0 FROM agg)
         ORDER BY stage""",
    "q_char_entropy" ->
      s"""WITH nm AS (SELECT doc_id, $normSql AS norm FROM documents),
         ch AS (SELECT doc_id, substr(norm, CAST(r.i AS INT) + 1, 1) AS ch
           FROM nm, LATERAL (SELECT UNNEST(range(len(norm))) AS i) r
           WHERE len(norm) > 0),
         c AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
         t AS (SELECT doc_id, c,
             SUM(c) OVER (PARTITION BY doc_id) AS n,
             (CAST(c AS DOUBLE) / (SUM(c) OVER (PARTITION BY doc_id)))
               * ln(CAST(c AS DOUBLE) / (SUM(c) OVER (PARTITION BY doc_id))) AS term
           FROM c),
         e AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_chars_norm,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
             -(CAST(SUM(CAST(term AS DECIMAL(20,12))) AS DOUBLE)) AS ent0
           FROM t GROUP BY 1)
         SELECT doc_id, n_chars_norm, n_distinct_chars,
           ${sqlR("ent0", 6)} AS entropy,
           ${sqlR("ent0", 6)} < 2.0 AS low_entropy
         FROM e ORDER BY doc_id""",
    "q_lang_id" ->
      s"""WITH w AS (SELECT doc_id, lang, string_split($normSql, ' ') AS words FROM documents),
         sc AS (SELECT doc_id, lang,
             CAST(${hits("en")} AS INT) s_en, CAST(${hits("es")} AS INT) s_es,
             CAST(${hits("de")} AS INT) s_de, CAST(${hits("fr")} AS INT) s_fr
           FROM w)
         SELECT doc_id, s_en, s_es, s_de, s_fr,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang,
           lang AS labeled_lang,
           (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END) = lang AS is_match
         FROM sc ORDER BY doc_id""",
    "q_gopher_gates" ->
      s"""WITH w AS (SELECT doc_id, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents),
         d AS (SELECT doc_id,
             CAST(len(words) AS INT) AS n_words,
             FLOOR((CAST(length(norm) - (len(words) - 1) AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS mean_word_len,
             CAST((length(text) - length(replace(text, '#', ''))) +
                  (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_symbols,
             CAST(len(list_filter(words, w2 -> regexp_matches(w2, '[a-z]'))) AS INT) AS n_alpha_words,
             CAST(${hits("en")} AS INT) AS n_stop
           FROM w),
         g AS (SELECT doc_id, n_words, mean_word_len, n_symbols,
             ${sqlR("CAST(n_symbols AS DOUBLE) / n_words", 4)} AS symbol_ratio,
             n_alpha_words,
             ${sqlR("CAST(n_alpha_words AS DOUBLE) / n_words", 4)} AS alpha_frac,
             n_stop
           FROM d)
         SELECT doc_id, n_words, mean_word_len, n_symbols, symbol_ratio,
           n_alpha_words, alpha_frac, n_stop,
           n_words >= 50 AND n_words <= 100000 AS pass_word_count,
           mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS pass_word_len,
           symbol_ratio <= 0.1 AS pass_symbol,
           alpha_frac >= 0.8 AS pass_alpha,
           n_stop >= 2 AS pass_stop,
           (n_words >= 50 AND n_words <= 100000)
             AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
             AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND n_stop >= 2 AS keep
         FROM g ORDER BY doc_id""",
    "q_text_quality" ->
      s"""WITH w AS (SELECT doc_id, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents),
         d AS (SELECT doc_id,
             CAST(length(text) AS INT) AS n_chars_raw,
             CAST(len(words) AS INT) AS n_words,
             FLOOR((CAST(length(norm) - (len(words) - 1) AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS avg_word_len,
             FLOOR((CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000 AS punct_ratio,
             FLOOR((CAST(${hits("en")} AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS stop_ratio,
             FLOOR((CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000 AS digit_ratio
           FROM w)
         SELECT *,
           CASE WHEN quality_score >= 0.7 THEN 'HIGH'
                WHEN quality_score >= 0.4 THEN 'MEDIUM'
                ELSE 'LOW' END AS quality_tier
         FROM (SELECT *,
             FLOOR((0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio)
               + 0.3 * LEAST(CAST(n_words AS DOUBLE) / 100, 1.0)) * 10000 + 0.5) / 10000 AS quality_score
           FROM d)
         ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens,
         CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q_corpus_curate" ->
      s"""WITH w AS (SELECT doc_id, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents),
         d AS (SELECT doc_id, norm,
             CAST(len(words) AS INT) n_words,
             FLOOR((CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000 AS punct_ratio,
             FLOOR((CAST(${hits("en")} AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS stop_ratio,
             CAST(${hits("en")} AS INT) s_en, CAST(${hits("es")} AS INT) s_es,
             CAST(${hits("de")} AS INT) s_de, CAST(${hits("fr")} AS INT) s_fr
           FROM w),
         q AS (SELECT *,
             FLOOR((0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio)
               + 0.3 * LEAST(CAST(n_words AS DOUBLE) / 100, 1.0)) * 10000 + 0.5) / 10000 AS quality_score,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS predicted_lang
           FROM d),
         t AS (SELECT *,
             CASE WHEN quality_score >= 0.7 THEN 'HIGH'
                  WHEN quality_score >= 0.4 THEN 'MEDIUM'
                  ELSE 'LOW' END AS quality_tier,
             MIN(doc_id) OVER (PARTITION BY md5(norm)) AS canonical_id
           FROM q)
         SELECT doc_id, predicted_lang, quality_score, quality_tier, canonical_id,
           doc_id <> canonical_id AS is_duplicate,
           (NOT (doc_id <> canonical_id)) AND quality_score >= 0.4 AND predicted_lang = 'en' AS keep,
           CASE WHEN doc_id <> canonical_id THEN 'duplicate'
                WHEN quality_score < 0.4 THEN 'low_quality'
                WHEN predicted_lang <> 'en' THEN 'non_english'
                ELSE 'kept' END AS drop_reason
         FROM t ORDER BY doc_id""",
    "q_corpus_report" ->
      s"""WITH w AS (SELECT doc_id, source, text, $normSql AS norm,
             string_split($normSql, ' ') AS words FROM documents),
         d AS (SELECT doc_id, source, norm,
             CAST(len(words) AS INT) n_words,
             FLOOR((CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 10000 + 0.5) / 10000 AS punct_ratio,
             FLOOR((CAST(${hits("en")} AS DOUBLE) / len(words)) * 10000 + 0.5) / 10000 AS stop_ratio,
             CAST(${hits("en")} AS INT) s_en, CAST(${hits("es")} AS INT) s_es,
             CAST(${hits("de")} AS INT) s_de, CAST(${hits("fr")} AS INT) s_fr
           FROM w),
         q AS (SELECT *,
             FLOOR((0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio)
               + 0.3 * LEAST(CAST(n_words AS DOUBLE) / 100, 1.0)) * 10000 + 0.5) / 10000 AS quality_score,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS predicted_lang
           FROM d),
         t AS (SELECT *,
             CASE WHEN quality_score >= 0.7 THEN 'HIGH'
                  WHEN quality_score >= 0.4 THEN 'MEDIUM'
                  ELSE 'LOW' END AS quality_tier,
             doc_id <> MIN(doc_id) OVER (PARTITION BY md5(norm)) AS is_dup
           FROM q),
         f AS (SELECT *,
             (NOT is_dup) AND quality_score >= 0.4 AND predicted_lang = 'en' AS keep
           FROM t),
         a AS (SELECT source, predicted_lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS n_tokens,
             FLOOR((CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_quality,
             CAST(SUM(CASE WHEN quality_tier = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tier,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicates,
             CAST(SUM(CASE WHEN (NOT is_dup) AND quality_score < 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
           FROM f GROUP BY 1, 2)
         SELECT *, FLOOR((CAST(n_kept AS DOUBLE) / n_docs) * 1000000 + 0.5) / 1000000 AS keep_rate
         FROM a ORDER BY source, predicted_lang""",
    "q_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         c AS (SELECT doc_id, md5(norm) AS content_md5 FROM n),
         w AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
         w2 AS (SELECT * FROM w WHERE len(words) >= 3),
         sh AS (SELECT DISTINCT doc_id, md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS sh
                FROM w2, UNNEST(generate_series(1, len(words) - 2)) AS t(i)),
         sk AS (SELECT doc_id, MIN(sh) AS min_shingle_hash, MAX(sh) AS max_shingle_hash,
             CAST(COUNT(*) AS BIGINT) AS n_shingles
           FROM sh GROUP BY doc_id)
         SELECT c.doc_id, content_md5, min_shingle_hash, max_shingle_hash, n_shingles
         FROM c LEFT JOIN sk ON c.doc_id = sk.doc_id ORDER BY c.doc_id"""
  )
}
