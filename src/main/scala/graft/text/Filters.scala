package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Corpus-level content filters for LLM training-data curation —
  * repetition/boilerplate detection (the Gopher/C4 family of quality
  * gates) and PII detection + redaction. These extend the reference's
  * data-quality surface (models/staging/staging_customers.sql's
  * regex-validation approach, ml_platform feature-quality scoring) to
  * the document corpus the way a pretraining pipeline needs.
  *
  * Scale shape:
  *   - [[repetition]] is ONE explode over the corpus (every word unigram
  *     / bigram / trigram tagged with its size) feeding two partial-agg
  *     groupBys keyed by doc_id — linear, map-side combinable, no
  *     windows, no self-joins.
  *   - [[piiScrub]] is pure row-wise regex column expressions — zero
  *     shuffles, fully inside whole-stage codegen.
  *   - [[decontaminate]] broadcasts the eval-set shingle vocabulary —
  *     eval/benchmark sets are tiny relative to a training corpus, so
  *     the contamination tag is a map-side hash probe and the only
  *     shuffle is the per-doc count aggregation.
  */
object Filters {

  /** First hex digit of md5(doc_id) as an int in 0..15 — deterministic
    * noise shared with the oracle SQL (the single shared definition,
    * [[graft.functions.Fns.hexDigit]], same device as
    * [[graft.ml.Monitoring]]). */
  private def hexNoise(idCol: String) =
    graft.functions.Fns.hexDigit(idCol, 1)

  /** Per-document repetition metrics over word n-grams (n = 1, 2, 3):
    * duplicate-gram fraction (share of grams that are repeats of an
    * earlier gram) and top-gram fraction (share held by the single most
    * frequent gram) — the "fraction of duplicate n-grams" signals the
    * Gopher quality filter thresholds (MassiveText curation). A doc is
    * flagged repetitive when trigram or bigram duplication crosses the
    * thresholds (duplication, not concentration, so short-but-distinct
    * docs never trip the flag).
    *
    * One explode emits all three gram sizes tagged (doc_id, n, gram);
    * docs shorter than n words contribute no n-grams and their fractions
    * coalesce to 0. */
  def repetition(documents: DataFrame,
                 dup3Threshold: Double = 0.15,
                 dup2Threshold: Double = 0.30): DataFrame = {
    def grams(n: Int): String =
      if (n == 1) "transform(words, w -> struct(1 as n, w as gram))"
      else s"""case when size(words) >= $n
           then transform(sequence(0, size(words) - $n),
             i -> struct($n as n, concat_ws(' ', slice(words, i + 1, $n)) as gram))
           else array() end"""
    val melted = TextPrep.withWords(documents)
      .select(col("doc_id"),
        explode(expr(s"concat(${grams(1)}, ${grams(2)}, ${grams(3)})")).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val perGram = melted.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val perSize = perGram.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("c")).as("total"),
        count(lit(1)).as("distinct_n"),
        max(col("c")).as("top_c"))
    // pivot the three gram sizes into one row per doc; a missing size
    // (short doc) yields 0 totals -> 0.0 fractions via the null guard
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      r6(when(den > 0, num / den).otherwise(lit(0d)))
    def at(n: Int, c: String) = max(when(col("n") === n, col(c)))
    perSize.groupBy(col("doc_id"))
      .agg(
        coalesce(at(1, "total"), lit(0L)).as("n_words"),
        frac(at(1, "total") - at(1, "distinct_n"), at(1, "total")).as("dup_word_frac"),
        frac(at(1, "top_c"), at(1, "total")).as("top_word_frac"),
        frac(at(2, "total") - at(2, "distinct_n"), at(2, "total")).as("dup_2gram_frac"),
        frac(at(2, "top_c"), at(2, "total")).as("top_2gram_frac"),
        frac(at(3, "total") - at(3, "distinct_n"), at(3, "total")).as("dup_3gram_frac"),
        frac(at(3, "top_c"), at(3, "total")).as("top_3gram_frac"))
      .withColumn("is_repetitive",
        col("dup_3gram_frac") > dup3Threshold || col("dup_2gram_frac") > dup2Threshold)
      .orderBy("doc_id")
  }

  /** Regexes shared by the Spark path and the DuckDB oracle — restricted
    * to syntax Java regex and RE2 interpret identically. */
  private[graft] val emailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z][a-z]+"
  private[graft] val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII detection + redaction over the corpus. The synthetic documents
    * carry no organic PII, so emails/phones are injected DETERMINISTICALLY
    * (md5-digit gate on doc_id — the [[graft.ml.Monitoring]] device) and
    * then detected and redacted by pattern, exercising the real scrub
    * path end-to-end: per-doc match counts, a has_pii flag, and the
    * redacted text with [EMAIL]/[PHONE] placeholders. Pure row-wise
    * expressions — no shuffle. */
  def piiScrub(documents: DataFrame): DataFrame = {
    val d = hexNoise("doc_id")
    val email = concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com now"))
    val phone = concat(lit(" call 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"), lit(" today"))
    documents
      .withColumn("pii_text",
        concat(col("text"),
          when(d < 4, email).otherwise(lit("")),
          when(d >= 4 && d < 8, phone).otherwise(lit(""))))
      .withColumn("n_emails", regexp_count(col("pii_text"), lit(emailRe)))
      .withColumn("n_phones", regexp_count(col("pii_text"), lit(phoneRe)))
      .withColumn("has_pii", col("n_emails") + col("n_phones") > 0)
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("pii_text"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("has_pii"),
        col("redacted"), length(col("redacted")).as("redacted_len"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag training documents whose word-3-gram
    * set overlaps a held-out eval set's shingle vocabulary — the overlap
    * screen every pretraining pipeline runs so benchmark text never leaks
    * into the training corpus. The eval split is carved deterministically
    * from the corpus itself (md5 digit 0 ≈ 1/16 of docs — the stand-in
    * for an external benchmark file).
    *
    * One explode over the train split, tagged by a broadcast hash-probe
    * of the eval vocabulary, then a single per-doc count aggregation:
    * n_shingles, n_overlap, containment ratio, contamination flag.
    * Shingle-less docs (<3 words) surface with zero counts. */
  def decontaminate(documents: DataFrame,
                    containmentThreshold: Double = 0.2): DataFrame = {
    val withD = documents.withColumn("d", hexNoise("doc_id"))
    val evalVocab = TextPrep.shingles(withD.filter(col("d") === 0))
      .select("shingle").distinct().withColumn("in_eval", lit(1))
    val train = withD.filter(col("d") =!= 0)
    val tagged = TextPrep.shingles(train)
      .join(broadcast(evalVocab), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("in_eval"), lit(0))).as("n_overlap"))
    train.select(col("doc_id"))
      .join(tagged, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shingles", "n_overlap"))
      .withColumn("containment",
        r6(when(col("n_shingles") > 0, col("n_overlap") / col("n_shingles"))
          .otherwise(lit(0d))))
      .withColumn("is_contaminated", col("containment") >= containmentThreshold)
      .orderBy("doc_id")
  }

  /** Winnowed document fingerprints (the MOSS scheme): hash every word
    * k-gram, slide a w-window over the positional hash stream, keep each
    * window's MINIMUM — the classic guarantee that any shared run of at
    * least k+w-1 consecutive words shares a fingerprint, at ~1/w the
    * storage of the full gram set. Hashes are the first 16 hex chars of
    * md5 (fixed-width lowercase hex minimizes lexicographically exactly
    * like its numeric value, and both engines produce identical
    * strings). Per-doc rolling windows are doc-length-bounded; docs
    * shorter than k+w-1 words emit no fingerprints. */
  private[text] def winnowFingerprints(documents: DataFrame, k: Int = 5,
                                       w: Int = 4): DataFrame = {
    val grams = TextPrep.withWords(documents)
      .filter(size(col("words")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(words) - $k), " +
          s"i -> substr(md5(concat_ws(' ', slice(words, i + 1, $k))), 1, 16))"))
        .as(Seq("pos", "h")))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val wWin = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("ng", count(lit(1)).over(wDoc))
      .withColumn("fp", min(col("h")).over(wWin))
      .filter(col("pos") <= col("ng") - w)
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Winnowing decontamination — the LONG-MATCH screen [[decontaminate]]
    * can't provide: 3-gram containment dilutes a verbatim 50-word eval
    * quote inside a long document below any threshold, while a winnowed
    * fingerprint match fires on ANY shared run of ≥ k+w-1 words
    * regardless of document length. Same eval-split device and broadcast
    * probe shape as [[decontaminate]]; reports per-doc fingerprint
    * counts, matches, and the flag (any_match OR high containment). */
  def winnowContam(documents: DataFrame, k: Int = 5, w: Int = 4,
                   matchThreshold: Int = 1): DataFrame = {
    val withD = documents.withColumn("d", hexNoise("doc_id"))
    val evalFp = winnowFingerprints(withD.filter(col("d") === 0), k, w)
      .select("fp").distinct().withColumn("in_eval", lit(1))
    val train = withD.filter(col("d") =!= 0)
    val tagged = winnowFingerprints(train, k, w)
      .join(broadcast(evalFp), Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(coalesce(col("in_eval"), lit(0))).as("n_matches"))
    train.select(col("doc_id"))
      .join(tagged, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_fingerprints", "n_matches"))
      .withColumn("match_share",
        r6(when(col("n_fingerprints") > 0,
          col("n_matches") / col("n_fingerprints")).otherwise(lit(0d))))
      .withColumn("is_contaminated", col("n_matches") >= matchThreshold)
      .orderBy("doc_id")
  }

  /** Cross-document verbatim-overlap pairs — the MOSS similarity matrix
    * built from the SAME winnowed fingerprints as [[winnowContam]], but
    * doc-vs-doc inside the corpus instead of train-vs-eval: any two docs
    * sharing a run of ≥ k+w-1 words share a fingerprint, so pairs with
    * `minShared`+ shared fingerprints are long-verbatim-duplicate
    * candidates MinHash's bag-of-shingles estimate underweights. Same
    * candidate-generation discipline as every dedup operator: fingerprints
    * shared by more than `fpCap` docs (corpus boilerplate) are dropped
    * before the self-join — the pair count is Σ|fp bucket|²-bounded, never
    * O(n²) — and the bucket count is a window over the SAME fp
    * partitioning the join shuffles on. Overlap shares use each doc's
    * FULL fingerprint count (computed before the cap). */
  def winnowOverlap(documents: DataFrame, k: Int = 5, w: Int = 4,
                    fpCap: Int = 100, minShared: Int = 2): DataFrame = {
    val fp = winnowFingerprints(documents, k, w)
    val perDoc = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val wF = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val kept = fp.withColumn("bn", count(lit(1)).over(wF))
      .filter(col("bn") <= fpCap)
      .select("doc_id", "fp")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(perDoc.select(col("doc_id").as("doc_a"), col("n_fp").as("n_fp_a")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("n_fp").as("n_fp_b")), "doc_b")
      .withColumn("overlap_share",
        r6(col("n_shared").cast("double") / least(col("n_fp_a"), col("n_fp_b"))))
      .select("doc_a", "doc_b", "n_shared", "n_fp_a", "n_fp_b", "overlap_share")
      .orderBy("doc_a", "doc_b")
  }

  /** Bloom position j of a shingle: the last 4 hex digits of
    * md5("j:shingle") as an integer in [0, 65536) — uniform, engine-
    * reproducible digit arithmetic (the md5-digit device; DuckDB has no
    * conv, so the oracle extracts the same 4 digits positionally). */
  private def bloomPos(j: Int): Column =
    expr(s"cast(conv(substring(md5(cast(concat('$j:', shingle) as binary)), 29, 4), 16, 10) as bigint)")

  private val bloomBitsM = 65536 // bits (8 KB — fixed, eval-size-independent)
  private val bloomK = 4         // hash functions

  /** SQL fragment testing shingle expression `sv` against the broadcast
    * `bits` array (all four md5-digit positions set) — the lambda-form
    * twin of the batch screen's per-column tests, shared with the
    * streaming gate so the two can never drift. Each bit position is
    * computed ONCE and bound to a lambda variable (`bp`) before the
    * word-index/shift probe reads it twice — common-subexpression
    * elimination inside a filter lambda is not guaranteed, and the
    * inlined form paid 8 md5 calls per shingle where the batch path's
    * pos0..pos3 columns pay 4. `concat(cast(bj as string), ':', ...)`
    * produces the identical "j:shingle" bytes the batch
    * [[bloomPos]] literals hash. */
  private[graft] def bloomHitSql(sv: String): String =
    s"""forall(transform(sequence(0, ${bloomK - 1}),
       bj -> cast(conv(substring(md5(cast(concat(cast(bj as string), ':', $sv) as binary)), 29, 4), 16, 10) as bigint)),
       bp -> (element_at(bits, cast(floor(bp / 64) as int) + 1) & shiftleft(1L, cast(bp % 64 as int))) != 0L)"""

  /** The Bloom filter of an eval shingle set as ONE dense row:
    * `bits` = 1024 longs (65536 bits). Built with one explode (kHash
    * positions per shingle) + a bit_or aggregation per 64-bit word —
    * the artifact is FIXED-WIDTH however large the eval set grows,
    * which is exactly what [[decontaminate]]'s exact broadcast
    * vocabulary is not. */
  private[graft] def bloomBits(evalShingles: DataFrame): DataFrame = {
    val nWords = bloomBitsM / 64
    evalShingles
      .select(explode(array((0 until bloomK).map(bloomPos): _*)).as("pos"))
      .select(floor(col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bits"))
      .agg(collect_list(struct(col("w"), col("bits"))).as("entries"))
      .select(expr(
        s"""transform(sequence(0, ${nWords - 1}),
           i -> coalesce(element_at(map_from_entries(entries), cast(i as int)), 0L))""")
        .as("bits"))
  }

  /** Bloom-gated decontamination — [[decontaminate]] for eval sets too
    * large to broadcast exactly: the eval shingle vocabulary collapses
    * to a fixed 8 KB bit array (the one curation artifact that GREW
    * with the eval set is gone), and every training shingle is screened
    * row-locally with 4 md5-digit probes. A Bloom filter never misses —
    * every exact hit is a bloom hit by construction (spec-pinned), so
    * the screen is a SAFE over-approximation; the false-positive rate
    * is measured HERE against the exact operator per document
    * (n_bloom vs n_exact, the approx_profile calibration device) —
    * production then runs the bloom columns alone and drops the exact
    * join. Expected FPR at this sizing: (1−e^(−kn/m))^k ≈ 1e-4 for the
    * test eval set; BloomSpec pins the measured rate under the bound. */
  def decontamBloom(documents: DataFrame,
                    containmentThreshold: Double = 0.2): DataFrame = {
    val withD = documents.withColumn("d", hexNoise("doc_id"))
    val evalSh = TextPrep.shingles(withD.filter(col("d") === 0))
      .select("shingle").distinct()
    val bits = bloomBits(evalSh)
    val evalVocab = evalSh.withColumn("in_eval", lit(1))
    val train = withD.filter(col("d") =!= 0)
    val posed = (0 until bloomK).foldLeft(
        TextPrep.shingles(train).crossJoin(broadcast(bits))) {
      (df, j) => df.withColumn(s"pos$j", bloomPos(j))
    }
    val hit = (0 until bloomK).map { j =>
      expr(s"""(element_at(bits, cast(floor(pos$j / 64) as int) + 1)
             & shiftleft(1L, cast(pos$j % 64 as int))) != 0L""")
    }.reduce(_ && _)
    val tagged = posed
      .withColumn("bloom_hit", hit)
      .join(broadcast(evalVocab), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("bloom_hit").cast("long")).as("n_bloom"),
        sum(coalesce(col("in_eval"), lit(0))).as("n_exact"))
    train.select(col("doc_id"))
      .join(tagged, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shingles", "n_bloom", "n_exact"))
      .withColumn("fp_shingles", col("n_bloom") - col("n_exact"))
      .withColumn("bloom_containment",
        r6(when(col("n_shingles") > 0, col("n_bloom") / col("n_shingles"))
          .otherwise(lit(0d))))
      .withColumn("bloom_contaminated",
        col("bloom_containment") >= containmentThreshold)
      .withColumn("is_contaminated",
        r6(when(col("n_shingles") > 0, col("n_exact") / col("n_shingles"))
          .otherwise(lit(0d))) >= containmentThreshold)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winnow_overlap" -> ((s, d) => winnowOverlap(Tables.documents(s, d))),
    "q_rep_filter" -> ((s, d) => repetition(Tables.documents(s, d))),
    "q_pii_scrub" -> ((s, d) => piiScrub(Tables.documents(s, d))),
    "q_decontaminate" -> ((s, d) => decontaminate(Tables.documents(s, d))),
    "q_decontam_bloom" -> ((s, d) => decontamBloom(Tables.documents(s, d))),
    "q_winnow_contam" -> ((s, d) => winnowContam(Tables.documents(s, d)))
  )

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Oracle twin of [[bloomPos]]: the last 4 hex digits of `hx` as an
    * integer (DuckDB has no conv — positional digit arithmetic). */
  private def bloomPosSql(hx: String): String =
    s"((strpos('0123456789abcdef', substr($hx, 29, 1)) - 1) * 4096 + " +
      s"(strpos('0123456789abcdef', substr($hx, 30, 1)) - 1) * 256 + " +
      s"(strpos('0123456789abcdef', substr($hx, 31, 1)) - 1) * 16 + " +
      s"strpos('0123456789abcdef', substr($hx, 32, 1)) - 1)"

  private val bloomHx = "md5(CAST(j AS VARCHAR) || ':' || shingle)"

  val oracles: Map[String, String] = Map(
    // Set-bit membership re-expressed relationally: the bit array IS the
    // distinct set of eval positions; a shingle bloom-hits iff all 4 of
    // its positions are set (nhit = 4) — identical semantics to the
    // engine's word/mask test.
    "q_decontam_bloom" ->
      s"""WITH w AS (SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) AS d,
             string_split($normSql, ' ') AS words
           FROM documents),
         sh AS (SELECT DISTINCT doc_id, d,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
           FROM w, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
           WHERE len(words) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE d = 0),
         js AS (SELECT UNNEST(range(4)) AS j),
         evp AS (SELECT DISTINCT ${bloomPosSql(bloomHx)} AS pos FROM ev, js),
         tpp AS (SELECT doc_id, shingle, j, ${bloomPosSql(bloomHx)} AS pos
           FROM (SELECT doc_id, shingle FROM sh WHERE d <> 0), js),
         shhit AS (SELECT doc_id, shingle,
             SUM(CASE WHEN e.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit
           FROM tpp LEFT JOIN evp e ON tpp.pos = e.pos GROUP BY 1, 2),
         agg AS (SELECT s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN nhit = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
             CAST(SUM(CASE WHEN ev2.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
           FROM shhit s LEFT JOIN ev ev2 ON s.shingle = ev2.shingle GROUP BY 1),
         o AS (SELECT t.doc_id,
             CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
             CAST(COALESCE(n_bloom, 0) AS BIGINT) AS n_bloom,
             CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact
           FROM (SELECT doc_id FROM w WHERE d <> 0) t LEFT JOIN agg USING (doc_id))
         SELECT doc_id, n_shingles, n_bloom, n_exact,
           n_bloom - n_exact AS fp_shingles,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_bloom AS DOUBLE) / n_shingles ELSE 0 END", 6)} AS bloom_containment,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_bloom AS DOUBLE) / n_shingles ELSE 0 END", 6)} >= 0.2 AS bloom_contaminated,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_exact AS DOUBLE) / n_shingles ELSE 0 END", 6)} >= 0.2 AS is_contaminated
         FROM o ORDER BY doc_id""",
    "q_winnow_overlap" ->
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS words FROM documents),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             substr(md5(array_to_string(list_slice(words, i, i + 4), ' ')), 1, 16) AS h
           FROM w, UNNEST(generate_series(1, len(words) - 4)) AS t(i)
           WHERE len(words) >= 5),
         c AS (SELECT doc_id, pos, h,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS ng,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
           FROM g),
         f AS (SELECT DISTINCT doc_id, fp FROM c WHERE pos <= ng - 4),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM f GROUP BY 1),
         cold AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 100),
         kept AS (SELECT f.* FROM f JOIN cold USING (fp)),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT doc_a, doc_b, n_shared, pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
           ${sqlR("CAST(n_shared AS DOUBLE) / LEAST(pa.n_fp, pb.n_fp)", 6)} AS overlap_share
         FROM pr JOIN pd pa ON doc_a = pa.doc_id JOIN pd pb ON doc_b = pb.doc_id
         ORDER BY doc_a, doc_b""",
    "q_rep_filter" -> {
      // per-n gram streams via UNNEST(generate_series) — the
      // q_fingerprint pattern, kept per-size for clarity (oracle-side
      // perf is irrelevant)
      def gramCte(n: Int): String =
        if (n == 1)
          s"""g1 AS (SELECT doc_id, 1 AS n, u.g AS gram
              FROM w, UNNEST(words) AS u(g))"""
        else {
          val parts = (0 until n).map(k => s"words[i+$k]").mkString(" || ' ' || ")
          s"""g$n AS (SELECT doc_id, $n AS n, $parts AS gram
              FROM w, UNNEST(generate_series(1, len(words) - ${n - 1})) AS t(i)
              WHERE len(words) >= $n)"""
        }
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS words FROM documents),
         ${gramCte(1)}, ${gramCte(2)}, ${gramCte(3)},
         m AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3),
         pg AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c
           FROM m GROUP BY 1, 2, 3),
         ps AS (SELECT doc_id, n, SUM(c) AS total, CAST(COUNT(*) AS BIGINT) AS distinct_n,
             MAX(c) AS top_c
           FROM pg GROUP BY 1, 2),
         p AS (SELECT doc_id,
             COALESCE(MAX(CASE WHEN n = 1 THEN total END), 0) AS t1,
             MAX(CASE WHEN n = 1 THEN distinct_n END) AS d1,
             MAX(CASE WHEN n = 1 THEN top_c END) AS c1,
             MAX(CASE WHEN n = 2 THEN total END) AS t2,
             MAX(CASE WHEN n = 2 THEN distinct_n END) AS d2,
             MAX(CASE WHEN n = 2 THEN top_c END) AS c2,
             MAX(CASE WHEN n = 3 THEN total END) AS t3,
             MAX(CASE WHEN n = 3 THEN distinct_n END) AS d3,
             MAX(CASE WHEN n = 3 THEN top_c END) AS c3
           FROM ps GROUP BY doc_id),
         f AS (SELECT doc_id, CAST(t1 AS BIGINT) AS n_words,
             ${sqlR("CASE WHEN t1 > 0 THEN CAST(t1 - d1 AS DOUBLE) / t1 ELSE 0 END", 6)} AS dup_word_frac,
             ${sqlR("CASE WHEN t1 > 0 THEN CAST(c1 AS DOUBLE) / t1 ELSE 0 END", 6)} AS top_word_frac,
             ${sqlR("CASE WHEN t2 > 0 THEN CAST(t2 - d2 AS DOUBLE) / t2 ELSE 0 END", 6)} AS dup_2gram_frac,
             ${sqlR("CASE WHEN t2 > 0 THEN CAST(c2 AS DOUBLE) / t2 ELSE 0 END", 6)} AS top_2gram_frac,
             ${sqlR("CASE WHEN t3 > 0 THEN CAST(t3 - d3 AS DOUBLE) / t3 ELSE 0 END", 6)} AS dup_3gram_frac,
             ${sqlR("CASE WHEN t3 > 0 THEN CAST(c3 AS DOUBLE) / t3 ELSE 0 END", 6)} AS top_3gram_frac
           FROM p)
         SELECT *, dup_3gram_frac > 0.15 OR dup_2gram_frac > 0.30 AS is_repetitive
         FROM f ORDER BY doc_id"""
    },
    "q_pii_scrub" ->
      s"""WITH s AS (SELECT doc_id, text,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) AS d
           FROM documents),
         inj AS (SELECT doc_id, text ||
             (CASE WHEN d < 4 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END) ||
             (CASE WHEN d >= 4 AND d < 8 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END)
             AS pii_text
           FROM s),
         m AS (SELECT doc_id, pii_text,
             CAST(len(regexp_extract_all(pii_text, '$emailRe')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(pii_text, '$phoneRe')) AS INT) AS n_phones
           FROM inj)
         SELECT doc_id, n_emails, n_phones, n_emails + n_phones > 0 AS has_pii,
           regexp_replace(regexp_replace(pii_text, '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g') AS redacted,
           CAST(length(regexp_replace(regexp_replace(pii_text, '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g')) AS INT) AS redacted_len
         FROM m ORDER BY doc_id""",
    "q_decontaminate" ->
      s"""WITH w AS (SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) AS d,
             string_split($normSql, ' ') AS words
           FROM documents),
         sh AS (SELECT DISTINCT doc_id, d,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
           FROM w, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
           WHERE len(words) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE d = 0),
         agg AS (SELECT s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
           FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle
           WHERE s.d <> 0 GROUP BY s.doc_id),
         o AS (SELECT t.doc_id,
             CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
             CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap
           FROM (SELECT doc_id FROM w WHERE d <> 0) t LEFT JOIN agg USING (doc_id))
         SELECT doc_id, n_shingles, n_overlap,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_overlap AS DOUBLE) / n_shingles ELSE 0 END", 6)} AS containment,
           ${sqlR("CASE WHEN n_shingles > 0 THEN CAST(n_overlap AS DOUBLE) / n_shingles ELSE 0 END", 6)} >= 0.2 AS is_contaminated
         FROM o ORDER BY doc_id""",
    "q_winnow_contam" ->
      s"""WITH w AS (SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) AS d,
             string_split($normSql, ' ') AS words
           FROM documents),
         g AS (SELECT doc_id, d, CAST(i - 1 AS BIGINT) AS pos,
             substr(md5(array_to_string(list_slice(words, i, i + 4), ' ')), 1, 16) AS h
           FROM w, UNNEST(generate_series(1, len(words) - 4)) AS t(i)
           WHERE len(words) >= 5),
         c AS (SELECT doc_id, d, pos, h,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS ng,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
           FROM g),
         f AS (SELECT DISTINCT doc_id, d, fp FROM c WHERE pos <= ng - 4),
         ev AS (SELECT DISTINCT fp FROM f WHERE d = 0),
         agg AS (SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             CAST(SUM(CASE WHEN ev.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
           FROM f LEFT JOIN ev ON f.fp = ev.fp
           WHERE f.d <> 0 GROUP BY f.doc_id),
         o AS (SELECT t.doc_id,
             CAST(COALESCE(n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
             CAST(COALESCE(n_matches, 0) AS BIGINT) AS n_matches
           FROM (SELECT doc_id FROM w WHERE d <> 0) t LEFT JOIN agg USING (doc_id))
         SELECT doc_id, n_fingerprints, n_matches,
           ${sqlR("CASE WHEN n_fingerprints > 0 THEN CAST(n_matches AS DOUBLE) / n_fingerprints ELSE 0 END", 6)} AS match_share,
           n_matches >= 1 AS is_contaminated
         FROM o ORDER BY doc_id"""
  )
}
