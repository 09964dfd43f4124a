package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Iterative BPE merge-table training and application over the word-token
  * stream — the real multi-round loop behind [[Vocab.bigramVocab]] (which
  * computes exactly round 1's merge CANDIDATES): each round counts all
  * adjacent token pairs over the EVOLVING token stream, merges the single
  * most frequent pair into a new token (greedy leftmost non-overlapping,
  * the standard BPE application order), and recounts. The learned ranked
  * merge table is the artifact every tokenizer consumer
  * (q_token_count / q_vocab_prune / q_pack_sequences) actually trains.
  *
  * The reference ships no tokenizer trainer; this is the LLM-data
  * extension's iterative rung on the q_pagerank pattern (fixed rounds,
  * localCheckpoint'ed state, one partial-aggregated shuffle per round);
  * the algorithm is Sennrich et al. 2016 (arXiv:1508.07909) applied at
  * word grain (merges may cross word boundaries — the engine's token
  * stream is the whitespace word sequence, and document boundaries are
  * the only hard fences, exactly like the bigram devices).
  *
  * Scale design (100 TB):
  *   - State is (doc_id, toks array), re-checkpointed per round. Each
  *     round's ONLY shuffle is the pair count — hash partial-aggregated
  *     map-side, so the exchange moves at most partitions × realized-pair
  *     -vocab rows, never the token stream.
  *   - The winning pair is a ONE-ROW broadcast; the merge itself is a
  *     row-local array fold (no shuffle), with an `array_contains` quick
  *     reject so documents not containing the pair skip the O(len) fold.
  *   - The merge fold `last(acc) == a && next == b → replace last` is
  *     exactly greedy leftmost non-overlapping BPE: the merged token
  *     "a b" is strictly longer than `a`, so a fresh merge can never
  *     chain into the next position within the same round.
  *   - A fixed round count keeps the job graph static; per-round plans
  *     stay O(1) because state lineage is cut at each checkpoint. On a
  *     real cluster the localCheckpoints become reliable checkpoints to
  *     the cluster store — the corpus is rewritten once per round either
  *     way, which is the known cost of sequence-level BPE; production
  *     trainers amortize it by training on a sampled shard (compose with
  *     q_hash_sample) and applying corpus-wide via [[bpeApply]].
  *
  * Oracle: the same `rounds` merge rounds unrolled as chained CTEs (the
  * q_pagerank device) over a separator-framed string form of the token
  * stream, where one `replace(s, SEP||a||SEP||SEP||b||SEP,
  * SEP||a||' '||b||SEP)` (SEP = chr(1)) performs the identical greedy
  * leftmost non-overlapping merge: both engines' `replace` scans left to
  * right and never rescans replaced output, the pattern consumes one
  * frame char from each boundary and the replacement restores it, so
  * disjoint consecutive occurrences stay matchable. U+0001 cannot appear
  * in a token of this corpus (spec-asserted) and merged tokens only ever
  * add ' '; BpeSpec pins the fold form == the string form on real data.
  */
object Bpe {

  /** Token separator of the canonical string form (oracle + tok_hash):
    * never produced by normText's single-space word stream. */
  private val SEP = "\u0001"

  /** (doc_id, toks): the normalized word stream as BPE's round-0 state.
    * NULL and whitespace-only texts drop (they have no tokens; keeping
    * them would put empty-string tokens into the stream, which the
    * oracle's separator framing cannot represent). */
  private[graft] def tokenState(documents: DataFrame): DataFrame =
    TextPrep.withWords(documents.filter(col("text").isNotNull))
      .filter(col("norm") =!= "")
      .select(col("doc_id"), col("words").as("toks"))

  /** One greedy leftmost non-overlapping merge of (ma, mb) → "ma mb"
    * applied to `toks` — the ORACLE's separator-framed string-replace
    * device run on the Spark side too: frame the token array with
    * chr(1)||chr(1) between tokens and at both ends, replace
    * SEP·a·SEP·SEP·b·SEP with SEP·a·' '·b·SEP (the pattern eats one
    * frame char per side and the replacement restores it, so adjacent
    * disjoint occurrences stay matchable), split back. Both engines'
    * replace scans left-to-right without rescanning its own output —
    * exactly the greedy fold's semantics (BpeSpec pins fold == replace
    * on crafted chains). The earlier array `aggregate(...)` fold built
    * the accumulator with per-element `concat` — O(n²) per document per
    * round, interpreted (HOFs are CodegenFallback) — where `replace` /
    * `split` are codegen'd O(n) string scans. A NULL pair
    * (empty-corpus round) is the identity. */
  private val SEP2 = SEP + SEP
  private def framedSql(src: String): String =
    s"concat('$SEP2', concat_ws('$SEP2', $src), '$SEP2')"
  private def unframeSql(src: String): String =
    s"filter(split($src, '$SEP2'), x -> x <> '')"
  private val mergeFold =
    s"""IF(ma IS NULL, toks,
        ${unframeSql(s"""replace(${framedSql("toks")},
           concat('$SEP', ma, '$SEP2', mb, '$SEP'),
           concat('$SEP', ma, ' ', mb, '$SEP'))""")})"""

  /** The training loop; returns (merge table, final token state). The
    * final state stays checkpointed — [[bpeTrain]] releases it, BpeSpec
    * reads it to pin apply == train. */
  private[graft] def trainWithState(documents: DataFrame,
                                    rounds: Int): (DataFrame, DataFrame) = {
    // The round-0 checkpoint inherits the SCAN's split count (3 tasks at
    // sf0.1's file sizes), and every round's pair-count + merge stage
    // replays at that width for the whole loop, so one hash repartition
    // (deterministic key) spreads all `rounds` corpus passes. The WIDTH
    // is derived from the corpus, not pinned to the core count: r15's
    // `repartition(numShufflePartitions)` made 32 sub-MB tasks per round
    // at sf0.1 and the 8-round loop ran 2.3× SLOWER on 32 cores than on
    // 8 (BENCH_r15 scaling 0.43) — pure per-task scheduling overhead.
    // The scan's split count is the bytes proxy (corpus bytes / split
    // size), ×2 for the fold work per byte, capped at the session's
    // shuffle parallelism so a real cluster still fans out.
    val ts = tokenState(documents)
    val nPart = math.max(1, math.min(
      documents.sparkSession.sessionState.conf.numShufflePartitions,
      ts.rdd.getNumPartitions * 2))
    var state = ts.repartition(nPart, col("doc_id")).localCheckpoint(false)
    val intermediates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    intermediates += state
    var merges = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val pairs = state.filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
      // TakeOrderedAndProject keeps one candidate per partition; the
      // eager 1-row checkpoint runs this round's pair-count job and cuts
      // the lineage so the union below never recounts.
      val top = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .localCheckpoint()
      intermediates += top
      merges :+= top.select(lit(r).as("round"), col("a").as("tok_a"),
        col("b").as("tok_b"),
        concat(col("a"), lit(" "), col("b")).as("merged"),
        col("n").as("pair_n"))
      // LEFT join on TRUE (not crossJoin): an exhausted corpus yields an
      // EMPTY top and the state must pass through unchanged, not vanish.
      state = state
        .join(broadcast(top.select(col("a").as("ma"), col("b").as("mb"))),
          lit(true), "left")
        .withColumn("toks", expr(mergeFold))
        .select(col("doc_id"), col("toks"))
        .localCheckpoint(false)
      intermediates += state
    }
    val table = merges.reduce(_.unionByName(_)).orderBy("round").localCheckpoint()
    intermediates.dropRight(1).foreach(_.unpersist())
    (table, state)
  }

  /** The learned merge table: one row per round —
    * (round, tok_a, tok_b, merged, pair_n), pair_n being the winning
    * pair's corpus count at merge time (non-increasing over rounds: a
    * merge only removes occurrences of existing pairs, and any pair it
    * creates is bounded by the count it just consumed — BpeSpec). */
  def bpeTrain(documents: DataFrame, rounds: Int = 8): DataFrame = {
    val (table, finalState) = trainWithState(documents, rounds)
    finalState.unpersist()
    table
  }

  /** Row-local application of a learned merge table: (doc_id, toks)
    * after replaying every merge in rank order. The table collapses to
    * ONE broadcast row of structs (the artifact never grows with the
    * corpus — it is `rounds` long by construction), and each document
    * folds through the ranked merges locally: zero shuffles beyond the
    * broadcast. Replaying rank-ordered merges from round 0 reproduces
    * the training-time state exactly (each round's state is one full
    * greedy application ahead of the previous — the classical BPE
    * train/apply identity, spec-pinned). */
  /** The rank-ordered replay fold over the broadcast merge artifact —
    * row-local, so it runs identically over a batch corpus and a
    * document STREAM (stateless; the artifact is stream-static). The
    * replay folds over the separator-FRAMED string (one codegen'd
    * `replace` per merge — the [[mergeFold]] device), splitting back to
    * tokens once at the end instead of rebuilding an array per merge. */
  private val applyFold = unframeSql(
    s"""aggregate(ms, ${framedSql("toks")}, (acc, m) ->
         replace(acc, concat('$SEP', m.tok_a, '$SEP2', m.tok_b, '$SEP'),
                 concat('$SEP', m.tok_a, ' ', m.tok_b, '$SEP')))""")

  private def mergeArtifact(merges: DataFrame): DataFrame =
    merges.agg(array_sort(collect_list(
      struct(col("round"), col("tok_a"), col("tok_b")))).as("ms"))

  private[graft] def applyTokens(documents: DataFrame,
                                 merges: DataFrame): DataFrame =
    tokenState(documents)
      .crossJoin(broadcast(mergeArtifact(merges)))
      .withColumn("toks", expr(applyFold))
      .select(col("doc_id"), col("toks"))

  /** One-pass apply mart (the [[bpeApply]] columns computed without the
    * word-count self-join, so it is also streaming-safe): per document
    * the original and merged token counts, merges landed, and the token
    * stream's md5 fingerprint. */
  private[graft] def applyMart(documents: DataFrame,
                               merges: DataFrame): DataFrame =
    tokenState(documents)
      .crossJoin(broadcast(mergeArtifact(merges)))
      .withColumn("toks2", expr(applyFold))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        size(col("toks2")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("toks2"))).cast("long").as("n_merges"),
        md5(concat_ws(SEP, col("toks2")).cast("binary")).as("tok_hash"))

  /** Corpus re-tokenization with the learned merge table — per document
    * the original word count, the post-merge token count, the number of
    * greedy merge applications that landed (their difference — token
    * conservation: splitting merged tokens back on ' ' recovers the
    * word stream exactly, spec-pinned), and the md5 fingerprint of the
    * token stream (the cheap equality witness for index/shard
    * consumers). */
  def bpeApply(documents: DataFrame, merges: DataFrame): DataFrame =
    applyMart(documents, merges).orderBy("doc_id")

  /** Shard-trained BPE vs full-corpus BPE — the production
    * amortization question (a 100 TB corpus trains its tokenizer on a
    * sampled shard and applies it everywhere; this mart measures what
    * that costs): train on the deterministic 25% md5-digit shard
    * (digit 2, independent of the decontamination split on digit 1),
    * apply BOTH merge tables to the FULL corpus, and report per-round
    * merge agreement plus the token-count excess of the shard-trained
    * tokenizer — one row: (n_rounds, n_agree, n_words, tokens_full,
    * tokens_sample, excess_tokens, excess_share). Everything reuses
    * the train/apply devices; all counts are exact longs. */
  def bpeSampleEval(documents: DataFrame, rounds: Int = 8): DataFrame = {
    val sample = documents.filter(graft.functions.Fns.hexDigit("doc_id", 2) < 4)
    // the two trainings are INDEPENDENT eager driver loops (one
    // round-trip per round each, executors mostly idle at gate scale) —
    // submit them from two driver threads so each loop's tail back-fills
    // the other's idle capacity; results are unchanged (disjoint
    // lineages, deterministic winners)
    val (fullT, sampT) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val f = Future(bpeTrain(documents, rounds))
      val g = Future(bpeTrain(sample, rounds))
      (Await.result(f, Duration.Inf), Await.result(g, Duration.Inf))
    }
    val agree = fullT.select(col("round"), col("merged").as("m_full"))
      .join(sampT.select(col("round"), col("merged").as("m_sample")),
        Seq("round"), "full_outer")
      .agg(count(lit(1)).as("n_rounds"),
        sum(coalesce((col("m_full") === col("m_sample")).cast("long"), lit(0L)))
          .as("n_agree"))
    def applied(m: DataFrame, nm: String) =
      applyTokens(documents, m).agg(sum(size(col("toks")).cast("long")).as(nm))
    val words = tokenState(documents)
      .agg(sum(size(col("toks")).cast("long")).as("n_words"))
    agree.crossJoin(words)
      .crossJoin(applied(fullT, "tokens_full"))
      .crossJoin(applied(sampT, "tokens_sample"))
      .select(col("n_rounds"), col("n_agree"), col("n_words"),
        col("tokens_full"), col("tokens_sample"),
        (col("tokens_sample") - col("tokens_full")).as("excess_tokens"),
        r6(try_divide((col("tokens_sample") - col("tokens_full")).cast("double"),
          col("tokens_full"))).as("excess_share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_train" -> ((s, d) => bpeTrain(Tables.documents(s, d))),
    "q_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      bpeApply(docs, bpeTrain(docs))
    }),
    "q_bpe_sample" -> ((s, d) => bpeSampleEval(Tables.documents(s, d)))
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** The separator-framed canonical form: chr(1)||chr(1) between tokens
    * and at both ends, so the round-k merge is ONE string replace whose
    * pattern consumes one frame char from each side and whose
    * replacement restores them — consecutive disjoint occurrences stay
    * matchable (see object doc). `pfx` namespaces a chain so two
    * trainings (full corpus / sampled shard) can share one WITH list;
    * `where` narrows the round-0 corpus. */
  private def roundCtes(pfx: String, k: Int): String = {
    val prev = s"$pfx" + s"s${k - 1}"
    s"""${pfx}tk$k AS (SELECT doc_id, list_filter(str_split(s, chr(1)||chr(1)), x -> x <> '') AS toks FROM $prev),
       ${pfx}p$k AS (SELECT t.toks[CAST(i.i AS INT)] AS a, t.toks[CAST(i.i AS INT) + 1] AS b,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM ${pfx}tk$k t, LATERAL (SELECT UNNEST(range(1, len(t.toks))) AS i) i
         GROUP BY 1, 2),
       ${pfx}t$k AS (SELECT a, b, n FROM ${pfx}p$k ORDER BY n DESC, a, b LIMIT 1),
       $pfx""" + s"""s$k AS (SELECT doc_id,
           CASE WHEN t.a IS NULL THEN p.s
                ELSE replace(p.s, chr(1)||t.a||chr(1)||chr(1)||t.b||chr(1),
                             chr(1)||t.a||' '||t.b||chr(1)) END AS s
         FROM $prev p LEFT JOIN ${pfx}t$k t ON TRUE)"""
  }

  private val rounds = 8

  private def chainCtes(pfx: String, where: String): String =
    s"""$pfx""" + s"""s0 AS (SELECT doc_id,
           chr(1)||chr(1) || array_to_string(string_split($normSql, ' '), chr(1)||chr(1)) || chr(1)||chr(1) AS s
         FROM documents WHERE text IS NOT NULL AND $normSql <> '' $where),
       ${(1 to rounds).map(roundCtes(pfx, _)).mkString(",\n       ")}"""

  private val baseCtes = chainCtes("", "")

  val oracles: Map[String, String] = Map(
    "q_bpe_train" ->
      s"""WITH $baseCtes
         SELECT * FROM (
           ${(1 to rounds).map(k =>
             s"SELECT $k AS round, a AS tok_a, b AS tok_b, a||' '||b AS merged, n AS pair_n FROM t$k")
             .mkString("\n           UNION ALL ")}
         ) ORDER BY round""",
    "q_bpe_apply" ->
      s"""WITH $baseCtes,
         fin AS (SELECT doc_id, list_filter(str_split(s, chr(1)||chr(1)), x -> x <> '') AS toks FROM s$rounds),
         orig AS (SELECT doc_id, CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_words
           FROM documents WHERE text IS NOT NULL AND $normSql <> '')
         SELECT f.doc_id, o.n_words,
           CAST(len(f.toks) AS BIGINT) AS n_tokens,
           CAST(o.n_words - len(f.toks) AS BIGINT) AS n_merges,
           md5(array_to_string(f.toks, chr(1))) AS tok_hash
         FROM fin f JOIN orig o USING (doc_id) ORDER BY f.doc_id""",
    // Two full training chains (prefix m = the 25% md5-digit-2 shard)
    // plus 8 apply CTEs replaying the SHARD winners over the FULL
    // corpus — the fold both engines run identically.
    "q_bpe_sample" -> {
      val sampleWhere =
        "AND (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 4"
      val applyK = (k: Int) =>
        s"""a$k AS (SELECT doc_id,
             CASE WHEN t.a IS NULL THEN p.s
                  ELSE replace(p.s, chr(1)||t.a||chr(1)||chr(1)||t.b||chr(1),
                               chr(1)||t.a||' '||t.b||chr(1)) END AS s
           FROM a${k - 1} p LEFT JOIN mt$k t ON TRUE)"""
      def ntok(src: String) =
        s"CAST(SUM(len(list_filter(str_split(s, chr(1)||chr(1)), x -> x <> ''))) AS BIGINT)"
      s"""WITH ${chainCtes("", "")},
         ${chainCtes("m", sampleWhere)},
         fmg AS (${(1 to rounds).map(k => s"SELECT $k AS round, a||' '||b AS m FROM t$k")
            .mkString("\n           UNION ALL ")}),
         smg AS (${(1 to rounds).map(k => s"SELECT $k AS round, a||' '||b AS m FROM mt$k")
            .mkString("\n           UNION ALL ")}),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rounds,
             CAST(SUM(CASE WHEN f.m = s.m THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
           FROM fmg f FULL OUTER JOIN smg s USING (round)),
         a0 AS (SELECT doc_id, s FROM s0),
         ${(1 to rounds).map(applyK).mkString(",\n         ")},
         wt AS (SELECT ${ntok("s0")} AS n_words FROM s0),
         tf AS (SELECT ${ntok(s"s$rounds")} AS tokens_full FROM s$rounds),
         tsm AS (SELECT ${ntok(s"a$rounds")} AS tokens_sample FROM a$rounds)
         SELECT n_rounds, n_agree, n_words, tokens_full, tokens_sample,
           tokens_sample - tokens_full AS excess_tokens,
           ${sqlR("CAST(tokens_sample - tokens_full AS DOUBLE) / NULLIF(tokens_full, 0)", 6)} AS excess_share
         FROM ag, wt, tf, tsm"""
    }
  )
}
