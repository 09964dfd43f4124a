package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (group, token) observation on the stream. */
case class WordIn(lang: String, word: String)

/** One SpaceSaving counter: estimated count `est` and the maximum
  * overestimation `err` inherited from the evicted entry. */
case class SsEntry(word: String, est: Long, err: Long)

/** Per-group SpaceSaving state: ≤ capacity counters + items seen. */
case class SsState(entries: List[SsEntry], nSeen: Long)

/** Current top-k estimate for a group, emitted every micro-batch the
  * group receives data. */
case class TopKOut(lang: String, rank: Int, word: String,
                   est: Long, err: Long, n_seen: Long)

/** Streaming heavy hitters per group via the SpaceSaving sketch
  * (Metwally, Agrawal, El Abbadi 2005) — the streaming twin of the
  * exact batch [[graft.ml.TopKWords]] aggregator. The batch operator's
  * count map is bounded by the vocabulary; an unbounded stream has an
  * unbounded vocabulary, so its state must be bounded by CONSTRUCTION:
  * SpaceSaving keeps exactly `capacity` counters per key and, when a
  * new word arrives with the table full, evicts the minimum-count entry
  * and charges its count as the newcomer's overestimation `err`.
  *
  * Guarantees (spec-pinned in Round11Spec):
  *   - state is ≤ capacity counters per key, forever;
  *   - every word with true frequency > nSeen/capacity IS in the table
  *     (the ε-superset guarantee, ε = 1/capacity) — the streaming
  *     top-k is a superset of the batch top-k restricted to words
  *     above that threshold;
  *   - per entry, true ∈ [est − err, est] — the sketch never
  *     undercounts and declares its own overestimation.
  *
  * Scale shape: flatMapGroupsWithState shuffles once on the group key;
  * state per key is capacity entries regardless of stream length —
  * the property the batch map-side-combine aggregator cannot offer on
  * an unbounded token stream. */
object TopKStream {

  /** Pure SpaceSaving fold — shared by the streaming operator and the
    * spec's direct invariant checks. Eviction tie-break: smallest
    * count, then lexicographically smallest word (deterministic for a
    * given arrival order). */
  private[graft] def foldSpaceSaving(st0: Map[String, (Long, Long)],
                                     nSeen0: Long,
                                     words: Iterator[String],
                                     capacity: Int): (Map[String, (Long, Long)], Long) = {
    val m = mutable.Map(st0.toSeq: _*)
    var n = nSeen0
    words.foreach { w =>
      n += 1
      m.get(w) match {
        case Some((c, e)) => m.update(w, (c + 1, e))
        case None if m.size < capacity => m.update(w, (1L, 0L))
        case None =>
          val (mw, (mc, _)) = m.minBy { case (w2, (c2, _)) => (c2, w2) }
          m.remove(mw)
          m.update(w, (mc + 1, mc))
      }
    }
    (m.toMap, n)
  }

  /** Streaming top-k heavy hitters per `lang`: each micro-batch folds
    * its slice into the key's SpaceSaving table and emits the current
    * top-k (est desc, word asc) in Update mode. */
  def heavyHitters(words: Dataset[WordIn], capacity: Int = 8,
                   k: Int = 5): Dataset[TopKOut] = {
    import words.sparkSession.implicits._
    val fn = (lang: String, rows: Iterator[WordIn], state: GroupState[SsState]) => {
      val st0 = state.getOption.getOrElse(SsState(Nil, 0L))
      val (m, n) = foldSpaceSaving(
        st0.entries.map(e => e.word -> (e.est, e.err)).toMap,
        st0.nSeen, rows.map(_.word), capacity)
      state.update(SsState(
        m.toList.map { case (w, (c, e)) => SsEntry(w, c, e) }, n))
      m.toSeq.sortBy { case (w, (c, _)) => (-c, w) }.take(k).zipWithIndex
        .map { case ((w, (c, e)), i) => TopKOut(lang, i + 1, w, c, e, n) }
        .iterator
    }
    words.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }
}
