package graft.ml

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextPrep

/** Exact top-K heavy hitters per group via a typed `Aggregator`.
  *
  * The scale shape: the count map is built and MERGED map-side (partial
  * aggregation), so the shuffle carries one bounded map per group per
  * partition instead of one row per token — the right trade whenever the
  * per-group key universe (vocabulary) is far smaller than the data.
  * Result is exact and deterministic: count-desc, word-asc tiebreak.
  */
class TopKWords(k: Int) extends Aggregator[(String, String), mutable.HashMap[String, Long], Seq[(String, Long)]] {
  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], in: (String, String)): mutable.HashMap[String, Long] = {
    val word = in._2
    b.update(word, b.getOrElse(word, 0L) + 1L)
    b
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (w, c) => a.update(w, a.getOrElse(w, 0L) + c) }
    a
  }

  override def finish(m: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopK {

  /** Top-5 words per language over the documents corpus. */
  def topWordsPerLang(documents: DataFrame, k: Int = 5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val tokens = TextPrep.withWords(documents)
      .select(col("lang"), explode(col("words")).as("word"))
      .as[(String, String)]
    tokens.groupByKey(_._1)
      .agg(new TopKWords(k).toColumn.name("top"))
      .toDF("lang", "top")
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("entry._1").as("word"), col("entry._2").as("n"))
      .orderBy("lang", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_words" -> ((s, d) => topWordsPerLang(Tables.documents(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_topk_words" ->
      """WITH w AS (
           SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
           FROM documents),
         c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1, 2),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rnk FROM c)
         SELECT lang, CAST(rnk AS INT) AS rank, word, n
         FROM r WHERE rnk <= 5 ORDER BY lang, rank"""
  )
}
