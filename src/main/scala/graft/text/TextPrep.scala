package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns._

/** Shared document preparation for the dedup / text-analysis operators:
  * normalization, tokenization, word-3-gram shingling. All pure column
  * expressions (codegen'd, no UDFs) so the prep fuses into each
  * operator's whole-stage-codegen span.
  */
object TextPrep {

  /** doc_id, norm (lowercased, whitespace-collapsed), words. */
  def withWords(documents: DataFrame): DataFrame =
    documents
      .withColumn("norm", normText(col("text")))
      .withColumn("words", split(col("norm"), " "))

  /** Word-3-gram shingles per doc WITH duplicates: (doc_id, shingle).
    * Docs shorter than 3 words produce no shingles. No shuffle — pure
    * explode. Use this when the consumer is dedup-insensitive (min/max
    * aggregates). */
  def shinglesAll(documents: DataFrame): DataFrame =
    withWords(documents)
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words) - 3), " +
          "i -> concat_ws(' ', words[i], words[i+1], words[i+2]))")).as("shingle"))

  /** Distinct word-3-gram shingles per doc (one dedup shuffle on top of
    * [[shinglesAll]]) — for set semantics (Jaccard, counts). */
  def shingles(documents: DataFrame): DataFrame =
    shinglesAll(documents).distinct()

  /** English stopword list of the BM25 family — the SINGLE source of
    * truth for Vocab.bm25, Ann's hybrid lexical arm, and their oracle
    * SQL (previously four inline copies that could silently drift). */
  private[graft] val stopEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** [[stopEn]] as a SQL IN-list literal for the oracle builders. */
  private[graft] val stopEnSql: String =
    stopEn.map(w => s"'$w'").mkString(", ")

  /** One BM25 term contribution (k1 = 1.2, b = 0.75, Lucene's +1 idf) —
    * shared by Vocab.bm25 and Ann's hybrid lexical arm so the IEEE
    * expression tree is byte-identical in both operators; must mirror
    * [[bm25ContribSql]] exactly or the oracle hashes drift. */
  private[graft] def bm25Contrib(tf: Column, df: Column, dl: Column,
                                 nn: Column, avgdl: Column): Column =
    log((nn - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)) *
      (tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))

  /** DuckDB fragment mirroring [[bm25Contrib]] term for term. */
  private[graft] def bm25ContribSql(tf: String, df: String, dl: String,
                                    nn: String, avgdl: String): String =
    s"ln((CAST($nn - $df AS DOUBLE) + 0.5) / (CAST($df AS DOUBLE) + 0.5) + 1.0)" +
      s" * (CAST($tf AS DOUBLE) * 2.2)" +
      s" / ($tf + 1.2 * (0.25 + 0.75 * $dl / $avgdl))"
}
