package graft.text

import org.apache.spark.sql.DataFrame
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
}
