package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** One record per multimodal asset: opaque payload + typed metadata.
  * This is the schema a 100 TB image/audio/video lake carries — the
  * payload stays an opaque binary column end to end; only metadata is
  * columnar. */
case class Asset(doc_id: Long, payload: Array[Byte], format: String,
                 width: Int, height: Int, n_frames: Int)

/** Decoded features produced by the (stubbed) decoder. */
case class AssetFeatures(doc_id: Long, format: String, byte_len: Long,
                         mean_luma: Double, n_patches: Int)

/** Multimodal column plumbing.
  *
  * Real multimodal pipelines ship image/audio bytes as parquet `binary`
  * columns and run decode / feature-extraction per partition (Spark's
  * Scala twin of `mapInPandas`): here [[decodeFeatures]] demonstrates the
  * production shape — `Dataset[Asset].mapPartitions` with a per-partition
  * "decoder" — while the decoder itself is a DETERMINISTIC STUB (this
  * container has no image libs; a real deployment swaps `stubDecode`
  * for libjpeg/ffmpeg and nothing else changes).
  */
object Multimodal {

  /** Build an asset table from documents: text bytes stand in for media
    * payloads; metadata is derived deterministically. */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, "jpeg")
        .when(pmod(col("doc_id"), lit(3)) === 1, "png")
        .otherwise("webp").as("format"),
      pmod(col("n_chars"), lit(640)).cast("int").as("width"),
      pmod(col("n_chars") * 7, lit(480)).cast("int").as("height"),
      (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames"))

  /** STUB decoder: deterministic fake of "decode image, compute mean
    * luma". A real decoder reads `a.payload` with an image library; the
    * batch shape (one partition in, iterator out, no driver involvement)
    * is exactly what production uses. */
  private def stubDecode(a: Asset): AssetFeatures = {
    val lenSum = a.payload.length.toLong
    val luma = ((lenSum * 31 + a.doc_id * 7) % 256).toDouble / 255.0
    AssetFeatures(a.doc_id, a.format, lenSum,
      math.floor(luma * 10000 + 0.5) / 10000,
      math.max(1, (a.width / 16) * (a.height / 16)))
  }

  /** Per-partition decode: the Spark-side plumbing that matters at scale
    * (batched, executor-local, zero driver round-trips). */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(stubDecode))
  }

  /** Metadata + stub-decoded features as a plain DataFrame query
    * (column-expression twin of [[decodeFeatures]], used for the oracle
    * check; same formulas). */
  def metaQuery(documents: DataFrame): DataFrame =
    assets(documents)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("mean_luma",
        r4(pmod(col("byte_len") * 31 + col("doc_id") * 7, lit(256)) / 255d))
      .withColumn("n_patches",
        greatest(lit(1), (col("width").cast("int") / 16).cast("int") * (col("height").cast("int") / 16).cast("int")))
      .select("doc_id", "format", "width", "height", "n_frames", "byte_len",
        "mean_luma", "n_patches")
      .orderBy("doc_id")

  /** Frame sampling + resize planning — the video half of the multimodal
    * pipeline: every asset expands to its stride-sampled frame rows
    * (explode of a bounded sequence — the 1-to-many shape that stays
    * embarrassingly parallel at any corpus size), each row carrying the
    * clip timestamp, the aspect-preserving resize target (fit within
    * `fit`×`fit`, never upscale), and a stub per-frame luma where a real
    * pipeline runs the decoder ([[stubDecode]]'s contract). */
  def frameSample(documents: DataFrame, stride: Int = 5,
                  fps: Int = 24, fit: Int = 224): DataFrame = {
    val scale = least(lit(fit) / col("width"), lit(fit) / col("height"), lit(1.0))
    assets(documents)
      .withColumn("frame_idx0", explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .withColumn("frame_idx", col("frame_idx0").cast("int"))
      .withColumn("ts_offset_s", r4(col("frame_idx") / lit(fps.toDouble)))
      .withColumn("out_w",
        when(col("width") > 0 && col("height") > 0,
          greatest(lit(1), floor(col("width") * scale))).otherwise(lit(0)).cast("int"))
      .withColumn("out_h",
        when(col("width") > 0 && col("height") > 0,
          greatest(lit(1), floor(col("height") * scale))).otherwise(lit(0)).cast("int"))
      .withColumn("frame_luma",
        r4(pmod(col("doc_id") * 131 + col("frame_idx") * 17, lit(256)) / 255d))
      .select("doc_id", "frame_idx", "ts_offset_s", "format",
        "width", "height", "out_w", "out_h", "frame_luma")
      .orderBy("doc_id", "frame_idx")
  }

  /** Audio segmentation — the audio half of the multimodal pipeline
    * (the [[frameSample]] twin): every asset expands into overlapping
    * fixed-duration windows (`windowMs` every `hopMs` — the standard
    * speech-pretraining chunker), each row carrying exact sample
    * offsets, the final-partial flag with its pad amount, and a stub
    * per-segment RMS where a real pipeline runs the codec. Metadata
    * (sample rate, duration) is derived deterministically from the doc
    * fields the way [[assets]] fakes image headers. Row-local explode
    * of a bounded sequence — shuffle-free at any corpus size. */
  def audioSegments(documents: DataFrame, windowMs: Int = 30000,
                    hopMs: Int = 20000): DataFrame = {
    documents.select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, 16000)
          .when(pmod(col("doc_id"), lit(3)) === 1, 22050)
          .otherwise(44100).cast("int").as("sample_rate"),
        (pmod(col("n_chars") * 131, lit(600000)) + 1000).cast("long").as("duration_ms"))
      .withColumn("start_ms", explode(expr(s"sequence(0, duration_ms - 1, $hopMs)")))
      .withColumn("seg_idx", floor(col("start_ms") / hopMs).cast("int"))
      .withColumn("end_ms", least(col("start_ms") + windowMs, col("duration_ms")))
      .withColumn("is_partial", col("end_ms") - col("start_ms") < windowMs)
      .withColumn("pad_ms", (lit(windowMs) - (col("end_ms") - col("start_ms"))).cast("long"))
      .withColumn("n_samples",
        floor((col("end_ms") - col("start_ms")) * col("sample_rate") / 1000d).cast("long"))
      .withColumn("rms_stub",
        r4(pmod(col("doc_id") * 37 + col("seg_idx") * 11, lit(1000)) / 1000d))
      .select("doc_id", "sample_rate", "duration_ms", "seg_idx", "start_ms",
        "end_ms", "n_samples", "is_partial", "pad_ms", "rms_stub")
      .orderBy("doc_id", "seg_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, d) => metaQuery(Tables.documents(s, d))),
    "q_frame_sample" -> ((s, d) => frameSample(Tables.documents(s, d))),
    "q_audio_segments" -> ((s, d) => audioSegments(Tables.documents(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                WHEN doc_id % 3 = 1 THEN 'png'
                ELSE 'webp' END AS format,
           CAST(n_chars % 640 AS INT) AS width,
           CAST((n_chars * 7) % 480 AS INT) AS height,
           CAST(doc_id % 30 + 1 AS INT) AS n_frames,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           FLOOR(((octet_length(encode(text)) * 31 + doc_id * 7) % 256 / 255.0) * 10000 + 0.5) / 10000 AS mean_luma,
           GREATEST(1, CAST(FLOOR((n_chars % 640) / 16.0) AS INT) * CAST(FLOOR(((n_chars * 7) % 480) / 16.0) AS INT)) AS n_patches
         FROM documents ORDER BY doc_id""",
    "q_audio_segments" ->
      """WITH a AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 16000
                  WHEN doc_id % 3 = 1 THEN 22050
                  ELSE 44100 END AS sample_rate,
             CAST((n_chars * 131) % 600000 + 1000 AS BIGINT) AS duration_ms
           FROM documents),
         seg AS (SELECT a.*, CAST(t.g AS BIGINT) AS start_ms
           FROM a, UNNEST(generate_series(0, duration_ms - 1, 20000)) AS t(g)),
         e AS (SELECT *,
             CAST(FLOOR(start_ms / 20000.0) AS INT) AS seg_idx,
             LEAST(start_ms + 30000, duration_ms) AS end_ms
           FROM seg)
         SELECT doc_id, CAST(sample_rate AS INT) AS sample_rate, duration_ms,
           seg_idx, start_ms, end_ms,
           CAST(FLOOR((end_ms - start_ms) * sample_rate / 1000.0) AS BIGINT) AS n_samples,
           end_ms - start_ms < 30000 AS is_partial,
           CAST(30000 - (end_ms - start_ms) AS BIGINT) AS pad_ms,
           FLOOR(((doc_id * 37 + seg_idx * 11) % 1000 / 1000.0) * 10000 + 0.5) / 10000 AS rms_stub
         FROM e ORDER BY doc_id, seg_idx""",
    "q_frame_sample" ->
      """WITH a AS (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                  WHEN doc_id % 3 = 1 THEN 'png'
                  ELSE 'webp' END AS format,
             CAST(n_chars % 640 AS INT) AS width,
             CAST((n_chars * 7) % 480 AS INT) AS height,
             CAST(doc_id % 30 + 1 AS INT) AS n_frames
           FROM documents),
         f AS (SELECT a.*, CAST(t.g AS INT) AS frame_idx
           FROM a, UNNEST(generate_series(0, n_frames - 1, 5)) AS t(g)),
         s AS (SELECT *,
             LEAST(224.0 / width, 224.0 / height, 1.0) AS scale
           FROM f)
         SELECT doc_id, frame_idx,
           FLOOR((frame_idx / 24.0) * 10000 + 0.5) / 10000 AS ts_offset_s,
           format, width, height,
           CASE WHEN width > 0 AND height > 0
             THEN CAST(GREATEST(1, FLOOR(width * scale)) AS INT) ELSE 0 END AS out_w,
           CASE WHEN width > 0 AND height > 0
             THEN CAST(GREATEST(1, FLOOR(height * scale)) AS INT) ELSE 0 END AS out_h,
           FLOOR(((doc_id * 131 + frame_idx * 17) % 256 / 255.0) * 10000 + 0.5) / 10000 AS frame_luma
         FROM s ORDER BY doc_id, frame_idx"""
  )
}
