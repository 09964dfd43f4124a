package graft.sources

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persist + version the SERVING artifacts — the build-once/load-forever
  * half of the engine's artifact story. Every serving gate consumes a
  * bounded frame that never grows with the corpus (a BPE merge table,
  * the 8 KB Bloom bit array, IVF centroids + PQ codebooks, DSIR token
  * weights, the chunk index row); the streaming twins already prove the
  * SERVE half against frozen in-memory frames, and this module closes
  * the loop: write the artifact to parquet stamped with a content
  * version (the reference's `_generate_feature_version` device —
  * feature_store_manager.py — generalized from a column list to frame
  * content), reload it in a later session, verify the stamp against the
  * recomputed content, and serve bit-equal (StorageSpec).
  *
  * The version is the first 8 md5 hex chars over the schema line plus
  * the SORTED rendered rows — order-insensitive, so two builds of a
  * deterministic artifact version identically however their partitions
  * arrive. Artifacts are collected to the driver for hashing by
  * DESIGN: bounded size is the defining property of a serving artifact
  * (the 100 TB corpus is upstream of the build, never inside the
  * artifact), so the collect is a few KB. Frames with
  * nondeterministically-ordered NESTED collections (a collect_list'ed
  * map) version stably across save/load (parquet preserves entry
  * order) but not necessarily across rebuilds — the deterministic
  * artifacts (merge tables, bloom bits, weights) version stably across
  * both, spec-pinned. */
object Artifacts {

  private val stampCol = "artifact_version"

  /** Content version of an artifact frame: md5(schema + sorted rows),
    * first 8 hex chars. */
  def artifactVersion(df: DataFrame): String = {
    val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString(",")
    val rows = df.collect().map(_.toString).sorted.mkString("\n")
    MessageDigest.getInstance("MD5")
      .digest((schema + "\n" + rows).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
  }

  /** Content version of a CORPUS-SIZED frame — the distributed twin of
    * [[artifactVersion]] for frames that GROW with the corpus (chunk
    * index parts: embeddings, postings, df, stats) and therefore can
    * never be collected: an order-insensitive aggregate over per-row
    * xxhash64 — exact decimal SUM (wrap-free at any row count), XOR,
    * and COUNT of the row hashes — folded with the schema line into
    * the same 8-hex md5 stamp. One map-side-combined pass, no driver
    * materialization; partition order and count cannot move it, so two
    * builds (or a build and its parquet round-trip) of the same logical
    * content version identically. */
  def distributedVersion(df: DataFrame): String = {
    val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString(",")
    val agg = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("h").cast("decimal(38,0)")), lit(0)).cast("string").as("hs"),
        coalesce(expr("bit_xor(h)"), lit(0L)).cast("string").as("hx"))
      .head
    val content = s"$schema\n${agg.getAs[Long]("n")}|${agg.getAs[String]("hs")}|${agg.getAs[String]("hx")}"
    MessageDigest.getInstance("MD5")
      .digest(content.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
  }

  /** The out-of-band version record for corpus-sized parts. The in-row
    * stamp alone has a hole for TOTAL truncation — a part whose
    * row-bearing files are ALL lost carries no stamp rows at all and
    * would verify as a legitimately-empty artifact. The sidecar (an
    * `_`-prefixed file, invisible to parquet readers like _SUCCESS)
    * records the expected content version at save time, so an
    * emptied-out part fails loudly at load. */
  private val sidecarName = "_VERSION"

  private def sidecarPath(dir: String, name: String) =
    new org.apache.hadoop.fs.Path(s"$dir/$name/$sidecarName")

  private def writeSidecar(df: DataFrame, dir: String, name: String,
                           v: String): Unit = {
    val p = sidecarPath(dir, name)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  private def readSidecar(spark: SparkSession, dir: String, name: String): String = {
    val p = sidecarPath(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"$dir/$name has no $sidecarName sidecar — incomplete or pre-sidecar save")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Write a CORPUS-SIZED frame to `dir/name` with its
    * [[distributedVersion]] recorded in the `_VERSION` sidecar; keeps
    * the frame's own partitioning, unlike the bounded-artifact [[save]].
    *
    * The part is written FIRST and the stamp is computed from the
    * WRITTEN parquet — ONE evaluation of `df` where the r15 form
    * evaluated each corpus-sized part twice (stamp pass, then write
    * pass; the verdict-flagged half of q_chunk_parts_loaded's cost).
    * The version-of-what-was-written is definitionally what load must
    * verify, and every artifact column type round-trips parquet exactly
    * (long / string / array<bigint> / decimal), so the stamp value is
    * unchanged. No in-row stamp column anymore: the load-time
    * recompute-vs-sidecar comparison covers every corruption class the
    * in-row stamp did (lost file, flipped value, injected row, total
    * truncation), and a crash between write and sidecar still leaves a
    * part without _VERSION, which [[loadLarge]] fails closed on. */
  def saveLarge(df: DataFrame, dir: String, name: String): String = {
    require(!df.columns.contains(stampCol),
      s"artifact already carries a $stampCol column")
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val v = distributedVersion(df.sparkSession.read.parquet(s"$dir/$name"))
    writeSidecar(df, dir, name, v)
    v
  }

  /** Reload a corpus-sized frame and VERIFY its recomputed
    * [[distributedVersion]] against the `_VERSION` sidecar — corruption
    * (a lost file, a flipped value, an injected row, a fully-truncated
    * part) fails HERE, not as silently-wrong serving results; a
    * legitimately EMPTY part (e.g. a delta with no arrivals) recorded
    * its empty-frame version at save and still matches. ONE pass over
    * the part (the r15 form paid a min/max stamp pass plus the
    * recompute). No collect, no checkpoint: the returned frame stays
    * parquet-backed. */
  def loadLarge(spark: SparkSession, dir: String, name: String): (DataFrame, String) = {
    val raw = spark.read.parquet(s"$dir/$name")
    // pre-r16 parts carried an in-row stamp column; drop it so their
    // content still verifies against their sidecar
    val df = if (raw.columns.contains(stampCol)) raw.drop(stampCol) else raw
    val recomputed = distributedVersion(df)
    val expected = readSidecar(spark, dir, name)
    require(recomputed == expected,
      s"artifact $name corrupt: sidecar $expected, content $recomputed")
    (df, recomputed)
  }

  /** Write `df` to `dir/name` stamped with its content version; returns
    * the version. One file — an artifact is bounded by construction. */
  def save(df: DataFrame, dir: String, name: String): String = {
    require(!df.columns.contains(stampCol),
      s"artifact already carries a $stampCol column")
    val v = artifactVersion(df)
    df.withColumn(stampCol, lit(v))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    v
  }

  /** Reload an artifact and VERIFY its stamp against the recomputed
    * content version — a corrupt or partially-written artifact fails
    * here, not as silently-wrong serving results. Returns the frame
    * (stamp dropped) and the verified version. */
  def load(spark: SparkSession, dir: String, name: String): (DataFrame, String) = {
    val raw = spark.read.parquet(s"$dir/$name")
    require(raw.columns.contains(stampCol),
      s"$dir/$name is not a stamped artifact")
    val stamps = raw.select(stampCol).distinct().collect().map(_.getString(0))
    require(stamps.length == 1,
      s"artifact $name carries ${stamps.length} distinct version stamps")
    val df = raw.drop(stampCol).localCheckpoint()
    val recomputed = artifactVersion(df)
    require(recomputed == stamps.head,
      s"artifact $name corrupt: stamped ${stamps.head}, content $recomputed")
    (df, stamps.head)
  }
}
