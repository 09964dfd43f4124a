package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the test-data star schema (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned/bucketed
  * parquet or Iceberg); the loaders stay the single choke point where that
  * swap happens — every operator takes a DataFrame, never a path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** Normalize the `ts` column to TimestampType regardless of the physical
    * parquet encoding the test-data generator happened to use:
    *  - TIMESTAMP(NANOS): Spark 4 reads it as Long (with nanosAsLong);
    *    truncate to microseconds — exactly what DuckDB does when it
    *    materializes ns parquet, so the oracle sees identical instants.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TimestampType (value-preserving under the
    *    UTC session zone every entry point sets).
    *  - TimestampType: already what downstream operators expect.
    * Anything else fails loudly with the observed type. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other; expected ns-as-long, timestamp_ntz, or timestamp")
    }
  }

  /** The UTC session zone is an engine-wide CONTRACT, not a side effect:
    * every oracle comparison and every timestamp-bearing operator in this
    * library assumes it, and the graft entry points (Verify, Bench, the
    * tools mains, the test session, the streaming readers) pin it at
    * session build. This loader therefore ASSERTS the zone instead of
    * silently overwriting it — a host application deliberately running
    * non-UTC fails loudly here rather than having the behavior of every
    * subsequent timestamp expression flipped under it. If the generator
    * ever reverts events.ts to TIMESTAMP(NANOS), set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at session build (the
    * entry points do) so the read lands on the Long branch of
    * [[normalizeEventTs]] instead of Spark refusing the file. */
  /** The one shared UTC-contract assertion — the batch loader and the
    * streaming readers enforce the SAME check through this helper, so
    * the contract can never drift between the two paths. */
  def requireUtcSession(s: SparkSession): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone")
    if (tz != "UTC") throw new IllegalStateException(
      s"graft requires spark.sql.session.timeZone=UTC (found '$tz'): " +
        "timestamp semantics and oracle parity are defined under UTC. " +
        "Pin it at SparkSession build; graft will not overwrite a host's zone.")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    requireUtcSession(s)
    normalizeEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
