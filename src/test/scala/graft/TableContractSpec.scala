package graft

import org.scalatest.funsuite.AnyFunSuite

/** Loader-schema contract: every table, as loaded through `Tables`, must
  * present exactly this (name, type) schema. The testdata generator has
  * silently changed physical encodings between rounds (events.ts went
  * TIMESTAMP(NANOS) → timestamp[us] before round 7 and broke 41 queries at
  * plan time); this spec makes the next drift fail HERE, in one place, with
  * the table and column named — instead of as dozens of identical analysis
  * errors scattered across the suites. */
class TableContractSpec extends AnyFunSuite {
  import TestSession._

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // events.ts is normalized by Tables.events whatever the physical
    // encoding (ns-as-long, µs NTZ, µs UTC) — the contract is the
    // POST-normalization type every operator depends on.
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("all 10 loaders present the contracted (name, type) schema") {
    val problems = Tables.all.flatMap { t =>
      val df = t match {
        case "events" => Tables.events(spark, sf)
        case other    => Tables.load(spark, sf, other)
      }
      val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      val want = expected(t)
      if (actual == want) Nil
      else {
        val diffs = want.zipAll(actual, "<missing>" -> "", "<extra-column>" -> "")
          .collect { case (w, a) if w != a => s"expected $w, got $a" }
        Seq(s"table `$t`: ${diffs.mkString("; ")}")
      }
    }
    assert(problems.isEmpty,
      s"\nTestdata schema drift detected (fix graft.Tables loaders or " +
        s"update this contract):\n  ${problems.mkString("\n  ")}")
  }

  test("events.ts normalization handles both historical physical encodings") {
    import org.apache.spark.sql.functions._
    // Current physical encoding (whatever it is) → TimestampType.
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // Long nanos (the pre-r7 encoding) → same instants after the shim.
    val asNanos = ev.select(col("event_id"),
      (unix_micros(col("ts")) * lit(1000L)).as("ts"))
    val roundTripped = Tables.normalizeEventTs(asNanos)
    assert(roundTripped.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val mismatches = roundTripped.alias("a")
      .join(ev.alias("b"), "event_id")
      .filter(col("a.ts") =!= col("b.ts")).count()
    assert(mismatches == 0, "nanos-shim round trip changed instants")
  }

  test("a non-UTC session fails loudly instead of being silently re-zoned") {
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val e = intercept[IllegalStateException] { Tables.events(spark, sf) }
      assert(e.getMessage.contains("UTC"), s"unhelpful message: ${e.getMessage}")
      val es = intercept[IllegalStateException] {
        graft.streaming.EventStream.readEvents(spark, sf)
      }
      assert(es.getMessage.contains("UTC"))
    } finally spark.conf.set(key, saved)
  }
}
