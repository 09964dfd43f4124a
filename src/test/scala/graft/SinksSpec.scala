package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sinks

class SinksSpec extends AnyFunSuite {
  import TestSession._

  /** Recursive delete — deleteOnExit can't remove the non-empty parquet/
    * checkpoint trees Spark creates under the scratch dirs. */
  private def rmTree(root: String): Unit = {
    import java.nio.file.{Path, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  test("exactly-once parquet sink: complete, idempotent under replay, restart-safe") {
    val target = Files.createTempDirectory("graft-sink-t").toString
    val checkpoint = Files.createTempDirectory("graft-sink-c").toString
    val projected = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("event_id"), col("user_id"), col("event_type"))
    try {
    // stage the source ONCE: the checkpoint's file-source offsets record
    // absolute paths, so the restart in step 3 must read the SAME
    // directory (readEvents stages a fresh scratch dir per call, which
    // would make every file look new to a reused checkpoint)
    val staged = graft.streaming.Staging.stageParquet(sf, "events", "graft-sink-src")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def source() = projected(Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(staged)))

    // 1) drain the finite stream — every source row lands exactly once
    Sinks.exactlyOnceParquet(source(), target, checkpoint)
    val written = spark.read.parquet(target)
    val batch = projected(Tables.events(spark, sf))
    assert(written.count() == batch.count())
    assert(written.drop("batch_id").exceptAll(batch).count() == 0)
    assert(batch.exceptAll(written.drop("batch_id")).count() == 0)

    // 2) at-least-once replay: re-deliver an already-written batch with
    // the SAME batchId — the dynamic partition overwrite must replace,
    // not append, leaving the target byte-equal in row content
    // partition-directory columns read back with inferred (int) type
    val batchIds = written.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val replayId = batchIds.head
    val replayRows = written.filter(col("batch_id") === replayId).drop("batch_id")
    Sinks.writeBatch(target)(replayRows, replayId)
    val after = spark.read.parquet(target)
    assert(after.count() == batch.count(), "replay must not duplicate rows")
    assert(after.drop("batch_id").exceptAll(batch).count() == 0)

    // 3) restart with the same checkpoint + fully-consumed source: the
    // commit log must skip every batch, writing nothing new
    Sinks.exactlyOnceParquet(source(), target, checkpoint)
    assert(spark.read.parquet(target).count() == batch.count(),
      "restart over a committed checkpoint must be a no-op")
    } finally {
      rmTree(target)
      rmTree(checkpoint)
    }
  }
}
