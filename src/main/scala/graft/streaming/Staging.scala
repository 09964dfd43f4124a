package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Scratch staging for the file-stream sources: the test layout exposes
  * each table as `<dir>/<table>.parquet`, which may be a single parquet
  * FILE (driver testdata) or a parquet DIRECTORY of part files (any
  * Spark-written table). The file-stream source needs a directory of
  * data files and does NOT recurse into a symlinked subdirectory, so
  * each data file is staged as its own top-level symlink. The scratch
  * dir is per-call and cleaned at JVM exit (deleteOnExit runs in
  * reverse registration order — dir first, links after, so the links
  * inside delete before the dir). A real deployment points the stream
  * straight at its landing directory and never takes this path. */
object Staging {

  /** Returns the scratch directory to hand to `readStream.parquet`. */
  def stageParquet(dir: String, table: String, scratchPrefix: String): String = {
    val streamDir = Files.createTempDirectory(scratchPrefix)
    streamDir.toFile.deleteOnExit()
    val src = Paths.get(s"$dir/$table.parquet")
    val dataFiles: List[Path] =
      if (Files.isDirectory(src)) {
        val s = Files.list(src)
        try s.iterator().asScala.toList
          .filter(_.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      } else List(src)
    dataFiles.zipWithIndex.foreach { case (f, i) =>
      Files.createSymbolicLink(streamDir.resolve(f"part-$i%05d.parquet"), f)
        .toFile.deleteOnExit()
    }
    streamDir.toString
  }
}
