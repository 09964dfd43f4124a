package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Session-scoped memo for the narrow eager probes the adaptive-plan
  * devices run (row counts that pick a physical form: IVF cell counts,
  * LSH band widths, the RFM window/indexed-sort switch).
  *
  * Different queries in one run repeatedly probe the SAME logical frame
  * (e.g. every ANN operator counts the embeddings table to size its
  * cells); each probe is a full driver-blocking Spark job whose cost is
  * dominated by fixed scheduling overhead. Keying by the CANONICALIZED
  * analyzed plan (expression ids normalized, so independently-built
  * identical reads produce the same key) collapses those repeats into
  * one job per distinct frame.
  *
  * The canonicalized string alone is NOT a sound key: canonicalization
  * erases column names and `HadoopFsRelation.toString` omits the file
  * path, so two parquet reads of DIFFERENT directories with same-typed
  * schemas canonicalize identically. The key therefore appends each
  * leaf's concrete identity — file-source root paths, checkpoint RDD
  * ids, output column names — and any plan with a leaf that has no
  * stable identity (e.g. a LocalRelation, whose in-memory rows are
  * invisible to the plan string) is simply NOT cached: the probe runs,
  * correct but unmemoized.
  *
  * Contract: only sound for DETERMINISTIC plans over inputs that are
  * immutable for the life of the session — exactly the shape of the
  * probed frames (parquet table scans plus deterministic projections/
  * filters). A host app that rewrites table files mid-session calls
  * [[clear()]].
  */
object PlanStats {

  private val MaxEntries = 256

  // java.lang.Long values: a miss must surface as null, not unbox to 0
  private val cache =
    new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > MaxEntries
    }

  /** Stable cache key, or None when any leaf lacks a session-stable
    * identity (then the caller counts without caching). */
  private def key(df: DataFrame): Option[String] = {
    val plan = df.queryExecution.analyzed
    // RDD ids restart with every SparkContext, so a checkpoint leaf's id
    // is only unique WITHIN one application — prefix it with the app id
    // or a restarted context could hit a stale count cached by the
    // previous one (the cache itself is JVM-global).
    val appId = df.sparkSession.sparkContext.applicationId
    val leafIds = plan.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some("fs:" + fs.location.rootPaths.mkString(","))
        case _ => None // non-file DSv1 relation: no stable printable identity
      }
      case rdd: LogicalRDD => Some(s"rdd:$appId:${rdd.rdd.id}") // checkpointed lineage
      // v2 relations are NOT cached: snapshot/version/time-travel options
      // live outside both the name and the canonicalized JSON, so two
      // reads of the same table at different versions would share a key
      case _: DataSourceV2Relation => None
      case _ => None // LocalRelation etc.: data not visible in the plan string
    }
    if (leafIds.exists(_.isEmpty)) None
    else {
      // toJSON, not toString: the tree STRING truncates each node at
      // spark.sql.debug.maxToStringFields fields ("... N more fields"),
      // so two wide plans differing only past the cutoff would collide
      // and return each other's cached counts. The JSON form serializes
      // every field; a node that can't serialize falls back to uncached
      // (correct, just not memoized). The composed key is digested to a
      // constant size so the map never pins multi-hundred-KB plan
      // strings for the life of the JVM (sha-256: collision probability
      // is negligible against 256 retained entries).
      scala.util.Try(plan.canonicalized.toJSON).toOption.map { js =>
        val full = js + "|" + plan.output.map(_.name).mkString(",") +
          "|" + leafIds.flatten.mkString(";")
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }
  }

  /** `df.count()`, memoized by canonical plan + concrete leaf identity. */
  def rowCount(df: DataFrame): Long = {
    key(df) match {
      case None => df.count()
      case Some(k) =>
        val hit = cache.synchronized(Option(cache.get(k)))
        hit.map(_.longValue()).getOrElse {
          val n = df.count()
          cache.synchronized(cache.put(k, java.lang.Long.valueOf(n)))
          n
        }
    }
  }

  def clear(): Unit = cache.synchronized(cache.clear())
}
