package graft.ml

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Feature-view registry + lineage metadata ops.
  *
  * Re-expresses /root/reference/ml_platform/feature_store/
  * feature_store_manager.py:631-692 (`create_feature_view`,
  * `_generate_feature_version`, `get_feature_lineage`) Spark-first:
  *   - a feature view is a NAMED, VERSIONED temp view in the session
  *     catalog (the reference stores a JSON config in Redis; the Spark
  *     catalog is the idiomatic serving-registry equivalent, and the
  *     view stays lazy — consumers get the optimized plan, not a copy);
  *   - the version hash is the reference's md5-of-sorted-features[:8];
  *   - lineage is derived from the CATALYST LOGICAL PLAN — actual
  *     source tables and transformation kinds walked from the view's
  *     plan tree, where the reference returns hard-coded mock lineage.
  *
  * Catalog metadata only — nothing here touches the data path, so the
  * cost is independent of data scale.
  */
object FeatureViews {

  final case class FeatureView(
      name: String,
      entity: String,
      features: Seq[String],
      version: String,
      ttlSeconds: Long)

  final case class Lineage(
      featureView: String,
      sourceTables: Seq[String],
      transformations: Seq[String])

  /** md5 of the comma-joined SORTED feature list, first 8 hex chars —
    * byte-compatible with the reference's `_generate_feature_version`. */
  def featureVersion(features: Seq[String]): String = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(features.sorted.mkString(",").getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString.take(8)
  }

  /** Register `df`'s selected feature columns as the catalog temp view
    * `fv_<name>` and return its metadata. The projection is validated
    * eagerly (unknown feature names fail here, not at serve time). */
  def createFeatureView(name: String, entity: String, features: Seq[String],
                        df: DataFrame, ttlSeconds: Long = 86400L): FeatureView = {
    val projected = df.select((entity +: features).map(df.col): _*)
    projected.createOrReplaceTempView(s"fv_$name")
    FeatureView(name, entity, features, featureVersion(features), ttlSeconds)
  }

  /** Resolve the registered view and walk its logical plan. */
  def lineageOf(dfName: String, df: DataFrame): Lineage = {
    // the ANALYZED plan, not the optimized one: the optimizer rewrites
    // Distinct into Aggregate (and can eliminate Sorts), so lineage
    // walked post-optimization misreports the user-visible
    // transformation kinds this registry documents
    val plan = df.queryExecution.analyzed
    val sources = plan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map { p =>
            val base = p.getName
            if (base.endsWith(".parquet")) base.stripSuffix(".parquet") else base
          }
        case other => Seq(other.toString)
      }
    }.flatten.distinct
    val transformations = plan.collect {
      case _: Aggregate => "aggregation"
      case _: Join => "join"
      case _: Window => "window_function"
      case _: Filter => "filter"
      case _: Generate => "explode"
      case _: Sort => "sort"
      case _: Union => "union"
      case _: Distinct => "distinct"
    }.distinct
    Lineage(dfName, sources, transformations)
  }

  /** Lineage of a registered feature view by name. */
  def featureLineage(name: String, spark: org.apache.spark.sql.SparkSession): Lineage =
    lineageOf(name, spark.table(s"fv_$name"))
}
