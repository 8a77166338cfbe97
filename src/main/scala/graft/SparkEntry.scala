package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.Inventory
import graft.ext.{AsOf, Clusters, Dedup, Graph, KMeans, Multimodal, Pipelines, Sessions, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Reference-surface operators (SURVEY.md §2) + LLM-pipeline
    * extensions (dedup / similarity / text analysis / sessions).
    */
  private def registry: Seq[(String, Inventory.Q)] =
    Inventory.all ++ TextAnalysis.queries ++ Dedup.queries ++ Clusters.queries ++
      Similarity.queries ++ KMeans.queries ++ Sessions.queries ++ Multimodal.queries ++
      Pipelines.queries ++ AsOf.queries ++ Graph.queries ++
      graft.models.AnnIndexPipeline.queries
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `weekly_trends_summary` mart shape (the reference's richest
    * model) over the harness `events` table.
    */
  def entry(spark: SparkSession): DataFrame =
    Inventory.martWeeklyEventsSummary.build(spark, "/root/testdata/sf0.001")

  /** Registry names IN SEQ ORDER (pre-Map) — lets ReadmeSpec detect a
    * cross-module name collision that the Map construction would
    * silently collapse.
    */
  private[graft] def registryNames: Seq[String] = registry.map(_._1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }.toMap
}
