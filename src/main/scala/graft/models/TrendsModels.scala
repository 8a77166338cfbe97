package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.engine._
import graft.engine.Materialization.{Table, View}
import graft.engine.Functions._

/** The reference's 7-model DAG re-expressed in the DataFrame API
  * (SURVEY.md §0 DAG diagram), with all 68 declarative data tests
  * ported verbatim from the model YAMLs (SURVEY.md §2.8).
  *
  * Staging = View (lazy, Catalyst-inlined), marts = Table — matching
  * `dbt_project.yml:33-38`.
  */
object TrendsModels {

  // ---------------------------------------------------------------- staging
  // Each staging model is a projection fixing column order
  // (reference `models/staging/stg_top_terms.sql:11-25` et al.).

  val stgTopTerms: Model = Model(
    "stg_top_terms",
    Seq("top_terms"),
    View,
    tests = Seq("dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank").map(NotNull)
  )(in => in("top_terms").select("dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank"))

  val stgTopRisingTerms: Model = Model(
    "stg_top_rising_terms",
    Seq("top_rising_terms"),
    View,
    tests = Seq("dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank", "percent_gain").map(NotNull)
  )(in =>
    in("top_rising_terms")
      .select("dma_id", "dma_name", "term", "refresh_date", "week", "score", "rank", "percent_gain"))

  /** region_code / region_name deliberately untested
    * (`stg_international_top_terms.yml:9-10,15-16`).
    */
  val stgInternationalTopTerms: Model = Model(
    "stg_international_top_terms",
    Seq("international_top_terms"),
    View,
    tests = Seq("country_code", "country_name", "term", "refresh_date", "week", "score", "rank").map(NotNull)
  )(in =>
    in("international_top_terms")
      .select("country_code", "country_name", "region_code", "region_name",
        "term", "refresh_date", "week", "score", "rank"))

  val stgInternationalTopRisingTerms: Model = Model(
    "stg_international_top_rising_terms",
    Seq("international_top_rising_terms"),
    View,
    tests =
      Seq("country_code", "country_name", "term", "refresh_date", "week", "score", "rank", "percent_gain").map(NotNull)
  )(in =>
    in("international_top_rising_terms")
      .select("country_code", "country_name", "region_code", "region_name",
        "term", "refresh_date", "week", "score", "rank", "percent_gain"))

  // ------------------------------------------------------------------ marts

  /** `models/marts/top_terms_comparison.sql:1-66`: international + US
    * branches unified by positional UNION ALL (geo key cast to string,
    * typed NULL region on the US side), then rank_category /
    * interest_level CASE buckets.
    */
  val topTermsComparison: Model = Model(
    "top_terms_comparison",
    Seq("stg_international_top_terms", "stg_top_terms"),
    Table,
    tests = Seq("scope", "geo_name", "geo_code", "term", "week", "refresh_date", "score", "rank",
      "rank_category", "interest_level").map(NotNull) ++ Seq(
      AcceptedValues("scope", Seq("international", "us_dma")),
      AcceptedValues("rank_category", Seq("#1 Term", "Top 5", "Top 10", "Other")),
      AcceptedValues("interest_level",
        Seq("Very High Interest", "High Interest", "Moderate Interest", "Low Interest", "Very Low Interest"))
    )
  ) { in =>
    val intl = in("stg_international_top_terms").select(
      lit("international").as("scope"),
      col("country_name").as("geo_name"),
      col("country_code").as("geo_code"),
      col("region_name"),
      col("term"), col("week"), col("refresh_date"), col("score"), col("rank"))
    val us = in("stg_top_terms").select(
      lit("us_dma").as("scope"),
      col("dma_name").as("geo_name"),
      col("dma_id").cast(StringType).as("geo_code"),
      lit(null).cast(StringType).as("region_name"),
      col("term"), col("week"), col("refresh_date"), col("score"), col("rank"))
    intl.union(us) // positional UNION ALL — NOT unionByName (SURVEY.md §4 trap 3)
      .withColumn("rank_category", rankCategory(col("rank")))
      .withColumn("interest_level", interestLevel(col("score")))
  }

  /** `models/marts/trending_terms_analysis.sql:1-77`. */
  val trendingTermsAnalysis: Model = Model(
    "trending_terms_analysis",
    Seq("stg_international_top_rising_terms", "stg_top_rising_terms"),
    Table,
    tests = Seq("scope", "geo_name", "geo_code", "term", "week", "refresh_date", "score", "rank",
      "percent_gain", "rank_tier", "growth_category").map(NotNull) ++ Seq(
      AcceptedValues("scope", Seq("international", "us_dma")),
      AcceptedValues("rank_tier", Seq("Top 5", "Top 10", "Top 25", "Other")),
      AcceptedValues("growth_category",
        Seq("Explosive (1000%+)", "Very High (500-999%)", "High (200-499%)", "Moderate (100-199%)", "Low (<100%)"))
    )
  ) { in =>
    val intl = in("stg_international_top_rising_terms").select(
      lit("international").as("scope"),
      col("country_name").as("geo_name"),
      col("country_code").as("geo_code"),
      col("region_name"),
      col("term"), col("week"), col("refresh_date"), col("score"), col("rank"), col("percent_gain"))
    val us = in("stg_top_rising_terms").select(
      lit("us_dma").as("scope"),
      col("dma_name").as("geo_name"),
      col("dma_id").cast(StringType).as("geo_code"),
      lit(null).cast(StringType).as("region_name"),
      col("term"), col("week"), col("refresh_date"), col("score"), col("rank"), col("percent_gain"))
    intl.union(us)
      .withColumn("rank_tier", rankTier(col("rank")))
      .withColumn("growth_category", growthCategory(col("percent_gain")))
  }

  /** `models/marts/weekly_trends_summary.sql:1-112`: four per-grain
    * hash-aggregates (one per staging input) positionally unioned,
    * rounded, categorized, globally sorted.
    *
    * Scale note: the four branches are independent aggregation stages;
    * each does a map-side partial aggregate before its shuffle
    * (HashAggregateExec partial+final), and countDistinct stays exact
    * (SURVEY.md §2.4 A5 — do not substitute approx_count_distinct).
    */
  val weeklyTrendsSummary: Model = Model(
    "weekly_trends_summary",
    Seq("stg_international_top_rising_terms", "stg_international_top_terms",
      "stg_top_rising_terms", "stg_top_terms"),
    Table,
    tests = Seq("week", "refresh_date", "trend_type", "total_terms", "avg_score", "unique_geos",
      "trend_category", "market_scope").map(NotNull) ++ Seq(
      AcceptedValues("trend_type", Seq("international_rising", "international_top", "us_rising", "us_top")),
      AcceptedValues("trend_category", Seq("Rising Trends", "Top Trends")),
      AcceptedValues("market_scope", Seq("International", "US Market"))
    )
  ) { in =>
    // One branch of the 4× repeated pattern
    // (`weekly_trends_summary.sql:5-83`): group by (week, refresh_date),
    // count/avg/max + exact distinct-geo count; non-rising branches emit
    // typed NULL gain columns (`:24-25,52-53`).
    def branch(df: DataFrame, trendType: String, geoCol: String, hasGain: Boolean): DataFrame = {
      val aggs =
        if (hasGain)
          Seq(
            count(lit(1)).as("total_terms"),
            avg(col("score")).as("avg_score"),
            avg(col("percent_gain")).as("avg_percent_gain"),
            max(col("percent_gain")).as("max_percent_gain"),
            countDistinct(col(geoCol)).as("unique_geos"))
        else
          Seq(
            count(lit(1)).as("total_terms"),
            avg(col("score")).as("avg_score"),
            lit(null).cast(DoubleType).as("avg_percent_gain"),
            lit(null).cast(DoubleType).as("max_percent_gain"),
            countDistinct(col(geoCol)).as("unique_geos"))
      df.groupBy(col("week"), col("refresh_date"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("week"), col("refresh_date"), lit(trendType).as("trend_type"),
          col("total_terms"), col("avg_score"), col("avg_percent_gain"),
          col("max_percent_gain"), col("unique_geos"))
    }

    val combined =
      branch(in("stg_international_top_rising_terms"), "international_rising", "country_name", hasGain = true)
        .union(branch(in("stg_international_top_terms"), "international_top", "country_name", hasGain = false))
        .union(branch(in("stg_top_rising_terms"), "us_rising", "dma_name", hasGain = true))
        .union(branch(in("stg_top_terms"), "us_top", "dma_name", hasGain = false))

    combined
      .select(
        col("week"), col("refresh_date"), col("trend_type"), col("total_terms"),
        round(col("avg_score"), 2).as("avg_score"),
        round(col("avg_percent_gain"), 2).as("avg_percent_gain"),
        col("max_percent_gain"), col("unique_geos"),
        trendCategory(col("trend_type")).as("trend_category"),
        marketScope(col("trend_type")).as("market_scope"))
      .orderBy(col("week").desc, col("trend_type"))
  }

  val all: Seq[Model] = Seq(
    stgTopTerms, stgTopRisingTerms, stgInternationalTopTerms, stgInternationalTopRisingTerms,
    topTermsComparison, trendingTermsAnalysis, weeklyTrendsSummary)

  /** Run the full reference DAG over the in-code fixtures. */
  def run(spark: org.apache.spark.sql.SparkSession,
          sink: TableSink = new TableSink.Cached): RunResult =
    new DagRunner(new MapCatalog(TrendsFixtures.catalog(spark)), sink).run(all)
}
