package graft.models

import graft.engine._
import graft.engine.Materialization.{Table, View}

/** The SAME 7-model reference DAG as [[TrendsModels]], authored as SQL
  * TEXT via [[Model.sql]] — the way the reference's users actually
  * write models. Model names, dependencies, materializations, and all
  * 68 data tests are shared with the DataFrame authoring (the test
  * sequences are reused object-for-object); `TrendsModelsSpec` asserts
  * the two stylings produce identical marts, so either authoring style
  * is a drop-in for the other.
  *
  * The SQL mirrors the reference model files' shapes: staging
  * projections (`models/staging/stg_top_terms.sql:11-25` et al.), the
  * positional UNION ALL + CASE marts
  * (`models/marts/top_terms_comparison.sql:1-66`,
  * `trending_terms_analysis.sql:1-77`), and the 4-branch aggregate
  * union with global DESC sort (`weekly_trends_summary.sql:1-112`).
  */
object TrendsModelsSql {

  private val stgTopTerms = Model.sql(
    "stg_top_terms", Seq("top_terms"), View,
    "SELECT dma_id, dma_name, term, refresh_date, week, score, rank FROM top_terms",
    tests = TrendsModels.stgTopTerms.tests)

  private val stgTopRisingTerms = Model.sql(
    "stg_top_rising_terms", Seq("top_rising_terms"), View,
    """SELECT dma_id, dma_name, term, refresh_date, week, score, rank, percent_gain
      |FROM top_rising_terms""".stripMargin,
    tests = TrendsModels.stgTopRisingTerms.tests)

  private val stgInternationalTopTerms = Model.sql(
    "stg_international_top_terms", Seq("international_top_terms"), View,
    """SELECT country_code, country_name, region_code, region_name,
      |       term, refresh_date, week, score, rank
      |FROM international_top_terms""".stripMargin,
    tests = TrendsModels.stgInternationalTopTerms.tests)

  private val stgInternationalTopRisingTerms = Model.sql(
    "stg_international_top_rising_terms", Seq("international_top_rising_terms"), View,
    """SELECT country_code, country_name, region_code, region_name,
      |       term, refresh_date, week, score, rank, percent_gain
      |FROM international_top_rising_terms""".stripMargin,
    tests = TrendsModels.stgInternationalTopRisingTerms.tests)

  private val topTermsComparison = Model.sql(
    "top_terms_comparison",
    Seq("stg_international_top_terms", "stg_top_terms"), Table,
    """WITH combined AS (
      |  SELECT 'international' AS scope, country_name AS geo_name, country_code AS geo_code,
      |         region_name, term, week, refresh_date, score, rank
      |  FROM stg_international_top_terms
      |  UNION ALL
      |  SELECT 'us_dma', dma_name, CAST(dma_id AS STRING), CAST(NULL AS STRING),
      |         term, week, refresh_date, score, rank
      |  FROM stg_top_terms
      |)
      |SELECT *,
      |  CASE WHEN rank = 1 THEN '#1 Term' WHEN rank <= 5 THEN 'Top 5'
      |       WHEN rank <= 10 THEN 'Top 10' ELSE 'Other' END AS rank_category,
      |  CASE WHEN score >= 80 THEN 'Very High Interest'
      |       WHEN score >= 60 THEN 'High Interest'
      |       WHEN score >= 40 THEN 'Moderate Interest'
      |       WHEN score >= 20 THEN 'Low Interest'
      |       ELSE 'Very Low Interest' END AS interest_level
      |FROM combined""".stripMargin,
    tests = TrendsModels.topTermsComparison.tests)

  private val trendingTermsAnalysis = Model.sql(
    "trending_terms_analysis",
    Seq("stg_international_top_rising_terms", "stg_top_rising_terms"), Table,
    """WITH combined AS (
      |  SELECT 'international' AS scope, country_name AS geo_name, country_code AS geo_code,
      |         region_name, term, week, refresh_date, score, rank, percent_gain
      |  FROM stg_international_top_rising_terms
      |  UNION ALL
      |  SELECT 'us_dma', dma_name, CAST(dma_id AS STRING), CAST(NULL AS STRING),
      |         term, week, refresh_date, score, rank, percent_gain
      |  FROM stg_top_rising_terms
      |)
      |SELECT *,
      |  CASE WHEN rank <= 5 THEN 'Top 5' WHEN rank <= 10 THEN 'Top 10'
      |       WHEN rank <= 25 THEN 'Top 25' ELSE 'Other' END AS rank_tier,
      |  CASE WHEN percent_gain >= 1000 THEN 'Explosive (1000%+)'
      |       WHEN percent_gain >= 500 THEN 'Very High (500-999%)'
      |       WHEN percent_gain >= 200 THEN 'High (200-499%)'
      |       WHEN percent_gain >= 100 THEN 'Moderate (100-199%)'
      |       ELSE 'Low (<100%)' END AS growth_category
      |FROM combined""".stripMargin,
    tests = TrendsModels.trendingTermsAnalysis.tests)

  private val weeklyTrendsSummary = Model.sql(
    "weekly_trends_summary",
    Seq("stg_international_top_rising_terms", "stg_international_top_terms",
      "stg_top_rising_terms", "stg_top_terms"), Table,
    """WITH b1 AS (
      |  SELECT week, refresh_date, 'international_rising' AS trend_type,
      |         count(*) AS total_terms, avg(score) AS avg_score,
      |         avg(percent_gain) AS avg_percent_gain, max(percent_gain) AS max_percent_gain,
      |         count(DISTINCT country_name) AS unique_geos
      |  FROM stg_international_top_rising_terms GROUP BY week, refresh_date
      |), b2 AS (
      |  SELECT week, refresh_date, 'international_top', count(*), avg(score),
      |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), count(DISTINCT country_name)
      |  FROM stg_international_top_terms GROUP BY week, refresh_date
      |), b3 AS (
      |  SELECT week, refresh_date, 'us_rising', count(*), avg(score),
      |         avg(percent_gain), max(percent_gain), count(DISTINCT dma_name)
      |  FROM stg_top_rising_terms GROUP BY week, refresh_date
      |), b4 AS (
      |  SELECT week, refresh_date, 'us_top', count(*), avg(score),
      |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), count(DISTINCT dma_name)
      |  FROM stg_top_terms GROUP BY week, refresh_date
      |), unioned AS (
      |  SELECT * FROM b1 UNION ALL SELECT * FROM b2
      |  UNION ALL SELECT * FROM b3 UNION ALL SELECT * FROM b4
      |)
      |SELECT week, refresh_date, trend_type, total_terms,
      |       round(avg_score, 2) AS avg_score,
      |       round(avg_percent_gain, 2) AS avg_percent_gain,
      |       max_percent_gain, unique_geos,
      |       CASE WHEN trend_type LIKE '%rising%' THEN 'Rising Trends'
      |            ELSE 'Top Trends' END AS trend_category,
      |       CASE WHEN trend_type LIKE 'international%' THEN 'International'
      |            ELSE 'US Market' END AS market_scope
      |FROM unioned
      |ORDER BY week DESC, trend_type""".stripMargin,
    tests = TrendsModels.weeklyTrendsSummary.tests)

  val all: Seq[Model] = Seq(
    stgTopTerms, stgTopRisingTerms, stgInternationalTopTerms, stgInternationalTopRisingTerms,
    topTermsComparison, trendingTermsAnalysis, weeklyTrendsSummary)

  /** Run the SQL-authored DAG over the same fixtures. */
  def run(spark: org.apache.spark.sql.SparkSession,
          sink: TableSink = new TableSink.Cached): RunResult =
    new DagRunner(new MapCatalog(TrendsFixtures.catalog(spark)), sink).run(all)
}
