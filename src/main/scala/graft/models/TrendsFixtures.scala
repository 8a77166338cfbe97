package graft.models

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic Google-Trends-shaped fixture tables (FIXTURES.md §A),
  * mirroring the reference's four sources
  * (`models/staging/__sources.yml:3-91`, types per
  * `models/docs/google_trends_docs.md:183-229`).
  *
  * Value coverage is chosen to hit every CASE arm and every data test
  * (FIXTURES.md §A "Value coverage"): rank boundaries {1,2,5,6,10,11,
  * 25,26}, score boundaries {0,19,20,39,40,59,60,79,80,100},
  * percent_gain boundaries {50,99,100,199,200,499,500,999,1000,2500},
  * NULL region_code/region_name rows, 3 distinct (week, refresh_date)
  * pairs, 3 DMAs, 3 countries.
  */
object TrendsFixtures {

  final case class TopTerm(
      dma_id: Long,
      dma_name: String,
      term: String,
      refresh_date: Date,
      week: Date,
      score: Long,
      rank: Long
  )

  final case class TopRisingTerm(
      dma_id: Long,
      dma_name: String,
      term: String,
      refresh_date: Date,
      week: Date,
      score: Long,
      rank: Long,
      percent_gain: Double
  )

  final case class IntlTopTerm(
      country_code: String,
      country_name: String,
      region_code: Option[String],
      region_name: Option[String],
      term: String,
      refresh_date: Date,
      week: Date,
      score: Long,
      rank: Long
  )

  final case class IntlTopRisingTerm(
      country_code: String,
      country_name: String,
      region_code: Option[String],
      region_name: Option[String],
      term: String,
      refresh_date: Date,
      week: Date,
      score: Long,
      rank: Long,
      percent_gain: Double
  )

  private val ranks = Seq(1L, 2L, 5L, 6L, 10L, 11L, 25L, 26L)
  private val scores = Seq(0L, 19L, 20L, 39L, 40L, 59L, 60L, 79L, 80L, 100L)
  private val gains = Seq(50d, 99d, 100d, 199d, 200d, 499d, 500d, 999d, 1000d, 2500d)

  /** (week, refresh_date) grains — 3 distinct pairs. */
  private val grains = Seq(
    (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-08")),
    (Date.valueOf("2024-01-08"), Date.valueOf("2024-01-15")),
    (Date.valueOf("2024-01-01"), Date.valueOf("2024-01-15"))
  )

  private val dmas = Seq((500L, "New York NY"), (501L, "Los Angeles CA"), (502L, "Chicago IL"))

  /** region is NULL for JP rows — exercises nullable-column semantics. */
  private val countries = Seq(
    ("US", "United States", Some("US-NY"), Some("New York")),
    ("FR", "France", Some("FR-75"), Some("Paris")),
    ("JP", "Japan", None, None)
  )

  def topTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      (gi, (week, refresh)) <- grains.zipWithIndex.map(_.swap)
      (di, (dmaId, dmaName)) <- dmas.zipWithIndex.map(_.swap)
      (ri, rank) <- ranks.zipWithIndex.map(_.swap)
      idx = (gi * dmas.size + di) * ranks.size + ri
    } yield TopTerm(dmaId, dmaName, s"term_${idx % 13}", refresh, week, scores(idx % scores.size), rank)).toDF()
  }

  def topRisingTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      (gi, (week, refresh)) <- grains.zipWithIndex.map(_.swap)
      (di, (dmaId, dmaName)) <- dmas.zipWithIndex.map(_.swap)
      (ri, rank) <- ranks.zipWithIndex.map(_.swap)
      idx = (gi * dmas.size + di) * ranks.size + ri
    } yield TopRisingTerm(dmaId, dmaName, s"rise_${idx % 11}", refresh, week,
      scores(idx % scores.size), rank, gains(idx % gains.size))).toDF()
  }

  def internationalTopTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      (gi, (week, refresh)) <- grains.zipWithIndex.map(_.swap)
      (ci, (cc, cn, rc, rn)) <- countries.zipWithIndex.map(_.swap)
      (ri, rank) <- ranks.zipWithIndex.map(_.swap)
      idx = (gi * countries.size + ci) * ranks.size + ri
    } yield IntlTopTerm(cc, cn, rc, rn, s"intl_${idx % 13}", refresh, week, scores(idx % scores.size), rank)).toDF()
  }

  def internationalTopRisingTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      (gi, (week, refresh)) <- grains.zipWithIndex.map(_.swap)
      (ci, (cc, cn, rc, rn)) <- countries.zipWithIndex.map(_.swap)
      (ri, rank) <- ranks.zipWithIndex.map(_.swap)
      idx = (gi * countries.size + ci) * ranks.size + ri
    } yield IntlTopRisingTerm(cc, cn, rc, rn, s"intl_rise_${idx % 11}", refresh, week,
      scores(idx % scores.size), rank, gains(idx % gains.size))).toDF()
  }

  /** All four sources under their reference names (`__sources.yml`). */
  def catalog(spark: SparkSession): Map[String, DataFrame] = Map(
    "top_terms" -> topTerms(spark),
    "top_rising_terms" -> topRisingTerms(spark),
    "international_top_terms" -> internationalTopTerms(spark),
    "international_top_rising_terms" -> internationalTopRisingTerms(spark)
  )
}
