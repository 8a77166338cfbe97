package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar function library: every CASE/macro expression the reference
  * models use, as reusable `Column => Column` builders (SURVEY.md §2.7).
  * All stay inside whole-stage codegen (pure `functions._` — no UDFs).
  */
object Functions {

  /** `cents_to_dollars` macro (reference `macros/cents_to_dollars.sql:3-21`,
    * BigQuery arm: `round(cast((col / 100) as numeric), 2)`).
    * Integer `/` is true division (double) in both BigQuery and Spark;
    * the decimal cast pins 2-dp money semantics.
    */
  def centsToDollars(c: Column, precision: Int = 16, scale: Int = 2): Column =
    round((c / lit(100)).cast(DecimalType(precision, scale)), 2)

  /** Dialect dispatch for `cents_to_dollars` — the analogue of the
    * macro's `adapter.dispatch` mechanism (reference
    * `macros/cents_to_dollars.sql:4`): resolution tries the
    * target-named arm and falls back to `default__`. Each arm keeps
    * its dialect's operation ORDER (what actually differs between
    * them), re-expressed in Spark types:
    *   - default  `(c / 100)::numeric(16,2)`      — divide in double, cast
    *   - postgres `(c::numeric(16,2) / 100)`      — cast first, exact decimal division
    *   - bigquery `round(cast(c / 100 as numeric), 2)` — [[centsToDollars]]
    *   - fabric   `cast(c / 100 as numeric(16,2))` — same shape as default
    */
  val centsToDollarsArms: Map[String, Column => Column] = Map(
    "default" -> (c => (c / lit(100)).cast(DecimalType(16, 2))),
    "postgres" -> (c => c.cast(DecimalType(16, 2)) / lit(100)),
    "bigquery" -> (c => centsToDollars(c)),
    "fabric" -> (c => (c / lit(100)).cast(DecimalType(16, 2))))

  def centsToDollarsFor(target: String): Column => Column =
    centsToDollarsArms.getOrElse(target, centsToDollarsArms("default"))

  /** Cross-engine-deterministic rounding: `floor(x·10^s + 0.5)/10^s`
    * in pure double arithmetic. Engines disagree on `round()` ties —
    * Spark rounds HALF_UP on the exact decimal expansion, DuckDB uses
    * ties-to-even `nearbyint` — and with 2-decimal inputs averaged
    * over small groups, exact binary ties (e.g. 145.625) are common.
    * This formula is the same IEEE-754 op sequence everywhere, so the
    * driver's hash compare can't drift. Half-ties round toward +∞.
    */
  def roundPortable(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + lit(0.5)) / p
  }

  /** Order-independent average of a ≤2-decimal double column: sum in
    * DECIMAL (exact, associative — immune to partition-order float
    * drift), then one double division. Needed because Spark's partial
    * aggregation sums in partition order while single-node engines sum
    * sequentially; raw double avg differs by ulps between the two,
    * which flips rounding at tie boundaries.
    */
  def avgExact(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double") / count(lit(1))

  /** `rank_category` (reference `models/marts/top_terms_comparison.sql:50-55`). */
  def rankCategory(rank: Column): Column =
    when(rank === 1, "#1 Term")
      .when(rank <= 5, "Top 5")
      .when(rank <= 10, "Top 10")
      .otherwise("Other")

  /** `interest_level` (reference `models/marts/top_terms_comparison.sql:57-63`). */
  def interestLevel(score: Column): Column =
    when(score >= 80, "Very High Interest")
      .when(score >= 60, "High Interest")
      .when(score >= 40, "Moderate Interest")
      .when(score >= 20, "Low Interest")
      .otherwise("Very Low Interest")

  /** `rank_tier` (reference `models/marts/trending_terms_analysis.sql:53-58`). */
  def rankTier(rank: Column): Column =
    when(rank <= 5, "Top 5")
      .when(rank <= 10, "Top 10")
      .when(rank <= 25, "Top 25")
      .otherwise("Other")

  /** `growth_category` (reference `models/marts/trending_terms_analysis.sql:60-66`). */
  def growthCategory(percentGain: Column): Column =
    when(percentGain >= 1000, "Explosive (1000%+)")
      .when(percentGain >= 500, "Very High (500-999%)")
      .when(percentGain >= 200, "High (200-499%)")
      .when(percentGain >= 100, "Moderate (100-199%)")
      .otherwise("Low (<100%)")

  /** `trend_category` (reference `models/marts/weekly_trends_summary.sql:97-100`). */
  def trendCategory(trendType: Column): Column =
    when(trendType.like("%rising%"), "Rising Trends").otherwise("Top Trends")

  /** `market_scope` (reference `models/marts/weekly_trends_summary.sql:102-105`). */
  def marketScope(trendType: Column): Column =
    when(trendType.like("international%"), "International").otherwise("US Market")
}
