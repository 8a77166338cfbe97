package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

/** Declarative data-quality predicates — the engine-side analogue of
  * dbt `data_tests` (reference: the YAMLs under `models/staging/` and
  * `models/marts/`; semantics in SURVEY.md §2.8).
  *
  * dbt compiles each test to a "select the failing rows" query and the
  * test passes iff it returns 0 rows; we keep exactly that contract so
  * the 68 reference tests port verbatim.
  *
  * Scale note: `passes` uses `failingRows(df).isEmpty`, which Spark
  * executes as a LocalLimit(1)-style short-circuit scan with the
  * predicate pushed to parquet — it does NOT count all failures. Use
  * `failureCount` only when reporting.
  */
sealed trait DataTest {
  def column: String

  /** dbt-style test identity, e.g. `not_null_weekly_trends_summary_week`. */
  def name: String

  /** The failing-row relation (0 rows == pass). */
  def failingRows(df: DataFrame): DataFrame

  def passes(df: DataFrame): Boolean = failingRows(df).isEmpty
  def failureCount(df: DataFrame): Long = failingRows(df).count()
}

/** `not_null` (59 instances in the reference — SURVEY.md §2.8 T1). */
final case class NotNull(column: String) extends DataTest {
  override def name: String = s"not_null_$column"
  override def failingRows(df: DataFrame): DataFrame =
    df.filter(col(column).isNull)
}

/** `accepted_values` (9 instances — SURVEY.md §2.8 T2).
  *
  * NULLs pass: dbt's compiled test filters `col not in (...)`, and SQL
  * three-valued logic drops NULL rows from that filter. Replicated
  * here deliberately (`col.isNotNull` conjunct) — do not "fix".
  */
final case class AcceptedValues(column: String, values: Seq[String]) extends DataTest {
  override def name: String = s"accepted_values_$column"
  override def failingRows(df: DataFrame): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*))
}

/** `unique` — dbt's third built-in (unused by the reference's YAMLs,
  * provided for parity with dbt-core's standard test set). dbt
  * compiles it to "group by column having count(*) > 1 (nulls
  * excluded)"; the failing relation here is exactly that.
  *
  * Scale note: one shuffle on the column; the HAVING filter is applied
  * post-partial-aggregation, so only genuine duplicate keys reach the
  * reducer output.
  */
final case class Unique(column: String) extends DataTest {
  override def name: String = s"unique_$column"
  override def failingRows(df: DataFrame): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
}

/** `relationships` — dbt's fourth built-in (referential integrity):
  * every non-null value of `column` must exist in `to().toColumn`.
  * The parent relation is passed lazily so the test can reference a
  * catalog table or another model at RUN time, like `ref()` inside
  * dbt's compiled test SQL.
  *
  * Scale note: compiled as a LEFT ANTI join — the orphan side streams,
  * the parent key column is all the join carries, and a small parent
  * broadcasts.
  */
final case class Relationships(column: String, to: () => DataFrame, toColumn: String)
    extends DataTest {
  override def name: String = s"relationships_${column}_to_$toColumn"
  override def failingRows(df: DataFrame): DataFrame =
    df.filter(col(column).isNotNull)
      .join(to().select(col(toColumn).as(column)).distinct(), Seq(column), "left_anti")
}

/** Outcome of one test run against one materialized model. */
final case class TestResult(model: String, test: String, passed: Boolean)
