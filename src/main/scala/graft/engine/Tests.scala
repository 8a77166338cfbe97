package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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

/** Outcome of one test run against one materialized model. */
final case class TestResult(model: String, test: String, passed: Boolean)
