package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source registry: resolves logical table names to DataFrames.
  *
  * Plays the role of dbt's `source()` + `__sources.yml` registry
  * (reference: `models/staging/__sources.yml:3-91`,
  * `models/staging/stg_top_terms.sql:5`): a model asks for a table by
  * name; where it physically lives is the catalog's concern.
  *
  * Scale note: implementations must return *lazy* DataFrames (a parquet
  * scan, a catalog table) — never collected data. At 100 TB the catalog
  * hands Catalyst a `FileSourceScanExec`-able relation so that column
  * pruning, predicate pushdown, and partition pruning all reach the
  * scan; it must not force materialization.
  */
trait Catalog {
  def table(name: String): DataFrame
}

/** Directory-of-parquet catalog: `<dir>/<name>.parquet`.
  *
  * This is the harness layout (TESTDATA.md) and also the natural lake
  * layout at scale (one dataset = one partitioned parquet root).
  */
final class ParquetCatalog(spark: SparkSession, dir: String) extends Catalog {
  override def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Fixed in-memory mapping — used for fixture-driven tests and for
  * chaining DAG runs (a mart output becomes a downstream source).
  */
final class MapCatalog(tables: Map[String, DataFrame]) extends Catalog {
  override def table(name: String): DataFrame =
    tables.getOrElse(
      name,
      throw new NoSuchElementException(s"catalog has no table '$name'; has: ${tables.keys.mkString(", ")}")
    )
}

/** Seed ingestion: CSV with an explicit schema, loaded into a target
  * namespace — the analogue of `dbt seed`
  * (reference: `dbt_project.yml:27-31`, CSVs under `seeds/jaffle-data/`,
  * `README.md:196-203` for the published column types).
  *
  * dbt infers seed column types; we require an explicit `StructType`
  * because schema inference needs an extra full pass over the data —
  * wrong at any scale, fatal at 100 TB.
  */
object Seeds {

  /** Load one seed CSV. `enabled` mirrors the `load_source_data` var
    * gate (`dbt_project.yml:31`): disabled seeds yield None.
    */
  def load(
      spark: SparkSession,
      path: String,
      schema: StructType,
      enabled: Boolean = true
  ): Option[DataFrame] =
    if (!enabled) None
    else
      Some(
        spark.read
          .option("header", "true")
          .schema(schema)
          .csv(path)
      )

  /** Load a JSONL (newline-delimited JSON) source with an explicit
    * schema — the interchange format training-data pipelines ingest
    * most. Explicit schema for the same reason as CSV (no inference
    * pass); `mode=FAILFAST` surfaces corrupt lines instead of
    * silently nulling them, and `multiLine` stays false so the file
    * splits by line across executors (a multiLine JSON file is ONE
    * task at any size — never at 100 TB).
    */
  def loadJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      enabled: Boolean = true
  ): Option[DataFrame] =
    if (!enabled) None
    else
      Some(
        spark.read
          .option("mode", "FAILFAST")
          .schema(schema)
          .json(path)
      )

  /** Namespace routing — a pure port of the reference's
    * `generate_schema_name` macro (`macros/generate_schema_name.sql:1-23`):
    * seeds go verbatim to their custom schema (`raw`); other nodes get
    * `<default>_<custom>` in prod and the default schema otherwise.
    */
  def schemaFor(
      resourceType: String,
      customSchema: Option[String],
      defaultSchema: String,
      targetName: String
  ): String =
    (resourceType, customSchema) match {
      case ("seed", Some(c))                      => c
      case (_, Some(c)) if targetName == "prod"   => s"${defaultSchema}_$c"
      case _                                      => defaultSchema
    }
}
