package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** dbt snapshots (SCD Type 2, `timestamp` strategy): maintain the full
  * change history of a mutable source as validity intervals. Each key
  * has exactly one OPEN row (`dbt_valid_to IS NULL`) — its current
  * version — plus zero or more closed historical rows.
  *
  * Semantics matched to `dbt snapshot`:
  *   - a new key opens a row (`dbt_valid_from = updated_at`);
  *   - an existing key whose `updated_at` advanced closes the open row
  *     (`dbt_valid_to` = the NEW row's `updated_at`) and opens a new
  *     one;
  *   - an unchanged key (same `updated_at`) keeps its open row as-is;
  *   - a key absent from the new source batch stays open (dbt does not
  *     invalidate hard-deleted rows by default);
  *   - closed history rows pass through untouched.
  *
  * Scale notes: one equi-join of the OPEN slice against the incoming
  * batch on the snapshot key plus pass-through of closed rows — no
  * windows, no full-history shuffle: history only ever grows by
  * appending, so at scale the closed slice lives in partitions the
  * merge never rewrites (pair with `TableSink.ParquetUpsert` or
  * dynamic partition overwrite on a `dbt_valid_to IS NULL` flag
  * column).
  */
object Snapshots {

  /** Apply one snapshot step. `existing` is the prior snapshot table
    * (None on the first run); `current` is the source batch; `key`
    * identifies a row; `updatedAt` is the timestamp-strategy column.
    * Output columns: all of `current`'s plus `dbt_valid_from` /
    * `dbt_valid_to`.
    */
  def snapshot(
      existing: Option[DataFrame],
      current: DataFrame,
      key: String,
      updatedAt: String): DataFrame = {
    // a batch may carry several versions of one key (e.g. CDC replay);
    // only the LATEST survives — processing them all in one step would
    // open multiple rows per key and break the one-open-row invariant
    // (dbt snapshot requires key-unique input and errors otherwise;
    // deterministic max-by is the graceful equivalent)
    val latest = current
      .groupBy(col(key))
      .agg(max_by(
        struct(current.columns.map(col): _*), struct(col(updatedAt), struct(current.columns.map(col): _*))).as("_r"))
      .select(col("_r.*"))
    val freshOpen = latest
      .withColumn("dbt_valid_from", col(updatedAt))
      .withColumn("dbt_valid_to", lit(null).cast(TimestampType))
    existing match {
      case None => freshOpen
      case Some(snap) =>
        val closed = snap.filter(col("dbt_valid_to").isNotNull)
        val open = snap.filter(col("dbt_valid_to").isNull)
        val incoming = latest.select(col(key).as("_k"), col(updatedAt).as("_new_ts"))
        // open rows: close those whose source advanced, keep the rest
        val openMerged = open
          .join(incoming, open(key) === incoming("_k"), "left")
          .withColumn("dbt_valid_to",
            when(col("_new_ts").isNotNull && col("_new_ts") > col(updatedAt), col("_new_ts"))
              .otherwise(col("dbt_valid_to")))
          .drop("_k", "_new_ts")
        // incoming rows: open a new version for new keys and advanced keys only
        val openKeys = open.select(col(key).as("_k"), col(updatedAt).as("_open_ts"))
        val newVersions = freshOpen
          .join(openKeys, freshOpen(key) === openKeys("_k"), "left")
          .filter(col("_open_ts").isNull || col(updatedAt) > col("_open_ts"))
          .drop("_k", "_open_ts")
        closed.unionByName(openMerged).unionByName(newVersions)
    }
  }
}
