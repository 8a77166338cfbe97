package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-ordering primitives.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses
  * the whole relation into ONE task in Spark — the classic
  * accidental-serialization trap. The scale-correct formulation is
  * the two-phase offset method every distributed engine uses
  * internally for ORDER BY + LIMIT/rank:
  *
  *   1. range-partition on the sort key (Spark's own scalable
  *      global-sort exchange — sampled bounds, fixed seed,
  *      deterministic for a given input) and sort within partitions;
  *   2. count rows per partition (a |partitions|-row aggregate),
  *      prefix-sum the counts into per-partition offsets (the only
  *      unpartitioned window, over ≤|partitions| rows —
  *      driver-trivial), broadcast them back;
  *   3. global rn = offset(partition) + local row_number, where the
  *      local window's PARTITION BY spark_partition_id() keeps every
  *      partition independent.
  *
  * The result is EXACTLY `row_number() OVER (ORDER BY sortCols)` —
  * the offsets make it independent of where the sampled range bounds
  * fall — but no stage ever sees more than one partition's rows.
  * Callers must pass a TOTAL order (include a unique id as the last
  * sort column) or the tie order would be partition-placement-
  * dependent.
  */
object Windows {

  /** Appends `rnCol` = global 1-based row number by `sortCols` (which
    * must be a total order). `partitions` bounds per-stage memory:
    * size it so |rows|/partitions fits an executor. With
    * `keepPid = true` the range-partition id survives as `__pid` —
    * callers that window WITHIN the established partitioning (e.g.
    * sorted-neighborhood's `lead` pairs) partition by it and inherit
    * this sort with no further exchange.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn", partitions: Int = 32,
      keepPid: Boolean = false): DataFrame = {
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val out = ranged
      .withColumn("__lrn", row_number().over(local))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__lrn", "__off", "__c")
    if (keepPid) out else out.drop("__pid")
  }

  /** Closed-form `ntile(buckets)` from a global row number `rn` out
    * of `n` rows — bucket sizes follow the SQL-standard distribution
    * (first n mod buckets buckets take one extra row), so this equals
    * `ntile(buckets) OVER (ORDER BY <rn's order>)` row-for-row while
    * never needing the single-partition window. With base = n div
    * buckets and rem = n mod buckets: the first rem·(base+1) rows
    * split into size-(base+1) buckets, the rest into size-base
    * buckets (base = 0 only when n < buckets, in which case every row
    * is in the first branch).
    */
  def ntileFromRowNumber(rn: Column, n: Column, buckets: Int): Column = {
    // Spark's `/` is double division; floor+cast is exact integer
    // division here because the dividend's distance to the nearest
    // multiple of the divisor is ≥ 1/divisor — astronomically wider
    // than the half-ulp it would take to round across an integer.
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val base = idiv(n.cast("long"), lit(buckets.toLong))
    val rem = n.cast("long") % buckets
    val cut = rem * (base + lit(1L))
    when(rn <= cut, idiv(rn - 1, base + lit(1L)) + 1)
      .otherwise(rem + idiv(rn - cut - 1, base) + 1)
      .cast("int")
  }
}
