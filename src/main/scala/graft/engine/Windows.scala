package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.functions.TopKPairs

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
  *      prefix-sum the counts into per-partition offsets (a
  *      windowless HOF fold over one ≤|partitions|-element array —
  *      see [[prefixOffsets]]), broadcast them back;
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
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__s"))
    val offsets = prefixOffsets(counts, Nil, lit(0L))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val out = ranged
      .withColumn("__lrn", row_number().over(local))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__lrn", "__off", "__s")
    if (keepPid) out else out.drop("__pid")
  }

  /** Per-(group, pid) exclusive prefix of `__s` by ascending `__pid`,
    * WITHOUT a window: each group's per-partition totals collapse into
    * one sorted array (bounded — range partitions are contiguous, so a
    * group spans at most `partitions` pids and the whole relation has
    * ≤ |groups| + partitions − 1 rows), the running sum is a
    * `transform`+`aggregate` HOF over that array (O(partitions²) per
    * group, driver-free), and `explode` restores (group, __pid, __off)
    * rows. This replaces the one remaining `WindowExec: No Partition
    * Defined` site the two-phase primitives used to carry — no stage
    * in any Windows primitive now runs an unpartitioned window.
    */
  private def prefixOffsets(sums: DataFrame, groupCols: Seq[String],
      zero: Column): DataFrame = {
    val gcols = groupCols.map(col)
    val packedAgg = sort_array(
      collect_list(struct(col("__pid"), col("__s")))).as("__arr")
    val packed =
      if (groupCols.isEmpty) sums.agg(packedAgg)
      else sums.groupBy(gcols: _*).agg(packedAgg)
    val offs = transform(col("__arr"), (x, i) =>
      struct(
        x.getField("__pid").as("__pid"),
        aggregate(slice(col("__arr"), lit(1), i), zero,
          (acc, y) => acc + y.getField("__s")).as("__off")))
    packed.select((gcols :+ explode(offs).as("__po")): _*)
      .select((gcols ++ Seq(col("__po.__pid").as("__pid"),
        col("__po.__off").as("__off"))): _*)
  }

  /** Appends `cumCol` = running INCLUSIVE sum of `value` per
    * `groupCols` group in `sortCols` order — exactly
    * `sum(value) OVER (PARTITION BY group ORDER BY sort
    * ROWS UNBOUNDED PRECEDING)` — without ever materializing a whole
    * group in one task. Same two-phase offset algebra as
    * [[globalRowNumber]], generalized per group:
    *
    *   1. range-partition on (group, sort) and sort within partitions
    *      — a degenerate group (one `lang` = most of the corpus) is
    *      SPLIT across many range partitions instead of serializing;
    *   2. per-(pid, group) totals (a partial-aggregated collapse,
    *      ≤ |groups| + partitions − 1 rows since ranges are
    *      contiguous) → windowless exclusive prefix per group
    *      ([[prefixOffsets]]) → broadcast back;
    *   3. cum = group offset + local running sum, where the local
    *      window partitions by (pid, group) so no task sees more than
    *      one partition's slice of any group.
    *
    * Caller contract: `sortCols` must totally order rows WITHIN a
    * group (include a unique id); `value` must be non-null (a null
    * contributes null to the true window prefix only until the next
    * non-null — this primitive does not reproduce that edge; coalesce
    * upstream). The offsets broadcast is |groups|-bounded — the
    * primitive targets the few-large-groups regime (per-lang /
    * per-domain corpus keys); high-cardinality small groups don't
    * need it (the plain keyed window already parallelizes).
    */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], value: Column, cumCol: String = "cum",
      partitions: Int = 32): DataFrame = {
    val gcols = groupCols.map(col)
    val rangeCols = gcols ++ sortCols
    val ranged = df.repartitionByRange(partitions, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
    val sumType: DataType = df.select(sum(value).as("__s")).schema.head.dataType
    val zero = lit(0L).cast(sumType)
    val sums = ranged.groupBy((col("__pid") +: gcols): _*)
      .agg(coalesce(sum(value), zero).as("__s"))
    val offsets = prefixOffsets(sums, groupCols, zero)
    val local = Window.partitionBy((col("__pid") +: gcols): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__lc", sum(value).over(local))
      .join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(cumCol, col("__off") + col("__lc"))
      .drop("__pid", "__lc", "__off")
  }

  /** Bounded top-K per group: the rows `row_number() OVER (PARTITION
    * BY group ORDER BY score DESC, id ASC) <= k` — as a partial
    * aggregate, not a window. Each map task reduces its slice of a
    * group to a size-k heap ([[graft.functions.TopKPairs]]), so the
    * shuffle carries ≤ k·tasks rows per group however degenerate the
    * key, versus the window form's every-candidate-to-one-sorted-task.
    * Output: groupCols ++ (`rankCol` 1-based LONG, `scoreCol` DOUBLE,
    * `idCol` LONG), one row per kept pair. Ties break toward the
    * smaller id (same as the window form's id tiebreak); NaN scores
    * are dropped (a NaN quality carries no ranking information —
    * callers gate upstream). `score`/`id` are cast to double/long, so
    * any numeric rank key works; keep-set selection needs the ranked
    * relation joined back by `idCol` (unique ids ⇒ an equi-join on the
    * id alone, perfectly spread).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], score: Column,
      id: Column, k: Int, rankCol: String = "rn",
      scoreCol: String = "score", idCol: String = "id"): DataFrame = {
    val gcols = groupCols.map(col)
    df.groupBy(gcols: _*)
      .agg(TopKPairs.topk(score.cast("double"), id.cast("long"), k).as("__tk"))
      .select((gcols :+ posexplode(col("__tk")).as(Seq("__pos", "__pair"))): _*)
      .select((gcols ++ Seq(
        (col("__pos") + 1).cast("long").as(rankCol),
        col("__pair.score").as(scoreCol),
        col("__pair.id").as(idCol))): _*)
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
