package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers.
  *
  * Spark's AQE rewrites skewed SORT-MERGE joins at runtime by
  * splitting oversized partitions, which covers most cases for free.
  * Salting remains the tool when AQE can't apply: skewed shuffle
  * HASH joins feeding stateful/streaming operators, skewed
  * aggregations (AQE never splits an aggregation key), or when one
  * hot key alone exceeds an executor (AQE splits files, not the
  * build-side hash table of one key).
  */
object Joins {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways.
    *
    * The fact side gets a uniform pseudo-random salt per ROW (derived
    * from `saltSource`, so the choice is deterministic and
    * re-executable — important for task retries: a `rand()` salt
    * re-rolls on retry and can double- or zero-count rows under
    * speculative execution). The dim side is exploded `salts`× so
    * every (key, salt) bucket finds its match. One hot fact key thus
    * spreads across `salts` reducers at the cost of a `salts`×
    * replication of the (small) dim side — the standard trade.
    *
    * Result rows are exactly those of `fact.join(dim, key)`; the
    * helper drops the salt column after the join.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      saltSource: org.apache.spark.sql.Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val f = fact.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val d = dim.withColumn("_salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted `fact.groupBy(key).agg(...)` building block: two-level
    * aggregation for one-hot-key skew. Phase 1 aggregates on
    * (key, salt) — the hot key's load spreads over `salts` reducers —
    * and phase 2 combines the `salts` partials per key. Only
    * algebraic aggregates compose this way; the caller passes both
    * phases explicitly. Exact-distinct aggregates CANNOT use this
    * (their partial state is the value set itself); they need the
    * two-level `countDistinct` on (key, value) instead.
    */
  def saltedAgg(
      fact: DataFrame,
      key: String,
      salts: Int,
      saltSource: org.apache.spark.sql.Column)(
      phase1: Seq[org.apache.spark.sql.Column],
      phase2: Seq[org.apache.spark.sql.Column]): DataFrame =
    fact
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(col(key))
      .agg(phase2.head, phase2.tail: _*)

  /** Overlap (interval) join as a BUCKETED EQUI-JOIN — the scalable
    * rewrite of `l JOIN r ON l.start <= r.end AND r.start <= l.end`.
    *
    * A naive inequality join has no equi-key, so Spark plans a
    * broadcast-nested-loop (cartesian × filter) — O(|L|·|R|) pair
    * evaluations, the classic range-join scale killer. Instead each
    * interval is exploded onto the fixed-width grid cells it covers
    * (`start div bucket .. end div bucket`) and the join becomes a
    * plain shuffled equi-join on the cell id, touching only pairs
    * that share a cell. A pair overlapping across k shared cells
    * would emit k copies; the standard first-common-cell guard
    * (`cell == max(start cells)`) keeps exactly one WITHOUT a
    * distinct shuffle.
    *
    * Cost model: work is Σ cells-per-interval ≈ |rows| · (1 +
    * span/bucket) — pick `bucket` near the typical span so the
    * explode factor stays O(1). Degenerate cells (a hot time window)
    * shuffle-skew like any hot key; AQE skew-split or a salted
    * variant applies unchanged since this IS an equi-join.
    *
    * Preconditions: `start <= end`, values non-negative (integral
    * `div` truncation), and the two frames' column names disjoint.
    */
  def intervalJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val l = left.withColumn(
      "_cell", explode(sequence(expr(s"$lStart div $bucket"), expr(s"$lEnd div $bucket"))))
    val r = right.withColumn(
      "_cell", explode(sequence(expr(s"$rStart div $bucket"), expr(s"$rEnd div $bucket"))))
    l.join(r, Seq("_cell"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_cell") === greatest(expr(s"$lStart div $bucket"), expr(s"$rStart div $bucket")))
      .drop("_cell")
  }
}
