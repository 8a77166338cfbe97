package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Functions.{avgExact, roundPortable}
import graft.queries.Inventory
import graft.queries.Inventory.Q

/** As-of (point-in-time) join: for each left row, attach the LATEST
  * right row with the same key and `right.ts <= left.ts` — the shape
  * every event pipeline needs to join facts to the dimension snapshot
  * that was current when the event happened.
  *
  * Spark has no native as-of join; per the build rules this is
  * preference order (a): COMPOSED from existing operators rather than
  * a custom plan. Both inputs are unioned with a side marker, and one
  * ordered window per key forward-fills the right side's payload onto
  * left rows (`last(_, ignoreNulls = true)`). At equal timestamps the
  * right row sorts FIRST, so the match is inclusive (>=), matching
  * DuckDB's `ASOF JOIN` semantics — which is exactly what the oracle
  * uses.
  *
  * Scale notes: ONE shuffle (hash-partition on the key) and a local
  * per-key sort — same cost as any window aggregation; no range
  * explosion, no broadcast requirement, works at any right-side
  * cardinality. Parallelism is bounded by |keys|; when one key
  * dominates (or there are few keys), [[asofJoinBucketed]] sub-keys
  * the window by time bucket for |keys|·|buckets| parallelism.
  */
object AsOf {

  /** Internal column names both join variants claim for themselves. */
  private val Reserved = Seq("_ts", "_side", "_payload", "_bucket")

  private def requireSafeNames(left: DataFrame, rightPayload: Seq[String]): Unit = {
    val taken = Reserved.filter(left.columns.contains)
    require(taken.isEmpty,
      s"asofJoin reserves column name(s) ${taken.mkString(", ")}; rename them on the left input")
    val clash = rightPayload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"right payload column(s) ${clash.mkString(", ")} collide with left columns; alias them first")
  }

  /** Generic as-of join. `rightPayload` columns are forward-filled
    * onto left rows; rows with no prior right match keep NULLs (drop
    * them for inner semantics).
    *
    * The payload is filled as ONE struct, not column-by-column: the
    * struct is non-null on every right row even when its fields are
    * null, so (a) a NULL field in the latest right row stays NULL
    * instead of leaking an older row's value, and (b) multi-column
    * payloads are row-atomic — the fill can never stitch together
    * fields from different right rows. Equal-(ts) right rows are
    * tie-broken by the payload struct itself, keeping the result
    * deterministic under any partitioning.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    requireSafeNames(left, rightPayload)
    val lCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    // unified frame: left rows carry their columns, right rows only key+ts+payload
    val l = left
      .withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side"),
        lit(null).cast(payloadType).as("_payload")) ++ lCols.filter(_ != key).map(col): _*)
    val r = right
      .withColumn("_ts", col(rightTs)).withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side"), payload.as("_payload")) ++
        lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++
        rightPayload.map(c => col(s"_payload.$c").as(c)): _*)
  }

  /** FORWARD as-of join: each left row takes the EARLIEST right row
    * with the same key and `right.ts >= left.ts` — the mirror of
    * [[asofJoin]]'s backward fill. This is the labeling direction:
    * "the next published rate / the first outcome at-or-after this
    * event", the join a training pipeline runs to attach forward
    * outcomes to features (and the one you audit for label leakage —
    * leakage is exactly a backward feature join accidentally built
    * this way round). Same unified-frame construction, run over the
    * DESCENDING total order with the incremental running frame (see
    * the inline note: Spark's unbounded-FOLLOWING frame is O(n²) per
    * key); at equal timestamps the left row sorts BEFORE right rows
    * in ascending terms (side 0 < 1), so an exact tie matches
    * inclusively, mirroring the backward join's inclusive `<=`. Rows
    * with no later right match keep NULLs.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    requireSafeNames(left, rightPayload)
    val lCols = left.columns
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val l = left
      .withColumn("_ts", col(leftTs)).withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side"),
        lit(null).cast(payloadType).as("_payload")) ++ lCols.filter(_ != key).map(col): _*)
    val r = right
      .withColumn("_ts", col(rightTs)).withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side"), payload.as("_payload")) ++
        lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // DESCENDING order + running frame, NOT the literal
    // (currentRow, unboundedFollowing) + first(): Spark evaluates
    // unbounded-FOLLOWING frames by re-scanning from each row to the
    // partition end — O(n²) per key (measured: 172 s at sf0.1 where
    // this mirror runs in ~2 s). Reversing the total order turns
    // "first non-null at-or-after" into "last non-null at-or-before",
    // which the UnboundedPreceding frame computes incrementally.
    // ASC NULLS FIRST reversed is DESC NULLS LAST (Spark's defaults),
    // so the reversal is exact, ties included.
    val w = Window.partitionBy(key)
      .orderBy(col("_ts").desc, col("_side").desc, col("_payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++
        rightPayload.map(c => col(s"_payload.$c").as(c)): _*)
  }

  /** Skew-hardened as-of join: identical semantics to [[asofJoin]],
    * but the window is sub-keyed by a TIME BUCKET so parallelism is
    * |keys|·|buckets| instead of |keys| — the mitigation for few or
    * skewed keys (an event stream with 4 event types on a
    * 1000-executor cluster would otherwise use 4 tasks).
    *
    * Mechanics: rows land in bucket ⌊ts/width⌋. Within a (key, bucket)
    * window a left row sees the in-bucket right rows before it, plus a
    * CARRY-IN pseudo-row holding the latest right row of any earlier
    * bucket. Carry-ins come from a per-(key, bucket) `max(struct(ts,
    * payload))` aggregate forward-filled across buckets — that fill
    * window is per key, but over one summary row per non-empty bucket,
    * never over the raw rows, so it cannot become the skew bottleneck.
    * The carry-in sorts at the bucket start with side 0 (< right 1 <
    * left 2): an in-bucket right row at the exact bucket-start instant
    * still overrides it, and ties keep [[asofJoin]]'s inclusive,
    * payload-tiebroken order — a property test asserts row-for-row
    * equality with the plain path.
    *
    * `bucketWidth` is in the ts column's native unit (microseconds for
    * timestamps, raw units for numerics). Pick it so a bucket holds
    * roughly rows/desired-tasks rows; carry-in correctness is
    * width-independent.
    */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      bucketWidth: Long): DataFrame = {
    requireSafeNames(left, rightPayload)
    val lCols = left.columns
    val tsType = left.schema(leftTs).dataType
    def tsLong(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _                                        => c.cast("long")
    }
    def tsBack(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => timestamp_micros(c)
      case other                                    => c.cast(other)
    }
    def bucketOf(ts: Column): Column = floor(tsLong(ts) / bucketWidth).cast("long")
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val r0 = right.select(col(key), col(rightTs).as("_ts"), payload.as("_payload"))
      .withColumn("_bucket", bucketOf(col("_ts")))

    // latest right row per (key, bucket): max of the (ts, payload)
    // struct — the same tiebreak order the in-bucket window uses
    val lastPerBucket = r0.groupBy(col(key), col("_bucket"))
      .agg(max(struct(col("_ts"), col("_payload"))).as("_last"))

    // every bucket that needs a carry-in (left activity) or can supply
    // one (right activity)
    val allBuckets = left.select(col(key), bucketOf(col(leftTs)).as("_bucket"))
      .union(lastPerBucket.select(col(key), col("_bucket")))
      .distinct()

    val wCarry = Window.partitionBy(key).orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBuckets.join(lastPerBucket, Seq(key, "_bucket"), "left")
      .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select(col(key), col("_bucket"),
        tsBack(col("_bucket") * bucketWidth).as("_ts"), // ≤ every in-bucket ts
        col("_carry._payload").as("_payload"))

    def nullLefts: Seq[Column] =
      lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val lhs = left.select(Seq(col(key), bucketOf(col(leftTs)).as("_bucket"),
      col(leftTs).as("_ts"), lit(2).as("_side"),
      lit(null).cast(payloadType).as("_payload")) ++ lCols.filter(_ != key).map(col): _*)
    val rhs = r0.select(Seq(col(key), col("_bucket"), col("_ts"), lit(1).as("_side"),
      col("_payload")) ++ nullLefts: _*)
    val chs = carries.select(Seq(col(key), col("_bucket"), col("_ts"), lit(0).as("_side"),
      col("_payload")) ++ nullLefts: _*)

    val w = Window.partitionBy(col(key), col("_bucket"))
      .orderBy(col("_ts"), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.union(rhs).union(chs)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 2)
      .select(Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++
        rightPayload.map(c => col(s"_payload.$c").as(c)): _*)
  }

  /** Skew-hardened FORWARD as-of join: [[asofJoinForward]] semantics
    * with [[asofJoinBucketed]]'s |keys|·|buckets| parallelism. The
    * mirror image of the backward carry: the per-(key, bucket)
    * summary keeps the EARLIEST right (min of the (ts, payload)
    * struct — the same tiebreak order the in-bucket window uses), the
    * cross-bucket fill looks at STRICTLY LATER buckets (rows 1..∞
    * following), and the carry pseudo-row sorts at the bucket's LAST
    * instant with side 2 (left 0 < right 1 < carry 2): an in-bucket
    * right row at that exact instant still wins — it is earlier than
    * anything a later bucket can offer. A property test pins
    * row-for-row equality with the plain forward join across widths.
    */
  def asofJoinForwardBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      bucketWidth: Long): DataFrame = {
    requireSafeNames(left, rightPayload)
    val lCols = left.columns
    val tsType = left.schema(leftTs).dataType
    def tsLong(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _                                        => c.cast("long")
    }
    def tsBack(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => timestamp_micros(c)
      case other                                    => c.cast(other)
    }
    def bucketOf(ts: Column): Column = floor(tsLong(ts) / bucketWidth).cast("long")
    val payload = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val r0 = right.select(col(key), col(rightTs).as("_ts"), payload.as("_payload"))
      .withColumn("_bucket", bucketOf(col("_ts")))

    val firstPerBucket = r0.groupBy(col(key), col("_bucket"))
      .agg(min(struct(col("_ts"), col("_payload"))).as("_first"))

    val allBuckets = left.select(col(key), bucketOf(col(leftTs)).as("_bucket"))
      .union(firstPerBucket.select(col(key), col("_bucket")))
      .distinct()

    // desc + (unboundedPreceding, -1) ≡ asc + (1, unboundedFollowing):
    // "earliest summary of any LATER bucket", via the incremental
    // running frame instead of the quadratic following frame
    val wCarry = Window.partitionBy(key).orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBuckets.join(firstPerBucket, Seq(key, "_bucket"), "left")
      .withColumn("_carry", last(col("_first"), ignoreNulls = true).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select(col(key), col("_bucket"),
        tsBack((col("_bucket") + 1) * bucketWidth - 1).as("_ts"), // ≥ every in-bucket ts
        col("_carry._payload").as("_payload"))

    def nullLefts: Seq[Column] =
      lCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val lhs = left.select(Seq(col(key), bucketOf(col(leftTs)).as("_bucket"),
      col(leftTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(payloadType).as("_payload")) ++ lCols.filter(_ != key).map(col): _*)
    val rhs = r0.select(Seq(col(key), col("_bucket"), col("_ts"), lit(1).as("_side"),
      col("_payload")) ++ nullLefts: _*)
    val chs = carries.select(Seq(col(key), col("_bucket"), col("_ts"), lit(2).as("_side"),
      col("_payload")) ++ nullLefts: _*)

    // same descending mirror as [[asofJoinForward]] — within a bucket
    // the quadratic following-frame cost is bounded but still wasted
    val w = Window.partitionBy(col(key), col("_bucket"))
      .orderBy(col("_ts").desc, col("_side").desc, col("_payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.union(rhs).union(chs)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(Seq(col(key)) ++ lCols.filter(_ != key).map(col) ++
        rightPayload.map(c => col(s"_payload.$c").as(c)): _*)
  }

  // ------------------------------------------------------------------
  // Registry query: join every event to the hourly per-type average
  // that was current at its timestamp (rts = hour start ≤ ts always,
  // so inner semantics keep every event), then report the per-type
  // deviation of each event from its as-of rate. DuckDB's native
  // ASOF JOIN is the oracle.
  // ------------------------------------------------------------------
  val eventsAsofRates: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val rates = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
        .agg(roundPortable(avgExact(col("value")), 2).as("hourly_avg"))
      val joined = asofJoin(
        ev.select("event_type", "ts", "event_id", "value"),
        rates, key = "event_type", leftTs = "ts", rightTs = "rts",
        rightPayload = Seq("hourly_avg"))
        .filter(col("hourly_avg").isNotNull)
      joined
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          roundPortable(avgExact(col("value") - col("hourly_avg")), 4).as("avg_deviation"),
          roundPortable(max(abs(col("value") - col("hourly_avg"))), 2).as("max_deviation"))
        .orderBy("event_type")
    },
    Some("""WITH rates AS (
           |  SELECT event_type, date_trunc('hour', ts) AS rts,
           |    floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100 + 0.5) / 100 AS hourly_avg
           |  FROM events GROUP BY 1, 2
           |)
           |SELECT e.event_type, count(*) AS n_events,
           |  floor(CAST(sum(CAST(e.value - r.hourly_avg AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_deviation,
           |  floor(max(abs(e.value - r.hourly_avg)) * 100 + 0.5) / 100 AS max_deviation
           |FROM events e ASOF JOIN rates r
           |  ON e.event_type = r.event_type AND e.ts >= r.rts
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** The same report through the SKEW-HARDENED path: 1-day sub-key
    * buckets give |event_types|·|days| window tasks instead of
    * |event_types|. Same oracle as [[eventsAsofRates]] — the variants
    * are semantically identical by construction, and both hash-match
    * DuckDB's native ASOF JOIN independently.
    */
  val eventsAsofRatesBucketed: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val rates = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
        .agg(roundPortable(avgExact(col("value")), 2).as("hourly_avg"))
      val joined = asofJoinBucketed(
        ev.select("event_type", "ts", "event_id", "value"),
        rates, key = "event_type", leftTs = "ts", rightTs = "rts",
        rightPayload = Seq("hourly_avg"),
        bucketWidth = 24L * 3600 * 1000000) // 1 day of microseconds
        .filter(col("hourly_avg").isNotNull)
      joined
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          roundPortable(avgExact(col("value") - col("hourly_avg")), 4).as("avg_deviation"),
          roundPortable(max(abs(col("value") - col("hourly_avg"))), 2).as("max_deviation"))
        .orderBy("event_type")
    },
    eventsAsofRates.oracle
  )


  // ------------------------------------------------------------------
  // The FORWARD direction as a gated query: every event joined to the
  // NEXT hourly per-type average published at-or-after its timestamp
  // (the outcome/label join), reporting per-type deviation from that
  // future rate. Events in the stream's final partial hour have no
  // next rate and drop out under inner semantics — both engines agree
  // because the filter is explicit. DuckDB's native forward ASOF
  // (`e.ts <= r.rts`) is the oracle.
  // ------------------------------------------------------------------
  val eventsAsofNext: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val rates = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
        .agg(roundPortable(avgExact(col("value")), 2).as("hourly_avg"))
      val joined = asofJoinForward(
        ev.select("event_type", "ts", "event_id", "value"),
        rates, key = "event_type", leftTs = "ts", rightTs = "rts",
        rightPayload = Seq("hourly_avg"))
        .filter(col("hourly_avg").isNotNull)
      joined
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          roundPortable(avgExact(col("value") - col("hourly_avg")), 4).as("avg_deviation"),
          roundPortable(max(abs(col("value") - col("hourly_avg"))), 2).as("max_deviation"))
        .orderBy("event_type")
    },
    Some("""WITH rates AS (
           |  SELECT event_type, date_trunc('hour', ts) AS rts,
           |    floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100 + 0.5) / 100 AS hourly_avg
           |  FROM events GROUP BY 1, 2
           |)
           |SELECT e.event_type, count(*) AS n_events,
           |  floor(CAST(sum(CAST(e.value - r.hourly_avg AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_deviation,
           |  floor(max(abs(e.value - r.hourly_avg)) * 100 + 0.5) / 100 AS max_deviation
           |FROM events e ASOF JOIN rates r
           |  ON e.event_type = r.event_type AND e.ts <= r.rts
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** The forward report through the skew-hardened path — same oracle
    * as [[eventsAsofNext]]; both independently hash-match DuckDB's
    * forward ASOF JOIN.
    */
  val eventsAsofNextBucketed: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val rates = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
        .agg(roundPortable(avgExact(col("value")), 2).as("hourly_avg"))
      val joined = asofJoinForwardBucketed(
        ev.select("event_type", "ts", "event_id", "value"),
        rates, key = "event_type", leftTs = "ts", rightTs = "rts",
        rightPayload = Seq("hourly_avg"),
        bucketWidth = 24L * 3600 * 1000000) // 1 day of microseconds
        .filter(col("hourly_avg").isNotNull)
      joined
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          roundPortable(avgExact(col("value") - col("hourly_avg")), 4).as("avg_deviation"),
          roundPortable(max(abs(col("value") - col("hourly_avg"))), 2).as("max_deviation"))
        .orderBy("event_type")
    },
    eventsAsofNext.oracle
  )

  // ------------------------------------------------------------------
  // NEAREST-in-time as-of: each click matched to the CLOSER of its
  // latest-preceding and earliest-following purchase by the same user
  // — the feature-joining / sensor-fusion staple ("the reading nearest
  // this event", direction unknown a priori). COMPOSED from the two
  // directed primitives per the build rules: one backward pass
  // ([[asofJoin]]) carries (prev_id, prev_ts), one forward pass
  // ([[asofJoinForward]]) carries (next_id, next_ts), and a pure
  // projection picks the smaller |Δt| (tie → backward: no lookahead
  // unless strictly closer). delta_us is SIGNED — negative means the
  // match precedes the click. Harness (user_id, ts) purchase pairs are
  // unique at µs precision (checked all SFs), so the match is
  // deterministic without a payload tiebreak.
  //
  // Scale: two key-partitioned window passes (the directed joins'
  // documented one-shuffle cost each; the forward pass reuses the
  // hash partitioning, adding only its reversed sort) plus a codegen
  // projection — no range explosion, no broadcast requirement. The
  // skew-hardened variants slot in identically if the key set is
  // small.
  // ------------------------------------------------------------------
  val eventsAsofNearest: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purch = ev.filter(col("event_type") === "purchase")
      val withPrev = asofJoin(clicks,
        purch.select(col("user_id"), col("event_id").as("prev_id"), col("ts").as("prev_ts")),
        key = "user_id", leftTs = "ts", rightTs = "prev_ts",
        rightPayload = Seq("prev_id", "prev_ts"))
      val both = asofJoinForward(withPrev,
        purch.select(col("user_id"), col("event_id").as("next_id"), col("ts").as("next_ts")),
        key = "user_id", leftTs = "ts", rightTs = "next_ts",
        rightPayload = Seq("next_id", "next_ts"))
      val dPrev = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
      val dNext = unix_micros(col("next_ts")) - unix_micros(col("ts"))
      val usePrev = col("next_id").isNull || (col("prev_id").isNotNull && dPrev <= dNext)
      both.select(col("user_id"), col("event_id"),
        when(usePrev, col("prev_id")).otherwise(col("next_id")).as("nearest_id"),
        when(usePrev, -dPrev).otherwise(dNext).as("delta_us"),
        when(col("prev_id").isNull && col("next_id").isNull, lit(null).cast("string"))
          .when(usePrev, lit("backward")).otherwise(lit("forward")).as("direction"))
        .orderBy("event_id")
    },
    Some("""WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
           |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
           |b AS (SELECT c.user_id, c.event_id, c.ts, p.p_id AS prev_id, p.p_ts AS prev_ts
           |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts),
           |f AS (SELECT c.event_id, p.p_id AS next_id, p.p_ts AS next_ts
           |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.p_ts),
           |j AS (SELECT b.user_id, b.event_id, b.ts, b.prev_id, b.prev_ts, f.next_id, f.next_ts,
           |             (f.next_id IS NULL OR (b.prev_id IS NOT NULL AND
           |               epoch_us(b.ts) - epoch_us(b.prev_ts) <= epoch_us(f.next_ts) - epoch_us(b.ts)))
           |               AS use_prev
           |      FROM b JOIN f USING (event_id))
           |SELECT user_id, event_id,
           |  CASE WHEN use_prev THEN prev_id ELSE next_id END AS nearest_id,
           |  CASE WHEN use_prev THEN -(epoch_us(ts) - epoch_us(prev_ts))
           |       ELSE epoch_us(next_ts) - epoch_us(ts) END AS delta_us,
           |  CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
           |       WHEN use_prev THEN 'backward' ELSE 'forward' END AS direction
           |FROM j ORDER BY event_id""".stripMargin)
  )

  // ------------------------------------------------------------------
  // TOLERANCE-bounded as-of: the backward join with a staleness cap —
  // pandas `merge_asof(tolerance=...)` / polars `join_asof(tolerance)`
  // semantics, the missing member of the directed/bucketed/nearest
  // family. A preceding match older than the tolerance is DISCARDED
  // (not replaced by an older one): attribution windows, sensor
  // staleness gates, feature-freshness SLAs. Composed per the build
  // rules: the one-shuffle backward primitive carries (id, ts), and a
  // pure codegen projection gates on Δt — the tolerance adds ZERO
  // plan cost over the plain as-of. Statuses distinguish "no prior
  // purchase ever" (none) from "prior purchase too stale" (expired).
  // Harness (user_id, ts) purchase pairs are unique at µs precision
  // (the eventsAsofNearest check), so no payload tiebreak is needed.
  // ------------------------------------------------------------------
  val TolUs: Long = 6L * 3600 * 1000000 // 6 hours

  val eventsAsofTolerance: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purch = ev.filter(col("event_type") === "purchase")
      val joined = asofJoin(clicks,
        purch.select(col("user_id"), col("event_id").as("prev_id"),
          col("ts").as("prev_ts"), col("value").as("prev_value")),
        key = "user_id", leftTs = "ts", rightTs = "prev_ts",
        rightPayload = Seq("prev_id", "prev_ts", "prev_value"))
      val dPrev = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
      val within = col("prev_id").isNotNull && dPrev <= TolUs
      joined.select(col("user_id"), col("event_id"),
        when(within, col("prev_id")).as("purchase_id"),
        when(within, dPrev).as("delta_us"),
        when(within, col("prev_value")).as("purchase_value"),
        when(col("prev_id").isNull, "none").when(within, "matched")
          .otherwise("expired").as("match_status"))
        .orderBy("event_id")
    },
    Some(s"""WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
            |p AS (SELECT user_id, event_id AS p_id, ts AS p_ts, value AS p_value
            |      FROM events WHERE event_type = 'purchase'),
            |b AS (SELECT c.user_id, c.event_id, c.ts, p.p_id, p.p_ts, p.p_value
            |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts)
            |SELECT user_id, event_id,
            |  CASE WHEN p_id IS NOT NULL AND epoch_us(ts) - epoch_us(p_ts) <= $TolUs
            |       THEN p_id END AS purchase_id,
            |  CASE WHEN p_id IS NOT NULL AND epoch_us(ts) - epoch_us(p_ts) <= $TolUs
            |       THEN epoch_us(ts) - epoch_us(p_ts) END AS delta_us,
            |  CASE WHEN p_id IS NOT NULL AND epoch_us(ts) - epoch_us(p_ts) <= $TolUs
            |       THEN p_value END AS purchase_value,
            |  CASE WHEN p_id IS NULL THEN 'none'
            |       WHEN epoch_us(ts) - epoch_us(p_ts) <= $TolUs THEN 'matched'
            |       ELSE 'expired' END AS match_status
            |FROM b ORDER BY event_id""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq(
    "events_asof_rates" -> eventsAsofRates,
    "events_asof_rates_bucketed" -> eventsAsofRatesBucketed,
    "events_asof_next" -> eventsAsofNext,
    "events_asof_next_bucketed" -> eventsAsofNextBucketed,
    "events_asof_nearest" -> eventsAsofNearest,
    "events_asof_tolerance" -> eventsAsofTolerance)

}
