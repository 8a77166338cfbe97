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
  * cardinality. Skewed keys take the standard window mitigation
  * (time-bucketed sub-keys when one key dominates).
  */
object AsOf {

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

  val queries: Seq[(String, Q)] = Seq("events_asof_rates" -> eventsAsofRates)
}
