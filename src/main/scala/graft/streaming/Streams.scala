package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Functions.{avgExact, roundPortable}

/** Structured Streaming forms of the event analytics (SURVEY.md §7.1-7
  * extension; the reference itself has no streaming surface, §2.10).
  *
  * Each transform takes the *unbounded* events DataFrame
  * (`readStream` source) and returns a streaming DataFrame; the batch
  * twins in [[graft.ext.Sessions]] share the same expressions, so the
  * DuckDB oracle on the batch path vouches for the streaming logic
  * (SURVEY.md §7.2: streams stay out of the driver-verified set).
  *
  * Scale notes: watermarks bound state (2h on 1h windows ⇒ ≤ 3 open
  * windows per key); aggregation state is hash-partitioned by
  * (window, event_type) — adding executors scales linearly. Use
  * `spark.sql.streaming.statefulOperator.stateRebalancing` defaults;
  * state store is RocksDB-able in prod via
  * `spark.sql.streaming.stateStore.providerClass`.
  */
object Streams {

  /** Streaming twin of `Sessions.hourly`: tumbling 1-hour windows per
    * event_type, tolerating 2 hours of lateness.
    */
  def hourlyWindowed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        roundPortable(avgExact(col("value")), 2).as("avg_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n_events"), col("avg_value"))

  /** Streaming high-value alert filter (stateless — pure pushdown). */
  def highValueEvents(events: DataFrame, threshold: Double = 150.0): DataFrame =
    events.filter(col("value") >= threshold)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
}
