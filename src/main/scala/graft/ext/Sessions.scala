package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Functions.{avgExact, roundPortable}
import graft.queries.Inventory
import graft.queries.Inventory.Q

/** Event-stream analytics over the `events` table — the batch forms.
  * (The Structured Streaming variants live in `graft.streaming` and
  * are validated in ScalaTest; DuckDB can only oracle the batch
  * equivalents, SURVEY.md §7.2.)
  */
object Sessions {

  val GapSeconds = 1800L

  // ------------------------------------------------------------------
  // Sessionization: a session breaks after a 30-min silence. One `lag`
  // window partitioned BY USER — at scale this is one shuffle on
  // user_id and each user's timeline sorts locally; no global sort, no
  // driver involvement. The per-user session COUNT is just
  // sum(new_session), so no running-sum window pass is needed (the
  // running session_seq only matters when tagging individual events —
  // see `graft.streaming.Streams` for that shape).
  // ------------------------------------------------------------------
  val sessionize: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(byUser)
      val newSession = when(prev.isNull || (us - prev) > GapSeconds * 1000000L, 1L).otherwise(0L)
      ev.withColumn("new_session", newSession)
        .groupBy("user_id")
        .agg(
          sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"),
          roundPortable(count(lit(1)).cast("double") / sum(col("new_session")), 4)
            .as("avg_events_per_session"))
        .orderBy("user_id")
    },
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
           |         THEN 1 ELSE 0 END AS new_session
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |)
           |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events,
           |       floor(CAST(count(*) AS DOUBLE) / sum(new_session) * 10000 + 0.5) / 10000 AS avg_events_per_session
           |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Tumbling-window aggregation (the batch twin of the streaming
  // windowed agg): 1-hour windows × event_type. Uses Spark's window()
  // operator; keyed output as epoch-hour string for cross-engine
  // comparison.
  // ------------------------------------------------------------------
  val hourly: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          roundPortable(avgExact(col("value")), 2).as("avg_value"),
          countDistinct(col("user_id")).as("unique_users"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"), col("n_events"), col("avg_value"), col("unique_users"))
        .orderBy("hour", "event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           |       event_type, count(*) AS n_events,
           |       floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100 + 0.5) / 100 AS avg_value,
           |       count(DISTINCT user_id) AS unique_users
           |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Cohort retention — users grouped by their FIRST active week, then
  // for each (cohort, weeks-since) cell the distinct users still
  // active, with the retention rate against the cohort's size. The
  // classic product-analytics matrix.
  //
  // Scale notes: one shuffle on user_id builds both the distinct
  // (user, week) activity set and the per-user first week (the
  // groupBy reuses the distinct's partitioning); the matrix aggregate
  // shuffles on (cohort_week, weeks_since) — cells, not events. The
  // cohort-size join is a broadcast (one row per cohort week).
  // ------------------------------------------------------------------
  val cohortRetention: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val weekOf = date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
      val userWeeks = ev.select(col("user_id"), weekOf.as("week")).distinct()
      val cohorts = userWeeks.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      val sizes = cohorts.groupBy("cohort_week")
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val cells = userWeeks.join(cohorts, Seq("user_id"))
        .withColumn("weeks_since",
          (datediff(col("week").cast("date"), col("cohort_week").cast("date")) / 7).cast("int"))
        .groupBy("cohort_week", "weeks_since")
        .agg(countDistinct(col("user_id")).as("active_users"))
      cells.join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("weeks_since"), col("active_users"),
          roundPortable(col("active_users").cast("double") / col("cohort_size"), 4)
            .as("retention_rate"))
        .orderBy("cohort_week", "weeks_since")
    },
    Some("""WITH uw AS (
           |  SELECT DISTINCT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week FROM events
           |), cohorts AS (
           |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
           |), sizes AS (
           |  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size FROM cohorts GROUP BY 1
           |), cells AS (
           |  SELECT c.cohort_week,
           |         CAST(date_diff('day', CAST(c.cohort_week AS DATE), CAST(u.week AS DATE)) // 7 AS INTEGER) AS weeks_since,
           |         count(DISTINCT u.user_id) AS active_users
           |  FROM uw u JOIN cohorts c USING (user_id)
           |  GROUP BY 1, 2
           |)
           |SELECT cells.cohort_week, cells.weeks_since, cells.active_users,
           |       floor(CAST(cells.active_users AS DOUBLE) / s.cohort_size * 10000 + 0.5) / 10000 AS retention_rate
           |FROM cells JOIN sizes s USING (cohort_week)
           |ORDER BY cohort_week, weeks_since""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq(
    "events_sessionize" -> sessionize,
    "events_hourly_window" -> hourly,
    "events_cohort_retention" -> cohortRetention
  )
}
