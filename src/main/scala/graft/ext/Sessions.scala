package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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
  // Peak session CONCURRENCY per day — the sweep-line / prefix-sum
  // classic (the interval-scheduling "maximum overlap" primitive):
  // every session contributes +1 at its start and −1 just past its
  // end (end-inclusive sessions ⇒ −1 at e_us + 1); the running sum of
  // deltas over the time axis IS the number of concurrently-active
  // sessions, and its per-day maximum is what capacity planning /
  // abuse detection reads. Equal-timestamp transitions collapse into
  // one NET delta per microsecond BEFORE the prefix sum, so no
  // tie-order contract is ever needed — sums commute.
  //
  // THE SCALE SHAPE IS THE POINT: a naive global running sum is a
  // single-partition window over a corpus-sized transition table. This
  // plan is the two-level prefix sum expressed declaratively — the
  // intra-day running sum is [[graft.engine.Windows.groupedPrefixSum]]
  // over `day` (a per-day WINDOW would bound the TASK COUNT by the
  // calendar but not the task SIZE: one day of a 100 TB event stream
  // is billions of distinct boundary timestamps in ONE sorted task —
  // the same mass-vs-task-size trap as the budget waterline's qbin;
  // the primitive range-splits a hot day across partitions instead),
  // the daily NET deltas collapse to a |days|-row table, and the only
  // unpartitioned window runs over THAT (the repo's daily-collapse
  // convention: bounded by the calendar, not the corpus). Peak(day) =
  // start-of-day concurrency (global cumsum of prior days' nets) +
  // max intra-day prefix. Identical algebra to the oracle's direct
  // global cumsum, restructured for a 1000-executor cluster. Integer
  // arithmetic end to end.
  // ------------------------------------------------------------------
  val concurrency: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val usC = unix_micros(col("ts"))
      val prev = lag(usC, 1).over(byUser)
      val marked = ev
        .withColumn("us", usC)
        .withColumn("new_session",
          when(prev.isNull || (usC - prev) > GapSeconds * 1000000L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_session")).over(byUser))
      val sessions = marked.groupBy(col("user_id"), col("sess"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      val trans = sessions
        .select(explode(array(
          struct(col("s_us").as("us"), lit(1L).as("delta")),
          struct((col("e_us") + 1L).as("us"), lit(-1L).as("delta")))).as("t"))
        .select(col("t.us").as("us"), col("t.delta").as("delta"))
        .groupBy("us").agg(sum(col("delta")).as("delta"))
        .withColumn("day", to_date(timestamp_micros(col("us"))))
      val perDay = graft.engine.Windows
        .groupedPrefixSum(trans, Seq("day"), Seq(col("us")), col("delta"), "run")
        .groupBy("day")
        .agg(max(col("run")).as("max_run"), sum(col("delta")).as("net"),
          count(lit(1)).as("n_transitions"))
      val wDays = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      perDay
        .withColumn("day_start", coalesce(sum(col("net")).over(wDays), lit(0L)))
        .select(col("day"), (col("day_start") + col("max_run")).as("peak_concurrent"),
          col("n_transitions"))
        .orderBy("day")
    },
    Some(s"""WITH marked AS (
            |  SELECT user_id, event_id, epoch_us(ts) AS us,
            |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
            |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapSeconds * 1000000
            |         THEN 1 ELSE 0 END AS new_session
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            |), sess AS (
            |  SELECT user_id, us,
            |         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
            |  FROM marked
            |), sessions AS (
            |  SELECT user_id, sess, min(us) AS s_us, max(us) AS e_us
            |  FROM sess GROUP BY 1, 2
            |), trans AS (
            |  SELECT us, CAST(sum(delta) AS BIGINT) AS delta FROM (
            |    SELECT s_us AS us, 1 AS delta FROM sessions
            |    UNION ALL
            |    SELECT e_us + 1 AS us, -1 AS delta FROM sessions
            |  ) GROUP BY us
            |), run AS (
            |  SELECT us,
            |    CAST(sum(delta) OVER (ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
            |  FROM trans
            |)
            |SELECT CAST(make_timestamp(us) AS DATE) AS day,
            |       CAST(max(conc) AS BIGINT) AS peak_concurrent,
            |       count(*) AS n_transitions
            |FROM run GROUP BY 1 ORDER BY 1""".stripMargin)
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

  // ------------------------------------------------------------------
  // Conversion funnel — the ordered-stage analytics every product
  // pipeline runs: of the users who VIEWed, how many went on to CLICK
  // (strictly at-or-after their first view), and of those, how many
  // PURCHASEd after that click. Each stage anchors on the previous
  // stage's first qualifying timestamp, so out-of-order events (a
  // purchase before ever viewing) never count — the semantics that a
  // naive "has all three types" set-intersection gets wrong.
  //
  // Scale notes: three aggregations and two joins, ALL keyed on
  // user_id — the per-stage anchor tables are |users| rows, and since
  // every operator shares the user_id partitioning, the planner reuses
  // one exchange per input rather than reshuffling between stages.
  // Integer microsecond comparisons end-to-end (no timestamp
  // arithmetic ambiguity between engines).
  // ------------------------------------------------------------------
  val funnel: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val viewed = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t_view"))
      val clicked = ev.filter(col("event_type") === "click")
        .join(viewed, Seq("user_id"))
        .filter(col("us") >= col("t_view"))
        .groupBy("user_id").agg(min(col("us")).as("t_click"))
      val purchased = ev.filter(col("event_type") === "purchase")
        .join(clicked, Seq("user_id"))
        .filter(col("us") >= col("t_click"))
        .groupBy("user_id").agg(min(col("us")).as("t_purchase"))
      viewed.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(clicked.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(purchased.agg(count(lit(1)).as("n_purchased_after_click")))
        .select(col("n_viewed"), col("n_clicked_after_view"), col("n_purchased_after_click"),
          // nullif guards degenerate corpora: Spark's non-ANSI /0 is
          // NULL while DuckDB's IEEE double /0 is inf/NaN — an
          // explicit NULL denominator makes both engines emit NULL
          roundPortable(col("n_clicked_after_view").cast("double") /
            nullif(col("n_viewed"), lit(0L)), 4).as("view_to_click"),
          roundPortable(col("n_purchased_after_click").cast("double") /
            nullif(col("n_clicked_after_view"), lit(0L)), 4).as("click_to_purchase"))
    },
    Some("""WITH v AS (
           |  SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
           |  WHERE event_type = 'view' GROUP BY 1
           |), c AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
           |  FROM events e JOIN v ON v.user_id = e.user_id
           |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
           |  GROUP BY 1
           |), p AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
           |  FROM events e JOIN c ON c.user_id = e.user_id
           |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
           |  GROUP BY 1
           |)
           |SELECT (SELECT count(*) FROM v) AS n_viewed,
           |       (SELECT count(*) FROM c) AS n_clicked_after_view,
           |       (SELECT count(*) FROM p) AS n_purchased_after_click,
           |       floor(CAST((SELECT count(*) FROM c) AS DOUBLE) / nullif((SELECT count(*) FROM v), 0) * 10000 + 0.5) / 10000 AS view_to_click,
           |       floor(CAST((SELECT count(*) FROM p) AS DOUBLE) / nullif((SELECT count(*) FROM c), 0) * 10000 + 0.5) / 10000 AS click_to_purchase""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Event debounce — collapse bursts of the same (user, event_type)
  // key: keep the FIRST event of every burst, where a burst chains
  // raw inter-event gaps ≤ the throttle window (the dedup rule for
  // retry storms / double-clicks; the batch twin of a rate limiter).
  // This burst-start rule — rather than "window since the last KEPT
  // event", whose chained recurrence needs a sequential per-key scan —
  // is what production systems implement at scale, and it reduces to
  // one `lag` window: an event is kept iff its gap from the previous
  // RAW event exceeds the window (same recurrence as sessionize).
  // One shuffle on (user, type); per-key timelines sort locally.
  // ------------------------------------------------------------------
  val DebounceSeconds = 300L

  val debounce: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(w)
      val kept = when(prev.isNull || (us - prev) > DebounceSeconds * 1000000L, 1L).otherwise(0L)
      ev.withColumn("kept", kept)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("kept")).as("n_kept"),
          (count(lit(1)) - sum(col("kept"))).as("n_debounced"))
        .orderBy("event_type")
    },
    Some(s"""WITH marked AS (
            |  SELECT event_type,
            |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
            |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $DebounceSeconds * 1000000
            |         THEN 1 ELSE 0 END AS kept
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
            |)
            |SELECT event_type, count(*) AS n_events,
            |       CAST(sum(kept) AS BIGINT) AS n_kept,
            |       CAST(count(*) - sum(kept) AS BIGINT) AS n_debounced
            |FROM marked GROUP BY 1 ORDER BY event_type""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Daily-volume anomaly detection per event type — median + MAD over
  // the per-day counts, flagging days where |n − median| > 3·MAD. The
  // robust twin of a stddev alert: a traffic spike cannot drag the
  // threshold that is supposed to catch it (the same median/MAD pair
  // as `text_outliers_mad`, applied to operational time series). Two
  // passes by construction (the second needs the first's median), but
  // both run on the DAILY AGGREGATE (≤ days·|types| rows) — the raw
  // event scan aggregates map-side to one row per (type, day) before
  // anything shuffles, so at 100 TB the robust-stats machinery never
  // touches event-grain data. Thresholds compare 4dp-ROUNDED
  // median/MAD so both engines gate on identical values.
  // ------------------------------------------------------------------
  val AnomalyK = 3.0

  val anomalyDays: Q = Q(
    (s, d) => {
      val daily = Inventory.events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val med = daily.groupBy("event_type")
        .agg(roundPortable(percentile(col("n_events"), lit(0.5)), 4).as("median_n"))
      val withMed = daily.join(med, Seq("event_type"))
        .withColumn("adev", abs(col("n_events") - col("median_n")))
      val mad = withMed.groupBy("event_type")
        .agg(roundPortable(percentile(col("adev"), lit(0.5)), 4).as("mad_n"))
      withMed.join(mad, Seq("event_type"))
        .select(col("event_type"), col("day"), col("n_events"),
          col("median_n"), col("mad_n"),
          (col("adev") > lit(AnomalyK) * col("mad_n")).as("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some(s"""WITH daily AS (
            |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
            |  FROM events GROUP BY 1, 2
            |), med AS (
            |  SELECT event_type, floor(quantile_cont(n_events, 0.5) * 10000 + 0.5) / 10000 AS median_n
            |  FROM daily GROUP BY 1
            |), dev AS (
            |  SELECT d.event_type, d.day, d.n_events, m.median_n,
            |         abs(d.n_events - m.median_n) AS adev
            |  FROM daily d JOIN med m USING (event_type)
            |), mad AS (
            |  SELECT event_type, floor(quantile_cont(adev, 0.5) * 10000 + 0.5) / 10000 AS mad_n
            |  FROM dev GROUP BY 1
            |)
            |SELECT d.event_type, d.day, d.n_events, d.median_n, m.mad_n,
            |       d.adev > $AnomalyK * m.mad_n AS is_anomaly
            |FROM dev d JOIN mad m USING (event_type)
            |ORDER BY d.event_type, d.day""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Event-transition matrix — first-order Markov mining over per-user
  // timelines: for every (from → to) event-type pair, the transition
  // count and the row-normalized probability. The sequence-level
  // complement of the funnel query: the funnel checks ONE prescribed
  // path, the matrix surfaces every path users actually take (loops
  // included). Ties in timestamps break on event_id, so the sequence
  // — and therefore the matrix — is deterministic in both engines.
  //
  // Scale: one shuffle on user_id (the same lag-window profile as
  // sessionize — each user's timeline sorts locally), then the pair
  // aggregate collapses map-side to ≤ |types|² rows. The row
  // normalization is a window over that tiny matrix, never the events.
  // ------------------------------------------------------------------
  val transitionMatrix: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val wRow = Window.partitionBy("from_type")
      pairs
        .withColumn("row_total", sum(col("n")).over(wRow))
        .select(col("from_type"), col("to_type"), col("n"),
          roundPortable(col("n").cast("double") / col("row_total"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH seq AS (
           |  SELECT event_type,
           |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           |  FROM events
           |), pairs AS (
           |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
           |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
           |)
           |SELECT from_type, to_type, n,
           |       floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) * 1000000 + 0.5) / 1000000 AS p
           |FROM pairs ORDER BY from_type, to_type""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Session path mining — the top event-type journeys. Builds on the
  // same gap-based sessionization as `events_sessionize` (session id =
  // running sum of session starts per user timeline), takes each
  // session's first `PathLen` events IN ORDER, and counts the
  // resulting paths corpus-wide: "what do sessions actually do", the
  // sequence complement of `events_transition_matrix` (which sees
  // only adjacent pairs) and `events_funnel` (which checks ONE
  // prescribed path — this query discovers the paths worth
  // prescribing).
  //
  // Scale shape: the per-session head is an aggregate over the
  // (user, session) key — array_sort(collect_list(struct)) buffers
  // ONE SESSION's events per group (bounded by session length, never
  // a user's history or the corpus), sliced to PathLen before any
  // further movement, so the path aggregate shuffles ≤ PathLen types
  // per session. The final top-k is count-ordered with a total
  // (count, path) tiebreak. Ordering inside the collect is pinned by
  // (ts, event_id) — unique per user — so the path strings are
  // deterministic under any partitioning; the oracle replays them
  // with DuckDB's ordered list() aggregate.
  // ------------------------------------------------------------------
  val PathLen = 4
  val TopPaths = 15

  val topPaths: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagWin = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(lagWin)
      val newSession = when(prev.isNull || (us - prev) > GapSeconds * 1000000L, 1L).otherwise(0L)
      ev
        .withColumn("sess_no", sum(newSession).over(byUser))
        .groupBy("user_id", "sess_no")
        .agg(slice(array_sort(collect_list(struct(us.as("us"), col("event_id"),
          col("event_type")))), 1, PathLen).as("head"))
        .select(array_join(col("head.event_type"), ">").as("path"), col("user_id"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(TopPaths)
    },
    Some(s"""WITH marked AS (
            |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
            |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
            |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapSeconds * 1000000
            |         THEN 1 ELSE 0 END AS new_session
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            |), sess AS (
            |  SELECT user_id, event_id, event_type, us,
            |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
            |  FROM marked
            |), paths AS (
            |  SELECT user_id, sess_no,
            |         array_to_string((list(event_type ORDER BY us, event_id))[1:$PathLen], '>') AS path
            |  FROM sess GROUP BY 1, 2
            |)
            |SELECT path, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users
            |FROM paths GROUP BY 1
            |ORDER BY n_sessions DESC, path LIMIT $TopPaths""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Rolling 7-day active users (WAU-per-day) — the standard activity
  // metric, in its SCALABLE formulation. The naive window
  // (`count(DISTINCT) OVER (RANGE 6 PRECEDING)`) isn't supported by
  // Spark (distinct window aggregates), and a range join against the
  // day dimension would compare every presence row against EVERY day
  // (broadcast-nested-loop — O(|days|) per row; 10 years ≈ 3 650×).
  // Instead: (1) dedup to the (day, user) presence grid — ONE shuffle
  // that collapses 100 TB of events to |days|·|users| rows map-side;
  // (2) fan each presence row out to exactly the 7 anchor days it
  // supports via `explode(sequence(day, day+6))` — a CONSTANT-bounded
  // explode, no join needed to find the anchors; (3) equi-join the
  // anchors onto the (broadcast, calendar-sized) observed-day
  // dimension to drop anchors past the data's edge; (4) exact
  // countDistinct per anchor. No step touches the raw event log
  // twice, and nothing is driver-side.
  // ------------------------------------------------------------------
  // ------------------------------------------------------------------
  // GINI coefficient of per-user activity (Gini 1912; the Lorenz-sum
  // formulation Σ(2i − n − 1)·x_i / (n·Σx) over ascending-sorted
  // x — public statistics): the inequality screen a platform/data
  // team runs on contribution distributions — a corpus whose events
  // (or tokens, or documents) come 0.95-Gini-concentrated from a
  // handful of users is a bot-farm / scraper signature and a
  // de-biasing problem for training data (the per-group quality caps
  // and language-mix weights exist precisely to flatten it; this
  // measures how much flattening is needed). Published: user count,
  // event total, the 6dp Gini.
  //
  // Determinism: counts are LONGs; the Lorenz weight (2i − n − 1)
  // is integer from a (count, user_id)-ordered rank; the weighted
  // sum rides DECIMAL(38,0) (exact, order-free — i·x products
  // overflow LONG near 10^9 users × heavy tails) and ONE double
  // division lands on the 6dp grid. Scale: one corpus aggregate to
  // |users| rows; the Lorenz rank over that collapse runs through
  // Windows.globalRowNumber (range partition + per-partition offsets),
  // so even 10^9 users never sort in a single task — no unpartitioned
  // window anywhere on this path.
  // ------------------------------------------------------------------
  val gini: Q = Q(
    (s, d) => {
      val perUser = Inventory.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("x"))
      val d18 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 0))
      graft.engine.Windows.globalRowNumber(perUser, Seq(col("x"), col("user_id")), "i")
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("total_events"),
          sum(d18(lit(2L) * col("i") - lit(1L)) * d18(col("x"))).as("num0"))
        .select(col("n_users"), col("total_events"),
          roundPortable(
            (col("num0") - d18(col("n_users")) * d18(col("total_events"))).cast(DoubleType)
              / (d18(col("n_users")) * d18(col("total_events"))).cast(DoubleType), 6)
            .as("gini"))
    },
    Some("""WITH perUser AS (
           |  SELECT user_id, count(*) AS x FROM events GROUP BY 1
           |), ranked AS (
           |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM perUser
           |), g AS (
           |  SELECT count(*) AS n_users,
           |         CAST(sum(x) AS BIGINT) AS total_events,
           |         CAST(sum(CAST(2 * i - 1 AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS num0
           |  FROM ranked
           |)
           |SELECT n_users, total_events,
           |  floor(CAST(num0 - CAST(n_users AS DECIMAL(18,0)) * CAST(total_events AS DECIMAL(18,0)) AS DOUBLE)
           |        / CAST(CAST(n_users AS DECIMAL(18,0)) * CAST(total_events AS DECIMAL(18,0)) AS DOUBLE)
           |        * 1000000 + 0.5) / 1000000 AS gini
           |FROM g""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Daily behavioral ENTROPY — Shannon entropy of the event-type
  // distribution per day, H = −Σ p·log₂p (Shannon 1948 — public):
  // the diversity monitor behind "did the traffic mix collapse?" —
  // a bot flood, a broken client, or a scraper shows up as an entropy
  // CRASH (one type dominating) long before volume alone flags it,
  // and evenness (H / log₂|types|) normalizes the signal across days
  // with different active type counts. Complements the volume-based
  // `events_anomaly_days` (MAD) with a mix-based channel.
  //
  // Determinism: each type's term lands on the 1e-6 grid as a LONG
  // immediately after the transcendental step, so the per-day sum is
  // integer; ln(2) enters as the same 17-digit literal in BOTH
  // engines (libm ln(2.0) could differ by an ulp between them).
  // Scale: one (day, type) aggregate map-side combines to
  // |days|·|types| rows; everything after is grid-sized.
  // ------------------------------------------------------------------
  private val Ln2 = "0.6931471805599453"

  val entropyDaily: Q = Q(
    (s, d) => {
      val byDay = Inventory.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("nd", sum(col("n")).over(Window.partitionBy("day")))
      val p = col("n").cast(DoubleType) / col("nd").cast(DoubleType)
      val term6 = floor(p * (log(p) / lit(Ln2.toDouble)) * lit(1e6) + lit(0.5)).cast("long")
      byDay.select(col("day"), col("n"), col("nd"), term6.as("t6"))
        .groupBy("day")
        .agg(max(col("nd")).as("n_events"), count(lit(1)).as("n_types"),
          (-sum(col("t6"))).as("h6"))
        .select(col("day"), col("n_events"), col("n_types"),
          roundPortable(col("h6").cast(DoubleType) / lit(1e6), 6).as("entropy_bits"),
          roundPortable(col("h6").cast(DoubleType) / lit(1e6) /
            nullif(log(col("n_types").cast(DoubleType)) / lit(Ln2.toDouble), lit(0.0)), 6)
            .as("evenness"))
        .orderBy("day")
    },
    Some(s"""WITH g AS (
            |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2
            |), e AS (
            |  SELECT day, n, CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS nd FROM g
            |), t AS (
            |  SELECT day, n, nd,
            |    CAST(floor(CAST(n AS DOUBLE) / nd * (ln(CAST(n AS DOUBLE) / nd) / $Ln2) * 1000000 + 0.5) AS BIGINT) AS t6
            |  FROM e
            |), h AS (
            |  SELECT day, CAST(max(nd) AS BIGINT) AS n_events, count(*) AS n_types,
            |         CAST(-sum(t6) AS BIGINT) AS h6
            |  FROM t GROUP BY 1
            |)
            |SELECT day, n_events, n_types,
            |  floor(CAST(h6 AS DOUBLE) / 1000000 * 1000000 + 0.5) / 1000000 AS entropy_bits,
            |  floor(CAST(h6 AS DOUBLE) / 1000000 / nullif(ln(CAST(n_types AS DOUBLE)) / $Ln2, 0.0) * 1000000 + 0.5) / 1000000 AS evenness
            |FROM h ORDER BY day""".stripMargin)
  )

  // ------------------------------------------------------------------
  // DAU/MAU STICKINESS — the engagement ratio product teams anchor on
  // (daily active ÷ trailing-30-day active; 1.0 = every monthly user
  // shows up daily). Same engine shape as [[activeUsers]]' rolling
  // window: the distinct (day, user) grid explodes each activity day
  // onto the 30 anchors it supports, pruned to REAL anchors by a
  // broadcast of the day list — the rolling distinct-count as one
  // shuffle, no per-day re-scan, exact countDistinct per the
  // reference contract. Integer counts; one 6dp ratio.
  // ------------------------------------------------------------------
  val MauDays = 30

  val dauMau: Q = Q(
    (s, d) => {
      val p = Inventory.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = p.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val days = p.select(col("day").as("anchor")).distinct()
      val mau = p
        .withColumn("anchor", explode(sequence(col("day"), date_add(col("day"), MauDays - 1))))
        .join(broadcast(days), Seq("anchor"))
        .groupBy("anchor").agg(countDistinct(col("user_id")).as("mau_30d"))
      dau.join(mau, col("day") === col("anchor"))
        .select(col("day"), col("dau"), col("mau_30d"),
          roundPortable(col("dau").cast(DoubleType) / col("mau_30d").cast(DoubleType), 6)
            .as("stickiness"))
        .orderBy("day")
    },
    Some(s"""WITH p AS (
            |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
            |), dau AS (
            |  SELECT day, count(DISTINCT user_id) AS dau FROM p GROUP BY 1
            |), days AS (
            |  SELECT DISTINCT day AS anchor FROM p
            |), mau AS (
            |  SELECT d.anchor, count(DISTINCT p.user_id) AS mau_30d
            |  FROM days d JOIN p ON p.day BETWEEN d.anchor - ${MauDays - 1} AND d.anchor
            |  GROUP BY 1
            |)
            |SELECT dau.day, dau.dau, mau.mau_30d,
            |  floor(CAST(dau.dau AS DOUBLE) / mau.mau_30d * 1000000 + 0.5) / 1000000 AS stickiness
            |FROM dau JOIN mau ON mau.anchor = dau.day ORDER BY day""".stripMargin)
  )

  val RollingDays = 7

  val activeUsers: Q = Q(
    (s, d) => {
      val p = Inventory.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = p.select(col("day").as("anchor")).distinct()
      p.withColumn("anchor",
          explode(sequence(col("day"), date_add(col("day"), RollingDays - 1))))
        .join(broadcast(days), Seq("anchor"))
        .groupBy(col("anchor"))
        .agg(countDistinct(col("user_id")).as("active_users_7d"))
        .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"), col("active_users_7d"))
        .orderBy("day")
    },
    Some(s"""WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
            |d AS (SELECT DISTINCT day AS anchor FROM p)
            |SELECT strftime(anchor, '%Y-%m-%d') AS day,
            |       count(DISTINCT p.user_id) AS active_users_7d
            |FROM d JOIN p ON p.day > anchor - $RollingDays AND p.day <= anchor
            |GROUP BY anchor ORDER BY day""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Gaps-and-islands: per-user consecutive-active-day streaks via the
  // classic `day - row_number()` island anchor (consecutive days share
  // an anchor; any gap shifts it). Everything after the presence dedup
  // is windows/aggregates PARTITIONED BY USER — one shuffle profile,
  // each user's (≤ |days|) presence rows sort locally. The same shape
  // computes login streaks, sensor-uptime islands, and contiguous
  // version ranges at any scale.
  // ------------------------------------------------------------------
  val streaks: Q = Q(
    (s, d) => {
      val p = Inventory.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
      p.withColumn("rn", row_number().over(byUser))
        .withColumn("anchor", date_sub(col("day"), col("rn")))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"),
          sum(col("len")).as("active_days"))
        .orderBy("user_id")
    },
    Some("""WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           |i AS (SELECT user_id,
           |             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
           |      FROM p),
           |g AS (SELECT user_id, anchor, count(*) AS len FROM i GROUP BY 1, 2)
           |SELECT user_id, count(*) AS n_streaks, max(len) AS longest_streak,
           |       CAST(sum(len) AS BIGINT) AS active_days
           |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Interval-overlap join, exercised end-to-end: user sessions (the
  // gap-rule intervals) joined against "incident windows" (hours whose
  // event volume exceeds 1.25× the per-hour mean — the comparison is
  // kept in exact integer cross-multiplied form so both engines decide
  // identically). The join itself is [[Joins.intervalJoin]] — the
  // bucketed-equi-join rewrite of the inequality predicate; see its
  // scaladoc for the cost model. DuckDB oracles the PLAIN inequality
  // join, proving the bucketed rewrite row-identical.
  // ------------------------------------------------------------------
  val IncidentFactorPct = 125

  val intervalOverlap: Q = Q(
    (s, d) => {
      val e = Inventory.events(s, d)
        .withColumn("sec", expr("unix_micros(ts) div 1000000"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prev = lag(col("sec"), 1).over(byUser)
      val sessions = e
        .withColumn("new_session",
          when(prev.isNull || col("sec") - prev > GapSeconds, 1L).otherwise(0L))
        .withColumn("sess_no",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(min(col("sec")).as("s_start"), max(col("sec")).as("s_end"))
      val hours = e.groupBy(expr("sec div 3600").as("hcell")).agg(count(lit(1)).as("c"))
      val tot = hours.agg(sum(col("c")).as("total"), count(lit(1)).as("n_hours"))
      val incidents = hours.crossJoin(broadcast(tot))
        .filter(col("c") * col("n_hours") * lit(100L) > col("total") * lit(IncidentFactorPct.toLong))
        .select(col("hcell"),
          (col("hcell") * 3600L).as("i_start"),
          (col("hcell") * 3600L + 3599L).as("i_end"))
      graft.engine.Joins
        .intervalJoin(sessions, "s_start", "s_end", incidents, "i_start", "i_end", 3600L)
        .groupBy(col("hcell"))
        .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
        .select(
          date_format(timestamp_micros(col("hcell") * lit(3600000000L)), "yyyy-MM-dd HH:00")
            .as("hour"),
          col("n_sessions"), col("n_users"))
        .orderBy("hour")
    },
    Some(s"""WITH e AS (
            |  SELECT user_id, event_id, ts, epoch_us(ts) // 1000000 AS sec FROM events
            |), marked AS (
            |  SELECT user_id, ts, event_id, sec,
            |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > $GapSeconds
            |         THEN 1 ELSE 0 END AS new_session
            |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            |), sess AS (
            |  SELECT user_id, sec,
            |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
            |  FROM marked
            |), sessions AS (
            |  SELECT user_id, sess_no, min(sec) AS s_start, max(sec) AS s_end
            |  FROM sess GROUP BY 1, 2
            |), hours AS (
            |  SELECT sec // 3600 AS hcell, count(*) AS c FROM e GROUP BY 1
            |), tot AS (
            |  SELECT sum(c) AS total, count(*) AS n_hours FROM hours
            |), incidents AS (
            |  SELECT hcell, hcell * 3600 AS i_start, hcell * 3600 + 3599 AS i_end
            |  FROM hours, tot WHERE c * n_hours * 100 > total * $IncidentFactorPct
            |)
            |SELECT strftime(make_timestamp(hcell * 3600000000), '%Y-%m-%d %H:00') AS hour,
            |       count(*) AS n_sessions, count(DISTINCT s.user_id) AS n_users
            |FROM incidents i JOIN sessions s ON s.s_start <= i.i_end AND i.i_start <= s.s_end
            |GROUP BY hcell ORDER BY hour""".stripMargin)
  )

  // ------------------------------------------------------------------
  // EWMA-smoothed daily volume per event type — the trend baseline
  // the MAD anomaly query complements (MAD finds spikes against a
  // static median; EWMA tracks a drifting level). EWMA is inherently
  // sequential, so the scalable batch form is the CLOSED-FORM
  // truncated window: ewma_t = Σᵢ wᵢ·x_{t−i} / Σᵢ wᵢ with
  // wᵢ = decay^i over a 14-day horizon (weights beyond it are < 1%,
  // stated truncation). That turns the recursion into a self-join of
  // the DAILY AGGREGATE with itself — the corpus collapses to
  // |types|·|days| rows first, and the ≤14× fan-out happens on that
  // tiny table, never on raw events. Per-term products are
  // 6dp-decimal-summed (the associativity contract), and the decay
  // is the LITERAL 0.7 in both engines (1.0−0.3 rounds to a
  // different double than the 0.7 literal — the PageRank lesson).
  // ------------------------------------------------------------------
  val EwmaDecay = 0.7
  val EwmaWindow = 14

  val ewmaDaily: Q = Q(
    (s, d) => {
      val daily = Inventory.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"))
      // the anchor side CARRIES its own count through the join (one
      // functional-dependency groupBy key more) so no third daily
      // branch is needed — two events scans total, which is the
      // standalone-query driver-contract cost (the broadcast side
      // plans a BroadcastExchange, so ReuseExchange can't serve it
      // from the shuffle side); production materializes `daily` once
      // as a Table and both branches read the tiny parquet instead
      // (the DedupFunnel pattern)
      val k = datediff(col("adt"), col("dt"))
      val w = pow(lit(EwmaDecay), k.cast(DoubleType))
      daily.as("a").join(daily.as("h"),
          col("a.event_type") === col("h.event_type"))
        .select(col("a.event_type").as("event_type"), col("a.dt").as("adt"),
          col("a.n").as("n_events"), col("h.dt").as("dt"), col("h.n").as("n"))
        .filter(k >= 0 && k < EwmaWindow)
        .select(col("event_type"), col("adt"), col("n_events"),
          roundPortable(w * col("n"), 6).cast(DecimalType(28, 6)).as("wn"),
          roundPortable(w, 6).cast(DecimalType(28, 6)).as("wd"))
        .groupBy("event_type", "adt", "n_events")
        .agg(sum(col("wn")).as("swn"), sum(col("wd")).as("swd"))
        .select(col("event_type"),
          date_format(col("adt"), "yyyy-MM-dd").as("day"),
          col("n_events"),
          roundPortable(col("swn").cast(DoubleType) / col("swd").cast(DoubleType), 4)
            .as("ewma"))
        .orderBy("event_type", "day")
    },
    Some(s"""WITH daily AS (
            |  SELECT event_type, CAST(ts AS DATE) AS dt, count(*) AS n
            |  FROM events GROUP BY 1, 2
            |), j AS (
            |  SELECT a.event_type, a.adt,
            |    CAST(floor(power($EwmaDecay, a.adt - h.dt) * h.n * 1000000 + 0.5) / 1000000
            |      AS DECIMAL(28,6)) AS wn,
            |    CAST(floor(power($EwmaDecay, a.adt - h.dt) * 1000000 + 0.5) / 1000000
            |      AS DECIMAL(28,6)) AS wd
            |  FROM (SELECT event_type, dt AS adt FROM daily) a
            |  JOIN daily h ON a.event_type = h.event_type
            |   AND a.adt - h.dt >= 0 AND a.adt - h.dt < $EwmaWindow
            |), agg AS (
            |  SELECT event_type, adt, sum(wn) AS swn, sum(wd) AS swd
            |  FROM j GROUP BY 1, 2
            |)
            |SELECT g.event_type, strftime(g.adt, '%Y-%m-%d') AS day, d.n AS n_events,
            |       floor(CAST(swn AS DOUBLE) / CAST(swd AS DOUBLE) * 10000 + 0.5) / 10000 AS ewma
            |FROM agg g JOIN daily d ON d.event_type = g.event_type AND d.dt = g.adt
            |ORDER BY 1, 2""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Holt double-exponential smoothing forecast per event type (Holt,
  // "Forecasting seasonals and trends by exponentially weighted moving
  // averages", 1957; public algorithm) — the trend-aware step up from
  // [[ewmaDaily]]'s level-only smoothing:
  //   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  //   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  // with the stated init l_1 = y_1, b_1 = 0, and the one-step-ahead
  // forecast ŷ_{t+1} = l_t + b_t published per day.
  //
  // Unlike EWMA the recursion has no small closed form, so the batch
  // shape is: map-side daily collapse (the corpus reduces to
  // |types|·|days| rows before anything sequential happens), then ONE
  // ordered fold per event type via the `aggregate` higher-order
  // function over the collected day array — state is O(|days|) per
  // group, groups process in parallel, and nothing sequential ever
  // touches raw events. At 100 TB the fold input is still just the
  // tiny daily table (a few KB per type); the pattern generalizes to
  // any per-series recursion (Kalman steps, Holt-Winters seasonality).
  //
  // Numeric contract: both engines fold the SAME values in the SAME
  // day order with the same literal coefficients, so every
  // intermediate double is bit-identical (IEEE ops in identical
  // order) — the 1e-6 output rounding is belt-and-braces, not load-
  // bearing. α=0.5 (exact binary), β=0.3/0.7 parsed from identical
  // decimal literals in both engines.
  // ------------------------------------------------------------------
  val forecastHolt: Q = Q(
    (s, d) => {
      val daily = Inventory.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"))
      val series = daily
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("dt"), col("n")))).as("pts"))
      val emptyTraj = array().cast("array<struct<l:double,b:double>>")
      val traj = aggregate(
        col("pts"), emptyTraj,
        (acc, p) => {
          val y = p.getField("n").cast(DoubleType)
          val last = element_at(acc, -1)
          val prevL = last.getField("l")
          val prevB = last.getField("b")
          val newL = when(size(acc) === 0, y)
            .otherwise(lit(0.5) * y + lit(0.5) * (prevL + prevB))
          val newB = when(size(acc) === 0, lit(0.0))
            .otherwise(lit(0.3) * (newL - prevL) + lit(0.7) * prevB)
          concat(acc, array(struct(newL.as("l"), newB.as("b"))))
        })
      series
        .withColumn("traj", traj)
        .select(col("event_type"), posexplode(arrays_zip(col("pts"), col("traj"))).as(Seq("i", "z")))
        .select(col("event_type"),
          date_format(col("z.pts.dt"), "yyyy-MM-dd").as("day"),
          col("z.pts.n").as("n_events"),
          roundPortable(col("z.traj.l"), 6).as("level"),
          roundPortable(col("z.traj.b"), 6).as("trend"),
          roundPortable(col("z.traj.l") + col("z.traj.b"), 6).as("forecast_next"))
        .orderBy("event_type", "day")
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS dt, count(*) AS n
           |  FROM events GROUP BY 1, 2
           |), idx AS (
           |  SELECT event_type, dt, n,
           |         row_number() OVER (PARTITION BY event_type ORDER BY dt) AS i
           |  FROM daily
           |), rec AS (
           |  SELECT event_type, i, dt, n, CAST(n AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
           |  FROM idx WHERE i = 1
           |  UNION ALL
           |  SELECT x.event_type, x.i, x.dt, x.n,
           |         0.5 * CAST(x.n AS DOUBLE) + 0.5 * (r.l + r.b) AS l,
           |         0.3 * ((0.5 * CAST(x.n AS DOUBLE) + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b AS b
           |  FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
           |)
           |SELECT event_type, strftime(dt, '%Y-%m-%d') AS day, n AS n_events,
           |       floor(l * 1000000 + 0.5) / 1000000 AS level,
           |       floor(b * 1000000 + 0.5) / 1000000 AS trend,
           |       floor((l + b) * 1000000 + 0.5) / 1000000 AS forecast_next
           |FROM rec ORDER BY event_type, day""".stripMargin)
  )

  // ------------------------------------------------------------------
  // CUSUM change-point detection on daily volume per event type (Page,
  // "Continuous Inspection Schemes", Biometrika 1954 — public
  // algorithm): the classic drift detector the EWMA/MAD/Holt trio
  // lacks — MAD flags single-day spikes, CUSUM flags SUSTAINED level
  // shifts by accumulating small deviations:
  //   S⁺_t = max(0, S⁺_{t−1} + (y_t − μ − k·σ))
  //   S⁻_t = max(0, S⁻_{t−1} + (μ − k·σ − y_t))
  // flagged when either side exceeds h·σ (k=0.5 slack; h=2 rather
  // than the textbook long-run h=4-5, tuned so the 30-day harness
  // windows exercise the alarm path — production picks h from its
  // target average-run-length). μ/σ are the series' own exact population
  // moments (integer Σy and Σy² → one double division/sqrt each, so
  // both engines derive bit-identical parameters; a production
  // deployment would freeze them from a reference window instead —
  // stated simplification, same recursion).
  //
  // Same engine shape as [[forecastHolt]]: map-side daily collapse to
  // |types|·|days| rows, per-type moments joined on, and the
  // recursion folded inside ONE `aggregate` higher-order projection
  // over the collected series — identical fold order in both engines
  // means every intermediate double is bit-identical; the 1e-6
  // rounding is belt-and-braces. σ=0 degenerates to flagging any
  // deviation — impossible on the harness series (spec asserts).
  // ------------------------------------------------------------------
  val CusumK = 0.5
  val CusumH = 2.0

  val changepoint: Q = Q(
    (s, d) => {
      val daily = Inventory.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("n")).as("sy"),
          sum(col("n") * col("n")).as("syy"))
        .select(col("event_type"),
          (col("sy").cast(DoubleType) / col("nd").cast(DoubleType)).as("mu"),
          sqrt(col("syy").cast(DoubleType) / col("nd").cast(DoubleType) -
            (col("sy").cast(DoubleType) / col("nd").cast(DoubleType)) *
              (col("sy").cast(DoubleType) / col("nd").cast(DoubleType))).as("sigma"))
      val series = daily
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("dt"), col("n")))).as("pts"))
        .join(stats, Seq("event_type"))
      val emptyTraj = array().cast("array<struct<sp:double,sn:double>>")
      val traj = aggregate(
        col("pts"), emptyTraj,
        (acc, p) => {
          val y = p.getField("n").cast(DoubleType)
          // CaseWhen evaluates branches lazily, so the ANSI
          // element_at(-1) never runs against the empty accumulator
          // (a bare coalesce would evaluate it eagerly and throw)
          val last = element_at(acc, -1)
          val prevP = when(size(acc) === 0, lit(0.0)).otherwise(last.getField("sp"))
          val prevN = when(size(acc) === 0, lit(0.0)).otherwise(last.getField("sn"))
          val sp = greatest(lit(0.0), prevP + (y - col("mu") - lit(CusumK) * col("sigma")))
          val sn = greatest(lit(0.0), prevN + (col("mu") - lit(CusumK) * col("sigma") - y))
          concat(acc, array(struct(sp.as("sp"), sn.as("sn"))))
        })
      series
        .withColumn("traj", traj)
        .select(col("event_type"), col("mu"), col("sigma"),
          posexplode(arrays_zip(col("pts"), col("traj"))).as(Seq("i", "z")))
        .select(col("event_type"),
          date_format(col("z.pts.dt"), "yyyy-MM-dd").as("day"),
          col("z.pts.n").as("n_events"),
          roundPortable(col("z.traj.sp"), 6).as("cusum_pos"),
          roundPortable(col("z.traj.sn"), 6).as("cusum_neg"),
          (col("z.traj.sp") > lit(CusumH) * col("sigma") ||
            col("z.traj.sn") > lit(CusumH) * col("sigma")).cast("long").as("is_change"))
        .orderBy("event_type", "day")
    },
    Some(s"""WITH RECURSIVE daily AS (
            |  SELECT event_type, CAST(ts AS DATE) AS dt, count(*) AS n
            |  FROM events GROUP BY 1, 2
            |), stats AS (
            |  SELECT event_type,
            |    CAST(sum(n) AS DOUBLE) / count(*) AS mu,
            |    sqrt(CAST(sum(n * n) AS DOUBLE) / count(*) -
            |      (CAST(sum(n) AS DOUBLE) / count(*)) * (CAST(sum(n) AS DOUBLE) / count(*))) AS sigma
            |  FROM daily GROUP BY 1
            |), idx AS (
            |  SELECT d.event_type, d.dt, d.n, s.mu, s.sigma,
            |         row_number() OVER (PARTITION BY d.event_type ORDER BY d.dt) AS i
            |  FROM daily d JOIN stats s ON s.event_type = d.event_type
            |), rec AS (
            |  SELECT event_type, i, dt, n, mu, sigma,
            |         greatest(CAST(0 AS DOUBLE), 0.0 + (CAST(n AS DOUBLE) - mu - $CusumK * sigma)) AS sp,
            |         greatest(CAST(0 AS DOUBLE), 0.0 + (mu - $CusumK * sigma - CAST(n AS DOUBLE))) AS sn
            |  FROM idx WHERE i = 1
            |  UNION ALL
            |  SELECT x.event_type, x.i, x.dt, x.n, x.mu, x.sigma,
            |         greatest(CAST(0 AS DOUBLE), r.sp + (CAST(x.n AS DOUBLE) - x.mu - $CusumK * x.sigma)) AS sp,
            |         greatest(CAST(0 AS DOUBLE), r.sn + (x.mu - $CusumK * x.sigma - CAST(x.n AS DOUBLE))) AS sn
            |  FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
            |)
            |SELECT event_type, strftime(dt, '%Y-%m-%d') AS day, n AS n_events,
            |       floor(sp * 1000000 + 0.5) / 1000000 AS cusum_pos,
            |       floor(sn * 1000000 + 0.5) / 1000000 AS cusum_neg,
            |       CAST(sp > $CusumH * sigma OR sn > $CusumH * sigma AS BIGINT) AS is_change
            |FROM rec ORDER BY event_type, day""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Kaplan-Meier survival over SESSION DURATIONS, stratified by the
  // session's entry event type (Kaplan & Meier, "Nonparametric
  // Estimation from Incomplete Observations", JASA 1958 — public
  // algorithm): S(t) = Π_{u≤t} (1 − d_u/n_u), the right-censoring-
  // aware answer to "what fraction of sessions survive past t
  // minutes". Sessions whose last event falls within one session gap
  // of the stream end are CENSORED (they may still be open) — they
  // leave the risk set at their observed duration without counting
  // as a death, which is exactly the bias a naive duration histogram
  // gets wrong.
  //
  // Engine shape: the gap-mark/running-sum sessionizer (one user_id
  // window), a per-session aggregate, a (stratum, duration) death/
  // censor aggregate — map-side combined to |strata|·|durations|
  // rows — and the product recursion folded per stratum inside one
  // `aggregate` higher-order projection (the forecastHolt pattern;
  // strata process in parallel). The risk-set countdown is exact
  // integer arithmetic; the survival product multiplies the same
  // (1 − d/n) doubles in the same duration order in both engines, so
  // every intermediate is bit-identical. Zero-death rows multiply by
  // exactly 1.0 (no fp error) and keep the duration grid complete.
  // ------------------------------------------------------------------
  val survivalKm: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(byUser)
      val marked = ev
        .withColumn("us", us)
        .withColumn("new_session",
          when(prev.isNull || (us - prev) > GapSeconds * 1000000L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_session")).over(byUser))
      val bySess = Window.partitionBy(col("user_id"), col("sess"))
        .orderBy(col("us"), col("event_id"))
      val sessions = marked
        .withColumn("stratum", first(col("event_type")).over(bySess))
        .groupBy(col("user_id"), col("sess"), col("stratum"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      val maxUs = Inventory.events(s, d).agg(max(unix_micros(col("ts"))).as("mx"))
      val counted = sessions.crossJoin(broadcast(maxUs))
        .select(col("stratum"),
          ((col("e_us") - col("s_us")) / lit(60000000L)).cast("long").as("dur_min"),
          when(col("mx") - col("e_us") <= GapSeconds * 1000000L, 1L).otherwise(0L).as("cen"))
        .groupBy(col("stratum"), col("dur_min"))
        .agg(sum(lit(1L) - col("cen")).as("d"), sum(col("cen")).as("c"))
      val series = counted
        .groupBy("stratum")
        .agg(sort_array(collect_list(struct(col("dur_min"), col("d"), col("c")))).as("pts"),
          sum(col("d") + col("c")).as("total"))
      val emptyTraj = array().cast("array<struct<nrisk:bigint,nafter:bigint,s:double>>")
      val traj = aggregate(
        col("pts"), emptyTraj,
        (acc, p) => {
          val last = element_at(acc, -1)
          val nRisk = when(size(acc) === 0, col("total")).otherwise(last.getField("nafter"))
          val sPrev = when(size(acc) === 0, lit(1.0)).otherwise(last.getField("s"))
          val sNew = sPrev *
            (lit(1.0) - p.getField("d").cast(DoubleType) / nRisk.cast(DoubleType))
          concat(acc, array(struct(
            nRisk.as("nrisk"),
            (nRisk - p.getField("d") - p.getField("c")).as("nafter"),
            sNew.as("s"))))
        })
      series
        .withColumn("traj", traj)
        .select(col("stratum"), posexplode(arrays_zip(col("pts"), col("traj"))).as(Seq("i", "z")))
        .select(col("stratum"),
          col("z.pts.dur_min").as("duration_min"),
          col("z.traj.nrisk").as("n_risk"),
          col("z.pts.d").as("n_deaths"),
          col("z.pts.c").as("n_censored"),
          roundPortable(col("z.traj.s"), 6).as("survival"))
        .orderBy("stratum", "duration_min")
    },
    Some(s"""WITH RECURSIVE marked AS (
            |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
            |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
            |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $GapSeconds * 1000000
            |         THEN 1 ELSE 0 END AS new_session
            |  FROM events
            |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            |), sess AS (
            |  SELECT user_id, event_id, event_type, us,
            |         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
            |  FROM marked
            |), withfirst AS (
            |  SELECT user_id, sess, us,
            |         first_value(event_type) OVER (PARTITION BY user_id, sess ORDER BY us, event_id) AS stratum
            |  FROM sess
            |), sessions AS (
            |  SELECT user_id, sess, any_value(stratum) AS stratum,
            |         min(us) AS s_us, max(us) AS e_us
            |  FROM withfirst GROUP BY 1, 2
            |), mx AS (SELECT max(epoch_us(ts)) AS mx FROM events
            |), counted AS (
            |  SELECT stratum, (e_us - s_us) // 60000000 AS dur_min,
            |         sum(CASE WHEN mx.mx - e_us <= $GapSeconds * 1000000 THEN 0 ELSE 1 END) AS d,
            |         sum(CASE WHEN mx.mx - e_us <= $GapSeconds * 1000000 THEN 1 ELSE 0 END) AS c
            |  FROM sessions CROSS JOIN mx GROUP BY 1, 2
            |), tot AS (
            |  SELECT stratum, sum(d + c) AS total FROM counted GROUP BY 1
            |), idx AS (
            |  SELECT c.stratum, c.dur_min, c.d, c.c, t.total,
            |         row_number() OVER (PARTITION BY c.stratum ORDER BY c.dur_min) AS i
            |  FROM counted c JOIN tot t ON t.stratum = c.stratum
            |), rec AS (
            |  SELECT stratum, i, dur_min, d, c, total AS nrisk, total - d - c AS nafter,
            |         1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(total AS DOUBLE)) AS s
            |  FROM idx WHERE i = 1
            |  UNION ALL
            |  SELECT x.stratum, x.i, x.dur_min, x.d, x.c, r.nafter AS nrisk,
            |         r.nafter - x.d - x.c AS nafter,
            |         r.s * (1.0 - CAST(x.d AS DOUBLE) / CAST(r.nafter AS DOUBLE)) AS s
            |  FROM rec r JOIN idx x ON x.stratum = r.stratum AND x.i = r.i + 1
            |)
            |SELECT stratum, dur_min AS duration_min,
            |       CAST(nrisk AS BIGINT) AS n_risk,
            |       CAST(d AS BIGINT) AS n_deaths, CAST(c AS BIGINT) AS n_censored,
            |       floor(s * 1000000 + 0.5) / 1000000 AS survival
            |FROM rec ORDER BY stratum, duration_min""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Inter-arrival CADENCE scoring per user — the temporal-regularity
  // signal bot/spam filters threshold on when curating training data
  // (scripted agents fire at sub-Poisson regularity; humans are
  // bursty). Per user: second-grid inter-event gaps, their mean, and
  // the coefficient of variation σ/μ — cv ≈ 1 is the Poisson
  // baseline, cv ≪ 1 is metronome-like automation, cv ≫ 1 is bursty
  // human sessions. Buckets: regular (< 0.85, the harness
  // distribution's low tail), typical (< 1.1), bursty (≥ 1.1) — all
  // three populated at every SF (measured min 0.77, p95 1.14).
  //
  // Engine shape: one user_id window for the lag gaps, one hash
  // aggregate to |users| rows — the whole corpus collapses map-side;
  // no joins at all. Numeric contract: gaps are exact second-grid
  // longs (µs diff floor-divided by 1e6), Σg and Σg² exact long sums
  // (order-free), and μ/σ/cv derive through identical op order in
  // both engines, so the bucket comparisons run on bit-identical
  // doubles. Users with a zero mean gap (all events in one second)
  // are excluded by the stated sg > 0 guard.
  // ------------------------------------------------------------------
  val cadence: Q = Q(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val gap = ((us - lag(us, 1).over(byUser)) / lit(1000000L)).cast("long")
      val stats = Inventory.events(s, d)
        .select(col("user_id"), gap.as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sg"),
          sum(col("gap") * col("gap")).as("sgg"))
        .filter(col("sg") > 0)
      val mean = col("sg").cast(DoubleType) / col("n_gaps").cast(DoubleType)
      val cv = sqrt(col("sgg").cast(DoubleType) / col("n_gaps").cast(DoubleType) - mean * mean) / mean
      stats.select(col("user_id"), col("n_gaps"),
        roundPortable(mean, 6).as("mean_gap_s"),
        roundPortable(cv, 6).as("cv"),
        when(cv < 0.85, "regular").when(cv < 1.1, "typical").otherwise("bursty")
          .as("cadence"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (
           |  SELECT user_id,
           |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           |      // 1000000 AS gap
           |  FROM events
           |), s AS (
           |  SELECT user_id, count(*) AS n_gaps, sum(gap) AS sg, sum(gap * gap) AS sgg
           |  FROM g WHERE gap IS NOT NULL GROUP BY 1
           |)
           |SELECT user_id, n_gaps,
           |  floor(CAST(sg AS DOUBLE) / n_gaps * 1000000 + 0.5) / 1000000 AS mean_gap_s,
           |  floor(sqrt(CAST(sgg AS DOUBLE) / n_gaps - (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))
           |        / (CAST(sg AS DOUBLE) / n_gaps) * 1000000 + 0.5) / 1000000 AS cv,
           |  CASE WHEN sqrt(CAST(sgg AS DOUBLE) / n_gaps - (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))
           |            / (CAST(sg AS DOUBLE) / n_gaps) < 0.85 THEN 'regular'
           |       WHEN sqrt(CAST(sgg AS DOUBLE) / n_gaps - (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))
           |            / (CAST(sg AS DOUBLE) / n_gaps) < 1.1 THEN 'typical'
           |       ELSE 'bursty' END AS cadence
           |FROM s WHERE sg > 0 ORDER BY user_id""".stripMargin)
  )

  // ------------------------------------------------------------------
  // GROWTH ACCOUNTING — the canonical product-analytics user-state
  // machine (new / retained / resurrected / churned per week, Social
  // Capital's "quick ratio" framing). The classification needs each
  // user's previous and next active week: one (user, week) presence
  // grid (the active_users dedup trick — the corpus collapses
  // map-side before any window), one window over user_id, and churn
  // rows PROJECTED onto week+7 from the same pass (a user churns at
  // w+7 when active at w and not at w+7 — no anti-join needed; the
  // lead() already knows). The week horizon guard (max_week
  // broadcast) keeps the final, unknowable week out of the churn
  // denominator. Weeks are Monday-truncated in both engines;
  // all counts are exact integers, so the only rounded column is the
  // quick ratio.
  // ------------------------------------------------------------------
  val growthAccounting: Q = Q(
    (s, d) => {
      val wk = to_date(date_trunc("week", col("ts")))
      val grid = Inventory.events(s, d)
        .select(col("user_id"), wk.as("week")).distinct()
      val byU = Window.partitionBy(col("user_id")).orderBy(col("week"))
      val g = grid
        .withColumn("prev", lag(col("week"), 1).over(byU))
        .withColumn("next", lead(col("week"), 1).over(byU))
      val maxW = grid.agg(max(col("week")).as("max_week"))
      val active = g.select(col("week"),
        when(col("prev").isNull, 1).otherwise(0).as("is_new"),
        when(col("prev") === date_sub(col("week"), 7), 1).otherwise(0).as("is_retained"),
        when(col("prev").isNotNull && col("prev") < date_sub(col("week"), 7), 1)
          .otherwise(0).as("is_resurrected"),
        lit(0).as("is_churned"))
      val churn = g.crossJoin(broadcast(maxW))
        .filter((col("next").isNull || col("next") > date_add(col("week"), 7)) &&
          date_add(col("week"), 7) <= col("max_week"))
        .select(date_add(col("week"), 7).as("week"),
          lit(0).as("is_new"), lit(0).as("is_retained"),
          lit(0).as("is_resurrected"), lit(1).as("is_churned"))
      active.unionByName(churn)
        .groupBy(col("week"))
        .agg(sum(col("is_new")).as("n_new"),
          sum(col("is_retained")).as("n_retained"),
          sum(col("is_resurrected")).as("n_resurrected"),
          sum(col("is_churned")).as("n_churned"))
        .withColumn("quick_ratio",
          when(col("n_churned") === 0, lit(null).cast(DoubleType))
            .otherwise(roundPortable(
              (col("n_new") + col("n_resurrected")).cast(DoubleType) / col("n_churned"), 4)))
        .orderBy(col("week"))
    },
    Some("""WITH wk AS (
           |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
           |), g AS (
           |  SELECT user_id, week,
           |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev,
           |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next
           |  FROM wk
           |), mx AS (SELECT max(week) AS max_week FROM wk
           |), flagged AS (
           |  SELECT week,
           |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_new,
           |    CASE WHEN prev = week - 7 THEN 1 ELSE 0 END AS is_retained,
           |    CASE WHEN prev IS NOT NULL AND prev < week - 7 THEN 1 ELSE 0 END AS is_resurrected,
           |    0 AS is_churned
           |  FROM g
           |  UNION ALL
           |  SELECT week + 7, 0, 0, 0, 1
           |  FROM g CROSS JOIN mx
           |  WHERE (next IS NULL OR next > week + 7) AND week + 7 <= max_week
           |), agg AS (
           |  SELECT week,
           |    CAST(sum(is_new) AS BIGINT) AS n_new,
           |    CAST(sum(is_retained) AS BIGINT) AS n_retained,
           |    CAST(sum(is_resurrected) AS BIGINT) AS n_resurrected,
           |    CAST(sum(is_churned) AS BIGINT) AS n_churned
           |  FROM flagged GROUP BY week
           |)
           |SELECT week, n_new, n_retained, n_resurrected, n_churned,
           |  CASE WHEN n_churned = 0 THEN NULL
           |       ELSE floor(CAST(n_new + n_resurrected AS DOUBLE) / n_churned * 10000 + 0.5) / 10000
           |  END AS quick_ratio
           |FROM agg ORDER BY week""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Seasonal decomposition of the daily event series — the moving-
  // average STL precursor: trend = CENTERED 7-day mean (only where
  // the window is complete, so the series edges stay honestly NULL
  // rather than biased), day-of-week seasonal = mean detrended value
  // per weekday, residual = observed − trend − seasonal. The corpus
  // collapses to |days| rows in the first aggregate; every window
  // after that is calendar-sized. Weekday is computed ARITHMETICALLY
  // ((date − Monday-anchor) mod 7) because dayofweek() numbering
  // disagrees between engines (Spark 1=Sunday, DuckDB 0=Sunday);
  // detrended terms round to the 6-dp grid and sum in DECIMAL before
  // the per-weekday mean, keeping the seasonal means
  // partition-order-free.
  // ------------------------------------------------------------------
  val seasonalDecompose: Q = Q(
    (s, d) => {
      val daily = Inventory.events(s, d)
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"))
      val byDt = Window.orderBy(col("dt")).rowsBetween(-3, 3)
      val t = daily
        .withColumn("w_n", sum(col("n")).over(byDt))
        .withColumn("w_c", count(col("n")).over(byDt))
        .withColumn("trend",
          when(col("w_c") === 7, col("w_n").cast(DoubleType) / 7.0))
        .withColumn("dow",
          pmod(datediff(col("dt"), to_date(lit("2024-01-01"))), lit(7)))
      val seas = t.filter(col("trend").isNotNull)
        .groupBy(col("dow"))
        .agg((sum(roundPortable(col("n") - col("trend"), 6).cast(DecimalType(28, 6)))
          .cast(DoubleType) / count(lit(1))).as("seasonal_raw"))
      t.join(broadcast(seas), Seq("dow"), "left")
        .select(col("dt"), col("n"), col("dow"),
          roundPortable(col("trend"), 4).as("trend"),
          roundPortable(col("seasonal_raw"), 4).as("seasonal"),
          roundPortable(col("n") - col("trend") - col("seasonal_raw"), 4).as("residual"))
        .orderBy(col("dt"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS dt, count(*) AS n FROM events GROUP BY 1
           |), t AS (
           |  SELECT dt, n,
           |    sum(n) OVER (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_n,
           |    count(n) OVER (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_c,
           |    ((dt - DATE '2024-01-01') % 7 + 7) % 7 AS dow
           |  FROM daily
           |), tt AS (
           |  SELECT dt, n, dow,
           |    CASE WHEN w_c = 7 THEN CAST(w_n AS DOUBLE) / 7.0 END AS trend
           |  FROM t
           |), seas AS (
           |  SELECT dow,
           |    CAST(sum(CAST(floor((n - trend) * 1000000 + 0.5) / 1000000 AS DECIMAL(28,6))) AS DOUBLE)
           |      / count(*) AS seasonal_raw
           |  FROM tt WHERE trend IS NOT NULL GROUP BY 1
           |)
           |SELECT tt.dt, tt.n, tt.dow,
           |  floor(trend * 10000 + 0.5) / 10000 AS trend,
           |  floor(seasonal_raw * 10000 + 0.5) / 10000 AS seasonal,
           |  floor((tt.n - trend - seasonal_raw) * 10000 + 0.5) / 10000 AS residual
           |FROM tt LEFT JOIN seas ON seas.dow = tt.dow
           |ORDER BY tt.dt""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Exponentially time-decayed counters — the "trending now" statistic:
  // each event contributes exp(−λ·Δdays) with Δ measured back from the
  // corpus max timestamp and λ = ln2/HalfLifeDays (7-day half-life), so
  // yesterday's burst outweighs last month's volume. One corpus
  // aggregate (map-side combined), with the reference time broadcast as
  // a 1-row aggregate — at 100 TB the production variant maintains the
  // counter INCREMENTALLY (old_total · exp(−λ·gap) + batch_total, an
  // associative fold over batches) instead of rescanning; this query is
  // that fold's from-scratch ground truth. Time math stays on exact
  // epoch-micros longs until the one double Δdays division; each weight
  // is 6dp-gridded and decimal-summed (partition-order independent).
  // ------------------------------------------------------------------
  val HalfLifeDays = 7.0
  private val DecayLambda: Double = math.log(2.0) / HalfLifeDays

  val decayedCounts: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val ref = ev.agg(max(col("us")).as("ref_us"))
      val dd = (col("ref_us") - col("us")).cast(DoubleType) / lit(86400e6)
      val w = roundPortable(exp(-(lit(DecayLambda) * dd)), 6).cast(DecimalType(18, 6))
      val perType = ev.crossJoin(broadcast(ref))
        .select(col("event_type"), w.as("w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum(col("w")).as("sw"))
      val wAll = Window.rowsBetween(Long.MinValue, Long.MaxValue)
      perType
        .withColumn("tot", sum(col("sw")).over(wAll))
        .select(col("event_type"), col("n_events"),
          roundPortable(col("sw").cast(DoubleType), 6).as("decayed_count"),
          roundPortable(col("sw").cast(DoubleType) / col("tot").cast(DoubleType), 6)
            .as("decayed_share"))
        .orderBy("event_type")
    },
    Some(s"""WITH ev AS (
            |  SELECT event_type, epoch_us(ts) AS us FROM events
            |), ref AS (
            |  SELECT max(us) AS ref_us FROM ev
            |), wts AS (
            |  SELECT event_type,
            |    CAST(floor(exp(-($DecayLambda * (CAST(ref_us - us AS DOUBLE) / 86400000000.0)))
            |      * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS w
            |  FROM ev CROSS JOIN ref
            |), per AS (
            |  SELECT event_type, count(*) AS n_events, sum(w) AS sw FROM wts GROUP BY 1
            |)
            |SELECT event_type, n_events,
            |  floor(CAST(sw AS DOUBLE) * 1000000 + 0.5) / 1000000 AS decayed_count,
            |  floor(CAST(sw AS DOUBLE) / CAST(sum(sw) OVER () AS DOUBLE) * 1000000 + 0.5) / 1000000
            |    AS decayed_share
            |FROM per ORDER BY event_type""".stripMargin)
  )

  // ------------------------------------------------------------------
  // Multi-touch attribution — the marketing-analytics classic: every
  // purchase distributes conversion credit over the user's touch
  // events (view/click/signup) in the preceding `AttrLookbackDays`
  // window, under the three standard models at once: first-touch
  // (all credit to the earliest touch), last-touch (the latest), and
  // linear (1/n each). Published per touch type.
  //
  // Shape: ONE equi-join on user_id (purchases ⋈ touches) with the
  // time window as a post-join range filter — at 100 TB both sides
  // hash-partition on user_id once, and the per-purchase windows
  // (rank asc/desc + count over the purchase key) run inside the
  // same partitioning, so the whole query is one shuffle plus a tiny
  // per-type rollup. Linear credits are 6dp-gridded and decimal-
  // summed (the BM25 recipe) so the rollup is partition-order
  // independent; first/last flags are exact integer sums. Ties on
  // (ts, event_id) are total, so rank-1 rows are unique.
  // ------------------------------------------------------------------
  val AttrLookbackDays = 7
  val TouchTypes: Seq[String] = Seq("view", "click", "signup")

  val attribution: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"), col("event_id").as("p_id"))
      val touches = ev.filter(col("event_type").isInCollection(TouchTypes))
        .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
      val lookbackUs = AttrLookbackDays * 86400L * 1000000L
      val joined = purchases.join(touches, Seq("user_id"))
        .filter(col("us") <= col("p_us") && col("us") > col("p_us") - lookbackUs)
      val byP = Window.partitionBy("user_id", "p_id")
      val ranked = joined
        .withColumn("n_touch", count(lit(1)).over(byP))
        .withColumn("rn_first", row_number().over(byP.orderBy(col("us"), col("event_id"))))
        .withColumn("rn_last", row_number().over(byP.orderBy(col("us").desc, col("event_id").desc)))
      ranked
        .select(col("event_type"),
          when(col("rn_first") === 1, 1L).otherwise(0L).as("ft"),
          when(col("rn_last") === 1, 1L).otherwise(0L).as("lt"),
          roundPortable(lit(1.0) / col("n_touch"), 6).cast(DecimalType(18, 6)).as("lc"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(col("ft")).as("first_touch"),
          sum(col("lt")).as("last_touch"),
          roundPortable(sum(col("lc")).cast(DoubleType), 6).as("linear_credit"))
        .orderBy("event_type")
    },
    Some(s"""WITH ev AS (
            |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
            |), p AS (
            |  SELECT user_id, us AS p_us, event_id AS p_id FROM ev WHERE event_type = 'purchase'
            |), t AS (
            |  SELECT user_id, event_type, us, event_id FROM ev
            |  WHERE event_type IN (${TouchTypes.map(x => s"'$x'").mkString(", ")})
            |), j AS (
            |  SELECT p.user_id, p.p_id, t.event_type, t.us, t.event_id
            |  FROM p JOIN t USING (user_id)
            |  WHERE t.us <= p.p_us AND t.us > p.p_us - ${AttrLookbackDays}::BIGINT * 86400 * 1000000
            |), r AS (
            |  SELECT event_type,
            |    count(*) OVER (PARTITION BY user_id, p_id) AS n_touch,
            |    row_number() OVER (PARTITION BY user_id, p_id ORDER BY us, event_id) AS rn_first,
            |    row_number() OVER (PARTITION BY user_id, p_id ORDER BY us DESC, event_id DESC) AS rn_last
            |  FROM j
            |)
            |SELECT event_type, count(*) AS n_touches,
            |  CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
            |  CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
            |  floor(CAST(sum(CAST(floor(CAST(1.0 AS DOUBLE) / n_touch * 1000000 + 0.5) / 1000000
            |    AS DECIMAL(18,6))) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS linear_credit
            |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin)
  )

  // ------------------------------------------------------------------
  // TIME-BOUNDED conversion funnel — [[funnel]] with conversion
  // WINDOWS, the form product analytics actually reports: a click
  // counts only within W of the first view, a purchase only within W
  // of that click. Unbounded funnels overstate conversion (a purchase
  // a year later is not "conversion"); the window is the metric's
  // definition, and attribution/experimentation systems all carry
  // one. Same anchor-chain shape and scale story as [[funnel]]
  // (every aggregate and join keyed user_id, one exchange reused
  // throughout, integer microsecond bounds) — the upper bound is one
  // extra predicate per stage, free at any scale. Both funnels
  // publish; their DELTA is the long-tail conversion mass.
  // ------------------------------------------------------------------
  val FunnelWindowDays = 7L
  private val FunnelWindowUs = FunnelWindowDays * 86400L * 1000000L

  val funnelWindowed: Q = Q(
    (s, d) => {
      val ev = Inventory.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val viewed = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t_view"))
      val clicked = ev.filter(col("event_type") === "click")
        .join(viewed, Seq("user_id"))
        .filter(col("us") >= col("t_view") &&
          col("us") <= col("t_view") + lit(FunnelWindowUs))
        .groupBy("user_id").agg(min(col("us")).as("t_click"))
      val purchased = ev.filter(col("event_type") === "purchase")
        .join(clicked, Seq("user_id"))
        .filter(col("us") >= col("t_click") &&
          col("us") <= col("t_click") + lit(FunnelWindowUs))
        .groupBy("user_id").agg(min(col("us")).as("t_purchase"))
      viewed.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(clicked.agg(count(lit(1)).as("n_clicked_in_window")))
        .crossJoin(purchased.agg(count(lit(1)).as("n_purchased_in_window")))
        .select(lit(FunnelWindowDays).as("window_days"),
          col("n_viewed"), col("n_clicked_in_window"), col("n_purchased_in_window"),
          roundPortable(col("n_clicked_in_window").cast("double") /
            nullif(col("n_viewed"), lit(0L)), 4).as("view_to_click"),
          roundPortable(col("n_purchased_in_window").cast("double") /
            nullif(col("n_clicked_in_window"), lit(0L)), 4).as("click_to_purchase"))
    },
    Some(s"""WITH v AS (
            |  SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
            |  WHERE event_type = 'view' GROUP BY 1
            |), c AS (
            |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
            |  FROM events e JOIN v ON v.user_id = e.user_id
            |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
            |    AND epoch_us(e.ts) <= v.t_view + $FunnelWindowUs
            |  GROUP BY 1
            |), p AS (
            |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
            |  FROM events e JOIN c ON c.user_id = e.user_id
            |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
            |    AND epoch_us(e.ts) <= c.t_click + $FunnelWindowUs
            |  GROUP BY 1
            |)
            |SELECT CAST($FunnelWindowDays AS BIGINT) AS window_days,
            |       (SELECT count(*) FROM v) AS n_viewed,
            |       (SELECT count(*) FROM c) AS n_clicked_in_window,
            |       (SELECT count(*) FROM p) AS n_purchased_in_window,
            |       floor(CAST((SELECT count(*) FROM c) AS DOUBLE) / nullif((SELECT count(*) FROM v), 0) * 10000 + 0.5) / 10000 AS view_to_click,
            |       floor(CAST((SELECT count(*) FROM p) AS DOUBLE) / nullif((SELECT count(*) FROM c), 0) * 10000 + 0.5) / 10000 AS click_to_purchase""".stripMargin)
  )

  // ------------------------------------------------------------------
  // A/B EXPERIMENT ANALYSIS — Welch's unequal-variance t-test (Welch,
  // Biometrika 1947 — public method) over a deterministic hash
  // assignment: the missing experimentation surface. Unit of analysis
  // is the USER (per-user value totals first, then variant moments) —
  // testing event-level rows against a user-randomized assignment is
  // the classic unit-of-analysis error that overstates significance.
  // Assignment is content-hash mod 2 (the stratifiedSplit discipline:
  // stable across runs/order, no rand()); the verdict compares |t|
  // against the two-sided 5% normal critical value 1.96 — stated as
  // the published contract (df is huge here; the exact t-quantile is
  // a lookup the pipeline applies downstream).
  //
  // Determinism: per-user totals are exact DECIMAL sums of 2dp-grid
  // values published on the 6dp grid; variant Σx/Σx² sum those grid
  // values in DECIMAL again (order-free), and mean/var/t/df derive in
  // double with one shared op order. Scale: two map-side-combined
  // aggregates (user_id shuffle → 2-row variant collapse); nothing
  // else moves.
  // ------------------------------------------------------------------
  val AbCritical = 1.96

  val abTtest: Q = Q(
    (s, d) => {
      import graft.ext.Dedup.hash60
      val perUser = Inventory.events(s, d)
        .groupBy("user_id")
        .agg(roundPortable(
          sum(roundPortable(col("value"), 2).cast(DecimalType(18, 2))).cast(DoubleType), 6)
          .as("metric"))
        .select(
          when(pmod(hash60(concat(lit("exp1:"), col("user_id").cast("string"))), lit(2L)) === 0L,
            "A").otherwise("B").as("variant"),
          col("metric"))
      val g = perUser.groupBy("variant")
        .agg(count(lit(1)).as("n"),
          sum(col("metric").cast(DecimalType(28, 6))).cast(DoubleType).as("sx"),
          sum((col("metric").cast(DecimalType(28, 6)) * col("metric").cast(DecimalType(28, 6))))
            .cast(DoubleType).as("sx2"))
        .select(col("variant"), col("n"), col("sx"), col("sx2"))
      val a = g.filter(col("variant") === "A")
        .select(col("n").as("n_a"), col("sx").as("sxa"), col("sx2").as("sx2a"))
      val b = g.filter(col("variant") === "B")
        .select(col("n").as("n_b"), col("sx").as("sxb"), col("sx2").as("sx2b"))
      val nA = col("n_a").cast(DoubleType)
      val nB = col("n_b").cast(DoubleType)
      val meanA = col("sxa") / nA
      val meanB = col("sxb") / nB
      // sample variance via the computational formula, n−1 denominator
      val varA = (col("sx2a") - col("sxa") * col("sxa") / nA) / (nA - 1.0)
      val varB = (col("sx2b") - col("sxb") * col("sxb") / nB) / (nB - 1.0)
      val seA = varA / nA
      val seB = varB / nB
      val t = (meanA - meanB) / sqrt(seA + seB)
      val df = (seA + seB) * (seA + seB) /
        (seA * seA / (nA - 1.0) + seB * seB / (nB - 1.0))
      a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        roundPortable(meanA, 4).as("mean_a"),
        roundPortable(meanB, 4).as("mean_b"),
        roundPortable(t, 4).as("welch_t"),
        roundPortable(df, 2).as("welch_df"),
        (abs(t) > lit(AbCritical)).as("significant"))
    },
    Some(s"""WITH pu AS (
            |  SELECT user_id,
            |    floor(CAST(sum(CAST(floor(value * 100 + 0.5) / 100 AS DECIMAL(18,2))) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS metric
            |  FROM events GROUP BY 1
            |), v AS (
            |  SELECT CASE WHEN ('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
            |              THEN 'A' ELSE 'B' END AS variant,
            |         metric FROM pu
            |), g AS (
            |  SELECT variant, count(*) AS n,
            |         CAST(sum(CAST(metric AS DECIMAL(28,6))) AS DOUBLE) AS sx,
            |         CAST(sum(CAST(metric AS DECIMAL(28,6)) * CAST(metric AS DECIMAL(28,6))) AS DOUBLE) AS sx2
            |  FROM v GROUP BY 1
            |), a AS (SELECT n AS n_a, sx AS sxa, sx2 AS sx2a FROM g WHERE variant = 'A'),
            |b AS (SELECT n AS n_b, sx AS sxb, sx2 AS sx2b FROM g WHERE variant = 'B'),
            |c AS (
            |  -- raw names ma/mb/sea/seb: DuckDB lateral alias resolution
            |  -- would otherwise let the rounded outputs shadow the raw
            |  -- values inside the t/df expressions
            |  SELECT n_a, n_b,
            |    sxa / n_a AS ma, sxb / n_b AS mb,
            |    ((sx2a - sxa * sxa / n_a) / (n_a - 1.0)) / n_a AS sea,
            |    ((sx2b - sxb * sxb / n_b) / (n_b - 1.0)) / n_b AS seb
            |  FROM a CROSS JOIN b
            |)
            |SELECT n_a, n_b,
            |  floor(ma * 10000 + 0.5) / 10000 AS mean_a,
            |  floor(mb * 10000 + 0.5) / 10000 AS mean_b,
            |  floor((ma - mb) / sqrt(sea + seb) * 10000 + 0.5) / 10000 AS welch_t,
            |  floor((sea + seb) * (sea + seb)
            |        / (sea * sea / (n_a - 1.0) + seb * seb / (n_b - 1.0)) * 100 + 0.5) / 100 AS welch_df,
            |  abs((ma - mb) / sqrt(sea + seb)) > $AbCritical AS significant
            |FROM c""".stripMargin)
  )

  val queries: Seq[(String, Q)] = Seq(
    "events_ab_ttest" -> abTtest,
    "events_funnel_windowed" -> funnelWindowed,
    "events_sessionize" -> sessionize,
    "events_concurrency" -> concurrency,
    "events_gini" -> gini,
    "events_entropy_daily" -> entropyDaily,
    "events_dau_mau" -> dauMau,
    "events_hourly_window" -> hourly,
    "events_cohort_retention" -> cohortRetention,
    "events_funnel" -> funnel,
    "events_debounce" -> debounce,
    "events_anomaly_days" -> anomalyDays,
    "events_transition_matrix" -> transitionMatrix,
    "events_top_paths" -> topPaths,
    "events_active_users" -> activeUsers,
    "events_streaks" -> streaks,
    "join_interval_overlap" -> intervalOverlap,
    "events_ewma_daily" -> ewmaDaily,
    "events_forecast_holt" -> forecastHolt,
    "events_changepoint" -> changepoint,
    "events_survival_km" -> survivalKm,
    "events_cadence" -> cadence,
    "events_growth_accounting" -> growthAccounting,
    "events_seasonal_decompose" -> seasonalDecompose,
    "events_decayed_counts" -> decayedCounts,
    "events_attribution" -> attribution
  )
}
