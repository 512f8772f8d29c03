package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Determinism._
import graft.io.Readers.table

/** Window functions (SURVEY §2.5): ranking, lag/lead, running and
  * moving frames, first/last.
  *
  * Scale posture: every window is PARTITION BY'd on a real key (user,
  * customer, nation) so state stays per-partition — except the moving-
  * range window, which runs over a *pre-aggregated daily* relation whose
  * cardinality is bounded by the calendar (≤ tens of thousands of rows
  * at any data scale), making a global range frame safe.
  *
  * Determinism: every window ORDER BY ends in a unique tiebreaker
  * (orderkey / event_id / suppkey) — rank-vs-tie behavior is only
  * exercised by value-ranking functions whose results depend on values,
  * not row order (SURVEY §7.4).
  */
object Windows {

  import Relational.Q

  /** Running DISTINCT event-type count per user over time (round 7):
    * "how many different things has this user done so far" — the
    * engagement-breadth curve. `count(DISTINCT …) OVER` is not
    * frame-decomposable (neither engine runs it over a running
    * frame); the scalable identity is first-occurrence flagging —
    * row_number() = 1 within (user, type) marks each type's first
    * event, and a running SUM of those flags over the user timeline
    * IS the running distinct count. Both windows partition on
    * user_id; no holistic distinct state anywhere.
    */
  val winCumulativeDistinct: Q = (s, dir) => {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("is_new",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("is_new")).over(wRun))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_types_seen"))
      .orderBy("user_id", "event_id")
  }

  /** Top-3 orders per customer by totalprice (latest-record-wins /
    * top-k idiom). Unique tiebreak on orderkey.
    */
  val winRowNumberTopk: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** rank / dense_rank / percent_rank / cume_dist over supplier
    * balances per nation (value-determined, tie-safe) + ntile(4) over a
    * fully tiebroken ordering (ntile is row-order-dependent).
    */
  val winRankDense: Q = (s, dir) => {
    val byBal = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)
    val byBalKey = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    table(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
        rank().over(byBal).as("rnk"),
        dense_rank().over(byBal).as("drnk"),
        percent_rank().over(byBal).as("prnk"),
        cume_dist().over(byBal).as("cdist"),
        ntile(4).over(byBalKey).as("quartile"))
      .orderBy("s_suppkey")
  }

  /** Per-user event deltas: value − lag(value) and the gap to the
    * previous event in exact integer microseconds (no float time math).
    */
  val winLagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    table(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_value"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
        lead(col("event_id"), 1).over(w).as("next_event_id"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Running revenue per customer ordered by orderdate — exact decimal
    * prefix sums, each cast to double at the row.
    */
  val winRunningSum: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_rev"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** 7-day moving revenue: pre-aggregate to daily (calendar-bounded
    * cardinality), then realize the RANGE frame WITHOUT a global
    * window: each day's revenue is exploded to the ≤7 window
    * positions it can serve, and an equi-join back to the existing
    * days computes "sum of existing rows in [day-6, day]" under
    * ordinary hash partitioning on the day key. Identical semantics
    * to `rangeBetween(-6, 0)` over epoch-day ordering — but no
    * single-task sort of the daily relation (it is calendar-bounded,
    * yet the zero-warning posture is cheap here: one explode + one
    * equi-join).
    */
  val winMovingRange: Q = (s, dir) => {
    val daily = table(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
      .withColumn("day", unix_date(col("d")))
    val contrib = daily.select(col("rev").as("c_rev"),
      explode(sequence(col("day"), col("day") + 6)).as("wday"))
    daily.join(contrib, col("wday") === col("day"))
      .groupBy(col("d"), col("rev"))
      .agg(sum(col("c_rev")).as("mov"))
      .select(col("d"),
        col("rev").cast("double").as("day_rev"),
        col("mov").cast("double").as("mov7_rev"))
      .orderBy("d")
  }

  /** First/last event value per user by time, explicit full frame
    * (default frame would stop at CURRENT ROW for last).
    */
  val winFirstLast: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(s, dir, "events")
      .select(col("user_id"),
        first(col("value")).over(w).as("first_value"),
        last(col("value")).over(w).as("last_value"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .distinct()
      .orderBy("user_id")
  }

  /** Distribution-rank functions (round 6): quartile bucket, percent
    * rank, cumulative distribution per priority group. The order key
    * carries an o_orderkey tiebreak so ranks are a pure function of
    * the data (with ties, `percent_rank`/`cume_dist` values depend on
    * peer groups — a total order removes the ambiguity). The rank
    * ratios are exact small-integer divisions, identical IEEE doubles
    * in any engine — no rounding needed.
    */
  val winNtilePercentRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
  }

  /** Batch sessionization (round 6): a session break is a >30-minute
    * gap between consecutive events of one user; the session index is
    * the running count of breaks — one partitioned window, the
    * canonical gaps-and-islands shape. The per-session rollup then
    * reduces (user, session) to one row, so event-grain data never
    * leaves the user partition before shrinking.
    *
    * Scale: both the window and the aggregate shuffle ONCE on user_id
    * (the agg reuses the window's clustering); session state is
    * per-user, never global. The streaming twin is
    * `stream_session_windows` — this is the batch/backfill semantics
    * of the same operator, and the two agree on session boundaries by
    * construction (same 30-min gap rule).
    */
  val eventsSessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
    table(s, dir, "events")
      .withColumn("brk",
        when(gapUs.isNull.or(gapUs > lit(30L * 60L * 1000000L)), 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Longest run of CONSECUTIVE active days per user — the classic
    * gaps-and-islands streak, the retention/engagement metric every
    * product dashboard carries. The island key is the textbook
    * rewrite: over distinct (user, day) rows ordered by day,
    * `day − row_number() · 1d` is constant exactly within a
    * consecutive run, so one dense integer subtraction replaces any
    * iterative chain-following; streak length is then a plain count
    * per (user, island) and the answer the max per user, with the
    * streak's start day carried for interpretability (tie on length →
    * earliest streak, making the output deterministic).
    *
    * Scale: distinct + window + two aggs, ALL partitioned by user_id
    * and co-keyed — AQE coalesces the chain onto one user-hashed
    * exchange; no global window, no join, no iteration. The per-user
    * row count is bounded by the calendar (≤ days of history), so no
    * skew hazard exists at any corpus size.
    */
  val winStreakIslands: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val islands = days
      .withColumn("island", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("streak_len"), min(col("day")).as("streak_start"))
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("streak_len").desc, col("streak_start"))
    islands
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("streak_len"), col("streak_start"))
      .orderBy(col("user_id"))
  }

  /** Trailing one-hour RANGE frame per user — the TIME-INTERVAL
    * window frame the family's other keys don't exercise (rows
    * frames count ROWS; this one bounds the frame by the ORDER
    * VALUE): at every event, how many events and how much value did
    * the same user generate in the preceding hour including this
    * one? The rate-limiting / velocity-check primitive (fraud
    * screens, API quotas, burst gating at event granularity — the
    * event-level sibling of `events_burst_days`' calendar frame).
    *
    * The frame ORDER key is exact integer MICROSECONDS
    * (unix_micros/epoch_us — the `events_interarrival` discipline),
    * so the [ts − 1h, ts] bound is an integer range both engines
    * evaluate identically, and RANGE-frame peer semantics (equal
    * timestamps share a frame) agree by construction. Value is
    * summed as exact cents. Output keyed by event_id (total order).
    *
    * Scale: ONE window, partitioned by user_id — per-user state in
    * one pass, no self-join against a spine (the interval-join
    * formulation of the same question shuffles the fact TWICE and
    * carries the hour's fan-out; the frame carries running state
    * only). Skewed users degrade gracefully: frame state is the
    * hour's event count, not the user's history.
    */
  val winTimeRangeFrame: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    table(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_cents", sum(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), col("us"),
        col("trailing_n"), col("trailing_cents"))
      .orderBy("event_id")
  }

  /** Daily session/bounce-rate board cells — the consumer rollup of
    * [[eventsSessionize]]'s session relation (a "bounce" is the
    * classic single-event session): per session-start day the session
    * count, bounce count, total session events, and the exact
    * integer-microsecond duration mass of multi-event sessions
    * (single-event sessions have zero duration BY DEFINITION — kept
    * out of the duration mass so the consumer's mean-duration
    * division isn't dragged by structural zeros; documented, and the
    * bounce count is right there to reconstruct either convention).
    * Bounce rate and mean duration read off as divisions the
    * consumer performs.
    *
    * Scale: the sessionize shape (user-partitioned windows) + one
    * map-side rollup to ≤|days| cells.
    */
  val eventsBounceRate: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
    table(s, dir, "events")
      .withColumn("brk",
        when(gapUs.isNull.or(gapUs > lit(30L * 60L * 1000000L)), 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("brk")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("us_start"),
        max(unix_micros(col("ts"))).as("us_end"))
      .select(expr("CAST(us_start div 86400000000 AS BIGINT)").as("epoch_day"),
        col("n_events"), (col("us_end") - col("us_start")).as("dur_us"))
      .groupBy(col("epoch_day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("n_events") > 1L, col("dur_us")).otherwise(0L)).as("dur_us_multi"))
      .orderBy("epoch_day")
  }

  val queries: Map[String, Q] = Map(
    "events_bounce_rate" -> eventsBounceRate,
    "win_time_range_frame" -> winTimeRangeFrame,
    "win_streak_islands" -> winStreakIslands,
    "win_row_number_topk" -> winRowNumberTopk,
    "win_rank_dense" -> winRankDense,
    "win_lag_lead" -> winLagLead,
    "win_running_sum" -> winRunningSum,
    "win_moving_range" -> winMovingRange,
    "win_cumulative_distinct" -> winCumulativeDistinct,
    "win_first_last" -> winFirstLast,
    "win_ntile_percent_rank" -> winNtilePercentRank,
    "events_sessionize" -> eventsSessionize,
  )
}
