package graft.queries

import graft.Engine.{events, table}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.5 — window functions. The reference has NONE (no OVER in
  * either 1.3 parser; upstream gained them in 1.4), so these are declared
  * beyond-reference extensions: ranking, analytic (lag/lead), frames, and
  * distribution functions via Window.partitionBy().orderBy().
  *
  * Scale posture: every window is PARTITIONED (one shuffle on the
  * partition key, then a per-partition sort) — no global single-partition
  * window in any declared query. Orderings always end in a unique key so
  * results are deterministic under ties.
  */
object WindowQueries {

  val all: Seq[Q] = Seq(

    // Ranking trio over a partitioned window.
    Q("win_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"))
          .filter(col("rn") <= 50)
      },
      Some(sql("""SELECT * FROM (
                    SELECT o_orderkey, o_orderstatus, o_totalprice,
                      CAST(row_number() OVER w AS BIGINT) AS rn,
                      CAST(rank() OVER w AS BIGINT) AS rnk,
                      CAST(dense_rank() OVER w AS BIGINT) AS drnk
                    FROM orders
                    WINDOW w AS (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice DESC, o_orderkey))
                  WHERE rn <= 50"""))),

    // lag/lead over per-user event streams.
    Q("win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
        events(s, d)
          .select(col("user_id"), col("event_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      },
      Some(sql("""SELECT user_id, event_id, value,
                   lag(value, 1) OVER w AS prev_value,
                   lead(value, 1) OVER w AS next_value,
                   value - lag(value, 1) OVER w AS delta
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)"""))),

    // Running aggregate with an explicit ROWS frame.
    Q("win_running_sum", bench = true,
      fn = (s, d) => {
        // (l_orderkey, l_linenumber) is not unique in the synthetic data;
        // adding the summed column itself makes tied prefixes sum-stable.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_orderkey").asc, col("l_linenumber").asc, col("l_extendedprice").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(sum(col("l_extendedprice")).over(w), 4).as("running_price"),
            count(lit(1)).over(w).cast("long").as("running_n"))
      },
      oracle = Some(sql("""SELECT l_suppkey, l_orderkey, l_linenumber,
                   round(sum(l_extendedprice) OVER w, 4) AS running_price,
                   CAST(count(*) OVER w AS BIGINT) AS running_n
                  FROM lineitem
                  WINDOW w AS (PARTITION BY l_suppkey
                               ORDER BY l_orderkey, l_linenumber, l_extendedprice
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))),

    // Sliding ROWS frame (moving average of the 3 surrounding rows).
    Q("win_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
          .rowsBetween(-1, 1)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            round(avg(col("value")).over(w), 6).as("mov_avg"),
            min(col("value")).over(w).as("mov_min"),
            max(col("value")).over(w).as("mov_max"))
      },
      Some(sql("""SELECT user_id, event_id,
                   round(avg(value) OVER w, 6) AS mov_avg,
                   min(value) OVER w AS mov_min,
                   max(value) OVER w AS mov_max
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"""))),

    // Distribution functions + ntile. percent_rank/cume_dist are scaled
    // back to exact integers (rank-1 and rows-≤-current): round()ing the
    // raw fractions hits decimal half-ties that Spark (half-up on the
    // decimal repr) and DuckDB (binary) resolve differently.
    Q("win_distribution",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val wp = Window.partitionBy(col("c_nationkey"))
        table(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w) * (count(lit(1)).over(wp) - 1))
              .cast("long").as("pct_rank_num"),
            round(cume_dist().over(w) * count(lit(1)).over(wp))
              .cast("long").as("cume_num"))
      },
      Some(sql("""SELECT c_custkey, c_nationkey,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   CAST(round(percent_rank() OVER w * (count(*) OVER wp - 1)) AS BIGINT) AS pct_rank_num,
                   CAST(round(cume_dist() OVER w * count(*) OVER wp) AS BIGINT) AS cume_num
                  FROM customer
                  WINDOW w AS (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey),
                         wp AS (PARTITION BY c_nationkey)"""))),

    // RANGE (value-based) window frame — the other frame type next to
    // ROWS. Price is scaled to exact integer cents so both the frame
    // boundary semantics and the windowed sum are exact (no double
    // accumulation-order drift; CAST the DuckDB sum: HUGEINT vs long).
    Q("win_range_frame",
      (s, d) => {
        val cents = round(col("o_totalprice") * 100).cast("long")
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("cents"))
          .rangeBetween(-1000000L, 0L) // $10k window below each order
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), cents.as("cents"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
            count(lit(1)).over(w).cast("long").as("n_within_10k"),
            sum(col("cents")).over(w).as("cents_within_10k"))
      },
      Some(sql("""SELECT o_orderkey, o_orderstatus, cents,
                   CAST(count(*) OVER w AS BIGINT) AS n_within_10k,
                   CAST(sum(cents) OVER w AS BIGINT) AS cents_within_10k
                  FROM (SELECT o_orderkey, o_orderstatus,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                        FROM orders)
                  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY cents
                               RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)"""))),

    // first/last value within a frame + nth-style top-per-group pattern.
    Q("win_top_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        table(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"),
            first_value(col("o_totalprice")).over(w).as("best_price"))
          .filter(col("rn") <= 2)
      },
      Some(sql("""SELECT * FROM (
                    SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(row_number() OVER w AS BIGINT) AS rn,
                      first_value(o_totalprice) OVER w AS best_price
                    FROM orders
                    WINDOW w AS (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey))
                  WHERE rn <= 2"""))),

    // Time-interval RANGE frame: each event's trailing-1-hour sum per
    // user — the event-time sibling of win_range_frame's integer frame.
    // Frame sums accumulate in DECIMAL (exact, order-independent inside
    // the frame) and render once as double.
    Q("win_time_range",
      (s, d) => events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast("decimal(18,6)").as("v"))
        .withColumn("sum_1h",
          expr("""sum(v) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""))
        .select(col("event_id"), col("user_id"),
          round(col("sum_1h").cast("double"), 4).as("sum_1h")),
      Some(sql("""SELECT event_id, user_id,
                    round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
                      PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS sum_1h
                  FROM events"""))),

    // IGNORE NULLS value windows — LOCF gap-filling (carry the last
    // non-null observation forward) and its forward-fill mirror, the
    // standard time-series repair: deterministic nulls injected on a
    // key pattern, last_value IGNORE NULLS over the running frame per
    // customer. Spark spells it `last_value(x) IGNORE NULLS OVER`,
    // DuckDB `last_value(x IGNORE NULLS) OVER` — same semantics.
    Q("win_ignore_nulls",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord_win_in")
        s.sql("""SELECT o_custkey, o_orderkey, price,
                   last_value(price) IGNORE NULLS OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
                   first_value(price) IGNORE NULLS OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_seen
                 FROM (SELECT o_custkey, o_orderkey,
                         CASE WHEN o_orderkey % 7 = 0 THEN NULL
                              ELSE o_totalprice END AS price
                       FROM graft_ord_win_in)""")
      },
      Some(sql("""SELECT o_custkey, o_orderkey, price,
                    last_value(price IGNORE NULLS) OVER (
                      PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
                    first_value(price IGNORE NULLS) OVER (
                      PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_seen
                  FROM (SELECT o_custkey, o_orderkey,
                          CASE WHEN o_orderkey % 7 = 0 THEN NULL
                               ELSE o_totalprice END AS price
                        FROM orders)"""))),

    // RUNNING DISTINCT COUNT (the audience-growth metric): per event
    // type, cumulative distinct users by hour — COUNT(DISTINCT) has no
    // window form, so the running set rides size(collect_set() OVER).
    // Scale note: the window state is bounded by the per-type user
    // cardinality (the metric's own output magnitude), not the row
    // count; the oracle restates it with an hour×history expansion.
    Q("win_distinct_users",
      (s, d) => {
        val hourly = events(s, d)
          .select(col("event_type"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd-HH").as("h"))
          .distinct()
        hourly
          .withColumn("cum_users", size(collect_set(col("user_id")).over(
            Window.partitionBy(col("event_type")).orderBy(col("h"))
              .rangeBetween(Window.unboundedPreceding, Window.currentRow))).cast("long"))
          .groupBy(col("event_type"), col("h"))
          .agg(max(col("cum_users")).as("cum_users"))
      },
      Some(sql("""WITH hourly AS (
             SELECT DISTINCT event_type, user_id,
               strftime(ts, '%Y-%m-%d-%H') AS h
             FROM events),
           hours AS (SELECT DISTINCT event_type, h FROM hourly)
           SELECT hs.event_type, hs.h,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS cum_users
           FROM hours hs JOIN hourly e
             ON e.event_type = hs.event_type AND e.h <= hs.h
           GROUP BY hs.event_type, hs.h"""))),

    // BATCH time-bucket aggregation via the window() FUNCTION — the
    // same `window(ts, '6 hours')` expression the streaming rows group
    // by, here over history (backfill parity between the batch and
    // streaming halves of a lambda pipeline is exactly this query
    // equality). Bucket bounds exported as epoch micros; value sums in
    // exact integer cents.
    Q("win_tumbling_batch",
      (s, d) => table(s, d, "events")
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100.0).cast("long")).as("cents"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          unix_micros(col("w.end")).as("w_end_us"),
          col("event_type"), col("n"), col("cents")),
      Some(sql("""SELECT
                    epoch_us(ts) // 21600000000 * 21600000000 AS w_start_us,
                    epoch_us(ts) // 21600000000 * 21600000000 + 21600000000 AS w_end_us,
                    event_type, count(*) AS n,
                    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
                  FROM events GROUP BY 1, 2, 3"""))),

    // BATCH session_window() — the built-in gap-session aggregation
    // (the declarative twin of pipe_sessionize's manual gaps-and-
    // islands): a session ends 30 minutes after its last event, so
    // end = max(ts) + gap and the oracle rebuilds exactly that from
    // the window chain. session_window merges only while the next
    // event starts STRICTLY before prev+gap, so the oracle's new-
    // session test is >= gap, not >. Partitioned by user before the
    // session assignment — never a global timeline.
    Q("win_session_builtin",
      (s, d) => table(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events")),
      Some(sql("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
                  m AS (SELECT user_id, us,
                          CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                                 OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                    >= 1800000000
                               THEN 1 ELSE 0 END AS new_s
                        FROM e),
                  x AS (SELECT user_id, us,
                          sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS seq
                        FROM m)
                  SELECT user_id, min(us) AS s_us,
                    max(us) + 1800000000 AS end_us, count(*) AS n_events
                  FROM x GROUP BY user_id, seq"""))),

    // LINEAR GAP INTERPOLATION on an hourly spine — the time-series
    // repair step after win_ignore_nulls' LOCF: missing hours get the
    // value linearly between their known neighbours, exact integer
    // arithmetic (cents × hour-index fractions), edges stay NULL. The
    // spine is generated from the series bounds (sequence/
    // generate_series), and the window is over the BOUNDED hour grid
    // (~700 rows), not the events — same bounded-grid pattern as
    // ml_roc_points.
    Q("win_interpolate",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = table(s, d, "events")
          .filter(col("event_type") === "purchase" && col("value") > 30.0)
          .groupBy(floor(unix_micros(col("ts")) / 3600000000.0).cast("long").as("h"))
          .agg(sum(round(col("value") * 100.0).cast("long")).as("cents"))
        val spine = hourly.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
          .select(explode(sequence(col("mn"), col("mx"))).as("h"))
        val j = spine.join(hourly, Seq("h"), "left")
        val wAll = Window.orderBy(col("h"))
        val prevW = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nextW = wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        j.select(col("h"), col("cents"),
            last(col("cents"), ignoreNulls = true).over(prevW).as("pv"),
            last(when(col("cents").isNotNull, col("h")), ignoreNulls = true)
              .over(prevW).as("ph"),
            first(col("cents"), ignoreNulls = true).over(nextW).as("nv"),
            first(when(col("cents").isNotNull, col("h")), ignoreNulls = true)
              .over(nextW).as("nh"))
          .select(col("h"), col("cents"),
            when(col("cents").isNotNull, col("cents") * 1000000L)
              .otherwise(
                floor((col("pv") * (col("nh") - col("h"))
                  + col("nv") * (col("h") - col("ph"))) * 1000000.0
                  / (col("nh") - col("ph"))).cast("long"))
              .as("interp_micro"))
      },
      Some(sql("""WITH hourly AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
                      CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase' AND value > 30.0
                    GROUP BY 1),
                  spine AS (SELECT unnest(generate_series(
                      (SELECT min(h) FROM hourly), (SELECT max(h) FROM hourly))) AS h),
                  j AS (SELECT s.h, hourly.cents FROM spine s
                        LEFT JOIN hourly ON s.h = hourly.h),
                  x AS (SELECT h, cents,
                      last_value(cents IGNORE NULLS) OVER
                        (ORDER BY h ROWS UNBOUNDED PRECEDING) AS pv,
                      last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
                        OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS ph,
                      first_value(cents IGNORE NULLS) OVER
                        (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                      first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
                        OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
                    FROM j)
                  SELECT h, cents,
                    CASE WHEN cents IS NOT NULL THEN cents * 1000000
                         ELSE CAST(floor((pv * (nh - h) + nv * (h - ph)) * 1000000.0
                                   / (nh - ph)) AS BIGINT) END AS interp_micro
                  FROM x"""))),

    // TRUNCATED EWMA — exponentially weighted moving average with the
    // tail cut at 12 lags (α=0.3): the recursion unrolls to the closed
    // form Σ α(1−α)^i·x_{t−i}, computed by collecting the trailing
    // frame IN FRAME ORDER (deterministic on both engines) and folding
    // position weights over it. Hourly volume series, micro-scaled;
    // weights renormalized over the available lags so early rows don't
    // undershoot.
    Q("win_ewma_trunc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = table(s, d, "events")
          .groupBy(floor(unix_micros(col("ts")) / 3600000000.0).cast("long").as("h"))
          .agg(count(lit(1)).cast("double").as("n"))
        val w = Window.orderBy(col("h")).rowsBetween(-11, 0)
        hourly
          .select(col("h"), col("n").cast("long").as("n"),
            collect_list(col("n")).over(w).as("tail"))
          .select(col("h"), col("n"),
            expr("""CAST(floor(1000000.0 *
                    aggregate(tail, named_struct('acc', 0D, 'wsum', 0D, 'i', size(tail) - 1),
                      (st, x) -> named_struct(
                        'acc', st.acc + x * 0.3 * power(0.7, st.i),
                        'wsum', st.wsum + 0.3 * power(0.7, st.i),
                        'i', st.i - 1),
                      st -> st.acc / st.wsum) + 0.5) AS BIGINT)""").as("ewma_micro"))
      },
      Some(sql("""WITH hourly AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
                      CAST(count(*) AS DOUBLE) AS n
                    FROM events GROUP BY 1),
                  t AS (SELECT h, CAST(n AS BIGINT) AS n,
                      list(n) OVER (ORDER BY h ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
                        AS tail
                    FROM hourly),
                  e AS (SELECT h, n, tail, len(tail) AS m FROM t)
                  SELECT h, n,
                    CAST(floor(1000000.0 *
                      list_sum(list_transform(range(len(tail)),
                        i -> tail[i + 1] * 0.3 * power(0.7, len(tail) - 1 - i)))
                      / list_sum(list_transform(range(len(tail)),
                        i -> 0.3 * power(0.7, len(tail) - 1 - i))) + 0.5) AS BIGINT)
                      AS ewma_micro
                  FROM e"""))),

    // PERIOD-OVER-PERIOD CHANGE — daily event volume vs the previous
    // day, micro-scaled delta ratio (the growth-dashboard primitive);
    // first day emits NULL, not zero.
    Q("win_pct_change",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = table(s, d, "events")
          .groupBy(floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("day"))
        daily.select(col("day"), col("n"),
          lag(col("n"), 1).over(w).as("prev"),
          floor((col("n") - lag(col("n"), 1).over(w)) * lit(1000000.0)
            / lag(col("n"), 1).over(w)).cast("long").as("chg_micro"))
      },
      Some(sql("""WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)
                        AS day, count(*) AS n
                      FROM events GROUP BY 1)
                  SELECT day, n,
                    lag(n) OVER (ORDER BY day) AS prev,
                    CAST(floor((n - lag(n) OVER (ORDER BY day)) * 1000000.0
                      / lag(n) OVER (ORDER BY day)) AS BIGINT) AS chg_micro
                  FROM d"""))),

    // LONGEST ACTIVITY STREAK per user — consecutive-active-days runs
    // via the day − dense_rank gaps-and-islands identity (consecutive
    // days share the difference), then max run length: the engagement
    // metric behind every retention leaderboard. Partitioned by user
    // throughout.
    Q("win_streaks",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val days = table(s, d, "events")
          .select(col("user_id"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days
          .withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("run"))
          .groupBy(col("user_id"))
          .agg(max(col("run")).as("longest_streak"),
            count(lit(1)).as("n_streaks"))
      },
      Some(sql("""WITH days AS (SELECT DISTINCT user_id,
                      CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
                    FROM events),
                  g AS (SELECT user_id, day,
                      day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
                    FROM days),
                  runs AS (SELECT user_id, grp, count(*) AS run
                           FROM g GROUP BY 1, 2)
                  SELECT user_id, CAST(max(run) AS BIGINT) AS longest_streak,
                    count(*) AS n_streaks
                  FROM runs GROUP BY user_id"""))),

    // AUTOCORRELATION of the hourly event-count series at lags 1h and
    // 24h — the periodicity diagnostic behind seasonality-aware
    // forecasting. Pairs come from an equi-join of the hourly series
    // onto itself shifted by the lag (gaps pair nothing, exactly the
    // observed-pairs convention); Pearson r is computed from exact
    // integer sufficient statistics, so no accumulation-order drift.
    // Scale posture: the hourly series is corpus-time-bounded (one
    // partial agg from events), the self-join is an equi-join on hour —
    // never quadratic.
    Q("win_autocorr",
      (s, d) => {
        val hourly = graft.Engine.events(s, d)
          .groupBy(floor(unix_micros(col("ts")) / 3600000000.0).cast("long").as("hr"))
          .agg(count(lit(1)).as("n"))
        val lags = s.range(1, 2).select(lit(1L).as("lg"))
          .union(s.range(1, 2).select(lit(24L).as("lg")))
        // project the shifted key BEFORE the join so the planner sees a
        // plain equi-key (probe_hr = b.hr) it can hash-partition — a
        // condition referencing both sides in one operand (a.hr = b.hr+lg)
        // extracts no equi-key and degrades to a nested-loop join
        hourly.as("a").crossJoin(lags)
          .select((col("a.hr") - col("lg")).as("probe_hr"),
            col("lg"), col("a.n").as("y"))
          .join(hourly.as("b"), col("probe_hr") === col("b.hr"))
          .select(col("lg"), col("y"), col("b.n").as("x"))
          .groupBy(col("lg"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lg"), col("n_pairs"),
            round((col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double") / col("n_pairs").cast("double")) /
              sqrt((col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double") / col("n_pairs").cast("double")) *
                (col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double") / col("n_pairs").cast("double"))), 6)
              .as("autocorr"))
          .orderBy(col("lg"))
      },
      Some(sql("""WITH hourly AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hr,
                       count(*) AS n
                     FROM events GROUP BY 1),
                  lags AS (SELECT unnest([CAST(1 AS BIGINT), CAST(24 AS BIGINT)]) AS lg),
                  pairs AS (SELECT lg, a.n AS y, b.n AS x
                            FROM hourly a, lags, hourly b
                            WHERE a.hr = b.hr + lg),
                  s AS (SELECT lg, count(*) AS n_pairs,
                          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                          sum(x * x) AS sxx, sum(y * y) AS syy
                        FROM pairs GROUP BY lg)
                  SELECT lg, n_pairs,
                    round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n_pairs AS DOUBLE)) /
                      sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n_pairs AS DOUBLE)) *
                           (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n_pairs AS DOUBLE))), 6)
                      AS autocorr
                  FROM s ORDER BY lg"""))),

    // CUSUM DRIFT DETECTION per event type: the resetting one-sided
    // CUSUM C_t = max(0, C_{t-1} + dev_t) restated WINDOW-EXPRESSIBLE
    // via the prefix-sum identity C_t = P_t − min_{s≤t} P_s — two
    // running frames partitioned by event_type, exact integer cents
    // throughout (the upward-drift alarm behind data-quality monitors).
    // Alarm: cumulative positive drift exceeding one average day's
    // volume.
    Q("win_cusum",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = graft.Engine.events(s, d)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val base = daily.groupBy(col("event_type"))
          .agg(expr("CAST(sum(v) DIV count(1) AS BIGINT)").as("baseline"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(broadcast(base), "event_type")
          .withColumn("p", sum(col("v") - col("baseline")).over(w))
          .withColumn("c", col("p") - min(col("p")).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            max(col("c")).as("max_cusum_c"),
            sum(when(col("c") > col("baseline"), 1L).otherwise(0L)).as("alarm_days"))
          .orderBy(col("event_type"))
      },
      Some(sql("""WITH daily AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                     FROM events GROUP BY 1, 2),
                  base AS (SELECT event_type, CAST(sum(v) // count(*) AS BIGINT) AS baseline
                           FROM daily GROUP BY event_type),
                  pr AS (SELECT d.event_type, day, v, baseline,
                       CAST(sum(v - baseline) OVER (PARTITION BY d.event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
                     FROM daily d JOIN base USING (event_type)),
                  cu AS (SELECT event_type, day, baseline,
                       p - min(p) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
                     FROM pr)
                  SELECT event_type, count(*) AS n_days,
                    CAST(max(c) AS BIGINT) AS max_cusum_c,
                    CAST(sum(CASE WHEN c > baseline THEN 1 ELSE 0 END) AS BIGINT) AS alarm_days
                  FROM cu GROUP BY event_type ORDER BY event_type"""))),

    // SEASONAL-NAIVE FORECAST EVAL: forecast(day) = actual(day − 7) per
    // event type (the standard baseline every forecaster must beat),
    // scored by MAPE and sMAPE over the days where both sides exist.
    // The forecast join is an equi-join on (type, day−7) — gaps pair
    // nothing; volumes are exact integer cents, the error ratios are
    // the only doubles.
    Q("win_seasonal_naive",
      (s, d) => {
        val daily = graft.Engine.events(s, d)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type")
              && col("a.day") === col("b.day") + 7)
          .select(col("a.event_type").as("event_type"),
            col("a.v").as("v"), col("b.v").as("f"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            round(avg(abs(col("v") - col("f")).cast("double") / col("v").cast("double")), 6)
              .as("mape"),
            round(avg(abs(col("v") - col("f")).cast("double") * 2.0 /
              (col("v") + col("f")).cast("double")), 6).as("smape"))
          .orderBy(col("event_type"))
      },
      Some(sql("""WITH daily AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                     FROM events GROUP BY 1, 2)
                  SELECT a.event_type, count(*) AS n_days,
                    round(avg(CAST(abs(a.v - b.v) AS DOUBLE) / CAST(a.v AS DOUBLE)), 6) AS mape,
                    round(avg(CAST(abs(a.v - b.v) AS DOUBLE) * 2.0 /
                      CAST(a.v + b.v AS DOUBLE)), 6) AS smape
                  FROM daily a JOIN daily b
                    ON a.event_type = b.event_type AND a.day = b.day + 7
                  GROUP BY a.event_type ORDER BY a.event_type"""))),

    // CLASSICAL SEASONAL DECOMPOSITION (additive, STL-lite): per event
    // type, trend = centered 7-day moving average over daily totals
    // (full windows only), seasonal index = mean detrended value per
    // day-of-week. Exact integers end to end: the MA and the per-dow
    // mean are floor divisions of exact sums — no float enters until
    // never. One partitioned frame + one grouped aggregate.
    Q("win_seasonal_decompose",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = graft.Engine.events(s, d)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-3, 3)
        daily
          .withColumn("fs", sum(col("v")).over(w))
          .withColumn("fn", count(lit(1)).over(w))
          .filter(col("fn") === 7)
          .withColumn("detr", col("v") - expr("fs DIV 7"))
          .groupBy(col("event_type"), pmod(col("day"), lit(7)).as("dow"))
          .agg(count(lit(1)).as("n_days"),
            // measured parity: DuckDB's integer `//` TRUNCATES toward
            // zero on negative operands (like Spark DIV) — a floor
            // emulation here produced an off-by-one on negative sums
            expr("CAST(sum(detr) DIV count(1) AS BIGINT)").as("seasonal_c"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some(sql("""WITH daily AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                     FROM events GROUP BY 1, 2),
                  ma AS (SELECT event_type, day, v,
                       CAST(sum(v) OVER w AS BIGINT) AS fs,
                       count(*) OVER w AS fn
                     FROM daily
                     WINDOW w AS (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
                  detr AS (SELECT event_type, day % 7 AS dow, v - fs // 7 AS detr
                           FROM ma WHERE fn = 7)
                  SELECT event_type, dow, count(*) AS n_days,
                    CAST(sum(detr) // count(*) AS BIGINT) AS seasonal_c
                  FROM detr GROUP BY 1, 2 ORDER BY event_type, dow"""))),

    // ROLLING MEDIAN (trailing 7-day robust smoother): median as a
    // WINDOW aggregate over a ROWS frame, partitioned by event type —
    // the outlier-resistant counterpart of the moving average in
    // win_seasonal_decompose. Odd-length full frames make the median an
    // exact element (both engines interpolate only on even counts, so
    // partial leading frames are excluded); exact integer cents.
    Q("win_rolling_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = graft.Engine.events(s, d)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-6, 0)
        daily
          .withColumn("fn", count(lit(1)).over(w))
          // Spark disallows median() with an explicit frame — the
          // 7-element frame median is the exact 4th order statistic of
          // the frame's collected list instead (same value, still no
          // interpolation)
          .withColumn("med",
            element_at(array_sort(collect_list(col("v")).over(w)), 4))
          .filter(col("fn") === 7)
          .select(col("event_type"), col("day"), col("v"), col("med"))
          .orderBy(col("event_type"), col("day"))
      },
      Some(sql("""WITH daily AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                     FROM events GROUP BY 1, 2),
                  r AS (SELECT event_type, day, v,
                       count(*) OVER w AS fn,
                       CAST(median(v) OVER w AS BIGINT) AS med
                     FROM daily
                     WINDOW w AS (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                  SELECT event_type, day, v, med
                  FROM r WHERE fn = 7 ORDER BY event_type, day""")))
  )
}
