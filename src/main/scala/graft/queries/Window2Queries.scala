package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 window wave 2 — two time-series analytics staples over the
  * events stream, both strictly PARTITIONED by user (the house fence: no
  * single-partition window anywhere):
  *
  * - rolling correlation: Pearson between the hourly spend and hourly
  *   event-count series in a 24-hour trailing ROWS frame. The frame
  *   sums are exact integers (cents / counts), so the correlation is
  *   one IEEE projection per row with an explicit zero-variance guard —
  *   engine-native corr() differs between Spark (NaN) and DuckDB (NULL)
  *   on degenerate frames, so the sufficient-statistic spelling is also
  *   the portable one.
  * - maximum drawdown: running cumulative spend vs its running maximum,
  *   the classic risk metric — drawdown stays an exact integer end to
  *   end (ties broken by event_id so both engines accumulate in the
  *   same order).
  */
object Window2Queries {

  val all: Seq[Q] = Seq(

    Q("win_rolling_corr",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_rc")
        s.sql(sql("""
          WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hr,
                   sum(CAST(round(value * 100) AS BIGINT)) AS x,
                   count(*) AS y
                 FROM graft_ev_rc WHERE user_id < 20
                 GROUP BY user_id, date_trunc('hour', ts)),
               framed AS (SELECT user_id, hr,
                   count(*) OVER w AS n,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
                   sum(x * y) OVER w AS sxy
                 FROM hourly
                 WINDOW w AS (PARTITION BY user_id ORDER BY hr
                              ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
          SELECT user_id, hr, CAST(n AS BIGINT) AS n,
                 CASE WHEN n >= 2
                       AND n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0
                      THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                             * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                      ELSE NULL END AS roll_corr
          FROM framed"""))
      },
      Some(sql("""
        WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hr,
                 sum(CAST(round(value * 100) AS BIGINT)) AS x,
                 count(*) AS y
               FROM events WHERE user_id < 20
               GROUP BY user_id, date_trunc('hour', ts)),
             framed AS (SELECT user_id, hr,
                 count(*) OVER w AS n,
                 sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                 sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
                 sum(x * y) OVER w AS sxy
               FROM hourly
               WINDOW w AS (PARTITION BY user_id ORDER BY hr
                            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        SELECT user_id, hr, CAST(n AS BIGINT) AS n,
               CASE WHEN n >= 2
                     AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                    THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                    ELSE NULL END AS roll_corr
        FROM framed"""))),

    Q("win_drawdown",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_dd")
        s.sql(sql("""
          WITH cum AS (SELECT user_id, ts, event_id,
                   sum(CAST(round(value * 100) AS BIGINT) * CASE WHEN event_type = 'error'
                        THEN -1 ELSE 1 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
                 FROM graft_ev_dd),
               dd AS (SELECT user_id, c,
                   max(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
                 FROM cum)
          SELECT user_id,
                 CAST(max(run_max - c) AS BIGINT) AS max_drawdown_cents,
                 CAST(max(run_max) AS BIGINT) AS peak_cents,
                 CAST(count(*) AS BIGINT) AS n
          FROM dd GROUP BY user_id"""))
      },
      Some(sql("""
        WITH cum AS (SELECT user_id, ts, event_id,
                 sum(CAST(round(value * 100) AS BIGINT) * CASE WHEN event_type = 'error'
                      THEN -1 ELSE 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
               FROM events),
             dd AS (SELECT user_id, c,
                 max(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
               FROM cum)
        SELECT user_id,
               CAST(max(run_max - c) AS BIGINT) AS max_drawdown_cents,
               CAST(max(run_max) AS BIGINT) AS peak_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM dd GROUP BY user_id"""))),

    // OHLC daily resampling — the canonical time-series downsample:
    // per (event_type, day), the first/last value by event time (open/
    // close) with ties broken by event_id through a ZERO-PADDED string
    // composite key (lexicographic = numeric, overflow-free, and unlike
    // a struct key supported by arg_min/min_by on BOTH engines), plus
    // exact integer high/low/volume. One partial-aggregable pass.
    Q("win_ohlc",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_oh")
        s.sql(sql("""
          WITH keyed AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   concat(lpad(CAST(unix_micros(ts) AS STRING), 20, '0'),
                          lpad(CAST(event_id AS STRING), 12, '0')) AS ord
                 FROM graft_ev_oh)
          SELECT event_type, day,
                 min_by(cents, ord) AS open_cents,
                 max_by(cents, ord) AS close_cents,
                 max(cents) AS high_cents,
                 min(cents) AS low_cents,
                 count(*) AS volume
          FROM keyed GROUP BY event_type, day"""))
      },
      Some(sql("""
        WITH keyed AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
               FROM events)
        SELECT event_type, day,
               arg_min(cents, ord) AS open_cents,
               arg_max(cents, ord) AS close_cents,
               max(cents) AS high_cents,
               min(cents) AS low_cents,
               count(*) AS volume
        FROM keyed GROUP BY event_type, day""")))
  )
}
