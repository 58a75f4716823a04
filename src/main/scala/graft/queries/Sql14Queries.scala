package graft.queries

import org.apache.spark.sql.functions._
import Registry.sql

/** Round-10 SQL wave 14 — the golden join_filters grid (123 golden
  * files; reference sql/hive/src/test/resources/golden/join_filters-*):
  * the ON-clause vs WHERE-clause filter-placement semantics enumerated
  * over preserved and null-supplying sides of LEFT/RIGHT/FULL outer
  * joins on one literal frame with NULLs in both key and value
  * positions. sql_ppd_outer_join pins the optimizer's pushdown
  * behavior on real tables; this is the dense SEMANTICS grid on a
  * 3×3-row fixture where every row's fate is enumerable by hand.
  */
object Sql14Queries {

  /** Shared literal frames: L has a NULL value at id 2; R has a NULL
    * value at id 3; ids 2/4 are unmatched on one side each. */
  private val frames =
    """l AS (SELECT * FROM VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 30) AS l(id, v)),
       r AS (SELECT * FROM VALUES (1, 100), (3, CAST(NULL AS INT)), (4, 400) AS r(id, v))"""

  private def grid(f: String) = s"""
    WITH $f
    SELECT 'left_on_null_side' AS family, count(*) AS n_rows,
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT) AS sum_v
    FROM l LEFT JOIN r ON l.id = r.id AND r.v > 50
    UNION ALL
    SELECT 'left_where_null_side', count(*),
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT)
    FROM l LEFT JOIN r ON l.id = r.id WHERE r.v > 50
    UNION ALL
    SELECT 'left_on_preserved_side', count(*),
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT)
    FROM l LEFT JOIN r ON l.id = r.id AND l.v > 15
    UNION ALL
    SELECT 'right_on_preserved_side', count(*),
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT)
    FROM l RIGHT JOIN r ON l.id = r.id AND r.v > 50
    UNION ALL
    SELECT 'full_on_filter_both', count(*),
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT)
    FROM l FULL JOIN r ON l.id = r.id AND l.v > 15 AND r.v > 50
    UNION ALL
    SELECT 'full_where_becomes_inner', count(*),
           CAST(sum(coalesce(l.v, 0) + coalesce(r.v, 0)) AS BIGINT)
    FROM l FULL JOIN r ON l.id = r.id WHERE l.v > 15 AND r.v > 50
    ORDER BY family"""

  val all: Seq[Q] = Seq(
    // The oracle is NOT the same SQL re-executed (a shared outer-join
    // misconception would mutually mask): the expected rows are pinned
    // as hand-enumerated literals. Derivation — matched pairs per
    // family over L={(1,10),(2,ø),(3,30)}, R={(1,100),(3,ø),(4,400)}:
    // left ON r.v>50 keeps only id1 matched (id3's r.v IS NULL) but
    // preserves all 3 l-rows → sum 110+0+30=140; the WHERE spelling
    // filters AFTER null-extension → 1 row, 110; ON l.v>15 drops id1's
    // match but never an l-row → 3 rows, 10+0+30=40; right preserved →
    // 110+0+400=510; full with both ON filters matches nothing → all 6
    // rows null-extended, 10+0+30+100+0+400=540; full+WHERE collapses
    // to inner and both candidates fail a predicate → 0 rows, sum NULL.
    Q("sql_join_filters_grid",
      (s, _) => s.sql(sql(grid(frames))),
      Some(sql("""SELECT * FROM (VALUES
                    ('full_on_filter_both', CAST(6 AS BIGINT), CAST(540 AS BIGINT)),
                    ('full_where_becomes_inner', CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
                    ('left_on_null_side', 3, 140),
                    ('left_on_preserved_side', 3, 40),
                    ('left_where_null_side', 1, 110),
                    ('right_on_preserved_side', 3, 510)
                  ) AS t(family, n_rows, sum_v) ORDER BY family"""))),

    // CALENDAR DIMENSION GENERATOR: the warehouse date-dim built from a
    // pure sequence (no source table) — year/quarter/month/day-of-week,
    // ISO week, weekend flag, month-end — one generator expression
    // exploded, every attribute a deterministic date function. The
    // shape every star schema joins its facts against.
    Q("sql_date_dimension",
      (s, _) => s.sql(sql("""
        SELECT d,
               year(d) AS yr, quarter(d) AS qtr, month(d) AS mo,
               day(d) AS dom, CAST(weekday(d) AS INT) AS dow_mon0,
               CAST(weekofyear(d) AS INT) AS iso_week,
               weekday(d) >= 5 AS is_weekend,
               last_day(d) = d AS is_month_end
        FROM (SELECT explode(sequence(DATE '2024-02-25', DATE '2024-04-05')) AS d)
        ORDER BY d""")),
      Some(sql("""SELECT CAST(d AS DATE) AS d,
                    CAST(year(d) AS INT) AS yr, CAST(quarter(d) AS INT) AS qtr,
                    CAST(month(d) AS INT) AS mo, CAST(day(d) AS INT) AS dom,
                    CAST(isodow(d) - 1 AS INT) AS dow_mon0,
                    CAST(weekofyear(d) AS INT) AS iso_week,
                    isodow(d) - 1 >= 5 AS is_weekend,
                    last_day(CAST(d AS DATE)) = CAST(d AS DATE) AS is_month_end
                  FROM generate_series(DATE '2024-02-25', DATE '2024-04-05',
                                       INTERVAL 1 DAY) AS t(d)
                  ORDER BY d"""))),

    // INCREMENTAL AGGREGATE MAINTENANCE: the mergeable-state contract
    // behind every incremental ETL — a per-type aggregate computed as
    // OLD ⊕ DELTA (sum/count/min/max merged, avg re-derived from the
    // merged sums) must equal the full recompute exactly. The batch
    // boundary splits events at the median day; `matches_full` pins the
    // equality as data.
    Q("pipe_incremental_agg",
      (s, d) => {
        import graft.Engine.events
        val ev = events(s, d).select(col("event_type"),
          floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        val cut = ev.agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY day)").as("cut"))
        val halves = ev.crossJoin(broadcast(cut))
          .withColumn("half", when(col("day") < col("cut"), "old").otherwise("delta"))
        val partials = halves.groupBy(col("event_type"), col("half"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
            min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        val merged = partials.groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
            min(col("mn")).as("mn"), max(col("mx")).as("mx"))
        val full = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("fn"), sum(col("cents")).as("fs"),
            min(col("cents")).as("fmn"), max(col("cents")).as("fmx"))
        merged.join(full, "event_type")
          .select(col("event_type"), col("n"), col("s"), col("mn"), col("mx"),
            expr("CAST(s DIV n AS BIGINT)").as("avg_cents"),
            (col("n") === col("fn") && col("s") === col("fs")
              && col("mn") === col("fmn") && col("mx") === col("fmx"))
              .as("matches_full"))
          .orderBy(col("event_type"))
      },
      Some(sql("""WITH ev AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events),
                   cut AS (SELECT quantile_disc(day, 0.5) AS cut FROM ev),
                   halves AS (SELECT event_type, cents,
                       CASE WHEN day < cut THEN 'old' ELSE 'delta' END AS half
                     FROM ev, cut),
                   partials AS (SELECT event_type, half, count(*) AS n,
                       CAST(sum(cents) AS BIGINT) AS s,
                       min(cents) AS mn, max(cents) AS mx
                     FROM halves GROUP BY 1, 2),
                   merged AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
                       CAST(sum(s) AS BIGINT) AS s, min(mn) AS mn, max(mx) AS mx
                     FROM partials GROUP BY event_type),
                   fullagg AS (SELECT event_type, count(*) AS fn,
                       CAST(sum(cents) AS BIGINT) AS fs,
                       min(cents) AS fmn, max(cents) AS fmx
                     FROM ev GROUP BY event_type)
                   SELECT event_type, n, s, mn, mx,
                     s // n AS avg_cents,
                     (n = fn AND s = fs AND mn = fmn AND mx = fmx) AS matches_full
                   FROM merged JOIN fullagg USING (event_type)
                   ORDER BY event_type""")))
  )
}
