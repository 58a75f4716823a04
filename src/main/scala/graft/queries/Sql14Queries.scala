package graft.queries

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

  private val framesDuck =
    """l AS (SELECT * FROM (VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 30)) AS l(id, v)),
       r AS (SELECT * FROM (VALUES (1, 100), (3, CAST(NULL AS INT)), (4, 400)) AS r(id, v))"""

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
    Q("sql_join_filters_grid",
      (s, _) => s.sql(sql(grid(frames))),
      Some(sql(grid(framesDuck))))
  )
}
