package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-9 SQL wave 12 — dialect predicates and feature-engineering
  * SQL the earlier waves didn't cross. */
object Sql12Queries {

  val all: Seq[Q] = Seq(

    // IS [NOT] DISTINCT FROM — the null-safe comparison SPELLING (the
    // DSL's <=> is pinned by join_null_safe; this is the ANSI SQL
    // surface): the full 2×2 null grid, next to the plain `=` whose
    // NULL result motivates the operator.
    Q("sql_is_distinct_from",
      (s, _) => s.sql(sql("""
        SELECT a, b,
               a IS DISTINCT FROM b AS dist,
               a IS NOT DISTINCT FROM b AS not_dist,
               (a = b) IS NULL AS eq_is_null
        FROM VALUES (1, 1), (1, 2), (1, CAST(NULL AS INT)),
                    (CAST(NULL AS INT), CAST(NULL AS INT)) AS t(a, b)""")),
      Some(sql("""SELECT a, b,
                    a IS DISTINCT FROM b AS dist,
                    a IS NOT DISTINCT FROM b AS not_dist,
                    (a = b) IS NULL AS eq_is_null
                  FROM (VALUES (1, 1), (1, 2), (1, CAST(NULL AS INT)),
                               (CAST(NULL AS INT), CAST(NULL AS INT))) AS t(a, b)"""))),

    // SMOOTHED TARGET ENCODING — the leak-prone categorical feature a
    // training pipeline must compute IN SQL over the full history:
    // enc(cat) = (pos(cat) + α·prior) / (n(cat) + α), shrinking rare
    // categories toward the global rate. One grouped aggregate plus a
    // broadcast 1-row prior; integer micro-scaled output so the
    // double division is pinned to a floor, not a float compare.
    Q("ml_target_encoding",
      (s, d) => {
        val prior = table(s, d, "orders").agg(
          (sum(when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("prior"))
        table(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L)).as("np"))
          .crossJoin(broadcast(prior))
          .select(col("o_orderpriority"), col("n"), col("np"),
            expr("""CAST(floor(CAST(1000000.0 AS DOUBLE) * (np + 10.0 * prior)
                    / (n + 10)) AS BIGINT)""").as("enc_micro"))
      },
      Some(sql("""WITH p AS (SELECT CAST(sum(CASE WHEN o_orderstatus = 'F'
                                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS prior
                            FROM orders),
                  g AS (SELECT o_orderpriority, count(*) AS n,
                          CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                            AS BIGINT) AS np
                        FROM orders GROUP BY o_orderpriority)
                  SELECT o_orderpriority, n, np,
                    CAST(floor(CAST(1000000.0 AS DOUBLE) * (np + 10.0 * prior)
                      / (n + 10)) AS BIGINT) AS enc_micro
                  FROM g CROSS JOIN p""")))
  )
}
