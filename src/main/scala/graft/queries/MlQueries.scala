package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY module map `mllib` — the reference ships MLlib 1.3
  * (mllib/src/main/scala/org/apache/spark/mllib: regression/
  * LinearRegression, stat/Statistics.chiSqTest, feature/StandardScaler,
  * clustering/KMeans). The closed-form learners are re-expressed as
  * DataFrame aggregations so the DuckDB oracle can verify them exactly
  * (k-means lives in Pipeline2Queries as sim_kmeans_assign/centroids;
  * GraphX covers the graph side).
  *
  * Float determinism technique: sufficient statistics (Σx, Σy, Σxy, Σx²)
  * are accumulated in DECIMAL — exact and order-independent, so partial
  * aggregation cannot perturb them — then cast ONCE to double for the
  * closed-form solve, which is the same IEEE expression in both engines.
  *
  * Scale posture: each operator is one partial-aggregated pass (plus a
  * broadcast of K group rows for the scaler's per-row transform) — the
  * textbook shape for distributed sufficient-statistics learning.
  */
object MlQueries {

  val all: Seq[Q] = Seq(

    // Ordinary least squares y = a + b·x per group (mllib/regression):
    // slope/intercept from exact decimal sufficient statistics.
    Q("ml_linreg",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(18,6)")
        val y = col("l_extendedprice").cast("decimal(18,6)")
        table(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum((x * y).cast("decimal(38,12)")).cast("double").as("sxy"),
            sum((x * x).cast("decimal(38,12)")).cast("double").as("sxx"))
          .select(col("l_returnflag"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 6)
              .as("intercept"))
      },
      Some(sql("""SELECT l_returnflag, n,
                    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
                  FROM (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6))
                               * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
                          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6))
                               * CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
                        FROM lineitem GROUP BY l_returnflag)"""))),

    // Chi-square contingency cells (mllib/stat Statistics.chiSqTest's
    // observed/expected table) for source × lang: every cell value
    // derives from exact integer counts, so each row is bit-identical —
    // no cross-row float summation to perturb. The grand total joins in
    // as a broadcast 1-row aggregate (same shape as the oracle's CROSS
    // JOIN n), keeping the whole query one lazy plan — a driver-side
    // docs.count() would fire an extra scan at declaration time and bake
    // the total in as a literal.
    Q("ml_chi2_cells",
      (s, d) => {
        val docs = table(s, d, "documents")
        val cells = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
        val rowT = docs.groupBy(col("source")).agg(count(lit(1)).as("rt"))
        val colT = docs.groupBy(col("lang")).agg(count(lit(1)).as("ct"))
        val n = docs.agg(count(lit(1)).cast("double").as("n"))
        val e = col("rt") * col("ct") / col("n")
        cells.join(broadcast(rowT), Seq("source")).join(broadcast(colT), Seq("lang"))
          .crossJoin(broadcast(n))
          .select(col("source"), col("lang"), col("o"),
            round(e, 6).as("expected"),
            round(pow(col("o") - e, 2) / e, 6).as("contrib"))
      },
      Some(sql("""WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
                    FROM documents GROUP BY 1, 2),
                  rt AS (SELECT source, CAST(count(*) AS BIGINT) AS rt FROM documents GROUP BY 1),
                  ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS ct FROM documents GROUP BY 1),
                  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
                  SELECT source, lang, o,
                    round(rt * ct / n, 6) AS expected,
                    round(pow(o - rt * ct / n, 2) / (rt * ct / n), 6) AS contrib
                  FROM cells JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n"""))),

    // StandardScaler (mllib/feature): per-segment z-score of account
    // balance. Mean and (population) variance come from exact decimal
    // Σx / Σx², the per-row transform is a broadcast join of K group
    // rows back onto the scan.
    Q("ml_scaler",
      (s, d) => {
        val x = col("c_acctbal").cast("decimal(18,6)")
        val stats = table(s, d, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"),
            sum((x * x).cast("decimal(38,12)")).cast("double").as("sxx"))
          .select(col("c_mktsegment"), (col("sx") / col("n")).as("mean"),
            sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("std"))
        table(s, d, "customer")
          .join(broadcast(stats), Seq("c_mktsegment"))
          .select(col("c_custkey"), col("c_mktsegment"),
            round((col("c_acctbal") - col("mean")) / col("std"), 6).as("z"))
      },
      Some(sql("""WITH stats AS (
                    SELECT c_mktsegment,
                      sx / n AS mean,
                      sqrt(sxx / n - (sx / n) * (sx / n)) AS std
                    FROM (SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS n,
                            CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                            CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(19,6))
                                 * CAST(c_acctbal AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
                          FROM customer GROUP BY 1))
                  SELECT c_custkey, c_mktsegment,
                    round((c_acctbal - mean) / std, 6) AS z
                  FROM customer JOIN stats USING (c_mktsegment)"""))),

    // One ALS half-step (mllib/.../recommendation/ALS.scala:94): the
    // alternating shape with the ITEM factors held fixed at a closed-form
    // seed (rank 1, y_i = (i mod 7)+1), so the per-user update is the
    // regularized least squares x_u = Σ(r_ui·y_i) / (Σ y_i² + λ), λ=10 —
    // a pure DataFrame aggregation. This is exactly what one ALS
    // iteration computes per user block; the full algorithm alternates
    // the same solve between sides. Numerator/denominator accumulate in
    // DECIMAL (exact, order-independent) with ONE double division at the
    // end — the ml_linreg technique. Ratings: user = l_suppkey,
    // item = l_partkey mod 50, r = l_quantity.
    //
    // Scale posture: one partial-aggregated pass over the ratings — the
    // distributed normal-equations shape ALS runs per block.
    Q("ml_als_step",
      (s, d) => {
        val r = table(s, d, "lineitem").select(
          col("l_suppkey").as("user_id"),
          (col("l_partkey") % 50).as("item_id"),
          col("l_quantity").cast("decimal(18,6)").as("rating"))
        val y = ((col("item_id") % 7) + 1).cast("decimal(18,6)")
        r.withColumn("y", y)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_items"),
            sum((col("rating") * col("y")).cast("decimal(38,12)")).cast("double").as("num"),
            sum((col("y") * col("y")).cast("decimal(38,12)")).cast("double").as("den"))
          .select(col("user_id"), col("n_items"),
            round(col("num") / (col("den") + lit(10.0)), 6).as("x_u"))
      },
      Some(sql("""SELECT user_id, n_items, round(num / (den + 10.0), 6) AS x_u
                  FROM (SELECT l_suppkey AS user_id, count(*) AS n_items,
                          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6))
                               * CAST((l_partkey % 50) % 7 + 1 AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS num,
                          CAST(sum(CAST(CAST((l_partkey % 50) % 7 + 1 AS DECIMAL(19,6))
                               * CAST((l_partkey % 50) % 7 + 1 AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS den
                        FROM lineitem GROUP BY 1)""")))
  )
}
