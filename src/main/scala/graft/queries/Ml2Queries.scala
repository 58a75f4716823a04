package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 2 — the remaining learner SHAPES from the
  * reference's mllib/ tree (mllib/.../tree/DecisionTree.scala,
  * classification/NaiveBayes.scala, evaluation/BinaryClassification
  * Metrics.scala, recommendation/ALS.scala), each re-expressed as the
  * DataFrame aggregation the distributed algorithm actually runs per
  * step, with every statistic exact (integer counts / DECIMAL sums) so
  * the DuckDB oracle verifies bit-for-bit after one IEEE division.
  *
  * Scale posture: every query is one or two partial-aggregated passes
  * (plus broadcast joins of K-row models) — the sufficient-statistics
  * shape that lets these learners run on 1000 executors.
  */
object Ml2Queries {

  val all: Seq[Q] = Seq(

    // One decision-tree split search (mllib/.../tree/DecisionTree.scala's
    // per-node best-split step): binary label = (c_acctbal > 0), numeric
    // feature = c_nationkey, 4 candidate thresholds evaluated in ONE
    // partial-aggregated pass (each row contributes to every threshold's
    // left/right counts via an exploded threshold column). The weighted
    // Gini impurity is a ratio of exact integer counts:
    //   score(t) = (nL² − l0² − l1²)/(n·nL) + (nR² − r0² − r1²)/(n·nR).
    Q("ml_tree_split",
      (s, d) => {
        val thresholds = Seq(5, 10, 15, 20)
        val rows = table(s, d, "customer")
          .select(col("c_nationkey").cast("long").as("x"),
            (col("c_acctbal") > 0).cast("long").as("y"))
          .select(col("x"), col("y"), explode(array(thresholds.map(lit): _*)).as("t"))
        val agg = rows.groupBy(col("t"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("x") <= col("t") && col("y") === 0, 1L).otherwise(0L)).as("l0"),
            sum(when(col("x") <= col("t") && col("y") === 1, 1L).otherwise(0L)).as("l1"),
            sum(when(col("x") > col("t") && col("y") === 0, 1L).otherwise(0L)).as("r0"),
            sum(when(col("x") > col("t") && col("y") === 1, 1L).otherwise(0L)).as("r1"))
        val nL = col("l0") + col("l1")
        val nR = col("r0") + col("r1")
        val score = (nL * nL - col("l0") * col("l0") - col("l1") * col("l1"))
          .cast("double") / (col("n") * nL).cast("double") +
          (nR * nR - col("r0") * col("r0") - col("r1") * col("r1"))
            .cast("double") / (col("n") * nR).cast("double")
        val scored = agg.select(col("t"), col("l0"), col("l1"), col("r0"), col("r1"),
          round(score, 6).as("gini"))
        // best-split flag via a broadcast 1-row min — not a global window
        scored.crossJoin(broadcast(scored.agg(min(col("gini")).as("g_min"))))
          .select(col("t"), col("l0"), col("l1"), col("r0"), col("r1"), col("gini"),
            (col("gini") === col("g_min")).as("best"))
      },
      Some(sql("""WITH agg AS (
                    SELECT t, count(*) AS n,
                      CAST(sum(CASE WHEN x <= t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l0,
                      CAST(sum(CASE WHEN x <= t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
                      CAST(sum(CASE WHEN x > t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r0,
                      CAST(sum(CASE WHEN x > t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1
                    FROM (SELECT c_nationkey AS x,
                            CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y,
                            unnest([5, 10, 15, 20]) AS t
                          FROM customer)
                    GROUP BY t),
                  scored AS (
                    SELECT t, l0, l1, r0, r1,
                      round(
                        CAST((l0+l1)*(l0+l1) - l0*l0 - l1*l1 AS DOUBLE)
                          / CAST(n*(l0+l1) AS DOUBLE)
                        + CAST((r0+r1)*(r0+r1) - r0*r0 - r1*r1 AS DOUBLE)
                          / CAST(n*(r0+r1) AS DOUBLE), 6) AS gini
                    FROM agg)
                  SELECT t, l0, l1, r0, r1, gini,
                    gini = min(gini) OVER () AS best
                  FROM scored"""))),

    // Naive Bayes fit (mllib/.../classification/NaiveBayes.scala): class
    // = lang, feature = source. The trained model IS the count table —
    // Laplace-smoothed conditionals p(source|lang) = (c+1)/(n_l + S) and
    // priors (n_l+1)/(N+L), with S/L/N joined in as broadcast 1-row
    // aggregates (lazy, no driver-side count).
    Q("ml_nb_fit",
      (s, d) => {
        val docs = table(s, d, "documents")
        val cell = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
        val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
        val totals = docs.agg(count(lit(1)).as("n_total"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"))
        cell.join(broadcast(perLang), Seq("lang")).crossJoin(broadcast(totals))
          .select(col("lang"), col("source"), col("c"),
            round((col("c") + 1).cast("double") / (col("n_l") + col("n_sources")), 6)
              .as("p_cond"),
            round((col("n_l") + 1).cast("double") / (col("n_total") + col("n_langs")), 6)
              .as("p_prior"))
      },
      Some(sql("""WITH cell AS (SELECT lang, source, count(*) AS c
                    FROM documents GROUP BY 1, 2),
                  pl AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
                  tot AS (SELECT count(*) AS n_total,
                            count(DISTINCT source) AS n_sources,
                            count(DISTINCT lang) AS n_langs
                          FROM documents)
                  SELECT lang, source, c,
                    round(CAST(c + 1 AS DOUBLE) / (n_l + n_sources), 6) AS p_cond,
                    round(CAST(n_l + 1 AS DOUBLE) / (n_total + n_langs), 6) AS p_prior
                  FROM cell JOIN pl USING (lang) CROSS JOIN tot"""))),

    // Rank-based AUC (mllib/.../evaluation/BinaryClassificationMetrics
    // .scala) per priority group: positives = status 'F', score =
    // o_totalprice. Mann-Whitney with PROPER tie handling via average
    // ranks ar = (#rows below) + (|tie group| + 1)/2, then
    // AUC = (Σ_pos ar − P(P+1)/2)/(P·N); tie adjustments are halves, so
    // Σ is exact in double; one division. Scale posture: rows collapse to
    // (priority, price) TIE GROUPS first (partial agg, key grows with the
    // corpus), and the prefix sum over tie groups is two bounded windows —
    // within (priority, floor(price)) buckets (≤100 cent-distinct prices
    // per bucket) plus a cross-bucket offset cumsum whose partition size
    // is the price DOMAIN, not the corpus. No window partition here grows
    // with N/|priorities| the way a per-priority rank() would.
    Q("ml_auc",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val groups = table(s, d, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"),
            (col("o_orderstatus") === "F").cast("long").as("pos"))
          .groupBy(col("o_orderpriority"), col("o_totalprice"))
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("pc"))
          .withColumn("bucket", floor(col("o_totalprice")))
        val bucketOff = groups
          .groupBy(col("o_orderpriority"), col("bucket"))
          .agg(sum(col("cnt")).as("bcnt"))
          .withColumn("boff",
            coalesce(sum(col("bcnt")).over(
              W.partitionBy(col("o_orderpriority")).orderBy(col("bucket"))
                .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
          .drop("bcnt")
        val ar = groups
          .withColumn("woff",
            coalesce(sum(col("cnt")).over(
              W.partitionBy(col("o_orderpriority"), col("bucket"))
                .orderBy(col("o_totalprice"))
                .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
          .join(bucketOff, Seq("o_orderpriority", "bucket"))
          .withColumn("ar", (col("boff") + col("woff")).cast("double")
            + (col("cnt") + 1) / 2.0)
        ar.groupBy(col("o_orderpriority"))
          .agg(sum(col("pc")).as("p"),
            sum(col("cnt") - col("pc")).as("n"),
            sum(col("pc") * col("ar")).as("sum_ar"))
          .select(col("o_orderpriority"), col("p"), col("n"),
            round((col("sum_ar") - col("p") * (col("p") + 1) / 2.0)
              / (col("p") * col("n")).cast("double"), 6).as("auc"))
      },
      Some(sql("""WITH ranked AS (
                    SELECT o_orderpriority,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
                      rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
                        + (count(*) OVER (PARTITION BY o_orderpriority, o_totalprice) - 1) / 2.0
                        AS ar
                    FROM orders)
                  SELECT o_orderpriority,
                    CAST(sum(pos) AS BIGINT) AS p,
                    CAST(sum(1 - pos) AS BIGINT) AS n,
                    round((sum(CASE WHEN pos = 1 THEN ar ELSE 0 END)
                           - sum(pos) * (sum(pos) + 1) / 2.0)
                          / CAST(sum(pos) * sum(1 - pos) AS DOUBLE), 6) AS auc
                  FROM ranked GROUP BY 1"""))),

    // TWO alternating ALS half-steps (mllib/.../recommendation/ALS
    // .scala:94 — the actual alternation): first solve users against the
    // fixed item seed (the ml_als_step solve), round the user factors to
    // DECIMAL(18,6) — exactly representable, so the SECOND half-step's
    // sufficient statistics Σ(r·x_u) and Σ(x_u²) are again exact — then
    // solve items against those user factors. Proves the alternating
    // structure end-to-end with one IEEE division per solve.
    Q("ml_als_alternate",
      (s, d) => {
        val r = table(s, d, "lineitem").select(
          col("l_suppkey").as("user_id"),
          (col("l_partkey") % 50).as("item_id"),
          col("l_quantity").cast("decimal(18,6)").as("rating"))
        val y = ((col("item_id") % 7) + 1).cast("decimal(18,6)")
        val users = r.withColumn("y", y)
          .groupBy(col("user_id"))
          .agg(sum((col("rating") * col("y")).cast("decimal(38,12)")).cast("double").as("num"),
            sum((col("y") * col("y")).cast("decimal(38,12)")).cast("double").as("den"))
          .select(col("user_id"),
            round(col("num") / (col("den") + lit(10.0)), 6)
              .cast("decimal(18,6)").as("x_u"))
        r.join(broadcast(users), Seq("user_id"))
          .groupBy(col("item_id"))
          .agg(count(lit(1)).as("n_users"),
            sum((col("rating") * col("x_u")).cast("decimal(38,12)")).cast("double").as("num"),
            sum((col("x_u") * col("x_u")).cast("decimal(38,12)")).cast("double").as("den"))
          .select(col("item_id"), col("n_users"),
            round(col("num") / (col("den") + lit(10.0)), 6).as("y_new"))
      },
      Some(sql("""WITH r AS (SELECT l_suppkey AS user_id,
                               l_partkey % 50 AS item_id,
                               CAST(l_quantity AS DECIMAL(19,6)) AS rating,
                               CAST((l_partkey % 50) % 7 + 1 AS DECIMAL(19,6)) AS y
                             FROM lineitem),
                  users AS (
                    SELECT user_id,
                      CAST(round(
                        CAST(sum(CAST(rating * y AS DECIMAL(38,12))) AS DOUBLE)
                        / (CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) + 10.0),
                        6) AS DECIMAL(19,6)) AS x_u
                    FROM r GROUP BY 1)
                  SELECT item_id, count(*) AS n_users,
                    round(
                      CAST(sum(CAST(rating * x_u AS DECIMAL(38,12))) AS DOUBLE)
                      / (CAST(sum(CAST(x_u * x_u AS DECIMAL(38,12))) AS DOUBLE) + 10.0),
                      6) AS y_new
                  FROM r JOIN users USING (user_id) GROUP BY 1""")))
  )
}
