package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.4 — hash aggregation + every aggregate expression in the
  * reference (catalyst/expressions/aggregates.scala: Min:93 Max:124
  * Count:155 CountDistinct:169 ApproxCountDistinct:275 Average:294 Sum:337
  * SumDistinct:371 First:437 Last:451) plus grouping sets / cube / rollup
  * (catalyst logical GroupingSets:212 Cube:231 Rollup:250 → Expand) and the
  * beyond-reference statistical aggregates (stddev/var/corr/covar/
  * percentile — RDD-side only in 1.3, DoubleRDDFunctions.scala:41-52).
  *
  * Scale posture: all aggregations are partial (map-side combine) before
  * the single exchange on the grouping key — Catalyst does this split
  * automatically (the reference needed PartialAggregation,
  * catalyst/planning/patterns.scala:124). First/Last are restated as
  * min_by/max_by with a unique ordering key for determinism.
  */
object AggQueries {

  val all: Seq[Q] = Seq(

    // The BDB-1a analog flagship scan-agg (bench q1).
    //
    // r18 (lint half #4 sweep): every FP-accumulated exposure is rounded
    // IDENTICALLY on both sides — the raw double sums/avgs are functions
    // of accumulation order (the r17 jn_nullsafe_sumdbl flake class).
    // Scale per column's intrinsic decimals, so the true value sits ON
    // the rounding grid (half a step from any boundary): qty integral →
    // 2dp; prices 2dp → 2dp; price·(1−disc) products carry 4 decimals →
    // 4dp; averages are generic rationals → 6dp.
    Q("q1_agg", bench = true,
      fn = (s, d) => table(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      oracle = Some(sql("""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
                  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
                  GROUP BY l_returnflag, l_linestatus"""))),

    // Min / Max / global aggregate (no grouping → GlobalAggregates path).
    Q("agg_min_max_global",
      (s, d) => table(s, d, "lineitem").agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        count(lit(1)).as("n")),
      Some(sql("""SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                   min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
                   count(*) AS n FROM lineitem"""))),

    // Exact COUNT(DISTINCT …) incl. multi-argument form
    // (CountDistinct, aggregates.scala:169 — OpenHashSet-backed in 1.3;
    // modern Spark plans it as two-phase hash agg, spill-safe).
    Q("agg_count_distinct",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_part_supp"),
          count(lit(1)).as("n")),
      Some(sql("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
                   count(DISTINCT (l_partkey, l_suppkey)) AS nd_part_supp,
                   count(*) AS n
                  FROM lineitem GROUP BY l_returnflag"""))),

    // SUM(DISTINCT) (aggregates.scala:371). Quantities are integral
    // doubles (exact in FP), but the exposure is rounded anyway — lint
    // half #4 is mechanical, and round(exact, 2) is the identity.
    Q("agg_sum_distinct",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty")),
      Some(sql("""SELECT l_linestatus, round(sum(DISTINCT l_quantity), 2) AS sum_dist_qty
                  FROM lineitem GROUP BY l_linestatus"""))),

    // First/Last (aggregates.scala:437/:451) restated deterministically as
    // min_by/max_by over the unique o_orderkey.
    Q("agg_first_last",
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
          min(col("o_orderkey")).as("first_key"),
          max(col("o_orderkey")).as("last_key")),
      Some(sql("""SELECT o_orderpriority,
                   min_by(o_totalprice, o_orderkey) AS first_price,
                   max_by(o_totalprice, o_orderkey) AS last_price,
                   min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
                  FROM orders GROUP BY o_orderpriority"""))),

    // ApproxCountDistinct (aggregates.scala:275, HLL) — different HLL
    // lineages can't hash-match, so the ORACLED contract is an accuracy
    // bound emitted as a boolean next to the exact count; the oracle
    // computes the exact count and asserts the bound trivially holds
    // (true). r18: the sketch runs at rsd=0.01 while the asserted bound
    // stays 0.05 — a 5σ margin; at rsd=0.05 the same bound was 1σ, a
    // knife-edge for a DETERMINISTIC estimator over any future corpus
    // (the class the 3× fixture caught on the rdd_* HLL rows).
    Q("agg_approx_count_distinct",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_nd"),
          countDistinct(col("l_partkey")).as("exact_nd"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")) / col("exact_nd") < 0.05)
            .as("within_tol")),
      Some(sql("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_nd,
                   true AS within_tol
                  FROM lineitem GROUP BY l_returnflag"""))),

    // DataSketches HLL (beyond-reference; Spark 3.5+ hll_sketch_agg /
    // hll_union_agg / hll_sketch_estimate): the MERGEABLE-sketch
    // contract that matters at 100 TB — per-group sketches built in one
    // partial-agg pass, then UNIONED into a global estimate without
    // touching the rows again (the re-aggregation a plain
    // approx_count_distinct cannot do). Estimates are
    // sketch-implementation-specific, so the oracled contract is the
    // tolerance bound next to the exact count, per group AND for the
    // union row.
    Q("agg_hll_union",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val grouped = li.groupBy(col("l_returnflag"))
          .agg(hll_sketch_agg(col("l_orderkey")).as("sk"),
            countDistinct(col("l_orderkey")).as("n_exact"))
        val per = grouped.select(col("l_returnflag").as("key"), col("n_exact"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_exact"))
            <= col("n_exact") * 0.05).as("within_tol"))
        val unionEst = grouped
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val globalExact = li.agg(countDistinct(col("l_orderkey")).as("n_exact"))
        per.unionByName(globalExact.crossJoin(broadcast(unionEst))
          .select(lit("__ALL__").as("key"), col("n_exact"),
            (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
              .as("within_tol")))
      },
      Some(sql("""SELECT l_returnflag AS key,
                    count(DISTINCT l_orderkey) AS n_exact, true AS within_tol
                  FROM lineitem GROUP BY 1
                  UNION ALL
                  SELECT '__ALL__', count(DISTINCT l_orderkey), true
                  FROM lineitem"""))),

    // Average widening + HAVING (UnresolvedHavingClauseAttributes path).
    // r18 lint half #4: the exposed 2dp-price sum is rounded both sides.
    Q("agg_having",
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"), count(lit(1)).as("n"))
        .filter(col("n") >= 3),
      Some(sql("""SELECT o_custkey, round(sum(o_totalprice), 2) AS spend, count(*) AS n
                  FROM orders GROUP BY o_custkey HAVING count(*) >= 3"""))),

    // ROLLUP (logical Rollup:250 → Expand) with grouping() flags.
    // r18 lint half #4: rounded both sides (4dp like the sibling rows).
    Q("agg_rollup",
      (s, d) => table(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls")),
      Some(sql("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty,
                   count(*) AS n,
                   CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                   CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
                  FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))),

    // CUBE (logical Cube:231).
    Q("agg_cube",
      (s, d) => table(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice")), 4).as("total"), count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_st"),
          grouping(col("o_orderpriority")).cast("long").as("g_pr")),
      Some(sql("""SELECT o_orderstatus, o_orderpriority,
                   round(sum(o_totalprice), 4) AS total, count(*) AS n,
                   CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
                   CAST(grouping(o_orderpriority) AS BIGINT) AS g_pr
                  FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""))),

    // GROUPING SETS (logical GroupingSets:212; HiveQl.scala:727 parse path).
    // r18 lint half #4: rounded both sides (4dp like the sibling rows).
    Q("agg_grouping_sets",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li_gs")
        s.sql(sql("""SELECT l_returnflag, l_linestatus,
                      round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
                     FROM graft_li_gs
                     GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                       (l_returnflag, l_linestatus))"""))
      },
      Some(sql("""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
                  FROM lineitem
                  GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                    (l_returnflag, l_linestatus))"""))),

    // Dataset.groupingSets(...) — the Spark 4.0 DATAFRAME API spelling
    // of GROUPING SETS (agg_grouping_sets is the SQL form): the same
    // three sets declared as Column sequences, plus grouping() flags to
    // disambiguate real NULL keys from subtotal rows.
    Q("agg_grouping_sets_api",
      (s, d) => table(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")),
            Seq(col("l_returnflag"), col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls")),
      Some(sql("""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty, count(*) AS n,
                   CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                   CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
                  FROM lineitem
                  GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                    (l_returnflag, l_linestatus))"""))),

    // Beyond-reference statistical aggregates (1.3 exposed these only on
    // RDD[Double]: DoubleRDDFunctions stats/mean/variance/stdev).
    // ANSI ordered-set percentiles (Spark 3.4's percentile_cont /
    // percentile_disc WITHIN GROUP) next to the Hive-style exact
    // percentile() agg_percentile already pins: CONT interpolates
    // linearly between adjacent order statistics, DISC returns the
    // first value at-or-above the cumulative fraction. DuckDB twins:
    // quantile_cont / quantile_disc.
    Q("agg_percentile_cont",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_pc")
        s.sql(sql("""
          SELECT o_orderstatus,
                 round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
                   AS p50_cont,
                 round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4)
                   AS p90_cont,
                 round(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
                   AS p50_disc
          FROM graft_o_pc GROUP BY o_orderstatus"""))
      },
      Some(sql("""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50_cont,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_cont,
               round(quantile_disc(o_totalprice, 0.5), 4) AS p50_disc
        FROM orders GROUP BY o_orderstatus"""))),

    // FILTER (WHERE …) clause on aggregates (ANSI; Spark 3.0): three
    // differently-filtered aggregates in ONE grouped pass — the
    // pivot-free spelling of conditional aggregation (vs the CASE WHEN
    // golden idiom, which sql_stress_pivot already crosses).
    Q("agg_filter_clause",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_fc")
        s.sql(sql("""
          SELECT o_orderstatus,
                 count(*) AS n_all,
                 count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                 round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4)
                   AS urgent_total,
                 CAST(max(o_custkey) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT)
                   AS max_even_cust
          FROM graft_o_fc GROUP BY o_orderstatus"""))
      },
      Some(sql("""
        SELECT o_orderstatus,
               count(*) AS n_all,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4)
                 AS urgent_total,
               CAST(max(o_custkey) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT)
                 AS max_even_cust
        FROM orders GROUP BY o_orderstatus"""))),

    // Linear-regression aggregate family (Spark 3.3's ANSI regr_*;
    // DuckDB ships the same set): slope, intercept, r², count, and
    // mean-of-x per return flag — the one-pass sufficient-statistics
    // aggregates an analyst reaches for before any ML library.
    Q("agg_regr",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li_rg")
        s.sql(sql("""
          SELECT l_returnflag,
                 round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
                 round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
                 round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
                 CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
                 round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx
          FROM graft_li_rg GROUP BY l_returnflag"""))
      },
      Some(sql("""
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
               round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx
        FROM lineitem GROUP BY l_returnflag"""))),

    // width_bucket equi-width histogram (Spark 3.1's ANSI function):
    // 12 buckets over [0, 600k) plus the underflow (0) / overflow (13)
    // buckets. DuckDB has no width_bucket, so the oracle restates the
    // DEFINITION with floor arithmetic — bucket width 600000/12 = 50000
    // is exactly representable and no order price sits on a boundary
    // multiple (checked at every SF), so the floors agree bit-for-bit.
    Q("agg_width_bucket",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_wb")
        s.sql(sql("""
          SELECT CAST(width_bucket(o_totalprice, 0, 600000, 12) AS BIGINT) AS bkt,
                 count(*) AS n,
                 round(min(o_totalprice), 4) AS lo,
                 round(max(o_totalprice), 4) AS hi
          FROM graft_o_wb GROUP BY 1"""))
      },
      Some(sql("""
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 600000 THEN 13
                         ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bkt,
               count(*) AS n,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM orders GROUP BY 1"""))),

    Q("agg_stats",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(avg(col("l_extendedprice")), 4).as("mean_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_extendedprice")), 2).as("var_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price")),
      // Fixed-scale rounding on BOTH sides: Spark's partial-merge
      // accumulation order and DuckDB's single-pass differ in the last
      // double ulps; round(…, k) makes the contract portable (the same
      // policy rdd_tree_aggregate uses).
      Some(sql("""SELECT l_returnflag,
                   round(avg(l_extendedprice), 4) AS mean_price,
                   round(stddev_samp(l_extendedprice), 4) AS sd_price,
                   round(var_samp(l_extendedprice), 2) AS var_price,
                   round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
                  FROM lineitem GROUP BY l_returnflag"""))),

    // Exact percentile / median (beyond-reference; Hive-UDAF-only in 1.3).
    Q("agg_percentile",
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90")),
      Some(sql("""SELECT o_orderstatus,
                   quantile_cont(o_totalprice, 0.5) AS p50,
                   quantile_cont(o_totalprice, 0.9) AS p90
                  FROM orders GROUP BY o_orderstatus"""))),

    // percentile_approx (t-digest sketch) — sketch outputs are
    // engine-specific, so the ORACLED contract is the accuracy bound:
    // the approx p50 must land within 5% of the exact p50 (true at
    // accuracy=10000), emitted as a boolean next to the rounded exact value.
    Q("agg_percentile_approx",
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_approx"),
          expr("percentile(o_totalprice, 0.5)").as("p50_exact"))
        .select(col("o_orderstatus"),
          round(col("p50_exact"), 4).as("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") < 0.05)
            .as("within_tol")),
      Some(sql("""SELECT o_orderstatus,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
                   true AS within_tol
                  FROM orders GROUP BY o_orderstatus"""))),

    // Boolean aggregates: count_if + bool_and/bool_or (ANSI every/any).
    Q("agg_bool",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count_if(col("l_quantity") > 25.0).as("n_big"),
          bool_and(col("l_quantity") > 0.0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc")),
      Some(sql("""SELECT l_returnflag,
                   CAST(count_if(l_quantity > 25.0) AS BIGINT) AS n_big,
                   bool_and(l_quantity > 0.0) AS all_positive,
                   bool_or(l_discount > 0.09) AS any_big_disc
                  FROM lineitem GROUP BY l_returnflag"""))),

    // Bitwise aggregates (bit_and/bit_or/bit_xor) — exact integer results.
    Q("agg_bitwise",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bit_and(col("l_orderkey")).as("band"),
          bit_or(col("l_orderkey")).as("bor"),
          bit_xor(col("l_orderkey")).as("bxor")),
      Some(sql("""SELECT l_returnflag, bit_and(l_orderkey) AS band,
                   bit_or(l_orderkey) AS bor, bit_xor(l_orderkey) AS bxor
                  FROM lineitem GROUP BY l_returnflag"""))),

    // mode() (beyond-reference, Spark 3.4+). Among tied counts both
    // engines pick arbitrarily, so the ORACLED output is the
    // DETERMINISTIC mode (highest count, then smallest value) plus a
    // boolean asserting the native mode() hits the same top count.
    Q("agg_mode",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
        val det = counts.groupBy(col("l_returnflag"))
          .agg(max(col("cnt")).as("max_cnt"),
            max_by(col("l_quantity"), struct(col("cnt"), (-col("l_quantity")).as("nq")))
              .as("det_mode"))
        val native = li.groupBy(col("l_returnflag"))
          .agg(mode(col("l_quantity")).as("native_mode"))
        det.join(native, "l_returnflag")
          .join(counts.withColumnRenamed("l_quantity", "native_mode"), Seq("l_returnflag", "native_mode"))
          .select(col("l_returnflag"), col("det_mode"),
            (col("cnt") === col("max_cnt")).as("native_is_a_mode"))
      },
      Some(sql("""WITH counts AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
                                  FROM lineitem GROUP BY 1, 2)
                  SELECT l_returnflag, l_quantity AS det_mode, true AS native_is_a_mode
                  FROM (SELECT l_returnflag, l_quantity,
                          row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity ASC) AS rn
                        FROM counts)
                  WHERE rn = 1"""))),

    // collect_list/collect_set parity (Hive-bridge-only in 1.3) — sorted for
    // determinism, then joined to a flat string: the harness's tabular
    // checker can't order list-valued cells, so both sides emit the same
    // '|'-delimited rendering.
    Q("agg_collect",
      (s, d) => table(s, d, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(
          array_join(sort_array(collect_list(col("s_name"))), "|").as("names"),
          array_join(transform(sort_array(collect_set(col("s_suppkey"))),
            x => x.cast("string")), "|").as("keys")),
      Some(sql("""SELECT s_nationkey,
                   array_to_string(list_sort(list(s_name)), '|') AS names,
                   array_to_string(list_sort(list(DISTINCT s_suppkey)), '|') AS keys
                  FROM supplier GROUP BY s_nationkey"""))),

    // beyond-ref: histogram_numeric — the streaming one-pass equi-depth
    // histogram (Greenwald/Khanna-style bin merging). Bin BOUNDARIES
    // depend on merge order, so the oracle pins the order-independent
    // contract instead: exactly nBins bins, bin counts sum to the row
    // count, centroids sorted and inside [min, max]. At 100 TB this is
    // THE distribution profile you can afford: one scan, O(nBins) state
    // per partition, partial/merge aggregation.
    Q("agg_histogram_numeric",
      (s, d) => table(s, d, "orders")
        .agg(expr("histogram_numeric(o_totalprice, 10)").as("h"),
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
        .select(
          size(col("h")).as("n_bins"),
          round(expr("aggregate(h, 0D, (acc, b) -> acc + b.y)")).cast("long")
            .as("total_y"),
          expr("forall(h, b -> b.x >= mn AND b.x <= mx)").as("x_within_bounds"),
          (transform(col("h"), b => b.getField("x")) ===
            array_sort(transform(col("h"), b => b.getField("x")))).as("x_sorted")),
      Some(sql("""SELECT CAST(10 AS INT) AS n_bins, count(*) AS total_y,
                   TRUE AS x_within_bounds, TRUE AS x_sorted
                  FROM orders"""))),

    // beyond-ref: count_min_sketch — the mergeable heavy-hitter
    // frequency sketch (Cormode/Muthukrishnan). One scan builds a
    // w×d integer grid (eps 0.001 → 2000×5 cells, ~80 KB) that answers
    // point-frequency queries with one-sided error: est ≥ true, and
    // est ≤ true + eps·N with probability ≥ confidence. The sketch row
    // broadcasts onto the probe keys; the UDF deserializes per probe
    // row (5 rows — not a hot path). Seeded, so the estimates replay.
    Q("agg_count_min",
      (s, d) => {
        val est = udf((bytes: Array[Byte], key: Long) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key))
        val sk = table(s, d, "orders")
          .agg(expr("count_min_sketch(o_custkey, 0.001d, 0.99d, 42)").as("sk"),
            count(lit(1)).as("total"))
        table(s, d, "orders")
          .filter(col("o_custkey") <= 5)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_exact"))
          .crossJoin(broadcast(sk))
          .select(col("o_custkey"), col("n_exact"),
            (est(col("sk"), col("o_custkey")) >= col("n_exact")).as("est_ge_exact"),
            (est(col("sk"), col("o_custkey")) <=
              col("n_exact") + ceil(col("total") * 0.001).cast("long"))
              .as("est_le_bound"))
      },
      Some(sql("""SELECT o_custkey, count(*) AS n_exact,
                   TRUE AS est_ge_exact, TRUE AS est_le_bound
                  FROM orders WHERE o_custkey <= 5 GROUP BY o_custkey"""))),

    // beyond-ref: higher central moments — skewness (population g1 =
    // √n·M3/M2^1.5) and EXCESS kurtosis (n·M4/M2² − 3), the
    // distribution-shape pair on top of agg_stats' mean/var. Spark
    // computes them by streaming moment updates; the oracle rebuilds
    // the same population definitions from exact integer power sums
    // (quantities are integral, Σx⁴ < 2^53), agreeing well inside the
    // 6-decimal float protocol.
    Q("agg_skew_kurt",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(skewness(col("l_quantity")), 6).as("skew"),
          round(kurtosis(col("l_quantity")), 6).as("kurt")),
      Some(sql("""WITH s AS (SELECT l_returnflag, count(*) AS n,
                    sum(l_quantity) AS s1,
                    sum(l_quantity * l_quantity) AS s2,
                    sum(l_quantity * l_quantity * l_quantity) AS s3,
                    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
                  FROM lineitem GROUP BY l_returnflag),
                m AS (SELECT l_returnflag, n,
                        s2 - s1 * s1 / n AS m2,
                        s3 - 3 * (s1 / n) * s2 + 2 * n * power(s1 / n, 3) AS m3,
                        s4 - 4 * (s1 / n) * s3 + 6 * power(s1 / n, 2) * s2
                          - 3 * n * power(s1 / n, 4) AS m4
                      FROM s)
                SELECT l_returnflag, n,
                  round(sqrt(CAST(n AS DOUBLE)) * m3 / power(m2, 1.5), 6) AS skew,
                  round(n * m4 / (m2 * m2) - 3, 6) AS kurt
                FROM m"""))),

    // beyond-ref: PRODUCT aggregate in the log domain — Spark has no
    // product(), and a naive fold would overflow immediately; exp(Σln x)
    // is the scale answer (one partial-aggregable sum). Pinned on the
    // LOG-domain sum itself (rounded) plus the recovered product of a
    // bounded slice — the geometric-mean shape every perplexity/
    // likelihood aggregation uses (cf. text_lm_perplexity).
    Q("agg_product_logdomain",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_quantity") > 0.0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(log(col("l_quantity"))), 6).as("log_sum"),
          round(exp(avg(log(col("l_quantity")))), 6).as("geo_mean")),
      Some(sql("""SELECT l_returnflag, count(*) AS n,
                    round(sum(ln(l_quantity)), 6) AS log_sum,
                    round(exp(avg(ln(l_quantity))), 6) AS geo_mean
                  FROM lineitem WHERE l_quantity > 0.0
                  GROUP BY l_returnflag"""))),

    // beyond-ref: MEDIAN AS A WINDOW FUNCTION — the per-group exact
    // median attached to every row (the anomaly-score denominator
    // pattern: |x − median| / median). Unbounded partition frame over
    // the priority groups; interpolated median agrees between engines
    // at round-4.
    Q("win_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(median(col("o_totalprice")).over(w), 4).as("grp_median"),
            (col("o_totalprice") >
              median(col("o_totalprice")).over(w)).as("above_median"))
      },
      Some(sql("""SELECT o_orderkey, o_orderpriority,
                    round(median(o_totalprice) OVER (PARTITION BY o_orderpriority), 4)
                      AS grp_median,
                    o_totalprice > median(o_totalprice)
                      OVER (PARTITION BY o_orderpriority) AS above_median
                  FROM orders"""))),

    // beyond-ref: GINI COEFFICIENT of per-customer spend — the
    // concentration index (how unequal is engagement/revenue across
    // users, the whale-detection number). Exact integer cents, the
    // sorted-rank closed form G = (2·Σ i·x_i)/(n·Σx) − (n+1)/n over
    // the BOUNDED per-customer aggregate (1.5k rows — the ml_gains
    // global-rank pattern, not a corpus window); micro-scaled.
    Q("agg_gini",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val spend = table(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
        val ranked = spend.select(col("cents"),
          row_number().over(Window.orderBy(col("cents"), col("o_custkey"))).as("i"))
        ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"),
            sum(col("i") * col("cents")).as("iw"))
          .select(col("n"),
            expr("""CAST(floor(1000000.0 * (2.0 * iw / (CAST(n AS DOUBLE) * tot)
                    - (n + 1.0) / n)) AS BIGINT)""").as("gini_micro"))
      },
      Some(sql("""WITH spend AS (SELECT o_custkey,
                      CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                        AS cents
                    FROM orders GROUP BY o_custkey),
                  r AS (SELECT cents,
                      row_number() OVER (ORDER BY cents, o_custkey) AS i
                    FROM spend),
                  a AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS tot,
                      CAST(sum(i * cents) AS BIGINT) AS iw FROM r)
                  SELECT n,
                    CAST(floor(1000000.0 * (2.0 * iw / (CAST(n AS DOUBLE) * tot)
                      - (n + 1.0) / n)) AS BIGINT) AS gini_micro
                  FROM a"""))),

    // beyond-ref: SHANNON ENTROPY of a categorical distribution (event
    // mix) in bits — the concentration/diversity dial for corpus
    // source mixes; exact counts → closed-form log2 terms, micro-scaled.
    Q("agg_entropy",
      (s, d) => table(s, d, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(
          table(s, d, "events").agg(count(lit(1)).as("n"))))
        .agg(
          expr("""CAST(floor(1000000.0 *
                  sum((CAST(c AS DOUBLE) / n) * (ln(CAST(n AS DOUBLE) / c) / ln(2.0))) + 0.5)
                  AS BIGINT)""").as("entropy_mbits"),
          count(lit(1)).as("n_types")),
      Some(sql("""WITH g AS (SELECT event_type, count(*) AS c FROM events GROUP BY 1),
                  t AS (SELECT count(*) AS n FROM events)
                  SELECT CAST(floor(1000000.0 *
                      sum((CAST(c AS DOUBLE) / n) * (ln(CAST(n AS DOUBLE) / c) / ln(2.0))) + 0.5)
                      AS BIGINT) AS entropy_mbits,
                    count(*) AS n_types
                  FROM g CROSS JOIN t"""))),

    // beyond-ref: WEIGHTED MEDIAN — the 50%-of-mass crossing point
    // (here: the price below which half the shipped QUANTITY sits, per
    // return flag), the robust weighted-center every skewed-spend
    // report wants. Closed form over cumulative integer weights on the
    // bounded (flag, price) grid; first price whose running weight
    // reaches half the total, ties to the smaller price.
    Q("agg_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = table(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(sum(round(col("l_quantity") * 100.0).cast("long")).as("wt"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = g.groupBy(col("l_returnflag")).agg(sum(col("wt")).as("tot"))
        g.select(col("l_returnflag"), col("l_extendedprice"),
            sum(col("wt")).over(w).as("cum"))
          .join(broadcast(tot), Seq("l_returnflag"))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy(col("l_returnflag"))
          .agg(min(col("l_extendedprice")).as("weighted_median_price"))
      },
      Some(sql("""WITH g AS (SELECT l_returnflag, l_extendedprice,
                      CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS wt
                    FROM lineitem GROUP BY 1, 2),
                  c AS (SELECT l_returnflag, l_extendedprice,
                      CAST(sum(wt) OVER (PARTITION BY l_returnflag
                        ORDER BY l_extendedprice ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                    FROM g),
                  t AS (SELECT l_returnflag, CAST(sum(wt) AS BIGINT) AS tot
                        FROM g GROUP BY 1)
                  SELECT c.l_returnflag, min(l_extendedprice) AS weighted_median_price
                  FROM c JOIN t ON c.l_returnflag = t.l_returnflag
                  WHERE cum * 2 >= tot
                  GROUP BY c.l_returnflag"""))),

    // beyond-ref: HERFINDAHL-HIRSCHMAN INDEX — Σ share² of revenue by
    // priority class (1/k for a uniform mix, 1 for a monopoly): the
    // third concentration dial next to agg_gini / agg_entropy, from
    // exact cent totals, micro-scaled.
    Q("agg_hhi",
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
        .crossJoin(broadcast(table(s, d, "orders")
          .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("tot"))))
        .agg(count(lit(1)).as("n_classes"),
          expr("""CAST(floor(1000000.0 * sum(power(CAST(cents AS DOUBLE) / tot, 2)) + 0.5)
                  AS BIGINT)""").as("hhi_micro")),
      Some(sql("""WITH g AS (SELECT o_orderpriority,
                      CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                        AS cents
                    FROM orders GROUP BY 1),
                  t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM g)
                  SELECT count(*) AS n_classes,
                    CAST(floor(1000000.0 * sum(power(CAST(cents AS DOUBLE) / tot, 2)) + 0.5)
                      AS BIGINT) AS hhi_micro
                  FROM g CROSS JOIN t"""))),

    // try_sum / try_avg AGGREGATE overflow contract (Spark 3.5): a
    // BIGINT sum that exceeds 2^63 yields NULL under try_sum instead of
    // the ANSI-off silent wraparound — both behaviours pinned side by
    // side on three rows of 2^62 (plain sum wraps NEGATIVE; try_sum
    // nulls; try_avg of the same rows is finite and exact).
    Q("agg_try_sum",
      (s, _) => s.sql(sql("""
        SELECT sum(v) < 0 AS wrapped_negative,
               try_sum(v) IS NULL AS try_sum_null,
               CAST(try_avg(v) AS DOUBLE) AS try_avg_ok
        FROM VALUES (4611686018427387904L), (4611686018427387904L),
                    (4611686018427387904L) AS t(v)""")),
      Some(sql("""SELECT TRUE AS wrapped_negative, TRUE AS try_sum_null,
                    CAST(4611686018427387904 AS DOUBLE) AS try_avg_ok""")))
  )
}
