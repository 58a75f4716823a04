package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.3 — every join shape in the reference
  * (sql/core/.../execution/joins/: BroadcastHashJoin, ShuffledHashJoin,
  * HashOuterJoin L/R/FULL, LeftSemiJoinHash, LeftSemiJoinBNL,
  * BroadcastNestedLoopJoin, CartesianProduct) plus left_anti (superset).
  *
  * Scale posture: dimension sides (region/nation/part/supplier) are
  * broadcast — zero shuffle of the fact table for those joins. Fact-fact
  * joins (lineitem⋈orders) shuffle on the join key once and aggregate
  * partially before the exchange. AQE converts to broadcast at runtime
  * when a side turns out small.
  */
object JoinQueries {

  val all: Seq[Q] = Seq(

    // Inner equi-join, fact ⋈ fact (ShuffledHashJoin.scala:33 analog):
    // shuffles both sides on o_orderkey; partial aggregation first.
    // r18 lint half #4: the revenue sum's 2dp×2dp summands carry 4
    // decimals — rounded at 4dp both sides (grid-aligned, see q1_agg).
    Q("join_inner",
      (s, d) => table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue")),
      Some(sql("""SELECT o_orderpriority, count(*) AS n,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY o_orderpriority"""))),

    // Broadcast inner join (BroadcastHashJoin.scala:39): small dim side
    // explicitly broadcast — at 100 TB the part table fans out to every
    // executor, lineitem never shuffles.
    Q("join_broadcast",
      (s, d) => table(s, d, "lineitem")
        .join(broadcast(table(s, d, "part").filter(col("p_size") >= 30)),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty")),
      Some(sql("""SELECT p_brand, count(*) AS n, round(sum(l_quantity), 4) AS qty
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE p_size >= 30 GROUP BY p_brand"""))),

    // LEFT OUTER (HashOuterJoin.scala:39): unmatched left rows null-extended.
    Q("join_left_outer",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 150000.0),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders")),
      Some(sql("""SELECT c_custkey, count(o_orderkey) AS n_big_orders
                  FROM customer LEFT JOIN
                    (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
                    ON c_custkey = o_custkey
                  GROUP BY c_custkey"""))),

    // RIGHT OUTER.
    Q("join_right_outer",
      (s, d) => table(s, d, "orders").filter(col("o_totalprice") > 150000.0)
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_nationkey"))
        .agg(count(col("o_orderkey")).as("n"), countDistinct(col("c_custkey")).as("n_cust")),
      Some(sql("""SELECT c_nationkey, count(o_orderkey) AS n, count(DISTINCT c_custkey) AS n_cust
                  FROM (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
                    RIGHT JOIN customer ON o_custkey = c_custkey
                  GROUP BY c_nationkey"""))),

    // FULL OUTER: disjoint-ish sides so both null-extensions appear.
    Q("join_full_outer",
      (s, d) => {
        val c = table(s, d, "customer").filter(col("c_nationkey") < 15)
          .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
        val su = table(s, d, "supplier").filter(col("s_nationkey") > 8)
          .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
        // Seq-key full join already coalesces the key column.
        c.join(su, Seq("nationkey"), "full")
          .select(col("nationkey"), col("n_cust"), col("n_supp"))
      },
      Some(sql("""SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, n_cust, n_supp
                  FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer
                        WHERE c_nationkey < 15 GROUP BY 1) c
                  FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier
                        WHERE s_nationkey > 8 GROUP BY 1) s
                  USING (nationkey)"""))),

    // LEFT SEMI (LeftSemiJoinHash.scala:32) = EXISTS.
    Q("join_left_semi",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 250000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")),
      Some(sql("""SELECT c_custkey, c_name FROM customer
                  WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)"""))),

    // LEFT ANTI = NOT EXISTS (beyond-reference superset; 1.3 had no anti).
    Q("join_left_anti",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders").filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some(sql("""SELECT c_custkey, c_name FROM customer
                  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)"""))),

    // NULL-safe equality join (<=>, predicates.scala:188 EqualNullSafe).
    Q("join_null_safe",
      (s, d) => {
        val c = table(s, d, "customer")
          .select(nullif(col("c_nationkey") % 5, lit(0)).as("ck"))
        val su = table(s, d, "supplier")
          .select(nullif(col("s_nationkey") % 5, lit(0)).as("sk"))
        c.join(su, col("ck") <=> col("sk"), "inner")
          .groupBy(col("ck")).agg(count(lit(1)).as("n"))
      },
      Some(sql("""SELECT ck, count(*) AS n
                  FROM (SELECT nullif(c_nationkey % 5, 0) AS ck FROM customer) c
                  JOIN (SELECT nullif(s_nationkey % 5, 0) AS sk FROM supplier) s
                    ON ck IS NOT DISTINCT FROM sk
                  GROUP BY ck"""))),

    // Theta join (non-equi → BroadcastNestedLoopJoin.scala:32).
    Q("join_theta",
      (s, d) => {
        val n1 = table(s, d, "nation").select(col("n_name").as("name1"), col("n_regionkey").as("rk1"))
        val n2 = table(s, d, "nation").select(col("n_name").as("name2"), col("n_regionkey").as("rk2"))
        n1.join(n2, col("rk1") < col("rk2"), "inner")
          .groupBy(col("name1")).agg(count(lit(1)).as("n_pairs"))
      },
      Some(sql("""SELECT n1.n_name AS name1, count(*) AS n_pairs
                  FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
                  GROUP BY n1.n_name"""))),

    // Cartesian product (CartesianProduct.scala:30).
    Q("join_cross",
      (s, d) => table(s, d, "region").crossJoin(table(s, d, "nation"))
        .select(col("r_name"), col("n_name")),
      Some(sql("SELECT r_name, n_name FROM region CROSS JOIN nation"))),

    // AS-OF join (operator Spark lacks natively; the time-series staple):
    // for each purchase, the user's most recent click at-or-before it.
    // Scale shape: NO join at all — tag both sides, union, and carry the
    // last click forward with a per-user window (last(_, ignoreNulls)).
    // One shuffle on user_id; state per row is O(1). A naive theta join
    // (p.ts >= c.ts) would be a per-user cross product. Clicks are
    // deduped to max event_id per (user, ts) so equal-ts ties are
    // deterministic in both engines. Oracle: DuckDB's native ASOF JOIN.
    Q("join_asof",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = graft.Engine.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("c_id"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
        val tagged = clicks
          .select(col("user_id"), col("ts"), lit(0).as("side"),
            col("c_id"), lit(null).cast("long").as("p_id"))
          .unionByName(buys.select(col("user_id"), col("ts"), lit(1).as("side"),
            lit(null).cast("long").as("c_id"), col("p_id")))
        // side=0 sorts clicks before purchases at equal ts → `>=` semantics
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"), coalesce(col("c_id"), col("p_id")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("last_c_id", last(col("c_id"), ignoreNulls = true).over(w))
          .withColumn("last_c_ts",
            last(when(col("c_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("p_id"), col("user_id"), col("ts").as("p_ts"),
            col("last_c_id").as("c_id"), col("last_c_ts").as("c_ts"))
      },
      Some(sql("""WITH c AS (SELECT user_id, ts, max(event_id) AS c_id
                             FROM events WHERE event_type = 'click' GROUP BY 1, 2),
                   p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                         FROM events WHERE event_type = 'purchase')
                  SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.ts AS c_ts
                  FROM p ASOF LEFT JOIN c
                    ON p.user_id = c.user_id AND p.p_ts >= c.ts"""))),

    // The SAME as-of semantics through the NATIVE operator
    // (plans/AsOfJoin.scala: custom LogicalPlan + Strategy + exec whose
    // declared distribution/ordering makes EnsureRequirements insert the
    // co-partitioning exchanges — §7 extension path (c) end-to-end).
    // Oracle identical to join_asof, so the custom operator is
    // hash-verified against DuckDB's native ASOF JOIN.
    Q("join_asof_native",
      (s, d) => {
        val ev = graft.Engine.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("c_id"))
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("c_id"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
        graft.plans.AsOfJoin.asof(buys, "user_id", "p_ts", clicks, "c_user", "c_ts")
          .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id"), col("c_ts"))
      },
      Some(sql("""WITH c AS (SELECT user_id, ts, max(event_id) AS c_id
                             FROM events WHERE event_type = 'click' GROUP BY 1, 2),
                   p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                         FROM events WHERE event_type = 'purchase')
                  SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.ts AS c_ts
                  FROM p ASOF LEFT JOIN c
                    ON p.user_id = c.user_id AND p.p_ts >= c.ts"""))),

    // RANGE (interval) join (operator Spark plans as a per-key cross
    // product): click→purchase pairs of the same user within one hour.
    // Scale shape: bucket the time axis into 1h bins, join on
    // (user, bin) with each purchase probing its own and the previous
    // bin — an ordinary partitioned equi-join — then apply the exact
    // interval filter. Each qualifying pair matches in exactly one bin
    // (the click's), so no dedup is needed. Work is O(pairs-in-bin), not
    // O(pairs-per-user).
    Q("join_range",
      (s, d) => {
        val ev = graft.Engine.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"),
            floor(unix_timestamp(col("ts")) / 3600).as("bin"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"),
            explode(array(floor(unix_timestamp(col("ts")) / 3600),
              floor(unix_timestamp(col("ts")) / 3600) - 1)).as("bin"))
        clicks.join(buys, Seq("user_id", "bin"))
          .filter(col("p_ts") >= col("c_ts") &&
            col("p_ts") < col("c_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("c_id"), col("p_id"), col("user_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      },
      Some(sql("""SELECT c.event_id AS c_id, p.event_id AS p_id, c.user_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
                  FROM events c JOIN events p
                    ON c.user_id = p.user_id
                   AND c.event_type = 'click' AND p.event_type = 'purchase'
                   AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR"""))),

    // 5-way star join — the flagship / bench q3 analog. Dims broadcast;
    // the fact-fact join is EAGERLY AGGREGATED: lineitem revenue is
    // pre-summed per l_orderkey BEFORE joining orders, so the join
    // shuffles one row per order (~4× fewer, narrow) instead of every
    // lineitem — the below-join aggregation push that decides whether a
    // 100 TB star join shuffles the fact table or its per-key summary.
    Q("join_star", bench = true,
      fn = (s, d) => {
        val liAgg = table(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
            count(lit(1)).as("n_li"))
        liAgg
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          // r18 lint half #4: 4-decimal summands → 4dp rounding both sides
          .agg(round(sum(col("rev")), 4).as("revenue"), sum(col("n_li")).as("n"))
      },
      oracle = Some(sql("""SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
                   count(*) AS n
                  FROM lineitem
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  GROUP BY r_name, n_name"""))),

    // STRUCT-KEYED equi-join: composite keys packed into ONE struct
    // column hash-partition and compare as a unit (HashPartitioning
    // supports nested types), the tidy spelling of a multi-column join
    // — and the shape a "natural key" column carries through a
    // pipeline. Oracled against the flattened two-column join.
    Q("join_struct_key",
      (s, d) => {
        val left = table(s, d, "lineitem")
          .select(struct(col("l_orderkey").as("ok"), col("l_linenumber").as("ln")).as("sk"),
            col("l_quantity"))
        val right = table(s, d, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select(struct(col("l_orderkey").as("ok"), col("l_linenumber").as("ln")).as("sk2"),
            col("l_extendedprice"))
        left.join(right, col("sk") === col("sk2"))
          .groupBy(col("sk.ok").as("l_orderkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
      },
      Some(sql("""SELECT a.l_orderkey, count(*) AS n, round(sum(a.l_quantity), 4) AS qty
                  FROM lineitem a
                  JOIN (SELECT l_orderkey, l_linenumber FROM lineitem
                        WHERE l_quantity >= 45) b
                    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
                  GROUP BY a.l_orderkey""")))
  )
}
