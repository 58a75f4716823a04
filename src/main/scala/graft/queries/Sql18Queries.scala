package graft.queries

import graft.Engine.table
import org.apache.spark.sql.SparkSession
import Registry.sql

/** Round-12 golden wave — the `join_nulls` / `join_nullsafe` family (the
  * reference's single largest uncrossed golden-correctness surface:
  * 60 + 42 golden files, HiveCompatibilitySuite.scala:246 whiteList
  * entries join_nulls / join_nullsafe), plus `join_1to1` (40 files).
  *
  * One derived NULL-keyed pair of relations, shared verbatim by every
  * row of the grid: the natural customer⋈orders FK with 2% of the keys
  * NULLed on each side (DIFFERENT 2% per side, so each side contributes
  * keys the other lacks). Every standard join type is then pinned on the
  * same inputs — the NULL-key behavior is exactly what the golden family
  * exercises:
  *   - equality joins (inner/left/right/full/semi/anti): NULL keys never
  *     match, but outer/anti sides must KEEP their NULL-key rows;
  *   - NOT IN vs NOT EXISTS: one NULL in the subquery poisons NOT IN to
  *     an empty result (Spark plans the null-aware anti join for this)
  *     while NOT EXISTS is unaffected — the classic silent-data-loss bug
  *     this family exists to catch;
  *   - null-safe equality (`IS NOT DISTINCT FROM`): NULL keys DO match
  *     each other, forming one (bounded-fraction) NULL bucket;
  *   - composite keys: a NULL in ANY component kills the match.
  *
  * Scale posture: all equality joins are key-equi (shuffle-hash/SMJ on
  * the FK); outputs are re-aggregated to the key's mod-10 class so the
  * verified result stays compact at any SF. The null-safe rows are the
  * one shape where a naive plan is QUADRATIC: under IS NOT DISTINCT
  * FROM every NULL matches every NULL, so a 2% NULL stripe per side
  * concentrates |nulls_l| × |nulls_r| pairs onto ONE join key — 100×
  * data means 10,000× bucket rows (9e3 pairs at sf0.01 → 9e11 at
  * sf100), which no skew-split saves because it is one logical key.
  * The jn_nullsafe rows therefore never materialize that bucket: the
  * QUERY ITSELF is a hand-written linear rewrite (this is a query-level
  * rewrite, NOT an engine rule — Spark still executes a verbatim
  * `<=>` join as BroadcastNestedLoop/cartesian) that splits `k IS NULL`
  * out BEFORE the join and computes the NULL bucket's group
  * contribution analytically (count_l_nulls × count_r_nulls — the only
  * thing any aggregate over the bucket can depend on), unioned with the
  * plain non-null equi-join. The DuckDB oracle runs the VERBATIM
  * null-safe join, so the driver's hash-compare is the machine-checked
  * proof that the linear rewrite is semantically identical;
  * ScaleGrowthSpec fences the materialized join volume to ~linear
  * growth across a 10× corpus. Because the rewrite lives in the query,
  * an engine regression in verbatim null-safe EXECUTION would be
  * invisible to those rows — jn_nullsafe_verbatim below keeps a
  * BOUNDED-size verbatim `IS NOT DISTINCT FROM` crossing (absolute key
  * bounds, so its NULL stripes stay ≤ tens × hundreds at ANY SF) with
  * duplicate NULL keys on both sides, oracle-checked engine-side.
  */
object Sql18Queries {

  private def views(s: SparkSession, d: String): Unit = {
    table(s, d, "customer").createOrReplaceTempView("graft_jn_c")
    table(s, d, "orders").createOrReplaceTempView("graft_jn_o")
  }

  /** The shared NULL-keyed pair: identical text on both engines, only
    * the table names differ. `k`/`k2` are the FK with a 2% NULL stripe
    * (different stripe per side); `kb`/`kb2` are a second, coarser
    * nullable component for the composite-key row. */
  private def withLR(body: String, c: String, o: String): String = sql(s"""
    WITH l AS (SELECT c_custkey AS id,
                      CASE WHEN c_custkey % 50 = 7 THEN NULL
                           ELSE c_custkey END AS k,
                      CASE WHEN c_custkey % 4 = 2 THEN NULL
                           ELSE c_custkey % 4 END AS kb,
                      c_acctbal AS bal
               FROM $c),
         r AS (SELECT o_orderkey AS oid,
                      CASE WHEN o_custkey % 50 = 13 THEN NULL
                           ELSE o_custkey END AS k2,
                      CASE WHEN o_custkey % 4 = 2 THEN NULL
                           ELSE o_custkey % 4 END AS kb2,
                      o_totalprice AS price
               FROM $o)
    $body""")

  private def q(name: String, sparkBody: String, oracleBody: String): Q =
    Q(name,
      (s, d) => { views(s, d); s.sql(withLR(sparkBody, "graft_jn_c", "graft_jn_o")) },
      Some(withLR(oracleBody, "customer", "orders")))

  /** Same body on both engines. */
  private def q(name: String, body: String): Q = q(name, body, body)

  val all: Seq[Q] = Seq(

    // INNER: NULL keys on either side simply vanish — no NULL group may
    // appear in the output.
    q("jn_inner", """
      SELECT k % 10 AS kg, count(*) AS n, count(DISTINCT k) AS n_keys
      FROM l JOIN r ON l.k = r.k2 GROUP BY k % 10"""),

    // LEFT OUTER: NULL-key customers survive null-extended (kg NULL
    // group, matched = 0) — losing them is the bug the goldens catch.
    q("jn_left", """
      SELECT k % 10 AS kg, count(*) AS n, count(oid) AS matched
      FROM l LEFT JOIN r ON l.k = r.k2 GROUP BY k % 10"""),

    // RIGHT OUTER: symmetric — NULL-key orders survive.
    q("jn_right", """
      SELECT k2 % 10 AS kg, count(*) AS n, count(id) AS matched
      FROM l RIGHT JOIN r ON l.k = r.k2 GROUP BY k2 % 10"""),

    // FULL OUTER: both NULL stripes survive on their own side; the
    // (NULL, NULL) cell collects BOTH sides' NULL-key rows (each
    // unmatched, never joined to each other under `=`).
    q("jn_full", """
      SELECT k % 10 AS lg, k2 % 10 AS rg, count(*) AS n
      FROM l FULL JOIN r ON l.k = r.k2 GROUP BY k % 10, k2 % 10"""),

    // LEFT SEMI: existence filter; NULL keys can never pass.
    q("jn_semi", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l LEFT SEMI JOIN r ON l.k = r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.k2 = l.k)
      GROUP BY k % 10"""),

    // LEFT ANTI: NULL-key left rows are KEPT (no match exists) — the
    // NOT EXISTS spelling, NOT the NOT IN one.
    q("jn_anti", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l LEFT ANTI JOIN r ON l.k = r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k2 = l.k)
      GROUP BY k % 10"""),

    // The NOT IN trap, side by side with NOT EXISTS on identical data:
    // one NULL in the subquery's column makes `k NOT IN (...)` UNKNOWN
    // for every row → zero survivors, while NOT EXISTS counts the true
    // anti-join. Spark plans the null-aware anti join
    // (BroadcastNestedLoopJoin NAAJ) for the NOT IN side.
    q("jn_not_in_vs_not_exists", """
      SELECT (SELECT count(*) FROM l WHERE k NOT IN (SELECT k2 FROM r))
               AS n_not_in,
             (SELECT count(*) FROM l
              WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k2 = l.k))
               AS n_not_exists"""),

    // NULL-SAFE inner join: the NULL stripes MATCH each other, forming
    // exactly one extra group of size nulls_l × nulls_r — quadratic if
    // materialized (see header). The rewrite below is QUERY-LEVEL (hand
    // written in this row's SQL, not an engine rule): non-null equi-join
    // UNION the analytic NULL bucket (count product; emitted only when
    // both stripes are non-empty, exactly when the real bucket is
    // non-empty). Oracle: the verbatim null-safe join — the
    // hash-compare IS the equivalence proof. Verbatim ENGINE execution
    // of <=> under duplicate NULL keys is covered by
    // jn_nullsafe_verbatim below.
    q("jn_nullsafe", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l JOIN r ON l.k = r.k2 GROUP BY k % 10
      UNION ALL
      SELECT CAST(NULL AS BIGINT) AS kg, nl * nr AS n
      FROM (SELECT count(*) AS nl FROM l WHERE k IS NULL) a,
           (SELECT count(*) AS nr FROM r WHERE k2 IS NULL) b
      WHERE nl * nr > 0""", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2 GROUP BY k % 10"""),

    // NULL-SAFE full outer: with NULL⇔NULL matching, NO row of either
    // side is ever null-extended on the key itself — the (lg,rg) grid
    // must contain no (x, NULL) cell for an x that exists on the right.
    // Spark plan: full outer equi-join over the NON-NULL keys (their
    // match/null-extension behavior is unchanged by removing the NULL
    // rows) UNION the analytic (NULL, NULL) cell — nl×nr cross-matched
    // pairs when both stripes are non-empty, else the nl+nr unmatched
    // null-extended stragglers. Oracle: verbatim null-safe full join.
    q("jn_nullsafe_full", """
      SELECT k % 10 AS lg, k2 % 10 AS rg, count(*) AS n
      FROM (SELECT k FROM l WHERE k IS NOT NULL) ln
      FULL JOIN (SELECT k2 FROM r WHERE k2 IS NOT NULL) rn
        ON ln.k = rn.k2
      GROUP BY k % 10, k2 % 10
      UNION ALL
      SELECT CAST(NULL AS BIGINT) AS lg, CAST(NULL AS BIGINT) AS rg,
             CASE WHEN nl > 0 AND nr > 0 THEN nl * nr ELSE nl + nr END AS n
      FROM (SELECT count(*) AS nl FROM l WHERE k IS NULL) a,
           (SELECT count(*) AS nr FROM r WHERE k2 IS NULL) b
      WHERE nl + nr > 0""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg, count(*) AS n
      FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10, k2 % 10"""),

    // ENGINE-linearized verbatim null-safe join (r14 verdict #7): the
    // query text IS the naive quadratic spelling — no hand rewrite —
    // and the ENGINE's LinearizeNullSafeCountAgg optimizer rule
    // (plans/GraftRules.scala) rewrites it to the non-null equi-join
    // UNION the analytic NULL bucket. The DuckDB oracle executes the
    // same verbatim join, so the driver hash-compare is the
    // machine-checked proof the rule is semantics-preserving; PlanSpec
    // pins that the rewrite FIRED (Union, no EqualNullSafe executed)
    // and ScaleGrowthSpec fences the executed join volume to the
    // linear band — the jn_nullsafe rows' query-level rewrite is now a
    // genuine engine capability on this exact shape.
    q("jn_nullsafe_engine", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l JOIN r ON l.k <=> r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2 GROUP BY k % 10"""),

    // FULL-OUTER variant of the engine rewrite (r15 widening): verbatim
    // quadratic spelling, per-type analytic bucket (nl·nr cross-matches
    // when both stripes are non-empty; nl+nr null-extended stragglers
    // when one is). Grouping covers BOTH keys — the rule's
    // group-collision guard for FULL (branch 1's null-extended rows can
    // zero either key alone, never both).
    q("jn_nullsafe_full_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg, count(*) AS n
      FROM l FULL JOIN r ON l.k <=> r.k2 GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg, count(*) AS n
      FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10, k2 % 10"""),

    // LEFT-OUTER variant: grouping over the LEFT key satisfies the
    // collision guard (branch 1 keeps every left row's key non-null);
    // bucket = nl·nr when the right stripe is non-empty, else the nl
    // null-extended left rows.
    q("jn_nullsafe_left_engine", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l LEFT JOIN r ON l.k <=> r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n
      FROM l LEFT JOIN r ON l.k IS NOT DISTINCT FROM r.k2 GROUP BY k % 10"""),

    // r16 widening: count(<provably non-null side attribute>) joins the
    // rewrite's aggregate scope. The counted column must be
    // nullable=false in its OWN side's output (here: a COALESCE-derived
    // projection — a bare parquet column is nullable in-schema even
    // when its values never are, and the guard demands the PROOF, not
    // the data). Bucket math per the rule doc: side counts equal
    // count(*) on cross-matched pairs; a null-extension case
    // contributes its own side's stripe count and ZERO to the opposite
    // side's count. Oracles are the verbatim null-safe joins — the
    // hash-compare proves the per-kind bucket table.
    q("jn_nullsafe_cnt_engine", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // LEFT variant with the right stripe non-empty: the bucket's
    // right-side count takes the CROSS branch (nl·nr), same as count(*).
    q("jn_nullsafe_left_cnt_engine", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l LEFT JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l LEFT JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // LEFT variant with the right stripe EMPTY (right side pre-filtered
    // to non-null keys): the bucket is the nl null-EXTENDED left rows —
    // count(*) = nl while count(right attr) = 0, the zero branch of the
    // per-kind table, value-proven here (the other rows never take it).
    q("jn_nullsafe_left_cnt0_engine", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l LEFT JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r
                        WHERE k2 IS NOT NULL) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(price0) AS n_priced
      FROM l LEFT JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r
                        WHERE k2 IS NOT NULL) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // FULL variant counting BOTH sides (plus count(*)) — the matched
    // branch of the per-kind FULL table on real data, with the
    // group-collision guard still requiring both keys in the grouping.
    q("jn_nullsafe_full_cnt_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             count(bal0) AS n_left, count(price0) AS n_right, count(*) AS n
      FROM (SELECT k, coalesce(bal, 0.0) AS bal0 FROM l) ln
      FULL JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON ln.k <=> rn.k2
      GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             count(bal0) AS n_left, count(price0) AS n_right, count(*) AS n
      FROM (SELECT k, coalesce(bal, 0.0) AS bal0 FROM l) ln
      FULL JOIN (SELECT k2, coalesce(price, 0.0) AS price0 FROM r) rn
        ON ln.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10, k2 % 10"""),

    // r17 widening: sum(<provably non-null INTEGRAL side attribute>)
    // joins the rewrite's aggregate scope. Bucket math one step up from
    // count: the cross-matched stripes repeat each own-side row once per
    // opposite row, so the bucket's sum is stripe_sum × opposite stripe
    // count; Long arithmetic is exact mod 2^64, so the multiply equals
    // iterated addition identically (the provability argument — DOUBLE
    // and DECIMAL are excluded, see the guard rows below). The summed
    // columns are COALESCE-derived projections: the guard demands the
    // nullable=false PROOF from the attribute's own side, not the data.
    // Spark body keeps the BARE sum (the rule matches
    // Alias(AggregateExpression)); the oracle casts DuckDB's HUGEINT sum
    // back to BIGINT per the ORACLE TYPING RULE.
    q("jn_nullsafe_sum_engine", """
      SELECT k % 10 AS kg, count(*) AS n, sum(id0) AS s_id, sum(oid0) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(id0) AS BIGINT) AS s_id,
             CAST(sum(oid0) AS BIGINT) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // LEFT variant, right stripe non-empty: both sums take the CROSS
    // branch (stripe_sum × opposite count), alongside the count(*).
    q("jn_nullsafe_left_sum_engine", """
      SELECT k % 10 AS kg, count(*) AS n, sum(id0) AS s_id, sum(oid0) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      LEFT JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(id0) AS BIGINT) AS s_id,
             CAST(sum(oid0) AS BIGINT) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      LEFT JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // LEFT variant with the right stripe EMPTY: the bucket is the nl
    // null-EXTENDED left rows — sum(left attr) = stripe_sum_L while
    // sum(right attr) = NULL (sum over an all-NULL column; count's 0
    // becomes sum's NULL — the branch the other rows never take,
    // value-proven here).
    q("jn_nullsafe_left_sum0_engine", """
      SELECT k % 10 AS kg, count(*) AS n, sum(id0) AS s_id, sum(oid0) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      LEFT JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r
                 WHERE k2 IS NOT NULL) rn
        ON ln.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(id0) AS BIGINT) AS s_id,
             CAST(sum(oid0) AS BIGINT) AS s_oid
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      LEFT JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r
                 WHERE k2 IS NOT NULL) rn
        ON ln.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // FULL variant summing BOTH sides — the matched branch of the
    // per-kind FULL table, collision guard still requiring both keys.
    q("jn_nullsafe_full_sum_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             sum(id0) AS s_id, sum(oid0) AS s_oid, count(*) AS n
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      FULL JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k <=> rn.k2
      GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             CAST(sum(id0) AS BIGINT) AS s_id,
             CAST(sum(oid0) AS BIGINT) AS s_oid, count(*) AS n
      FROM (SELECT k, coalesce(id, 0) AS id0 FROM l) ln
      FULL JOIN (SELECT k2, coalesce(oid, 0) AS oid0 FROM r) rn
        ON ln.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10, k2 % 10"""),

    // r17 second widening: min/max of a BARE side attribute — the most
    // provable family member (duplicate-invariant order statistics; the
    // bucket value is the own-side stripe min/max for EVERY join type,
    // no case split — see MinMaxSide in plans/GraftRules.scala). The
    // attributes are deliberately NULLABLE DOUBLES (bal/price raw):
    // min/max ignore NULLs identically in the stripe aggregate and the
    // verbatim bucket, and no arithmetic means no overflow/FP caveat —
    // exactly the columns the sum widening must reject.
    q("jn_nullsafe_minmax_engine", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(bal) AS min_bal, max(price) AS max_price
      FROM l JOIN r ON l.k <=> r.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(bal) AS min_bal, max(price) AS max_price
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10"""),

    // LEFT variant with the right stripe EMPTY: the bucket is the
    // null-extended left rows — min(left attr) = the left stripe's own
    // min while max(right attr) is NULL; both equal the stripe
    // aggregates (the right stripe is empty, so ITS max is already
    // NULL — the coincidence the no-case-split argument rests on,
    // value-proven here).
    q("jn_nullsafe_left_minmax0_engine", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(bal) AS min_bal, max(price) AS max_price
      FROM l LEFT JOIN (SELECT k2, price FROM r WHERE k2 IS NOT NULL) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(bal) AS min_bal, max(price) AS max_price
      FROM l LEFT JOIN (SELECT k2, price FROM r WHERE k2 IS NOT NULL) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // FULL variant, both sides' extrema plus count(*) — collision guard
    // still demands both keys in the grouping.
    q("jn_nullsafe_full_minmax_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             min(bal) AS min_bal, max(price) AS max_price, count(*) AS n
      FROM l FULL JOIN r ON l.k <=> r.k2
      GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             min(bal) AS min_bal, max(price) AS max_price, count(*) AS n
      FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10, k2 % 10"""),

    // r18 widening: count(DISTINCT <bare side attribute>) over the FULL
    // fractional-stripe inputs — the rewrite is what keeps this linear
    // (a verbatim plan materializes nl·nr bucket pairs and then runs a
    // distinct-aggregate Expand over them; 100× data = 10,000× pairs).
    // Bucket value = the own-side stripe's distinct count for EVERY
    // join type, no case split (duplicate-invariant; see
    // CountDistinctSide in plans/GraftRules.scala). Oracle: the
    // verbatim null-safe join — the hash-compare is the equivalence
    // proof. count(DISTINCT …) is BIGINT on both engines (no HUGEINT
    // cast needed).
    q("jn_nullsafe_cntd_engine", """
      SELECT k % 10 AS kg, count(*) AS n, count(DISTINCT id) AS n_ids
      FROM l JOIN r ON l.k <=> r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(DISTINCT id) AS n_ids
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2 GROUP BY k % 10"""),

    // LEFT variant with the right stripe EMPTY: the bucket is the nl
    // null-EXTENDED left rows — count(DISTINCT oid) = 0 over the
    // all-NULL column, which COINCIDES with the empty right stripe's
    // distinct count (the no-case-split argument's zero branch,
    // value-proven here; the other rows never take it). ONE distinct
    // group only: a second distinct attribute would hand the plan to
    // RewriteDistinctAggregates' Expand form before the rule ever runs
    // (see the scope note in GraftRules).
    q("jn_nullsafe_left_cntd0_engine", """
      SELECT k % 10 AS kg, count(*) AS n, count(DISTINCT oid) AS n_oids
      FROM l LEFT JOIN (SELECT oid, k2 FROM r WHERE k2 IS NOT NULL) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(DISTINCT oid) AS n_oids
      FROM l LEFT JOIN (SELECT oid, k2 FROM r WHERE k2 IS NOT NULL) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // FULL variant (single distinct group, as above) — the
    // group-collision guard still demands both keys in the grouping.
    q("jn_nullsafe_full_cntd_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             count(DISTINCT id) AS n_ids, count(*) AS n
      FROM l FULL JOIN r ON l.k <=> r.k2 GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             count(DISTINCT id) AS n_ids, count(*) AS n
      FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10, k2 % 10"""),

    // r19 widening: sum(DISTINCT <bare integral side attribute>) over
    // the FULL fractional-stripe inputs — duplicate-invariant like the
    // cntd family (bucket value = the own-side stripe's distinct sum,
    // every join type, no case split) composed with the sum family's
    // integral-LEGACY exactness (same SET, any order, exact mod 2^64).
    // The rewrite is what keeps this linear: a verbatim plan
    // materializes nl·nr bucket pairs and runs the distinct Expand over
    // them. Oracle runs the verbatim null-safe join; DuckDB widens
    // sum(DISTINCT BIGINT) to HUGEINT, hence the oracle-side cast.
    q("jn_nullsafe_sumd_engine", """
      SELECT k % 10 AS kg, count(*) AS n, sum(DISTINCT id) AS sd_ids
      FROM l JOIN r ON l.k <=> r.k2 GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(DISTINCT id) AS BIGINT) AS sd_ids
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2 GROUP BY k % 10"""),

    // LEFT variant with the right stripe EMPTY: the bucket is the nl
    // null-EXTENDED left rows — sum(DISTINCT oid) over the all-NULL
    // column is NULL, which COINCIDES with the empty right stripe's
    // distinct sum (sum over no rows — the contrast with count's 0,
    // value-proven here; PlanSpec pins the NULL directly).
    q("jn_nullsafe_left_sumd0_engine", """
      SELECT k % 10 AS kg, count(*) AS n, sum(DISTINCT oid) AS sd_oids
      FROM l LEFT JOIN (SELECT oid, k2 FROM r WHERE k2 IS NOT NULL) rn
        ON l.k <=> rn.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(DISTINCT oid) AS BIGINT) AS sd_oids
      FROM l LEFT JOIN (SELECT oid, k2 FROM r WHERE k2 IS NOT NULL) rn
        ON l.k IS NOT DISTINCT FROM rn.k2
      GROUP BY k % 10"""),

    // FULL variant (single distinct group) — the group-collision guard
    // still demands both keys in the grouping.
    q("jn_nullsafe_full_sumd_engine", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             sum(DISTINCT id) AS sd_ids, count(*) AS n
      FROM l FULL JOIN r ON l.k <=> r.k2 GROUP BY k % 10, k2 % 10""", """
      SELECT k % 10 AS lg, k2 % 10 AS rg,
             CAST(sum(DISTINCT id) AS BIGINT) AS sd_ids, count(*) AS n
      FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      GROUP BY k % 10, k2 % 10"""),

    // GUARD row: a FILTER-clause min is NOT analytic from the stripe
    // aggregate (the filter predicate would have to be replayed inside
    // the bucket) — the rewrite must keep the verbatim join. Bounded
    // key populations keep the genuine quadratic bucket tiny at any SF.
    q("jn_nullsafe_minmaxf_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(price) FILTER (WHERE oid % 2 = 0) AS min_even
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, price, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             min(price) FILTER (WHERE oid % 2 = 0) AS min_even
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, price, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // GUARD row: sum of a NULLABLE integral attribute (oid bare — the
    // parquet schema marks it nullable, so there is no proof) is NOT
    // analytic; the rewrite must keep the verbatim join (PlanSpec pins
    // EqualNullSafe survives). Bounded key populations keep the genuine
    // quadratic bucket tiny at ANY scale factor.
    q("jn_nullsafe_sumn_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n, sum(oid) AS s_oid
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, CAST(sum(oid) AS BIGINT) AS s_oid
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // GUARD row: sum of a non-null DOUBLE is excluded by TYPE — FP
    // addition is non-associative, so stripe_sum × n and the verbatim
    // iterated sum differ in ULPs; the rule keeps the verbatim join
    // rather than ship a "fast but off by an ULP" rewrite. Bounded
    // inputs as above.
    //
    // r18 (the r17 driver red): the EXPOSED column is round(sum, 2) on
    // BOTH sides — the raw double sum over the ~3,600-pair bucket is
    // order-dependent in its last ULPs (measured: Spark …159999'4 vs
    // DuckDB …160000'3, ~11 ULPs, and Spark's value drifts with
    // partial-merge order), so hash-comparing it was flaky BY
    // CONSTRUCTION — exactly the FP-non-associativity the rule's own
    // DOUBLE exclusion argues. Prices are 2dp decimals, so the true sum
    // is an exact 2dp value ~1e-7 from both engines' computed sums:
    // round(…, 2) lands both on the same double, far from any .xx5
    // boundary. The round-wrapped aggregate is STILL outside the
    // rewrite's scope (the alias is not a bare AggregateExpression), so
    // the row stays a guard; the bare-double-sum plan shape itself is
    // additionally pinned as a PlanSpec-only probe (the guard's proof
    // lives in the plan, not the oracle). Lint half #4
    // (OracleLint.knifeEdgeFpAgg) now flags this class registry-wide.
    q("jn_nullsafe_sumdbl_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n, round(sum(price0), 2) AS s_price
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT coalesce(price, 0.0) AS price0, k2 FROM r
            WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, round(sum(price0), 2) AS s_price
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT coalesce(price, 0.0) AS price0, k2 FROM r
            WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // GUARD row for the widening: count of a NULLABLE attribute (bal =
    // c_acctbal, nullable in the parquet schema) is NOT analytic — its
    // bucket value would depend on how many nulls sit inside the stripe
    // rows, so the rewrite must keep the verbatim join (PlanSpec pins
    // EqualNullSafe survives). Bounded key populations (the
    // jn_nullsafe_verbatim pattern) keep the genuine quadratic bucket
    // ≤ ~360 pairs at ANY scale factor.
    q("jn_nullsafe_cntn_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n, count(bal) AS n_bal
      FROM (SELECT k, bal FROM l WHERE id <= 600) lb
      JOIN (SELECT k2 FROM r WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n, count(bal) AS n_bal
      FROM (SELECT k, bal FROM l WHERE id <= 600) lb
      JOIN (SELECT k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // r18 SUCCESSOR verbatim witness (the precondition GraftRules'
    // widening doc demands, landed BEFORE the count(DISTINCT) widening
    // commit): count(DISTINCT <expression>) is outside EVERY analytic
    // scope — the rule reasons only about BARE side attributes — so this
    // row keeps a genuine verbatim `<=>` ENGINE execution oracle-checked
    // after count(DISTINCT <bare attr>) joins the rewrite and
    // jn_nullsafe_verbatim below starts optimizing to the Union shape.
    // The distinct PAIR count pins the NULL bucket's cross-match
    // structure even more directly than the per-side counts did: oid ≤
    // 6000 < 10000 makes id·10000 + oid injective on (id, oid), so
    // n_pairs = n exactly on the NULL group (every cross-matched pair is
    // distinct) — a value no stripe-local aggregate can produce. Bounded
    // key populations as above keep the verbatim bucket tiny at any SF.
    q("jn_nullsafe_pairs_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n,
             count(DISTINCT id * 10000 + oid) AS n_pairs
      FROM (SELECT id, k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             count(DISTINCT id * 10000 + oid) AS n_pairs
      FROM (SELECT id, k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // r19 SUCCESSOR verbatim witness (the precondition the widening doc
    // demands, landed BEFORE the sum(DISTINCT) widening commit):
    // sum(DISTINCT <expression>) is outside EVERY analytic scope — the
    // rule reasons only about BARE side attributes — so this row keeps a
    // genuine verbatim `<=>` ENGINE execution oracle-checked after
    // sum(DISTINCT <bare integral attr>) joins the rewrite. The argument
    // oid % 97 + 3 folds the ~hundreds-wide oid stripe onto ≤ 97 residue
    // classes, so the NULL group's distinct sum differs from both the
    // plain sum (duplicates dropped) and any stripe-local bare-attribute
    // aggregate (the expression is not a column). DuckDB widens
    // sum(DISTINCT int) to HUGEINT — oracle casts to BIGINT per the
    // typing rule. Bounded key populations keep the verbatim bucket tiny
    // at any SF.
    q("jn_nullsafe_sumd_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n,
             sum(DISTINCT oid % 97 + 3) AS s_dexpr
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k <=> rb.k2
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n,
             CAST(sum(DISTINCT oid % 97 + 3) AS BIGINT) AS s_dexpr
      FROM (SELECT k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // VERBATIM null-safe join, BOUNDED (r13 ADVICE): the engine itself
    // executes `IS NOT DISTINCT FROM` — Spark's ExtractEquiJoinKeys
    // treats EqualNullSafe as an equi-join key, so the NULL stripes
    // genuinely collide on one hash key with DUPLICATE NULLs on both
    // sides (the semantics jn_nullsafe's query-level rewrite never asks
    // the engine to execute). Both inputs carry ABSOLUTE key bounds
    // (id ≤ 600, oid ≤ 6000 — fixed key populations, not fractions), so
    // the NULL bucket stays ≤ ~12 × ~30 pairs at ANY scale factor: safe
    // to materialize verbatim, while keeping the engine's null-safe
    // hash-join path oracle-checked. The distinct-side counts pin the
    // cross-match structure of the NULL bucket (n = n_l_ids × n_r_oids
    // for the NULL group).
    //
    // r18: the count(DISTINCT <bare attr>) widening landed with a
    // SINGLE-distinct-group scope — this row's TWO distinct groups
    // (id and oid) are claimed by Spark's own RewriteDistinctAggregates
    // (Expand + double aggregate) before the terminal optimizer batch
    // where the graft rule runs, so the row structurally KEEPS its
    // verbatim `<=>` execution: it remains a verbatim-execution witness
    // alongside jn_nullsafe_pairs_verbatim (whose expression-argument
    // aggregate no widening of the bare-attribute scope can ever
    // claim). PlanSpec pins both.
    q("jn_nullsafe_verbatim", """
      SELECT k % 10 AS kg, count(*) AS n,
             count(DISTINCT id) AS n_l_ids, count(DISTINCT oid) AS n_r_oids
      FROM (SELECT id, k FROM l WHERE id <= 600) lb
      JOIN (SELECT oid, k2 FROM r WHERE oid <= 6000) rb
        ON lb.k IS NOT DISTINCT FROM rb.k2
      GROUP BY k % 10"""),

    // COMPOSITE key with one nullable component: NULL in EITHER
    // component kills the match under `=` — only (kb = kb2) pairs with
    // both components non-null join.
    q("jn_composite", """
      SELECT kb AS kbg, count(*) AS n
      FROM l JOIN r ON l.k = r.k2 AND l.kb = r.kb2 GROUP BY kb"""),

    // auto_join_nulls (25 files) + auto_join_filters (64): the NULL-key
    // semantics grid re-run under AUTOMATIC map-join conversion — the
    // golden families exist because Hive's mapjoin path historically
    // diverged from the shuffle path on NULL keys and ON-clause build
    // predicates. Here the BROADCAST hints force the BroadcastHashJoin
    // path (PlanSpec pins 3 BHJ / 0 shuffled joins) and the oracle is
    // the engine-neutral restatement — identical answers to the
    // shuffle-path jn_* rows above.
    q("jn_auto_broadcast", """
      SELECT /*+ BROADCAST(r) */ 'inner' AS shape, count(*) AS n
      FROM l JOIN r ON l.k = r.k2
      UNION ALL
      SELECT /*+ BROADCAST(r) */ 'left_on_pred', count(price)
      FROM l LEFT JOIN r ON l.k = r.k2 AND r.price > 10000
      UNION ALL
      SELECT /*+ BROADCAST(r) */ 'semi', count(*)
      FROM l LEFT SEMI JOIN r ON l.k = r.k2""", """
      SELECT 'inner' AS shape, count(*) AS n
      FROM l JOIN r ON l.k = r.k2
      UNION ALL
      SELECT 'left_on_pred', count(price)
      FROM l LEFT JOIN r ON l.k = r.k2 AND r.price > 10000
      UNION ALL
      SELECT 'semi', count(*)
      FROM l SEMI JOIN r ON l.k = r.k2"""),

    // join_1to1 (40 golden files): unique ⋈ unique key must preserve
    // cardinality exactly — n = n_keys = |customer| and the key checksum
    // is invariant through the join.
    Q("jn_1to1",
      (s, d) => {
        views(s, d)
        s.sql(sql("""
          SELECT count(*) AS n, count(DISTINCT a.id) AS n_keys,
                 CAST(sum(a.id) AS BIGINT) AS key_sum
          FROM (SELECT c_custkey AS id, c_acctbal FROM graft_jn_c) a
          JOIN (SELECT c_custkey AS id2, c_nationkey FROM graft_jn_c) b
            ON a.id = b.id2"""))
      },
      Some(sql("""
        SELECT count(*) AS n, count(DISTINCT a.id) AS n_keys,
               CAST(sum(a.id) AS BIGINT) AS key_sum
        FROM (SELECT c_custkey AS id, c_acctbal FROM customer) a
        JOIN (SELECT c_custkey AS id2, c_nationkey FROM customer) b
          ON a.id = b.id2""")))
  )
}
