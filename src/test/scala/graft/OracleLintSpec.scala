package graft

import graft.queries.{OracleLint, Registry}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The lint demanded by the r11 verdict: it must FAIL on the unfixed
  * pipe_skyline oracle (raw `sum(...) AS mon` exposed to a BIGINT output
  * column → DuckDB HUGEINT hash divergence) and PASS after the fix. The
  * registry-wide sweep runs inside RegistrySpec where each query's Spark
  * schema is already in hand.
  */
class OracleLintSpec extends AnyFunSuite {

  private val skySchema = StructType(Seq(
    StructField("o_custkey", LongType),
    StructField("freq", LongType),
    StructField("mon", LongType)))

  // The EXACT r11 oracle text that went driver-red (Pipeline9Queries
  // pre-fix): `mon` is an integer sum in the CTE and the final projection
  // re-exposes it raw.
  private val unfixedSkyline = Registry.sql("""
    WITH per_cust AS (SELECT o_custkey, count(*) AS freq,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
           FROM orders GROUP BY o_custkey),
         fmax AS (SELECT freq, max(mon) AS mx FROM per_cust GROUP BY freq),
         cum AS (SELECT freq, mx,
             max(mx) OVER (ORDER BY freq DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
           FROM fmax)
    SELECT p.o_custkey, CAST(p.freq AS BIGINT) AS freq, p.mon
    FROM per_cust p JOIN cum c ON p.freq = c.freq
    WHERE (c.hi IS NULL OR p.mon > c.hi) AND p.mon = c.mx""")

  test("catches the r11 pipe_skyline HUGEINT class (unfixed oracle)") {
    val v = OracleLint.check("pipe_skyline", skySchema, unfixedSkyline)
    assert(v.nonEmpty, "lint must flag the raw-sum alias `mon`")
    assert(v.head.contains("mon"))
  }

  test("passes the shipped (fixed) pipe_skyline oracle") {
    val fixed = SparkEntry.oracleSql("pipe_skyline")
    assert(OracleLint.check("pipe_skyline", skySchema, fixed).isEmpty)
  }

  test("directly cast sums pass") {
    val ok = Registry.sql(
      "SELECT CAST(sum(x) AS BIGINT) AS n FROM t GROUP BY k")
    val sch = StructType(Seq(StructField("n", LongType)))
    assert(OracleLint.check("t", sch, ok).isEmpty)
  }

  test("sums feeding a larger (non-aliased) expression pass") {
    val ok = Registry.sql(
      "SELECT CAST(sum(x) / count(*) AS DOUBLE) AS avg_x FROM t")
    val sch = StructType(Seq(StructField("avg_x", DoubleType)))
    assert(OracleLint.check("t", sch, ok).isEmpty)
  }

  test("FILTER-clause sums are still seen through") {
    val bad = Registry.sql(
      "SELECT sum(x) FILTER (WHERE x > 0) AS pos FROM t")
    val sch = StructType(Seq(StructField("pos", LongType)))
    assert(OracleLint.check("t", sch, bad).nonEmpty)
  }

  test("recast exemption needs an identifier boundary (r12 advice)") {
    // `... AS BIGINT) AS n_rows` must NOT exempt the DIFFERENT column
    // `n` (`as bigint) as n` is a substring of `as bigint) as n_rows`):
    // the raw `sum(y) AS n` is still a HUGEINT divergence
    val bad = Registry.sql("""
      WITH a AS (SELECT CAST(sum(x) AS BIGINT) AS n_rows, sum(y) AS n FROM t)
      SELECT n, n_rows FROM a""")
    val sch = StructType(Seq(
      StructField("n", LongType), StructField("n_rows", LongType)))
    val v = OracleLint.check("t", sch, bad)
    assert(v.nonEmpty && v.head.contains("`n`"),
      s"boundary-less recast match silently exempted n: $v")
  }

  test("AS-less bare aliases are visible (r12 advice)") {
    val bad = Registry.sql("SELECT sum(x) mon FROM t")
    val sch = StructType(Seq(StructField("mon", LongType)))
    assert(OracleLint.check("t", sch, bad).nonEmpty,
      "bare-identifier alias `sum(x) mon` must be linted like `AS mon`")
  }

  test("un-aliased sums followed by a keyword are not misread as aliases") {
    val ok = Registry.sql(
      "SELECT k FROM t GROUP BY k HAVING sum(x) FILTER (WHERE x > 0) > 5")
    val sch = StructType(Seq(StructField("k", LongType)))
    assert(OracleLint.check("t", sch, ok).isEmpty)
  }

  // ── knife-edge lint (r15 verdict #2) ────────────────────────────────

  test("knife-edge: flags bare floor over a transcendental (the r15 ml_kaplan_meier class)") {
    // the EXACT shape that went red at sf0.1 in r15, pre-fix
    val bad = Registry.sql("""SELECT t,
      CAST(floor(1000000.0 * exp(sum(ln(1.0 - d / n_risk)) OVER w)) AS BIGINT)
        AS survival_micro FROM g WINDOW w AS (ORDER BY t)""")
    val v = OracleLint.knifeEdge("km", bad)
    assert(v.nonEmpty && v.head.contains("half-up"), v.mkString("; "))
  }

  test("knife-edge: half-up (+ 0.5) defuses the floor") {
    val ok = Registry.sql("""SELECT t,
      CAST(floor(1000000.0 * exp(sum(ln(1.0 - d / n_risk)) OVER w) + 0.5) AS BIGINT)
        AS survival_micro FROM g WINDOW w AS (ORDER BY t)""")
    assert(OracleLint.knifeEdge("km", ok).isEmpty)
  }

  test("knife-edge: pure-arithmetic floors are NOT flagged (IEEE-deterministic)") {
    // +,-,*,/ are correctly rounded: both engines compute the SAME
    // double from the same inputs — gini's rational micro-scaling is safe
    val ok = Registry.sql("""SELECT n,
      CAST(floor(1000000.0 * (2.0 * iw / (n * tot) - (n + 1.0) / n)) AS BIGINT)
        AS gini_micro FROM a""")
    assert(OracleLint.knifeEdge("gini", ok).isEmpty)
  }

  test("knife-edge: +0.51 is not mistaken for half-up") {
    val bad = Registry.sql(
      "SELECT CAST(floor(1e6 * ln(x) + 0.51) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", bad).nonEmpty)
  }

  test("knife-edge: bare CAST of a transcendental float to BIGINT is the same edge") {
    val bad = Registry.sql("SELECT CAST(1e6 * exp(x) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", bad).nonEmpty)
    val ok = Registry.sql("SELECT CAST(round(1e6 * exp(x)) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", ok).isEmpty)
  }

  test("knife-edge: the defusing is ANCHORED (r16 ADVICE) — half-up inside the transcendental defuses nothing") {
    // `floor(1e6 * exp(x + 0.5))`: the +0.5 shifts exp's INPUT, not the
    // floored value — the edge is still live at integers. Pre-fix the
    // lint accepted any +0.5 anywhere inside the argument.
    val bad1 = Registry.sql(
      "SELECT CAST(floor(1e6 * exp(x + 0.5)) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", bad1).nonEmpty,
      "+0.5 buried inside exp() must not defuse the floor")
    // `floor(exp(round(x)))`: the round canonicalizes exp's INPUT; exp's
    // OUTPUT still differs by a ULP between libms.
    val bad2 = Registry.sql(
      "SELECT CAST(floor(1e6 * exp(round(x))) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", bad2).nonEmpty,
      "round() inside the transcendental must not defuse the floor")
    // a round on a SIBLING operand dominates nothing
    val bad3 = Registry.sql(
      "SELECT CAST(floor(exp(y) + round(x)) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", bad3).nonEmpty,
      "round() on a sibling operand must not defuse the floor")
    // round DOMINATING the transcendental (any depth) stays defused
    val ok = Registry.sql(
      "SELECT CAST(floor(1e6 * (round(exp(x), 6))) AS BIGINT) AS v FROM t")
    assert(OracleLint.knifeEdge("t", ok).isEmpty,
      "a round that dominates the transcendental is a genuine defuse")
  }

  test("knife-edge plan lint: anchored defusing (r16 ADVICE) — buried Add(0.5)/Round do not defuse") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val bad1 = df.selectExpr("CAST(floor(1e6 * exp(x + 0.5)) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", bad1.queryExecution.analyzed).nonEmpty,
      "plan lint: +0.5 inside exp() must not defuse")
    val bad2 = df.selectExpr("CAST(floor(exp(y) + round(x)) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", bad2.queryExecution.analyzed).nonEmpty,
      "plan lint: Round on a sibling operand must not defuse")
    val ok = df.selectExpr("CAST(floor(1e6 * round(exp(x), 6)) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", ok.queryExecution.analyzed).isEmpty,
      "plan lint: a dominating Round is a genuine defuse")
  }

  test("knife-edge plan lint: flags a bare Floor(Exp) Spark plan and passes the half-up twin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(1.0, 2.0).toDF("x")
    val bad = df.selectExpr("CAST(floor(1e6 * exp(x)) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", bad.queryExecution.analyzed).nonEmpty,
      "plan lint missed Floor over Exp")
    val good = df.selectExpr("CAST(floor(1e6 * exp(x) + 0.5) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", good.queryExecution.analyzed).isEmpty)
    val arith = df.selectExpr("CAST(floor(1e6 * (x / 7.0)) AS BIGINT) AS v")
    assert(OracleLint.knifeEdgePlan("t", arith.queryExecution.analyzed).isEmpty,
      "plan lint must not flag pure arithmetic")
  }

  test("key-equality lint (r17): grouping/distinct/join keys on transcendental floats are flagged") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1.0, 2L), (2.0, 3L)).toDF("x", "k")
    // GROUP BY on a raw transcendental double — flagged
    val badGroup = df.groupBy(org.apache.spark.sql.functions.expr("ln(x)"))
      .count()
    assert(OracleLint.knifeEdgeKeys("t", badGroup.queryExecution.analyzed).nonEmpty,
      "key lint missed GROUP BY ln(x)")
    // round() does NOT defuse key equality (a 1-ULP input can straddle
    // the rounding boundary) — still flagged
    val badRounded = df.groupBy(org.apache.spark.sql.functions.expr("round(ln(x), 6)"))
      .count()
    assert(OracleLint.knifeEdgeKeys("t", badRounded.queryExecution.analyzed).nonEmpty,
      "key lint must not accept round() as an equality defuse")
    // DISTINCT over a transcendental — flagged
    val badDistinct = df.selectExpr("exp(x) AS e").distinct()
    assert(OracleLint.knifeEdgeKeys("t", badDistinct.queryExecution.analyzed).nonEmpty,
      "key lint missed DISTINCT exp(x)")
    // JOIN on a transcendental — flagged
    val badJoin = df.as("a").join(df.as("b"),
      org.apache.spark.sql.functions.expr("ln(a.x) = b.x"))
    assert(OracleLint.knifeEdgeKeys("t", badJoin.queryExecution.analyzed).nonEmpty,
      "key lint missed JOIN on ln(x)")
    // integer discretization with half-up re-keys exactly — clean
    val ok = df.groupBy(org.apache.spark.sql.functions
      .expr("CAST(floor(1e6 * ln(x) + 0.5) AS BIGINT)")).count()
    assert(OracleLint.knifeEdgeKeys("t", ok.queryExecution.analyzed).isEmpty,
      "integer re-keying must pass the key lint")
    // pure-arithmetic float keys are IEEE-deterministic — clean
    val okArith = df.groupBy(org.apache.spark.sql.functions.expr("x / 7.0")).count()
    assert(OracleLint.knifeEdgeKeys("t", okArith.queryExecution.analyzed).isEmpty,
      "key lint must not flag pure-arithmetic float keys")
    // plain integer/long keys — clean
    val okInt = df.groupBy("k").count()
    assert(OracleLint.knifeEdgeKeys("t", okInt.queryExecution.analyzed).isEmpty)
  }

  test("FP-accumulation lint (r18, half #4): exposed raw FP sums/avgs are flagged; rounded, decimal-cast, and integral forms pass") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val df = Seq((1.25, 2L), (2.5, 3L), (3.75, 5L)).toDF("x", "k")
    def plan(sel: String) =
      df.groupBy("k").agg(expr(sel)).queryExecution.analyzed
    // raw sum(double) exposed — the r17 jn_nullsafe_sumdbl class
    assert(OracleLint.knifeEdgeFpAgg("t", plan("sum(x) AS s"), "").nonEmpty,
      "half #4 missed a raw exposed sum(double)")
    // raw avg(double) — same accumulation-order hazard
    assert(OracleLint.knifeEdgeFpAgg("t", plan("avg(x) AS a"), "").nonEmpty,
      "half #4 missed a raw exposed avg(double)")
    // stddev over a double input — the co-moment family
    assert(OracleLint.knifeEdgeFpAgg("t", plan("stddev(x) AS sd"), "").nonEmpty,
      "half #4 missed stddev(double)")
    // round ABOVE the aggregate defuses (the fix class)
    assert(OracleLint.knifeEdgeFpAgg("t", plan("round(sum(x), 2) AS s"), "").isEmpty,
      "round(sum(x), d) must pass")
    // decimal cast above the aggregate defuses too
    assert(OracleLint.knifeEdgeFpAgg("t",
      plan("CAST(sum(x) AS DECIMAL(18,2)) AS s"), "").isEmpty,
      "CAST(sum(x) AS DECIMAL) must pass")
    // round BELOW the aggregate defuses nothing — summing rounded
    // values is still order-dependent (false-negative class pinned OUT)
    assert(OracleLint.knifeEdgeFpAgg("t", plan("sum(round(x, 2)) AS s"), "").nonEmpty,
      "sum(round(x, d)) is still an order-dependent accumulation")
    // sum/avg over INTEGRAL inputs are exact in the double buffer below
    // 2^53 — not flagged, including through a direct int→double cast
    assert(OracleLint.knifeEdgeFpAgg("t", plan("sum(k) AS s"), "").isEmpty,
      "sum(bigint) must pass (exact)")
    assert(OracleLint.knifeEdgeFpAgg("t", plan("avg(k) AS a"), "").isEmpty,
      "avg(bigint) must pass (exact sum, one division)")
    assert(OracleLint.knifeEdgeFpAgg("t",
      plan("sum(CAST(k AS DOUBLE)) AS s"), "").isEmpty,
      "sum(CAST(int AS DOUBLE)) must pass (integral values, exact)")
    // min/max over doubles are order-invariant — not flagged
    assert(OracleLint.knifeEdgeFpAgg("t", plan("max(x) AS m"), "").isEmpty)
    // a non-FP output type means a discretization already happened —
    // out of this half's scope by construction
    assert(OracleLint.knifeEdgeFpAgg("t",
      plan("CAST(floor(sum(x) + 0.5) AS BIGINT) AS s"), "").isEmpty)
    // TEXT half: a hazard-derived column whose ORACLE aliases a raw FP
    // aggregate is flagged even when the Spark side is defused…
    val defusedPlan = plan("round(sum(x), 2) AS s")
    assert(OracleLint.knifeEdgeFpAgg("t", defusedPlan,
      "SELECT k, sum(x) AS s FROM t GROUP BY k").nonEmpty,
      "text half must catch an undefused oracle alias for a hazard column")
    // …and passes when the oracle defuses identically
    assert(OracleLint.knifeEdgeFpAgg("t", defusedPlan,
      "SELECT k, round(sum(x), 2) AS s FROM t GROUP BY k").isEmpty,
      "identically-defused oracle must pass")
    // a later round(<col>) re-projection DOES defuse (the CTE pattern)…
    assert(OracleLint.knifeEdgeFpAgg("t", defusedPlan,
      "WITH b AS (SELECT k, sum(x) AS s FROM t GROUP BY k) " +
        "SELECT k, round(s, 2) AS s FROM b").isEmpty,
      "round(col) re-projection must defuse")
    // …but a NON-decimal recast does not (r18 review finding, pinned):
    // CAST(s AS DOUBLE) leaves the order-dependent value fully exposed
    assert(OracleLint.knifeEdgeFpAgg("t", defusedPlan,
      "WITH b AS (SELECT k, sum(x) AS s FROM t GROUP BY k) " +
        "SELECT k, CAST(s AS DOUBLE) AS s FROM b").nonEmpty,
      "CAST(col AS DOUBLE) re-projection must not defuse the text half")
  }
}
