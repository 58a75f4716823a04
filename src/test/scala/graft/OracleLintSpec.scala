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
}
