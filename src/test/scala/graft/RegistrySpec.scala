package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared capability runs end-to-end at sf0.001 and yields rows.
  * (Value-level correctness is the driver's DuckDB oracle; this guards
  * against regressions that break a query entirely.) */
class RegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Legitimately empty at sf0.001 (tiny data): the oracle still verifies
  // value-level equality for these.
  private val mayBeEmpty = Set("except_set", "dedup_cosine")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.fn(spark, TestSpark.Sf)
      assert(df.columns.nonEmpty)
      // ORACLE TYPING LINT (r11 verdict #2): no raw integer sum() may be
      // exposed to a BIGINT output column — DuckDB would hash it HUGEINT.
      // KNIFE-EDGE LINT (r15 verdict #2): no bare floor / float→int cast
      // over a transcendental without half-up, on EITHER side — the text
      // lint sweeps the oracle SQL, the plan lint the Spark analyzed plan.
      // KEY-EQUALITY LINT (r17, the r16 watch-item): no grouping /
      // distinct / join key may be a transcendental-bearing float.
      // FP-ACCUMULATION LINT (r18, the r17 driver red): no exposed raw
      // FP-accumulated aggregate without a defusing round/decimal-cast,
      // on EITHER side.
      q.oracle.foreach { o =>
        val v = queries.OracleLint.check(q.name, df.schema, o) ++
          queries.OracleLint.knifeEdge(q.name, o) ++
          queries.OracleLint.knifeEdgePlan(q.name, df.queryExecution.analyzed) ++
          queries.OracleLint.knifeEdgeKeys(q.name, df.queryExecution.analyzed) ++
          queries.OracleLint.knifeEdgeFpAgg(q.name, df.queryExecution.analyzed, o)
        assert(v.isEmpty, v.mkString("; "))
      }
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
