package graft.queries

/** Driver-facing fuzz rows: three seeds × 25 machine-generated shapes,
  * each packed into one digest DataFrame whose DuckDB oracle is the SAME
  * 25 shapes rendered in DuckDB dialect (Fuzz.digestSql) — the t2
  * hash-compare contract, machine-generated (r16 verdict #1). The Spark
  * side is built through the DataFrame API (not spark.sql), so the
  * driver check crosses front-end, Catalyst (including the graft
  * optimizer rules — ~1/3 of shapes are null-safe joins that walk
  * LinearizeNullSafeCountAgg's fire/guard matrix), and execution against
  * an independent engine on every shape. FuzzSpec runs the wider 200-
  * shape in-JVM differential (DataFrame vs SQL front-end, rules on/off)
  * with a shrinker; these rows are the slice an independent engine
  * adjudicates.
  *
  * Seeds are arbitrary fixed constants; determinism is the point — the
  * same shapes regenerate identically every run, so these are ordinary
  * oracle rows, green-or-red like any hand-written one.
  */
object FuzzQueries {

  private def row(name: String, seed: Long): Q = {
    lazy val ss = Fuzz.shapes(seed, 25)
    Q(name,
      (s, d) => Fuzz.digestDf(s, d, ss),
      Some(Registry.sql(Fuzz.digestSql(ss))))
  }

  val all: Seq[Q] = Seq(
    row("fuzz_digest_a", 1001L),
    row("fuzz_digest_b", 1002L),
    row("fuzz_digest_c", 1003L),
    // r18: fourth seed — grows the cross-engine leg to 100 shapes as
    // the grammar gained its ring (right/full chains, composite keys,
    // expression keys/aggregates, chain-value aggregates)
    row("fuzz_digest_d", 1004L),
    // r19: fifth seed — 125 cross-engine shapes as ring 3 landed
    // (NOT IN over NULL-bearing subqueries, correlated EXISTS,
    // DECIMAL(12,2) keys/arguments, NULL-run LIMIT cuts)
    row("fuzz_digest_e", 1005L),
    // r20: sixth seed — 150 cross-engine shapes as ring 5 landed
    // (correlated scalar subqueries, explicit GROUPING SETS lists,
    // UNION/EXCEPT/INTERSECT set operators)
    row("fuzz_digest_f", 1006L),
    // r19 ring 4: the first machine-generated WINDOW coverage — 25
    // partitioned OVER shapes across the ranking (rank/dense_rank/
    // row_number), aggregate (sum/count — r20: all FOUR frame
    // spellings incl. the explicit-offset RANGE frame), offset (lag),
    // and distribution (ntile — r20: + percent_rank/cume_dist via
    // scale-round-cast digests) classes, digest-checked cross-engine
    {
      lazy val ws = Fuzz.winShapes(2001L, 25)
      Q("fuzz_digest_w",
        (s, d) => Fuzz.winDigestDf(s, d, ws),
        Some(Registry.sql(Fuzz.winDigestSql(ws))))
    },
    // r20: second window seed — 50 window shapes now cross-engine, so
    // the classes this round added (percent_rank/cume_dist via
    // scale-round-cast, explicit-offset RANGE frames) land in the
    // independently-adjudicated slice at two different draw streams
    {
      lazy val ws = Fuzz.winShapes(2002L, 25)
      Q("fuzz_digest_w2",
        (s, d) => Fuzz.winDigestDf(s, d, ws),
        Some(Registry.sql(Fuzz.winDigestSql(ws))))
    })
}
