package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.{dropManaged, sql}

/** Round-13 golden wave 8 — mid-tail HiveCompatibility families
  * (reference sql/hive/src/test/scala/org/apache/spark/sql/hive/
  * execution/HiveCompatibilitySuite.scala:246 whiteList; golden files
  * under sql/hive/src/test/resources/golden/):
  *
  *   - `correlationoptimizer7`/`8` (~35 files): a map-join (broadcast)
  *     must not break the streamed side's partitioning — an aggregation
  *     keyed on (a superset of) the same key after the broadcast join
  *     adds NO exchange. The 100 TB property: broadcast joins preserve
  *     partitioning, so agg → BHJ → agg costs ONE shuffle total.
  *   - `udf_xpath_*` (~50 files across the xpath family): XPath
  *     extraction over literal XML — Spark ships native xpath functions;
  *     the oracle pins the golden outputs literally (exactly what the
  *     reference golden files are).
  *   - `udf_translate`/`udf_conv`/`udf_field`/`udf_sign`/`udf_if`/
  *     `udf_length`(~70 files): scalar grids with cross-engine spellings.
  *   - `varchar_join1`/`varchar_union1`/`alter_varchar1` (~60 files):
  *     CHAR(n) pads on write and compares padded; VARCHAR(n) stores
  *     as-is. The grid pins lengths, padded equality, and the
  *     CHAR-vs-VARCHAR join behavior.
  *   - `show_columns` (16 files): SHOW COLUMNS catalog introspection.
  *   - `mapjoin_distinct` (16 files): DISTINCT over a broadcast join —
  *     the dedup shuffles once on the projected columns, the join not at
  *     all (PlanSpec-fenced).
  */
object Sql23Queries {

  val all: Seq[Q] = Seq(

    // ── correlationoptimizer7/8: BHJ preserves partitioning ───────────
    // orders agg by custkey (the ONLY shuffle) → broadcast customer dim
    // → re-aggregate on (custkey-subset ⊆ {custkey, segment}) rides the
    // existing partitioning. PlanSpec pins 1 exchange / 1 BHJ total.
    Q("sql_bhj_partitioning_chain",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_bpc_o")
        table(s, d, "customer").createOrReplaceTempView("graft_bpc_c")
        s.sql(sql("""
          WITH g AS (SELECT o_custkey AS k, count(*) AS n,
                            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                 AS BIGINT) AS cents
                     FROM graft_bpc_o GROUP BY o_custkey)
          SELECT g.k AS k, c.c_mktsegment AS seg,
                 CAST(sum(g.n) AS BIGINT) AS n, CAST(sum(g.cents) AS BIGINT) AS cents
          FROM g JOIN graft_bpc_c c ON g.k = c.c_custkey
          WHERE g.k <= 300
          GROUP BY g.k, c.c_mktsegment"""))
      },
      Some(sql("""
        WITH g AS (SELECT o_custkey AS k, count(*) AS n,
                          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) AS cents
                   FROM orders GROUP BY o_custkey)
        SELECT g.k AS k, c.c_mktsegment AS seg,
               CAST(sum(g.n) AS BIGINT) AS n, CAST(sum(g.cents) AS BIGINT) AS cents
        FROM g JOIN customer c ON g.k = c.c_custkey
        WHERE g.k <= 300
        GROUP BY g.k, c.c_mktsegment"""))),

    // ── udf_xpath family: native XPath extraction ─────────────────────
    // The golden files pin literal outputs; the oracle does the same.
    Q("expr_xpath_grid",
      (s, _) => s.sql(sql(s"""
        SELECT xpath_string('<a><b>bb</b><c>cc</c></a>', 'a/c') AS xs,
               xpath_int('<a><b>3</b></a>', 'a/b') AS xi,
               xpath_double('<a><b>1.5</b></a>', 'a/b') AS xd,
               CAST(xpath_boolean('<a><b>1</b></a>', 'a/b') AS INT) AS xb,
               ${"array_join(xpath('<a><b>b1</b><b>b2</b></a>', 'a/b/text()'), '|')"} AS xl,
               xpath_string('<a><b>bb</b></a>', 'a/missing') AS xmiss""")),
      Some(sql("""
        SELECT 'cc' AS xs, 3 AS xi, CAST(1.5 AS DOUBLE) AS xd, 1 AS xb,
               'b1|b2' AS xl, '' AS xmiss"""))),

    // ── udf_translate/conv/field/sign/if grids ────────────────────────
    Q("expr_misc_udfs2",
      (s, _) => s.sql(sql("""
        SELECT translate('abcba', 'ab', 'xy') AS tr,
               conv('ff', 16, 10) AS cv16,
               conv('255', 10, 2) AS cv2,
               array_position(array('a', 'b', 'c'), 'b') AS fld,
               sign(-3.5) AS sg_neg, sign(0.0) AS sg_zero,
               if(3 > 2, 'y', 'n') AS cond,
               instr('abcd', 'cd') AS pos,
               elt(2, 'x', 'y', 'z') AS pick,
               repeat('ab', 3) AS rep,
               length('héllo') AS len_uni,
               reverse('abc') AS rev""")),
      Some(sql("""
        SELECT translate('abcba', 'ab', 'xy') AS tr,
               '255' AS cv16, '11111111' AS cv2,
               CAST(list_position(['a','b','c'], 'b') AS BIGINT) AS fld,
               CAST(sign(-3.5) AS DOUBLE) AS sg_neg,
               CAST(sign(0.0) AS DOUBLE) AS sg_zero,
               CASE WHEN 3 > 2 THEN 'y' ELSE 'n' END AS cond,
               CAST(instr('abcd', 'cd') AS INT) AS pos,
               (['x','y','z'])[2] AS pick,
               repeat('ab', 3) AS rep,
               CAST(length('héllo') AS INT) AS len_uni,
               reverse('abc') AS rev"""))),

    // ── varchar/char semantics grid ───────────────────────────────────
    // CHAR(6) pads on write (reads back space-padded, compares equal to
    // the rpad'd literal); VARCHAR(6) stores as-is. No whitespace-
    // sensitive literals anywhere (Registry.sql collapses runs of
    // spaces): padding is asserted via rpad() and made visible by
    // mapping pad spaces to '_' in the framed rendering.
    Q("sql_char_varchar",
      (s, d) => {
        dropManaged(s, "graft_cv")
        s.sql("CREATE TABLE graft_cv (c CHAR(6), v VARCHAR(6)) USING parquet")
        s.sql("INSERT INTO graft_cv VALUES ('ab', 'ab'), ('exact6', 'exact6')")
        s.sql(sql("""
          SELECT length(c) AS len_c, length(v) AS len_v,
                 CAST(c = rpad('ab', 6, ' ') AS INT) AS c_padded_eq,
                 CAST(rtrim(c) = v AS INT) AS trim_eq,
                 concat('<', replace(c, ' ', '_'), '>') AS framed
          FROM graft_cv ORDER BY len_v"""))
      },
      Some(sql("""
        SELECT 6 AS len_c, 2 AS len_v, 1 AS c_padded_eq, 1 AS trim_eq,
               '<ab____>' AS framed
        UNION ALL SELECT 6, 6, 0, 1, '<exact6>'"""))),

    // ── show_columns: catalog column introspection ────────────────────
    Q("sql_show_columns",
      (s, d) => {
        dropManaged(s, "graft_shc")
        s.sql(sql("""CREATE TABLE graft_shc
                     (k BIGINT, name STRING, bal DOUBLE) USING parquet
                     PARTITIONED BY (st STRING)"""))
        s.sql("SHOW COLUMNS IN graft_shc")
      },
      Some(sql("""
        SELECT 'k' AS col_name UNION ALL SELECT 'name'
        UNION ALL SELECT 'bal' UNION ALL SELECT 'st'"""))),

    // ── mapjoin_distinct: DISTINCT over a broadcast join ──────────────
    // The join must not shuffle (dim broadcasts); the DISTINCT shuffles
    // once on the projected pair. PlanSpec pins 1 BHJ + 1 exchange.
    Q("sql_mapjoin_distinct",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_mjd_o")
        table(s, d, "customer").createOrReplaceTempView("graft_mjd_c")
        s.sql(sql("""
          SELECT DISTINCT c.c_mktsegment AS seg, o.o_orderpriority AS pri
          FROM graft_mjd_o o JOIN graft_mjd_c c ON o.o_custkey = c.c_custkey"""))
      },
      Some(sql("""
        SELECT DISTINCT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")))
  )
}
