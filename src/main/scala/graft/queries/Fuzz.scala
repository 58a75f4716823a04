package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential fuzz harness (r16 verdict #1): a seeded generator over
  * the grammar the engine already claims —
  *
  *   scan → derived nullable key → [inner/left/right/full/semi/anti
  *   join on `=` or `<=>`, optionally COMPOSITE (a second non-null
  *   equality component)] → [second hop on rk, ANY join type incl.
  *   right/full] → post-join filter [+ uncorrelated IN-subquery over
  *   lv — the RewritePredicateSubquery surface; r19: + NOT IN over an
  *   optionally NULL-bearing subquery (the null-aware anti join /
  *   three-valued-logic trap) + correlated EXISTS / NOT EXISTS (the
  *   decorrelation surface) + uncorrelated SCALAR-subquery comparisons
  *   + non-equi correlated EXISTS (the BroadcastNestedLoop semi
  *   path) + (r20) CORRELATED scalar-subquery comparisons (the
  *   decorrelation-to-left-outer-aggregate path)] → group-by on key
  *   functions, CASE/arith — plain, or ROLLUP/CUBE (r19) or an
  *   explicit irregular GROUPING SETS list (r20) through the
  *   Expand-based aggregation path — expressions, a STRING-cast key,
  *   and (r19) a DECIMAL(12,2)-cast key → count/sum/min/max/
  *   count-distinct over first-hop AND chain columns, incl. expression
  *   and (r19) DECIMAL-typed arguments (+ HAVING) → order/limit, with
  *   (r19) small limits deliberately cutting inside the NULLS-FIRST
  *   run of a nullable leading key. r20 ring 5c: ~1/6 of shapes
  *   replace the join entirely with a SET OPERATOR — UNION [ALL] /
  *   EXCEPT [ALL] / INTERSECT [ALL] between the two scan terms (the
  *   distinct variants merge the NULL stripes — not-distinct
  *   semantics). (Rings: 1-2 r18, 3-4 r19, 5 r20.)
  *
  * — with every generated shape rendered THREE ways from one AST:
  *   (a) a Spark DataFrame plan (the primary leg — the API users call),
  *   (b) Spark SQL text (the in-JVM differential leg: same engine,
  *       different front-end; FuzzSpec hash-compares (a) vs (b) and,
  *       for null-safe shapes, (a) with the graft optimizer rules ON
  *       vs OFF — the machine-generated guard on
  *       LinearizeNullSafeCountAgg's rewrite+guards),
  *   (c) DuckDB SQL (the driver oracle leg: FuzzQueries packs shapes
  *       into digest registry rows whose DuckDB twin is the same
  *       shapes rendered in (c) — the t2 contract, machine-generated).
  *
  * The hand-curated ~740-row registry proves what the builder thought to
  * declare; this is the reference's HiveCompatibilitySuite idea
  * (reference sql/hive/src/test/scala/.../HiveCompatibilitySuite.scala:246
  * — breadth via a corpus nobody hand-picked) aimed at the queries
  * nobody wrote. Everything is SEEDED and deterministic: scala.util
  * .Random's LCG is specified, so the same seed generates the same
  * shapes on every JVM, and the digest rows are ordinary oracle rows.
  *
  * Dialect notes (the entire cross-engine surface, kept deliberately
  * tiny so both renderings are provably the same query):
  *   - null-safe equality: `<=>` (Spark) vs IS NOT DISTINCT FROM (DuckDB);
  *   - semi/anti: LEFT SEMI/ANTI JOIN (Spark) vs EXISTS/NOT EXISTS (DuckDB);
  *   - ORDER BY spells ASC NULLS FIRST explicitly (DuckDB defaults
  *     NULLS LAST; Spark NULLS FIRST — an implicit spelling would
  *     diverge exactly when a LIMIT cuts at the NULL group);
  *   - exposed integer sums are CAST(... AS BIGINT) in DuckDB only
  *     (the ORACLE TYPING RULE — HUGEINT vs BIGINT hash divergence);
  *   - ROLLUP/CUBE over an EMPTY input: DuckDB emits the standard's
  *     ()-set grand-total row (count=0), Spark 4 emits no rows — the
  *     duck rendering carries HAVING count(*) > 0 on grouping-set
  *     shapes to pin Spark's semantics (see the rendering comment).
  *
  * Scale posture: scan terms are deterministically SAMPLED (id % S < C
  * with per-table S sized so each term stays ≤ ~2.5k rows at sf0.1) and
  * the NULL stripe is a bounded fraction, so even the worst generated
  * shape (a null-safe full join whose guard keeps the verbatim
  * quadratic bucket) executes in bounded time at every SF the driver
  * runs. All values are integral; digest checksums are bounded ≤ ~1e13,
  * far inside BIGINT on both engines.
  */
object Fuzz {

  /** One scan term: a sampled table projected to a derived nullable
    * join key `k` and an integral value column `v`. */
  final case class ScanSpec(
      table: String, // parquet table name
      idCol: String, // deterministic sampling + null-trigger column
      keyCol: String, // source column for the join key
      valCol: String, // integral value column
      keyMod: Int, // k = keyCol % keyMod (bounds the group count)
      nullP: Int, // k NULL when idCol % nullP == 0 (bounded stripe)
      sampS: Int,
      sampC: Int) { // keep rows with idCol % sampS < sampC

    def df(spark: SparkSession, dir: String, kName: String, vName: String): DataFrame =
      graft.Engine.table(spark, dir, table)
        .filter(col(idCol) % sampS < sampC)
        .select(
          when(col(idCol) % nullP === 0, lit(null))
            .otherwise(col(keyCol) % keyMod).as(kName),
          col(valCol).as(vName))

    /** `tbl` maps logical table name → referenced relation (bare names
      * for DuckDB; `fuzz_`-prefixed temp views for the in-JVM Spark SQL
      * leg, so the shared test session's catalog is never shadowed). */
    def sql(kName: String, vName: String, tbl: String => String): String =
      s"SELECT CASE WHEN $idCol % $nullP = 0 THEN NULL " +
        s"ELSE $keyCol % $keyMod END AS $kName, $valCol AS $vName " +
        s"FROM ${tbl(table)} WHERE $idCol % $sampS < $sampC"

    /** VALUES-ONLY renderings for the IN-subquery decoration (r18 ring
      * 2): just the sampled value column — keyCol/keyMod/nullP do NOT
      * apply (no derived key, no NULL stripe). Paired here so the DF
      * semi-join leg and the SQL `IN (…)` text cannot drift apart. */
    def valuesDf(spark: SparkSession, dir: String, name: String): DataFrame =
      graft.Engine.table(spark, dir, table)
        .filter(col(idCol) % sampS < sampC)
        .select(col(valCol).as(name))

    def valuesSql(tbl: String => String): String =
      s"SELECT $valCol FROM ${tbl(table)} WHERE $idCol % $sampS < $sampC"

    /** NOT-IN renderings (r19 ring 3): the sampled value column with an
      * OPTIONAL NULL stripe (idCol % nullP == 0 → NULL). One NULL in a
      * NOT IN subquery poisons every comparison to UNKNOWN and the
      * result goes EMPTY — the classic three-valued-logic trap; Spark
      * plans it as the null-aware anti join. Paired here so the DF
      * anti-join leg and the SQL `NOT IN (…)` text cannot drift. */
    def notInDf(spark: SparkSession, dir: String, name: String,
        withNulls: Boolean): DataFrame =
      graft.Engine.table(spark, dir, table)
        .filter(col(idCol) % sampS < sampC)
        .select(
          (if (withNulls)
            when(col(idCol) % nullP === 0, lit(null)).otherwise(col(valCol))
          else col(valCol)).as(name))

    def notInSql(tbl: String => String, withNulls: Boolean): String =
      if (withNulls)
        s"SELECT CASE WHEN $idCol % $nullP = 0 THEN NULL ELSE $valCol END " +
          s"FROM ${tbl(table)} WHERE $idCol % $sampS < $sampC"
      else valuesSql(tbl)

    /** WINDOW-input renderings (r19 ring 4): the derived nullable key,
      * the value, and the id (a unique tiebreaker — ROWS frames and
      * row_number need a TOTAL order or the result is draw-dependent).
      * Paired so the DF Window leg and the OVER(...) texts agree. */
    def winDf(spark: SparkSession, dir: String): DataFrame =
      graft.Engine.table(spark, dir, table)
        .filter(col(idCol) % sampS < sampC)
        .select(
          when(col(idCol) % nullP === 0, lit(null))
            .otherwise(col(keyCol) % keyMod).as("k"),
          col(valCol).as("v"),
          col(idCol).as("i"))

    def winSql(tbl: String => String): String =
      s"SELECT CASE WHEN $idCol % $nullP = 0 THEN NULL " +
        s"ELSE $keyCol % $keyMod END AS k, $valCol AS v, $idCol AS i " +
        s"FROM ${tbl(table)} WHERE $idCol % $sampS < $sampC"
  }

  /** A grouping expression with its three renderings kept in lockstep. */
  final case class GroupKey(name: String, dfCol: Column, sqlExpr: String)
  /** An aggregate with its renderings; sumLike marks exposed integer
    * sums that need the DuckDB-side BIGINT cast. */
  final case class AggCol(name: String, dfCol: Column, sqlExpr: String, sumLike: Boolean)

  /** A second join hop chained onto the FIRST join's right key
    * (`r.rk ~ t.tk`): covers multi-join reorder/pushdown, semi/anti
    * over a join OUTPUT, and NULL propagation through two joins (an
    * outer first hop feeds NULL rk into the second condition; an r18
    * RIGHT/FULL second hop feeds t-only rows with EVERY first-hop
    * column NULL back up into the grouping — the outer-chain reorder
    * surface the r17 verdict called out). Only generated when the
    * first hop keeps the right side visible. */
  final case class ChainSpec(scan: ScanSpec, joinType: String, nullSafe: Boolean)

  final case class ShapeSpec(
      id: Int,
      left: ScanSpec,
      right: ScanSpec,
      joinType: String, // inner | left | right | full | semi | anti
      nullSafe: Boolean,
      // r18: composite two-column key — the equality condition gains a
      // second NON-nullable component (lv % 4 = rv % 4) next to the
      // nullable first one: the jn_composite class, machine-generated.
      // Under `=` a NULL first component kills the match; under `<=>`
      // the NULL bucket still forms but only across matching second
      // components. The extra conjunct also walks
      // LinearizeNullSafeCountAgg's single-EqualNullSafe guard.
      composite: Boolean,
      chain: Option[ChainSpec], // second hop on rk (any join type, r18)
      postFilter: Option[(String, Int)], // (op, literal) over lv
      // r18 ring 2: an uncorrelated IN-subquery filter over lv — the
      // RewritePredicateSubquery surface (IN → left-semi planning).
      // DF leg spells it as the semi join it plans to; SQL legs spell
      // `lv IN (SELECT …)`. Identical for the positive-IN case even
      // with NULLs on either side (no-match and UNKNOWN both drop).
      inFilter: Option[ScanSpec],
      // r19 ring 3a: `lv NOT IN (SELECT …)` with an optional NULL
      // stripe in the subquery — the three-valued-logic trap the
      // positive ring sidestepped. With a NULL present the result must
      // go EMPTY; Spark's RewritePredicateSubquery plans the NULL-AWARE
      // anti join (condition `lv = v OR isnull(lv = v)`), and the DF
      // leg spells exactly that anti join, so the SQL-vs-DF
      // differential machine-exercises the plan path.
      notInFilter: Option[(ScanSpec, Boolean)], // (subquery, withNulls)
      // r19 ring 3b: correlated [NOT] EXISTS over lv — the other half
      // of the subquery surface (decorrelation). DF leg: the semi/anti
      // join the decorrelator plans to; SQL legs spell the correlated
      // EXISTS identically in both dialects (bare `lv` correlates to
      // the outer scope; the subquery column is named `ev` so nothing
      // shadows it).
      existsFilter: Option[(ScanSpec, Boolean)], // (subquery, negated)
      // r19 ring 3e: an UNCORRELATED SCALAR subquery in a comparison —
      // `lv <= (SELECT max(…))` / `lv >= (SELECT min(…))` — the
      // RewriteSubquery→scalar path. DF leg spells the plan it lowers
      // to: a 1-row global aggregate cross-joined and filtered. An
      // EMPTY subquery yields scalar NULL → UNKNOWN → all rows drop,
      // identically on both derivations.
      scalarFilter: Option[(ScanSpec, Boolean)], // (subquery, useMax)
      // r19 ring 3f: a NON-EQUI correlated EXISTS —
      // `EXISTS (SELECT 1 FROM e WHERE e.ev < lv)` — decorrelates to a
      // non-equality left-semi join (the BroadcastNestedLoop semi
      // path, a different physical operator class from every equi
      // decoration above). Terms are sampled small, so the
      // quadratic-comparison semi stays bounded at every SF the
      // driver runs.
      existsIneq: Option[ScanSpec],
      // r19 ring 3g: grouping-set mode — 0 plain GROUP BY, 1 ROLLUP,
      // 2 CUBE (the Expand-based aggregation path in both engines);
      // r20 ring 5b: 3 = an EXPLICIT GROUPING SETS list (`groupSets`) —
      // an irregular set list stresses the Expand bitmask differently
      // from the ROLLUP/CUBE sugar (sets may repeat a key, skip a key
      // entirely, or be just `()`). Grouping-set shapes carry NO
      // ORDER BY/LIMIT: a rolled-up subtotal row can collide textually
      // with a data group whose nullable key is NULL — (NULL, NULL)
      // from the grand total vs the NULL-stripe group — making a
      // key-ordered LIMIT cut ambiguous between rows with different
      // aggregate values; the digest is order-independent, so nothing
      // is lost.
      groupMode: Int,
      groupKeys: Seq[GroupKey],
      aggs: Seq[AggCol],
      havingMin: Option[Int], // HAVING count(*) >= h (a0 always present)
      limit: Option[Int], // with total ORDER BY over the group keys
      // r20 ring 5a: a CORRELATED scalar subquery in a comparison —
      // `lv <= (SELECT max(ev) FROM e WHERE e.ek = lk)` — the
      // decorrelation-to-left-outer-AGGREGATE path (ring 3e's scalar
      // was uncorrelated: a 1-row cross join, a different plan class
      // entirely). DF leg spells the decorrelated plan: group the
      // subquery by its key, LEFT-join on lk = ek, filter on the
      // aggregate (no match → NULL → UNKNOWN → row drops — identical
      // to the empty-correlated-set semantics, incl. for NULL lk,
      // which `=` never matches).
      corrScalar: Option[(ScanSpec, Boolean)] = None, // (subquery, useMax)
      // r20 ring 5c: a SET OPERATOR between the two scan terms instead
      // of a join — UNION [ALL] / EXCEPT [ALL] / INTERSECT [ALL]
      // (reference basicOperators.scala:77/:200/:214; both engines
      // spell them identically). The distinct variants treat NULL keys
      // as equal (the NULL stripes of both terms MERGE — the not-
      // distinct semantics joins can't reach); joinType/nullSafe/
      // composite/chain do not apply and are generated inert.
      setOp: Option[String] = None,
      // the explicit set list for groupMode 3 (names into groupKeys;
      // may include the empty set)
      groupSets: Seq[Seq[String]] = Nil,
      // r20 ring 5e: each set-op BRANCH may itself be a join subtree —
      // an inner equi-join of an extra sampled term on the branch's
      // derived key, still projecting (lk, lv). The join multiplies
      // rows per key, so EXCEPT ALL / INTERSECT ALL exercise genuine
      // BAG arithmetic (multiplicity subtraction/minimum) over
      // join-made duplicates, and the distinct variants collapse them
      // — the full "set operator between two generated subtrees"
      // shape. (An inner `=` join also drops the branch's NULL stripe,
      // so mixed joined/unjoined shapes cover both NULL regimes.)
      setJoinL: Option[ScanSpec] = None,
      setJoinR: Option[ScanSpec] = None) {

    def df(spark: SparkSession, dir: String): DataFrame = {
      var cur = setOp match {
        case Some(op) =>
          // both branches projected to the SAME (lk, lv) schema; DF set
          // ops resolve by position, mirroring the SQL text exactly.
          // ring 5e: a branch with a setJoin is an inner equi-join
          // subtree (row multiplication feeds the bag semantics).
          def branch(sc: ScanSpec, jn: Option[ScanSpec]): DataFrame = {
            val b = sc.df(spark, dir, "lk", "lv")
            jn match {
              case Some(js) =>
                val j = js.df(spark, dir, "jk", "jv")
                b.join(j, b("lk") === j("jk"), "inner").select(b("lk"), b("lv"))
              case None => b
            }
          }
          val lf = branch(left, setJoinL)
          val rf = branch(right, setJoinR)
          op match {
            case "UNION" => lf.union(rf).distinct()
            case "UNION ALL" => lf.union(rf)
            case "EXCEPT" => lf.except(rf)
            case "EXCEPT ALL" => lf.exceptAll(rf)
            case "INTERSECT" => lf.intersect(rf)
            case _ => lf.intersectAll(rf)
          }
        case None =>
          val lf = left.df(spark, dir, "lk", "lv")
          val rf = right.df(spark, dir, "rk", "rv")
          val eq = if (nullSafe) lf("lk") <=> rf("rk") else lf("lk") === rf("rk")
          val cond = if (composite) eq && (lf("lv") % 4 === rf("rv") % 4) else eq
          val how = joinType match {
            case "semi" => "left_semi"
            case "anti" => "left_anti"
            case t => t
          }
          lf.join(rf, cond, how)
      }
      chain.foreach { c =>
        val tf = c.scan.df(spark, dir, "tk", "tv")
        val cond2 = if (c.nullSafe) cur("rk") <=> tf("tk") else cur("rk") === tf("tk")
        val how2 = c.joinType match {
          case "semi" => "left_semi"
          case "anti" => "left_anti"
          case t => t
        }
        cur = cur.join(tf, cond2, how2)
      }
      postFilter.foreach { case (op, v) =>
        cur = cur.filter(op match {
          case ">" => col("lv") > v
          case "<=" => col("lv") <= v
          case _ => col("lv") % 2 === (v % 2)
        })
      }
      inFilter.foreach { iv =>
        val sub = iv.valuesDf(spark, dir, "iv")
        cur = cur.join(sub, cur("lv") === sub("iv"), "left_semi")
      }
      notInFilter.foreach { case (nv, withNulls) =>
        val sub = nv.notInDf(spark, dir, "nv", withNulls)
        // the NULL-AWARE anti join — exactly the condition
        // RewritePredicateSubquery plans NOT IN to: a row is dropped
        // when ANY subquery row matches OR compares UNKNOWN
        val eq = cur("lv") === sub("nv")
        cur = cur.join(sub, eq || eq.isNull, "left_anti")
      }
      existsFilter.foreach { case (ev, negated) =>
        val sub = ev.valuesDf(spark, dir, "ev")
        cur = cur.join(sub, cur("lv") === sub("ev"),
          if (negated) "left_anti" else "left_semi")
      }
      scalarFilter.foreach { case (sv, useMax) =>
        val agg = sv.valuesDf(spark, dir, "sv")
          .agg((if (useMax) max(col("sv")) else min(col("sv"))).as("graft_sb"))
        cur = cur.crossJoin(agg)
          .filter(if (useMax) col("lv") <= col("graft_sb")
            else col("lv") >= col("graft_sb"))
          .drop("graft_sb")
      }
      existsIneq.foreach { iv =>
        val sub = iv.valuesDf(spark, dir, "qv")
        cur = cur.join(sub, cur("lv") > sub("qv"), "left_semi")
      }
      corrScalar.foreach { case (cs, useMax) =>
        // the decorrelated plan Spark lowers a correlated scalar
        // aggregate to: aggregate-by-correlation-key, LEFT outer join,
        // filter. NULL lk never matches via `=`, so its aggregate stays
        // NULL and the comparison drops the row — exactly the
        // empty-correlated-set semantics of the SQL rendering.
        val agg = cs.df(spark, dir, "ek", "ev")
          .groupBy(col("ek"))
          .agg((if (useMax) max(col("ev")) else min(col("ev"))).as("graft_cc"))
        cur = cur.join(agg, cur("lk") === agg("ek"), "left")
          .filter(if (useMax) col("lv") <= col("graft_cc")
            else col("lv") >= col("graft_cc"))
          .drop("ek", "graft_cc")
      }
      // r20 ring 5d: every grouping-set shape (modes 1-3) carries a
      // grouping marker over ALL keys — it disambiguates subtotal rows
      // from NULL-stripe data rows in the digest and machine-exercises
      // the grouping() metadata function cross-engine. Spelled as an
      // EXPLICIT weighted sum of per-key grouping() bits (our own
      // canonical numbering) rather than grouping_id(keys...):
      // grouping_id is ORDER-SENSITIVE against the engine-DERIVED
      // grouping-column order, which for GROUPING SETS follows the
      // sets' appearance order, not the select order — Spark raises
      // GROUPING_ID_COLUMN_MISMATCH when they differ (found by this
      // ring's first run); per-key grouping() has no such constraint.
      // The DF arguments must be the same UNALIASED grouping
      // expressions for the analyzer's semantic match (the groupingSets
      // finding below), so modes 1-3 pass unaliased keys throughout and
      // toDF renames positionally.
      val marker =
        if (groupMode != 0)
          Seq(groupKeys.zipWithIndex.map { case (g, j) =>
            grouping(g.dfCol).cast("long") * (1L << (groupKeys.size - 1 - j))
          }.reduce(_ + _).as("gg"))
        else Nil
      val aggCols = aggs.map(a => a.dfCol.as(a.name)) ++ marker
      val keyCols = groupKeys.map(g => g.dfCol.as(g.name))
      var out =
        if (groupKeys.isEmpty) cur.agg(aggCols.head, aggCols.tail: _*)
        else (groupMode match {
          case 1 => cur.rollup(groupKeys.map(_.dfCol): _*)
          case 2 => cur.cube(groupKeys.map(_.dfCol): _*)
          case 3 =>
            // Spark 4's DataFrame spelling of explicit GROUPING SETS.
            // BOTH the set entries and the cols must be the UNALIASED
            // grouping expressions — an aliased col breaks the
            // analyzer's semantic match against the set entries and the
            // key silently degrades to the not-grouped NULL (found by
            // this ring's first run); toDF below renames positionally.
            val byName = groupKeys.map(g => g.name -> g.dfCol).toMap
            cur.groupingSets(groupSets.map(_.map(byName)), groupKeys.map(_.dfCol): _*)
          case _ => cur.groupBy(keyCols: _*)
        })
          .agg(aggCols.head, aggCols.tail: _*)
          // groupBy(expr.as(name)) exposes the grouping under its alias
          .toDF(outCols: _*)
      havingMin.foreach(h => out = out.filter(col("a0") >= h))
      limit.foreach { n =>
        out = out
          .orderBy(groupKeys.map(g => col(g.name).asc_nulls_first): _*)
          .limit(n)
      }
      out
    }

    /** One SQL text for both engines modulo the three dialect points. */
    def sqlFor(duck: Boolean): String = {
      val tbl: String => String = if (duck) identity else "fuzz_" + _
      def eqOp(ns: Boolean)(l: String, r: String): String =
        if (ns) {
          if (duck) s"$l IS NOT DISTINCT FROM $r" else s"$l <=> $r"
        } else s"$l = $r"
      def kw(jt: String): String = jt match {
        case "semi" => "LEFT SEMI JOIN"
        case "anti" => "LEFT ANTI JOIN"
        case "inner" => "JOIN"
        case t => t.toUpperCase + " JOIN"
      }
      val lT = s"(${left.sql("lk", "lv", tbl)}) l"
      val rT = s"(${right.sql("rk", "rv", tbl)}) r"
      val comp = if (composite) " AND l.lv % 4 = r.rv % 4" else ""
      // DuckDB has no SEMI/ANTI join keyword — spell via [NOT] EXISTS
      var fromHasWhere = false
      var from = setOp match {
        // ring 5c: the set operator replaces the join — both branches
        // project the same (lk, lv) schema; the operator keyword is
        // spelled identically in both dialects. ring 5e: a joined
        // branch renders the same inner equi-join subtree the DF leg
        // builds.
        case Some(op) =>
          def branchSql(sc: ScanSpec, jn: Option[ScanSpec],
              al: String, jal: String): String = jn match {
            case Some(js) =>
              s"SELECT $al.lk AS lk, $al.lv AS lv " +
                s"FROM (${sc.sql("lk", "lv", tbl)}) $al " +
                s"JOIN (${js.sql("jk", "jv", tbl)}) $jal ON $al.lk = $jal.jk"
            case None => sc.sql("lk", "lv", tbl)
          }
          s"((${branchSql(left, setJoinL, "bl", "el")}) $op " +
            s"(${branchSql(right, setJoinR, "br", "er")})) u"
        case None =>
          if (duck && (joinType == "semi" || joinType == "anti")) {
            fromHasWhere = true
            val not = if (joinType == "anti") "NOT " else ""
            s"$lT WHERE ${not}EXISTS (SELECT 1 FROM $rT " +
              s"WHERE ${eqOp(nullSafe)("r.rk", "l.lk")}$comp)"
          } else s"$lT ${kw(joinType)} $rT ON ${eqOp(nullSafe)("l.lk", "r.rk")}$comp"
      }
      chain.foreach { c =>
        val tT = s"(${c.scan.sql("tk", "tv", tbl)}) t"
        if (duck && (c.joinType == "semi" || c.joinType == "anti")) {
          // wrap the first hop so the EXISTS correlates against its
          // output (chain only exists when hop 1 is a visible join, so
          // `from` is a plain join fragment here)
          val not = if (c.joinType == "anti") "NOT " else ""
          from = s"(SELECT lk, lv, rk, rv FROM $from) j " +
            s"WHERE ${not}EXISTS (SELECT 1 FROM $tT " +
            s"WHERE ${eqOp(c.nullSafe)("t.tk", "j.rk")})"
          fromHasWhere = true
        } else {
          from = s"$from ${kw(c.joinType)} $tT ON ${eqOp(c.nullSafe)("r.rk", "t.tk")}"
        }
      }
      val preds = postFilter.map { case (op, v) =>
        op match {
          case ">" => s"lv > $v"
          case "<=" => s"lv <= $v"
          case _ => s"lv % 2 = ${v % 2}"
        }
      }.toSeq ++ inFilter.map(iv => s"lv IN (${iv.valuesSql(tbl)})").toSeq ++
        notInFilter.map { case (nv, withNulls) =>
          s"lv NOT IN (${nv.notInSql(tbl, withNulls)})" }.toSeq ++
        existsFilter.map { case (ev, negated) =>
          val not = if (negated) "NOT " else ""
          // bare `lv` correlates to the outer scope in both dialects;
          // the subquery's own column is `ev`, so nothing shadows it
          s"${not}EXISTS (SELECT 1 FROM (SELECT ${ev.valCol} AS ev " +
            s"FROM ${tbl(ev.table)} WHERE ${ev.idCol} % ${ev.sampS} < ${ev.sampC}) e " +
            s"WHERE e.ev = lv)" }.toSeq ++
        scalarFilter.map { case (sv, useMax) =>
          val (cmp, f) = if (useMax) ("<=", "max") else (">=", "min")
          s"lv $cmp (SELECT $f(${sv.valCol}) FROM ${tbl(sv.table)} " +
            s"WHERE ${sv.idCol} % ${sv.sampS} < ${sv.sampC})" }.toSeq ++
        existsIneq.map { iv =>
          s"EXISTS (SELECT 1 FROM (SELECT ${iv.valCol} AS qv " +
            s"FROM ${tbl(iv.table)} WHERE ${iv.idCol} % ${iv.sampS} < ${iv.sampC}) q " +
            s"WHERE q.qv < lv)" }.toSeq ++
        corrScalar.map { case (cs, useMax) =>
          val (cmp, f) = if (useMax) ("<=", "max") else (">=", "min")
          // bare `lk` correlates to the outer scope in both dialects;
          // the subquery derives its own (ek, ev) so nothing shadows it
          s"lv $cmp (SELECT $f(ev) FROM (${cs.sql("ek", "ev", tbl)}) e " +
            s"WHERE e.ek = lk)" }.toSeq
      val wh =
        if (preds.isEmpty) ""
        else (if (fromHasWhere) " AND " else " WHERE ") + preds.mkString(" AND ")
      val sel = (groupKeys.map(g => s"${g.sqlExpr} AS ${g.name}") ++
        aggs.map { a =>
          if (duck && a.sumLike) s"CAST(${a.sqlExpr} AS BIGINT) AS ${a.name}"
          else s"${a.sqlExpr} AS ${a.name}"
        } ++
        // ring 5d: the grouping marker — identical text both dialects
        // (explicit per-key grouping() bits; see the DF-side comment
        // for why grouping_id is not usable here)
        (if (groupMode != 0)
          Seq("CAST(" + groupKeys.zipWithIndex.map { case (g, j) =>
            s"grouping(${g.sqlExpr}) * ${1L << (groupKeys.size - 1 - j)}"
          }.mkString(" + ") + " AS BIGINT) AS gg")
        else Nil)).mkString(", ")
      val grp =
        if (groupKeys.isEmpty) ""
        else groupMode match {
          case 1 => " GROUP BY ROLLUP (" + groupKeys.map(_.sqlExpr).mkString(", ") + ")"
          case 2 => " GROUP BY CUBE (" + groupKeys.map(_.sqlExpr).mkString(", ") + ")"
          case 3 =>
            val exprOf = groupKeys.map(g => g.name -> g.sqlExpr).toMap
            " GROUP BY GROUPING SETS (" + groupSets.map(s2 =>
              "(" + s2.map(exprOf).mkString(", ") + ")").mkString(", ") + ")"
          case _ => " GROUP BY " + groupKeys.map(_.sqlExpr).mkString(", ")
        }
      // EMPTY-INPUT GROUPING-SETS DIVERGENCE (machine-found by this
      // ring's first run, confirmed by hand on both engines): over an
      // EMPTY input, GROUP BY ROLLUP/CUBE emits the ()-set grand-total
      // row (count=0) in DuckDB per the SQL standard, while Spark 4
      // emits ZERO rows (the Expand→HashAggregate pipeline forms no
      // groups without input rows). The DUCK rendering appends
      // HAVING count(*) > 0 on grouping-set shapes to mirror Spark's
      // semantics — on any NON-empty input every grouping-set row has
      // count(*) >= 1, so the guard cancels exactly the standard's
      // empty-input row and nothing else. (havingMin >= 1 already
      // implies it when present.)
      val hav = havingMin.map(h => s" HAVING count(*) >= $h").getOrElse(
        if (duck && groupMode != 0 && groupKeys.nonEmpty)
          " HAVING count(*) > 0"
        else "")
      val lim = limit.map { n =>
        " ORDER BY " + groupKeys.map(g => s"${g.name} ASC NULLS FIRST").mkString(", ") +
          s" LIMIT $n"
      }.getOrElse("")
      s"SELECT $sel FROM $from$wh$grp$hav$lim"
    }

    /** Output column names in schema order (digest mixing order). */
    def outCols: Seq[String] = groupKeys.map(_.name) ++ aggs.map(_.name) ++
      (if (groupMode != 0) Seq("gg") else Nil)
  }

  // -------------------------------------------------------------------
  // Generator: per-table menus with sampling denominators sized so a
  // term stays ≤ ~2.5k rows at sf0.1 (≤ ~260 at sf0.01). All integral
  // columns only — FP/decimal values would make the digest checksum
  // order-dependent.
  // -------------------------------------------------------------------

  private final case class TableMenu(
      table: String, idCol: String, keyCols: Seq[String],
      valCols: Seq[String], sampS: Int, maxC: Int)

  private val menus = Seq(
    TableMenu("orders", "o_orderkey", Seq("o_custkey", "o_orderkey"),
      Seq("o_custkey", "o_orderkey"), 211, 3),
    TableMenu("customer", "c_custkey", Seq("c_custkey", "c_nationkey"),
      Seq("c_nationkey", "c_custkey"), 29, 3),
    TableMenu("supplier", "s_suppkey", Seq("s_suppkey", "s_nationkey"),
      Seq("s_nationkey", "s_suppkey"), 3, 2),
    TableMenu("lineitem", "l_orderkey", Seq("l_partkey", "l_suppkey"),
      Seq("l_linenumber", "l_partkey"), 701, 3))

  private val keyMods = Seq(11, 13, 17, 23, 31, 37)
  private val nullPs = Seq(5, 7, 11, 13)
  private val joinTypes = Seq("inner", "left", "right", "full", "semi", "anti")

  private def pick[T](r: scala.util.Random, xs: Seq[T]): T = xs(r.nextInt(xs.size))

  private def scan(r: scala.util.Random): ScanSpec = {
    val m = pick(r, menus)
    ScanSpec(m.table, m.idCol, pick(r, m.keyCols), pick(r, m.valCols),
      pick(r, keyMods), pick(r, nullPs), m.sampS, 1 + r.nextInt(m.maxC))
  }

  private val setOps = Seq("UNION", "UNION ALL", "EXCEPT", "EXCEPT ALL",
    "INTERSECT", "INTERSECT ALL")

  /** The deterministic shape stream for a seed. */
  def shapes(seed: Long, n: Int): Seq[ShapeSpec] = {
    val r = new scala.util.Random(seed)
    // r20: the first 22 second-hop JOINS follow a deterministic lap —
    // the full type menu twice (slots 0-11), then five right/full pairs
    // (slots 12-21) — because every ring added since r18 re-rolled the
    // LCG stream and scraped a different chain census floor (r19:
    // inner/left; r20 drafts: anti, then inner, then the outer-chain
    // count). The lap makes BOTH fences structural — per-type ≥ 2 and
    // right/full ≥ 10 whenever ≥ 22 chains are drawn (the stream draws
    // ~24-26 at N=200) — while later hops keep the weighted random menu
    // (right/full double-weighted — the NULL-feeding outer-chain
    // reorder surface).
    val chainLap = (joinTypes ++ joinTypes) ++
      Seq.fill(5)(Seq("right", "full")).flatten
    var chainCount = 0
    // the same structural-lap pattern for the other low-count menus:
    // the first 12 set-operator draws cycle the 6 variants twice, and
    // the first 15 grouping-mode draws cycle ROLLUP/CUBE/GROUPING SETS
    // five times — each class's census floor survives any future
    // re-roll of the LCG stream
    var setCount = 0
    var gmCount = 0
    (0 until n).map { i =>
      // r20 ring 5c: ~1/6 of shapes replace the join with a set
      // operator (drawn FIRST so the key/agg menus below can exclude
      // the right/chain columns a set operation doesn't expose)
      val setIdx = setCount
      val setF = if (r.nextInt(6) == 0) {
        val op =
          if (setCount < 2 * setOps.size) setOps(setCount % setOps.size)
          else pick(r, setOps)
        setCount += 1
        Some(op)
      } else None
      // ring 5e: set-op branches become join subtrees (drawn right
      // after the operator so the menus below are unaffected). The
      // first 20 set-op shapes lap the four branch patterns —
      // plain/plain, L-joined, R-joined, both-joined — five times
      // (structural floors: ≥5 plain and ≥10 joined under any
      // re-roll); later shapes draw each side at ~1/2.
      val (setJL, setJR) =
        if (setF.isEmpty) (None, None)
        else {
          val (jl, jr) =
            if (setIdx < 20) ((setIdx % 4) / 2 == 1, setIdx % 2 == 1)
            else (r.nextInt(2) == 0, r.nextInt(2) == 0)
          (if (jl) Some(scan(r)) else None, if (jr) Some(scan(r)) else None)
        }
      val jt = pick(r, joinTypes)
      val nullSafe = setF.isEmpty && r.nextInt(3) == 0 // ~1/3 exercise <=>
      val rightVisible = setF.isEmpty && jt != "semi" && jt != "anti"
      // r18 ring: ~1/4 composite two-column keys (one nullable component)
      val composite = setF.isEmpty && r.nextInt(4) == 0
      // ~1/4 of visible-right shapes grow a second hop on rk — decided
      // BEFORE the key/agg menus so they can reach the chain's columns.
      // r18 ring: the hop menu now includes RIGHT and FULL (the
      // NULL-feeding outer chain where reorder bugs live).
      val chain =
        if (rightVisible && r.nextInt(4) == 0) {
          val ct =
            if (chainCount < chainLap.size) chainLap(chainCount)
            else pick(r, Seq("inner", "inner", "left", "left", "semi", "anti",
              "right", "right", "full", "full"))
          chainCount += 1
          Some(ChainSpec(scan(r), ct, r.nextInt(3) == 0))
        } else None
      // t's columns survive only a visible (non-semi/anti) second hop
      val tVisible = chain.exists(c => c.joinType != "semi" && c.joinType != "anti")
      val gm = 2 + r.nextInt(5)
      val gm2 = 2 + r.nextInt(4)
      val caseTh = 2 + r.nextInt(9)
      val keyMenu = Seq(
        Some(GroupKey("g0", col("lk"), "lk")),
        Some(GroupKey("g1", col("lk") % gm, s"lk % $gm")),
        if (rightVisible) Some(GroupKey("g2", col("rk"), "rk")) else None,
        Some(GroupKey("g3", col("lv") % gm2, s"lv % $gm2")),
        // r18 expression ring under keys: CASE (its ELSE fires on the
        // NULL key too — non-trivial NULL semantics feeding a group),
        // arithmetic-then-mod, and the chain table's key
        Some(GroupKey("g4",
          when(col("lk") > caseTh, col("lk") % gm).otherwise(lit(-1)),
          s"CASE WHEN lk > $caseTh THEN lk % $gm ELSE -1 END")),
        Some(GroupKey("g5", (col("lk") + 7) % gm, s"(lk + 7) % $gm")),
        if (tVisible) Some(GroupKey("g6", col("tk"), "tk")) else None,
        // r18 ring 2: a STRING-typed group key — string hash-partition/
        // group semantics, digit-only so the digest's BIGINT cast-back
        // is clean and lexicographic ORDER BY agrees between engines
        Some(GroupKey("g7", col("lk").cast("string"),
          "CAST(lk AS STRING)")),
        // r19 ring 3c: a DECIMAL(12,2)-typed group key — exact
        // cross-engine, but the precision/scale propagation rules
        // differ between engines, a differential surface that stays
        // hash-exact. The value is x.00 (integral source), so the
        // digest's BIGINT cast-back is exact on BOTH engines (Spark
        // truncates, DuckDB rounds — identical on a zero fraction).
        Some(GroupKey("g8", col("lk").cast("decimal(12,2)"),
          "CAST(lk AS DECIMAL(12,2))"))).flatten
      // 0..2 group keys; empty = global aggregate
      val nKeys = r.nextInt(3)
      val groupKeys = r.shuffle(keyMenu).take(nKeys).sortBy(_.name)
      val aggMenu = Seq(
        Some(AggCol("a1", count(col(if (rightVisible) "rv" else "lv")),
          if (rightVisible) "count(rv)" else "count(lv)", sumLike = false)),
        Some(AggCol("a2", sum(col("lv")), "sum(lv)", sumLike = true)),
        if (rightVisible) Some(AggCol("a3", min(col("rv")), "min(rv)", sumLike = false))
        else None,
        Some(AggCol("a4", max(col("lv")), "max(lv)", sumLike = false)),
        Some(AggCol("a5", sum(col("lk")), "sum(lk)", sumLike = true)),
        // distinct-count: exercises the distinct-aggregate planning path
        // (Expand/partial-distinct) and LinearizeNullSafeCountAgg's
        // count(DISTINCT <bare attr>) widening + its guards on every
        // join type
        Some(AggCol("a6", count_distinct(col("lv")), "count(DISTINCT lv)",
          sumLike = false)),
        // r18 expression ring under aggregates: arithmetic and CASE
        // arguments (outside every engine-rule scope — permanent guards)
        Some(AggCol("a7", sum(col("lv") + col("lv") % 3), "sum(lv + lv % 3)",
          sumLike = true)),
        // r18: the chain table's value, aggregated (tv was joined but
        // never consumed before this ring)
        if (tVisible) Some(AggCol("a8", sum(col("tv")), "sum(tv)",
          sumLike = true)) else None,
        Some(AggCol("a9",
          max(when(col("lv") % 2 === 0, col("lv")).otherwise(-col("lv"))),
          "max(CASE WHEN lv % 2 = 0 THEN lv ELSE -lv END)",
          sumLike = false)),
        // r19 ring 3c: DECIMAL-typed aggregate ARGUMENTS. Both engines
        // compute these exactly on the .25 grid; the final ×4 restores
        // an integral value and the explicit BIGINT cast is spelled in
        // BOTH dialects (so DuckDB's different widening — possibly
        // through DOUBLE when precision tops out — lands on the same
        // exact integer; the value stays far below 2^53).
        Some(AggCol("a10",
          (sum(col("lv").cast("decimal(12,2)") * lit(0.25).cast("decimal(2,2)")) * 4)
            .cast("long"),
          "CAST(sum(CAST(lv AS DECIMAL(12,2)) * 0.25) * 4 AS BIGINT)",
          sumLike = false)),
        Some(AggCol("a11",
          (min(col("lv").cast("decimal(12,2)") + lit(7.25).cast("decimal(3,2)")) * 4)
            .cast("long"),
          "CAST(min(CAST(lv AS DECIMAL(12,2)) + 7.25) * 4 AS BIGINT)",
          sumLike = false))).flatten
      // count(*) always present (HAVING anchors on it)
      val aggs = AggCol("a0", count(lit(1)), "count(*)", sumLike = false) +:
        r.shuffle(aggMenu).take(r.nextInt(3))
      val aggsSorted = aggs.sortBy(_.name)
      val postFilter =
        if (r.nextInt(3) == 0) Some((pick(r, Seq(">", "<=", "%2")), 1 + r.nextInt(20)))
        else None
      // r18 ring 2: ~1/5 of shapes add an uncorrelated IN-subquery over lv
      val inF = if (r.nextInt(5) == 0) Some(scan(r)) else None
      // r19 ring 3a/3b: ~1/6 NOT IN (half with a NULL in the subquery —
      // those must go EMPTY), ~1/6 correlated [NOT] EXISTS
      val notInF =
        if (r.nextInt(6) == 0) Some((scan(r), r.nextInt(2) == 0)) else None
      val existsF =
        if (r.nextInt(6) == 0) Some((scan(r), r.nextInt(2) == 0)) else None
      // r19 ring 3e/3f: ~1/8 scalar-subquery comparisons, ~1/8 non-equi
      // correlated EXISTS (the BroadcastNestedLoop semi path)
      val scalarF =
        if (r.nextInt(8) == 0) Some((scan(r), r.nextInt(2) == 0)) else None
      val existsIq = if (r.nextInt(8) == 0) Some(scan(r)) else None
      val having =
        if (groupKeys.nonEmpty && r.nextInt(4) == 0) Some(1 + r.nextInt(3)) else None
      // r19 ring 3d: when the FIRST ordered key is the nullable bare key
      // (g0 sorts first), half the time force a SMALL limit so the
      // ORDER BY … NULLS FIRST boundary deliberately lands INSIDE (or
      // exactly AT, for one-key shapes) the NULL-g0 run — the spot
      // where an implicit NULLS-LAST default or a broken tie-break
      // silently diverges
      val nullFirstRun = groupKeys.headOption.exists(_.name == "g0")
      // r19 ring 3g: grouped shapes run ROLLUP/CUBE; r20 ring 5b adds
      // explicit GROUPING SETS lists as the third grouping-set mode
      // (the draw widened 1/6 → 1/4 so each of the three modes keeps a
      // double-digit count in the 200-shape census)
      val groupMode =
        if (groupKeys.nonEmpty && r.nextInt(4) == 0) {
          val m = if (gmCount < 15) 1 + gmCount % 3 else 1 + r.nextInt(3)
          gmCount += 1
          m
        } else 0
      // ring 5b: an IRREGULAR set list — a seeded non-empty choice of
      // DISTINCT subsets of the chosen keys (possibly including `()`,
      // possibly skipping a key in SOME sets — shapes the ROLLUP/CUBE
      // sugar can never spell). The UNION of the sets must cover every
      // selected key: a key in NO set is rejected by the SQL front-ends
      // of both engines (the select list may only reference grouping
      // columns), even though the DataFrame API tolerates it — found by
      // this ring's first run; when the draw leaves a key uncovered,
      // the full set is appended (it is provably absent).
      val groupSets: Seq[Seq[String]] =
        if (groupMode != 3) Nil
        else {
          val names = groupKeys.map(_.name)
          val all = names.indices
            .foldLeft(Seq(Seq.empty[String]))((acc, j) => acc ++ acc.map(_ :+ names(j)))
          val base = r.shuffle(all).take(1 + r.nextInt(all.size))
          if (names.forall(n => base.exists(_.contains(n)))) base
          else base :+ names
        }
      val lim =
        if (groupKeys.isEmpty || groupMode != 0) None // see groupMode doc
        else if (nullFirstRun && r.nextInt(2) == 0) Some(1 + r.nextInt(3))
        else if (r.nextInt(4) == 0) Some(1 + r.nextInt(8))
        else None
      // r20 ring 5a: ~1/7 correlated scalar-subquery comparisons (the
      // decorrelation-to-left-outer-aggregate path)
      val corrS =
        if (r.nextInt(7) == 0) Some((scan(r), r.nextInt(2) == 0)) else None
      ShapeSpec(i, scan(r), scan(r), jt, nullSafe, composite, chain, postFilter,
        inF, notInF, existsF, scalarF, existsIq, groupMode, groupKeys,
        aggsSorted, having, lim, corrS, setF, groupSets, setJL, setJR)
    }
  }

  // -------------------------------------------------------------------
  // Digest packaging: one (shape_id, cnt, chk) row per shape, unioned —
  // the registry/oracle rendering. chk mixes every output column into
  // one order-independent BIGINT (sum of per-row polynomials in small
  // primes; NULL → -1 sentinel).
  // -------------------------------------------------------------------

  private val primes = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L)

  def digestDf(spark: SparkSession, dir: String, ss: Seq[ShapeSpec]): DataFrame =
    ss.map { s =>
      val base = s.df(spark, dir)
      val mix = s.outCols.zipWithIndex
        .map { case (c, i) => coalesce(col(c).cast("long"), lit(-1L)) * primes(i) }
        .reduce(_ + _)
      base.agg(count(lit(1)).as("cnt"), coalesce(sum(mix), lit(0L)).as("chk"))
        .select(lit(s.id).as("shape_id"), col("cnt"), col("chk"))
    }.reduce(_.unionAll(_))

  def digestSql(ss: Seq[ShapeSpec]): String =
    ss.map { s =>
      val mix = s.outCols.zipWithIndex
        .map { case (c, i) => s"coalesce(CAST($c AS BIGINT), -1) * ${primes(i)}" }
        .mkString(" + ")
      s"SELECT ${s.id} AS shape_id, count(*) AS cnt, " +
        s"CAST(coalesce(sum($mix), 0) AS BIGINT) AS chk FROM (${s.sqlFor(duck = true)}) t"
    }.mkString(" UNION ALL ")

  // -------------------------------------------------------------------
  // Ring 4 (r19 verdict #5): machine-generated WINDOW shapes — the
  // first OVER coverage the fuzzer produces (27 hand-written win_* rows
  // existed; zero machine-generated). Grammar:
  //
  //   scan (k nullable key, v value, i unique id) →
  //   fn OVER (PARTITION BY k ORDER BY v ASC|DESC [, i] [frame]) —
  //   fn ∈ {rank, dense_rank, row_number, sum(v), count(*)},
  //   frame ∈ {default RANGE, ROWS UNBOUNDED..CURRENT, ROWS 2 PRECEDING}
  //
  // Discipline (WindowContract): every generated shape PARTITIONS BY
  // the key — the generator cannot smuggle in a global window (an
  // unpartitioned OVER () would single-task the whole input at scale).
  // NULL keys form ONE partition in both engines. Determinism: ranking
  // ties are well-defined for rank/dense_rank ordered by v alone; any
  // shape needing a TOTAL order (row_number, ROWS frames) adds the
  // unique id to the ORDER BY. NULL ordering is SPELLED (ASC NULLS
  // FIRST / DESC NULLS LAST — Spark's defaults, explicit for DuckDB).
  // -------------------------------------------------------------------

  /** fn: 0 rank, 1 dense_rank, 2 row_number, 3 sum(v), 4 count(*),
    * 5 lag(v, 1) (offset class — OffsetWindowFunction execution path),
    * 6 ntile(4) (distribution class), and — r20, closing the r19
    * exclusion note — 7 percent_rank() and 8 cume_dist(), the
    * DOUBLE-valued distribution functions. Their digest-typing trap
    * (Spark's BIGINT cast TRUNCATES a double, DuckDB's ROUNDS) is
    * DEFUSED rather than dodged: both renderings emit
    * CAST(round(fn * 1000000000) AS BIGINT) — the inner arithmetic is
    * the same IEEE ops on both engines ((rank-1)/(n-1) resp.
    * peers/n in double, ×1e9), round() is half-away-from-zero for
    * the non-negative range on both, and the cast is then exact on an
    * already-integral value.
    * frame (aggregates only): 0 default RANGE, 1 ROWS UNBOUNDED
    * PRECEDING..CURRENT ROW, 2 ROWS 2 PRECEDING..CURRENT ROW,
    * 3 (r20) RANGE BETWEEN 2 PRECEDING AND CURRENT ROW — the explicit-
    * offset RANGE frame over the integral order key `v` (v carries no
    * NULL stripe, so the NULL-peer-group corner both engines spell
    * differently never arises; the frame keeps the SINGLE order
    * expression RANGE offsets require, and value-range framing is
    * deterministic under ties without an id tiebreak).
    *
    * r19 ring 4b — `join`: the window runs over a JOIN OUTPUT (inner
    * or left equi-join of a second sampled term on the nullable key) —
    * Window-above-Join, the shape real pipelines run: row
    * multiplication feeds the frame, and a LEFT join additionally
    * feeds NULL-extended rows (jv NULL) into the partition. Under `=`
    * NULL keys never match, so the NULL-k partition survives only via
    * the left join's extension. DETERMINISM over duplicates: the
    * join can make full-row duplicates — (k,v,i,jv) collides only when
    * two right rows share (jk, jv), and rows equal in EVERY column are
    * interchangeable under any window function, so the output MULTISET
    * is order-independent even with the id tiebreaker saturated. */
  final case class WinSpec(id: Int, scan: ScanSpec, fn: Int, frame: Int,
      desc: Boolean, join: Option[(ScanSpec, String)] = None) {

    private def isAgg: Boolean = fn == 3 || fn == 4
    /** total order needed: row_number / lag / ntile always (their value
      * depends on the exact row order, not the peer group); aggregates
      * under a ROWS frame (a RANGE/default frame aggregates peers
      * together, so ties are deterministic without it — and an
      * explicit-offset RANGE frame (3) MUST stay single-expression:
      * both engines reject RANGE offsets over a multi-column order).
      * percent_rank/cume_dist are peer-group functions like rank —
      * deterministic without a total order. */
    private def needsId: Boolean =
      fn == 2 || fn == 5 || fn == 6 || (isAgg && (frame == 1 || frame == 2))

    def df(spark: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val base = scan.winDf(spark, dir)
      val in = join match {
        case Some((js, how)) =>
          val j = js.df(spark, dir, "jk", "jv")
          base.join(j, base("k") === j("jk"), how)
            .select(base("k"), col("v"), col("i"), col("jv"))
        case None => base
      }
      val ord =
        (if (desc) col("v").desc_nulls_last else col("v").asc_nulls_first) +:
          (if (needsId)
            Seq(col("i").asc_nulls_first) ++
              join.map(_ => col("jv").asc_nulls_first).toSeq
          else Nil)
      var w = Window.partitionBy(col("k")).orderBy(ord: _*)
      if (isAgg && frame == 1)
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else if (isAgg && frame == 2)
        w = w.rowsBetween(-2, Window.currentRow)
      else if (isAgg && frame == 3)
        w = w.rangeBetween(-2, Window.currentRow)
      val fnCol = fn match {
        case 0 => rank()
        case 1 => dense_rank()
        case 2 => row_number()
        case 3 => sum(col("v"))
        case 4 => count(lit(1))
        case 5 => lag(col("v"), 1)
        case 6 => ntile(4)
        case 7 => percent_rank()
        case _ => cume_dist()
      }
      // fn 7/8 are DOUBLE-valued — scale-round-cast so the digest's
      // BIGINT mix is exact on both engines (see the fn doc above)
      val wCol =
        if (fn >= 7) round(fnCol.over(w) * 1000000000L).cast("long")
        else fnCol.over(w)
      val outs = Seq(col("k"), col("v")) ++
        join.map(_ => col("jv")).toSeq :+ wCol.as("w")
      in.select(outs: _*)
    }

    def sqlFor(duck: Boolean): String = {
      val tbl: String => String = if (duck) identity else "fuzz_" + _
      val ord = (if (desc) "v DESC NULLS LAST" else "v ASC NULLS FIRST") +
        (if (needsId)
          ", i ASC NULLS FIRST" +
            (if (join.nonEmpty) ", jv ASC NULLS FIRST" else "")
        else "")
      val fr =
        if (!isAgg || frame == 0) ""
        else if (frame == 1) " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        else if (frame == 2) " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
        else " RANGE BETWEEN 2 PRECEDING AND CURRENT ROW"
      val f = fn match {
        case 0 => "rank()"
        case 1 => "dense_rank()"
        case 2 => "row_number()"
        case 3 => "sum(v)"
        case 4 => "count(*)"
        case 5 => "lag(v, 1)"
        case 6 => "ntile(4)"
        case 7 => "percent_rank()"
        case _ => "cume_dist()"
      }
      val src = join match {
        case Some((js, how)) =>
          val kw = if (how == "left") "LEFT JOIN" else "JOIN"
          s"(SELECT b.k, b.v, b.i, j.jv FROM (${scan.winSql(tbl)}) b " +
            s"$kw (${js.sql("jk", "jv", tbl)}) j ON b.k = j.jk)"
        case None => s"(${scan.winSql(tbl)})"
      }
      val sel = "k, v" + (if (join.nonEmpty) ", jv" else "")
      val overExpr = s"$f OVER (PARTITION BY k ORDER BY $ord$fr)"
      val wExpr =
        if (fn >= 7) s"CAST(round($overExpr * 1000000000) AS BIGINT)"
        else overExpr
      s"SELECT $sel, $wExpr AS w FROM $src s"
    }

    def outCols: Seq[String] =
      Seq("k", "v") ++ (if (join.nonEmpty) Seq("jv") else Nil) :+ "w"
  }

  /** The deterministic window-shape stream for a seed. */
  def winShapes(seed: Long, n: Int): Seq[WinSpec] = {
    val r = new scala.util.Random(seed)
    // structural lap (see shapes()): the first 8 aggregate-frame draws
    // cycle the four frame spellings twice, so every frame class keeps
    // its census floor under any re-roll
    var frCount = 0
    (0 until n).map { i =>
      val fn = r.nextInt(9) // r20: + percent_rank (7) / cume_dist (8)
      val frame = if (fn == 3 || fn == 4) { // r20: + RANGE offset (3)
        val f = if (frCount < 8) frCount % 4 else r.nextInt(4)
        frCount += 1
        f
      } else 0
      // ring 4b: ~1/3 of shapes window over a join output
      val jn =
        if (r.nextInt(3) == 0)
          Some((scan(r), if (r.nextInt(2) == 0) "left" else "inner"))
        else None
      WinSpec(i, scan(r), fn, frame, r.nextInt(2) == 1, jn)
    }
  }

  def winDigestDf(spark: SparkSession, dir: String, ss: Seq[WinSpec]): DataFrame =
    ss.map { s =>
      val base = s.df(spark, dir)
      val mix = s.outCols.zipWithIndex
        .map { case (c, i) => coalesce(col(c).cast("long"), lit(-1L)) * primes(i) }
        .reduce(_ + _)
      base.agg(count(lit(1)).as("cnt"), coalesce(sum(mix), lit(0L)).as("chk"))
        .select(lit(s.id).as("shape_id"), col("cnt"), col("chk"))
    }.reduce(_.unionAll(_))

  def winDigestSql(ss: Seq[WinSpec]): String =
    ss.map { s =>
      val mix = s.outCols.zipWithIndex
        .map { case (c, i) => s"coalesce(CAST($c AS BIGINT), -1) * ${primes(i)}" }
        .mkString(" + ")
      s"SELECT ${s.id} AS shape_id, count(*) AS cnt, " +
        s"CAST(coalesce(sum($mix), 0) AS BIGINT) AS chk FROM (${s.sqlFor(duck = true)}) t"
    }.mkString(" UNION ALL ")

  // -------------------------------------------------------------------
  // Shrinker: when a differential leg disagrees, walk toward the
  // minimal still-failing spec so the repro that gets pinned as a
  // registry row is readable. Tries one simplification at a time,
  // keeping it iff the mismatch survives.
  // -------------------------------------------------------------------

  def shrink(spec: ShapeSpec, stillFails: ShapeSpec => Boolean): ShapeSpec = {
    val steps: Seq[ShapeSpec => Option[ShapeSpec]] = Seq(
      s => s.limit.map(_ => s.copy(limit = None)),
      s => s.havingMin.map(_ => s.copy(havingMin = None)),
      // chain removal must also drop the chain-column CONSUMERS (a8
      // sum(tv), g6 group-by tk) or the candidate is unanalyzable and
      // only "passes" because both legs crash (r18 ADVICE); if that
      // empties the grouping, the ORDER BY/LIMIT decoration goes too
      s => s.chain.map { _ =>
        val gk = s.groupKeys.filterNot(_.name == "g6")
        s.copy(chain = None,
          aggs = s.aggs.filterNot(_.name == "a8"),
          groupKeys = gk,
          limit = if (gk.isEmpty) None else s.limit)
      },
      s => if (s.composite) Some(s.copy(composite = false)) else None,
      s => s.postFilter.map(_ => s.copy(postFilter = None)),
      s => s.inFilter.map(_ => s.copy(inFilter = None)),
      s => s.notInFilter.map(_ => s.copy(notInFilter = None)),
      s => s.existsFilter.map(_ => s.copy(existsFilter = None)),
      s => s.scalarFilter.map(_ => s.copy(scalarFilter = None)),
      s => s.existsIneq.map(_ => s.copy(existsIneq = None)),
      s => s.corrScalar.map(_ => s.copy(corrScalar = None)),
      // branch joins simplify away before the operator itself
      s => s.setJoinL.map(_ => s.copy(setJoinL = None)),
      s => s.setJoinR.map(_ => s.copy(setJoinR = None)),
      // a set-op shape degrades to the inner join its inert jt fields
      // describe (its key/agg menus are join-valid by construction)
      s => s.setOp.map(_ => s.copy(setOp = None, setJoinL = None, setJoinR = None)),
      s => if (s.groupMode != 0) Some(s.copy(groupMode = 0, groupSets = Nil)) else None,
      // an explicit set list shrinks one set at a time before the mode
      // itself is dropped
      s => if (s.groupMode == 3 && s.groupSets.size > 1)
        Some(s.copy(groupSets = s.groupSets.take(s.groupSets.size - 1))) else None,
      // a NULL-bearing NOT IN empties the result — try the non-NULL
      // variant so the repro keeps visible rows when possible
      s => s.notInFilter.collect { case (sc, true) =>
        s.copy(notInFilter = Some((sc, false))) },
      s => if (s.aggs.size > 1) Some(s.copy(aggs = s.aggs.take(1))) else None,
      s => if (s.groupKeys.size > 1) Some(s.copy(groupKeys = s.groupKeys.take(1))) else None,
      s => if (s.groupKeys.size == 1) Some(s.copy(groupKeys = Nil, havingMin = None, limit = None)) else None,
      s => if (s.nullSafe) Some(s.copy(nullSafe = false)) else None,
      s => if (s.joinType != "inner") Some(s.copy(joinType = "inner")) else None)
    var cur = spec
    var progress = true
    while (progress) {
      progress = false
      steps.foreach { step =>
        step(cur).foreach { cand =>
          if (stillFails(cand)) { cur = cand; progress = true }
        }
      }
    }
    cur
  }
}
