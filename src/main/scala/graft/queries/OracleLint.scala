package graft.queries

import org.apache.spark.sql.types.{LongType, StructType}

/** Mechanical enforcement of the ORACLE TYPING RULE (Registry.scala):
  * DuckDB types a raw integer `sum(...)` as HUGEINT (int128) while Spark
  * emits BIGINT, and the driver's hash diverges on the type tag even when
  * every value is bit-identical. Two consecutive rounds lost a red row to
  * this class (r10 `expr_to_number`, r11 `pipe_skyline`) — so the rule is
  * now a lint, not prose.
  *
  * For every declared query whose SPARK result schema exposes a
  * [[LongType]] column, the oracle SQL is scanned for `sum(...)`
  * aggregates aliased to that column name. Such an alias is a violation
  * unless either
  *   (a) the `sum(` is directly wrapped in a `CAST( ... )` — e.g.
  *       `CAST(sum(x) AS BIGINT)`, or
  *   (b) some later projection re-casts the column —
  *       `... AS BIGINT) AS <col>` appears anywhere in the oracle (the
  *       CTE may keep the raw sum as long as the exposed projection
  *       narrows it back to BIGINT).
  * `count(*)` is BIGINT on both engines and is not checked; sums that
  * feed only non-LongType outputs (DOUBLE ratios etc.) are invisible to
  * the lint because the Spark schema types them away.
  */
object OracleLint {

  // ---------------------------------------------------------------------
  // DISCRETIZATION KNIFE-EDGE LINT (r15 verdict #2). The sf0.1 sweep
  // caught ml_kaplan_meier red on `floor(1e6·x)` landing EXACTLY on
  // integer micros: x was decimal-nice (0.654000) but computed through
  // exp/ln, where the JVM's and DuckDB's libm may differ by 1 ULP —
  // floor's knife-edge sits AT integers, precisely where decimal-nice
  // values land, so a 1-ULP disagreement flips 654000 to 653999. The fix
  // class is half-up scaling (`floor(x + 0.5)`) spelled identically on
  // both sides, which moves the edge to half-steps — the MIDDLE of the
  // cell for such values.
  //
  // The hazard needs BOTH ingredients: (a) an integer discretization
  // (floor, or a bare CAST of a float to an integer type — truncation has
  // the same edge), and (b) a TRANSCENDENTAL in the discretized
  // expression (exp/ln/log/pow/trig — the functions with no
  // correctly-rounded guarantee, so the two engines may disagree by an
  // ULP). Pure-arithmetic floats (+,-,*,/ and sqrt) are IEEE-754
  // correctly rounded: both engines compute the SAME double from the
  // same inputs, so flooring them cannot diverge and is NOT flagged.
  // ---------------------------------------------------------------------

  /** Transcendental call heads DuckDB/Spark SQL share — any of these
    * inside a discretized expression makes the floor/cast a knife-edge.
    * sqrt/cbrt are deliberately absent (correctly rounded by IEEE). */
  private val transcendentalRe =
    ("(?<![a-z0-9_])(exp|exp2|expm1|ln|log|log2|log10|log1p|logb|" +
      "pow|power|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh|" +
      "asinh|acosh|atanh|cot)\\s*\\(").r

  /** Half-up or explicit rounding defuses the edge — but ONLY where it
    * actually guards the discretized value (r16 ADVICE: the old
    * "anywhere inside the argument" check accepted `floor(1e6*exp(x+0.5))`
    * — a half-up INSIDE the transcendental moves nothing). Anchored form:
    *   (a) a `+ 0.5` at the TOP paren level of the argument (the half-up
    *       applies to the value being floored), or
    *   (b) every transcendental occurrence sits INSIDE some `round(...)`
    *       span — round canonicalizes the 1-ULP libm disagreement to one
    *       shared double before the floor/cast ever sees it. A round that
    *       does not dominate the transcendental (e.g.
    *       `floor(exp(y) + round(x))`) defuses nothing. */
  private def defused(arg: String): Boolean =
    topLevelHalf(arg) || transcendentalsAllRounded(arg)

  /** `+ 0.5` at paren depth 0 of the argument (either operand order). */
  private def topLevelHalf(arg: String): Boolean = {
    val halfRe = "\\+\\s*0\\.5(?![0-9])|(?<![0-9.])0\\.5\\s*\\+".r
    halfRe.findAllMatchIn(arg).exists { m =>
      arg.take(m.start).count(_ == '(') == arg.take(m.start).count(_ == ')')
    }
  }

  /** Every transcendental match position lies inside some balanced
    * `round(...)` span of the argument (any depth — domination is what
    * matters, not the depth). Vacuously false when there is no round. */
  private def transcendentalsAllRounded(arg: String): Boolean = {
    val spans = "(?<![a-z0-9_])round\\s*\\(".r.findAllMatchIn(arg).toSeq.flatMap { m =>
      val open = arg.indexOf('(', m.start)
      closeOf(arg, open).map(c => (m.start, c))
    }
    spans.nonEmpty && transcendentalRe.findAllMatchIn(arg).forall { t =>
      spans.exists { case (s, e) => t.start > s && t.start < e }
    }
  }

  /** Documented why-safe exemptions: query name → justification. An
    * entry here silences the knife-edge lint for that query; the note
    * must say why the discretization cannot diverge between engines. */
  val knifeEdgeSafe: Map[String, String] = Map.empty

  /** Knife-edge violations in one oracle's text; empty = clean. */
  def knifeEdge(name: String, oracle: String): Seq[String] = {
    if (knifeEdgeSafe.contains(name)) return Nil
    val o = oracle.toLowerCase
    def argOf(start: Int): Option[String] = {
      val open = o.indexOf('(', start)
      if (open < 0) None else closeOf(o, open).map(c => o.substring(open + 1, c))
    }
    val floors = "(?<![a-z0-9_])floor\\s*\\(".r.findAllMatchIn(o).toSeq.flatMap { m =>
      argOf(m.start).toSeq.collect {
        case arg if transcendentalRe.findFirstIn(arg).isDefined && !defused(arg) =>
          s"$name: oracle floors a transcendental-bearing expression without " +
            s"half-up — `floor(${arg.take(60)}…)` puts the discretization " +
            "knife-edge AT integers, where a 1-ULP libm difference between " +
            "the JVM and DuckDB flips the result (the r15 ml_kaplan_meier " +
            "class). Use floor(x + 0.5) spelled identically on both sides, " +
            "or add a why-safe note to OracleLint.knifeEdgeSafe."
      }
    }
    // CAST(<float expr> AS BIGINT/INT/…) truncates — same edge as floor
    val casts = "(?<![a-z0-9_])cast\\s*\\(".r.findAllMatchIn(o).toSeq.flatMap { m =>
      argOf(m.start).toSeq.collect {
        case arg
            if "as\\s+(bigint|integer|int|smallint|tinyint|hugeint|long)\\s*$".r
              .findFirstIn(arg.trim).isDefined &&
              transcendentalRe.findFirstIn(arg).isDefined &&
              // floor/ceil inside the cast owns the discretization — the
              // floor lint above judges it (with its own defused() check);
              // double-flagging the cast would demand +0.5 twice
              "(?<![a-z0-9_])(floor|ceil|ceiling)\\s*\\(".r.findFirstIn(arg).isEmpty &&
              !defused(arg) =>
          s"$name: oracle CASTs a transcendental-bearing float straight to an " +
            s"integer type — `CAST(${arg.take(60)}…)` truncates with the " +
            "knife-edge at integers (the r15 ml_kaplan_meier class). " +
            "Round or half-up before the cast on BOTH sides, or add a " +
            "why-safe note to OracleLint.knifeEdgeSafe."
      }
    }
    floors ++ casts
  }

  /** Alias map across a plan's Project/Aggregate nodes — the SINGLE
    * copy shared by the key-equality and FP-accumulation halves, so a
    * fix to alias laundering lands in every half at once. */
  private def planAliasMap(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    plan.collect {
      case p: Project =>
        p.projectList.collect { case a: Alias => a.exprId -> a.child }
      case a: Aggregate =>
        a.aggregateExpressions.collect { case al: Alias => al.exprId -> al.child }
    }.flatten.toMap
  }

  /** Depth-capped transitive expansion through [[planAliasMap]]. */
  private def expandAliases(
      aliasMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        org.apache.spark.sql.catalyst.expressions.Expression])(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      depth: Int = 0): org.apache.spark.sql.catalyst.expressions.Expression =
    if (depth > 8) e
    else e.transformUp {
      case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if aliasMap.contains(ar.exprId) =>
        expandAliases(aliasMap)(aliasMap(ar.exprId), depth + 1)
    }

  /** Catalyst class names of the non-correctly-rounded math expressions
    * (the plan-side twin of [[transcendentalRe]]). */
  private val transcendentalClasses = Set(
    "Exp", "Expm1", "Log", "Log10", "Log1p", "Log2", "Logarithm", "Pow",
    "Sin", "Cos", "Tan", "Csc", "Sec", "Cot", "Asin", "Acos", "Atan",
    "Atan2", "Sinh", "Cosh", "Tanh", "Asinh", "Acosh", "Atanh")

  /** Plan-side twin of [[knifeEdge]]: the Spark side of a query is a
    * plan, not text, so the text lint can't see it — and a half-up fixed
    * only in the oracle leaves the knife-edge live in the engine result
    * (and vice versa; the r15 kaplan-meier fix had to land on BOTH
    * sides). Walks the ANALYZED plan for Floor / float→integral Cast
    * whose argument subtree carries a transcendental and no defusing
    * `+ 0.5` / round. */
  def knifeEdgePlan(
      name: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Expression, Floor, Literal => CLit}
    import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      LongType, IntegerType, ShortType, ByteType)
    if (knifeEdgeSafe.contains(name)) return Nil
    def transcendental(e: Expression): Boolean =
      e.exists(x => transcendentalClasses(x.getClass.getSimpleName))
    // the analyzed form of `+ 0.5` is Add(x, Cast(Literal(0.5BD) AS
    // DOUBLE)) — a DECIMAL literal behind an implicit cast, so the
    // half-up probe must strip casts and compare numerically
    def halfLit(e: Expression): Boolean = e match {
      case c: Cast => halfLit(c.child)
      case CLit(v, _) => v match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble == 0.5
        case n: java.lang.Number => n.doubleValue() == 0.5
        case _ => false
      }
      case _ => false
    }
    // Anchored like the text side (r16 ADVICE): the defusing half-up must
    // be on the SPINE of the discretized expression — the Floor/Cast
    // child itself, seen through casts and linear scaling — or every
    // transcendental must be DOMINATED by a Round/BRound (rounding
    // canonicalizes the ULP before discretization). An Add(0.5) buried
    // inside exp(), or a Round on a sibling operand, defuses nothing.
    def isRoundNode(e: Expression): Boolean = {
      val n = e.getClass.getSimpleName
      n == "Round" || n == "BRound"
    }
    def spineHalf(e: Expression): Boolean = e match {
      case c: Cast => spineHalf(c.child)
      case Add(a, b, _) => halfLit(a) || halfLit(b)
      case _ => false
    }
    def roundDominated(e: Expression): Boolean = {
      def ok(x: Expression, under: Boolean): Boolean = {
        if (transcendentalClasses(x.getClass.getSimpleName) && !under) false
        else x.children.forall(ok(_, under || isRoundNode(x)))
      }
      e.exists(isRoundNode) && ok(e, under = false)
    }
    def defusedPlan(e: Expression): Boolean = spineHalf(e) || roundDominated(e)
    val hits = scala.collection.mutable.LinkedHashSet.empty[String]
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case f: Floor if transcendental(f.child) && !defusedPlan(f.child) =>
            hits += s"$name: Spark plan floors a transcendental-bearing " +
              "expression without half-up (r15 ml_kaplan_meier class) — " +
              s"floor(${f.child.sql.take(70)}…)"
          case c: Cast
              if integral(c.dataType) &&
                (c.child.dataType == DoubleType || c.child.dataType == FloatType) &&
                transcendental(c.child) && !defusedPlan(c.child) &&
                // a floor/ceil inside owns the discretization — judged above
                c.child.collectFirst {
                  case x if x.getClass.getSimpleName == "Floor" ||
                    x.getClass.getSimpleName == "Ceil" => x
                }.isEmpty =>
            hits += s"$name: Spark plan CASTs a transcendental-bearing float " +
              "straight to an integer type (truncation knife-edge, r15 " +
              s"ml_kaplan_meier class) — cast(${c.child.sql.take(70)}…)"
          case _ => ()
        }
      }
    }
    hits.toSeq
  }

  /** Third knife-edge half (r16 verdict watch-item #2): EQUALITY on a
    * transcendental-bearing float used as a grouping / distinct / join
    * key. floor/cast discretization was the first hazard class; key
    * equality is the next one up — two engines computing `ln(x)` a ULP
    * apart put the same logical row in DIFFERENT groups (and a
    * `round(…, 6)` does NOT defuse it: a 1-ULP input straddling a
    * rounding boundary flips the 6th decimal, so rounding only narrows
    * the hazard, never closes it). Nothing should group or join on a
    * raw transcendental float — re-key on an integer/decimal
    * discretization with half-up, or document why-safe in
    * [[knifeEdgeSafe]]. Walks the ANALYZED plan's Aggregate grouping
    * expressions, Deduplicate keys, and Join equality conditions. */
  def knifeEdgeKeys(
      name: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Join}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    if (knifeEdgeSafe.contains(name)) return Nil
    // keys are usually ATTRIBUTES whose hazardous expression sits behind
    // a Project/Aggregate alias (`SELECT exp(x) AS e ... GROUP BY e`) —
    // resolve transitively through the plan's alias map or the lint is
    // launderable by one SELECT
    val aliasMap = planAliasMap(plan)
    def floatTrans(e: Expression): Boolean =
      (e.dataType == DoubleType || e.dataType == FloatType) &&
        expandAliases(aliasMap)(e)
          .exists(x => transcendentalClasses(x.getClass.getSimpleName))
    def hit(kind: String, e: Expression): String =
      s"$name: $kind keys on a transcendental-bearing float — " +
        s"`${e.sql.take(70)}` — a 1-ULP libm difference between engines " +
        "splits one logical group/match (the knife-edge class, one level " +
        "up from floor). Re-key on an integer/decimal discretization " +
        "with half-up, or add a why-safe note to OracleLint.knifeEdgeSafe."
    val hits = scala.collection.mutable.LinkedHashSet.empty[String]
    plan.foreach {
      case a: Aggregate =>
        a.groupingExpressions.filter(floatTrans).foreach(e => hits += hit("GROUP BY", e))
      case d: Deduplicate =>
        d.keys.filter(floatTrans).foreach(e => hits += hit("DISTINCT", e))
      case j: Join =>
        j.condition.foreach(_.foreach {
          case EqualTo(l, r) if floatTrans(l) || floatTrans(r) =>
            hits += hit("JOIN", if (floatTrans(l)) l else r)
          case EqualNullSafe(l, r) if floatTrans(l) || floatTrans(r) =>
            hits += hit("JOIN", if (floatTrans(l)) l else r)
          case _ => ()
        })
      case _ => ()
    }
    hits.toSeq
  }

  /** Fourth knife-edge half (r17 verdict #1 — the class the r17 driver
    * red proved): an EXPOSED raw FP-ACCUMULATED aggregate. FP addition
    * is non-associative, so `sum(<double>)` (and avg/var/stddev and the
    * co-moment family over FP inputs) is a function of ACCUMULATION
    * ORDER: Spark's partial-merge order varies run to run and DuckDB's
    * differs from both, so hash-comparing the raw value is flaky BY
    * CONSTRUCTION — jn_nullsafe_sumdbl_verbatim diverged by ~11 ULPs
    * between engines and drifted run-to-run. The fix class is an
    * order-independent exposure: `round(sum(x), d)` or
    * `CAST(sum(x) AS DECIMAL(p,d))` spelled identically on BOTH sides
    * (the true value must sit far from the d-decimal half-boundary —
    * the scale choice is the author's judgment, as with half #1's
    * half-up).
    *
    * NOT flagged (provably order-independent):
    *   - sum/avg over INTEGRAL inputs, including a direct
    *     Cast(int→double): every partial sum is integral, and doubles
    *     are exact on integers below 2^53 — order cannot matter.
    *     SCALE BOUND (r18 ADVICE): this exemption is CORPUS-SIZE-
    *     dependent, not absolute — Spark's Sum/Average over an
    *     int-cast-to-double accumulate in a DOUBLE buffer, so it holds
    *     only while max(|value|) × rows < 2^53 ≈ 9.0e15 for every
    *     partial. The driver corpora sit far inside it (worst case:
    *     sf0.1 lineitem ~600k rows × keys ≤ ~2e7 ≈ 1.2e13; the 3×
    *     fixture's offset keys ≤ ~2.1e7 × 1.8M rows ≈ 3.8e13), but a
    *     future scale-up round that pushes any summed-integral ×
    *     row-count product toward 9e15 must RE-EXAMINE this exemption
    *     rather than trust the lint's silence — above the bound the
    *     partials shed low bits and the sum is order-dependent again;
    *   - sum over DECIMAL (exact arithmetic);
    *   - min/max/first/last/count (duplicate-/order-invariant or not
    *     accumulated);
    *   - any column whose output type is non-FP — a discretization
    *     already happened (its own knife-edge is half #1's business).
    *
    * Known blind spots (documented, like half #1's): var/stddev over
    * INTEGRAL inputs still accumulate an FP M2 buffer (order-dependent
    * in principle) but are outside the verdict's class and green for 17
    * rounds — not flagged; an oracle that derives the hazard column
    * through an expression the alias scanner cannot tie to the column
    * name is adjudicated by the PLAN half only.
    *
    * Enforcement: the PLAN half flags a Float/Double OUTPUT column whose
    * (alias-expanded) expression contains an FP-accumulating aggregate
    * not dominated by a Round/BRound/Cast-to-DECIMAL; for every column
    * the plan shows to be FP-accumulation-DERIVED (defused or not), the
    * TEXT half requires the oracle's matching aggregate alias to carry
    * the same defusing. */
  def knifeEdgeFpAgg(
      name: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      oracle: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Sum}
    import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, ShortType}
    if (knifeEdgeSafe.contains(name)) return Nil
    val integral: Set[DataType] =
      Set(LongType, IntegerType, ShortType, ByteType, BooleanType)
    val aliasMap = planAliasMap(plan)
    // genuinely-fractional FP input: a direct int→double cast feeds only
    // integral values, which doubles accumulate exactly below 2^53
    def fractionalFp(e: Expression): Boolean =
      (e.dataType == DoubleType || e.dataType == FloatType) && (e match {
        case c: Cast if integral(c.child.dataType) => false
        case _ => true
      })
    // the co-moment family is FP-accumulated regardless of declared
    // type, but per the class scope only FP INPUTS are flagged
    val momentClasses = Set(
      "StddevPop", "StddevSamp", "VariancePop", "VarianceSamp",
      "Skewness", "Kurtosis", "Corr", "CovPopulation", "CovSample")
    def fpAccumulating(ae: AggregateExpression): Boolean =
      ae.aggregateFunction match {
        case s: Sum => fractionalFp(s.child)
        case a: Average => fractionalFp(a.child)
        case f if momentClasses(f.getClass.getSimpleName) =>
          f.children.exists(fractionalFp)
        case _ => false
      }
    def isDefuser(e: Expression): Boolean = e.getClass.getSimpleName match {
      case "Round" | "BRound" => true
      case _ => e match {
        case c: Cast => c.dataType.isInstanceOf[DecimalType]
        case _ => false
      }
    }
    def rawFpAgg(e: Expression, dominated: Boolean): Boolean = e match {
      case ae: AggregateExpression if !dominated && fpAccumulating(ae) => true
      case other =>
        other.children.exists(rawFpAgg(_, dominated || isDefuser(other)))
    }
    def anyFpAgg(e: Expression): Boolean = e.exists {
      case ae: AggregateExpression => fpAccumulating(ae)
      case _ => false
    }
    val hits = scala.collection.mutable.LinkedHashSet.empty[String]
    val hazardCols = scala.collection.mutable.LinkedHashSet.empty[String]
    plan.output.foreach { attr =>
      if (attr.dataType == DoubleType || attr.dataType == FloatType) {
        val e = expandAliases(aliasMap)(attr)
        if (anyFpAgg(e)) {
          hazardCols += attr.name.toLowerCase
          if (rawFpAgg(e, dominated = false))
            hits += s"$name: output column `${attr.name}` exposes a raw " +
              "FP-accumulated aggregate (sum/avg/var-family over a " +
              "fractional Float/Double input) — its value is a function " +
              "of accumulation order, so an exact comparator reads it " +
              "flaky (the r17 jn_nullsafe_sumdbl class). Expose " +
              "round(agg, d) or CAST(agg AS DECIMAL(p,d)) identically on " +
              "both sides, or add a why-safe note to " +
              "OracleLint.knifeEdgeSafe."
        }
      }
    }
    // TEXT half over the hazard-derived columns: the oracle's aggregate
    // alias for the column must carry the same defusing
    if (hazardCols.nonEmpty) {
      val o = oracle.toLowerCase
      val fpAggRe = ("(?<![a-z0-9_])(sum|avg|mean|stddev|stddev_pop|stddev_samp|" +
        "var_pop|var_samp|variance|covar_pop|covar_samp|corr|skewness|" +
        "kurtosis)\\s*\\(").r
      // spans of round(...) and CAST(... AS DECIMAL...) — an aggregate
      // inside one is defused
      def spansOf(re: scala.util.matching.Regex,
          keep: String => Boolean): Seq[(Int, Int)] =
        re.findAllMatchIn(o).toSeq.flatMap { m =>
          val open = o.indexOf('(', m.start)
          closeOf(o, open).collect {
            case c if keep(o.substring(open + 1, c)) => (m.start, c)
          }
        }
      val defSpans =
        spansOf("(?<![a-z0-9_])round\\s*\\(".r, _ => true) ++
          spansOf("(?<![a-z0-9_])cast\\s*\\(".r,
            arg => "as\\s+decimal".r.findFirstIn(arg).isDefined)
      // a later re-projection defuses only in the same two forms the
      // span check accepts: round(<col> …) or CAST(<col> AS DECIMAL…) —
      // a non-decimal cast (e.g. CAST(s AS DOUBLE)) defuses nothing.
      // r19 (r18 ADVICE): the defusing match must be ALIAS-DEFINING for
      // the hazard column — `round(<col>…) AS <col>` — mirroring how
      // the plan half requires the defuser to DOMINATE the aggregate. A
      // bare `round(<col>…)` anywhere (a HAVING/WHERE predicate, an
      // unrelated CTE) rounds a copy while the final projection still
      // exposes the raw FP-accumulated value — that was a launderable
      // false-negative path in the net.
      def recastDefused(colName: String): Boolean = {
        val c = java.util.regex.Pattern.quote(colName)
        def defines(re: scala.util.matching.Regex): Boolean =
          re.findAllMatchIn(o).exists { m =>
            val open = o.indexOf('(', m.start)
            closeOf(o, open).exists(close =>
              aliasAfter(o, close + 1).contains(colName))
          }
        defines(s"(?<![a-z0-9_])round\\s*\\(\\s*$c(?![a-z0-9_])".r) ||
          defines(s"(?<![a-z0-9_])cast\\s*\\(\\s*$c\\s+as\\s+decimal".r)
      }
      fpAggRe.findAllMatchIn(o).foreach { m =>
        val open = o.indexOf('(', m.start)
        closeOf(o, open).foreach { close =>
          aliasAfter(o, close + 1) match {
            case Some(alias)
                if hazardCols(alias) &&
                  !defSpans.exists { case (s, e) => m.start > s && m.start < e } &&
                  !recastDefused(alias) =>
              hits += s"$name: oracle aliases a raw FP aggregate to the " +
                s"FP-accumulation-derived column `$alias` without a " +
                "defusing round/decimal-cast — the Spark side may be " +
                "defused but the hash-compare still reads DuckDB's " +
                "accumulation-order value (the r17 jn_nullsafe_sumdbl " +
                "class). Defuse it identically on BOTH sides."
            case _ => ()
          }
        }
      }
    }
    hits.toSeq
  }

  /** Violation messages for one query; empty = clean. */
  def check(name: String, schema: StructType, oracle: String): Seq[String] = {
    val longCols =
      schema.fields.filter(_.dataType == LongType).map(_.name.toLowerCase).toSet
    if (longCols.isEmpty) return Nil
    val o = oracle.toLowerCase
    // identifier boundary after $col: without it, `... AS n` exempts a
    // DIFFERENT column named `n_rows` (substring false negative); the
    // optional `as` also accepts bare-identifier re-projections
    def recast(col: String): Boolean =
      ("as\\s+bigint\\s*\\)\\s+(as\\s+)?" + java.util.regex.Pattern.quote(col) +
        "(?![a-z0-9_])").r.findFirstIn(o).isDefined

    // every DuckDB aggregate that silently widens integers to HUGEINT:
    // sum (the class that bit twice), product, and list_sum
    val sumRe = "(?<![a-z0-9_])(sum|product|list_sum)\\s*\\(".r
    sumRe.findAllMatchIn(o).toSeq.flatMap { m =>
      val open = o.indexOf('(', m.start)
      closeOf(o, open) match {
        case None => Nil
        case Some(close) =>
          val directlyWrapped =
            o.substring(math.max(0, m.start - 8), m.start)
              .replaceAll("\\s+", "").endsWith("cast(")
          aliasAfter(o, close + 1) match {
            case Some(alias)
                if longCols(alias) && !directlyWrapped && !recast(alias) =>
              Seq(s"$name: oracle aliases a raw integer `sum(...)` to BIGINT " +
                s"output column `$alias` — DuckDB will type it HUGEINT and the " +
                "driver hash will diverge. Wrap it CAST(sum(...) AS BIGINT) or " +
                s"re-project `CAST($alias AS BIGINT) AS $alias` " +
                "(Registry.scala ORACLE TYPING RULE).")
            case _ => Nil
          }
      }
    }
  }

  /** Index of the `)` balancing the `(` at `open`, if any. */
  private def closeOf(s: String, open: Int): Option[Int] = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** SQL keywords that may legally follow an un-aliased aggregate — a
    * bare identifier here that is NOT one of these can only be an
    * AS-less alias (`sum(x) mon`), which must be linted like `AS mon`. */
  private val kw = Set(
    "from", "where", "group", "order", "having", "union", "except",
    "intersect", "limit", "offset", "fetch", "over", "filter", "and",
    "or", "not", "is", "in", "between", "like", "then", "else", "end",
    "when", "on", "join", "inner", "left", "right", "full", "cross",
    "using", "qualify", "window", "asc", "desc", "as",
    "nulls", "ignore", "respect")

  /** The alias following position `from` — `AS <ident>` or a bare
    * non-keyword identifier (`sum(x) mon`) — skipping an optional
    * `FILTER (WHERE ...)` clause. None when the sum feeds a larger
    * expression (`sum(x) / n`, `) + 1`, ...) — those are typed by the
    * enclosing expression, not the bare sum. */
  private def aliasAfter(s: String, from: Int): Option[String] = {
    var j = from
    def skipWs(): Unit = { while (j < s.length && s.charAt(j).isWhitespace) j += 1 }
    def ident(): Option[String] = {
      val start = j
      while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
      if (j > start) Some(s.substring(start, j)) else None
    }
    skipWs()
    if (s.startsWith("filter", j)) {
      j += 6; skipWs()
      if (j < s.length && s.charAt(j) == '(') closeOf(s, j) match {
        case Some(c) => j = c + 1; skipWs()
        case None => return None
      }
    }
    ident() match {
      case Some("as") =>
        skipWs()
        ident()
      case Some(bare) if !kw(bare) => Some(bare) // AS-less alias
      case _ => None
    }
  }
}
