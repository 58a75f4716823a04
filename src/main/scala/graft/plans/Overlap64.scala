package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd DISTINCT-overlap count of two SORTED BIGINT-array
  * columns — the verify kernel of the gram-dedup family (DedupQueries
  * containment/Jaccard), where the composable form
  * `size(array_intersect(a, b))` evaluates INTERPRETED, building a hash
  * set per row over ~300-element arrays for every candidate pair. This
  * expression is one fused two-pointer merge: no allocation, stays
  * inside WholeStageCodegen.
  *
  * Semantics: |set(a) ∩ set(b)| for inputs sorted ascending (duplicate
  * values — 60-bit hash collisions — count once, exactly like
  * array_intersect on pre-distinct gram lists; `graft_overlap64(a, a)`
  * is therefore the distinct-cardinality of `a`). Inputs MUST be sorted
  * ascending with no null elements (the dedup pipeline array_sorts its
  * hash arrays); NULL on null input arrays. Extension path per SURVEY
  * §7: custom Expression beats UDF (reference analog: catalyst/
  * expressions/arithmetic.scala's fused kernels).
  */
case class Overlap64(left: Expression, right: Expression) extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_overlap64 requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap64"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var cnt = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        while (i < na && x.getLong(i) == xv) i += 1
        while (j < nb && y.getLong(j) == xv) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long $cnt = 0L;
         |int $i = 0, $j = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $na && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $nb && $b.getLong($j) == $xv) { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Overlap64 =
    copy(left = newLeft, right = newRight)

  override def toString: String = s"graft_overlap64($left, $right)"
}

object Overlap64 {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_overlap64",
      { exprs: Seq[Expression] =>
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_overlap64 requires exactly 2 arguments, got ${exprs.length}")
        Overlap64(exprs(0), exprs(1))
      },
      "built-in")
}
