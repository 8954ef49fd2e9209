package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native intersection COUNT of two sorted `array<bigint>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * composed form `size(array_intersect(a, b))` builds a hash set of one
  * side and MATERIALIZES the intersection array per row — pure overhead
  * when only the count is consumed, and the verify step of an exact
  * set-similarity join (q198) evaluates it once per candidate pair
  * (millions of times on a template-dense corpus). Both inputs there are
  * already sorted (rarest-first canonical order), so a fused two-pointer
  * merge walk — zero allocation, whole-stage codegen — does the same
  * count in one pass.
  *
  * Equivalence contract (SortedInterCountSpec gates it): for arrays that
  * are sorted ascending and duplicate-free — the producer's invariant in
  * every call site — the result equals `size(array_intersect(a, b))`
  * exactly. Null arrays yield null (BinaryExpression null-intolerant
  * default, same as array_intersect's null-in → null-out here).
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_inter"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_inter needs two array<bigint> arguments, got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(a: Column, b: Column): Column =
    call_function("graft_sorted_inter", a, b)
}
