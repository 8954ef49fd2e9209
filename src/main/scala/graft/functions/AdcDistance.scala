package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric Distance Computation lookup (the PQ search hot path,
  * q95): `adc(tabs, codes) = Σ_s tabs[s][codes[s]]` — m table probes
  * per candidate pair. The composed
  * `aggregate(zip_with(tabs, codes, (t,c) => element_at(t, c+1)), 0, +)`
  * form ran two interpreted lambdas per PAIR on the index-scan side of
  * the cell join (the scan-layout lesson, PlanSpec lambda walker), and
  * ADC is exactly the expression a 100 TB vector search evaluates most
  * often. One compiled loop; strict left fold in subspace order, so
  * the IEEE sum order — and the DuckDB oracle's ordered-list fold —
  * is unchanged bit-for-bit (AdcSpec proves equality).
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_adc needs (array<array<double>>, array<int>), got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tabs = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = math.min(tabs.numElements(), codes.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += tabs.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getArray($i).getDouble($b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDistance = copy(left = newLeft, right = newRight)
}
