package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two `array<double>` columns — the
  * second fused-loop Expression after [[DotProduct]], motivated by the
  * quantizer hot paths: the literal-centroid argmin (q63/q66 IVF
  * assignment, q95 PQ encode) evaluates one subspace distance per
  * (row, centroid), i.e. k× per row — the composed
  * `aggregate(zip_with(v, c, (a,b)=>(a-b)*(a-b)), 0, _+_)` form
  * allocates an intermediate array and evaluates two lambdas for EACH
  * of those, where this is one allocation-free loop inside whole-stage
  * codegen.
  *
  * Accumulation is a strict left fold in index order: for EQUAL-LENGTH
  * inputs it is bit-identical to the composed form (same IEEE ops in
  * the same order), so swapping it into existing oracle-gated queries
  * cannot move a single bit — the DuckDB twins stay valid unchanged
  * (proven: q63/q66/q95 hashes). On length-MISMATCHED inputs the two
  * forms diverge by construction: zip_with pads the short side with
  * null and the composed fold returns null, while this loop folds over
  * the common prefix. Every gate pairs fixed-dimension vectors (64-dim
  * embeddings, m-dim subspaces), so the mismatch case is unreachable
  * there; callers comparing ragged arrays must length-guard first. */
case class SqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq needs two array<double> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDist = copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(a: Column, b: Column): Column = call_function("graft_l2sq", a, b)
}
