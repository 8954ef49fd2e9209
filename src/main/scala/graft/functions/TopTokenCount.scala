package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of a document's most frequent token (q71's
  * top-token-mass numerator). Replaces the last heavy interpreted HOF
  * in the text family:
  * `array_max(transform(array_distinct(toks), t => size(filter(toks, x => x === t))))`
  * is O(n·distinct) NESTED interpreted lambdas per row; this is one
  * compiled call doing a single O(n) hashmap pass.
  *
  * Identical to the composed form by construction (TopTokenSpec proves
  * it on hostile + randomized inputs): tokens are split on a single
  * space with trailing empties kept, so every input has ≥1 token and
  * the result is ≥1 — `split("", " ")` is `[""]`, matching Spark.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_top_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_top_token_count needs a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    TopTokenCount.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopTokenCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

object TopTokenCount {
  /** Called from generated code — one invocation per row. */
  def compute(text: UTF8String): Int = {
    val w = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int](w.length * 2)
    var best = 0
    var i = 0
    while (i < w.length) {
      val c = counts.merge(w(i), 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    best
  }
}
