package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens that belong to a literal word set — the native form
  * of `size(filter(split(text, " "), w => w.isInCollection(words)))`
  * (q21 stop-ratio, q22 lang-id heuristic) and of the single-term
  * `size(filter(w, _ === term))` term frequency (q73 BM25). Those
  * lambdas evaluate INTERPRETED per token per row directly above the
  * documents scan — the round-8/9 scan-layout lesson (see PlanSpec's
  * lambda walker); this is one compiled hash-probe loop per row.
  *
  * Accepts a string (split on single space, trailing empties kept —
  * Spark `split(text, " ")` limit -1 semantics) or a pre-split
  * `array<string>`; null array elements never match. The word set is a
  * comma-separated literal (none of our gate vocabularies contain
  * commas), fixed at plan time like Ngrams' `n`.
  */
case class CountTokensIn(child: Expression, wordsCsv: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_tokens_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_count_tokens_in needs a string or array<string> argument, got $other")
  }

  private lazy val isArray = child.dataType.isInstanceOf[ArrayType]

  override def nullSafeEval(s: Any): Any =
    if (isArray) CountTokensIn.computeArr(s.asInstanceOf[ArrayData], wordsCsv)
    else CountTokensIn.compute(s.asInstanceOf[UTF8String], wordsCsv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csv = ctx.addReferenceObj("wordsCsv", wordsCsv, "java.lang.String")
    val fn = if (isArray) "computeArr" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountTokensIn.$fn($c, $csv);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountTokensIn =
    copy(child = newChild)
}

object CountTokensIn {

  // the set is tiny and shared by every row of a task; cache per csv
  private val sets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()
  private def setOf(csv: String): java.util.HashSet[String] =
    sets.computeIfAbsent(csv, c => {
      val s = new java.util.HashSet[String]()
      c.split(",", -1).foreach(s.add)
      s
    })

  /** Called from generated code — one invocation per row. */
  def compute(text: UTF8String, csv: String): Int = {
    val set = setOf(csv)
    val w = text.toString.split(" ", -1)
    var n = 0
    var i = 0
    while (i < w.length) { if (set.contains(w(i))) n += 1; i += 1 }
    n
  }

  def computeArr(arr: ArrayData, csv: String): Int = {
    val set = setOf(csv)
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i).toString)) n += 1
      i += 1
    }
    n
  }
}
