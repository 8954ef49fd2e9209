package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an
  * intermediate array per row and evaluates two higher-order lambdas; this
  * expression is a single fused loop with full whole-stage codegen — the
  * difference is material when a 100 TB similarity join evaluates one dot
  * product per candidate pair.
  *
  * Summation is a strict left fold in index order — bit-identical to the
  * composed form and to the DuckDB oracle's list_dot_product, which the
  * hash-compare relies on. Null array elements are not supported (the
  * embedding corpus has none); a null array yields null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<double> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
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
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}

/** Session extensions registering graft's native functions and plan
  * rules — the public `SparkSessionExtensions` route, so `graft_dot` is
  * also callable from plain SQL and the interval-join rewrite applies
  * to every query. Wired in via `SparkSession.builder().withExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // Literal-shape arguments (n-gram width, chunking modulus) shape the
  // EXPRESSION, not the data — a non-foldable or missing one must fail
  // analysis with a message naming the function, not surface later as
  // an opaque ClassCastException from eval() (ADVICE round 8).
  private def checkArgs(fn: String, exprs: Seq[Expression], arity: Int,
      foldableFrom: Int): Unit = {
    if (exprs.length != arity)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn expects $arity arguments, got ${exprs.length}"))
    exprs.drop(foldableFrom).zipWithIndex.foreach { case (ex, i) =>
      if (!ex.foldable)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            s"$fn argument ${foldableFrom + i + 1} must be a literal, got ${ex.sql}"))
    }
  }
  private def litInt(fn: String, ex: Expression): Int = ex.eval() match {
    case n: Number => n.intValue
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"$fn expects an integer literal, got $other"))
  }
  private def litStr(fn: String, ex: Expression): String = ex.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" ->
        s"$fn expects a string literal, got $other"))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      // Cast lets callers pass array<float> (exact widening); trivial
      // casts on array<double> are optimized away.
      (exprs: Seq[Expression]) => {
        checkArgs("graft_dot", exprs, 2, foldableFrom = 2)
        DotProduct(
          Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_l2sq", exprs, 2, foldableFrom = 2)
        SqDist(
          Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[Ngrams].getName, "graft_ngrams"),
      // (text, n, distinct) — n/distinct must be literals; they shape
      // the expression, not the data
      (exprs: Seq[Expression]) => {
        checkArgs("graft_ngrams", exprs, 3, foldableFrom = 1)
        Ngrams(exprs(0), litInt("graft_ngrams", exprs(1)),
          exprs(2).eval() == true)
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_char_ngrams", exprs, 2, foldableFrom = 1)
        CharNgrams(exprs(0), litInt("graft_char_ngrams", exprs(1)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      // (text, n, m) — window width and cut modulus are literals
      (exprs: Seq[Expression]) => {
        checkArgs("graft_cdc_chunks", exprs, 3, foldableFrom = 1)
        CdcChunks(exprs(0), litInt("graft_cdc_chunks", exprs(1)),
          litInt("graft_cdc_chunks", exprs(2)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_top_token_count"),
      new ExpressionInfo(classOf[TopTokenCount].getName, "graft_top_token_count"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_top_token_count", exprs, 1, foldableFrom = 1)
        TopTokenCount(exprs(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_count_tokens_in"),
      new ExpressionInfo(classOf[CountTokensIn].getName, "graft_count_tokens_in"),
      // (textOrTokenArray, wordsCsv) — the word set is a literal
      (exprs: Seq[Expression]) => {
        checkArgs("graft_count_tokens_in", exprs, 2, foldableFrom = 1)
        CountTokensIn(exprs(0), litStr("graft_count_tokens_in", exprs(1)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_jaro_winkler", exprs, 2, foldableFrom = 2)
        JaroWinklerSim(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_sorted_inter"),
      new ExpressionInfo(classOf[SortedInterCount].getName, "graft_sorted_inter"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_sorted_inter", exprs, 2, foldableFrom = 2)
        SortedInterCount(
          Cast(exprs(0), ArrayType(LongType)), Cast(exprs(1), ArrayType(LongType)))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_nfc", exprs, 1, foldableFrom = 1)
        NfcNormalize(exprs(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_match_any"),
      new ExpressionInfo(classOf[MatchAny].getName, "graft_match_any"),
      // (text, patterns) — the pattern list is a literal: it compiles
      // into the plan-time Aho–Corasick automaton
      (exprs: Seq[Expression]) => {
        checkArgs("graft_match_any", exprs, 2, foldableFrom = 1)
        MatchAny(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcDistance].getName, "graft_adc"),
      (exprs: Seq[Expression]) => {
        checkArgs("graft_adc", exprs, 2, foldableFrom = 2)
        AdcDistance(exprs(0), exprs(1))
      }))
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRule())
  }
}
