package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-word-gram extraction — the third graft Expression after
  * graft_dot/graft_l2sq, motivated by round 8's measured lesson: the
  * composed `transform(sequence(...), i -> concat_ws(...))` (+
  * `array_distinct`) form evaluates its lambda INTERPRETED, row by row,
  * element by element — the single hottest per-row work in the whole
  * dedup family (every shingle of every document flows through it).
  * This expression is one compiled call per row: split once, assemble
  * grams in a tight loop, dedupe (when asked) in an insertion-ordered
  * set.
  *
  * Semantics are bit-identical to the composed form it replaces
  * (NgramsSpec proves equality on randomized inputs):
  *  - tokens = split on single space, trailing empties KEPT
  *    (Spark `split(text, " ")` limit -1 semantics);
  *  - docs shorter than n tokens yield [text] (the library-wide short
  *    -document fallback, Dedup.shinglesOf / TrainPrep.ngramsOf);
  *  - `distinct = true` keeps first-occurrence order, exactly
  *    array_distinct.
  */
case class Ngrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams needs a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    Ngrams.compute(s.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Ngrams.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Ngrams =
    copy(child = newChild)
}

object Ngrams {

  /** Called from generated code — one invocation per row. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    val w = s.split(" ", -1)
    if (w.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val count = w.length - n + 1
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(join(w, i, n)); i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < count) { seen.add(join(w, i, n)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  private def join(w: Array[String], from: Int, n: Int): String = {
    var len = n - 1
    var k = 0
    while (k < n) { len += w(from + k).length; k += 1 }
    val sb = new java.lang.StringBuilder(len)
    sb.append(w(from))
    k = 1
    while (k < n) { sb.append(' ').append(w(from + k)); k += 1 }
    sb.toString
  }
}

/** Character n-grams — the char-level sibling of [[Ngrams]] (q72's
  * trigram table builds ~length(text) grams per document through an
  * interpreted transform/substr lambda without this). All grams kept
  * (duplicates included — the counts ARE the point); an input shorter
  * than n CODEPOINTS yields an empty array (callers filter, matching
  * the composed form's `length(text) >= n` guard, which also counts
  * codepoints). Windows advance by CODEPOINT — matching Spark's and
  * DuckDB's substr on all of Unicode, so non-BMP text (emoji,
  * supplementary CJK) never splits a surrogate pair. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams needs a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    CharNgrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val count = s.codePointCount(0, s.length) - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    // two sliding CODE-UNIT cursors, each advanced one codepoint per
    // gram — O(1) per step, surrogate pairs never split
    var from = 0
    var until = s.offsetByCodePoints(0, n)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromString(s.substring(from, until))
      i += 1
      if (i < count) {
        from = s.offsetByCodePoints(from, 1)
        until = s.offsetByCodePoints(until, 1)
      }
    }
    new GenericArrayData(out)
  }
}
