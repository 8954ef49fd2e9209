package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan: which of a FIXED pattern list occur in
  * this string? `graft_match_any(text, array('a','b',…))` returns the
  * matched patterns, in pattern-list order, each at most once.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order b): the
  * blocklist/taxonomy scans a curation pipeline runs (unsafe-domain
  * phrases, boilerplate markers, contamination canaries) carry
  * thousands of patterns — the relational formulations are either a
  * pattern-join (|patterns| × corpus rows through a shuffle) or a
  * regex alternation (backtracking blowup, and still O(patterns) per
  * position). This expression compiles the list ONCE into an
  * Aho–Corasick automaton on the driver, ships it with the plan
  * (`ctx.addReferenceObj`, the same route Spark's own regexp
  * expressions use for their compiled Pattern), and scans each row in
  * O(bytes + matches) regardless of pattern count — inside whole-stage
  * codegen.
  *
  * Matching is raw UTF-8 byte containment — identical to
  * `Contains`/DuckDB `contains()` semantics for valid UTF-8, so a
  * per-pattern `contains` join is a faithful (slow) oracle twin.
  */
case class MatchAny(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_match_any"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_match_any pattern list must be a literal (the automaton is plan-time state)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_match_any needs (string, array<string> literal), got ${left.dataType} / ${right.dataType}")
    }

  // Built once per plan on the driver; interpreted eval on an executor
  // (non-codegen paths) rebuilds it lazily from the literal.
  @transient private lazy val ac: AhoCorasick = AhoCorasick.fromLiteral(right)

  override def nullSafeEval(t: Any, p: Any): Any =
    ac.matchAll(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $acRef.matchAll($t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MatchAny = copy(left = newLeft, right = newRight)
}

object MatchAny {
  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(text: Column, patterns: Seq[String]): Column =
    call_function("graft_match_any", text, array(patterns.map(lit): _*))
}

/** Serializable Aho–Corasick automaton over UTF-8 bytes. Goto edges
  * live in one (state«8|byte)-keyed hash map — compact for the sparse
  * fanout real pattern lists have (a dense 256-wide table would cost
  * 1 KB/state); failure links and merged output sets are flat arrays. */
final class AhoCorasick private (patterns: Array[UTF8String]) extends Serializable {
  require(patterns.nonEmpty, "graft_match_any: empty pattern list")
  require(patterns.forall(_ != null),
    "graft_match_any: null pattern in list (patterns must be non-null strings)")
  require(patterns.forall(_.numBytes > 0), "graft_match_any: empty pattern")

  private val goto_ = new java.util.HashMap[Long, Integer]()
  private val (fail, out) = {
    val kids = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for (pi <- patterns.indices) {
      val bytes = patterns(pi).getBytes
      var s = 0
      for (b <- bytes) {
        val key = (s.toLong << 8) | (b & 0xffL)
        val nxt = goto_.get(key)
        if (nxt == null) {
          val ns = kids.length
          goto_.put(key, ns)
          kids(s) += ((b & 0xff, ns))
          kids += scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          ends += Nil
          s = ns
        } else s = nxt
      }
      ends(s) ::= pi
    }
    val n = kids.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = Array.empty
    val q = scala.collection.mutable.Queue.empty[Int]
    for ((_, c) <- kids(0)) { fail(c) = 0; q += c }
    while (q.nonEmpty) {
      val s = q.dequeue()
      out(s) = (ends(s) ++ out(fail(s)).toList).distinct.sorted.toArray
      for ((b, c) <- kids(s)) {
        var f = fail(s)
        var g = goto_.get((f.toLong << 8) | b)
        while (g == null && f != 0) {
          f = fail(f)
          g = goto_.get((f.toLong << 8) | b)
        }
        fail(c) = if (g == null) 0 else g
        q += c
      }
    }
    (fail, out)
  }

  /** Called from generated code — one trie walk per row. */
  def matchAll(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val hit = new Array[Boolean](patterns.length)
    var nHit = 0
    var s = 0
    var i = 0
    while (i < bytes.length && nHit < patterns.length) {
      val b = bytes(i) & 0xff
      var st = s
      var g = goto_.get((st.toLong << 8) | b)
      while (g == null && st != 0) {
        st = fail(st)
        g = goto_.get((st.toLong << 8) | b)
      }
      s = if (g == null) 0 else g.intValue
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!hit(o(j))) { hit(o(j)) = true; nHit += 1 }
        j += 1
      }
      i += 1
    }
    val res = new scala.collection.mutable.ArrayBuffer[Any](nHit)
    var p = 0
    while (p < patterns.length) {
      if (hit(p)) res += patterns(p)
      p += 1
    }
    new GenericArrayData(res.toArray)
  }
}

object AhoCorasick {
  /** Build from the foldable array<string> literal of [[MatchAny]]. */
  def fromLiteral(patterns: Expression): AhoCorasick = patterns.eval() match {
    case a: ArrayData =>
      new AhoCorasick(a.toArray[UTF8String](StringType))
    case other => throw new IllegalArgumentException(
      s"graft_match_any: pattern list did not fold to an array: $other")
  }

  def apply(patterns: Seq[String]): AhoCorasick =
    new AhoCorasick(patterns.map(UTF8String.fromString).toArray)
}
