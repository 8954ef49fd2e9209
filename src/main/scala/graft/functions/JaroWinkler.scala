package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over two string columns — the
  * edit-distance-free fuzzy-match score record linkage actually ranks
  * by (Winkler's U.S. Census deduplication metric): Jaro = mean of
  * (m/|a|, m/|b|, (m−t)/m) over window-bounded character matches with
  * half-transpositions t, boosted by the shared prefix (cap 4, scale
  * 0.1) when Jaro > 0.7.
  *
  * Spark ships levenshtein() but no Jaro-Winkler; a Scala UDF would
  * box both strings per candidate pair. This Expression stays inside
  * whole-stage codegen by emitting a call to the static [[JaroWinkler.score]]
  * (primitive in/out, no boxing, JIT-inlineable) — preference order (b)
  * of SURVEY §7.3, the graft_dot pattern.
  *
  * Semantics pinned to DuckDB's jaro_winkler_similarity (the oracle
  * engine), probed empirically: boost ONLY when jaro > 0.7; prefix cap
  * 4; either input empty → 0 (including both empty, where the pure
  * definition would say 1); zero matches → 0. Scores compare after
  * round@6 — the two engines' float op ORDER inside jaro may differ in
  * the last ulp.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler needs two string arguments, got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.score($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** Static primitive-returning scorer the generated code calls.
    * Char-based (UTF-16 units) — identical to codepoint semantics on
    * the BMP, which covers the oracle corpus; supplementary-plane
    * inputs score each surrogate as a unit. */
  def score(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < 4 && l < la && l < lb && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
