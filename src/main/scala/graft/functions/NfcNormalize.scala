package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — canonical composition of
  * combining sequences (e.g. `a` + U+0301 → U+00E1). Spark ships no
  * normalizer function at all, yet NFC is the first transform every
  * text-curation pipeline applies (two byte-different spellings of
  * the same string otherwise defeat exact dedup, tokenization and
  * equality joins alike). A Scala UDF would work but falls out of
  * whole-stage codegen; this Expression stays inside the span and
  * costs one `java.text.Normalizer` call per row.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan,
  * and real-world corpora are overwhelmingly already-NFC — those rows
  * return the input UTF8String untouched (no decode, no re-encode).
  *
  * Oracle parity: `java.text.Normalizer` and DuckDB's
  * `nfc_normalize()` both implement UAX #15 canonical composition,
  * so outputs agree byte-for-byte (NfcSpec pins the known shapes:
  * combining accents, Hangul jamo, already-composed passthrough).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Column surface; sessions built via [[graft.Sessions]] have the
    * function injected. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", c)

  /** Called from generated code — one invocation per row. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
