package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking (the rsync/FastCDC boundary rule of
  * [[graft.ops.TrainPrep.cdcChunkDedup]], q83): cut AFTER any `n`-token
  * window whose 32-bit hash ≡ 0 (mod m), return the chunk strings in
  * document order.
  *
  * Why an Expression (round 9, the q120 lesson applied): the composed
  * form ran `filter(sequence(...), i -> conv(substring(md5(concat_ws(
  * slice(...)))...)` — an INTERPRETED lambda evaluating one full md5
  * per token window per document, inlined into the projection feeding
  * the chunk explode. Projections execute in their input's task layout,
  * so at one parquet file the entire corpus's chunking ran in ONE task
  * (measured 4.3 s solo at sf0.1; unboundedly worse at 100 TB). This
  * expression is one compiled call per row: tokenize once, hash each
  * window over pre-encoded UTF-8 token bytes in a tight loop, assemble
  * chunks directly.
  *
  * Bit-identical to the composed form it replaces (CdcChunksSpec proves
  * equality on hostile + randomized inputs, and the baked q83 oracle
  * passes unchanged):
  *  - tokens = split on single space, trailing empties KEPT;
  *  - window hash = first 8 hex chars of md5(utf8(tokens joined by one
  *    space)) parsed base-16 — exactly
  *    `conv(substring(md5(concat_ws(" ", slice(w, i+1, n))), 1, 8), 16, 10)`,
  *    i.e. the big-endian unsigned int of the digest's first 4 bytes
  *    (the md5-slice family shared with MinHash/CMS, so the DuckDB
  *    oracle mirrors it verbatim);
  *  - a cut lands on window-final token i+n-1; chunk k spans
  *    [cut(k-1)+1, cut(k)]; a cut on the last token opens no empty
  *    trailing chunk;
  *  - docs shorter than n tokens (incl. "") yield the whole text as
  *    one chunk.
  */
case class CdcChunks(child: Expression, n: Int, m: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks needs a string argument, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    CdcChunks.compute(s.asInstanceOf[UTF8String], n, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $n, $m);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  // MessageDigest.getInstance allocates; one instance per task thread,
  // reset() between windows (the JDK contract after digest()).
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  /** Called from generated code — one invocation per row. */
  def compute(text: UTF8String, n: Int, m: Int): ArrayData = {
    val s = text.toString
    val w = s.split(" ", -1)
    val len = w.length
    if (len < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    // UTF-8 token bytes once — each token is hashed by up to n windows
    val tb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      tb(i) = w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8); i += 1
    }
    val digest = md5.get()
    val out = new java.util.ArrayList[Any]()
    var start = 0 // first token of the open chunk
    i = 0
    while (i <= len - n) { // window starts
      digest.reset()
      var k = 0
      while (k < n) {
        if (k > 0) digest.update(SPACE)
        digest.update(tb(i + k)); k += 1
      }
      val d = digest.digest()
      // first 8 hex chars == big-endian unsigned int of bytes 0..3
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h % m == 0) {
        val e = i + n - 1 // cut after the window's final token
        out.add(UTF8String.fromString(join(w, start, e - start + 1)))
        start = e + 1
      }
      i += 1
    }
    if (start <= len - 1) // a cut on the last token leaves nothing open
      out.add(UTF8String.fromString(join(w, start, len - start)))
    new GenericArrayData(out.toArray)
  }

  private def join(w: Array[String], from: Int, count: Int): String = {
    var lenSum = count - 1
    var k = 0
    while (k < count) { lenSum += w(from + k).length; k += 1 }
    val sb = new java.lang.StringBuilder(lenSum)
    sb.append(w(from))
    k = 1
    while (k < count) { sb.append(' ').append(w(from + k)); k += 1 }
    sb.toString
  }
}
