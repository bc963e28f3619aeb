package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `win_hashes60(text, n_chars, W)` — the stride-1 substring-dedup
  * window pass as ONE native array expression: for every window start
  * i ∈ [1, n_chars − W + 1], the 60-bit md5 prefix of the W-char
  * substring, value-identical to the composable form
  *
  *   transform(sequence(1, n_chars - W + 1),
  *     i -> CAST(conv(substring(md5(substring(text, i, W)), 1, 15),
  *               16, 10) AS BIGINT))
  *
  * (md5 hex chars 1..15 are the digest's first 60 bits, so the value is
  * the first 8 digest bytes as a big-endian long, shifted right 4 —
  * bit-for-bit what conv(…,16,10) parses). Why native (guide §1.2 step
  * 2, per-task work): the composable chain costs ~3 µs per WINDOW —
  * `substring(text, i, W)` re-scans the string from byte 0 on every
  * call to find the i-th code point (O(n²) bytes touched per document),
  * `md5` allocates a 32-char hex string, and `conv` parses it back —
  * while this expression walks the code-point offsets ONCE per
  * document, feeds each window's byte range straight into a reused
  * MessageDigest, and never materializes hex. Same W×-corpus output
  * volume, ~10× less CPU per window; the DuckDB oracle keeps its own
  * spelling and the gate proves value equality.
  *
  * Clamping matches SQL substring exactly: windows whose tail passes
  * the end of the string hash the clamped (shorter) slice; windows
  * starting past the end hash the empty string. `n_chars` is the
  * STORED column, trusted like the composable form trusts it (both
  * emit max(0, n_chars − W + 1) windows regardless of the actual text
  * length — though every call site guards `n_chars >= W`, where the
  * two forms are indistinguishable; for n_chars < W the composable
  * form's sequence(1, k<1) would emit the degenerate [1, 0] descent,
  * which no caller reaches, and this expression returns the empty
  * array). NULL in any argument → NULL out.
  */
case class WinHashes60(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType) = t == LongType || t == IntegerType
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"win_hashes60 expects (string, int/long, int), got ${first.dataType.simpleString} text")
    else if (!integral(second.dataType) || !integral(third.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"win_hashes60 expects integral n_chars/W, got " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "win_hashes60"

  override protected def nullSafeEval(t: Any, n: Any, w: Any): Any =
    WinHashes60.compute(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].longValue(), w.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, w) =>
      s"graft.functions.WinHashes60.compute($t, (long)$n, (int)$w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinHashes60 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinHashes60 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One pass per document: code-point offsets walked once, one
    * digest.update over each window's byte range, no hex round-trip.
    * Static so generated code calls it directly (the Shingle3 pattern).
    */
  def compute(text: UTF8String, nChars: Long, w: Int): ArrayData = {
    val nWin = nChars - (w - 1)
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val nCp = text.numChars()
    // start byte offset of every code point (+ end sentinel): windows
    // are contiguous byte ranges, so each hash is one update() call
    val off = new Array[Int](nCp + 1)
    var i = 0
    var cp = 0
    while (cp < nCp) {
      off(cp) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      cp += 1
    }
    off(nCp) = bytes.length
    val md = md5.get()
    val n = math.min(nWin, Int.MaxValue.toLong).toInt
    val out = new Array[Any](n)
    var p = 0
    while (p < n) {
      val s = math.min(p, nCp)
      val e = math.min(p + w, nCp)
      md.reset()
      if (e > s) md.update(bytes, off(s), off(e) - off(s))
      val d = md.digest()
      out(p) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      p += 1
    }
    new GenericArrayData(out)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("win_hashes60")
  val info: ExpressionInfo = new ExpressionInfo(classOf[WinHashes60].getName, "win_hashes60")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "win_hashes60 takes exactly 3 arguments")
    WinHashes60(children.head, children(1), children(2))
  }
}
