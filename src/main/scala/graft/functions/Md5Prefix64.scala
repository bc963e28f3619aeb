package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix64(s)` — the repo's 60-bit hash idiom as ONE native
  * scalar expression, value-identical to the composable form
  *
  *   CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
  *
  * (md5 hex chars 1..15 are the digest's first 60 bits, so the value is
  * the first 8 digest bytes as a big-endian long shifted right 4 — the
  * same arithmetic win_hashes60 performs per window). Why native (guide
  * §1.2 step 2, per-task work): the composable chain allocates a
  * 32-char hex string per call and then `conv` parses 15 of those chars
  * back into the long — pure round-trip waste on every shingle of every
  * document in the postings/SimHash/MinHash builders and every per-row
  * hash site (weighted sampling, stratified buckets, paragraph blocks).
  * This expression feeds the UTF-8 bytes straight into a reused
  * MessageDigest and assembles the long from the raw digest. The DuckDB
  * oracle keeps its own spelling
  * (`CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT)`), so the hash
  * gate proves value equality end-to-end; Md5Prefix64Spec pins the
  * equivalence per-row (ASCII, multi-byte, empty, null).
  *
  * NULL in → NULL out, matching the composable chain (md5(NULL) is
  * NULL and the cast propagates it).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(s: Any): Any =
    Md5Prefix64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Md5Prefix64.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s): first 8 digest bytes as a big-endian long,
    * >>> 4. Static so generated code calls it directly (the WinHashes60
    * pattern).
    */
  def compute(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("md5_prefix64")
  val info: ExpressionInfo = new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "md5_prefix64 takes exactly 1 argument")
    Md5Prefix64(children.head)
  }
}
