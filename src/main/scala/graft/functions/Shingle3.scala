package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle3(tokens)` — the 3-word shingle array `[t₀ t₁ t₂, t₁ t₂ t₃,
  * …]` over an `array<string>` token column (empty result for fewer
  * than 3 tokens; callers wrap the short-document fallback).
  *
  * Byte-for-byte equal to the composable form
  * `transform(sequence(1, size(tk) - 2), i -> concat_ws(' ',
  * slice(tk, i, 3)))`, which evaluates INTERPRETED: per shingle index
  * the lambda re-walks a slice→concat_ws expression tree, allocating a
  * slice array and dispatching through eval() nodes. This is the inner
  * loop of the entire dedup family (every MinHash/SimHash/Jaccard query
  * starts by shingling the corpus), so it gets the native treatment:
  * one flat loop building each shingle with a single byte-copying
  * concat. Codegen emits a call to the static [[Shingle3.compute]] —
  * the loop itself is JIT-compiled JVM code either way.
  */
case class Shingle3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"shingle3 expects array<string>, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle3"

  override protected def nullSafeEval(input: Any): Any =
    Shingle3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingle3.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingle3 =
    copy(child = newChild)
}

object Shingle3 {
  private val Space = UTF8String.fromString(" ")

  /** One pass, one concat per shingle. concat_ws semantics: null tokens
    * are skipped by UTF8String.concatWs, matching the composable form.
    */
  def compute(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.concatWs(Space,
        tk.getUTF8String(i), tk.getUTF8String(i + 1), tk.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("shingle3")
  val info: ExpressionInfo = new ExpressionInfo(classOf[Shingle3].getName, "shingle3")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "shingle3 takes exactly 1 argument")
    Shingle3(children.head)
  }
}
