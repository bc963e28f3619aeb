package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `gzip_size(payload)` = the DEFLATE-compressed byte count of a
  * `binary` column — the primitive behind compression-ratio quality
  * filtering (highly repetitive boilerplate deflates to a tiny
  * fraction of its raw size; high-entropy natural text does not; pure
  * noise doesn't deflate at all). The pipelines behind several public
  * web-corpus curation recipes gate on exactly this signal.
  *
  * A native expression rather than a UDF for the usual reasons
  * (SURVEY §7.4): null handling for free, a SQL-surface name, and the
  * call stays inside whole-stage codegen — `doGenCode` emits a static
  * call to [[GzipSize.deflatedSize]], the same pattern Spark's own
  * non-arithmetic built-ins use; the cost is the deflate itself, not
  * dispatch.
  *
  * Determinism: `java.util.zip.Deflater` at a FIXED level (6, zlib's
  * default) with a fixed strategy is deterministic for a given input
  * on a given JVM — the spec pins byte-identical repeat runs. The
  * output size is counted, never buffered whole: memory is O(8 KiB)
  * regardless of payload size.
  */
case class GzipSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gzip_size expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "gzip_size"

  override protected def nullSafeEval(input: Any): Any =
    GzipSize.deflatedSize(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GzipSize.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipSize =
    copy(child = newChild)
}

object GzipSize {
  /** Deflate at level 6 and count output bytes (streaming, no output
    * retention). Static so generated code can call it directly.
    */
  def deflatedSize(payload: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(payload)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("gzip_size")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GzipSize].getName, "gzip_size")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "gzip_size takes exactly 1 argument")
    GzipSize(children.head)
  }
}
