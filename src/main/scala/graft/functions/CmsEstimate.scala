package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` = the Count-Min-Sketch point estimate
  * for a string item — the probe half of Spark's `count_min_sketch`
  * aggregate, which builds the sketch but ships no SQL surface to read
  * one back. Together they complete the mergeable frequency-sketch
  * loop: partial sketches merge associatively in the aggregate's
  * map-side combine (counter matrices add), the final ~100 KB binary
  * broadcasts, and probes are pure arithmetic against it — fixed
  * memory in the key domain, the property that makes heavy-hitter
  * detection possible over unbounded keys (URLs, shingles) at 100 TB
  * where an exact groupBy's state is domain-sized.
  *
  * The item hashes exactly as the aggregate hashed it on ingest
  * (UTF8String bytes → the binary add path), so probe and build can
  * never disagree on key encoding.
  *
  * Codegen: `doGenCode` emits a call to [[CmsEstimate.estimate]] on a
  * reference-captured instance — the call stays inside whole-stage
  * codegen. Deserializing the sketch per row would swamp the probe, so
  * the instance memoizes (sketch-bytes reference → deserialized
  * sketch): the broadcast hands every row the SAME byte array, making
  * the memo a one-entry reference-equality hit. The memo field is a
  * single immutable pair written atomically — concurrent tasks may at
  * worst deserialize redundantly, never read a torn pair.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var memo: (Array[Byte], CountMinSketch) = _

  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long = {
    val m = memo
    // `eq` then CONTENT equality: UnsafeRow.getBinary hands each row a
    // FRESH byte-array copy, so in the real probe path (crossJoin of a
    // broadcast sketch) the reference check never hits and the ~100 KB
    // sketch would be re-parsed per row — the exact cost the memo
    // exists to remove. Arrays.equals on ~100 KB is ~1000x cheaper than
    // readFrom, and only runs on a reference miss.
    val sk =
      if (m != null && ((m._1 eq sketchBytes) ||
        java.util.Arrays.equals(m._1, sketchBytes))) m._2
      else {
        val s = CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sketchBytes))
        memo = (sketchBytes, s)
        s
      }
    // the aggregate ingested STRING columns as their UTF-8 bytes; probe
    // through the same binary path so hashing is identical
    sk.estimateCount(item.getBytes)
  }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this,
      classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, (sk, it) => s"$ref.estimate($sk, $it)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  val identifier: FunctionIdentifier = FunctionIdentifier("cms_estimate")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CmsEstimate].getName, "cms_estimate")
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "cms_estimate takes exactly 2 arguments")
    CmsEstimate(children.head, children(1))
  }
}
