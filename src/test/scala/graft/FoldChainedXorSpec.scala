package graft

import org.apache.spark.sql.catalyst.expressions.{BitwiseXor, Literal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule (plans/FoldChainedXor, registered by
  * functions/GraftExtensions via injectOptimizerRule) must fold
  * `(x ^ c1) ^ c2` to `x ^ (c1 ^ c2)` without changing results, and
  * must leave non-foldable shapes alone.
  */
class FoldChainedXorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def countXors(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    var n = 0
    plan.transformAllExpressions { case e: BitwiseXor => n += 1; e }
    n
  }

  test("chained constant XORs fold to one (rule applied to the live optimizer)") {
    import spark.implicits._
    // the rule must be registered through exactly one shipped path:
    // the spark.sql.extensions injected batch (the test session since
    // it adopted the full production conf) or, for sessions built
    // without extensions, ensureRegistered's extraOptimizations append
    // — never both (a double registration would run the rule twice)
    val viaExtensions = spark.conf.getOption("spark.sql.extensions")
      .exists(_.split(',').map(_.trim)
        .contains(classOf[functions.GraftExtensions].getName))
    val viaExtra =
      spark.experimental.extraOptimizations.contains(plans.FoldChainedXor)
    assert(viaExtensions ^ viaExtra,
      s"FoldChainedXor must register via exactly one path " +
        s"(extensions=$viaExtensions, extraOptimizations=$viaExtra)")
    // parquet-backed source: a local Seq would be constant-folded into
    // a LocalRelation before the xor chain is even visible
    val df = Tables.events(spark, SparkTestSession.sf0001)
      .select((col("event_id").bitwiseXOR(lit(1227844342346046657L))
        .bitwiseXOR(lit(530179042305200133L))).as("salted"))
    assert(countXors(df.queryExecution.optimizedPlan) == 1,
      s"chain not folded:\n${df.queryExecution.optimizedPlan}")
    // and the folded plan computes the same values as unfolded semantics
    val ids = Tables.events(spark, SparkTestSession.sf0001)
      .select("event_id").as[Long].collect()
    val expect = ids.map(_ ^ 1227844342346046657L ^ 530179042305200133L).sorted.toSeq
    assert(df.as[Long].collect().sorted.toSeq == expect)
  }

  test("rule folds all commuted literal positions, skips column-column xor") {
    import spark.implicits._
    val base = Seq(5L).toDF("h")
    def optimized(c: org.apache.spark.sql.Column) =
      plans.FoldChainedXor(base.select(c.as("r")).queryExecution.analyzed)
    // literal-first nesting: (c1 ^ x) ^ c2
    val p1 = optimized(lit(7L).bitwiseXOR(col("h")).bitwiseXOR(lit(9L)))
    assert(countXors(p1) == 1)
    var folded: Option[Any] = None
    p1.transformAllExpressions { case e @ BitwiseXor(_, Literal(v, _)) => folded = Some(v); e }
    assert(folded.contains(7L ^ 9L))
    // x ^ y of two columns must not be touched
    val two = Seq((1L, 2L)).toDF("a", "b")
    val p2 = plans.FoldChainedXor(
      two.select(col("a").bitwiseXOR(col("b")).bitwiseXOR(col("a")).as("r"))
        .queryExecution.analyzed)
    assert(countXors(p2) == 2, "column-only xor chain must be untouched")
  }
}
