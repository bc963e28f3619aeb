package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd dot product must agree with the interpreted
  * higher-order form on the real embeddings table, evaluate under
  * whole-stage codegen, and handle nulls/ragged arrays.
  */
class ArrayDotProductSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    // same registrations SparkSessionExtensions.injectFunction performs,
    // applied to the already-running test session
    functions.GraftFunctions.ensureRegistered(s)
    s
  }

  test("matches the higher-order aggregate/zip_with form on embeddings") {
    import spark.implicits._
    val e = Tables.embeddings(spark, SparkTestSession.sf0001)
      .select(col("vec_id"), col("embedding").as("a"))
    val probe = e.where(col("vec_id") === 0).select(col("a").as("b"))
    val both = e.crossJoin(broadcast(probe))
      .select(
        expr("array_dot_f(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(math.abs(n - h) < 1e-9, s"$n vs $h") }
  }

  test("golden value; ragged and null inputs yield NULL like the lambda form") {
    import spark.implicits._
    val got = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(expr("array_dot_f(a, b)")).as[Double].head()
    assert(got == 32.0)
    // ragged lengths: NULL, not a min-length partial sum — a truncated
    // embedding must not receive a plausible-looking similarity (the
    // array_dot_l rule, and what zip_with's implicit null padding +
    // aggregate yields)
    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f, 99.0f)))
      .toDF("a", "b")
      .select(expr("array_dot_f(a, b)")).collect()
    assert(ragged.head.isNullAt(0), s"ragged arrays must dot to NULL: ${ragged.head}")
    val nulls = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(expr("array_dot_f(a, b)")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("array_dot_l matches the interpreted aggregate form exactly (integer path)") {
    import spark.implicits._
    val q = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val both = Tables.embeddings(spark, SparkTestSession.sf0001)
      .select(expr(q).as("qa"))
      .select(
        expr("array_dot_l(qa, qa)").as("native"),
        expr("aggregate(zip_with(qa, qa, (x, y) -> x * y), CAST(0 AS BIGINT), " +
          "(acc, v) -> acc + v)").as("hof"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h, s"$n vs $h") } // exact, not approx
  }

  test("array_dot_l golden value; ragged and null inputs yield NULL like the lambda form") {
    import spark.implicits._
    val got = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L)))
      .toDF("a", "b")
      .select(expr("array_dot_l(a, b)")).as[Long].head()
    assert(got == 32L)
    // ragged: zip_with pads with null → null sum, so the native form must
    // return NULL too, not a truncated dot
    val ragged = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L, 99L)))
      .toDF("a", "b")
      .select(expr("array_dot_l(a, b)")).collect()
    assert(ragged.head.isNullAt(0))
    val nulls = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .select(expr("array_dot_l(a, b)")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("shingle3 equals the composable transform/slice/concat_ws form") {
    import spark.implicits._
    val both = Tables.documents(spark, SparkTestSession.sf0001)
      .select(split(col("text"), " ").as("tk"))
      .select(
        expr("shingle3(tk)").as("native"),
        expr("CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk) - 2), " +
          "i -> concat_ws(' ', slice(tk, i, 3))) ELSE array() END").as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h) }
    // short arrays → empty; null input → null
    val edge = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(expr("shingle3(a)").as("short"), expr("shingle3(b)").as("nul")).head()
    assert(edge.getSeq[String](0).isEmpty && edge.isNullAt(1))
  }

  test("expression runs under whole-stage codegen (doGenCode compiles)") {
    // evaluated through a codegen'd projection over a real scan — if the
    // generated source were invalid, janino would throw at execution
    val df = Tables.embeddings(spark, SparkTestSession.sf0001)
      .select(expr("array_dot_f(embedding, embedding)").as("n2"))
    // "*(n)" is the WholeStageCodegen marker in the simple plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "projection not codegen'd")
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => v > 0.0 && !v.isNaN))
  }
}
