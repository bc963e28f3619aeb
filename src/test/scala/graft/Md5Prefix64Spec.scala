package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native md5_prefix64 expression must be VALUE-IDENTICAL to the
  * composable 60-bit hash idiom it replaced across the shingle/per-row
  * hash sites (r21 optimization): CAST(conv(substring(md5(s), 1, 15),
  * 16, 10) AS BIGINT). The DuckDB oracles keep their own spelling
  * (CAST(concat('0x', …) AS BIGINT)), so any divergence here is a
  * future hash-gate failure — this spec pins the equivalence on ASCII,
  * multi-byte code points, the empty string, long inputs, and null
  * propagation, plus inside a transform() lambda (the streaming dedup
  * site's shape).
  */
class Md5Prefix64Spec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    functions.GraftFunctions.ensureRegistered(s)
    s
  }

  private val composable = "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"

  test("value-identical to the composable conv(md5) chain") {
    import spark.implicits._
    val rows = Seq(
      "", "a", "plain ascii shingle text",
      "ünïcödé mülti-byte çontent",
      "日本語のテキスト と ASCII の mix 123",
      "x" * 5000,                       // long input, multiple md5 blocks
      "with | separators 42 1995-06-01", // the band-key/oracle shapes
      "wrapped")            // the BPE reserved wrapper chars
    val df = rows.toDF("s")
    val got = df.select(expr("md5_prefix64(s)")).as[Long].collect()
    val want = df.select(expr(composable)).as[Long].collect()
    assert(got.toSeq === want.toSeq)
    // range pin: conv of 15 hex chars is always a non-negative 60-bit value
    assert(got.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("null propagates; works inside a transform lambda") {
    import spark.implicits._
    assert(Seq(Option.empty[String]).toDF("s")
      .select(expr("md5_prefix64(s)")).collect().head.isNullAt(0))
    val arr = Seq(Seq("a", "bb", "ccc")).toDF("xs")
    val got = arr.select(expr("transform(xs, x -> md5_prefix64(x))"))
      .as[Seq[Long]].head
    val want = arr.select(expr(
      "transform(xs, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))"))
      .as[Seq[Long]].head
    assert(got === want)
  }
}
