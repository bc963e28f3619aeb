package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the relational tier (the oracle gate covers
  * value-level correctness; these pin the structural contracts).
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q_scd2_intervals: versions tile each customer's timeline, one current each") {
    val rows = ops.Relational.scd2Intervals(spark, SparkTestSession.sf0001)
      .select("o_custkey", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSeq
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      // exactly one open (current) version, and it is the last one
      assert(vs.count(_._4) == 1, s"customer $cust: ${vs.count(_._4)} current versions")
      assert(sorted.last._4 && sorted.last._3.isEmpty,
        s"customer $cust: current version is not the open-ended last one")
      // each closed version's valid_to is the next version's valid_from
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3.contains(b._2),
            s"customer $cust: interval gap between ${a._3} and ${b._2}")
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("q_scd2_asof returns exactly the version covering the probe instant") {
    val d = SparkTestSession.sf0001
    val t = org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.lit(ops.Relational.Scd2AsofUtc).cast("timestamp"))
    val iv = ops.Relational.scd2Intervals(spark, d)
    val expected = iv
      .where(org.apache.spark.sql.functions.col("valid_from_us") <= t &&
        (org.apache.spark.sql.functions.col("valid_to_us").isNull ||
          org.apache.spark.sql.functions.col("valid_to_us") > t))
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val got = ops.Relational.scd2Asof(spark, d)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSeq
    // one version per covered customer, and exactly the covering one
    assert(got.size == got.map(_._1).distinct.size, "a customer matched two versions")
    assert(got.toSet == expected)
    assert(got.nonEmpty)
  }
}
