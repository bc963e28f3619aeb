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

  test("q_dq_audit: planted violations of every constraint are counted exactly") {
    val dir = s"/tmp/graft-test-dq-${java.util.UUID.randomUUID()}"
    // lineitem: 1 qty-low, 1 qty-high, 1 discount-high, 1 orphan orderkey
    Seq(
      (10L, 1L, 1L, 1L, 5.0, 100.0, 0.05, 0.0, "N", "O", "1995-01-01"),
      (10L, 1L, 1L, 2L, 0.0, 100.0, 0.05, 0.0, "N", "O", "1995-01-01"),  // qty < 1
      (11L, 1L, 1L, 1L, 99.0, 100.0, 0.05, 0.0, "N", "O", "1995-01-01"), // qty > 50
      (11L, 1L, 1L, 2L, 5.0, 100.0, 1.50, 0.0, "N", "O", "1995-01-01"),  // disc > 1
      (99L, 1L, 1L, 1L, 5.0, 100.0, 0.05, 0.0, "N", "O", "1995-01-01"))  // orphan
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // orders: orderkey 12 duplicated, custkey 7 has no customer row
    Seq(
      (10L, 1L, "O", 100.0, "1995-01-01", "1-URGENT"),
      (11L, 1L, "O", 100.0, "1995-01-01", "1-URGENT"),
      (12L, 1L, "O", 100.0, "1995-01-01", "1-URGENT"),
      (12L, 1L, "O", 100.0, "1995-01-01", "1-URGENT"),
      (13L, 7L, "O", 100.0, "1995-01-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // customer: one NULL name
    Seq((1L, Some("Alice"), 1L, 0.0, "BUILDING"), (2L, None, 1L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val got = ops.Relational.dqAudit(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "lineitem_quantity_range"  -> ((5L, 2L)),
      "lineitem_discount_range"  -> ((5L, 1L)),
      "orders_unique_orderkey"   -> ((5L, 1L)),
      "customer_name_notnull"    -> ((2L, 1L)),
      "lineitem_orphan_orderkey" -> ((5L, 1L)),
      "orders_orphan_custkey"    -> ((5L, 1L))))
  }

  test("q_unpivot: long form round-trips to the wide matrix (inverse of pivot)") {
    val d = SparkTestSession.sf0001
    val long = ops.Relational.unpivotFlagMatrix(spark, d)
      .as[(String, String, Long)].collect()
    val wide = ops.Relational.unpivotFlagMatrix(spark, d).groupBy("l_returnflag")
      .pivot("measure").sum("value")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every flag carries exactly the 3 measures, and pivot restores them
    long.groupBy(_._1).foreach { case (flag, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq("n_parts", "n_rows", "n_supps"))
      val m = rows.map(r => r._2 -> r._3).toMap
      assert(wide(flag) == ((m("n_parts"), m("n_rows"), m("n_supps"))))
      assert(m("n_parts") <= m("n_rows") && m("n_supps") <= m("n_rows"))
    }
    assert(long.nonEmpty)
  }
}
