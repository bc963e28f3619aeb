package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §5.2 item 5): the declared queries must
  * not just return the right rows — they must produce the physical plans
  * that survive a 100 TB scale-up (pushdown reaches the scan, bounded
  * dims broadcast, top-k avoids a global sort, range joins stay out of
  * BroadcastNestedLoopJoin).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sf0001

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("point lookup pushes its predicate to the parquet scan (#2)") {
    val plan = physical(ops.Catalog.pointLookup(spark, d))
    assert(plan.contains("PushedFilters: [") && plan.contains("IsNotNull"),
      s"expected parquet PushedFilters in:\n$plan")
  }

  test("nation x region is a broadcast join, not an exchange (#26)") {
    val plan = physical(ops.Relational.joinBroadcast(spark, d))
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
  }

  test("range join keeps its equi key: no BroadcastNestedLoopJoin (#29)") {
    val plan = physical(ops.Relational.joinRange(spark, d))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to BNLJ:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort (#15)") {
    val plan = physical(ops.Chunks.topkRandomN(spark, d))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$plan")
  }

  test("pricing summary uses two-phase (partial) hash aggregation (#31)") {
    val plan = physical(ops.Relational.aggPricingSummary(spark, d))
    assert(plan.contains("HashAggregate") && plan.contains("partial"),
      s"expected partial HashAggregate in:\n$plan")
  }

  test("scans prune columns: pricing summary reads only needed lineitem cols (#31)") {
    val plan = physical(ops.Relational.aggPricingSummary(spark, d))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("events ts cutoff is pushed to the scan as a raw nanos predicate (#30)") {
    val plan = physical(Tables.eventsBefore(spark, d, "2024-01-15 00:00:00"))
    assert(plan.contains("LessThanOrEqual(ts"),
      s"nanos cutoff not in PushedFilters:\n$plan")
  }

  test("replica-candidate expansion broadcasts the bounded node dim (#20)") {
    val plan = physical(ops.Chunks.setDiffCandidates(spark, d))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"node dim not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unbounded cartesian in candidate expansion:\n$plan")
  }

  test("as-of join aggregates with hash aggregation, no window sort over events (#30)") {
    val plan = physical(ops.Relational.joinAsof(spark, d))
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("RunningWindowFunction"),
      s"as-of fell back to sort-based aggregation:\n$plan")
  }
}
