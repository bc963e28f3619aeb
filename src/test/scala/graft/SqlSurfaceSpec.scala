package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front-end is part of the engine contract: a user must be able
  * to run the declared computations as `spark.sql(...)` text against
  * registered views, not only through the DataFrame API. These specs pin
  * text-SQL ≡ DataFrame-API equality for representative queries (both
  * compile through the same Catalyst pipeline — the assertion is that
  * our query semantics don't depend on API-only constructs).
  *
  * Also proves partition-pruned reads: a date-partitioned parquet sink
  * re-read with a partition predicate must prune at planning time
  * (PartitionFilters), not scan-and-filter — at 100 TB this is the
  * difference between reading one day and reading the lake.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sf0001

  // ------------------------------------------------------------------
  // FULL-REGISTRY parity: every oracle-checked query must be reachable
  // as spark.sql(...) text — the oracle SQL verbatim where the dialects
  // agree, a module-local Spark-dialect override otherwise (SqlSurface).
  // canon() compares column sets and every value's canonical rendering,
  // so SQL text and DataFrame API must agree row-for-row, not just
  // count-for-count. One generated test per query keeps failures
  // attributable.
  // ------------------------------------------------------------------
  private lazy val viewsReady: Unit = {
    SqlSurface.registerViews(spark, d)
    // the documented cold-corpus workflow: registration is
    // metadata-only (zero corpus passes); the ingest-side CALL verbs
    // build the derived artifacts and refresh their views
    // (SqlSurface.refreshDerivedViews) — exercised here end-to-end
    spark.sql(s"CALL graft.ensure_ivf_index('$d')").collect()
    spark.sql(s"CALL graft.ensure_dedup_substrates('$d')").collect()
  }

  SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
    test(s"SQL surface ≡ DataFrame API: $name") {
      viewsReady
      val sql = SqlSurface.sqlFor(name)
        .getOrElse(fail(s"no SQL surface text for $name"))
      val viaSql = SqlSurface.canon(spark.sql(sql))
      val viaApi = SqlSurface.canon(SparkEntry.queries(name)(spark, d))
      assert(viaSql._1 == viaApi._1, "column sets differ")
      assert(viaSql._2 == viaApi._2, "row values differ")
    }
  }

  // ------------------------------------------------------------------
  // Non-oracle queries (seeded-random / sketch / trained-ANN forms):
  // EVERY registered query must still be reachable as spark.sql text.
  // These have no DuckDB mirror by design, so the check is weaker —
  // column set + row count — matching the driver's rows-only gate for
  // the same queries.
  // ------------------------------------------------------------------
  (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted.foreach { name =>
    test(s"SQL surface (rows-only, no oracle by design): $name") {
      viewsReady
      val sql = SqlSurface.sqlFor(name)
        .getOrElse(fail(s"no SQL surface text for $name"))
      val viaSql = spark.sql(sql)
      val viaApi = SparkEntry.queries(name)(spark, d)
      assert(viaSql.columns.sorted.toSeq == viaApi.columns.sorted.toSeq,
        "column sets differ")
      assert(viaSql.count() == viaApi.count(), "row counts differ")
    }
  }

  test("spark.sql text runs the flagship under-replication query identically (#3)") {
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_orderkey, count(DISTINCT l_suppkey) AS replicas
        |FROM lineitem_v GROUP BY l_orderkey
        |HAVING replicas < 3 ORDER BY l_orderkey""".stripMargin)
    val api = ops.Catalog.underReplicated(spark, d)
    assert(sql.collect().toSeq == api.collect().toSeq)
  }

  test("spark.sql window text matches the DataFrame as-of join (#30)") {
    Tables.events(spark, d).createOrReplaceTempView("events_v")
    val sql = spark.sql(
      """SELECT user_id, event_id, unix_micros(ts) AS ts_us, event_type FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events_v WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1
        |ORDER BY user_id""".stripMargin)
    val api = ops.Relational.joinAsof(spark, d)
    assert(sql.collect().toSeq == api.collect().toSeq)
  }

  test("a TRUE correlated subquery in SQL text matches the decorrelated DataFrame form") {
    // the user-facing form of q_subquery_corr is a correlated scalar
    // subquery; Catalyst decorrelates it (RewriteCorrelatedScalarSubquery)
    // into the aggregate + join-back that Relational.subqueryCorr writes
    // directly — both must return identical rows. The predicate here uses
    // the IEEE avg while the DataFrame form cross-multiplies decimals;
    // they agree because decimal sums are exact and no order's price
    // TIES its customer's true average in the fixture data (the oracle
    // gate pins the decimal form; this spec pins the SQL surface).
    Tables.orders(spark, d).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders_v o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
        |        SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders_v i
        |         WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
    val api = ops.Relational.subqueryCorr(spark, d)
    assert(sql.collect().toSeq == api.collect().toSeq)
  }

  test("date-partitioned sink prunes partitions at the scan (PartitionFilters)") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events_by_day"
    Tables.events(spark, d)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out).where(col("day") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("isnotnull(day") || pf.contains("(day"),
      s"partition predicate not in PartitionFilters:\n$plan")
    // the pruned read returns exactly that day's rows
    val expected = Tables.events(spark, d)
      .where(to_date(col("ts")) === "2024-01-03").count()
    assert(pruned.count() == expected && expected > 0)
  }
}
