package graft

import org.scalatest.funsuite.AnyFunSuite

/** `CALL graft.<procedure>(...)` — the SQL front door for maintenance
  * verbs (plans/GraftCallParser + ops/Procedures): the parser extension
  * intercepts only the CALL form and delegates everything else, and
  * each procedure performs the same action as its Scala entry point.
  */
class ProceduresSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sf0001

  private def call(sql: String): (String, String) = {
    val r = spark.sql(sql).collect()
    assert(r.length == 1, s"CALL must return one row, got ${r.toSeq}")
    (r.head.getString(0), r.head.getString(1))
  }

  test("CALL graft.ensure_zone_map publishes the merged artifact") {
    val (proc, dir) = call(s"CALL graft.ensure_zone_map('$d')")
    assert(proc == "ensure_zone_map")
    assert(dir == ops.Storage.ensureZoneMapMerged(spark, d),
      "CALL must resolve the same artifact as the Scala entry point")
    assert(spark.read.parquet(dir).count() > 0)
  }

  test("CALL graft.ensure_dedup_substrates publishes all six families") {
    val (_, res) = call(s"CALL graft.ensure_dedup_substrates('$d')")
    val dirs = res.split(";")
    assert(dirs.length == 6, s"expected 6 substrate dirs: $res")
    dirs.foreach { dir =>
      assert(spark.read.parquet(dir).count() > 0, s"empty substrate at $dir")
    }
  }

  test("CALL graft.ivf_recluster_if_stale reports the quiet no-op verdict") {
    val (_, res) = call(s"CALL graft.ivf_recluster_if_stale('$d')")
    assert(res.startsWith("refit=false"),
      s"quiet fixture must not refit: $res")
    assert(res.contains("index="), res)
  }

  test("CALL parsing: unknown procedure lists the surface; non-CALL SQL delegates") {
    val e = intercept[Exception] {
      spark.sql("CALL graft.no_such_proc('x')").collect()
    }
    assert(e.getMessage.contains("ensure_zone_map") &&
      e.getMessage.contains("compact_frames"),
      s"error must list the procedure surface: ${e.getMessage}")
    // the interceptor is anchored to the whole statement: ordinary SQL
    // (even SQL that CONTAINS the CALL text as a literal) delegates
    val r = spark.sql("SELECT 'CALL graft.ensure_zone_map(1)' AS s")
      .collect().head.getString(0)
    assert(r.startsWith("CALL graft."))
  }

  test("splitArgs: quote-aware commas and escaped quotes") {
    val p = new plans.GraftCallParser(spark.sessionState.sqlParser)
    assert(p.splitArgs("'a,b', 'c''d', 42") == Seq("a,b", "c'd", "42"))
    assert(p.splitArgs("") == Seq.empty)
    assert(p.splitArgs("'/tmp/x y/t.parquet'") == Seq("/tmp/x y/t.parquet"))
  }
}
