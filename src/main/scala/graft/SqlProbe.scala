package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: for every oracle-checked query, run its SQL-surface text
  * (SqlSurface.sqlFor) through spark.sql over registered views and diff
  * against the DataFrame-API result. Prints one line per query:
  * OK / COLS (column-set mismatch) / DIFF (value mismatch) / ERR
  * (parse/analysis failure). Drives the override authoring loop.
  *
  * Usage: runMain graft.SqlProbe [sfDir] [query...]
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    SqlSurface.registerViews(spark, sfDir)
    // registration is metadata-only; this probe exercises every SQL
    // spelling, so build the derived views' artifacts up front (the
    // ingest job's CALL ensure_* role)
    SqlSurface.registerDerivedViews(spark, sfDir, buildIfAbsent = true)
    val subset = args.drop(1).toSet
    val names = SparkEntry.oracleSql.keySet.toSeq.sorted
      .filter(n => subset.isEmpty || subset(n))
    var ok, bad = 0
    names.foreach { name =>
      try {
        val sql = SqlSurface.sqlFor(name).get
        val a = SqlSurface.canon(spark.sql(sql))
        val b = SqlSurface.canon(SparkEntry.queries(name)(spark, sfDir))
        if (a == b) { ok += 1; println(s"OK    $name") }
        else if (a._1 != b._1) {
          bad += 1
          println(s"COLS  $name sql=${a._1.mkString(",")} api=${b._1.mkString(",")}")
        } else {
          bad += 1
          val firstDiff = a._2.zipAll(b._2, "<missing>", "<missing>")
            .find { case (x, y) => x != y }
          println(s"DIFF  $name rows sql=${a._2.size} api=${b._2.size} " +
            firstDiff.map { case (x, y) =>
              s"sql[${x.take(120)}] api[${y.take(120)}]" }.getOrElse(""))
        }
      } catch { case e: Throwable =>
        bad += 1
        val msg = String.valueOf(e.getMessage).linesIterator
          .find(_.trim.nonEmpty).getOrElse("").take(160)
        println(s"ERR   $name ${e.getClass.getSimpleName}: $msg")
      }
    }
    println(s"== $ok ok, $bad to fix, ${names.size} total ==")
    spark.stop()
  }
}
