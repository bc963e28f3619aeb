package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: timed evidence for the skew-mitigation hierarchy (VERDICT
  * r13 #5) on a genuinely skewed corpus (SfGen skew mode — one supplier
  * holds ~30% of lineitem). Times the same lineitem ⋈ supplier →
  * per-nation aggregate three ways:
  *
  *   1. plain join, AQE skew split ON  (the 100 TB first choice)
  *   2. plain join, AQE skew split OFF (what the skew costs unmitigated)
  *   3. Skew.saltedJoin                (the manual fallback)
  *
  * and checks all three produce identical aggregates. Thresholds follow
  * production defaults scaled to the corpus (256 MB-class partitions do
  * not exist at sf1, so the skew threshold is set to ~4 MB with an
  * 1 MB advisory target — same factor semantics).
  *
  * Usage: runMain graft.SkewBench [skewDir] [iters]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1skew")
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def joined = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("sum_qty"))
    def salted = ops.Skew
      .saltedJoin(Tables.lineitem(spark, dir),
        Tables.supplier(spark, dir).withColumnRenamed("s_suppkey", "l_suppkey"),
        "l_suppkey", nSalts = 32)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("sum_qty"))

    def time(label: String, skewJoin: Boolean)(df: => org.apache.spark.sql.DataFrame)
        : Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      var rows: Seq[org.apache.spark.sql.Row] = Nil
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        rows = df.collect().toSeq.sortBy(_.getInt(0))
        (System.nanoTime() - t0) / 1e9
      }
      val d = df
      d.collect()
      val split = d.queryExecution.executedPlan.toString.contains("skewed")
      println(f"[skewbench] $label%-26s ${times.map(t => f"$t%6.2f").mkString(" ")}s" +
        f"  (median ${times.sorted.apply(times.size / 2)}%.2f, skew-split=$split)")
      rows
    }

    val aqeOn = time("plain_join_aqe_skew_on", skewJoin = true)(joined)
    val aqeOff = time("plain_join_aqe_skew_off", skewJoin = false)(joined)
    val saltedRows = time("salted_join", skewJoin = false)(salted)
    require(aqeOn == aqeOff && aqeOn == saltedRows,
      s"result divergence between mitigation strategies")
    println(s"[skewbench] parity OK over ${aqeOn.size} nation rows")
    spark.stop()
  }
}
