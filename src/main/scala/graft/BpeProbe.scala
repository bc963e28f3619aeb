package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time depth-K BPE training (ops.LlmPipeline.bpeTrainDeep)
  * at a given dataset dir across merge depths and pin cadences — the
  * instrument behind BENCHNOTES' r15 deep-BPE timing table (VERDICT
  * r14 #2: the chained pinned-plan pattern measured past toy depth).
  *
  * Usage: runMain graft.BpeProbe [sfDir] [K,K,...] [pinEvery,...]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("16,64").split(",").map(_.trim.toInt).toSeq
    val pins = args.lift(2).getOrElse("1,8").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    for (k <- ks; p <- pins) {
      val t0 = System.nanoTime()
      val n = ops.LlmPipeline.bpeTrainDeep(spark, sfDir, k, pinEvery = p).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] sf=$sfDir K=$k%-4d pinEvery=$p%-3d merges=$n%-4d ${dt}%8.2f s (${dt / k * 1000}%6.1f ms/merge)")
    }
    spark.stop()
  }
}
