package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-isolation probe for the optimization rounds: times
  * individual sub-stages of the expensive registry queries with the
  * noop sink (guide §1.4) so a change targets the stage that actually
  * costs, not the one that looks expensive. Not part of any gate.
  *
  * Usage: sbt "runMain graft.OptProbe <stage> [sfDir] [iters]"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val stage = args.headOption.getOrElse("winhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    val W = 32
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def winsSeq: DataFrame = docs
      .where(col("n_chars") >= W)
      .select(col("doc_id"),
        explode(expr(s"sequence(CAST(1 AS BIGINT), n_chars - ${W - 1})")).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        expr(s"CAST(conv(substring(md5(substring(text, CAST(pos AS INT), $W)), 1, 15), 16, 10) AS BIGINT)").as("h"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def winsNative = docs
      .where(col("n_chars") >= W)
      .select(col("doc_id"),
        posexplode(expr(s"win_hashes60(text, n_chars, $W)")).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("h"))
    val target: () => Unit = stage match {
      case "winhash" => () => noop(winsSeq)                       // explode+md5 window pass
      case "winhash_native" => () => noop(winsNative)             // native one-pass form
      case "winhash_native1" => () => noop(winsNative.coalesce(1)) // single-core, per-window cost
      case "winhash1" => () => noop(winsSeq.coalesce(1))
      case "windistinct" => () => noop(winsSeq.select("doc_id", "h").distinct())
      case "lineitem_scan" => () => noop(spark.read.parquet(s"$sfDir/lineitem.parquet"))
      case other => () => noop(SparkEntry.queries(other)(spark, sfDir))
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    if (stage == "substrates") {
      // time each persisted-substrate ensure individually (cold vs warm
      // depends on the family stores' prior state — clear them first
      // for a cold-build measurement)
      val ensures: Seq[(String, () => String)] = Seq(
        "ngram_postings" -> (() => ops.LlmPipeline.ensureNgramPostings(spark, sfDir)),
        "minhash_banded" -> (() => ops.LlmPipeline.ensureMinhashBanded(spark, sfDir)),
        "simhash_sig" -> (() => ops.LlmPipeline.ensureSimhashSig(spark, sfDir)),
        "winnow_fps" -> (() => ops.LlmPipeline.ensureWinnowFps(spark, sfDir)),
        "embed_bucketed" -> (() => ops.LlmPipeline.ensureEmbedBucketed(spark, sfDir)),
        "phash" -> (() => ops.Multimodal.ensurePhashTable(spark, sfDir)),
        "ivf_index" -> (() => ops.LlmPipeline.ensureIvfIndex(spark, sfDir)))
      ensures.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn()
        println(f"[optprobe] substrate:$name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } else (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      target()
      println(f"[optprobe] $stage iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
