package graft

import graft.ops.Storage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the zone-map BUILD designs at volume (the r17
  * partials redesign made removal subtractable; this measures what that
  * costs at sf100 and whether dictionary-encoding the provenance column
  * buys it back). Writes throwaway artifacts under /tmp/graft-zmprobe.
  *
  * Usage: runMain graft.ZmProbe [sfDir]
  */
object ZmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", "320")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(tag: String)(df: DataFrame): Unit = {
      val out = s"/tmp/graft-zmprobe/$tag"
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(out)
      println(f"[zmprobe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
    }
    val stats = Seq(
      count(lit(1)).as("n_chunks"),
      min(col("l_shipdate")).cast("timestamp_ntz").as("min_ship"),
      max(col("l_shipdate")).cast("timestamp_ntz").as("max_ship"),
      min(col("l_partkey")).as("min_part"),
      max(col("l_partkey")).as("max_part"),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,0)")
        .cast("bigint").as("size_units"))
    // A: the r16 design — per-file_id only, long group key, one artifact
    time("merged-only") {
      li().groupBy(col("l_orderkey").as("file_id")).agg(stats.head, stats.tail: _*)
    }
    // B: the r17 partials — (src string, file_id) group key
    time("partials-string") {
      li().groupBy(
          regexp_replace(input_file_name(), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/").as("src"),
          col("l_orderkey").as("file_id"))
        .agg(stats.head, stats.tail: _*)
    }
    // C: partials with dictionary-encoded provenance — int group key,
    // string resolved by a broadcast join AFTER the aggregate (so the
    // exchange and agg buffers never see a string)
    time("partials-dict") {
      val srcs = Storage.manifestPath(
        Storage.manifestLines(spark, s"$sfDir/lineitem.parquet"))
        .map(Storage.normSrcStr).sorted.zipWithIndex
      import spark.implicits._
      val dict = broadcast(srcs.toDF("src", "src_id"))
      li().select(xxhash64(
            regexp_replace(input_file_name(), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"))
          .as("src_h"), col("l_orderkey"), col("l_shipdate"),
          col("l_partkey"), col("l_quantity"))
        .groupBy(col("src_h"), col("l_orderkey").as("file_id"))
        .agg(stats.head, stats.tail: _*)
        .join(broadcast(srcs.map { case (p, i) => (xxhash64Str(p), p) }
          .toDF("src_h", "src")), "src_h")
        .drop("src_h")
    }
    spark.stop()
  }

  /** Driver-side xxhash64 of a UTF-8 string with Spark's seed (42) —
    * must match the engine's xxhash64() for the dict join key.
    */
  private def xxhash64Str(s: String): Long = {
    val b = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }
}
