package graft

import graft.ops.Pin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin — the lineage-cut helper behind every multi-consumer subtree.
  * Local mode must keep the fast localCheckpoint path; the cluster-safe
  * reliable path (spark.graft.reliablePin=true) must produce identical
  * results through a real on-disk checkpoint, because on a cluster a
  * localCheckpoint's blocks die with a lost executor.
  */
class PinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sf0001
  import spark.implicits._

  test("pin: local default is localCheckpoint (no checkpoint dir needed)") {
    val df = Pin.pin(spark.range(100).select(col("id"), (col("id") * 2).as("v")))
    assert(df.count() == 100)
  }

  test("pin: reliablePin=true checkpoints to disk and results are identical") {
    val mk = () => spark.range(1000)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
    val local = Pin.pin(mk()).orderBy("id").as[(Long, String)].collect().toSeq
    spark.conf.set("spark.graft.reliablePin", "true")
    try {
      val reliable = Pin.pin(mk())
      assert(reliable.orderBy("id").as[(Long, String)].collect().toSeq == local)
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.nonEmpty, "reliable pin must set a checkpoint dir")
      // a pinned PIPELINE stays correct under the reliable flag: the
      // substring dedup pins its window table for four consumers
      val viaReliable = ops.LlmPipeline.dedupSubstring(spark, d)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      spark.conf.unset("spark.graft.reliablePin")
      val viaLocal = ops.LlmPipeline.dedupSubstring(spark, d)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(viaReliable == viaLocal)
    } finally spark.conf.unset("spark.graft.reliablePin")
  }

  test("pin (reliable) leaves a caller-created cache in place") {
    spark.conf.set("spark.graft.reliablePin", "true")
    try {
      val cached = spark.range(500).select(col("id"), (col("id") * 3).as("v")).persist()
      cached.count()
      assert(Pin.pin(cached).count() == 500)
      // the old form persist()ed then finally-unpersist()ed the SAME plan,
      // dropping the caller's cache as a side effect (ADVICE r12)
      assert(cached.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "pin unpersisted the caller's cache")
      cached.unpersist()
    } finally spark.conf.unset("spark.graft.reliablePin")
  }

  test("q_dedup_substring_auto: below the volume cap it is the stride-1 result") {
    val auto = ops.LlmPipeline.dedupSubstringAuto(spark, d)
    val modes = auto.select("mode").distinct().as[String].collect().toSeq
    assert(modes.isEmpty || modes == Seq("stride1"),
      s"sf0.001 (~150k chars) must select stride1, got $modes")
    val pairs = auto.select($"doc_a", $"doc_b", $"n_matches").as[(Long, Long, Long)]
      .collect().toSeq
    val exact = ops.LlmPipeline.dedupSubstring(spark, d)
      .select($"doc_a", $"doc_b", $"n_cov_pos").as[(Long, Long, Long)].collect().toSeq
    assert(pairs == exact)
  }
}
