package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-operator properties with no DuckDB oracle: the true random
  * choose-N (mirrors the reference's UtilsTest.java:15-26) and the
  * empty-file guard on the chunk-split generator.
  */
class ChunksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q_choose_random_n: size + membership + no duplicates (UtilsTest.java:15-26)") {
    import spark.implicits._
    val d = SparkTestSession.sf0001
    val all = Tables.supplier(spark, d).select("s_suppkey").as[Long].collect().toSet
    val got = ops.Chunks.chooseRandomN(spark, d).select("s_suppkey").as[Long].collect()
    assert(got.length == math.min(10, all.size))
    assert(got.toSet.subsetOf(all))
    assert(got.distinct.length == got.length)
    // seeded rand: a second run over the same data returns the same sample
    val again = ops.Chunks.chooseRandomN(spark, d).select("s_suppkey").as[Long].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("chunkSplit emits zero chunks for a zero-byte file") {
    import spark.implicits._
    // without the n_chunks > 0 guard, sequence(0, -1) steps BACKWARD and
    // emits two bogus chunks [0, -1] for the empty file
    val dir = s"/tmp/graft-test-chunksplit-${java.util.UUID.randomUUID()}"
    Seq((1L, 0.00), (2L, 1234.56))
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = ops.Chunks.chunkSplit(spark, dir)
    assert(out.filter(col("o_orderkey") === 1).count() == 0)
    assert(out.filter(col("o_orderkey") === 2).count() == 1)
  }

  test("heartbeat payload is a real MapType(String, Array[Int]) and element_at probes it") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val d = SparkTestSession.sf0001
    val hb = ops.Chunks.heartbeatPayload(spark, d)
    assert(hb.schema("payload").dataType ===
      MapType(StringType, ArrayType(IntegerType, containsNull = false), valueContainsNull = false))
    // probe one concrete (node, file): the map lookup must return exactly
    // the seq list the flat rows hold
    val (node, okey) = Tables.lineitem(spark, d)
      .select($"l_suppkey", $"l_orderkey").as[(Long, Long)].head()
    val expected = Tables.lineitem(spark, d)
      .filter($"l_suppkey" === node && $"l_orderkey" === okey)
      .select($"l_linenumber".cast("int")).as[Int].collect().sorted.toSeq
    val fname = f"f_$okey%012d"
    val got = hb.filter($"node_id" === node)
      .select(element_at($"payload", fname)).as[Seq[Int]].head()
    assert(got === expected)
    // exploding the map restores exactly the (node, file) set
    val viaMap = ops.Chunks.heartbeatMapExplode(spark, d)
      .select($"node_id", $"filename").as[(Long, String)].collect().toSet
    val direct = Tables.lineitem(spark, d)
      .select($"l_suppkey", $"l_orderkey").as[(Long, Long)].collect()
      .map { case (n, k) => (n, f"f_$k%012d") }.toSet
    assert(viaMap === direct)
  }

  test("delta heartbeat payload is bounded: ≤ TopK entries/row, period files only, ⊆ full map") {
    import spark.implicits._
    val d = SparkTestSession.sf0001
    val delta = ops.Chunks.heartbeatDeltaPayload(spark, d).cache()
    // HARD per-row bound — the property that makes the wire form scale
    val sizes = delta.select(size($"payload")).as[Int].collect()
    assert(sizes.nonEmpty && sizes.forall(n => n >= 1 && n <= ops.Chunks.DeltaTopK),
      s"payload sizes out of bound: ${sizes.mkString(",")}")
    // every announced file really was touched in the period
    val announced = delta
      .select($"node_id", explode(map_keys($"payload")).as("filename"))
      .as[(Long, String)].collect().toSet
    val touched = Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit(ops.Chunks.DeltaPeriodLo).cast("timestamp"))
      .select($"l_suppkey", $"l_orderkey").as[(Long, Long)].collect()
      .map { case (n, k) => (n, f"f_$k%012d") }.toSet
    assert(announced.subsetOf(touched))
    val full = ops.Chunks.heartbeatPayload(spark, d)
      .select($"node_id", explode(map_keys($"payload")).as("filename"))
      .as[(Long, String)].collect().toSet
    assert(announced.subsetOf(full)) // delta ⊆ full catalog
    // and the K cap binds to the MOST RECENTLY touched files, asserted
    // directly: per node, no held-back in-period file may be strictly
    // more recent than the least-recent announced file (a regression
    // that kept the K OLDEST would pass the subset checks above).
    val lastTouch = Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit(ops.Chunks.DeltaPeriodLo).cast("timestamp"))
      .groupBy($"l_suppkey".as("node_id"),
        concat(lit("f_"), lpad($"l_orderkey".cast("string"), 12, "0")).as("filename"))
      .agg(max($"l_shipdate").as("last_touch"))
      .as[(Long, String, java.sql.Timestamp)].collect()
      .map { case (n, f, t) => (n, f) -> t.getTime }.toMap
    lastTouch.keys.map(_._1).toSeq.distinct.foreach { node =>
      val (ann, held) = lastTouch.keys.filter(_._1 == node).partition(announced)
      if (ann.nonEmpty && held.nonEmpty) {
        val minAnn = ann.map(lastTouch).min
        val maxHeld = held.map(lastTouch).max
        assert(maxHeld <= minAnn,
          s"node $node announced a file touched at $minAnn while holding back one touched at $maxHeld")
      }
    }
    delta.unpersist()
  }
}
