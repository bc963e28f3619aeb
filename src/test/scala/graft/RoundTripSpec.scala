package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties mirroring ChunkTest.java:38-100 (split then
  * reassemble = identity) in the engine's terms: the chunk-split
  * generator's output always reassembles — contiguous sequence from 0,
  * sizes sum back to the file size, all-but-last chunks full — and the
  * ordered file checksum is invariant under row order (SURVEY §5.2
  * item 2). Properties are hand-rolled over a seeded generator, like
  * the reference's own UtilsTest.java:15-26.
  */
class RoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("split math: count/sizes reassemble for 10k generated (size, chunkSize)") {
    val rnd = new scala.util.Random(1234)
    (1 to 10000).foreach { _ =>
      val size = 1L + rnd.nextInt(10_000_000)
      val cs = 1L + rnd.nextInt(2_000_000)
      val n = (size + cs - 1) / cs
      val last = math.min(cs, size - (n - 1) * cs)
      assert(n >= 1 && last >= 1 && last <= cs)
      assert((n - 1) * cs + last == size)
    }
  }

  test("split generator on Spark: explode(sequence) reassembles (100 sampled cases)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(100)((1L + rnd.nextInt(10_000_000).toLong,
      1L + rnd.nextInt(2_000_000).toLong))
    val out = cases.toDF("size", "cs")
      .withColumn("n_chunks", floor((col("size") + col("cs") - 1) / col("cs")))
      .select(col("size"), col("cs"), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("seq"))
      .withColumn("chunk_size",
        least(col("cs"), col("size") - col("seq") * col("cs")))
      .groupBy("size", "cs", "n_chunks")
      .agg(count(lit(1)).as("n_rows"), sum("chunk_size").as("total"),
        min("seq").as("first"), max("seq").as("last"))
      .where(col("n_rows") =!= col("n_chunks") || col("total") =!= col("size") ||
        col("first") =!= 0 || col("last") =!= col("n_chunks") - 1)
    assert(out.count() == 0)
  }

  test("ordered file checksum is row-order invariant (Chunk.java:100-126 semantics)") {
    val orderedAgg = md5(array_join(transform(
      sort_array(collect_list(struct(col("seq"), col("h")))),
      x => x.getField("h")), "")).as("file_md5")
    val rows = (1 to 200).map(i => (i % 10, i, s"h$i"))
    val base = rows.toDF("file", "seq", "h")
      .groupBy("file").agg(orderedAgg).orderBy("file").as[(Int, String)].collect().toSeq
    val shuffled = new scala.util.Random(7).shuffle(rows).toDF("file", "seq", "h")
      .repartition(7)
      .groupBy("file").agg(orderedAgg).orderBy("file").as[(Int, String)].collect().toSeq
    assert(base == shuffled)
  }
}
