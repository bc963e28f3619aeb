package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases mirroring the reference's own unit tests (SURVEY §5.1):
  * UtilsTest.java:29-40 (known md5) and ChunkTest.java:17-34 (chunk
  * count / last-chunk-size math), plus the chunk-filename regex
  * semantics of storageNode/StorageNode.java:66 (FIXTURES.md §B).
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("md5 golden value (UtilsTest.java:29-40)") {
    val got = Seq("I like ice cream.\n").toDF("s")
      .select(md5(col("s"))).as[String].head()
    assert(got == "bbc3b8f636bbcf0b994f0698d25ca85c")
  }

  test("chunk count + last chunk size math (ChunkTest.java:17-34)") {
    // (totalSize, chunkSize) -> (numberOfChunks, lastChunkSize)
    val cases = Seq(
      (100L, 100L, 1L, 100L),
      (100L, 99L, 2L, 1L),
      (100L, 50L, 2L, 50L),
      (100L, 49L, 3L, 2L),
      (100L, 101L, 1L, 100L))
    val got = cases.map { case (sz, cs, _, _) => (sz, cs) }
      .toDF("size", "cs")
      .select(col("size"), col("cs"),
        floor((col("size") + col("cs") - 1) / col("cs")).as("n_chunks"))
      .withColumn("last_size",
        least(col("cs"), col("size") - (col("n_chunks") - 1) * col("cs")))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == cases)
  }

  test("chunk filename regex is non-greedy (StorageNode.java:66)") {
    val got = Seq("my.file-chunk12", "a-chunk1-chunk2")
      .toDF("f")
      .select(
        regexp_extract(col("f"), "(.*?)-chunk([0-9]+)", 1),
        regexp_extract(col("f"), "(.*?)-chunk([0-9]+)", 2))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("my.file", "12"), ("a", "1")))
  }

  test("mathUnits GiB conversion: round(bal/1024, 2) half-away, exact off-boundary") {
    // ADVICE r13 (high): the integer-space rewrite once computed
    // ((cents*100+512) DIV 1024)/100 = bal/10.24 — 100x the GiB value.
    // Pin the contract: 500.00 -> 0.49, 680.96 -> 0.67 (exact half-cent
    // boundary, half-away-from-zero), negatives mirror, -1.00 -> -0.0
    // canonicalized to 0.0 by the integer path.
    val dir = s"/tmp/graft-test-mathunits-${java.util.UUID.randomUUID()}"
    try {
      Seq((1L, 500.00), (2L, 680.96), (3L, -680.96), (4L, 4090.79), (5L, -1.00))
        .toDF("s_suppkey", "s_acctbal")
        .withColumn("s_name", lit("x")).withColumn("s_nationkey", lit(0))
        .write.parquet(s"$dir/supplier.parquet")
      val got = ops.Catalog.mathUnits(spark, dir)
        .as[(Long, Double)].collect().toMap
      assert(got(1L) == 0.49)
      assert(got(2L) == 0.67)
      assert(got(3L) == -0.67)
      assert(got(4L) == math.round(4090.79 / 1024 * 100).toDouble / 100)
      assert(java.lang.Double.doubleToRawLongBits(got(5L)) == 0L) // not -0.0
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fixed-width listing format (Client.java:156-164)") {
    val got = Seq(("tiny.bin", 7)).toDF("name", "n")
      .select(format_string("%-40s %5d", col("name"), col("n")))
      .as[String].head()
    assert(got == "tiny.bin".padTo(40, ' ') + " " + "    7")
  }
}
