package graft

import graft.sources.{ProtoChunkSource, ProtoIngest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 proto source: round-trip through the length-delimited
  * stream framing, one partition per file, and column pruning reaching
  * the scan's ReadSchema.
  */
class ProtoChunkSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fmt = classOf[ProtoChunkSource].getName

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-protosrc").toString
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { f =>
      val chunks = (0 until 4).map { i =>
        ProtoIngest.StoreChunk(s"file-$f.bin", i, f"c$f-$i%028d",
          Array.fill(50 + 10 * i)(rnd.nextInt().toByte))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"frames-$f.pb"),
        ProtoChunkSource.frameBytes(chunks))
    }
    dir
  }

  test("reads all frames across files with correct values") {
    val dir = writeFixture()
    val df = spark.read.format(fmt).load(dir)
    assert(df.count() == 12)
    val rows = df.select("fileName", "sequenceNo", "checksum")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows.size == 12 && rows.contains(("file-2.bin", 3, f"c2-${3}%028d")))
    // payload round-trips byte-exact
    val sizes = df.select("fileName", "sequenceNo", "data").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Array[Byte]](2).length).toMap
    assert(sizes(("file-0.bin", 0)) == 50 && sizes(("file-1.bin", 3)) == 80)
  }

  test("planner creates one partition per frame file") {
    val dir = writeFixture()
    val df = spark.read.format(fmt).load(dir)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("column pruning reaches the scan: data column absent from the BatchScan output") {
    val dir = writeFixture()
    val pruned = spark.read.format(fmt).load(dir).select("fileName", "sequenceNo")
    val plan = pruned.queryExecution.executedPlan.toString
    // DSv2 prints the pruned schema as the BatchScan's output column list
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("fileName") && !scanLine.contains("data#"),
      s"payload not pruned from scan:\n$plan")
    assert(pruned.distinct().count() == 12)
  }

  test("permissive mode drops a corrupted file's tail; failfast raises") {
    val dir = writeFixture()
    // append a frame with a length running far past the buffer
    val bad = java.nio.file.Paths.get(dir, "frames-1.pb")
    val good = java.nio.file.Files.readAllBytes(bad)
    java.nio.file.Files.write(bad,
      good ++ Array[Byte](0xff.toByte, 0xff.toByte, 0x7f, 1, 2, 3))
    val permissive = spark.read.format(fmt).option("mode", "permissive").load(dir)
    // 12 intact frames survive; the corrupt tail of frames-1.pb is dropped
    assert(permissive.count() == 12)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(dir).count()
    }
    assert(e.getMessage.contains("corrupt") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt")))
  }

  test("decoded frames feed the validate/reassemble path like any source") {
    val dir = writeFixture()
    val chunks = spark.read.format(fmt).load(dir)
      .withColumnRenamed("fileName", "filename")
      .withColumnRenamed("sequenceNo", "seq")
      .withColumn("size", length(col("data")).cast("long"))
      .withColumn("checksum", lit("")) // fixture checksums are synthetic
    val re = sources.ChunkIngest.reassemble(chunks)
      .select("filename").collect().map(_.getString(0)).toSet
    assert(re == Set("file-0.bin", "file-1.bin", "file-2.bin"))
  }
}
