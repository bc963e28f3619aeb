package graft

import graft.sources.{FrameCompaction, ProtoChunkSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrameCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fmt = classOf[ProtoChunkSource].getName

  private def frameFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).sorted.toSeq

  test("compaction merges small frame files, preserves decoded rows exactly, and re-run is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // 8 writer tasks → 8 small frame files
    val df = (0 until 256)
      .map(i => (f"doc-$i%03d.bin", i, s"c$i", Array.fill(64)((i % 127).toByte)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
    df.repartition(8).write.format(fmt).mode("overwrite").save(dir)
    val before = frameFiles(dir)
    assert(before.length == 8)
    def decoded(): Seq[(String, Int, String, String)] =
      spark.read.format(fmt).load(dir)
        .select($"fileName", $"sequenceNo", $"checksum", hex($"data"))
        .as[(String, Int, String, String)].collect().sorted.toSeq
    val rowsBefore = decoded()

    // thresholds chosen so all 8 files are candidates and ~2 bins form
    val sizes = before.map(n => new java.io.File(dir, n).length())
    val small = sizes.max + 1
    val target = sizes.sum / 2 + 1
    val r1 = FrameCompaction.compact(spark, dir, smallBytes = small, targetBytes = target)
    assert(r1.candidates == 8 && r1.rewritten == 8 && r1.skippedSingletons == 0)
    assert(r1.binsWritten >= 2, "thresholds should have produced multiple bins")

    // file count == bins written; decoded rows byte-identical
    val after = frameFiles(dir)
    assert(after.length == r1.binsWritten)
    assert(after.intersect(before).isEmpty, "originals must be retired")
    assert(decoded() == rowsBefore)
    // sidecars regenerated for the compacted files (index + stats)
    assert(after.forall(n => new java.io.File(dir, s".$n.idx").exists()
      || new java.io.File(dir, s".$n.stats").exists()))

    // idempotency: the same thresholds find only singleton bins → no-op
    val r2 = FrameCompaction.compact(spark, dir, smallBytes = small, targetBytes = target)
    assert(r2.rewritten == 0 && r2.binsWritten == 0)
    assert(frameFiles(dir) == after, "second run must not touch files")
  }

  test("compaction skips a lone small file and leaves big files alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-1").toString
    Seq(("a.bin", 0, "c", Array[Byte](1, 2, 3)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
      .repartition(1).write.format(fmt).mode("overwrite").save(dir)
    val before = frameFiles(dir)
    val r = FrameCompaction.compact(spark, dir)
    assert(r.candidates == 1 && r.rewritten == 0 && r.skippedSingletons == 1)
    assert(frameFiles(dir) == before)
    // nothing qualifies when the threshold is below every file size
    val r2 = FrameCompaction.compact(spark, dir, smallBytes = 1, targetBytes = 1)
    assert(r2.candidates == 0 && r2.rewritten == 0)
  }
}
