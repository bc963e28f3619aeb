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

  private def writeDocs(dir: String, n: Int, parts: Int): Unit = {
    import spark.implicits._
    (0 until n).map(i => (f"doc-$i%03d.bin", i, s"c$i", Array.fill(32)((i % 127).toByte)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
      .repartition(parts).write.format(fmt).mode("overwrite").save(dir)
  }

  private def decodedRows(dir: String): Seq[String] = {
    import spark.implicits._
    spark.read.format(fmt).load(dir)
      .select($"fileName", $"sequenceNo", $"checksum", hex($"data"))
      .as[(String, Int, String, String)].collect().map(_.toString).sorted.toSeq
  }

  private def binIdOf(names: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(names.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("crash recovery: intent without output rolls back; published output finishes the deletes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString
    writeDocs(dir, 64, 2)
    val before = frameFiles(dir)
    assert(before.length == 2)
    val rows = decodedRows(dir)

    // --- kill point A: intent written, nothing staged or published.
    // Recovery must roll back (originals intact) and the same run then
    // compacts the bin normally.
    val binId = binIdOf(before)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s".compact-$binId.intent"),
      before.mkString("\n").getBytes("UTF-8"))
    val sizes = before.map(n => new java.io.File(dir, n).length())
    val r = FrameCompaction.compact(spark, dir,
      smallBytes = sizes.max + 1, targetBytes = sizes.sum + 1)
    assert(r.recovered == 1 && r.binsWritten == 1 && r.rewritten == 2)
    assert(decodedRows(dir) == rows, "rows changed across rollback+compact")
    assert(!new java.io.File(dir, s".compact-$binId.intent").exists())
  }

  test("crash recovery: output published but originals not yet deleted -> no duplicate frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash2").toString
    writeDocs(dir, 64, 2)
    val before = frameFiles(dir)
    val rows = decodedRows(dir)
    // simulate the kill point between publish and the original deletes:
    // frames are self-delimiting, so byte-concatenating the originals IS
    // the bin output the writer would have produced content-wise
    val binId = binIdOf(before)
    val concat = before.flatMap(n =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, n)).toSeq).toArray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"compact-$binId.frames"), concat)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s".compact-$binId.intent"),
      before.mkString("\n").getBytes("UTF-8"))
    // without recovery this directory DOUBLE-READS every frame
    assert(decodedRows(dir).length == 2 * rows.length)
    val r = FrameCompaction.compact(spark, dir, smallBytes = 1, targetBytes = 1)
    assert(r.recovered == 1 && r.binsWritten == 0)
    assert(frameFiles(dir) == Seq(s"compact-$binId.frames"))
    assert(decodedRows(dir) == rows, "recovery must end with exactly one copy")
    // and recovery is itself idempotent
    val r2 = FrameCompaction.compact(spark, dir, smallBytes = 1, targetBytes = 1)
    assert(r2.recovered == 0 && frameFiles(dir) == Seq(s"compact-$binId.frames"))
  }

  test("crash recovery: staged-but-unpublished output is published, not duplicated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash3").toString
    writeDocs(dir, 64, 2)
    val before = frameFiles(dir)
    val rows = decodedRows(dir)
    val binId = binIdOf(before)
    val staging = new java.io.File(dir, s".compact-$binId.staging")
    staging.mkdirs()
    val concat = before.flatMap(n =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, n)).toSeq).toArray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging.getPath, "part-00000-staged.frames"), concat)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s".compact-$binId.intent"),
      before.mkString("\n").getBytes("UTF-8"))
    val r = FrameCompaction.compact(spark, dir, smallBytes = 1, targetBytes = 1)
    assert(r.recovered == 1)
    assert(frameFiles(dir) == Seq(s"compact-$binId.frames"))
    assert(decodedRows(dir) == rows)
    assert(!staging.exists())
  }

  test("crash recovery: data published but sidecars still staged -> sidecars adopted, not lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash4").toString
    writeDocs(dir, 64, 2)
    val before = frameFiles(dir)
    val rows = decodedRows(dir)
    // simulate the kill point INSIDE publish(): data renamed to its
    // final name, the staged .idx/.stats not yet moved
    val binId = binIdOf(before)
    val concat = before.flatMap(n =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, n)).toSeq).toArray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"compact-$binId.frames"), concat)
    val staging = new java.io.File(dir, s".compact-$binId.staging")
    staging.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(staging.getPath, ".part-00000-staged.frames.stats"),
      "orphaned-stats-body")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s".compact-$binId.intent"),
      before.mkString("\n").getBytes("UTF-8"))
    val r = FrameCompaction.compact(spark, dir, smallBytes = 1, targetBytes = 1)
    assert(r.recovered == 1)
    assert(frameFiles(dir) == Seq(s"compact-$binId.frames"))
    assert(decodedRows(dir) == rows)
    // the orphaned sidecar was moved next to the published file, not
    // destroyed with the staging dir (the old recovery deleted it)
    val adopted = new java.io.File(dir, s".compact-$binId.frames.stats")
    assert(adopted.exists(), "staged sidecar lost during recovery")
    assert(java.nio.file.Files.readString(adopted.toPath) == "orphaned-stats-body")
    assert(!staging.exists())
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
