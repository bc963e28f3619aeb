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

  test("permissive mode skips a corrupt frame BODY but keeps later frames in the file") {
    val dir = writeFixture()
    // splice a well-FRAMED but undecodable body between two good frames:
    // framing alignment is intact, so only that one frame may be lost
    val target = java.nio.file.Paths.get(dir, "frames-1.pb")
    val good = java.nio.file.Files.readAllBytes(target)
    val badBody = Array[Byte](0x0f, 1, 2) // field 1, wire type 7 = invalid
    val framed = Array[Byte](badBody.length.toByte) ++ badBody
    java.nio.file.Files.write(target, framed ++ good) // bad frame FIRST
    val permissive = spark.read.format(fmt).option("mode", "permissive").load(dir)
    // all 12 good frames survive — the corrupt body cost only itself
    assert(permissive.count() == 12)
    assert(permissive.where(col("fileName") === "file-1.bin").count() == 4)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(dir).count()
    }
    assert(e.getMessage.contains("corrupt") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt")))
  }

  test("over-long length varint is rejected, not truncated to a small alias") {
    val dir = writeFixture()
    // 80 80 80 80 80 80 80 80 80 80 (10 continuation bytes, shift > 63):
    // an Int accumulator would alias bytes like 80 80 80 80 10 to len=0
    // and silently misalign; the Long accumulator + shift bound rejects
    val target = java.nio.file.Paths.get(dir, "frames-0.pb")
    val good = java.nio.file.Files.readAllBytes(target)
    java.nio.file.Files.write(target, good ++ Array.fill(10)(0x80.toByte))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(
        java.nio.file.Paths.get(dir, "frames-0.pb").toString).count()
    }
    assert(e.getMessage.contains("corrupt") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt")))
    // and the 5-byte alias shape specifically: 80 80 80 80 10 must NOT
    // parse as len=0 (it is a framing error: value 2^32+… > remaining)
    java.nio.file.Files.write(target,
      good ++ Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10))
    val permissive = spark.read.format(fmt).option("mode", "permissive")
      .load(java.nio.file.Paths.get(dir, "frames-0.pb").toString)
    assert(permissive.count() == 4) // the 4 good frames; tail dropped, nothing aliased
    // 64-bit WRAP shapes: nine 0x80 then 0x01 accumulates 1L<<63 (reads
    // negative — must not alias to 'clean EOF'), nine 0x80 then 0x02
    // wraps to 0 (must not yield a phantom empty frame). Both are
    // framing errors in failfast mode.
    for (last <- Seq(0x01.toByte, 0x02.toByte)) {
      java.nio.file.Files.write(target,
        good ++ (Array.fill(9)(0x80.toByte) :+ last))
      val e2 = intercept[org.apache.spark.SparkException] {
        spark.read.format(fmt).load(
          java.nio.file.Paths.get(dir, "frames-0.pb").toString).count()
      }
      assert(e2.getMessage.contains("corrupt") ||
        Option(e2.getCause).exists(_.getMessage.contains("corrupt")), s"last=$last")
    }
  }

  test("restart replays a logged-but-uncommitted micro-batch (files rediscovered)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-protorestart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-protorestart-ck").toString
    def writeFrames(name: String, tag: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        ProtoChunkSource.frameBytes((0 until 4).map(i =>
          ProtoIngest.StoreChunk(s"$tag.bin", i, f"c$i%010d", Array[Byte](1)))))
    writeFrames("a.pb", "r-a"); writeFrames("b.pb", "r-b")
    // foreachBatch sink: supports checkpoint recovery (memory sink does
    // not) and lets the test observe exactly what a replayed batch reads
    def run(sink: java.util.concurrent.ConcurrentLinkedQueue[(String, Int)])
        : org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format(fmt).load(dir).select("fileName", "sequenceNo")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => sink.add((r.getString(0), r.getInt(1)))); ()
        }
        .option("checkpointLocation", ckpt).start()
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val q1 = run(got1)
    try { q1.processAllAvailable() } finally q1.stop()
    // the checkpoint lock releases when the query leaves the active set
    val deadline = System.currentTimeMillis + 30000
    while (spark.streams.active.exists(_.id == q1.id) &&
      System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(got1.size == 8)
    // simulate a crash between offset log and commit: drop the commit
    // record so the restarted query must REPLAY batch 0 — its
    // planInputPartitions runs against a fresh (empty) in-memory log,
    // which must rebuild from the persisted frame log instead of
    // committing empty
    assert(new java.io.File(s"$ckpt/commits/0").delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete() // stale checksum sidecar blocks the re-commit rename
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val q2 = run(got2)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(got2.size == 8,
      s"replayed batch lost files (got ${got2.size} rows — empty discovery log on restart)")
  }

  test("restart keeps index->file assignment when a late file sorts before a committed one") {
    // a.pb arrives AFTER b.pb was discovered and committed, but sorts
    // lexicographically BEFORE it. A restart that rebuilt discovery by
    // listing-sort would assign a.pb the already-committed index 0 and
    // re-emit b.pb as batch 1 (a.pb silently skipped forever); the
    // persisted frame log pins b.pb=0, so the restarted query's next
    // batch must deliver exactly a.pb's rows.
    val dir = java.nio.file.Files.createTempDirectory("graft-protolate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-protolate-ck").toString
    def writeFrames(name: String, tag: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        ProtoChunkSource.frameBytes((0 until 2).map(i =>
          ProtoIngest.StoreChunk(s"$tag.bin", i, f"c$i%010d", Array[Byte](1)))))
    def run(sink: java.util.concurrent.ConcurrentLinkedQueue[String])
        : org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format(fmt).load(dir).select("fileName")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => sink.add(r.getString(0))); ()
        }
        .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._
    writeFrames("b.pb", "late-b")
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q1 = run(got1)
    try { q1.processAllAvailable() } finally q1.stop()
    val deadline = System.currentTimeMillis + 30000
    while (spark.streams.active.exists(_.id == q1.id) &&
      System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(got1.asScala.toSeq == Seq("late-b.bin", "late-b.bin"))
    writeFrames("a.pb", "late-a") // sorts before b.pb
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = run(got2)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(got2.asScala.toSeq == Seq("late-a.bin", "late-a.bin"),
      s"restart mis-assigned file indices (got ${got2.asScala.toSeq})")
    // the persisted log under the checkpoint is what made this exact
    val logFiles = new java.io.File(s"$ckpt/sources/0/graft-frame-log")
      .listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(logFiles.toSeq == Seq(f"${0}%020d", f"${1}%020d"), logFiles.mkString(","))
  }

  test("frame log compacts after enough slices and restart replays from the compact") {
    // 11 single-file discoveries in one running query: the 10th slice
    // triggers compaction (CompactEvery = 10), folding the log into one
    // .compact file; the 11th lands as a fresh plain slice. A restart
    // must rebuild the same assignment from compact + slice and deliver
    // exactly the post-restart file's rows.
    val dir = java.nio.file.Files.createTempDirectory("graft-protocompact").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-protocompact-ck").toString
    def writeFrames(i: Int): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"f$i%03d.pb"),
        ProtoChunkSource.frameBytes(Seq(
          ProtoIngest.StoreChunk(f"cp$i%03d.bin", 0, f"c$i%010d", Array[Byte](1)))))
    def run(sink: java.util.concurrent.ConcurrentLinkedQueue[String])
        : org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format(fmt).load(dir).select("fileName")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => sink.add(r.getString(0))); ()
        }
        .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q1 = run(got1)
    try {
      (0 until 11).foreach { i => writeFrames(i); q1.processAllAvailable() }
    } finally q1.stop()
    assert(got1.asScala.toSet == (0 until 11).map(i => f"cp$i%03d.bin").toSet)
    val logFiles = new java.io.File(s"$ckpt/sources/0/graft-frame-log")
      .listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    assert(logFiles == Seq(f"${10}%020d", f"${10}%020d.compact"),
      s"log did not compact: ${logFiles.mkString(",")}")
    writeFrames(11)
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = run(got2)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(got2.asScala.toSeq == Seq("cp011.bin"),
      s"restart after compaction replayed wrong files (${got2.asScala.toSeq})")
  }

  test("streamed reader handles a many-frame single file in constant frame-bounded memory") {
    // the reader buffers ONE frame at a time off the FSDataInputStream —
    // a file of many frames exercises the loop; memory is bounded by the
    // largest frame, not the file (the old whole-file buffer is gone)
    val dir = java.nio.file.Files.createTempDirectory("graft-protobig").toString
    val chunks = (0 until 5000).map { i =>
      ProtoIngest.StoreChunk(s"big-${i % 7}.bin", i, f"c$i%010d", Array.fill(64)(i.toByte))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "big.pb"), ProtoChunkSource.frameBytes(chunks))
    val df = spark.read.format(fmt).load(dir)
    assert(df.count() == 5000)
    assert(df.agg(sum("sequenceNo")).head.getLong(0) == 5000L * 4999 / 2)
  }

  test("write path: df.write through the source round-trips byte-exact") {
    val src = writeFixture()
    val out = java.nio.file.Files.createTempDirectory("graft-protowrite").toString
    val df = spark.read.format(fmt).load(src)
    df.write.format(fmt).mode("append").save(out)
    // no temp litter: every in-progress temp was renamed away (dot-files
    // that remain are the local FS's .crc checksum sidecars, which the
    // reader's dot-file filter skips like any hidden metadata)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(f => !f.startsWith(".") && !f.startsWith("_")))
    assert(!files.exists(_.endsWith(".inprogress")))
    val back = spark.read.format(fmt).load(out)
    assert(back.count() == 12)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getAs[Array[Byte]](3).toSeq)
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
    // the written frames ARE reference frames: raw ProtoIngest decode agrees
    val raw = new java.io.File(out).listFiles().filter(f =>
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .flatMap { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        var pos = 0
        val outB = Seq.newBuilder[ProtoIngest.StoreChunk]
        while (pos < bytes.length) {
          var len = 0L; var shift = 0; var more = true
          while (more) {
            val x = bytes(pos); pos += 1
            len |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
          }
          outB += ProtoIngest.decodeStoreChunk(
            java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt))
          pos += len.toInt
        }
        outB.result()
      }
    assert(raw.length == 12 &&
      raw.map(c => (c.fileName, c.sequenceNo, c.checksum, c.data.toSeq)).toSet ==
        df.collect().map(key).toSet)
    // overwrite truncates: writing a 4-row subset replaces the 12
    df.where(col("fileName") === "file-0.bin")
      .write.format(fmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out).count() == 4)
    // pruned read over written files still green
    val pruned = spark.read.format(fmt).load(out).select("fileName", "sequenceNo")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("fileName") && !scanLine.contains("data#"))
  }

  test("frame-index sidecar: one multi-frame file reads through >1 partition") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-proto-split").toString
    val df = (0 until 200).map(i => (s"f-$i.bin", i, s"c$i", Array.fill(16)(i.toByte)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
    df.repartition(1).write.format(fmt).mode("overwrite").save(out)
    val dataFiles = new java.io.File(out).listFiles().filter(f =>
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(dataFiles.length == 1, "expected a single frame file")
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".idx")),
      "writer did not emit the offset sidecar")
    val whole = spark.read.format(fmt).load(out)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getAs[Array[Byte]](3).toSeq)
    // tiny splitSize → the sidecar chops the one file into many ranges
    val split = spark.read.format(fmt).option("splitSize", "512").load(out)
    assert(split.rdd.getNumPartitions > 1,
      s"sidecar present but scan stayed at ${split.rdd.getNumPartitions} partition(s)")
    assert(split.collect().map(key).toSet == whole.collect().map(key).toSet)
    assert(split.count() == 200)
    // column pruning still reaches the split readers
    assert(split.select("fileName").distinct().count() == 200)
    // a CORRUPT sidecar degrades to whole-file partitions, never wrong rows
    val idx = new java.io.File(out).listFiles().find(_.getName.endsWith(".idx")).get
    java.nio.file.Files.write(idx.toPath, "GFIDX1\n999999999\n".getBytes)
    val degraded = spark.read.format(fmt).option("splitSize", "512").load(out)
    assert(degraded.rdd.getNumPartitions == 1)
    assert(degraded.count() == 200)
  }

  test("a FAILING overwrite job leaves the original frames readable") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-protow-txn").toString
    val original = Seq(("keep-0.bin", 0, "c0", Array[Byte](1)),
      ("keep-1.bin", 1, "c1", Array[Byte](2)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
    original.write.format(fmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out).count() == 2)
    // an overwrite whose task throws mid-write: old files must survive
    // (deletion is deferred to job commit; eager truncation emptied the
    // directory before any task committed and abort() could not restore)
    val boom = org.apache.spark.sql.functions.udf { (i: Int) =>
      if (i >= 0) throw new RuntimeException("boom"); i
    }
    val failing = original.withColumn("sequenceNo", boom(col("sequenceNo")))
    intercept[Exception] {
      failing.write.format(fmt).mode("overwrite").save(out)
    }
    val after = spark.read.format(fmt).load(out)
    assert(after.count() == 2, "failed overwrite destroyed pre-existing frames")
    assert(after.select("fileName").as[String].collect().toSet ==
      Set("keep-0.bin", "keep-1.bin"))
    // and a SUCCESSFUL overwrite still truncates: the old files go at commit
    original.where(col("fileName") === "keep-0.bin")
      .write.format(fmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out)
      .select("fileName").as[String].collect().toSeq == Seq("keep-0.bin"))
  }

  test("micro-batch stream ingests frames appended across two batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-protostream").toString
    def writeFrames(name: String, fileTag: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        ProtoChunkSource.frameBytes((0 until 4).map(i =>
          ProtoIngest.StoreChunk(s"$fileTag.bin", i, f"c$i%010d", Array[Byte](1, 2)))))
    writeFrames("batch-a.pb", "stream-a")
    val q = spark.readStream.format(fmt).load(dir)
      .select("fileName", "sequenceNo")
      .writeStream.format("memory").queryName("proto_mb_sink").start()
    try {
      q.processAllAvailable()
      assert(spark.table("proto_mb_sink").count() == 4)
      // second micro-batch: only the NEW file is read
      writeFrames("batch-b.pb", "stream-b")
      q.processAllAvailable()
      val rows = spark.table("proto_mb_sink")
        .collect().map(r => (r.getString(0), r.getInt(1)))
      assert(rows.length == 8)
      assert(rows.count(_._1 == "stream-a.bin") == 4)
      assert(rows.count(_._1 == "stream-b.bin") == 4)
    } finally q.stop()
  }

  test("proto stream feeds a grouped aggregation end-to-end (source tier -> operator tier)") {
    // the full streaming pipeline shape: micro-batch proto frames ->
    // per-file chunk counts in Complete mode — the storage-node ingest
    // monitor as one readStream expression over the reference's wire
    // format
    val dir = java.nio.file.Files.createTempDirectory("graft-protoagg").toString
    def writeFrames(name: String, tag: String, n: Int): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        ProtoChunkSource.frameBytes((0 until n).map(i =>
          ProtoIngest.StoreChunk(s"$tag.bin", i, f"c$i%010d", Array[Byte](9)))))
    writeFrames("a.pb", "agg-a", 3)
    val q = spark.readStream.format(fmt).load(dir)
      .groupBy("fileName").count()
      .writeStream.format("memory").queryName("proto_agg_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def counts() = spark.table("proto_agg_sink")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts() == Map("agg-a.bin" -> 3L))
      // late-arriving file folds into the running aggregate
      writeFrames("b.pb", "agg-a", 2)
      writeFrames("c.pb", "agg-b", 4)
      q.processAllAvailable()
      assert(counts() == Map("agg-a.bin" -> 5L, "agg-b.bin" -> 4L))
    } finally q.stop()
  }

  test("streaming write: writeStream sinks frames the batch source reads back byte-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-protoswrite").toString
    val (out, ckpt) = (s"$base/frames", s"$base/ckpt")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, String, Array[Byte])]
    val q = ms.toDS().toDF("fileName", "sequenceNo", "checksum", "data")
      .writeStream.format(fmt)
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try {
      ms.addData(("s1.bin", 0, "c0", Array[Byte](1, 2)), ("s1.bin", 1, "c1", Array[Byte](3)))
      q.processAllAvailable()
      ms.addData(("s2.bin", 0, "c0", Array[Byte](4, 5, 6)))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format(fmt).load(out)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(back == Set(
      ("s1.bin", 0, "c0", Seq[Byte](1, 2)),
      ("s1.bin", 1, "c1", Seq[Byte](3)),
      ("s2.bin", 0, "c0", Seq[Byte](4, 5, 6))))
    // epoch-keyed file names, no temp litter
    val files = new java.io.File(out).listFiles().map(_.getName)
    // epoch-major zero-padded names keep lexicographic order == epoch
    // order across ALL partitions (the micro-batch reader's restart
    // rebuild depends on it)
    assert(files.exists(_.startsWith("e000000000-part-")) &&
      files.exists(_.startsWith("e000000001-part-")))
    assert(!files.exists(_.endsWith(".inprogress")))
  }

  test("message=heartbeat reads nested node-report frames; heartbeat write is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-protohb").toString
    val hbs = Seq(
      ProtoIngest.Heartbeat("nodeA", 9090, Seq(
        ProtoIngest.FileChunks("f1.bin", Seq(0, 1, 2)),
        ProtoIngest.FileChunks("f2.bin", Seq(7)))),
      ProtoIngest.Heartbeat("nodeB", 9091, Seq.empty))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "hb.pb"), ProtoChunkSource.heartbeatFrameBytes(hbs))
    val df = spark.read.format(fmt).option("message", "heartbeat").load(dir)
    assert(df.schema == ProtoChunkSource.heartbeatSchema)
    val rows = df.selectExpr("host", "port", "fileChunks").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rows == Set(("nodeA", 9090), ("nodeB", 9091)))
    // the nested repeated shape flattens like any array<struct> column
    val flat = df.selectExpr("host", "explode(fileChunks) AS fc")
      .selectExpr("host", "fc.filename", "fc.sequenceNos")
      .collect().map(r => (r.getString(0), r.getString(1), r.getSeq[Int](2))).toSet
    assert(flat == Set(
      ("nodeA", "f1.bin", Seq(0, 1, 2)),
      ("nodeA", "f2.bin", Seq(7))))
    // heartbeat frames are transport, not storage: the write path refuses
    val e = intercept[Exception] {
      df.write.format(fmt).option("message", "heartbeat").mode("append")
        .save(java.nio.file.Files.createTempDirectory("graft-hbw").toString)
    }
    assert(e.getMessage.contains("storechunk"))
  }

  test("message=catalog reads the doubly-nested DownloadFileResponse shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-protocat").toString
    val cats = Seq(
      ProtoIngest.FileCatalog("f1.bin", Seq(
        ProtoIngest.ChunkLocation(0, Seq(ProtoIngest.StorageNode("n1", 9090),
          ProtoIngest.StorageNode("n2", 9091))),
        ProtoIngest.ChunkLocation(1, Seq(ProtoIngest.StorageNode("n1", 9090))))),
      ProtoIngest.FileCatalog("f2.bin", Seq.empty))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "cat.pb"), ProtoChunkSource.catalogFrameBytes(cats))
    val df = spark.read.format(fmt).option("message", "catalog").load(dir)
    assert(df.schema == ProtoChunkSource.catalogSchema)
    // flatten to the q_nested_catalog replica-count shape: per (file,
    // seq) replica counts out of the wire-form catalog
    val flat = df.selectExpr("filename", "explode(chunkLocations) AS cl")
      .selectExpr("filename", "cl.sequenceNo AS seq", "size(cl.storageNodes) AS n_replicas")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(flat == Set(("f1.bin", 0, 2), ("f1.bin", 1, 1)))
    assert(df.count() == 2) // the empty catalog row survives intact
  }

  test("stats sidecar: pushed filters skip whole files at planning, rows stay exact") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-proto-skip").toString
    // 8 logical files × 8 frames, partitioned BY fileName so each frame
    // file holds a narrow name set — the layout stats-skipping rewards
    val df = (0 until 64)
      .map(i => (f"doc-${i % 8}.bin", i / 8, s"c$i", Array.fill(8)((i % 8).toByte)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
    df.repartition(8, col("fileName")).write.format(fmt).mode("overwrite").save(out)
    val nFiles = new java.io.File(out).listFiles()
      .count(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".stats")),
      "writer did not emit the stats sidecar")
    val all = spark.read.format(fmt).load(out)
    assert(all.rdd.getNumPartitions == nFiles) // no filter → no skip
    // point lookup on fileName: the Bloom + name range prune non-holding
    // files at PLANNING time — strictly fewer partitions than files
    val point = all.where(col("fileName") === "doc-3.bin")
    assert(point.rdd.getNumPartitions < nFiles,
      s"no files skipped (${point.rdd.getNumPartitions} of $nFiles planned)")
    assert(point.count() == 8)
    // the scan advertises what it pushed
    assert(point.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "pushed filters absent from the executed plan")
    // seq range with no qualifying frames anywhere → zero partitions
    val none = all.where(col("sequenceNo") > 7)
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)
    // SOUNDNESS sweep: every name's filtered read matches the full scan
    val expect = all.collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    (0 until 8).foreach { k =>
      val name = f"doc-$k.bin"
      assert(all.where(col("fileName") === name).count() == expect(name).toLong)
    }
    // IN-list and prefix shapes stay correct (prefix matches everything)
    assert(all.where(col("fileName").isin("doc-1.bin", "doc-6.bin")).count() == 16)
    assert(all.where(col("fileName").startsWith("doc-")).count() == 64)
    assert(all.where(col("fileName").startsWith("zzz")).rdd.getNumPartitions == 0)
  }

  test("stats sidecar: STALE stats (file appended after commit) never skip the file") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-proto-stale").toString
    Seq(("base.bin", 0, "c0", Array[Byte](1)))
      .toDF("fileName", "sequenceNo", "checksum", "data")
      .repartition(1).write.format(fmt).mode("overwrite").save(out)
    // append a frame the sidecar knows nothing about, raw (no commit path)
    val dataFile = new java.io.File(out).listFiles()
      .find(f => !f.getName.startsWith(".") && !f.getName.startsWith("_")).get
    java.nio.file.Files.write(dataFile.toPath,
      ProtoChunkSource.frameBytes(Seq(
        ProtoIngest.StoreChunk("extra.bin", 99, "cx", Array[Byte](2)))),
      java.nio.file.StandardOpenOption.APPEND)
    // the raw append bypassed Hadoop's LocalFileSystem CRC sidecar; drop
    // it so the read exercises the STATS staleness path, not a checksum
    // failure (real object stores have no such sidecar)
    new java.io.File(dataFile.getParentFile, "." + dataFile.getName + ".crc").delete()
    // the stats record the PRE-append length → stale → skip nothing
    val hit = spark.read.format(fmt).load(out)
      .where(col("fileName") === "extra.bin")
    assert(hit.count() == 1, "stale stats pruned a file holding a matching frame")
    assert(hit.rdd.getNumPartitions == 1)
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
