package graft

import graft.sources.ProtoIngest
import graft.sources.ProtoIngest._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trips for the proto3 wire-format source (proto/messages.proto
  * shapes), including the decoder-leniency rules proto3 requires:
  * unknown fields skipped, any field order, unpacked repeated scalars.
  */
class ProtoIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def binDf(msgs: Seq[Array[Byte]]) = {
    import spark.implicits._
    msgs.toDF("msg")
  }

  test("StoreChunk round-trips through encode -> Dataset decode") {
    val rnd = new scala.util.Random(3)
    val chunks = (0 until 5).map { i =>
      StoreChunk(s"file-$i.bin", i, f"sum$i%032d", Array.fill(100 + i)(rnd.nextInt().toByte))
    }
    val got = ProtoIngest.storeChunks(spark, binDf(chunks.map(encodeStoreChunk)))
      .collect().sortBy(_.sequenceNo)
    assert(got.length == 5)
    chunks.zip(got).foreach { case (want, g) =>
      assert(g.fileName == want.fileName && g.sequenceNo == want.sequenceNo &&
        g.checksum == want.checksum && g.data.sameElements(want.data))
    }
  }

  test("nested DownloadFileResponse decodes to the catalog shape (messages.proto:72-80)") {
    val cat = FileCatalog("big.dat", Seq(
      ChunkLocation(0, Seq(StorageNode("n1", 9001), StorageNode("n2", 9002))),
      ChunkLocation(1, Seq(StorageNode("n3", 9003)))))
    val got = ProtoIngest.fileCatalog(spark, binDf(Seq(encodeFileCatalog(cat)))).head()
    assert(got == cat)
  }

  test("Heartbeat with packed repeated sequenceNos (messages.proto:31-42)") {
    val hb = Heartbeat("node-a", 9090, Seq(
      FileChunks("f1", Seq(0, 1, 2, 300)), // 300 exercises multi-byte varint
      FileChunks("f2", Seq(7))))
    val got = ProtoIngest.heartbeats(spark, binDf(Seq(encodeHeartbeat(hb)))).head()
    assert(got == hb)
  }

  test("proto3 leniency: unknown fields skipped, field order free, unpacked repeated") {
    // StoreChunk with an unknown field 9 prepended and fields reversed
    val base = encodeStoreChunk(StoreChunk("x.bin", 3, "abc", Array[Byte](1, 2)))
    def vi(v: Long): Array[Byte] = { // local varint for the hand-built frames
      var x = v; val b = Array.newBuilder[Byte]
      var more = true
      while (more) { val lo = (x & 0x7f).toByte; x >>>= 7; more = x != 0
        b += (if (more) (lo | 0x80).toByte else lo) }
      b.result()
    }
    val unknown = (Array((9 << 3).toByte) ++ vi(12345L)) ++ base
    val got = ProtoIngest.storeChunks(spark, binDf(Seq(unknown))).head()
    assert(got.fileName == "x.bin" && got.sequenceNo == 3)
    // FileChunks with UNPACKED repeated int32 (wire 0 per element)
    val unpacked =
      (Array(((1 << 3) | 2).toByte, 2.toByte) ++ "f9".getBytes) ++
        (Array(((2 << 3) | 0).toByte) ++ vi(5)) ++
        (Array(((2 << 3) | 0).toByte) ++ vi(6))
    val hbFrame = Array(((3 << 3) | 2).toByte) ++ vi(unpacked.length) ++ unpacked
    val hb = ProtoIngest.heartbeats(spark, binDf(Seq(hbFrame))).head()
    assert(hb.fileChunks == Seq(FileChunks("f9", Seq(5, 6))))
  }

  test("unknown fixed64/fixed32 fields are skipped, not fatal (proto3 forward compat)") {
    val base = encodeStoreChunk(StoreChunk("y.bin", 7, "def", Array[Byte](9)))
    // unknown field 10 as fixed64 (wire 1) + field 11 as fixed32 (wire 5)
    val fixed64 = Array(((10 << 3) | 1).toByte) ++ Array.fill[Byte](8)(0x5a)
    val fixed32 = Array(((11 << 3) | 5).toByte) ++ Array.fill[Byte](4)(0x3c)
    val got = ProtoIngest.storeChunks(spark, binDf(Seq(fixed64 ++ fixed32 ++ base))).head()
    assert(got.fileName == "y.bin" && got.sequenceNo == 7 && got.checksum == "def")
  }

  test("field re-encoded with an unexpected wire type is skipped, not an NPE") {
    // field 1 (fileName, length-delimited in the schema) arriving as
    // wire type 0: [0x08, 0x01] — must be skipped per proto3, and must
    // not pass a null payload into the string decoder
    val confusedTag = Array[Byte](0x08, 0x01)
    val got = ProtoIngest.storeChunks(spark,
      binDf(Seq(confusedTag ++ encodeStoreChunk(StoreChunk("w.bin", 2, "s", Array[Byte](7)))))).head()
    assert(got.fileName == "w.bin" && got.sequenceNo == 2)
    // same confusion inside a nested FileCatalog (field 2 as varint)
    val nested = Array[Byte](0x10, 0x05) ++
      ProtoIngest.encodeFileCatalog(FileCatalog("f", Seq(ChunkLocation(1, Seq()))))
    val cat = ProtoIngest.fileCatalog(spark, binDf(Seq(nested))).head()
    assert(cat.filename == "f" && cat.chunkLocations == Seq(ChunkLocation(1, Seq())))
  }

  test("pruned decode skips the payload without copying it") {
    val c = StoreChunk("p.bin", 9, "sum", Array.fill(1000)(0x42.toByte))
    val pruned = ProtoIngest.decodeStoreChunkPruned(encodeStoreChunk(c), withData = false)
    assert(pruned.fileName == "p.bin" && pruned.sequenceNo == 9 &&
      pruned.checksum == "sum" && pruned.data.isEmpty)
    val full = ProtoIngest.decodeStoreChunkPruned(encodeStoreChunk(c), withData = true)
    assert(full.data.sameElements(c.data))
  }

  test("truncated and corrupt frames error loudly instead of decoding garbage") {
    val base = encodeStoreChunk(StoreChunk("z.bin", 1, "s", Array[Byte](1, 2, 3, 4)))
    // truncated length-delimited payload (drop the last 2 bytes)
    val truncated = base.dropRight(2)
    val e1 = intercept[org.apache.spark.SparkException] {
      ProtoIngest.storeChunks(spark, binDf(Seq(truncated))).head()
    }
    assert(e1.getMessage.contains("corrupt") || e1.getCause.getMessage.contains("corrupt"))
    // varint length running past the buffer: field 4, wire 2, huge length
    val corrupt = Array(((4 << 3) | 2).toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte, 1.toByte)
    val e2 = intercept[org.apache.spark.SparkException] {
      ProtoIngest.storeChunks(spark, binDf(Seq(corrupt))).head()
    }
    assert(e2.getMessage.contains("corrupt") || e2.getCause.getMessage.contains("corrupt"))
    // truncated fixed64: tag says 8 bytes follow, only 3 do
    val shortFixed = Array(((10 << 3) | 1).toByte, 1.toByte, 2.toByte, 3.toByte)
    val e3 = intercept[org.apache.spark.SparkException] {
      ProtoIngest.storeChunks(spark, binDf(Seq(shortFixed))).head()
    }
    assert(e3.getMessage.contains("truncated") || e3.getCause.getMessage.contains("truncated"))
  }

  test("decoded StoreChunks feed the existing validate/reassemble path") {
    val rnd = new scala.util.Random(11)
    val content = Array.fill(2501)(rnd.nextInt().toByte)
    val frames = content.grouped(1000).zipWithIndex.map { case (part, i) =>
      encodeStoreChunk(StoreChunk("wire.bin", i, "", part))
    }.toSeq
    val chunks = ProtoIngest.storeChunks(spark, binDf(frames))
      .toDF().withColumnRenamed("fileName", "filename")
      .withColumnRenamed("sequenceNo", "seq")
      .withColumn("size", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("data")).cast("long"))
    val ok = sources.ChunkIngest.validate(chunks, chunkSize = 1000L).collect()
    assert(ok.length == 1 && ok.head.getAs[Boolean]("ok"))
    val re = sources.ChunkIngest.reassemble(chunks).head()
    val md = java.security.MessageDigest.getInstance("MD5").digest(content)
      .map("%02x".format(_)).mkString
    assert(re.getLong(1) == 2501L && re.getString(2) == md)
  }
}
