package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Protobuf-shaped ingestion — the reference's wire format as a Spark
  * source. The reference's ONLY schema system is `proto/messages.proto`;
  * this decodes its three data-plane shapes into typed Datasets:
  *
  *  - `StoreChunk` (proto/messages.proto:7-12): flat message — the
  *    upload payload (filename, sequenceNo, checksum, data)
  *  - `Heartbeat` (proto/messages.proto:37-42) with repeated nested
  *    `FileChunks` (:31-34, packed repeated int32)
  *  - `DownloadFileResponse` (proto/messages.proto:72-80): the nested
  *    file → [(seq, [nodes])] catalog — q_nested_catalog's wire form
  *
  * The container has no protoc and no spark-protobuf module, so the
  * proto3 wire format (varint + length-delimited, per the public
  * protobuf encoding spec) is decoded directly — ~40 lines, proto3
  * semantics honored: any field order, missing fields → defaults,
  * unknown fields skipped, repeated scalars packed or unpacked. In a
  * full deployment this module is swapped for `from_protobuf` with the
  * real descriptor set; the Spark-side shape is identical.
  *
  * Scale: decoding runs in `mapPartitions` over a binary column — pure
  * per-partition imperative logic (the one place RDD-style code is the
  * right tool), no shuffle; downstream everything is a typed Dataset
  * with columnar schema. Not in `SparkEntry.queries` (reads arbitrary
  * frames, not the sfDir tables); ProtoIngestSpec round-trips encode →
  * decode for all three shapes.
  */
object ProtoIngest {

  case class StoreChunk(fileName: String, sequenceNo: Int, checksum: String, data: Array[Byte])
  case class StorageNode(host: String, port: Int)
  case class ChunkLocation(sequenceNo: Int, storageNodes: Seq[StorageNode])
  case class FileCatalog(filename: String, chunkLocations: Seq[ChunkLocation])
  case class FileChunks(filename: String, sequenceNos: Seq[Int])
  case class Heartbeat(host: String, port: Int, fileChunks: Seq[FileChunks])

  // ------------------------------------------------------ wire primitives
  /** One decoded field: varint value for wire type 0, payload bytes for
    * wire type 2 (proto3 uses nothing else in the reference schema).
    */
  private final case class RawField(num: Int, varint: Long, payload: Array[Byte])

  private def readVarint(b: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0; var shift = 0; var v = 0L; var more = true
    while (more) {
      if (pos >= b.length)
        throw new IllegalArgumentException(s"truncated varint at offset $pos0 (buffer ${b.length} B)")
      if (shift > 63)
        throw new IllegalArgumentException(s"varint at offset $pos0 exceeds 64 bits")
      val x = b(pos)
      v |= (x & 0x7fL) << shift
      pos += 1; shift += 7; more = (x & 0x80) != 0
    }
    (v, pos)
  }

  private def rawFields(b: Array[Byte]): Seq[RawField] = {
    var pos = 0
    val out = Seq.newBuilder[RawField]
    while (pos < b.length) {
      val (tag, p1) = readVarint(b, pos)
      val num = (tag >> 3).toInt
      (tag & 7).toInt match {
        case 0 =>
          val (v, p2) = readVarint(b, p1); out += RawField(num, v, null); pos = p2
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if (len < 0 || p2 + len > b.length)
            throw new IllegalArgumentException(
              s"corrupt length-delimited field $num: len=$len at offset $p2, buffer ${b.length} B")
          out += RawField(num, 0L, java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt))
          pos = p2 + len.toInt
        // Unknown fixed-width fields from a newer writer are skipped, not
        // fatal (proto3 forward compatibility); the reference schema uses
        // neither, so there is nothing to surface.
        case 1 =>
          if (p1 + 8 > b.length)
            throw new IllegalArgumentException(s"truncated fixed64 field $num at offset $p1")
          pos = p1 + 8
        case 5 =>
          if (p1 + 4 > b.length)
            throw new IllegalArgumentException(s"truncated fixed32 field $num at offset $p1")
          pos = p1 + 4
        case w => throw new IllegalArgumentException(s"invalid wire type $w (field $num)")
      }
    }
    out.result()
  }

  /** Packed OR unpacked repeated int32 (proto3 packs by default but
    * decoders must accept both, per the encoding spec).
    */
  private def repeatedInt32(fs: Seq[RawField], num: Int): Seq[Int] =
    fs.collect {
      case RawField(`num`, v, null) => Seq(v.toInt)
      case RawField(`num`, _, p) =>
        var pos = 0
        val out = Seq.newBuilder[Int]
        while (pos < p.length) { val (v, p2) = readVarint(p, pos); out += v.toInt; pos = p2 }
        out.result()
    }.flatten

  // ------------------------------------------------------------- decoders
  // Every length-delimited pattern guards `p != null`: a field number
  // re-encoded with wire type 0 (varint) carries a null payload, and
  // per proto3 a field with an unexpected wire type is skipped like an
  // unknown field — without the guard it would NPE out of the decoder
  // instead of raising the declared IllegalArgumentException contract.
  def decodeStoreChunk(b: Array[Byte]): StoreChunk =
    decodeStoreChunkPruned(b, withData = true)

  /** Prune-aware StoreChunk decode: with `withData = false` the payload
    * bytes of field 4 are SKIPPED in place — never copied out of the
    * frame buffer — which is what makes column pruning in
    * ProtoChunkSource actually save the payload copy (most of the
    * per-frame work for media-sized chunks). This is a dedicated loop,
    * not rawFields: the generic path copies every length-delimited
    * payload before the caller can decide it doesn't want it.
    */
  def decodeStoreChunkPruned(b: Array[Byte], withData: Boolean): StoreChunk = {
    var name = ""; var seq = 0; var sum = ""; var data = Array.emptyByteArray
    var pos = 0
    while (pos < b.length) {
      val (tag, p1) = readVarint(b, pos)
      val num = (tag >> 3).toInt
      (tag & 7).toInt match {
        case 0 =>
          val (v, p2) = readVarint(b, p1)
          if (num == 2) seq = v.toInt
          pos = p2
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if (len < 0 || p2 + len > b.length)
            throw new IllegalArgumentException(
              s"corrupt length-delimited field $num: len=$len at offset $p2, buffer ${b.length} B")
          num match {
            case 1 => name = new String(b, p2, len.toInt, UTF_8)
            case 3 => sum = new String(b, p2, len.toInt, UTF_8)
            case 4 if withData => data = java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)
            case _ => () // pruned payload or unknown field: advance, no copy
          }
          pos = p2 + len.toInt
        case 1 =>
          if (p1 + 8 > b.length)
            throw new IllegalArgumentException(s"truncated fixed64 field $num at offset $p1")
          pos = p1 + 8
        case 5 =>
          if (p1 + 4 > b.length)
            throw new IllegalArgumentException(s"truncated fixed32 field $num at offset $p1")
          pos = p1 + 4
        case w => throw new IllegalArgumentException(s"invalid wire type $w (field $num)")
      }
    }
    StoreChunk(name, seq, sum, data)
  }

  private def decodeStorageNode(b: Array[Byte]): StorageNode = {
    var host = ""; var port = 0
    rawFields(b).foreach {
      case RawField(1, _, p) if p != null => host = new String(p, UTF_8)
      case RawField(2, v, null) => port = v.toInt
      case _ => ()
    }
    StorageNode(host, port)
  }

  private def decodeChunkLocation(b: Array[Byte]): ChunkLocation = {
    var seq = 0; val nodes = Seq.newBuilder[StorageNode]
    rawFields(b).foreach {
      case RawField(1, v, null) => seq = v.toInt
      case RawField(2, _, p) if p != null => nodes += decodeStorageNode(p)
      case _ => ()
    }
    ChunkLocation(seq, nodes.result())
  }

  def decodeFileCatalog(b: Array[Byte]): FileCatalog = {
    var name = ""; val locs = Seq.newBuilder[ChunkLocation]
    rawFields(b).foreach {
      case RawField(1, _, p) if p != null => name = new String(p, UTF_8)
      case RawField(2, _, p) if p != null => locs += decodeChunkLocation(p)
      case _ => ()
    }
    FileCatalog(name, locs.result())
  }

  private def decodeFileChunks(b: Array[Byte]): FileChunks = {
    val fs = rawFields(b)
    val name = fs.collectFirst { case RawField(1, _, p) if p != null => new String(p, UTF_8) }
    FileChunks(name.getOrElse(""), repeatedInt32(fs.filter(_.num == 2), 2))
  }

  def decodeHeartbeat(b: Array[Byte]): Heartbeat = {
    var host = ""; var port = 0; val fcs = Seq.newBuilder[FileChunks]
    rawFields(b).foreach {
      case RawField(1, _, p) if p != null => host = new String(p, UTF_8)
      case RawField(2, v, null) => port = v.toInt
      case RawField(3, _, p) if p != null => fcs += decodeFileChunks(p)
      case _ => ()
    }
    Heartbeat(host, port, fcs.result())
  }

  // -------------------------------------------------------- Dataset API
  /** Decode a binary column of StoreChunk frames into the typed chunk
    * table (the same shape ChunkIngest.chunk produces from raw files).
    */
  def storeChunks(spark: SparkSession, raw: DataFrame, colName: String = "msg"): Dataset[StoreChunk] = {
    import spark.implicits._
    raw.select(colName).as[Array[Byte]].mapPartitions(_.map(decodeStoreChunk))
  }

  /** Decode DownloadFileResponse frames into the nested catalog. */
  def fileCatalog(spark: SparkSession, raw: DataFrame, colName: String = "msg"): Dataset[FileCatalog] = {
    import spark.implicits._
    raw.select(colName).as[Array[Byte]].mapPartitions(_.map(decodeFileCatalog))
  }

  /** Decode Heartbeat frames (the reference's periodic node report). */
  def heartbeats(spark: SparkSession, raw: DataFrame, colName: String = "msg"): Dataset[Heartbeat] = {
    import spark.implicits._
    raw.select(colName).as[Array[Byte]].mapPartitions(_.map(decodeHeartbeat))
  }

  // ------------------------------------------------------------ encoders
  // Write path (the reference also SENDS these frames); used by the
  // round-trip specs. Scalars always emitted (proto3 writers may omit
  // defaults — decoders above handle that); repeated int32 packed.
  private[sources] def varintBytes(v0: Long): Array[Byte] = {
    var v = v0
    val out = Array.newBuilder[Byte]
    var more = true
    while (more) {
      val x = (v & 0x7f).toByte
      v >>>= 7
      more = v != 0
      out += (if (more) (x | 0x80).toByte else x)
    }
    out.result()
  }
  private def tagged(num: Int, wire: Int): Array[Byte] = varintBytes((num << 3) | wire)
  private def lenField(num: Int, p: Array[Byte]): Array[Byte] =
    tagged(num, 2) ++ varintBytes(p.length) ++ p
  private def strField(num: Int, s: String): Array[Byte] = lenField(num, s.getBytes(UTF_8))
  private def intField(num: Int, v: Long): Array[Byte] = tagged(num, 0) ++ varintBytes(v)

  def encodeStoreChunk(c: StoreChunk): Array[Byte] =
    strField(1, c.fileName) ++ intField(2, c.sequenceNo) ++
      strField(3, c.checksum) ++ lenField(4, c.data)

  def encodeFileCatalog(f: FileCatalog): Array[Byte] =
    strField(1, f.filename) ++ f.chunkLocations.toArray.flatMap { cl =>
      lenField(2, intField(1, cl.sequenceNo) ++ cl.storageNodes.toArray.flatMap { n =>
        lenField(2, strField(1, n.host) ++ intField(2, n.port))
      })
    }

  def encodeHeartbeat(h: Heartbeat): Array[Byte] =
    strField(1, h.host) ++ intField(2, h.port) ++ h.fileChunks.toArray.flatMap { fc =>
      lenField(3, strField(1, fc.filename) ++
        lenField(2, fc.sequenceNos.toArray.flatMap(v => varintBytes(v))))
    }
}
