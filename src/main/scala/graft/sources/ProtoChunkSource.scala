package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for length-delimited StoreChunk frame
  * files (the reference's upload payload, proto/messages.proto:7-12, in
  * the standard `[varint length][frame]*` stream framing) — the
  * engine-API tier above ProtoIngest's mapPartitions decoding:
  *
  *  - `spark.read.format(classOf[ProtoChunkSource].getName).load(dir)`
  *    plans one InputPartition per frame file (the natural parallel-IO
  *    unit, like the reference's one-socket-per-chunk transfer);
  *  - **column pruning reaches the decoder**
  *    (`SupportsPushDownRequiredColumns`): a query selecting only
  *    `fileName, sequenceNo` never materializes the `data` payload —
  *    the reader skips over the bytes instead of copying them, which at
  *    100 TB of media payloads is most of the IO. `.explain` shows the
  *    pruned ReadSchema on the scan, exactly like parquet.
  *
  * File listing uses the Hadoop FileSystem API (works for hdfs:// and
  * s3a:// URIs, not just local paths); frames in one file are read
  * sequentially (the format is not splittable mid-file, like gzip —
  * parallelism comes from many files, which is how the reference shards
  * too: one file per chunk).
  */
class ProtoChunkSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProtoChunkSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ProtoChunkTable(properties.get("path"))
}

object ProtoChunkSource {
  val schema: StructType = StructType(Seq(
    StructField("fileName", StringType),
    StructField("sequenceNo", IntegerType),
    StructField("checksum", StringType),
    StructField("data", BinaryType)))

  /** Encode frames in the stream framing this source reads (used by
    * specs and as the reference-compatible writer).
    */
  def frameBytes(chunks: Seq[ProtoIngest.StoreChunk]): Array[Byte] =
    chunks.toArray.flatMap { c =>
      val body = ProtoIngest.encodeStoreChunk(c)
      varint(body.length) ++ body
    }

  private def varint(v0: Int): Array[Byte] = {
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
}

private class ProtoChunkTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"proto_chunks($path)"
  override def schema(): StructType = ProtoChunkSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // mode: FAILFAST (default) raises on the first corrupt frame;
    // PERMISSIVE drops the corrupt frame and the rest of its file (the
    // framing is length-chained, so one bad length orphans the
    // remainder) — the CSV/JSON corrupt-record policy applied to a
    // binary stream source
    new ProtoChunkScanBuilder(path,
      "permissive".equalsIgnoreCase(options.getOrDefault("mode", "failfast")))
}

private class ProtoChunkScanBuilder(path: String, permissive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ProtoChunkSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ProtoChunkScan(path, required, permissive)
}

private class ProtoChunkScan(path: String, required: StructType, permissive: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory) fs.listStatus(p).filter(_.isFile).map(_.getPath)
      else Array(p)
    files.sortBy(_.toString).map(f => ProtoChunkPartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the session's Hadoop conf (spark.hadoop.* — s3a credentials,
    // endpoints, …) must travel to the executors with the factory; a
    // bare `new Configuration()` on the reader side would only see
    // classpath defaults and break any non-local filesystem
    val confEntries = {
      val conf = SparkSession.active.sessionState.newHadoopConf()
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new ProtoChunkReaderFactory(required.fieldNames, permissive, confEntries)
  }
}

private case class ProtoChunkPartition(file: String) extends InputPartition

private class ProtoChunkReaderFactory(columns: Array[String], permissive: Boolean,
    confEntries: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ProtoChunkReader(partition.asInstanceOf[ProtoChunkPartition].file, columns,
      permissive, confEntries)
}

/** Reads one frame file; emits only the pruned columns. The whole file
  * is buffered (frame files are chunk-sized by construction — the
  * reference caps chunks well under memory, Chunk.java constants);
  * a production reader for unbounded files would stream the varint
  * scanner over an FSDataInputStream instead.
  */
private class ProtoChunkReader(file: String, columns: Array[String], permissive: Boolean,
    confEntries: Map[String, String]) extends PartitionReader[InternalRow] {
  private val bytes: Array[Byte] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen
      // whole-file buffering is the demo simplification (frame files are
      // chunk-sized by construction); fail loudly rather than truncating
      // the length into a wrapped/negative array size
      require(len <= Int.MaxValue - 8,
        s"frame file $file is $len B — beyond this reader's whole-file buffer; " +
          "split it into chunk-sized files")
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
  private var pos = 0
  private var current: InternalRow = _
  private val needData = columns.contains("data")

  override def next(): Boolean = {
    if (pos >= bytes.length) return false
    try {
      var len = 0; var shift = 0
      var more = true
      while (more) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(s"truncated frame length in $file")
        // bound the shift BEFORE using it: Int shifts wrap mod 32, so an
        // over-long corrupt varint would otherwise alias to a small,
        // bounds-passing length and silently misalign every later frame
        if (shift > 28)
          throw new IllegalArgumentException(s"corrupt frame length varint in $file")
        val x = bytes(pos); pos += 1
        len |= (x & 0x7f) << shift; shift += 7; more = (x & 0x80) != 0
      }
      if (len < 0 || pos + len > bytes.length)
        throw new IllegalArgumentException(
          s"corrupt frame length $len at offset $pos in $file")
      val frame = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      // prune-aware decode: when `data` is not selected the payload
      // bytes are skipped inside the decoder, never copied
      val c = ProtoIngest.decodeStoreChunkPruned(frame, withData = needData)
      current = InternalRow.fromSeq(columns.toSeq.map {
        case "fileName"   => UTF8String.fromString(c.fileName)
        case "sequenceNo" => c.sequenceNo
        case "checksum"   => UTF8String.fromString(c.checksum)
        case "data"       => c.data
      })
      true
    } catch {
      case e: IllegalArgumentException if permissive =>
        // the framing is length-chained: one corrupt length orphans the
        // remainder of the file, so drop it and end this partition
        pos = bytes.length
        false
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"corrupt frame in $file (use mode=permissive to skip): ${e.getMessage}", e)
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
