package graft.udaf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (sequenceNo, chunk-checksum) input row of a file's chunk set. */
case class ChunkHash(seq: Int, hash: String)

/** Aggregation buffer: the chunk hashes seen so far (unordered until
  * finish). Bounded by chunks-per-file (the reference caps files at
  * ⌈size/1 MB⌉ chunks — structures/Chunk.java:36-76), not by table size,
  * so the buffer stays small even at 100 TB total data.
  */
case class ChecksumBuf(items: Seq[ChunkHash])

/** Custom typed Aggregator computing a file-level integrity checksum:
  * md5 of the in-seq-order concatenation of per-chunk checksums.
  *
  * This is the alternative implementation of SURVEY §2A #11 (reference:
  * ordered chunk concat structures/Chunk.java:100-126 + md5
  * Utils.java:28-58); the primary implementation is declarative
  * (md5 ∘ array_join ∘ sort_array ∘ collect_list, see Chunks.fileChecksum).
  * Both must agree — asserted in ChunksSpec and by sharing one oracle SQL.
  *
  * Sort happens once in finish() (chunk order within a file), so merge is
  * a cheap concat and the aggregate stays a proper two-phase
  * (partial/final) distributed aggregation.
  */
class FileChecksum extends Aggregator[ChunkHash, ChecksumBuf, String] {
  override def zero: ChecksumBuf = ChecksumBuf(Vector.empty)
  override def reduce(b: ChecksumBuf, a: ChunkHash): ChecksumBuf =
    ChecksumBuf(b.items :+ a)
  override def merge(b1: ChecksumBuf, b2: ChecksumBuf): ChecksumBuf =
    ChecksumBuf(b1.items ++ b2.items)
  override def finish(b: ChecksumBuf): String = {
    val ordered = b.items.sortBy(c => (c.seq, c.hash)).map(_.hash).mkString("")
    FileChecksum.md5Hex(ordered)
  }
  override def bufferEncoder: Encoder[ChecksumBuf] = Encoders.product[ChecksumBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object FileChecksum {
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}
