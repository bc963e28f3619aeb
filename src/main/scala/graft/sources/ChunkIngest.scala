package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's file lifecycle as Spark source/sink jobs over real
  * bytes — upload = chunk + checksum + persist, download = verify +
  * ordered reassembly:
  *
  *  - upload:   Client.sendFile → Chunk.createChunksFromFile
  *              (structures/Chunk.java:36-76: ⌈size/chunkSize⌉ chunks,
  *              last chunk short, md5 per chunk :152-154)
  *  - download: Chunk.createFileFromChunks (structures/Chunk.java:78-126:
  *              contiguity validation, ordered concat, integrity check)
  *
  * Spark mapping: `spark.read.format("binaryFile")` is the source (one
  * row per file: path, length, content), chunking is a codegen'd
  * generator (`explode(sequence(...))` + binary `substring`), and the
  * sink is partitioned parquet — replication/durability is the storage
  * layer's job (HDFS/S3), not reimplemented. At 100 TB: binaryFile
  * splits *files* across tasks (a single giant file should be ingested
  * via a streaming chunker instead); the chunk table is written
  * partitioned by filename hash so reassembly shuffles each file's
  * chunks to one task without skew.
  *
  * Not in `SparkEntry.queries`: these run over arbitrary directories,
  * not the driver's sfDir tables (the oracle-checked split math is
  * q_chunk_split; the binary-column plumbing is q_mm_*). Verified by
  * ChunkIngestSpec round-trips, mirroring the reference's own
  * ChunkTest.java:38-100.
  */
object ChunkIngest {

  /** Reference chunk size is 1,000,000 B (dfs.properties:5); callers
    * pass smaller sizes in tests.
    */
  val DefaultChunkSize: Long = 1000000L

  /** Upload path: directory of files → chunk table
    * (filename, seq, size, checksum, data).
    */
  def chunk(spark: SparkSession, dir: String,
            chunkSize: Long = DefaultChunkSize): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
        col("length"), col("content"))
      // Empty files produce zero chunks (the reference rejects them,
      // structures/Chunk.java:144-150); without the guard sequence(0, -1)
      // defaults to step -1 and would emit two bogus rows [0, -1].
      .where(col("length") > 0)
      .select(col("filename"), col("length"),
        explode(expr(s"sequence(0L, (length + $chunkSize - 1) DIV $chunkSize - 1)"))
          .as("seq"),
        col("content"))
      // binary substring: 1-based start, length-bounded — the last
      // chunk is short exactly as Chunk.java:60-66 computes it
      .select(col("filename"), col("seq"),
        expr(s"substring(content, CAST(seq * $chunkSize + 1 AS INT), ${chunkSize.toInt})")
          .as("data"))
      .withColumn("size", length(col("data")).cast("long"))
      .withColumn("checksum", md5(col("data")))

  /** Persist the chunk table — the "store chunks on nodes" sink
    * (storageNode/MessageProcessor.java:180-216). Partitioning by
    * filename co-locates each file's chunks for downstream reassembly.
    */
  def write(chunks: DataFrame, dest: String): Unit =
    chunks.write.mode("overwrite").partitionBy("filename").parquet(dest)

  /** Download-path validation (Chunk.createFileFromChunks:80-98): per
    * file, chunk 0 present, no gaps/duplicates, sizes consistent.
    * Returns one row per file with ok flag — the Spark form of the
    * reference's throw-on-invalid.
    *
    * `last_size > 0` is intentional: a zero-byte file is ILLEGAL in the
    * reference — upload rejects it before any chunk exists
    * (Chunk.checkFileNotEmpty, structures/Chunk.java:144-150), so a
    * single empty chunk can only be corruption, never a valid file.
    * last_size is the size at the MAX (seq, size) pair — deterministic
    * even when duplicate seqs carry different sizes (a bare
    * max_by(size, seq) is tie-nondeterministic; such a file is already
    * not-ok via n_distinct, but the reported column must not flap
    * between runs).
    */
  def validate(chunks: DataFrame,
               chunkSize: Long = DefaultChunkSize): DataFrame =
    chunks.groupBy("filename")
      .agg(count(lit(1)).as("n_chunks"),
        min(col("seq")).as("min_seq"),
        max(col("seq")).as("max_seq"),
        countDistinct(col("seq")).as("n_distinct"),
        sum(col("size")).as("total_size"),
        max(col("size")).as("max_size"),
        max(struct(col("seq"), col("size"))).getField("size").as("last_size"))
      .withColumn("ok",
        col("min_seq") === 0 &&
          col("max_seq") === col("n_chunks") - 1 &&
          col("n_distinct") === col("n_chunks") &&
          // sizes consistent (the documented half the old flag skipped):
          // no chunk exceeds the chunk size, the tail chunk is non-empty,
          // and the total forces every NON-tail chunk to exactly
          // chunkSize (all ≤ chunkSize + the sum identity ⇒ equality) —
          // a truncated middle chunk now fails validation instead of
          // reassembling into a silently corrupt file
          col("max_size") <= chunkSize && col("last_size") > 0 &&
          col("total_size") ===
            (col("n_chunks") - 1) * chunkSize + col("last_size"))

  /** Ordered reassembly (Chunk.createFileFromChunks:113-122): per file,
    * concat chunk bytes in sequence order; file_md5 is the integrity
    * hash of the whole content (Utils.java:28-58). The fold runs over
    * the collected per-file array — bounded by one file's size, the
    * same bound the reference accepts when it writes the file to disk.
    */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy("filename")
      .agg(sort_array(collect_list(struct(col("seq"), col("data")))).as("parts"))
      .select(col("filename"),
        expr("aggregate(parts, CAST('' AS BINARY), (acc, p) -> concat(acc, p.data))")
          .as("content"))
      .select(col("filename"), length(col("content")).cast("long").as("length"),
        md5(col("content")).as("file_md5"))
}
