package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the format every LLM-corpus pipeline
  * speaks (one JSON document per line; the distribution form of
  * C4/Pile-style corpora). The reference stores opaque chunk bytes
  * (storageNode/StorageNode.java persists chunks as files); a curation
  * engine additionally needs the *interchange* leg: export a curated
  * corpus as sharded JSONL and re-ingest someone else's.
  *
  * Scale rules baked in:
  *   - READS TAKE AN EXPLICIT SCHEMA, always. Schema inference is a
  *     whole extra pass over the corpus before the real job starts —
  *     at 100 TB that is the difference between one scan and two.
  *   - Corrupt lines are DATA, not exceptions: a billion-line crawl
  *     export always has some. PERMISSIVE mode quarantines them into
  *     `_corrupt_record` so the audit can count/inspect them while the
  *     clean rows flow on; FAILFAST would kill a day-long job on line
  *     999,999,999.
  *   - Shard assignment is a pure function of doc_id (the
  *     q_shard_manifest multiplicative hash), so the layout is
  *     reproducible across writers and engines — no round-robin, no
  *     RNG, no task-order dependence.
  *   - One file per shard via repartition on the shard key: shard
  *     count = write parallelism = read parallelism. Plain-text JSONL
  *     is line-splittable so big shards still parallelize on read;
  *     gzip shards are NOT splittable — the shard count IS the read
  *     parallelism then, which is why the count is a knob.
  */
object JsonlCorpus {

  /** documents-table schema (TESTDATA.md); inference is banned. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("shard", LongType)))

  /** Read schema with the PERMISSIVE quarantine column appended. */
  val auditSchema: StructType =
    documentsSchema.add(StructField("_corrupt_record", StringType))

  val NShards = 8

  /** Deterministic shard of a doc_id — the same multiplicative hash as
    * q_shard_manifest, mirrored verbatim in the DuckDB oracle.
    */
  def shardExpr: String =
    s"CAST(doc_id * 2654435761 % 4294967296 % $NShards AS BIGINT)"

  /** Export `docs` (documents-table shape) as JSONL, one FILE per
    * shard under hive-style `shard=K/` dirs. The repartition clusters
    * each shard's rows into one task (hash collisions between the 8
    * shard values merely co-locate two shards in one task — partitionBy
    * still splits them into their own dirs, one file each; a bare
    * repartition WITHOUT partitionBy would leave mixed-shard and empty
    * files, breaking the one-file-per-shard contract). `codec` "gzip"
    * produces .json.gz shards (smaller, but each is one read task);
    * default uncompressed (line-splittable).
    */
  def write(docs: DataFrame, dir: String, codec: Option[String] = None): Unit = {
    val w = docs
      .withColumn("shard", expr(shardExpr))
      .repartition(NShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
    codec.fold(w)(c => w.option("compression", c)).json(dir)
  }

  /** Ingest a JSONL corpus dir with the explicit schema; corrupt lines
    * surface as rows with every data column null (dropped here — use
    * `readAudit` to see them).
    */
  def read(s: SparkSession, dir: String): DataFrame =
    s.read.schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .json(dir)

  /** Ingest with the quarantine column: malformed lines come back as
    * rows whose `_corrupt_record` holds the raw line (all data columns
    * null). The caller decides — count them, sample them, dead-letter
    * them — without losing a clean row.
    */
  def readAudit(s: SparkSession, dir: String): DataFrame =
    s.read.schema(auditSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)

  /** Streaming ingest of a JSONL spool directory — the arrival pattern
    * of a continuously-published corpus (new shard files land, the
    * pipeline folds them in; the LiveIngest file-tail shape applied to
    * the interchange format). Same explicit schema and PERMISSIVE
    * posture as the batch read; `maxFilesPerTrigger` bounds catch-up
    * bursts after downtime so one micro-batch never swallows a backlog
    * of shards.
    */
  def readStream(s: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    s.readStream.schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Per-file corrupt-line report over a JSONL dir: (file, n_rows,
    * n_parsed, n_corrupt, first_corrupt). The count is a plain
    * combining aggregate — the quarantine column rides the normal
    * scan, so the audit costs one read, not a validation pre-pass.
    * n_parsed counts doc_id deliberately: Spark refuses a scan whose
    * referenced columns are ONLY the internal corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and an aggregate that never
    * touches a data column prunes down to exactly that.
    */
  def corruptReport(s: SparkSession, dir: String): DataFrame =
    readAudit(s, dir)
      .select(input_file_name().as("file"), col("_corrupt_record"), col("doc_id"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        count(col("doc_id")).as("n_parsed"),
        count(col("_corrupt_record")).as("n_corrupt"),
        min(col("_corrupt_record")).as("first_corrupt"))
      .orderBy("file")
}
