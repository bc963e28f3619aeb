package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level round-trip for the ingest source — the Spark form of the
  * reference's ChunkTest.java:38-100 (split-then-reassemble equals the
  * original bytes) over real binary content, including a
  * non-chunk-aligned file.
  */
class ChunkIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private lazy val (dir, originals) = {
    val d = Files.createTempDirectory("graft-ingest").toString
    val rnd = new scala.util.Random(7)
    val files = Map(
      "aligned.bin" -> Array.fill(4000)(rnd.nextInt().toByte),   // 4 chunks of 1000
      "ragged.bin"  -> Array.fill(2501)(rnd.nextInt().toByte),   // last chunk = 501
      "tiny.bin"    -> Array.fill(7)(rnd.nextInt().toByte))      // single short chunk
    files.foreach { case (n, b) => Files.write(Paths.get(d, n), b) }
    (d, files)
  }

  private lazy val chunks =
    sources.ChunkIngest.chunk(spark, dir, chunkSize = 1000L).cache()

  test("chunk counts and last-chunk sizes match the reference math") {
    val got = chunks.groupBy("filename")
      .agg(count(lit(1)).as("n"), max(col("size")).as("maxs"), min(col("size")).as("mins"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got("aligned.bin") == ((4L, 1000L)))
    assert(got("ragged.bin") == ((3L, 501L)))
    assert(got("tiny.bin") == ((1L, 7L)))
  }

  test("per-chunk checksums verify (no corruption on the happy path)") {
    import spark.implicits._
    val bad = chunks.filter(md5(col("data")) =!= col("checksum")).count()
    assert(bad == 0)
    // planted corruption is caught — Chunk.isCorrupted:156-164
    val corrupted = chunks.withColumn("data",
      when(col("filename") === "tiny.bin", lit(Array[Byte](1, 2, 3)))
        .otherwise(col("data")))
    assert(corrupted.filter(md5(col("data")) =!= col("checksum"))
      .select("filename").as[String].collect().toSeq == Seq("tiny.bin"))
  }

  test("validation accepts contiguous chunks and flags a gap") {
    def okMap(df: org.apache.spark.sql.DataFrame) =
      sources.ChunkIngest.validate(df, chunkSize = 1000L)
        .collect().map(r => r.getString(0) -> r.getAs[Boolean]("ok")).toMap
    val ok = okMap(chunks)
    assert(ok.values.forall(identity))
    val gapped = okMap(chunks.filter(
      !(col("filename") === "aligned.bin" && col("seq") === 2)))
    assert(!gapped("aligned.bin") && gapped("ragged.bin") && gapped("tiny.bin"))
  }

  test("validation flags a truncated middle chunk (sizes consistent, not just seqs)") {
    // seqs stay contiguous; only the byte count of a NON-tail chunk
    // shrinks — the reference rejects this (createFileFromChunks:80-98)
    // and the old seq-only flag silently passed it through to reassembly
    val truncated = chunks.withColumn("size",
      when(col("filename") === "aligned.bin" && col("seq") === 1, lit(999L))
        .otherwise(col("size")))
    val ok = sources.ChunkIngest.validate(truncated, chunkSize = 1000L)
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("ok")).toMap
    assert(!ok("aligned.bin") && ok("ragged.bin") && ok("tiny.bin"))
  }

  test("reassembled bytes hash-match the original files (round trip)") {
    val got = sources.ChunkIngest.reassemble(chunks)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    originals.foreach { case (name, bytes) =>
      assert(got(name) == ((bytes.length.toLong, md5hex(bytes))), name)
    }
  }

  test("empty file ingests to zero chunks (Chunk.java:144-150 rejects them)") {
    val d = Files.createTempDirectory("graft-ingest-empty").toString
    Files.write(Paths.get(d, "empty.bin"), Array.emptyByteArray)
    Files.write(Paths.get(d, "one.bin"), Array[Byte](42))
    val ch = sources.ChunkIngest.chunk(spark, d, chunkSize = 1000L)
    assert(ch.filter(col("filename") === "empty.bin").count() == 0)
    assert(ch.filter(col("filename") === "one.bin").count() == 1)
  }

  test("last_size is deterministic when duplicate seqs carry different sizes") {
    import spark.implicits._
    // duplicate tail seq with two sizes: already not-ok via n_distinct,
    // but the REPORTED last_size must not flap between runs — it is the
    // size at the lexicographic max (seq, size) pair
    val rows = Seq(("dup.bin", 0L, 1000L), ("dup.bin", 1L, 400L), ("dup.bin", 1L, 700L))
      .toDF("filename", "seq", "size")
    val got = (1 to 5).map { _ =>
      sources.ChunkIngest.validate(rows.repartition(3), chunkSize = 1000L)
        .select("last_size").head().getLong(0)
    }
    assert(got.distinct == Seq(700L), s"nondeterministic last_size: $got")
    assert(!sources.ChunkIngest.validate(rows, 1000L).head().getAs[Boolean]("ok"))
  }

  test("write/read round trip through the partitioned parquet sink") {
    val dest = Files.createTempDirectory("graft-ingest-out").toString + "/chunks"
    sources.ChunkIngest.write(chunks, dest)
    val back = spark.read.parquet(dest)
    val got = sources.ChunkIngest.reassemble(back)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    originals.foreach { case (name, bytes) =>
      assert(got(name) == md5hex(bytes), name)
    }
  }
}
