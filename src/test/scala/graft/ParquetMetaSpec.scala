package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** ParquetMeta.stripSparkSchema — the footer surgery that makes
  * SfGen output read back like the driver's arrow-written fixtures.
  */
class ParquetMetaSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def writeNtz(dir: String): Unit = {
    spark.sql(
      """SELECT id, CAST(timestamp_micros(1700000000000000 + id * 1000000)
        |  AS TIMESTAMP_NTZ) AS ts, CAST(id AS DOUBLE) / 7 AS v
        |FROM range(1000)""".stripMargin)
      .repartition(2)
      .write.mode("overwrite").parquet(dir)
  }

  test("strip removes the embedded schema and flips NTZ read-back to LTZ") {
    val dir = Files.createTempDirectory("pmeta").toString + "/t.parquet"
    writeNtz(dir)
    // Spark resurrects NTZ from its own footer metadata even with
    // inferTimestampNTZ=false (the session pins it false)
    assert(spark.read.parquet(dir).schema("ts").dataType == TimestampNTZType)

    val before = spark.read.parquet(dir)
      .selectExpr("sum(id)", "sum(v)", "min(CAST(ts AS STRING))").collect()(0)
    val n = ParquetMeta.stripSparkSchema(dir)
    assert(n >= 1, "at least one part file rewritten")

    val after = spark.read.parquet(dir)
    // naive micros footer + no embedded schema ⇒ inference rules apply
    assert(after.schema("ts").dataType == TimestampType)
    // data region untouched: identical values (UTC session ⇒ same wall
    // clock), identical row count
    val a = after.selectExpr("sum(id)", "sum(v)", "min(CAST(ts AS STRING))").collect()(0)
    assert(a == before)
    assert(after.count() == 1000)
    // idempotent: second strip rewrites nothing
    assert(ParquetMeta.stripSparkSchema(dir) == 0)
  }

  test("footer keys are actually gone and no stale crc sidecar survives") {
    val dir = Files.createTempDirectory("pmeta2").toString + "/t.parquet"
    writeNtz(dir)
    ParquetMeta.stripSparkSchema(dir)
    val part = Files.list(Paths.get(dir)).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList.head
    val bytes = Files.readAllBytes(part)
    val footerLen = java.nio.ByteBuffer.wrap(bytes, bytes.length - 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val fmd = org.apache.parquet.format.Util.readFileMetaData(
      new java.io.ByteArrayInputStream(bytes, bytes.length - 8 - footerLen, footerLen))
    val keys = Option(fmd.getKey_value_metadata)
      .map(_.asScala.map(_.getKey).toSet).getOrElse(Set.empty[String])
    assert(!keys.exists(_.startsWith("org.apache.spark")), s"leftover: $keys")
    // the .crc Hadoop sidecar for the rewritten part must be gone —
    // a stale one fails every subsequent read with ChecksumException
    val crc = part.resolveSibling("." + part.getFileName.toString + ".crc")
    assert(!Files.exists(crc))
    // and Tables.normNtz would have been a no-op here; both layers agree
    assert(spark.read.parquet(dir).schema("ts").dataType == TimestampType)
  }

  test("normNtz defense: Spark-written NTZ data still reads as LTZ via Tables") {
    val base = Files.createTempDirectory("pmeta3").toString
    writeNtz(s"$base/events.parquet")   // unstripped: embedded NTZ schema
    val df = Tables(spark, base, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 1000)
  }
}
