package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER=local-cluster[2,4,8192] runs the whole dump
    // against REAL executor JVMs (Sessions.tuneForMaster wires their
    // classpath); SPARK_GRAFT_RELIABLE_PIN=true forces every pin()
    // through the reliable-checkpoint path — together the multi-JVM
    // gate VERDICT r12 #2 asked for. Driver default unchanged.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = Sessions.tuneForMaster(
      SparkSession.builder().master(master), master)
    sys.env.get("SPARK_GRAFT_RELIABLE_PIN")
      .foreach(v => builder.config("spark.graft.reliablePin", v))
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2": arbitrary session confs for
    // gate legs (sweep's sf10 leg raises the stride-1 substring ceiling
    // this way — env reaches the forked JVM where SBT_OPTS -D does not)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Write int64 micros (not legacy INT96) so DuckDB reads timestamps
      // back exactly as Spark computed them.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet has TIMESTAMP(NANOS) — read as long, converted in
      // Tables.events (same micros truncation DuckDB applies).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // native functions (array_dot_f/_l, shingle3) — the same registrations
    // spark.sql.extensions=graft.functions.GraftExtensions performs; done
    // here once so every query builder can rely on them
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset run (comma-separated names); driver sets nothing
    // and always dumps the full registry
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet).filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
