package graft

import org.apache.spark.sql.SparkSession

/** Multi-JVM session wiring — the switch that turns the single-process
  * `local[n]` evidence into real executor-boundary evidence.
  *
  * `local-cluster[workers,cores,memMB]` spawns a standalone master +
  * workers in the driver JVM but launches each EXECUTOR as a separate
  * process — serialization of the native expressions, broadcast
  * thresholds, reliable-checkpoint pin()s and AQE all cross a real JVM
  * boundary (the reference always runs multi-process: one controller +
  * N storage nodes, scripts/start-storage-nodes.sh). Executor JVMs are
  * NOT forked by sbt, so they inherit neither the classpath nor the
  * JDK-17 --add-opens set build.sbt injects; this helper forwards both.
  */
object Sessions {

  /** The JDK-17 module opens Spark 4 needs when a JVM is created outside
    * spark-submit — same list as build.sbt's jdk17AddOpens (kept in sync
    * by the LocalClusterSpec smoke run, which dies on InaccessibleObject
    * errors if one is missing).
    */
  val Jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** Apply executor-process wiring when `master` is a local-cluster:
    * executors get the launching JVM's exact classpath (spark jars +
    * compiled classes + test deps — precisely what they must deserialize
    * against) and the module-opens flags. No-op for local[n] masters.
    */
  def tuneForMaster(b: SparkSession.Builder, master: String): SparkSession.Builder =
    if (!master.startsWith("local-cluster")) b
    else b
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      // NOTE: no -Dspark.* here — SparkConf.validateSettings rejects
      // Spark options inside executor extraJavaOptions
      .config("spark.executor.extraJavaOptions", Jdk17AddOpens.mkString(" "))
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "6g"))
}
