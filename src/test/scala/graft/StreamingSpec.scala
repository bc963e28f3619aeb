package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** True-streaming verification for SURVEY #51 (no oracle possible):
  * watermark drops too-late heartbeats, and the stateful liveness
  * monitor emits a dead-node record when a node goes silent past the
  * timeout — HeartbeatMonitor.java:36-45 semantics (FIXTURES.md §B.5).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops events later than 10 minutes (#51 late-data rule)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ops.Streaming.Heartbeat]
    val q = ops.Streaming.watermarkedCounts(ms.toDS())
      .writeStream.format("memory").queryName("wm_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      // two rows in window [10:00, 10:05)
      ms.addData(ops.Streaming.Heartbeat(ts("2024-01-01 10:00:30"), "n1"),
        ops.Streaming.Heartbeat(ts("2024-01-01 10:01:00"), "n1"))
      q.processAllAvailable()
      // advance watermark past the window: 10:30 -> watermark 10:20
      ms.addData(ops.Streaming.Heartbeat(ts("2024-01-01 10:30:00"), "n1"))
      q.processAllAvailable()
      // late row for the closed window — must be dropped
      ms.addData(ops.Streaming.Heartbeat(ts("2024-01-01 10:00:45"), "n1"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n FROM wm_counts WHERE window.start = TIMESTAMP '2024-01-01 10:00:00'")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(2L), s"late row was not dropped: $rows")
    } finally q.stop()
  }

  /** ProcessingTimeTimeout makes `shouldRunAnotherBatch` always true, so
    * the stream keeps scheduling no-data micro-batches to fire timers and
    * `noNewData` is never signaled — `processAllAvailable()` would block
    * forever. Poll the memory sink with a deadline instead.
    */
  private def awaitRows(what: String, timeoutMs: Long = 60000L)(pred: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!pred && System.currentTimeMillis < deadline) Thread.sleep(200)
    assert(pred, what)
  }

  test("stateful liveness emits dead-node record on timeout (#51)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ops.Streaming.Heartbeat]
    val q = ops.Streaming.statefulLiveness(ms.toDS(), timeoutMs = 1000L)
      .writeStream.format("memory").queryName("liveness")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      ms.addData(ops.Streaming.Heartbeat(ts("2024-01-01 10:00:00"), "nodeA"))
      awaitRows("nodeA was never alive") {
        spark.sql("SELECT node FROM liveness WHERE dead = false AND node = 'nodeA'")
          .count() >= 1
      }
      // go silent: the 1 s processing-time timer fires on a later no-data
      // batch and flushes the dead-node record
      awaitRows("nodeA never reported dead") {
        spark.sql("SELECT node FROM liveness WHERE dead = true AND node = 'nodeA'")
          .count() >= 1
      }
      // a node heartbeating after the purge starts fresh (the reference
      // silently re-adds late nodes, MessageProcessor.java:283-287)
      ms.addData(ops.Streaming.Heartbeat(ts("2024-01-01 10:00:05"), "nodeB"))
      awaitRows("nodeB was never alive") {
        spark.sql("SELECT node FROM liveness WHERE dead = false AND node = 'nodeB'")
          .count() >= 1
      }
    } finally q.stop()
  }
}
