package graft.ops

import org.apache.spark.sql.SparkSession

/** Dispatch table for `CALL graft.<proc>(...)` (plans/GraftCallParser)
  * — the maintenance verbs behind the persisted artifacts, named and
  * argument-shaped the way a lakehouse operator schedules them. Each
  * returns a short human-readable result string (the published dir,
  * the refit verdict, the compaction counts); failures throw and reach
  * the caller as a normal query error. Lives in `graft.ops` so it can
  * reach the private[graft] ensure entry points without widening them.
  */
object Procedures {

  /** Names → (arity description) — kept here so the error message for
    * an unknown procedure lists the real surface.
    */
  private val usage: Seq[(String, String)] = Seq(
    "ensure_zone_map" -> "(dataset_dir)",
    "ensure_bloom_index" -> "(dataset_dir)",
    "ensure_ivf_index" -> "(dataset_dir)",
    "ivf_recluster_if_stale" -> "(dataset_dir)",
    "ivf_split_hot_cells" -> "(dataset_dir)",
    "ensure_dedup_substrates" -> "(dataset_dir)",
    "compact_frames" -> "(frame_dir[, small_bytes, target_bytes])",
    "cms_compact" -> "(sketch_dir[, keep_tail])")

  def run(s: SparkSession, proc: String, args: Seq[String]): String = {
    def arg(i: Int): String = {
      require(args.length > i,
        s"CALL graft.$proc: missing argument ${i + 1} " +
          s"(${usage.toMap.getOrElse(proc, "")})")
      args(i)
    }
    proc match {
      case "ensure_zone_map" =>
        // partials (the evolution substrate) + merged (the query view)
        Storage.ensureZoneMapMerged(s, arg(0))
      case "ensure_bloom_index" =>
        Storage.ensureBloomIndex(s, arg(0))
      case "ensure_ivf_index" =>
        LlmPipeline.ensureIvfIndex(s, arg(0))
      case "ivf_recluster_if_stale" =>
        val refit = LlmPipeline.ivfReclusterIfStale(s, arg(0))
        s"refit=$refit index=${LlmPipeline.ivfIndexDir(s, arg(0))}"
      case "ivf_split_hot_cells" =>
        val split = LlmPipeline.ivfSplitHotCells(s, arg(0))
        s"split=$split index=${LlmPipeline.ivfIndexDir(s, arg(0))}"
      case "ensure_dedup_substrates" =>
        // the ingest-time job that makes every cold dedup query an
        // artifact read: all six substrate families for one corpus
        val dirs = Seq(
          LlmPipeline.ensureNgramPostings(s, arg(0)),
          LlmPipeline.ensureMinhashBanded(s, arg(0)),
          LlmPipeline.ensureSimhashSig(s, arg(0)),
          LlmPipeline.ensureEmbedBucketed(s, arg(0)),
          LlmPipeline.ensureWinnowFps(s, arg(0)),
          Multimodal.ensurePhashTable(s, arg(0)))
        dirs.mkString(";")
      case "cms_compact" =>
        val keepTail = if (args.length > 1) args(1).toInt else 4
        LlmPipeline.cmsCompactSketchLog(s, arg(0), keepTail)
      case "compact_frames" =>
        val small = if (args.length > 1) args(1).toLong else 512L * 1024
        val target = if (args.length > 2) args(2).toLong else 4L * 1024 * 1024
        val rep = graft.sources.FrameCompaction.compact(s, arg(0), small, target)
        rep.toString
      case other =>
        throw new IllegalArgumentException(
          s"unknown procedure graft.$other; available: " +
            usage.map { case (n, u) => s"$n$u" }.mkString(", "))
    }
  }
}
