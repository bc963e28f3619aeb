package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction EXECUTOR for proto-frame directories — the job
  * that carries out what `ops.Storage.compactPlan` (q_compact_plan)
  * plans: group sub-threshold frame files into target-size bins and
  * rewrite each bin as ONE file through the DSv2 writer, retiring the
  * originals. (Reference analog: every chunk file a storage node
  * persists goes through ONE write path — chunk bytes + checksum
  * sidecar, storageNode/MessageProcessor.java:181-214 — and compaction
  * reuses exactly that path here, so there is no second serializer to
  * drift.)
  *
  * Why this matters at 100 TB: an append-heavy frame directory accretes
  * files far smaller than a scan partition, and scan parallelism then
  * degrades to file count × open/seek overhead. Compaction restores
  * ~targetBytes files, which the frame-index sidecar in turn makes
  * splittable again.
  *
  * Mechanics and guarantees:
  *  - Planning is over file METADATA only (one listing; ~10⁶ entries at
  *    100 TB — driver-scale). The DATA path is Spark jobs: each bin is
  *    a union of single-file reads coalesced to one writer task, so the
  *    bytes never visit the driver.
  *  - CRASH-SAFE two-phase protocol, no duplicates at any kill point.
  *    A bin's identity is deterministic (md5 of its sorted originals'
  *    name:length:mtime triples — CONTENT-stamped, so files later
  *    re-created under retired names form a NEW bin instead of
  *    silently overwriting the previous compaction output, which was
  *    the sole copy of the old rows), which fixes its output name
  *    `compact-<binId>.frames` and
  *    its intent file `.compact-<binId>.intent` (atomic temp+rename,
  *    listing the originals). Order per bin: intent → DSv2 write into a
  *    dot-prefixed staging dir → rename data+sidecars to the final name
  *    → delete originals → delete intent. `compact()` begins by
  *    RECOVERING any intent left by a crash: published output ⇒ finish
  *    the deletes; no output ⇒ drop the staging dir (originals intact).
  *    Readers never see a torn state — staging is dot-prefixed
  *    (listings skip it) and the publish rename is atomic.
  *  - Singleton bins are NOT rewritten (rewriting one small file buys
  *    nothing). Repeated passes CONVERGE rather than strictly no-op: a
  *    pass with no new small files rewrites nothing, but surviving
  *    singletons (and a sub-threshold compact output) will merge with
  *    small files that arrive LATER — deliberate consolidation, or
  *    tiny files would accumulate across passes forever.
  *  - Bins are independent; they are submitted sequentially here for
  *    determinism of the report, but nothing shares state between them.
  *  - NOT for directories serving a LIVE micro-batch readStream: that
  *    reader's checkpointed discovery log pins exact file assignments,
  *    so retiring an already-logged original breaks replay, and the
  *    compacted output would re-arrive as a "new" file (duplicate
  *    delivery). Compact the batch-owned lake, not an open stream's
  *    tail — the same rule Delta/Iceberg enforce via snapshot pinning.
  */
object FrameCompaction {

  /** What a compaction pass did. `candidates` counts sub-threshold
    * files seen; `rewritten` counts files merged away; `binsWritten`
    * counts new files created; `skippedSingletons` counts small files
    * left in place because they had no bin partner; `recovered` counts
    * interrupted bins finished or rolled back before planning.
    */
  case class Report(candidates: Int, binsWritten: Int, rewritten: Int,
      skippedSingletons: Int, recovered: Int = 0)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def deleteAllSidecars(fs: FileSystem, p: Path): Unit = {
    fs.delete(p, false)
    fs.delete(ProtoChunkSource.indexPathFor(p), false)
    fs.delete(ProtoChunkSource.statsPathFor(p), false)
  }

  private def writeSmall(fs: FileSystem, p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty)
  }

  /** Publish the staged bin output: move the one data file written into
    * `staging` (plus its sidecars) onto the deterministic final name.
    */
  private def publish(fs: FileSystem, staging: Path, finalData: Path): Unit = {
    val produced = fs.listStatus(staging)
      .map(_.getPath).find(p => p.getName.endsWith(".frames") && !p.getName.startsWith("."))
      .getOrElse(throw new java.io.IOException(s"no staged output in $staging"))
    if (fs.exists(finalData)) fs.delete(finalData, false) // replay of this phase
    if (!fs.rename(produced, finalData))
      throw new java.io.IOException(s"rename $produced -> $finalData failed")
    // sidecars after data (readers that race see an unsplit, unskippable
    // file — same ordering rule as the writer's own commit)
    Seq(ProtoChunkSource.indexPathFor _, ProtoChunkSource.statsPathFor _).foreach { f =>
      val from = f(produced)
      if (fs.exists(from)) {
        val to = f(finalData)
        if (fs.exists(to)) fs.delete(to, false)
        fs.rename(from, to)
      }
    }
  }

  /** Move orphaned staged sidecars next to an already-published data
    * file — the recovery path for a crash INSIDE publish() after its
    * data rename. The staged index recorded the staged file's length,
    * which equals the published file's (same bytes), so it stays valid.
    */
  private def adoptStagedSidecars(fs: FileSystem, staging: Path, finalData: Path): Unit = {
    if (!fs.exists(staging)) return
    fs.listStatus(staging).map(_.getPath).foreach { p =>
      val dest =
        if (p.getName.endsWith(".idx")) Some(ProtoChunkSource.indexPathFor(finalData))
        else if (p.getName.endsWith(".stats")) Some(ProtoChunkSource.statsPathFor(finalData))
        else None
      dest.foreach { to =>
        if (!fs.exists(to)) { fs.rename(p, to); () }
      }
    }
  }

  /** Finish (or roll back) bins whose intent file survived a crash.
    * Published output ⇒ complete the original deletes; nothing
    * published but staging holds the data ⇒ publish then complete;
    * neither ⇒ roll back (drop staging; originals are intact).
    */
  private def recover(spark: SparkSession, dir: String, fs: FileSystem): Int = {
    val d = new Path(dir)
    if (!fs.exists(d)) return 0
    val intents = fs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.startsWith(".compact-") && p.getName.endsWith(".intent"))
    intents.foreach { intent =>
      val binId = intent.getName.stripPrefix(".compact-").stripSuffix(".intent")
      val finalData = new Path(d, s"compact-$binId.frames")
      val staging = new Path(d, s".compact-$binId.staging")
      val staged = fs.exists(staging) &&
        fs.listStatus(staging).exists(s =>
          s.getPath.getName.endsWith(".frames") && !s.getPath.getName.startsWith("."))
      if (fs.exists(finalData) || staged) {
        if (!fs.exists(finalData)) publish(fs, staging, finalData)
        // the data may have published while its SIDECARS did not (a
        // crash inside publish between the data rename and the sidecar
        // renames): adopt any staged sidecars before staging is dropped,
        // or the compacted file is permanently unsplittable/unprunable
        else adoptStagedSidecars(fs, staging, finalData)
        readLines(fs, intent).foreach(n => deleteAllSidecars(fs, new Path(d, n)))
      }
      // else: crashed before any output existed — originals intact,
      // nothing to undo; the bin re-plans naturally on this run
      fs.delete(staging, true)
      fs.delete(intent, false)
    }
    intents.length
  }

  /** Compact `dir` in place. Files smaller than `smallBytes` are
    * candidates; bins aim for `targetBytes` of input per output file
    * (greedy cumulative fill in file-name order — the q_compact_plan
    * math, minus the status partitioning a flat directory doesn't have).
    */
  def compact(spark: SparkSession, dir: String,
      smallBytes: Long = 512L * 1024, targetBytes: Long = 4L * 1024 * 1024): Report = {
    require(smallBytes > 0 && targetBytes >= smallBytes,
      s"need 0 < smallBytes <= targetBytes, got $smallBytes/$targetBytes")
    val conf = spark.sessionState.newHadoopConf()
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val nRecovered = recover(spark, dir, fs)
    val sized = ProtoChunkSource.listFrameFiles(dir, conf)
      .map { case (f, len) => (new Path(f), len) }
    val small = sized.filter(_._2 < smallBytes) // name-sorted already
    // content stamp per candidate: the bin id must change when a
    // retired name is later RE-CREATED with new bytes, or the replay
    // check in publish() would delete the previous compaction output
    // (the only copy of the old rows) believing it replays itself
    val stamp = small.map { case (p, len) =>
      p -> s"${p.getName}:$len:${fs.getFileStatus(p).getModificationTime}"
    }.toMap
    // greedy cumulative binning: bin = floor(cumulative-size-before / target)
    var cum = 0L
    val binned = small.map { case (p, len) =>
      val bin = cum / targetBytes
      cum += len
      (bin, p)
    }.groupBy(_._1).values.map(_.map(_._2)).toSeq.sortBy(_.head.toString)
    val (multi, singletons) = binned.partition(_.length >= 2)

    val fmt = classOf[ProtoChunkSource].getName
    multi.foreach { bin =>
      val binId = md5hex(bin.map(stamp).sorted.mkString("\n"))
      val intent = new Path(d, s".compact-$binId.intent")
      val staging = new Path(d, s".compact-$binId.staging")
      // 1. intent first: from here on a crash is recoverable
      writeSmall(fs, intent, bin.map(_.getName).mkString("\n"))
      fs.delete(staging, true)
      // 2. bin rows through the DSv2 writer, into dot-prefixed staging
      //    (one writer task → one output file; bin size ≈ target, so
      //    the single task IS the intended output granularity)
      bin.map(p => spark.read.format(fmt).load(p.toString))
        .reduce(_ union _)
        .coalesce(1).write.format(fmt).mode("append").save(staging.toString)
      // 3. publish under the deterministic name, 4. retire originals,
      // 5. clear the intent — exactly the recovery replay order
      publish(fs, staging, new Path(d, s"compact-$binId.frames"))
      bin.foreach(p => deleteAllSidecars(fs, p))
      fs.delete(staging, true)
      fs.delete(intent, false)
    }
    Report(small.length, multi.length, multi.map(_.length).sum,
      singletons.length, nRecovered)
  }
}
