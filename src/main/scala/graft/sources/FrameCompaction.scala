package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction EXECUTOR for proto-frame directories — the job
  * that carries out what `ops.Storage.compactPlan` (q_compact_plan)
  * plans: group sub-threshold frame files into target-size bins and
  * rewrite each bin as ONE file through the DSv2 writer, retiring the
  * originals. (Reference analog: storage nodes re-persist chunk files
  * they reorganize through the same write path that created them —
  * storageNode/StorageNode.java:96-118; there is no second serializer
  * to drift.)
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
  *  - The rewrite reuses the source's transactional task commit (write
  *    temp + rename, sidecars after data); originals are deleted only
  *    AFTER the bin's write job commits. A crash between commit and
  *    delete can leave a bin duplicated — the same window every
  *    log-less compactor has (Delta/Iceberg close it with a metadata
  *    log); callers who need exactly-once fold compaction into their
  *    own commit protocol.
  *  - Singleton bins are NOT rewritten (rewriting one small file buys
  *    nothing), which is what makes a second run a no-op: after a
  *    successful pass every surviving small file sits alone in its bin.
  *  - Bins are independent; they are submitted sequentially here for
  *    determinism of the report, but nothing shares state between them.
  */
object FrameCompaction {

  /** What a compaction pass did. `candidates` counts sub-threshold
    * files seen; `rewritten` counts files merged away; `binsWritten`
    * counts new files created; `skippedSingletons` counts small files
    * left in place because they had no bin partner.
    */
  case class Report(candidates: Int, binsWritten: Int, rewritten: Int,
      skippedSingletons: Int)

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
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val sized = ProtoChunkSource.listFrameFiles(dir, conf).map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      (p, fs.getFileStatus(p).getLen)
    }
    val small = sized.filter(_._2 < smallBytes) // name-sorted already
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
      val rows = bin.map(p => spark.read.format(fmt).load(p.toString))
        .reduce(_ union _)
      // one writer task → one output file per bin (bin size ≈ target,
      // so the single task is the intended output granularity)
      rows.coalesce(1).write.format(fmt).mode("append").save(dir)
      bin.foreach { p => // originals retire only after the bin committed
        fs.delete(p, false)
        fs.delete(ProtoChunkSource.indexPathFor(p), false)
        fs.delete(ProtoChunkSource.statsPathFor(p), false)
      }
    }
    Report(small.length, multi.length, multi.map(_.length).sum,
      singletons.length)
  }
}
