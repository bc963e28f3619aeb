package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-maintenance operators (ops/Storage): zone-map soundness,
  * compaction-plan invariants, skew-report arithmetic.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sf0001

  test("zonemap build: one row per file, bounds ordered, counts total") {
    val zm = ops.Storage.zonemapBuild(spark, d).cache()
    val li = Tables.lineitem(spark, d)
    assert(zm.count() == li.select("l_orderkey").distinct().count())
    assert(zm.where(col("min_ship") > col("max_ship") ||
      col("min_part") > col("max_part")).isEmpty)
    val total = zm.agg(sum("n_chunks")).head.getLong(0)
    assert(total == li.count())
  }

  test("zonemap prune is sound: never drops a file with a matching chunk") {
    val cand = ops.Storage.zonemapPrune(spark, d)
      .select("file_id")
    val truth = Tables.lineitem(spark, d)
      .where(col("l_shipdate")
        .between(ops.Storage.PruneLo, ops.Storage.PruneHi))
      .select(col("l_orderkey").as("file_id")).distinct()
    // zone maps may over-select (file spans the window without a chunk
    // inside) but must NEVER under-select — truth ∖ candidates = ∅
    assert(truth.except(cand).isEmpty,
      "zone-map pruning dropped a file that contains a matching chunk")
    assert(cand.count() >= truth.count())
  }

  test("compact plan: only small files, bins bounded and contiguous") {
    val plan = ops.Storage.compactPlan(spark, d).cache()
    assert(plan.where(col("size_units") >= ops.Storage.SmallFileUnits).isEmpty)
    // per-(status, bin) size: prefix-sum DIV target ⇒ a bin exceeds the
    // target by at most its last file (the pack_sequences overflow bound)
    val overflow = plan.groupBy("status", "bin")
      .agg(sum("size_units").as("bin_units"), max("size_units").as("max_file"))
      .where(col("bin_units") >= col("max_file") + ops.Storage.CompactTarget)
    assert(overflow.isEmpty, "a compaction bin overflowed by more than one file")
    // bins are contiguous 0..max within each status partition
    val perStatus = plan.groupBy("status")
      .agg(countDistinct("bin").as("n_bins"), max("bin").as("max_bin"))
      .where(col("n_bins") =!= col("max_bin") + 1)
    assert(perStatus.isEmpty, "bin ids are not contiguous from 0")
  }

  test("skew diagnose: exact integer shares, uniform ratio centered at 1e6") {
    val rep = ops.Storage.skewDiagnose(spark, d).cache()
    assert(rep.count() == ops.Storage.SkewTopN)
    val li = Tables.lineitem(spark, d)
    val total = li.count()
    val nKeys = li.select("l_partkey").distinct().count()
    val top = rep.orderBy(col("n_chunks").desc, col("part_key")).head
    // spot-check the arithmetic against direct computation
    val n = top.getLong(top.fieldIndex("n_chunks"))
    assert(top.getLong(top.fieldIndex("share_ppm")) == n * 1000000L / total)
    assert(top.getLong(top.fieldIndex("skew_micros")) == n * nKeys * 1000000L / total)
    // the report is the TOP of the distribution: its heaviest key is ≥
    // uniform (1e6 micros) unless the table itself is tiny/degenerate
    assert(top.getLong(top.fieldIndex("skew_micros")) >= 1000000L)
  }

  test("file bloom index: prune is sound (never drops a true file) and actually prunes") {
    val cand = ops.Storage.fileindexPrune(spark, d)
      .select("file_id").collect().map(_.getLong(0)).toSet
    val truth = Tables.lineitem(spark, d)
      .where(col("l_suppkey") === ops.Storage.ProbeSuppKey)
      .select(col("l_orderkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(cand),
      s"bloom prune dropped true files: ${(truth -- cand).take(5)}")
    val allFiles = Tables.lineitem(spark, d)
      .select("l_orderkey").distinct().count()
    assert(cand.size < allFiles,
      s"index admitted every file (${cand.size} of $allFiles) — no pruning value")
    // index size is bounded: ≤ 2 positions per (file, distinct key)
    val idx = ops.Storage.fileindexBuild(spark, d)
    val bound = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey").distinct().count() * 2
    assert(idx.count() <= bound)
  }

  test("bloom prune answers from the persisted index: no chunk-table scan in the plan") {
    // force the index to exist, then plan the probe
    ops.Storage.ensureBloomIndex(spark, d)
    val probe = ops.Storage.fileindexPrune(spark, d)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"),
      s"prune plan still scans the chunk table:\n$plan")
    assert(plan.contains("graft-bloom-index"),
      "prune plan does not read the persisted index")
    // persisted-index answer ≡ inline-rebuild answer
    val fromIndex = probe.collect().map(_.getLong(0)).toSeq
    val inline = {
      import org.apache.spark.sql.functions.{broadcast => bcast}
      val pExprs = ops.Storage.bloomPoss(s"'${ops.Storage.ProbeSuppKey}'")
      val ppos = spark.range(1).select(
        explode(expr(s"array_distinct(array(${pExprs.mkString(", ")}))")).as("bit_pos"))
      val need = ppos.agg(count(lit(1)).as("n_need"))
      ops.Storage.fileBloomIndex(spark, d)
        .join(bcast(ppos), Seq("bit_pos"))
        .groupBy("file_id").agg(count(lit(1)).as("n_hit"))
        .crossJoin(bcast(need))
        .where(col("n_hit") === col("n_need"))
        .select("file_id").orderBy("file_id")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(fromIndex == inline, "persisted index diverges from inline rebuild")
  }

  test("bloom index append lifecycle: delta-only scan, extended ≡ full rebuild (VERDICT r15 #4)") {
    import spark.implicits._
    def liRows(ids: Range, suppOff: Long) =
      ids.map(i => (i.toLong, 100L + (i % 7) + suppOff))
        .toDF("l_orderkey", "l_suppkey")
    val dir = s"/tmp/graft-test-bloomappend-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    // day 0: initial partition -> full build
    liRows(0 until 40, 0L).coalesce(1).write.parquet(table)
    val idx1 = ops.Storage.ensureBloomIndex(spark, dir)
    val rows1 = spark.read.parquet(idx1)
      .as[(Long, Long)].collect().toSet
    // day 1: the ingest job APPENDS a partition (new part files only)
    liRows(40 until 60, 3L).coalesce(1).write.mode("append").parquet(table)
    // corrupt the ORIGINAL part file in place (same length, mtime
    // restored) — the only-delta-read proof: if the extend scanned any
    // covered file it would die on the parquet footer; a full rebuild
    // here CANNOT succeed
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPart = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .minBy(_.getModificationTime)
    val (pLen, pMtime) = (oldPart.getLen, oldPart.getModificationTime)
    val out = fs.create(oldPart.getPath, true)
    try out.write(new Array[Byte](pLen.toInt)) finally out.close()
    fs.setTimes(oldPart.getPath, pMtime, -1)
    assert(fs.getFileStatus(oldPart.getPath).getLen == pLen &&
      fs.getFileStatus(oldPart.getPath).getModificationTime == pMtime,
      "corruption changed the manifest identity; the witness is void")
    val idx2 = ops.Storage.ensureBloomIndex(spark, dir)
    assert(idx2 != idx1, "append did not produce a new artifact")
    val rows2 = spark.read.parquet(idx2).as[(Long, Long)].collect().toSet
    // extended index ≡ full rebuild over the same logical rows — the
    // original dir is corrupted by design, so the witness rebuild runs
    // over a MIRROR with identical content (the projection is per-row:
    // identical rows => identical index set, file layout irrelevant)
    val mirror = s"/tmp/graft-test-bloommirror-${java.util.UUID.randomUUID()}"
    (liRows(0 until 40, 0L) unionByName liRows(40 until 60, 3L))
      .write.parquet(s"$mirror/lineitem.parquet")
    val full = spark.read.parquet(ops.Storage.ensureBloomIndex(spark, mirror))
      .as[(Long, Long)].collect().toSet
    assert(rows2 == full,
      s"extended != rebuilt: only-ext=${(rows2 -- full).take(3)} only-full=${(full -- rows2).take(3)}")
    assert(rows1.subsetOf(rows2), "append lost covered index rows")
    // a MODIFIED file (same path, new mtime) is not an append: the
    // subset test must fail and the build fall back to the full path —
    // which now (correctly) dies on the corrupted bytes
    fs.setTimes(oldPart.getPath, pMtime + 12345L, -1)
    intercept[Exception] {
      ops.Storage.ensureBloomIndex(spark, dir)
    }
  }

  test("zone map append lifecycle: delta-only scan, merged stats ≡ full rebuild (VERDICT r15 #4)") {
    import spark.implicits._
    // file_id 0..9; day-1 delta REVISITS file_ids 5..9 so the merge path
    // (sum counts, min/max of mins/maxes, summed size) is exercised, not
    // just the disjoint-append case
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmappend-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    liRows(0L until 10L, 0).coalesce(1).write.parquet(table)
    val idx1 = ops.Storage.ensureZoneMap(spark, dir)
    liRows(5L until 15L, 1).coalesce(1).write.mode("append").parquet(table)
    // corrupt the ORIGINAL part file in place (manifest identity kept):
    // the extend must succeed reading only the delta file
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPart = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .minBy(_.getModificationTime)
    val (pLen, pMtime) = (oldPart.getLen, oldPart.getModificationTime)
    val out = fs.create(oldPart.getPath, true)
    try out.write(new Array[Byte](pLen.toInt)) finally out.close()
    fs.setTimes(oldPart.getPath, pMtime, -1)
    val idx2 = ops.Storage.ensureZoneMap(spark, dir)
    assert(idx2 != idx1, "append did not produce a new artifact")
    // the artifact stores per-(part file, file_id) PARTIALS; the public
    // per-file rows fold through zonemapMerge — canon over that shape
    def canon(df: org.apache.spark.sql.DataFrame) =
      ops.Storage.zonemapMerge(df)
        .selectExpr("file_id", "n_chunks", "CAST(min_ship AS STRING)",
          "CAST(max_ship AS STRING)", "min_part", "max_part", "size_units")
        .collect().map(_.toSeq).toSet
    val merged = canon(spark.read.parquet(idx2))
    // full-rebuild witness over a MIRROR with identical logical rows
    val mirror = s"/tmp/graft-test-zmmirror-${java.util.UUID.randomUUID()}"
    (liRows(0L until 10L, 0) unionByName liRows(5L until 15L, 1))
      .write.parquet(s"$mirror/lineitem.parquet")
    val full = canon(spark.read.parquet(ops.Storage.ensureZoneMap(spark, mirror)))
    assert(merged == full,
      s"merged != rebuilt: only-merged=${(merged -- full).take(2)} only-full=${(full -- merged).take(2)}")
    // the revisited file_ids really did merge across part files
    val f5 = ops.Storage.zonemapMerge(spark.read.parquet(idx2))
      .where(col("file_id") === 5L).collect().head
    assert(f5.getAs[Long]("n_chunks") == 6L, s"file 5 should hold 3+3 chunks: $f5")
  }

  test("zone map removal lifecycle: a dropped part file subtracts without reading a corpus byte (VERDICT r16 #3)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmremove-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    liRows(0L until 10L, 0).coalesce(1).write.parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val day0Part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    // day-1 file shares file_ids 5..9 with day 0, so the subtraction
    // must RESTORE merged stats, not just drop whole file_ids
    liRows(5L until 15L, 1).coalesce(1).write.mode("append").parquet(table)
    val idx1 = ops.Storage.ensureZoneMap(spark, dir)
    // the retention job removes the day-1 partition...
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .filterNot(_.getPath == day0Part)
      .foreach(st => fs.delete(st.getPath, false))
    // ...and the SURVIVING file is corrupted in place (manifest identity
    // kept): the removal extend must succeed anyway — it never reads data
    val (pLen, pMtime) = {
      val st = fs.getFileStatus(day0Part); (st.getLen, st.getModificationTime)
    }
    val out = fs.create(day0Part, true)
    try out.write(new Array[Byte](pLen.toInt)) finally out.close()
    fs.setTimes(day0Part, pMtime, -1)
    val idx2 = ops.Storage.ensureZoneMap(spark, dir)
    assert(idx2 != idx1, "removal did not produce a new artifact")
    def canon(df: org.apache.spark.sql.DataFrame) =
      ops.Storage.zonemapMerge(df)
        .selectExpr("file_id", "n_chunks", "CAST(min_ship AS STRING)",
          "CAST(max_ship AS STRING)", "min_part", "max_part", "size_units")
        .collect().map(_.toSeq).toSet
    // removal-extend ≡ rebuild over only the surviving rows (mirror:
    // the original is corrupted by design)
    val mirror = s"/tmp/graft-test-zmremmirror-${java.util.UUID.randomUUID()}"
    liRows(0L until 10L, 0).write.parquet(s"$mirror/lineitem.parquet")
    val want = canon(spark.read.parquet(ops.Storage.ensureZoneMap(spark, mirror)))
    assert(canon(spark.read.parquet(idx2)) == want,
      "removal-extend != rebuild over survivors")
  }

  test("bloom index removal refuses the subtraction (bits OR in, never out) and rebuilds") {
    import spark.implicits._
    def liRows(ids: Range, suppOff: Long) =
      ids.map(i => (i.toLong, 100L + (i % 7) + suppOff))
        .toDF("l_orderkey", "l_suppkey")
    val dir = s"/tmp/graft-test-bloomremove-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    liRows(0 until 40, 0L).coalesce(1).write.parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val firstPart = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    liRows(40 until 60, 3L).coalesce(1).write.mode("append").parquet(table)
    ops.Storage.ensureBloomIndex(spark, dir)
    // remove the second file; the bloom lifecycle must take the FULL
    // REBUILD path (subtraction is unsound) — witnessed by correctness:
    // the new artifact equals a fresh build over the survivor only
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .filterNot(_.getPath == firstPart)
      .foreach(st => fs.delete(st.getPath, false))
    val got = spark.read.parquet(ops.Storage.ensureBloomIndex(spark, dir))
      .as[(Long, Long)].collect().toSet
    val mirror = s"/tmp/graft-test-bloomremmirror-${java.util.UUID.randomUUID()}"
    liRows(0 until 40, 0L).write.parquet(s"$mirror/lineitem.parquet")
    val want = spark.read.parquet(ops.Storage.ensureBloomIndex(spark, mirror))
      .as[(Long, Long)].collect().toSet
    assert(got == want, "bloom removal must equal a rebuild over survivors")
    // a subtraction would have kept this superset relation even under
    // corruption; the rebuild path is additionally witnessed by the
    // corruption probe: corrupt the survivor, change the manifest, and
    // the ensure must now FAIL (it really reads the corpus)
    val (pLen, pMtime) = {
      val st = fs.getFileStatus(firstPart); (st.getLen, st.getModificationTime)
    }
    val out = fs.create(firstPart, true)
    try out.write(new Array[Byte](pLen.toInt)) finally out.close()
    fs.setTimes(firstPart, pMtime + 777L, -1)
    intercept[Exception] { ops.Storage.ensureBloomIndex(spark, dir) }
  }

  test("manifest snapshot discipline: a file landing after the listing merges ONCE, never twice (ADVICE r16 TOCTOU)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-toctou-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    liRows(0L until 10L, 0).coalesce(1).write.parquet(table)
    // the race, replayed deterministically: the listing is pinned, THEN
    // a concurrent ingest appends a part file, THEN the build runs
    val pinned = ops.Storage.manifestLines(spark, table)
    liRows(10L until 20L, 1).coalesce(1).write.mode("append").parquet(table)
    val idxStale = ops.Storage.ensureZoneMapWithLines(spark, dir, pinned)
    // artifact content derives from the PINNED snapshot, not the live
    // dir: the racing file's rows are absent (pre-fix they were baked in
    // while the manifest denied them)
    val staleIds = spark.read.parquet(idxStale)
      .select("file_id").as[Long].collect().toSet
    assert(staleIds == (0L until 10L).toSet,
      s"stale build leaked the racing file's rows: $staleIds")
    // the next ensure sees the racing file as a pure-append delta and
    // merges it exactly once: extended ≡ full rebuild (pre-fix the
    // already-baked rows double-counted n_chunks/size_units here)
    val idx2 = ops.Storage.ensureZoneMap(spark, dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      ops.Storage.zonemapMerge(df)
        .selectExpr("file_id", "n_chunks", "CAST(min_ship AS STRING)",
          "CAST(max_ship AS STRING)", "min_part", "max_part", "size_units")
        .collect().map(_.toSeq).toSet
    val mirror = s"/tmp/graft-test-toctoumirror-${java.util.UUID.randomUUID()}"
    (liRows(0L until 10L, 0) unionByName liRows(10L until 20L, 1))
      .write.parquet(s"$mirror/lineitem.parquet")
    val full = canon(spark.read.parquet(ops.Storage.ensureZoneMap(spark, mirror)))
    assert(canon(spark.read.parquet(idx2)) == full,
      "racing file merged twice (or lost) across the stale build + extend")
  }

  test("manifest excludes files under hidden directories (ADVICE r16: crashed-append _temporary)") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-hiddenmanifest-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    Seq((1L, 2L)).toDF("l_orderkey", "l_suppkey").coalesce(1).write.parquet(table)
    // a crashed append's leftover: clean-named part file under _temporary
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ghost = new org.apache.hadoop.fs.Path(
      s"$table/_temporary/0/part-00000-ghost.parquet")
    val out = fs.create(ghost)
    try out.write("not parquet".getBytes("UTF-8")) finally out.close()
    val lines = ops.Storage.manifestLines(spark, table)
    assert(lines.nonEmpty && lines.forall(!_.contains("_temporary")),
      s"manifest claims coverage of rows a parquet scan never reads: $lines")
    // and the set matches what a parquet scan actually reads
    assert(lines.size == fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")))
  }

  test("mixed manifest tick: one artifact evolve handles retention drop + ingest append together") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmmixed-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    liRows(0L until 10L, 0).coalesce(1).write.parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val day0Part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    liRows(5L until 15L, 1).coalesce(1).write.mode("append").parquet(table)
    ops.Storage.ensureZoneMap(spark, dir)
    // the daily tick: retention DROPS day 0 while ingest APPENDS day 2
    fs.delete(day0Part, false)
    liRows(12L until 20L, 2).coalesce(1).write.mode("append").parquet(table)
    // corrupt the covered day-1 file in place: the evolve must succeed
    // reading only the day-2 delta (day 0 is subtracted, day 1 kept)
    val day1Part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .minBy(_.getModificationTime)
    val (pLen, pMtime) = (day1Part.getLen, day1Part.getModificationTime)
    val out = fs.create(day1Part.getPath, true)
    try out.write(new Array[Byte](pLen.toInt)) finally out.close()
    fs.setTimes(day1Part.getPath, pMtime, -1)
    val idx = ops.Storage.ensureZoneMap(spark, dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      ops.Storage.zonemapMerge(df)
        .selectExpr("file_id", "n_chunks", "CAST(min_ship AS STRING)",
          "CAST(max_ship AS STRING)", "min_part", "max_part", "size_units")
        .collect().map(_.toSeq).toSet
    val mirror = s"/tmp/graft-test-zmmixedmirror-${java.util.UUID.randomUUID()}"
    (liRows(5L until 15L, 1) unionByName liRows(12L until 20L, 2))
      .write.parquet(s"$mirror/lineitem.parquet")
    val want = canon(spark.read.parquet(ops.Storage.ensureZoneMap(spark, mirror)))
    assert(canon(spark.read.parquet(idx)) == want,
      "mixed evolve != rebuild over (kept + appended) rows")
  }

  test("bestOverlapBase skips in-flight .build- staging dirs (ADVICE r16)") {
    val src = s"/tmp/graft-test-buildskip-${java.util.UUID.randomUUID()}/lineitem.parquet"
    val fam = ops.Derived.familyDir(ops.Storage.ZonemapFamily)
    val label = ops.Derived.labelFor(src)
    val fs = new org.apache.hadoop.fs.Path(fam)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a racing JVM's staging dir: marker + _MANIFEST already written,
    // publish rename not yet done — covers a strict subset, so pre-fix
    // it would be SELECTED as the extend base and then vanish
    val staging = new org.apache.hadoop.fs.Path(s"$fam/${label}_mdeadbeef.build-abc123")
    fs.mkdirs(staging)
    try {
      val m = fs.create(new org.apache.hadoop.fs.Path(staging, "_MANIFEST"))
      try m.write("1\t1\tfileA\n".getBytes("UTF-8")) finally m.close()
      val s2 = fs.create(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
      try s2.write(Array.empty[Byte]) finally s2.close()
      val got = ops.Storage.bestOverlapBase(spark, ops.Storage.ZonemapFamily,
        src, Seq("1\t1\tfileA", "2\t2\tfileB"))
      assert(!got.exists(_._1.contains(".build-")),
        s"selected an in-flight staging dir as the extend base: $got")
    } finally fs.delete(staging, true)
  }

  test("src normalization survives URI-escapable table paths (ADVICE r17: removal in a dir with a space)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    // the dataset dir carries a space AND a literal '+': Path.toString
    // keeps both plain, input_file_name() percent-encodes the space —
    // pre-fix the two src keys never matched, so the removal anti-join
    // silently subtracted NOTHING
    val dir = s"/tmp/graft-test-urlenc-${java.util.UUID.randomUUID()}/with space+plus"
    val table = s"$dir/lineitem.parquet"
    liRows(0L until 10L, 0).coalesce(1).write.parquet(table)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the two sides of the key agree on this path
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-")).head.getPath
    val colSide = spark.read.parquet(table)
      .select(ops.Storage.normSrcCol(input_file_name()).as("src"))
      .distinct().as[String].collect().toSet
    assert(colSide == Set(ops.Storage.normSrcStr(part.toString)),
      s"normSrcCol/normSrcStr disagree on an escapable path: $colSide vs ${part.toString}")
    // end-to-end: the removal leg really subtracts in such a dir
    val day0Part = part
    liRows(5L until 15L, 1).coalesce(1).write.mode("append").parquet(table)
    ops.Storage.ensureZoneMap(spark, dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .filterNot(_.getPath == day0Part)
      .foreach(st => fs.delete(st.getPath, false))
    val idx = ops.Storage.ensureZoneMap(spark, dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      ops.Storage.zonemapMerge(df)
        .selectExpr("file_id", "n_chunks", "CAST(min_ship AS STRING)",
          "CAST(max_ship AS STRING)", "min_part", "max_part", "size_units")
        .collect().map(_.toSeq).toSet
    val mirror = s"/tmp/graft-test-urlencmirror-${java.util.UUID.randomUUID()}"
    liRows(0L until 10L, 0).write.parquet(s"$mirror/lineitem.parquet")
    val want = canon(spark.read.parquet(ops.Storage.ensureZoneMap(spark, mirror)))
    assert(canon(spark.read.parquet(idx)) == want,
      "removal in an escapable-path dir left the dropped file's rows behind")
  }

  test("pre-decode-vintage base (encoded src) declines removal evolve: full rebuild, correct result (ADVICE r18)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.map(f => (f, 100L + f % 7, 200L + (f + dayOff) % 11, 1L,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-11 00:00:00"), 1.0))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    // the detector itself: encoded values flag, decoded values pass
    assert(ops.Storage.srcPreDecodeVintage(
      Seq("/tmp/with%20space/part-0").toDF("src")))
    assert(!ops.Storage.srcPreDecodeVintage(
      Seq("/tmp/with space/part-0").toDF("src")))
    // end-to-end in an escapable dir: doctor the published artifact
    // back to the pre-r18 vintage (src stored ENCODED), then hand it a
    // removal tick — the old code's anti-join would subtract nothing
    val dir = s"/tmp/graft-test-vintage-${java.util.UUID.randomUUID()}/with space"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
    val day0Part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
    val base = ops.Storage.ensureZoneMap(spark, dir)
    // rewrite the artifact's src column to the encoded form, keeping
    // _MANIFEST/_SUCCESS so it stays a selectable evolve base; drop
    // the _SRCV2 format marker too — a genuine pre-decode artifact
    // predates it (marker present would rightly skip the probe)
    val doctored = spark.read.parquet(base)
      .withColumn("src", regexp_replace(col("src"), " ", "%20"))
    val stage = s"/tmp/graft-test-vintage-stage-${java.util.UUID.randomUUID()}"
    doctored.write.parquet(stage)
    fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.delete(new org.apache.hadoop.fs.Path(base,
      ops.Storage.SrcFormatMarker), false)
    fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(base, st.getPath.getName)))
    // retention drops the day-1 file → removal tick against the
    // doctored base must DECLINE and full-rebuild from survivors
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .filterNot(_.getPath == day0Part)
      .foreach(st => fs.delete(st.getPath, false))
    val idx = ops.Storage.ensureZoneMap(spark, dir)
    val got = ops.Storage.zonemapMerge(spark.read.parquet(idx))
      .agg(sum("n_chunks")).head.getLong(0)
    assert(got == 6L,
      s"old-vintage base must decline and rebuild: expected day-0's 6 chunks, got $got")
  }

  test("add-only evolve from an untrusted base does not launder the _SRCV2 marker (ADVICE r19)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.map(f => (f, 100L + f % 7, 200L + (f + dayOff) % 11, 1L,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-11 00:00:00"), 1.0))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-launder-${java.util.UUID.randomUUID()}/with space"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
    val day0Part = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    val base = ops.Storage.ensureZoneMap(spark, dir)
    // doctor the base to the pre-decode vintage: src ENCODED, no marker
    val doctored = spark.read.parquet(base)
      .withColumn("src", regexp_replace(col("src"), " ", "%20"))
    val stage = s"/tmp/graft-test-launder-stage-${java.util.UUID.randomUUID()}"
    doctored.write.parquet(stage)
    fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.delete(new org.apache.hadoop.fs.Path(base,
      ops.Storage.SrcFormatMarker), false)
    fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(base, st.getPath.getName)))
    // ADD-ONLY tick: the evolve copies the doctored rows verbatim, so
    // the published artifact must NOT carry the trust marker it never
    // verified — stamping here would make the encoded rows permanently
    // "trusted" and a later removal would silently subtract nothing
    liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
    val evolved = ops.Storage.ensureZoneMap(spark, dir)
    assert(evolved != base)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(evolved,
      ops.Storage.SrcFormatMarker)),
      "add-only evolve from a marker-less pre-decode base stamped _SRCV2")
    // the removal tick the gate exists for: retention drops day-0; the
    // marker-less evolved base must re-probe, decline, and full-rebuild
    // from the surviving day-1 file — a laundered marker would instead
    // keep all 12 chunks (anti-join against encoded src removes nothing)
    fs.delete(day0Part, false)
    val idx = ops.Storage.ensureZoneMap(spark, dir)
    val got = ops.Storage.zonemapMerge(spark.read.parquet(idx))
      .agg(sum("n_chunks")).head.getLong(0)
    assert(got == 6L,
      s"untrusted evolved base must decline removal: expected day-1's 6 chunks, got $got")
  }

  test("literal-%XX dataset with the format marker keeps the removal fast path") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.map(f => (f, 100L + f % 7, 200L + (f + dayOff) % 11, 1L,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-11 00:00:00"), 1.0))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    // the dir name CONTAINS a literal %20: the decoded src values keep
    // it, so the content probe alone would flag this NEW artifact as
    // pre-decode vintage on EVERY removal tick — permanent full
    // rebuilds. The _SRCV2 marker written at build time must keep the
    // evolve fast path instead.
    val dir = s"/tmp/graft-test-litpct-${java.util.UUID.randomUUID()}/with%20literal"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
    val day0 = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .head.getPath
    liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
    val base = ops.Storage.ensureZoneMap(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(base,
      ops.Storage.SrcFormatMarker)), "new artifacts carry the format marker")
    // retention drops day-1; the SURVIVOR goes corrupt in place, so a
    // full rebuild would die on its footer — only the artifact-evolve
    // fast path can answer
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .filterNot(_.getPath == day0)
      .foreach(st => fs.delete(st.getPath, false))
    val st0 = fs.getFileStatus(day0)
    val (len, mtime) = (st0.getLen, st0.getModificationTime)
    val out = fs.create(day0, true)
    try out.write(new Array[Byte](len.toInt)) finally out.close()
    fs.setTimes(day0, mtime, -1)
    val idx = ops.Storage.ensureZoneMap(spark, dir)
    val got = ops.Storage.zonemapMerge(spark.read.parquet(idx))
      .agg(sum("n_chunks")).head.getLong(0)
    assert(got == 6L,
      s"marker-trusted evolve must subtract day-1 without a corpus read: $got")
  }

  test("generation GC: a three-tick sequence keeps current + N, retires the rest (VERDICT r17 missing #1)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.flatMap(f => (0 until 3).map(c =>
        (f, 100L + f % 7, 200L + (f * 3 + c + dayOff) % 11, c.toLong + 1,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-1${c}%d 00:00:00"),
          (f % 50 + c).toDouble)))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmgc-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // three ticks: initial build + two appends = three generations.
    // generationTtlMs=0 lifts the in-flight-reader age gate so the
    // count budget is observable in-test (the TTL gate has its own
    // witness below)
    val savedTtl = ops.Derived.generationTtlMs
    ops.Derived.generationTtlMs = 0L
    val cur = try {
      liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
      ops.Storage.ensureZoneMap(spark, dir)
      liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
      ops.Storage.ensureZoneMap(spark, dir)
      liRows(12L until 18L, 2).coalesce(1).write.mode("append").parquet(table)
      ops.Storage.ensureZoneMap(spark, dir)
    } finally ops.Derived.generationTtlMs = savedTtl
    val label = ops.Derived.labelFor(table) + "_"
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(
        ops.Derived.familyDir(ops.Storage.ZonemapFamily)))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(label))
      .map(_.getPath.getName)
    assert(gens.length <= 1 + ops.Derived.keepGenerations,
      s"superseded generations not retired: ${gens.toSeq}")
    assert(gens.contains(new org.apache.hadoop.fs.Path(cur).getName),
      "GC must never touch the just-published generation")
    // the surviving current artifact still answers correctly
    val got = ops.Storage.zonemapMerge(spark.read.parquet(cur))
      .agg(sum("n_chunks")).head.getLong(0)
    assert(got == 18L * 3, s"current artifact wrong after GC: $got chunks")
  }

  test("generation GC: an in-flight reader of a retired generation does not crash the GC") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.map(f => (f, 100L + f % 7, 200L + (f + dayOff) % 11, 1L,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-11 00:00:00"), 1.0))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmgcreader-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
    val gen1 = ops.Storage.ensureZoneMap(spark, dir)
    // the in-flight reader: a part file of generation 1 held OPEN
    val gen1Part = fs.listStatus(new org.apache.hadoop.fs.Path(gen1))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-")).head
    val in = fs.open(gen1Part.getPath)
    val savedTtl = ops.Derived.generationTtlMs
    ops.Derived.generationTtlMs = 0L
    try {
      // two more ticks push generation 1 past the keep budget
      liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
      ops.Storage.ensureZoneMap(spark, dir)
      liRows(12L until 18L, 2).coalesce(1).write.mode("append").parquet(table)
      ops.Storage.ensureZoneMap(spark, dir) // GC retires gen1 — must not throw
      assert(!fs.exists(new org.apache.hadoop.fs.Path(gen1)),
        "generation 1 should be retired after two further ticks")
      // POSIX/HDFS: the ALREADY-OPEN stream keeps reading inode-alive
      // bytes (sequential read — a positioned read would re-open by
      // path through ChecksumFileSystem and correctly FNF)
      val buf = new Array[Byte](4)
      val n = in.read(buf)
      assert(n == 4 && buf.sameElements("PAR1".getBytes("US-ASCII")),
        "in-flight reader lost its bytes mid-GC")
    } finally { ops.Derived.generationTtlMs = savedTtl; in.close() }
  }

  test("generation GC TTL gate: a young superseded generation survives until aged (ADVICE r18)") {
    import spark.implicits._
    def liRows(ids: Seq[Long], dayOff: Int) =
      ids.map(f => (f, 100L + f % 7, 200L + (f + dayOff) % 11, 1L,
          java.sql.Timestamp.valueOf(f"1995-0${1 + dayOff}%d-11 00:00:00"), 1.0))
        .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
          "l_shipdate", "l_quantity")
    val dir = s"/tmp/graft-test-zmgcttl-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // three rapid ticks with the PRODUCTION TTL: all three generations
    // young, so even the one past the keep budget must survive — a
    // slow query that planned over it but hasn't launched tasks yet
    // would otherwise FileNotFound after two rapid publishes
    liRows(0L until 6L, 0).coalesce(1).write.parquet(table)
    val gen1 = ops.Storage.ensureZoneMap(spark, dir)
    liRows(6L until 12L, 1).coalesce(1).write.mode("append").parquet(table)
    ops.Storage.ensureZoneMap(spark, dir)
    liRows(12L until 18L, 2).coalesce(1).write.mode("append").parquet(table)
    val cur = ops.Storage.ensureZoneMap(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen1)),
      "a young generation past the keep budget must NOT be deleted")
    // age it past the TTL and re-run the GC pass: now it retires
    fs.setTimes(new org.apache.hadoop.fs.Path(gen1),
      System.currentTimeMillis() - ops.Derived.generationTtlMs - 60000, -1)
    ops.Derived.retireSuperseded(spark, ops.Storage.ZonemapFamily,
      table, cur)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(gen1)),
      "an aged generation past the keep budget retires")
    assert(fs.exists(new org.apache.hadoop.fs.Path(cur)))
  }

  test("legacy-label and retired-family artifacts reclaim once TTL-aged") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-legacygc-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    Seq((1L, 2L, 3L, 1L,
        java.sql.Timestamp.valueOf("1995-01-11 00:00:00"), 1.0))
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
        "l_shipdate", "l_quantity")
      .coalesce(1).write.parquet(table)
    val cur = ops.Storage.ensureZoneMap(spark, dir)
    val fam = ops.Derived.familyDir(ops.Storage.ZonemapFamily)
    val fs = new org.apache.hadoop.fs.Path(fam)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a pre-digest (r18-vintage) artifact of THIS dataset: matches no
    // current prefix, so only the legacy sweep can ever reclaim it
    val legacyLabel = "d" + new org.apache.hadoop.fs.Path(table)
      .getParent.toString.replaceAll("[^A-Za-z0-9._-]", "_")
    val aged = new org.apache.hadoop.fs.Path(s"$fam/${legacyLabel}_m01dead")
    val young = new org.apache.hadoop.fs.Path(s"$fam/${legacyLabel}_m02dead")
    fs.mkdirs(aged); fs.mkdirs(young)
    fs.setTimes(aged,
      System.currentTimeMillis() - ops.Derived.orphanTtlMs - 60000, -1)
    try {
      ops.Derived.retireSuperseded(spark, ops.Storage.ZonemapFamily, table, cur)
      assert(!fs.exists(aged), "TTL-aged legacy-label artifact not reclaimed")
      assert(fs.exists(young), "young legacy dir spared (TTL gate)")
      assert(fs.exists(new org.apache.hadoop.fs.Path(cur)))
    } finally { fs.delete(aged, true); fs.delete(young, true) }
    // a RETIRED family (renamed away, e.g. the winnow K bump): the
    // successor's migration sweep reclaims the dataset's entries and
    // the empty family dir itself
    val rfam = s"graft-test-retired-${java.util.UUID.randomUUID().toString.take(8)}"
    val rdir = new org.apache.hadoop.fs.Path(
      s"${ops.Derived.familyDir(rfam)}/${ops.Derived.labelFor(table)}_m03dead")
    fs.mkdirs(rdir)
    fs.setTimes(rdir,
      System.currentTimeMillis() - ops.Derived.orphanTtlMs - 60000, -1)
    ops.Derived.retireRetiredFamily(spark, rfam, table)
    assert(!fs.exists(rdir), "retired-family artifact not reclaimed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(ops.Derived.familyDir(rfam))),
      "emptied retired family dir should be removed")
  }

  test("labelFor disambiguates datasets the sanitizer collapses (ADVICE r18)") {
    val a = ops.Derived.labelFor("/data/a b/lineitem.parquet")
    val b = ops.Derived.labelFor("/data/a_b/lineitem.parquet")
    assert(a != b,
      "'/data/a b' and '/data/a_b' must not share an artifact label — " +
        "one dataset's generation GC could retire the other's live artifact")
    // prefix-disjointness is what retireSuperseded/bestOverlapBase key on
    assert(!a.startsWith(b) && !b.startsWith(a))
  }

  test("bestOverlapBase skips '.old-' trash dirs (ADVICE r17: replace/GC trash window)") {
    val src = s"/tmp/graft-test-oldskip-${java.util.UUID.randomUUID()}/lineitem.parquet"
    val fam = ops.Derived.familyDir(ops.Storage.ZonemapFamily)
    val label = ops.Derived.labelFor(src)
    val fs = new org.apache.hadoop.fs.Path(fam)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed replace/retire's stranded trash: marker + _MANIFEST
    // complete, but the dir is on its way OUT — selecting it as the
    // evolve base races its deletion
    val trash = new org.apache.hadoop.fs.Path(s"$fam/${label}_mdeadbeef.old-abc123")
    fs.mkdirs(trash)
    try {
      val m = fs.create(new org.apache.hadoop.fs.Path(trash, "_MANIFEST"))
      try m.write("1\t1\tfileA\n".getBytes("UTF-8")) finally m.close()
      val s2 = fs.create(new org.apache.hadoop.fs.Path(trash, "_SUCCESS"))
      try s2.write(Array.empty[Byte]) finally s2.close()
      val got = ops.Storage.bestOverlapBase(spark, ops.Storage.ZonemapFamily,
        src, Seq("1\t1\tfileA", "2\t2\tfileB"))
      assert(!got.exists(_._1.contains(".old-")),
        s"selected a trash dir as the extend base: $got")
    } finally fs.delete(trash, true)
  }

  test("generation GC sweeps TTL-aged orphan staging dirs, spares young ones") {
    import spark.implicits._
    val dir = s"/tmp/graft-test-zmorphan-${java.util.UUID.randomUUID()}"
    val table = s"$dir/lineitem.parquet"
    Seq((1L, 2L, 3L, 1L,
        java.sql.Timestamp.valueOf("1995-01-11 00:00:00"), 1.0))
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_linenumber",
        "l_shipdate", "l_quantity")
      .coalesce(1).write.parquet(table)
    val fam = ops.Derived.familyDir(ops.Storage.ZonemapFamily)
    val label = ops.Derived.labelFor(table)
    val fs = new org.apache.hadoop.fs.Path(fam)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aged = new org.apache.hadoop.fs.Path(s"$fam/${label}_mcafe01.build-dead01")
    val young = new org.apache.hadoop.fs.Path(s"$fam/${label}_mcafe02.build-dead02")
    fs.mkdirs(aged); fs.mkdirs(young)
    fs.setTimes(aged, System.currentTimeMillis() - ops.Derived.orphanTtlMs - 60000, -1)
    try {
      ops.Storage.ensureZoneMap(spark, dir) // fresh build triggers the sweep
      assert(!fs.exists(aged), "TTL-aged orphan staging dir not swept")
      assert(fs.exists(young), "young staging dir must be spared (may be in-flight)")
    } finally { fs.delete(aged, true); fs.delete(young, true) }
  }

  test("z-order interleave: known bit patterns; layout boxes beat 1-D order on a 2-D probe") {
    // zExpr(3, 5): a=0b11 → even bits 1+4; b=0b101 → odd bits 2+32 ⇒ 39
    val z35 = spark.sql(
      s"SELECT ${ops.Storage.zExpr("3", "5", "DIV")} AS z").head().getLong(0)
    assert(z35 == 39L)
    val zMaxed = spark.sql(
      s"SELECT ${ops.Storage.zExpr("65535", "65535", "DIV")} AS z").head().getLong(0)
    assert(zMaxed == (1L << 32) - 1, "full-range keys must fill the 32-bit z domain")

    // pruning benefit: a rectangle probe over (part, supp) intersects
    // strictly fewer z-layout boxes than natural-order (orderkey) boxes
    val zBoxes = ops.Storage.zorderLayout(spark, d)
      .select("min_part", "max_part", "min_supp", "max_supp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val li = Tables.lineitem(spark, d)
    val Array(pmin, pmax, smin, smax) = li
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // natural layout: same number of files, contiguous orderkey ranges
    val natBoxes = li
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_orderkey") % ops.Storage.ZNFiles).as("file_id"))
      .groupBy("file_id")
      .agg(min("l_partkey").as("a"), max("l_partkey").as("b"),
        min("l_suppkey").as("c"), max("l_suppkey").as("d"))
      .select("a", "b", "c", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // probe: the central ~10% x 10% rectangle of the key space
    val (pLo, pHi) = (pmin + (pmax - pmin) * 45 / 100, pmin + (pmax - pmin) * 55 / 100)
    val (sLo, sHi) = (smin + (smax - smin) * 45 / 100, smin + (smax - smin) * 55 / 100)
    def hits(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (a, b, c, dd) => b >= pLo && a <= pHi && dd >= sLo && c <= sHi }
    assert(hits(zBoxes) < hits(natBoxes),
      s"z-order ${hits(zBoxes)}/${zBoxes.length} boxes vs natural " +
        s"${hits(natBoxes)}/${natBoxes.length} — no pruning advantage")
  }
}
