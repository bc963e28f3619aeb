package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration must be metadata-only (VERDICT r19
  * what's-wrong #1): registering the query surface over a COLD corpus
  * previously ensured the IVF index and all six dedup substrates —
  * seven corpus passes before `SELECT * FROM nation` could run. Now
  * the derived-artifact views register only when their artifacts are
  * already published (marker probes), the CALL ensure verbs are the
  * explicit build path, and each CALL refreshes the views so the
  * substrate_stats snapshot can never serve stale counts after an
  * in-session rebuild (ADVICE r19).
  */
class LazyViewsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkDataset(salt: Int, nDocs: Long = 30L): String = {
    import spark.implicits._
    val d = s"/tmp/graft-test-lazyviews-$salt-${java.util.UUID.randomUUID()}"
    (0L until nDocs).map { i =>
      val t = s"doc $i word${(i + salt) % 5} word${(i * 3 + salt) % 11} tail$i end"
      (i, t, "en", s"src${i % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rnd = new scala.util.Random(salt)
    (0 until 300).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1), i % 10))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def label(d: String): String =
    ops.Derived.labelFor(s"$d/documents.parquet")

  private def entriesIn(family: String, d: String): Seq[String] = {
    val fam = new org.apache.hadoop.fs.Path(ops.Derived.familyDir(family))
    if (!fs.exists(fam)) Seq.empty
    else fs.listStatus(fam).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(label(d) + "_"))
  }

  test("cold registration builds nothing; CALL verbs build and refresh the views") {
    val d = mkDataset(1)
    val saved = SqlSurface.registeredFor
    try {
      Seq("ivf_assignments", "ivf_stats", "substrate_stats")
        .foreach(spark.catalog.dropTempView(_))
      SqlSurface.registeredFor = Some((spark, d))

      // cold probes: nothing published yet, and saying so reads only
      // metadata (listings + marker probes)
      assert(!ops.LlmPipeline.substratesReady(spark, d))
      assert(!ops.LlmPipeline.ivfIndexReady(spark, d))
      SqlSurface.registerDerivedViews(spark, d, buildIfAbsent = false)
      assert(!spark.catalog.tableExists("substrate_stats"))
      assert(!spark.catalog.tableExists("ivf_assignments"))
      assert(!spark.catalog.tableExists("ivf_stats"))
      // ZERO corpus passes: no artifact entry appeared for this dataset
      Seq(ops.LlmPipeline.NgramPostingsFamily, ops.LlmPipeline.IvfFamily,
        ops.LlmPipeline.EmbedBucketedFamily).foreach { f =>
        assert(entriesIn(f, d).isEmpty, s"cold registration built a $f artifact")
      }

      // the explicit ingest verb: builds the substrates AND publishes
      // the SQL view in the same CALL
      spark.sql(s"CALL graft.ensure_dedup_substrates('$d')").collect()
      assert(spark.catalog.tableExists("substrate_stats"))
      val rows1 = spark.sql(
        "SELECT family, n_rows FROM substrate_stats ORDER BY family")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows1("ngram_postings") > 0)

      // the ADVICE r19 staleness kill: corpus grows, the verb re-runs,
      // and the SQL spelling must serve the REBUILT counts — the old
      // snapshot view would still show rows1
      import spark.implicits._
      (1000L until 1010L).map { i =>
        val t = s"doc $i fresh tokens appended tail$i end"
        (i, t, "en", "srcX", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(s"$d/documents.parquet")
      spark.sql(s"CALL graft.ensure_dedup_substrates('$d')").collect()
      val rows2 = spark.sql(
        "SELECT family, n_rows FROM substrate_stats ORDER BY family")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows2("ngram_postings") > rows1("ngram_postings"),
        s"substrate_stats view served stale counts after a rebuild: $rows1 vs $rows2")

      // IVF verb publishes its views the same way
      spark.sql(s"CALL graft.ensure_ivf_index('$d')").collect()
      assert(spark.catalog.tableExists("ivf_assignments"))
      assert(spark.catalog.tableExists("ivf_stats"))
      assert(spark.sql("SELECT count(*) FROM ivf_assignments").head.getLong(0) > 0)

      // warm re-registration: artifacts now exist, so the views come
      // back with the surface — still via marker probes, no rebuild
      Seq("ivf_assignments", "ivf_stats", "substrate_stats")
        .foreach(spark.catalog.dropTempView(_))
      assert(ops.LlmPipeline.substratesReady(spark, d))
      assert(ops.LlmPipeline.ivfIndexReady(spark, d))
      SqlSurface.registerDerivedViews(spark, d, buildIfAbsent = false)
      assert(spark.catalog.tableExists("substrate_stats"))
      assert(spark.catalog.tableExists("ivf_assignments"))
    } finally {
      SqlSurface.registeredFor = saved
      Seq("ivf_assignments", "ivf_stats", "substrate_stats")
        .foreach(spark.catalog.dropTempView(_))
    }
  }

  test("a CALL for a DIFFERENT dataset does not clobber the registered surface") {
    // d2 is twice the corpus, so a clobbered view is detectable by count
    val d1 = mkDataset(2); val d2 = mkDataset(3, nDocs = 60L)
    val saved = SqlSurface.registeredFor
    try {
      SqlSurface.registeredFor = Some((spark, d1))
      spark.sql(s"CALL graft.ensure_dedup_substrates('$d1')").collect()
      val mine = spark.sql("SELECT sum(n_rows) FROM substrate_stats").head.getLong(0)
      // maintenance on another corpus in the same session: its CALL
      // must not repoint d1's registered view at d2's artifacts
      spark.sql(s"CALL graft.ensure_dedup_substrates('$d2')").collect()
      assert(spark.sql("SELECT sum(n_rows) FROM substrate_stats")
        .head.getLong(0) == mine,
        "CALL for another dataset repointed the registered substrate_stats view")
    } finally {
      SqlSurface.registeredFor = saved
      spark.catalog.dropTempView("substrate_stats")
    }
  }
}
