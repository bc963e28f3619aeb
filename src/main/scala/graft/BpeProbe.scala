package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time depth-K BPE training (ops.LlmPipeline.bpeTrainDeep)
  * at a given dataset dir across merge depths and pin cadences — the
  * instrument behind BENCHNOTES' deep-BPE timing tables (VERDICT r14
  * #2 / r15 #8: the chained pinned-plan pattern measured past toy
  * depth).
  *
  * Usage: runMain graft.BpeProbe [sfDir|gen:<words>] [K,K,...] [pinEvery,...]
  *
  * - `gen:<n>` generates an n-distinct-word high-entropy corpus under
  *   /tmp (12-char words over a 26-letter alphabet, Zipf-ish weights):
  *   the fixture corpora carry tiny synthetic vocabularies (sf0.1: 30
  *   distinct words) that fully merge long before a production K, so
  *   a K≥1024 curve needs pair mass that does not exhaust.
  * - GRAFT_BPE_WITNESS=<m>: after each run, re-train driver-side with
  *   an independent plain-Scala BPE over the SAME word-frequency table
  *   and compare merges at every m-th index (plus first/last) —
  *   the LlmPipelineSpec K=64 pin extended to probe depth.
  */
object BpeProbe {

  /** Independent plain-Scala reference BPE (the LlmPipelineSpec witness
    * algorithm, self-contained): weighted adjacent-pair counts,
    * (n desc, lhs, rhs) winner, greedy leftmost-nonoverlapping merge.
    */
  private def referenceMerges(words: Seq[(String, Long)], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Map[Vector[String], Long] = words
      .map { case (w, n) => w.split("").toVector -> n }
      .groupBy(_._1).map { case (key, xs) => key -> xs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var it = 1
    var go = true
    while (it <= k && go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      state.foreach { case (sy, n) =>
        var i = 0
        while (i + 1 < sy.length) {
          val key = (sy(i), sy(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((lhs, rhs), n) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((it, lhs, rhs, n))
        state = state.toSeq.map { case (sy, wn) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == lhs && sy(i + 1) == rhs) {
              b += lhs + rhs; i += 2
            } else { b += sy(i); i += 1 }
          }
          b.result() -> wn
        }.groupBy(_._1).map { case (key, xs) => key -> xs.map(_._2).sum }
        it += 1
      }
    }
    out.toSeq
  }

  /** High-entropy corpus for depth probing: n distinct 12-char words
    * over a-z (seeded), Zipf-ish repetition, 200 words per doc.
    */
  private def genCorpus(spark: SparkSession, n: Int): String = {
    import spark.implicits._
    val dir = s"/tmp/graft_bpe_gen_$n"
    val marker = new java.io.File(s"$dir/_BUILT")
    if (marker.exists()) return dir
    val rnd = new scala.util.Random(1234)
    val vocab = (0 until n).map(_ =>
      (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until math.max(50, n / 20)).map { di =>
      val text = Seq.fill(200) {
        // Zipf-ish: square the uniform so low ranks repeat often
        val u = rnd.nextDouble()
        vocab(((u * u) * vocab.size).toInt.min(vocab.size - 1))
      }.mkString(" ")
      (di.toLong, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    marker.createNewFile()
    dir
  }

  def main(args: Array[String]): Unit = {
    val ks = args.lift(1).getOrElse("16,64").split(",").map(_.trim.toInt).toSeq
    val pins = args.lift(2).getOrElse("1,8").split(",").map(_.trim.toInt).toSeq
    val witnessEvery = sys.env.get("GRAFT_BPE_WITNESS").map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1") match {
      case g if g.startsWith("gen:") => genCorpus(spark, g.stripPrefix("gen:").toInt)
      case d => d
    }
    for (k <- ks; p <- pins) {
      val t0 = System.nanoTime()
      val got = ops.LlmPipeline.bpeTrainDeep(spark, sfDir, k, pinEvery = p)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] sf=$sfDir K=$k%-5d pinEvery=$p%-3d merges=${got.size}%-5d ${dt}%8.2f s (${dt / got.size.max(1) * 1000}%6.1f ms/merge)")
      if (witnessEvery > 0) {
        // the same substrate word-frequency table the engine trains on;
        // the INDEPENDENT part is the merge loop above
        val words = graft.Tables.documents(spark, sfDir)
          .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .where(length(col("w")) >= 2)
          .where(expr("instr(w, char(1)) = 0 AND instr(w, char(2)) = 0"))
          .groupBy("w").agg(count(lit(1)).as("wn"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val expected = referenceMerges(words, k)
        require(expected.size == got.size,
          s"[bpeprobe] depth mismatch: engine ${got.size} vs reference ${expected.size}")
        val idxs = (got.indices by witnessEvery) ++ Seq(0, got.size - 1)
        val bad = idxs.distinct.sorted.filter(i => got(i) != expected(i))
        require(bad.isEmpty,
          s"[bpeprobe] WITNESS DIVERGENCE at merges ${bad.take(3).map(_ + 1)}: " +
            bad.take(1).map(i => s"engine=${got(i)} reference=${expected(i)}").mkString)
        println(s"[bpeprobe]   witness OK: ${idxs.distinct.size} sampled merges " +
          s"(every $witnessEvery) match the plain-Scala reference")
      }
    }
    spark.stop()
  }
}
