package graft

import org.apache.spark.sql.SparkSession

/** Shared planted-corpus fixture for dedup specs (one per JVM): docs
  * 0..19 are seeded word soup, 100+i duplicates doc i (i < 5) with one
  * token changed, 200 duplicates doc 0 exactly, 201 duplicates doc 0
  * up to CASE (first token capitalized — byte-different, so it must
  * NOT collapse with doc 0 under the raw-text collapse rule) — the
  * same plant LlmPipelineSpec builds, factored for reuse across
  * suites.
  */
object LlmFixtures {
  private var cached: Option[String] = None

  def plantedDir(spark: SparkSession): String = synchronized {
    cached.getOrElse {
      import spark.implicits._
      val rnd = new scala.util.Random(99)
      val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
        "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
        "mike", "november")
      def soup(n: Int): String =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (0 until 20).map(i => (i.toLong, soup(60)))
      val nearDups = (0 until 5).map { i =>
        val toks = base(i)._2.split(' ')
        toks(30) = "zulu"
        (100L + i, toks.mkString(" "))
      }
      val exactDup = Seq((200L, base(0)._2))
      // case variant: same tokens as doc 0 but first token capitalized —
      // equal under lower(trim), different bytes, different shingles
      val caseDup = Seq((201L, base(0)._2.capitalize))
      val dir = s"/tmp/graft-test-planted-shared-${java.util.UUID.randomUUID()}"
      (base ++ nearDups ++ exactDup ++ caseDup)
        .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      cached = Some(dir)
      dir
    }
  }
}
