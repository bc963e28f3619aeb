package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the declarative fallback when a
  * key's row count breaks partition-sized assumptions (the reference's
  * analog: every chunk of a hot file lands on the same FileTable entry,
  * `controller/FileTable.java:14-16`, which a single-JVM map absorbs but
  * a shuffle partition cannot).
  *
  * AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin.*`)
  * handles sort-merge joins transparently and is the first choice; use
  * explicit salting when (a) the skewed side feeds an operator AQE does
  * not split (e.g. a bucket-local pair generator like the LSH dedups),
  * or (b) the plan must be stable/explainable offline. Algebraic
  * aggregations (sum/count/min/max) do NOT need salting — Spark's
  * map-side partial aggregation already collapses hot keys before the
  * shuffle; salting pays off for holistic state (collect_list, exact
  * distinct) and for joins.
  */
object Skew {

  /** Equi join `fact ⋈ dim` on `key`, with the fact side's hot keys
    * spread over `nSalts` shuffle partitions: each fact row gets a salt
    * from a hash of its row content (which salt a row gets is
    * irrelevant — only the spread matters), and the dim side is
    * replicated once per salt so every (key, salt) pair still meets its
    * match. Cost: dim shuffle volume × nSalts — the standard trade; size
    * nSalts ≈ hot-key rows / target partition rows.
    *
    * LIMITATION (content-hash salting): rows that are fully identical
    * across every hashable column share a salt and therefore still
    * clump on one partition — in the degenerate corpus where the hot
    * key's rows are verbatim duplicates, salting does not spread them
    * (collapse duplicates first, the q_dedup_exact stage, or add a
    * distinguishing column before joining). Chosen anyway because the
    * alternative, monotonically_increasing_id, is retry-UNSTABLE: a
    * re-executed map stage re-salts rows already fetched by other
    * reducers, duplicating or dropping fact rows exactly in the failure
    * scenario salting exists for.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int): DataFrame = {
    // an nSalts of 0 would explode(array()) the dim side into NOTHING —
    // a silent empty result rather than a loud sizing bug
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    // withColumn silently REPLACES an existing column of the same name —
    // a user `_salt` column would be corrupted in the output (drop
    // removes it) or make the join key ambiguous, so refuse loudly
    val clash = (fact.columns ++ dim.columns).find(_ == SaltCol)
    require(clash.isEmpty,
      s"input already has a '$SaltCol' column — rename it before saltedJoin")
    // salt from ROW CONTENT, never monotonically_increasing_id: mid is
    // partition/attempt-dependent, so a map-stage re-execution after a
    // shuffle-fetch failure re-salts rows already fetched by other
    // reducers — duplicating or dropping fact rows exactly in the
    // failure scenario salting exists for. Content-hash salting is
    // retry-stable (identical-row clumping limitation in the scaladoc).
    // Hash only the HASHABLE columns: Spark's hash() rejects MapType
    // (HASH_MAP_TYPE AnalysisException), so a map-typed fact column
    // would fail the whole join; maps are dropped from the salt input,
    // which only narrows the spread, never the result.
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = fact.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty,
      "saltedJoin: no hashable fact columns to derive a salt from")
    val saltedFact = fact.withColumn(SaltCol,
      pmod(hash(saltCols: _*), lit(nSalts)))
    val saltedDim = dim.withColumn(SaltCol,
      explode(array((0 until nSalts).map(lit(_)): _*)))
    saltedFact.join(saltedDim, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Internal salt column; namespaced to make accidental collision with
    * user data implausible (and guarded by the require above).
    */
  private[graft] val SaltCol = "__graft_salt"

  /** q_join_salted — the salted join as a first-class registered query:
    * lineitem ⋈ supplier on the supplier key with the fact side spread
    * over 8 salts, aggregated to per-supplier line counts and exact
    * decimal revenue. The salt assignment is a deterministic row-content
    * hash (retry-stable) and provably result-neutral — the join
    * produces exactly the unsalted rows (SkewSpec parity test), so
    * the oracle is the PLAIN join SQL: the mitigation must be invisible
    * in the result to be correct.
    */
  def joinSalted(s: SparkSession, d: String): DataFrame =
    saltedJoin(
      Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice"),
      Tables.supplier(s, d).select("s_suppkey", "s_name")
        .withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", nSalts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("s_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_salted" -> (joinSalted _))

  val oracle: Map[String, String] = Map(
    "q_join_salted" ->
      ("SELECT s_name, count(*) AS n_lines, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY s_name ORDER BY s_name"))
}
