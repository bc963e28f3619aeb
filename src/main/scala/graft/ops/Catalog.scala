package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2A catalog/aggregation operators #1-#8, #21, #22 — the
  * reference controller's FileTable computations re-expressed as
  * declarative Spark plans.
  *
  * Scale notes (100 TB): every query here is either a pruned scan, a
  * two-phase hash aggregate, or an anti-join against a broadcastable
  * dimension; none collects to the driver. Sorting is only for
  * deterministic oracle comparison and is a range-partitioned sort, not a
  * single-task sort.
  */
object Catalog {

  /** #1 q_scan_sorted — sorted catalog listing.
    * Reference: FileTable.getFilenames (controller/FileTable.java:23-25),
    * client table print (client/Client.java:106-132). Column-pruned parquet
    * scan + sort; at scale this is a range-partitioned sort over only the
    * projected columns.
    */
  def scanSorted(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")

  /** #2 q_point_lookup — key-equality lookup of one file's chunks.
    * Reference: FileTable.getFile (controller/FileTable.java:33-35),
    * download path (controller/MessageProcessor.java:213-249). The literal
    * predicate is pushed to the parquet reader (PushedFilters) → at scale
    * this reads only row groups whose stats contain the key.
    */
  def pointLookup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") === lit(1L))
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      .orderBy("l_linenumber", "l_suppkey")

  /** #3 q_agg_having_underreplicated — chunks with replica count below the
    * reference's min-replicas=3 (FileTable.getUnderReplicatedChunks,
    * controller/FileTable.java:41-52; ChunkRef.java:23-25; dfs.properties:10).
    * count(DISTINCT) is a two-phase (partial+final) hash aggregate — the
    * distributed form of the reference's single-threaded map walk.
    */
  def underReplicated(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("replicas"))
      .where(col("replicas") < 3)
      .orderBy("l_orderkey")

  /** #4 q_join_anti_offline — node-offline cascade delete
    * (FileTable.onStorageNodeOffline + cleanup, controller/FileTable.java:59-97):
    * with storage nodes {1,2,3} offline, which files lose ALL replicas?
    * Two LEFT ANTI joins: surviving replicas = replicas ∖ offline nodes
    * (broadcast anti-join against a 3-row dim), lost files = files ∖
    * files-with-survivors. Both anti-joins broadcast their small side.
    */
  def antiOffline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val repl = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey").distinct()
    val offline = Seq(1L, 2L, 3L).toDF("node")
    val alive = repl.join(broadcast(offline), repl("l_suppkey") === offline("node"), "left_anti")
    repl.select("l_orderkey").distinct()
      .join(alive.select("l_orderkey").distinct(), Seq("l_orderkey"), "left_anti")
      .orderBy("l_orderkey")
  }

  /** #5 q_upsert_publish — idempotent chunk publish
    * (FileTable.publishChunk, controller/FileTable.java:107-122): union the
    * existing replica set with a new (duplicated, to prove idempotence)
    * batch, dedup on the full key, then summarize per node. unionByName +
    * dropDuplicates is the append-only upsert: one shuffle on the key,
    * no driver-side state.
    */
  def upsertPublish(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val repl = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_suppkey")
    val fresh = Seq((0L, 901, 1L), (0L, 901, 1L), (0L, 902, 2L))
      .toDF("l_orderkey", "l_linenumber", "l_suppkey")
    repl.unionByName(fresh)
      .dropDuplicates("l_orderkey", "l_linenumber", "l_suppkey")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_replicas"))
      .orderBy("l_suppkey")
  }

  /** #6 q_agg_sum_global — global free-space scatter-gather
    * (controller/MessageProcessor.java:87-130 fan-out; per-node answer
    * storageNode/MessageProcessor.java:113-124). Spark's partial+final
    * aggregation IS the scatter-gather; decimal cast keeps the sum exact
    * and partition-order independent.
    */
  def sumGlobal(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .agg(dsum(col("s_acctbal")).as("total_space"), count(lit(1)).as("n_nodes"))

  /** #7 q_scalar_math_units — GiB conversion + 2-decimal rounding
    * (client/Client.java:73-89). ×2^20/÷2^30 = ÷1024, an exact exponent
    * shift — but `round(double, 2)` on the quotient is NOT engine-safe:
    * the genuine-sf1 gate caught two divergences the driver fixtures
    * never triggered. (1) A balance whose cents ≡ 512 (mod 1024) lands
    * the quotient EXACTLY on a half-cent: Spark rounds the shortest
    * decimal repr (HALF_UP → .67) while DuckDB rounds the binary value
    * (→ .66). (2) A balance in (−5.12, 0) rounds to −0.0, which DuckDB
    * keeps signed and Spark canonicalizes. Fix = the SURVEY §7.4 rule
    * applied properly: do the rounding in EXACT integer space —
    * cents·100 DIV 1024 with half-away-from-zero bias — and divide by
    * 100 at the very end (identical IEEE op both sides; integer 0 can't
    * be −0.0). Values are unchanged everywhere off the boundary.
    */
  def mathUnits(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .withColumn("cents", expr("CAST(round(s_acctbal * 100, 0) AS BIGINT)"))
      .select(
        col("s_suppkey"),
        expr("CAST(CASE WHEN cents >= 0 THEN (cents + 512) DIV 1024 " +
          "ELSE -(((-cents) + 512) DIV 1024) END AS DOUBLE) / 100")
          .as("space_gib"))
      .orderBy("s_suppkey")

  /** #8 q_nested_catalog — nested file → [(seq, [nodes])] listing
    * (processGetFilesRequestMsg, controller/MessageProcessor.java:167-211;
    * wire shape proto/messages.proto:73-80). Built bottom-up with
    * collect_list(struct(...)); sort_array at both levels pins the order
    * (collect_list alone is unordered by contract — SURVEY §7.4 rule 6).
    * The ArrayType(StructType) is constructed for real; the final select
    * serializes it with to_json because the comparison harness can't
    * sort/hash nested array columns — both engines emit the identical
    * compact `[{"seq":…,"nodes":[…]}]` string per row.
    */
  def nestedCatalog(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_suppkey").distinct()
      .groupBy("l_orderkey", "l_linenumber")
      .agg(sort_array(collect_list(col("l_suppkey"))).as("nodes"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("l_linenumber").as("seq"), col("nodes")))).as("chunks"))
      .select(col("l_orderkey"), to_json(col("chunks")).as("chunks_json"))
      .orderBy("l_orderkey")

  /** #21 q_agg_count_per_file — chunk count + size per file
    * (DFSFile.getChunkCount controller/DFSFile.java:33-35; file-size MB
    * client/Client.java:179-182).
    */
  def countPerFile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_chunks"), dsum(col("l_quantity")).as("total_qty"))
      .orderBy("l_orderkey")

  /** #22 q_sort_multikey — lexicographic (host, port)-style node listing
    * (ComponentAddress.java:47-52; client/Client.java:149-166).
    */
  def sortMultikey(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .select("s_nationkey", "s_name", "s_suppkey", "s_acctbal")
      .orderBy(col("s_nationkey").asc, col("s_name").asc, col("s_suppkey").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_sorted"                -> (scanSorted _),
    "q_point_lookup"               -> (pointLookup _),
    "q_agg_having_underreplicated" -> (underReplicated _),
    "q_join_anti_offline"          -> (antiOffline _),
    "q_upsert_publish"             -> (upsertPublish _),
    "q_agg_sum_global"             -> (sumGlobal _),
    "q_scalar_math_units"          -> (mathUnits _),
    "q_nested_catalog"             -> (nestedCatalog _),
    "q_agg_count_per_file"         -> (countPerFile _),
    "q_sort_multikey"              -> (sortMultikey _),
  )

  val oracle: Map[String, String] = Map(
    "q_scan_sorted" ->
      "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderkey",
    "q_point_lookup" ->
      ("SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity FROM lineitem " +
        "WHERE l_orderkey = 1 ORDER BY l_linenumber, l_suppkey"),
    "q_agg_having_underreplicated" ->
      ("SELECT l_orderkey, count(DISTINCT l_suppkey) AS replicas FROM lineitem " +
        "GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) < 3 ORDER BY l_orderkey"),
    "q_join_anti_offline" ->
      ("SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey NOT IN " +
        "(SELECT l_orderkey FROM lineitem WHERE l_suppkey NOT IN (1, 2, 3)) " +
        "ORDER BY l_orderkey"),
    "q_upsert_publish" ->
      ("SELECT l_suppkey, count(*) AS n_replicas FROM (" +
        "SELECT DISTINCT l_orderkey, l_linenumber, l_suppkey FROM (" +
        "SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem " +
        "UNION ALL SELECT * FROM (VALUES (CAST(0 AS BIGINT), 901, CAST(1 AS BIGINT)), " +
        "(0, 901, 1), (0, 902, 2)) v(l_orderkey, l_linenumber, l_suppkey))) " +
        "GROUP BY l_suppkey ORDER BY l_suppkey"),
    "q_agg_sum_global" ->
      ("SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_space, " +
        "count(*) AS n_nodes FROM supplier"),
    "q_scalar_math_units" ->
      // exact-integer half-away rounding — see mathUnits scaladoc
      ("WITH c AS (SELECT s_suppkey, CAST(round(s_acctbal * 100, 0) AS BIGINT) AS cents FROM supplier) " +
        "SELECT s_suppkey, CAST(CASE WHEN cents >= 0 THEN (cents + 512) // 1024 " +
        "ELSE -(((-cents) + 512) // 1024) END AS DOUBLE) / 100 AS space_gib " +
        "FROM c ORDER BY s_suppkey"),
    "q_nested_catalog" ->
      ("WITH r AS (SELECT DISTINCT l_orderkey, l_linenumber, l_suppkey FROM lineitem), " +
        "c AS (SELECT l_orderkey, l_linenumber, list_sort(list(l_suppkey)) AS nodes " +
        "FROM r GROUP BY l_orderkey, l_linenumber) " +
        "SELECT l_orderkey, to_json(list(struct_pack(seq := l_linenumber, nodes := nodes) " +
        "ORDER BY l_linenumber)) AS chunks_json FROM c GROUP BY l_orderkey ORDER BY l_orderkey"),
    "q_agg_count_per_file" ->
      ("SELECT l_orderkey, count(*) AS n_chunks, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty " +
        "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "q_sort_multikey" ->
      ("SELECT s_nationkey, s_name, s_suppkey, s_acctbal FROM supplier " +
        "ORDER BY s_nationkey ASC, s_name ASC, s_suppkey ASC"),
  )

  /** Spark-dialect SQL for queries whose DuckDB oracle text doesn't run
    * unchanged through spark.sql (SqlSurface: every other key's oracle
    * SQL IS its Spark SQL). Semantics identical to the oracle pair.
    */
  val sparkSql: Map[String, String] = Map(
    // DuckDB list_sort(list())/struct_pack(k := v)/list(... ORDER BY) →
    // sort_array(collect_list())/named_struct — sort_array over the
    // struct pins the same (seq)-ascending order the oracle's ORDER BY
    // clause does (collect_list alone is unordered by contract).
    "q_nested_catalog" ->
      ("WITH r AS (SELECT DISTINCT l_orderkey, l_linenumber, l_suppkey FROM lineitem), " +
        "c AS (SELECT l_orderkey, l_linenumber, sort_array(collect_list(l_suppkey)) AS nodes " +
        "FROM r GROUP BY l_orderkey, l_linenumber) " +
        "SELECT l_orderkey, to_json(sort_array(collect_list(named_struct('seq', l_linenumber, " +
        "'nodes', nodes)))) AS chunks_json FROM c GROUP BY l_orderkey ORDER BY l_orderkey"),
    // `//` → DIV
    "q_scalar_math_units" ->
      ("WITH c AS (SELECT s_suppkey, CAST(round(s_acctbal * 100, 0) AS BIGINT) AS cents FROM supplier) " +
        "SELECT s_suppkey, CAST(CASE WHEN cents >= 0 THEN (cents + 512) DIV 1024 " +
        "ELSE -(((-cents) + 512) DIV 1024) END AS DOUBLE) / 100 AS space_gib " +
        "FROM c ORDER BY s_suppkey"),
  )
}
