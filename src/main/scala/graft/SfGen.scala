package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Genuine scale-factor fixture generation (VERDICT r12 #3) — a
  * DISTRIBUTED, deterministic generator matching the driver fixtures'
  * schemas and distributions (measured from /root/testdata/sf0.1:
  * cardinality ratios, value ranges, per-order line-count law,
  * date windows, vocab-soup documents, labeled unit embeddings), so the
  * oracle hash gate can run at sf1 with REALISTIC distributions instead
  * of the ×10 id-offset replica corpus (ideal for cap paths, artificial
  * for joins/windows/percentiles).
  *
  * Design rules (the ones a 100 TB generator needs):
  *  - counter-based randomness, not RNG state: every field is a pure
  *    function of (row id, field tag) via xxhash64 — splittable across
  *    any partitioning, deterministic under task retry/speculation
  *    (an RNG-per-partition generator re-rolls different rows when a
  *    task re-executes — silent corpus drift under failure);
  *  - mapper-only: spark.range → projections; the only shuffle-like
  *    cost is the parquet write itself;
  *  - everything in codegen'd SQL expressions (transform/aggregate/
  *    sequence), no driver-side loops, no collect.
  *
  * Usage: runMain graft.SfGen [outDir] [sf]   (defaults /tmp/graft_sf1, 1.0)
  */
object SfGen {

  /** Uniform double in [0, 1) as a pure function of (id column, tag). */
  private def u(id: Column, tag: String): Column =
    (abs(xxhash64(id, lit(tag))) % lit(1L << 53)).cast("double") / lit((1L << 53).toDouble)

  /** Uniform integer in [0, n). */
  private def ui(id: Column, tag: String, n: Int): Column =
    pmod(xxhash64(id, lit(tag)), lit(n.toLong)).cast("int")

  /** Money value in [lo, hi) rounded to cents. */
  private def money(id: Column, tag: String, lo: Double, hi: Double): Column =
    round(lit(lo) + u(id, tag) * lit(hi - lo), 2)

  /** Poisson(4) conditioned on k ≥ 1, inverse-CDF over one uniform —
    * the measured per-order line-count law (sf0.1: P(1)=.073, P(3)=.197,
    * tail to 17, mean 4.0 — Poisson(4) with the zero class excluded).
    */
  private def linesPerOrder(id: Column): Column = {
    val lambda = 4.0
    val p0 = math.exp(-lambda)
    var p = p0
    val cum = (1 to 16).map { k =>
      p = p * lambda / k
      p / (1 - p0)
    }.scanLeft(0.0)(_ + _).drop(1) // cumulative P(K <= k | K >= 1), k = 1..16
    val arr = array(cum.map(lit): _*)
    (size(filter(arr, c => c < u(id, "nlines"))) + 1).cast("int")
  }

  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PartTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val PartAdjs = Seq("large", "hot", "blue", "small", "dim", "cold", "red", "green")
  private val PartNouns = Seq("ring", "bolt", "washer", "gear", "cog", "pin", "rod", "cap")
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val Langs = Seq("de", "es", "fr", "zh") // en carries the remaining 41%

  private def pick(id: Column, tag: String, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*), ui(id, tag, vals.size) + 1)

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    // third arg "skew": one hot supplier (s_suppkey 0) holds ~30% of
    // lineitem — the deliberately skewed corpus for the AQE skew-join
    // evidence (VERDICT r13 #5)
    val hotSupplier = args.length > 2 && args(2) == "skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, sf, cpus.toInt, hotSupplier)
    spark.stop()
  }

  /** Generate the full fixture set into `outDir`. Exposed separately
    * from main so specs can generate small corpora against their own
    * session without main's conf mutations; `hotSupplier` routes ~30%
    * of lineitem rows to s_suppkey 0 (deterministically, counter-based
    * like every other field) to make the supplier join genuinely
    * skewed.
    */
  def generate(spark: SparkSession, outDir: String, sf: Double,
               parts: Int, hotSupplier: Boolean = false): Unit = {
    import spark.implicits._

    val nCust = (150000 * sf).toLong.max(1)
    val nSupp = (10000 * sf).toLong.max(1)
    val nPart = (200000 * sf).toLong.max(1)
    val nOrders = (1500000 * sf).toLong.max(1)
    val nEvents = (1000000 * sf).toLong.max(1)
    val nDocs = (50000 * sf).toLong.max(1)
    // embeddings follow the measured 4×-per-decade rule (500 → 2000 → 8000)
    val nVecs = (8000 * math.pow(10 * sf, math.log10(4)) / 4).toLong.max(1)
    def rangeDf(n: Long, col0: String): DataFrame =
      spark.range(0, n, 1, parts).toDF(col0)

    // region / nation — fixed catalogs, identical to every driver SF
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/region.parquet")
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/nation.parquet")

    rangeDf(nCust, "c_custkey")
      .select(col("c_custkey"),
        format_string("Customer#%09d", col("c_custkey")).as("c_name"),
        ui(col("c_custkey"), "cnat", 25).as("c_nationkey"),
        money(col("c_custkey"), "cbal", -1000, 10000).as("c_acctbal"),
        pick(col("c_custkey"), "cseg", Segments).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    rangeDf(nSupp, "s_suppkey")
      .select(col("s_suppkey"),
        format_string("Supplier#%09d", col("s_suppkey")).as("s_name"),
        ui(col("s_suppkey"), "snat", 25).as("s_nationkey"),
        money(col("s_suppkey"), "sbal", -1000, 10000).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")

    rangeDf(nPart, "p_partkey")
      .select(col("p_partkey"),
        concat(pick(col("p_partkey"), "padj", PartAdjs), lit(" "),
          pick(col("p_partkey"), "pnoun", PartNouns)).as("p_name"),
        concat(lit("Brand#"), ui(col("p_partkey"), "pbrand", 25).cast("string")).as("p_brand"),
        pick(col("p_partkey"), "ptype", PartTypes).as("p_type"),
        (ui(col("p_partkey"), "psize", 50) + 1).as("p_size"),
        round(lit(900.0) + col("p_partkey") / lit(10.0), 2).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")

    // orders: first |customers| orders cover every customer once (the
    // fixtures' every-customer-has-orders property the anti-join
    // queries were authored against), the rest land uniformly
    val orders = rangeDf(nOrders, "o_orderkey")
      .select(col("o_orderkey"),
        when(col("o_orderkey") < nCust, col("o_orderkey"))
          .otherwise(pmod(xxhash64(col("o_orderkey"), lit("ocust")), lit(nCust)))
          .as("o_custkey"),
        pick(col("o_orderkey"), "ostat", Seq("F", "O", "P")).as("o_orderstatus"),
        money(col("o_orderkey"), "oprice", 1000, 500000).as("o_totalprice"),
        // uniform midnight-aligned days over [1995-01-01, 2001-08-01];
        // NTZ so the parquet logical type is NAIVE micros like the
        // driver fixtures (adjusted-to-UTC reads back TIMESTAMPTZ in
        // DuckDB — a type-class mismatch in the hash gate)
        to_timestamp(date_add(lit("1995-01-01").cast("date"),
          ui(col("o_orderkey"), "odate", 2405))).cast("timestamp_ntz").as("o_orderdate"),
        pick(col("o_orderkey"), "oprio", Priorities).as("o_orderpriority"))
    orders.write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    // lineitem: per-order Poisson(4 | k≥1) fan-out via sequence+explode
    // (mapper-only rows-from-one-row, the chunk-split shape)
    orders
      .withColumn("n_lines", linesPerOrder(col("o_orderkey")))
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(expr("sequence(1, n_lines)")).as("l_linenumber"))
      .select(col("o_orderkey").as("l_orderkey"),
        pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit("lpart")), lit(nPart)).as("l_partkey"),
        {
          val uniformSupp =
            pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit("lsupp")), lit(nSupp))
          // skew mode: a deterministic 30% of lines land on supplier 0
          if (hotSupplier)
            when(pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit("lhot")),
              lit(100L)) < 30, lit(0L)).otherwise(uniformSupp).as("l_suppkey")
          else uniformSupp.as("l_suppkey")
        },
        col("l_linenumber"),
        (ui(xxhash64(col("o_orderkey"), col("l_linenumber")), "lqty", 50) + 1)
          .cast("double").as("l_quantity"),
        money(xxhash64(col("o_orderkey"), col("l_linenumber")), "lprice", 900, 105000)
          .as("l_extendedprice"),
        (ui(xxhash64(col("o_orderkey"), col("l_linenumber")), "ldisc", 11).cast("double") / 100.0)
          .as("l_discount"),
        (ui(xxhash64(col("o_orderkey"), col("l_linenumber")), "ltax", 9).cast("double") / 100.0)
          .as("l_tax"),
        pick(xxhash64(col("o_orderkey"), col("l_linenumber")), "lret", Seq("A", "N", "R"))
          .as("l_returnflag"),
        pick(xxhash64(col("o_orderkey"), col("l_linenumber")), "lstat", Seq("F", "O"))
          .as("l_linestatus"),
        to_timestamp(date_add(col("o_orderdate").cast("date"),
          ui(xxhash64(col("o_orderkey"), col("l_linenumber")), "lship", 95) + 1))
          .cast("timestamp_ntz").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // events: one month of uniform arrivals, user population = nCust/10
    val monthMicros = 30L * 24 * 3600 * 1000000
    rangeDf(nEvents, "event_id")
      .select(col("event_id"),
        expr(s"CAST(timestamp_micros(CAST(unix_micros(TIMESTAMP'2024-01-01 00:00:00') + " +
          s"pmod(xxhash64(event_id, 'ets'), ${monthMicros}L) AS BIGINT)) AS TIMESTAMP_NTZ)").as("ts"),
        pmod(xxhash64(col("event_id"), lit("euser")), lit((nCust / 10).max(1))).as("user_id"),
        pick(col("event_id"), "etype", EventTypes).as("event_type"),
        money(col("event_id"), "evalue", 0, 560).as("value"),
        format_string("{\"k\": %d}", ui(col("event_id"), "eprops", 100)).as("props"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // documents: 8..101-word soup over the 31-word fixture vocab; ~0.2%
    // of docs verbatim-copy an earlier doc (the near/exact-dedup tiers
    // need real duplicate structure, not only hash collisions)
    val vocabArr = array(Vocab.map(lit): _*)
    val docs = rangeDf(nDocs, "doc_id")
      .withColumn("src_id",
        when(u(col("doc_id"), "ddup") < 0.002 && col("doc_id") >= 100,
          pmod(xxhash64(col("doc_id"), lit("dcopy")), lit(100L)))
          .otherwise(col("doc_id")))
      .withColumn("n_words", ui(col("src_id"), "dlen", 94) + 8)
      .withColumn("text", array_join(
        transform(sequence(lit(1), col("n_words")),
          i => element_at(vocabArr,
            pmod(xxhash64(col("src_id"), i, lit("dword")), lit(Vocab.size.toLong)).cast("int") + 1)),
        " "))
      .select(col("doc_id"), col("text"),
        when(u(col("doc_id"), "dlang") < 0.41, lit("en"))
          .otherwise(pick(col("doc_id"), "dlang2", Langs)).as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // embeddings: 64-dim unit vectors around 10 label centroids (the
    // cluster structure the ANN/centroid tiers probe), counter-based
    val dim = 64
    rangeDf(nVecs, "vec_id")
      .withColumn("label", ui(col("vec_id"), "elabel", 10))
      .withColumn("raw", transform(sequence(lit(0), lit(dim - 1)), d =>
        (pmod(xxhash64(col("label"), d, lit("ecent")), lit(2001L)).cast("double") / 1000.0 - 1.0) +
          (pmod(xxhash64(col("vec_id"), d, lit("enoise")), lit(2001L)).cast("double") / 1000.0 - 1.0) * 0.6))
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast("float")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // Make the output byte-flavor-identical to the driver fixtures:
    // drop Spark's embedded-schema footer keys so the NTZ columns
    // read back TIMESTAMP_LTZ via inference (see ParquetMeta scaladoc) —
    // otherwise the embedded schema resurrects TIMESTAMP_NTZ past
    // inferTimestampNTZ=false and 15 registry queries fail to resolve.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val stripped = tables
      .map(t => ParquetMeta.stripSparkSchema(s"$outDir/$t.parquet")).sum

    println(s"[sfgen] wrote sf=$sf fixtures to $outDir " +
      s"(cust=$nCust supp=$nSupp part=$nPart orders=$nOrders events=$nEvents " +
      s"docs=$nDocs vecs=$nVecs; $stripped footers normalized)")
  }
}
