package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor lake generator for the scaling-exponent study (SURVEY §8).
  *
  * The driver generates /root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md) but
  * publishes no generator and no sf1 — and the 100× scale claim rests on
  * plan shapes plus ONE measured 10× step (r6 verdict item 1). This main
  * re-creates the same ten-table lake at any sf from the driver data's
  * measured distributions (schemas, key cardinalities and their sf scaling,
  * value ranges, dup rates, text vocab/length, timestamp domains), so Bench
  * and Verify can run the NEXT decade (sf1 = 6M lineitem / 1M events / 50k
  * docs) and publish per-entry sf0.1→sf1 exponents.
  *
  * Faithfulness notes (every line below verified against the driver data):
  *  - single parquet FILE per table (coalesce(1) + rename), the driver's
  *    layout, so `tools/compare.py`'s DuckDB `FROM '<dir>/<t>.parquet'`
  *    views and `Tables.table` both read it unchanged;
  *  - timestamps written as TIMESTAMP_NTZ → parquet timestamp[us]
  *    isAdjustedToUTC=false, the current-generation type
  *    `Tables.normalizeEventTs` dispatches on;
  *  - documents: 31-word vocab, 8–107-word uniform lengths, 20 sources,
  *    P(en)=.41 / four others equal, exact-dup rate 1/617 (8 dup pairs per
  *    5000 docs at sf0.1) via seed-redirect to the previous doc_id;
  *  - embeddings: isotropic unit 64-dim floats (label-independent, as
  *    measured: per-label centroid norms ≈ 1/√n), labels uniform 0–9;
  *  - events: 30-day µs-grain window over 2024-01, 15000·sf users, 5 types,
  *    value ~ Exp(mean 50) rounded to cents, props = {"k": 0..99}.
  *
  * Determinism is HASH-derived (xxhash64 of the row id + a per-column
  * salt), never rand(): the output is identical regardless of partitioning,
  * task retries, or core count — the property a regenerable 100 TB
  * synthetic lake needs. Everything is spark.range → column expressions;
  * no driver-side loops, so sf10+ generates at cluster scale too.
  */
object GenData {

  /** Uniform double in [0,1) from (id, salt) — hash-deterministic. */
  private def u(id: Column, salt: Int): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000007L)).cast("double") + lit(0.5)) /
      lit(1000000007.0)

  /** Uniform long in [0, n) from (id, salt). */
  private def ui(id: Column, salt: Int, n: Long): Column =
    pmod(xxhash64(id, lit(salt)), lit(n))

  /** Standard normal via Box–Muller from two independent uniforms. */
  private def gauss(id: Column, salt: Int): Column =
    sqrt(lit(-2.0) * log(lit(1.0) - u(id, salt))) *
      cos(lit(2.0 * math.Pi) * u(id, salt + 7919))

  private def round2(c: Column): Column = round(c, 2)

  /** Midnight NTZ timestamp: `baseEpochSec` + `days` whole days. */
  private def dayTs(baseEpochSec: Long, days: Column): Column =
    timestamp_micros((lit(baseEpochSec) + days * lit(86400L)) * lit(1000000L))
      .cast("timestamp_ntz")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenData <outDir> <sf> [skew]")
    val outDir = args(0)
    val sf = args(1).toDouble
    val spark = Sessions.buildDefault()
    write(spark, outDir, sf, skew = args.length > 2 && args(2) == "skew")
    spark.stop()
  }

  /** With `skew = true`, the lake is generated with ADVERSARIAL key
    * skew instead of the driver's near-uniform distributions (r7 verdict
    * item 7 — the AQE-skew claims were plan-shape-asserted but never
    * executed against actual skew): one hot event_type carries 50% of
    * events (plus its uniform residual ≈ 60% total), one hot source
    * carries 90% of documents, and one hot user carries 30% of events
    * (the sessionization / per-user-window stress). Everything else —
    * schemas, key domains, dup seeding, text model — is unchanged, so
    * the full oracle registry runs on a skewed lake exactly as on a
    * uniform one. Skew salts (300–302) live outside the gauss ranges.
    */
  def write(spark: SparkSession, outDir: String, sf: Double,
      skew: Boolean = false): Unit = {
    def skewed(frac: Double, salt: Int, hot: Column, base: Column): Column =
      if (!skew) base else when(u($id, salt) < frac, hot).otherwise(base)
    def n(base: Long, floor: Long): Long = math.max(floor, math.round(base * sf))
    val nCustomer = n(150000, 150)
    val nSupplier = n(10000, 10)
    val nPart     = n(200000, 200)
    val nOrders   = n(1500000, 1500)
    val nEvents   = n(1000000, 1000)
    val nUsers    = n(15000, 15)
    val nDocs     = n(50000, 500)
    val nEmb      = n(20000, 500)

    // single-file layout: write the df, then move the lone part file to
    // <outDir>/<name>.parquet (driver convention; DuckDB + Tables both
    // read a bare file path)
    def save(name: String, df: DataFrame): Unit = {
      val tmp = s"$outDir/_gen_$name"
      // 16 MB row groups: the driver layout is one FILE per table, and a
      // Spark scan can only split a file at row-group boundaries — a
      // 100 MB single-row-group sf1 lineitem would pin every scan to one
      // task, flattering nothing and starving everything (a cluster gets
      // its scan parallelism from many files; a single-file local lake
      // gets it from row groups). Small SFs are unaffected (< 16 MB).
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written for $name"))
      val dest = new org.apache.hadoop.fs.Path(s"$outDir/$name.parquet")
      fs.delete(dest, false)
      fs.rename(part, dest)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    def range(rows: Long): DataFrame =
      spark.range(0, rows, 1, math.max(1, math.min(64, rows / 100000 + 1).toInt)).toDF("id")

    // ---- dimensions ----------------------------------------------------
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    save("region", spark.createDataFrame(
      regions.zipWithIndex.map { case (r, i) => (i, r) })
      .toDF("r_regionkey", "r_name"))

    save("nation", range(25).select(
      $id.cast("int").as("n_nationkey"),
      concat(lit("NATION_"), $id).as("n_name"),
      ($id % 5).cast("int").as("n_regionkey")))

    save("customer", range(nCustomer).select(
      $id.as("c_custkey"),
      format_string("Customer#%09d", $id).as("c_name"),
      ui($id, 10, 25).cast("int").as("c_nationkey"),
      round2(u($id, 11) * lit(11000.0) - lit(1000.0)).as("c_acctbal"),
      element_at(
        array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").map(lit): _*),
        (ui($id, 12, 5) + 1).cast("int")).as("c_mktsegment")))

    save("supplier", range(nSupplier).select(
      $id.as("s_suppkey"),
      format_string("Supplier#%09d", $id).as("s_name"),
      ui($id, 20, 25).cast("int").as("s_nationkey"),
      round2(u($id, 21) * lit(11000.0) - lit(1000.0)).as("s_acctbal")))

    val adjs  = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    save("part", range(nPart).select(
      $id.as("p_partkey"),
      concat(
        element_at(array(adjs.map(lit): _*), (ui($id, 30, 8) + 1).cast("int")),
        lit(" "),
        element_at(array(nouns.map(lit): _*), (ui($id, 31, 8) + 1).cast("int"))).as("p_name"),
      concat(lit("Brand#"), ui($id, 32, 25) + 1).as("p_brand"),
      element_at(
        array(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD").map(lit): _*),
        (ui($id, 33, 6) + 1).cast("int")).as("p_type"),
      (ui($id, 34, 50) + 1).cast("int").as("p_size"),
      // exact driver rule: 900 + (partkey % 1000) / 10
      (lit(900.0) + ($id % 1000).cast("double") / lit(10.0)).as("p_retailprice")))

    // ---- facts ---------------------------------------------------------
    // 1995-01-01 epoch seconds; order dates span days 0..2404 (to
    // 2001-08-01), ship dates independently 1..2499 (to 2001-11-04)
    val Epoch1995 = 788918400L
    save("orders", range(nOrders).select(
      $id.as("o_orderkey"),
      ui($id, 40, nCustomer).as("o_custkey"),
      element_at(array(Seq("F", "O", "P").map(lit): _*),
        (ui($id, 41, 3) + 1).cast("int")).as("o_orderstatus"),
      round2(u($id, 42) * lit(499000.0) + lit(1000.0)).as("o_totalprice"),
      dayTs(Epoch1995, ui($id, 43, 2405)).as("o_orderdate"),
      element_at(
        array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
        (ui($id, 44, 5) + 1).cast("int")).as("o_orderpriority")))

    // lineitem: explode each order into 1..7 lines (measured mean ≈ 4)
    val li = range(nOrders)
      .select($id.as("l_orderkey"),
        explode(sequence(lit(1), (ui($id, 50, 7) + 1).cast("int"))).as("l_linenumber"))
      .withColumn("lid", col("l_orderkey") * 8 + col("l_linenumber"))
    save("lineitem", li.select(
      col("l_orderkey"),
      ui(col("lid"), 51, nPart).as("l_partkey"),
      ui(col("lid"), 52, nSupplier).as("l_suppkey"),
      col("l_linenumber"),
      (ui(col("lid"), 53, 50) + 1).cast("double").as("l_quantity"),
      round2(u(col("lid"), 54) * lit(104100.0) + lit(900.0)).as("l_extendedprice"),
      (ui(col("lid"), 55, 11).cast("double") / lit(100.0)).as("l_discount"),
      (ui(col("lid"), 56, 9).cast("double") / lit(100.0)).as("l_tax"),
      element_at(array(Seq("A", "N", "R").map(lit): _*),
        (ui(col("lid"), 57, 3) + 1).cast("int")).as("l_returnflag"),
      element_at(array(Seq("F", "O").map(lit): _*),
        (ui(col("lid"), 58, 2) + 1).cast("int")).as("l_linestatus"),
      dayTs(Epoch1995, ui(col("lid"), 59, 2499) + 1).as("l_shipdate")))

    // events: 30 days of 2024-01 at µs grain
    val Epoch2024Us = 1704067200000000L
    save("events", range(nEvents).select(
      $id.as("event_id"),
      timestamp_micros(lit(Epoch2024Us) +
        (u($id, 60) * lit(30.0 * 86400 * 1e6)).cast("long")).cast("timestamp_ntz").as("ts"),
      skewed(0.3, 301, lit(0L), ui($id, 61, nUsers)).as("user_id"),
      skewed(0.5, 300, lit("click"),
        element_at(array(Seq("click", "error", "purchase", "signup", "view").map(lit): _*),
          (ui($id, 62, 5) + 1).cast("int"))).as("event_type"),
      round2(-lit(50.0) * log(lit(1.0) - u($id, 63))).as("value"),
      concat(lit("{\"k\": "), ui($id, 64, 100), lit("}")).as("props")))

    // documents: 31-word vocab (the driver's exact list), 8..107 words,
    // exact-dup pairs at rate 1/617 via seed-redirect to doc_id-1
    val vocab = Seq(
      "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
      "filter", "group", "hash", "join", "key", "line", "merge", "order",
      "part", "query", "row", "scan", "slow", "small", "sort", "spark",
      "stream", "table", "the", "value", "vector", "window")
    val vocabArr = array(vocab.map(lit): _*)
    val docs = range(nDocs)
      .withColumn("seed",
        when($id % 617 === 0 && $id > 0, $id - 1).otherwise($id))
      .withColumn("text",
        array_join(
          transform(
            sequence(lit(1), (ui(col("seed"), 70, 100) + 8).cast("int")),
            i => element_at(vocabArr,
              (pmod(xxhash64(col("seed"), i, lit(71)), lit(31)) + 1).cast("int"))),
          " "))
      .withColumn("r", u($id, 72))
    save("documents", docs.select(
      $id.as("doc_id"),
      col("text"),
      when(col("r") < 0.41, "en")
        .when(col("r") < 0.5575, "de")
        .when(col("r") < 0.705, "es")
        .when(col("r") < 0.8525, "fr")
        .otherwise("zh").as("lang"),
      skewed(0.9, 302, lit("src0"),
        concat(lit("src"), ui($id, 73, 20))).as("source"),
      length(col("text")).cast("long").as("n_chars")))

    // embeddings: isotropic unit vectors, 64-dim float, labels 0..9
    save("embeddings", embeddingsDf(spark, nEmb))
  }

  /** The embeddings table alone (package-visible): the k-NN dispatch
    * null-model spec generates a LARGE isotropic corpus (n = 20000)
    * without paying for the fact tables — the regression it pins (a
    * fixed gap margin misrouting isotropic data once n grows the
    * extreme order statistics past it) only appears at this scale.
    */
  private[graft] def embeddingsDf(spark: SparkSession, nEmb: Long): DataFrame = {
    val rows = spark.range(0, nEmb, 1,
      math.max(1, math.min(64, nEmb / 100000 + 1).toInt)).toDF("id")
    val rawVec = array((0 until 64).map(i => gauss($id, 80 + i)): _*)
    rows
      .withColumn("raw", rawVec)
      .withColumn("norm",
        sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(
        $id.as("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast("float")).as("embedding"),
        // salt 200: OUTSIDE the 80..143 and 7999..8062 salt ranges the 64
        // gauss dims consume (the old 90 collided with dim-10's first
        // uniform — same xxhash64(id, 90) feeding both label and vector,
        // a weak coupling contradicting the label-independence claim)
        ui($id, 200, 10).cast("int").as("label"))
  }

  private def $id: Column = col("id")
}
