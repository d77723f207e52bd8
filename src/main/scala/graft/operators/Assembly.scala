package graft.operators

import graft.{Q, Tables}
import graft.functions.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-assembly operators — the "write the training run's input" end of
  * the pipeline (SURVEY §2.5): deterministic epoch shuffling with
  * token-balanced shard assignment + the per-shard manifest (the sharded
  * dataset layout every large-scale trainer consumes: fixed-size files in
  * a reproducible pseudo-random document order, so any worker can seek to
  * shard k of epoch e without coordination), the physical sharded export,
  * and the adjacent-token-pair counting primitive of tokenizer (BPE merge)
  * training. The reference's exporter (src/labeling/exporter.py:195)
  * writes one flat file per split; sharding is what that step becomes at
  * 100 TB.
  */
object Assembly {

  /** Target tokens per shard. Toy-sized so every SF produces a healthy
    * shard count (~13 at sf0.01, ~132 at sf0.1); a production export sets
    * this to O(10^8) tokens (~a few hundred MB of text per shard file).
    */
  private[graft] val ShardTokens = 2048L

  /** Hex chars of the shuffle key used as the level-1 block of the
    * two-level running sum: 2 → 256 blocks. Unlike [[TextOps.qBudgetSelect]]'s
    * quality-quantized blocks (balance there depends on the score
    * distribution — an atom serializes its block), the md5 prefix is
    * uniform BY CONSTRUCTION, so blocks balance on any corpus and the
    * block key is a monotone prefix of the global order key. A
    * 1000-executor deploy widens this to 3-4 hex chars (4096/65536
    * blocks) — the offset table stays post-aggregation-tiny either way.
    */
  private[graft] val ShardBlockHex = 2

  /** The deterministic epoch-e shuffle key: md5 over (doc_id, epoch).
    * Changing the epoch re-permutes the corpus without any state — the
    * standard seeded-epoch-shuffle contract of a training data loader.
    */
  private def shuffleKey(epoch: Int) =
    md5(concat(col("doc_id").cast("string"), lit(s":$epoch")))

  /** Per-document shard assignment for one epoch: documents order by the
    * [[shuffleKey]] (a deterministic pseudo-random permutation), the
    * cumulative whitespace-token count runs in that order, and
    * `shard_id = ⌊tokens-before-this-doc / ShardTokens⌋` — the greedy
    * fill rule (a shard closes when the next document would start past
    * its boundary; a shard may exceed the target by at most one
    * document, the standard tolerance). Null/empty text carries 0 tokens
    * and still lands in a shard — assignment is a TOTAL function of the
    * corpus (the [[Curation]] null-routing principle), so shard files
    * reconcile against corpus counts.
    *
    * Scale shape (100 TB): the global running sum is TWO-LEVEL (the
    * [[TextOps.qBudgetSelect]] decomposition with a better block key —
    * see [[ShardBlockHex]]): rows cumulate within their md5-prefix
    * block's window partition, block totals prefix-sum at ≤ 256 rows
    * through the unpartitioned window (post-aggregation grain), and the
    * tiny offset table broadcasts back. Never a single-task corpus
    * window; no skew risk because the block key is uniform by
    * construction.
    */
  private[graft] def shardAssigned(docs: DataFrame, epoch: Int = 0): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      shuffleKey(epoch).as("shuffle_key"),
      coalesce(Text.wordCount(col("text")).cast("long"), lit(0L))
        .as("n_tokens"))
      .withColumn("blk", substring(col("shuffle_key"), 1, ShardBlockHex))
    val wLoc = Window.partitionBy("blk")
      .orderBy(col("shuffle_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("cum_in", sum(col("n_tokens")).over(wLoc))
    // block offsets: ≤ 256 rows — post-aggregation grain only
    val wOff = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("blk").agg(sum(col("n_tokens")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select("blk", "off")
    local.join(broadcast(offs), Seq("blk"))
      .withColumn("cum_before", col("off") + col("cum_in") - col("n_tokens"))
      .select(col("doc_id"), col("shuffle_key"), col("n_tokens"),
        expr(s"cum_before div $ShardTokens").as("shard_id"))
  }

  /** DuckDB mirror of the epoch-0 assignment (single-threaded, so the
    * oracle's running sum is one plain window — the two-level Spark
    * decomposition must land on identical numbers).
    */
  private val assignSql =
    s"""  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':0') AS shuffle_key,
       |    CAST(COALESCE(${Text.wordCountSql}, 0) AS BIGINT) AS n_tokens
       |  FROM documents),
       |asg AS (
       |  SELECT doc_id, shuffle_key, n_tokens,
       |    COALESCE(CAST(SUM(n_tokens) OVER (
       |      ORDER BY shuffle_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      // $ShardTokens AS shard_id
       |  FROM t""".stripMargin

  /** Epoch-0 shard assignment, per document. */
  val qShardAssign: Q = Q(
    "q_shard_assign",
    s"""WITH t AS (
       |$assignSql)
       |SELECT doc_id, shuffle_key, n_tokens, shard_id
       |FROM asg ORDER BY doc_id""".stripMargin
  ) { (s, d) => shardAssigned(Tables.documents(s, d)).orderBy("doc_id") }

  /** Per-shard manifest over an assignment frame — the sidecar a trainer
    * reads to plan its data loading (docs/tokens per shard, and the
    * shuffle-key range each shard spans: shards partition the key space
    * into contiguous runs, so first/last key double as a seek index).
    */
  private[graft] def shardManifestOf(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      min(col("shuffle_key")).as("first_key"),
      max(col("shuffle_key")).as("last_key"))
      .orderBy("shard_id")

  /** Epoch-0 shard manifest (one map-side-combined aggregate over the
    * assignment — output is shard-grain, post-aggregation-tiny).
    */
  val qShardManifest: Q = Q(
    "q_shard_manifest",
    s"""WITH t AS (
       |$assignSql)
       |SELECT shard_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(shuffle_key) AS first_key, MAX(shuffle_key) AS last_key
       |FROM asg GROUP BY 1 ORDER BY shard_id""".stripMargin
  ) { (s, d) => shardManifestOf(shardAssigned(Tables.documents(s, d))) }

  /** Physical sharded export: the corpus written as parquet partitioned
    * BY SHARD (readers fetch shard k via partition pruning — one
    * directory listing, the layout a distributed data loader consumes)
    * plus the [[shardManifestOf]] sidecar computed from the WRITTEN
    * dataset (describes exactly the files shipped — the
    * [[Labeling.exportSplits]] contract). Per-task files, no driver
    * collect.
    */
  def exportShards(s: SparkSession, d: String, outDir: String,
      epoch: Int = 0): Unit = {
    val rows = shardAssigned(Tables.documents(s, d), epoch)
      .join(Tables.documents(s, d).select("doc_id", "text", "lang", "source"),
        "doc_id")
    rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard_id").parquet(s"$outDir/shards")
    graft.sources.Store.exportParquet(
      shardManifestOf(
        s.read.schema(rows.schema).parquet(s"$outDir/shards")),
      s"$outDir/manifest")
  }

  /** How many top pairs [[qPairCounts]] emits. */
  private[graft] val PairTopK = 100

  /** Adjacent-token-pair frequency — the inner loop of BPE/WordPiece
    * tokenizer training (each merge step promotes the corpus's most
    * frequent adjacent pair): the top-[[PairTopK]] pairs by corpus count,
    * ties broken lexicographically so the cut is a total order both
    * engines agree on.
    *
    * Scale shape (100 TB): pairs flow straight from the inline generator
    * into a map-side-combined count — a stopword bigram ("of the") is a
    * hot GROUP key, and hash-aggregate partials absorb hot keys
    * map-side (never a hot window partition); the global top-k is a
    * bounded-heap TakeOrderedAndProject over the post-aggregation pair
    * table, no global sort. One scan, one shuffle.
    */
  val qPairCounts: Q = Q(
    "q_pair_counts",
    s"""WITH toks AS (
       |  SELECT list_filter(string_split(${Text.normSql}, ' '), t -> t <> '') AS w
       |  FROM documents),
       |p AS (
       |  SELECT w[i] || ' ' || w[i+1] AS pair
       |  FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i)
       |  WHERE len(w) >= 2)
       |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
       |FROM p GROUP BY 1
       |ORDER BY n DESC, pair LIMIT $PairTopK""".stripMargin
  ) { (s, d) =>
    // round-robin spread: the single-file testdata scan's parallelism
    // guard (a multi-split lake scan replaces it), as in dupSpanCounts
    val toks = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      // phantom ""-token guard: see qRepetitionStats
      .select(filter(split(Text.norm(col("text")), " "), t => t =!= "")
        .as("w"))
    toks.filter(size(col("w")) >= 2)
      // array expr INLINE in the generator (CLAUDE.md invariant); get()
      // not w[i] so index lambdas never evaluate before their size guard
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), " +
          "i -> concat(get(w, i), ' ', get(w, i+1)))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(PairTopK)
  }

  val all: Seq[Q] = Seq(qShardAssign, qShardManifest, qPairCounts)
}
