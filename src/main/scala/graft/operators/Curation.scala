package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline composed (SURVEY §2.5 capstone): the
  * FineWeb/RefinedWeb-shaped recipe — exact dedup → near-dup dedup →
  * quality floor → blocklist gate → held-out-slice exclusion — run as ONE
  * attrition accounting pass over the corpus. Every stage reuses the
  * standalone operator's OWN definition (the shared-projection helpers:
  * [[TextOps.qualityScored]], [[TextOps.blocklistFlags]],
  * [[Text.evalSlice]], [[Similarity.dedupClusterLabels]], the
  * [[TextOps.qDedupExact]] content key), so the funnel cannot drift from
  * the reports users read per stage.
  */
object Curation {

  /** Quality floor for the funnel's stage 3 — documents scoring below
    * this composite are not trainable text by the pipeline's own quality
    * standard (~16% of the synthetic corpus; a production deployment
    * tunes this against its corpus distribution).
    */
  private[graft] val QualityFloor = 0.5

  private[graft] val StageNames = Seq(
    1 -> "exact_dedup", 2 -> "near_dedup", 3 -> "quality_floor",
    4 -> "blocklist", 5 -> "eval_holdout")

  /** Curation funnel (rows-only; spec pins every stage against an
    * independent driver recompute): per stage, documents entering,
    * dropped AT that stage (first gate that catches them — standard
    * funnel attribution), and remaining. Stage semantics:
    *   1 exact_dedup — not the min doc_id of its normalized-content
    *     group (documents with NULL content key — null text — have no
    *     group and pass);
    *   2 near_dedup — a MinHash near-dup cluster non-keeper
    *     ([[Similarity.qDedupSurvivors]]'s min-id partition; exact
    *     copies are near-dups too, so stage-1 drops are a subset — the
    *     funnel attributes them to the cheaper stage that caught them
    *     first, exactly how a deployed pipeline orders its passes);
    *   3 quality_floor — composite quality_score < [[QualityFloor]],
    *     with unscoreable (null-text) documents dropping HERE: a
    *     document that cannot be scored is not trainable text;
    *   4 blocklist — the token-exact 5% blocklist gate;
    *   5 eval_holdout — the held-out slice ([[Text.evalSlice]]) leaves
    *     the TRAINING corpus (it is what the decontamination passes
    *     protect).
    *
    * Scale shape: ONE corpus scan computes every per-row flag (the
    * quality and blocklist projections chain on the same frame); the
    * exact-dedup keeper is a MIN window over the 16-byte content key —
    * one narrow shuffle, no corpus-sized keeper table to join back;
    * the cluster non-keeper join broadcasts only under the measured
    * [[Similarity.MemberBroadcastMaxRows]] gate (unhinted above — web
    * corpora run 30-50% near-dup members and a forced hint is a driver
    * bomb there); the funnel
    * itself aggregates 5 counter cells map-side (one row per stage out,
    * exploded from ONE aggregate row) and the cumulative arithmetic
    * runs over 5 post-aggregation rows — the [[TextOps]].qSourceMix
    * post-aggregation-window contract.
    */
  /** Per-document first-gate attribution: (doc_id, dropped_at) with
    * dropped_at ∈ 1..5 per [[StageNames]] or NULL for documents that
    * survive every gate — the ONE staging definition behind both the
    * [[qCurationFunnel]] accounting and the [[qCleanCorpus]] artifact,
    * so the counts and the corpus cannot disagree.
    */
  private[graft] def stagedFlags(s: org.apache.spark.sql.SparkSession, d: String,
      broadcastMaxRows: Long = Similarity.MemberBroadcastMaxRows)
      : DataFrame = {
    // one scan: every per-row gate as a projection chain
    val perDoc = TextOps.blocklistFlags(TextOps.qualityScored(Tables.documents(s, d)))
      .select(col("doc_id"),
        md5(Text.norm(col("text"))).as("h"),
        col("quality_score"), col("blocked"),
        Text.evalSlice(col("doc_id")).as("is_eval"))
    // exact keeper per content group as a MIN window riding one narrow
    // shuffle on the 16-byte content key — NOT a groupBy+join-back: the
    // keeper table has one row per DISTINCT content (≈ corpus size), so
    // joining it back means either a corpus-sized broadcast (driver
    // bomb at lake scale) or a second full shuffle. Window partitions =
    // identical-content groups, bounded by exact-dup multiplicity;
    // NULL-text rows share one degenerate partition (rare at scale, and
    // their keep_id is discarded below)
    val wByContent = Window.partitionBy("h")
    // near-dup cluster non-keepers: ~5% of THIS corpus, but 30-50% of a
    // CCNet/FineWeb-rate web corpus — so the broadcast hint is gated on
    // the MEASURED member count (a cache read: the label table is
    // memoized+materialized), unhinted above the threshold so AQE
    // size-decides. See Similarity.MemberBroadcastMaxRows; both physical
    // forms are spec-pinned identical.
    val clusterLabels = Similarity.dedupClusterLabels(s, d)
    val nMembers = clusterLabels.count()
    val nearNonKeepers = clusterLabels
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"), lit(true).as("near_dup"))
    val gatedNonKeepers =
      if (nMembers <= broadcastMaxRows) broadcast(nearNonKeepers)
      else nearNonKeepers
    perDoc
      .withColumn("keep_id",
        when(col("h").isNotNull, min(col("doc_id")).over(wByContent)))
      .join(gatedNonKeepers, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keep_id").isNotNull && col("doc_id") =!= col("keep_id"), 1)
          .when(coalesce(col("near_dup"), lit(false)), 2)
          .when(coalesce(col("quality_score"), lit(-1.0)) < QualityFloor, 3)
          .when(col("blocked"), 4)
          .when(col("is_eval"), 5)
          .as("dropped_at"))
  }

  val qCurationFunnel: Q = Q.rowsOnly("q_curation_funnel") { (s, d) =>
    val staged = stagedFlags(s, d)
    // 5 counter cells out of the corpus-grain aggregate; the funnel
    // arithmetic runs over post-aggregation rows only
    // coalesce each cell: sum() over an EMPTY corpus is NULL, and the
    // empty lake must report a zeros funnel, not NULL arithmetic
    val cells = staged.agg(
      count(lit(1)).as("n_total"),
      (1 to 5).map(k =>
        coalesce(sum(when(col("dropped_at") === k, 1L).otherwise(0L)), lit(0L))
          .as(s"d$k")): _*)
    // ONE row explodes into the 5 stage rows — a per-stage select union
    // would re-run the whole corpus aggregate once per stage
    val stages = cells
      .select(col("n_total"), explode(array(StageNames.map { case (k, name) =>
        struct(lit(k).as("stage"), lit(name).as("stage_name"),
          col(s"d$k").as("n_dropped"))
      }: _*)).as("s"))
      .select(col("s.stage").as("stage"), col("s.stage_name").as("stage_name"),
        col("n_total"), col("s.n_dropped").as("n_dropped"))
    val w = Window.orderBy("stage")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stages
      .withColumn("n_remaining", col("n_total") - sum("n_dropped").over(w))
      .withColumn("n_in", col("n_remaining") + col("n_dropped"))
      .select("stage", "stage_name", "n_in", "n_dropped", "n_remaining")
      .orderBy("stage")
  }

  /** The training corpus the funnel accounts for — the doc_ids that
    * survive every gate (rows-only; spec pins count identity with the
    * funnel's final n_remaining and the per-gate set algebra). This is
    * the artifact a pipeline ships: [[qCurationFunnel]] is its audit
    * trail, and both derive from ONE [[stagedFlags]] definition.
    */
  val qCleanCorpus: Q = Q.rowsOnly("q_clean_corpus") { (s, d) =>
    stagedFlags(s, d)
      .filter(col("dropped_at").isNull)
      .select("doc_id")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(qCurationFunnel, qCleanCorpus)
}
