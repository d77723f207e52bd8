package graft.operators

import graft.{Q, Tables}
import graft.plans.TopKPerKeyNode
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

/** Library API for the native bounded-heap top-k-per-key operator
  * ([[graft.plans.TopKPerKeyExec]]) plus its oracle-backed query. The
  * Window/row_number formulation (q_topk_per_group) stays as the
  * declarative twin; this is the physical-operator path for the 100 TB
  * case where sorting every partition to keep k rows per key is the
  * bottleneck.
  */
object TopK {

  /** Top `k` rows per `keys` group, "top" = first under (`orderCol`
    * descending, `tiebreakCol` ascending). Output order within a group is
    * unspecified, like any aggregate — sort for presentation. The
    * operator plans through [[graft.plans.TopKStrategy]]; sessions not
    * built with GraftExtensions fall back to... nothing: the strategy is
    * required, which is why every graft session installs it.
    *
    * `maxRetainedPerPartition` is the heap-memory rail: when rows
    * actually buffered in one partition cross it (huge k·|keys|), that
    * partition degrades automatically to sort-based eviction through
    * Spark's spill-capable external sorter — the Window/row_number
    * physical shape, selected per-partition at runtime — instead of
    * throwing or OOMing. Same rows out on either path.
    */
  def perKey(df0: DataFrame, keys: Seq[String], orderCol: String,
      tiebreakCol: String, k: Int,
      maxRetainedPerPartition: Long =
        graft.plans.TopKPerKeyExec.DefaultMaxRetained,
      maxRetainedBytesPerPartition: Long =
        graft.plans.TopKPerKeyExec.DefaultMaxRetainedBytes): DataFrame = {
    // float/double GROUP keys must normalize -0.0 → 0.0 for GROUPING: the
    // exec groups (and hash-partitions) by raw UnsafeProjection key bytes,
    // and Spark's NormalizeFloatingNumbers rule only rewrites
    // Aggregate/Window/Join keys — it never sees a custom node, so 0.0
    // and -0.0 would silently split into two k-row groups where the
    // Window formulation keeps one. (NaN is already normalized by the
    // unsafe writer.) The normalization rides a SHADOW column that only
    // the exec groups by and is dropped from the output, so emitted rows
    // keep the caller's original key values bit-for-bit (a -0.0 row is
    // emitted as -0.0 — the Window formulation's behavior; rewriting the
    // visible column was an r6 ADVICE finding).
    val floatKeys = keys.filter { kn =>
      df0.schema(kn).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
    }
    val shadow = floatKeys.map(kn => kn -> s"__topk_group_$kn").toMap
    val df = floatKeys.foldLeft(df0) { (acc, kn) =>
      acc.withColumn(shadow(kn), when(col(kn) === 0.0, lit(0.0)
        .cast(acc.schema(kn).dataType)).otherwise(col(kn)))
    }
    // sessions built by graft install the strategy via GraftExtensions
    // (injectPlannerStrategy → sessionState.planner, which
    // experimental.extraStrategies does NOT reflect — check the planner's
    // full strategy list or every graft session re-registers); for any
    // other session, attach it at first use — the runtime twin of
    // GraftFunctions.register. Synchronized: extraStrategies is a plain
    // read-modify-write var, racy under concurrent first use.
    val spark = df.sparkSession
    graft.plans.TopKStrategy.synchronized {
      if (!spark.sessionState.planner.strategies.contains(graft.plans.TopKStrategy) &&
        !spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${lp.output.map(_.name)}"))
    val order = Seq(SortOrder(attr(orderCol), Descending),
      SortOrder(attr(tiebreakCol), Ascending))
    val groupKeys = keys.map(kn => shadow.getOrElse(kn, kn))
    GraftSqlBridge.ofRows(df.sparkSession,
        TopKPerKeyNode(k, groupKeys.map(attr), order, lp,
          maxRetainedPerPartition, maxRetainedBytesPerPartition))
      .drop(shadow.values.toSeq: _*)
  }

  /** Native top-3 events per type by (value desc, event_id asc) — same
    * semantics as the QUALIFY/row_number oracle, executed by the
    * bounded-heap operator instead of a Window sort. NULL values are
    * filtered on both sides (null ordering is the one place the two
    * engines' defaults could diverge).
    */
  val qTopkNative: Q = Q(
    "q_topk_native",
    """SELECT event_id, event_type, value FROM events
      |WHERE value IS NOT NULL AND event_type IS NOT NULL
      |QUALIFY row_number() OVER (
      |  PARTITION BY event_type ORDER BY value DESC, event_id ASC) <= 3
      |ORDER BY event_type, value DESC, event_id""".stripMargin
  ) { (s, d) =>
    val base = Tables.events(s, d)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select("event_id", "event_type", "value")
    perKey(base, Seq("event_type"), "value", "event_id", 3)
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
  }

  /** Deterministic reservoir sample: k=5 events per type, "uniformly"
    * chosen by md5 rank — the bounded-heap top-k over a content hash IS
    * distributed reservoir sampling (every row equally likely under the
    * hash, identical on every run/engine, no state beyond k rows per key
    * per partition). md5 (not xxhash64) because the oracle engine must
    * compute the identical rank; hex strings compare identically in both.
    */
  val qSamplePerKey: Q = Q(
    "q_sample_per_key",
    """SELECT event_id, event_type FROM (
      |  SELECT event_id, event_type, md5(CAST(event_id AS VARCHAR)) AS h
      |  FROM events WHERE event_type IS NOT NULL)
      |QUALIFY row_number() OVER (
      |  PARTITION BY event_type ORDER BY h DESC, event_id ASC) <= 5
      |ORDER BY event_type, event_id""".stripMargin
  ) { (s, d) =>
    val base = Tables.events(s, d)
      .filter(col("event_type").isNotNull)
      .select(col("event_id"), col("event_type"),
        md5(col("event_id").cast("string")).as("h"))
    perKey(base, Seq("event_type"), "h", "event_id", 5)
      .select("event_id", "event_type")
      .orderBy("event_type", "event_id")
  }

  val all: Seq[Q] = Seq(qTopkNative, qSamplePerKey)
}
