package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native bounded-heap top-k operator vs the declarative
  * Window/row_number formulation: identical rows, heap-shaped plan.
  */
class TopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select("event_id", "event_type", "value")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("event_id", "event_type", "value")
  }

  private def nativeTopK(k: Int) =
    TopK.perKey(
      Tables.events(spark, sfDir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select("event_id", "event_type", "value"),
      Seq("event_type"), "value", "event_id", k)

  test("native top-k equals the window formulation row-for-row") {
    for (k <- Seq(1, 3, 17)) {
      val expect = windowTopK(k).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
          r.getAs[Double]("value"))).toSet
      val got = nativeTopK(k).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
          r.getAs[Double]("value"))).toSet
      assert(got == expect, s"k=$k: ${got.size} vs ${expect.size}")
    }
  }

  test("k larger than every group returns all rows") {
    val base = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select("event_id", "event_type", "value")
    assert(nativeTopK(1000000).count() == base.count())
  }

  test("empty input yields an empty result, not a failure") {
    val base = Tables.events(spark, sfDir)
      .filter(lit(false))
      .select("event_id", "event_type", "value")
    assert(TopK.perKey(base, Seq("event_type"), "value", "event_id", 3).count() == 0)
  }

  test("randomized: native top-k equals the window form on adversarial data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // few keys, many value ties (forces the id tiebreak), several
      // partitions, k around group sizes
      val n = 200 + rnd.nextInt(300)
      val rows = (1 to n).map(i =>
        (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(8).toDouble))
      val df = rows.toDF("event_id", "event_type", "value").repartition(7)
      val k = 1 + rnd.nextInt(12)
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)
      val expect = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val got = TopK.perKey(df, Seq("event_type"), "value", "event_id", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expect, s"trial $trial k=$k")
    }
  }

  test("high-cardinality keys cross the cap: sort-based fallback, identical rows") {
    import spark.implicits._
    // every row its own key: retained rows = |rows| — crosses a tiny cap
    // partway through each partition, so the fallback must merge the
    // already-buffered heaps WITH the remaining stream correctly
    val df = (1L to 5000L).map(i => (i, s"key${i % 500}", i.toDouble))
      .toDF("event_id", "event_type", "value").repartition(2)
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = TopK.perKey(df, Seq("event_type"), "value", "event_id", 3,
      maxRetainedPerPartition = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expect,
      s"fallback path diverged from window form: ${got.size} vs ${expect.size}")
    // degenerate extreme: cap 1 — effectively the whole partition sorts
    val got1 = TopK.perKey(df, Seq("event_type"), "value", "event_id", 3,
      maxRetainedPerPartition = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got1 == expect, "cap=1 full-sort path diverged")
    // same data, same call, default cap (heap path): same rows again
    assert(TopK.perKey(df, Seq("event_type"), "value", "event_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == expect)
  }

  test("wide rows cross the BYTE cap: sort-based fallback, identical rows") {
    import spark.implicits._
    // kilobyte-wide rows: the row cap alone would buffer gigabytes of
    // untracked UnsafeRow copies before tripping — the byte rail is the
    // real memory contract for document-carrying frames
    val pad = "x" * 1024
    val df = (1L to 2000L).map(i => (i, s"key${i % 200}", i.toDouble, pad))
      .toDF("event_id", "event_type", "value", "payload").repartition(2)
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = TopK.perKey(df, Seq("event_type"), "value", "event_id", 3,
      maxRetainedBytesPerPartition = 64L * 1024) // ~64 rows' worth
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect, "byte-cap fallback diverged from window form")
  }

  test("float group keys: -0.0 and 0.0 land in ONE group, like the window form") {
    import spark.implicits._
    // the exec groups by raw key bytes and NormalizeFloatingNumbers never
    // rewrites a custom node — the wrapper must normalize -0.0 itself
    val df = Seq((1L, 0.0, 10.0), (2L, -0.0, 20.0), (3L, -0.0, 30.0),
      (4L, 1.5, 40.0))
      .toDF("event_id", "score_key", "value")
    val out = TopK.perKey(df, Seq("score_key"), "value", "event_id", 2)
      .collect()
    val got = out.map(_.getLong(0)).toSet
    // one zero-group of k=2 (ids 3, 2 by value desc) + the 1.5 group
    assert(got == Set(2L, 3L, 4L),
      s"-0.0 split the zero key into two groups: kept $got")
    // the normalization is GROUPING-only (shadow key): emitted rows keep
    // the caller's original key bits — row 2's key is still -0.0, like
    // the window formulation (r6 ADVICE: the visible rewrite was a
    // bit-level divergence from the 'identical rows' pin)
    val keyOf = out.map(r => r.getLong(0) -> r.getAs[Double]("score_key")).toMap
    assert(java.lang.Double.doubleToRawLongBits(keyOf(2L)) ==
      java.lang.Double.doubleToRawLongBits(-0.0),
      "emitted key must keep the original -0.0 bits")
    assert(java.lang.Double.doubleToRawLongBits(keyOf(3L)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    // and no shadow working column leaks into the output schema
    assert(!out.head.schema.fieldNames.exists(_.startsWith("__topk")),
      "shadow grouping column leaked into the output")
  }

  test("large k over sparse keys does not trip the cap spuriously") {
    import spark.implicits._
    // k=5000 but every key holds ONE row: actual retained = 2000 rows,
    // far under the 3000 cap — a worst-case (keys+1)·k bound would have
    // thrown at the very first key (1×5000 > 3000). This is the ANN
    // shortlist's shape (k = 15% of corpus, most keys sparse).
    val df = (1L to 2000L).map(i => (i, s"key$i", i.toDouble))
      .toDF("event_id", "event_type", "value").coalesce(1)
    assert(TopK.perKey(df, Seq("event_type"), "value", "event_id", 5000,
      maxRetainedPerPartition = 3000L).count() == 2000L)
  }

  test("non-Unsafe input rows (already-distributed single partition) do not cast-crash") {
    import spark.implicits._
    // coalesce(1) satisfies ClusteredDistribution without an inserted
    // shuffle, so the exec sees whatever row class the child emits — the
    // identity-projection path must handle it
    val df = (1L to 100L).map(i => (i, s"k${i % 3}", i.toDouble))
      .toDF("event_id", "event_type", "value").coalesce(1)
    val got = TopK.perKey(df, Seq("event_type"), "value", "event_id", 2)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == Set(("k0", 99L), ("k0", 96L), ("k1", 100L), ("k1", 97L),
      ("k2", 98L), ("k2", 95L)))
  }

  test("plan is the bounded-heap exec — no Window, no per-partition sort") {
    val df = nativeTopK(3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "strategy did not plan the native exec:\n" + p)
    assert(!p.contains("Window"), "native path must not fall back to Window:\n" + p)
    assert(!p.contains("Sort "), "native path must not sort partitions:\n" + p)
  }
}
