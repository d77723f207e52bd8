package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  test("every profiling query runs") {
    Profiling.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.collect()
    }
  }

  test("completeness profile has one row per column, counts sum to total") {
    val rows = Profiling.qProfileCompleteness.run(spark, sfDir).collect()
    assert(rows.length == 5)
    val total = Tables.documents(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_present") + r.getAs[Long]("n_null") +
        r.getAs[Long]("n_empty") == total, s"row $r")
    }
  }

  test("moments: mean/stdev are sane for events.value") {
    val r = Profiling.qMoments.run(spark, sfDir).collect()(0)
    assert(r.getAs[Double]("mean_value") > 0)
    assert(r.getAs[Double]("stdev_value") > 0)
    assert(r.getAs[Long]("n_values") == Tables.events(spark, sfDir).count())
  }

  test("length histogram covers all documents") {
    val rows = Profiling.qLengthHistogram.run(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("percentiles are monotone") {
    Profiling.qLengthPercentiles.run(spark, sfDir).collect().foreach { r =>
      val ps = Seq("p5", "p25", "p50", "p75", "p95", "p99").map(r.getAs[Double])
      assert(ps.sameElements(ps.sorted), s"non-monotone percentiles: $ps")
    }
  }

  test("approx profile within error bounds of exact answers") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val exactUsers = ev.select("user_id").distinct().count()
    val exactEvents = ev.select("event_id").distinct().count()
    val r = Profiling.qApproxProfile.run(spark, sfDir).collect()(0)
    def relErr(approx: Long, exact: Long) =
      math.abs(approx - exact).toDouble / exact
    assert(relErr(r.getAs[Long]("approx_users"), exactUsers) < 0.1)
    assert(relErr(r.getAs[Long]("approx_events"), exactEvents) < 0.1)
    val ps = Seq("value_p50", "value_p95", "value_p99").map(r.getAs[Double])
    assert(ps(0) <= ps(1) && ps(1) <= ps(2))
  }

  test("repeated-chars: enumerated pattern agrees with the true backref on this corpus") {
    // the oracle-able enumeration (ASCII alphanumerics + space) must flag
    // EXACTLY the docs the reference's (.)\1{4,} backref flags — valid on
    // this corpus because its text is ASCII; a corpus change that breaks
    // the agreement surfaces here rather than as silent undercounting
    val docs = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val total = docs.count()
    val backref = docs
      .filter(org.apache.spark.sql.functions.col("text").rlike("(.)\\1{4,}")).count()
    val enumerated = docs
      .filter(org.apache.spark.sql.functions.col("text")
        .rlike(graft.operators.Profiling.RepeatRunPattern)).count()
    assert(enumerated == backref,
      s"enumeration flags $enumerated docs, backref flags $backref")
    val byFlag = graft.operators.Profiling.qRepeatedChars.run(spark, sfDir).collect()
      .map(r => r.getAs[Boolean]("has_repeated_run") -> r.getAs[Long]("n_docs")).toMap
    assert(byFlag.getOrElse(true, 0L) == backref)
    assert(byFlag.values.sum == total)
  }

  test("pearson: exact-integer coefficient matches double corr per key") {
    import org.apache.spark.sql.functions._
    val got = Profiling.qCorrPearson.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("corr_value_payload")).toMap
    val want = Tables.events(spark, sfDir)
      .where(col("value").isNotNull && col("props").isNotNull)
      .groupBy("event_type")
      .agg(corr(col("value"), length(col("props"))).as("c"),
        count(lit(1)).as("n"))
      .collect()
      .filter(_.getAs[Long]("n") >= 2)
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("c")).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-3, s"$k: exact=$v builtin=${want(k)}")
    }
    // the coefficient is a real signal, not a degenerate 0/NaN column
    assert(got.values.exists(v => math.abs(v) > 1e-6))
  }
}
