package graft

import graft.operators.Ingest

class IngestSpec extends SparkSpec {

  test("every ingest query runs") {
    Ingest.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.collect()
    }
  }

  test("incremental ingest: no already-ingested key survives the anti-join") {
    val rows = Ingest.qIncrementalIngest.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(id % 3 == 0 && id % 2 != 0, s"bad survivor $id")
    }
  }

  test("ingest metrics: fetched = skipped + inserted") {
    val r = Ingest.qIngestMetrics.run(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("fetched") ==
      r.getAs[Long]("skipped") + r.getAs[Long]("inserted"))
  }

  test("run deltas: first day has null prev, others carry previous count") {
    val rows = Ingest.qRunDeltas.run(spark, sfDir).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev_cnt")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("prev_cnt") == a.getAs[Long]("cnt"))
      case _ =>
    }
  }

  test("zscore: anomaly flag consistent with |z| > 2") {
    Ingest.qAnomalyZscore.run(spark, sfDir).collect().foreach { r =>
      val z = r.getAs[Double]("zscore")
      val flag = r.getAs[Int]("is_anomaly")
      assert((math.abs(z) > 2) == (flag == 1), s"z=$z flag=$flag")
    }
  }

  test("sessionize: session event counts sum to total events") {
    val sessions = Ingest.qSessionize.run(spark, sfDir).collect()
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sfDir).count())
    sessions.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
    }
  }

  test("props extraction: every event parses, k within bounds") {
    val rows = Ingest.qPropsExtract.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
      assert(!r.isNullAt(r.fieldIndex("avg_k")), "null avg means unparsed props")
    }
  }

  test("windowed counts sum to total events") {
    val rows = Ingest.qWindowedCounts.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
  }

  test("db growth: cumulative is the running sum; users counted once, first-seen") {
    import org.apache.spark.sql.functions._
    val rows = Ingest.qDbGrowth.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getAs[String]("day"))
    assert(days.sameElements(days.sorted))
    var running = 0L
    rows.foreach { r =>
      running += r.getAs[Long]("new_rows")
      assert(r.getAs[Long]("cumulative_rows") == running)
      assert(r.getAs[Long]("new_users") <= r.getAs[Long]("new_rows"))
    }
    assert(running == Tables.events(spark, sfDir).count())
    // first-seen semantics: the curve's user total is the corpus's
    // distinct user count, not a sum of daily actives
    val distinctUsers = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == distinctUsers)
  }

  test("session stats: consistent with the sessionizer it wraps") {
    val sess = Ingest.qSessionize.run(spark, sfDir).collect()
    val r = Ingest.qSessionStats.run(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_sessions") == sess.length.toLong)
    val share = r.getAs[Double]("single_event_share")
    assert(share >= 0 && share <= 1)
    assert(r.getAs[Double]("avg_events") >= 1.0)
    assert(r.getAs[Double]("p50_duration_us") <= r.getAs[Long]("max_duration_us").toDouble)
    val maxDur = sess.map(s => s.getAs[Long]("end_us") - s.getAs[Long]("start_us")).max
    assert(r.getAs[Long]("max_duration_us") == maxDur)
  }
}
