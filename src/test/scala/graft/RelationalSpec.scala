package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("driver contract: entry returns rows on the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every relational query runs and returns a sane schema") {
    Relational.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.collect() // must not throw
    }
  }

  test("q_pricing_summary groups cover all flag/status pairs") {
    val rows = Relational.qPricingSummary.run(spark, sfDir).collect()
    assert(rows.length >= 3)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q_bucket_distribution partitions all events") {
    val r = Relational.qBucketDistribution.run(spark, sfDir).collect()(0)
    val total = r.getAs[Long]("high") + r.getAs[Long]("mid") + r.getAs[Long]("low")
    val n = Tables.events(spark, sfDir).count()
    assert(total == n)
  }

  test("q_topk_per_group returns at most 5 per group, descending") {
    val rows = Relational.qTopkPerGroup.run(spark, sfDir).collect()
    val byGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byGroup.values.foreach { g =>
      assert(g.length <= 5)
      val prices = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.sameElements(prices.sorted.reverse))
    }
  }

  test("q_join_enrich preserves fact cardinality") {
    val n = Tables.customer(spark, sfDir).count()
    assert(Relational.qJoinEnrich.run(spark, sfDir).count() == n)
  }

  test("star rollup join uses broadcast for dims") {
    val plan = Relational.qStarRollup.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }
}
