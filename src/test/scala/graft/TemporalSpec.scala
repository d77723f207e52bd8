package graft

import graft.operators.{Similarity, Temporal}
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"), col("value"))
    .collect()
    .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
      r.getAs[String]("event_type"), r.getAs[Long]("tus"), r.getAs[Double]("value")))

  test("asof join: every non-purchase event gets its latest prior purchase") {
    val purchases = events.filter(_._3 == "purchase")
    val rows = Temporal.qAsofJoin.run(spark, sfDir).collect()
    assert(rows.length == events.count(_._3 != "purchase"))
    // reference: driver-side scan for the max-ts purchase at or before the event
    val byEvent = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    events.filter(_._3 != "purchase").foreach { case (eid, uid, _, tus, _) =>
      val expect = purchases.filter(p => p._2 == uid && p._4 <= tus)
        .sortBy(_._4).lastOption
      val got = Option(byEvent(eid).getAs[java.lang.Long]("purchase_id"))
      assert(got == expect.map(p => java.lang.Long.valueOf(p._1)),
        s"event $eid: got=$got expect=${expect.map(_._1)}")
      expect.foreach { p =>
        assert(byEvent(eid).getAs[Long]("us_since_purchase") == tus - p._4)
      }
    }
  }

  test("asof data contract: (user_id, tus) is unique in events at every sf") {
    // q_asof_join's Spark/oracle parity RESTS on this: if a purchase and a
    // non-purchase event ever shared (user_id, tus), DuckDB's ASOF
    // (tus >= p_tus) would match the purchase while the Spark running-last
    // window only sees it if its event_id sorts earlier — the engines
    // would diverge. A generator change breaking uniqueness must surface
    // HERE, not as an opaque oracle hash mismatch.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dups = Tables.events(spark, sf)
        .groupBy(col("user_id"), unix_micros(col("ts")).as("tus"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
      assert(dups == 0L, s"$sf: $dups duplicate (user_id, tus) groups")
    }
  }

  test("range join: follow-up counts match a driver-side window scan") {
    val rows = Temporal.qRangeJoin.run(spark, sfDir).collect()
    val signups = events.filter(_._3 == "signup")
    assert(rows.length == signups.length, "one output row per signup")
    val byId = rows.map(r => r.getAs[Long]("signup_id") ->
      r.getAs[Long]("n_follow")).toMap
    signups.foreach { case (sid, uid, _, stus, _) =>
      val expect = events.count(e =>
        e._2 == uid && e._4 > stus && e._4 <= stus + 86400000000L)
      assert(byId(sid) == expect, s"signup $sid: ${byId(sid)} vs $expect")
    }
  }

  test("rollup: level sums are consistent and the grand total row is present") {
    val rows = Temporal.qRollupEvents.run(spark, sfDir).collect()
    val grand = rows.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1 && grand(0).getAs[Long]("n_events") == events.length)
    val perType = rows.filter(_.getAs[Int]("gid") == 1)
    assert(perType.map(_.getAs[Long]("n_events")).sum == events.length)
    val perDay = rows.filter(_.getAs[Int]("gid") == 0)
    assert(perDay.map(_.getAs[Long]("n_events")).sum == events.length)
    // each type's day rows sum to its rollup row
    val typeTotals = perType.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("n_events")).toMap
    perDay.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("n_events")).sum == typeTotals(t))
    }
  }

  test("latest per key: one row per user carrying that user's max timestamp") {
    val rows = Temporal.qLatestPerKey.run(spark, sfDir).collect()
    val users = events.map(_._2).distinct
    assert(rows.length == users.length)
    val maxTus = events.groupBy(_._2).map { case (u, es) => u -> es.map(_._4).max }
    rows.foreach { r =>
      assert(r.getAs[Long]("tus") == maxTus(r.getAs[Long]("user_id")))
    }
  }

  test("dedup survivors: corpus minus exactly the non-keeper cluster members") {
    val survivors = Similarity.qDedupSurvivors.run(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val clusters = Similarity.qDedupClusters.run(spark, sfDir).collect()
    val keepers = clusters.map(_.getAs[Long]("keep_id")).toSet
    val members = clusters.flatMap(
      _.getAs[String]("members").split(",").map(_.toLong)).toSet
    val total = Tables.documents(spark, sfDir).count()
    assert(survivors.size == total - (members.size - keepers.size))
    assert(keepers.subsetOf(survivors), "every cluster keeper survives")
    assert((members -- keepers).forall(!survivors.contains(_)),
      "no non-keeper member survives")
  }
}
