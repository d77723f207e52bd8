package graft

import graft.functions.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain inner join on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).orderBy("k", "v")
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), 8)
      .orderBy("k", "v")
    assert(salted.columns.sameElements(plain.columns))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("content-hash salt spreads distinct rows of the hot key; retry-stable") {
    import spark.implicits._
    // 4096 DISTINCT rows all sharing the hot key: the SUT's salt
    // (RowHash.contentHash, the exact expression saltedInnerJoin uses)
    // must fan them across all buckets
    val big = (1 to 4096).map(i => (0L, i)).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(graft.functions.RowHash.contentHash(big), lit(8)).cast("int"))
    val buckets = salts.groupBy("__salt").count().collect()
    assert(buckets.length == 8, s"expected 8 buckets, got ${buckets.length}")
    assert(buckets.forall(_.getAs[Long]("count") < 2048), "one bucket hogs the key")
    // pure function of content: re-evaluating yields identical salts (the
    // retry-stability positional ids lack)
    assert(salts.exceptAll(salts).isEmpty)
    // exact-duplicate rows share one bucket — the documented trade-off
    val dup = (1 to 100).map(_ => (0L, 7)).toDF("k", "v")
    assert(dup.withColumn("__salt",
      pmod(graft.functions.RowHash.contentHash(dup), lit(8)).cast("int"))
      .select("__salt").distinct().count() == 1)
    // and the salted join still returns every row exactly once
    val small = Seq((0L, "hot")).toDF("k", "tag")
    assert(SkewJoin.saltedInnerJoin(big, small, Seq("k"), 8).count() == 4096)
  }
}
