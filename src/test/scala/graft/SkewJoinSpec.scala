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

  test("salt spreads even exact-duplicate rows of the hot key") {
    import spark.implicits._
    // 4096 IDENTICAL rows — content-hash salting would put them all in
    // one bucket; position-based salting must spread them
    val big = (1 to 4096).map(_ => (0L, 7)).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8, s"expected 8 buckets, got ${salts.length}")
    assert(salts.forall(_.getAs[Long]("count") < 2048))
    // and the salted join still returns every duplicate exactly once
    val small = Seq((0L, "hot")).toDF("k", "tag")
    assert(SkewJoin.saltedInnerJoin(big, small, Seq("k"), 8).count() == 4096)
  }
}
