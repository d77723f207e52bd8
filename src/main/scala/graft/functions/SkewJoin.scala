package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4.2).
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is the
  * explicit fallback when one key dominates so badly that even split
  * partitions hotspot a single task pair (the classic power-law key at
  * 100 TB). The big side gets a salt hashed from the row's content — a
  * pure function of the row, so task retries and re-runs reproduce the
  * identical partitioning (no rand(), no positional ids); the small side
  * is replicated once per salt bucket.
  *
  * Semantics are exactly those of `big.join(small, keys, "inner")`; the
  * spec asserts equality row-for-row.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `keys`, spreading each key of the
    * big side over `salts` shuffle buckets and replicating the small side
    * `salts` times. Use when a handful of keys dwarf the rest; `salts`
    * should be around the executor-core count that one hot key must fan
    * out to.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0)
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedInnerJoin reserves the __salt column name")
    // salt = hash of the FULL row content: a pure function of the row, so a
    // retried shuffle-map task reproduces the identical salt no matter how
    // its input was reordered. A positional id (monotonically_increasing_id)
    // is NOT retry-stable above a shuffle — a re-run map task would salt the
    // same row differently than the copy some reducers already fetched,
    // duplicating or dropping join rows. Trade-off: byte-identical duplicate
    // rows of the hot key share a bucket; rows that identical should be
    // deduped upstream, not load-balanced
    val salted = big.withColumn("__salt",
      pmod(RowHash.contentHash(big), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
