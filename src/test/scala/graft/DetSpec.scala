package graft

import graft.functions.Det
import org.apache.spark.sql.functions._

/** Properties of the deterministic aggregation helpers: equality with a
  * BigDecimal HALF_UP reference and invariance under repartitioning —
  * the two facts the DuckDB hash-exact oracle gate rests on. Random cases
  * use a fixed seed so the suite itself is deterministic.
  */
class DetSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  private def refAvg(xs: Seq[Double], r: Int, scale: Int): Double = {
    val sum = xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _)
    (sum / xs.length).setScale(r, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("exactAvg equals BigDecimal HALF_UP reference, any partitioning") {
    import spark.implicits._
    (1 to 25).foreach { _ =>
      val xs = List.fill(1 + rnd.nextInt(60))(rnd.nextDouble() * 2000 - 1000)
      val expected = refAvg(xs, 2, 4)
      Seq(1, 7).foreach { parts =>
        val got = xs.toDF("x").repartition(parts)
          .agg(Det.exactAvg(col("x"), 2, 4)).collect()(0).getDouble(0)
        assert(got == expected, s"parts=$parts xs=$xs")
      }
    }
  }

  test("exactAvg resolves the double-representation tie correctly") {
    import spark.implicits._
    // 8.075 is the double 8.07499…: naive round(sum/n, 2) gives 8.07 or
    // 8.08 depending on the engine; exact integer half-up must give 8.08
    val got = Seq(8.07, 8.08).toDF("x")
      .agg(Det.exactAvg(col("x"), 2, 4)).collect()(0).getDouble(0)
    assert(got == 8.08)
  }

  test("exactSum is order- and partition-invariant") {
    import spark.implicits._
    (1 to 15).foreach { _ =>
      val xs = List.fill(40)(rnd.nextDouble() * 2e6 - 1e6)
      val a = xs.toDF("x").repartition(1).agg(Det.exactSum(col("x")))
        .collect()(0).getDouble(0)
      val b = xs.reverse.toDF("x").repartition(8).agg(Det.exactSum(col("x")))
        .collect()(0).getDouble(0)
      assert(a == b)
    }
  }

  test("exactSum equals the BigDecimal reference on contract inputs, all scales") {
    import spark.implicits._
    // inputs authored with exactly `scale` decimal digits (the documented
    // contract): n/10^scale for random integer n, incl. negatives and
    // half-digit endings like .x5 whose double representation sits just
    // below the decimal value — the case the scaled-long floor recovery
    // must get right
    for (scale <- 0 to 4) {
      val p = math.pow(10, scale).toLong
      (1 to 20).foreach { _ =>
        val ns = List.fill(30)(
          (rnd.nextLong() % (p * 1000000L)) + (if (rnd.nextBoolean()) 5 else 0))
        val xs = ns.map(n => n.toDouble / p)
        val expected = (BigDecimal(ns.sum) / p).toDouble
        val got = xs.toDF("x").repartition(5)
          .agg(Det.exactSum(col("x"), scale)).collect()(0).getDouble(0)
        assert(got == expected, s"scale=$scale ns=$ns")
      }
    }
  }

  test("exactSum scaled-long recovery is exact at large per-row magnitudes") {
    import spark.implicits._
    // near the documented |x·10^scale| < 2^51 headroom: 10^14 in units of
    // 10^-4 is 10^18-scale... stay inside: values around 1e11 at scale 4
    // (scaled 1e15 < 2^51 ≈ 2.25e15), signs mixed
    val xs = Seq(99999999999.9995, -99999999999.9995, 12345678901.2345,
      -0.0005, 0.0005, 224000000000.0)
    val expected = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble
    val got = xs.toDF("x").repartition(3)
      .agg(Det.exactSum(col("x"), 4)).collect()(0).getDouble(0)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("exactSum of an all-null or empty column is NULL like SQL SUM") {
    import spark.implicits._
    val nulls = Seq[Option[Double]](None, None).toDF("x")
      .agg(Det.exactSum(col("x"), 2)).collect()(0)
    assert(nulls.isNullAt(0))
    val empty = Seq.empty[Double].toDF("x")
      .agg(Det.exactSum(col("x"), 2)).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("intAvg matches integer half-up reference incl. negatives") {
    import spark.implicits._
    val cases = Seq(
      Seq(1L, 2L) -> 1.5,
      Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L) -> 1.0,
      Seq(-3L, -2L) -> -2.5,
      Seq(7L, 8L, 8L) -> 7.67)
    cases.foreach { case (xs, expect) =>
      val got = xs.toDF("x").agg(Det.intAvg(col("x"), 2)).collect()(0).getDouble(0)
      assert(got == expect, s"xs=$xs got=$got")
    }
  }
}
