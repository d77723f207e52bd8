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
