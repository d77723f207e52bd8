package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, order-independent aggregation helpers.
  *
  * Why: `SUM(double)` is order-dependent, so a 32-thread Spark shuffle and a
  * single-threaded DuckDB oracle (and, at scale, two different cluster runs)
  * can disagree in the low bits. The fix used throughout graft: round each
  * row to a fixed scale, convert to exact decimal, sum decimals (exact and
  * associative at ANY parallelism), and cast the final total back to double.
  * The oracle SQL mirrors the same expression, so results are bit-identical
  * regardless of partitioning — the property that makes these aggregates
  * safe on a 1000-executor cluster.
  *
  * Magnitude headroom: per-row scaled integers are exact for |x·10^scale| <
  * 2^51 (far beyond any money-like column value), lane sums are safe to
  * ~10^12 rows per group, and the recombined totals use DECIMAL(38,0) /
  * HUGEINT, so neither engine overflows (or silently null-drops) before
  * the other at lake scale.
  *
  * Averages need one more step. `ROUND(sum/n, r)` on a double is engine-
  * dependent at rounding ties: an exact rational like 8.075 is the double
  * 8.07499…, which Spark's round (via the shortest decimal string) takes to
  * 8.08 while a binary-respecting round gives 8.07. So [[exactAvg]] performs
  * the half-up rounding in *integer* arithmetic — exact in both engines:
  * with S = sum in 10^-scale units and n = count,
  *   round_r(S / (n·10^scale)) = sign(S) · ⌊(2·|S|·10^r + n·10^scale) /
  *                                          (2·n·10^scale)⌋ / 10^r.
  */
object Det {

  /** Scaled-integer row value: the exact integer `round(c, scale)·10^scale`
    * as a LONG, via pure double/long codegen ops. `round(c, scale)` is
    * within 1/2 ulp of an exact `scale`-digit decimal d, so the double
    * product `round(c,scale)·10^scale` is within <0.5 of the integer
    * d·10^scale whenever |d·10^scale| < 2^51 — `floor(x·p + 0.5)` then
    * recovers that integer exactly (positives and negatives; verified
    * row-for-row against the double→DECIMAL(30,s) cast path). The decimal
    * cast this replaces costs ~3.5× in the aggregate hot loop: Spark's
    * decimal Sum buffer falls off the primitive fast path.
    */
  private[graft] def scaledLong(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    floor(round(c, scale) * lit(p.toDouble) + lit(0.5))
  }

  /** Exact integer total of [[scaledLong]] values as DECIMAL(38,0), summed
    * in two long lanes (hi = x>>20, lo = x&0xFFFFF; two's complement makes
    * the split exact for negatives). Long lanes keep the per-row aggregate
    * update in primitive codegen; the decimal recombine runs once per
    * group. Overflow headroom: |row value·10^scale| < 2^51 per the
    * [[scaledLong]] contract, so the hi lane tolerates ~2^32 rows per
    * group at the extreme and ~10^12 rows for money-like magnitudes; the
    * lo lane (<2^20 each) tolerates 2^43 rows.
    */
  private def scaledTotal(c: Column, scale: Int): Column = {
    val x = scaledLong(c, scale)
    val hi = sum(shiftright(x, 20)).cast(DecimalType(38, 0))
    val lo = sum(x.bitwiseAND(lit((1L << 20) - 1))).cast(DecimalType(38, 0))
    hi * lit(1L << 20) + lo
  }

  /** Exact integer total of a signed LONG column as DECIMAL(38,0), summed
    * in three long lanes (hi = x>>40, mid = (x>>20)&0xFFFFF, lo =
    * x&0xFFFFF; arithmetic shifts + two's complement make the split exact
    * for negatives — x = (x>>40)·2⁴⁰ + ((x>>20)&m)·2²⁰ + (x&m)). Three
    * lanes instead of [[scaledTotal]]'s two because callers feed squared /
    * cubed deviations up to ~2⁵⁷ per row: every lane term stays < 2²⁰
    * (plus sign), so each lane's long sum is safe to ~2⁴² rows per group
    * while the per-row aggregate update stays in primitive codegen. The
    * decimal recombine runs once per group.
    */
  private[graft] def longTotal(x: Column): Column = {
    val m = lit((1L << 20) - 1)
    val hi  = sum(shiftright(x, 40)).cast(DecimalType(38, 0))
    val mid = sum(shiftright(x, 20).bitwiseAND(m)).cast(DecimalType(38, 0))
    val lo  = sum(x.bitwiseAND(m)).cast(DecimalType(38, 0))
    hi * lit(1L << 40) + mid * lit(1L << 20) + lo
  }

  /** The exact double value of `total`·10^-scale, where `total` is an
    * exact integer DECIMAL: one decimal rescale (precision picked so
    * Spark's precision-loss adjustment cannot truncate the scale — the
    * product must keep ≤ 38-scale-1 integer digits, hence the
    * DECIMAL(37-scale,0) cast; a total beyond 10^(37-scale) FAILS LOUD —
    * under ANSI mode, which this project runs, the narrowing cast throws
    * NUMERIC_VALUE_OUT_OF_RANGE rather than silently rounding or
    * returning a plausible wrong value) and ONE decimal→double
    * conversion — the same single correctly-rounded step as the oracle's
    * CAST(SUM(decimal) AS DOUBLE).
    */
  private[graft] def scaledToDouble(total: Column, scale: Int): Column = {
    val frac = lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale))
    (total.cast(DecimalType(37 - scale, 0)) * frac).cast("double")
  }

  /** Exact, order-independent sum of a double column (row-rounded at
    * `scale`). INPUT CONTRACT: values must be authored with at most
    * `scale` decimal digits (money-like columns) — a value with MORE
    * digits landing on a decimal tie (e.g. 0.12345 at scale 4) rounds
    * differently per engine (Spark rounds the shortest decimal string,
    * DuckDB the binary value), which is the per-row twin of the tie
    * problem the integer-space average machinery below exists to avoid.
    * The exact integer total is divided by 10^scale in decimal (exact:
    * the quotient's scale exceeds `scale`) and only then cast to double,
    * matching the oracle's single DECIMAL→DOUBLE rounding.
    */
  def exactSum(c: Column, scale: Int = 4): Column = {
    val p = math.pow(10, scale).toLong
    (scaledTotal(c, scale) / lit(p).cast(DecimalType(19, 0))).cast("double")
  }

  /** SQL mirror of [[exactSum]] for the DuckDB oracle. */
  def exactSumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(ROUND($expr, $scale) AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** Integer half-up division: round(su / (n·p), r) with su an exact integer
    * column (units of 1/p), n = count. All arithmetic in decimal(38,0) so it
    * is exact and identical across engines; final /10^r is an exact-integer
    * double division (deterministic IEEE). A ZERO (or null) denominator
    * yields NULL — `nullif` guards the pmod, because under ANSI mode (the
    * Spark 4 default) `pmod(x, 0)` THROWS where DuckDB's `// 0` nulls;
    * this keeps an all-null group / empty count a NULL average in both
    * engines instead of a job-killing exception on one.
    */
  private def halfUpAvg(su: Column, n0: Column, p: Long, r: Int): Column = {
    val rp  = math.pow(10, r).toLong
    val n   = nullif(n0.cast(DecimalType(38, 0)), lit(0).cast(DecimalType(38, 0)))
    val num = abs(su) * (2 * rp) + n * p
    val den = n * (2 * p)
    val q   = ((num - pmod(num, den)) / den).cast(DecimalType(38, 0))
    signum(su.cast("double")) * q.cast("double") / rp
  }

  /** DuckDB mirror of [[halfUpAvg]]; HUGEINT (int128) matches the Spark
    * side's decimal(38,0) headroom. `cntExpr` is the denominator count —
    * a zero count divides by zero, which is NULL in both engines.
    */
  private def halfUpAvgSql(sExpr: String, cntExpr: String, p: Long, r: Int): String = {
    val rp = math.pow(10, r).toLong
    s"(SIGN($sExpr) * CAST((2*ABS($sExpr)*$rp + ($cntExpr)*$p) // (2*($cntExpr)*$p) AS DOUBLE) / $rp)"
  }

  /** Deterministic half-up round(num/den, r) for exact integer columns —
    * the tie-proof form of every count-ratio/percentage column (plain
    * ROUND(a*100.0/b, 2) diverges between engines when the rational lands
    * on a tie like 0.575). den must be positive (a count).
    */
  def exactDiv(num: Column, den: Column, r: Int): Column =
    halfUpAvg(num.cast(DecimalType(38, 0)), den, 1L, r)

  def exactDivSql(numExpr: String, denExpr: String, r: Int): String = {
    val rp = math.pow(10, r).toLong
    s"(SIGN($numExpr) * CAST((2*ABS(CAST($numExpr AS HUGEINT))*$rp + ($denExpr))" +
      s" // (2*($denExpr)) AS DOUBLE) / $rp)"
  }

  /** Deterministic mean of a double column, half-up rounded to `r`
    * decimals. NULLs are excluded like SQL AVG — the denominator counts
    * non-null rows only (dividing the null-skipping sum by COUNT(*) would
    * silently treat NULLs as zeros); an all-null group yields NULL.
    */
  def exactAvg(c: Column, r: Int = 2, scale: Int = 4): Column = {
    val p = math.pow(10, scale).toLong
    halfUpAvg(scaledTotal(c, scale), count(c), p, r)
  }

  def exactAvgSql(expr: String, r: Int = 2, scale: Int = 4): String = {
    val p = math.pow(10, scale).toLong
    val s = s"CAST(SUM(CAST(ROUND($expr, $scale) AS DECIMAL(30,$scale))) * $p AS HUGEINT)"
    halfUpAvgSql(s, s"COUNT($expr)", p, r)
  }

  /** Deterministic mean of an integer column (exact long sum / non-null
    * count, NULLs excluded like SQL AVG).
    */
  def intAvg(c: Column, r: Int = 2): Column =
    halfUpAvg(sum(c).cast(DecimalType(38, 0)), count(c), 1L, r)

  def intAvgSql(expr: String, r: Int = 2): String =
    halfUpAvgSql(s"CAST(SUM($expr) AS HUGEINT)", s"COUNT($expr)", 1L, r)

  /** Deterministic z-score of an integer observation against exact
    * integer moments: with D = x·n − s and V = n·s2 − s² computed EXACTLY
    * in decimal (the cancellation-prone differences never touch doubles —
    * at lake-scale magnitudes `s2 − s²/n` in IEEE loses the entire
    * sub-integer variance to cancellation and yields sqrt(0)/sqrt(<0)),
    *
    *   z = (x − s/n) / sqrt((s2 − s²/n)/(n−1))
    *     = D · sqrt(n·(n−1)) / (n · sqrt(V))
    *
    * where the doubles perform only multiply/divide/sqrt (each
    * relative-error-bounded, no cancellation). [[zScoreSql]] is the
    * verbatim mirror; both engines evaluate the identical association
    * order → bit-identical. Degenerate moments (n < 2 or V ≤ 0 — a
    * zero/negative-variance window) yield NULL in BOTH engines: DuckDB
    * nulls double division by zero natively, Spark under ANSI would
    * THROW, so the denominator is nullif-guarded — on BOTH sides:
    * [[zScoreSql]] carries the same NULLIF rather than relying on
    * DuckDB's legacy x/0→NULL (the installed 1.0.0 behavior; DuckDB
    * ≥ 1.1 defaults ieee_floating_point_ops=true, x/0→Inf, which would
    * silently break cross-engine parity on an oracle upgrade). The guard
    * is also what lets callers evaluate z eagerly on rows a [[zOutlier]]
    * filter then drops. Magnitude bounds: n·(n−1) multiplies in long —
    * exact below 2^53 rows/groups, far past any run/day count — but the
    * DECIMAL(38,0)×(38,0) products x·n, s·s and n·s2 cap the EXACT lane
    * at |s|,|x| < ~10¹⁹ and s2 < ~10³⁸/n (Spark ANSI throws at 10³⁸;
    * DuckDB HUGEINT overflows at ~1.7·10³⁸ — the engines fail at
    * DIFFERENT boundaries, so past those moments the parity claim ends,
    * not just precision). For the observation lanes this engine feeds
    * (counts and µs-durations, |x| ≲ 10¹⁶ per run), headroom is ≥ 10³
    * in the squared terms.
    */
  def zScore(x: Column, s: Column, s2: Column, n: Column): Column = {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val d = (dec(x) * n - dec(s)).cast("double")
    val v = (dec(n) * s2 - dec(s) * s).cast("double")
    d * sqrt((n * (n - lit(1))).cast("double")) /
      nullif(n.cast("double") * sqrt(v), lit(0.0))
  }

  def zScoreSql(x: String, s: String, s2: String, n: String): String =
    s"(CAST(CAST($x AS HUGEINT) * ($n) - ($s) AS DOUBLE)" +
      s" * SQRT(CAST(($n) * (($n) - 1) AS DOUBLE))" +
      s" / NULLIF(CAST($n AS DOUBLE)" +
      s" * SQRT(CAST(CAST($n AS HUGEINT) * ($s2) - CAST($s AS HUGEINT) * ($s) AS DOUBLE)), 0.0))"

  /** Exact-integer |z| > t outlier test (t integer): D²·(n−1) > t²·n·V
    * entirely in decimal/HUGEINT — the firing decision never touches a
    * double, and the embedded n ≥ 2 / V > 0 preconditions make the
    * companion [[zScore]] finite wherever this is true. Same
    * DECIMAL(38)/HUGEINT magnitude bound as [[zScore]]: D² and n·V stay
    * exact for |x|,|s| < ~10¹⁹ — and the two engines overflow at
    * different points past it (see the zScore scaladoc).
    */
  def zOutlier(x: Column, s: Column, s2: Column, n: Column, t: Int): Column = {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val d = dec(x) * n - dec(s)
    val v = dec(n) * s2 - dec(s) * s
    n >= 2 && v > 0 && d * d * (n - lit(1)) > lit(t * t) * n * v
  }

  // n*s2 rides HUGEINT explicitly (like every other product lane): a
  // BIGINT s2 near 1e17 with n in the hundreds overflows BIGINT*BIGINT
  // multiplication in DuckDB — an ERROR, far below the documented 1e38
  // envelope the Spark DECIMAL(38,0) side keeps computing in
  def zOutlierSql(x: String, s: String, s2: String, n: String, t: Int): String =
    s"(($n) >= 2 AND CAST($n AS HUGEINT) * ($s2) - CAST($s AS HUGEINT) * ($s) > 0" +
      s" AND (CAST($x AS HUGEINT) * ($n) - ($s)) * (CAST($x AS HUGEINT) * ($n) - ($s))" +
      s" * (($n) - 1) > ${t * t} * ($n) * (CAST($n AS HUGEINT) * ($s2) - CAST($s AS HUGEINT) * ($s)))"
}
