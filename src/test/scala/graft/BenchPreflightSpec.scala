package graft

/** Pins the throttle-aware contended verdict — especially the r14
  * steal-window rule: a 2.8×-inflated sf10 run stamped CLEAN because
  * loadavg/calib are point samples at the run's ends while this VM's
  * hypervisor steal windows are mid-run and multi-minute. The cumulative
  * /proc/stat steal counters differenced over the window close that hole.
  */
class BenchPreflightSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def pf(calib: Double = 500, load: Double = 0.2,
      steal: Long = -1L, total: Long = -1L) =
    Bench.Preflight(Some(Nil), load, calib, steal, total)

  test("mid-run steal window trips the verdict even with clean endpoints") {
    // 10% of the window's ticks stolen; loadavg and calib both clean
    val (c, reasons) = Bench.contendedVerdict(
      pf(steal = 1000, total = 100000),
      pf(steal = 11000, total = 200000))
    assert(c && reasons == Seq("steal_mid_run"))
  }

  test("sub-threshold steal stays clean") {
    val (c, reasons) = Bench.contendedVerdict(
      pf(steal = 1000, total = 100000),
      pf(steal = 1999, total = 200000)) // ~1% of the window
    assert(!c && reasons.isEmpty)
  }

  test("unreadable /proc/stat is unknown, not contended") {
    val (c, reasons) = Bench.contendedVerdict(pf(), pf())
    assert(!c && reasons.isEmpty)
    assert(Bench.stealShare(pf(), pf()) == -1.0)
  }

  test("the r13 gates still trip: calib drift, busy start, other JVMs") {
    assert(Bench.contendedVerdict(pf(), pf(calib = 700))._2 == Seq("calib_drift"))
    assert(Bench.contendedVerdict(pf(load = 9.2), pf())._2 == Seq("loadavg_start"))
    val dirty = Bench.Preflight(Some(Seq(123L)), 0.2, 500)
    assert(Bench.contendedVerdict(dirty, pf())._2 == Seq("other_jvms_start"))
  }

  test("live preflight reads real /proc/stat counters on this host") {
    val p = Bench.preflight()
    assert(p.totalTicks > 0 && p.stealTicks >= 0 && p.stealTicks < p.totalTicks)
  }
}
