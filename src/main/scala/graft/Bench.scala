package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the SF dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (flagship
  * star-rollup + one tiny scan per table + the similarity/codegen-heavy
  * queries at the smallest SF) runs first so timings measure steady-state
  * plans, not JIT/classloading of the first query.
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
      Seq("q_dedup_exact", "q_agreement", "q_queue_state"))
      .foreach(q => warm(q)(
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()))
    // the warm-up pinned sf0.001 similarity indexes the timed loop never
    // reads — release that storage memory before timing the sf0.1 builds
    graft.operators.Similarity.clearIndexCache()

    // a failed query reports -1, never a bogus elapsed time; Throwable so
    // a codegen/linkage Error cannot abort the run and lose the JSON line
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      val t0 = System.nanoTime()
      val secs = try { force(name); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}"); -1.0 }
      name -> secs
    }
    // 3-decimal timings: sub-ms resolution is noise, and a short line is
    // robust — r2's raw-double line was long enough that the driver's
    // capture truncated it ("parsed": null)
    def f3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // failed sentinels must not SHRINK the total (a broken query would
    // read as a speedup): sum successes only, surface the failure count
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    // the driver keeps only a byte-bounded TAIL of stdout, so anything at
    // the HEAD of a long line is what gets truncated (BENCH_r03 lost its
    // total/failed exactly this way, two rounds running): put the summary
    // fields AFTER the per-query map so the end of the line carries them
    val json =
      s"""{"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","failed":$failed,"value":${f3(total)}}"""
    val summary =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","failed":$failed,"sf":"$sfDir"}"""
    // belt and braces for the driver handoff: the line on stdout (the
    // contract) AND the same JSON at a fixed path, immune to interleaved
    // log lines or tail truncation
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench.json"), json)
    catch { case _: Exception => () }
    println(json)
    // a second, tiny, complete JSON line printed LAST: whatever tail the
    // driver keeps, this line survives intact and parses on its own
    println(summary)
    spark.stop()
  }
}
