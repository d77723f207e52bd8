package graft

import org.apache.spark.sql.functions._

/** Long-stream soak of the streaming store layout (r8 verdict item 6):
  * StoreSpec pins scanned-rows BOUNDEDNESS of the key-range-pruned append
  * at two store sizes, and the 4-trigger bench entries price the sinks at
  * trivial store size — neither answers "does per-trigger cost stay flat
  * over a LONG run as the stores grow?" (the claim the r8 pruning fix
  * makes, and the regime where the old full-store anti-join was quadratic
  * over the stream's lifetime). This main drives ONE sink for N triggers
  * (default 50) of R fresh documents each (default 400) and prints the
  * per-trigger wall times, so the flat-vs-growing question is answered by
  * a measured series instead of an argument.
  *
  * Feed construction: texts cycle the real corpus (documents.text at the
  * given SF dir) but every row is UNIQUIFIED with its doc_id token —
  * repeated content would be absorbed by the exact-dup front after
  * trigger 1 and the stores would stop growing, soaking nothing.
  * doc_ids/ts are monotonic across triggers (the keyed stores' documented
  * pruning regime). The MemoryStream feed is R rows per trigger held on
  * the driver one trigger at a time — bounded by construction.
  *
  * Sinks: `curation_loop` (default — the composed exact-dup → near-dup →
  * gate → audit+lake chain, THREE keyed stores, the most store-coupled
  * sink in the engine) or `neardup_sink` (fingerprint store + survivor
  * store). Per-trigger time includes everything the sink pays: state
  * store, band join vs the grown fp store, and the keyed appends.
  *
  * Per-trigger cost is NOT expected perfectly flat even when pruning
  * works: the near-dup band join is linear in store size BY SEMANTICS
  * (every new doc is tested against all history; see
  * [[graft.streaming.IngestStream.neardupSink]]), and parquet footer
  * reads grow O(files) = O(triggers) absent compaction. The claim under
  * test is that the KEYED APPENDS stopped being store-linear — i.e. the
  * series grows at the slow footer/band rate, not the steep replay-the-
  * whole-store rate the r7 layout paid.
  *
  * Usage: StreamSoak <sfDir> [triggers=50] [rowsPerTrigger=400]
  *   [sink=curation_loop] [compactAfter=0]
  * `compactAfter=N` > 0 runs [[graft.sources.Store.compact]] over every
  * keyed store of the sink every N triggers (compact to a side
  * directory, rename-aside swap — the deployment CADENCE §8 asserts;
  * r12 measured the single-compaction reset, r13's cadence run compares
  * slopes ACROSS epochs), so the series answers whether the
  * O(files)=O(triggers) parquet-footer term resets at each compaction
  * and the residual slope is the band join's semantic store-linear term
  * alone (constant across epochs) rather than renewed footer growth.
  * Prints ONE JSON line (also written to /tmp/soak.json) with the
  * per-trigger seconds, the compaction points/costs if any, and the
  * [[Bench.preflight]] load fingerprint.
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StreamSoak <sfDir> [triggers] [rows] [sink] [compactAfter]")
    val sfDir = args(0)
    val triggers = if (args.length > 1) args(1).toInt else 50
    val rowsPerTrigger = if (args.length > 2) args(2).toInt else 400
    val sink = if (args.length > 3) args(3) else "curation_loop"
    val compactAfter = if (args.length > 4) args(4).toInt else 0

    val preStart = Bench.preflight()
    System.err.println(s"[soak] preflight start: ${preStart.json}")
    val spark = Sessions.buildDefault()
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val baseTexts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .orderBy("doc_id").limit(rowsPerTrigger)
      .collect().map(_.getAs[String]("text"))
    require(baseTexts.nonEmpty, s"no documents at $sfDir")

    def batch(t: Int): Seq[(Long, java.sql.Timestamp, String)] =
      (0 until rowsPerTrigger).map { i =>
        val id = t.toLong * rowsPerTrigger + i
        (id, new java.sql.Timestamp(1704067200000L + id * 60000L),
          baseTexts(i % baseTexts.length) + " u" + id)
      }

    def tmp(n: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_soak_$n").toString

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val (writer, storePaths) = sink match {
      case "curation_loop" =>
        val (fp, lake, audit) = (tmp("fp"), tmp("lake"), tmp("audit"))
        (streaming.IngestStream.curationLoop(docs, fp, lake, audit),
          Seq(fp, lake, audit))
      case "neardup_sink" =>
        val (nd, surv) = (tmp("nd"), tmp("surv"))
        (streaming.IngestStream.neardupSink(docs, nd, surv), Seq(nd, surv))
      case other => sys.error(s"unknown sink $other")
    }
    // compact-and-swap between triggers: no trigger is mid-flight (the
    // loop drives processAllAvailable synchronously) and every store
    // read is a fresh per-trigger spark.read, so replacing a directory's
    // files between triggers is exactly the offline-cadence deployment
    val compactions = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def compactStores(afterTrigger: Int): Unit = {
      val t0 = System.nanoTime()
      storePaths.foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a sink may not have written this store yet — compacting a
        // nonexistent path would throw on schema inference; skip it
        if (!fs.exists(hp)) {
          System.err.println(s"[soak] skip compact (not yet written): $p")
        } else {
          val files = sources.Store.compact(spark, p, p + "_c")
          // rename the live dir ASIDE before swapping in the compacted
          // copy: a crash between a delete and the rename would destroy
          // the store mid-soak; with the aside order every intermediate
          // state keeps a complete copy on disk
          val old = new org.apache.hadoop.fs.Path(p + "_old")
          fs.delete(old, true)
          require(fs.rename(hp, old), s"compact swap: rename aside failed for $p")
          require(fs.rename(new org.apache.hadoop.fs.Path(p + "_c"), hp),
            s"compact swap: rename in failed for $p")
          fs.delete(old, true)
          System.err.println(s"[soak] compacted $p -> $files files")
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      compactions += ((afterTrigger, sec))
      System.err.println(f"[soak] compaction after trigger $afterTrigger: " +
        f"$sec%.3f s")
    }
    val q = writer.start()
    val perTrigger =
      try (0 until triggers).map { t =>
        val t0 = System.nanoTime()
        mem.addData(batch(t))
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[soak] trigger ${t + 1}/$triggers: $dt%.3f s" +
          f" (${rowsPerTrigger / dt}%.0f rows/s)")
        // CADENCE (r13, soak round 3): compact every compactAfter
        // triggers, not once — the two-epoch slope comparison needs
        // repeated epochs; skip the pointless compaction after the final
        // trigger
        if (compactAfter > 0 && (t + 1) % compactAfter == 0 &&
          t + 1 < triggers) compactStores(t + 1)
        dt
      } finally q.stop()

    val preEnd = Bench.preflight()
    System.err.println(s"[soak] preflight end: ${preEnd.json}")
    // the same throttle-aware verdict the bench stamps (§6) — a soak
    // artifact must not certify clean under conditions a bench would flag
    val (contended, contendedReasons) = Bench.contendedVerdict(preStart, preEnd)
    def f3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val json =
      s"""{"metric":"stream_soak","sink":"$sink","sf":"$sfDir"""" +
        s""","triggers":$triggers,"rows_per_trigger":$rowsPerTrigger""" +
        s""","compact_after":$compactAfter""" +
        s""","compact_points":${compactions.map(_._1).mkString("[", ",", "]")}""" +
        s""","compact_sec":${compactions.map(c => f3(c._2)).mkString("[", ",", "]")}""" +
        s""","per_trigger_sec":[${perTrigger.map(f3).mkString(",")}]""" +
        s""","preflight":{"start":${preStart.json},"end":${preEnd.json}""" +
        s""","reasons":${contendedReasons.map("\"" + _ + "\"")
          .mkString("[", ",", "]")},"contended":$contended}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/soak.json"), json)
    catch { case _: Exception => () }
    println(json)
    spark.stop()
  }
}
