package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the large-SF cost studies: prints the CONCENTRATION
  * profile of the two similarity join keys whose bucket-load second moment
  * IS the join cost, so a slow measured entry can be attributed to a
  * specific hot-key distribution instead of argued about.
  *
  * Usage: runMain graft.Diag
  *   <simhash|halfjoin|halves|lsh|semdecon|pairs|pointgate> <sfDir>
  *
  *  - `simhash`: distinct-fingerprint count vs corpus size (the r8
  *    rewrite's "D is vocabulary-bound" premise, checkable), then per
  *    16-bit band: distinct band values, the top bucket loads, and
  *    Σ C(load, 2) — the exact candidate-pair count the band self-join
  *    must emit before the Hamming filter.
  *  - `halfjoin`: the r10 half-probe join's actual pre-filter candidate
  *    row count (probe keys ⋈ exact keys) — the number to compare against
  *    `simhash`'s Σ C(load,2).
  *  - `halves`: exact-32-bit-half value concentration — the load profile
  *    that makes the half-probe join's candidate volume near-linear.
  *  - `lsh`: bucket width in use, per-table load second moment
  *    Σ load² / n (the expected collision fan-out per probe row), and the
  *    top bucket loads — the collision-join volume model of q_knn_join
  *    (and, through r10, of the since-rerouted point gates).
  *  - `semdecon`: flagged-set recall of the IVF-rerouted
  *    q_decontaminate_semantic vs a brute-force exact pass at this SF.
  *  - `pairs`: output decomposition of q_dedup_simhash (same-fp pairs,
  *    cross-fp expansion, total emitted) from group-size aggregations —
  *    the entry's Θ(emitted-pairs) cost model, without materializing it.
  *  - `pointgate`: walls of BOTH probe paths of the IVF point shortlist
  *    (broadcast-gated vs shuffled fallback) on the eval slice, with an
  *    output-identity check.
  *  - `storagetier`: the q_knn_join_ivf cache-tier A/B (r12 verdict item
  *    6): times the query with its MEMORY_AND_DISK index caches (a)
  *    freshly built and memory-resident — the subset-study condition;
  *    (b) LRU-evicted to the disk tier by a pinned filler frame sized to
  *    the unified storage maximum — the full-protocol condition, where
  *    ~55 intervening entries hold the pool; (c) re-promoted after the
  *    filler releases (reads re-cache disk blocks into a free memory
  *    tier) — the re-pin deployment. getRDDStorageInfo tier sums are
  *    printed at each step so the eviction is evidence, not assumption.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val Array(mode, sfDir) = args.take(2)
    val spark = Sessions.buildDefault()
    graft.functions.GraftFunctions.register(spark)

    mode match {
      case "simhash" =>
        val fp = operators.Similarity.withSimhashFp(
          Tables.documents(spark, sfDir)).select("doc_id", "fp")
        val n = fp.count()
        val dfp = fp.select("fp").distinct()
        val d = dfp.count()
        println(f"[diag] docs with signature: $n%d, distinct fps: $d%d " +
          f"(D/n = ${d.toDouble / n}%.3f)")
        val bands = operators.Similarity.simhashBands(dfp)
        val loads = bands.groupBy("band", "chunk").agg(count(lit(1)).as("m"))
          .persist()
        loads.groupBy("band").agg(
          count(lit(1)).as("distinct_chunks"),
          max("m").as("max_load"),
          sum(expr("m * (m - 1) div 2")).as("cand_pairs"))
          .orderBy("band")
          .collect().foreach { r =>
            println(s"[diag] band ${r.getInt(0)}: " +
              s"${r.getLong(1)} distinct chunk values, " +
              s"max bucket ${r.getLong(2)}, " +
              s"candidate pairs ${r.getLong(3)}")
          }
        println("[diag] top 12 (band, chunk) buckets:")
        loads.orderBy(col("m").desc).limit(12).collect().foreach(r =>
          println(s"[diag]   band ${r.get(0)} chunk ${r.get(1)}: ${r.getLong(2)} fps"))

      case "halfjoin" =>
        // candidate volume of the r10 half-probe join exactly as the
        // operator runs it: probe keys ⋈ exact keys, before the Hamming
        // filter (compare against the 16-bit band form's Σ C(load,2))
        val dfp = operators.Similarity.withSimhashFp(
          Tables.documents(spark, sfDir)).select("fp").distinct()
        val cand = operators.Similarity.simhashHalfKeys(dfp, probe = true)
          .select(col("fp").as("fp_a"), col("hk"))
          .join(operators.Similarity.simhashHalfKeys(dfp, probe = false)
            .select(col("fp").as("fp_b"), col("hk")), Seq("hk"))
          .filter(col("fp_a") < col("fp_b"))
        println(s"[diag] half-probe candidate rows (pre-distinct): ${cand.count()}")

      case "halves" =>
        // 32-bit half-fingerprint concentration: the candidate volume of
        // a 1-flip-enumeration half join is Σ C(load, 2) over exact
        // 32-bit half values (times a small neighbor term)
        val dfp = operators.Similarity.withSimhashFp(
          Tables.documents(spark, sfDir)).select("fp").distinct()
        val halves = dfp.select(posexplode(array(
          col("fp").bitwiseAND(lit(0xffffffffL)),
          shiftrightunsigned(col("fp"), 32))).as(Seq("half", "hv")))
        val loads = halves.groupBy("half", "hv")
          .agg(count(lit(1)).as("m")).persist()
        loads.groupBy("half").agg(count(lit(1)).as("vals"),
          max("m").as("max_load"),
          sum(expr("m * (m - 1) div 2")).as("cand_pairs"))
          .orderBy("half").collect().foreach(r => println(
            s"[diag] half ${r.get(0)}: ${r.getLong(1)} distinct values, " +
              s"max bucket ${r.getLong(2)}, exact-equal pairs ${r.getLong(3)}"))

      case "pairs" =>
        // OUTPUT decomposition of q_dedup_simhash at this SF — computed
        // from per-fingerprint group sizes (aggregations only, never
        // materializing the doc-grain flood): the entry's wall at large
        // SF is Θ(emitted pairs) AFTER the r10/r11 join fixes, so the
        // honest cost model needs the pair count, not more join forensics.
        val fp = operators.Similarity.withSimhashFp(
          Tables.documents(spark, sfDir)).select("doc_id", "fp")
        val n = fp.count()
        if (n == 0) { println("[diag] empty corpus — no pairs"); return }
        val groups = fp.groupBy("fp").agg(count(lit(1)).as("m")).persist()
        val d = groups.count()
        val samePairs = groups.agg(sum(expr("m * (m - 1) div 2")))
          .head().getLong(0)
        println(f"[diag] docs with signature: $n%d, distinct fps: $d%d " +
          f"(D/n = ${d.toDouble / n}%.3f)")
        println(s"[diag] hamming-0 (same-fp) doc pairs: $samePairs")
        println("[diag] top 8 fp group sizes:")
        groups.orderBy(col("m").desc).limit(8).collect().foreach(r =>
          println(s"[diag]   fp ${r.get(0)}: ${r.getLong(1)} docs"))
        val dfp = groups.select("fp")
        val exactKeys = operators.Similarity
          .simhashHalfKeys(dfp, probe = false)
          .select(col("fp").as("fp_b"), col("hk"))
        // same fp-count gate as the production path it models (r11
        // advice: an unconditional hint would OOM the driver at
        // web-scale D where the real join ships unhinted)
        val gatedKeys =
          if (d <= operators.Similarity.SimhashHalfBroadcastMaxFps)
            broadcast(exactKeys)
          else exactKeys
        val fpPairs = operators.Similarity
          .simhashHalfKeys(dfp, probe = true)
          .select(col("fp").as("fp_a"), col("hk"))
          .join(gatedKeys, Seq("hk"))
          .filter(col("fp_a") < col("fp_b"))
          .select("fp_a", "fp_b").distinct()
          .withColumn("h",
            bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
          .filter(col("h").between(1, 3))
        val cross = fpPairs
          .join(groups.select(col("fp").as("fp_a"), col("m").as("ma")), "fp_a")
          .join(groups.select(col("fp").as("fp_b"), col("m").as("mb")), "fp_b")
          .agg(count(lit(1)).as("fp_pairs"), sum(expr("ma * mb")).as("doc_pairs"))
          .head()
        println(s"[diag] hamming-1..3 fp pairs: ${cross.getLong(0)}, " +
          s"their doc-grain expansion: ${cross.getLong(1)}")
        println(s"[diag] TOTAL emitted pairs: ${samePairs + cross.getLong(1)}")
        groups.unpersist()

      case "semdecon" =>
        // recall study of the r11 IVF-rerouted q_decontaminate_semantic
        // at an arbitrary SF: brute-force exact max train cosine per
        // eval vector (|eval|·|train| integer dots — a one-off study
        // pass, NOT the operator), then the operator's own report
        // joined against it → flagged-set recall + shortfall profile.
        val q = operators.Similarity.quantized(spark, sfDir)
          .filter(col("qv").isNotNull)
        val isEval = operators.Text.evalSlice(col("vec_id"))
        val eval = q.filter(isEval).select(col("vec_id").as("eid"),
          col("qv").as("eq"), col("n2").as("en2"))
        val exact = q.filter(!isEval).crossJoin(broadcast(eval))
          .select(col("eid"),
            (call_function("graft_dot_q", col("eq"), col("qv")).cast("double") /
              (sqrt(col("en2").cast("double")) * sqrt(col("n2").cast("double"))))
              .as("c"))
          .groupBy("eid").agg(max("c").as("exact_max"))
        val tau = operators.Similarity.SemanticTau
        val got = operators.Similarity.qDecontaminateSemantic
          .run(spark, sfDir)
          .select(col("vec_id").as("eid"), col("max_train_cosine"),
            col("contaminated"))
        val j = exact.join(got, Seq("eid")).persist()
        val nEval = j.count()
        val exFlag = j.filter(col("exact_max") >= tau)
        val nExFlag = exFlag.count()
        val hit = exFlag.filter(col("contaminated") === true).count()
        val falsePos = j.filter(col("contaminated") === true &&
          col("exact_max") < tau).count()
        val meanShort = j.agg(avg(col("exact_max") -
          coalesce(col("max_train_cosine"), lit(0.0)))).head().getDouble(0)
        println(f"[diag] eval vectors: $nEval%d, exact-contaminated (τ=$tau): " +
          f"$nExFlag%d, flagged by operator: $hit%d → recall = " +
          f"${if (nExFlag == 0) 1.0 else hit.toDouble / nExFlag}%.3f; " +
          f"false positives: $falsePos%d; mean max-cosine shortfall = $meanShort%.4f")

      case "pointgate" =>
        // both probe paths of the IVF point shortlist at this SF: the
        // broadcast gate (|queries| ≤ SemanticEvalBroadcastMaxDocs, the
        // production held-out-suite case) vs the shuffled fallback a
        // corpus-scale query side takes. Same query slice, same
        // candidate filter — the outputs must be identical row sets
        // (checked via count + order-independent hash sum); the walls
        // pin the fallback's price (r11 verdict item 6: the gate beyond
        // the broadcast bound had no measurement).
        val isEval = operators.Text.evalSlice(col("vec_id"))
        def shortlist(bcast: Boolean) =
          operators.Similarity.annIvfScoredPoint(spark, sfDir,
            isEval, candidateFilter = not(isEval), broadcastProbes = bcast)
            .select("query_id", "vec_id")
        // prepay the shared model + assignment caches so neither leg is
        // charged the one-time build
        shortlist(bcast = true).write.format("noop").mode("overwrite").save()
        def leg(bcast: Boolean): Double = {
          val t0 = System.nanoTime()
          shortlist(bcast).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val tB = leg(bcast = true)
        val tS = leg(bcast = false)
        def sig(bcast: Boolean): (Long, Long) = {
          val r = shortlist(bcast).agg(count(lit(1)),
            sum(hash(col("query_id"), col("vec_id")).cast("long"))).head()
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        }
        val (sb, ss) = (sig(true), sig(false))
        println(s"[diag] shortlist rows: broadcast=${sb._1} shuffled=${ss._1}" +
          s", identical=${sb == ss}")
        println(f"[diag] wall (model/assign prebuilt): broadcast $tB%.2f s, " +
          f"shuffled $tS%.2f s")

      case "lsh" =>
        val b = operators.Similarity.lshBuckets(spark, sfDir)
        val loads = b.groupBy("table_id", "bucket").agg(count(lit(1)).as("m"))
          .persist()
        val n = b.filter(col("table_id") === 0).count()
        println(s"[diag] indexed vectors: $n")
        loads.agg(
          countDistinct(col("table_id"), col("bucket")).as("buckets"),
          max("m").as("max_load"),
          sum(expr("m * m")).as("m2"),
          countDistinct(col("table_id")).as("tables")).collect().foreach { r =>
            // divisor from the data, not a hardcoded 32 — a changed table
            // count must not silently skew the per-table expectation
            val m2PerTable = r.getLong(2).toDouble / r.getLong(3)
            println(f"[diag] occupied (table,bucket) pairs: ${r.getLong(0)}%d, " +
              f"max load ${r.getLong(1)}%d, per-table E[load | hit] = " +
              f"Σload²/n = ${m2PerTable / n}%.1f (uniform would be ${n / math.pow(2, operators.Similarity.lshBitsFor(n))}%.1f)")
          }
        println("[diag] top 12 (table, bucket) loads:")
        loads.orderBy(col("m").desc).limit(12).collect().foreach(r =>
          println(s"[diag]   table ${r.get(0)} bucket ${r.get(1)}: ${r.getLong(2)}"))

      case "storagetier" =>
        val q = SparkEntry.queries("q_knn_join_ivf")
        def run(): Double = {
          val t0 = System.nanoTime()
          q(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        def tiers(tag: String): Unit = {
          val inf = spark.sparkContext.getRDDStorageInfo
          println(f"[diag] $tag: cached RDDs ${inf.length}%d, " +
            f"mem ${inf.map(_.memSize).sum / 1e9}%.2f GB, " +
            f"disk ${inf.map(_.diskSize).sum / 1e9}%.2f GB")
          inf.sortBy(-_.memSize).foreach(r =>
            println(f"[diag]   rdd ${r.id}%d mem ${r.memSize / 1e6}%.1f MB " +
              f"disk ${r.diskSize / 1e6}%.1f MB parts ${r.numCachedPartitions}%d " +
              s"'${r.name}'"))
        }
        run() // prepay the index builds — the subset protocol's prebuild step
        tiers("post-build")
        val tA = run()
        val tA2 = run() // second timed pass: separates steady-state from
                        // post-build residue (the first A/B run measured a
                        // 62.7 vs 33.4 ordering artifact, not a tier)
        // pin a filler sized to the unified storage maximum
        // ((heap − 300 MB) · 0.6): LRU evicts every index block to its
        // disk tier, and while the filler stays persisted re-promotion
        // on read cannot allocate — the protocol-position state. The pad
        // must be INCOMPRESSIBLE: the columnar cache run-length-encodes a
        // constant string to nothing (the first A/B's filler cached 0.04
        // GB and evicted nothing) — per-row digests defeat it.
        val poolBytes = (Runtime.getRuntime.maxMemory - (300L << 20)) * 6 / 10
        val filler = spark.range(poolBytes / 1024)
          .select(col("id"),
            repeat(md5(col("id").cast("string")), 16).as("pad1"),
            repeat(sha2(col("id").cast("string"), 256), 8).as("pad2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        filler.count()
        tiers("post-evict")
        val tB = run()
        tiers("post-B")
        filler.unpersist(blocking = true)
        run() // untimed: reads re-promote disk blocks into the freed memory
        tiers("post-repin")
        val tC = run()
        println(f"[diag] storagetier q_knn_join_ivf: memory-resident $tA%.1f" +
          f"/$tA2%.1f s, disk-tier $tB%.1f s, re-pinned $tC%.1f s")

      case other =>
        sys.error(s"unknown mode $other " +
          "(simhash|halfjoin|halves|lsh|semdecon|pairs|pointgate|storagetier)")
    }
    spark.stop()
  }
}
