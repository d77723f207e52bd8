package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the large-SF cost studies: prints the CONCENTRATION
  * profile of the two similarity join keys whose bucket-load second moment
  * IS the join cost, so a slow measured entry can be attributed to a
  * specific hot-key distribution instead of argued about.
  *
  * Usage: runMain graft.Diag <simhash|lsh> <sfDir>
  *
  *  - `simhash`: distinct-fingerprint count vs corpus size (the r8
  *    rewrite's "D is vocabulary-bound" premise, checkable), then per
  *    16-bit band: distinct band values, the top bucket loads, and
  *    Σ C(load, 2) — the exact candidate-pair count the band self-join
  *    must emit before the Hamming filter.
  *  - `lsh`: bucket width in use, per-table load second moment
  *    Σ load² / n (the expected collision fan-out per probe row), and the
  *    top bucket loads — the collision-join volume model of
  *    q_decontaminate_semantic / q_knn_join.
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

      case "lsh" =>
        val b = operators.Similarity.lshBuckets(spark, sfDir)
        val loads = b.groupBy("table_id", "bucket").agg(count(lit(1)).as("m"))
          .persist()
        val n = b.filter(col("table_id") === 0).count()
        println(s"[diag] indexed vectors: $n")
        loads.agg(
          countDistinct(col("table_id"), col("bucket")).as("buckets"),
          max("m").as("max_load"),
          sum(expr("m * m")).as("m2")).collect().foreach { r =>
            val m2PerTable = r.getLong(2).toDouble / 32
            println(f"[diag] occupied (table,bucket) pairs: ${r.getLong(0)}%d, " +
              f"max load ${r.getLong(1)}%d, per-table E[load | hit] = " +
              f"Σload²/n = ${m2PerTable / n}%.1f (uniform would be ${n / math.pow(2, operators.Similarity.lshBitsFor(n))}%.1f)")
          }
        println("[diag] top 12 (table, bucket) loads:")
        loads.orderBy(col("m").desc).limit(12).collect().foreach(r =>
          println(s"[diag]   table ${r.get(0)} bucket ${r.get(1)}: ${r.getLong(2)}"))

      case other => sys.error(s"unknown mode $other (simhash|lsh)")
    }
    spark.stop()
  }
}
