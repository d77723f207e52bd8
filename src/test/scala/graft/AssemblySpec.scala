package graft

import graft.operators.Assembly
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: shard assignment recomputed row-by-row from
  * the greedy fill rule, manifest/export reconciliation, epoch
  * re-permutation, and the pair-count primitive on a crafted corpus.
  */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  private def assigned() =
    SparkEntry.queries("q_shard_assign")(spark, sfDir).collect()

  test("shard assignment: greedy fill rule recomputed over the full corpus") {
    val rows = assigned()
      .map(r => (r.getAs[String]("shuffle_key"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("shard_id")))
      .sortBy(t => (t._1, t._2))
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { case (k, id, n, sid) =>
      assert(sid == cum / Assembly.ShardTokens,
        s"doc $id (key $k): shard $sid, expected ${cum / Assembly.ShardTokens}")
      cum += n
    }
    // total function of the corpus: every document assigned exactly once
    assert(rows.length ==
      Tables.documents(spark, sfDir).count().toInt)
    // shard ids are a contiguous 0-based run in key order
    val sids = rows.map(_._4)
    assert(sids.head == 0L && sids.distinct.sorted.sameElements(
      0L to sids.max))
  }

  test("shard manifest: reconciles with the assignment and spans disjoint key ranges") {
    val asg = assigned()
    val man = SparkEntry.queries("q_shard_manifest")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("shard_id"))
    val byShard = asg.groupBy(_.getAs[Long]("shard_id"))
    assert(man.length == byShard.size)
    man.foreach { r =>
      val docs = byShard(r.getAs[Long]("shard_id"))
      assert(r.getAs[Long]("n_docs") == docs.length.toLong)
      assert(r.getAs[Long]("n_tokens") == docs.map(_.getAs[Long]("n_tokens")).sum)
      assert(r.getAs[String]("first_key") == docs.map(_.getAs[String]("shuffle_key")).min)
      assert(r.getAs[String]("last_key") == docs.map(_.getAs[String]("shuffle_key")).max)
    }
    // shards partition the key space into contiguous increasing runs
    man.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("last_key") < b.getAs[String]("first_key"))
      case _ =>
    }
  }

  test("epoch changes re-permute the corpus deterministically") {
    val docs = Tables.documents(spark, sfDir)
    val e0 = Assembly.shardAssigned(docs, 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("shuffle_key")).toMap
    val e1 = Assembly.shardAssigned(docs, 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("shuffle_key")).toMap
    assert(e0.keySet == e1.keySet, "assignment stays total across epochs")
    assert(e0.count { case (id, k) => e1(id) != k } > e0.size / 2,
      "epoch 1 must re-permute most of the corpus")
    val e0again = Assembly.shardAssigned(docs, 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("shuffle_key")).toMap
    assert(e0again == e0, "same epoch replays the same permutation")
  }

  test("export shards: partitioned parquet round-trips and matches its manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Assembly.exportShards(spark, sfDir, dir)
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == Tables.documents(spark, sfDir).count(),
      "every document lands in exactly one shard file")
    val man = spark.read.parquet(s"$dir/manifest").collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("n_docs")).toMap
    val written = back.groupBy("shard_id").count().collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("count")).toMap
    assert(written == man,
      s"written per-shard counts $written diverge from manifest $man")
    // partition pruning: a shard-filtered read lists only that directory
    val plan = back.filter(col("shard_id") === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard_id"),
      "shard filter must prune partitions:\n" + plan)
  }

  test("pair counts: crafted corpus matches a driver recompute, ties lexicographic") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate"),
      (3L, "zz aa zz aa zz"),  // "zz aa" x2, "aa zz" x2 — a tie
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val toks = Seq("the cat sat on the mat", "the cat ate", "zz aa zz aa zz")
      .map(_.split(" ").toSeq)
    val expected = toks.flatMap(w => w.zip(w.tail).map(p => s"${p._1} ${p._2}"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val res = {
      // run the registered plan against the crafted frame via a temp dir
      val dir = java.nio.file.Files.createTempDirectory("graft_pairs").toString
      docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q_pair_counts")(spark, dir).collect()
    }
    val gotPairs = res.map(r => r.getAs[String]("pair") -> r.getAs[Long]("n"))
    assert(gotPairs.toMap == expected,
      s"pair counts ${gotPairs.toMap} != $expected")
    // ordering: count desc, then pair asc — and the tie is adjacent
    assert(gotPairs.sameElements(
      gotPairs.sortBy { case (p, n) => (-n, p) }))
  }
}
