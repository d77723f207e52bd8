package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("every textops query runs") {
    TextOps.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.collect()
    }
  }

  test("exact dedup: copies sum to corpus size, keep_id is a member") {
    val rows = TextOps.qDedupExact.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum ==
      Tables.documents(spark, sfDir).count())
    // reference normalization uses the SUT's exact whitespace class —
    // Java's \s additionally matches \x0B and would drift on such corpora
    val distinctNorm = Tables.documents(spark, sfDir)
      .select(regexp_replace(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+", " "))
      .distinct().count()
    assert(rows.length == distinctNorm)
  }

  test("lang id confusion matrix covers all docs") {
    val rows = TextOps.qLangId.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
  }

  test("quality score in [0,1] and equals its weighted components") {
    TextOps.qQualityScore.run(spark, sfDir).collect().foreach { r =>
      val sc = r.getAs[Double]("quality_score")
      assert(sc >= 0 && sc <= 1, s"score $sc out of range")
      val expect = 0.4 * r.getAs[Double]("len_score") +
        0.3 * r.getAs[Double]("stop_score") +
        0.15 * (1.0 - r.getAs[Double]("punct_ratio")) +
        0.15 * (1.0 - r.getAs[Double]("caps_ratio"))
      assert(sc == expect, s"score mismatch $sc vs $expect")
    }
  }

  test("token counts: ws tokens <= bpe tokens for word corpus") {
    // every whitespace token yields at least one BPE-ish token, so the
    // strict inequality holds document-by-document
    TextOps.qTokenCount.run(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Int]("n_tokens_ws") <= r.getAs[Int]("n_tokens_bpe"))
    }
  }

  test("native functions reject wrong arity with a named error") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot_q(array(1))").collect()
    }
    assert(e.getMessage.contains("graft_dot_q"),
      s"error must name the function: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_rolling_hash('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("graft_rolling_hash"))
  }

  test("rolling hash expression matches a reference fold") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val got = Seq("abc", "", "hello world").toDF("text")
      .select(call_function("graft_rolling_hash", col("text")))
      .collect().map(_.getLong(0))
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(got.sameElements(Array(ref("abc"), ref(""), ref("hello world"))))
    assert(ref("abc") == 96354L)
  }

  test("dot-q kernel: exact dot, null on length mismatch") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(1L, 2L), Array(4L, 5L, 6L)))
      .toDF("a", "b")
      .select(call_function("graft_dot_q", col("a"), col("b")).as("d"))
      .collect()
    assert(rows(0).getLong(0) == 32L)
    assert(rows(1).isNullAt(0), "mismatched lengths must yield null")
  }

  test("identical texts share fingerprints") {
    val fp = TextOps.qFingerprint.run(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val joined = fp.join(docs, "doc_id")
      .groupBy("text").agg(countDistinct("content_md5").as("m"),
        countDistinct("rolling_hash").as("rh"))
      .filter(col("m") > 1 || col("rh") > 1)
    assert(joined.count() == 0)
  }

  test("tfidf terms: <=5 ranked terms per doc, score = floor(tf*1e9/df)") {
    val rows = TextOps.qTfidfTerms.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 5, s"doc $doc has ${rs.length} terms")
      // scores non-increasing in output order and exact integer formula
      val scores = rs.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      rs.foreach { r =>
        assert(r.getAs[Long]("score") ==
          r.getAs[Long]("tf") * 1000000000L / r.getAs[Long]("df"))
      }
    }
    // a rare term must outrank a ubiquitous one at equal tf: df appears
    // in the denominator, so every row with higher score has lower df
    // at equal tf within its doc
    byDoc.values.foreach { rs =>
      rs.groupBy(_.getAs[Long]("tf")).values.foreach { same =>
        val ordered = same.sortBy(-_.getAs[Long]("score"))
        val dfs = ordered.map(_.getAs[Long]("df"))
        assert(dfs.zip(dfs.tail).forall { case (a, b) => a <= b })
      }
    }
  }
}
