package graft

import graft.operators.{MediaAsset, MediaMeta, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("every multimodal query runs") {
    Multimodal.all.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.collect().nonEmpty, s"${q.name} empty")
    }
  }

  test("assets: typed metadata consistent with fmt") {
    Multimodal.assets(spark, sfDir).collect().foreach { a =>
      a.meta.fmt match {
        case "png" | "jpg" =>
          assert(a.meta.width > 0 && a.meta.height > 0 && a.meta.sampleRate == -1)
        case "wav" =>
          assert(a.meta.width == -1 && a.meta.sampleRate == 16000)
        case other => fail(s"unexpected fmt $other")
      }
    }
  }

  test("feature extraction: deterministic stub features, one row per asset") {
    val assets = Multimodal.assets(spark, sfDir)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == assets.count())
    val byId = feats.map(f => f.assetId -> f).toMap
    assets.collect().take(50).foreach { a =>
      val f = byId(a.assetId)
      assert(f.nBytes == a.payload.length)
      assert(f.features.length == 4)
      assert(f.features(0) == a.payload.length.toDouble)
      if (a.payload.nonEmpty) {
        assert(f.features(1) == (a.payload.head & 0xff).toDouble)
        assert(f.features(2) == (a.payload.last & 0xff).toDouble)
      }
    }
  }

  test("feature extraction is narrow: payloads never shuffle") {
    // the mapPartitions pipeline must add no Exchange — at scale a shuffle
    // here would move every payload byte across the cluster
    val plan = Multimodal.extractFeatures(Multimodal.assets(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "feature extraction shuffles payloads:\n" + plan)
  }

  test("resize: images get target dims and never grow; audio passes through") {
    val assets = Multimodal.assets(spark, sfDir)
    val before = assets.collect().map(a => a.assetId -> a).toMap
    Multimodal.resize(assets, 64, 48).collect().foreach { r =>
      val orig = before(r.assetId)
      if (orig.meta.sampleRate > 0 || orig.meta.width <= 0 || orig.meta.height <= 0) {
        // audio and unknown-dimension assets pass through untouched
        assert(r.meta == orig.meta, "pass-through meta must be untouched")
        assert(r.payload.sameElements(orig.payload))
      } else {
        assert(r.meta.width == 64 && r.meta.height == 48)
        assert(r.payload.length <= orig.payload.length, "resize must not grow payload")
        assert(r.payload.nonEmpty || orig.payload.isEmpty)
      }
    }
  }

  test("frame sampling: every-nth windows with exact counts and checksums") {
    val assets = Multimodal.assets(spark, sfDir)
    val frames = Multimodal.sampleFrames(assets, 32, 4).collect()
      .groupBy(_.assetId)
    assets.collect().filter(_.payload.nonEmpty).take(50).foreach { a =>
      val nWindows = math.ceil(a.payload.length / 32.0).toInt
      val expected = (0 until nWindows).count(_ % 4 == 0)
      val got = frames.getOrElse(a.assetId, Array.empty)
      assert(got.length == expected,
        s"asset ${a.assetId}: ${got.length} frames, expected $expected")
      got.foreach { f =>
        assert(f.frameIdx % 4 == 0)
        val window = a.payload.slice(f.frameIdx * 32, f.frameIdx * 32 + 32)
        assert(f.frameBytes == window.length)
        assert(f.checksum == Multimodal.fnv1a(window),
          "checksum must be reproducible from the window")
      }
    }
  }

  test("fnv1a matches the published FNV-1a 64-bit test vectors") {
    def h(s: String): Long = Multimodal.fnv1a(s.getBytes("UTF-8"))
    assert(h("") == java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16))
    assert(h("a") == java.lang.Long.parseUnsignedLong("af63dc4c8601ec8c", 16))
    assert(h("foobar") == java.lang.Long.parseUnsignedLong("85944171f73967e8", 16))
  }

  test("media neardup: banded pair set equals the driver all-pairs recompute") {
    import spark.implicits._
    // crafted corpus: two exact-dup payloads, a near-dup (few changed
    // bytes -> low hamming), and structurally different payloads. The
    // pigeonhole band join must find EXACTLY the Hamming<=3 pairs (4
    // chunks, <=3 flipped bits => one chunk always intact — banding is a
    // candidate generator, never a recall cut at this radius).
    def pat(seed: Int): Array[Byte] =
      Array.tabulate(256)(i => (((i / 4) * 37 + seed * ((i / 64) + 1)) % 251).toByte)
    val near = pat(0).clone(); near(3) = (near(3) + 120).toByte // nudge one block
    val meta = MediaMeta("png", 8, 8, -1)
    val crafted = Seq(
      MediaAsset(0L, "s", meta, pat(0)), MediaAsset(1L, "s", meta, pat(0)),
      MediaAsset(2L, "s", meta, near),
      MediaAsset(3L, "s", meta, pat(7)), MediaAsset(4L, "s", meta, pat(13)),
      MediaAsset(5L, "s", meta, Array.emptyByteArray)) // empty: excluded
    def expectedOf(as: Seq[MediaAsset]) = (for {
      a <- as; b <- as if a.assetId < b.assetId
      fa = Multimodal.phashStub(a.payload) if fa != 0L
      fb = Multimodal.phashStub(b.payload) if fb != 0L
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a.assetId, b.assetId, h)).toSet
    val expected = expectedOf(crafted)
    assert(expected.contains((0L, 1L, 0)), "exact dups must pair at hamming 0")
    assert(expected.exists(p => p._1 == 2L || p._2 == 2L),
      "the nudged payload must still pair within radius 3")
    val got = Multimodal.mediaNeardup(spark.createDataset(crafted)).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected, s"crafted pair sets differ: got $got expected $expected")
    // and on the real corpus the band join stays exact (both sides may
    // legitimately be empty at small SFs — equality is the contract)
    val realGot = Multimodal.mediaNeardup(Multimodal.assets(spark, sfDir))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    val realExpected = expectedOf(Multimodal.assets(spark, sfDir).collect().toSeq)
    assert(realGot == realExpected, "real-corpus pair sets differ")
  }

  test("metadata-only query prunes the payload column from the scan") {
    val plan = Multimodal.qBinaryMeta.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("ReadSchema"))
      .getOrElse(fail("no FileScan in plan:\n" + plan))
    // only the columns the rollup needs reach the parquet scan
    assert(scanLine.contains("doc_id") && scanLine.contains("source"))
    assert(!scanLine.contains("lang") && !scanLine.contains("n_chars"),
      "unused columns not pruned: " + scanLine)
  }
}
