package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. Width/height apply to
  * images, sampleRate to audio; absent dimensions are -1 (kept non-null so
  * the struct stays codegen/Encoder-friendly).
  */
final case class MediaMeta(fmt: String, width: Int, height: Int, sampleRate: Int)

/** One media asset: opaque binary payload + typed metadata. */
final case class MediaAsset(assetId: Long, source: String, meta: MediaMeta,
    payload: Array[Byte])

/** Extracted per-asset features (decode stub output). */
final case class MediaFeatures(assetId: Long, fmt: String, nBytes: Int,
    features: Array[Double])

/** Multimodal columns (SURVEY §2.5 #46): image/audio/video as opaque
  * `binary` columns with typed metadata, plus a batched feature-extraction
  * pass. The Spark-side plumbing — schema, Encoders, partitioning, batch
  * shape — is real; the decode itself is a STUB (this container has no
  * image/audio codecs): [[Multimodal.decodeBatchStub]] stands in for a
  * JNI/codec call and produces deterministic fake features, so specs can
  * assert exact behavior. At 100 TB the pattern holds: payloads never
  * shuffle (feature extraction is mapPartitions, narrow), and metadata-only
  * queries prune the payload column at the parquet scan.
  */
object Multimodal {

  val BatchSize = 64

  /** Synthesize a media-asset Dataset from the documents table: payload =
    * utf-8 bytes of text (an opaque stand-in), fmt/dimensions derived
    * deterministically from doc_id. On a real lake this is
    * `spark.read.parquet` over (id, meta struct, payload binary) files.
    */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id").as("assetId"),
      col("source"),
      struct(
        // pmod, not %: a negative doc_id makes % yield -1 and
        // element_at(0) THROWS where the oracle's CASE ... ELSE cleanly
        // falls through (nothing in the schema forbids negative ids)
        element_at(lit(Array("png", "jpg", "wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
          .as("fmt"),
        when(pmod(col("doc_id"), lit(3)) < 2, (pmod(col("doc_id"), lit(640)) + 1).cast("int"))
          .otherwise(-1).as("width"),
        when(pmod(col("doc_id"), lit(3)) < 2, (pmod(col("doc_id"), lit(480)) + 1).cast("int"))
          .otherwise(-1).as("height"),
        when(pmod(col("doc_id"), lit(3)) === 2, 16000).otherwise(-1).as("sampleRate"))
        .as("meta"),
      // a missing payload is an empty asset, never a null pointer
      coalesce(col("text").cast("binary"), lit(Array.emptyByteArray))
        .as("payload"))
      .as[MediaAsset]
  }

  /** STUB decoder: in production this calls the actual image/audio codec
    * on a batch of payloads (batching amortizes codec/JNI setup). Here it
    * derives 4 deterministic features per asset from the raw bytes so the
    * pipeline shape is fully testable: [byte count, first byte, last byte,
    * mean byte value].
    */
  def decodeBatchStub(batch: Seq[MediaAsset]): Seq[MediaFeatures] =
    batch.map { a =>
      val b = a.payload
      val mean = if (b.isEmpty) 0.0
        else b.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / b.length
      MediaFeatures(a.assetId, a.meta.fmt, b.length,
        Array(b.length.toDouble,
          if (b.isEmpty) -1.0 else (b.head & 0xff).toDouble,
          if (b.isEmpty) -1.0 else (b.last & 0xff).toDouble,
          mean))
    }

  /** Batched feature extraction: narrow mapPartitions (payloads never
    * shuffle), batches of [[BatchSize]] assets into the decoder stub.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it =>
      it.grouped(BatchSize).flatMap(decodeBatchStub))
  }

  /** Resize stub: in production the image codec re-encodes the payload to
    * the target dimensions; here the metadata is updated and the payload
    * deterministically truncated by the area ratio so the pipeline shape
    * (typed pass-through of non-images, batched narrow map, payload never
    * grows) is exactly testable. Audio/unknown-dimension assets pass
    * through untouched.
    */
  def resizeBatchStub(batch: Seq[MediaAsset], w: Int, h: Int): Seq[MediaAsset] = {
    require(w > 0 && h > 0, s"target dimensions must be positive, got ${w}x$h")
    batch.map { a =>
      if (a.meta.sampleRate > 0 || a.meta.width <= 0 || a.meta.height <= 0) a
      else {
        val scale = math.min(1.0,
          (w.toDouble * h) / (a.meta.width.toDouble * a.meta.height))
        val n = math.max(1, math.min(a.payload.length,
          math.ceil(a.payload.length * scale).toInt))
        a.copy(meta = a.meta.copy(width = w, height = h),
          // no-shrink case keeps the original array (skip the copy)
          payload = if (n == a.payload.length) a.payload else a.payload.take(n))
      }
    }
  }

  /** Batched resize pass — same narrow mapPartitions shape as
    * [[extractFeatures]]; payloads never shuffle.
    */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    // fail fast on the driver; the per-batch require would only fire inside
    // a scheduled task (and not at all on an empty dataset)
    require(w > 0 && h > 0, s"target dimensions must be positive, got ${w}x$h")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(BatchSize).flatMap(resizeBatchStub(_, w, h)))
  }

  /** One sampled frame/window of a media payload. */
  final case class FrameSample(assetId: Long, frameIdx: Int, frameBytes: Int,
      checksum: Long)

  /** FNV-1a over raw bytes — the frame checksum kernel (shared with the
    * spec so the constants are pinned in exactly one place).
    */
  def fnv1a(bytes: Array[Byte]): Long = {
    // manual loop: foldLeft over Array[Byte] boxes every byte + accumulator
    var x = -3750763034362895579L
    var i = 0
    while (i < bytes.length) { x = (x ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
    x
  }

  /** Frame-sampling stub: every `everyNth` fixed-size window of the payload
    * stands in for a decoded video frame / audio window. A flatMap — narrow,
    * output rows carry a checksum + size, never the frame bytes, so the
    * downstream shuffle (if any) is a few longs per frame. FNV-1a keeps the
    * checksum deterministic and cheap.
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int,
      everyNth: Int): Dataset[FrameSample] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.payload.grouped(frameBytes).zipWithIndex.collect {
        case (f, i) if i % everyNth == 0 =>
          FrameSample(a.assetId, i, f.length, fnv1a(f))
      }.toSeq
    }
  }

  /** Frame-sampling rollup through the full binary→window path: the
    * flatMap kernel stays native, but its window arithmetic is mirrored
    * in the oracle, so the rollup is hash-exact; the spec additionally
    * pins per-asset frame counts and checksums.
    */
  val qFrameSample: Q = Q(
    "q_frame_sample",
    // the flatMap kernel itself is not SQL-expressible, but its window
    // ARITHMETIC is: every 4th 32-byte window of the payload, with the
    // tail window truncated — so the rollup gets a real hash oracle that
    // pins the typed flatMap end-to-end (frame counts AND byte totals)
    """WITH f AS (
      |  SELECT doc_id, i AS "frameIdx",
      |    LEAST(32, strlen(text) - i * 32) AS fb
      |  FROM documents,
      |    UNNEST(generate_series(0, CAST((strlen(COALESCE(text, '')) - 1) // 32 AS BIGINT))) AS t(i)
      |  WHERE strlen(COALESCE(text, '')) > 0 AND i % 4 = 0)
      |SELECT "frameIdx", COUNT(*) AS n_frames,
      |  CAST(SUM(fb) AS BIGINT) AS total_bytes
      |FROM f GROUP BY 1 ORDER BY "frameIdx"""".stripMargin
  ) { (s, d) =>
    sampleFrames(assets(s, d), 32, 4).toDF()
      // long-typed grain/total: generate_series in the oracle is BIGINT
      .groupBy(col("frameIdx").cast("long").as("frameIdx"))
      .agg(count(lit(1)).as("n_frames"),
        sum("frameBytes").cast("long").as("total_bytes"))
      .orderBy("frameIdx")
  }

  /** Perceptual-hash STUB (aHash shape): 64-bit signature where bit b
    * compares the b-th of 64 equal payload blocks against the global mean
    * — in production this runs on decoded/resized pixel data; on the
    * opaque payload it is the same per-row kernel with the codec swapped
    * out. Comparisons are exact cross-multiplied integers (blockSum·n >
    * totalSum·blockLen) — no float means, so the signature is
    * bit-reproducible anywhere. Empty payloads hash to 0 (sentinel).
    */
  def phashStub(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) 0L
    else {
      var total = 0L
      var i = 0
      while (i < n) { total += payload(i) & 0xff; i += 1 }
      var fp = 0L
      var b = 0
      while (b < 64) {
        val from = (b.toLong * n / 64).toInt
        val until = ((b + 1).toLong * n / 64).toInt
        var s = 0L
        i = from
        while (i < until) { s += payload(i) & 0xff; i += 1 }
        if (until > from && s * n > total * (until - from)) fp |= 1L << b
        b += 1
      }
      fp
    }
  }

  /** Per-asset perceptual hashing: a narrow map — payloads never shuffle;
    * only (asset_id, phash) longs leave the stage. Unlike the decode/
    * resize stubs there is no cross-element codec state to amortize, so
    * no grouped() batching (it would only buffer payloads for nothing).
    */
  def perceptualHashes(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.map(a => (a.assetId, phashStub(a.payload)))
      .toDF("asset_id", "phash")
  }

  /** Media near-duplicate pairs (library op, spec-covered like the Store
    * sinks — NOT a registry query: on the synthetic corpus byte-level
    * signatures of distinct texts sit at Hamming ≥ 9, so the ≤ 3 radius
    * that makes pigeonhole banding selective returns rows only where
    * payloads genuinely repeat, which small SFs don't have): perceptual
    * hashes → SimHash-style pigeonhole band join (Hamming ≤ 3 ⇒ at least
    * one of 4 16-bit chunks equal) → exact bit_count(xor) within buckets.
    * This is the image/audio member of the dedup family — the banding and
    * verification shape is identical to q_dedup_simhash, only the
    * signature kernel differs (and on a real lake, the decode behind it).
    */
  def mediaNeardup(assets: Dataset[MediaAsset]): DataFrame = {
    val fp = perceptualHashes(assets).filter(col("phash") =!= 0L)
    val bands = fp.select(col("asset_id"), col("phash"), posexplode(array(
      (0 until 4).map(k =>
        shiftrightunsigned(col("phash"), k * 16).bitwiseAND(0xffff)): _*))
      .as(Seq("band", "chunk")))
    val l = bands.select(col("asset_id").as("id_a"), col("phash").as("fp_a"),
      col("band"), col("chunk"))
    val r = bands.select(col("asset_id").as("id_b"), col("phash").as("fp_b"),
      col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  /** Metadata-only rollup over the binary assets (oracle-checked): the
    * payload participates only through octet_length; Catalyst prunes and
    * pushes the rest. fmt/meta derivation mirrored exactly in DuckDB.
    */
  val qBinaryMeta: Q = Q(
    "q_binary_meta",
    """SELECT source,
      |  CASE (doc_id % 3 + 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'wav' END AS fmt,
      |  COUNT(*) AS n_assets,
      |  CAST(SUM(COALESCE(strlen(text), 0)) AS BIGINT) AS total_bytes,
      |  CAST(MAX(COALESCE(strlen(text), 0)) AS BIGINT) AS max_bytes
      |FROM documents
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    assets(s, d)
      .groupBy(col("source"), col("meta.fmt").as("fmt"))
      .agg(count(lit(1)).as("n_assets"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        max(octet_length(col("payload"))).cast("long").as("max_bytes"))
      .orderBy("source", "fmt")
  }

  /** Feature rollup through the full binary→decode-stub→features path:
    * the batched mapPartitions stays native, but the stub's nBytes/fmt
    * derivation is mirrored in the oracle, so the rollup is hash-exact;
    * the spec additionally pins exact feature values.
    */
  val qMediaFeatures: Q = Q(
    "q_media_features",
    // the batched mapPartitions decode is not SQL-expressible, but the
    // stub's nBytes is the payload length and fmt is doc_id-derived — so
    // the rollup hash-checks the full binary→batch→decode→aggregate path
    """SELECT CASE (doc_id % 3 + 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg'
      |    ELSE 'wav' END AS fmt,
      |  COUNT(*) AS n,
      |  CAST(SUM(strlen(COALESCE(text, ''))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY fmt""".stripMargin
  ) { (s, d) =>
    extractFeatures(assets(s, d)).toDF()
      .groupBy("fmt")
      .agg(count(lit(1)).as("n"),
        sum("nBytes").cast("long").as("total_bytes"))
      .orderBy("fmt")
  }

  val all: Seq[Q] = Seq(qBinaryMeta, qMediaFeatures, qFrameSample)
}
