package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The decode step is a STUB (no image/audio codecs in this container):
  * [[FakeCodec]] derives deterministic "dimensions"/"features" from the
  * bytes. Everything around it — the binary column plumbing, the typed
  * batch signature, the partition-local iteration (the Scala analog of
  * `mapInPandas`: one invocation per batch of rows, never per row on the
  * driver), and the metadata schema — is real and tested; swapping
  * [[FakeCodec.decode]] for a JNI/ImageIO call changes nothing structural.
  *
  * Scale notes: payload bytes stay columnar in parquet (binary column, no
  * base64 inflation); decode runs inside `mapPartitions` so codec init is
  * amortized per partition, not per row; the output is a typed Dataset so
  * downstream stages keep codegen.
  */
object Multimodal {

  /** One media row: payload + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded envelope: what a real image decode would yield. */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, checksum: String)

  /** Deterministic fake codec — stands in for e.g. javax.imageio /
    * ffmpeg. "Width/height" are stable functions of the payload bytes so
    * tests and oracles can reproduce them. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      val w = 16 + (if (n == 0) 0 else (payload(0) & 0x7f))
      val h = 16 + (if (n < 2) 0 else (payload(1) & 0x7f))
      (w, h)
    }
  }

  /** Batch decode: binary payloads → typed metadata, partition-local.
    * Batch shape: the iterator is consumed lazily per partition — constant
    * memory per task regardless of partition row count. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init (amortized, like a Pandas UDF's
      // per-batch setup) — one digest instance per task, never per row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h) = FakeCodec.decode(r.payload)
        md.reset()
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong, w, h,
          md.digest(r.payload).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Resized envelope: fixed target dimensions + truncated payload.
    * `n_bytes_in` records the source size (what a real resize logs) —
    * and lets the oracle distinguish truncated from exact-fit rows. */
  case class MediaResized(media_id: Long, kind: String, width: Int,
                          height: Int, n_bytes_in: Long, n_bytes: Long,
                          checksum: String)

  /** Byte-histogram "feature vector" (the stub for a CNN/CLIP embedding
    * step): counts per bin, dense, fixed length. Raw counts rather than
    * ratios — integer outputs are engine-exact where a float division's
    * last bit is not. */
  case class MediaFeatures(media_id: Long, kind: String,
                           features: Seq[Long])

  /** Resize stub: cap the payload at width×height bytes (a real resize
    * shrinks pixels; the stub shrinks bytes — same batch shape, schema,
    * and partition-locality). */
  def resizeStub(media: Dataset[MediaRow], width: Int, height: Int)
  : Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    // LONG target: 65536×65536 overflows Int to 0 and would silently
    // truncate every payload to empty instead of keeping them whole
    val target = width.toLong * height.toLong
    require(target > 0, s"resize target must be positive: ${width}x$height")
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val out =
          if (r.payload.length > target)
            r.payload.take(target.min(Int.MaxValue).toInt)
          else r.payload
        md.reset()
        MediaResized(r.media_id, r.kind, width, height,
          r.payload.length.toLong, out.length.toLong,
          md.digest(out).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Feature-extract stub: dense per-bin byte histogram, partition-local
    * single pass over the payload. */
  def featureStub(media: Dataset[MediaRow], bins: Int)
  : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val counts = new Array[Long](bins)
        r.payload.foreach(b => counts((b & 0xff) % bins) += 1)
        MediaFeatures(r.media_id, r.kind, counts.toSeq)
      }
    }
  }

  /** Perceptual fingerprint row: 64-bit average-hash of the payload. */
  case class MediaHash(media_id: Long, kind: String, phash: Long)

  /** Perceptual-hash stub (average-hash): bit j — MSB-first over `bins`
    * histogram bins — is set iff bin j's byte count STRICTLY exceeds
    * the uniform share (cnt_j · bins > n_bytes, integer
    * cross-multiplied so the threshold is engine-exact). The real
    * operator aHashes an 8×8 grayscale downsample; the stub aHashes
    * the byte histogram — same shape: a fixed-width fingerprint whose
    * hamming distance measures payload similarity, computed
    * partition-local in the codec pass. Feeds
    * [[graft.dedup.Dedup.bandedHammingPairs]] for image near-dup
    * pairs without any all-pairs comparison. Use bins = 64 when
    * banding: narrower widths leave constant-zero trailing bits that
    * degrade a trailing band's selectivity (pass bits = bins there). */
  def aHashStub(media: Dataset[MediaRow], bins: Int = 64)
  : Dataset[MediaHash] = {
    require(bins >= 1 && bins <= 64, s"aHash bins must be 1..64: $bins")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val counts = new Array[Long](bins)
        r.payload.foreach(b => counts((b & 0xff) % bins) += 1)
        val n = r.payload.length.toLong
        var fp = 0L
        var j = 0
        while (j < bins) {
          if (counts(j) * bins > n) fp |= 1L << (bins - 1 - j)
          j += 1
        }
        MediaHash(r.media_id, r.kind, fp)
      }
    }
  }

  /** Frame-sample stub: pick every `stride`-th byte window as a "frame" —
    * the plumbing (explode to one row per frame with an index) matches what
    * real video frame extraction produces. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      // a zero-byte payload has no windows: without the filter the
      // greatest(..., 0) floor would fabricate one phantom frame at
      // offset 0 for every empty asset
      .filter(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((col("n_bytes") / stride).cast("int") - 1, lit(0)))))
      .withColumn("frame_off", col("frame_idx") * stride)
      .select("media_id", "kind", "frame_idx", "frame_off")

  /** Build a media table from the documents corpus (no binary testdata is
    * shipped, so payloads are the utf-8 text bytes — deterministic and
    * oracle-reproducible via DuckDB's encode()). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      // null-safe: a NULL text would NPE every typed codec stub —
      // an absent payload is an EMPTY payload here (both engines agree)
      encode(coalesce(col("text"), lit("")), "utf-8").cast("binary")
        .as("payload"))
}
