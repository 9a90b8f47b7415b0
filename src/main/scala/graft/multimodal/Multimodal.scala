package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * Two codec tiers share one distributed shape (binary parquet column →
  * `mapPartitions` with per-partition codec init → typed Dataset, the
  * Scala analog of `mapInPandas`):
  *  - [[FakeCodec]] byte-envelope stubs, standing in for codecs the
  *    JVM lacks (audio/video);
  *  - a REAL image path on pure-JVM `javax.imageio`
  *    ([[ImageCodec]] / [[decodeImageMeta]] / [[resizeImage]]): PNG
  *    bytes in, actual pixel rasters out — decode, resize, and
  *    real-pixel perceptual hashing with no native dependencies.
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
    * single pass over the payload — the byte-ENVELOPE seam for the
    * audio/video codecs the JVM does not ship. For images the real
    * path exists: [[imageFeatures]] computes the histogram and
    * gradient energy over DECODED pixels. */
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

  // ---- real image codec (javax.imageio, pure JVM) --------------------------

  /** One image asset: id + PNG payload bytes. */
  case class ImageRow(media_id: Long, payload: Array[Byte])

  /** Decoded image metadata + real-pixel fingerprint. Integer-exact
    * fields only (pixel sums, floor-div micros, the aHash bit rule) so
    * a SQL twin that knows the pixel source can reproduce every cell. */
  case class ImageMeta(media_id: Long, width: Int, height: Int,
                       n_pixels: Long, sum_gray: Long,
                       mean_gray_micro: Long, ahash: Long)

  /** Real image codec on `javax.imageio` — the decode seam the byte
    * stubs above stand in for, now with actual pixels: PNG (and BMP/GIF,
    * anything ImageIO reads) → 8-bit gray raster, no native libs. The
    * distributed shape is IDENTICAL to the stub path: binary parquet
    * column in, `mapPartitions` decode with per-partition codec setup,
    * typed Dataset out — swapping the stub for this changed nothing
    * structural, which is what the stub was for. */
  object ImageCodec {
    import java.awt.image.BufferedImage

    /** Encode a w×h 8-bit grayscale PNG from a pixel function
      * (losslessly round-trippable: PNG gray8 is exact). */
    def encodeGrayPng(w: Int, h: Int, pix: (Int, Int) => Int)
    : Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, pix(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode → gray samples (row-major) + dims. Any ImageIO-readable
      * format; multi-band images collapse to band 0. */
    def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      (w, h, px)
    }

    /** Average-hash over REAL pixels: 8×8 blocks (block of pixel (x,y)
      * is (⌊8y/h⌋, ⌊8x/w⌋)), bit MSB-first per block, set iff the
      * block's mean STRICTLY exceeds the image mean — integer
      * cross-multiplied (blockSum·nTotal > totalSum·nBlock), so the
      * threshold is engine-exact. Requires w,h ≥ 8. */
    def aHash(w: Int, h: Int, px: Array[Int]): Long = {
      require(w >= 8 && h >= 8, s"aHash needs >=8x8, got ${w}x$h")
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val b = by * 8 + x * 8 / w
          sums(b) += px(y * w + x)
          cnts(b) += 1
          total += px(y * w + x)
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (sums(b) * n > total * cnts(b)) fp |= 1L << (63 - b)
        b += 1
      }
      fp
    }
  }

  /** Synthetic image corpus from the documents table: one grayscale PNG
    * per image-kind doc, pixels from the closed formula
    * `p(x,y) = (7x + 13y + 31·(id div 6)) mod 256` with dims
    * `w = 8 + (id div 6) mod 16`, `h = 8 + (id div 6) mod 8` — REAL
    * encoded PNG bytes (this is what a staged image lake column holds),
    * yet every downstream pixel statistic is SQL-reproducible from the
    * formula alone, so the decode path gets a full oracle. The
    * `id div 6` seed plants identical images (ids 6k and 6k+3 share a
    * seed) — deterministic near-dup ground truth for the pHash pairs.
    * Encode runs in `mapPartitions` (codec never touches the driver). */
  def syntheticImages(spark: SparkSession, docs: DataFrame)
  : Dataset[ImageRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val seed = id / 6
          val w = (8 + seed % 16).toInt
          val h = (8 + seed % 8).toInt
          ImageRow(id, ImageCodec.encodeGrayPng(w, h,
            (x, y) => ((7 * x + 13 * y + 31 * seed) % 256).toInt))
        }
      }
  }

  /** Real decode: PNG bytes → dims, pixel sums, mean micros, aHash —
    * the non-stub [[decodeMeta]]. Partition-local; `ImageIO` disk
    * caching off so decode never touches task-local tmp files. */
  def decodeImageMeta(images: Dataset[ImageRow]): Dataset[ImageMeta] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.payload)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        val n = w.toLong * h
        ImageMeta(r.media_id, w, h, n, sum,
          if (n == 0) 0L else sum * 1000000L / n,
          ImageCodec.aHash(w, h, px))
      }
    }
  }

  /** Per-image REAL-pixel feature row: value-range histogram + integer
    * gradient energy. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           hist: Seq[Long], edge_energy: Long)

  /** Real-pixel feature extraction — the non-stub [[featureStub]] for
    * the image modality: decode, then (1) a `bins`-bin VALUE histogram
    * over the gray samples (bin = p·bins div 256 — the global tone
    * signature retrieval/quality filters consume) and (2) integer
    * gradient energy Σ|p(x+1,y)−p(x,y)| + Σ|p(x,y+1)−p(x,y)| (the
    * blur/flat-image detector: near-zero energy means no texture —
    * synthetic gradients, solid fills, corrupted decodes). All
    * integer, partition-local in the codec pass; the synthetic-corpus
    * oracle reproduces every cell from the closed pixel formula.
    * [[featureStub]] remains the byte-envelope seam for codecs the
    * JVM does not ship (its docstring says which). */
  def imageFeatures(images: Dataset[ImageRow], bins: Int)
  : Dataset[ImageFeatures] = {
    require(bins >= 1 && bins <= 256, s"bins must be 1..256: $bins")
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.payload)
        // decodeGray passes raw raster samples through: a 16-bit
        // grayscale PNG yields values up to 65535, which would index
        // past the bins array — saturate to the 8-bit range ONCE, so
        // BOTH features (tone histogram and gradient energy) see the
        // same sample domain; clamping only the histogram would make
        // two features of one decode disagree on >8-bit inputs
        var i = 0
        while (i < px.length) {
          if (px(i) > 255) px(i) = 255
          i += 1
        }
        val counts = new Array[Long](bins)
        i = 0
        while (i < px.length) {
          counts(px(i) * bins / 256) += 1
          i += 1
        }
        var e = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = px(y * w + x)
            if (x + 1 < w) e += math.abs(px(y * w + x + 1) - p)
            if (y + 1 < h) e += math.abs(px((y + 1) * w + x) - p)
            x += 1
          }
          y += 1
        }
        ImageFeatures(r.media_id, w, h, counts.toSeq, e)
      }
    }
  }

  // ---- real video path: container demux + per-frame image decode -----------

  /** One video asset: id + container payload bytes. */
  case class VideoRow(media_id: Long, payload: Array[Byte])

  /** Per-frame decoded features — integer-exact (pixel sums, aHash,
    * abs-delta vs previous frame for scene-cut scoring). */
  case class VideoFrameMeta(media_id: Long, frame_idx: Int, width: Int,
                            height: Int, sum_gray: Long, ahash: Long,
                            delta_prev: Long)

  /** Minimal length-prefixed frame container ("GVID"): magic + frame
    * count + [int32 length][PNG bytes]·n. The JVM ships no real video
    * DEMUXER/codec, so the container format is ours — but everything a
    * video pipeline does AFTER demux is real here: per-frame ImageIO
    * decode, stride sampling, per-frame fingerprints, frame-delta
    * scene scoring, all partition-local. Swapping in an MP4 demuxer
    * changes only [[demux]]. Big-endian via DataOutputStream. */
  object VideoContainer {
    private val Magic = Array[Byte]('G', 'V', 'I', 'D')

    def mux(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(Magic)
      out.writeInt(frames.size)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      out.flush()
      bos.toByteArray
    }

    def demux(payload: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(magic.sameElements(Magic), "not a GVID container")
      val n = in.readInt()
      (0 until n).map { _ =>
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        buf
      }
    }
  }

  /** Synthetic video corpus: one container per video-kind doc,
    * `4 + id mod 4` gray8 PNG frames of `(8 + id mod 8)×(8 + id mod 4
    * + 8)` pixels, frame f pixel `p(x,y,f) = (7x + 13y + 19f + 31·id)
    * mod 256` — real encoded frames, SQL-replayable values. */
  def syntheticVideos(spark: SparkSession, docs: DataFrame)
  : Dataset[VideoRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (8 + id % 8).toInt
          val h = (8 + id % 4).toInt + 8
          val nf = (4 + id % 4).toInt
          VideoRow(id, VideoContainer.mux((0 until nf).map { f =>
            ImageCodec.encodeGrayPng(w, h,
              (x, y) => ((7 * x + 13 * y + 19 * f + 31 * id) % 256).toInt)
          }))
        }
      }
  }

  /** Real per-frame decode with stride sampling: demux the container,
    * decode every `stride`-th frame (plus its container-predecessor),
    * emit pixel sum, real-pixel aHash, and the abs-pixel delta against
    * the previous CONTAINER frame — the scene-cut statistic (frame 0 →
    * delta 0). Partition-local: codec setup once per task, one
    * container in memory at a time. */
  def decodeVideoFrames(videos: Dataset[VideoRow], stride: Int)
  : Dataset[VideoFrameMeta] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import videos.sparkSession.implicits._
    videos.flatMap { r =>
      javax.imageio.ImageIO.setUseCache(false)
      val frames = VideoContainer.demux(r.payload)
      frames.indices.collect {
        case f if f % stride == 0 =>
          val (w, h, px) = ImageCodec.decodeGray(frames(f))
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i); i += 1 }
          val delta =
            if (f == 0) 0L
            else {
              val (_, _, prev) = ImageCodec.decodeGray(frames(f - 1))
              var d = 0L
              var j = 0
              while (j < px.length) {
                d += math.abs(px(j) - prev(j)); j += 1
              }
              d
            }
          VideoFrameMeta(r.media_id, f, w, h, sum,
            ImageCodec.aHash(w, h, px), delta)
      }
    }
  }

  // ---- real audio codec (javax.sound.sampled, pure JVM) --------------------

  /** One audio asset: id + WAV payload bytes. */
  case class AudioRow(media_id: Long, payload: Array[Byte])

  /** Decoded audio metadata — integer-exact features only (abs/square
    * sums, strict-sign zero crossings) so a SQL twin that knows the
    * sample source reproduces every cell; RMS/dB stay derivable
    * downstream from sum_sq without forcing a float here. */
  case class AudioMeta(media_id: Long, sample_rate: Int, n_samples: Long,
                       sum_abs: Long, sum_sq: Long, peak_abs: Int,
                       zero_crossings: Long)

  /** Per-frame audio features: the frame-sample analog with real DSP
    * content (windowed energy), one row per fixed-length frame. */
  case class AudioFrame(media_id: Long, frame_idx: Int, n: Int,
                        sum_abs: Long, peak_abs: Int)

  /** Real audio codec on `javax.sound.sampled` — WAV PCM16 mono,
    * little-endian, lossless round trip, no native libs. Same seam and
    * batch shape as [[ImageCodec]]. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Encode signed 16-bit mono PCM samples as a WAV container. */
    def encodeWavPcm16(sampleRate: Int, samples: Array[Short])
    : Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV payload → (sampleRate, PCM16 samples). */
    def decodePcm16(payload: Array[Byte]): (Int, Array[Short]) = {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val samples = new Array[Short](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) {
          samples(i) = (((bytes(2 * i) & 0xff) << 8) |
            (bytes(2 * i + 1) & 0xff)).toShort
          i += 1
        }
      else
        while (i < n) {
          samples(i) = (((bytes(2 * i + 1) & 0xff) << 8) |
            (bytes(2 * i) & 0xff)).toShort
          i += 1
        }
      (math.round(fmt.getSampleRate), samples)
    }
  }

  /** Synthetic audio corpus from the documents table: one WAV per
    * audio-kind doc, samples from the closed formula
    * `s(i) = ((7i² + 13i + 31·id) mod 65536) − 32768` over
    * `n = 256 + 64·(id mod 7)` samples at 8 kHz — real encoded WAV
    * bytes, SQL-replayable sample values (the PCM16 round trip is
    * lossless). Encode runs in `mapPartitions`. */
  def syntheticAudio(spark: SparkSession, docs: DataFrame)
  : Dataset[AudioRow] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (256 + 64 * (id % 7)).toInt
          val samples = Array.tabulate(n) { i =>
            (((7L * i * i + 13L * i + 31L * id) % 65536L) - 32768L)
              .toShort
          }
          AudioRow(id, AudioCodec.encodeWavPcm16(8000, samples))
        }
      }
  }

  /** Real decode: WAV bytes → rate, counts, energy sums, peak, strict
    * zero crossings (s_i·s_{i−1} < 0). Partition-local. */
  def decodeAudioMeta(audio: Dataset[AudioRow]): Dataset[AudioMeta] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (rate, s) = AudioCodec.decodePcm16(r.payload)
        var sumAbs = 0L
        var sumSq = 0L
        var peak = 0
        var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumAbs += a
          sumSq += v.toLong * v
          if (a > peak) peak = a
          if (i > 0 && v.toLong * s(i - 1) < 0) zc += 1
          i += 1
        }
        AudioMeta(r.media_id, rate, s.length.toLong, sumAbs, sumSq,
          peak, zc)
      }
    }
  }

  /** Real windowed frame features: fixed `frameLen`-sample frames
    * (tail partial frame kept), per-frame energy + peak — the audio
    * counterpart of [[frameSample]] with actual signal content. */
  def audioFrames(audio: Dataset[AudioRow], frameLen: Int)
  : Dataset[AudioFrame] = {
    require(frameLen >= 1, s"frameLen must be >= 1: $frameLen")
    import audio.sparkSession.implicits._
    audio.flatMap { r =>
      val (_, s) = AudioCodec.decodePcm16(r.payload)
      (0 until (s.length + frameLen - 1) / frameLen).map { f =>
        val lo = f * frameLen
        val hi = math.min(lo + frameLen, s.length)
        var sumAbs = 0L
        var peak = 0
        var i = lo
        while (i < hi) {
          val a = math.abs(s(i).toInt)
          sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        AudioFrame(r.media_id, f, hi - lo, sumAbs, peak)
      }
    }
  }

  /** Real nearest-neighbor resize: decode, sample
    * `out(x,y) = in(⌊x·w/w2⌋, ⌊y·h/h2⌋)`, re-encode PNG — exact (no
    * interpolation, so no JVM-version float wobble) and therefore
    * oracle-checkable pixel-for-pixel. Same seam and batch shape as
    * [[resizeStub]]. */
  def resizeImage(images: Dataset[ImageRow], w2: Int, h2: Int)
  : Dataset[ImageMeta] = {
    require(w2 >= 8 && h2 >= 8, s"resize target >=8x8: ${w2}x$h2")
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.payload)
        val rp = new Array[Int](w2 * h2)
        var y = 0
        while (y < h2) {
          val sy = y * h / h2
          var x = 0
          while (x < w2) {
            rp(y * w2 + x) = px(sy * w + x * w / w2)
            x += 1
          }
          y += 1
        }
        var sum = 0L
        var i = 0
        while (i < rp.length) { sum += rp(i); i += 1 }
        val n = w2.toLong * h2
        ImageMeta(r.media_id, w2, h2, n, sum, sum * 1000000L / n,
          ImageCodec.aHash(w2, h2, rp))
      }
    }
  }
}
