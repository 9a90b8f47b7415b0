package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta: binary plumbing + deterministic fake decode") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "hello world".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "audio", Array[Byte]()),
      Multimodal.MediaRow(3L, "video", Array[Byte](0x7f, 0x01)))
      .toDS()
    val got = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap

    assert(got(1L).n_bytes === 11L)
    assert(got(1L).width === 16 + 'h'.toInt)
    assert(got(1L).height === 16 + 'e'.toInt)
    assert(got(1L).checksum === "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(got(2L).width === 16 && got(2L).height === 16) // empty payload
    assert(got(3L).width === 16 + 0x7f)
  }

  test("frameSample explodes one row per stride window") {
    val media = Seq((1L, "video", ("x" * 200).getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val frames = Multimodal.frameSample(media, stride = 64)
      .select("frame_idx", "frame_off")
      .as[(Int, Int)].collect().sorted
    assert(frames === Array((0, 0), (1, 64), (2, 128)))
  }

  test("resizeStub caps payload at target byte budget") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", ("a" * 500).getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "image", "tiny".getBytes("UTF-8"))).toDS()
    val out = Multimodal.resizeStub(media, 16, 16).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).n_bytes === 256L && out(1L).width === 16)
    assert(out(2L).n_bytes === 4L, "smaller payloads pass through")
    assert(out(1L).checksum !== out(2L).checksum)
  }

  test("featureStub: dense histogram, counts sum to payload length") {
    val payload = "abcdefgh".getBytes("UTF-8")
    val media = Seq(Multimodal.MediaRow(1L, "audio", payload)).toDS()
    val f = Multimodal.featureStub(media, bins = 8).head().features
    assert(f.length === 8)
    assert(f.sum === payload.length.toLong)
    // 'a'=97 → bin 1; each of a..h lands in a distinct bin of 8
    assert(f.forall(_ === 1L))
  }

  test("aHashStub: bit semantics + banded pairs equal brute force") {
    // bit j (MSB-first) set iff cnt_j*bins strictly exceeds n_bytes
    val skew = Array.fill(10)(0x00.toByte) ++ Array[Byte](0x01)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", skew),
      Multimodal.MediaRow(2L, "image", skew),                // identical
      Multimodal.MediaRow(3L, "image", skew :+ 0x02.toByte), // 1 bit off
      Multimodal.MediaRow(4L, "image",
        Array.tabulate(64)(i => i.toByte)),                  // uniform: all 0
      Multimodal.MediaRow(5L, "image", Array[Byte]()))       // empty: all 0
      .toDS()
    val fps = Multimodal.aHashStub(media, bins = 64).collect()
      .map(h => h.media_id -> h.phash).toMap
    // 10/11 zeros + 1/11 of 0x01: bins 0 and 1 both over 1/64 share
    assert(fps(1L) === ((1L << 63) | (1L << 62)), fps(1L).toBinaryString)
    assert(fps(2L) === fps(1L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) === 1)
    // exactly-uniform and empty payloads have NO strictly-over bins
    assert(fps(4L) === 0L && fps(5L) === 0L)

    val pairs = graft.dedup.Dedup.bandedHammingPairs(
      Multimodal.aHashStub(media, bins = 64).toDF(),
      "media_id", "phash", bits = 64, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 1
    } yield (a, b, h)).toSet
    assert(pairs === brute)
  }

  test("byte semantics, null text, empty payloads, overflow guard") {
    import org.apache.spark.sql.functions._
    // non-ASCII + null + empty corpus: the codec surface is BYTES
    val docs = Seq(
      (0L, "é"),                  // 2 utf-8 bytes: 0xC3 0xA9
      (1L, null.asInstanceOf[String]),
      (2L, "")
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
      .as[Multimodal.MediaRow]
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(0L).n_bytes === 2L)          // bytes, not 1 char
    assert(meta(0L).width === 16 + (0xC3 & 0x7f))
    assert(meta(0L).height === 16 + (0xA9 & 0x7f))
    assert(meta(1L).n_bytes === 0L)          // null text = empty payload
    assert(meta(2L).n_bytes === 0L)

    // per-BYTE histogram: 'é' lands 0xC3%8=3 and 0xA9%8=1
    val f = Multimodal.featureStub(media, bins = 8).collect()
      .map(m => m.media_id -> m.features).toMap
    assert(f(0L).sum === 2L)
    assert(f(0L)(3) === 1L && f(0L)(1) === 1L)

    // empty payloads emit NO phantom frame
    val frames = Multimodal.frameSample(
      Multimodal.mediaFromDocuments(spark, docs), stride = 64)
    assert(frames.count() === 1L)            // only doc 0, frame 0
    assert(frames.select("media_id").as[Long].head() === 0L)

    // 65536x65536 must not Int-overflow to a zero target
    val big = Multimodal.resizeStub(media, 65536, 65536).collect()
      .map(m => m.media_id -> m).toMap
    assert(big(0L).n_bytes === 2L)           // untouched, not truncated
    assert(big(0L).n_bytes_in === 2L)
  }

  test("ImageCodec: gray8 PNG encode/decode is pixel-exact") {
    val (w, h) = (13, 9)
    def pix(x: Int, y: Int): Int = (5 * x + 11 * y + 3) % 256
    val png = Multimodal.ImageCodec.encodeGrayPng(w, h, pix)
    // a real PNG signature, not a stub envelope
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val (dw, dh, px) = Multimodal.ImageCodec.decodeGray(png)
    assert((dw, dh) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) === pix(x, y), s"pixel ($x,$y)")
  }

  test("ImageCodec.aHash: known 8x8 pattern, strict-mean bit rule") {
    // top half 200, bottom half 10: mean 105 → top 32 bits set
    val px = Array.tabulate(64)(i => if (i < 32) 200 else 10)
    val fp = Multimodal.ImageCodec.aHash(8, 8, px)
    assert(fp === 0xFFFFFFFF00000000L)
    // uniform image: no block STRICTLY exceeds the mean → 0
    assert(Multimodal.ImageCodec.aHash(8, 8, Array.fill(64)(77)) === 0L)
  }

  test("decodeImageMeta + resizeImage on the synthetic corpus") {
    val docs = Seq((0L, "x"), (3L, "y"), (6L, "z"), (7L, "skip"))
      .toDF("doc_id", "text")
    val metas = Multimodal.decodeImageMeta(
        Multimodal.syntheticImages(spark, docs))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.keySet === Set(0L, 3L, 6L))
    // ids 0 and 3 share seed 0: identical images; id 6 is seed 1
    assert(metas(0L).ahash === metas(3L).ahash)
    assert(metas(0L).width === 8 && metas(0L).height === 8)
    assert(metas(6L).width === 9 && metas(6L).height === 9)
    // sum_gray replays the formula
    val want0 = (for (y <- 0 until 8; x <- 0 until 8)
      yield (7 * x + 13 * y) % 256).map(_.toLong).sum
    assert(metas(0L).sum_gray === want0)
    assert(metas(0L).mean_gray_micro === want0 * 1000000L / 64)
    // resize of an already-8x8 image is identity
    val rz = Multimodal.resizeImage(
        Multimodal.syntheticImages(spark, docs), 8, 8)
      .collect().map(m => m.media_id -> m).toMap
    assert(rz(0L).sum_gray === metas(0L).sum_gray)
    assert(rz(0L).ahash === metas(0L).ahash)
  }

  test("imageFeatures: decoded-pixel histogram + gradient energy " +
    "replay the formula") {
    val docs = Seq((0L, "x"), (6L, "y"), (12L, "z"))
      .toDF("doc_id", "text")
    val feats = Multimodal.imageFeatures(
        Multimodal.syntheticImages(spark, docs), bins = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(0L, 6L, 12L))
    Seq(0L, 6L, 12L).foreach { id =>
      val seed = id / 6
      val (w, h) = ((8 + seed % 16).toInt, (8 + seed % 8).toInt)
      def p(x: Int, y: Int): Int = ((7 * x + 13 * y + 31 * seed) % 256).toInt
      val pix = for (y <- 0 until h; x <- 0 until w) yield p(x, y)
      val wantHist = (0 until 8).map(b =>
        pix.count(v => v * 8 / 256 == b).toLong)
      val wantE = (for (y <- 0 until h; x <- 0 until w) yield {
        val eh = if (x + 1 < w) math.abs(p(x + 1, y) - p(x, y)) else 0
        val ev = if (y + 1 < h) math.abs(p(x, y + 1) - p(x, y)) else 0
        (eh + ev).toLong
      }).sum
      val f = feats(id)
      assert(f.width === w && f.height === h)
      assert(f.hist === wantHist, s"hist for id $id")
      assert(f.edge_energy === wantE, s"edge energy for id $id")
      assert(f.hist.sum === w.toLong * h)
    }
  }

  test("imageFeatures saturates >8-bit samples instead of crashing") {
    // a 16-bit grayscale PNG decodes to samples up to 65535; the
    // histogram index must clamp to the top bin, not overrun the array
    val img = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 10; x <- 0 until 10)
      raster.setSample(x, y, 0, if (x < 5) 70000 % 65536 else 100)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val rows = Seq(Multimodal.ImageRow(1L, out.toByteArray)).toDS()
    val f = Multimodal.imageFeatures(rows, bins = 8).collect().head
    assert(f.hist.sum === 100L)
    assert(f.hist(7) === 50L, s"16-bit samples must clip to the top bin: ${f.hist}")
    assert(f.hist(3) === 50L, s"8-bit-range samples bin normally: ${f.hist}")
  }

  test("VideoContainer: mux/demux round-trips frame payloads exactly") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](),
      Array.tabulate(300)(_.toByte))
    val got = Multimodal.VideoContainer.demux(
      Multimodal.VideoContainer.mux(frames))
    assert(got.size === 3)
    frames.zip(got).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    intercept[Exception] {
      Multimodal.VideoContainer.demux("not a container".getBytes)
    }
  }

  test("decodeVideoFrames: stride sampling, pixel sums, scene delta") {
    val docs = Seq((2L, "v"), (5L, "w"), (6L, "not-video"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodeVideoFrames(
        Multimodal.syntheticVideos(spark, docs), stride = 2)
      .collect().groupBy(_.media_id)
    assert(got.keySet === Set(2L, 5L))
    // id=2: w=10, h=18, nf=6 → sampled frames 0,2,4
    val f2 = got(2L).sortBy(_.frame_idx)
    assert(f2.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(f2.forall(m => m.width === 10 && m.height === 18))
    def pix(id: Long, f: Int)(x: Int, y: Int): Long =
      (7 * x + 13 * y + 19 * f + 31 * id) % 256
    val want0 = (for (y <- 0 until 18; x <- 0 until 10)
      yield pix(2L, 0)(x, y)).sum
    assert(f2(0).sum_gray === want0)
    assert(f2(0).delta_prev === 0L)
    // frame 2's delta is vs container frame 1, not vs sampled frame 0
    val want2 = (for (y <- 0 until 18; x <- 0 until 10)
      yield math.abs(pix(2L, 2)(x, y) - pix(2L, 1)(x, y))).sum
    assert(f2(1).delta_prev === want2)
  }

  test("AudioCodec: WAV PCM16 encode/decode is sample-exact") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = Multimodal.AudioCodec.encodeWavPcm16(8000, samples)
    // a real RIFF/WAVE container, not a stub envelope
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (rate, got) = Multimodal.AudioCodec.decodePcm16(wav)
    assert(rate === 8000)
    assert(got.toSeq === samples.toSeq)
  }

  test("decodeAudioMeta + audioFrames on the synthetic corpus") {
    val docs = Seq((1L, "a"), (4L, "b"), (6L, "not-audio"))
      .toDF("doc_id", "text")
    val metas = Multimodal.decodeAudioMeta(
        Multimodal.syntheticAudio(spark, docs))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.keySet === Set(1L, 4L))
    // replay the closed formula for id=1: n = 256 + 64*(1%7) = 320
    val s1 = (0 until 320).map(i =>
      ((7L * i * i + 13L * i + 31L) % 65536L - 32768L).toInt)
    val m1 = metas(1L)
    assert(m1.sample_rate === 8000)
    assert(m1.n_samples === 320L)
    assert(m1.sum_abs === s1.map(v => math.abs(v).toLong).sum)
    assert(m1.sum_sq === s1.map(v => v.toLong * v).sum)
    assert(m1.peak_abs === s1.map(math.abs).max)
    assert(m1.zero_crossings ===
      s1.sliding(2).count(p => p(0).toLong * p(1) < 0).toLong)
    // frames tile the signal exactly; frame sums rebuild the total
    val frames = Multimodal.audioFrames(
        Multimodal.syntheticAudio(spark, docs), frameLen = 64)
      .collect().filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(frames.length === 5)
    assert(frames.map(_.n).toSeq === Seq.fill(5)(64))
    assert(frames.map(_.sum_abs).sum === m1.sum_abs)
    assert(frames.map(_.peak_abs).max === m1.peak_abs)
  }
}
