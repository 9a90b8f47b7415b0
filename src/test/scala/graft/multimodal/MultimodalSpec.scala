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
}
