package graft

import graft.Staging._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.graph.{Graph, Walks}
import graft.multimodal.Multimodal
import graft.ops.{analytics, asof, baskets, expectations, exprs, qsketch, rangejoin, sketches, sweepline, timeseries, windows}
import graft.similarity.{LabelEval, Similarity}
import graft.sources.{HtmlTables, Layout, StagedSources}
import graft.streaming.Streams
import graft.text.{Bpe, Importance, Packing, SuffixArray, Text}

/** binary-column decode / frames / resize / perceptual-hash — the Multimodal slice of the
  * extension surface, split out of [[ExtensionQueries]] (round 12)
  * with zero behavior change: entries are verbatim; shared artifact
  * helpers and oracle CTE fragments stay package-private in
  * [[ExtensionQueries]]. Composed back in [[ExtensionQueries.queries]]
  * / [[ExtensionQueries.oracleSql]]. */
private[graft] object MultimodalQueries {
  import Tables.t
  import ExtensionQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- multimodal --------------------------------------------------------
    "q_mm_decode" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal
        .mediaFromDocuments(s, t(s, d, "documents"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeMeta(media).toDF()
    }),

    "q_mm_frames" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.mediaFromDocuments(s, t(s, d, "documents")), stride = 64)),

    // checksum is oracle-checked only for UNTRUNCATED payloads: DuckDB
    // has no hash-of-byte-slice (md5/sha256 take VARCHAR, and a 256-byte
    // prefix can split a UTF-8 character), so truncated rows carry a
    // marker; sizes are verified for every row either way
    "q_mm_resize" -> ((s, d) => {
      import s.implicits._
      Multimodal.resizeStub(
        Multimodal.mediaFromDocuments(s, t(s, d, "documents"))
          .as[Multimodal.MediaRow], width = 16, height = 16).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_bytes_in"), col("n_bytes"),
          when(col("n_bytes_in") <= 256L, col("checksum"))
            .otherwise(lit("truncated")).as("checksum"))
    }),

    "q_mm_features" -> ((s, d) => {
      import s.implicits._
      // features joined to a scalar string: the driver's comparator
      // can't sort/hash array-typed cells
      Multimodal.featureStub(
        Multimodal.mediaFromDocuments(s, t(s, d, "documents"))
          .as[Multimodal.MediaRow], bins = 8).toDF()
        .select(col("media_id"), col("kind"),
          array_join(col("features").cast("array<string>"), ",")
            .as("features"))
    }),

    // ---- image near-dup pairs via perceptual hash -------------------------
    // cross-modality dedup: 64-bit average-hash fingerprints from the
    // codec stub, pairs via the lossless pigeonhole band join — no
    // image ever compares against all others
    "q_mm_phash_pairs" -> ((s, d) => {
      import s.implicits._
      val fps = Multimodal.aHashStub(
        Multimodal.mediaFromDocuments(s, t(s, d, "documents"))
          .filter(col("kind") === "image").as[Multimodal.MediaRow],
        bins = 64).toDF()
      graft.dedup.Dedup.bandedHammingPairs(fps, "media_id", "phash",
        bits = 64, maxHamming = 1)
    }),

    // the production form of image dedup: pair hits → connected
    // components → keep one canonical image per cluster. Pair output
    // is quadratic in an identical-fingerprint cluster by definition;
    // the KEEP decision is linear in the corpus, which is what a
    // 100 TB pipeline persists
    "q_mm_phash_keep" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, t(s, d, "documents"))
        .filter(col("kind") === "image")
      val fps = Multimodal.aHashStub(
        media.as[Multimodal.MediaRow], bins = 64).toDF()
      val pairs = graft.dedup.Dedup.bandedHammingPairs(fps, "media_id",
        "phash", bits = 64, maxHamming = 1)
      graft.dedup.Dedup.keepCanonical(media.select("media_id"),
        "media_id", pairs, "doc_a", "doc_b")
    }),

    // WIDENED-radius Hamming search over the same aHash fingerprints:
    // pigeonhole banding stays lossless at ANY radius by construction
    // (nBands = maxHamming + 1, so two fps within the radius agree on
    // ≥ 1 band — DedupSpec pins the property across widths/radii);
    // this query hash-locks the radius-3 cut against the oracle's
    // exhaustive all-pairs twin
    "q_mm_phash_radius" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, t(s, d, "documents"))
        .filter(col("kind") === "image")
      val fps = Multimodal.aHashStub(
        media.as[Multimodal.MediaRow], bins = 64).toDF()
      graft.dedup.Dedup.bandedHammingPairs(fps, "media_id", "phash",
          bits = 64, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // ---- real image codec (javax.imageio): decode on actual pixels --------
    // deterministic grayscale PNGs encoded per partition, decoded back
    // through ImageIO — dims, integer pixel sums, floor-micros mean and
    // the real-pixel 8×8 aHash, every cell reproducible by the oracle
    // from the closed pixel formula
    "q_mm_decode_real" -> ((s, d) =>
      Multimodal.decodeImageMeta(
        Multimodal.syntheticImages(s, t(s, d, "documents"))).toDF()
        .orderBy("media_id")),

    // REAL-pixel feature extraction (the non-stub q_mm_features):
    // decoded-gray value histogram + integer gradient energy, every
    // cell replayed by the oracle from the closed pixel formula
    "q_mm_features_real" -> ((s, d) =>
      Multimodal.imageFeatures(
        Multimodal.syntheticImages(s, t(s, d, "documents")), bins = 8)
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          array_join(col("hist").cast("array<string>"), ",").as("hist"),
          col("edge_energy"))
        .orderBy("media_id")),

    // real nearest-neighbor resize to 8×8: decode → integer sample grid
    // → re-encode; no interpolation, so pixel-exact cross-engine
    "q_mm_resize_real" -> ((s, d) =>
      Multimodal.resizeImage(
        Multimodal.syntheticImages(s, t(s, d, "documents")),
        w2 = 8, h2 = 8).toDF()
        .orderBy("media_id")),

    // near-dup image pairs over REAL-pixel aHashes (planted identical
    // images share an `id div 6` seed) through the same lossless
    // pigeonhole band join as the byte-stub pipeline
    "q_mm_phash_real_pairs" -> ((s, d) => {
      val fps = Multimodal.decodeImageMeta(
        Multimodal.syntheticImages(s, t(s, d, "documents"))).toDF()
        .select(col("media_id"), col("ahash"))
      graft.dedup.Dedup.bandedHammingPairs(fps, "media_id", "ahash",
        bits = 64, maxHamming = 1)
    }),

    // ---- real video path: container demux + per-frame ImageIO decode ------
    // stride-2 frame sampling with real pixel decode per frame:
    // per-frame gray sums, real-pixel aHash, and the abs-pixel delta vs
    // the previous frame (the scene-cut statistic) — all reproducible
    // by the oracle from the closed frame-pixel formula
    "q_mm_video_frames" -> ((s, d) =>
      Multimodal.decodeVideoFrames(
        Multimodal.syntheticVideos(s, t(s, d, "documents")),
        stride = 2).toDF()
        .orderBy("media_id", "frame_idx")),

    // ---- real audio codec (javax.sound.sampled): WAV PCM16 decode ---------
    // deterministic WAVs encoded per partition, decoded back through
    // AudioSystem — integer energy sums, peak, strict zero crossings,
    // every cell reproducible by the oracle from the sample formula
    "q_mm_audio_decode" -> ((s, d) =>
      Multimodal.decodeAudioMeta(
        Multimodal.syntheticAudio(s, t(s, d, "documents"))).toDF()
        .orderBy("media_id")),

    // real windowed frame features over the decoded signal: per-frame
    // energy + peak — frame sampling with actual DSP content
    "q_mm_audio_frames" -> ((s, d) =>
      Multimodal.audioFrames(
        Multimodal.syntheticAudio(s, t(s, d, "documents")),
        frameLen = 64).toDF()
        .orderBy("media_id", "frame_idx")),
  )

  def oracleSql: Map[String, String] = Map(
    // BYTE semantics throughout (the payload is the utf-8 encoding):
    // sizes via strlen (bytes, not chars), width/height from the first
    // two BYTES & 0x7f via hex pairs — ascii(substr(...)) would read
    // code points and diverge on the first non-ASCII character
    "q_mm_decode" ->
      """WITH m AS (SELECT doc_id, coalesce(text, '') AS tx,
                           hex(encode(coalesce(text, ''))) AS hx
                    FROM documents)
         SELECT doc_id AS media_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                strlen(tx)::BIGINT AS n_bytes,
                16 + CASE WHEN strlen(tx) >= 1 THEN
                  ('0x' || substr(hx, 1, 2))::INT & 127 ELSE 0 END
                  AS width,
                16 + CASE WHEN strlen(tx) >= 2 THEN
                  ('0x' || substr(hx, 3, 2))::INT & 127 ELSE 0 END
                  AS height,
                md5(tx) AS checksum
         FROM m""",

    // byte lengths (strlen); zero-byte payloads emit NO frames
    "q_mm_frames" ->
      """SELECT doc_id AS media_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                unnest(generate_series(0,
                  greatest((strlen(coalesce(text, '')) // 64)::INT - 1,
                           0))) AS frame_idx,
                unnest(generate_series(0,
                  greatest((strlen(coalesce(text, '')) // 64)::INT - 1,
                           0))) * 64 AS frame_off
         FROM documents
         WHERE strlen(coalesce(text, '')) > 0""",

    // byte sizes; checksum asserted only for untruncated payloads (see
    // the Spark side's comment — no hash-of-byte-slice in DuckDB)
    "q_mm_resize" ->
      """WITH m AS (SELECT doc_id, coalesce(text, '') AS tx
                    FROM documents)
         SELECT doc_id AS media_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                16 AS width, 16 AS height,
                strlen(tx)::BIGINT AS n_bytes_in,
                least(strlen(tx), 256)::BIGINT AS n_bytes,
                CASE WHEN strlen(tx) <= 256 THEN md5(tx)
                     ELSE 'truncated' END AS checksum
         FROM m""",

    // one bin per BYTE of the utf-8 payload (hex-pair decode), not per
    // character code point — matches featureStub's (b & 0xff) % bins
    "q_mm_features" ->
      """WITH per AS (
           SELECT doc_id, bin, COUNT(*) AS cnt FROM (
             SELECT doc_id,
                    ('0x' || substr(hex(encode(coalesce(text, ''))),
                      2 * unnest(generate_series(1,
                        strlen(coalesce(text, '')))) - 1, 2))::INT
                      % 8 AS bin
             FROM documents)
           GROUP BY doc_id, bin),
         dense AS (
           SELECT d.doc_id, r.b AS bin, COALESCE(p.cnt, 0) AS cnt
           FROM documents d CROSS JOIN range(8) r(b)
           LEFT JOIN per p ON p.doc_id = d.doc_id AND p.bin = r.b)
         SELECT doc_id AS media_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                array_to_string(list(cnt ORDER BY bin), ',') AS features
         FROM dense GROUP BY doc_id""",

    // the real video path: the twin replays the per-frame pixel formula
    // p(x,y,f) = (7x+13y+19f+31·id) mod 256 — dims ≤ 15×19, ≤ 7 frames,
    // stride 2; delta vs the previous container frame (0 for frame 0)
    "q_mm_video_frames" ->
      """WITH vid AS (SELECT doc_id AS media_id,
                             (8 + doc_id % 8)::INT AS w,
                             (16 + doc_id % 4)::INT AS h,
                             (4 + doc_id % 4)::INT AS nf
                      FROM documents WHERE doc_id % 3 = 2),
         fr AS (SELECT v.media_id, v.w, v.h, f.f::INT AS f
                FROM vid v CROSS JOIN range(8) f(f)
                WHERE f.f < v.nf AND f.f % 2 = 0),
         px AS (SELECT r.media_id, r.f, r.w, r.h, xs.x::INT AS x,
                       ys.y::INT AS y,
                       ((7 * xs.x + 13 * ys.y + 19 * r.f
                         + 31 * r.media_id) % 256)::BIGINT AS p,
                       CASE WHEN r.f = 0 THEN 0
                            ELSE ABS(((7 * xs.x + 13 * ys.y + 19 * r.f
                                       + 31 * r.media_id) % 256)
                                   - ((7 * xs.x + 13 * ys.y
                                       + 19 * (r.f - 1)
                                       + 31 * r.media_id) % 256))
                       END::BIGINT AS dlt
                FROM fr r
                CROSS JOIN range(15) xs(x) CROSS JOIN range(19) ys(y)
                WHERE xs.x < r.w AND ys.y < r.h),
         agg AS (SELECT media_id, f, w, h, COUNT(*)::BIGINT AS n,
                        SUM(p)::BIGINT AS sum_gray,
                        SUM(dlt)::BIGINT AS delta_prev
                 FROM px GROUP BY 1, 2, 3, 4),
         blk AS (SELECT media_id, f,
                        (y * 8 // h) * 8 + (x * 8 // w) AS b,
                        SUM(p)::BIGINT AS bs, COUNT(*)::BIGINT AS bc
                 FROM px GROUP BY 1, 2, 3),
         fp AS (SELECT bl.media_id, bl.f,
                       SUM(CASE WHEN bl.bs * a.n > a.sum_gray * bl.bc
                           THEN (1::HUGEINT << (63 - bl.b))
                           ELSE 0::HUGEINT END) AS u
                FROM blk bl JOIN agg a USING (media_id, f)
                GROUP BY 1, 2)
         SELECT a.media_id, a.f AS frame_idx, a.w AS width,
                a.h AS height, a.sum_gray,
                CAST(CASE WHEN p.u >= 9223372036854775808::HUGEINT
                     THEN p.u - 18446744073709551616::HUGEINT
                     ELSE p.u END AS BIGINT) AS ahash,
                a.delta_prev
         FROM agg a JOIN fp p USING (media_id, f)
         ORDER BY a.media_id, frame_idx""",

    // the real-codec audio pipeline: the twin never decodes a WAV — it
    // replays the closed sample generator s(i) = ((7i²+13i+31·id) mod
    // 65536) − 32768 that the PCM16 round trip preserves exactly
    "q_mm_audio_decode" ->
      """WITH aud AS (SELECT doc_id AS media_id,
                             256 + 64 * (doc_id % 7) AS n
                      FROM documents WHERE doc_id % 3 = 1),
         sm AS (SELECT a.media_id, t.i::BIGINT AS i,
                       ((7 * t.i * t.i + 13 * t.i + 31 * a.media_id)
                         % 65536) - 32768 AS s
                FROM aud a CROSS JOIN range(640) t(i)
                WHERE t.i < a.n),
         lagged AS (SELECT media_id, s,
                           lag(s) OVER (PARTITION BY media_id
                                        ORDER BY i) AS prev
                    FROM sm)
         SELECT media_id, 8000 AS sample_rate,
                COUNT(*)::BIGINT AS n_samples,
                SUM(ABS(s))::BIGINT AS sum_abs,
                SUM(s * s)::BIGINT AS sum_sq,
                MAX(ABS(s))::INT AS peak_abs,
                (COUNT(*) FILTER (WHERE s * prev < 0))::BIGINT
                  AS zero_crossings
         FROM lagged GROUP BY media_id
         ORDER BY media_id""",

    // 64-sample frames; every synthetic length is a multiple of 64
    "q_mm_audio_frames" ->
      """WITH aud AS (SELECT doc_id AS media_id,
                             256 + 64 * (doc_id % 7) AS n
                      FROM documents WHERE doc_id % 3 = 1),
         sm AS (SELECT a.media_id, t.i::BIGINT AS i,
                       ((7 * t.i * t.i + 13 * t.i + 31 * a.media_id)
                         % 65536) - 32768 AS s
                FROM aud a CROSS JOIN range(640) t(i)
                WHERE t.i < a.n)
         SELECT media_id, (i // 64)::INT AS frame_idx,
                COUNT(*)::INT AS n,
                SUM(ABS(s))::BIGINT AS sum_abs,
                MAX(ABS(s))::INT AS peak_abs
         FROM sm GROUP BY media_id, i // 64
         ORDER BY media_id, frame_idx""",

    // the real-codec image pipeline: the twin never decodes a PNG — it
    // recomputes every pixel from the closed generator formula
    // p(x,y) = (7x+13y+31·(id div 6)) mod 256, which the PNG round-trip
    // preserves exactly (gray8 PNG is lossless). Dims ≤ 23×15, so the
    // pixel frame is a bounded cross join; the aHash bit rule is the
    // integer cross-multiply, MSB packed via HUGEINT then wrapped to
    // signed 64-bit
    "q_mm_decode_real" ->
      """WITH img AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
                             (8 + (doc_id // 6) % 16)::INT AS w,
                             (8 + (doc_id // 6) % 8)::INT AS h
                      FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT i.media_id, i.w, i.h, xs.x::INT AS x,
                       ys.y::INT AS y,
                       ((7 * xs.x + 13 * ys.y + 31 * i.seed)
                         % 256)::BIGINT AS p
                FROM img i
                CROSS JOIN range(23) xs(x) CROSS JOIN range(15) ys(y)
                WHERE xs.x < i.w AND ys.y < i.h),
         agg AS (SELECT media_id, w, h, COUNT(*)::BIGINT AS n_pixels,
                        SUM(p)::BIGINT AS sum_gray
                 FROM px GROUP BY 1, 2, 3),
         blk AS (SELECT media_id, (y * 8 // h) * 8 + (x * 8 // w) AS b,
                        SUM(p)::BIGINT AS bs, COUNT(*)::BIGINT AS bc
                 FROM px GROUP BY 1, 2),
         fp AS (SELECT bl.media_id,
                       SUM(CASE WHEN bl.bs * a.n_pixels
                                     > a.sum_gray * bl.bc
                           THEN (1::HUGEINT << (63 - bl.b))
                           ELSE 0::HUGEINT END) AS u
                FROM blk bl JOIN agg a USING (media_id) GROUP BY 1)
         SELECT a.media_id, a.w AS width, a.h AS height, a.n_pixels,
                a.sum_gray,
                CAST((a.sum_gray * 1000000) // a.n_pixels AS BIGINT)
                  AS mean_gray_micro,
                CAST(CASE WHEN f.u >= 9223372036854775808::HUGEINT
                     THEN f.u - 18446744073709551616::HUGEINT
                     ELSE f.u END AS BIGINT) AS ahash
         FROM agg a JOIN fp f USING (media_id)
         ORDER BY a.media_id""",

    // real-pixel features replayed from the closed formula: value
    // histogram bin = p·8 div 256; gradient energy per pixel from the
    // SAME formula at (x+1, y) and (x, y+1) — no neighbor join needed
    "q_mm_features_real" ->
      """WITH img AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
                             (8 + (doc_id // 6) % 16)::INT AS w,
                             (8 + (doc_id // 6) % 8)::INT AS h
                      FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT i.media_id, i.seed, i.w, i.h, xs.x::INT AS x,
                       ys.y::INT AS y,
                       ((7 * xs.x + 13 * ys.y + 31 * i.seed)
                         % 256)::BIGINT AS p
                FROM img i
                CROSS JOIN range(23) xs(x) CROSS JOIN range(15) ys(y)
                WHERE xs.x < i.w AND ys.y < i.h),
         hist AS (SELECT media_id, (p * 8) // 256 AS bin,
                         COUNT(*)::BIGINT AS cnt
                  FROM px GROUP BY 1, 2),
         dense AS (SELECT i.media_id, r.b AS bin,
                          COALESCE(hh.cnt, 0)::BIGINT AS cnt
                   FROM img i CROSS JOIN range(8) r(b)
                   LEFT JOIN hist hh
                     ON hh.media_id = i.media_id AND hh.bin = r.b),
         hs AS (SELECT media_id,
                       array_to_string(list(cnt ORDER BY bin), ',')
                         AS hist
                FROM dense GROUP BY 1),
         eh AS (SELECT media_id,
                       SUM(CASE WHEN x + 1 < w THEN
                             abs(((7 * (x + 1) + 13 * y + 31 * seed)
                               % 256) - p)
                           ELSE 0 END
                         + CASE WHEN y + 1 < h THEN
                             abs(((7 * x + 13 * (y + 1) + 31 * seed)
                               % 256) - p)
                           ELSE 0 END)::BIGINT AS edge_energy
                FROM px GROUP BY 1)
         SELECT i.media_id, i.w AS width, i.h AS height, hs.hist,
                eh.edge_energy
         FROM img i JOIN hs USING (media_id) JOIN eh USING (media_id)
         ORDER BY i.media_id""",

    // nearest-neighbor 8×8: resized pixel (x,y) samples source pixel
    // (x·w div 8, y·h div 8); blocks of an 8×8 aHash are single pixels
    "q_mm_resize_real" ->
      """WITH img AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
                             (8 + (doc_id // 6) % 16)::INT AS w,
                             (8 + (doc_id // 6) % 8)::INT AS h
                      FROM documents WHERE doc_id % 3 = 0),
         rp AS (SELECT i.media_id, xs.x::INT AS x, ys.y::INT AS y,
                       ((7 * ((xs.x * i.w) // 8)
                         + 13 * ((ys.y * i.h) // 8)
                         + 31 * i.seed) % 256)::BIGINT AS p
                FROM img i
                CROSS JOIN range(8) xs(x) CROSS JOIN range(8) ys(y)),
         agg AS (SELECT media_id, COUNT(*)::BIGINT AS n_pixels,
                        SUM(p)::BIGINT AS sum_gray
                 FROM rp GROUP BY 1),
         fp AS (SELECT r.media_id,
                       SUM(CASE WHEN r.p * a.n_pixels > a.sum_gray
                           THEN (1::HUGEINT << (63 - (r.y * 8 + r.x)))
                           ELSE 0::HUGEINT END) AS u
                FROM rp r JOIN agg a USING (media_id) GROUP BY 1)
         SELECT a.media_id, 8 AS width, 8 AS height, a.n_pixels,
                a.sum_gray,
                CAST((a.sum_gray * 1000000) // a.n_pixels AS BIGINT)
                  AS mean_gray_micro,
                CAST(CASE WHEN f.u >= 9223372036854775808::HUGEINT
                     THEN f.u - 18446744073709551616::HUGEINT
                     ELSE f.u END AS BIGINT) AS ahash
         FROM agg a JOIN fp f USING (media_id)
         ORDER BY a.media_id""",

    // real-pixel aHash pairs: the same fingerprint CTE, then naive
    // all-pairs hamming ≤ 1 as ground truth for the banded generator
    "q_mm_phash_real_pairs" ->
      """WITH img AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
                             (8 + (doc_id // 6) % 16)::INT AS w,
                             (8 + (doc_id // 6) % 8)::INT AS h
                      FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT i.media_id, i.w, i.h, xs.x::INT AS x,
                       ys.y::INT AS y,
                       ((7 * xs.x + 13 * ys.y + 31 * i.seed)
                         % 256)::BIGINT AS p
                FROM img i
                CROSS JOIN range(23) xs(x) CROSS JOIN range(15) ys(y)
                WHERE xs.x < i.w AND ys.y < i.h),
         agg AS (SELECT media_id, COUNT(*)::BIGINT AS n, SUM(p)::BIGINT
                   AS tot
                 FROM px GROUP BY 1),
         blk AS (SELECT media_id, (y * 8 // h) * 8 + (x * 8 // w) AS b,
                        SUM(p)::BIGINT AS bs, COUNT(*)::BIGINT AS bc
                 FROM px GROUP BY 1, 2),
         fp AS (SELECT bl.media_id,
                       CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                            THEN u - 18446744073709551616::HUGEINT
                            ELSE u END AS BIGINT) AS ahash
                FROM (SELECT bl.media_id,
                             SUM(CASE WHEN bl.bs * a.n > a.tot * bl.bc
                                 THEN (1::HUGEINT << (63 - bl.b))
                                 ELSE 0::HUGEINT END) AS u
                      FROM blk bl JOIN agg a USING (media_id)
                      GROUP BY 1) bl)
         SELECT a.media_id AS doc_a, b.media_id AS doc_b,
                bit_count(xor(a.ahash, b.ahash))::INT AS hamming
         FROM fp a JOIN fp b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.ahash, b.ahash)) <= 1""",

    // aHash fingerprints as 64-char bit strings (cnt·64 > n per bin,
    // MSB-first), naive all-pairs hamming as the ground truth for the
    // banded generator
    "q_mm_phash_pairs" ->
      """WITH img AS (SELECT doc_id AS media_id, coalesce(text, '') AS t
                      FROM documents WHERE doc_id % 3 = 0),
         byt AS (SELECT media_id,
                        ('0x' || substr(hex(encode(t)),
                          2 * unnest(generate_series(1,
                            octet_length(encode(t)))) - 1, 2))::INT % 64
                          AS bin
                 FROM img),
         per AS (SELECT media_id, bin, COUNT(*) AS cnt
                 FROM byt GROUP BY media_id, bin),
         tot AS (SELECT media_id, octet_length(encode(t))::BIGINT AS n
                 FROM img),
         dense AS (SELECT i.media_id, r.b AS bin, COALESCE(p.cnt, 0) AS cnt
                   FROM img i CROSS JOIN range(64) r(b)
                   LEFT JOIN per p ON p.media_id = i.media_id
                                  AND p.bin = r.b),
         fp AS (SELECT d.media_id,
                       string_agg(CASE WHEN d.cnt * 64 > t.n
                                  THEN '1' ELSE '0' END,
                         '' ORDER BY d.bin) AS bits
                FROM dense d JOIN tot t USING (media_id)
                GROUP BY d.media_id)
         SELECT a.media_id AS doc_a, b.media_id AS doc_b,
                len(list_filter(generate_series(1, 64),
                  i -> substr(a.bits, i, 1) <> substr(b.bits, i, 1)))::INT
                  AS hamming
         FROM fp a JOIN fp b ON a.media_id < b.media_id
         WHERE len(list_filter(generate_series(1, 64),
                 i -> substr(a.bits, i, 1) <> substr(b.bits, i, 1))) <= 1""",

    // pair graph → recursive reachability → min-id component →
    // keep = canonical or unpaired (the q_dedup_components pattern
    // over the phash edges)
    "q_mm_phash_keep" ->
      """WITH RECURSIVE
         img AS (SELECT doc_id AS media_id, coalesce(text, '') AS t
                 FROM documents WHERE doc_id % 3 = 0),
         byt AS (SELECT media_id,
                        ('0x' || substr(hex(encode(t)),
                          2 * unnest(generate_series(1,
                            octet_length(encode(t)))) - 1, 2))::INT % 64
                          AS bin
                 FROM img),
         per AS (SELECT media_id, bin, COUNT(*) AS cnt
                 FROM byt GROUP BY media_id, bin),
         tot AS (SELECT media_id, octet_length(encode(t))::BIGINT AS n
                 FROM img),
         dense AS (SELECT i.media_id, r.b AS bin, COALESCE(p.cnt, 0) AS cnt
                   FROM img i CROSS JOIN range(64) r(b)
                   LEFT JOIN per p ON p.media_id = i.media_id
                                  AND p.bin = r.b),
         fp AS (SELECT d.media_id,
                       string_agg(CASE WHEN d.cnt * 64 > t.n
                                  THEN '1' ELSE '0' END,
                         '' ORDER BY d.bin) AS bits
                FROM dense d JOIN tot t USING (media_id)
                GROUP BY d.media_id),
         prs AS (SELECT a.media_id AS doc_a, b.media_id AS doc_b
                 FROM fp a JOIN fp b ON a.media_id < b.media_id
                 WHERE len(list_filter(generate_series(1, 64),
                     i -> substr(a.bits, i, 1) <> substr(b.bits, i, 1)))
                     <= 1),
         edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(id, comp) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id),
         comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
         SELECT media_id FROM img i
         WHERE NOT EXISTS (
           SELECT 1 FROM comp c
           WHERE c.id = i.media_id AND c.id <> c.comp)""",

    // exhaustive all-pairs twin of the banded radius-3 cut: same aHash
    // bits CTE as q_mm_phash_keep, hamming by per-position compare
    "q_mm_phash_radius" ->
      """WITH img AS (SELECT doc_id AS media_id, coalesce(text, '') AS t
                      FROM documents WHERE doc_id % 3 = 0),
         byt AS (SELECT media_id,
                        ('0x' || substr(hex(encode(t)),
                          2 * unnest(generate_series(1,
                            octet_length(encode(t)))) - 1, 2))::INT % 64
                          AS bin
                 FROM img),
         per AS (SELECT media_id, bin, COUNT(*) AS cnt
                 FROM byt GROUP BY media_id, bin),
         tot AS (SELECT media_id, octet_length(encode(t))::BIGINT AS n
                 FROM img),
         dense AS (SELECT i.media_id, r.b AS bin, COALESCE(p.cnt, 0) AS cnt
                   FROM img i CROSS JOIN range(64) r(b)
                   LEFT JOIN per p ON p.media_id = i.media_id
                                  AND p.bin = r.b),
         fp AS (SELECT d.media_id,
                       string_agg(CASE WHEN d.cnt * 64 > t.n
                                  THEN '1' ELSE '0' END,
                         '' ORDER BY d.bin) AS bits
                FROM dense d JOIN tot t USING (media_id)
                GROUP BY d.media_id),
         prs AS (SELECT a.media_id AS doc_a, b.media_id AS doc_b,
                        len(list_filter(generate_series(1, 64),
                          i -> substr(a.bits, i, 1)
                               <> substr(b.bits, i, 1)))::BIGINT
                          AS hamming
                 FROM fp a JOIN fp b ON a.media_id < b.media_id)
         SELECT doc_a, doc_b, hamming FROM prs
         WHERE hamming <= 3 ORDER BY doc_a, doc_b""",
  )
}
