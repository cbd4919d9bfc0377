package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal pipeline entries. The binary payloads are synthesized from
  * documents.text (deterministic), so `mm_features`'s byte-length and
  * content-hash columns ARE oracle-able facts about the source table even
  * though the decode stage itself is a stub. */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // n_bytes of the UTF-8 payload must equal strlen — checkable in SQL.
    Q(
      "mm_payload_audit",
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  COUNT(*) OVER () AS corpus_size
        |FROM documents
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val media = Multimodal.syntheticMedia(s, d)
      media.toDF()
        .select(col("media_id"),
          length(col("bytes")).cast("long").as("n_bytes"))
        .withColumn("corpus_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .orderBy(col("media_id"))
    },

    // full decode-stub feature extraction. The stub's content hash is the
    // top 60 bits of MD5 and the fake dims are plain arithmetic on it, so
    // the ENTIRE feature row is independently recomputable in SQL — the
    // oracle re-derives hash, dims, and frame count from the same bytes.
    Q(
      "mm_features",
      """WITH f AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT media_id, kind, n_bytes,
        |  CAST(64 + h % 1024 AS INT) AS width,
        |  CAST(64 + (h >> 10) % 1024 AS INT) AS height,
        |  CAST(1 + (h >> 20) % 16 AS INT) AS n_frames,
        |  h AS content_hash
        |FROM f ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Multimodal.extractFeatures(Multimodal.syntheticMedia(s, d))
        .toDF().orderBy(col("media_id"))
    },

    // REAL image decode, end-to-end: Spark encodes a deterministic tiny
    // PNG per doc (ImageGen), then MediaDecoder parses the actual bytes
    // back — dims AND per-channel pixel sums. The oracle never sees the
    // bytes; it recomputes the same facts from the generation rule, so a
    // hash match proves the decoder read real pixels (a header sniff or
    // stub could not produce the channel sums).
    Q(
      "mm_image_decode",
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id // 9) % 9 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT media_id, width, height,
        |         unnest(range(0, width)) AS x FROM d),
        |px AS (SELECT media_id, width, height, x,
        |         unnest(range(0, height)) AS y FROM xs)
        |SELECT media_id, width, height,
        |  CAST(SUM((x*7 + y*13 + media_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((x*3 + y*5 + 2*media_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((x*11 + y + 3*media_id) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY media_id, width, height
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Multimodal.imageFeatures(Multimodal.syntheticImages(s, d))
        .toDF().orderBy(col("media_id"))
    },

    // REAL audio decode, same construction as mm_image_decode: a
    // deterministic mono 16-bit PCM WAV per doc (AudioGen, raw RIFF
    // writer), decoded back through the JDK's javax.sound parser. The
    // oracle predicts sample count AND the exact sample sum from the
    // generation rule — only a real PCM decode reproduces them.
    Q(
      "mm_audio_decode",
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(400 + doc_id % 600 AS BIGINT) AS n_samples
        |  FROM documents),
        |s AS (SELECT media_id, n_samples,
        |        unnest(range(0, n_samples)) AS i FROM d)
        |SELECT media_id, n_samples,
        |  8000 AS sample_rate, 1 AS channels,
        |  CAST(SUM((i*31 + media_id*7) % 65536 - 32768) AS BIGINT)
        |    AS sum_samples
        |FROM s GROUP BY media_id, n_samples
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Multimodal.audioFeatures(Multimodal.syntheticAudio(s, d))
        .toDF().orderBy(col("media_id"))
    },

    // REAL video DEMUX: deterministic minimal MP4 box trees (VideoGen),
    // parsed back by walking the ISO-BMFF structure — timescale/duration
    // from mvhd, sample count from the nested stsz. Demux needs no
    // codec; only frame-payload decode remains stubbed.
    Q(
      "mm_video_demux",
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id
        |           FROM documents),
        |fl AS (SELECT media_id,
        |         unnest(range(0, 2 + media_id % 7)) AS i FROM d)
        |SELECT media_id,
        |  1000 AS timescale,
        |  CAST(1000 + media_id % 9000 AS BIGINT) AS duration,
        |  CAST(2 + media_id % 7 AS INT) AS n_frames,
        |  CAST(SUM(50 + (media_id + i*13) % 100) AS BIGINT) AS mdat_bytes
        |FROM fl GROUP BY media_id
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Multimodal.syntheticVideo(s, d).mapPartitions { rows =>
        rows.flatMap { r =>
          graft.multimodal.MediaDecoder.demuxMp4(r.bytes).map(v =>
            (r.media_id, v.timescale, v.duration, v.frameSizes.size,
              v.mdat.length.toLong))
        }
      }.toDF("media_id", "timescale", "duration", "n_frames", "mdat_bytes")
        .orderBy(col("media_id"))
    },

    // REAL frame extraction: mdat sliced by the stsz table; the hash of
    // each frame's actual payload bytes must match what the oracle
    // derives from the generation rule — only a correct demux + slice
    // reproduces it.
    Q(
      "mm_video_frames",
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id
        |           FROM documents),
        |f AS (SELECT media_id,
        |        unnest(range(0, 2 + media_id % 7)) AS i FROM d),
        |fb AS (SELECT media_id, i,
        |         50 + (media_id + i*13) % 100 AS flen FROM f)
        |SELECT media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(flen AS INT) AS frame_len,
        |  md5(array_to_string(list_transform(range(0, flen),
        |    j -> printf('%02x', (media_id + i*17 + j*29) % 256)), ''))
        |    AS frame_hash
        |FROM fb
        |ORDER BY media_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Multimodal.videoFrames(Multimodal.syntheticVideo(s, d))
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("frame_len"),
          md5(lower(hex(col("frame_bytes")))).as("frame_hash"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // frame sampling: variable-length explode per media row; oracle
    // unnests range(0, n_frames, stride) per doc and XORs the hash.
    Q(
      "mm_frame_samples",
      """WITH f AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents),
        |fr AS (SELECT media_id, h,
        |         unnest(range(0, 1 + (h >> 20) % 16, 2)) AS idx
        |       FROM f)
        |SELECT media_id, CAST(idx AS INT) AS frame_idx,
        |  xor(h, idx) AS frame_hash
        |FROM fr
        |ORDER BY media_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d))
        .toDF().orderBy(col("media_id"), col("frame_idx"))
    },

    // --- video stream screening (bitrate / frame-rate thresholds) -------
    // The numbers a video curation pass thresholds BEFORE any frame
    // decode, all derived from the real ISO-BMFF demux: duration,
    // frame rate, payload bitrate, mean frame size — and the keep
    // verdict (a floor on bits/s screens out degenerate streams).
    // Integer ratios via div; the oracle re-derives every figure from
    // the box-tree generation rule, so a match proves the demux read
    // mvhd/stsz/mdat, not a header guess.
    Q(
      "mm_video_stats",
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id
        |           FROM documents),
        |fl AS (SELECT media_id,
        |         unnest(range(0, 2 + media_id % 7)) AS i FROM d),
        |v AS (SELECT media_id,
        |        CAST(1000 + media_id % 9000 AS BIGINT) AS duration,
        |        CAST(2 + media_id % 7 AS BIGINT) AS n_frames,
        |        CAST(SUM(50 + (media_id + i*13) % 100) AS BIGINT)
        |          AS mdat_bytes
        |      FROM fl GROUP BY media_id)
        |SELECT media_id,
        |  duration AS duration_ms,
        |  n_frames,
        |  CAST(n_frames * 1000000 // duration AS BIGINT) AS fps_milli,
        |  mdat_bytes,
        |  CAST(mdat_bytes * 8000 // duration AS BIGINT) AS bps,
        |  mdat_bytes * 8000 // duration >= 500 AS keep
        |FROM v
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Multimodal.syntheticVideo(s, d).mapPartitions { rows =>
        rows.flatMap { r =>
          graft.multimodal.MediaDecoder.demuxMp4(r.bytes).map(v =>
            (r.media_id, v.timescale, v.duration,
              v.frameSizes.length.toLong,
              v.frameSizes.map(_.toLong).sum))
        }
      }.toDF("media_id", "timescale", "duration", "n_frames",
          "mdat_bytes")
        // timescale is 1000 ticks/s by generation; duration is thus ms
        .select(col("media_id"),
          col("duration").as("duration_ms"),
          col("n_frames"),
          expr("n_frames * 1000000 div duration").cast("long")
            .as("fps_milli"),
          col("mdat_bytes"),
          expr("mdat_bytes * 8000 div duration").cast("long").as("bps"),
          expr("mdat_bytes * 8000 div duration >= 500").as("keep"))
        .orderBy(col("media_id"))
    },

    // --- audio signal features (the thresholds audio curation uses) -----
    // Beyond mm_audio_decode's sample-sum audit: abs-sum (silence
    // detection), peak (clipping), RMS (loudness), and zero-crossing
    // count (noisiness proxy) from the SAME one-pass PCM decode. The
    // crossing count needs the previous sample's sign, which the oracle
    // gets CLOSED-FORM (s(i−1) re-derived from the generation rule — no
    // window), so everything stays exact integers except the one
    // division + sqrt of the RMS.
    Q(
      "mm_audio_features",
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(400 + doc_id % 600 AS BIGINT) AS n
        |  FROM documents),
        |s AS (SELECT media_id, n, i,
        |        (i*31 + media_id*7) % 65536 - 32768 AS v,
        |        CASE WHEN i > 0
        |          THEN ((i-1)*31 + media_id*7) % 65536 - 32768 END AS pv
        |      FROM (SELECT media_id, n, unnest(range(0, n)) AS i FROM d))
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
        |  ROUND(SQRT(CAST(SUM(v*v) AS DOUBLE) / n), 6) AS rms,
        |  CAST(SUM(CASE WHEN i > 0 AND ((v >= 0) <> (pv >= 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM s GROUP BY media_id, n
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Multimodal.syntheticAudio(s, d).mapPartitions { rows =>
        rows.flatMap(r =>
          graft.multimodal.MediaDecoder.decodeAudioStats(r.bytes).map(a =>
            (r.media_id, a.nSamples, a.sumAbs, a.sumSq, a.peak,
              a.zeroCrossings)))
      }.toDF("media_id", "n_samples", "sum_abs", "sum_sq", "peak",
          "zero_crossings")
        .select(col("media_id"), col("n_samples"), col("sum_abs"),
          col("peak"),
          round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 6)
            .as("rms"),
          col("zero_crossings"))
        .orderBy(col("media_id"))
    },

    // --- perceptual image hashing (block-mean hash + dup grouping) ------
    // The image analogue of text fingerprinting: a 64-bit block-mean
    // hash (8×8 block grid, bit = block gray mean > image mean) computed
    // from REAL decoded pixels, robust to re-encoding where the byte
    // hash is not. Bits come from exact integer cross-multiplication, so
    // the oracle — which never sees the bytes — replays the hash
    // bit-for-bit from the pixel generation rule; a match proves a
    // full-pixel decode, not a header sniff. The dup-grouping half
    // (count per identical hash) is the candidate-bucket shape image
    // dedup runs at scale: group by 64-bit key, never pairwise. Decode
    // is a typed mapPartitions (the correct tool for binary columns);
    // everything after is narrow + one hash-keyed aggregate.
    Q(
      "mm_image_phash",
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id // 9) % 9 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT media_id, width, height,
        |         unnest(range(0, width)) AS x FROM d),
        |px AS (SELECT media_id, width, height, x,
        |         unnest(range(0, height)) AS y FROM xs),
        |g AS (SELECT media_id, width, height,
        |        (x*7 + y*13 + media_id) % 256
        |          + (x*3 + y*5 + 2*media_id) % 256
        |          + (x*11 + y + 3*media_id) % 256 AS gray,
        |        (y * 8) // height * 8 + (x * 8) // width AS bit
        |      FROM px),
        |b AS (SELECT media_id, width, height, bit,
        |        SUM(gray) AS bsum, COUNT(*) AS bcnt
        |      FROM g GROUP BY media_id, width, height, bit),
        |t AS (SELECT media_id, SUM(gray) AS tsum, COUNT(*) AS tcnt
        |      FROM g GROUP BY media_id),
        |bits AS (SELECT b.media_id, width, height, bit,
        |           CASE WHEN bsum * tcnt > tsum * bcnt
        |             THEN CAST(1 AS BIGINT) ELSE 0 END AS v
        |         FROM b JOIN t USING (media_id)),
        |h AS (SELECT media_id, width, height,
        |        CAST(SUM(CASE WHEN bit >= 32 THEN v << (bit - 32)
        |          ELSE 0 END) AS BIGINT) AS hash_hi,
        |        CAST(SUM(CASE WHEN bit < 32 THEN v << bit
        |          ELSE 0 END) AS BIGINT) AS hash_lo
        |      FROM bits GROUP BY media_id, width, height),
        |c AS (SELECT hash_hi, hash_lo, CAST(COUNT(*) AS BIGINT)
        |        AS n_same_hash
        |      FROM h GROUP BY hash_hi, hash_lo)
        |SELECT media_id, width, height, hash_hi, hash_lo, n_same_hash
        |FROM h JOIN c USING (hash_hi, hash_lo)
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val hashes = Multimodal.syntheticImages(s, d).mapPartitions { rows =>
        rows.flatMap(r =>
          graft.multimodal.MediaDecoder.imagePhash(r.bytes).map(p =>
            (r.media_id, p.width, p.height, p.hashHi, p.hashLo)))
      }.toDF("media_id", "width", "height", "hash_hi", "hash_lo")
      val groups = hashes.groupBy(col("hash_hi"), col("hash_lo"))
        .agg(count(lit(1)).as("n_same_hash"))
      hashes.join(groups, Seq("hash_hi", "hash_lo"))
        .select(col("media_id"), col("width"), col("height"),
          col("hash_hi"), col("hash_lo"), col("n_same_hash"))
        .orderBy(col("media_id"))
    },

    // --- ViT-style patch grid + brightness contrast ----------------------
    // The vision-tower batching shape: REAL pixel decode cut into a 4×4
    // patch grid (MediaDecoder.imagePatches), then per-image brightest /
    // darkest patch and their contrast — all in exact integer
    // arithmetic (patch mean as psum·1000 div pcnt, floor), so the
    // oracle replays the full grid from the pixel generation rule and a
    // hash match proves patch sums came from real decoded pixels.
    // Decode is a typed mapPartitions; the argmax/argmin is a per-image
    // window over 16 rows — partitioned by media_id, scales linearly.
    Q(
      "mm_image_patches",
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id // 9) % 9 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT media_id, width, height,
        |         unnest(range(0, width)) AS x FROM d),
        |px AS (SELECT media_id, width, height, x,
        |         unnest(range(0, height)) AS y FROM xs),
        |g AS (SELECT media_id, width, height,
        |        (x*7 + y*13 + media_id) % 256
        |          + (x*3 + y*5 + 2*media_id) % 256
        |          + (x*11 + y + 3*media_id) % 256 AS gray,
        |        (y * 4) // height * 4 + (x * 4) // width AS patch
        |      FROM px),
        |p AS (SELECT media_id, width, height, patch,
        |        CAST(SUM(gray) * 1000 // COUNT(*) AS BIGINT) AS mean_milli
        |      FROM g GROUP BY media_id, width, height, patch),
        |r AS (SELECT media_id, width, height, patch, mean_milli,
        |        row_number() OVER (PARTITION BY media_id
        |          ORDER BY mean_milli DESC, patch) AS rb,
        |        row_number() OVER (PARTITION BY media_id
        |          ORDER BY mean_milli ASC, patch) AS rd
        |      FROM p)
        |SELECT media_id, width, height,
        |  CAST(MAX(CASE WHEN rb = 1 THEN patch END) AS BIGINT)
        |    AS brightest_patch,
        |  CAST(MAX(CASE WHEN rd = 1 THEN patch END) AS BIGINT)
        |    AS darkest_patch,
        |  CAST(MAX(CASE WHEN rb = 1 THEN mean_milli END)
        |    - MAX(CASE WHEN rd = 1 THEN mean_milli END) AS BIGINT)
        |    AS contrast_milli
        |FROM r GROUP BY media_id, width, height
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val patches = Multimodal.syntheticImages(s, d).mapPartitions { rows =>
        rows.flatMap(r =>
          graft.multimodal.MediaDecoder.imagePatches(r.bytes).toSeq.flatMap(
            _.map(p => (r.media_id, p.width, p.height, p.patch,
              p.psum, p.pcnt))))
      }.toDF("media_id", "width", "height", "patch", "psum", "pcnt")
        .withColumn("mean_milli",
          expr("CAST(psum * 1000 div pcnt AS BIGINT)"))
      val wB = Window.partitionBy(col("media_id"))
        .orderBy(col("mean_milli").desc, col("patch"))
      val wD = Window.partitionBy(col("media_id"))
        .orderBy(col("mean_milli").asc, col("patch"))
      patches
        .withColumn("rb", row_number().over(wB))
        .withColumn("rd", row_number().over(wD))
        .groupBy(col("media_id"), col("width"), col("height"))
        .agg(
          max(when(col("rb") === 1, col("patch"))).cast("long")
            .as("brightest_patch"),
          max(when(col("rd") === 1, col("patch"))).cast("long")
            .as("darkest_patch"),
          (max(when(col("rb") === 1, col("mean_milli"))) -
            max(when(col("rd") === 1, col("mean_milli")))).cast("long")
            .as("contrast_milli"))
        .orderBy(col("media_id"))
    },

    // --- energy-based voice activity detection ---------------------------
    // The pre-transcription screen an audio corpus runs: REAL PCM decode
    // cut into 20 ms frames (160 samples @ 8 kHz,
    // MediaDecoder.audioFrameEnergies), a frame is "active" when its
    // exact Σv² energy clears mean-square > 2²⁸ (¼ of full-scale²), and
    // per clip the pipeline reports frame counts, the longest active
    // run (gaps-and-islands over the per-clip frame window — partitioned
    // by media_id, scales linearly) and the active share in integer ppm.
    Q(
      "mm_audio_vad",
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(400 + doc_id % 600 AS BIGINT) AS n
        |  FROM documents),
        |f AS (SELECT media_id, unnest(range(0, n // 160)) AS f FROM d),
        |s AS (SELECT media_id, f,
        |        (i*31 + media_id*7) % 65536 - 32768 AS v
        |      FROM (SELECT media_id, f,
        |              unnest(range(f*160, f*160 + 160)) AS i FROM f)),
        |e AS (SELECT media_id, f, CAST(SUM(v*v) AS BIGINT) AS energy
        |      FROM s GROUP BY media_id, f),
        |a AS (SELECT media_id, f,
        |        CASE WHEN energy > 42949672960 THEN 1 ELSE 0 END AS act
        |      FROM e),
        |isl AS (SELECT media_id,
        |          f - row_number() OVER (PARTITION BY media_id ORDER BY f)
        |            AS grp
        |        FROM a WHERE act = 1),
        |runs AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS run
        |         FROM isl GROUP BY media_id, grp),
        |agg AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |          CAST(SUM(act) AS BIGINT) AS active_frames
        |        FROM a GROUP BY media_id),
        |lr AS (SELECT media_id, MAX(run) AS longest_run FROM runs
        |       GROUP BY media_id)
        |SELECT agg.media_id AS media_id, n_frames, active_frames,
        |  CAST(COALESCE(longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(active_frames * 1000000 // n_frames AS BIGINT) AS active_ppm
        |FROM agg LEFT JOIN lr ON agg.media_id = lr.media_id
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val energies = Multimodal.syntheticAudio(s, d).mapPartitions { rows =>
        rows.flatMap(r =>
          graft.multimodal.MediaDecoder.audioFrameEnergies(r.bytes).toSeq
            .flatMap(_.zipWithIndex.map { case (en, i) =>
              (r.media_id, i.toLong, en)
            }))
      }.toDF("media_id", "f", "energy")
        .withColumn("act",
          when(col("energy") > 42949672960L, 1).otherwise(0))
      val isl = energies.where(col("act") === 1)
        .withColumn("grp", col("f") - row_number().over(
          Window.partitionBy(col("media_id")).orderBy(col("f"))))
      val runs = isl.groupBy(col("media_id"), col("grp"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("media_id"))
        .agg(max(col("run")).as("longest_run"))
      energies.groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("act")).cast("long").as("active_frames"))
        .join(runs, Seq("media_id"), "left")
        .select(col("media_id"), col("n_frames"), col("active_frames"),
          coalesce(col("longest_run"), lit(0L)).cast("long")
            .as("longest_run"),
          expr("CAST(active_frames * 1000000 div n_frames AS BIGINT)")
            .as("active_ppm"))
        .orderBy(col("media_id"))
    }
  )
}
