package graft.multimodal

import graft.Exact.GraftCheckpoint
import graft.{Q, Tables, Module}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.G — multimodal binary-column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * testdata has no image/audio files (and this container has no codecs —
  * per the brief the decode step is a deterministic stub), so the payload
  * is the document's UTF-8 bytes: every Spark-side mechanism — binary
  * columns, byte slicing, per-frame explode, checksums, metadata structs —
  * is real and oracle-checked; only the pixel decode is fake. The real
  * decode would swap into [[MediaDecode.decodeStub]] behind the same
  * schema. ASCII corpus ⇒ byte offsets == char offsets, which is what lets
  * DuckDB verify the binary arithmetic through its string functions.
  */
object MultimodalG extends Module {

  // mm_meta — binary payload + typed metadata extraction: byte length,
  // checksum, head-of-file hex (magic-number sniffing), stubbed decoded
  // dimensions. Narrow map, column-pruned scan.
  private val mmMeta = Q(
    "mm_meta",
    (s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_bytes", length(col("payload")).cast("long"))
        .select(col("doc_id"), col("n_bytes"),
          md5(col("payload")).as("content_md5"),
          upper(hex(expr("substring(payload, 1, 8)"))).as("head_hex"),
          // decode stub: deterministic fake dimensions from the byte length
          expr("64 + n_bytes % 64").as("width"),
          expr("64 + (n_bytes div 64) % 64").as("height"))
    },
    Some("""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  upper(hex(substr(text, 1, 8))) AS head_hex,
      |  64 + CAST(length(text) AS BIGINT) % 64 AS width,
      |  64 + (CAST(length(text) AS BIGINT) // 64) % 64 AS height
      |FROM documents""".stripMargin)
  )

  // mm_framesample — deterministic frame sampling: split each payload into
  // k fixed-stride frames (posexplode), checksum each frame. This is the
  // video-frame-sample plumbing: schema (doc_id, frame_idx, frame_len,
  // frame_md5), one row per sampled frame, still a narrow map.
  private val mmFrameSample = Q(
    "mm_framesample",
    (s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("flen", (length(col("payload")) / 4).cast("int"))
        .select(col("doc_id"), col("flen"),
          posexplode(expr(
            "transform(sequence(0, 3), i -> substring(payload, i * flen + 1, flen))")))
        .toDF("doc_id", "flen", "frame_idx", "frame")
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("flen").cast("long").as("frame_len"),
          md5(col("frame")).as("frame_md5"))
    },
    Some("""WITH f AS (
      |  SELECT doc_id, length(text) // 4 AS flen,
      |    unnest(generate_series(0, 3)) AS frame_idx, text
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(flen AS BIGINT) AS frame_len,
      |  md5(substr(text, frame_idx * flen + 1, flen)) AS frame_md5
      |FROM f""".stripMargin)
  )

  // mm_features — typed feature extraction over the opaque payload: byte
  // class counts + ratios (the oracle-checkable stand-in for the pixel /
  // spectral statistics a real decoder would emit — the real extractor is
  // MediaDecode.decodeBatch/resizeBatch, same schema discipline). ASCII
  // corpus ⇒ DuckDB reproduces the byte-class counts through its regex
  // engine.
  private val mmFeatures = Q(
    "mm_features",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_bytes"),
          regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digit"),
          regexp_count(col("text"), lit("[A-Z]")).cast("long").as("n_upper"),
          regexp_count(col("text"), lit("[a-z]")).cast("long").as("n_lower"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long").as("n_space"))
        .withColumn("alpha_ratio",
          (col("n_upper") + col("n_lower")).cast("double") / col("n_bytes").cast("double"))
    },
    Some("""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
      |  CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
      |  CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_lower,
      |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
      |  CAST(len(regexp_extract_all(text, '[A-Z]')) + len(regexp_extract_all(text, '[a-z]')) AS DOUBLE)
      |    / CAST(length(text) AS DOUBLE) AS alpha_ratio
      |FROM documents""".stripMargin)
  )

  // mm_audio_window — fixed-rate sample windowing over the stub "audio"
  // payload (bytes as 8-bit samples): per 100-sample window, the exact
  // integer energy (Σ sample²) and its RMS — the feature shape a real
  // audio frontend (VAD, loudness normalization) emits per frame. All
  // window sums are exact BIGINTs; RMS is one fixed IEEE sqrt+div on
  // both sides, so the oracle hash-matches. Disjoint windows ⇒ total
  // work is one pass over the payload. A real PCM decoder slots in at
  // [[MediaDecode]] without changing this schema.
  /** The per-window (doc_id, win_idx, n_samples, energy, rms) surface —
    * shared by mm_audio_window and mm_silence_spans.
    */
  private def audioWindows(s: org.apache.spark.sql.SparkSession, d: String) = {
    val wlen = 100
    // fanout: the per-sample energy fold is the heaviest per-row
    // pipeline in this module — a single-row-group input would run it
    // on one task (measured 36 s at sf1; ~3 s fanned out)
    graft.Exact.fanout(Tables.documents(s, d))
      .withColumn("n", length(col("text")))
      // empty payloads emit no windows: sequence(0, -1) would yield a
      // DESCENDING [0, -1] (Spark auto-steps -1) where DuckDB's
      // generate_series(0, -1) is empty — filter first so both agree
      .filter(col("n") > 0)
      .withColumn("nwin", ceil(col("n").cast("double") / wlen).cast("int"))
      .select(col("doc_id"), col("n"),
        posexplode(transform(sequence(lit(0), col("nwin") - 1), w =>
          aggregate(
            transform(sequence(lit(1), least(lit(wlen), col("n") - w * wlen)),
              i => ascii(substring(col("text"), w * lit(wlen) + i, lit(1))).cast("long")),
            lit(0L), (acc, x) => acc + x * x))))
      .toDF("doc_id", "n", "win_idx", "energy")
      .withColumn("n_samples",
        least(lit(wlen.toLong), col("n").cast("long") - col("win_idx") * wlen))
      .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
        col("n_samples"), col("energy"),
        sqrt(col("energy").cast("double") / col("n_samples").cast("double")).as("rms"))
  }

  /** DuckDB twin of [[audioWindows]] as a WITH-body ending in `wins`. */
  private val audioWindowsSql: String =
    """w AS (
      |  SELECT doc_id, length(text) AS n, text,
      |    unnest(generate_series(0, CAST(CEIL(CAST(length(text) AS DOUBLE) / 100.0) AS BIGINT) - 1)) AS win_idx
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, win_idx,
      |    LEAST(100, n - win_idx * 100) AS n_samples,
      |    list_sum(list_transform(generate_series(1, CAST(LEAST(100, n - win_idx * 100) AS BIGINT)),
      |      i -> CAST(ascii(substr(text, CAST(win_idx * 100 + i AS INTEGER), 1)) AS BIGINT) *
      |           CAST(ascii(substr(text, CAST(win_idx * 100 + i AS INTEGER), 1)) AS BIGINT))) AS energy
      |  FROM w),
      |wins AS (
      |  SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
      |    CAST(n_samples AS BIGINT) AS n_samples, CAST(energy AS BIGINT) AS energy,
      |    SQRT(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms
      |  FROM e)""".stripMargin

  private val mmAudioWindow = Q(
    "mm_audio_window",
    (s, d) => audioWindows(s, d),
    Some(s"""WITH $audioWindowsSql
      |SELECT doc_id, win_idx, n_samples, energy, rms
      |FROM wins""".stripMargin)
  )

  // mm_silence_spans — contiguous low-energy runs per payload (the
  // silence-trim / VAD segmentation step of an audio pipeline): windows
  // with rms below the threshold collapse to (start, end, length) spans
  // via the gap-and-island idiom — win_idx − row_number() is constant
  // within a run. The island window is keyed on the HIGH-cardinality
  // doc_id, so parallelism scales with corpus size; the rms threshold
  // compares doubles that are bit-identical in both engines (same
  // integer energy, same sqrt). A real frontend swaps the byte-grid
  // energy for PCM energy behind the same schema.
  private val mmSilence = Q(
    "mm_silence_spans",
    (s, d) => {
      val silent = audioWindows(s, d).filter(col("rms") < lit(98.5))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("win_idx"))
      silent
        .withColumn("island", col("win_idx") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("win_idx")).as("span_start"),
          max(col("win_idx")).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
    },
    Some(s"""WITH $audioWindowsSql,
      |silent AS (
      |  SELECT doc_id, win_idx,
      |    win_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY win_idx) AS island
      |  FROM wins WHERE rms < 98.5)
      |SELECT doc_id, MIN(win_idx) AS span_start, MAX(win_idx) AS span_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows
      |FROM silent GROUP BY doc_id, island
      |""".stripMargin)
  )

  // mm_phash — perceptual-hash near-dup detection over the payload (the
  // image-dedup pass of a multimodal pipeline, dHash-shaped): sample a
  // fixed 6×11 byte grid across the payload at uniform stride, set one
  // of 60 bits per horizontal gradient (sample[r,c] < sample[r,c+1]),
  // then find near-dup pairs through the SimHash banding machinery —
  // 4×15-bit bands guarantee every pair within hamming ≤ 3 shares a
  // band (pigeonhole), so the pair join runs only within band buckets.
  // A real image decoder would swap the byte grid for a luma grid
  // behind the same schema ([[MediaDecode]] stub discipline); the
  // gradient/banding/hamming arithmetic is real and oracle-checked.
  // Scale note: a degenerate corpus (millions of identical payloads)
  // makes a band bucket quadratic — at 100 TB route the bucket join
  // through [[graft.dedup.Dedup.withRepresentative]] pre-collapse +
  // [[graft.dedup.Dedup.candidatePairs]]' bucket cap, exactly as the
  // text-dedup family does; the small-SF oracle keeps the direct join
  // so DuckDB can verify the full pair arithmetic.
  // Hot-band stop-list bound for the phash self-join: a (band_idx,
  // band_val) bucket of m docs makes m²/2 candidate pairs inside one
  // reducer. Boilerplate signatures (uniform images, verbatim copy
  // families) produce df in the thousands; at 5M docs the 15-bit band
  // space ALSO saturates randomly (~150/bucket), so without the cap the
  // candidate surface at sf100 was ~1.5e9 pairs and the shuffle filled
  // the disk. Pairs whose every band is hot are not enumerated — they
  // surface through mm_hot_bands below (the mm_hot_frames discipline).
  private[multimodal] val PhashBandDfCap = 100

  /** 4×15-bit banding of a (doc_id, phash) frame — shared by mm_phash
    * and mm_hot_bands. */
  private def phashBands(hashed: org.apache.spark.sql.DataFrame) =
    hashed.select(col("doc_id"), col("phash"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> shiftrightunsigned(phash, b * 15) & 32767)")))
      .toDF("doc_id", "phash", "band_idx", "band_val")

  private val phashBandsCte =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 65),
      |      k -> ascii(substr(text, CAST(k * greatest((length(text) - 1) // 66, 1) + 1 AS INTEGER), 1))) AS bs
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), j ->
      |    CASE WHEN bs[CAST((j // 10) * 11 + (j % 10) + 1 AS INTEGER)]
      |              < bs[CAST((j // 10) * 11 + (j % 10) + 2 AS INTEGER)]
      |         THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END)) AS BIGINT) AS phash
      |  FROM h),
      |bands AS (
      |  SELECT doc_id, phash, b.b AS band_idx, (phash >> CAST(b.b * 15 AS INTEGER)) & 32767 AS band_val
      |  FROM p, (SELECT unnest(generate_series(0, 3)) AS b) b)""".stripMargin

  private val mmPhash = Q(
    "mm_phash",
    (s, d) => {
      // fanout: the testdata parquet is a single row group, which would
      // run the 66-point sampling + 60-bit fold on ONE task (>10 min at
      // sf1); checkpoint so the join's two branches share one pass.
      // Lazy (eager = false): the hash pass runs at first ACTION, so
      // merely constructing the DataFrame (plan inspection, explain)
      // stays side-effect-free; branch sharing is identical either way.
      val hashed = graft.Exact.fanout(Tables.documents(s, d))
        .withColumn("stride", expr("greatest((length(text) - 1) div 66, 1)"))
        .withColumn("bs", expr(
          "transform(sequence(0, 65), k -> ascii(substring(text, k * stride + 1, 1)))"))
        .withColumn("phash", expr(
          """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) ->
            |  acc + IF(element_at(bs, CAST((j div 10) * 11 + (j % 10) + 1 AS INT))
            |           < element_at(bs, CAST((j div 10) * 11 + (j % 10) + 2 AS INT)),
            |        shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
        .select(col("doc_id"), col("phash"))
        .graftCheckpoint(eager = false)
      val bands = phashBands(hashed)
      val usable = bands.groupBy("band_idx", "band_val")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= PhashBandDfCap)
        .select("band_idx", "band_val")
      val b2 = bands.join(usable, Seq("band_idx", "band_val"))
      val a = b2.select(col("band_idx"), col("band_val"),
        col("doc_id").as("id_a"), col("phash").as("ph_a"))
      val b = b2.select(col("band_idx"), col("band_val"),
        col("doc_id").as("id_b"), col("phash").as("ph_b"))
      a.join(b, Seq("band_idx", "band_val")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    },
    Some(phashBandsCte +
      // df-cap literals interpolated from PhashBandDfCap so one
      // definition drives plan AND oracle (can't silently desync)
      s""",
      |usable AS (
      |  SELECT band_idx, band_val FROM bands
      |  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND $PhashBandDfCap),
      |bu AS (SELECT bands.* FROM bands JOIN usable USING (band_idx, band_val))
      |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |FROM bu a JOIN bu b
      |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.phash, b.phash)) <= 3
      |""".stripMargin)
  )

  // mm_hot_bands — mm_phash's boilerplate/saturation readout (the
  // mm_hot_frames discipline applied to signature bands): every
  // (band_idx, band_val) with document frequency above PhashBandDfCap,
  // with its df. Two populations land here: boilerplate signatures
  // (uniform frames, verbatim copy families — every band hot) and, past
  // ~10^6 docs, RANDOM saturation of the 15-bit band space (5M docs /
  // 32768 values ≈ 150 per bucket by pigeonhole alone — at that scale
  // the scale path is a wider signature, e.g. dd_simhash's 64-bit one,
  // not a bigger join). One partial-aggregable rollup, linear output.
  private val mmHotBands = Q(
    "mm_hot_bands",
    (s, d) => {
      val hashed = graft.Exact.fanout(Tables.documents(s, d))
        .withColumn("stride", expr("greatest((length(text) - 1) div 66, 1)"))
        .withColumn("bs", expr(
          "transform(sequence(0, 65), k -> ascii(substring(text, k * stride + 1, 1)))"))
        .withColumn("phash", expr(
          """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) ->
            |  acc + IF(element_at(bs, CAST((j div 10) * 11 + (j % 10) + 1 AS INT))
            |           < element_at(bs, CAST((j div 10) * 11 + (j % 10) + 2 AS INT)),
            |        shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
        .select(col("doc_id"), col("phash"))
      phashBands(hashed)
        .groupBy("band_idx", "band_val").agg(count(lit(1)).as("df"))
        .filter(col("df") > PhashBandDfCap)
        .select(col("band_idx").cast("long").as("band_idx"),
          col("band_val"), col("df"))
    },
    Some(phashBandsCte +
      s"""
      |SELECT CAST(band_idx AS BIGINT) AS band_idx, band_val,
      |  CAST(COUNT(*) AS BIGINT) AS df
      |FROM bands GROUP BY 1, 2 HAVING COUNT(*) > $PhashBandDfCap
      |""".stripMargin)
  )

  // Hot-frame stop-list bound: a frame checksum shared by more than this
  // many documents is boilerplate (black frames, logo intros, test-pattern
  // leaders — or a generator that copies media bytes verbatim) and is
  // excluded from the pair join, because m documents sharing one frame
  // make an O(m²) pair surface inside a single bucket. Same discipline as
  // dd_winnow_pairs' fingerprint df ∈ [2,50] stop-list
  // (dedup/DedupD.scala): the capped prints stay visible through the
  // mm_hot_frames readout below instead of silently exploding the join.
  private[multimodal] val SharedFrameDfCap = 50

  // Frame-checksum table shared by mm_shared_frames and mm_hot_frames:
  // each payload splits into 4 fixed-stride frames, one row per
  // (doc_id, frame_idx, frame_md5). Narrow map over the pruned scan.
  private def frameTable(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("flen", (length(col("payload")) / 4).cast("int"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), i -> md5(substring(payload, i * flen + 1, flen)))")))
      .toDF("doc_id", "frame_idx", "frame_md5")

  private val frameCte =
    """WITH f AS (
      |  SELECT doc_id, length(text) // 4 AS flen,
      |    unnest(generate_series(0, 3)) AS frame_idx, text
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, frame_idx,
      |    md5(substr(text, frame_idx * flen + 1, flen)) AS frame_md5
      |  FROM f)""".stripMargin

  // mm_shared_frames — frame-level near-dup pairs (the "same clip,
  // different container" video-dedup signal): payloads sharing ≥ 2
  // identical sampled frames, found by joining the frame-checksum table
  // on frame content WITHIN a frame index (two clips sharing frame k)
  // — hash-bucket join, never all-pairs, and each (frame_idx, frame_md5)
  // bucket is document-frequency capped at [2, SharedFrameDfCap] before
  // the self-join: df < 2 can't pair, df > cap is boilerplate whose m²
  // pair surface would melt a single reducer at 100 TB (the sf100
  // generator demonstrated exactly this: payload copies shared every
  // frame 1000 ways → >50 GB of pairs). Builds on mm_framesample's
  // frame table; the frame table materializes once (graftCheckpoint) and
  // feeds the df filter and both self-join sides.
  private val mmSharedFrames = Q(
    "mm_shared_frames",
    (s, d) => {
      val frames = frameTable(s, d).graftCheckpoint()
      val usable = frames.groupBy("frame_idx", "frame_md5")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= SharedFrameDfCap)
        .select("frame_idx", "frame_md5")
      val f2 = frames.join(usable, Seq("frame_idx", "frame_md5"))
      val a = f2.select(col("frame_idx"), col("frame_md5"), col("doc_id").as("id_a"))
      val b = f2.select(col("frame_idx"), col("frame_md5"), col("doc_id").as("id_b"))
      a.join(b, Seq("frame_idx", "frame_md5")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
    },
    Some(frameCte +
      // SharedFrameDfCap interpolated — same single-definition rule
      s""",
      |usable AS (
      |  SELECT frame_idx, frame_md5 FROM fr
      |  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND $SharedFrameDfCap),
      |fu AS (SELECT fr.* FROM fr JOIN usable USING (frame_idx, frame_md5))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM fu a JOIN fu b
      |  ON a.frame_idx = b.frame_idx AND a.frame_md5 = b.frame_md5
      |     AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin)
  )

  // mm_hot_frames — the boilerplate-frames readout paired with
  // mm_shared_frames' stop-list: every frame checksum whose document
  // frequency exceeds SharedFrameDfCap, with its df. This is what the
  // cap dropped — a curation dashboard reviews it (black frames, logo
  // intros, verbatim-copied payloads) instead of paying the m² pair
  // join for it. One partial-aggregable rollup; output is one row per
  // distinct hot frame, linear in distinct frames, never quadratic.
  private val mmHotFrames = Q(
    "mm_hot_frames",
    (s, d) => {
      frameTable(s, d)
        .groupBy("frame_idx", "frame_md5")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > SharedFrameDfCap)
        .select(col("frame_idx").cast("long").as("frame_idx"),
          col("frame_md5"), col("df"))
    },
    Some(frameCte +
      s"""
      |SELECT CAST(frame_idx AS BIGINT) AS frame_idx, frame_md5,
      |  CAST(COUNT(*) AS BIGINT) AS df
      |FROM fr GROUP BY 1, 2 HAVING COUNT(*) > $SharedFrameDfCap
      |""".stripMargin)
  )

  // mm_scene_cuts — scene-change detection over the sampled-frame
  // surface (the shot-boundary pass of a video pipeline: a cut is a
  // frame whose feature jumps vs its predecessor): each payload splits
  // into 16 fixed-stride frames, the per-frame feature is an exact
  // integer (space count — the stand-in for a luma histogram a real
  // decoder would emit behind the same schema), and the boundary test
  // |Δfeature|·50 > frame_len is pure integer arithmetic. The only
  // window is the lag on the HIGH-cardinality doc_id — parallelism
  // scales with clips; empty payloads are filtered BEFORE the frame
  // sequence is built (the r4 empty-payload lesson: Spark's
  // sequence(0,-1) descends while DuckDB's generate_series is empty).
  private val mmSceneCuts = Q(
    "mm_scene_cuts",
    (s, d) => {
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Tables.documents(s, d)
        .withColumn("flen", (length(col("text")) / 16).cast("int"))
        .filter(col("flen") > 0)
        .select(col("doc_id"), col("flen"),
          posexplode(expr(
            "transform(sequence(0, 15), i -> substring(text, i * flen + 1, flen))")))
        .toDF("doc_id", "flen", "frame_idx", "frame")
        .withColumn("n_space",
          (length(col("frame")) - length(expr("replace(frame, ' ', '')"))).cast("long"))
        .withColumn("delta", abs(col("n_space") - lag(col("n_space"), 1).over(byDoc)))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_space"), col("delta"),
          coalesce(col("delta") * lit(50L) > col("flen").cast("long"), lit(false))
            .as("is_cut"))
    },
    Some("""WITH fr AS (
      |  SELECT doc_id, length(text) // 16 AS flen,
      |    unnest(generate_series(0, 15)) AS frame_idx, text
      |  FROM documents WHERE length(text) // 16 > 0),
      |feat AS (
      |  SELECT doc_id, flen, CAST(frame_idx AS BIGINT) AS frame_idx,
      |    CAST(length(substr(text, frame_idx * flen + 1, flen))
      |      - length(replace(substr(text, frame_idx * flen + 1, flen), ' ', '')) AS BIGINT) AS n_space
      |  FROM fr),
      |d AS (
      |  SELECT doc_id, frame_idx, n_space, flen,
      |    ABS(n_space - LAG(n_space) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
      |  FROM feat)
      |SELECT doc_id, frame_idx, n_space, delta,
      |  COALESCE(delta * 50 > flen, FALSE) AS is_cut
      |FROM d""".stripMargin)
  )

  override val qs: Seq[Q] = Seq(mmMeta, mmFrameSample, mmFeatures, mmAudioWindow,
    mmSilence, mmPhash, mmHotBands, mmSharedFrames, mmHotFrames, mmSceneCuts)
}

/** Decode stub boundary: the partition-level plumbing a real media
  * decoder slots into (the Scala analog of mapInPandas — one iterator per
  * partition so the decoder amortizes per-batch setup: codec contexts,
  * model weights, pinned buffers). The decode itself is a deterministic
  * fake because the container ships no codecs (per the round brief);
  * swapping [[MediaDecode.decodeStub]] for a real JNI/FFmpeg call changes
  * nothing about schema, partitioning, or batch shape.
  */
object MediaDecode {
  /** Typed output row of the decode stage. */
  case class Decoded(doc_id: Long, width: Int, height: Int, channels: Int,
      n_bytes: Long, byte_mean: Double)

  /** payload bytes → (width, height, n_channels) — stubbed. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (64 + payload.length % 64, 64 + (payload.length / 64) % 64, 3)

  /** Batch decode: narrow mapPartitions over (id, payload) rows. The
    * "feature" (mean byte value) stands in for the embedding/pixel stats
    * a real decoder would emit.
    */
  def decodeBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would happen here (decoder init, buffers)
        it.map { case (id, bytes) =>
          val (w, h, c) = decodeStub(bytes)
          var s = 0L
          var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          val mean = if (bytes.length == 0) 0.0 else s.toDouble / bytes.length
          Decoded(id, w, h, c, bytes.length.toLong, mean)
        }
      }
  }

  /** Typed output row of the resize stage. */
  case class Resized(doc_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      out_md5: String, out_mean: Double)

  /** Resize stage: 2×2 average pooling over the stub-decoded W×H byte
    * grid (payload bytes cycled to fill the grid — the deterministic fake
    * pixel source, same domain as [[decodeStub]]). Same mapPartitions
    * batch boundary as decodeBatch: a real resampler (libyuv / swscale)
    * slots in per-partition without changing schema or partitioning, and
    * the output stays an opaque-but-checksummed byte image.
    */
  def resizeBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition setup
        it.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          def px(r: Int, c: Int): Int =
            if (bytes.length == 0) 0 else bytes(((r * w + c) % bytes.length + bytes.length) % bytes.length) & 0xff
          val ow = w / 2
          val oh = h / 2
          val out = new Array[Byte](ow * oh)
          var s = 0L
          var r = 0
          while (r < oh) {
            var c = 0
            while (c < ow) {
              val v = (px(2 * r, 2 * c) + px(2 * r, 2 * c + 1) +
                px(2 * r + 1, 2 * c) + px(2 * r + 1, 2 * c + 1)) / 4
              out(r * ow + c) = v.toByte
              s += v
              c += 1
            }
            r += 1
          }
          md.reset()
          val hex = md.digest(out).map("%02x".format(_)).mkString
          Resized(id, w, h, ow, oh, hex, s.toDouble / (ow * oh))
        }
      }
  }
}
