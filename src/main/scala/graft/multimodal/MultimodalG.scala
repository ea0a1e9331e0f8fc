package graft.multimodal

import graft.{Q, Tables, Module}
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
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  upper(hex(substr(text, 1, 8))) AS head_hex,
      |  64 + CAST(length(text) AS BIGINT) % 64 AS width,
      |  64 + (CAST(length(text) AS BIGINT) // 64) % 64 AS height
      |FROM documents ORDER BY doc_id""".stripMargin)
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
        .orderBy("doc_id", "frame_idx")
    },
    Some("""WITH f AS (
      |  SELECT doc_id, length(text) // 4 AS flen,
      |    unnest(generate_series(0, 3)) AS frame_idx, text
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(flen AS BIGINT) AS frame_len,
      |  md5(substr(text, frame_idx * flen + 1, flen)) AS frame_md5
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
  )

  override val qs: Seq[Q] = Seq(mmMeta, mmFrameSample)
}

/** Decode stub boundary: the signature a real media decoder would slot
  * into (mapInPandas/mapPartitions at scale); deterministic fake here
  * because the container ships no codecs (per the round brief).
  */
object MediaDecode {
  /** payload bytes → (width, height, n_channels) — stubbed. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (64 + payload.length % 64, 64 + (payload.length / 64) % 64, 3)
}
