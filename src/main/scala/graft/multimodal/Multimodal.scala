package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, Row}
import graft.Registry.Q
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2 "Multimodal").
  *
  * Media libraries aren't in this container, so the *decode* step is
  * a clearly-marked deterministic stub — but the Spark-side design is
  * the real thing:
  *  - payloads are opaque `binary` columns in parquet (never decoded
  *    during scans that don't need them — column pruning skips the
  *    bytes entirely);
  *  - typed metadata (format, byte size) lives in ordinary columns,
  *    so filters prune *before* any decode;
  *  - decode/feature-extract runs batched per partition
  *    (`mapPartitions`), amortizing per-batch model/codec setup the
  *    way a real image decoder or embedding model would be loaded
  *    once per executor-partition, not per row.
  *
  * Payloads are synthesized deterministically from `documents.text`
  * (a magic prefix + utf-8 bytes) since the test corpus has no real
  * media.
  */
object Multimodal {

  private def payloads(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .withColumn("magic",
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'PNG!' WHEN 1 THEN 'JPG!' ELSE 'WAV!' END"))
      .withColumn("payload", concat(col("magic"), col("text")).cast("binary"))

  /** Metadata extraction: sniff the format from the payload's magic
    * bytes, record byte size — pure column expressions over the
    * binary column. */
  private val metadata: Q = (s, d) =>
    payloads(s, d)
      .select(
        col("doc_id"),
        // decode(...) of the first 4 payload bytes = format sniff
        expr("CASE decode(CAST(substring(payload, 1, 4) AS BINARY), 'UTF-8') " +
          "WHEN 'PNG!' THEN 'png' WHEN 'JPG!' THEN 'jpg' ELSE 'wav' END")
          .as("fmt"),
        length(col("payload")).as("payload_bytes"))
      .orderBy(col("doc_id"))

  /** Feature extraction over the binary column, batched per
    * partition. The per-element "decoder" below is the STUB — in
    * production it would be an image/audio codec + model invoked on
    * the whole batch; everything around it (schema, partition-level
    * batching, opaque-binary transport) is real and tested. */
  private val features: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val src: Dataset[(Long, Array[Byte])] = payloads(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      // batch-level setup happens once per partition (codec/model load)
      batch.map { case (id, bytes) =>
        // --- STUB DECODER (deterministic fake) -------------------
        // real impl: decode image/audio, run feature extractor
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val meanByte = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        val f1 = bytes.length.toDouble
        val f2 = if (bytes.nonEmpty) (bytes.head & 0xff).toDouble else 0.0
        // ---------------------------------------------------------
        (id, meanByte, f1, f2)
      }
    }.toDF("doc_id", "f_mean_byte", "f_len", "f_first_byte")
      .orderBy(col("doc_id"))
  }

  /** Batched "resize": every 4th byte of the payload survives — the
    * STUB stands in for an image rescale kernel; the contract (binary
    * in, binary out, size metadata in ordinary columns so downstream
    * filters need not touch bytes) is the real design. */
  private val resize: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val src: Dataset[(Long, Array[Byte])] = payloads(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        // --- STUB RESIZE (deterministic fake: 4x downsample) -------
        val out = bytes.indices.collect { case i if i % 4 == 0 => bytes(i) }.toArray
        // -----------------------------------------------------------
        (id, bytes.length, out.length, out)
      }
    }.toDF("doc_id", "orig_bytes", "resized_bytes", "resized_payload")
      .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: treat the payload as fixed-16-byte "frames" and
    * keep every 4th — one output row per sampled frame (flat-mapped
    * per partition, so a long video fans out without ever
    * materializing all frames on the driver). */
  private val framesample: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val FrameBytes = 16
    val Stride = 4
    val src: Dataset[(Long, Array[Byte])] = payloads(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by Stride).iterator.map { idx =>
          // --- STUB FRAME DECODE (length-only fake) ----------------
          val len = math.min(FrameBytes, bytes.length - idx * FrameBytes)
          // ---------------------------------------------------------
          (id, idx, len)
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_len")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Map[String, Q] = Map(
    "mm_metadata" -> metadata,
    "mm_features" -> features,
    "mm_resize" -> resize,
    "mm_framesample" -> framesample)

  val oracles: Map[String, String] = Map(
    // The stub features are pure byte arithmetic over the payload
    // (magic || utf8(text)): mean byte value, byte length, first
    // byte. DuckDB reconstructs them from code points (== bytes for
    // this ASCII corpus); the division is the same exact-int-over-
    // exact-int IEEE op on both engines.
    "mm_features" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(string_split(
        |   (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'PNG!'
        |     WHEN 1 THEN 'JPG!' ELSE 'WAV!' END) || text, ''),
        |   c -> ascii(c))) AS DOUBLE)
        |   / CAST(octet_length(encode(text)) + 4 AS DOUBLE) AS f_mean_byte,
        | CAST(octet_length(encode(text)) + 4 AS DOUBLE) AS f_len,
        | CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 80
        |   WHEN 1 THEN 74 ELSE 87 END AS DOUBLE) AS f_first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    // independent reconstruction of the payload contract
    "mm_metadata" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |   WHEN 1 THEN 'jpg' ELSE 'wav' END AS fmt,
        | CAST(octet_length(encode(text)) + 4 AS INT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the 4x-downsample size contract, reconstructed arithmetically
    "mm_resize" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) + 4 AS INT) AS orig_bytes,
        | CAST(ceil((octet_length(encode(text)) + 4) / 4.0) AS INT) AS resized_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every 4th 16-byte frame; the trailing frame is short
    "mm_framesample" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) + 4 AS nb
        |           FROM documents),
        |f AS (SELECT doc_id, nb,
        |        unnest(range(0, CAST(ceil(nb / 16.0) AS INT), 4)) AS frame_idx
        |      FROM p)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(least(16, nb - frame_idx * 16) AS INT) AS frame_len
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
}
