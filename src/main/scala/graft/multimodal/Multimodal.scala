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

  val queries: Map[String, Q] = Map(
    "mm_metadata" -> metadata,
    "mm_features" -> features)

  val oracles: Map[String, String] = Map(
    // independent reconstruction of the payload contract
    "mm_metadata" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |   WHEN 1 THEN 'jpg' ELSE 'wav' END AS fmt,
        | CAST(octet_length(encode(text)) + 4 AS INT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin)
}
