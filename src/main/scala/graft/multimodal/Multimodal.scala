package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Registry.Q
import graft.Tables

/** Multimodal column operators (SURVEY.md §2 "Multimodal") over REAL
  * media payloads: deterministic PNG images (gray + truecolor,
  * encoded and decoded with `javax.imageio`) and RIFF/WAVE audio
  * (PCM16, manual chunk-walk decode) — see [[MediaCodec]]. The
  * Spark-side design is the production shape:
  *  - payloads are opaque `binary` columns (never decoded by scans
  *    that don't need them — column pruning skips the bytes);
  *  - metadata comes from a HEADER-ONLY parse (PNG IHDR / RIFF fmt
  *    chunk), so dimension/duration filters prune before any pixel
  *    or sample is touched;
  *  - decode/feature-extract runs batched per partition
  *    (`mapPartitions`), amortizing codec setup per
  *    executor-partition, not per row.
  *
  * The synthesized content follows closed-form formulas in `doc_id`,
  * which is what makes genuinely-decoded statistics DuckDB-oracle-able
  * — and simultaneously pins that encode→decode round-trips
  * bit-exactly (a lossy or shifted codec path would fail the hash
  * gate on every row).
  */
object Multimodal {

  /** `(doc_id, payload)` with real media bytes: doc_id%3 = 0 → gray
    * PNG, 1 → RGB PNG, 2 → WAV. Synthesis is executor-side
    * (mapPartitions) — the driver never holds payloads. */
  private def payloads(s: SparkSession, d: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          // negative ids would route differently here (Scala match
          // default) than in the oracles (SQL CASE default) and feed
          // negative geometry into the raster fill — refuse loudly
          // rather than diverge silently
          require(id >= 0, s"payload synthesis requires doc_id >= 0, got $id")
          val bytes = (id % 3) match {
            case 0 => MediaCodec.encodeGrayPng(id)
            case 1 => MediaCodec.encodeRgbPng(id)
            case _ => MediaCodec.encodeWav(id)
          }
          (id, bytes)
        }
      }
  }

  /** Metadata extraction WITHOUT decode: sniff the real magic bytes,
    * read png dimensions from the IHDR chunk / wav sample count and
    * rate from the fmt+data chunks. Touches only header bytes. */
  private val metadata: Q = (s, d) => {
    import s.implicits._
    payloads(s, d).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (fmt, d1, d2) = MediaCodec.sniff(bytes)
        (id, fmt, d1, d2)
      }
    }.toDF("doc_id", "fmt", "dim1", "dim2")
      .orderBy(col("doc_id"))
  }

  /** Full decode + feature extraction: mean channel value over the
    * decoded pixels (images) or mean amplitude over the decoded PCM
    * samples (audio). Integer-exact sums, one double division — the
    * oracle reproduces the same arithmetic. */
  private val features: Q = (s, d) => {
    import s.implicits._
    payloads(s, d).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (fmt, _, _) = MediaCodec.sniff(bytes)
        if (fmt == "png") {
          val (w, h, ch, v) = MediaCodec.decodeImage(bytes)
          var sum = 0L
          for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
            sum += v(x, y, c)
          val n = w * h * ch
          (id, fmt, n, sum.toDouble / n)
        } else {
          val ss = MediaCodec.decodeWav(bytes)
          val sum = ss.foldLeft(0L)(_ + _)
          (id, fmt, ss.length, sum.toDouble / ss.length)
        }
      }
    }.toDF("doc_id", "fmt", "n_vals", "mean_val")
      .orderBy(col("doc_id"))
  }

  /** Resize: decode the real pixels, 2× nearest-neighbor downsample
    * (out(x,y) = in(2x,2y)), RE-ENCODE to PNG, and report statistics
    * of the re-decoded result — so the oracle match pins the full
    * decode→resize→encode→decode loop. Audio analog: keep every 2nd
    * sample. */
  private val resize: Q = (s, d) => {
    import s.implicits._
    payloads(s, d).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (fmt, _, _) = MediaCodec.sniff(bytes)
        if (fmt == "png") {
          val (w, h, ch, v) = MediaCodec.decodeImage(bytes)
          val (nw, nh) = ((w + 1) / 2, (h + 1) / 2)
          val resized = MediaCodec.encodeImage(nw, nh, ch,
            (x, y, c) => v(2 * x, 2 * y, c))
          val (w2, h2, ch2, v2) = MediaCodec.decodeImage(resized)
          var sum = 0L
          for (y <- 0 until h2; x <- 0 until w2; c <- 0 until ch2)
            sum += v2(x, y, c)
          (id, fmt, w, h, w2, h2, sum.toDouble / (w2 * h2 * ch2))
        } else {
          val ss = MediaCodec.decodeWav(bytes)
          val kept = Array.tabulate((ss.length + 1) / 2)(i => ss(2 * i))
          val sum = kept.foldLeft(0L)(_ + _)
          (id, fmt, ss.length, MediaCodec.WavSampleRate,
            kept.length, MediaCodec.WavSampleRate,
            sum.toDouble / kept.length)
        }
      }
    }.toDF("doc_id", "fmt", "dim1", "dim2", "new_dim1", "new_dim2", "new_mean")
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over decoded content: for images a "frame" is a
    * pixel row (every 4th row's mean), for audio a 32-sample window
    * (every 4th window's mean, last window short) — one output row
    * per sampled frame, flat-mapped per partition so a long payload
    * fans out without materializing all frames anywhere. */
  private val framesample: Q = (s, d) => {
    import s.implicits._
    payloads(s, d).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val (fmt, _, _) = MediaCodec.sniff(bytes)
        if (fmt == "png") {
          val (w, h, ch, v) = MediaCodec.decodeImage(bytes)
          (0 until h by 4).iterator.map { y =>
            var sum = 0L
            for (x <- 0 until w; c <- 0 until ch) sum += v(x, y, c)
            (id, y, sum.toDouble / (w * ch))
          }
        } else {
          val ss = MediaCodec.decodeWav(bytes)
          val frames = (ss.length + 31) / 32
          (0 until frames by 4).iterator.map { f =>
            val from = f * 32
            val until = math.min(ss.length, from + 32)
            var sum = 0L
            var i = from
            while (i < until) { sum += ss(i); i += 1 }
            (id, f, sum.toDouble / (until - from))
          }
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_mean")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The LOSSY decode path — real multimodal corpora are
    * JPEG-dominated, and lossy breaks the bit-exact oracle the PNG/WAV
    * queries rely on, so the contract here is a tolerance-bounded
    * DECISION ROW (the ann_pq recall-gate pattern): encode the
    * truecolor content formula as baseline JPEG, header-sniff the SOF
    * dimensions, fully decode, and compare pixels against the
    * closed-form [[MediaCodec.rgbAt]]. The row proves (1) every doc's
    * sniffed AND decoded dimensions match the formula, (2) the mean
    * absolute per-channel error stays under [[JpegErrBound]]
    * (empirically 12–27 on this high-frequency mod-256 pattern at the
    * default writer quality; 40 leaves ~50% margin), and (3) the path
    * is genuinely lossy (min error > 1 — a silently-swapped lossless
    * codec would be caught, not celebrated). */
  private val JpegErrBound = 40.0
  private val jpeg: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 1) // the truecolor cohort
      .mapPartitions { ids =>
        ids.map { id =>
          val bytes = MediaCodec.encodeJpeg(id)
          val (fmt, sw, sh) = MediaCodec.sniff(bytes)
          val (w, h, ch, v) = MediaCodec.decodeImage(bytes)
          val dimsOk = fmt == "jpeg" && sw == w && sh == h && ch == 3 &&
            w == MediaCodec.widthOf(id) && h == MediaCodec.heightOf(id)
          var err = 0L
          for (y <- 0 until h; x <- 0 until w) {
            val (r, g, b) = MediaCodec.rgbAt(id, x, y)
            err += math.abs(v(x, y, 0) - r) +
              math.abs(v(x, y, 1) - g) + math.abs(v(x, y, 2) - b)
          }
          (id, dimsOk, err.toDouble / (w * h * 3))
        }
      }.toDF("doc_id", "dims_ok", "mean_err")
      .agg(count(lit(1)).as("n_docs"),
        // vacuous truth on an empty cohort, matching the oracle's
        // literal TRUE columns (bool_and/max/min over zero rows are
        // NULL otherwise and the compare would fail on tiny corpora)
        coalesce(expr("bool_and(dims_ok)"), lit(true)).as("dims_ok"),
        coalesce(max(col("mean_err")) <= JpegErrBound, lit(true))
          .as("err_bounded"),
        coalesce(min(col("mean_err")) > 1.0, lit(true)).as("lossy"))
  }

  /** VIDEO: container-level frame extraction over real RIFF/AVI
    * payloads (uncompressed 8-bit DIB frames — raw is video's
    * oracle-able form; `mm_jpeg` owns the lossy contract). Per doc:
    * header-only metadata require()d against the avih header BEFORE
    * any frame byte is touched (the prune-before-decode law), then
    * every 2nd frame fully decodes to its mean pixel value — one
    * output row per sampled frame, flat-mapped per partition. The
    * decode walks the real container: LIST/chunk structure, bottom-up
    * DIB rows, 4-byte stride — an off-by-one in any of them shifts
    * every mean and fails the hash gate. */
  private val video: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          require(id >= 0, s"payload synthesis requires doc_id >= 0, got $id")
          val bytes = MediaCodec.encodeAvi(id)
          val (nf, sw, sh) = MediaCodec.sniffAvi(bytes)
          require(nf == MediaCodec.numFramesOf(id) &&
              sw == MediaCodec.widthOf(id) &&
              sh == MediaCodec.heightOf(id),
            "header-only AVI metadata must match the synthesis formula")
          val (w, h, n, v) = MediaCodec.decodeAviFrames(bytes)
          (0 until n by 2).iterator.map { f =>
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += v(f, x, y); x += 1 }
              y += 1
            }
            (id, f, sum.toDouble / (w * h))
          }
        }
      }.toDF("doc_id", "frame_idx", "frame_mean")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Map[String, Q] = Map(
    "mm_video" -> video,
    "mm_metadata" -> metadata,
    "mm_features" -> features,
    "mm_resize" -> resize,
    "mm_framesample" -> framesample,
    "mm_jpeg" -> jpeg)

  // ---- DuckDB oracles ----------------------------------------------
  // The oracles reconstruct the decoded statistics from the content
  // formulas (MediaCodec.grayAt/rgbAt/sampleAt) — an off-by-one in
  // the codec path, a gamma shift, or a lossy re-encode would
  // hash-fail every row.

  /** Shared per-doc geometry CTE. */
  private val geomCte =
    """WITH m AS (
      |  SELECT doc_id,
      |    16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
      |    64 + (doc_id % 9) * 16 AS n,
      |    CAST(doc_id % 3 AS INT) AS k
      |  FROM documents)""".stripMargin

  private def graySum(x: String, y: String) =
    s"(doc_id*31 + ($x)*7 + ($y)*13) % 256"
  private def rgbSum(x: String, y: String) =
    s"(doc_id*31 + ($x)*7 + ($y)*13) % 256 + " +
      s"(doc_id*37 + ($x)*11 + ($y)*17) % 256 + " +
      s"(doc_id*41 + ($x)*13 + ($y)*19) % 256"
  private def wavSample(i: String) =
    s"(doc_id*131 + ($i)*17) % 65536 - 32768"

  private def frameSum(f: String, x: String, y: String) =
    s"(doc_id*31 + ($f)*29 + ($x)*7 + ($y)*13) % 256"

  val oracles: Map[String, String] = Map(
    // per-sampled-frame mean of the closed-form frame formula; the
    // Spark side must reproduce it through a REAL container decode
    "mm_video" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
         |    4 + doc_id % 5 AS nf
         |  FROM documents),
         |fr AS (SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f FROM m)
         |SELECT doc_id, CAST(f AS INT) AS frame_idx,
         |  CAST(list_sum(flatten(list_transform(range(h),
         |    y -> list_transform(range(w),
         |      x -> ${frameSum("f", "x", "y")})))) AS DOUBLE)
         |    / (w*h) AS frame_mean
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
    // Decision-row oracle: the count is exact (the truecolor cohort);
    // the three booleans are the tolerance contract the Spark side
    // must prove (dims bit-exact, error bounded, path genuinely lossy).
    "mm_jpeg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  TRUE AS dims_ok, TRUE AS err_bounded, TRUE AS lossy
        |FROM documents WHERE doc_id % 3 = 1""".stripMargin,
    "mm_metadata" ->
      s"""$geomCte
         |SELECT doc_id,
         | CASE WHEN k = 2 THEN 'wav' ELSE 'png' END AS fmt,
         | CAST(CASE WHEN k = 2 THEN n ELSE w END AS INT) AS dim1,
         | CAST(CASE WHEN k = 2 THEN 8000 ELSE h END AS INT) AS dim2
         |FROM m ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      s"""$geomCte
         |SELECT doc_id,
         | CASE WHEN k = 2 THEN 'wav' ELSE 'png' END AS fmt,
         | CAST(CASE WHEN k = 0 THEN w*h WHEN k = 1 THEN w*h*3 ELSE n END AS INT) AS n_vals,
         | CASE WHEN k = 0 THEN CAST(list_sum(flatten(list_transform(range(h),
         |        y -> list_transform(range(w), x -> ${graySum("x", "y")})))) AS DOUBLE) / (w*h)
         |      WHEN k = 1 THEN CAST(list_sum(flatten(list_transform(range(h),
         |        y -> list_transform(range(w), x -> ${rgbSum("x", "y")})))) AS DOUBLE) / (w*h*3)
         |      ELSE CAST(list_sum(list_transform(range(n),
         |        i -> ${wavSample("i")})) AS DOUBLE) / n
         | END AS mean_val
         |FROM m ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""$geomCte,
         |m2 AS (SELECT *, (w+1)//2 AS nw, (h+1)//2 AS nh, (n+1)//2 AS nn FROM m)
         |SELECT doc_id,
         | CASE WHEN k = 2 THEN 'wav' ELSE 'png' END AS fmt,
         | CAST(CASE WHEN k = 2 THEN n ELSE w END AS INT) AS dim1,
         | CAST(CASE WHEN k = 2 THEN 8000 ELSE h END AS INT) AS dim2,
         | CAST(CASE WHEN k = 2 THEN nn ELSE nw END AS INT) AS new_dim1,
         | CAST(CASE WHEN k = 2 THEN 8000 ELSE nh END AS INT) AS new_dim2,
         | CASE WHEN k = 0 THEN CAST(list_sum(flatten(list_transform(range(nh),
         |        y -> list_transform(range(nw), x -> ${graySum("2*x", "2*y")})))) AS DOUBLE) / (nw*nh)
         |      WHEN k = 1 THEN CAST(list_sum(flatten(list_transform(range(nh),
         |        y -> list_transform(range(nw), x -> ${rgbSum("2*x", "2*y")})))) AS DOUBLE) / (nw*nh*3)
         |      ELSE CAST(list_sum(list_transform(range(nn),
         |        i -> ${wavSample("2*i")})) AS DOUBLE) / nn
         | END AS new_mean
         |FROM m2 ORDER BY doc_id""".stripMargin,
    "mm_framesample" ->
      s"""$geomCte,
         |png AS (SELECT doc_id, w, k, unnest(range(0, h, 4)) AS y FROM m WHERE k < 2),
         |pngf AS (
         |  SELECT doc_id, CAST(y AS INT) AS frame_idx,
         |   CASE WHEN k = 0 THEN CAST(list_sum(list_transform(range(w),
         |          x -> ${graySum("x", "y")})) AS DOUBLE) / w
         |        ELSE CAST(list_sum(list_transform(range(w),
         |          x -> ${rgbSum("x", "y")})) AS DOUBLE) / (w*3)
         |   END AS frame_mean
         |  FROM png),
         |wav AS (SELECT doc_id, n, unnest(range(0, (n+31)//32, 4)) AS f FROM m WHERE k = 2),
         |wavf AS (
         |  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         |   CAST(list_sum(list_transform(range(f*32, least(n, f*32+32)),
         |     i -> ${wavSample("i")})) AS DOUBLE)
         |     / (least(n, f*32+32) - f*32) AS frame_mean
         |  FROM wav)
         |SELECT * FROM pngf UNION ALL SELECT * FROM wavf
         |ORDER BY doc_id, frame_idx""".stripMargin)
}
