package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables

/** Streaming operators (SURVEY.md §2 "Streaming").
  *
  * Each operator is defined as a *transformation* applicable to both
  * a batch DataFrame and a `readStream` DataFrame — the Structured
  * Streaming way. The driver-facing queries run the batch plan (so
  * they are DuckDB-oracle-checkable); `StreamingSpec` runs the same
  * transformations through an actual streaming query with a memory
  * sink and checks agreement.
  *
  * Scale: tumbling windows + watermark bound state to
  * |keys × windows in flight|; sessionization state is O(1) per key.
  */
object StreamingOps {

  /** Tumbling 5-minute window aggregate per event type. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("v"))

  /** Gap-based sessionization (30-minute inactivity gap), batch
    * formulation: flag session starts via lag, running-sum the flags
    * into session ids. The streaming formulation (same semantics) is
    * `Sessionize.streaming` below. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_start",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
  }

  /** Stateful dedup: one row per (user, type, 5-min bucket) — the
    * batch analog of `dropDuplicates` within a watermark. */
  def dedupBatch(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        window(col("ts"), "5 minutes").getField("start").as("w_start"))
      .distinct()

  private val windowAggQ: Q = (s, d) =>
    windowAgg(Tables.events(s, d))
      .orderBy(col("w_start"), col("event_type"))

  private val sessionizeQ: Q = (s, d) =>
    sessionizeBatch(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_id"))

  private val dedupQ: Q = (s, d) =>
    dedupBatch(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type"), col("w_start"))

  val queries: Map[String, Q] = Map(
    "stream_window_agg" -> windowAggQ,
    "stream_sessionize" -> sessionizeQ,
    "stream_dedup_state" -> dedupQ)

  val oracles: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        | f AS (
        |  SELECT user_id, event_id, tsu,
        |   CASE WHEN lag(tsu) OVER w IS NULL
        |         OR epoch_us(tsu) - epoch_us(lag(tsu) OVER w) > 1800000000
        |        THEN 1 ELSE 0 END AS is_start
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        | y AS (
        |  SELECT user_id, tsu,
        |   CAST(SUM(is_start) OVER (PARTITION BY user_id
        |     ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | min(tsu) AS t_start, max(tsu) AS t_end
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "stream_dedup_state" ->
      """SELECT DISTINCT user_id, event_type,
        | time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start
        |FROM events ORDER BY user_id, event_type, w_start""".stripMargin)
}
