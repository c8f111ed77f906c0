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
          .cast("double").as("v"))
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

  /** Stream-stream join: each purchase matched to the same user's
    * clicks in the preceding hour (click attribution). The time-range
    * predicate is what makes this watermark-boundable in streaming —
    * state for a click can be dropped once the watermark passes
    * `c_ts + 1 hour`. `purchases`/`clicks` may be batch frames or two
    * `readStream`s with watermarks (StreamingSpec runs both). */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(purchases, clicks, "inner")

  /** The shared attribution join body — ONE definition of the
    * condition and naming so the inner and outer variants can never
    * drift. */
  private def attributionJoin(purchases: DataFrame, clicks: DataFrame,
      joinType: String): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"),
      col("user_id").as("p_uid"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("c_id"),
      col("user_id").as("c_uid"), col("ts").as("c_ts"))
    p.join(c, col("p_uid") === col("c_uid") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("c_ts") < col("p_ts"), joinType)
      .select(col("p_id"), col("c_id"), col("p_uid").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  private def byType(events: DataFrame, t: String): DataFrame =
    events.filter(col("event_type") === t)

  /** LEFT OUTER click attribution — the other half of the
    * stream-stream join matrix: purchases WITHOUT an attributable
    * click must also surface (null-padded), which is what funnel
    * analysis actually consumes. Streaming side: same watermarked
    * time-interval join as [[clickAttribution]] with
    * `"left_outer"`. */
  def clickAttributionOuter(purchases: DataFrame,
      clicks: DataFrame): DataFrame =
    attributionJoin(purchases, clicks, "left_outer")

  /** Batch replay of [[clickAttributionOuter]]'s STREAMING emission
    * contract: matched pairs always emit; an unmatched purchase
    * emits null-padded only once the watermark proves no future
    * click can match (clicks satisfy c_ts < p_ts, so the bound is
    * p_ts itself) — and the FINAL watermark is
    * `min(max purchase ts, max click ts) − delay` (Spark's
    * min-of-inputs multi-watermark policy), a function of the DATA,
    * not the trigger schedule. That is exactly why the streaming
    * result is batch-boundary-deterministic and oracle-able:
    * purchases still inside the horizon at end-of-stream are
    * retained in state and never emit, under any batching.
    * StreamingSpec runs the real watermarked streaming query and
    * proves it equal to this formulation. */
  def clickAttributionOuterBatch(events: DataFrame,
      delay: String = "2 hours"): DataFrame = {
    val p = byType(events, "purchase")
    val c = byType(events, "click")
    val inner = clickAttribution(p, c)
    // an EMPTY input never advances its watermark, so the global
    // min-of-inputs watermark stays at epoch and nothing is released
    // — least() alone would skip the NULL max and wrongly release
    // against the surviving side
    val wm = p.agg(max(col("ts")).as("mp"))
      .crossJoin(c.agg(max(col("ts")).as("mc")))
      .select(when(col("mp").isNull || col("mc").isNull,
          lit(null).cast("timestamp"))
        .otherwise(least(col("mp"), col("mc")) - expr(s"INTERVAL $delay"))
        .as("__wm"))
    val unmatched = p.select(col("event_id").as("p_id"),
        col("user_id"), col("ts").as("p_ts"))
      .join(inner.select(col("p_id")), Seq("p_id"), "left_anti")
      .crossJoin(broadcast(wm))
      .filter(col("p_ts") < col("__wm"))
      .select(col("p_id"), lit(null).cast("bigint").as("c_id"),
        col("user_id"), col("p_ts"),
        lit(null).cast("timestamp").as("c_ts"))
    inner.unionByName(unmatched)
  }

  /** The windowed aggregate under a late-data watermark — ONE
    * definition for both modes: streaming applies the watermark;
    * on a batch frame `withWatermark` is a no-op and
    * [[lateDataBatch]] replays the drop/emission contract
    * explicitly. */
  def lateWindowAgg(events: DataFrame, delay: String = "1 hour")
      : DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))

  /** Watermark LATE-DATA DROP contract, batch replay — the third leg
    * of the watermark matrix after emission ([[windowAgg]]) and
    * outer-join state release ([[clickAttributionOuterBatch]]).
    * Spark's actual admission law (SPARK-40925, verified empirically
    * here on a two-wave probe): the LATE filter in micro-batch N uses
    * the watermark that was in effect during batch N−1 — exactly the
    * boundary the previous batch-end EVICTION already applied — while
    * emission/eviction at the end of batch N uses the current
    * watermark. A straggler is therefore dropped iff its window was
    * already evicted from state, never merely because the current
    * watermark passed it; that keeps drop-vs-admit consistent with
    * state contents (and state bounded at |open windows × keys| at
    * 100 TB/day). Arrival is three deterministic waves:
    * wave 1 = on-time bulk (`event_id % 7 != 0`, ts ≤ max(ts) − 2 d),
    * wave 2 = on-time tail (rest of the non-stragglers),
    * wave 3 = stragglers (`event_id % 7 == 0`). The straggler batch
    * runs its late filter against W1 = max(wave-1 ts) − delay (the
    * watermark during the wave-2 batch, which also evicted every
    * window ending ≤ W1), so a straggler is admitted iff its
    * 10-minute window end > W1; the final append-mode emission covers
    * windows closed by the END watermark max(ALL ts) − delay — the
    * watermark tracks input max event time, dropped rows included.
    * The 2-day tail makes all three fates non-empty (dropped;
    * admitted-and-emitted; admitted-into-still-open windows), and
    * PipelineSpec proves a real three-batch watermarked query emits
    * exactly this. */
  def lateDataBatch(events: DataFrame, delay: String = "1 hour")
      : DataFrame = {
    val isLate = col("event_id") % 7 === 0
    val win = window(col("ts"), "10 minutes")
    val onTime = events.filter(!isLate)
    // W1 = the watermark in effect during the wave-2 batch = the late
    // filter (and already-evicted boundary) the straggler batch sees
    val wm1 = onTime
      .crossJoin(broadcast(events.agg(max(col("ts")).as("__mx"))))
      .filter(col("ts") <= col("__mx") - expr("INTERVAL 2 DAYS"))
      // an EMPTY wave 1 (event span < 2 days) establishes no
      // watermark, so the straggler batch admits everything — the
      // epoch floor keeps the NULL max from silently dropping all
      // stragglers instead (a NULL comparison filters every row)
      .agg(coalesce(max(col("ts")) - expr(s"INTERVAL $delay"),
        lit("1970-01-01 00:00:00").cast("timestamp")).as("__wm1"))
    // the TimeWindowing rule materializes an inline window() as an
    // extra struct column — project back to the event columns
    val admitted = events.filter(isLate).crossJoin(broadcast(wm1))
      .filter(win.getField("end") > col("__wm1"))
      .select(events.columns.map(col).toIndexedSeq: _*)
    val fwm = events.agg(
      (max(col("ts")) - expr(s"INTERVAL $delay")).as("__fwm"))
    lateWindowAgg(onTime.unionByName(admitted), delay)
      .crossJoin(broadcast(fwm))
      .filter(col("window.end") <= col("__fwm"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("v"))
  }

  private val lateDataQ: Q = (s, d) =>
    lateDataBatch(Tables.events(s, d))
      .orderBy(col("w_start"), col("event_type"))

  private val outerJoinQ: Q = (s, d) =>
    clickAttributionOuterBatch(Tables.events(s, d))
      .orderBy(col("p_id"), col("c_id"))

  private val windowAggQ: Q = (s, d) =>
    windowAgg(Tables.events(s, d))
      .orderBy(col("w_start"), col("event_type"))

  private val sessionizeQ: Q = (s, d) =>
    sessionizeBatch(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_id"))

  private val dedupQ: Q = (s, d) =>
    dedupBatch(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type"), col("w_start"))

  /** Windowed leaderboard: top-3 users by decimal-exact spend per
    * tumbling hour. In production streaming this runs as windowed agg
    * (update mode) with the rank applied by the serving layer; the
    * batch formulation here shares the exact semantics and oracle. */
  def windowTopK(events: DataFrame, k: Int): DataFrame = {
    val agg = events
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)").as("spend"))
      .select(col("window.start").as("w_start"), col("user_id"), col("spend"))
    val w = Window.partitionBy(col("w_start"))
      .orderBy(col("spend").desc, col("user_id").asc)
    agg.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      // rank on the exact decimal; only the OUTPUT column is double
      // (driver-hash decimal normalization differs across engines).
      .withColumn("spend", col("spend").cast("double"))
  }

  private val topkQ: Q = (s, d) =>
    windowTopK(Tables.events(s, d), 3)
      .orderBy(col("w_start"), col("rk"))

  private val joinQ: Q = (s, d) => {
    val e = Tables.events(s, d)
    clickAttribution(byType(e, "purchase"), byType(e, "click"))
      .orderBy(col("p_id"), col("c_id"))
  }

  /** Streaming ingest into the lakehouse — the reference's actual
    * production shape (streams land in governed Iceberg tables),
    * through the FIRST-CLASS `graft-lake` sink ([[GraftLakeSink]]):
    * each micro-batch MERGEs on event_id AND commits an
    * (appId, batchId) transaction watermark atomically with the data,
    * so ingest is exactly-once (a crash-replayed batch is detected
    * and skipped) and idempotent by key on top — the end state is
    * independent of batch boundaries (hence oracle-able). The run is
    * a real Structured Streaming query (Trigger.AvailableNow over a
    * staged multi-file source, maxFilesPerTrigger=1 ⇒ several
    * distinct merge commits), and the table is pre-seeded with stale
    * rows (value = -1) that the stream MUST overwrite for the oracle
    * to match. */
  private val lakeSinkQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables.events(s, d)
    // stage the source as 4 files so AvailableNow yields 4 batches
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_stream_sink_src").toString
    events.repartition(4).write.mode("overwrite").parquet(srcDir)
    val staged = s.read.parquet(srcDir)
    // pre-seed with stale values the merge must replace
    val t = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_stream_sink").toString,
      events.filter(col("event_id") % 10 === 0)
        .withColumn("value", lit(-1.0)))
    val q = s.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.format("graft-lake")
      .option("mergeKeys", "event_id")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_stream_sink_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start(t.location)
    q.awaitTermination()
    t.read()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .orderBy(col("user_id"))
  }

  /** Checkpointed RESTART — the operational property every streaming
    * deployment depends on: a job stops, the source table keeps
    * growing, and a SECOND job started on the SAME checkpoint resumes
    * exactly after the last committed batch, replaying nothing and
    * missing nothing. The sink runs in APPEND mode deliberately —
    * append EXPOSES any reprocessing as duplicate rows, where a merge
    * sink would absorb it — and both runs share one lake-to-lake
    * pipeline (graft-lake source → graft-lake sink). Two in-query
    * proofs: run 2's progress metrics admit ONLY the rows of the
    * commits that landed between the runs, and the sink's row count
    * equals the source's exactly (no duplicate, no loss). At 100 TB
    * this is a restart planning O(new commits) from the checkpointed
    * snapshot offset — no listing, no backfill rescan. */
  private val lakeResumeQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables.events(s, d)
    val src = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_resume_src").toString,
      events.filter(col("event_id") % 4 === 0))
    src.append(events.filter(col("event_id") % 4 === 1))
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_resume_sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_resume_ck").toString
    def drain(): Long = {
      val q = s.readStream.format("graft-lake")
        .option("maxCommitsPerTrigger", 1).load(src.location)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(sinkDir)
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    drain() // run 1: commits 1-2
    src.append(events.filter(col("event_id") % 4 === 2))
    src.append(events.filter(col("event_id") % 4 === 3))
    val run2Rows = drain() // run 2: SAME checkpoint, new commits only
    // both cohort counts in one pass over events (round 20, §1.4)
    val evRow = events.agg(count(lit(1)).as("n"),
      count(when(col("event_id") % 4 >= 2, 1)).as("newN")).head
    val newRows = evRow.getLong(1)
    require(run2Rows == newRows,
      s"restart must admit only the new commits' rows: " +
        s"got $run2Rows, new $newRows")
    val sunk = graft.lakehouse.GraftTable.load(s, sinkDir).read()
    require(sunk.count() == evRow.getLong(0),
      "append sink must hold the source exactly once (no dup, no loss)")
    sunk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Streaming schema tracking BEYOND add-column (r16 verdict item
    * 6 — Delta's schema-tracking precedent): a checkpointed stream
    * drains THROUGH a RENAME COLUMN, an int→bigint type promotion,
    * and an ADD COLUMN, because per-batch alignment routes through
    * the engine's own evolution records ([[graft.lakehouse.GraftTable
    * .alignEvolved]]): the rename log replays forward (column
    * identity is the log's, not the name's), safe promotions up-cast
    * value-preservingly, adds backfill null/DEFAULT. The scenario:
    * two pre-evolution commits → rename + promotion + add (three
    * file-neutral evolution commits) → a post-evolution append → ONE
    * stream drain (its first two batches predate every evolution and
    * deliver at the declared post-evolution schema) → another append
    * → a RESTART from the same checkpoint that admits exactly the new
    * commit. Non-mappable shapes (DROP, mid-stream evolution) still
    * refuse — spec-pinned in LakehouseSpec. */
  private val schemaTrackQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val orders = Tables.orders(s, d)
    val base = orders.select(
      col("o_orderkey").as("id"),
      (col("o_orderkey") % 100).cast("int").as("qty"),
      col("o_orderstatus").as("status"))
    def quarter(m: Long) = base.filter(col("id") % 4 === m)
    // every base cohort count in ONE pass (round 20, guide §1.4) —
    // the probes below used to re-scan `base` once per count
    val qN = base.agg(
      count(when(col("id") % 4 === 0, 1)).as("q0"),
      count(when(col("id") % 4 === 1, 1)).as("q1"),
      count(when(col("id") % 4 === 2, 1)).as("q2"),
      count(when(col("id") % 4 === 3, 1)).as("q3")).head
    val (q0N, q1N, q2N, q3N) =
      (qN.getLong(0), qN.getLong(1), qN.getLong(2), qN.getLong(3))
    val src = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_strack_src").toString,
      quarter(0))                                          // snap 1
    src.append(quarter(1))                                 // snap 2
    graft.lakehouse.LakeRegistry.register("strack_src", src)
    s.sql("ALTER TABLE strack_src RENAME COLUMN qty TO quantity") // 3
    s.sql("ALTER TABLE strack_src ALTER COLUMN quantity TYPE BIGINT") // 4
    s.sql("ALTER TABLE strack_src ADD COLUMNS (note STRING)") // snap 5
    src.append(quarter(2)
      .withColumnRenamed("qty", "quantity")
      .withColumn("quantity", col("quantity").cast("bigint"))
      .withColumn("note", lit("tracked")))                 // snap 6
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_strack_sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_strack_ck").toString
    def drain(): Long = {
      val q = s.readStream.format("graft-lake")
        .option("maxCommitsPerTrigger", 1).load(src.location)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(sinkDir)
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    // run 1 starts AFTER the evolutions: its first two batches
    // predate the rename/promotion/add and must deliver at the
    // declared (post-evolution) schema
    val run1 = drain()
    val preCount = q0N + q1N + q2N
    require(run1 == preCount,
      s"the drain must deliver every pre- and post-evolution row: " +
        s"got $run1, want $preCount")
    val sunk1 = graft.lakehouse.GraftTable.load(s, sinkDir).read()
    require(sunk1.schema.fieldNames.toSeq ==
        Seq("id", "quantity", "status", "note") &&
      sunk1.schema("quantity").dataType ==
        org.apache.spark.sql.types.LongType,
      s"batches must align to the evolved schema: ${sunk1.schema}")
    require(sunk1.filter(col("note").isNull).count() == q0N + q1N,
      "pre-add rows carry the null backfill")
    // restart from the same checkpoint admits exactly the new commit
    src.append(quarter(3)
      .withColumnRenamed("qty", "quantity")
      .withColumn("quantity", col("quantity").cast("bigint"))
      .withColumn("note", lit("tracked")))                 // snap 7
    val run2 = drain()
    require(run2 == q3N,
      s"the restart must admit only the new commit's rows: $run2")
    require(graft.lakehouse.GraftTable.load(s, sinkDir).read()
        .filter(col("note") === "tracked").count() == q2N + q3N,
      "post-add rows carry their written note")
    // round 18: DROP COLUMN joins the tracked set — a pre-drop
    // straggler commit is staged but NOT drained, the column drops,
    // a post-drop commit lands, and ONE restart drains both: the
    // straggler delivers with the dropped column PROJECTED AWAY
    // (the retire log's tombstone rename — exactly what a to-reader
    // does for old files), never a wedge, never a silent null-fill.
    // The sink follows the evolution like any consumer. Negated ids
    // keep the new batches disjoint from the original quarters.
    // -(id+1): strictly negative (the synthetic orders include key 0)
    val late = quarter(0).select((-(col("id") + 1)).as("id"),
      col("qty").cast("bigint").as("quantity"), col("status"))
      .withColumn("note", lit("late"))
    src.append(late)                                       // snap 8
    s.sql("ALTER TABLE strack_src DROP COLUMN note")       // snap 9
    val post = quarter(1).select((-(col("id") + 1)).as("id"),
      col("qty").cast("bigint").as("quantity"), col("status"))
    src.append(post)                                       // snap 10
    graft.lakehouse.GraftTable.load(s, sinkDir).dropColumn("note")
    val run3 = drain()
    // late ≡ quarter(0) re-keyed, post ≡ quarter(1) re-keyed, so the
    // folded cohort counts stand in for two more scans
    require(run3 == q0N + q1N,
      s"the restart must drain the pre-drop straggler AND the " +
        s"post-drop commit: $run3")
    val sunk3 = graft.lakehouse.GraftTable.load(s, sinkDir).read()
    require(sunk3.schema.fieldNames.toSeq ==
        Seq("id", "quantity", "status"),
      s"the sink tracks the drop: ${sunk3.schema}")
    require(graft.Registry.sameMultiset(sunk3.filter(col("id") < 0),
        late.drop("note").unionByName(post)),
      "both straggler batches must land row-exactly, once each")
    sunk3
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("quantity")).as("sum_qty"))
      .orderBy("status")
  }

  /** Streaming read FROM the lakehouse (Iceberg's append-only
    * streaming read, the reverse of [[lakeSinkQ]]), through
    * [[GraftLakeSource]]: offsets are snapshot ids and each
    * micro-batch's file set comes from the COMMIT MANIFESTS — one
    * head-pointer read plus the endpoint manifests per batch,
    * O(new files), with no directory listing and no seen-files diff
    * (Spark's FileStreamSource re-lists the full glob every batch —
    * the 100 TB bottleneck this source exists to avoid; see the
    * GraftLakeSource scaladoc). `maxCommitsPerTrigger=1` makes the
    * drain replay the table's three commits as three micro-batches,
    * in commit order. Restriction, same as Iceberg's: valid over
    * APPEND commits only — a rewrite (compaction/DML) fails the
    * stream rather than re-surfacing rewritten rows; [[GraftTable]]
    * time-travel covers those instead. The aggregate runs in
    * complete mode into a memory sink, drained by AvailableNow. */
  private val lakeSourceQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables.events(s, d)
    val t = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_stream_src").toString,
      events.filter(col("event_id") % 4 === 0))
    t.append(events.filter(col("event_id") % 4 === 1))
    t.append(events.filter(col("event_id") % 4 === 2))
    val stream = s.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", 1)
      .load(t.location)
    val qn = "lake_source_agg_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val q = stream
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(qn).orderBy(col("event_type"))
  }

  /** START-OFFSET streaming (Delta's `startingVersion` / Iceberg's
    * stream-from-timestamp): a NEW stream on a long-lived table must
    * not be forced to replay its whole history — at 100 TB the
    * initial load IS the expensive part, and a CDC consumer that
    * wants changes FROM NOW passes the current head. The stream
    * delivers commits strictly AFTER `startingSnapshotId` (or after
    * the snapshot a `startingTimestamp` resolves to through the same
    * header walk as TIMESTAMP AS OF); checkpointed restarts ignore
    * it — offsets win. In-query requires pin: the plain stream from
    * the marked snapshot delivers ONLY the post-mark commit; the CDC
    * feed from the same mark opens with the post-mark inserts, not
    * an initial-load batch; an unknown id refuses at stream
    * CONSTRUCTION, before any offset is logged. */
  private val streamFromSnapshotQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables.events(s, d).select(col("event_id"),
      col("event_type"), col("value").cast("double").as("v"))
    def third(m: Long) = events.filter(col("event_id") % 3 === m)
    val t = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_startoff").toString,
      third(0))                                              // snap 1
    t.append(third(1))                                       // snap 2
    val mark = t.currentSnapshotId
    Thread.sleep(3) // the timestamp leg needs distinguishable commits
    t.append(third(2))                                       // snap 3
    def drainTo(opts: Map[String, String]): org.apache.spark.sql.DataFrame = {
      val qn = "startoff_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val reader = opts.foldLeft(s.readStream.format("graft-lake")
        .option("maxCommitsPerTrigger", 1)) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(t.location)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn)
    }
    // plain mode from the mark: ONLY the post-mark commit's rows.
    // Each mode's probes fold into ONE action (round 20, guide §1.4):
    // counts and the excess check ride cross-joined single-row
    // aggregates instead of one job per count
    val plain = drainTo(Map("startingSnapshotId" -> mark.toString))
    val third2N = third(2).count()
    val pRow = plain.agg(count(lit(1)).as("n"))
      .crossJoin(plain.select("event_id")
        .exceptAll(third(2).select("event_id"))
        .agg(count(lit(1)).as("excess")))
      .head
    require(pRow.getLong(0) == third2N && pRow.getLong(1) == 0,
      "the stream must deliver exactly the commits after the mark")
    // CDC mode from the mark: the feed opens with the post-mark
    // inserts — no initial-load batch of the pre-mark table
    val cdc = drainTo(Map("startingSnapshotId" -> mark.toString,
      "readChangeFeed" -> "true"))
    val cRow = cdc.agg(count(lit(1)).as("n"),
      count(when(col("_change_type") =!= "insert", 1)).as("nonIns"))
      .head
    require(cRow.getLong(0) == third2N && cRow.getLong(1) == 0,
      "the CDC feed must open after the mark, not with an initial load")
    // the TIMESTAMP form (round 19, at-or-after-inclusive like
    // Delta): an instant equal to snap 3's commit streams exactly
    // snap 3; a pre-history instant means full replay
    val ts3 = t.ancestorsOf().find(_._1 == t.currentSnapshotId).get._2
    val zone = java.time.ZoneId.of(
      s.sessionState.conf.sessionLocalTimeZone)
    val ts3Str = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .format(java.time.Instant.ofEpochMilli(ts3).atZone(zone))
    require(drainTo(Map("startingTimestamp" -> ts3Str)).count() ==
        third(2).count(),
      "startingTimestamp must stream commits at-or-after the instant")
    require(drainTo(Map("startingTimestamp" -> "1990-01-01 00:00:00"))
        .count() == events.count(),
      "a pre-history startingTimestamp must replay everything")
    // an unknown starting id refuses at construction
    require(
      try { drainTo(Map("startingSnapshotId" -> "999999")); false }
      catch {
        case e: Exception =>
          Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
            .exists(x => String.valueOf(x.getMessage)
              .contains("not a live snapshot"))
      },
      "an unknown startingSnapshotId must refuse loudly")
    plain.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v").cast("decimal(18,6)")).cast("double").as("total_v"))
      .orderBy("event_type")
  }

  /** Lake-to-lake streaming pipeline — source AND sink halves of the
    * `graft-lake` format in one continuous dataflow (the production
    * medallion shape: bronze table → transform → silver table).
    * The source replays the bronze table's commits from its manifest
    * log; the transform filters to purchases and derives a spend
    * column; the sink MERGEs into silver with an atomic txn
    * watermark. End state = the transform of bronze's content,
    * independent of batch boundaries — exactly what the oracle
    * replays over the raw events. */
  private val lakePipelineQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables.events(s, d)
    val bronze = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_pipe_bronze").toString,
      events.filter(col("event_id") % 3 === 0))
    bronze.append(events.filter(col("event_id") % 3 === 1))
    bronze.append(events.filter(col("event_id") % 3 === 2))
    val silver = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_pipe_silver").toString,
      // seed with stale spend the merged stream must overwrite
      events.filter(col("event_type") === "purchase" &&
          col("event_id") % 5 === 0)
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(-1.0).as("spend")))
    val q = s.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", 1).load(bronze.location)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("value") * 2).as("spend"))
      .writeStream.format("graft-lake")
      .option("mergeKeys", "event_id")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_pipe_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start(silver.location)
    q.awaitTermination()
    silver.read()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("spend").cast("decimal(18,6)")).cast("double")
          .as("total_spend"))
      .orderBy(col("user_id"))
  }

  /** Streaming CHANGE FEED (`readChangeFeed=true` — Delta CDF over
    * this table format): each micro-batch is the net row-level
    * changelog between its offset snapshots, tagged `_change_type`,
    * so downstream consumers see row-level DML — including
    * merge-on-read position-tombstone DELETE/UPDATE, which is what a
    * busy table actually emits — not just appends. The history
    * replayed commit-by-commit (`maxCommitsPerTrigger=1`): initial
    * load as inserts, an append, a MoR delete, a MoR update
    * (delete of the old image + insert of the new), and finally a
    * tombstone-maintenance commit the feed must deliver as EMPTY
    * without reading a byte ([[GraftTable.rewriteOnlyRange]] — a
    * nightly compaction must not cost a CDC consumer a full-table
    * diff). Oracle replays the four data batches in SQL. */
  private val lakeCdcQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = graft.lakehouse.GraftTable.create(s,
      java.nio.file.Files.createTempDirectory("graft_stream_cdc").toString,
      orders.filter(col("o_orderkey") % 4 < 3))                    // 1
    t.append(orders.filter(col("o_orderkey") % 4 === 3))           // 2
    t.deleteMoRPos("o_orderkey % 10 = 0")                          // 3
    t.updateMoRPos(Map("o_totalprice" -> "0.0"),
      "o_orderstatus = 'F' AND o_orderkey % 7 = 0")                // 4
    t.rewritePositionDeletes()                                     // 5
    // a null-backfilled ADD COLUMN mid-history: the feed must drain
    // THROUGH it — the evolution batch nets empty, every pre-add
    // range up-projects to the declared post-evolution schema (NULL
    // for the new column, exactly what a reader at head sees for
    // pre-add files) instead of wedging with "restart"
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("o_note",
      org.apache.spark.sql.types.StringType)))                     // 6
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_note", lit("late")))                          // 7
    val qn = "lake_cdc_feed_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val q = s.readStream.format("graft-lake")
      .option("readChangeFeed", "true")
      .option("maxCommitsPerTrigger", 1)
      .load(t.location)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feed = s.table(qn)
    // both presence probes in one pass (round 20, guide §1.4)
    val fRow = feed.agg(
      count(when(col("o_note") === "late", 1)).as("lateN"),
      count(when(col("o_note").isNull, 1)).as("nullN")).head
    require(fRow.getLong(0) > 0 && fRow.getLong(1) > 0,
      "the feed must deliver both pre-add (NULL-filled) and post-add " +
        "batches across the ADD COLUMN commit")
    feed.orderBy(col("_change_type"), col("o_orderkey"),
      col("o_totalprice"), col("o_note"))
  }

  /** Streaming ROW-ID-KEYED change feed (`readChangeFeed=lineage` —
    * the streaming form of the v3 lineage changelog): each
    * micro-batch is the endpoint diff keyed on `_row_id`, so an
    * UPDATE arrives as ONE row (the plain feed ships delete+insert
    * pairs the consumer must re-match), deletes carry old images,
    * and a mid-stream COMPACTION batch is delivered EMPTY from
    * cached headers (rewrite-only range — no byte read, and the
    * ride-alongs would net out by sequence anyway). Replayed per
    * commit (maxCommitsPerTrigger=1) over append+append+UPDATE+
    * DELETE+compact on a lineage table. */
  private val lakeLineageQ: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
    val t = graft.lakehouse.GraftTable.createEmpty(s,
      java.nio.file.Files.createTempDirectory("graft_stream_lin")
        .toString, orders.schema)                                // 1
    t.setProperties(Map(
      graft.lakehouse.GraftTable.RowLineageProp -> "true"))
    t.append(orders.filter(col("o_orderkey") % 3 === 0))         // 2
    t.append(orders.filter(col("o_orderkey") % 3 === 1))         // 3
    t.update(Map("price" -> "price * 2"), "o_orderstatus = 'F'") // 4
    t.delete("o_orderkey % 30 = 0")                              // 5
    t.compact(2)                                                 // 6
    val qn = "lake_lin_feed_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val q = s.readStream.format("graft-lake")
      .option("readChangeFeed", "lineage")
      .option("maxCommitsPerTrigger", 1)
      .load(t.location)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feed = s.table(qn)
    require(feed.filter(col("_row_id").isNull).count() == 0,
      "every feed row carries its row id")
    feed.select(col("o_orderkey"), col("price"), col("_change_type"))
      .orderBy(col("o_orderkey"), col("_change_type"), col("price"))
  }

  val queries: Map[String, Q] = Map(
    "stream_lake_sink" -> lakeSinkQ,
    "stream_lake_source" -> lakeSourceQ,
    "stream_from_snapshot" -> streamFromSnapshotQ,
    "stream_lake_resume" -> lakeResumeQ,
    "stream_schema_track" -> schemaTrackQ,
    "stream_lake_cdc" -> lakeCdcQ,
    "stream_lake_lineage" -> lakeLineageQ,
    "stream_lake_pipeline" -> lakePipelineQ,
    "stream_window_agg" -> windowAggQ,
    "stream_late_data" -> lateDataQ,
    "stream_sessionize" -> sessionizeQ,
    "stream_dedup_state" -> dedupQ,
    "stream_join" -> joinQ,
    "stream_outer_join" -> outerJoinQ,
    "stream_window_topk" -> topkQ)

  val oracles: Map[String, String] = Map(
    // End state after idempotent merge = exactly the event set.
    "stream_lake_sink" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // silver = purchases with doubled-value spend, per user
    "stream_lake_pipeline" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        | CAST(SUM(CAST(value * 2 AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_spend
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the per-commit change feed: initial cohort + append as inserts,
    // the MoR delete's victims as deletes, the MoR update as old-image
    // delete + new-image insert; the maintenance commit contributes
    // nothing
    // the per-commit LINEAGE feed: inserts for both appends, ONE
    // update row per matched F row (the pairing dividend), deletes
    // with the post-update old image; the compaction batch is empty
    "stream_lake_lineage" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DOUBLE) AS p FROM orders
        |  WHERE o_orderkey % 3 IN (0, 1)),
        |ev AS (
        |  SELECT o_orderkey, p AS price,
        |    'insert' AS _change_type FROM base
        |  UNION ALL
        |  SELECT o_orderkey, p * 2, 'update' FROM base
        |  WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN p * 2 ELSE p END,
        |    'delete'
        |  FROM base WHERE o_orderkey % 30 = 0)
        |SELECT o_orderkey, price, _change_type FROM ev
        |ORDER BY o_orderkey, _change_type, price""".stripMargin,
    "stream_lake_cdc" ->
      """WITH b1 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 4 < 3),
        |b2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 4 = 3),
        |d3 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 0),
        |u4 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 <> 0 AND o_orderstatus = 'F'
        |    AND o_orderkey % 7 = 0
        |    -- a row already at the update's target value nets OUT of
        |    -- the changelog (identical delete+insert cancel)
        |    AND o_totalprice <> 0.0)
        |SELECT *, CAST(NULL AS VARCHAR) AS o_note,
        |  'insert' AS _change_type FROM b1
        |UNION ALL SELECT *, CAST(NULL AS VARCHAR), 'insert' FROM b2
        |UNION ALL SELECT *, CAST(NULL AS VARCHAR), 'delete' FROM d3
        |UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(NULL AS VARCHAR), 'delete' FROM u4
        |UNION ALL SELECT o_orderkey, o_orderstatus, 0.0 AS o_totalprice,
        |  CAST(NULL AS VARCHAR), 'insert' FROM u4
        |-- the post-ADD-COLUMN append delivers with the new column set
        |UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  'late', 'insert' FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY _change_type, o_orderkey, o_totalprice, o_note""".stripMargin,
    // both runs together drain the whole event log, exactly once
    "stream_lake_resume" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the whole table drained through the rename/promotion/add:
    // quantity is o_orderkey % 100 under its post-evolution name and
    // BIGINT type; note is non-null only for the post-add quarters
    // all four quarters, plus the straggler (quarter 0, negated ids)
    // and the post-drop batch (quarter 1, negated ids) — quantity is
    // derived from the ORIGINAL key, status rides along
    "stream_schema_track" ->
      """WITH r AS (
        |  SELECT o_orderstatus AS status, o_orderkey % 100 AS q
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_orderkey % 100 FROM orders
        |  WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderstatus, o_orderkey % 100 FROM orders
        |  WHERE o_orderkey % 4 = 1)
        |SELECT status, COUNT(*) AS n_rows,
        | CAST(SUM(q) AS BIGINT) AS sum_qty
        |FROM r GROUP BY status
        |ORDER BY status""".stripMargin,
    // only the third appended after the marked snapshot streams
    "stream_from_snapshot" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_v
        |FROM events WHERE event_id % 3 = 2
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the three appended quarters of the event log, aggregated
    "stream_lake_source" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events WHERE event_id % 4 IN (0, 1, 2)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_late_data" ->
      """WITH on_time AS (SELECT * FROM events WHERE event_id % 7 <> 0),
        | late AS (SELECT * FROM events WHERE event_id % 7 = 0),
        | tmax AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events),
        | wm1 AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR
        |           AS w FROM on_time, tmax
        |          WHERE CAST(ts AS TIMESTAMP) <= tmax.m - INTERVAL 2 DAYS),
        | fwm AS (SELECT m - INTERVAL 1 HOUR AS w FROM tmax),
        | admitted AS (SELECT late.* FROM late, wm1
        |  WHERE time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
        |          + INTERVAL 10 MINUTES > wm1.w),
        | u AS (SELECT * FROM on_time UNION ALL SELECT * FROM admitted)
        |SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
        |    AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM u, fwm
        |WHERE time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
        |        + INTERVAL 10 MINUTES <= fwm.w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
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
        |FROM events ORDER BY user_id, event_type, w_start""".stripMargin,
    "stream_window_topk" ->
      """WITH a AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |  user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS spend
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT w_start, user_id, spend,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY w_start
        |    ORDER BY spend DESC, user_id ASC) AS INT) AS rk FROM a)
        |SELECT w_start, user_id, CAST(spend AS DOUBLE) AS spend, rk
        |FROM r WHERE rk <= 3
        |ORDER BY w_start, rk""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        | p.user_id AS user_id,
        | CAST(p.ts AS TIMESTAMP) AS p_ts, CAST(c.ts AS TIMESTAMP) AS c_ts
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        | AND CAST(c.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
        |ORDER BY p_id, c_id""".stripMargin,
    // matched pairs + unmatched purchases the final watermark
    // (min of both inputs' max ts, minus the delay) has released
    "stream_outer_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id,
        |             CAST(ts AS TIMESTAMP) AS p_ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_uid,
        |        CAST(ts AS TIMESTAMP) AS c_ts FROM events
        |      WHERE event_type = 'click'),
        |m AS (SELECT p.p_id, c.c_id, p.user_id, p.p_ts, c.c_ts
        |      FROM p JOIN c ON p.user_id = c.c_uid
        |       AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
        |       AND c.c_ts < p.p_ts),
        |wm AS (SELECT CASE WHEN (SELECT max(p_ts) FROM p) IS NULL
        |                     OR (SELECT max(c_ts) FROM c) IS NULL
        |         THEN NULL
        |         ELSE least((SELECT max(p_ts) FROM p),
        |                    (SELECT max(c_ts) FROM c))
        |              - INTERVAL 2 HOUR END AS w),
        |u AS (SELECT p.p_id, CAST(NULL AS BIGINT) AS c_id, p.user_id,
        |        p.p_ts, CAST(NULL AS TIMESTAMP) AS c_ts
        |      FROM p, wm WHERE p.p_ts < wm.w
        |        AND NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id))
        |SELECT * FROM m UNION ALL SELECT * FROM u
        |ORDER BY p_id, c_id""".stripMargin)
}
