package graft.lakehouse

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables

/** The reference's Iceberg DML surface
  * (`producer_iceberg_datalake_setup.sh:203-236` runs MERGE / UPDATE /
  * DELETE / time-travel demos against the governed tables) re-expressed
  * over [[GraftTable]]. Each query materializes a throwaway table under
  * `java.io.tmpdir` from the driver's parquet, applies the DML, and
  * returns the resulting table state with a total ORDER BY — so every
  * one of these is oracled end-state-equal against DuckDB, not just
  * rows-only.
  */
object LakeQueries {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  /** MERGE (upsert): base = even custkeys; source = custkeys % 3 == 0
    * with bumped balance and a MERGED segment. Matched rows replaced,
    * unmatched source rows inserted. Issued as SQL — the reference's
    * workflow is SQL-first (producer_iceberg_datalake_setup.sh:203-236)
    * — routed to the table by [[LakeSqlRule]]. */
  private val merge: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val base = customer.filter(col("c_custkey") % 2 === 0)
    val source = customer
      .filter(col("c_custkey") % 3 === 0)
      .select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        (col("c_acctbal") + 1000.0).as("c_acctbal"),
        lit("MERGED").as("c_mktsegment"))
    val t = GraftTable.create(s, tmp("lake_merge"), base)
    LakeRegistry.register("lake_merge_t", t)
    source.createOrReplaceTempView("lake_merge_src")
    s.sql(
      """MERGE INTO lake_merge_t t USING lake_merge_src s
        |ON t.c_custkey = s.c_custkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    t.read().orderBy("c_custkey")
  }

  /** Conditional MERGE clauses (Iceberg semantics): first-match-wins
    * across `WHEN MATCHED AND … DELETE`, a partial `UPDATE SET`, and
    * a conditional `INSERT` from a partial source (key + one column). */
  private val mergeClauses: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_mc"),
      customer.filter(col("c_custkey") % 2 === 0))
    LakeRegistry.register("lake_mc_t", t)
    customer.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
      .createOrReplaceTempView("lake_mc_src")
    s.sql(
      """MERGE INTO lake_mc_t t USING lake_mc_src s
        |ON t.c_custkey = s.c_custkey
        |WHEN MATCHED AND t.c_acctbal < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET
        |  c_acctbal = t.c_acctbal + s.c_acctbal,
        |  c_mktsegment = 'BUMPED'
        |WHEN NOT MATCHED AND s.c_acctbal > 0 THEN
        |  INSERT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        |  VALUES (s.c_custkey, 'anon', -1, s.c_acctbal, 'NEW')""".stripMargin)
    t.read().orderBy("c_custkey")
  }

  private val delete: Q = (s, dir) => {
    val t = GraftTable.create(s, tmp("lake_delete"), Tables.orders(s, dir))
    LakeRegistry.register("lake_delete_t", t)
    s.sql("DELETE FROM lake_delete_t WHERE o_orderstatus = 'F'")
    t.read().orderBy("o_orderkey")
  }

  private val update: Q = (s, dir) => {
    val t = GraftTable.create(s, tmp("lake_update"), Tables.orders(s, dir))
    LakeRegistry.register("lake_update_t", t)
    s.sql(
      """UPDATE lake_update_t SET o_totalprice = o_totalprice * 2.0
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
    t.read().orderBy("o_orderkey")
  }

  /** Create with odd orderkeys (snapshot 1), append evens (snapshot 2),
    * then time-travel back: the result is exactly the odd set. */
  private val timeTravel: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_tt"),
      orders.filter(col("o_orderkey") % 2 === 1))
    t.append(orders.filter(col("o_orderkey") % 2 === 0))
    t.readAt(1).orderBy("o_orderkey")
  }

  /** Wall-clock time travel (Iceberg's TIMESTAMP AS OF): read the
    * table as of an instant strictly before the second commit — the
    * content is exactly snapshot 1, deterministic even though the
    * clock is not. Commit timestamps are informational manifest
    * metadata; ids stay the correctness anchor. */
  private val timeTravelTs: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_tts"),
      orders.filter(col("o_orderkey") % 2 === 1))
    Thread.sleep(5) // clocks are ms-resolution; keep the commits apart
    t.append(orders.filter(col("o_orderkey") % 2 === 0))
    val cutoff = t.snapshot(2).ts - 1
    require(t.snapshot(1).ts <= cutoff,
      "commit timestamps must order with the commits")
    t.readAsOfTimestamp(cutoff).orderBy("o_orderkey")
  }

  /** Add a `tier` column mid-stream: rows written before the column
    * existed read back NULL for it. */
  private val schemaEvolution: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_evo"),
      customer.filter(col("c_custkey") % 2 === 0))
    t.appendEvolved(
      customer.filter(col("c_custkey") % 2 === 1)
        .withColumn("tier", concat(lit("T"), (col("c_custkey") % 3).cast("string"))))
    t.read().orderBy("c_custkey")
  }

  /** Three appends (orderkey mod 3 = 0, 1, 2); the incremental read
    * from snapshot 2 to 3 yields exactly the third batch. */
  private val incremental: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_inc"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    t.incrementalRead(2, 3).orderBy("o_orderkey")
  }

  /** CDC: append + DELETE + UPDATE against a 3-column orders table,
    * then the net changelog from the initial snapshot to head
    * ([[GraftTable.changes]]): appended-then-surviving rows and
    * updated rows' new images surface as inserts, deleted rows and
    * updated rows' old images as deletes; rows that only rode along
    * copy-on-write rewrites cancel. The oracle replays the same DML
    * in SQL and nets with EXCEPT ALL. */
  private val cdc: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cdc"),
      orders.filter(col("o_orderkey") % 4 < 3))
    t.append(orders.filter(col("o_orderkey") % 4 === 3))
    t.delete("o_orderkey % 10 = 0")
    t.update(Map("o_totalprice" -> "0.0"),
      "o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    t.changes(1, t.currentSnapshotId)
      .orderBy(col("_change_type"), col("o_orderkey"))
  }

  /** Equality-delete CHANGE FEED (r16 verdict item 4): a table under
    * `write.delete.mode=merge-on-read` + `write.delete.style=equality`
    * turns on CDC and does NOT wedge at the equality DELETE commit —
    * the predicate EXPANDS at the endpoints: rows live at `from` that
    * an in-range predicate scopes (add-sequence) and matches emit as
    * keyed delete images, exactly like the tombstone diff; files
    * appended AFTER the predicate are out of its scope and insert in
    * full (their matching rows included). Candidates are stats-pruned
    * per predicate, so the expansion scans the files the predicate
    * could touch — the same economics as the equality-delete read
    * path. require()d in-query: the DELETE commits a predicate (no
    * file rewritten, no tombstone), the per-commit range is
    * all-deletes, and scoping holds. The streaming drain through the
    * same commit is spec-pinned in LakehouseSpec. */
  private val cdcEqDel: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def third(m: Long) = orders.filter(col("o_orderkey") % 3 === m)
    val t = GraftTable.create(s, tmp("lake_cdc_eq"), third(0)) // snap 1
    t.setProperties(Map(
      "write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "equality"))
    LakeRegistry.register("lake_cdc_eq_t", t)
    t.append(third(1))                                        // snap 2
    val filesBefore = t.currentSnapshot.files.toSet
    s.sql("DELETE FROM lake_cdc_eq_t WHERE o_orderstatus = 'F'") // 3
    val snap3 = t.currentSnapshot
    require(snap3.dels.nonEmpty && snap3.posDels.isEmpty &&
        snap3.files.toSet == filesBefore,
      "the DELETE must commit an equality predicate: no rewrite, " +
        "no tombstone")
    t.append(third(2))                                        // snap 4
    // per-commit replay through the eq-delete commit (the exact range
    // a maxCommitsPerTrigger=1 stream drains): all deletes, exactly
    // the scoped F rows
    val delBatch = s.sql("SELECT * FROM table_changes('lake_cdc_eq_t', 2, 3)")
    require(delBatch.filter(col("_change_type") =!= "delete").count() == 0 &&
        delBatch.count() ==
          orders.filter(col("o_orderkey") % 3 < 2 &&
            col("o_orderstatus") === "F").count(),
      "the eq-delete commit's range must emit exactly the scoped " +
        "F rows as deletes")
    // scoping: the post-predicate append inserts IN FULL — its F rows
    // are outside the predicate's add-sequence scope
    val insBatch = s.sql("SELECT * FROM table_changes('lake_cdc_eq_t', 3, 4)")
    require(insBatch.filter(col("_change_type") =!= "insert").count() == 0 &&
        insBatch.filter(col("o_orderstatus") === "F").count() ==
          third(2).filter(col("o_orderstatus") === "F").count(),
      "files appended after the predicate are out of its scope")
    s.sql(s"""SELECT * FROM table_changes('lake_cdc_eq_t', 1,
             |  ${t.currentSnapshotId})
             |ORDER BY _change_type, o_orderkey""".stripMargin)
  }

  /** The same CDC scenario driven ENTIRELY through SQL: DML via
    * [[LakeSqlRule]], changelog via the `table_changes` TVF
    * ([[LakeChanges]]) composed under an ordinary ORDER BY — proving
    * the net-changelog surface is reachable without touching the
    * Scala API (Iceberg users get `create_changelog_view`; this is
    * the TVF equivalent). Same oracle as lake_cdc. */
  private val cdcSql: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cdc_sql"),
      orders.filter(col("o_orderkey") % 4 < 3))
    LakeRegistry.register("lake_cdc_sql_t", t)
    orders.filter(col("o_orderkey") % 4 === 3)
      .createOrReplaceTempView("lake_cdc_sql_src")
    s.sql("INSERT INTO lake_cdc_sql_t SELECT * FROM lake_cdc_sql_src")
    s.sql("DELETE FROM lake_cdc_sql_t WHERE o_orderkey % 10 = 0")
    s.sql("UPDATE lake_cdc_sql_t SET o_totalprice = 0.0 " +
      "WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    s.sql(s"""SELECT * FROM table_changes('lake_cdc_sql_t', 1,
             |  ${t.currentSnapshotId})
             |ORDER BY _change_type, o_orderkey""".stripMargin)
  }

  /** The cdcSql scenario again but with MERGE-ON-READ DML (position
    * tombstones): the changelog must compose with tombstones — they
    * are what MoR UPDATE/MERGE emit, so a CDC feed that refused them
    * would go dark exactly when the table is busiest. The changelog
    * is computed from the tombstone-file diff (immutable, carried by
    * reference, so shared files cancel without a read) + the appended
    * files; carried files are read ONLY at their tombstoned
    * positions. require()d in-query: no data file was rewritten by
    * the DML, yet the TVF still reports every row-level change. Same
    * oracle as lake_cdc. */
  private val cdcMor: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cdc_mor"),
      orders.filter(col("o_orderkey") % 4 < 3))
    t.setProperties(Map(
      "write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position",
      "write.update.mode" -> "merge-on-read"))
    LakeRegistry.register("lake_cdc_mor_t", t)
    orders.filter(col("o_orderkey") % 4 === 3)
      .createOrReplaceTempView("lake_cdc_mor_src")
    s.sql("INSERT INTO lake_cdc_mor_t SELECT * FROM lake_cdc_mor_src")
    val files2 = t.currentSnapshot.files.toSet
    s.sql("DELETE FROM lake_cdc_mor_t WHERE o_orderkey % 10 = 0")
    s.sql("UPDATE lake_cdc_mor_t SET o_totalprice = 0.0 " +
      "WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    require(files2.subsetOf(t.currentSnapshot.files.toSet),
      "MoR DML must not rewrite any data file")
    require(t.currentSnapshot.posDels.nonEmpty,
      "MoR DML must leave pending position tombstones at the endpoint")
    s.sql(s"""SELECT * FROM table_changes('lake_cdc_mor_t', 1,
             |  ${t.currentSnapshotId})
             |ORDER BY _change_type, o_orderkey""".stripMargin)
  }

  /** Iceberg's `delete_files` metadata table through the TVF surface
    * (`lake_delete_files('t')`): one row per pending merge-on-read
    * artifact — the operator's "how much un-materialized DML is this
    * table carrying" view — answered from the MANIFEST alone. Counts
    * and sizes were recorded at commit (tombstone footer harvest;
    * bitmap cardinality computed inside the vector write's own
    * aggregate), so at 100 TB the answer costs zero tombstone/blob/
    * data reads. The scenario stacks all three delete shapes on one
    * table (style flips between statements) and require()s each
    * kind's shape: vector rows carry data file + blob + cardinality
    * + size, position rows carry path + footer count + size,
    * equality rows carry only their predicate (a predicate's row
    * reach is honestly NULL — unknowable without a scan). Per-kind
    * deleted-row totals oracled. */
  private val deleteFiles: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_delfiles"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "vector"))
    LakeRegistry.register("lake_delfiles_t", t)
    s.sql("DELETE FROM lake_delfiles_t WHERE o_orderstatus = 'F'")
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    s.sql("DELETE FROM lake_delfiles_t WHERE o_totalprice < 10000.0")
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "equality"))
    s.sql("DELETE FROM lake_delfiles_t WHERE o_orderkey % 1000 = 0")
    val meta = s.sql("SELECT * FROM lake_delete_files('lake_delfiles_t')")
    require(meta.filter(col("kind") === "vector").filter(
        col("detail").isNull || col("path").isNull ||
        col("deleted_rows").isNull || col("size_bytes").isNull)
      .count() == 0,
      "vector rows must carry data file, blob, cardinality, and size")
    require(meta.filter(col("kind") === "position").filter(
        col("path").isNull || col("deleted_rows").isNull ||
        col("size_bytes").isNull || col("detail").isNotNull)
      .count() == 0,
      "position rows must carry path, footer count, and size")
    require(meta.filter(col("kind") === "equality").filter(
        col("detail").isNull || col("path").isNotNull ||
        col("deleted_rows").isNotNull).count() == 0,
      "equality rows carry only their predicate")
    meta.groupBy("kind")
      .agg(sum("deleted_rows").as("deleted_rows"))
      .orderBy("kind")
  }

  /** CDC over DELETION VECTORS: the same append → MoR DELETE → MoR
    * UPDATE history as `lake_cdc_mor`, with the old images shaped as
    * per-file bitmaps (`write.delete.style=vector`, require()d: zero
    * tombstone files at the endpoint). The changelog expands a moved
    * pointer by AND-NOT-ing the endpoint bitmaps and exploding the
    * surviving bits into (file, pos) keys — the diff reads BITMAPS
    * (≤ rows/8 bytes per touched file), then scans only the named
    * data files at the named positions; at 100 TB a day's DML diff
    * costs kilobytes of bitmap I/O plus the touched rows, never a
    * table scan. Same oracle as the tombstone scenario: the delete
    * shape must not leak into changelog semantics. */
  private val cdcDv: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cdc_dv"),
      orders.filter(col("o_orderkey") % 4 < 3))
    t.setProperties(Map(
      "write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "vector",
      "write.update.mode" -> "merge-on-read"))
    LakeRegistry.register("lake_cdc_dv_t", t)
    orders.filter(col("o_orderkey") % 4 === 3)
      .createOrReplaceTempView("lake_cdc_dv_src")
    s.sql("INSERT INTO lake_cdc_dv_t SELECT * FROM lake_cdc_dv_src")
    val files2 = t.currentSnapshot.files.toSet
    s.sql("DELETE FROM lake_cdc_dv_t WHERE o_orderkey % 10 = 0")
    s.sql("UPDATE lake_cdc_dv_t SET o_totalprice = 0.0 " +
      "WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0")
    require(files2.subsetOf(t.currentSnapshot.files.toSet),
      "MoR DML must not rewrite any data file")
    require(t.currentSnapshot.dvs.nonEmpty &&
      t.currentSnapshot.posDels.isEmpty,
      "vector DML must leave pending bitmaps, not tombstones")
    s.sql(s"""SELECT * FROM table_changes('lake_cdc_dv_t', 1,
             |  ${t.currentSnapshotId})
             |ORDER BY _change_type, o_orderkey""".stripMargin)
  }

  /** Four small appends then compact to 4 files: data unchanged. */
  private val compaction: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_cmp"),
      orders.filter(col("o_orderkey") % 4 === 0))
    (1 to 3).foreach(i => t.append(orders.filter(col("o_orderkey") % 4 === i)))
    val before = t.currentSnapshot.files.size
    t.compact(4)
    require(t.currentSnapshot.files.size <= math.min(before, 4),
      "compaction must not grow the file count")
    t.read().orderBy("o_orderkey")
  }

  /** ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS
    * ([[GraftTable.analyzeColumns]], the Iceberg Puffin-sidecar /
    * Spark ANALYZE shape): one pass computes row count + per-column
    * NDV/nulls/min/max, snapshot-scoped. The stats then DRIVE a plan
    * Catalyst could not pick alone: with the size estimator disabled
    * (threshold −1), [[GraftTable.readForJoin]]'s analyzed row count
    * is the only broadcast signal — the in-query require proves the
    * dim side broadcasts on stats truth. At 100 TB this is the nightly
    * ANALYZE feeding every morning's join strategy. Output = the
    * stats themselves, exact-oracled against DuckDB recomputation. */
  private val analyzeQ: Q = (s, dir) => {
    import s.implicits._
    val t = GraftTable.create(s, tmp("lake_an"), Tables.orders(s, dir))
    val st = t.analyzeColumns(Seq("o_orderkey", "o_custkey"))
    require(st.snapshotId == t.currentSnapshotId,
      "stats must name the snapshot they describe")
    require(t.tableStats.contains(st),
      "stats must round-trip the sidecar file")
    val dim = GraftTable.create(s, tmp("lake_an_dim"),
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")))
    dim.analyzeColumns(Seq("c_custkey"))
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = t.read()
        .join(dim.readForJoin(), col("o_custkey") === col("c_custkey"))
      // plan-time check (round 19): the planner picks the build
      // side from the analyzed stats at PLANNING — reading the
      // initial plan (no execution) is the stronger form of the
      // claim, and skips running the whole probe join
      require(probe.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "analyzed row count must broadcast the dim side")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    // the STATEMENT form (round 19): the scheduled stats job in a
    // real deployment is `ANALYZE TABLE …` SQL, not an API call —
    // routed to the same snapshot-scoped sidecar
    LakeRegistry.unregister("lake_an_t")
    LakeRegistry.register("lake_an_t", t)
    s.sql("ANALYZE TABLE lake_an_t COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderkey, o_custkey")
    require(t.tableStats.contains(st),
      "the ANALYZE statement must write the same stats as the API")
    // the bare form computes table-level stats only (Spark's shape);
    // FOR ALL COLUMNS covers every scalar column of the snapshot
    s.sql("ANALYZE TABLE lake_an_t COMPUTE STATISTICS")
    require(t.tableStats.exists(x => x.rows == st.rows &&
        x.cols.isEmpty),
      "the bare statement computes the row count only")
    s.sql("ANALYZE TABLE lake_an_t COMPUTE STATISTICS FOR ALL COLUMNS")
    require(t.tableStats.exists(_.cols.size ==
        t.currentSnapshot.schema.size),
      "FOR ALL COLUMNS must cover every scalar column")
    // restore the two-column stats the oracle frame reports
    s.sql("ANALYZE TABLE lake_an_t COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderkey, o_custkey")
    Seq("o_custkey", "o_orderkey").map { c =>
      val cs = st.cols(c)
      (c, st.rows, cs.ndv, cs.nulls,
        cs.min.map(_.toLong), cs.max.map(_.toLong))
    }.toDF("col_name", "n_rows", "ndv", "n_nulls", "min_v", "max_v")
      .orderBy("col_name")
  }

  /** remove_orphan_files ([[GraftTable.removeOrphanFiles]]), driven
    * through its operator-facing SQL (`VACUUM t ORPHANS [OLDER THAN
    * INTERVAL …]` — Iceberg's remove_orphan_files procedure, the
    * orphan half of Delta's VACUUM): a crashed writer's data files —
    * written, never referenced because the manifest publish lost the
    * CAS — are reaped; the 3-day default cutoff protects them while
    * "in flight" (require()d: the fresh orphans survive a plain
    * `VACUUM … ORPHANS`), an explicit interval reaps once they age
    * past it (mtimes aged via the filesystem, so the SQL path's
    * deletion is deterministic); every referenced file survives,
    * hidden write-protocol files are never touched, and a re-run is
    * a no-op. Output = the intact table, end-state-oracled. */
  private val orphanQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val root = tmp("lake_orph")
    val t = GraftTable.create(s, root,
      orders.filter(col("o_orderkey") % 2 === 0))
    t.append(orders.filter(col("o_orderkey") % 2 === 1))
    LakeRegistry.unregister("lake_orph_t")
    LakeRegistry.register("lake_orph_t", t)
    // the crashed writer: data landed under a commit dir whose
    // manifest never published
    orders.limit(64).write
      .parquet(s"$root/data/commit-99999-deadbeef")
    val crashed = new org.apache.hadoop.fs.Path(
      s"$root/data/commit-99999-deadbeef")
    val fs = crashed.getFileSystem(s.sparkContext.hadoopConfiguration)
    def crashedParquet() = fs.listStatus(crashed)
      .filter(_.getPath.getName.endsWith(".parquet"))
    // seconds-old orphans are "in flight": the default cutoff keeps
    // them even though no manifest references them
    s.sql("VACUUM lake_orph_t ORPHANS")
    require(crashedParquet().nonEmpty,
      "the 3-day guard must keep fresh unreferenced files")
    // age the crash 4 days; an explicit 72h interval then reaps it
    fs.listStatus(crashed).foreach(st => fs.setTimes(st.getPath,
      System.currentTimeMillis() - 4L * 24 * 3600 * 1000, -1))
    s.sql("VACUUM lake_orph_t ORPHANS OLDER THAN INTERVAL 72 HOURS")
    require(crashedParquet().isEmpty,
      "the aged crashed commit's files must be reaped via SQL")
    // idempotent — and the API agrees nothing is left to reap
    s.sql("VACUUM lake_orph_t ORPHANS OLDER THAN INTERVAL 72 HOURS")
    require(t.removeOrphanFiles(
      olderThanMillis = System.currentTimeMillis() + 3600000L).isEmpty,
      "orphan cleanup must be idempotent")
    t.read().orderBy("o_orderkey")
  }

  /** `partitions` metadata TVF ([[GraftTable.partitionsMeta]]):
    * per-partition file/row/byte summary answered from the manifest
    * ALONE — at 100 TB the "which partitions are hot, skewed,
    * fragmented" question costs zero data-file reads because commit
    * already harvested per-file rows/bytes. The scenario writes a
    * (status × month)-partitioned year of orders, requires the
    * physical invariants the oracle cannot see (every partition ≥1
    * file with nonzero bytes; record counts conserve the table), and
    * outputs the logical slice DuckDB can recompute. */
  private val partitionsQ: Q = (s, dir) => {
    import s.implicits._
    val orders95 = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= "1995-01-01" &&
        col("o_orderdate") < "1996-01-01")
      .withColumn("o_month", month(col("o_orderdate")))
    val t = GraftTable.create(s, tmp("lake_parts"), orders95,
      partitionBy = Seq("o_orderstatus", "o_month"))
    val pm = t.partitionsMeta().collect() // bounded: one row/partition
    require(pm.forall(r => r.getAs[Long]("file_count") >= 1 &&
      r.getAs[Long]("total_bytes") > 0),
      "every live partition must report files and bytes")
    require(pm.map(_.getAs[Long]("record_count")).sum == orders95.count(),
      "partition record counts must conserve the table")
    pm.toSeq.map { r =>
      val kv = r.getAs[String]("partition").split("/")
        .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      (kv("o_orderstatus"), kv("o_month").toInt,
        r.getAs[Long]("record_count"))
    }.toDF("o_orderstatus", "o_month", "row_count")
      .orderBy("o_orderstatus", "o_month")
  }

  /** add_files / migrate ([[GraftTable.adopt]]): zero-copy adoption
    * of a parquet directory another engine wrote — the commit is
    * metadata-only (every referenced file still lives under the
    * SOURCE dir), yet lake semantics are immediately live: the DELETE
    * rewrites only affected files copy-on-write under the table's own
    * root while the external originals stay untouched on disk
    * (referenced, never owned — expiry's ownership scope). The 100 TB
    * story is the whole point: migrating a legacy lake costs a footer
    * harvest, not a rewrite. */
  private val addFilesQ: Q = (s, dir) => {
    val src = tmp("lake_adopt_src")
    Tables.customer(s, dir).write.mode("overwrite").parquet(src)
    val t = GraftTable.adopt(s, tmp("lake_adopt"), src)
    val srcPrefix = new org.apache.hadoop.fs.Path(src).toUri.getPath
      .stripSuffix("/") + "/"
    def underSrc(f: String) =
      new org.apache.hadoop.fs.Path(f).toUri.getPath.startsWith(srcPrefix)
    val adopted = t.currentSnapshot.files
    require(adopted.nonEmpty && adopted.forall(underSrc),
      "adoption must reference the external files in place")
    t.delete("c_custkey % 10 = 0")
    require(adopted.forall(f =>
      new java.io.File(new org.apache.hadoop.fs.Path(f).toUri.getPath)
        .exists),
      "DML must never modify the adopted originals")
    require(t.currentSnapshot.files.exists(f => !underSrc(f)),
      "copy-on-write rewrites must land under the table root")
    t.read().orderBy("c_custkey")
  }

  /** Hive-partitioned table; the read for one status touches only
    * that partition's files — pruned on the manifest alone. */
  /** Storage-partitioned join: both sides written `bucket[8](custkey)`,
    * read through the SPJ catalog ([[Spj]]) so the scan reports the
    * stored layout and the join plans with ZERO Exchange on either
    * side — proven in-query on the non-adaptive plan, then executed
    * with the session's normal settings. The daily governed fact join
    * (ref: consumer_emr_on_eks_setup.sh:407-412) at 100 TB is exactly
    * this shape; skipping both shuffles is the whole win. */
  private val bucketedJoin: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
    val t1 = GraftTable.create(s, tmp("lake_bj_o"), orders,
      partitionBy = Seq("bucket[8](o_custkey)"))
    val t2 = GraftTable.create(s, tmp("lake_bj_c"), cust,
      partitionBy = Seq("bucket[8](c_custkey)"))
    val a = Spj.read(s, "lake_bj_orders", t1)
    val b = Spj.read(s, "lake_bj_cust", t2)
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the zero-Exchange proof runs UNDER the production AQE config:
      // Spj.shuffles descends through the adaptive wrapper, so no
      // conf has to be turned off to keep the plan honest
      val probe = a.join(b, col("o_custkey") === col("c_custkey"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "bucketed lake join must plan with zero Exchange under AQE")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** Dynamic partition pruning through the SPJ scan
    * ([[LakeSpjScan]]'s SupportsRuntimeV2Filtering): a selective
    * parquet-backed dimension filter reaches the bucketed fact scan
    * as a runtime IN filter, dropping whole bucket tuples before any
    * file opens — at 100 TB the dim-prunes-the-fact pattern turns a
    * full fact scan into |dim keys| buckets. The in-query require()
    * proves the runtime filter is actually attached. */
  private val spjDpp: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val t = GraftTable.create(s, tmp("lake_dpp"), orders,
      partitionBy = Seq("bucket[8](o_custkey)"))
    val fact = Spj.read(s, "lake_dpp_fact", t)
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
    def joined = fact.join(broadcast(dim),
      col("o_custkey") === col("c_custkey"))
    val probe = joined
    probe.count() // execute so AQE finalizes and DPP materializes
    require(probe.queryExecution.executedPlan.toString
        .contains("RuntimeFilters: [dynamicpruning"),
      "the fact scan must carry a dynamic-pruning runtime filter")
    joined.select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
      .orderBy("o_orderkey")
  }

  /** Storage-partitioned join over a table with PENDING merge-on-read
    * position tombstones — the shape a busy 100 TB fact table is
    * always in (every fine-grained DML leaves tombstones until the
    * next compaction), so the zero-Exchange path must serve it
    * (Iceberg's SPJ readers apply delete files the same way). The MoR
    * DELETE is require()d to rewrite no data file; the SPJ scan
    * attaches each file's tombstoned positions to its split and the
    * reader skips them, so the join both stays Exchange-free
    * (require()d under AQE) and returns the LIVE view (oracled: the
    * deleted status is absent from the join result). */
  private val spjMor: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
    val t1 = GraftTable.create(s, tmp("lake_spjm_o"), orders,
      partitionBy = Seq("bucket[8](o_custkey)"))
    t1.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    LakeRegistry.register("lake_spjm_t", t1)
    val before = t1.currentSnapshot.files.toSet
    s.sql("DELETE FROM lake_spjm_t WHERE o_orderstatus = 'F'")
    require(t1.currentSnapshot.files.toSet == before,
      "merge-on-read DELETE must not rewrite any data file")
    require(t1.currentSnapshot.posDels.nonEmpty,
      "the delete must land as position tombstones")
    val t2 = GraftTable.create(s, tmp("lake_spjm_c"), cust,
      partitionBy = Seq("bucket[8](c_custkey)"))
    val a = Spj.read(s, "lake_spjm_orders", t1)
    val b = Spj.read(s, "lake_spjm_cust", t2)
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = a.join(b, col("o_custkey") === col("c_custkey"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "tombstoned SPJ join must plan with zero Exchange under AQE")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** SPJ over PENDING merge-on-read EQUALITY deletes — the other MoR
    * shape ([[spjMor]] covers position tombstones): the scan compiles
    * each pending predicate against the snapshot schema, the reader
    * widens its column-pruned decode by the predicate columns,
    * filters row-side through codegen'd Predicates scoped by
    * add-sequence (rows appended AFTER the delete are untouched even
    * when they match), and projects back down — all without touching
    * the zero-Exchange plan. The query output does NOT select the
    * predicate column, so the widen-then-project path is what runs. */
  private val spjEqDel: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val t1 = GraftTable.create(s, tmp("lake_spjq_o"),
      orders.filter(col("o_orderkey") % 2 === 0),
      partitionBy = Seq("bucket[8](o_custkey)"))
    t1.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    LakeRegistry.register("lake_spjq_t", t1)
    val before = t1.currentSnapshot.files.toSet
    s.sql("DELETE FROM lake_spjq_t WHERE o_orderstatus = 'F'")
    require(t1.currentSnapshot.files.toSet == before &&
        t1.currentSnapshot.dels.nonEmpty,
      "merge-on-read DELETE must land as a predicate, not a rewrite")
    // appended after the delete: its F rows are OUT of the delete's
    // scope (add-sequence law) and must survive the SPJ read
    t1.append(orders.filter(col("o_orderkey") % 2 === 1))
    val t2 = GraftTable.create(s, tmp("lake_spjq_c"),
      Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
      partitionBy = Seq("bucket[8](c_custkey)"))
    val a = Spj.read(s, "lake_spjq_orders", t1)
    val b = Spj.read(s, "lake_spjq_cust", t2)
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = a.join(b, col("o_custkey") === col("c_custkey"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "equality-delete SPJ join must plan with zero Exchange")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** Snapshot-pinned SPJ read (`VERSION AS OF` through the SPJ
    * catalog): a TAGGED snapshot joins zero-Exchange while main has
    * advanced past it — the audit/repro pattern (pin yesterday's
    * tag, join it against the dim at full SPJ speed) that previously
    * fell back to the shuffling read path. The pinned snapshot goes
    * through the same one-snapshot eligibility validation as a
    * current-state read. */
  private val spjPinned: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val t1 = GraftTable.create(s, tmp("lake_spjp_o"),
      orders.filter(col("o_orderkey") % 2 === 0),
      partitionBy = Seq("bucket[8](o_custkey)"))
    t1.createTag("audit", t1.currentSnapshotId)
    t1.append(orders.filter(col("o_orderkey") % 2 === 1))
    val t2 = GraftTable.create(s, tmp("lake_spjp_c"),
      Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
      partitionBy = Seq("bucket[8](c_custkey)"))
    val a = Spj.readAt(s, "lake_spjp_orders", t1, "audit")
    val b = Spj.read(s, "lake_spjp_cust", t2)
    require(a.count() < Spj.read(s, "lake_spjp_orders", t1).count(),
      "main must have advanced past the pinned tag")
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = a.join(b, col("o_custkey") === col("c_custkey"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "the pinned-snapshot SPJ join must plan with zero Exchange")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** Zero-copy SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW
    * CLONE`): the clone's first snapshot references the source's
    * data files by path — require()d identical file lists, so at
    * 100 TB the fork costs one manifest write. Independence is
    * proven both ways: DML on the clone (copy-on-write DELETE)
    * leaves the source byte-identical, an append to the SOURCE
    * leaves the clone at its fork point, and the clone EXPIRING its
    * history does not reap shared files the source still references
    * (ownership-scoped cleanup, require()d by re-reading the source
    * afterwards). */
  private val cloneQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_cl_src"), orders)
    LakeRegistry.register("lake_cl_src", t)
    if (LakeRegistry.get("lake_cl_c").isDefined)
      s.sql("DROP TABLE lake_cl_c PURGE") // rerun-safe
    s.sql("CREATE TABLE lake_cl_c SHALLOW CLONE lake_cl_src")
    val c = LakeRegistry.get("lake_cl_c").get
    require(c.currentSnapshot.files == t.currentSnapshot.files,
      "the clone must reference the source's data files (zero copy)")
    val srcCount = t.read().count()
    // clone DML: copy-on-write rewrite lands under the CLONE's root
    s.sql("DELETE FROM lake_cl_c WHERE o_orderstatus = 'F'")
    require(t.read().count() == srcCount,
      "clone DML must leave the source untouched")
    // source evolution: the clone stays at its fork point
    t.append(orders.limit(100))
    val cloneCount = c.read().count()
    require(t.read().count() == srcCount + 100 &&
        cloneCount < srcCount,
      "source and clone must evolve independently")
    // the clone expiring its pre-delete history must not reap SHARED
    // files (ownership-scoped cleanup) — the source must still read
    c.expireSnapshots(1)
    require(t.read().count() == srcCount + 100,
      "clone expiry must never delete files the source references")
    require(c.read().count() == cloneCount,
      "expiry is metadata-only for the live clone view")
    c.read().orderBy("o_orderkey")
  }

  /** MERGE with `WHEN NOT MATCHED BY SOURCE` (Spark 3.4+/Delta/
    * Iceberg): the synchronize-to-snapshot upsert — matched rows
    * update, UNMATCHED TARGET rows (no source row) delete or mark
    * stale, all through the SQL front-end. Copy-on-write; one rewrite
    * pass covers matched and by-source rows together. */
  private val mergeBySource: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_mbs"), customer)
    LakeRegistry.register("lake_mbs_t", t)
    customer.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"))
      .createOrReplaceTempView("lake_mbs_src")
    s.sql(
      """MERGE INTO lake_mbs_t t USING lake_mbs_src s
        |ON t.c_custkey = s.c_custkey
        |WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + 1000.0
        |WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_mktsegment = 'STALE'
        |""".stripMargin)
    t.read().orderBy("c_custkey")
  }

  /** Storage-partitioned join on a STRING bucket key — real governed
    * corpora join on string document/patient ids, not synthetic
    * BIGINTs (ref: the reference's `patient_id` join key,
    * consumer_emr_on_eks_setup.sh:412, is an id column by nature).
    * Both sides written `bucket[8](<string id>)`; the v2 `bucket`
    * function's string bound form reproduces the write-time
    * xxhash64-over-UTF8 law, and the join plans with zero Exchange
    * under the production AQE config (require()d in-query). */
  private val spjString: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        col("o_custkey").cast("string").as("o_cust_id"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").cast("string").as("c_cust_id"),
        col("c_name"))
    val t1 = GraftTable.create(s, tmp("lake_spjs_o"), orders,
      partitionBy = Seq("bucket[8](o_cust_id)"))
    val t2 = GraftTable.create(s, tmp("lake_spjs_c"), cust,
      partitionBy = Seq("bucket[8](c_cust_id)"))
    val a = Spj.read(s, "lake_spjs_orders", t1)
    val b = Spj.read(s, "lake_spjs_cust", t2)
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = a.join(b, col("o_cust_id") === col("c_cust_id"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "string-keyed bucketed join must plan with zero Exchange")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("o_cust_id") === col("c_cust_id"))
      .select(col("o_orderkey"), col("o_cust_id"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** Storage-partitioned join on a `truncate[w](string)` layout —
    * prefix-sharded doc/customer ids (the common string-key corpus
    * layout when bucket counts must stay re-shardable): both sides
    * written `truncate[4](<id>)`, the join on the full id plans with
    * zero Exchange under AQE (require()d; the width-qualified
    * function name keeps the transform one-leaf — see
    * SpjField.TruncateField), and prefix range predicates prune
    * partitions on the manifest (spec-pinned). */
  private val spjTruncate: Q = (s, dir) => {
    val ords = Tables.orders(s, dir).select(
      concat(lit("C"), lpad(col("o_custkey").cast("string"), 7, "0"))
        .as("ocust_id"),
      col("o_orderkey"), col("o_totalprice"))
    val cust = Tables.customer(s, dir).select(
      concat(lit("C"), lpad(col("c_custkey").cast("string"), 7, "0"))
        .as("cust_id"),
      col("c_name"))
    val t1 = GraftTable.create(s, tmp("lake_spjt_o"), ords,
      partitionBy = Seq("truncate[4](ocust_id)"))
    val t2 = GraftTable.create(s, tmp("lake_spjt_c"), cust,
      partitionBy = Seq("truncate[4](cust_id)"))
    val a = Spj.read(s, "lake_spjt_orders", t1)
    val b = Spj.read(s, "lake_spjt_cust", t2)
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = a.join(b, col("ocust_id") === col("cust_id"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "truncate-keyed join must plan with zero Exchange")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    a.join(b, col("ocust_id") === col("cust_id"))
      .select(col("o_orderkey"), col("cust_id"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** Storage-partitioned join over a COMPOSITE spec — the production
    * Iceberg layout `month(ts), bucket(k)`: prune on time, join on
    * key. Both sides written `(month(o_orderdate), bucket[4](key))`.
    * The registered result joins on the bucket key alone — a SUBSET
    * of the partition keys (SPARK-44647) — under a time filter, and
    * the in-query probe requires (a) zero Exchange under AQE and
    * (b) the time predicate pruning month partitions on the manifest
    * (fewer input files than the table holds). */
  private val spjComposite: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      // the tail 20 months of the 80-month table: the scenario
      // proves composite-spec pruning + subset-key SPJ identically
      // at a quarter of the (month × bucket) file count — the bench
      // otherwise spends its time writing tiny files
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    val even = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val odd = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey").as("r_orderkey"),
        col("o_custkey").as("r_custkey"),
        col("o_orderdate").as("r_orderdate"))
    val t1 = GraftTable.create(s, tmp("lake_spjc_e"), even,
      partitionBy = Seq("month(o_orderdate)", "bucket[4](o_custkey)"))
    val t2 = GraftTable.create(s, tmp("lake_spjc_o"), odd,
      partitionBy = Seq("month(r_orderdate)", "bucket[4](r_custkey)"))
    val a = Spj.read(s, "lake_spjc_even", t1)
    val b = Spj.read(s, "lake_spjc_odd", t2)
    val cutoff = lit("2001-01-01").cast("timestamp")
    val pruned = a.filter(col("o_orderdate") >= cutoff)
    // one scan split per surviving (month, bucket) tuple — the time
    // predicate must cut the split count, proving manifest pruning
    require(pruned.rdd.getNumPartitions < a.rdd.getNumPartitions,
      "the time predicate must prune month partitions on the manifest")
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = pruned.join(b, col("o_custkey") === col("r_custkey"))
      // plan-shape check WITHOUT executing the probe (round 19):
      // Spj.shuffles descends the un-executed adaptive wrapper, and
      // EnsureRequirements plans every Exchange before execution —
      // AQE can remove but never insert one into an exchange-free
      // plan, so the pre-execution check is equally strong
      require(Spj.shuffles(probe).isEmpty,
        "subset-key composite join must plan with zero Exchange")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
    // sum over DECIMAL internally (exact and associative, so the
    // result is independent of the shuffle-free plan's partial-agg
    // order), but cast to double at the output boundary: Spark's
    // sum(decimal(18,2)) widens to decimal(28,2) while DuckDB widens
    // to DECIMAL(38,2), and that representation gap fails the hash
    // compare even though the values match. Sums are ~10^7 at two
    // decimals — five orders inside double's 2^53 exactness window.
    pruned.join(b, col("o_custkey") === col("r_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .orderBy("o_custkey")
  }

  private val partitioned: Q = (s, dir) => {
    val t = GraftTable.create(s, tmp("lake_part"), Tables.orders(s, dir),
      partitionBy = Seq("o_orderstatus"))
    val pruned = t.readPruned("o_orderstatus", Set("F"))
    require(pruned.inputFiles.length < t.currentSnapshot.files.size,
      "pruned read must touch a strict subset of data files")
    pruned.select(Tables.orders(s, dir).columns.map(col): _*)
      .orderBy("o_orderkey")
  }

  /** Dynamic partition overwrite: rewrite only the 'F' partition
    * (prices doubled), other partitions carried forward untouched. */
  private val overwritePartition: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_dpo"), orders,
      partitionBy = Seq("o_orderstatus"))
    val before = t.currentSnapshot.files.toSet
    t.overwritePartitions(
      orders.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2.0))
    val after = t.currentSnapshot.files.toSet
    require((before intersect after).nonEmpty,
      "untouched partitions must carry forward by reference")
    t.read().select(orders.columns.map(col): _*).orderBy("o_orderkey")
  }

  /** The full SQL INSERT surface beyond the bare positional form
    * (ref: producer_iceberg_datalake_setup.sh:143's Athena
    * `INSERT INTO db.t VALUES …` is the plain case; Hive/Iceberg/
    * Spark all extend it with these): a COLUMN LIST whose omitted
    * columns fill from write-DEFAULT or NULL, a STATIC `PARTITION
    * (p='v')` spec that rides in as a typed constant, and `INSERT
    * OVERWRITE … PARTITION (p='v')` replacing exactly the named
    * partition while every other partition's files carry forward BY
    * REFERENCE (require()d). At 100 TB the by-reference carry is the
    * whole point: reloading today's partition costs today's bytes. */
  private val insertSpec: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_ins"),
      orders.filter(col("o_orderstatus").isin("O", "P")),
      partitionBy = Seq("o_orderstatus"))
    LakeRegistry.register("lake_ins_t", t)
    s.sql("ALTER TABLE lake_ins_t ADD COLUMNS (src STRING DEFAULT 'seed')")
    orders.createOrReplaceTempView("lake_ins_src")
    // 1. column list: omitted o_totalprice (nullable) fills NULL,
    //    omitted src takes its declared write-DEFAULT
    s.sql("""INSERT INTO lake_ins_t (o_orderkey, o_orderstatus)
            |SELECT o_orderkey, o_orderstatus FROM lake_ins_src
            |WHERE o_orderstatus = 'F'""".stripMargin)
    // 2. static PARTITION spec: the constant is cast to the source
    //    column's type and may name a brand-new partition value
    s.sql("""INSERT INTO lake_ins_t PARTITION (o_orderstatus = 'X')
            |SELECT o_orderkey, o_totalprice, 'staged' FROM lake_ins_src
            |WHERE o_orderstatus = 'P'""".stripMargin)
    val before = t.currentSnapshot.files.toSet
    // 3. OVERWRITE with a static spec replaces ONLY that partition
    s.sql("""INSERT OVERWRITE lake_ins_t PARTITION (o_orderstatus = 'O')
            |SELECT o_orderkey, o_totalprice * 2, 'replaced'
            |FROM lake_ins_src WHERE o_orderstatus = 'O'""".stripMargin)
    val after = t.currentSnapshot.files.toSet
    require(before.filterNot(_.contains("o_orderstatus=O"))
        .forall(after.contains),
      "every partition outside the static spec must carry by reference")
    require(!after.exists(f =>
        f.contains("o_orderstatus=O") && before.contains(f)),
      "the named partition must be fully replaced")
    s.sql("SELECT * FROM lake_ins_t")
      .orderBy("o_orderkey", "o_orderstatus")
  }

  /** `TRUNCATE TABLE` as SQL — whole-table and `PARTITION (p='v')`
    * forms, both METADATA-ONLY (no data file read, written, or
    * deleted; history stays time-travelable until snapshot expiry —
    * the Iceberg/Delta contract). At 100 TB this is the difference
    * between an O(1) manifest commit and a storage-scale delete
    * job; partition truncate's survivors carry BY REFERENCE
    * (require()d), and the full truncate is require()d to leave
    * zero files while snapshot 1 still reads whole. */
  private val truncateQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_trunc"), orders,
      partitionBy = Seq("o_orderstatus"))
    LakeRegistry.register("lake_trunc_t", t)
    val before = t.currentSnapshot.files.toSet
    s.sql("TRUNCATE TABLE lake_trunc_t PARTITION (o_orderstatus = 'F')")
    val after = t.currentSnapshot.files.toSet
    require(after.subsetOf(before) && after.nonEmpty &&
      after.forall(!_.contains("o_orderstatus=F")),
      "partition truncate must carry survivors by reference only")
    val t2 = GraftTable.create(s, tmp("lake_trunc2"), orders.limit(100))
    LakeRegistry.register("lake_trunc2_t", t2)
    s.sql("TRUNCATE TABLE lake_trunc2_t")
    require(t2.read().count() == 0 && t2.currentSnapshot.files.isEmpty &&
      t2.readAt(1).count() == 100,
      "full truncate is metadata-only with time travel intact")
    s.sql("SELECT * FROM lake_trunc_t").orderBy("o_orderkey")
  }

  /** Partition spec evolution as SQL (Iceberg's `ALTER TABLE …
    * ADD/REPLACE/DROP PARTITION FIELD`): three spec epochs —
    * unpartitioned → `year(o_orderdate)` → `month(o_orderdate)` —
    * each a metadata-only commit (require()d: no file rewrite), with
    * the spec HISTORY scoping pruning per epoch: a 1999 predicate
    * prunes year- and month-partitioned files while epoch-1 files
    * (no dirs) are kept conservatively. The final DROP returns the
    * spec to unpartitioned and must also rewrite nothing. */
  private val partitionFieldDdl: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def upTo(d: String) = col("o_orderdate") < lit(d).cast("timestamp")
    val t = GraftTable.create(s, tmp("lake_pfd"),
      orders.filter(upTo("1997-01-01")))
    LakeRegistry.register("lake_pfd_t", t)
    val files1 = t.currentSnapshot.files
    s.sql("ALTER TABLE lake_pfd_t ADD PARTITION FIELD year(o_orderdate)")
    require(t.currentSnapshot.files == files1 &&
      t.currentSnapshot.partitionCols == Seq("year(o_orderdate)"),
      "ADD PARTITION FIELD must be metadata-only")
    t.append(orders.filter(!upTo("1997-01-01") && upTo("1999-01-01")))
    s.sql("ALTER TABLE lake_pfd_t REPLACE PARTITION FIELD " +
      "year(o_orderdate) WITH month(o_orderdate)")
    t.append(orders.filter(!upTo("1999-01-01")))
    val snap = t.currentSnapshot
    require(snap.partitionCols == Seq("month(o_orderdate)"),
      "REPLACE PARTITION FIELD must swap the field in place")
    val pred = "o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'"
    val pruned = t.prunePartitions(snap, pred)
    require(pruned.size < snap.files.size && pruned.size >= files1.size,
      s"epoch-scoped pruning: old files keep (no dirs), evolved " +
        s"epochs prune (${pruned.size} of ${snap.files.size})")
    s.sql("ALTER TABLE lake_pfd_t DROP PARTITION FIELD month(o_orderdate)")
    require(t.currentSnapshot.partitionCols.isEmpty &&
      t.currentSnapshot.files == snap.files,
      "DROP PARTITION FIELD must be metadata-only")
    t.read().orderBy("o_orderkey")
  }

  /** DML with subqueries (`DELETE/UPDATE … WHERE col [NOT] IN
    * (SELECT …)`) — Iceberg/Delta both support this; the engine
    * lowers it onto the MERGE path, so the subquery is evaluated
    * ONCE as a distinct-projected join source (a broadcast-able
    * relation of keys) instead of per-row — the only shape that
    * survives 100 TB. ANSI NOT IN null semantics and residual
    * plain conjuncts are covered; EXISTS/scalar shapes refuse
    * loudly (spec-pinned). */
  private val dmlSubquery: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_dmlsub"), orders)
    LakeRegistry.register("lake_dmlsub_t", t)
    Tables.customer(s, dir).createOrReplaceTempView("lake_dmlsub_cust")
    s.sql(
      """DELETE FROM lake_dmlsub_t WHERE o_custkey IN
        |(SELECT c_custkey FROM lake_dmlsub_cust
        | WHERE c_mktsegment = 'BUILDING')""".stripMargin)
    // a plain residual conjunct rides the merge clause's condition
    s.sql(
      """UPDATE lake_dmlsub_t SET o_totalprice = o_totalprice * 2
        |WHERE o_custkey IN (SELECT c_custkey FROM lake_dmlsub_cust
        |  WHERE c_mktsegment = 'AUTOMOBILE')
        |  AND o_totalprice > 100000""".stripMargin)
    s.sql(
      """DELETE FROM lake_dmlsub_t WHERE o_custkey NOT IN
        |(SELECT c_custkey FROM lake_dmlsub_cust
        | WHERE c_mktsegment IN ('AUTOMOBILE','HOUSEHOLD','FURNITURE'))
        |""".stripMargin)
    t.read().orderBy("o_orderkey")
  }

  /** Correlated-subquery DML (`DELETE/UPDATE … WHERE [NOT] EXISTS
    * (SELECT … WHERE s.k = t.k)`) — the most common row-level DML
    * shape after IN; Spark/Iceberg rewrite it onto a semi/anti join
    * and so does this engine: the subquery DECORRELATES (correlated
    * equalities → the merge keys, local predicates stay inside) into
    * a distinct-key relation evaluated ONCE, and the statement lowers
    * to WHEN MATCHED (EXISTS) / WHEN NOT MATCHED BY SOURCE (NOT
    * EXISTS). EXISTS needs none of NOT IN's null poison — the join's
    * own null semantics ARE ANSI EXISTS semantics. Non-equi
    * correlation refuses loudly (require()d here; matrix in
    * LakehouseSpec). */
  private val dmlExists: Q = (s, dir) => {
    def refused(frag: String)(body: => Unit): Boolean =
      try { body; false }
      catch { case e: Throwable =>
        Option(e.getMessage).exists(_.contains(frag)) }
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_dmlex"), orders)
    LakeRegistry.register("lake_dmlex_t", t)
    Tables.customer(s, dir).createOrReplaceTempView("lake_dmlex_cust")
    s.sql(
      """DELETE FROM lake_dmlex_t WHERE EXISTS
        |(SELECT 1 FROM lake_dmlex_cust c
        | WHERE c.c_custkey = lake_dmlex_t.o_custkey
        |   AND c.c_mktsegment = 'BUILDING')""".stripMargin)
    // correlated UPDATE with a plain residual conjunct outside
    s.sql(
      """UPDATE lake_dmlex_t SET o_totalprice = o_totalprice * 2
        |WHERE EXISTS (SELECT 1 FROM lake_dmlex_cust c
        |  WHERE c.c_custkey = lake_dmlex_t.o_custkey
        |    AND c.c_mktsegment = 'AUTOMOBILE')
        |  AND o_totalprice > 100000""".stripMargin)
    s.sql(
      """DELETE FROM lake_dmlex_t WHERE NOT EXISTS
        |(SELECT 1 FROM lake_dmlex_cust c
        | WHERE c.c_custkey = lake_dmlex_t.o_custkey
        |   AND c.c_mktsegment IN
        |     ('AUTOMOBILE','HOUSEHOLD','FURNITURE'))""".stripMargin)
    // no merge-key lowering exists for a non-equi correlation — it
    // must refuse loudly, never silently read as local-only
    require(refused("conjunction of equalities")(s.sql(
      """DELETE FROM lake_dmlex_t WHERE EXISTS
        |(SELECT 1 FROM lake_dmlex_cust c
        | WHERE c.c_custkey > lake_dmlex_t.o_custkey)""".stripMargin)),
      "non-equi EXISTS correlation must refuse")
    require(refused("correlated WHERE")(s.sql(
      """DELETE FROM lake_dmlex_t WHERE EXISTS
        |(SELECT 1 FROM lake_dmlex_cust c)""".stripMargin)),
      "uncorrelated EXISTS must refuse")
    t.read().orderBy("o_orderkey")
  }

  /** VARIANT shredding INSIDE the lakehouse format (`lake_variant`;
    * the managed-table half of `q45_variant`'s bare-parquet proof):
    * the shredded pair (typed struct + JSON residual) lives in a
    * graft table, row-level COW DML runs against BOTH halves — a
    * DELETE on the shredded hot path (`v_typed.k`) and one on the
    * residual long tail (`get_json_object`) — and the post-DML read
    * still pushes the shredded predicate into the parquet scan
    * (require()d). At 100 TB that composition is the point: DML
    * rewrites never de-shred, so the hot path stays a native column
    * scan forever. */
  private val variantLake: Q = (s, dir) => {
    import org.apache.spark.sql.types.StructType
    val ev = Tables.events(s, dir)
    val raw = ev.select(col("event_id"),
      to_json(struct(
        from_json(col("props"), StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        col("event_type").as("lvl"))).as("v"))
    val shredSchema = StructType.fromDDL("k INT")
    val (typed, residual) =
      graft.sources.Variant.shred(col("v"), shredSchema)
    val t = GraftTable.create(s, tmp("lake_var"),
      raw.select(col("event_id"), typed.as("v_typed"),
        residual.as("v_residual")))
    LakeRegistry.register("lake_var_t", t)
    s.sql("DELETE FROM lake_var_t WHERE v_typed.k < 10")
    s.sql("DELETE FROM lake_var_t WHERE " +
      "get_json_object(v_residual, '$.lvl') = 'view'")
    val get = (p: String) => graft.sources.Variant.variantGet(
      col("v_typed"), col("v_residual"), shredSchema, p)
    val q = t.read().filter(get("k") >= 50)
      .select(col("event_id"), get("k").as("k"), get("lvl").as("lvl"))
      .orderBy("event_id")
    val scanText = q.queryExecution.executedPlan.toString()
    require(scanText.contains("v_typed.k"),
      "the shredded path must push into the managed table's scan:\n" +
        scanText)
    q
  }

  /** CHECK constraints (Delta's `ALTER TABLE … ADD CONSTRAINT name
    * CHECK (expr)`): declaring one validates EXISTING rows first
    * (one scan — a constraint the data already violates refuses);
    * after that every write validates ITS OWN new files before the
    * commit publishes (one columnar scan of just-written data, never
    * the table — the 100 TB-honest cost), so a violating INSERT or
    * UPDATE aborts with nothing committed. DROP CONSTRAINT reopens
    * the gate. All four paths require()d in-query. */
  private val constraintQ: Q = (s, dir) => {
    def refused(frag: String)(body: => Unit): Boolean =
      try { body; false }
      catch { case e: Throwable =>
        Option(e.getMessage).exists(_.contains(frag)) }
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_con"),
      orders.filter(col("o_orderkey") % 2 === 0))
    LakeRegistry.register("lake_con_t", t)
    s.sql("ALTER TABLE lake_con_t ADD CONSTRAINT pos_price " +
      "CHECK (o_totalprice > 0)")
    orders.filter(col("o_orderkey") % 2 === 1)
      .createOrReplaceTempView("lake_con_src")
    s.sql("INSERT INTO lake_con_t SELECT * FROM lake_con_src")
    val snaps = t.currentSnapshotId
    require(refused("CHECK constraint")(
      s.sql("INSERT INTO lake_con_t VALUES (9999991, -5.0)")),
      "a violating INSERT must refuse")
    require(refused("CHECK constraint")(
      s.sql("UPDATE lake_con_t SET o_totalprice = -o_totalprice " +
        "WHERE o_orderkey <= 10")),
      "a violating UPDATE must refuse")
    require(t.currentSnapshotId == snaps,
      "refused writes must not commit")
    require(refused("existing rows violate")(
      s.sql("ALTER TABLE lake_con_t ADD CONSTRAINT big " +
        "CHECK (o_totalprice > 100000)")),
      "a constraint existing data violates must refuse")
    s.sql("ALTER TABLE lake_con_t DROP CONSTRAINT pos_price")
    s.sql("INSERT INTO lake_con_t VALUES (9999991, -5.0)")
    t.read().orderBy("o_orderkey")
  }

  /** NOT NULL constraints (`ALTER TABLE t ALTER COLUMN c SET/DROP
    * NOT NULL` — Delta's nullability half of the constraint surface):
    * declaring validates EXISTING rows (one columnar scan of that
    * column; NULLs refuse), then every write validates its new files
    * through the SAME single-pass writeData funnel as CHECK
    * constraints — a violating INSERT or UPDATE aborts with nothing
    * committed — and the schema flips nullable=false so downstream
    * plans fold null-checks away. DROP NOT NULL reopens the gate
    * (and a later declare over data holding NULLs refuses). */
  private val notNullQ: Q = (s, dir) => {
    def refused(frag: String)(body: => Unit): Boolean =
      try { body; false }
      catch { case e: Throwable =>
        Option(e.getMessage).exists(_.contains(frag)) }
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_nn"), orders)
    LakeRegistry.register("lake_nn_t", t)
    s.sql("ALTER TABLE lake_nn_t ALTER COLUMN o_totalprice SET NOT NULL")
    require(!t.currentSnapshot.schema("o_totalprice").nullable,
      "SET NOT NULL must flip the schema field")
    val snaps = t.currentSnapshotId
    require(refused("NOT NULL constraint")(s.sql(
      "INSERT INTO lake_nn_t VALUES (9999991, 'X', CAST(NULL AS DOUBLE))")),
      "a NULL-writing INSERT must refuse")
    require(refused("NOT NULL constraint")(s.sql(
      "UPDATE lake_nn_t SET o_totalprice = CAST(NULL AS DOUBLE) " +
        "WHERE o_orderkey <= 5")),
      "a NULL-writing UPDATE must refuse")
    require(t.currentSnapshotId == snaps,
      "refused writes must not commit")
    s.sql("ALTER TABLE lake_nn_t ALTER COLUMN o_totalprice DROP NOT NULL")
    s.sql(
      "INSERT INTO lake_nn_t VALUES (9999991, 'X', CAST(NULL AS DOUBLE))")
    require(refused("existing rows hold NULL")(s.sql(
      "ALTER TABLE lake_nn_t ALTER COLUMN o_totalprice SET NOT NULL")),
      "declaring over NULL-holding data must refuse")
    // an independent column still declares fine, and a conforming
    // write under it lands
    s.sql("ALTER TABLE lake_nn_t ALTER COLUMN o_orderstatus SET NOT NULL")
    s.sql("INSERT INTO lake_nn_t VALUES (9999992, 'X', 1.0)")
    t.read().orderBy("o_orderkey")
  }

  /** Operator-facing catalog SQL ([[LakeCatalogSql]]): `DESCRIBE
    * TABLE` answers schema + partition spec, `SHOW TABLES IN db`
    * lists the namespace, `SHOW PARTITIONS` lists live partitions —
    * all from the driver-side manifest, ZERO data reads (the
    * reference workflow inspects tables between every step:
    * consumer_emr_on_eks_setup.sh's validation browses Glue/Athena
    * schemas and partitions constantly). The result pins the exact
    * row text of all three statements; EXTENDED, LIKE-pattern, and
    * the unpartitioned refusal are require()d in-query (their rows
    * are machine-specific or empty). */
  private val describeQ: Q = (s, dir) => {
    def refused(frag: String)(body: => Unit): Boolean =
      try { body; false }
      catch { case e: Throwable =>
        Option(e.getMessage).exists(_.contains(frag)) }
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_desc"), orders,
      partitionBy = Seq("o_orderstatus"))
    LakeRegistry.register("descdb.orders_d", t)
    val n = GraftTable.create(s, tmp("lake_desc_n"), Tables.nation(s, dir))
    LakeRegistry.register("descdb.nation_d", n)

    val desc = s.sql("DESCRIBE TABLE descdb.orders_d").collect()
    val ext = s.sql("DESCRIBE EXTENDED descdb.orders_d").collect()
    require(ext.exists(_.getString(0) == "Location") &&
      ext.exists(_.getString(0) == "Snapshot"),
      "EXTENDED must expose location and current snapshot")
    val tabs = s.sql("SHOW TABLES IN descdb").collect()
    require(s.sql("SHOW TABLES IN descdb LIKE 'orders*'").count() == 1,
      "the LIKE pattern must narrow the listing")
    val parts = s.sql("SHOW PARTITIONS descdb.orders_d").collect()
    require(refused("not partitioned")(
      s.sql("SHOW PARTITIONS descdb.nation_d")),
      "SHOW PARTITIONS on an unpartitioned table must refuse")

    import s.implicits._
    (desc.toSeq.map(r => ("describe", r.getString(0), r.getString(1))) ++
      tabs.toSeq.map(r => ("show_tables", r.getString(1), r.getString(0))) ++
      parts.toSeq.map(r => ("show_partitions", r.getString(0), "")))
      .toDF("stmt", "item", "detail")
      .orderBy("stmt", "item", "detail")
  }

  /** The rest of the operator-facing catalog SQL (round 16,
    * completing [[LakeCatalogSql]]): `SHOW CREATE TABLE` renders the
    * reproducing DDL from the manifest (typed columns with declared
    * NOT NULL, partition spec, location, properties — CHECK
    * constraints ride in property form), `SHOW TBLPROPERTIES [('k')]`
    * answers the property map, `SHOW VIEWS IN db` and
    * `SHOW NAMESPACES [IN graft]` list the lake's views and
    * namespaces merged with the session catalog's. All driver-side
    * metadata, zero data reads. The pinned output filters to this
    * query's own namespace (global listings vary with session
    * history) and drops the machine-specific LOCATION line
    * (require()d to match the table's real root instead). */
  private val showDdlQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_sddl"), orders,
      partitionBy = Seq("o_orderstatus"))
    LakeRegistry.register("sddldb.orders_s", t)
    s.sql("ALTER TABLE sddldb.orders_s ALTER COLUMN o_orderkey " +
      "SET NOT NULL")
    s.sql("ALTER TABLE sddldb.orders_s ADD CONSTRAINT pos " +
      "CHECK (o_totalprice > 0)")
    t.setProperties(t.properties + ("write.delete.mode" -> "merge-on-read"))

    val create = s.sql("SHOW CREATE TABLE sddldb.orders_s")
      .head.getString(0)
    require(create.contains(s"LOCATION '${t.location}'"),
      "SHOW CREATE TABLE must carry the real storage root")
    val createLines = create.split('\n').toSeq
      .filterNot(_.startsWith("LOCATION"))
    val props = s.sql("SHOW TBLPROPERTIES sddldb.orders_s").collect()
    require(s.sql(
        "SHOW TBLPROPERTIES sddldb.orders_s ('write.delete.mode')")
      .head.getString(1) == "merge-on-read",
      "the single-key TBLPROPERTIES form must answer the value")
    s.sql("CREATE OR REPLACE VIEW sddldb.v_s AS " +
      "SELECT o_orderkey FROM sddldb.orders_s WHERE o_totalprice > 100")
    val views = s.sql("SHOW VIEWS IN sddldb").collect()
    require(s.sql("SHOW NAMESPACES").collect()
      .exists(_.getString(0) == "sddldb") &&
      s.sql("SHOW NAMESPACES IN graft").collect()
        .exists(_.getString(0) == "sddldb"),
      "the lake namespace must list bare and under the graft catalog")

    import s.implicits._
    (createLines.map(("create", _)) ++
      props.toSeq.map(r =>
        ("props", s"${r.getString(0)}=${r.getString(1)}")) ++
      views.toSeq.map(r => ("views", r.getString(1))) ++
      Seq(("namespaces", "sddldb")))
      .toDF("stmt", "item").orderBy("stmt", "item")
  }

  /** Iceberg's stored-procedure surface ([[LakeCallSql]], round 16):
    * `CALL graft.system.proc(...)` with named or positional
    * arguments, mapped onto the same lowered commands as the
    * statement forms — so Iceberg-style maintenance scripts port
    * verbatim. The scenario drives rollback_to_snapshot (undoing a
    * bad append), a sort-ordered rewrite_data_files,
    * rewrite_manifests, expire_snapshots(retain_last),
    * remove_orphan_files, and create_changelog_view (require()d to
    * net the whole table as inserts); the refusal matrix (unknown
    * procedure, composed expire args, descending sort qualifiers)
    * is spec-pinned. End state = the full orders table, oracled. */
  private val callProcs: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_call"),
      orders.filter(col("o_orderkey") % 2 === 0))                  // 1
    LakeRegistry.register("calldb.orders_c", t)
    t.append(orders.filter(col("o_orderkey") % 2 === 1))           // 2
    t.append(orders.filter(col("o_orderkey") % 2 === 0))          // 3 bad
    s.sql("CALL graft.system.rollback_to_snapshot('calldb.orders_c', 2)")
    require(t.read().count() == orders.count(),
      "rollback_to_snapshot must undo the bad append")
    s.sql("CALL graft.system.rewrite_data_files(" +
      "table => 'calldb.orders_c', strategy => 'sort', " +
      "sort_order => 'o_orderkey ASC')")
    s.sql("CALL graft.system.rewrite_manifests('calldb.orders_c')")
    s.sql("CALL graft.system.expire_snapshots(" +
      "table => 'calldb.orders_c', retain_last => 2)")
    s.sql("CALL graft.system.remove_orphan_files(" +
      "table => 'calldb.orders_c')")
    s.sql("CALL graft.system.create_changelog_view(" +
      "table => 'calldb.orders_c', changelog_view => 'call_chg')")
    require(s.table("call_chg")
        .filter(col("_change_type") === "insert").count() ==
      orders.count(),
      "the changelog view must net the whole table as inserts")
    // ---- adoption procedures (round 18): register_table / migrate /
    // snapshot / ancestors_of — Iceberg's runbook entry points for
    // bringing existing storage under the catalog ----
    LakeRegistry.unregister("calldb.orders_r")
    s.sql("CALL graft.system.register_table(" +
      s"table => 'calldb.orders_r', location => '${t.location}')")
    require(s.sql("SELECT count(*) FROM calldb.orders_r")
        .head.getLong(0) == orders.count(),
      "register_table must adopt the existing root metadata-only")
    // refusal matrix: an existing name refuses; an empty root refuses
    require(
      try { s.sql("CALL graft.system.register_table(" +
        s"table => 'calldb.orders_r', location => '${t.location}')")
        false }
      catch { case e: Exception =>
        e.getMessage.contains("already exists") },
      "register_table on an existing name must refuse")
    require(
      try { LakeRegistry.unregister("calldb.orders_x")
        s.sql("CALL graft.system.register_table(" +
          s"table => 'calldb.orders_x', location => '${tmp("lake_call_e")}')")
        false }
      catch { case e: Exception =>
        e.getMessage.contains("nothing to register") },
      "register_table on an empty root must refuse")
    // migrate: plain parquet adopted IN PLACE under a fresh managed
    // table — zero bytes copied (the add_files contract). Fresh names
    // per run: both procedures CREATE at the name-derived managed
    // root, so a bench rep reusing the name would collide on disk.
    val runId = java.util.UUID.randomUUID.toString
      .replace("-", "").take(8)
    val rawDir = tmp("lake_call_raw")
    orders.filter(col("o_orderkey") % 5 === 0).write
      .mode("overwrite").parquet(rawDir)
    s.sql("CALL graft.system.migrate(" +
      s"table => 'calldb.orders_m_$runId', source_dir => '$rawDir')")
    val m = LakeRegistry.get(s"calldb.orders_m_$runId").get
    require(s.sql(s"SELECT count(*) FROM calldb.orders_m_$runId")
        .head.getLong(0) ==
        orders.filter(col("o_orderkey") % 5 === 0).count() &&
      m.currentSnapshot.files.forall(_.contains(rawDir)),
      "migrate must adopt the source parquet in place, zero copy")
    // snapshot: the zero-copy clone through the procedure surface
    s.sql("CALL graft.system.snapshot(" +
      "source_table => 'calldb.orders_c', " +
      s"table => 'calldb.orders_s_$runId')")
    require(LakeRegistry.get(s"calldb.orders_s_$runId").get
        .currentSnapshot.files == t.currentSnapshot.files,
      "snapshot must reference the source's files (zero copy)")
    // ancestors_of: the head's parent chain from cached headers —
    // newest first, ending at the oldest RETAINED snapshot
    val anc = s.sql("CALL graft.system.ancestors_of('calldb.orders_c')")
      .collect().map(_.getLong(0)).toSeq
    require(anc.head == t.currentSnapshotId &&
        anc == anc.sorted.reverse && anc.size >= 2,
      s"ancestors_of must walk the parent chain newest-first: $anc")
    // publish_changes: the WAP publish through the procedure surface
    // — stage on the SNAPSHOT clone (so this table's oracle state is
    // untouched), audit, publish by wap id; a spent id refuses
    val sTbl = LakeRegistry.get(s"calldb.orders_s_$runId").get
    val preS = sTbl.read().count()
    val wapId = sTbl.stageAppend(
      orders.filter(col("o_orderkey") % 7 === 0))
    require(sTbl.read().count() == preS,
      "staged rows must stay invisible before publish")
    s.sql("CALL graft.system.publish_changes(" +
      s"table => 'calldb.orders_s_$runId', wap_id => '$wapId')")
    require(sTbl.read().count() ==
        preS + orders.filter(col("o_orderkey") % 7 === 0).count(),
      "publish_changes must land the staged batch")
    require(
      try { s.sql("CALL graft.system.publish_changes(" +
        s"table => 'calldb.orders_s_$runId', wap_id => '$wapId')")
        false }
      catch { case e: Exception =>
        e.getMessage.contains("no staged commit") },
      "a spent wap id must refuse loudly")
    // ---- add_files (round 19): zero-copy import into the EXISTING
    // migrated table — the runbook step Iceberg migration scripts
    // call constantly (migrate above is the fresh-adoption form) ----
    val rawDir2 = tmp("lake_call_raw2")
    orders.filter(col("o_orderkey") % 5 === 1).write
      .mode("overwrite").parquet(rawDir2)
    val preM = m.read().count()
    s.sql("CALL graft.system.add_files(" +
      s"table => 'calldb.orders_m_$runId', source_dir => '$rawDir2')")
    require(m.read().count() == preM +
        orders.filter(col("o_orderkey") % 5 === 1).count() &&
      m.currentSnapshot.files.exists(_.contains(rawDir2)) &&
      m.currentSnapshot.files.exists(_.contains(rawDir)),
      "add_files must adopt the second directory in place, zero copy")
    // refusal matrix: a missing directory; schema drift (narrower
    // type in the source footers)
    require(
      try { s.sql("CALL graft.system.add_files(" +
        s"table => 'calldb.orders_m_$runId', " +
        s"source_dir => '${rawDir2}_nope')"); false }
      catch { case e: Exception =>
        e.getMessage.contains("no such directory") },
      "add_files on a missing source_dir must refuse")
    val driftDir = tmp("lake_call_drift")
    orders.select(col("o_orderkey").cast("int").as("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice")).limit(5).write
      .mode("overwrite").parquet(driftDir)
    require(
      try { s.sql("CALL graft.system.add_files(" +
        s"table => 'calldb.orders_m_$runId', " +
        s"source_dir => '$driftDir')"); false }
      catch { case e: Exception =>
        e.getMessage.contains("source files") },
      "add_files with drifted source schema must refuse")
    // compute_table_stats: the Iceberg stats procedure — same
    // snapshot-scoped sidecar as ANALYZE; default = every scalar col
    s.sql("CALL graft.system.compute_table_stats(" +
      s"table => 'calldb.orders_m_$runId')")
    require(m.tableStats.exists(st => st.rows == m.read().count() &&
        st.cols.keySet.map(_.toLowerCase).contains("o_orderkey")),
      "compute_table_stats must persist head-snapshot stats")
    t.read().orderBy("o_orderkey")
  }

  /** Three-part `cat.db.t` addressing (round 16): the reference's
    * consumer addresses EVERYTHING through its configured catalog
    * name — reads AND writes (`dev.consumer_db.rl_patients`,
    * consumer_emr_on_eks_setup.sh:407-412). The configured graft
    * catalog (`spark.graft.catalog`, default "graft") strips as an
    * addressing prefix everywhere the lake SQL front-end claims
    * names — CREATE/CTAS, INSERT, UPDATE, MERGE, DELETE (with
    * `cat.db.t.c` fully-qualified column references), OPTIMIZE /
    * VACUUM maintenance, DESCRIBE, reads, time travel — and
    * `cat.db.t` / `db.t` address ONE table interchangeably
    * (require()d by writing through one form and reading through the
    * other). Governed names keep precedence: a 3-part name whose
    * full dotted form is governed is never claimed (FgacSpec pins
    * it). Metadata-only — the catalog segment is an alias, not a
    * directory level, so nothing changes at any scale. */
  private val catalogDdl: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("lake_cat_src")
    LakeRegistry.unregister("lake_cat_db.patients")
    LakeRegistry.unregister("lake_cat_db.claims")
    s.sql(
      s"""CREATE TABLE graft.lake_cat_db.patients (
         |  c_custkey BIGINT, c_name STRING, c_nationkey INT,
         |  c_acctbal DOUBLE, c_mktsegment STRING)
         |USING graft PARTITIONED BY (c_mktsegment)
         |LOCATION '${tmp("lake_cat_p")}'""".stripMargin)
    s.sql("INSERT INTO graft.lake_cat_db.patients " +
      "SELECT * FROM lake_cat_src")
    require(s.sql("SELECT * FROM lake_cat_db.patients").count() ==
      s.sql("SELECT * FROM graft.lake_cat_db.patients").count(),
      "the 2-part and 3-part forms must address the same table")
    s.sql(
      """UPDATE graft.lake_cat_db.patients
        |SET c_acctbal = c_acctbal + 100.0
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    s.sql(
      s"""CREATE TABLE graft.lake_cat_db.claims USING graft
         |LOCATION '${tmp("lake_cat_c")}'
         |AS SELECT c_custkey, c_acctbal FROM graft.lake_cat_db.patients
         |WHERE c_acctbal > 5000""".stripMargin)
    s.sql(
      """MERGE INTO graft.lake_cat_db.patients p
        |USING graft.lake_cat_db.claims c ON p.c_custkey = c.c_custkey
        |WHEN MATCHED THEN UPDATE SET c_mktsegment = 'RICH'""".stripMargin)
    // a fully-qualified catalog.db.t.c column reference strips whole
    s.sql(
      """DELETE FROM graft.lake_cat_db.patients
        |WHERE graft.lake_cat_db.patients.c_acctbal < 0""".stripMargin)
    s.sql("OPTIMIZE graft.lake_cat_db.patients")
    s.sql("VACUUM graft.lake_cat_db.patients RETAIN 5 SNAPSHOTS")
    require(s.sql("DESCRIBE TABLE graft.lake_cat_db.patients").collect()
      .exists(r => r.getString(0) == "c_custkey" &&
        r.getString(1) == "bigint"),
      "DESCRIBE must answer through the catalog-qualified name")
    require(s.sql(
        "SELECT * FROM graft.lake_cat_db.patients VERSION AS OF 2")
      .count() > 0,
      "time travel must resolve through the catalog-qualified name")
    s.sql(
      """SELECT p.c_custkey, p.c_name, p.c_mktsegment, p.c_acctbal
        |FROM graft.lake_cat_db.patients p
        |ORDER BY p.c_custkey""".stripMargin)
  }

  /** `ALTER TABLE … RENAME TO …` — the metadata-only registry re-key
    * (r16 verdict item 2): create → append → CROSS-NAMESPACE rename →
    * the old name goes cold, the new name reads the SAME table —
    * history intact, time travel ACROSS the rename resolves, SHOW
    * CREATE TABLE reflects the new name — then DML through the new
    * name and a second, catalog-qualified (3-part) rename. Zero data
    * movement at any table size: a rename never touches a data file
    * or the manifest (Iceberg's rename contract — the location stays;
    * only the catalog entry moves). The refusal matrix (governed
    * source/target, existing target, views) is spec-pinned in
    * LakehouseSpec. */
  private val rename: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
    LakeRegistry.unregister("lake_rn_orders")
    LakeRegistry.unregister("lake_rn_db.accounts")
    LakeRegistry.unregister("lake_rn_db.accounts_final")
    val t = GraftTable.create(s, tmp("lake_rn"),
      customer.filter(col("c_custkey") % 2 === 0))        // snap 1
    t.append(customer.filter(col("c_custkey") % 2 === 1)) // snap 2
    LakeRegistry.register("lake_rn_orders", t)
    s.sql("ALTER TABLE lake_rn_orders RENAME TO lake_rn_db.accounts")
    // the old name is COLD everywhere after the rename
    val oldCold =
      try { s.sql("SELECT * FROM lake_rn_orders").collect(); false }
      catch { case _: org.apache.spark.sql.AnalysisException => true }
    require(oldCold && LakeRegistry.get("lake_rn_orders").isEmpty,
      "the old name must stop resolving after a rename")
    // the new name reads the SAME table, history intact
    require(s.sql("SELECT count(*) FROM lake_rn_db.accounts")
        .head.getLong(0) == customer.count(),
      "the new name must read the whole table")
    // time travel ACROSS the rename: snapshot 1 predates the new name
    require(s.sql(
        "SELECT count(*) FROM lake_rn_db.accounts VERSION AS OF 1")
        .head.getLong(0) ==
        customer.filter(col("c_custkey") % 2 === 0).count(),
      "time travel across the rename must resolve")
    require(s.sql("SHOW CREATE TABLE lake_rn_db.accounts")
        .head.getString(0)
        .contains("CREATE TABLE lake_rn_db.accounts"),
      "SHOW CREATE TABLE must reflect the new name")
    // DML through the new name lands on the same storage
    s.sql("UPDATE lake_rn_db.accounts SET c_acctbal = c_acctbal + 50.0 " +
      "WHERE c_mktsegment = 'BUILDING'")
    // the catalog-qualified 3-part form renames too (the consumer's
    // `dev.db.t` addressing shape)
    s.sql("ALTER TABLE graft.lake_rn_db.accounts RENAME TO " +
      "graft.lake_rn_db.accounts_final")
    s.sql(
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM lake_rn_db.accounts_final
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Bad write then rollback: current state equals snapshot 1, and
    * the rolled-back commit stays in history for inspection. */
  private val rollback: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_rb"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.append(orders.filter(col("o_orderkey") % 2 === 1)) // the "bad" write
    // SQL surface: Delta's RESTORE / Iceberg's rollback_to_snapshot
    LakeRegistry.register("lake_rb_t", t)
    s.sql("RESTORE TABLE lake_rb_t TO VERSION AS OF 1")
    require(t.currentSnapshotId == 3 && t.readAt(2).count() > t.read().count(),
      "rollback must preserve history as a new commit")
    // ...and restore-to-ref: roll FORWARD to a tag on the undone head
    t.createTag("predrop", 2)
    s.sql("RESTORE TABLE lake_rb_t TO VERSION AS OF 'predrop'")
    require(t.read().count() == t.readAt(2).count(),
      "restore to a tag must land on the tagged snapshot")
    s.sql("RESTORE TABLE lake_rb_t TO VERSION AS OF 1")
    t.read().orderBy("o_orderkey")
  }

  /** Partition-scoped compaction (`OPTIMIZE t WHERE …` — Delta's
    * filtered OPTIMIZE, Iceberg's rewrite_data_files with a row
    * filter): three appends fragment every o_orderstatus partition,
    * then the scoped OPTIMIZE compacts ONLY the 'F' partition —
    * require()d: every non-F file carries by reference untouched,
    * the F files rewrite into fewer, and the data is byte-identical
    * (the oracle). At 100 TB this is THE maintenance economics:
    * compacting yesterday's partition costs yesterday's bytes, and
    * the candidate set comes from manifest pruning (partition values
    * ∧ column stats), never a storage listing or a data scan. */
  private val compactWhere: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cw"),
      orders.filter(col("o_orderkey") % 3 === 0),
      partitionBy = Seq("o_orderstatus"))
    (1 to 2).foreach(i =>
      t.append(orders.filter(col("o_orderkey") % 3 === i)))
    LakeRegistry.register("lake_cw_t", t)
    val snap = t.currentSnapshot
    def fPart(f: String) = f.contains("o_orderstatus=F")
    val (fBefore, otherBefore) = snap.files.partition(fPart)
    require(fBefore.size >= 3, "the F partition must be fragmented")
    s.sql("OPTIMIZE lake_cw_t WHERE o_orderstatus = 'F'")
    val after = t.currentSnapshot.files
    val (fAfter, otherAfter) = after.partition(fPart)
    require(otherAfter.toSet == otherBefore.toSet,
      "scoped compaction must carry every non-matching file untouched")
    require(fAfter.size < fBefore.size &&
      fAfter.toSet.intersect(fBefore.toSet).isEmpty,
      "the matching partition must rewrite into fewer, fresh files")
    t.read().orderBy("o_orderkey")
  }

  /** Cherry-pick (Iceberg's `cherrypick_snapshot` procedure) — the
    * rollback-recovery scenario: a BAD append lands between good
    * commits, the rollback that removes it also drops the good
    * append that followed, and `ALTER TABLE … CHERRYPICK SNAPSHOT n`
    * re-applies exactly the good snapshot's files by reference
    * (metadata-only; require()d: the bad rows stay gone, the good
    * rows return, no data file is written twice). Refusal matrix in
    * LakehouseSpec: non-append snapshots, double application, schema
    * drift. */
  private val cherryPick: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_cpick"),
      orders.filter(col("o_orderkey") % 3 === 0))        // snap 1
    t.append(orders.filter(col("o_orderkey") % 3 === 1)  // snap 2: BAD
      .withColumn("o_totalprice", col("o_totalprice") * -1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2)) // snap 3: good
    val goodFiles = t.currentSnapshot.files.toSet
    LakeRegistry.register("lake_cpick_t", t)
    s.sql("RESTORE TABLE lake_cpick_t TO VERSION AS OF 1")
    require(t.read().count() ==
      orders.filter(col("o_orderkey") % 3 === 0).count(),
      "rollback must drop both appends")
    s.sql("ALTER TABLE lake_cpick_t CHERRYPICK SNAPSHOT 3")
    require(t.currentSnapshot.files.toSet.subsetOf(goodFiles),
      "cherry-pick must re-apply by reference, never rewrite")
    require(s.sql(
        "SELECT count(*) FROM lake_cpick_t WHERE o_totalprice < 0")
      .head.getLong(0) == 0L, "the bad append must stay gone")
    t.read().orderBy("o_orderkey")
  }

  /** Three snapshots, expire to the latest: data intact, history and
    * orphaned files physically gone. */
  private val expire: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_exp"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.delete("o_orderkey % 3 = 0")
    t.expireSnapshots(keepLast = 1)
    require(t.snapshots.map(_.id) == Seq(3L), "history must be expired")
    t.read().orderBy("o_orderkey")
  }

  /** Age-based snapshot expiry (Iceberg's `expire_snapshots(
    * older_than => ts)`; SQL `VACUUM t OLDER THAN INTERVAL …`) — the
    * form production retention policy actually takes (hours/days,
    * not snapshot counts). Scenario: four commits with strictly
    * separated wall-clock timestamps, a tag pinning snap 2; expiry
    * at snap 3's commit instant drops snap 1 (older, unpinned),
    * KEEPS snap 2 (older but tag-pinned — refs protect their
    * snapshots from age exactly as from counts), and keeps 3/4.
    * Time travel to the expired snapshot refuses; the tag still
    * reads. The SQL interval form then proves the safety direction:
    * a 1-hour retention window expires nothing committed seconds
    * ago. Deterministic content: the API takes an ABSOLUTE cutoff
    * read from the manifest's recorded commit ts, so which snapshots
    * expire never depends on the run's wall clock. */
  private val expireAge: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_expage"),
      orders.filter(col("o_orderkey") % 4 === 0))            // snap 1
    Thread.sleep(3) // separate commit timestamps (ms clock)
    t.append(orders.filter(col("o_orderkey") % 4 === 1))     // snap 2
    t.createTag("audit", 2)
    Thread.sleep(3)
    t.append(orders.filter(col("o_orderkey") % 4 === 2))     // snap 3
    Thread.sleep(3)
    t.append(orders.filter(col("o_orderkey") % 4 === 3))     // snap 4
    val taggedRows = t.readAt(2).count()
    t.expireSnapshotsOlderThan(t.snapshot(3).ts)
    require(t.snapshots.map(_.id) == Seq(2L, 3L, 4L),
      "age expiry must drop snap 1, keep the tag-pinned snap 2, " +
        "the at-cutoff snap 3, and the head")
    require(t.readAt(t.refs("audit")._2).count() == taggedRows,
      "a tag must still time-travel after age-based expiry")
    require(scala.util.Try(t.readAt(1).count()).isFailure,
      "the expired snapshot must refuse time travel")
    // SQL surface: a 1-hour retention window is a no-op on
    // seconds-old commits (the guard that makes scheduled VACUUM safe)
    LakeRegistry.register("lake_expage_t", t)
    s.sql("VACUUM lake_expage_t OLDER THAN INTERVAL 1 HOURS")
    require(t.snapshots.map(_.id) == Seq(2L, 3L, 4L),
      "an interval retention window must not expire recent snapshots")
    t.read().orderBy("o_orderkey")
  }

  /** COMPOSED retention (round 19, r18 verdict item 7 — Iceberg's
    * `expire_snapshots(older_than => ts, retain_last => n)` with
    * BOTH arguments): keep max(n newest, everything younger than
    * the cutoff) — the shape production policy actually states
    * ("30 days, but never fewer than 2 snapshots"). Scenario: five
    * commits, a tag pinning snap 2; a composed CALL with a cutoff
    * beyond every commit and retain_last=2 keeps exactly the newest
    * two PLUS the tag-pinned snapshot (refs protect from the
    * composed form exactly as from each single form); the tag still
    * time-travels, the expired snapshots refuse; a second composed
    * CALL with a PAST cutoff expires nothing however small the
    * floor (the older_than clause gates). Metadata-only here (every
    * expired snapshot's files are carried by the head), so the end
    * state is the intact table — oracled. */
  private val expireComposedQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_expcomp"),
      orders.filter(col("o_orderkey") % 5 === 0))            // snap 1
    for (i <- 1 to 4)                                        // 2..5
      t.append(orders.filter(col("o_orderkey") % 5 === i))
    LakeRegistry.register("lake_expcomp_t", t)
    s.sql("ALTER TABLE lake_expcomp_t CREATE TAG keep AS OF VERSION 2")
    val taggedRows = t.readAt(2).count()
    s.sql("CALL graft.system.expire_snapshots(" +
      "table => 'lake_expcomp_t', " +
      "older_than => TIMESTAMP '2099-01-01', retain_last => 2)")
    require(t.snapshots.map(_.id) == Seq(2L, 4L, 5L),
      "composed expiry must keep the newest 2 + the tag-pinned snap: " +
        t.snapshots.map(_.id).mkString(","))
    require(s.sql(
        "SELECT count(*) FROM lake_expcomp_t VERSION AS OF 'keep'")
        .head.getLong(0) == taggedRows,
      "the tag must still time-travel after composed expiry")
    require(scala.util.Try(t.readAt(3).count()).isFailure,
      "an expired snapshot must refuse time travel")
    // the older_than clause GATES: a past cutoff expires nothing
    s.sql("CALL graft.system.expire_snapshots(" +
      "table => 'lake_expcomp_t', " +
      "older_than => TIMESTAMP '2020-01-01', retain_last => 1)")
    require(t.snapshots.map(_.id) == Seq(2L, 4L, 5L),
      "a past cutoff must compose to a no-op")
    t.read().orderBy("o_orderkey")
  }

  /** ROW LINEAGE (Iceberg v3 `_row_id` /
    * `_last_updated_sequence_number`): every row gets a unique,
    * immutable id at its first commit and a last-modified sequence —
    * what changelog consumers and incremental ML-feature jobs key
    * on. Derivation is Iceberg's inheritance model (file
    * first_row_id + position unless a rewrite materialized the id),
    * so appends pay zero extra bytes and nothing ever computes a
    * global ordering. The scripted scenario drives every lineage
    * law in-query: UPDATE preserves ids and bumps exactly the
    * matched rows' sequence, DELETE leaves survivors' lineage
    * untouched (even survivors sharing a rewritten file),
    * compaction relocates every row without changing either value,
    * ids stay unique. The oracle recomputes the per-sequence row
    * cohorts from the DML script — which keys were last touched by
    * which statement is pure content, so the (seq → count, key-sum)
    * matrix is exact; raw id VALUES are file-layout-dependent and
    * stay in-query. */
  private val rowLineage: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
    val t = GraftTable.createEmpty(s, tmp("lake_rowlin"),
      orders.schema)                                         // snap 1
    t.setProperties(Map(GraftTable.RowLineageProp -> "true"))
    t.append(orders.filter(col("o_orderkey") % 3 === 0))     // snap 2
    t.append(orders.filter(col("o_orderkey") % 3 === 1))     // snap 3
    val preIds = t.readLineage()
      .select(col("o_orderkey").as("k0"), col("_row_id").as("r0"))
    LakeRegistry.register("lake_rowlin_t", t)
    s.sql("UPDATE lake_rowlin_t SET price = price * 2 " +
      "WHERE o_orderstatus = 'F'")                           // snap 4
    val after = t.readLineage()
    // ONE pass for all three probes (guide §1.4): the left join keeps
    // every `after` row exactly once (keys unique), an unmatched row's
    // null r0 makes `=!=` null which count(when) skips — exactly the
    // inner-join-filter-count semantics — and the two cohort counts
    // ride the same aggregate instead of two more scans
    val seq4 = after.join(preIds, col("o_orderkey") === col("k0"), "left")
      .agg(count(when(col("_row_id") =!= col("r0"), 1)),
        count(when(col("_last_updated_sequence_number") === 4L, 1)),
        count(when(col("o_orderstatus") === "F", 1))).head()
    require(seq4.getLong(0) == 0,
      "UPDATE must preserve every row's _row_id")
    require(seq4.getLong(1) == seq4.getLong(2),
      "exactly the matched rows carry the UPDATE's sequence")
    s.sql("DELETE FROM lake_rowlin_t WHERE o_orderkey % 30 = 0") // snap 5
    // the snap-5 probe frame is CONSTRUCTED here (it must observe the
    // post-DELETE state) but its action is DEFERRED into the one-pass
    // post-MERGE probe below — the files it plans over are immutable,
    // so executing it after snap 6 reads the same bytes (round 20,
    // guide §1.4: one action per epoch, not per probe)
    val del5 = t.readLineage()
      .filter(col("_last_updated_sequence_number") === 5L)
    // MERGE preserves lineage too: matched rows keep ids and take
    // the merge's sequence, inserts (including re-inserts of deleted
    // keys) mint fresh ids
    val preMerge = t.readLineage()
      .select(col("o_orderkey").as("mk"), col("_row_id").as("mr"))
    orders.filter(col("o_orderkey") % 7 === 0)
      .createOrReplaceTempView("lake_rowlin_src")
    s.sql("""MERGE INTO lake_rowlin_t USING lake_rowlin_src s
            |ON lake_rowlin_t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)   // snap 6
    val seq6 = t.readLineage()
      .join(preMerge, col("o_orderkey") === col("mk"))
      .agg(count(when(col("_row_id") =!= col("mr"), 1)).as("mergeBad"))
      .crossJoin(del5.agg(count(lit(1)).as("del5N")))
      .head
    require(seq6.getLong(1) == 0,
      "DELETE must not bump surviving rows' last-updated sequence")
    require(seq6.getLong(0) == 0,
      "MERGE must preserve every matched/carried row's _row_id")
    val pre = t.readLineage().select("o_orderkey", "_row_id",
      "_last_updated_sequence_number")
    t.compact(2)                                             // snap 7
    val post = t.readLineage().select("o_orderkey", "_row_id",
      "_last_updated_sequence_number")
    // the sameMultiset tag/group pass (guide §2.4) INLINED so the
    // id-uniqueness probe rides the same action (3 actions → 1); the
    // frames are cheap to re-plan, so NO localCheckpoint — measured
    // in r19: materialization cost more than the recompute it saved
    // on these manifest-planned small scans
    val cols = pre.columns.toSeq
    val seq7 = pre.withColumn("_cnt", lit(1L))
      .unionByName(post.withColumn("_cnt", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("_cnt")).as("_net"))
      .filter(col("_net") =!= 0L)
      .agg(count(lit(1)).as("nDiff"))
      .crossJoin(post.agg(countDistinct(col("_row_id")).as("uIds"),
        count(lit(1)).as("nRows")))
      .head
    require(seq7.getLong(0) == 0,
      "compaction must relocate rows with lineage bit-unchanged")
    require(seq7.getLong(1) == seq7.getLong(2),
      "row ids must be unique")
    // POSITION-TOMBSTONE MoR DML composes (Iceberg v3 pairs lineage
    // with both delete shapes): flip the write modes and keep going —
    // the tombstone DELETE removes rows without rewriting a data
    // file, the tombstone UPDATE keeps ids and bumps exactly the
    // matched rows, and reads serve through the tombstone anti-join
    t.setProperties(Map(GraftTable.RowLineageProp -> "true",
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    val preP = t.readLineage()
      .select(col("o_orderkey").as("pk"), col("_row_id").as("pr"))
    val filesP = t.currentSnapshot.files
    s.sql("DELETE FROM lake_rowlin_t WHERE o_orderkey % 50 = 3") // 8
    s.sql("UPDATE lake_rowlin_t SET price = price + 5 " +
      "WHERE o_orderstatus = 'P'")                             // snap 9
    require(t.currentSnapshot.posDels.nonEmpty &&
      t.currentSnapshot.files.toSet.intersect(filesP.toSet)
        == filesP.toSet,
      "position DML must tombstone, never rewrite existing files")
    val afterP = t.readLineage()
    // same one-pass consolidation as the seq-4 probe above
    val seq9 = afterP.join(preP, col("o_orderkey") === col("pk"), "left")
      .agg(count(when(col("_row_id") =!= col("pr"), 1)),
        count(when(col("_last_updated_sequence_number") === 9L, 1)),
        count(when(col("o_orderstatus") === "P", 1))).head()
    require(seq9.getLong(0) == 0,
      "position-MoR DML must preserve every surviving row's _row_id")
    require(seq9.getLong(1) == seq9.getLong(2),
      "exactly the tombstone-UPDATE's rows carry its sequence")
    // final read through the SQL surface (lake_lineage TVF), so the
    // metadata columns are reachable without the Scala API
    s.sql("""SELECT _last_updated_sequence_number AS last_seq,
            |  count(*) AS n_rows, sum(o_orderkey) AS key_sum
            |FROM lake_lineage('lake_rowlin_t')
            |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** ROW-ID-KEYED change feed (`lake_cdc_lineage` — what Iceberg v3
    * row lineage is FOR): the plain changelog emits an UPDATE as a
    * content-matched delete+insert pair, which mis-pairs the moment
    * one logical row is rewritten twice in the range; the lineage
    * feed joins the endpoint diffs on `_row_id`, so a row updated
    * at TWO separate commits still nets to ONE `update` carrying
    * the final image, deletes carry the range-start old image, and
    * rewrite ride-alongs drop because their last-updated sequence
    * never moved. One 8-byte-key join over O(changed files) rows.
    * The scenario stacks UPDATE, DELETE, and a second overlapping
    * UPDATE; once-only emission is require()d in-query. */
  private val cdcLineage: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
    val t = GraftTable.createEmpty(s, tmp("lake_cdclin"),
      orders.schema)                                         // snap 1
    t.setProperties(Map(GraftTable.RowLineageProp -> "true"))
    t.append(orders.filter(col("o_orderkey") % 3 === 0))     // snap 2
    t.append(orders.filter(col("o_orderkey") % 3 === 1))     // snap 3
    LakeRegistry.register("lake_cdclin_t", t)
    s.sql("UPDATE lake_cdclin_t SET price = price * 2 " +
      "WHERE o_orderstatus = 'F'")                           // snap 4
    s.sql("DELETE FROM lake_cdclin_t WHERE o_orderkey % 30 = 0") // 5
    s.sql("UPDATE lake_cdclin_t SET price = price + 1 " +
      "WHERE o_orderstatus = 'O'")                           // snap 6
    // position-style MoR joins the same range (Iceberg v3 pairs
    // lineage with both delete shapes): the tombstone set diff feeds
    // the id-keyed netting — deletes of carried rows probe only the
    // named positions, rows COW-rewritten earlier in the range net
    // through the file diff as before
    t.setProperties(Map(GraftTable.RowLineageProp -> "true",
      "write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    s.sql("DELETE FROM lake_cdclin_t WHERE o_orderkey % 12 = 6") // 7
    require(t.currentSnapshot.posDels.nonEmpty,
      "the range must actually end on a tombstone-bearing snapshot")
    // SQL surface: the TVF form of the lineage feed
    // the feed backs TWO actions (the once-only probe and the final
    // projection); checkpoint so the endpoint diff runs once (§5)
    val feed = s.sql(
      "SELECT * FROM table_changes_lineage('lake_cdclin_t', 3, 7)")
      .localCheckpoint()
    require(feed.groupBy("_row_id").count()
      .filter(col("count") > 1).count() == 0,
      "each logical row nets to at most ONE changelog row")
    feed.select(col("o_orderkey"), col("price"), col("_change_type"))
      .orderBy("o_orderkey")
  }

  /** EQUALITY deletes through the ROW-ID-KEYED feed
    * (`lake_cdc_eqdel_lineage` — the r17 plain-feed expansion carried
    * onto `table_changes_lineage`): the lineage feed refused
    * eq-delete endpoints until round 18, which wedged any
    * `write.delete.style=equality` table's lineage CDC permanently
    * (endpoints are immutable; compact() creates NEW snapshots but
    * cannot fix a checkpointed stream's pending range). Equality
    * predicates can only postdate enablement through a lineage-off
    * window (the MoR guard refuses them while lineage is on,
    * Iceberg v3's contract) — first-row-ids are CARRIED across the
    * window, so the keyed netting stays sound. The scenario drives
    * the eq-delete commit through a per-commit replay (keyed deletes,
    * one per scoped F row), a MERGE-ON-READ UPDATE over the pending
    * predicate (its tombstone diff and new-image files net through
    * the keyed join while the predicate-diff leg handles the carried
    * files, the rid anti-join keeping each side duplicate-free), and
    * a rollback ACROSS the delete commit
    * (gonePred restores: the SAME rids the delete batch carried,
    * require()d in-query — the id-preservation law). */
  private val cdcEqDelLineage: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
    def third(m: Long) = orders.filter(col("o_orderkey") % 3 === m)
    val morEq = Map(
      "write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "equality",
      "write.update.mode" -> "merge-on-read")
    val t = GraftTable.createEmpty(s, tmp("lake_cdceql"),
      orders.schema)                                         // snap 1
    t.setProperties(morEq + (GraftTable.RowLineageProp -> "true"))
    t.append(third(0))                     // snap 2 (first-row-ids)
    LakeRegistry.register("lake_cdceql_t", t)
    // the lineage-off window: the only way an equality predicate can
    // POSTDATE enablement (deleteMoR refuses while lineage is on);
    // ids persist across it — firstRowIds carry by reference
    // regardless of the flag
    t.setProperties(morEq + (GraftTable.RowLineageProp -> "false"))
    s.sql("DELETE FROM lake_cdceql_t WHERE o_orderstatus = 'F'") // 3
    val snap3 = t.currentSnapshot
    require(snap3.dels.nonEmpty && snap3.posDels.isEmpty &&
        snap3.files.toSet == t.snapshot(2).files.toSet,
      "the DELETE must commit an equality predicate: no rewrite, " +
        "no tombstone")
    t.setProperties(morEq + (GraftTable.RowLineageProp -> "true"))
    t.append(third(1))                                       // snap 4
    s.sql("UPDATE lake_cdceql_t SET price = price * 2 " +
      "WHERE o_orderkey % 30 = 3")                       // snap 5, MoR
    // per-commit replay of the eq-delete commit: keyed deletes only,
    // exactly the scoped F rows, each with a concrete row id
    // checkpoint: FIVE downstream actions (four probe legs + the
    // rid multiset compare) would otherwise re-run the full
    // two-endpoint lineage diff each (guide §5)
    val delBatch = s.sql(
      "SELECT * FROM table_changes_lineage('lake_cdceql_t', 2, 3)")
      .localCheckpoint()
    val expectDel = third(0).filter(col("o_orderstatus") === "F").count()
    require(delBatch.filter(col("_change_type") =!= "delete").count() == 0
        && delBatch.count() == expectDel
        && delBatch.filter(col("_row_id").isNull).count() == 0
        && delBatch.select("_row_id").distinct().count() == expectDel,
      "the eq-delete commit's range must emit exactly the scoped F " +
        "rows as keyed deletes")
    val delRids = delBatch.select("_row_id")
    // rollback ACROSS the delete commit: the removed predicate
    // restores its rows as keyed inserts carrying the SAME rids the
    // delete batch did (id preservation), alongside the batch-2
    // removal deletes and the update reversal
    t.rollback(2)                                            // snap 6
    val restores = s.sql(
      "SELECT * FROM table_changes_lineage('lake_cdceql_t', 5, 6)")
      .filter(col("_change_type") === "insert" &&
        col("o_orderstatus") === "F")
    require(graft.Registry.sameMultiset(
        restores.select("_row_id"), delRids),
      "rollback across the equality delete must restore exactly the " +
        "rids the delete batch emitted")
    t.rollback(5)            // snap 7: back to the pre-rollback head
    val feed = s.sql(
      "SELECT * FROM table_changes_lineage('lake_cdceql_t', 2, 5)")
      .localCheckpoint()
    require(feed.groupBy("_row_id").count()
      .filter(col("count") > 1).count() == 0,
      "each logical row nets to at most ONE changelog row")
    feed.select(col("o_orderkey"), col("price"), col("_change_type"))
      .orderBy("o_orderkey")
  }

  /** `CREATE OR REPLACE TABLE … AS SELECT` (Iceberg RTAS) — the
    * scheduled-rebuild idiom: ONE atomic swap commit replaces
    * schema, partition spec, and data (readers see old-or-new,
    * never a gap, unlike DROP+CREATE), while HISTORY SURVIVES —
    * time travel across the replace boundary reads the pre-replace
    * snapshot under its own schema. The swap rides the normal CAS
    * publish; nothing is special-cased. A bare REPLACE TABLE on a
    * missing name refuses (SQL contract: only OR CREATE creates). */
  private val replaceQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_replace"),
      orders.select(col("o_orderkey"), col("o_orderstatus"))
        .filter(col("o_orderkey") % 2 === 0))
    LakeRegistry.register("lake_repl_t", t)
    val preFiles = t.currentSnapshot.files.toSet
    val preRows = t.read().count()
    orders.createOrReplaceTempView("lake_repl_src")
    s.sql("""CREATE OR REPLACE TABLE lake_repl_t USING graft AS
            |SELECT o_orderkey, o_custkey, o_totalprice
            |FROM lake_repl_src WHERE o_orderkey % 2 = 1""".stripMargin)
    val snap = t.currentSnapshot
    require(snap.op == "replace" && snap.id == 2L,
      "RTAS must be ONE commit on the existing table's history")
    require(snap.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice"),
      "RTAS must replace the schema with the query's")
    require(snap.files.forall(f => !preFiles(f)),
      "the replaced file set is entirely the new query's")
    // time travel across the boundary: old snapshot, old schema
    val pre = t.readAt(1)
    require(pre.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus") && pre.count() == preRows,
      "pre-replace snapshot must read unchanged under its own schema")
    require(scala.util.Try(s.sql(
      """REPLACE TABLE lake_repl_missing USING graft AS
        |SELECT 1 AS x""".stripMargin)).isFailure,
      "bare REPLACE TABLE on a missing name must refuse")
    t.read()
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Merge-on-read DELETE (Iceberg's equality-delete path): the
    * delete is an O(1) metadata commit — NO data files are rewritten
    * (require()d below) — and reads anti-filter the scoped files.
    * Sequence rule: rows appended AFTER the delete survive even when
    * they match the predicate. Compaction then materializes: deleted
    * rows drop out of the rewritten files, predicates clear, and the
    * final state is identical before and after — which is what the
    * oracle checks. */
  private val morDelete: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_mor"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    val before = t.currentSnapshot.files
    t.deleteMoR("o_orderstatus = 'F'")
    require(t.currentSnapshot.files == before,
      "merge-on-read delete must not rewrite any data file")
    // appended after the delete: its 'F' rows are out of scope
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val live = t.read().count()
    t.compact(4) // materialize
    require(t.currentSnapshot.dels.isEmpty && t.read().count() == live,
      "compaction must materialize deletes without changing the data")
    t.read().orderBy("o_orderkey")
  }

  /** Position-delete merge-on-read (Iceberg v2's second delete shape,
    * what fine-grained DML emits at scale): DELETEs against a
    * `write.delete.style=position` table land as (file, row index)
    * tombstone parquet — the data file set is require()d unchanged —
    * and reads drop exactly the tombstoned rows through a broadcast
    * anti-join (predicate-free, unlike the equality path which
    * re-evaluates its predicate on every scan). Two successive
    * deletes stack tombstones; a post-delete append is untouched by
    * construction (tombstones name files, not sequences); compaction
    * materializes and clears. DML driven via SQL end to end. */
  private val posDelete: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_pdel"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    LakeRegistry.register("lake_pdel_t", t)
    val before = t.currentSnapshot.files
    s.sql("DELETE FROM lake_pdel_t WHERE o_orderstatus = 'F'")
    s.sql("DELETE FROM lake_pdel_t WHERE o_totalprice < 10000.0")
    require(t.currentSnapshot.files == before,
      "position delete must not rewrite any data file")
    require(t.currentSnapshot.posDels.nonEmpty &&
      t.currentSnapshot.dels.isEmpty,
      "position style must emit tombstone files, not predicates")
    // appended after the deletes: untouched even where it matches
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val live = t.read().count()
    t.compact(4) // materialize
    require(t.currentSnapshot.posDels.isEmpty && t.read().count() == live,
      "compaction must materialize tombstones without changing the data")
    t.read().orderBy("o_orderkey")
  }

  /** Deletion-vector merge-on-read (Iceberg v3 / Delta DVs — the
    * production form of position deletes at high DML rates): DELETEs
    * against a `write.delete.style=vector` table land as ONE bitmap
    * blob per touched data file (bit n set = row n deleted) — the
    * data file set is require()d unchanged — and reads drop rows
    * through an O(1) codegen'd bit probe behind a file-keyed
    * broadcast join: one join row per FILE, not per deleted row, so
    * the read-side artifact stops growing with DML rate (the
    * executed plan is require()d anti-join-free, unlike the
    * tombstone path). A second overlapping DELETE must MERGE bits —
    * pointers move to a fresh blob, at most one vector per file —
    * with superseded blobs' stale bitmaps ignored by pointer
    * currency. A post-delete append is untouched by construction;
    * compaction materializes and clears. DML driven via SQL. */
  private val dvDelete: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_dv"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "vector"))
    LakeRegistry.register("lake_dv_t", t)
    val before = t.currentSnapshot.files
    s.sql("DELETE FROM lake_dv_t WHERE o_orderstatus = 'F'")
    require(t.currentSnapshot.files == before,
      "vector delete must not rewrite any data file")
    val snap1 = t.currentSnapshot
    require(snap1.dvs.nonEmpty && snap1.posDels.isEmpty &&
      snap1.dels.isEmpty,
      "vector style must emit deletion vectors, not tombstones or " +
        "predicates")
    // second, overlapping DELETE: bits MERGE — pointers move to a
    // fresh blob; vectors never stack per file
    s.sql("DELETE FROM lake_dv_t WHERE o_orderkey % 5 = 0")
    val snap2 = t.currentSnapshot
    require(snap1.dvs.exists { case (f, b) =>
        snap2.dvs.get(f).exists(_ != b) },
      "an overlapping vector delete must merge bits by moving the " +
        "file's pointer")
    // appended after the deletes: untouched even where it matches
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    // the vector read is a bit probe behind a file-keyed join — no
    // per-deleted-row anti-join anywhere in the executed plan
    require(!t.read().queryExecution.executedPlan.toString
        .contains("LeftAnti"),
      "deletion-vector read must not plan a position anti-join")
    val live = t.read().count()
    t.compact(4) // materialize
    require(t.currentSnapshot.dvs.isEmpty && t.read().count() == live,
      "compaction must materialize deletion vectors without changing " +
        "the data")
    t.read().orderBy("o_orderkey")
  }

  /** Merge-on-read UPDATE and MERGE via DELETION VECTORS — Iceberg
    * v3 DVs serve every row-level operation, not just DELETE: under
    * `write.delete.style=vector`, an UPDATE's matched old images and
    * a MERGE's matched rows land as per-file bitmap merges (data
    * files require()d to survive both statements; zero tombstone
    * files anywhere), and their new images append. Same DML surface
    * and oracle as the tombstone scenario (`lake_pos_merge`) — the
    * style property swaps the old-image representation without
    * touching statement semantics. Ends with maintenance: `OPTIMIZE
    * … REWRITE DELETES` consolidates the statement-scattered blobs
    * (every pointer require()d repointed; live view unchanged by
    * construction — bitmaps move, bits don't). */
  private val dvMerge: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_dvdml"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.setProperties(Map(
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read",
      "write.delete.style" -> "vector"))
    LakeRegistry.register("lake_dvdml_t", t)
    val before = t.currentSnapshot.files.toSet
    s.sql("UPDATE lake_dvdml_t SET o_totalprice = o_totalprice * 2.0 " +
      "WHERE o_orderstatus = 'O'")
    require(before.subsetOf(t.currentSnapshot.files.toSet),
      "merge-on-read UPDATE must keep every original data file")
    require(t.currentSnapshot.dvs.nonEmpty &&
      t.currentSnapshot.posDels.isEmpty,
      "vector style must shape UPDATE's old images as bitmaps")
    orders.filter(col("o_orderkey") % 3 === 0)
      .createOrReplaceTempView("lake_dvdml_src")
    val files2 = t.currentSnapshot.files.toSet
    s.sql(
      """MERGE INTO lake_dvdml_t t USING lake_dvdml_src s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND s.o_totalprice < 100000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M',
        |  o_totalprice = s.o_totalprice
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    require(files2.subsetOf(t.currentSnapshot.files.toSet),
      "merge-on-read MERGE must keep every pre-merge data file")
    require(t.currentSnapshot.posDels.isEmpty &&
      t.currentSnapshot.dvs.nonEmpty,
      "vector style must shape MERGE's matched old images as bitmaps")
    // blob maintenance: consolidate the per-statement merges into
    // fresh blobs (metadata-scale — no data file read or written)
    val preRw = t.currentSnapshot.dvs
    val dataFiles = t.currentSnapshot.files
    s.sql("OPTIMIZE lake_dvdml_t REWRITE DELETES")
    val postRw = t.currentSnapshot.dvs
    require(t.currentSnapshot.files == dataFiles &&
      postRw.keySet == preRw.keySet &&
      preRw.forall { case (f, b) => postRw(f) != b },
      "blob consolidation must repoint every vector, touch no data")
    t.read().orderBy("o_orderkey")
  }

  /** Merge-on-read UPDATE and MERGE via position tombstones — the
    * fine-grained write path at scale (Iceberg's `write.update.mode`
    * / `write.merge.mode` = merge-on-read): an UPDATE tombstones its
    * matched rows' old images and appends new ones; a MERGE
    * tombstones matched rows, appends post-clause images plus
    * unmatched inserts — in both cases every ORIGINAL data file is
    * require()d to survive (write amplification ∝ matched rows, not
    * file sizes). The MERGE exercises conditional DELETE, UPDATE with
    * source references, and INSERT *, all through SQL; the MERGE also
    * proves MoR DML COMPOSES with pending tombstones from the UPDATE
    * (matched rows come from the live view). End state oracled via a
    * SQL replay. */
  private val posMerge: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val t = GraftTable.create(s, tmp("lake_pmrg"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.setProperties(Map(
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read"))
    LakeRegistry.register("lake_pmrg_t", t)
    val before = t.currentSnapshot.files.toSet
    s.sql("UPDATE lake_pmrg_t SET o_totalprice = o_totalprice * 2.0 " +
      "WHERE o_orderstatus = 'O'")
    require(before.subsetOf(t.currentSnapshot.files.toSet),
      "merge-on-read UPDATE must keep every original data file")
    require(t.currentSnapshot.posDels.nonEmpty,
      "merge-on-read UPDATE must emit position tombstones")
    orders.filter(col("o_orderkey") % 3 === 0)
      .createOrReplaceTempView("lake_pmrg_src")
    val files2 = t.currentSnapshot.files.toSet
    val tombs2 = t.currentSnapshot.posDels.size
    s.sql(
      """MERGE INTO lake_pmrg_t t USING lake_pmrg_src s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND s.o_totalprice < 100000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M',
        |  o_totalprice = s.o_totalprice
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    require(files2.subsetOf(t.currentSnapshot.files.toSet),
      "merge-on-read MERGE must keep every pre-merge data file")
    require(t.currentSnapshot.posDels.size > tombs2,
      "merge-on-read MERGE must emit position tombstones for matches")
    // tombstone maintenance: merge the per-statement tombstone files
    // into a clustered set (metadata-scale — no data file is read or
    // written) and prove the live view is unchanged by construction
    val beforeRewrite = t.currentSnapshot.posDels.size
    val dataFiles = t.currentSnapshot.files
    s.sql("OPTIMIZE lake_pmrg_t REWRITE DELETES")
    require(t.currentSnapshot.files == dataFiles,
      "tombstone rewrite must not touch any data file")
    require(t.currentSnapshot.posDels.nonEmpty &&
      t.currentSnapshot.posDels.size < beforeRewrite,
      "tombstone rewrite must shrink the tombstone file set")
    t.read().orderBy("o_orderkey")
  }

  /** Stats-based data skipping (Iceberg's min/max pruning): three
    * date-ranged ingest batches leave each data file with a tight
    * `o_orderdate` range in the manifest; the 1996+ read must prove a
    * strict file subset ON THE MANIFEST ALONE (no file opens), then
    * the residual filter makes correctness independent of the stats.
    * At 100 TB with time-clustered ingest this is the scan-a-day vs
    * scan-the-table difference. */
  private val skipping: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def upTo(d: String) = col("o_orderdate") < lit(d).cast("timestamp")
    val t = GraftTable.create(s, tmp("lake_skip"),
      orders.filter(upTo("1994-01-01")))
    t.append(orders.filter(!upTo("1994-01-01") && upTo("1996-01-01")))
    t.append(orders.filter(!upTo("1996-01-01")))
    val snap = t.currentSnapshot
    val pred = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
    val pruned = t.pruneByStats(snap, pred)
    require(pruned.nonEmpty && pruned.size < snap.files.size,
      s"stats must prune a strict file subset " +
        s"(${pruned.size} of ${snap.files.size})")
    t.readWhere(pred).orderBy("o_orderkey")
  }

  /** ADD COLUMN with an initial DEFAULT (Iceberg v3
    * initial-defaults): rows in files written BEFORE the column
    * existed read the default; rows appended after keep exactly what
    * they wrote — an explicit post-add NULL stays NULL (the
    * distinction the sequence-scoped boundary exists for; a naive
    * whole-scan COALESCE would erase it). Metadata-only ALTER, no
    * rewrite. */
  private val addDefault: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_def"),
      customer.filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name", "c_acctbal"))
    LakeRegistry.register("lake_def_t", t)
    s.sql("ALTER TABLE lake_def_t ADD COLUMNS " +
      "(tier STRING DEFAULT 'STANDARD')")
    customer.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("T"),
            (col("c_custkey") % 3).cast("string"))).as("tier"))
      .createOrReplaceTempView("lake_def_src")
    s.sql("INSERT INTO lake_def_t SELECT * FROM lake_def_src")
    s.sql("SELECT * FROM lake_def_t").orderBy("c_custkey")
  }

  /** Binpack small-file maintenance: a well-sized base load plus a
    * trail of small incremental appends (the streaming-ingest
    * pathology), then `compactSmall` rewrites ONLY the sub-threshold
    * files — the largest file is require()d to carry forward BY
    * REFERENCE while the file count drops. Full compact() would
    * rewrite everything; at 100 TB the difference is rewriting
    * kilobytes vs terabytes for the same hygiene. */
  private val binpack: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_bp"),
      orders.filter(col("o_orderkey") % 4 === 0).coalesce(1))
    (1 to 3).foreach(i =>
      t.append(orders.filter(col("o_orderkey") % 4 === i)))
    val snap0 = t.currentSnapshot
    require(snap0.files.forall(snap0.fileSizes.contains),
      "manifest must know every file's size")
    val thr = snap0.files.flatMap(snap0.fileSizes.get).max
    LakeRegistry.register("lake_bp_t", t)
    s.sql(s"OPTIMIZE lake_bp_t BINPACK $thr") // pack sub-threshold files
    val snap1 = t.currentSnapshot
    require(snap1.op == "binpack" &&
      snap1.files.toSet.intersect(snap0.files.toSet).nonEmpty,
      "the largest file must carry forward by reference")
    require(snap1.files.size < snap0.files.size,
      s"small files must merge (${snap0.files.size} -> ${snap1.files.size})")
    t.read().orderBy("o_orderkey")
  }

  /** Data skipping under a DISJUNCTIVE predicate: the may-match tree
    * unions the two range arms, so the middle epoch's files — excluded
    * by BOTH arms — are pruned while either edge epoch survives. The
    * historical failure mode (an OR disabling pruning wholesale, full
    * scan at 100 TB) is require()d away. */
  private val skippingOr: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def upTo(d: String) = col("o_orderdate") < lit(d).cast("timestamp")
    val t = GraftTable.create(s, tmp("lake_skip_or"),
      orders.filter(upTo("1994-01-01")))
    t.append(orders.filter(!upTo("1994-01-01") && upTo("1996-01-01")))
    t.append(orders.filter(!upTo("1996-01-01")))
    val snap = t.currentSnapshot
    val pred = "o_orderdate < TIMESTAMP '1994-01-01 00:00:00' OR " +
      "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
    val pruned = t.pruneByStats(snap, pred)
    require(pruned.nonEmpty && pruned.size < snap.files.size,
      s"OR predicate must still prune a strict file subset " +
        s"(${pruned.size} of ${snap.files.size})")
    t.readWhere(pred).orderBy("o_orderkey")
  }

  /** Runtime file pruning for the dim-filtered fact join (the
    * dynamic-partition-pruning shape; Iceberg+Spark's runtime
    * filtering) — the reference's own governed fact⋈dim join
    * (consumer_emr_on_eks_setup.sh:409-412) at warehouse scale. The
    * fact table is hidden-partitioned `bucket[64](o_custkey)`; the
    * dim side (the 10 richest customers — a deterministic total
    * order, so every sf and engine agrees) collects to 10 join keys
    * whose bucket placement prunes the fact scan to ≤10 of 64 bucket
    * directories ON THE MANIFEST ALONE, require()d a strict subset at
    * every sf (10 keys < 64 buckets by construction — this is the
    * pitfall-proof form of the invariant). The residual semi-join
    * keeps correctness independent of the pruning. */
  private val runtimePrune: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_rtp"), orders,
      partitionBy = Seq("bucket[64](o_custkey)"))
    val dim = customer
      .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(10)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val snap = t.currentSnapshot
    val keys = dim.select("c_custkey").collect().map(_.get(0)).toIndexedSeq
    val pruned = t.pruneByKeys(snap, "o_custkey", keys)
    require(pruned.nonEmpty && pruned.size < snap.files.size,
      s"dim join keys must prune a strict fact-file subset on the " +
        s"manifest (${pruned.size} of ${snap.files.size})")
    t.readWhereIn("o_custkey", dim, "c_custkey")
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("o_totalprice"), col("c_acctbal"))
      .orderBy("o_orderkey")
  }

  /** Partition spec evolution (Iceberg's "change the partitioning
    * without rewriting a byte"): the table starts UNPARTITIONED
    * (early small-table days), then evolves to `year(o_orderdate)`
    * in a metadata-only commit — require()d zero file changes — and
    * only data appended afterwards lands in year directories. A date
    * predicate then prunes per file under the spec each file was
    * written with (old files conservatively kept, new files pruned
    * by year — require()d in between the two counts). */
  private val partitionEvolution: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def upTo(d: String) = col("o_orderdate") < lit(d).cast("timestamp")
    val t = GraftTable.create(s, tmp("lake_pe"),
      orders.filter(upTo("1997-01-01")))
    val filesBefore = t.currentSnapshot.files
    t.updatePartitionSpec(Seq("year(o_orderdate)"))
    require(t.currentSnapshot.files == filesBefore,
      "spec evolution must be a metadata-only commit")
    t.append(orders.filter(!upTo("1997-01-01")))
    val snap = t.currentSnapshot
    val pred = "o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'"
    val pruned = t.prunePartitions(snap, pred)
    require(pruned.size < snap.files.size &&
      pruned.size >= filesBefore.size,
      s"old files keep (no dirs), post-evolution years prune " +
        s"(${pruned.size} of ${snap.files.size})")
    t.readWhere(pred).orderBy("o_orderkey")
  }

  /** ALTER TABLE schema evolution as SQL (Iceberg's full surface, not
    * just add-column): ADD COLUMNS is a metadata-only commit (old
    * rows read NULL), RENAME COLUMN maps old files' write-time names
    * through an epoch alias (no rewrite — Iceberg's field-id
    * resolution, done with a scoped name mapping), DROP COLUMN
    * retires the name metadata-only. The final SELECT crosses two
    * name epochs and three schema versions in one scan. */
  private val alter: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_alt"),
      customer.filter(col("c_custkey") % 2 === 0))
    LakeRegistry.register("lake_alt_t", t)
    s.sql("ALTER TABLE lake_alt_t ADD COLUMNS (tier STRING)")
    customer.filter(col("c_custkey") % 2 === 1)
      .withColumn("tier",
        concat(lit("T"), (col("c_custkey") % 3).cast("string")))
      .createOrReplaceTempView("lake_alt_src")
    s.sql("INSERT INTO lake_alt_t SELECT * FROM lake_alt_src")
    s.sql("ALTER TABLE lake_alt_t RENAME COLUMN c_mktsegment TO segment")
    s.sql("ALTER TABLE lake_alt_t DROP COLUMN c_name")
    require(t.currentSnapshot.op == "evolve-drop" &&
      t.snapshots.size == 5, "three ALTERs + two writes = five commits")
    s.sql("SELECT * FROM lake_alt_t").orderBy("c_custkey")
  }

  /** Safe type promotion (Iceberg spec "Schema Evolution":
    * int→bigint, float→double, decimal(P,S)→decimal(P+,S)) as
    * METADATA-ONLY ALTERs across a 3-epoch scan: epoch-1 files store
    * int/float/decimal(12,2), two promotions land between appends,
    * and the final read is ONE vectorized scan in which Spark's
    * parquet updaters widen each file's physical type per row group —
    * no epoch unions, no rewrite (file-set identity require()d around
    * every ALTER). The refusal matrix (narrowing, cross-family,
    * scale change) is require()d in-query; at 100 TB this is the
    * difference between an id column outgrowing int being a 1-file
    * metadata commit and a full-table rewrite. */
  private val typePromotion: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.orders(s, dir)
    def epoch(m: Long, cust: String, pf: String, dp: Int): DataFrame =
      orders.filter(col("o_orderkey") % 3 === m)
        .select(col("o_orderkey"),
          col("o_custkey").cast(cust).as("o_custkey"),
          col("o_totalprice").cast(pf).as("price_f"),
          (col("o_orderkey") % 1000).cast(DecimalType(dp, 2)).as("price_d"))
    val t = GraftTable.create(s, tmp("lake_tp"), epoch(0, "int", "float", 12))
    LakeRegistry.register("lake_tp_t", t)
    def metadataOnly(alter: => Unit): Unit = {
      val before = t.currentSnapshot.files
      alter
      require(t.currentSnapshot.files == before,
        "type promotion must be metadata-only (no file rewrites)")
    }
    metadataOnly(s.sql("ALTER TABLE lake_tp_t ALTER COLUMN o_custkey TYPE BIGINT"))
    metadataOnly(t.alterColumnType("price_d", DecimalType(18, 2)))
    epoch(1, "bigint", "float", 18).createOrReplaceTempView("lake_tp_src1")
    s.sql("INSERT INTO lake_tp_t SELECT * FROM lake_tp_src1")
    metadataOnly(s.sql("ALTER TABLE lake_tp_t ALTER COLUMN price_f TYPE DOUBLE"))
    epoch(2, "bigint", "double", 18).createOrReplaceTempView("lake_tp_src2")
    s.sql("INSERT INTO lake_tp_t SELECT * FROM lake_tp_src2")
    // refusal matrix: narrowing, cross-family, and scale changes all
    // refuse loudly — committed bytes would be misread or rescaled
    def refuses(frag: String)(body: => Unit): Unit = {
      val refused =
        try { body; false }
        catch { case e: Throwable => GraftTable.chainContains(e, frag) }
      require(refused, s"promotion must refuse ($frag)")
    }
    refuses("unsafe type promotion")(
      t.alterColumnType("o_custkey", org.apache.spark.sql.types.IntegerType))
    refuses("unsafe type promotion")(
      t.alterColumnType("price_f", org.apache.spark.sql.types.StringType))
    refuses("unsafe type promotion")(
      t.alterColumnType("price_d", DecimalType(20, 3)))
    s.sql("SELECT * FROM lake_tp_t").orderBy("o_orderkey")
      .withColumn("price_d", col("price_d").cast("double"))
  }

  /** Nested-type schema evolution at ARBITRARY depth (Iceberg
    * evolves struct fields in metadata only via field ids; this
    * engine's sequence-scoped name mapping recurses the path — round
    * 15 closed the depth-1 limit): three epochs of files over
    * `info{segment, bal, geo{city, zip}}` — (1) the original shape,
    * (2) after `ADD COLUMNS (info.tier, info.geo.region)` (child AND
    * grandchild in one statement; old files read NULL for both), (3)
    * after grandchild `RENAME info.geo.zip TO postal` + `DROP
    * info.geo.city` and child `RENAME info.bal TO balance` + `DROP
    * info.segment`, every epoch reads through the mapping without a
    * byte rewritten. NULL inner structs (geo on c_custkey % 7 == 0)
    * stay NULL through every epoch's rebuild — a struct() of null
    * children must not resurrect them as rows of nulls. */
  private val alterNested: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    def shaped(pred: org.apache.spark.sql.Column): DataFrame =
      customer.filter(pred)
      .select(col("c_custkey"),
        struct(col("c_mktsegment").as("segment"),
          col("c_acctbal").as("bal"),
          when(col("c_custkey") % 7 === 0, lit(null)).otherwise(
            struct(col("c_nationkey").cast("string").as("city"),
              (col("c_custkey") % 1000).cast("int").as("zip")))
            .as("geo")).as("info"))
    val t = GraftTable.create(s, tmp("lake_altn"),
      shaped(col("c_custkey") % 3 === 0))
    LakeRegistry.register("lake_altn_t", t)
    s.sql("ALTER TABLE lake_altn_t ADD COLUMNS " +
      "(info.tier STRING, info.geo.region STRING)")
    shaped(col("c_custkey") % 3 === 1)
      .withColumn("info", struct(col("info.segment"), col("info.bal"),
        when(col("info.geo").isNull, lit(null)).otherwise(
          struct(col("info.geo.city"), col("info.geo.zip"),
            concat(lit("R"), (col("c_custkey") % 2).cast("string"))
              .as("region"))).as("geo"),
        concat(lit("T"), (col("c_custkey") % 3).cast("string")).as("tier")))
      .createOrReplaceTempView("lake_altn_src1")
    s.sql("INSERT INTO lake_altn_t SELECT * FROM lake_altn_src1")
    s.sql("ALTER TABLE lake_altn_t RENAME COLUMN info.geo.zip TO postal")
    s.sql("ALTER TABLE lake_altn_t DROP COLUMN info.geo.city")
    s.sql("ALTER TABLE lake_altn_t RENAME COLUMN info.bal TO balance")
    s.sql("ALTER TABLE lake_altn_t DROP COLUMN info.segment")
    // epoch 3 writes under the final shape:
    // info{balance, geo{postal, region}, tier}
    customer.filter(col("c_custkey") % 3 === 2)
      .select(col("c_custkey"),
        struct(col("c_acctbal").as("balance"),
          when(col("c_custkey") % 7 === 0, lit(null)).otherwise(
            struct((col("c_custkey") % 1000).cast("int").as("postal"),
              lit("R9").as("region"))).as("geo"),
          lit("T9").as("tier")).as("info"))
      .createOrReplaceTempView("lake_altn_src2")
    s.sql("INSERT INTO lake_altn_t SELECT * FROM lake_altn_src2")
    require(t.snapshots.size == 8,
      "create + 5 ALTER commits + 2 inserts = eight commits")
    s.sql(
      """SELECT c_custkey, info.balance AS balance, info.tier AS tier,
        |       info.geo.postal AS postal, info.geo.region AS region
        |FROM lake_altn_t""".stripMargin).orderBy("c_custkey")
  }

  /** Hidden partitioning (Iceberg partition transforms): the table
    * partitions by `year(o_orderdate)` × `bucket[4](o_custkey)` —
    * derived values the user NEVER writes or filters on. Predicates
    * on the raw columns prune partition directories on the manifest
    * alone: the date range keeps only matching years (require()d
    * strict subset), the key equality hashes into one bucket
    * (require()d, and require()d lossless against a full scan). At
    * 100 TB this removes the classic failure where someone forgets
    * to filter the redundant month column and scans the world. */
  private val hiddenPartition: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_hp"), orders,
      partitionBy = Seq("year(o_orderdate)", "bucket[4](o_custkey)"))
    val snap = t.currentSnapshot
    val datePred = "o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'"
    val byDate = t.prunePartitions(snap, datePred)
    require(byDate.nonEmpty && byDate.size < snap.files.size,
      s"year transform must prune (${byDate.size}/${snap.files.size})")
    val byKey = t.prunePartitions(snap, "o_custkey = 7")
    require(byKey.size < snap.files.size,
      s"bucket transform must prune (${byKey.size}/${snap.files.size})")
    require(t.readWhere("o_custkey = 7").count() ==
      orders.filter(col("o_custkey") === 7).count(),
      "bucket pruning must not lose rows")
    t.readWhere(datePred).orderBy("o_orderkey")
  }

  /** `hour(ts)` hidden partitioning (Iceberg's `hours()` — the
    * granularity streaming-ingest tables actually land at), driven
    * through the SQL DDL surface (`PARTITIONED BY (hours(ts))`): two
    * days of events land in per-hour directories, a 6-hour raw-column
    * window prunes to a require()d STRICT file subset on the manifest
    * alone, and pruning is require()d lossless against the source.
    * The zero-padded `yyyy-MM-dd-HH` rendering keeps lexicographic =
    * chronological, so range predicates prune with string compares —
    * same law as year/month/day. */
  private val hourPartition: Q = (s, dir) => {
    val events = Tables.events(s, dir)
      .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    LakeRegistry.unregister("lake_hr_t")
    events.createOrReplaceTempView("lake_hr_src")
    s.sql(
      s"""CREATE TABLE lake_hr_t (
         |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
         |  event_type STRING, value DOUBLE, props STRING)
         |USING graft PARTITIONED BY (hours(ts))
         |LOCATION '${tmp("lake_hr")}'""".stripMargin)
    s.sql("INSERT INTO lake_hr_t SELECT * FROM lake_hr_src")
    val t = LakeRegistry.get("lake_hr_t").get
    val snap = t.currentSnapshot
    val pred = "ts >= TIMESTAMP '2024-01-01 06:00:00' AND " +
      "ts < TIMESTAMP '2024-01-01 12:00:00'"
    val pruned = t.prunePartitions(snap, pred)
    require(pruned.nonEmpty && pruned.size < snap.files.size,
      s"hour transform must prune (${pruned.size}/${snap.files.size})")
    require(t.readWhere(pred).count() ==
      events.filter(expr(pred)).count(),
      "hour pruning must not lose rows")
    t.readWhere(pred).orderBy("event_id")
  }

  /** Branches and tags (Iceberg refs): the initial load is tagged
    * `v1` (immutable bookmark); an `ingest` branch takes two appends
    * that `main` readers never see (require()d); fast-forward then
    * publishes the branch — the WAP workflow at branch granularity,
    * with every intermediate state still time-travelable. The oracle
    * pins the published end state; the isolation and tag-stability
    * decisions are require()d inside. */
  private val branch: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def part(m: Long) = orders.filter(col("o_orderkey") % 4 === m)
    val t = GraftTable.create(s, tmp("lake_br"), part(0)) // snap 1
    t.createTag("v1")
    t.createBranch("ingest")
    t.appendToBranch(part(1), "ingest")
    t.appendToBranch(part(2), "ingest")
    require(t.read().count() == part(0).count(),
      "branch writes must be invisible on main")
    require(t.readRef("ingest").count() ==
      (0L to 2L).map(part(_).count()).sum,
      "the branch must accumulate its own appends")
    t.fastForward("main", "ingest")
    require(t.readRef("v1").count() == part(0).count(),
      "the tag must still read the initial load after fast-forward")
    t.read().orderBy("o_orderkey")
  }

  /** REF-ADDRESSED identifiers (round 19 — Iceberg's `db.t.branch_b`
    * / `db.t.tag_v` SQL surface): the suffix pins reads to the ref's
    * head and DML to the branch, making the whole WAP workflow plain
    * SQL — `INSERT INTO t.branch_etl`, `UPDATE/DELETE
    * t.branch_etl …`, audit reads on `t.branch_etl`, pinned reads on
    * `t.tag_v1`, publish via fast_forward. Main stays isolated until
    * publish (require()d after every branch mutation); tag WRITES
    * refuse (immutable pins), wrong-kind addressing (`branch_v1`
    * naming a tag) refuses, a missing ref refuses with the live ref
    * list. Claimed through the same suffix guard stack as the
    * metadata tables (registered full names, shadows, views, and
    * governed names all win first), and the DML target survives to
    * the write claim un-rewritten (the read claim skips DML
    * targets). Scale: addressing only — a branch commit costs
    * exactly its main-branch equivalent (same refs CAS, same
    * manifest carry-by-reference). Oracle = the published end state
    * recomputed relationally. */
  private val branchSqlQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def part(m: Long) = orders.filter(col("o_orderkey") % 4 === m)
    val t = GraftTable.create(s, tmp("lake_brsql"), part(0))  // snap 1
    LakeRegistry.unregister("lake_brsql_t")
    LakeRegistry.register("lake_brsql_t", t)
    s.sql("ALTER TABLE lake_brsql_t CREATE TAG v1")
    s.sql("ALTER TABLE lake_brsql_t CREATE BRANCH etl")
    part(1).createOrReplaceTempView("lake_brsql_src")
    // branch-addressed INSERT: lands on the branch, main unchanged
    s.sql("INSERT INTO lake_brsql_t.branch_etl " +
      "SELECT * FROM lake_brsql_src")
    require(t.read().count() == part(0).count(),
      "main must not see the branch-addressed insert")
    require(s.sql("SELECT count(*) FROM lake_brsql_t.branch_etl")
        .head.getLong(0) == part(0).count() + part(1).count(),
      "the branch read must see its own append")
    // branch-addressed UPDATE then DELETE compose on the branch
    s.sql("UPDATE lake_brsql_t.branch_etl " +
      "SET o_totalprice = o_totalprice + 1 WHERE o_orderkey % 4 = 1")
    s.sql("DELETE FROM lake_brsql_t.branch_etl WHERE o_orderkey % 8 = 1")
    require(t.read().count() == part(0).count(),
      "main must stay isolated through branch DML")
    // tag reads pin the initial load; implicit main addresses head
    require(s.sql("SELECT count(*) FROM lake_brsql_t.tag_v1")
        .head.getLong(0) == part(0).count(),
      "the tag identifier must pin its snapshot")
    require(s.sql("SELECT count(*) FROM lake_brsql_t.branch_main")
        .head.getLong(0) == part(0).count(),
      "branch_main must address the main head")
    // refusal matrix: tag writes, wrong-kind addressing, missing ref
    require(
      try { s.sql("INSERT INTO lake_brsql_t.tag_v1 " +
        "SELECT * FROM lake_brsql_src"); false }
      catch { case e: Exception => e.getMessage.contains("immutable") },
      "tag-addressed writes must refuse")
    require(
      try { s.sql("SELECT * FROM lake_brsql_t.branch_v1").collect()
        false }
      catch { case e: Exception =>
        e.getMessage.contains("is a tag, not a branch") },
      "wrong-kind ref addressing must refuse")
    require(
      try { s.sql("SELECT * FROM lake_brsql_t.branch_nope").collect()
        false }
      catch { case e: Exception =>
        e.getMessage.contains("does not exist") },
      "a missing ref must refuse with the live ref list")
    // publish, then the tag still pins the initial load
    s.sql("CALL graft.system.fast_forward(table => 'lake_brsql_t', " +
      "branch => 'main', to => 'etl')")
    require(s.sql("SELECT count(*) FROM lake_brsql_t.tag_v1")
        .head.getLong(0) == part(0).count(),
      "the tag must survive the publish")
    t.read().orderBy("o_orderkey")
  }

  /** Metadata tables (Iceberg's `table.files` / `table.partitions`):
    * per-partition file and record counts answered from the
    * DRIVER-SIDE MANIFEST ALONE — the footer-harvested record counts
    * ride in each commit, so this query plans zero data-file scans.
    * At 100 TB an operator asks "how big is each partition" without
    * reading a byte of data. The oracle recomputes the counts the
    * slow way (GROUP BY over the actual rows), pinning the manifest
    * numbers to the data. */
  private val metadata: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_meta"),
      orders.filter(col("o_orderkey") % 2 === 0),
      partitionBy = Seq("o_orderstatus"))
    t.append(orders.filter(col("o_orderkey") % 2 === 1))
    LakeRegistry.register("lake_meta_t", t)
    // the metadata tables via their SQL TVF surface (Iceberg's
    // db.t.files / db.t.partitions equivalent)
    val files = s.sql("SELECT * FROM lake_files('lake_meta_t')")
    require(files.filter(col("rows").isNull).count() == 0,
      "every data file must carry a footer record count")
    require(files.filter(col("size_bytes").isNull).count() == 0,
      "every data file must carry a manifest-recorded size")
    val parts = s.sql("SELECT * FROM lake_partitions('lake_meta_t')")
    require(parts.count() == 3 &&
      parts.filter(col("row_count").isNull).count() == 0,
      "partition metadata must cover all three statuses with counts")
    // the Iceberg-style dotted SUFFIX forms answer the same frames
    require(s.sql("SELECT * FROM lake_meta_t.files").count() ==
      files.count() &&
      s.sql("SELECT * FROM lake_meta_t.partitions").count() == 3 &&
      s.sql("SELECT * FROM lake_meta_t.snapshots").count() ==
        s.sql("SELECT * FROM lake_meta_t.history").count(),
      "db.t.files / .partitions / .snapshots must mirror the TVFs")
    // `.data_files` (round 19): Iceberg's data-only name — this
    // engine's files table IS data-only, so the alias serves the
    // same frame (both surfaces)
    require(s.sql("SELECT * FROM lake_meta_t.data_files").count() ==
      files.count() &&
      s.sql("SELECT * FROM lake_data_files('lake_meta_t')").count() ==
        files.count(),
      ".data_files must alias .files on both surfaces")
    parts.select(col("o_orderstatus"), col("row_count"))
      .orderBy("o_orderstatus")
  }

  /** The remaining Iceberg metadata tables (r16 verdict item 5):
    * `.entries` (manifest entries of the CURRENT snapshot — ADDED by
    * this commit vs EXISTING carried by reference), `.all_files` /
    * `.all_data_files` (every file ANY live snapshot references —
    * `in_current = false` marks history-only files, exactly what
    * snapshot expiry would reclaim), and `.metadata_log_entries`
    * (one row per manifest in the metadata log). All through the
    * SAME frame factory as the existing TVFs + dotted suffixes, all
    * manifest-answered — zero data reads at any table size. The
    * scenario walks the operator's snapshot-pile-up debugging flow:
    * append (entries split ADDED/EXISTING) → compaction (everything
    * re-ADDED; the old files turn history-only in all_files) →
    * expiry (all_files collapses to the live set, the log to the
    * retained manifests). */
  private val entriesQ: Q = (s, dir) => {
    import org.apache.spark.sql.functions.sum
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // Round 20 (guide §1.4/§2.6, the r19 row-lineage fold): this
    // scenario's cost was ~25 sequential driver actions over small
    // metadata frames — each epoch's probes now fold into ONE action
    // (multi-`when` aggregates, cross-joined single-row aggregates
    // across frames). Every require keeps its exact semantics and
    // message; only the action count changes.
    val cohorts = orders.agg(
      count(lit(1)).as("total"),
      count(when(col("o_orderkey") % 2 === 0, 1)).as("evens"),
      count(when(col("o_orderkey") % 10 === 1, 1)).as("dead1"),
      count(when(col("o_orderkey") % 10 === 2, 1)).as("dead2")).head
    val total = cohorts.getLong(0)
    val evens = cohorts.getLong(1)
    val dead = cohorts.getLong(2) + cohorts.getLong(3)
    val t = GraftTable.create(s, tmp("lake_ent"),
      orders.filter(col("o_orderkey") % 2 === 0))            // snap 1
    t.append(orders.filter(col("o_orderkey") % 2 === 1))     // snap 2
    LakeRegistry.register("lake_ent_t", t)
    val ent = s.sql("SELECT * FROM lake_entries('lake_ent_t')")
    // the append ADDED its own files; snap-1 files carry EXISTING
    val entRow = ent.agg(
      sum(when(col("status") === "EXISTING", col("rows"))).as("exR"),
      sum(when(col("status") === "ADDED", col("rows"))).as("adR"),
      countDistinct(when(col("status") === "EXISTING",
        col("snapshot_id"))).as("exSnapN"),
      max(when(col("status") === "EXISTING", col("snapshot_id")))
        .as("exSnapMax")).head
    require(entRow.getLong(0) == evens &&
        entRow.getLong(1) == total - evens,
      "entry status must split the append from the carried files")
    require(entRow.getLong(2) == 1L && entRow.getLong(3) == 1L,
      "EXISTING entries must carry their ADDING commit's sequence")
    s.sql("OPTIMIZE lake_ent_t")                             // snap 3
    // dotted-suffix addressing mirrors the TVF (spec-pinned shape)
    val ent3 = s.sql("SELECT * FROM lake_ent_t.entries")
    val all = s.sql("SELECT * FROM lake_ent_t.all_files")
    val live = t.currentSnapshot.files.toSet
    val log = s.sql("SELECT * FROM lake_ent_t.metadata_log_entries")
    val b = ent3.agg(
        count(when(col("status") === "EXISTING", 1)).as("exN"))
      .crossJoin(all.agg(
        count(when(col("in_current"), 1)).as("curN"),
        count(lit(1)).as("allN"),
        count(when(!col("in_current") && col("rows").isNull, 1))
          .as("histNullN")))
      .crossJoin(s.sql("SELECT * FROM lake_all_data_files('lake_ent_t')")
        .agg(count(lit(1)).as("tvfN")))
      .crossJoin(s.sql("SELECT * FROM lake_ent_t.all_data_files")
        .agg(count(lit(1)).as("dotN")))
      .crossJoin(log.agg(count(lit(1)).as("logN"),
        max(when(col("is_current"), col("snapshot_id"))).as("logCur")))
      .head
    require(b.getAs[Long]("exN") == 0,
      "a full compaction re-adds every row under the new commit")
    require(b.getAs[Long]("curN") == live.size &&
        b.getAs[Long]("allN") > live.size,
      "all_files must list the pre-compaction files as history-only")
    require(b.getAs[Long]("histNullN") == 0,
      "history-only files keep the footer stats their manifest carried")
    require(b.getAs[Long]("tvfN") == b.getAs[Long]("allN") &&
        b.getAs[Long]("dotN") == b.getAs[Long]("allN"),
      "all_data_files is an alias of all_files (both surfaces)")
    require(b.getAs[Long]("logN") == 3 && b.getAs[Long]("logCur") == 3L,
      "the metadata log lists one row per manifest, head flagged")
    // expiry reclaims: history-only files leave all_files, the log
    // shrinks to the retained manifests
    s.sql("VACUUM lake_ent_t RETAIN 1 SNAPSHOTS")
    val cRow = s.sql("SELECT * FROM lake_ent_t.all_files")
      .agg(count(when(!col("in_current"), 1)).as("histN"))
      .crossJoin(s.sql("SELECT * FROM lake_ent_t.metadata_log_entries")
        .agg(count(lit(1)).as("logN")))
      .head
    require(cRow.getAs[Long]("histN") == 0 &&
        cRow.getAs[Long]("logN") == 1,
      "expiry must collapse all_files to the live set")
    // ---- the remaining metadata tables (round 18): all_manifests /
    // all_entries walk every live snapshot's manifest;
    // position_deletes expands the pending artifacts' CONTENT
    // (tombstone rows AND deletion-vector bits), reading only the
    // delete artifacts themselves ----
    val optId = t.currentSnapshotId // the compaction snapshot
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "position"))
    s.sql("DELETE FROM lake_ent_t WHERE o_orderkey % 10 = 1")
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.delete.style" -> "vector"))
    s.sql("DELETE FROM lake_ent_t WHERE o_orderkey % 10 = 2")
    val snapNow = t.currentSnapshot
    require(snapNow.posDels.nonEmpty && snapNow.dvs.nonEmpty,
      "both pending artifact shapes must be present")
    val pd = s.sql("SELECT * FROM lake_ent_t.position_deletes")
    val am = s.sql("SELECT * FROM lake_ent_t.all_manifests")
    val ae = s.sql("SELECT * FROM lake_ent_t.all_entries")
    val dRow = pd.agg(count(lit(1)).as("pdN"),
        count(when(col("delete_file").isNull, 1)).as("pdNullN"),
        collect_set(col("delete_file")).as("pdFiles"))
      .crossJoin(am.agg(count(lit(1)).as("amN"),
        count(when(col("is_current"), 1)).as("amCurN"),
        count(when(col("kind") =!= "manifest", 1)).as("amBadN")))
      .crossJoin(ae.agg(countDistinct(col("snapshot_id")).as("aeSnapN"),
        count(when(col("snapshot_id") === optId &&
          col("status") =!= "ADDED", 1)).as("aeOptBadN"),
        count(when(col("snapshot_id") === snapNow.id &&
          col("status") === "EXISTING", 1)).as("aeExistN")))
      .head
    require(dRow.getAs[Long]("pdN") == dead &&
        dRow.getAs[Long]("pdNullN") == 0,
      "position_deletes must expand both artifact shapes row-exactly")
    require(dRow.getAs[Seq[String]]("pdFiles").toSet ==
        (snapNow.posDels.toSet ++ snapNow.dvs.values.toSet),
      "each row must name the artifact that carries it")
    require(dRow.getAs[Long]("amN") == 3 &&
        dRow.getAs[Long]("amCurN") == 1 &&
        dRow.getAs[Long]("amBadN") == 0,
      "all_manifests must list one manifest per retained snapshot")
    require(dRow.getAs[Long]("aeSnapN") == 3 &&
        dRow.getAs[Long]("aeOptBadN") == 0 &&
        dRow.getAs[Long]("aeExistN") == snapNow.files.size,
      "all_entries must carry per-snapshot entry status (the " +
        "compaction ADDED everything; the delete commits carry all " +
        "files EXISTING)")
    // round 19: `.manifests` — the HEAD snapshot's manifest listing
    // (the per-shard analog of all_manifests filtered to head) with
    // on-disk lengths and the added/existing entry split; the delete
    // commit carried every data file by reference → 0 added
    val mf = s.sql("SELECT * FROM lake_ent_t.manifests")
    // `.all_delete_files` — the delete-side all_* view: every MoR
    // artifact any live snapshot references, in_current-flagged
    val adf = s.sql("SELECT * FROM lake_ent_t.all_delete_files")
    val eRow = mf.agg(count(lit(1)).as("mfN"),
        count(when(col("kind") === "manifest", 1)).as("mfManN"),
        count(when(col("length") <= 0, 1)).as("mfBadLenN"),
        sum("existing_entries").as("mfExist"),
        sum("added_entries").as("mfAdded"))
      .crossJoin(adf.agg(count(lit(1)).as("adfN"),
        count(when(col("in_current"), 1)).as("adfCurN"),
        count(when(col("kind") === "position", 1)).as("adfPosN"),
        count(when(col("kind") === "vector", 1)).as("adfVecN")))
      .crossJoin(s.sql("SELECT * FROM lake_all_delete_files('lake_ent_t')")
        .agg(count(lit(1)).as("adfTvfN")))
      .crossJoin(s.sql("SELECT * FROM lake_manifests('lake_ent_t')")
        .agg(count(lit(1)).as("mfTvfN")))
      .head
    require(eRow.getAs[Long]("mfN") == 1 + snapNow.shards.size &&
        eRow.getAs[Long]("mfManN") == 1 &&
        eRow.getAs[Long]("mfBadLenN") == 0,
      "manifests must list the head manifest (+shards) with lengths")
    require(eRow.getAs[Long]("mfExist") == snapNow.files.size &&
        eRow.getAs[Long]("mfAdded") == 0,
      "a delete commit carries every data file EXISTING")
    val adfN = eRow.getAs[Long]("adfN")
    require(eRow.getAs[Long]("adfCurN") == adfN &&
        eRow.getAs[Long]("adfPosN") == snapNow.posDels.size &&
        eRow.getAs[Long]("adfVecN") == snapNow.dvs.size,
      "all_delete_files must list both pending artifact shapes " +
        "as current")
    require(eRow.getAs[Long]("adfTvfN") == adfN &&
        eRow.getAs[Long]("mfTvfN") == eRow.getAs[Long]("mfN"),
      "the TVF forms mirror the dotted suffixes")
    // restore the pre-delete state so the oracle stays the compacted
    // end state (rollback restores files AND clears the artifacts)
    s.sql(s"CALL graft.system.rollback_to_snapshot('lake_ent_t', $optId)")
    require(t.currentSnapshot.posDels.isEmpty &&
      t.currentSnapshot.dvs.isEmpty, "rollback must clear artifacts")
    // the rolled-back artifacts stay listed as HISTORY-ONLY MoR debt
    // (rollback could resurrect them; expiry is what reclaims)
    val fRow = s.sql("SELECT * FROM lake_ent_t.position_deletes")
      .agg(count(lit(1)).as("pdPostN"))
      .crossJoin(s.sql("SELECT * FROM lake_ent_t.all_delete_files")
        .agg(count(lit(1)).as("adfPostN"),
          count(when(col("in_current"), 1)).as("adfPostCurN")))
      .head
    require(fRow.getAs[Long]("pdPostN") == 0,
      "no pending artifacts → an empty position_deletes table")
    require(fRow.getAs[Long]("adfPostN") == adfN &&
        fRow.getAs[Long]("adfPostCurN") == 0,
      "all_delete_files must keep rolled-back artifacts history-only")
    // end state: everything ADDED by the compaction, rows intact
    s.sql(
      """SELECT status, sum(rows) AS n_rows
        |FROM lake_ent_t.entries GROUP BY status ORDER BY status""".stripMargin)
  }

  /** Manifest-list scale-out (Iceberg's manifest-list + sharded
    * manifests): with `graft.manifest.shard-files` lowered to 2, the
    * table's manifest entries spill into partition-range-sorted
    * shards, appends CARRY prior shards by reference (metadata write
    * cost O(new files) — require()d on the shard-path intersection),
    * and a partition-pruned read opens only the shards whose [lo, hi]
    * range overlaps the wanted partition — require()d as a strict
    * subset via the manifest-read counter, before AND after
    * `OPTIMIZE … REWRITE MANIFESTS` re-sorts the accumulated
    * overlapping shards into range-disjoint ones. This is the layer
    * that turns per-table driver metadata cost from O(#files) into
    * O(relevant shards): at 10⁷ files / 512-file shards a
    * one-partition query parses a handful of 512-entry shards, not a
    * multi-GB manifest. */
  private val manifestList: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def part(m: Long) = orders.filter(col("o_orderkey") % 4 === m)
    val t = GraftTable.create(s, tmp("lake_ml"), part(0),
      partitionBy = Seq("o_orderstatus"))
    t.setProperties(t.properties + (GraftTable.ShardFilesProp -> "2"))
    t.append(part(1)) // spills the inline entries + new files to shards
    val snap2 = t.currentSnapshot
    require(snap2.shards.nonEmpty, "entries must spill into shards")
    t.append(part(2))
    val snap3 = t.currentSnapshot
    require(snap2.shards.map(_.path).toSet.subsetOf(
        snap3.shards.map(_.path).toSet),
      "an append must carry prior shards by reference (O(new files) " +
        "metadata cost), not rewrite them")
    t.append(part(3))
    def prunedShardOpens(): Long = {
      val before = GraftTable.manifestReads.get()
      t.readPruned("o_orderstatus", Set("F"))
      GraftTable.manifestReads.get() - before - 1 // minus the snap meta
    }
    val totalBefore = t.currentSnapshot.shards.size
    val openedBefore = prunedShardOpens()
    require(openedBefore < totalBefore,
      s"pruned read must parse a strict shard subset " +
        s"($openedBefore/$totalBefore)")
    LakeRegistry.register("lake_ml_t", t)
    s.sql("OPTIMIZE lake_ml_t REWRITE MANIFESTS")
    val after = t.currentSnapshot
    require(after.files.sorted == t.snapshot(after.parent).files.sorted,
      "rewrite_manifests is metadata-only: the data file set is " +
        "identical")
    // re-sorted shards are range-disjoint, so the same pruned read
    // opens no more (typically fewer) shards than the drifted layout
    val openedAfter = prunedShardOpens()
    require(openedAfter < after.shards.size && openedAfter <= openedBefore,
      s"post-rewrite pruned read must stay a strict subset " +
        s"($openedAfter/${after.shards.size} vs $openedBefore before)")
    t.readPruned("o_orderstatus", Set("F"))
      .select(orders.columns.map(col).toIndexedSeq: _*)
      .orderBy("o_orderkey")
  }

  /** Sort-ordered compaction (Iceberg's sort-strategy
    * `rewrite_data_files`): three arrival-ordered appends leave every
    * file spanning the whole `o_orderdate` domain, so min/max skipping
    * prunes NOTHING — require()d below. The sort-compaction
    * range-clusters the table on the date; the same predicate then
    * prunes a strict file subset on the manifest alone. This is the
    * clustering pass that turns a 100 TB arrival-ordered table
    * range-readable without an index. */
  private val sortCompact: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_sc"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    val pred = "o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'"
    val before = t.pruneByStats(t.currentSnapshot, pred)
    require(before.size == t.currentSnapshot.files.size,
      "arrival-ordered files span the full date range — nothing prunes")
    t.compact(6, sortBy = Seq("o_orderdate"))
    val snap = t.currentSnapshot
    val after = t.pruneByStats(snap, pred)
    require(after.nonEmpty && after.size < snap.files.size,
      s"sort-clustered files must prune (${after.size}/${snap.files.size})")
    t.readWhere(pred).orderBy("o_orderkey")
  }

  /** Z-order compaction (Delta's `OPTIMIZE … ZORDER BY`, Iceberg's
    * zorder rewrite strategy), issued as the SQL maintenance command:
    * after three arrival-ordered appends neither a date nor a price
    * predicate can skip a single file (require()d); interleaving the
    * bits of both columns clusters each output file into a small
    * rectangle of (orderdate × totalprice) space, so predicates on
    * EITHER dimension prune — what no single sort order gives. The
    * oracle pins the 2-D filtered read. */
  private val zorder: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_zo"),
      orders.filter(col("o_orderkey") % 3 === 0))
    t.append(orders.filter(col("o_orderkey") % 3 === 1))
    t.append(orders.filter(col("o_orderkey") % 3 === 2))
    LakeRegistry.register("lake_zo_t", t)
    val datePred = "o_orderdate >= TIMESTAMP '1999-07-01 00:00:00'"
    val pricePred = "o_totalprice <= 100000.0"
    val before = t.currentSnapshot
    require(t.pruneByStats(before, datePred).size == before.files.size &&
      t.pruneByStats(before, pricePred).size == before.files.size,
      "arrival-ordered files span both domains — nothing prunes")
    s.sql("OPTIMIZE lake_zo_t FILES 16 ZORDER BY (o_orderdate, o_totalprice)")
    val snap = t.currentSnapshot
    val byDate = t.pruneByStats(snap, datePred)
    val byPrice = t.pruneByStats(snap, pricePred)
    require(byDate.size < snap.files.size && byPrice.size < snap.files.size,
      s"z-order must prune on both dimensions " +
        s"(date ${byDate.size}, price ${byPrice.size} of ${snap.files.size})")
    t.readWhere(s"$datePred AND $pricePred").orderBy("o_orderkey")
  }

  /** The reference producer's whole DDL lifecycle in SQL alone
    * (producer_iceberg_datalake_setup.sh:117-160): CREATE a
    * partitioned table, load it with INSERT INTO … SELECT, derive a
    * second table with CTAS, then join both through the SQL read
    * path. Rerun-safe: names are re-registered onto fresh locations
    * each run (Bench executes every query twice for warmup). */
  private val sqlDdl: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("lake_ddl_src")
    LakeRegistry.unregister("lake_ddl_t")
    LakeRegistry.unregister("lake_ddl_hi")
    s.sql(
      s"""CREATE TABLE lake_ddl_t (
         |  c_custkey BIGINT, c_name STRING, c_nationkey INT,
         |  c_acctbal DOUBLE, c_mktsegment STRING)
         |USING graft PARTITIONED BY (c_mktsegment)
         |LOCATION '${tmp("lake_ddl")}'""".stripMargin)
    s.sql("INSERT INTO lake_ddl_t SELECT * FROM lake_ddl_src")
    s.sql(
      s"""CREATE TABLE lake_ddl_hi USING graft
         |LOCATION '${tmp("lake_ddl_hi")}'
         |AS SELECT c_custkey, c_acctbal FROM lake_ddl_t
         |WHERE c_acctbal > 5000""".stripMargin)
    s.sql(
      """SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_mktsegment,
        |       h.c_acctbal
        |FROM lake_ddl_t t JOIN lake_ddl_hi h ON t.c_custkey = h.c_custkey
        |ORDER BY t.c_custkey""".stripMargin)
  }

  /** The reference's workflow is DATABASE-QUALIFIED end to end
    * (`lf_datalake_db.patients` at creation,
    * producer_iceberg_datalake_setup.sh:118-150; the consumer queries
    * `db.rl_patients`, consumer_emr_on_eks_setup.sh:407-412) — this
    * drives that exact shape through the SQL front-end: CREATE TABLE
    * db.t, INSERT, UPDATE, CTAS a second db-qualified table, MERGE
    * db.t USING db.s, DELETE with a fully-qualified `db.t.c` column
    * reference, OPTIMIZE + VACUUM maintenance, then a db-qualified
    * read back. Namespaces are registry keys (dotted lowercase) and
    * directory levels on the warehouse — metadata-only, zero extra
    * cost at any scale. */
  private val namespaceDdl: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("lake_ns_src")
    LakeRegistry.unregister("lake_ns_db.patients")
    LakeRegistry.unregister("lake_ns_db.claims")
    s.sql(
      s"""CREATE TABLE lake_ns_db.patients (
         |  c_custkey BIGINT, c_name STRING, c_nationkey INT,
         |  c_acctbal DOUBLE, c_mktsegment STRING)
         |USING graft PARTITIONED BY (c_mktsegment)
         |LOCATION '${tmp("lake_ns_p")}'""".stripMargin)
    s.sql("INSERT INTO lake_ns_db.patients SELECT * FROM lake_ns_src")
    s.sql(
      """UPDATE lake_ns_db.patients
        |SET c_acctbal = c_acctbal + 100.0
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    s.sql(
      s"""CREATE TABLE lake_ns_db.claims USING graft
         |LOCATION '${tmp("lake_ns_c")}'
         |AS SELECT c_custkey, c_acctbal FROM lake_ns_db.patients
         |WHERE c_acctbal > 5000""".stripMargin)
    s.sql(
      """MERGE INTO lake_ns_db.patients p
        |USING lake_ns_db.claims c ON p.c_custkey = c.c_custkey
        |WHEN MATCHED THEN UPDATE SET c_mktsegment = 'RICH'""".stripMargin)
    // fully-qualified column reference strips like an alias
    s.sql(
      """DELETE FROM lake_ns_db.patients
        |WHERE lake_ns_db.patients.c_acctbal < 0""".stripMargin)
    s.sql("OPTIMIZE lake_ns_db.patients")
    s.sql("VACUUM lake_ns_db.patients RETAIN 5 SNAPSHOTS")
    s.sql(
      """SELECT p.c_custkey, p.c_name, p.c_mktsegment, p.c_acctbal
        |FROM lake_ns_db.patients p
        |ORDER BY p.c_custkey""".stripMargin)
  }

  /** Snapshot-history metadata surface (Iceberg's `table.snapshots` /
    * `table.history` equivalent): a scripted create→append→delete
    * sequence, then the manifest log as a DataFrame. Metadata comes
    * from the driver-side manifest — O(#snapshots), no data files
    * touched, exactly how Iceberg metadata tables answer at 100 TB. */
  private val history: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_hist"),
      orders.filter(col("o_orderkey") % 2 === 1))
    t.append(orders.filter(col("o_orderkey") % 2 === 0))
    t.delete("o_orderstatus = 'F'")
    LakeRegistry.register("lake_hist_t", t)
    // the lineage via its SQL TVF surface (committed_at_ms is
    // wall-clock — projected out for the deterministic oracle)
    s.sql(
      """SELECT snapshot_id, parent_id, op, is_current
        |FROM lake_history('lake_hist_t')
        |ORDER BY snapshot_id""".stripMargin)
  }

  /** Optimistic concurrency, Iceberg's model, as a scripted decision
    * matrix (constant-oracled like fgac_write_deny): two writer
    * handles over one table root race their commits. A second
    * writer's append based on a stale snapshot must REBASE (fast-
    * append retry — both writers' rows survive, no lost update); a
    * whole round of appends all based on the same snapshot must all
    * land; a DML commit built on a stale snapshot must surface
    * CONFLICT (its affected-file computation no longer describes the
    * table) rather than publish. */
  private val concurrent: Q = (s, dir) => {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    def part(m: Long) = orders.filter(col("o_orderkey") % 8 === m)
    // every part-cohort count in ONE pass over orders (round 20,
    // guide §1.4 — this used to rescan orders once per cohort)
    val partCols = (0L to 5L).map(m =>
      count(when(col("o_orderkey") % 8 === m, 1)).as(s"p$m"))
    val partRow = orders.agg(partCols.head, partCols.tail: _*).head
    def partN(m: Int): Long = partRow.getLong(m)
    val t1 = GraftTable.create(s, tmp("lake_conc"), part(0)) // snap 1
    val t2 = GraftTable.load(s, t1.location) // second writer handle
    t1.append(part(1)) // snap 2
    // t2 based its work on snapshot 1; t1 already advanced → rebase
    t2.appendFrom(part(2), parent = 1L) // snap 3
    val counts03 = (0 to 2).map(partN).sum
    val rebased =
      if (t2.currentSnapshotId == 3 && t2.read().count() == counts03)
        "REBASED" else "LOST_UPDATE"
    // a whole round of writers all racing from the same snapshot
    t1.appendFrom(part(3), parent = 3L) // no conflict  → snap 4
    t2.appendFrom(part(4), parent = 3L) // one rebase   → snap 5
    t1.appendFrom(part(5), parent = 3L) // two rebases  → snap 6
    val counts06 = (0 to 5).map(partN).sum
    val allIn =
      if (t1.currentSnapshotId == 6 && t1.read().count() == counts06)
        "ALL_COMMITTED" else "LOST_UPDATE"
    // stale DML: this commit, if published, would wipe the table —
    // the conflict check must reject it and leave the table intact
    val snap = t2.currentSnapshot
    val staleDml =
      try {
        t2.commit("delete", snap.schema, Nil, Nil, expectedParent = 1L)
        "COMMITTED"
      } catch { case _: CommitConflictException => "CONFLICT" }
    require(t1.read().count() == counts06, "stale DML must not publish")
    // partition-scoped DML conflict validation (Iceberg's): two
    // DELETEs racing from the same base snapshot but touching
    // DISJOINT partitions must BOTH land — the loser validates the
    // intervening commit against its read/write file set (manifest
    // partition pruning proves the winner's rewritten files cannot
    // match the loser's predicate, even under the default
    // serializable isolation) and rebases onto the new head. A pair
    // touching the same files still conflicts — pinned in
    // LakehouseSpec; the query records the user-visible outcome.
    val shard = orders.withColumn("shard",
      (col("o_orderkey") % 2 === 0).cast("string"))
    val d1 = GraftTable.create(s, tmp("lake_conc_dml"), shard,
      partitionBy = Seq("shard"))
    val d2 = GraftTable.load(s, d1.location)
    val cut = "o_totalprice < 150000" // partial: rewrites stay nonempty
    val dmlBase = d1.currentSnapshot
    val n1 = d1.delete(s"shard = 'true' AND $cut")  // writer 1 lands
    val n2 = d2.deleteAt(dmlBase, s"shard = 'false' AND $cut") // stale
    val dRow = d1.read().agg(count(lit(1)).as("liveN"))
      .crossJoin(shard.agg(count(when(not(expr(cut)), 1)).as("keptN")))
      .head
    val disjointDml =
      if (n2 > n1 && dRow.getLong(0) == dRow.getLong(1))
        "BOTH_COMMITTED" else "LOST_DELETE"
    Seq(("concurrent_appends", allIn), ("stale_append", rebased),
      ("stale_dml", staleDml), ("disjoint_dml", disjointDml))
      .toDF("scenario", "outcome").orderBy("scenario")
  }

  /** Write-audit-publish (Iceberg's staged-commit workflow, the
    * production pattern for gating data quality before readers see a
    * batch): batch 1 stages, passes its audit, publishes; batch 2
    * (poisoned: negated prices) stages, fails the audit, is
    * abandoned — the table's history never contains it. The final
    * state is exactly base + the audited batch. */
  private val wap: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_wap"),
      orders.filter(col("o_orderstatus") === "O"))
    val tok1 = t.stageAppend(orders.filter(col("o_orderstatus") === "F"))
    // both pre-publish probes in one action (round 20, guide §1.4)
    val stg = t.read().agg(count(lit(1)).as("liveN"))
      .crossJoin(t.readStaged(tok1).agg(count(lit(1)).as("stagedN"),
        count(when(col("o_totalprice") <= 0, 1)).as("badN")))
      .head
    require(stg.getLong(0) < stg.getLong(1),
      "staged rows must be invisible before publish")
    require(stg.getLong(2) == 0,
      "audit of the good batch must pass")
    t.publish(tok1)
    val tok2 = t.stageAppend(orders.filter(col("o_orderstatus") === "P")
      .withColumn("o_totalprice", -col("o_totalprice")))
    require(t.readStaged(tok2).filter(col("o_totalprice") < 0).count() > 0,
      "audit of the poisoned batch must fail")
    t.abandon(tok2)
    require(t.snapshots.size == 2,
      "an abandoned stage must leave no commit behind")
    t.read().orderBy("o_orderkey")
  }

  /** WAP via branch (Iceberg's `spark.wap.branch` writer-session
    * pattern, the branch-granular form of [[wap]]'s staged
    * manifests): with `graft.wap.branch` set, ORDINARY SQL
    * INSERT/MERGE commits land on the named branch through the refs
    * CAS — the ingest pipeline needs no API calls to target the
    * branch — and same-session reads resolve the branch head while
    * `main` readers see nothing (both require()d). The audit query
    * runs against the branch; on pass, fast-forward publishes every
    * branch commit to main atomically. A write to a missing branch
    * refuses loudly (require()d) — it must never silently land on
    * main. At 100 TB this is the pattern that keeps a multi-commit
    * ingest invisible until validated, with zero data movement at
    * publish. */
  private val wapBranch: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    def part(m: Long) = orders.filter(col("o_orderkey") % 3 === m)
    val t = GraftTable.create(s, tmp("lake_wapb"), part(0))
    LakeRegistry.register("lake_wapb_t", t)
    // writes refuse before the branch exists
    part(1).createOrReplaceTempView("lake_wapb_src1")
    part(2).withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .createOrReplaceTempView("lake_wapb_src2")
    s.conf.set(GraftTable.WapBranchConf, "etl_audit")
    try {
      val refused =
        try { s.sql("INSERT INTO lake_wapb_t SELECT * FROM lake_wapb_src1")
              false }
        catch { case e: Throwable =>
          GraftTable.chainContains(e, "no branch 'etl_audit'") }
      require(refused, "a write to a missing wap branch must refuse")
      s.sql("ALTER TABLE lake_wapb_t CREATE BRANCH etl_audit")
      // two plain SQL commits land on the branch: an append and a
      // row-level MERGE (update images), no API routing anywhere
      s.sql("INSERT INTO lake_wapb_t SELECT * FROM lake_wapb_src1")
      s.sql(
        """MERGE INTO lake_wapb_t t USING lake_wapb_src2 s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // same-session read follows the branch; main sees only part 0
      require(s.sql("SELECT count(*) FROM lake_wapb_t").head.getLong(0)
          == orders.count(), "session read must resolve the branch head")
      require(t.read().count() == part(0).count(),
        "main readers must not see unpublished branch commits")
      // the audit: no negative prices landed on the branch
      require(s.sql(
          "SELECT count(*) FROM lake_wapb_t WHERE o_totalprice <= 0")
        .head.getLong(0) == 0L, "branch audit must pass before publish")
    } finally s.conf.unset(GraftTable.WapBranchConf)
    // publish via SQL (Iceberg's fast_forward procedure)
    s.sql("ALTER TABLE lake_wapb_t FAST FORWARD main etl_audit")
    s.sql("SELECT * FROM lake_wapb_t").orderBy("o_orderkey")
  }

  /** SQL views over lake tables (the Iceberg-view surface): CREATE
    * VIEW stores the query TEXT (late binding), CREATE OR REPLACE
    * swaps the definition, views nest, `lake_views()` lists the
    * catalog, DROP VIEW removes — and because reads expand inline,
    * the final SELECT is one flat Catalyst tree (filters over the
    * view reach the scan; pinned in LakehouseSpec). Ref workflow
    * shape: producer_iceberg_datalake_setup.sh:203-236 (SQL-first
    * access to governed Iceberg tables). */
  private val view: Q = (s, dir) => {
    val t1 = GraftTable.create(s, tmp("lake_view_o"),
      Tables.orders(s, dir))
    LakeRegistry.register("lake_view_orders", t1)
    val t2 = GraftTable.create(s, tmp("lake_view_c"),
      Tables.customer(s, dir))
    LakeRegistry.register("lake_view_cust", t2)
    // first definition is WRONG (missing the join); OR REPLACE fixes
    // it — proving reads see the replacement, not the original
    s.sql("""CREATE OR REPLACE VIEW lake_view_rev AS
            |SELECT o_orderstatus AS status, 'ALL' AS segment,
            |       count(*) AS n_orders, max(o_totalprice) AS max_price
            |FROM lake_view_orders GROUP BY o_orderstatus""".stripMargin)
    s.sql("""CREATE OR REPLACE VIEW lake_view_rev
            |(segment, status, n_orders, max_price) AS
            |SELECT c.c_mktsegment, o.o_orderstatus,
            |       count(*), max(o.o_totalprice)
            |FROM lake_view_orders o
            |JOIN lake_view_cust c ON o.o_custkey = c.c_custkey
            |GROUP BY c.c_mktsegment, o.o_orderstatus""".stripMargin)
    // nested: a view over the view
    s.sql("""CREATE OR REPLACE VIEW lake_view_open AS
            |SELECT segment, n_orders, max_price FROM lake_view_rev
            |WHERE status = 'O'""".stripMargin)
    // catalog listing + DROP round-trip
    s.sql("CREATE OR REPLACE VIEW lake_view_scratch AS SELECT 1 AS x")
    require(s.sql("SELECT name FROM lake_views()").collect()
        .map(_.getString(0)).toSet.contains("lake_view_scratch"),
      "lake_views() must list the scratch view")
    s.sql("DROP VIEW lake_view_scratch")
    require(!s.sql("SELECT name FROM lake_views()").collect()
        .map(_.getString(0)).toSet.contains("lake_view_scratch"),
      "DROP VIEW must remove the view from the catalog")
    s.sql("""SELECT segment, n_orders, max_price FROM lake_view_open
            |ORDER BY segment""".stripMargin)
  }

  /** Branch/tag DDL + the refs metadata table (Iceberg's `ALTER
    * TABLE … CREATE BRANCH/TAG` and `db.t.refs`): a tag pins a
    * snapshot immutably (time-travel by name), a branch is a movable
    * head, DROP removes, and `lake_refs('t')` lists the named
    * references from the refs file — zero data access. */
  private val refsQ: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.create(s, tmp("lake_refs"),
      orders.filter(col("o_orderkey") % 2 === 0)) // snap 1
    LakeRegistry.register("lake_refs_t", t)
    s.sql("ALTER TABLE lake_refs_t CREATE TAG v1") // pins snap 1
    t.append(orders.filter(col("o_orderkey") % 2 === 1)) // snap 2
    s.sql("ALTER TABLE lake_refs_t CREATE BRANCH audit AS OF VERSION 1")
    s.sql("ALTER TABLE lake_refs_t CREATE BRANCH scratch")
    s.sql("ALTER TABLE lake_refs_t DROP BRANCH scratch")
    // the tag keeps reading the pinned snapshot after main advanced
    require(s.sql("SELECT * FROM lake_refs_t VERSION AS OF 'v1'")
        .count() < t.read().count(),
      "tag must stay pinned at its creation snapshot")
    // round 19: the REPLACE / IF NOT EXISTS forms (Iceberg's full
    // ref DDL). REPLACE re-pins an existing ref; CREATE OR REPLACE
    // is replace-or-create; IF NOT EXISTS no-ops on a same-kind dup;
    // plain REPLACE of a missing ref and a kind-mismatched replace
    // both refuse; DROP ... IF EXISTS no-ops on a miss.
    s.sql("ALTER TABLE lake_refs_t REPLACE TAG v1 AS OF VERSION 2")
    require(s.sql("SELECT * FROM lake_refs_t VERSION AS OF 'v1'")
        .count() == t.read().count(),
      "REPLACE TAG must re-pin the tag at the named snapshot")
    s.sql("ALTER TABLE lake_refs_t REPLACE TAG v1 AS OF VERSION 1")
    s.sql(
      "ALTER TABLE lake_refs_t CREATE OR REPLACE BRANCH audit")
    require(t.refs("audit")._2 == t.currentSnapshotId,
      "CREATE OR REPLACE BRANCH must move the branch to the head")
    // restore the oracle's end state (audit pinned at snap 1)
    s.sql("ALTER TABLE lake_refs_t REPLACE BRANCH audit AS OF VERSION 1")
    s.sql("ALTER TABLE lake_refs_t CREATE OR REPLACE BRANCH hotfix " +
      "AS OF VERSION 1") // missing → created
    s.sql("ALTER TABLE lake_refs_t CREATE TAG IF NOT EXISTS v1")
    require(t.refs("v1")._2 == 1L,
      "CREATE TAG IF NOT EXISTS must no-op on an existing tag")
    require(
      try { s.sql(
        "ALTER TABLE lake_refs_t REPLACE BRANCH nope"); false }
      catch { case e: Exception =>
        e.getMessage.contains("does not exist") },
      "plain REPLACE of a missing ref must refuse")
    require(
      try { s.sql(
        "ALTER TABLE lake_refs_t REPLACE BRANCH v1"); false }
      catch { case e: Exception =>
        e.getMessage.contains("is a tag") },
      "a kind-mismatched REPLACE must refuse")
    s.sql("ALTER TABLE lake_refs_t DROP BRANCH IF EXISTS ghost")
    s.sql("ALTER TABLE lake_refs_t DROP BRANCH hotfix")
    s.sql("""SELECT name, type, snapshot_id FROM lake_refs('lake_refs_t')
            |ORDER BY name""".stripMargin)
  }

  /** MERGE schema evolution (Delta's autoMerge / Iceberg mergeSchema,
    * opt-in via `write.merge.schema.evolution`): the source carries a
    * column the target lacks; the MERGE adds it (nullable,
    * metadata-only), star clauses propagate its values, and every
    * pre-merge row reads NULL — proven by the end-state oracle. */
  private val mergeEvolve: Q = (s, dir) => {
    val customer = Tables.customer(s, dir)
    val t = GraftTable.create(s, tmp("lake_me"),
      customer.filter(col("c_custkey") % 2 === 0))
    t.setProperties(Map("write.merge.schema.evolution" -> "true"))
    LakeRegistry.register("lake_me_t", t)
    customer.filter(col("c_custkey") % 3 === 0)
      .withColumn("loyalty", col("c_custkey") % 5)
      .createOrReplaceTempView("lake_me_src")
    s.sql("""MERGE INTO lake_me_t t USING lake_me_src s
            |ON t.c_custkey = s.c_custkey
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    t.read().orderBy("c_custkey")
  }

  /** Write sort order (Iceberg's `ALTER TABLE … WRITE ORDERED BY` +
    * range write distribution): after the ALTER, appends lay rows
    * out by `o_orderdate`, so each data file carries a DISJOINT
    * min/max range and a date predicate prunes to the one or two
    * files that overlap it — the difference between opening 8 files
    * and opening 1 at 100 TB. Proven in-query via the stats-prune
    * probe; `WRITE UNORDERED` clears the property. */
  private val writeOrder: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val t = GraftTable.createEmpty(s, tmp("lake_wo"), orders.schema, Nil)
    LakeRegistry.register("lake_wo_t", t)
    s.sql("ALTER TABLE lake_wo_t WRITE ORDERED BY (o_orderdate)")
    t.append(orders)
    val snap = t.currentSnapshot
    val pred = "o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'"
    val pruned = t.pruneByStats(snap, pred)
    require(pruned.nonEmpty && pruned.size <= 2 &&
        pruned.size < snap.files.size,
      s"range-ordered files must prune to the overlapping tail " +
        s"(${pruned.size} of ${snap.files.size})")
    s.sql("ALTER TABLE lake_wo_t WRITE UNORDERED")
    require(!t.properties.contains(GraftTable.SortOrderProp),
      "WRITE UNORDERED must clear the sort-order property")
    t.readWhere(pred).orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "lake_write_order"      -> writeOrder,
    "lake_merge_evolve"     -> mergeEvolve,
    "lake_refs"             -> refsQ,
    "lake_view"             -> view,
    "lake_concurrent"       -> concurrent,
    "lake_wap"              -> wap,
    "lake_sql_ddl"          -> sqlDdl,
    "lake_namespace_ddl"    -> namespaceDdl,
    "lake_history"          -> history,
    "lake_merge"            -> merge,
    "lake_merge_clauses"    -> mergeClauses,
    "lake_delete"           -> delete,
    "lake_update"           -> update,
    "lake_time_travel"      -> timeTravel,
    "lake_time_travel_ts"   -> timeTravelTs,
    "lake_schema_evolution" -> schemaEvolution,
    "lake_incremental"      -> incremental,
    "lake_cdc"              -> cdc,
    "lake_cdc_sql"          -> cdcSql,
    "lake_cdc_mor"          -> cdcMor,
    "lake_cdc_dv"           -> cdcDv,
    "lake_cdc_eqdel"        -> cdcEqDel,
    "lake_delete_files"     -> deleteFiles,
    "lake_cherry_pick"      -> cherryPick,
    "lake_compact_where"    -> compactWhere,
    "lake_compaction"       -> compaction,
    "lake_analyze"          -> analyzeQ,
    "lake_orphan_files"     -> orphanQ,
    "lake_partitions"       -> partitionsQ,
    "lake_add_files"        -> addFilesQ,
    "lake_partitioned"      -> partitioned,
    "lake_skipping"         -> skipping,
    "lake_runtime_prune"    -> runtimePrune,
    "lake_metadata"         -> metadata,
    "lake_entries"          -> entriesQ,
    "lake_sort_compact"     -> sortCompact,
    "lake_zorder"           -> zorder,
    "lake_branch"           -> branch,
    "lake_branch_sql"       -> branchSqlQ,
    "lake_hidden_partition" -> hiddenPartition,
    "lake_hour_partition"   -> hourPartition,
    "lake_partition_evolution" -> partitionEvolution,
    "lake_alter"            -> alter,
    "lake_mor_delete"       -> morDelete,
    "lake_pos_delete"       -> posDelete,
    "lake_dv"               -> dvDelete,
    "lake_dv_dml"           -> dvMerge,
    "lake_pos_merge"        -> posMerge,
    "lake_expire"           -> expire,
    "lake_expire_age"       -> expireAge,
    "lake_expire_composed"  -> expireComposedQ,
    "lake_rename"           -> rename,
    "lake_replace"          -> replaceQ,
    "lake_row_lineage"      -> rowLineage,
    "lake_cdc_lineage"      -> cdcLineage,
    "lake_cdc_eqdel_lineage" -> cdcEqDelLineage,
    "lake_overwrite_partition" -> overwritePartition,
    "lake_insert_spec"      -> insertSpec,
    "lake_truncate"         -> truncateQ,
    "lake_partition_field_ddl" -> partitionFieldDdl,
    "lake_dml_subquery"     -> dmlSubquery,
    "lake_dml_exists"       -> dmlExists,
    "lake_variant"          -> variantLake,
    "lake_constraint"       -> constraintQ,
    "lake_not_null"         -> notNullQ,
    "lake_describe"         -> describeQ,
    "lake_catalog_ddl"      -> catalogDdl,
    "lake_show_ddl"         -> showDdlQ,
    "lake_call_procs"       -> callProcs,
    "lake_rollback"         -> rollback,
    "lake_bucketed_join"    -> bucketedJoin,
    "lake_merge_source"     -> mergeBySource,
    "lake_spj_dpp"          -> spjDpp,
    "lake_clone"            -> cloneQ,
    "lake_spj_mor"          -> spjMor,
    "lake_spj_eqdel"        -> spjEqDel,
    "lake_spj_pinned"       -> spjPinned,
    "lake_spj_string"       -> spjString,
    "lake_spj_composite"    -> spjComposite,
    "lake_spj_truncate"     -> spjTruncate,
    "lake_alter_nested"     -> alterNested,
    "lake_skipping_or"      -> skippingOr,
    "lake_binpack"          -> binpack,
    "lake_add_default"      -> addDefault,
    "lake_manifest_list"    -> manifestList,
    "lake_type_promotion"   -> typePromotion,
    "lake_wap_branch"       -> wapBranch
  )

  val oracles: Map[String, String] = Map(
    // The truncate-keyed SPJ is content-equal to the naive join.
    "lake_spj_truncate" ->
      """SELECT o.o_orderkey,
        |       'C' || lpad(CAST(o.o_custkey AS VARCHAR), 7, '0') AS cust_id,
        |       c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // Sorted layout changes file boundaries, never content.
    "lake_write_order" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    // End state: matched rows take the source's values (including the
    // evolved column), unmatched target rows keep theirs with NULL in
    // the evolved column, unmatched source rows insert whole.
    "lake_merge_evolve" ->
      """WITH base AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
        |src AS (SELECT *, c_custkey % 5 AS loyalty FROM customer
        |        WHERE c_custkey % 3 = 0)
        |SELECT b.c_custkey,
        |  CASE WHEN s.c_custkey IS NULL THEN b.c_name ELSE s.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NULL THEN b.c_nationkey ELSE s.c_nationkey END AS c_nationkey,
        |  CASE WHEN s.c_custkey IS NULL THEN b.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
        |  CASE WHEN s.c_custkey IS NULL THEN b.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment,
        |  s.loyalty AS loyalty
        |FROM base b LEFT JOIN src s ON b.c_custkey = s.c_custkey
        |UNION ALL
        |SELECT s.* FROM src s WHERE NOT EXISTS
        |  (SELECT 1 FROM base b WHERE b.c_custkey = s.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // The scripted ref DDL fully determines the refs table.
    "lake_refs" ->
      """SELECT name, type, CAST(snapshot_id AS BIGINT) AS snapshot_id
        |FROM (VALUES ('audit', 'branch', 1), ('main', 'branch', 2),
        |             ('v1', 'tag', 1))
        |  AS t(name, type, snapshot_id)
        |ORDER BY name""".stripMargin,
    // The replaced definition + nested filter, flattened: DuckDB
    // computes the same join-aggregate over the source parquet.
    "lake_view" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
        |       max(o.o_totalprice) AS max_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'O'
        |GROUP BY c.c_mktsegment
        |ORDER BY segment""".stripMargin,
    // The race script is deterministic; the decision matrix is the
    // whole contract (row counts are require()d inside the query).
    "lake_concurrent" ->
      """SELECT * FROM (VALUES
        |  ('concurrent_appends', 'ALL_COMMITTED'),
        |  ('disjoint_dml', 'BOTH_COMMITTED'),
        |  ('stale_append', 'REBASED'),
        |  ('stale_dml', 'CONFLICT'))
        |  AS t(scenario, outcome)
        |ORDER BY scenario""".stripMargin,
    // Final state = base + the one batch that survived its audit.
    "lake_wap" ->
      """SELECT * FROM orders WHERE o_orderstatus IN ('O', 'F')
        |ORDER BY o_orderkey""".stripMargin,
    // The scripted history is fully determined by the DML sequence.
    "lake_history" ->
      """SELECT CAST(snapshot_id AS BIGINT) AS snapshot_id,
        |       CAST(parent_id AS BIGINT) AS parent_id, op, is_current
        |FROM (VALUES (1, 0, 'append', false), (2, 1, 'append', false),
        |             (3, 2, 'delete', true))
        |  AS t(snapshot_id, parent_id, op, is_current)
        |ORDER BY snapshot_id""".stripMargin,
    "lake_sql_ddl" ->
      """WITH hi AS (SELECT c_custkey, c_acctbal FROM customer
        |            WHERE c_acctbal > 5000)
        |SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment,
        |       h.c_acctbal
        |FROM customer c JOIN hi h ON c.c_custkey = h.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    // Replays the namespace-qualified DML sequence relationally:
    // UPDATE bump, MERGE re-segment against the >5000 CTAS, DELETE
    // negatives. OPTIMIZE/VACUUM are data-invariant.
    // rollback undoes the duplicate-append; the maintenance
    // procedures are content-neutral — end state is the whole table
    "lake_call_procs" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // the exact rendered text of SHOW CREATE TABLE (location line
    // dropped — machine-specific, require()d in-query), the property
    // map, the namespace's one view, and the namespace row
    "lake_show_ddl" ->
      """SELECT * FROM (VALUES
        |  ('create', 'CREATE TABLE sddldb.orders_s ('),
        |  ('create', '  o_orderkey BIGINT NOT NULL,'),
        |  ('create', '  o_orderstatus STRING,'),
        |  ('create', '  o_totalprice DOUBLE)'),
        |  ('create', 'USING graft'),
        |  ('create', 'PARTITIONED BY (o_orderstatus)'),
        |  ('create', 'TBLPROPERTIES ('),
        |  ('create', '  ''graft.constraint.pos'' = ''o_totalprice > 0'','),
        |  ('create', '  ''write.delete.mode'' = ''merge-on-read'')'),
        |  ('props', 'graft.constraint.pos=o_totalprice > 0'),
        |  ('props', 'write.delete.mode=merge-on-read'),
        |  ('views', 'v_s'),
        |  ('namespaces', 'sddldb')
        |) AS t(stmt, item)
        |ORDER BY stmt, item""".stripMargin,
    // same end state as lake_namespace_ddl: the catalog segment is
    // an addressing alias, every statement lands on the same table
    "lake_catalog_ddl" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_mktsegment = 'BUILDING'
        |         THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer),
        |merged AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    CASE WHEN c_acctbal > 5000 THEN 'RICH'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM upd)
        |SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM merged WHERE c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,
    "lake_namespace_ddl" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_mktsegment = 'BUILDING'
        |         THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer),
        |merged AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    CASE WHEN c_acctbal > 5000 THEN 'RICH'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM upd)
        |SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM merged WHERE c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,
    "lake_merge" ->
      """WITH base AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
        |src AS (SELECT c_custkey, c_name, c_nationkey,
        |               c_acctbal + 1000.0 AS c_acctbal,
        |               'MERGED' AS c_mktsegment
        |        FROM customer WHERE c_custkey % 3 = 0)
        |SELECT b.c_custkey,
        |       CASE WHEN s.c_custkey IS NULL THEN b.c_name ELSE s.c_name END AS c_name,
        |       CASE WHEN s.c_custkey IS NULL THEN b.c_nationkey ELSE s.c_nationkey END AS c_nationkey,
        |       CASE WHEN s.c_custkey IS NULL THEN b.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
        |       CASE WHEN s.c_custkey IS NULL THEN b.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment
        |FROM base b LEFT JOIN src s ON b.c_custkey = s.c_custkey
        |UNION ALL
        |SELECT s.* FROM src s WHERE NOT EXISTS
        |  (SELECT 1 FROM base b WHERE b.c_custkey = s.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "lake_merge_clauses" ->
      """WITH base AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
        |src AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
        |joined AS (
        |  SELECT b.c_custkey, b.c_name, b.c_nationkey,
        |    CASE WHEN s.c_custkey IS NOT NULL
        |         THEN b.c_acctbal + s.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
        |    CASE WHEN s.c_custkey IS NOT NULL
        |         THEN 'BUMPED' ELSE b.c_mktsegment END AS c_mktsegment,
        |    b.c_acctbal AS orig_bal, s.c_custkey AS sk
        |  FROM base b LEFT JOIN src s ON b.c_custkey = s.c_custkey),
        |kept AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM joined WHERE NOT (sk IS NOT NULL AND orig_bal < 0)),
        |ins AS (
        |  SELECT s.c_custkey, 'anon' AS c_name, CAST(-1 AS INT) AS c_nationkey,
        |         s.c_acctbal, 'NEW' AS c_mktsegment
        |  FROM src s WHERE s.c_custkey % 2 = 1 AND s.c_acctbal > 0)
        |SELECT * FROM kept UNION ALL SELECT * FROM ins
        |ORDER BY c_custkey""".stripMargin,
    "lake_delete" ->
      "SELECT * FROM orders WHERE o_orderstatus <> 'F' ORDER BY o_orderkey",
    "lake_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN o_totalprice * 2.0 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_time_travel" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey",
    "lake_time_travel_ts" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey",
    "lake_schema_evolution" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       CAST(NULL AS VARCHAR) AS tier
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |       'T' || CAST(c_custkey % 3 AS VARCHAR) AS tier
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,
    "lake_incremental" ->
      "SELECT * FROM orders WHERE o_orderkey % 3 = 2 ORDER BY o_orderkey",
    // the equality-delete feed, replayed: base = the create batch;
    // final = both pre-predicate batches minus their F rows, plus the
    // post-predicate batch IN FULL (out of the predicate's scope);
    // net changelog = symmetric EXCEPT ALL
    "lake_cdc_eqdel" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |ab AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 < 2),
        |final AS (
        |  SELECT * FROM ab WHERE o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 2),
        |ins AS (SELECT * FROM final EXCEPT ALL SELECT * FROM base),
        |del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM final)
        |SELECT *, 'insert' AS _change_type FROM ins
        |UNION ALL SELECT *, 'delete' AS _change_type FROM del
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    // replay the DML in SQL; net changelog = symmetric EXCEPT ALL
    "lake_cdc" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3),
        |s2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3 OR o_orderkey % 4 = 3),
        |s3 AS (SELECT * FROM s2 WHERE NOT (o_orderkey % 10 = 0)),
        |s4 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN 0.0 ELSE o_totalprice END AS o_totalprice
        |  FROM s3),
        |ins AS (SELECT * FROM s4 EXCEPT ALL SELECT * FROM base),
        |del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM s4)
        |SELECT *, 'insert' AS _change_type FROM ins
        |UNION ALL SELECT *, 'delete' AS _change_type FROM del
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    // identical scenario to lake_cdc, driven through SQL end to end
    "lake_cdc_sql" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3),
        |s2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3 OR o_orderkey % 4 = 3),
        |s3 AS (SELECT * FROM s2 WHERE NOT (o_orderkey % 10 = 0)),
        |s4 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN 0.0 ELSE o_totalprice END AS o_totalprice
        |  FROM s3),
        |ins AS (SELECT * FROM s4 EXCEPT ALL SELECT * FROM base),
        |del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM s4)
        |SELECT *, 'insert' AS _change_type FROM ins
        |UNION ALL SELECT *, 'delete' AS _change_type FROM del
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    // identical DML semantics again — merge-on-read emits tombstones
    // instead of rewrites, but the NET changelog is the same relation
    // scoped compaction never changes data
    "lake_compact_where" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // the %3=0 cohort plus the cherry-picked %3=2 append; the bad
    // %3=1 append stays rolled back
    "lake_cherry_pick" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey % 3 = 0 OR o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,
    // per-kind deleted-row totals: vector counted the F rows, the
    // position delete counted the cheap NON-F survivors (it scanned
    // the live view), equality is honestly NULL
    "lake_delete_files" ->
      """WITH base AS (
        |  SELECT * FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT 'equality' AS kind, CAST(NULL AS BIGINT) AS deleted_rows
        |UNION ALL SELECT 'position', COUNT(*) FROM base
        |  WHERE o_totalprice < 10000.0 AND NOT o_orderstatus = 'F'
        |UNION ALL SELECT 'vector', COUNT(*) FROM base
        |  WHERE o_orderstatus = 'F'
        |ORDER BY kind""".stripMargin,
    // identical history and changelog semantics as lake_cdc_mor —
    // the delete-file shape (bitmaps vs tombstones) must not leak
    "lake_cdc_dv" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3),
        |s2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3 OR o_orderkey % 4 = 3),
        |s3 AS (SELECT * FROM s2 WHERE NOT (o_orderkey % 10 = 0)),
        |s4 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN 0.0 ELSE o_totalprice END AS o_totalprice
        |  FROM s3),
        |ins AS (SELECT * FROM s4 EXCEPT ALL SELECT * FROM base),
        |del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM s4)
        |SELECT *, 'insert' AS _change_type FROM ins
        |UNION ALL SELECT *, 'delete' AS _change_type FROM del
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    "lake_cdc_mor" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3),
        |s2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 < 3 OR o_orderkey % 4 = 3),
        |s3 AS (SELECT * FROM s2 WHERE NOT (o_orderkey % 10 = 0)),
        |s4 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN 0.0 ELSE o_totalprice END AS o_totalprice
        |  FROM s3),
        |ins AS (SELECT * FROM s4 EXCEPT ALL SELECT * FROM base),
        |del AS (SELECT * FROM base EXCEPT ALL SELECT * FROM s4)
        |SELECT *, 'insert' AS _change_type FROM ins
        |UNION ALL SELECT *, 'delete' AS _change_type FROM del
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    // replay: MoR UPDATE doubles 'O' prices among evens, then the
    // MERGE deletes matched cheap-source rows, restamps the rest to
    // ('M', source price), and inserts the odd %3=0 keys
    "lake_pos_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base),
        |src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |merged AS (
        |  SELECT u.o_orderkey,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN 'M'
        |         ELSE u.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
        |         ELSE u.o_totalprice END AS o_totalprice,
        |    CASE WHEN s.o_orderkey IS NOT NULL
        |              AND s.o_totalprice < 100000.0
        |         THEN 1 ELSE 0 END AS del
        |  FROM upd u LEFT JOIN src s USING (o_orderkey)),
        |ins AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM merged WHERE del = 0
        |UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice FROM ins
        |ORDER BY o_orderkey""".stripMargin,
    // tombstoned rows drop from the %3<2 cohort; the post-delete
    // append (%3=2) survives whole even where it matches
    "lake_pos_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE (o_orderkey % 3 < 2
        |       AND NOT (o_orderstatus = 'F')
        |       AND NOT (o_totalprice < 10000.0))
        |   OR o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,
    // same statement semantics as lake_pos_merge — the vector style
    // swaps the old-image representation, not the DML result
    "lake_dv_dml" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base),
        |src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |merged AS (
        |  SELECT u.o_orderkey,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN 'M'
        |         ELSE u.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
        |         ELSE u.o_totalprice END AS o_totalprice,
        |    CASE WHEN s.o_orderkey IS NOT NULL
        |              AND s.o_totalprice < 100000.0
        |         THEN 1 ELSE 0 END AS del
        |  FROM upd u LEFT JOIN src s USING (o_orderkey)),
        |ins AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM merged WHERE del = 0
        |UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice FROM ins
        |ORDER BY o_orderkey""".stripMargin,
    // vectored rows drop from the %3<2 cohort; the post-delete
    // append (%3=2) survives whole even where it matches
    "lake_dv" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE (o_orderkey % 3 < 2
        |       AND NOT (o_orderstatus = 'F')
        |       AND NOT (o_orderkey % 5 = 0))
        |   OR o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,
    "lake_compaction" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_analyze" ->
      """SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
        | CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
        | COUNT(*) - COUNT(o_custkey) AS n_nulls,
        | MIN(o_custkey) AS min_v, MAX(o_custkey) AS max_v FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', COUNT(*),
        | CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
        | COUNT(*) - COUNT(o_orderkey),
        | MIN(o_orderkey), MAX(o_orderkey) FROM orders
        |ORDER BY col_name""".stripMargin,
    "lake_orphan_files" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_partitions" ->
      """SELECT o_orderstatus, CAST(month(o_orderdate) AS INT) AS o_month,
        | COUNT(*) AS row_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY o_orderstatus, o_month
        |ORDER BY o_orderstatus, o_month""".stripMargin,
    "lake_add_files" ->
      """SELECT * FROM customer WHERE c_custkey % 10 <> 0
        |ORDER BY c_custkey""".stripMargin,
    "lake_partitioned" ->
      "SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    // four modulo-appends reassemble the whole orders table; shard
    // pruning changes which manifests are PARSED, never the rows
    "lake_manifest_list" ->
      "SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    // parts 0/1 land unchanged (create + branch INSERT); part 2
    // arrives via the branch MERGE as inserts with price bumped +1;
    // fast-forward publishes the lot
    "lake_wap_branch" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 2 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // epochs 0/1 stored price_f as float4 (widened at scan), epoch 2
    // as double; price_d is an exact small integer at every scale, so
    // the decimal widening is rounding-free; double-cast at the
    // output boundary per SURVEY §5
    "lake_type_promotion" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 2 THEN o_totalprice
        |       ELSE CAST(CAST(o_totalprice AS REAL) AS DOUBLE) END
        |    AS price_f,
        |  CAST(CAST(o_orderkey % 1000 AS DECIMAL(18,2)) AS DOUBLE)
        |    AS price_d
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "lake_skipping" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    // the fact side of the dim-filtered join, runtime-pruned on the
    // Spark side (file skipping never changes the rows, only the scan)
    "lake_runtime_prune" ->
      """WITH dim AS (SELECT c_custkey, c_name, c_acctbal
        |             FROM customer
        |             ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
        |SELECT o.o_orderkey, o.o_custkey, d.c_name,
        |       o.o_totalprice, d.c_acctbal
        |FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // two name epochs: even custkeys wrote (…, c_mktsegment) pre-ALTER
    // and read NULL tier; odd custkeys wrote post-ADD with tier; the
    // rename + drop then reshape both epochs in metadata only
    "lake_alter" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |       c_mktsegment AS segment, CAST(NULL AS VARCHAR) AS tier
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_nationkey, c_acctbal,
        |       c_mktsegment AS segment,
        |       'T' || CAST(c_custkey % 3 AS VARCHAR) AS tier
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,
    "lake_hidden_partition" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |ORDER BY o_orderkey""".stripMargin,
    "lake_hour_partition" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 06:00:00'
        |  AND ts < TIMESTAMP '2024-01-01 12:00:00'
        |ORDER BY event_id""".stripMargin,
    "lake_partition_evolution" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    // the fast-forwarded main = initial load + both branch appends
    "lake_branch" ->
      """SELECT * FROM orders WHERE o_orderkey % 4 <= 2
        |ORDER BY o_orderkey""".stripMargin,
    // published end state: slices 0-1, the branch UPDATE (+1 on the
    // %4=1 survivors) applied, the %8=1 rows branch-DELETEd. The
    // UPDATE ran before the DELETE, so every surviving %4=1 row
    // (⇔ %8=5) carries the bump.
    "lake_branch_sql" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 4 = 1 THEN o_totalprice + 1
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 IN (0, 1) AND o_orderkey % 8 <> 1
        |ORDER BY o_orderkey""".stripMargin,
    // the manifest's per-partition record counts must equal the
    // GROUP BY recomputed from the actual rows
    "lake_metadata" ->
      """SELECT o_orderstatus, count(*) AS row_count
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // post-compaction the whole table is ADDED by the rewrite; the
    // manifest row counts must sum to the data
    // the end state is the post-rollback head: a rollback commit
    // CARRIES the compaction's files by reference, so every entry is
    // EXISTING (added by the compaction snapshot, listed by the
    // rollback's)
    "lake_entries" ->
      """SELECT 'EXISTING' AS status, count(*) AS n_rows FROM orders""",
    "lake_sort_compact" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        |ORDER BY o_orderkey""".stripMargin,
    "lake_zorder" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-07-01'
        |  AND o_totalprice <= 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    // batches 0 and 1 lose their 'F' rows to the scoped delete; batch
    // 2 was appended after it and keeps everything
    "lake_mor_delete" ->
      """SELECT * FROM orders
        |WHERE o_orderkey % 3 = 2 OR o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "lake_expire" ->
      "SELECT * FROM orders WHERE o_orderkey % 3 = 1 ORDER BY o_orderkey",
    "lake_expire_age" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    // composed expiry is metadata-only here (the head carries every
    // file): end state = the intact five-slice table
    "lake_expire_composed" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    // deletes (COW %30 at snap 5, position-tombstone %12==6 at snap
    // 7) carry the RANGE-START old image p; updates carry the final
    // image
    "lake_cdc_lineage" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DOUBLE) AS p FROM orders
        |  WHERE o_orderkey % 3 IN (0, 1)),
        |f AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 30 = 0 THEN p
        |         WHEN o_orderkey % 12 = 6 THEN p
        |         WHEN o_orderstatus = 'F' THEN p * 2
        |         WHEN o_orderstatus = 'O' THEN p + 1
        |         ELSE NULL END AS price,
        |    CASE WHEN o_orderkey % 30 = 0 THEN 'delete'
        |         WHEN o_orderkey % 12 = 6 THEN 'delete'
        |         WHEN o_orderstatus IN ('F', 'O') THEN 'update'
        |         ELSE NULL END AS _change_type
        |  FROM base)
        |SELECT o_orderkey, price, _change_type FROM f
        |WHERE _change_type IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    // the keyed eq-delete feed, replayed: deletes = batch-1 F rows
    // (range-start image); updates = the %30==3 survivors (doubled
    // price — final image); inserts = batch 2 IN FULL (the predicate
    // scopes only files with a lower add-sequence)
    "lake_cdc_eqdel_lineage" ->
      """WITH b0 AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DOUBLE) AS p FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |b1 AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DOUBLE) AS p FROM orders
        |  WHERE o_orderkey % 3 = 1)
        |SELECT o_orderkey, p AS price, 'delete' AS _change_type
        |FROM b0 WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, p * 2, 'update' FROM b0
        |WHERE o_orderkey % 30 = 3 AND o_orderstatus <> 'F'
        |UNION ALL
        |SELECT o_orderkey, p, 'insert' FROM b1
        |ORDER BY o_orderkey""".stripMargin,
    // the rename is metadata-only, so the end state is exactly the
    // created+appended+updated data, whatever the table is named
    "lake_rename" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 50.0
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "lake_replace" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,
    // which keys were last touched by which statement is pure
    // content: F rows were UPDATEd (seq 4), the rest keep their
    // insert sequence (2 or 3); %30 rows were DELETEd
    // snap 8 position-DELETEs key%50==3; snap 9 position-UPDATEs
    // status P — the tombstone DML cohorts stack on the COW ones
    "lake_row_lineage" ->
      """WITH live AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'P' THEN 9
        |         WHEN o_orderkey % 7 = 0 THEN 6
        |         WHEN o_orderstatus = 'F' THEN 4
        |         WHEN o_orderkey % 3 = 0 THEN 2
        |         ELSE 3 END AS seq
        |  FROM orders
        |  WHERE ((o_orderkey % 3 IN (0, 1) AND o_orderkey % 30 <> 0)
        |     OR o_orderkey % 7 = 0)
        |    AND o_orderkey % 50 <> 3)
        |SELECT CAST(seq AS BIGINT) AS last_seq,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM live GROUP BY seq ORDER BY last_seq""".stripMargin,
    "lake_overwrite_partition" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2.0
        |      ELSE o_totalprice END AS o_totalprice,
        | o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // O overwritten via static-spec OVERWRITE, P = seed (src
    // backfilled by the ADD COLUMN initial-default), F = column-list
    // INSERT (NULL price, write-DEFAULT src), X = static-spec INSERT
    "lake_insert_spec" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'O' AS o_orderstatus,
        |         o_totalprice * 2 AS o_totalprice, 'replaced' AS src
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'seed'
        |  FROM orders WHERE o_orderstatus = 'P'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE), 'seed'
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, 'X', o_totalprice, 'staged'
        |  FROM orders WHERE o_orderstatus = 'P'
        |) ORDER BY o_orderkey, o_orderstatus""".stripMargin,
    "lake_truncate" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus <> 'F' ORDER BY o_orderkey""".stripMargin,
    // the exact row text of DESCRIBE / SHOW TABLES / SHOW PARTITIONS
    // over a status-partitioned 3-column orders table — schema rows,
    // the partition-information block (the partition column repeats
    // there, as in Spark's own DESCRIBE), the two-table namespace
    // listing, and the three live status partitions
    "lake_describe" ->
      """SELECT * FROM (VALUES
        |  ('describe', '# Partition Information', ''),
        |  ('describe', '# col_name', 'data_type'),
        |  ('describe', 'o_orderkey', 'bigint'),
        |  ('describe', 'o_orderstatus', 'string'),
        |  ('describe', 'o_orderstatus', 'string'),
        |  ('describe', 'o_totalprice', 'double'),
        |  ('show_partitions', 'o_orderstatus=F', ''),
        |  ('show_partitions', 'o_orderstatus=O', ''),
        |  ('show_partitions', 'o_orderstatus=P', ''),
        |  ('show_tables', 'nation_d', 'descdb'),
        |  ('show_tables', 'orders_d', 'descdb')
        |) AS t(stmt, item, detail)
        |ORDER BY stmt, item, detail""".stripMargin,
    // violating writes refused (no commit); the NULL row lands only
    // after DROP NOT NULL, plus one conforming insert at the end
    "lake_not_null" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT CAST(9999991 AS BIGINT), 'X',
        |    CAST(NULL AS DOUBLE)
        |  UNION ALL SELECT CAST(9999992 AS BIGINT), 'X', 1.0
        |) ORDER BY o_orderkey""".stripMargin,
    // even seed + odd insert under the constraint, violating writes
    // refused (no commit), then the post-DROP violating row lands
    "lake_constraint" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  UNION ALL SELECT CAST(9999991 AS BIGINT), -5.0
        |) ORDER BY o_orderkey""".stripMargin,
    // k<10 COW-deleted on the shredded path, 'view' deleted on the
    // residual path, final read filters the shredded hot path
    "lake_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k,
        |  event_type AS lvl
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INT) >= 50
        |  AND event_type <> 'view'
        |ORDER BY event_id""".stripMargin,
    // same end state as lake_dml_subquery: every order's custkey has
    // a customer row, so EXISTS(seg) ≡ IN(seg keys) on this data —
    // BUILDING deleted, AUTOMOBILE >100k doubled, non-3-segment gone
    "lake_dml_exists" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
        |        AND o.o_totalprice > 100000
        |       THEN o.o_totalprice * 2 ELSE o.o_totalprice
        |  END AS o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment IN ('AUTOMOBILE','HOUSEHOLD','FURNITURE')
        |ORDER BY o.o_orderkey""".stripMargin,
    // BUILDING deleted (IN), AUTOMOBILE >100k doubled (IN + residual),
    // then everything outside the three segments deleted (NOT IN)
    "lake_dml_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
        |        AND o.o_totalprice > 100000
        |       THEN o.o_totalprice * 2 ELSE o.o_totalprice
        |  END AS o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment IN ('AUTOMOBILE','HOUSEHOLD','FURNITURE')
        |ORDER BY o.o_orderkey""".stripMargin,
    "lake_partition_field_ddl" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_rollback" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey",
    "lake_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    "lake_spj_dpp" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY o.o_orderkey""".stripMargin,
    // the clone forked before the source's +100 append, then deleted F
    "lake_clone" ->
      """SELECT * FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,
    // evens lost their F rows to the scoped equality delete; odds
    // were appended after it and keep theirs
    "lake_spj_eqdel" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE (o.o_orderkey % 2 = 0 AND o.o_orderstatus <> 'F')
        |   OR o.o_orderkey % 2 = 1
        |ORDER BY o.o_orderkey""".stripMargin,
    // the pinned tag predates the odd-key append
    "lake_spj_pinned" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 2 = 0
        |ORDER BY o.o_orderkey""".stripMargin,
    // the MoR-deleted status is absent from the zero-Exchange join
    "lake_spj_mor" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus <> 'F'
        |ORDER BY o.o_orderkey""".stripMargin,
    // matched (%3=0): balance bumped; unmatched negatives deleted;
    // remaining unmatched marked STALE
    "lake_merge_source" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000.0
        |       ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment
        |       ELSE 'STALE' END AS c_mktsegment
        |FROM customer
        |WHERE c_custkey % 3 = 0 OR c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,
    "lake_spj_string" ->
      """SELECT o.o_orderkey, CAST(o.o_custkey AS VARCHAR) AS o_cust_id,
        |       c.c_name
        |FROM orders o JOIN customer c
        |  ON CAST(o.o_custkey AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
        |ORDER BY o.o_orderkey""".stripMargin,
    "lake_spj_composite" ->
      """SELECT e.o_custkey, count(*) AS pairs,
        |       CAST(sum(CAST(e.o_totalprice AS DECIMAL(18,2)))
        |            AS DOUBLE) AS sum_price
        |FROM (SELECT o_custkey, o_totalprice FROM orders
        |      WHERE o_orderkey % 2 = 0
        |        AND o_orderdate >= TIMESTAMP '2001-01-01') e
        |JOIN (SELECT o_custkey FROM orders
        |      WHERE o_orderkey % 2 = 1
        |        AND o_orderdate >= TIMESTAMP '2000-01-01') r
        |  ON e.o_custkey = r.o_custkey
        |GROUP BY e.o_custkey
        |ORDER BY e.o_custkey""".stripMargin,
    "lake_skipping_or" ->
      """SELECT * FROM orders
        |WHERE o_orderdate < TIMESTAMP '1994-01-01'
        |   OR o_orderdate >= TIMESTAMP '1996-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    // base (%4=0) + three appends (%4=1,2,3) = the whole table; the
    // binpack rewrite must preserve every row exactly
    "lake_binpack" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    // pre-add rows (even custkeys) read the default; post-add rows
    // keep their written values, including the explicit NULLs
    "lake_add_default" ->
      """SELECT c_custkey, c_name, c_acctbal, 'STANDARD' AS tier
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal,
        |       CASE WHEN c_custkey % 3 = 0 THEN NULL
        |            ELSE 'T' || CAST(c_custkey % 3 AS VARCHAR) END
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,
    // epoch 1 (%3=0): written before info.tier existed → NULL tier;
    // epoch 2 (%3=1): tier = 'T1' (custkey%3 of that epoch); epoch 3
    // (%3=2): written post-rename/drop with constant tier 'T9'. bal
    // reads as balance across all epochs via the nested name mapping.
    // per epoch: postal = zip bytes read through the grandchild
    // rename (NULL when geo was born NULL: c_custkey % 7 = 0);
    // region NULL for epoch-1 files (added later), 'R'||(k%2) for
    // epoch 2, 'R9' for epoch 3 — all NULL when geo is NULL
    "lake_alter_nested" ->
      """SELECT c_custkey, c_acctbal AS balance,
        |       CAST(NULL AS VARCHAR) AS tier,
        |       CASE WHEN c_custkey % 7 = 0 THEN NULL
        |            ELSE CAST(c_custkey % 1000 AS INT) END AS postal,
        |       CAST(NULL AS VARCHAR) AS region
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_acctbal, 'T1',
        |       CASE WHEN c_custkey % 7 = 0 THEN NULL
        |            ELSE CAST(c_custkey % 1000 AS INT) END,
        |       CASE WHEN c_custkey % 7 = 0 THEN NULL
        |            ELSE 'R' || CAST(c_custkey % 2 AS VARCHAR) END
        |FROM customer WHERE c_custkey % 3 = 1
        |UNION ALL
        |SELECT c_custkey, c_acctbal, 'T9',
        |       CASE WHEN c_custkey % 7 = 0 THEN NULL
        |            ELSE CAST(c_custkey % 1000 AS INT) END,
        |       CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE 'R9' END
        |FROM customer WHERE c_custkey % 3 = 2
        |ORDER BY c_custkey""".stripMargin
  )
}
