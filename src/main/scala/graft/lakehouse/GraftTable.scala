package graft.lakehouse

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** An immutable-snapshot view of a [[GraftTable]]. */
final case class Snapshot(
    id: Long,
    parent: Long,
    op: String,
    schema: StructType,
    files: Seq[String],
    partitionCols: Seq[String] = Nil)

/** Iceberg-equivalent lakehouse table format on plain parquet
  * (ref: the governed Iceberg tables the sample provisions in
  * `producer_account_setup/producer_iceberg_datalake_setup.sh:118-150`
  * — partitioned, ACID, MERGE/UPDATE/DELETE, snapshot time travel,
  * schema evolution).
  *
  * Layout under `root`:
  * {{{
  *   data/commit-00001/part-*.parquet     immutable data files
  *   _graft_meta/snap-00001.meta          one manifest per snapshot
  * }}}
  *
  * A snapshot is a manifest: the list of data files plus the schema
  * current at commit time. Commits are copy-on-write, Iceberg-style:
  * DELETE / UPDATE / MERGE first compute the *affected file set* (the
  * data files that actually contain matching rows, discovered with a
  * distributed scan over `input_file_name`), rewrite only those files,
  * and carry every untouched file forward by reference. At 100 TB this
  * is the property that matters — a DELETE touching 0.1% of files
  * rewrites 0.1% of the data, metadata stays O(#files) on the driver
  * (exactly Iceberg's manifest model), and unchanged files keep their
  * row-group statistics for pruning. All paths go through the Hadoop
  * `FileSystem` API, so `root` may be HDFS/S3A in a cluster deployment.
  *
  * Concurrency: a commit is "write manifest to a temp name, then
  * atomic rename". Single-writer here; a multi-writer deployment would
  * CAS the rename and retry on conflict (Iceberg's optimistic model).
  */
final class GraftTable(val spark: SparkSession, rootStr: String) {
  private val root = new Path(rootStr)
  private val fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val metaDir = new Path(root, "_graft_meta")

  // ---- metadata ----------------------------------------------------

  private def snapPath(id: Long) = new Path(metaDir, f"snap-$id%05d.meta")

  def currentSnapshotId: Long =
    if (!fs.exists(metaDir)) 0L
    else
      fs.listStatus(metaDir)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("snap-") && n.endsWith(".meta") =>
          n.stripPrefix("snap-").stripSuffix(".meta").toLong
        }
        .foldLeft(0L)(math.max)

  def snapshot(id: Long): Snapshot = {
    val in = fs.open(snapPath(id))
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val kv = text.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      (line.substring(0, i), line.substring(i + 1))
    }.toSeq
    def one(k: String) = kv.collectFirst { case (`k`, v) => v }.get
    Snapshot(
      id = id,
      parent = one("parent").toLong,
      op = one("op"),
      schema = DataType.fromJson(one("schema")).asInstanceOf[StructType],
      files = kv.collect { case ("file", v) => v },
      partitionCols = kv.collectFirst { case ("partcols", v) => v }
        .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil))
  }

  def currentSnapshot: Snapshot = snapshot(currentSnapshotId)

  /** All live snapshots, oldest first. */
  def snapshots: Seq[Snapshot] =
    if (!fs.exists(metaDir)) Nil
    else fs.listStatus(metaDir)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("snap-") && n.endsWith(".meta") =>
        n.stripPrefix("snap-").stripSuffix(".meta").toLong
      }
      .sorted
      .map(snapshot)
      .toSeq

  private def commit(op: String, schema: StructType, files: Seq[String],
      partitionCols: Seq[String] = Nil): Long = {
    val id = currentSnapshotId + 1
    val body = new StringBuilder
    body ++= s"parent=${id - 1}\n"
    body ++= s"op=$op\n"
    body ++= s"schema=${schema.json}\n"
    body ++= s"partcols=${partitionCols.mkString(",")}\n"
    files.foreach(f => body ++= s"file=$f\n")
    val tmp = new Path(metaDir, f"snap-$id%05d.meta.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, snapPath(id)), // atomic publish
      s"commit $id failed: could not publish manifest")
    id
  }

  // ---- reads -------------------------------------------------------

  def read(): DataFrame = readAt(currentSnapshotId)

  /** Time travel: read the table as of snapshot `id`. The snapshot's
    * own schema is applied, so data files written before a column was
    * added surface NULL for it (parquet reads are by-name). */
  def readAt(id: Long): DataFrame = {
    val snap = snapshot(id)
    readFiles(snap.schema, snap.files, snap.partitionCols)
  }

  /** Partition-pruned read: keep only data files whose hive-style
    * path carries `partCol=v` for some `v` in `values`. The pruning
    * decision is made on the manifest alone — O(#files) driver-side,
    * no storage listing, no file opens — which is the Iceberg-style
    * metadata win this format exists for: at 100 TB a query for one
    * partition reads that partition, not the directory tree. */
  def readPruned(partCol: String, values: Set[String]): DataFrame = {
    val snap = currentSnapshot
    require(snap.partitionCols.contains(partCol),
      s"$partCol is not a partition column of ${snap.partitionCols}")
    val wanted = values.map(v => hiveSegment(partCol, v))
    val kept = snap.files.filter(f =>
      new Path(f).toUri.getPath.split("/").exists(wanted.contains))
    readFiles(snap.schema, kept, snap.partitionCols)
  }

  private def readFiles(schema: StructType, files: Seq[String],
      partitionCols: Seq[String] = Nil): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else if (partitionCols.isEmpty)
      spark.read.schema(schema).parquet(files: _*)
    else {
      // Partition values live in the directory names under each
      // commit dir; `basePath` must be the commit dir for Spark to
      // reconstitute them, so group files per commit and union.
      files.groupBy(commitDirOf).toSeq.sortBy(_._1).map { case (base, fs) =>
        spark.read.option("basePath", base).schema(schema).parquet(fs: _*)
      }.reduce(_.unionByName(_))
    }

  /** A `col=value` path segment exactly as Spark's hive-style writer
    * lays it out (escaped; NULL becomes the default-partition dir). */
  private def hiveSegment(col: String, value: Any): String = {
    val v =
      if (value == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(value.toString)
    s"$col=$v"
  }

  private def commitDirOf(file: String): String = {
    var p = new Path(file).getParent
    while (p != null && !p.getName.startsWith("commit-")) p = p.getParent
    require(p != null, s"file outside a commit dir: $file")
    p.toString
  }

  /** Incremental read: rows in data files added after `fromId` up to
    * and including `toId` (append-style commits; a CDC feed over
    * replace commits would additionally diff removed files). */
  def incrementalRead(fromId: Long, toId: Long): DataFrame = {
    val from = snapshot(fromId).files.toSet
    val to = snapshot(toId)
    readFiles(to.schema, to.files.filterNot(from), to.partitionCols)
  }

  // ---- writes ------------------------------------------------------

  private def writeData(df: DataFrame, commitId: Long,
      partitionCols: Seq[String] = Nil, widen: Boolean = true): Seq[String] = {
    val dir = new Path(root, f"data/commit-$commitId%05d")
    // A rewrite sourced from one or two input files would otherwise
    // serialize the whole write on one core (local small-file reads
    // arrive as a single split); on a cluster the input is already
    // wide and this is a no-op. Capped at 8-way: full session
    // parallelism just multiplies manifest entries and small files
    // for the write sizes a single commit sees. compact() opts out —
    // its output file count is the caller's explicit choice.
    val par = math.min(8, df.sparkSession.sparkContext.defaultParallelism)
    val wide =
      if (widen && df.rdd.getNumPartitions < par) df.repartition(par) else df
    val w = wide.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir.toString)
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        out += p.toString
    }
    out.result().sorted
  }

  /** Align `df` to `schema` by name AND type: identical types pass
    * through, safely-widenable ones (INT→BIGINT, FLOAT→DOUBLE, …) are
    * cast, anything else is rejected. Without the cast, an INT column
    * appended into a BIGINT table would *commit* parquet whose
    * physical types contradict the manifest schema — the write
    * succeeds and later reads fail or misread (the round-2 ADVICE
    * finding). Same upcast-only contract as Iceberg's write check. */
  private def aligned(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fieldNames.toIndexedSeq.map { name =>
      val field = schema(name)
      val in = df.schema(name).dataType
      if (in == field.dataType) col(name)
      else if (org.apache.spark.sql.catalyst.expressions.Cast
          .canUpCast(in, field.dataType))
        col(name).cast(field.dataType).as(name)
      else throw new IllegalArgumentException(
        s"column '$name': ${in.simpleString} cannot be safely written " +
          s"as table type ${field.dataType.simpleString}")
    }: _*)

  def append(df: DataFrame): Long = append(df, Nil)

  private[lakehouse] def append(df: DataFrame, createPartitionCols: Seq[String]): Long = {
    val snap = if (currentSnapshotId == 0) None else Some(currentSnapshot)
    val schema = snap.map(_.schema).getOrElse(df.schema)
    val parts = snap.map(_.partitionCols).getOrElse(createPartitionCols)
    val id = currentSnapshotId + 1
    val files = writeData(aligned(df, schema), id, parts)
    commit("append", schema, snap.map(_.files).getOrElse(Nil) ++ files, parts)
  }

  /** Append rows whose schema adds columns: the table schema evolves
    * to the union (existing fields keep their position and type; new
    * fields append). Older files read back NULL for the new columns. */
  def appendEvolved(df: DataFrame): Long = {
    val snap = currentSnapshot
    val added = df.schema.fields.filterNot(f => snap.schema.fieldNames.contains(f.name))
    val schema = StructType(snap.schema.fields ++ added.map(_.copy(nullable = true)))
    val id = currentSnapshotId + 1
    val files = writeData(aligned(df, schema), id, snap.partitionCols)
    commit("append", schema, snap.files ++ files, snap.partitionCols)
  }

  def overwrite(df: DataFrame): Long = {
    val snap = currentSnapshot
    val id = currentSnapshotId + 1
    commit("overwrite", df.schema,
      writeData(df, id, snap.partitionCols), snap.partitionCols)
  }

  // ---- copy-on-write DML -------------------------------------------

  /** `file:/x` vs `file:///x` vs plain `/x` all normalize to `/x`. */
  private def normalize(p: String): String = new Path(p).toUri.getPath

  /** The data files that contain at least one row matching `hit` —
    * one distributed pass, shipping only distinct file names back.
    * (Iceberg prunes with manifest min/max stats first; the scan here
    * is the exact fallback and still reads only the scanned columns.) */
  private def affectedFiles(snap: Snapshot, hit: DataFrame => DataFrame): Set[String] =
    hit(readFiles(snap.schema, snap.files, snap.partitionCols)
      .withColumn("_graft_file", input_file_name()))
      .select("_graft_file")
      .distinct()
      .collect()
      .map(r => normalize(r.getString(0)))
      .toSet

  private def partitionFiles(snap: Snapshot, affected: Set[String]) =
    snap.files.partition(f => !affected(normalize(f)))

  /** DELETE FROM t WHERE pred — rewrites only files containing hits. */
  def delete(predSql: String): Long = {
    val p = expr(predSql)
    val snap = currentSnapshot
    val (keep, rewrite) = partitionFiles(snap, affectedFiles(snap, _.filter(p)))
    val id = currentSnapshotId + 1
    val newFiles =
      if (rewrite.isEmpty) Nil
      else writeData(
        // NULL-predicate rows must survive a DELETE (SQL semantics):
        // not(NULL) is NULL and would silently drop them from
        // rewritten files only.
        readFiles(snap.schema, rewrite, snap.partitionCols)
          .filter(not(coalesce(p, lit(false)))),
        id, snap.partitionCols)
    commit("delete", snap.schema, keep ++ newFiles, snap.partitionCols)
  }

  /** UPDATE t SET col = expr, ... WHERE pred (copy-on-write). */
  def update(assignments: Map[String, String], predSql: String): Long = {
    val p = expr(predSql)
    val snap = currentSnapshot
    val (keep, rewrite) = partitionFiles(snap, affectedFiles(snap, _.filter(p)))
    val id = currentSnapshotId + 1
    val newFiles =
      if (rewrite.isEmpty) Nil
      else {
        val updated = readFiles(snap.schema, rewrite, snap.partitionCols).select(
          snap.schema.fieldNames.map { c =>
            assignments.get(c) match {
              case Some(e) => when(p, expr(e)).otherwise(col(c)).cast(snap.schema(c).dataType).as(c)
              case None    => col(c)
            }
          }: _*)
        writeData(updated, id, snap.partitionCols)
      }
    commit("update", snap.schema, keep ++ newFiles, snap.partitionCols)
  }

  /** MERGE INTO t USING source ON t.key = s.key
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
    * the upsert the reference issues against its Iceberg tables.
    * Affected files are found with a LEFT SEMI join on the key (only
    * `(key, file)` pairs shuffle, never row bodies); matched rows are
    * replaced by the source row, unmatched source rows are appended.
    * At scale Catalyst/AQE picks broadcast vs shuffle join on its own.
    */
  def merge(source: DataFrame, key: String): Long = {
    val snap = currentSnapshot
    val cols = snap.schema.fieldNames.toSeq
    require(source.columns.sorted.toSeq == cols.sorted,
      s"merge source schema ${source.columns.mkString(",")} != table ${cols.mkString(",")}")
    val src = aligned(source, snap.schema)
    // Iceberg/Delta cardinality rule: a source with two rows for one
    // key would silently duplicate every matched target row through
    // the left join below and insert both unmatched copies — fail the
    // commit instead. One bounded aggregation over the (small) source;
    // at scale this folds into the same scan as srcKeys.
    val dup = src.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge source has duplicate rows for key '$key' " +
        s"(e.g. $key=${dup.headOption.map(_.get(0)).orNull}): " +
        "each target row must match at most one source row")
    val srcKeys = src.select(key).distinct()
    val affected = affectedFiles(snap, _.join(srcKeys, Seq(key), "left_semi"))
    val (keep, rewrite) = partitionFiles(snap, affected)
    val id = currentSnapshotId + 1

    val marked = src.select(
      col(key) +: cols.filterNot(_ == key).map(c => col(c).as(s"_s_$c")) :+
        lit(true).as("_graft_matched"): _*)
    val updated =
      if (rewrite.isEmpty) None
      else Some(
        readFiles(snap.schema, rewrite, snap.partitionCols)
          .join(marked, Seq(key), "left")
          .select(cols.map { c =>
            if (c == key) col(c)
            else when(col("_graft_matched").isNotNull, col(s"_s_$c"))
              .otherwise(col(c)).as(c)
          }: _*))
    val inserted = src
      .join(readFiles(snap.schema, snap.files, snap.partitionCols)
        .select(key), Seq(key), "left_anti")
      .select(cols.map(col): _*)
    val newData = updated.map(_.unionByName(inserted)).getOrElse(inserted)
    commit("merge", snap.schema,
      keep ++ writeData(newData, id, snap.partitionCols), snap.partitionCols)
  }

  /** Small-file compaction: rewrite the whole file set into
    * `numFiles` files; data is unchanged, snapshot history preserved.
    * (A production pass would bin-pack per partition instead of a
    * global repartition.) */
  def compact(numFiles: Int): Long = {
    val snap = currentSnapshot
    val id = currentSnapshotId + 1
    commit("compact", snap.schema,
      writeData(
        readFiles(snap.schema, snap.files, snap.partitionCols)
          .repartition(numFiles),
        id, snap.partitionCols, widen = false),
      snap.partitionCols)
  }

  /** Dynamic partition overwrite (Iceberg's `REPLACE WHERE` /
    * Spark's `partitionOverwriteMode=dynamic`): replace exactly the
    * partitions present in `df`, carry every other partition's files
    * forward by reference. The replaced-partition set is discovered
    * from `df` itself with one distinct on the (tiny) partition
    * columns. Partition values must be hive-path-representable
    * (string/integral — true of any sane partition scheme). */
  def overwritePartitions(df: DataFrame): Long = {
    val snap = currentSnapshot
    require(snap.partitionCols.nonEmpty, "table is not partitioned")
    val parts = snap.partitionCols
    val replaced: Set[Seq[String]] = df.select(parts.map(col): _*)
      .distinct().collect()
      .map(r => parts.indices.map(i => hiveSegment(parts(i), r.get(i))))
      .toSet
    val keep = snap.files.filterNot { f =>
      val segs = new Path(f).toUri.getPath.split("/").toSet
      replaced.exists(_.forall(segs.contains))
    }
    val id = currentSnapshotId + 1
    commit("overwrite_partitions", snap.schema,
      keep ++ writeData(aligned(df, snap.schema), id, parts),
      parts)
  }

  /** Roll the table back to snapshot `id`: a NEW commit whose file
    * list and schema are those of the old snapshot (Iceberg's
    * rollback — history is preserved, nothing is deleted, and the
    * bad commits remain inspectable via time travel). */
  def rollback(id: Long): Long = {
    val snap = snapshot(id)
    commit("rollback", snap.schema, snap.files, snap.partitionCols)
  }

  /** Expire all snapshots but the newest `keepLast`, physically
    * deleting data files no surviving snapshot references (Iceberg's
    * `expireSnapshots` — the operation that keeps time travel from
    * meaning infinite storage). */
  def expireSnapshots(keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val all = snapshots // only manifests that still exist
    val (expired, kept) = all.splitAt(math.max(0, all.size - keepLast))
    if (expired.isEmpty) return
    val live = kept.flatMap(_.files).toSet
    expired.foreach { snap =>
      snap.files.filterNot(live).foreach(f => fs.delete(new Path(f), false))
      fs.delete(snapPath(snap.id), false)
    }
  }
}

object GraftTable {
  /** Create a new table at `root` seeded with `df` (snapshot 1),
    * optionally hive-partitioned by `partitionBy`. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): GraftTable = {
    val t = new GraftTable(spark, root)
    require(t.currentSnapshotId == 0, s"table already exists at $root")
    t.append(df, partitionBy)
    t
  }

  def load(spark: SparkSession, root: String): GraftTable =
    new GraftTable(spark, root)
}
