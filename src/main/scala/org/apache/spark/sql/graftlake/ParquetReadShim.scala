package org.apache.spark.sql.graftlake

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The `private[sql]` touchpoints a DataSource-v2 batch reader needs
  * to reuse Spark's own parquet decode path instead of reimplementing
  * parquet→Catalyst conversion: `FileFormat.buildReaderWithPartitionValues`
  * (the exact closure `FileSourceScanExec` serializes into its scan
  * tasks) and the `PartitionedFile` descriptor it consumes. Lives
  * under `org.apache.spark.sql` solely to satisfy those access
  * qualifiers — the same pattern as [[StreamShim]].
  */
/** `SerializableConfiguration` is `private[spark]`; executor-side
  * file stats (the size-backfill pass) need the session's Hadoop conf
  * shipped into tasks. Same access-qualifier rationale as the rest of
  * this package. */
object HadoopConfShim {
  def serializable(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}

object ParquetReadShim {

  /** A serializable per-file read function for parquet files of
    * `dataSchema`, producing rows of `requiredSchema` (column-pruned
    * scans pass the pruned schema; files missing a column surface
    * NULL, by-name like the engine's `spark.read.schema` path).
    *
    * Built with the VECTORIZED reader OFF (flipped around the
    * closure-build only): the vectorized path yields ColumnarBatch
    * disguised as InternalRow, which is only consumable by an
    * operator that knows to expect it; the row path is universally
    * safe for a `PartitionReader[InternalRow]`. Scans whose schema
    * passes [[columnarSupported]] take [[columnarReadFunc]] instead —
    * this closure is the fallback for types the vectorized reader
    * cannot batch. */
  /** A clone of `spark` with the vectorized-reader conf pinned to
    * `vectorized` — closure builds must NOT flip the conf on the
    * SHARED session (a query planned concurrently during that window
    * would observe the flipped value and hand a row consumer a
    * ColumnarBatch iterator, or vice versa). `cloneSession` copies
    * the session state (confs included) over the same SparkContext,
    * so the pin is invisible to every other planner.
    *
    * CACHED per (underlying session, vectorized flag): cloning full
    * session state per scan-factory build is measurable planner
    * overhead. The cache is NOT allowed to freeze the parent's
    * runtime confs (timezone, rebase modes, binaryAsString — all of
    * which steer parquet decode): each entry remembers the parent's
    * conf map at clone time and rebuilds when it has changed, so an
    * SPJ read always decodes under the same settings a plain read
    * would. Weak keys let a stopped session's clones be collected —
    * and the VALUES hold the clones only via SoftReference: a clone's
    * state can transitively reference its parent session, so a strong
    * value would pin the weak key and the cache would never release a
    * stopped session. A collected clone just rebuilds on next use. */
  private final case class Pinned(confs: Map[String, String],
      byVectorized: scala.collection.mutable.Map[
        Boolean, java.lang.ref.SoftReference[ClassicSession]])
  private val pinnedCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Pinned]())
  private def pinnedSession(spark: SparkSession,
      vectorized: Boolean): ClassicSession = {
    val parentConfs =
      spark.asInstanceOf[ClassicSession].sessionState.conf.getAllConfs
    val entry = pinnedCache.synchronized {
      var p = pinnedCache.get(spark)
      if (p == null || p.confs != parentConfs) {
        p = Pinned(parentConfs,
          scala.collection.mutable.Map.empty)
        pinnedCache.put(spark, p)
      }
      p
    }
    entry.byVectorized.synchronized {
      entry.byVectorized.get(vectorized).flatMap(r => Option(r.get()))
        .getOrElse {
          val clone = spark.asInstanceOf[ClassicSession].cloneSession()
          clone.conf.set("spark.sql.parquet.enableVectorizedReader",
            vectorized.toString)
          entry.byVectorized.update(vectorized,
            new java.lang.ref.SoftReference(clone))
          clone
        }
    }
  }

  def rowReadFunc(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType): PartitionedFile => Iterator[InternalRow] = {
    val pinned = pinnedSession(spark, vectorized = false)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = pinned,
      dataSchema = dataSchema,
      partitionSchema = new StructType(),
      requiredSchema = requiredSchema,
      filters = Nil,
      options = Map.empty,
      hadoopConf = pinned.sessionState.newHadoopConf())
  }

  /** Whether the vectorized parquet reader can serve `schema` whole
    * (all atomic types) — the gate for [[columnarReadFunc]]. */
  def columnarSupported(spark: SparkSession, schema: StructType): Boolean = {
    val classic = spark.asInstanceOf[ClassicSession]
    org.apache.spark.sql.execution.datasources.parquet.ParquetUtils
      .isBatchReadSupportedForSchema(classic.sessionState.conf, schema)
  }

  /** The COLUMNAR variant of [[rowReadFunc]]: built with the
    * vectorized reader forced ON, so each returned element is a
    * `ColumnarBatch` (the closure's static type lies — the same
    * contract `FileSourceScanExec` consumes). Callers must gate on
    * [[columnarSupported]]; reader cleanup rides the task-completion
    * listeners the closure registers itself. */
  def columnarReadFunc(spark: SparkSession, dataSchema: StructType,
      requiredSchema: StructType):
      PartitionedFile => Iterator[ColumnarBatch] = {
    val pinned = pinnedSession(spark, vectorized = true)
    val f = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = pinned,
      dataSchema = dataSchema,
      partitionSchema = new StructType(),
      requiredSchema = requiredSchema,
      filters = Nil,
      // with the vectorized reader on, ParquetFileFormat demands an
      // explicit batch/row decision from its caller
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "true"),
      hadoopConf = pinned.sessionState.newHadoopConf())
    pf => f(pf).asInstanceOf[Iterator[ColumnarBatch]]
  }

  /** Whole-file `PartitionedFile` (no partition-dir values: transform
    * layouts keep every raw column in the data file). */
  def wholeFile(path: String, fileSize: Long): PartitionedFile =
    PartitionedFile(
      partitionValues = InternalRow.empty,
      filePath = SparkPath.fromPathString(path),
      start = 0L,
      length = fileSize,
      locations = Array.empty,
      modificationTime = 0L,
      fileSize = fileSize)
}
