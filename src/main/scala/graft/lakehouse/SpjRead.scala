package graft.lakehouse

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.graftlake.ParquetReadShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned join for graft-lake bucket layouts.
  *
  * A lake table written `PARTITIONED BY (bucket[n](k))` already has
  * its rows hash-clustered on disk — every `_gp_0=<b>` directory
  * holds exactly the rows with `pmod(xxhash64(k), n) = b`. Spark's
  * storage-partitioned join (SPARK-37377, the mechanism Iceberg uses)
  * can join two such tables on `k` with ZERO Exchange on either side,
  * but only if the scan *reports* that layout. The engine's default
  * read path is a plain parquet scan (Unknown partitioning), so every
  * lake⋈lake join re-shuffles both sides — at 100 TB, for a daily
  * governed fact join, that shuffle IS the job.
  *
  * This file surfaces the stored layout through the DataSource-v2
  * contract Spark's planner actually consumes:
  *
  *  - [[LakeSpjCatalog]] — a `TableCatalog` + `FunctionCatalog`
  *    (registered as `graft_spj`). The FunctionCatalog half is
  *    load-bearing: Spark's `V2ScanPartitioning` rule only converts a
  *    reported `bucket(n, k)` transform into a comparable
  *    `TransformExpression` when the relation's catalog can resolve
  *    the named function (Iceberg ships its SPJ the same way).
  *  - [[GraftBucketFunction]] — the resolved `bucket` function, bound
  *    to the engine's write-time layout law `pmod(xxhash64(long(k)), n)`
  *    (PartitionSpec.Bucket.toColumn). Both sides resolving the SAME
  *    canonical function is what makes the two partitionings
  *    compatible to `KeyGroupedShuffleSpec`.
  *  - [[LakeSpjTable]] / scan — reports
  *    `KeyGroupedPartitioning(bucket(n, k), #buckets-present)` and
  *    plans one `HasPartitionKey` split per bucket value, so the
  *    planner aligns equal buckets pairwise instead of shuffling.
  *    Rows decode through Spark's own parquet reader closure
  *    ([[ParquetReadShim]]), with column pruning pushed down.
  *
  * Eligibility is strict, checked at `loadTable`: a single
  * `bucket[n](col)` partition field, no pending equality/position
  * deletes, no renames, no partition-spec evolution — anything else
  * must take the general `GraftTable.read()` path (loud error, never
  * a silently-different result). Ref: the reference's repeated
  * governed fact joins (consumer_emr_on_eks_setup.sh:407-412) are
  * exactly this shape.
  */
object Spj {
  val CatalogName = "graft_spj"

  /** Session wiring, idempotent: register the catalog and enable the
    * v2-bucketing planner paths (off by default in vanilla Spark). */
  def enable(spark: SparkSession): Unit = {
    spark.conf.set(s"spark.sql.catalog.$CatalogName",
      classOf[LakeSpjCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // tolerate one side missing some bucket values (empty buckets):
    // the planner fills the gap with empty partitions instead of
    // falling back to a shuffle
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "true")
  }

  /** Read `t` through the SPJ catalog under `name`. The returned
    * frame's scan reports the stored bucket layout; a join between
    * two such frames on their bucket columns plans shuffle-free. */
  def read(spark: SparkSession, name: String, t: GraftTable): DataFrame = {
    enable(spark)
    LakeRegistry.register(name, t)
    spark.table(s"$CatalogName.$name")
  }

  /** Why `t` cannot take the SPJ path right now, or None if it can. */
  def ineligibleReason(t: GraftTable): Option[String] = {
    val snap = t.currentSnapshot
    val fields = PartField.parseAll(snap.partitionCols)
    if (fields.size != 1 || !fields.head.isInstanceOf[PartField.Bucket])
      Some(s"partition spec [${snap.partitionCols.mkString(", ")}] is not " +
        "a single bucket[n](col) field")
    else if (snap.files.isEmpty) Some("table has no data files")
    else if (snap.dels.nonEmpty) Some("pending equality deletes")
    else if (snap.posDels.nonEmpty) Some("pending position deletes")
    else if (snap.renames.nonEmpty) Some("column renames present")
    else if (snap.schema.fields.exists(
        _.metadata.contains(GraftTable.DefaultSinceKey)))
      // the SPJ scan decodes files directly (no readFilesMapped-style
      // default application), so pre-add rows would read NULL where
      // GraftTable.read() returns the DEFAULT — a silently-different
      // result; refuse instead
      Some("columns with ALTER-added initial defaults present")
    else if (snap.specHist.nonEmpty &&
        snap.specHist.exists(_._2 != snap.partitionCols))
      Some("partition spec evolved across the file set")
    else None
  }
}

/** `bucket(n, col)` as a catalog-resolvable v2 function. Bound form
  * reproduces the write-time bucket law exactly; integral inputs
  * normalize to LONG before hashing (xxhash64 of INT 7 and LONG 7
  * differ — same normalization as PartitionSpec.Bucket). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n) — graft-lake's layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, value), got $inputType")
    val dt = inputType.fields(1).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        new BucketLong
      case other => throw new UnsupportedOperationException(
        s"bucket over $other is not SPJ-resolvable (integral columns only)")
    }
  }

  private[lakehouse] final class BucketLong
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.getLong(1)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, LongType, 42L)
      java.lang.Math.floorMod(h, n.toLong).toInt
    }
  }
}

/** The `graft_spj` catalog: resolves LakeRegistry names to SPJ-read
  * tables and the `bucket` function for transform resolution. Pure
  * read surface — DDL goes through the `USING graft` front-end. */
class LakeSpjCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = Spj.CatalogName

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }
  override def name(): String = catalogName

  override def loadTable(ident: Identifier): Table = {
    val t = LakeRegistry.get(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name)))
    Spj.ineligibleReason(t).foreach { why =>
      throw new UnsupportedOperationException(
        s"table '${ident.name}' cannot take the storage-partitioned " +
          s"read path: $why (use GraftTable.read())")
    }
    new LakeSpjTable(ident.name, t)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "create via SQL: CREATE TABLE ... USING graft")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alter via SQL")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename via SQL")

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(catalogName, ident.name)
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def functionExists(ident: Identifier): Boolean =
    ident.name.equalsIgnoreCase("bucket")
}

/** One SPJ-readable snapshot of a bucket-partitioned lake table. */
final class LakeSpjTable(tableName: String, t: GraftTable)
    extends Table with SupportsRead {
  private val snap = t.currentSnapshot
  private val bucketField =
    PartField.parseAll(snap.partitionCols).head.asInstanceOf[PartField.Bucket]

  override def name(): String = tableName
  override def schema(): StructType = snap.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(bucketField.n, bucketField.col))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeSpjScanBuilder(t, snap, bucketField)
}

final class LakeSpjScanBuilder(t: GraftTable, snap: Snapshot,
    bucket: PartField.Bucket)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = snap.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the table's field order; an empty projection (count(*))
    // still needs one column to drive the row iterator
    val keep = requiredSchema.fieldNames.toSet
    val pruned = StructType(snap.schema.fields.filter(f => keep(f.name)))
    required =
      if (pruned.fields.nonEmpty) pruned
      else StructType(Array(snap.schema.fields.head))
  }

  /** Filters are consumed as SKIPPING hints only — every filter is
    * returned as residual so Spark re-evaluates it row-side, and the
    * scan uses the convertible subset to drop files whose manifest
    * stats or partition value provably exclude them (Iceberg's
    * model: metadata prunes, the engine filters). An equality on the
    * bucket column prunes to ONE bucket's splits via the same
    * driver-side literal hash the writer used. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => LakeSpjScanBuilder.toSql(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val predSql = pushed.flatMap(LakeSpjScanBuilder.toSql) match {
      case Array() => None
      case parts => Some(parts.mkString("(", ") AND (", ")"))
    }
    new LakeSpjScan(t, snap, bucket, required, predSql)
  }
}

object LakeSpjScanBuilder {
  import org.apache.spark.sql.sources._

  /** Render the stats-prunable subset of v1 filters to SQL for the
    * manifest pruners; None = not convertible (never pushed). Only
    * top-level columns and literal types whose canonical text form
    * round-trips exactly. */
  private def litSql(v: Any): Option[String] = v match {
    case null => None
    // the rendered predicate is RE-PARSED by Spark's SQL parser
    // (pruneByStats/prunePartitions), which processes backslash
    // escapes in string literals — a value containing `\` would
    // round-trip to a DIFFERENT literal and pruning could skip files
    // that hold matching rows. Refuse those (conservative: the filter
    // is residual anyway, only the skipping hint is lost).
    case s: String if !s.contains('\\') && !s.exists(_.isControl) =>
      Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(b.toString)
    case _: Byte | _: Short | _: Int | _: Long => Some(v.toString)
    // non-finite values have no SQL literal form ("NaN" would parse
    // as a column reference) — never push them
    case f: java.lang.Float if java.lang.Float.isFinite(f) =>
      Some(f.toString)
    case d: java.lang.Double if java.lang.Double.isFinite(d) =>
      Some(d.toString)
    case d: java.math.BigDecimal => Some(d.toString)
    case d: BigDecimal => Some(d.toString)
    case _ => None // dates/timestamps/binary: zone/format pitfalls, skip
  }
  private def colRef(name: String): Option[String] =
    if (name.contains('.') || name.contains('`')) None
    else Some(s"`$name`")

  def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) =>
      for (c <- colRef(a); l <- litSql(v)) yield s"$c = $l"
    case GreaterThan(a, v) =>
      for (c <- colRef(a); l <- litSql(v)) yield s"$c > $l"
    case GreaterThanOrEqual(a, v) =>
      for (c <- colRef(a); l <- litSql(v)) yield s"$c >= $l"
    case LessThan(a, v) =>
      for (c <- colRef(a); l <- litSql(v)) yield s"$c < $l"
    case LessThanOrEqual(a, v) =>
      for (c <- colRef(a); l <- litSql(v)) yield s"$c <= $l"
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.map(litSql)
      if (ls.forall(_.isDefined))
        colRef(a).map(c => s"$c IN (${ls.flatten.mkString(", ")})")
      else None
    case IsNull(a) => colRef(a).map(c => s"$c IS NULL")
    case IsNotNull(a) => colRef(a).map(c => s"$c IS NOT NULL")
    case And(l, r) =>
      for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls) AND ($rs)"
    case Or(l, r) =>
      for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls) OR ($rs)"
    case _ => None
  }
}

/** The scan: groups the snapshot's files by stored bucket value and
  * reports the grouping as `KeyGroupedPartitioning`. Planning is
  * driver-side metadata only (path parsing + one `getFileStatus` per
  * file for split sizing — the same listing cost every scan pays). */
final class LakeSpjScan(t: GraftTable, snap: Snapshot,
    bucket: PartField.Bucket, required: StructType,
    predSql: Option[String])
    extends Scan with Batch with SupportsReportPartitioning {

  private def spark: SparkSession = t.spark

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft-lake SPJ scan, bucket[${bucket.n}](${bucket.col})" +
      predSql.map(p => s", skipping: $p").getOrElse("")

  private val dirPrefix = PartField.dirCol(0) + "="

  /** (bucketValue, files+sizes), sorted by bucket value — over the
    * stats/partition-pruned file subset when filters were pushed. */
  private lazy val groups: Array[(Int, Array[(String, Long)])] = {
    val files = predSql match {
      case None => snap.files
      case Some(p) =>
        val kept = t.pruneByStats(snap, p).toSet &
          t.prunePartitions(snap, p).toSet
        snap.files.filter(kept)
    }
    if (files.isEmpty) Array.empty
    else {
    // split sizes come from the manifest (fileSizes, harvested at
    // commit); the live stat is only a fallback for files committed
    // by pre-size manifests — planning stays zero-RPC on current
    // tables even at millions of files
    lazy val fs = new org.apache.hadoop.fs.Path(files.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    files
      .map { f =>
        val b = f.split('/').find(_.startsWith(dirPrefix)).getOrElse(
          throw new IllegalStateException(
            s"data file $f carries no ${dirPrefix}<v> layout directory"))
          .stripPrefix(dirPrefix).toInt
        val len = snap.fileSizes.getOrElse(f,
          fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
        (b, (f, len))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toArray
      .sortBy(_._1)
    }
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(bucket.n, bucket.col)), groups.length)

  override def planInputPartitions(): Array[InputPartition] =
    groups.map { case (b, files) => LakeBucketSplit(b, files) }

  override def createReaderFactory(): PartitionReaderFactory = {
    // vectorized decode when the projected schema allows it (atomic
    // types — the common analytic case); the row closure is the
    // universal fallback. Decided once at plan time, driver-side.
    val columnar = ParquetReadShim.columnarSupported(spark, required)
    new LakeSpjReaderFactory(
      ParquetReadShim.rowReadFunc(spark, snap.schema, required),
      if (columnar)
        Some(ParquetReadShim.columnarReadFunc(spark, snap.schema, required))
      else None)
  }
}

/** All files of one stored bucket value — the planner aligns splits
  * of equal `partitionKey` across the two join sides. */
final case class LakeBucketSplit(bucketValue: Int,
    files: Array[(String, Long)])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucketValue)
}

final class LakeSpjReaderFactory(
    readFile: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    readFileColumnar: Option[
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]] = None)
    extends PartitionReaderFactory {

  private def iterate[T](split: LakeBucketSplit,
      f: org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private val it = split.files.iterator.flatMap { case (path, len) =>
        f(ParquetReadShim.wholeFile(path, len))
      }
      private var cur: T = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): T = cur
      // per-file reader cleanup rides the task-completion listeners
      // Spark's parquet closure registers itself
      override def close(): Unit = ()
    }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    readFileColumnar.isDefined

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    iterate(partition.asInstanceOf[LakeBucketSplit], readFile)

  override def createColumnarReader(partition: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    iterate(partition.asInstanceOf[LakeBucketSplit], readFileColumnar.get)
}
