package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Reading is always a plain parquet scan so Catalyst predicate
  * pushdown / column pruning apply; at cluster scale the same loader
  * would point at a partitioned table root instead of a single file.
  */
object Tables {
  /** All graft sessions share this config surface. */
  def session(master: String = "local[*]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's
      // vectorized reader rejects; read as long, convert in events().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Governed namespaces, mirroring the reference's configured
      // catalog (`spark.sql.catalog.dev`,
      // consumer_emr_on_eks_setup.sh:438-447): qualified names route
      // through GovernedCatalog so FgacRule can enforce policy.
      .config("spark.sql.catalog.gov",
        classOf[graft.fgac.GovernedCatalog].getName)
      .config("spark.sql.catalog.dev",
        classOf[graft.fgac.GovernedCatalog].getName)
      .withExtensions(new graft.fgac.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Schema per test-table path, inferred once per JVM (round 19,
    * guide §6): the inputs are read-only, so every later load passes
    * the schema explicitly and skips the per-plan footer-inference
    * round `spark.read.parquet` otherwise pays — hundreds of loader
    * calls per bench run. Metadata caching only (the analog of
    * Spark's own FileStatusCache): every invocation still scans the
    * parquet itself. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** Normalize an events-shaped frame so the rest of the engine
    * always sees `ts: TimestampType`, whatever encoding the parquet
    * carries. The driver has shipped three over time:
    *   - TIMESTAMP(NANOS): with `nanosAsLong` it arrives as a long
    *     of nanoseconds — truncate to µs (the data is µs-granular);
    *   - timestamp[us] with no timezone: Spark 4 reads
    *     TIMESTAMP_NTZ — cast to TimestampType, exact because the
    *     session timezone is pinned to UTC (so wall-clock == instant);
    *   - plain TIMESTAMP: pass through.
    * ONE normalizer for the whole engine — batch loader and the test
    * suite's streaming source both call this, so a driver-side
    * re-encoding can never split batch and streaming behavior again.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a narrow input out to the session's parallelism before a
    * CPU-heavy per-row pipeline. The local test parquet is one small
    * file = one input split, which would serialize hashing/shingling
    * on a single core; on a cluster the scan already has thousands of
    * splits and this is a no-op (guarded, not an unconditional
    * shuffle). The guard is a plan-shape probe (no shuffle below +
    * few input files, driver-side only) rather than
    * `df.rdd.getNumPartitions`, which under AQE forces every
    * upstream stage to execute just to answer the question. */
  def parallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (graft.lakehouse.GraftTable.isNarrow(df, target))
      df.repartition(target)
    else df
  }
}
