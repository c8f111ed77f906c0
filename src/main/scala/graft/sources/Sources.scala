package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Registry.Q
import graft.Tables

/** Ingest/egress layer (SURVEY.md §2 "Sources & sinks").
  *
  * The reference lands data into its lakehouse via SQL INSERTs over
  * files (producer_iceberg_datalake_setup.sh:118-150); a user of the
  * engine additionally needs file-format ingest and partitioned
  * egress. Rules that hold at 100 TB:
  *
  *  - **Schema is always explicit.** `inferSchema` is a full extra
  *    pass over the data before the real read; at scale that doubles
  *    the scan bill. Readers here take a `StructType` (or derive it
  *    from a reference table once, driver-side).
  *  - **CSV/JSON are ingest formats, not storage formats.** They are
  *    row-oriented and unsplittable when compressed with gzip; the
  *    roundtrip queries exist to prove lossless ingest, after which
  *    data lives in parquet (columnar, splittable, stats-bearing).
  *  - **Egress is partitioned.** `writePartitioned` lays out
  *    `col=value/` directories so downstream scans prune partitions
  *    (the reference's Iceberg tables are partitioned the same way —
  *    producer_iceberg_datalake_setup.sh:130).
  */
object Sources {

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet: one directory per partition
    * value; readers prune directories before touching any file. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  /** customer → CSV → back, schema-enforced: proves lossless text
    * ingest (Spark writes doubles in shortest-round-trip form). */
  private val csvRoundtrip: Q = (s, d) => {
    val customer = Tables.customer(s, d)
    val dir = tmp("src_csv")
    writeCsv(customer, dir)
    readCsv(s, dir, customer.schema).orderBy("c_custkey")
  }

  /** orders → JSONL → back (timestamps survive at second granularity,
    * which this corpus uses; sub-second media would move via parquet). */
  private val jsonRoundtrip: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val dir = tmp("src_json")
    writeJsonl(orders, dir)
    readJsonl(s, dir, orders.schema).orderBy("o_orderkey")
  }

  /** lineitem → ORC → back. ORC is the other columnar,
    * stats-bearing, splittable storage format Spark ships a native
    * vectorized reader for (the Hive-ecosystem counterpart of
    * parquet); a lossless roundtrip (decimals, dates, timestamps
    * included) proves the engine can both ingest an ORC lake and
    * serve one. Pushdown/pruning work the same as parquet (ORC
    * carries per-stripe min/max), so the 100 TB story carries over
    * unchanged. */
  private val orcRoundtrip: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val dir = tmp("src_orc")
    li.write.mode("overwrite").orc(dir)
    s.read.schema(li.schema).orc(dir)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** documents.text → raw line-oriented TEXT → back — the most common
    * raw-corpus dump format an LLM-data pipeline ingests (one
    * document per line: the Common-Crawl/WET-style shape). Egress
    * writes one `value` column, ingest reads line-split with NO
    * parsing cost (the cheapest possible scan: splittable,
    * per-partition, zero schema machinery), and the roundtrip is
    * require()d lossless for newline-free documents — documents WITH
    * newlines must move via parquet/JSONL, which is exactly why those
    * roundtrips sit alongside this one. */
  /** Line-oriented text egress with the lossless-roundtrip guard.
    * Hadoop's line reader splits on \n, \r, AND \r\n — a bare
    * carriage return would pass a newline-only guard yet split into
    * two rows on read, silently breaking the roundtrip. */
  def writeText(docs: DataFrame, dir: String): Unit = {
    require(docs.filter(col("value").contains("\n")
        .or(col("value").contains("\r"))).count() == 0,
      "line-oriented text cannot carry embedded line terminators " +
        "(\\n or \\r): use parquet")
    docs.write.mode("overwrite").text(dir)
  }

  private val textRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(coalesce(col("text"), lit("")).as("value"))
    val dir = tmp("src_text")
    writeText(docs, dir)
    s.read.text(dir).orderBy("value")
  }

  /** customer → XML → back, schema-enforced (Spark 4 ships the XML
    * datasource built in — the spark-xml donation): `rowTag` scoping
    * on read, explicit schema (same no-inference rule as CSV/JSON —
    * XML inference is an extra full pass), lossless for this corpus's
    * types. XML is strictly an INGEST format (row-oriented, verbose,
    * unsplittable under gzip): the roundtrip proves third-party feed
    * ingest, after which data lives in parquet. */
  private val xmlRoundtrip: Q = (s, d) => {
    val customer = Tables.customer(s, d)
    val dir = tmp("src_xml")
    customer.write.mode("overwrite").option("rowTag", "row")
      .format("xml").save(dir)
    s.read.schema(customer.schema).option("rowTag", "row")
      .format("xml").load(dir).orderBy("c_custkey")
  }

  /** Schema-drift ingest: two parquet generations under one root —
    * v1 writes (o_orderkey, o_custkey), a later v2 adds
    * o_totalprice — read back with `mergeSchema`, which unions the
    * footers' schemas and null-fills the column the old files never
    * carried. This is the multi-year data lake reality at 100 TB
    * (schemas drift across partitions; rewriting history to add a
    * column is exactly the cost you refuse to pay). mergeSchema's
    * footer union is a planning-time cost per file — the lakehouse
    * path ([[graft.lakehouse.GraftTable.addColumns]]) does the same
    * evolution from ONE manifest, which is why it wins at scale; this
    * query is the raw-directory form. */
  private val schemaMerge: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val dir = tmp("src_merge")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
      .write.parquet(s"$dir/gen=1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.parquet(s"$dir/gen=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** orders → parquet partitioned by o_orderstatus → filtered read.
    * The filter on the partition column is answered from directory
    * names alone (PartitionFilters in the scan; SourcesSpec asserts
    * no data files outside the matching partition are listed). */
  private val partitionedSink: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val dir = tmp("src_part")
    writePartitioned(orders, dir, Seq("o_orderstatus"))
    s.read.parquet(dir)
      .filter(col("o_orderstatus") === "F")
      .select(orders.columns.map(col): _*) // restore original column order
      .orderBy("o_orderkey")
  }

  /** Both sides of a fact⋈fact join written bucketed (and sorted) on
    * the join key: the join plans with NO exchange on either side —
    * the shuffle was paid once at write time and every subsequent
    * join on that key is co-located. This is THE layout decision for
    * a 100 TB fact table joined repeatedly on the same key.
    * SourcesSpec asserts the shuffle-free plan with broadcast off. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse directory persists — remove an orphaned location or
    // CREATE TABLE refuses it
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  private val bucketedJoin: Q = (s, d) => {
    writeBucketed(Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
      "g_orders", "o_orderkey", 8)
    writeBucketed(Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      "g_lineitem", "l_orderkey", 8)
    s.table("g_lineitem")
      .join(s.table("g_orders"), col("l_orderkey") === col("o_orderkey"))
      .drop("o_orderkey")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val queries: Map[String, Q] = Map(
    "src_csv_roundtrip" -> csvRoundtrip,
    "src_json_roundtrip" -> jsonRoundtrip,
    "src_orc_roundtrip" -> orcRoundtrip,
    "src_text_roundtrip" -> textRoundtrip,
    "src_xml_roundtrip" -> xmlRoundtrip,
    "src_partitioned_sink" -> partitionedSink,
    "src_schema_merge" -> schemaMerge,
    "src_bucketed_join" -> bucketedJoin)

  val oracles: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "src_xml_roundtrip" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "src_orc_roundtrip" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "src_text_roundtrip" ->
      "SELECT coalesce(text, '') AS value FROM documents ORDER BY value",
    "src_json_roundtrip" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "src_partitioned_sink" ->
      "SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    "src_schema_merge" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "src_bucketed_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
