package graft.operators

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables

/** Relational analytics surface (SURVEY.md §2 "Relational analytics").
  *
  * Determinism protocol for the DuckDB oracle (SURVEY.md §5): money
  * sums go through decimal casts (exact, ordering-independent);
  * divisions happen in double on exact decimal inputs; every result
  * ends in a total ORDER BY.
  */
object Analytics {

  /** TPC-H Q1 shape: scan-filter-aggregate over the fact table.
    * Scale: single shuffle on the (tiny-cardinality) group keys with
    * map-side partial aggregation; filter + 7-column projection push
    * into the parquet scan. */
  private val q1: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)"))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
