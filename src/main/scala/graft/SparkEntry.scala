package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Analytics.queries ++
      operators.Relational.queries ++
      fgac.FgacQueries.queries ++
      lakehouse.LakeQueries.queries ++
      ann.Ann.queries ++
      dedup.Dedup.queries ++
      text.TextAnalysis.queries ++
      multimodal.Multimodal.queries ++
      streaming.StreamingOps.queries ++
      sources.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (see SURVEY.md §2
    * "rows-only") get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Analytics.oracles ++
      operators.Relational.oracles ++
      fgac.FgacQueries.oracles ++
      lakehouse.LakeQueries.oracles ++
      ann.Ann.oracles ++
      dedup.Dedup.oracles ++
      text.TextAnalysis.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.StreamingOps.oracles ++
      sources.Sources.oracles
}
