package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Registry {
  /** Driver contract: (session, sfDir) -> result. */
  type Q = (SparkSession, String) => DataFrame
}
