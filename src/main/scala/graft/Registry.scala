package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum}

object Registry {
  /** Driver contract: (session, sfDir) -> result. */
  type Q = (SparkSession, String) => DataFrame

  /** Multiset equality of two frames in ONE pass (round 19, guide
    * §2.4): the scenario-proof idiom
    * `a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0`
    * executes each EXCEPT ALL as tag/group/replicate over BOTH
    * inputs — four scans and two full-row shuffles for one boolean.
    * Tagging the sides ±1 and grouping once answers the same
    * question (∀ row value: count_a == count_b) with each side
    * scanned once and one shuffle. Columns compared by a's order;
    * b must carry the same names.
    *
    * Guards (round 20, advice): the name-based select would silently
    * DROP extra b columns where `exceptAll` failed loudly on arity
    * mismatch, and an input already carrying `_cnt` would be
    * silently replaced and excluded from the compared key — both
    * refuse instead. */
  def sameMultiset(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"sameMultiset: column sets differ — [${a.columns.mkString(",")}]" +
        s" vs [${b.columns.mkString(",")}]")
    require(!cols.exists(c => c == "_cnt" || c == "_net"),
      "sameMultiset: inputs must not carry reserved columns _cnt/_net")
    a.select(cols.map(col): _*).withColumn("_cnt", lit(1L))
      .unionByName(
        b.select(cols.map(col): _*).withColumn("_cnt", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("_cnt")).as("_net"))
      .filter(col("_net") =!= 0L)
      .isEmpty
  }
}
