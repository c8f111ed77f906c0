package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * the same key and `rightTime <= leftTime` (left-join semantics —
  * unmatched left rows keep nulls).
  *
  * Spark-first scale design: instead of a non-equi join (which plans
  * as a broadcast nested loop or explodes an equi-join on key alone),
  * union the two sides and take a running `last(_, ignoreNulls)`
  * window per key ordered by time. ONE shuffle on the key, state is a
  * single row per column — this survives 100 TB where a naive
  * key-join would produce |left_per_key| × |right_per_key| rows.
  *
  * Ties: right rows sort before left rows at equal time (`<=`
  * semantics); among right rows with equal (key, time), the largest
  * `rightSeq` wins (deterministic).
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      leftKey: Column,
      leftTime: Column,
      right: DataFrame,
      rightKey: Column,
      rightTime: Column,
      rightSeq: Column,
      rightVals: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val valNames = rightVals.map(_._1)
    // Concrete types for the carried right-side values, so the left
    // side's null placeholders union cleanly (NullType would poison
    // the cast alignment below).
    val valTypes: Map[String, org.apache.spark.sql.types.DataType] =
      rightVals.map { case (n, c) =>
        n -> right.select(c.as(n)).schema.head.dataType
      }.toMap

    val l = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__isq"),
        lit(null).cast("long").as("__seq")) ++
        leftCols.map(c => left(c)) ++
        valNames.map(n => lit(null).cast(valTypes(n)).as(n))): _*)
    // Right side: null out the left columns, carry the joined values.
    val r = right.select(
      (Seq(rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__isq"),
        rightSeq.cast("long").as("__seq")) ++
        leftCols.map(c => lit(null).as(c)) ++
        rightVals.map { case (n, c) => c.as(n) }): _*)

    // Align right-side null literals to the left schema's types.
    val rAligned = r.select(l.columns.map(c =>
      col(c).cast(l.schema(c).dataType).as(c)).toIndexedSeq: _*)

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isq").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .select((col("*") +: valNames.map(n =>
        last(col(n), ignoreNulls = true).over(w).as(s"__v_$n"))): _*)
      .filter(col("__isq") === 1)
      .select((leftCols.map(col) ++
        valNames.map(n => col(s"__v_$n").as(n))): _*)
  }
}
