package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join on a time axis, bucket-quantized so it plans
  * as an *equi*-join.
  *
  * A naive `l.key = r.key AND r.ts BETWEEN l.lo AND l.hi` non-equi
  * join either broadcasts (impossible when both sides are large) or
  * degenerates to a per-key cartesian product. Quantizing time into
  * `bucketSeconds` buckets and exploding the (short) interval side
  * into its covered buckets turns it into a shuffled hash join on
  * (key, bucket) with an exact residual filter — the standard
  * scale-out range-join strategy. Shuffle volume grows only by the
  * interval/bucket ratio (≈2 when bucketSeconds ≈ interval length).
  *
  * The two inputs must have disjoint column names (rename before
  * calling — required anyway for a self-join).  `hi` is exclusive.
  */
object RangeJoin {
  def bucketed(
      left: DataFrame, leftKey: Column, lo: Column, hi: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      bucketSeconds: Long): DataFrame = {
    val l = left
      .withColumn("__lo", lo)
      .withColumn("__hi", hi)
      // hi's bucket is included even when hi sits exactly on a bucket
      // boundary: unix_timestamp truncates sub-second parts, so
      // excluding it could drop matches; the residual filter keeps
      // the join exact either way.
      .withColumn("__lbucket",
        explode(sequence(
          floor(unix_timestamp(col("__lo")) / bucketSeconds),
          floor(unix_timestamp(col("__hi")) / bucketSeconds))))
    val r = right
      .withColumn("__rts", rightTs)
      .withColumn("__rbucket",
        floor(unix_timestamp(col("__rts")) / bucketSeconds))
    l.join(r, col("__lbucket") === col("__rbucket") && leftKey === rightKey)
      .filter(col("__rts") >= col("__lo") && col("__rts") < col("__hi"))
      .drop("__lbucket", "__rbucket", "__lo", "__hi", "__rts")
  }
}
