package org.apache.spark.sql.graftlake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` touchpoint a v1 streaming `Source` needs:
  * `MicroBatchExecution` asserts that the frame a source returns from
  * `getBatch` carries `isStreaming = true`, and the only way to stamp
  * that onto an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * This object lives under `org.apache.spark.sql` solely to satisfy
  * that access qualifier — the exact pattern Delta Lake's
  * `DeltaSource` uses for its micro-batch frames. Nothing else in
  * graft reaches into Spark internals.
  */
object StreamShim {

  /** Re-wrap a batch `DataFrame` as a streaming micro-batch frame:
    * same physical plan (`queryExecution.toRdd` is lazy — nothing
    * executes here), `isStreaming = true` on the logical node. */
  def asMicroBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Re-wrap a sink's incoming micro-batch frame as a plain BATCH
    * DataFrame (`isStreaming = false`), so table operations that run
    * several actions over it (MERGE's probe + rewrite + anti-join)
    * can execute it like any other frame. Same physical plan, lazy. */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** An empty streaming micro-batch with `schema` (a source must
    * still return a well-formed frame for a no-new-data range). */
  def emptyMicroBatch(spark: SparkSession, schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }
}
