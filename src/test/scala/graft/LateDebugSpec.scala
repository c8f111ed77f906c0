package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LateDebugSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("debug late data") {
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_late_dbg").toString
    events.filter(col("event_id") % 7 =!= 0)
      .repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    events.filter(col("event_id") % 7 === 0)
      .repartition(1).write.mode("append").parquet(dir)
    val src = Tables.normalizeTs(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir))
    val q = streaming.StreamingOps.lateWindowAgg(src)
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("v"))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_dbg").start()
    q.processAllAvailable()
    println("=== progress ===")
    q.recentProgress.foreach(p => println(
      s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}"))
    q.stop()
    val streamed = spark.table("late_dbg")
    val batch = streaming.StreamingOps.lateDataBatch(events)
    val fwm = events.agg((max(col("ts")) - expr("INTERVAL 1 HOUR")).as("__fwm"))
    val noDrop = streaming.StreamingOps.lateWindowAgg(events)
      .crossJoin(broadcast(fwm))
      .filter(col("window.end") <= col("__fwm"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("v"))
    println(s"streamed=${streamed.count()} batch=${batch.count()} noDrop=${noDrop.count()}")
    println(s"streamed minus noDrop=${streamed.except(noDrop).count()}")
    println(s"noDrop minus streamed=${noDrop.except(streamed).count()}")
    println(s"streamed minus batch=${streamed.except(batch).count()}")
    println(s"batch minus streamed=${batch.except(streamed).count()}")
  }
}
