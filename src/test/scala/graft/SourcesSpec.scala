package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("csv roundtrip is lossless") {
    val orig = Tables.customer(spark, sf)
    val back = SparkEntry.queries("src_csv_roundtrip")(spark, sf)
    assert(back.schema == orig.schema)
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("jsonl roundtrip is lossless including timestamps") {
    val orig = Tables.orders(spark, sf)
    val back = SparkEntry.queries("src_json_roundtrip")(spark, sf)
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
  }

  test("partitioned sink prunes partitions on read") {
    val orders = Tables.orders(spark, sf)
    val dir = Files.createTempDirectory("graft_prune").toString
    Sources.writePartitioned(orders, dir, Seq("o_orderstatus"))
    val read = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scans = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // every file selected by the scan lives under the F partition dir
    val files = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("o_orderstatus=F")),
      s"scan listed non-matching partitions: ${files.take(3)}")
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(read.count() == expected)
  }

  test("salted join equals plain join") {
    val plain = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .drop("o_orderkey")
    val salted = SparkEntry.queries("q23_salted_join")(spark, sf)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}
