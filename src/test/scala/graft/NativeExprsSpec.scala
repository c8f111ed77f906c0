package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Parity/invariant checks for the native expressions, on real data. */
class NativeExprsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("native functions are callable from plain SQL (injectFunction)") {
    val r = spark.sql(
      """SELECT graft_jaccard(array('a','b'), array('b','c')) AS j,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(graft_minhash128(array('x'))) AS m,
        |       graft_simhash64(array('x','y')) AS sh""".stripMargin)
      .collect().head
    assert(math.abs(r.getAs[Double]("j") - 1.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("m") == 128)
  }

  test("native kernels participate in whole-stage codegen") {
    // a CodegenFallback expression would force the projection out of
    // the WholeStageCodegen span; the kernels generate a static call
    // instead, so the span covers the whole signature projection
    val df = Tables.documents(spark, sf).select(
      call_function("graft_minhash128_long",
        call_function("graft_shingle_hashes", col("text"))).as("sig"),
      call_function("graft_simhash64", split(lower(col("text")), " ")).as("sh"),
      TextFunctions.minWindowHash("text").as("mw"),
      TextFunctions.polyFingerprint("text").as("fp"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "projection not codegen'd at all")
    val span = wsc.map(_.toString).mkString("\n")
    Seq("graft_minhash_long", "graft_simhash64", "graft_minwindow", "graft_polyfp")
      .foreach(k => assert(span.contains(k), s"$k outside the codegen span:\n$span"))
    // and the generated path computes the same values as interpreted eval
    val row = df.orderBy(col("fp")).limit(1).collect().head
    assert(row.getSeq[Long](row.fieldIndex("sig")).length == 128)
  }

  test("hashed shingles agree with string shingles in count and jaccard") {
    val docs = Tables.documents(spark, sf).limit(200)
    // counts agree (no hash collisions on this corpus)
    val cnt = docs.select(
      size(TextFunctions.shingles3(col("text"))).as("ns"),
      size(call_function("graft_shingle_hashes", col("text"))).as("nh"))
    assert(cnt.filter($"ns" =!= $"nh").count() == 0)
    // pairwise jaccard identical through either representation
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles3(col("text")).as("s"),
      call_function("graft_shingle_hashes", col("text")).as("h"))
    val pairs = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .limit(5000)
      .select(
        TextFunctions.jaccard($"a.s", $"b.s").as("js"),
        call_function("graft_jaccard_sorted", $"a.h", $"b.h").as("jh"))
    assert(pairs.filter(!($"js" === $"jh") &&
      !(isnan($"js") && isnan($"jh"))).count() == 0)
  }

  test("graft_dot matches the HOF fold bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(100)
      .select(col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    assert(e.select((TextFunctions.dot(col("v"), col("v")) === hof).as("eq"))
      .filter(!col("eq")).count() == 0)
  }

  test("jaccard edge cases: empty arrays -> NaN, disjoint -> 0, equal -> 1") {
    val r = spark.sql(
      """SELECT graft_jaccard(array(), array()) AS e,
        |  graft_jaccard(array('a'), array('b')) AS d,
        |  graft_jaccard(array('a','b'), array('b','a')) AS s,
        |  graft_jaccard_sorted(CAST(array() AS ARRAY<BIGINT>),
        |                       CAST(array() AS ARRAY<BIGINT>)) AS es""".stripMargin)
      .collect().head
    assert(r.getAs[Double]("e").isNaN && r.getAs[Double]("es").isNaN)
    assert(r.getAs[Double]("d") == 0.0 && r.getAs[Double]("s") == 1.0)
  }

  test("bitset kernels: build/or/get/cardinality/expand round-trip") {
    // SQL path (codegen'd expressions)
    val r = spark.sql(
      """SELECT graft_bitset_from_positions(
        |         CAST(array(0, 3, 9, 63, 64) AS ARRAY<BIGINT>)) AS bm,
        |  graft_bitset_from_positions(
        |         CAST(array() AS ARRAY<BIGINT>)) AS empty""".stripMargin)
      .selectExpr(
        "graft_bitset_cardinality(bm) AS card",
        "graft_bitset_get(bm, 3) AS hit",
        "graft_bitset_get(bm, 4) AS miss",
        "graft_bitset_get(bm, 1000000) AS beyond",
        "graft_bitset_cardinality(graft_bitset_or(bm, empty)) AS orcard",
        "graft_bitset_cardinality(graft_bitset_or(bm,\n" +
          "  graft_bitset_from_positions(" +
          "CAST(array(3, 100) AS ARRAY<BIGINT>))) ) AS merged")
      .collect().head
    assert(r.getAs[Long]("card") == 5)
    assert(r.getAs[Boolean]("hit") && !r.getAs[Boolean]("miss") &&
      !r.getAs[Boolean]("beyond"))
    // positions past 2^34 (where pos/8 overflows Int) and negatives
    // read as unset, never AIOOBE — SQL accepts arbitrary bigints
    val huge = spark.sql(
      """SELECT graft_bitset_get(
        |         graft_bitset_from_positions(
        |           CAST(array(0) AS ARRAY<BIGINT>)),
        |         CAST(17179869184 AS BIGINT)) AS big,
        |       graft_bitset_get(
        |         graft_bitset_from_positions(
        |           CAST(array(0) AS ARRAY<BIGINT>)),
        |         CAST(-1 AS BIGINT)) AS neg""".stripMargin)
      .collect().head
    assert(!huge.getAs[Boolean]("big") && !huge.getAs[Boolean]("neg"))
    assert(r.getAs[Long]("orcard") == 5, "OR with empty is identity")
    assert(r.getAs[Long]("merged") == 6, "overlapping bit merges once")
    // driver-side expansion is the exact inverse of construction
    val positions = Array(0L, 3L, 9L, 63L, 64L, 100L)
    val bm = graft.functions.NativeKernels.bitsetFromPositions(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(positions))
    assert(graft.functions.NativeKernels.bitsetPositions(bm)
      .sameElements(positions))
    assert(bm.length == 100 / 8 + 1,
      "blob length tracks the highest position, not the count")
  }
}
