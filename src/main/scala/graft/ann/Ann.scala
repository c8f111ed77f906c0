package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables
import graft.functions.TextFunctions.{cosine, dot, l2norm}
import graft.functions.{Scored, TopKAggregator}

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2 "Similarity search"). Query set = vec_id < 10.
  *
  * Three tiers, matching how an ANN index scales:
  *  - brute force (exact baseline): broadcast the query set, one pass
  *    over the corpus, per-partition top-k via [[TopKAggregator]] —
  *    the corpus is never shuffled, only Q×k candidates are;
  *  - random-hyperplane LSH: 16 tables × 4 bits — corpus hashed once,
  *    candidates only from matching buckets;
  *  - IVF: coarse quantizer (here: per-label centroids, decimal-exact
  *    means), query probes the 3 nearest cells → touches 3/10 of the
  *    corpus.
  */
object Ann {
  private val K = 5
  private val NumQueries = 10

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.parallel(Tables.embeddings(s, d))
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", l2norm(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))

  private def queriesDf(c: DataFrame): DataFrame =
    c.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))

  /** (q_id, candidate vec_id, cos) → top-k per query via the
    * partial-aggregating top-k. */
  private def topK(s: SparkSession, scored: DataFrame): DataFrame = {
    import s.implicits._
    val agg = new TopKAggregator(K).toColumn
    scored.select(col("q_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, c) => Scored(id, c) }
      .agg(agg.name("top"))
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case (sc, i) => (q, sc.id, i + 1) }
      }
      .toDF("q_id", "neighbor_id", "rank")
      .orderBy(col("q_id"), col("rank"))
  }

  private val bruteforce: Q = (s, d) => {
    val c = corpus(s, d)
    val q = queriesDf(c)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("v"), col("q_v"), col("nrm"), col("q_nrm")))
    topK(s, scored)
  }

  // Deterministic random hyperplanes: Tables × Bits planes of 64 dims.
  private val Dim = 64
  private val LshTables = 16
  private val LshBits = 4
  private lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(LshTables, LshBits, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def sigCol(t: Int): Column = {
    // sig_t = sum over bits of (dot(v, plane) >= 0) << bit
    val bits = (0 until LshBits).map { b =>
      val plane = array(planes(t)(b).map(lit): _*)
      when(dot(col("v"), plane) >= 0, lit(1 << b)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Sign-random-projection LSH. Recall is tuned by (tables, bits):
    * 16×4 gives ≳0.9 recall@5 at cos≈0.4 on random data; memory
    * scales linearly with tables. Approximate → rows-only; AnnSpec
    * measures recall against [[bruteforce]]. */
  private val lsh: Q = (s, d) => {
    val c = corpus(s, d)
    val sigd = c.select(
      (Seq(col("vec_id"), col("v"), col("nrm")) ++
        (0 until LshTables).map(t => sigCol(t).as(s"sig$t"))): _*)
    val cBuckets = sigd.select(col("vec_id"), col("v"), col("nrm"),
      explode(array((0 until LshTables).map(t =>
        struct(lit(t).as("t"), col(s"sig$t").as("sig"))): _*)).as("bk"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("bk.t").as("t"), col("bk.sig").as("sig"))
    val qBuckets = cBuckets.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("nrm").as("q_nrm"), col("t").as("q_t"), col("sig").as("q_sig"))
    val cand = cBuckets.join(qBuckets,
        col("t") === col("q_t") && col("sig") === col("q_sig") &&
          col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("v"), col("nrm"),
        col("q_v"), col("q_nrm"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos", cosine(col("v"), col("q_v"), col("nrm"), col("q_nrm")))
    topK(s, cand)
  }

  /** IVF: per-cell centroids (decimal-exact elementwise means so the
    * index is run-deterministic), probe the 3 nearest cells.
    * Approximate → rows-only; AnnSpec measures recall. */
  private val ivf: Q = (s, d) => {
    val c = corpus(s, d)
    // centroids: element-wise mean per label (posexplode → exact
    // decimal mean per dim → reassemble ordered)
    val cent = c.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,18)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("c_label"),
        expr("transform(pm, s -> s.m)").as("c_v"))
      .withColumn("c_nrm", l2norm(col("c_v")))
    val q = queriesDf(c)
    // probe the 3 nearest centroids per query (10×10 tiny cross join)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("c_cos",
        cosine(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("c_cos").desc, col("c_label").asc)))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("c_label"))
    val cand = c.join(probes, col("label") === col("c_label") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("v"), col("q_v"), col("nrm"), col("q_nrm")))
    topK(s, cand)
  }

  /** Element-wise decimal-exact mean vector per cell (deterministic
    * across shuffle layouts, unlike a double mean). */
  private def cellMeans(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,18)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, s -> s.m)").as("c_v"))
      .withColumn("c_nrm", l2norm(col("c_v")))

  /** Nearest-centroid assignment by cosine; deterministic tie-break
    * on cell id. Centroids broadcast — at 100 TB assignment is one
    * scan of the corpus against a few-KB broadcast, no shuffle. */
  private def assign(c: DataFrame, cent: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cell").asc)
    c.crossJoin(broadcast(cent))
      .withColumn("c_cos", cosine(col("v"), col("c_v"), col("nrm"), col("c_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("cell"))
  }

  private val KmeansCells = 10
  private val KmeansIters = 3

  /** IVF with a trained coarse quantizer: deterministic Lloyd
    * iterations (init = the k lowest vec_ids, decimal-exact means),
    * then probe the 3 nearest cells — the honest version of [[ivf]],
    * which reuses the dataset's `label` as a given quantizer.
    * Per-round cost: iters × (broadcast-assign scan + tiny mean agg);
    * at scale the quantizer trains on a sample, not the full corpus.
    * Approximate → rows-only; AnnSpec measures recall. */
  private val ivfKmeans: Q = (s, d) => {
    val c = corpus(s, d)
    var cent = c.filter(col("vec_id") < KmeansCells)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("c_v"))
      .withColumn("c_nrm", l2norm(col("c_v")))
    for (_ <- 1 to KmeansIters)
      cent = cellMeans(assign(c, cent))
    val assigned = assign(c, cent)
    val q = queriesDf(c)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("c_cos",
        cosine(col("q_v"), col("c_v"), col("q_nrm"), col("c_nrm")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("c_cos").desc, col("cell").asc)))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("cell"))
    val cand = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("v"), col("q_v"), col("nrm"), col("q_nrm")))
    topK(s, cand)
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> bruteforce,
    "ann_lsh" -> lsh,
    "ann_ivf" -> ivf,
    "ann_ivf_kmeans" -> ivfKmeans)

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         | q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < $NumQueries),
         | s AS (SELECT q.q_id, e.vec_id,
         |   list_cosine_similarity(e.v, q.q_v) AS cos
         |  FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
         | r AS (SELECT q_id, vec_id,
         |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |     ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
         |  FROM s)
         |SELECT q_id, vec_id AS neighbor_id, rank FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
}
