package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Registry.Q
import graft.Tables

/** Relational suite q2–q32 (SURVEY.md §2 "Relational analytics").
  * Determinism protocol as in [[Analytics]]: decimal-exact money
  * sums, double division only on exact inputs, total ORDER BY.
  *
  * Scale notes are per-query in Scaladoc; the common theme is: let
  * the small side broadcast (region/nation/supplier/part are dims),
  * keep aggregates partial-aggregatable, and never force a shuffle
  * the plan doesn't need.
  */
object Relational {
  private def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
  private def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** Selective filter + multi-way join (TPC-H Q5 shape). nation and
    * region broadcast (tiny dims); the only shuffle is the final
    * group-by on n_name. */
  private val q2: Q = (s, d) => {
    val li = Tables.lineitem(s, d); val su = Tables.supplier(s, d)
    val na = Tables.nation(s, d); val re = Tables.region(s, d)
    li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(na, su("s_nationkey") === na("n_nationkey"))
      .join(re, na("n_regionkey") === re("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Fact⋈dim with an explicit broadcast hint — at 100 TB the
    * customer dim at TPC-H ratio is still broadcastable per executor
    * vs shuffling the orders fact. */
  private val q3: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec4(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** EXISTS via left-semi: no row multiplication, shuffle carries
    * only the join key. */
  private val q4: Q = (s, d) => {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** NOT EXISTS via left-anti: customers with no urgent order (the
    * unfiltered variant is vacuously empty on this data — every
    * customer has orders — so it wouldn't exercise the operator). */
  private val q5: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Ranking + running window per supplier: one shuffle on the
    * partition key; running decimal sum is exact (order-insensitive
    * correctness, order-sensitive evaluation pinned by a total sort
    * key within the partition). */
  private val q6: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        sum(dec4(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** ROLLUP hierarchical totals; sentinel 'ALL' instead of NULL so
    * the result needs no null-ordering agreement with the oracle. */
  private val q7: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** CUBE over two dims, same sentinel trick. */
  private val q8: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec4(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("total"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Per-group top-k via ranking window — shuffle on the group key
    * only; with AQE a partial top-k (limit pushdown) applies
    * map-side. Tie-broken on the unique order key. */
  private val q9: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** Exact percentiles per group (quantile_cont semantics). Exact
    * percentile needs per-group sort; at 100 TB switch the SLA to
    * approx_percentile (t-digest) — kept exact here to match the
    * oracle, q22 covers the sketched path. */
  private val q10: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** Multi-column distinct = hash aggregate, partial-aggregatable. */
  private val q11: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Scalar subquery: filter the fact against a global aggregate.
    * The 1-row aggregate broadcasts; threshold is decimal-exact then
    * compared in double. */
  private val q12: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val thr = o.agg(
      (sum(dec4(col("o_totalprice"))).cast("double") /
        count(lit(1)).cast("double")).as("__thr"))
    o.crossJoin(broadcast(thr))
      .filter(col("o_totalprice") > col("__thr"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** IN (subquery) as a left-semi join on the filtered dim. */
  private val q13: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val b = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    o.join(broadcast(b), o("o_custkey") === b("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** UNION ALL of homogeneous projections — no shuffle at all. */
  private val q14: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        lit("customer").as("src"))
    val su = Tables.supplier(s, d)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"),
        lit("supplier").as("src"))
    c.unionByName(su).orderBy(col("src"), col("id"))
  }

  /** Conditional aggregation: CASE folded into the aggregate, stays
    * in one whole-stage-codegen pass over the scan. */
  private val q15: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val disc = col("l_discount") > 0.05
    li.groupBy(col("l_returnflag"))
      .agg(
        sum(when(disc, dec4(col("l_quantity")))
          .otherwise(dec4(lit(0)))).cast("double").as("qty_highdisc"),
        sum(when(!disc, dec4(col("l_quantity")))
          .otherwise(dec4(lit(0)))).cast("double").as("qty_lowdisc"),
        count(when(disc, lit(1))).as("n_highdisc"),
        count(lit(1)).as("n_total"))
      .orderBy(col("l_returnflag"))
  }

  /** String function pipeline — all codegen'd builtins. */
  private val q16: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("label"),
        substring(col("p_name"), 1, 8).as("name_head"),
        col("p_type").like("%BRASS%").as("is_brass"))
      .orderBy(col("p_partkey"))

  /** Date/time function pipeline. */
  private val q17: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_mon"),
        expr("o_orderdate + INTERVAL 3 MONTH").as("due_date"),
        datediff(lit("2002-01-01").cast("timestamp").cast("date"),
          col("o_orderdate").cast("date")).as("age_days"))
      .orderBy(col("o_orderkey"))

  /** HAVING: post-aggregation filter against a relative threshold
    * (scales with SF instead of hard-coding a count). */
  private val q18: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    val na = Tables.nation(s, d)
    val total = o.agg(count(lit(1)).cast("double").as("__total"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(na), c("c_nationkey") === na("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(total))
      .filter(col("n_orders") >= col("__total") / 50.0)
      .select(col("n_name"), col("n_orders"))
      .orderBy(col("n_name"))
  }

  /** As-of join via [[AsOfJoin]] (union + running window, one
    * shuffle): latest event at-or-before each order date per user. */
  private val q19: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val e = Tables.events(s, d)
    AsOfJoin(
      left = o, leftKey = col("o_custkey"), leftTime = col("o_orderdate"),
      right = e, rightKey = e("user_id"), rightTime = e("ts"),
      rightSeq = e("event_id"),
      rightVals = Seq("ev_ts" -> e("ts"), "ev_value" -> e("value")))
      .orderBy(col("o_orderkey"))
  }

  /** Range join via [[RangeJoin]] (bucket-quantized equi-join):
    * clicks in the hour before each purchase, per user. */
  private val q20: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_uid"),
        col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"), col("value").as("c_value"))
    val matched = RangeJoin.bucketed(
      left = purchases, leftKey = col("p_uid"),
      lo = expr("p_ts - INTERVAL 1 HOUR"), hi = col("p_ts"),
      right = clicks, rightKey = col("c_uid"), rightTs = col("c_ts"),
      bucketSeconds = 3600L)
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec6(col("c_value"))).cast("double").as("v"))
    purchases.join(matched, Seq("p_id"), "left")
      .select(col("p_id"), coalesce(col("n"), lit(0L)).as("n_clicks"),
        coalesce(col("v"), lit(0.0)).as("click_value"))
      .orderBy(col("p_id"))
  }

  /** Explicit GROUPING SETS (via SQL — the DataFrame rollup/cube
    * cover the common cases, this covers the general one). */
  private val q21: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       count(*) AS n
        |FROM v_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** HLL sketch distinct-count — the 100 TB path for q11-style
    * questions (fixed-size sketch, map-side combinable). The sketch
    * value itself is engine-specific, so the oracled output is the
    * exact count plus a within-5%-tolerance verdict on the sketch:
    * DuckDB recomputes the exact count and expects the verdict TRUE,
    * turning the old rows-only smoke into a real accuracy gate. */
  private val q22: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("approx_within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Sketch MERGEABILITY — the property that actually matters at
    * 100 TB: per-group Datasketches-HLL sketches built in one pass
    * (`hll_sketch_agg`), then UNIONED (`hll_union_agg`) into a global
    * estimate WITHOUT rescanning the data — the two-level rollup
    * every sketch-backed dashboard runs (per-day sketches → any date
    * range by merge). q22 gates one sketch's accuracy; this gates the
    * merge path's. Oracled like q22: exact count + a within-5%
    * verdict the oracle expects TRUE. */
  private val q30: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val merged = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .crossJoin(merged)
      .select(col("exact_parts"),
        (abs(col("est") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("union_within_5pct"))
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): hierarchy traversal —
    * every part climbs a binary-heap tree (parent = key DIV 2, a
    * synthetic but deterministic hierarchy; the corpus carries no
    * parent-child column) from roots `p_partkey < 10`, labeling each
    * node with its root and depth. Spark executes the recursion as an
    * iterative loop of joins — one frontier⋈table join + union per
    * level, the same shape as dedup_components' star contraction —
    * so cost is O(depth) shuffles on the frontier, and at 100 TB the
    * contract is a bounded-depth hierarchy (here: log₂ of the key
    * space), not a bounded table. */
  private val q31: Q = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("part_h")
    s.sql(
      """WITH RECURSIVE h(part, root, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part_h WHERE p_partkey < 10
        |  UNION ALL
        |  SELECT c.p_partkey, h.root, h.depth + 1
        |  FROM part_h c JOIN h ON c.p_partkey DIV 2 = h.part
        |  WHERE c.p_partkey >= 10)
        |SELECT part, root, depth FROM h ORDER BY part""".stripMargin)
  }

  /** The offset/distribution window functions q6 doesn't cover:
    * lag/lead (previous/next order per customer), ntile quartiles,
    * and percent_rank — all over ONE window spec, so the whole
    * projection shares a single shuffle+sort on the partition key
    * (Spark fuses same-spec window functions into one Window node;
    * mixing specs would stack sorts). Deterministic tie-break on the
    * unique order key; gaps handled with explicit defaults so the
    * oracle needs no null-ordering agreement. */
  private val q32: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1, -1L).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** PIVOT: order counts per priority × status. The pivot values are
    * given explicitly — at scale an unlisted pivot needs a separate
    * distinct pass first, so production pivots always enumerate. */
  private val q24: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Salted skew join (see [[SkewJoin]]): lineitem ⋈ orders with the
    * hot-key spread over 8 salts. Result is identical to the plain
    * join — the salt changes only the physical row routing. */
  private val q23: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    SkewJoin.salted(
      big = li, bigKey = "l_orderkey",
      bigUnique = col("l_orderkey") * 8 + col("l_linenumber"),
      small = o, smallKey = "o_orderkey", numSalts = 8)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Moment statistics with deterministic results: stddev/variance
    * over doubles is shuffle-order-dependent, so the moments are
    * accumulated as EXACT decimal sums (order-independent) and the
    * final formula is evaluated in double on those exact inputs —
    * bit-identical across engines and cluster layouts. */
  private val q25: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val x = col("l_quantity").cast("decimal(18,4)")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_q"),
        sum((x * x).cast("decimal(18,8)")).cast("double").as("sumsq_q"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sum_q") / col("n").cast("double")).as("mean_q"),
        sqrt((col("sumsq_q") - col("sum_q") * col("sum_q") / col("n").cast("double")) /
          (col("n").cast("double") - 1.0)).as("stddev_q"))
      .orderBy(col("l_returnflag"))
  }

  /** Set operations: customers with urgent orders INTERSECT customers
    * with 'F' orders, minus (EXCEPT) the BUILDING segment. Both ops
    * plan as aggregate+join under the hood — no special handling. */
  private val q26: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    val finished = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    val building = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    urgent.intersect(finished).except(building)
      .orderBy(col("c_custkey"))
  }

  /** Correlated scalar subquery: orders pricier than their own
    * customer's average. Catalyst decorrelates this into an
    * aggregate + join; the average is an exact decimal ratio so the
    * boundary comparison is engine-independent. */
  private val q27: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM v_orders o
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |          / COUNT(*)
        |   FROM v_orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Single-statement table profile (the Deequ/data-quality shape):
    * row count, per-column null counts, exact distinct cardinalities,
    * min/max — the stats a pipeline asserts on before training.
    * Multiple exact COUNT(DISTINCT) makes Catalyst plan an Expand
    * (rows × #distinct-aggs) — the exact-answer cost; the 100 TB
    * daily-monitoring variant swaps in approx_count_distinct (HLL,
    * single pass, see q22) and keeps this exact form for audits. */
  private val q28: Q = (s, d) =>
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("o_custkey"))).as("custkey_nulls"),
      (count(lit(1)) - count(col("o_orderstatus"))).as("status_nulls"),
      countDistinct(col("o_custkey")).as("custkey_distinct"),
      countDistinct(col("o_orderstatus")).as("status_distinct"),
      countDistinct(col("o_orderpriority")).as("priority_distinct"),
      min(col("o_orderkey")).as("orderkey_min"),
      max(col("o_orderkey")).as("orderkey_max"),
      min(col("o_totalprice")).as("totalprice_min"),
      max(col("o_totalprice")).as("totalprice_max"),
      min(col("o_orderdate")).as("orderdate_min"),
      max(col("o_orderdate")).as("orderdate_max"))

  /** Time-interval RANGE window — 30-day rolling spend per customer
    * (the sliding-window analytic a rows-frame cannot express: the
    * frame is bounded by VALUE distance on the order timestamp, so
    * same-day ties enter the frame together and the result is
    * order-independent). The sum accumulates in decimal so both
    * engines are exact; only the output column is double. One
    * shuffle on the partition key, frame evaluation streams within
    * each sorted partition — no self-join, which is how this is
    * still one pass at 100 TB. */
  private val q29: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      // seconds since epoch as the RANGE axis (interval frames need
      // a numeric order column in the DataFrame API; NTZ timestamps
      // do not cast to long directly)
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")) / 1000000L)
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
          .cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("spend_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** LATERAL-VIEW explode: token frequency over part names. The
    * explode is a map-side row expansion (no shuffle of its own);
    * the only exchange is the final group-by on the token — at
    * 100 TB the expansion factor (~5 words/name) scales linearly
    * and partial aggregation collapses each task's counts before
    * the shuffle, so the exchange carries |vocab| rows per task,
    * not |part|×5. */
  private val q33: Q = (s, d) =>
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"),
        col("p_retailprice"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_parts"),
        sum(dec4(col("p_retailprice"))).cast("double").as("price_sum"))
      .orderBy(col("word"))

  /** Higher-order array functions (transform/filter/aggregate) over
    * per-order quantity vectors. Quantities are integral so the
    * fold is exact integer arithmetic in both engines regardless of
    * fold order. One shuffle builds the per-order array
    * (collect_list under group-by); the lambda evaluation is
    * map-side whole-stage-codegen — the 100 TB form of "array
    * programming without a UDF". */
  private val q34: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("int")))
        .as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).as("n_lines"),
        aggregate(col("qtys"), lit(0),
          (acc, x) => acc + x).as("qty_total"),
        size(filter(col("qtys"), _ > 25)).as("n_big"),
        aggregate(transform(col("qtys"), _ * 2), lit(0),
          (acc, x) => greatest(acc, x)).as("doubled_max"))
      .orderBy(col("l_orderkey"))

  /** Map-typed higher-order functions (`q47_map_funcs`) — the HOF
    * family q34's array coverage misses: `map_from_entries`,
    * `transform_values`, `map_filter`, `map_zip_with`, `element_at`,
    * `map_values`. Two partial-aggregated shuffles build the
    * per-order maps (the first collapses duplicate line numbers so
    * map keys are unique); everything after is map-side codegen over
    * the grouped rows. Money rides as integer CENTS through the
    * zip — a double product summed in two engines' different orders
    * would drift in the last ULP and fail the exact hash compare. */
  private val q47: Q = (s, d) =>
    Tables.lineitem(s, d)
      // map keys must be unique: collapse per (order, linenumber)
      // first (this corpus repeats linenumbers within an order)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(
        map_from_entries(sort_array(collect_list(struct(
          col("l_linenumber"), col("q"))))).as("qty_m"),
        map_from_entries(sort_array(collect_list(struct(
          col("l_linenumber"), col("c"))))).as("cents_m"))
      .select(col("l_orderkey"),
        size(col("qty_m")).as("n_lines"),
        aggregate(map_values(transform_values(col("qty_m"),
          (_, v) => v * 2)), lit(0L), (a, x) => a + x).as("qty2_sum"),
        size(map_filter(col("qty_m"), (_, v) => v > 25)).as("n_big"),
        element_at(col("qty_m"), lit(1)).as("first_line_qty"),
        aggregate(map_values(map_zip_with(col("qty_m"), col("cents_m"),
          (_, q, c) => q * c)), lit(0L), (a, x) => a + x)
          .as("revenue_cents"))
      .orderBy(col("l_orderkey"))

  /** Semi-structured JSON extraction (`events.props`): from_json with
    * an explicit schema, then a typed aggregate per event_type. The
    * parse is per-row map-side codegen; pushing the extraction below
    * the aggregate means the shuffle carries (type, partial-agg)
    * not raw JSON strings — at 100 TB the difference between
    * shuffling bytes of JSON and shuffling 5 grouped rows. */
  private val q35: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  /** Shredded VARIANT column (`q45_variant`; Iceberg v3 variant /
    * Delta shredding — see [[graft.sources.Variant]]): a
    * variant-shaped nested JSON ingests as typed-struct + residual,
    * and the proof of the layout is in the PLAN — the predicate on
    * the shredded path `v_typed.k` is require()d to land in the
    * parquet scan's PushedFilters (no JSON parse anywhere on the hot
    * path), while the long-tail path reads from the residual with
    * `get_json_object`. The variant JSON is BUILT from base columns
    * so the DuckDB oracle replays the whole pipeline relationally. */
  private val q45: Q = (s, d) => {
    import org.apache.spark.sql.types.StructType
    val ev = Tables.events(s, d)
    val raw = ev.select(col("event_id"),
      to_json(struct(
        from_json(col("props"), StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        col("event_type").as("lvl"),
        struct((col("user_id") % 7).as("bucket")).as("meta"))).as("v"))
    val shredSchema =
      StructType.fromDDL("k INT, meta STRUCT<bucket: BIGINT>")
    val (typed, residual) = graft.sources.Variant.shred(col("v"), shredSchema)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_variant").toString
    raw.select(col("event_id"), typed.as("v_typed"),
      residual.as("v_residual")).write.mode("overwrite").parquet(dir)
    val t = s.read.parquet(dir)
    val get = (p: String) => graft.sources.Variant.variantGet(
      col("v_typed"), col("v_residual"), shredSchema, p)
    val q = t.filter(get("k") >= 50 && get("lvl") === "error")
      .select(col("event_id"), get("k").as("k"),
        get("meta.bucket").as("bucket"), get("lvl").as("lvl"))
      .orderBy("event_id")
    // the whole point of shredding: the hot-path predicate reaches
    // the parquet scan as a NESTED pushed filter, zero JSON parsing
    val scanText = q.queryExecution.executedPlan.toString()
    require(scanText.contains("v_typed.k"),
      "the shredded path must appear in the scan's pushed filters:\n" +
        scanText)
    q
  }

  /** NATIVE VariantType (`q46_variant_native`; Spark 4's VARIANT —
    * the in-memory/binary-encoded complement of `q45_variant`'s
    * shredded storage): `parse_json` ingests the props column ONCE
    * into the binary variant encoding, the variant column round-trips
    * through parquet (typed_value/metadata physical layout), and
    * `variant_get` extracts paths at read time without re-parsing
    * text JSON per access — the schemaless-event-props surface when
    * paths are too ad hoc to shred. Typed extraction, missing-path
    * null semantics, and the parquet roundtrip are all require()d;
    * output is the same typed aggregate DuckDB replays from the raw
    * JSON. */
  private val q46: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_variant_nat").toString
    ev.select(col("event_id"), col("event_type"),
      expr("parse_json(props)").as("v"))
      .write.mode("overwrite").parquet(dir)
    val t = s.read.parquet(dir)
    require(t.schema("v").dataType.typeName == "variant",
      "the variant column must round-trip parquet AS a variant")
    val typed = t.select(col("event_type"),
      expr("variant_get(v, '$.k', 'int')").as("k"),
      expr("variant_get(v, '$.missing', 'string')").as("gone"))
    require(typed.filter(col("gone").isNotNull).count() == 0,
      "a missing variant path must read null, never error")
    typed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))
  }

  /** Explicit window frames: first/last/nth order per customer with
    * an UNBOUNDED..UNBOUNDED rows frame (the default frame stops at
    * CURRENT ROW for last_value — the classic trap this query pins
    * down). Single shuffle on the partition key; frame evaluation
    * is one sorted pass per partition. */
  private val q36: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Gaps-and-islands sessionization in plain SQL windows: a new
    * island starts when the gap since the customer's previous order
    * exceeds 30 days; a running sum over the start flags numbers the
    * islands, then a group-by aggregates each island. Two window
    * passes share ONE shuffle (same partition key + sort), and the
    * final aggregate reuses the same hash partitioning — Catalyst
    * plans a single Exchange for all three. The batch twin of
    * stream_sessionize. */
  private val q37: Q = (s, d) => {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("prev_date",
        lag(col("o_orderdate"), 1).over(byCust))
      .withColumn("new_island",
        when(col("prev_date").isNull.or(
          datediff(col("o_orderdate").cast("date"),
            col("prev_date").cast("date")) > 30), 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("island"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderdate")).as("island_start"),
        max(col("o_orderdate")).as("island_end"))
      .select(col("o_custkey"), col("island").cast("int").as("island"),
        col("n_orders"), col("island_start"), col("island_end"),
        datediff(col("island_end").cast("date"),
          col("island_start").cast("date")).as("span_days"))
      .orderBy(col("o_custkey"), col("island"))
  }

  /** Regex triple (extract / replace-all / match) over part
    * attributes — all three are per-row codegen'd expressions that
    * ride the scan, so the aggregate's shuffle is the only
    * exchange. Patterns are anchored and group-indexed to pin both
    * engines to identical POSIX-ish semantics. */
  private val q38: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("finish"),
        regexp_replace(col("p_brand"), "[0-9]", "#").as("brand_shape"),
        col("p_brand").rlike("#1[0-9]$").as("teen_brand"),
        col("p_partkey"))
      .groupBy(col("finish"), col("brand_shape"), col("teen_brand"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("p_partkey")).as("min_partkey"))
      .orderBy(col("finish"), col("brand_shape"), col("teen_brand"))

  /** UNPIVOT (wide→long melt): the per-segment stat columns become
    * (measure, value) rows — the inverse of q24's pivot, and the
    * reshape every metrics store needs before a union. Unpivot is a
    * zero-shuffle Expand over the already-aggregated 5-row frame;
    * at 100 TB the pattern holds because the melt always runs AFTER
    * the aggregate (melting raw rows first would multiply the
    * shuffle by the measure count for nothing). All measures cast
    * to double: unpivot requires one common value type, and the
    * avg is sum(decimal)-exact divided as double so both engines
    * perform the identical IEEE division. */
  private val q39: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).cast("double").as("n_customers"),
        (sum(col("c_acctbal").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .unpivot(
        Array(col("c_mktsegment")),
        Array(col("n_customers"), col("avg_bal"), col("min_bal"),
          col("max_bal")),
        "measure", "value")
      .orderBy(col("c_mktsegment"), col("measure"))

  /** LATERAL correlated subquery — top-2 customers by balance PER
    * nation, the per-row-parameterized subquery a plain join cannot
    * express. Catalyst decorrelates the LIMIT-under-LATERAL into a
    * rank-window over the join (DecorrelateInnerQuery), so the plan
    * is one shuffle on the correlation key plus a per-group sorted
    * top-k — no per-nation re-scan of customer, which is what makes
    * 25 nations or 25 million sellers the same plan shape at
    * 100 TB. Deterministic tie-break on the unique custkey. */
  private val q40: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("nation_lat")
    Tables.customer(s, d).createOrReplaceTempView("customer_lat")
    s.sql(
      """SELECT n.n_name, t.c_custkey,
        |  CAST(t.c_acctbal AS DOUBLE) AS acctbal
        |FROM nation_lat n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer_lat c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)
  }

  /** Ordered LISTAGG (string_agg): the region→nations roster as one
    * delimited string per group, with WITHIN GROUP ordering so the
    * concatenation is deterministic. The aggregate buffers only its
    * own group's strings — safe exactly when group payloads are
    * bounded (a roster, a tag list); an unbounded-payload listagg at
    * 100 TB is a design smell the collect_list caps elsewhere in
    * this repo guard against. One shuffle, map-side partials. */
  private val q41: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("nation_agg")
    Tables.region(s, d).createOrReplaceTempView("region_agg")
    s.sql(
      """SELECT r.r_name,
        |  listagg(n.n_name, ', ') WITHIN GROUP (ORDER BY n.n_name)
        |    AS nations,
        |  count(*) AS n_nations
        |FROM region_agg r JOIN nation_agg n
        |  ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)
  }

  /** TRY-arithmetic (null-on-error): try_divide nulls the rows whose
    * divisor hits zero instead of failing the 100 TB job at hour
    * nine, and try_cast turns unparseable strings into audit-able
    * nulls instead of exceptions. The ratio is double/int — both
    * engines perform the identical IEEE division on identical
    * operands, so min/max are exact without any decimal detour
    * (sums of ratios would be order-dependent; deliberately
    * absent). All per-row codegen riding the scan; the group-by is
    * the only exchange. */
  private val q42: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        try_divide(col("l_extendedprice"),
          col("l_quantity").cast("int") - lit(25)).as("ratio"),
        expr("try_cast(l_returnflag AS INT)").as("flag_int"),
        expr("try_cast(CAST(l_linenumber AS STRING) AS INT)")
          .as("line_int"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("ratio"))).as("n_zero_div"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        count(col("flag_int")).as("n_flag_int"),
        count(col("line_int")).as("n_line_int"))
      .orderBy(col("l_returnflag"))

  /** (hourly sums, complete hour grid) — the shared substrate of the
    * resample family ([[q43]] LOCF, [[q44]] interpolation): per-type
    * hourly decimal-exact sums, and every (type, hour) cell of the
    * data's global span. Bounds derive from the hourly aggregate
    * (min of truncated hours == truncated min ts); Catalyst
    * column-prunes each grid input to its own narrow scan, so no
    * consumer rereads the wide event rows. */
  private def hourlyGrid(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val ev = Tables.events(s, d)
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("hv"))
    val bounds = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val grid = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    (hourly, grid)
  }

  /** Time-series RESAMPLE + gap fill (the "regularize an event stream
    * onto a fixed grid" shape every metrics/feature pipeline needs):
    * hourly sums per event type land on a COMPLETE hour grid spanning
    * the data, missing hours carry the last observation forward
    * (LOCF), flagged. Shuffle budget: one partial-aggregated shuffle
    * of (type, hour) sums — events themselves never re-shuffle — and
    * one window over the GRID (keys × hours, metadata-scale next to
    * the event volume; state O(1) per key). The grid generates
    * per-key via `sequence()` from a broadcast 1-row bound, so no
    * driver loop and no cross join against data. Sums go through
    * decimal(18,6) so the filled values are shuffle-order-exact
    * (double summation would drift between engines). */
  private val q43: Q = (s, d) => {
    val (hourly, grid) = hourlyGrid(s, d)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        last(col("hv"), ignoreNulls = true).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("h"))
            .rowsBetween(Long.MinValue, 0)).as("v"),
        col("hv").isNull.as("filled"))
      .orderBy(col("event_type"), col("h"))
  }

  /** Time-series LINEAR INTERPOLATION — the bidirectional complement
    * of [[q43]]'s LOCF: each missing hour takes the line between its
    * nearest observed neighbors, v = prev + (next−prev)·Δt/span
    * (leading/trailing gaps fall back to the one known side). Four
    * ignore-nulls windows over the SAME metadata-scale grid (last/
    * first value and their hours, forward + backward frames), each
    * O(1) state per key — the events never re-shuffle, and the
    * arithmetic is shaped identically to the oracle's so the
    * interpolated doubles compare bit-exact. */
  private val q44: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val (hourly, grid) = hourlyGrid(s, d)
    val back = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Long.MinValue, 0)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(0, Long.MaxValue)
    val obsH = when(col("hv").isNotNull, col("h"))
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), col("hv"),
        last(col("hv"), ignoreNulls = true).over(back).as("pv"),
        last(obsH, ignoreNulls = true).over(back).as("ph"),
        first(col("hv"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsH, ignoreNulls = true).over(fwd).as("nh"))
      .select(col("event_type"), col("h"),
        when(col("hv").isNotNull, col("hv"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("h").cast("long") - col("ph").cast("long"))
              .cast("double") /
              (col("nh").cast("long") - col("ph").cast("long"))
                .cast("double"))).as("v"),
        col("hv").isNull.as("filled"))
      .orderBy(col("event_type"), col("h"))
  }

  val queries: Map[String, Q] = Map(
    "q46_variant_native" -> q46,
    "q45_variant" -> q45,
    "q44_interpolate" -> q44,
    "q43_resample" -> q43,
    "q39_unpivot" -> q39, "q40_lateral" -> q40,
    "q41_string_agg" -> q41, "q42_try_arith" -> q42,
    "q33_explode" -> q33, "q34_higher_order" -> q34,
    "q47_map_funcs" -> q47,
    "q35_json" -> q35, "q36_window_frames" -> q36,
    "q37_gaps_islands" -> q37, "q38_regexp" -> q38,
    "q29_interval_window" -> q29,
    "q28_profile" -> q28,
    "q25_stats" -> q25, "q26_setops" -> q26, "q27_correlated" -> q27,
    "q2_join_filter" -> q2, "q3_broadcast_join" -> q3,
    "q4_semi_join" -> q4, "q5_anti_join" -> q5, "q6_window" -> q6,
    "q7_rollup" -> q7, "q8_cube" -> q8, "q9_topk" -> q9,
    "q10_percentile" -> q10, "q11_distinct" -> q11,
    "q12_scalar_subquery" -> q12, "q13_in_subquery" -> q13,
    "q14_union_all" -> q14, "q15_case_agg" -> q15,
    "q16_string_funcs" -> q16, "q17_date_funcs" -> q17,
    "q18_having" -> q18, "q19_asof_join" -> q19,
    "q20_range_join" -> q20, "q21_grouping_sets" -> q21,
    "q22_approx_distinct" -> q22, "q23_salted_join" -> q23,
    "q24_pivot" -> q24, "q30_sketch_union" -> q30,
    "q31_recursive_cte" -> q31, "q32_lead_lag" -> q32)

  /** The hourly/bounds/grid CTEs as DuckDB SQL — one authority for
    * both resample oracles (they differ only in the fill rule). */
  private val resampleCtes: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS hv
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
      |grid AS (
      |  SELECT t.event_type,
      |    UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM hourly) t, b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q39_unpivot" ->
      """WITH a AS (SELECT c_mktsegment,
        |  CAST(COUNT(*) AS DOUBLE) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*) AS avg_bal,
        |  MIN(c_acctbal) AS min_bal,
        |  MAX(c_acctbal) AS max_bal
        | FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment, measure, value FROM (
        |  UNPIVOT a ON n_customers, avg_bal, min_bal, max_bal
        |  INTO NAME measure VALUE value)
        |ORDER BY c_mktsegment, measure""".stripMargin,
    "q40_lateral" ->
      """SELECT n.n_name, t.c_custkey,
        |  CAST(t.c_acctbal AS DOUBLE) AS acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    "q41_string_agg" ->
      """SELECT r.r_name,
        |  string_agg(n.n_name, ', ' ORDER BY n.n_name) AS nations,
        |  count(*) AS n_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    // same grid; the interpolation arithmetic is shaped identically
    // (pv + (nv-pv) * (dt/span), epoch-second casts) so the doubles
    // compare bit-exactly
    "q44_interpolate" ->
      s"""$resampleCtes,
        |j AS (
        |  SELECT g.event_type, g.h, hv FROM grid g
        |  LEFT JOIN hourly
        |    ON hourly.event_type = g.event_type AND hourly.h = g.h),
        |w AS (
        |  SELECT event_type, h, hv,
        |    LAST_VALUE(hv IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    LAST_VALUE(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    FIRST_VALUE(hv IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT event_type, h,
        |  CASE WHEN hv IS NOT NULL THEN hv
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) *
        |         (CAST(epoch(h) - epoch(ph) AS DOUBLE) /
        |          CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END AS v,
        |  hv IS NULL AS filled
        |FROM w ORDER BY event_type, h""".stripMargin,
    // same grid + LOCF; decimal-exact hourly sums make the filled
    // doubles bit-identical across engines
    "q43_resample" ->
      s"""$resampleCtes,
        |filled AS (
        |  SELECT g.event_type, g.h,
        |    LAST_VALUE(hv IGNORE NULLS) OVER (
        |      PARTITION BY g.event_type ORDER BY g.h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        |    hv IS NULL AS filled
        |  FROM grid g LEFT JOIN hourly
        |    ON hourly.event_type = g.event_type AND hourly.h = g.h)
        |SELECT event_type, h, v, filled FROM filled
        |ORDER BY event_type, h""".stripMargin,
    "q42_try_arith" ->
      """WITH b AS (SELECT l_returnflag,
        |  l_extendedprice / NULLIF(CAST(l_quantity AS INT) - 25, 0)
        |    AS ratio,
        |  TRY_CAST(l_returnflag AS INT) AS flag_int,
        |  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS line_int
        | FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(ratio) AS n_zero_div,
        |  MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
        |  COUNT(flag_int) AS n_flag_int,
        |  COUNT(line_int) AS n_line_int
        |FROM b GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q33_explode" ->
      """SELECT word, COUNT(*) AS n_parts,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS price_sum
        |FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word,
        |             p_retailprice FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,
    "q34_higher_order" ->
      """WITH a AS (SELECT l_orderkey,
        |  list(CAST(l_quantity AS INT) ORDER BY CAST(l_quantity AS INT)) AS qtys
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        | CAST(len(qtys) AS INT) AS n_lines,
        | CAST(list_sum(qtys) AS INT) AS qty_total,
        | CAST(len(list_filter(qtys, x -> x > 25)) AS INT) AS n_big,
        | CAST(list_max(list_transform(qtys, x -> x * 2)) AS INT) AS doubled_max
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "q46_variant_native" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
        |   AS k_sum,
        | MIN(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
        | MAX(CAST(json_extract(props, '$.k') AS INT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q45_variant" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS INT) AS k,
        | user_id % 7 AS bucket,
        | event_type AS lvl
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INT) >= 50
        |  AND event_type = 'error'
        |ORDER BY event_id""".stripMargin,
    "q47_map_funcs" ->
      """WITH l AS (SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |       AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_orderkey,
        | CAST(COUNT(*) AS INT) AS n_lines,
        | CAST(SUM(q * 2) AS BIGINT) AS qty2_sum,
        | CAST(COUNT(*) FILTER (WHERE q > 25) AS INT) AS n_big,
        | CAST(MAX(CASE WHEN l_linenumber = 1 THEN q END) AS BIGINT)
        |   AS first_line_qty,
        | CAST(SUM(q * c) AS BIGINT) AS revenue_cents
        |FROM l GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q35_json" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
        | MIN(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
        | MAX(CAST(json_extract(props, '$.k') AS INT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q36_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER w AS last_order,
        | nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q37_gaps_islands" ->
      """WITH f AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_date
        | FROM orders),
        | g AS (SELECT *, CASE WHEN prev_date IS NULL
        |    OR date_diff('day', CAST(prev_date AS DATE),
        |                 CAST(o_orderdate AS DATE)) > 30
        |   THEN 1 ELSE 0 END AS new_island FROM f),
        | h AS (SELECT *, SUM(new_island) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g)
        |SELECT o_custkey, CAST(island AS INT) AS island,
        | COUNT(*) AS n_orders,
        | MIN(o_orderdate) AS island_start, MAX(o_orderdate) AS island_end,
        | CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
        |                CAST(MAX(o_orderdate) AS DATE)) AS INT) AS span_days
        |FROM h GROUP BY o_custkey, island
        |ORDER BY o_custkey, island""".stripMargin,
    "q38_regexp" ->
      """SELECT regexp_extract(p_type, '([A-Z]+)$', 1) AS finish,
        | regexp_replace(p_brand, '[0-9]', '#', 'g') AS brand_shape,
        | regexp_matches(p_brand, '#1[0-9]$') AS teen_brand,
        | COUNT(*) AS n_parts, MIN(p_partkey) AS min_partkey
        |FROM part GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q32_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey, 1, -1) OVER w AS prev_order,
        | lead(o_orderkey, 1, -1) OVER w AS next_order,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | percent_rank() OVER w AS pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q31_recursive_cte" ->
      """WITH RECURSIVE h(part, root, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
        |  UNION ALL
        |  SELECT c.p_partkey, h.root, h.depth + 1
        |  FROM part c JOIN h ON c.p_partkey // 2 = h.part
        |  WHERE c.p_partkey >= 10)
        |SELECT part, root, CAST(depth AS INT) AS depth FROM h
        |ORDER BY part""".stripMargin,
    "q30_sketch_union" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | true AS union_within_5pct
        |FROM lineitem""".stripMargin,
    "q29_interval_window" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS spend_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q28_profile" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) - count(o_custkey) AS BIGINT) AS custkey_nulls,
        | CAST(count(*) - count(o_orderstatus) AS BIGINT) AS status_nulls,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
        | CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
        | CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS priority_distinct,
        | min(o_orderkey) AS orderkey_min, max(o_orderkey) AS orderkey_max,
        | min(o_totalprice) AS totalprice_min,
        | max(o_totalprice) AS totalprice_max,
        | min(o_orderdate) AS orderdate_min, max(o_orderdate) AS orderdate_max
        |FROM orders""".stripMargin,
    "q2_join_filter" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_broadcast_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q6_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q7_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q8_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        | coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q9_topk" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q10_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS p25,
        | quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q12_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q13_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q14_union_all" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin,
    "q15_case_agg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(18,4))
        |               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_highdisc,
        | CAST(SUM(CASE WHEN NOT (l_discount > 0.05) THEN CAST(l_quantity AS DECIMAL(18,4))
        |               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_lowdisc,
        | COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_highdisc,
        | COUNT(*) AS n_total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q16_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_up,
        | CAST(length(p_name) AS INT) AS name_len,
        | concat(p_brand, '/', p_type) AS label,
        | substring(p_name, 1, 8) AS name_head,
        | p_type LIKE '%BRASS%' AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q17_date_funcs" ->
      """SELECT o_orderkey, date_trunc('month', o_orderdate) AS order_month,
        | CAST(year(o_orderdate) AS INT) AS order_year,
        | CAST(month(o_orderdate) AS INT) AS order_mon,
        | o_orderdate + INTERVAL 3 MONTH AS due_date,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q18_having" ->
      """SELECT n_name, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING COUNT(*) >= (SELECT COUNT(*) FROM orders) / 50.0
        |ORDER BY n_name""".stripMargin,
    "q19_asof_join" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, ev_ts, ev_value FROM (
        | SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
        |  CAST(e.ts AS TIMESTAMP) AS ev_ts, e.value AS ev_value,
        |  ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |    ORDER BY e.ts DESC, e.event_id DESC) AS rn
        | FROM orders o LEFT JOIN events e
        |   ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q20_range_join" ->
      """SELECT p.event_id AS p_id,
        | COUNT(c.event_id) AS n_clicks,
        | CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,6))), 0) AS DOUBLE) AS click_value
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q21_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q22_approx_distinct" ->
      """SELECT l_returnflag,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | true AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q23_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | o_custkey, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q27_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |          / COUNT(*)
        |   FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q26_setops" ->
      """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q25_stats" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_q,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) *
        |                CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,8)))
        |       AS DOUBLE) AS sumsq_q
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | sum_q / CAST(n AS DOUBLE) AS mean_q,
        | sqrt((sumsq_q - sum_q * sum_q / CAST(n AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) - 1.0)) AS stddev_q
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q24_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        | COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        | COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
