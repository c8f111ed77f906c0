package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Specs for the LLM-pipeline operators (dedup / text / multimodal). */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("mixture sampling: upsampled epochs and downsampled fractions") {
    val rows = SparkEntry.queries("pipeline_mix")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perSrc = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 at w=2.5: every doc twice plus a hash-chosen fraction again
    val (rows0, docs0) = rows("src0")
    assert(docs0 == perSrc("src0") && rows0 >= 2 * docs0 && rows0 <= 3 * docs0)
    // src1 at w=1.0: exactly one copy of everything
    assert(rows("src1") == ((perSrc("src1"), perSrc("src1"))))
    // src2 at w=0.5: a strict subset, one copy each
    val (rows2, docs2) = rows("src2")
    assert(rows2 == docs2 && docs2 > 0 && docs2 < perSrc("src2"))
  }

  test("minhash-LSH finds exactly the true Jaccard>=0.8 pairs (full space)") {
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the whole corpus
    val sh = Tables.documents(spark, sf)
      .withColumn("sh", TextFunctions.shingles3(col("text")))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("j", TextFunctions.jaccard($"sh_a", $"sh_b"))
      .filter($"j" >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"lsh=${lsh.size} brute=${brute.size}")
    assert(brute.nonEmpty, "corpus should contain near-duplicates")
  }

  test("substring dedup: sub-threshold overlaps survive, maximal " +
      "spans merge, within-doc repeats count") {
    import graft.dedup.Dedup
    def doc(id: Long, text: String) = (id, text)
    val w = 8
    val shared = (1 to w).map(i => s"dup$i").mkString(" ")   // w tokens
    val short = (1 to w - 1).map(i => s"sub$i").mkString(" ") // w-1 tokens
    val docs = Seq(
      // docs 1/2 share EXACTLY w tokens → one span each, length w
      doc(1, s"alpha beta $shared gamma delta epsilon zeta eta theta"),
      doc(2, s"one two three $shared four five six seven eight nine"),
      // docs 3/4 share only w-1 tokens → NO span (below threshold)
      doc(3, s"p q r $short s t u v w x y z aa bb cc"),
      doc(4, s"k l m $short n o pp qq rr ss tt uu vv ww"),
      // doc 5 repeats a w-token phrase WITHIN itself → spans from
      // within-doc duplication alone (Lee et al.'s definition)
      doc(5, s"$shared filler1 filler2 filler3 $shared"),
      // unrelated noise
      doc(6, (1 to 40).map(i => s"n$i").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    val byDoc = spans.groupBy(_._1)
    assert(!byDoc.contains(3) && !byDoc.contains(4) && !byDoc.contains(6),
      s"sub-threshold (w-1 token) overlap must NOT produce spans: $spans")
    // doc 1: shared starts at token 2, exactly one maximal span of w
    assert(byDoc(1) == List((1L, 2, 2 + w - 1)))
    assert(byDoc(2) == List((2L, 3, 3 + w - 1)))
    // doc 5: two dup regions (positions 0 and w+3 > 0+w apart)
    assert(byDoc(5).map(s => (s._2, s._3)).sorted ==
      List((0, w - 1), (w + 3, 2 * w + 2)))
    // adjacency law: two dup windows ≤ w apart merge into ONE span
    val merged = Dedup.substringSpans(Seq(
      doc(10, s"$shared x $shared"),
      doc(11, s"$shared y $shared"),
      doc(12, "zz " + (1 to 30).map(i => s"m$i").mkString(" "))
    ).toDF("doc_id", "text"), w)
      .filter($"doc_id" === 10).collect()
    // doc 10/11: windows at 0 and w+1 are dup (shared w-gram), the
    // full strings differ (x vs y) — spans [0, w-1+?]: positions 0
    // and w+1 are w+1 > w apart? no: (w+1) - 0 = w+1 > w → separate
    assert(merged.map(r => (r.getInt(1), r.getInt(2))).sorted.toList ==
      List((0, w - 1), (w + 1, 2 * w)))
  }

  test("substring strip: canonical occurrence survives, dup copy " +
      "strips, unique and sub-threshold text untouched") {
    import graft.dedup.Dedup
    val w = 8
    val shared = (1 to w).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail1 tail2 tail3"),      // canonical owner
      (2L, s"$shared other1 other2 other3"),   // dup windows strip
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),  // unique: untouched
      (4L, shared)                             // exact window dup only
    ).toDF("doc_id", "text")
    val out = Dedup.substringStrip(docs, w).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 owns the canonical (smallest doc_id, pos) occurrence of
    // the shared window: nothing strips
    assert(out(1L) == ((s"$shared tail1 tail2 tail3", 11L, 0L)))
    // doc 2's copy of the shared window strips; its own tail stays
    assert(out(2L) == (("other1 other2 other3", 3L, 8L)))
    // unique doc untouched
    assert(out(3L)._3 == 0L && out(3L)._1.startsWith("u1 u2"))
    // doc 4 is ONLY the duplicated window: strips to empty, row kept
    assert(out(4L) == (("", 0L, 8L)))
    // lossless when no duplication: n_kept + n_removed == tokens
    assert(out.values.forall { case (_, k, r) => k + r > 0 || k == 0 })
  }

  test("substring strip: canonical ranges protected under overlap, " +
      "case-insensitive matching, original-case rewrite") {
    import graft.dedup.Dedup
    val w = 8
    val ps = (1 to 7).map(i => s"p$i").mkString(" ") // 7 tokens
    val xs = (1 to 8).map(i => s"x$i").mkString(" ") // 8 tokens = X
    val mixed = "Mixed CASE untouched doc " +
      (1 to 10).map(i => s"Z$i").mkString(" ")
    val docs = Seq(
      (1L, s"$ps x1 u1 u2 u3 u4 u5 u6 u7 u8"), // Y canonical at (1,0)
      (2L, s"$ps $xs"),            // Y dup at (2,0); X canonical (2,7)
      (3L, s"$xs v1 v2 v3"),       // X dup at (3,0)
      (4L, mixed),                 // unique, mixed case
      (5L, (1 to w).map(i => s"CC$i").mkString(" ") + " tail5a tail5b"),
      (6L, (1 to w).map(i => s"cc$i").mkString(" ") + " tail6a tail6b")
    ).toDF("doc_id", "text")
    val out = Dedup.substringStrip(docs, w).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // Y's non-canonical occurrence in doc 2 covers token 7 (= x1),
    // which is ALSO inside X's canonical range [7,14]: protection
    // keeps x1, so X survives intact exactly once corpus-wide
    assert(out(2L) == ((xs, 8L, 7L)))
    assert(out(1L)._3 == 0L) // Y's canonical side untouched
    assert(out(3L) == (("v1 v2 v3", 3L, 8L))) // X's dup strips
    // untouched document round-trips byte-identical (original case)
    assert(out(4L) == ((mixed, 14L, 0L)))
    // case-insensitive matching: CC≡cc windows are dups; the
    // canonical (doc 5) keeps its ORIGINAL uppercase bytes, doc 6's
    // copy strips
    assert(out(5L)._1.startsWith("CC1 CC2") && out(5L)._3 == 0L)
    assert(out(6L) == (("tail6a tail6b", 2L, 8L)))
  }

  test("BPE: classic training order, exact greedy encode, tie-break, " +
      "astral-plane roundtrip") {
    import graft.text.TextAnalysis
    // the canonical BPE walkthrough vocabulary: merges must come out
    // (u,g) [count 20], then (u,n) [16], then (h,ug) [15]
    val vocab = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L)
    val merges = TextAnalysis.trainBpe(vocab, 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    def encode(text: String, ms: Seq[(String, String)]): Seq[String] =
      Seq(text).toDF("text").select(
        call_function("graft_bpe_tokens", col("text"),
          array(ms.map { case (a, b) => lit(a + "\u0000" + b) }: _*))
          .as("tk")).head.getSeq[String](0)
    // greedy lowest-rank-first: hugs -> (u,g) fires before (h,ug)
    assert(encode("hugs bun x", merges) ==
      Seq("hug", "s", "b", "un", "x"))
    // rank order matters, not pair order in the word
    assert(encode("pun pug", merges) == Seq("p", "un", "p", "ug"))
    // equal counts tie-break lexicographically
    assert(TextAnalysis.trainBpe(Seq("ab" -> 2L, "cd" -> 2L), 1) ==
      Seq(("a", "b")))
    // code-point symbols: an astral char is ONE symbol, roundtrip holds
    assert(encode("a😀b", Nil) ==
      Seq("a", "😀", "b"))
    // exhausted vocab stops early instead of looping
    assert(TextAnalysis.trainBpe(Seq("ab" -> 1L), 10).size == 1)
  }

  test("LSH bucket cap bounds a boilerplate bucket's candidates " +
      "while keeping the cluster connected") {
    // 1000 identical docs: every band hashes them into ONE bucket, so
    // uncapped candidate generation would emit 1000*999/2 = 499500
    // pairs. With cap=8 the bucket elects its 8 lowest doc_ids as
    // representatives: sum over reps r of (999 - r) = 7964 pairs.
    val n = 1000
    val cap = 8
    val sh = spark.range(n).select(col("id").as("doc_id"),
      lit("").as("block"),
      expr("transform(sequence(1, 8), x -> cast(x * 1234567 as bigint))")
        .as("sh"))
    val cand = graft.dedup.Dedup.lshCandidates(sh, cap)
    assert(cand.count() == (0 until cap).map(r => n - 1 - r).sum)
    // every doc still appears in >=1 pair: the dup cluster stays one
    // connected component downstream
    val touched = cand.select(col("doc_a").as("d"))
      .union(cand.select(col("doc_b").as("d"))).distinct().count()
    assert(touched == n)
    // below the cap the semantics are untouched all-pairs
    val small = spark.range(5).select(col("id").as("doc_id"),
      lit("").as("block"),
      expr("transform(sequence(1, 8), x -> cast(x * 7654321 as bigint))")
        .as("sh"))
    assert(graft.dedup.Dedup.lshCandidates(small, cap).count() == 10)
  }

  test("oversized ngram block routes through LSH and still finds its dups") {
    // 30 docs in one source with maxBlock=10: the block must NOT take
    // the all-pairs path; its one true dup pair must still surface
    // via the LSH route.
    val distinct = (0 until 28).map(i =>
      (i.toLong, "big", s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dupText = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = (distinct ++ Seq((100L, "big", dupText), (101L, "big", dupText)))
      .toDF("doc_id", "source", "text")
    val sh = docs.select(col("doc_id"), col("source"),
      call_function("graft_shingle_hashes", col("text")).as("sh"))
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(sh, maxBlock = 10)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)), s"got $pairs")
    // with the bound above the block size, the exact path finds the same
    val exact = graft.dedup.Dedup.ngramJaccardPairs(sh, maxBlock = 1000)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == pairs)
  }

  test("bloom kernel: zero false negatives, calibrated false positives") {
    import graft.functions.NativeKernels
    val bloom = new Array[Byte](1024) // 8192 bits, 500 elems, k=4
    val added = (0 until 500).map(i => i * 2654435761L + 12345)
    added.foreach(h => NativeKernels.bloomAdd(bloom, h))
    assert(added.forall(NativeKernels.bloomContains(bloom, _)),
      "bloom may never false-negative an added element")
    val absent = (0 until 10000).map(i => -(i * 40503L + 7))
    val fp = absent.count(NativeKernels.bloomContains(bloom, _))
    // theoretical FP ≈ (1-e^(-kn/m))^k ≈ 0.22% → ~22 of 10000
    assert(fp < 200, s"false-positive rate implausibly high: $fp/10000")
    // the SQL surface agrees with the kernel
    val viaSql = spark.range(0, 500)
      .select(call_function("graft_bloom_contains", lit(bloom),
        expr("id * 2654435761 + 12345")).as("hit"))
      .filter(!$"hit").count()
    assert(viaSql == 0)
  }

  test("simhash band cap bounds a boilerplate bucket's candidates " +
      "while keeping the cluster connected") {
    // 1000 identical sketches: all 4 bands of every doc collide, so a
    // raw band self-join would emit 4 * 1000*999/2 rows before
    // distinct. With cap=8 each band elects the same 8 lowest doc_ids
    // as reps, so distinct pairs = sum over reps r of (999 - r).
    val n = 1000
    val cap = 8
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit(577777L).as("sim"))
    val pairs = graft.dedup.Dedup.simhashPairs(docs, cap)
    assert(pairs.count() == (0 until cap).map(r => n - 1 - r).sum)
    val touched = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(touched == n, "identical docs must stay one connected cluster")
    // below the cap the semantics are untouched all-pairs
    val small = spark.range(5).select(col("id").as("doc_id"),
      lit(99L).as("sim"))
    assert(graft.dedup.Dedup.simhashPairs(small, cap).count() == 10)
    // the oracle-exact query path survives an overflowing bucket —
    // it logs the capped loss and continues with the same bounded
    // pair list (a hard failure would brick every at-scale run to
    // defend an oracle that only executes at small scale)
    val checked = graft.dedup.Dedup.simhashPairs(docs, cap, assertExact = true)
    assert(checked.count() == (0 until cap).map(r => n - 1 - r).sum)
  }

  test("bloom decontamination plan carries no bitset literal") {
    // The bitset must travel as a broadcast handle: a byte-array
    // literal in the expression tree is re-serialized with every task
    // binary (a ~200 MB plan constant at the 10^8-gram scale the
    // operator exists for).
    val df = SparkEntry.queries("dedup_bloom")(spark, sf)
    val bigLits = df.queryExecution.analyzed
      .collect { case p => p }.flatMap(_.expressions).flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType == org.apache.spark.sql.types.BinaryType &&
            l.value != null &&
            l.value.asInstanceOf[Array[Byte]].length > 1024 => l
    })
    assert(bigLits.isEmpty, s"found ${bigLits.size} multi-KB binary literals")
    // and the collapsed row still proves the sketch contract
    val row = df.head()
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Boolean]("fp_bounded"))
  }

  test("source cap ranks via codegen'd windows, not object aggregation") {
    val df = SparkEntry.queries("pipeline_source_cap")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      "per-source cap must not pay the typed-aggregator plan constant")
    // rank column semantics preserved from the typed-agg formulation
    val top = df.filter(col("source") === "src0").collect()
    assert(top.nonEmpty && top.map(_.getAs[Int]("rank")).min == 1)
    assert(top.length <= 15)
  }

  test("topKPerGroupSized reports exact group totals under any salt skew") {
    import graft.functions.SaltedRank
    // worst case: every row lands in ONE salt group, so stage 1 drops
    // 97 of 100 rows — the carried total must still be the true 100
    val df = spark.range(100).select(col("id"), lit(1).as("g"))
    val (out, rank, total) = SaltedRank.topKPerGroupSized(df,
      Seq(col("g")), Seq(col("id").asc), 3, lit(7), 16)
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long](total) == 100L))
    assert(rows.map(_.getAs[Int](rank)).sorted.toSeq == Seq(1, 2, 3))
    // spread salts: totals sum per-salt counts across rank-1 survivors
    val (out2, _, total2) = SaltedRank.topKPerGroupSized(df,
      Seq(col("g")), Seq(col("id").asc), 3, col("id"), 16)
    assert(out2.collect().forall(_.getAs[Long](total2) == 100L))
    // a group under the cap reports its own (smaller) total
    val two = spark.range(105).select(col("id"),
      (col("id") >= 100).cast("int").as("g"))
    val (out3, _, total3) = SaltedRank.topKPerGroupSized(two,
      Seq(col("g")), Seq(col("id").asc), 3, col("id"), 16)
    val byG = out3.collect().groupBy(_.getAs[Int]("g"))
    assert(byG(0).forall(_.getAs[Long](total3) == 100L))
    assert(byG(1).forall(_.getAs[Long](total3) == 5L))
  }

  test("semantic dedup caps a one-hot cluster's dropper side at the " +
      "most-central representatives") {
    // 2-D unit vectors on one label: ids 0-3 hug the centroid, ids
    // 9/10 sit 55-60 degrees out. tau=0.9 ~ 25.8 degrees, so with
    // cap=4 the reps are exactly ids 0-3 and NOTHING within tau of
    // id 10 is a rep — capped keeps it, uncapped drops it (id 9 is
    // more central and 5 degrees away). That difference is the proof
    // the dropper side really is routed through <=cap reps (bounded
    // join rows per cell), not the full cell.
    val angles = Seq(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 3.0,
      9L -> 55.0, 10L -> 60.0)
    val e = angles.toDF("vec_id", "deg")
      .select(col("vec_id"), lit("cell").as("label"),
        array(cos(radians(col("deg"))), sin(radians(col("deg"))))
          .as("v"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(v, 0d, (acc, x) -> acc + x * x))"))
    def kept(cap: Int): Map[Long, Boolean] =
      graft.dedup.Dedup.semanticKept(e, tau = 0.9, cap = cap)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val capped = kept(4)
    val full = kept(100)
    // uncapped ground truth: most-central of 0-3 survives its tight
    // cluster, 9 survives (nothing more central within tau), 10 is
    // dropped by 9
    assert(full(9L) && !full(10L))
    assert(Seq(0L, 1L, 2L, 3L).count(full) == 1)
    // capped: id 10's only coverer (id 9) is not among the 4 reps, so
    // the cap changes exactly that one verdict — and nothing else
    assert(capped(10L))
    assert((capped - 10L) == (full - 10L))
  }

  test("SaltedRank leaves caller columns named _salt/_r1/_r2 intact") {
    import graft.functions.SaltedRank
    val df = spark.range(10).select(col("id"), (col("id") % 3).as("g"),
      lit("keep-me").as("_salt"), col("id").as("_r1"))
    val out = SaltedRank.topKPerGroup(df, Seq(col("g")),
      Seq(col("id").asc), 2, col("id"), 4)
    assert(out.columns.toSeq == Seq("id", "g", "_salt", "_r1"))
    assert(out.select("_salt").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("keep-me"))
    assert(out.count() == 6)
  }

  test("simhash banding finds exactly the hamming<=3 pairs") {
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.simhash64("text").as("sim"))
    val a = docs.select($"doc_id".as("doc_a"), $"sim".as("sim_a"))
    val b = docs.select($"doc_id".as("doc_b"), $"sim".as("sim_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .filter(expr("bit_count(sim_a ^ sim_b) <= 3"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("connected components label each vertex with its component min") {
    // 1-2-3 chain, 5-6 pair, 4 and 7 isolated
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = graft.dedup.Dedup.componentLabels(vertices, edges)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("fixpoint test keeps iterating while a member has two roots " +
      "(the r19 early-stop counterexample)") {
    // Path 1-6-5-7-2 is ONE component (min 1). Its canonical edge set
    // {(5,6),(5,7),(1,6),(2,7)} is a large-star fixpoint, and one
    // small-star round yields {(1,5),(1,6),(2,5),(2,7)} whose a-side
    // {1,2} and b-side {5,6,7} are disjoint — the round-19 test
    // stopped there and split the component into {1,5,6}/{2,7}.
    // Member 5 still carries two roots; the fixed test must keep
    // contracting until everything roots at 1.
    val vertices = Seq(1L, 2L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((5L, 6L), (5L, 7L), (1L, 6L), (2L, 7L)).toDF("a", "b")
    val got = graft.dedup.Dedup.componentLabels(vertices, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 5 && got.forall(_._2 == 1L),
      s"split component: ${got.sortBy(_._1).mkString(",")}")
  }

  test("star contraction collapses a long path to one component") {
    // a 64-chain is the adversarial diameter case for label
    // propagation; star contraction must still converge (round cap
    // inside componentLabels would throw otherwise)
    val n = 64
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = graft.dedup.Dedup.componentLabels(vertices, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n && got.forall(_._2 == 1L))
  }

  test("maxRunLength = max element multiplicity on sorted arrays") {
    val got = Seq(
      (1L, Seq("a", "b", "b", "b", "c", "c")),
      (2L, Seq("x")),
      (3L, Seq.empty[String]))
      .toDF("id", "arr")
      .select($"id", TextFunctions.maxRunLength(array_sort($"arr")).as("m"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(3L, 1L, 0L))
  }

  test("token budget: kept token mass per source is under budget " +
      "and the cut discriminates") {
    val df = SparkEntry.queries("pipeline_token_budget")(spark, sf).cache()
    val per = df.groupBy("source")
      .agg(sum("tok").as("t"), count(lit(1)).as("n")).collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      assert(r.getAs[Long]("t") <= 1000L,
        s"source ${r.get(0)} over budget: ${r.getAs[Long]("t")}")
      assert(r.getAs[Long]("n") > 0)
    }
    // something must actually be cut (the budget binds at test scale)
    val total = Tables.documents(spark, sf).count()
    assert(df.count() < total, "budget never bound — test is vacuous")
    df.unpersist()
  }

  test("semantic dedup keeps a representative per near-dup neighborhood") {
    val df = SparkEntry.queries("dedup_semantic")(spark, sf).cache()
    val total = df.count()
    val kept = df.filter(col("kept")).count()
    // discriminative at test scale: something is dropped, plenty kept
    assert(kept > 0 && kept < total, s"kept=$kept of $total")
    // no cluster is emptied: the most central member of any cluster
    // has no more-central neighbor, so it always survives
    val emptied = df.groupBy("label")
      .agg(sum(col("kept").cast("int")).as("n_kept"))
      .filter(col("n_kept") === 0).count()
    assert(emptied == 0, "a cluster lost all members")
    df.unpersist()
  }

  test("gopher filter verdicts are consistent and discriminative") {
    val df = SparkEntry.queries("text_gopher_filter")(spark, sf).cache()
    val bad = df.filter(col("keep") =!= (col("r_wordcount") &&
      col("r_meanlen") && col("r_stopwords") && col("r_alpha") &&
      col("r_dup3"))).count()
    assert(bad == 0, "keep must be the conjunction of the rule verdicts")
    val kept = df.filter(col("keep")).count()
    assert(kept > 0 && kept < df.count())
    df.unpersist()
  }

  test("gopher filter and rarity scorer plans have the claimed shape") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJ}
    // gopher: a pure map-side scan — no exchange anywhere (the
    // ORDER BY exists only for the oracle compare)
    val gp = SparkEntry.queries("text_gopher_filter")(spark, sf)
      .queryExecution.optimizedPlan
    assert(gp.collect { case a: org.apache.spark.sql.catalyst.plans
        .logical.Aggregate => a }.isEmpty &&
      gp.collect { case j: LJ => j }.isEmpty,
      "the gopher filter must stay a single-pass projection")
    // rarity: the token-keyed join must be broadcast-hinted — a
    // token-keyed exchange would hot-spot on Zipf skew
    val rp = SparkEntry.queries("text_rarity")(spark, sf)
      .queryExecution.optimizedPlan
    val joins = rp.collect { case j: LJ => j }
    assert(joins.nonEmpty && joins.forall(_.hint.rightHint.exists(
      _.strategy.contains(org.apache.spark.sql.catalyst.plans.logical
        .BROADCAST))),
      "the vocabulary must join by broadcast, never a token shuffle")
  }

  test("lm score: conditional ppm is exact and both LM joins broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJ}
    val df = SparkEntry.queries("text_lm_score")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ppm values are integer-quantized probabilities in (0, 1e6]
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_bigrams")
      val mean = r.getAs[Double]("mean_cond_ppm")
      val mn = r.getAs[Long]("min_cond_ppm")
      n > 0 && mn >= 0 && mn <= 1000000 && mean >= mn && mean <= 1000000
    })
    // a bigram with a unique head has conditional probability 1 —
    // quantized to exactly 1e6 ppm; sanity one known relation:
    // min <= mean holds per doc (checked above), and the corpus-level
    // mean is strictly below certainty (real text varies)
    assert(rows.exists(_.getAs[Double]("mean_cond_ppm") < 1000000.0))
    // both LM relations (bigram counts, head counts) join by
    // broadcast — gram keys are Zipf-skewed, they must never shuffle
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: LJ => j }
    assert(joins.size >= 2 && joins.forall(_.hint.rightHint.exists(
      _.strategy.contains(org.apache.spark.sql.catalyst.plans.logical
        .BROADCAST))),
      "the LM aggregates must join by broadcast, never a gram shuffle")
  }

  test("token budget: no window ranks the unfiltered corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter,
      Aggregate, Window => LW}
    val plan = SparkEntry.queries("pipeline_token_budget")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LW => w }
    assert(windows.nonEmpty)
    // every window's DIRECT input chain (walked through unary nodes
    // only — a collectFirst over the whole subtree would accept an
    // Aggregate buried under a join and miss the regression) must hit
    // a bounding node before anything else: the per-(source, bucket)
    // aggregate (≤ sources×1024 rows) or the boundary-bucket cut
    def bounded(p: org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case f: Filter
          if f.condition.references.exists(_.name == "cut_bkt") => true
      // the optimizer may fuse the boundary filter INTO the cut join
      // condition (bkt = cut_bkt) — that join IS the bounding node
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(
            _.references.exists(_.name == "cut_bkt")) => true
      case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode =>
        bounded(u.child)
      case _ => false
    }
    windows.foreach { w =>
      assert(bounded(w.child),
        s"window over an unbounded corpus slice: ${w.simpleString(3)}")
    }
  }

  test("repetition signals detect a duplicated phrase") {
    // "p q r p q r p q" repeats the 2-gram "p q" 3x (of 7) and
    // duplicates 3-grams: 6 total, 3 distinct -> dup3_frac = 0.5
    val df = Seq((0L, "p q r p q r p q")).toDF("doc_id", "text")
      .withColumn("g3", TextFunctions.wordNgrams($"text", 3))
      .withColumn("g2", TextFunctions.wordNgrams($"text", 2))
      .select(
        ((size($"g3") - size(array_distinct($"g3"))).cast("double") /
          size($"g3")).as("dup3"),
        (TextFunctions.maxRunLength(array_sort($"g2")).cast("double") /
          size($"g2")).as("top2"))
      .head()
    assert(df.getDouble(0) == 0.5 && df.getDouble(1) == 3.0 / 7.0)
  }

  test("decontamination flags exactly the docs sharing an 8-gram") {
    // benchmark doc shares its first 8 tokens with corpus doc 10 only
    val bench = "a b c d e f g h tail"
    val dirty = "prefix a b c d e f g h"
    val clean = "a b c d e f g x y z"
    val docs = Seq((1L, "src0", bench), (10L, "srcA", dirty),
      (11L, "srcA", clean)).toDF("doc_id", "source", "text")
    val grams = docs.select($"doc_id", $"source",
      explode(TextFunctions.wordNgrams($"text", 8)).as("g"))
      .select($"doc_id", $"source", xxhash64($"g").as("gh"))
    val benchSet = grams.filter($"source" === "src0").select("gh").distinct()
    val hit = grams.filter($"source" =!= "src0").join(benchSet, "gh")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(hit == Set(10L))
  }

  test("sequence packing offsets tile each source shard exactly") {
    val rows = SparkEntry.queries("pipeline_pack")(spark, sf)
      .select("source", "doc_id", "ntok", "start_tok", "first_window",
        "last_window")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      // each doc starts exactly where the previous one ended
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._3)
        case _ =>
      }
      // window span covers the doc's token range
      sorted.foreach { d =>
        assert(d._5 == d._4 / 2048 && d._6 == (d._4 + math.max(d._3, 1) - 1) / 2048)
      }
    }
    assert(rows.nonEmpty)
  }

  test("polynomial fingerprint matches a reference implementation") {
    val row = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        TextFunctions.polyFingerprint("text").as("fp"))
      .orderBy("doc_id").head()
    val text = row.getAs[String]("text")
    var h = 7L
    text.foreach(c => h = math.floorMod(h * 31 + c.toInt, 1000000007L))
    assert(row.getAs[Long]("fp") == h)
  }

  test("min window hash matches a reference implementation") {
    val row = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        TextFunctions.minWindowHash("text").as("mw"))
      .orderBy("doc_id").head()
    val text = row.getAs[String]("text")
    def poly(s: String): Long = {
      var h = 7L
      s.foreach(c => h = math.floorMod(h * 31 + c.toInt, 1000000007L))
      h
    }
    val expected =
      if (text.length < 8) poly(text)
      else (0 to text.length - 8).map(i => poly(text.substring(i, i + 8))).min
    assert(row.getAs[Long]("mw") == expected)
  }

  test("langid marker counts are consistent and guess is deterministic") {
    val df = SparkEntry.queries("text_langid")(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    val langs = df.select("lang_guess").distinct().collect().map(_.getString(0))
    assert(langs.forall(Set("en", "es", "de", "fr", "zh")))
  }

  test("multimodal payloads are real PNG/WAV and decode matches the formulas") {
    import graft.multimodal.MediaCodec
    // RGB png round-trip: encode → ImageIO decode → per-pixel equality
    val id = 7L // id%3==1 → rgb
    val (w, h, ch, v) = MediaCodec.decodeImage(MediaCodec.encodeRgbPng(id))
    assert((w, h, ch) == ((MediaCodec.widthOf(id), MediaCodec.heightOf(id), 3)))
    val (r, g, b) = MediaCodec.rgbAt(id, 3, 5)
    assert((v(3, 5, 0), v(3, 5, 1), v(3, 5, 2)) == ((r, g, b)))
    // gray png: raster samples, not getRGB (which would gamma-shift)
    val gid = 6L
    val gpng = MediaCodec.encodeGrayPng(gid)
    val (gw, gh, gch, gv) = MediaCodec.decodeImage(gpng)
    assert(gch == 1 && gv(2, 2, 0) == MediaCodec.grayAt(gid, 2, 2))
    // wav: RIFF chunk-walk decode returns the exact PCM16 samples
    val wid = 8L
    val wav = MediaCodec.encodeWav(wid)
    val ss = MediaCodec.decodeWav(wav)
    assert(ss.length == MediaCodec.numSamplesOf(wid))
    assert(ss(5) == MediaCodec.sampleAt(wid, 5))
    // header-only sniff reads dims without decoding
    assert(MediaCodec.sniff(gpng) == (("png", gw, gh)))
    assert(MediaCodec.sniff(wav) == (("wav", ss.length, 8000)))
    // the query surface decodes for real across the corpus
    val feats = SparkEntry.queries("mm_features")(spark, sf)
    assert(feats.filter($"fmt" === "wav").count() > 0)
    assert(feats.filter($"fmt" === "png" &&
      ($"mean_val" < 0 || $"mean_val" > 255)).count() == 0)
  }

  test("avi payloads are real RIFF containers: header sniff, frame " +
      "decode matches the formula, hostile chunks fail fast") {
    import graft.multimodal.MediaCodec
    val id = 11L
    val avi = MediaCodec.encodeAvi(id)
    // header-only metadata from the avih chunk
    assert(MediaCodec.sniffAvi(avi) == ((MediaCodec.numFramesOf(id),
      MediaCodec.widthOf(id), MediaCodec.heightOf(id))))
    // full decode: every frame/pixel equals the formula (bottom-up
    // DIB rows + stride both exercised — widthOf(11)=18 pads to 20)
    val (w, h, n, v) = MediaCodec.decodeAviFrames(avi)
    assert((w, h, n) == ((MediaCodec.widthOf(id), MediaCodec.heightOf(id),
      MediaCodec.numFramesOf(id))))
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w)
      assert(v(f, x, y) == MediaCodec.frameGrayAt(id, f, x, y),
        s"frame $f pixel ($x,$y)")
    // hostile input: negative chunk length and oversized LIST refuse
    val bad = avi.clone()
    bad(16) = -1; bad(17) = -1; bad(18) = -1; bad(19) = -1
    intercept[IllegalArgumentException](MediaCodec.sniffAvi(bad))
    val bad2 = avi.clone()
    // declare a LIST longer than the payload
    val bb2 = java.nio.ByteBuffer.wrap(bad2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(16, Int.MaxValue - 8)
    intercept[IllegalArgumentException](MediaCodec.sniffAvi(bad2))
    // the query surface samples every 2nd frame corpus-wide
    val df = SparkEntry.queries("mm_video")(spark, sf)
    assert(df.filter($"frame_idx" % 2 =!= 0).count() == 0)
    assert(df.filter($"frame_mean" < 0 || $"frame_mean" > 255).count() == 0)
  }

  test("jpeg sniffs/decodes within the lossy tolerance; malformed WAV fails fast") {
    import graft.multimodal.MediaCodec
    val id = 10L // truecolor cohort
    val jpg = MediaCodec.encodeJpeg(id)
    // header-only SOF walk agrees with the full decode
    assert(MediaCodec.sniff(jpg) ==
      (("jpeg", MediaCodec.widthOf(id), MediaCodec.heightOf(id))))
    val (w, h, ch, v) = MediaCodec.decodeImage(jpg)
    assert((w, h, ch) == ((MediaCodec.widthOf(id), MediaCodec.heightOf(id), 3)))
    // lossy but bounded: mean abs error in the calibrated band
    var err = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = MediaCodec.rgbAt(id, x, y)
      err += math.abs(v(x, y, 0) - r) +
        math.abs(v(x, y, 1) - g) + math.abs(v(x, y, 2) - b)
    }
    val meanErr = err.toDouble / (w * h * 3)
    assert(meanErr > 1.0 && meanErr <= 40.0, s"meanErr=$meanErr")
    // hostile input: a negative RIFF chunk length must fail, not walk
    // pos backwards into an infinite loop
    val bad = MediaCodec.encodeWav(8L).clone()
    bad(16) = -1; bad(17) = -1; bad(18) = -1; bad(19) = -1
    val ex = intercept[IllegalArgumentException](MediaCodec.sniff(bad))
    assert(ex.getMessage.contains("malformed WAV"))
    // and the decision-row query proves the contract corpus-wide
    val row = SparkEntry.queries("mm_jpeg")(spark, sf).head()
    assert(row.getAs[Boolean]("dims_ok") && row.getAs[Boolean]("err_bounded")
      && row.getAs[Boolean]("lossy"))
  }

  test("lexical diversity matches a per-doc recomputation") {
    val out = SparkEntry.queries("text_lexical_diversity")(spark, sf)
      .limit(25).collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).toLowerCase
        .split(" ", -1).filter(_.nonEmpty)
      val counts = toks.groupBy(identity).map(_._2.length)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_types") == counts.size)
      assert(r.getAs[Long]("n_hapax") == counts.count(_ == 1))
      assert(r.getAs[Double]("ttr") ==
        counts.size.toDouble / toks.length.toDouble)
      assert(r.getAs[Double]("top_token_frac") ==
        counts.max.toDouble / toks.length.toDouble)
    }
  }
}

/** Runs the streaming transformations through real streaming queries
  * (memory sink, synchronous processAllAvailable). */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  // The file stream source wants a directory; stage the single
  // events file into one (test data itself is read-only).
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamEvents = {
    val batchSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(batchSchema).parquet(streamDir)
    // SAME normalizer as the batch loader (Tables.events) — the
    // driver has re-encoded events.ts across rounds; one seam.
    Tables.normalizeTs(raw)
  }

  test("lakehouse streaming source is incremental: a drain sees only new commits") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_lss").toString,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "tag", "v"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lss_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake").load(t.location)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("k").as[Long].collect() }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(seen.sorted == Seq(1L, 2L))
    t.append(Seq((3L, "c", 3.0)).toDF("k", "tag", "v"))
    drain() // same checkpoint: only the new commit's rows arrive
    assert(seen.sorted == Seq(1L, 2L, 3L))
  }

  test("lake source plans batches from the manifest log, one per commit, " +
      "ignoring uncommitted files") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_mlog").toString,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    t.append(Seq((3L, 30.0)).toDF("k", "v"))
    t.append(Seq((4L, 40.0), (5L, 50.0)).toDF("k", "v"))
    // Per-batch enumeration comes from the manifests: the (from, to]
    // diff of each commit is exactly that commit's file set.
    val commitFiles = t.snapshots.map(_.files.toSet)
    for (i <- 1 until commitFiles.length) {
      val (_, files) = t.appendedFilesBetween(i.toLong, i.toLong + 1)
      assert(files.toSet == commitFiles(i) -- commitFiles(i - 1),
        s"batch ($i, ${i + 1}] must enumerate commit ${i + 1}'s manifest diff")
    }
    // Plant an orphan parquet in the data dir (a failed writer's
    // leftovers). A glob-listing source would ingest it; the
    // manifest-driven source must not.
    val commitDir = new java.io.File(s"${t.location}/data")
      .listFiles().filter(_.isDirectory).head
    Seq((99L, 99.0)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$commitDir/orphan")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    val q = spark.readStream.format("graft-lake")
      .option("maxCommitsPerTrigger", 1).load(t.location)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = b.select("k").as[Long].collect()
        seen.synchronized { seen ++= ks; if (ks.nonEmpty) batches += 1 }; ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.sorted == Seq(1L, 2L, 3L, 4L, 5L), "orphan must be invisible")
    assert(batches == 3,
      "maxCommitsPerTrigger=1 must replay the 3 commits as 3 micro-batches")
  }

  test("lake sink txn watermark makes batch replay exactly-once") {
    import spark.implicits._
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_sinktx").toString,
      Seq((1L, 1.0)).toDF("k", "v"))
    val b0 = Seq((2L, 2.0)).toDF("k", "v")
    val sink = new graft.streaming.GraftLakeSink(spark, t.location, Nil, "appA")
    sink.addBatch(0, b0)
    sink.addBatch(0, b0) // same-process replay: skipped
    assert(t.read().count() == 2)
    // crash restart: a FRESH sink recovers the watermark from the
    // manifest txn marker, not from process memory
    val sink2 = new graft.streaming.GraftLakeSink(spark, t.location, Nil, "appA")
    sink2.addBatch(0, b0) // replay across restart: still skipped
    assert(t.read().count() == 2)
    sink2.addBatch(1, Seq((3L, 3.0)).toDF("k", "v"))
    assert(t.read().count() == 3)
    assert(t.lastTxn("appA").contains(1L))
    // a different app id keeps its own watermark
    new graft.streaming.GraftLakeSink(spark, t.location, Nil, "appB")
      .addBatch(0, Seq((4L, 4.0)).toDF("k", "v"))
    assert(t.read().count() == 4)
    assert(t.lastTxn("appA").contains(1L) && t.lastTxn("appB").contains(0L))
  }

  test("streaming MERGE sink composes with deletion-vector tables") {
    import spark.implicits._
    // an upsert sink against a vector-style MoR table: matched old
    // images land as bitmaps (never tombstone files), replay stays
    // exactly-once, and every original data file survives
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_sinkdv").toString,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").repartition(1))
    t.setProperties(Map("write.merge.mode" -> "merge-on-read",
      "write.delete.style" -> "vector"))
    val before = t.currentSnapshot.files.toSet
    val sink = new graft.streaming.GraftLakeSink(spark, t.location,
      Seq("k"), "appDv")
    sink.addBatch(0, Seq((2L, 20.0), (3L, 3.0)).toDF("k", "v"))
    val s1 = t.currentSnapshot
    assert(before.subsetOf(s1.files.toSet),
      "the MoR merge sink must keep every original data file")
    assert(s1.dvs.nonEmpty && s1.posDels.isEmpty,
      "vector style must shape the sink's matched old images as bitmaps")
    sink.addBatch(0, Seq((2L, 20.0), (3L, 3.0)).toDF("k", "v")) // replay
    assert(t.currentSnapshot.id == s1.id, "replay must be exactly-once")
    assert(t.read().orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
  }

  test("writeStream format graft-lake merges batches through the sink") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_sinkq_src").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    // pre-seed k=1 stale; the merge must overwrite it
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_sinkq").toString,
      Seq((1L, -1.0)).toDF("k", "v"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sinkq_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.schema(t.currentSnapshot.schema)
        .parquet(srcDir)
        .writeStream.format("graft-lake")
        .option("mergeKeys", "k")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(t.location)
      q.awaitTermination()
    }
    drain()
    val got = t.read().orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 20.0)))
    drain() // same checkpoint: no new files, no new commits
    assert(t.read().count() == 2)
  }

  test("FGAC policy governs the manifest-log lake source") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_govsrc").toString,
      Seq((1L, "TX", 100.0), (2L, "CA", 200.0), (3L, "TX", 300.0))
        .toDF("k", "state", "v"))
    t.append(Seq((4L, "CA", 400.0), (5L, "TX", 500.0))
      .toDF("k", "state", "v"))
    // row filter on a column the principal cannot even see, plus a
    // mask — Enforcer rewrites the PLAN, so the same policy governs
    // the streaming read with zero extra machinery
    val policy = fgac.TablePolicy("lake",
      rowFilter = Some("state = 'TX'"),
      allowedColumns = Some(Seq("k", "v")),
      masks = Map("v" -> "CAST(-1.0 AS DOUBLE)"))
    val q = fgac.Enforcer.secure(
        spark.readStream.format("graft-lake").load(t.location), policy,
        "team1")
      .writeStream.format("memory").queryName("gov_lake_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("gov_lake_stream")
    assert(streamed.columns.toSeq == Seq("k", "v"))
    assert(streamed.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, -1.0), (3L, -1.0), (5L, -1.0)))
  }

  test("lake source refuses a rewrite commit instead of re-surfacing rows") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_mrw").toString,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    t.append(Seq((3L, 3.0)).toDF("k", "v"))
    t.compact(1)
    val q = spark.readStream.format("graft-lake").load(t.location)
      .writeStream.format("noop")
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("append-only"),
      s"expected the append-only lineage failure, got: ${ex.getMessage}")
  }

  test("windowed aggregation agrees between batch and streaming") {
    val q = streaming.StreamingOps.windowAgg(streamEvents)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
    val batch = streaming.StreamingOps.windowAgg(Tables.events(spark, sf))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0)
  }

  test("flatMapGroupsWithState sessionization agrees with batch formulation") {
    // two time-split files, one micro-batch each: sessions spanning
    // the batch boundary must MERGE (the open tail lives in state
    // across batches — the bug class where each batch restarts
    // session ids and double-emits)
    val events = Tables.events(spark, sf)
    val split = events.agg(
      expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")).head.getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess2").toString
    events.filter(col("ts").cast("double") <= split)
      .repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source ordering is by mod time
    events.filter(col("ts").cast("double") > split)
      .repartition(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = streaming.Sessionize.streaming(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_out")
    // the zero-delay watermark ends at max(ts): every session whose
    // gap horizon passed is closed and emitted; later tails stay
    // open in state (production semantics — never emitted early)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val batch = streaming.StreamingOps.sessionizeBatch(events)
    val closed = batch.filter(
      col("t_end") + expr("INTERVAL 30 MINUTES") <= lit(maxTs))
    assert(streamed.count() > 0 && streamed.count() == closed.count())
    assert(streamed.except(closed).count() == 0 &&
      closed.except(streamed).count() == 0)
  }

  test("FGAC row filter composes with a streaming source") {
    // Enforcer.secure rewrites the *plan*, so it applies to a
    // readStream exactly as to a batch frame — governed streams for
    // free, the composition a Lake-Formation-style engine needs.
    val policy = fgac.TablePolicy("events",
      rowFilter = Some("event_type = 'click'"),
      allowedColumns = Some(Seq("event_id", "user_id", "event_type")))
    val q = fgac.Enforcer.secure(streamEvents, policy, "team1")
      .writeStream.outputMode("append")
      .format("memory").queryName("gov_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gov_stream")
    assert(streamed.columns.toSeq == Seq("event_id", "user_id", "event_type"))
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(streamed.count() == expected && expected > 0)
  }

  test("stream-stream join (click attribution) agrees with batch") {
    val p = streamEvents.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
    val c = streamEvents.filter(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
    val q = streaming.StreamingOps.clickAttribution(p, c)
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("join_out")
    val be = Tables.events(spark, sf)
    val batch = streaming.StreamingOps.clickAttribution(
      be.filter(col("event_type") === "purchase"),
      be.filter(col("event_type") === "click"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("stream-stream LEFT OUTER join matches the watermark-contract " +
      "batch replay") {
    val p = streamEvents.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
    val c = streamEvents.filter(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
    val q = streaming.StreamingOps.clickAttributionOuter(p, c)
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_join_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("outer_join_out")
    val batch = streaming.StreamingOps.clickAttributionOuterBatch(
      Tables.events(spark, sf))
    assert(batch.filter(col("c_id").isNull).count() > 0,
      "the contract must release some null-padded purchases")
    assert(streamed.count() == batch.count(),
      s"streamed=${streamed.count()} batch=${batch.count()}")
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "streaming emission must equal the watermark-contract replay")
  }

  test("late rows beyond the watermark are dropped per the batch contract") {
    // three arrival waves, one micro-batch each: the on-time bulk,
    // the on-time 2-day tail, then the stragglers. Spark's late
    // filter in batch N uses the watermark of batch N-1 (the exact
    // boundary batch N-1's eviction already applied — SPARK-40925),
    // so the straggler batch drops against W1 = max(wave-1 ts) - 1 h:
    // the wave-2 batch in between is what makes W1 a PREVIOUS
    // watermark by the time the stragglers arrive. A two-wave run
    // drops nothing — the stragglers land in the same batch where the
    // watermark first passes their windows, which are then still in
    // state.
    val events = Tables.events(spark, sf)
    val tmax = events.agg(max(col("ts"))).head.getTimestamp(0)
    val cut = java.sql.Timestamp.from(
      tmax.toInstant.minus(java.time.Duration.ofDays(2)))
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    events.filter(col("event_id") % 7 =!= 0 && col("ts") <= lit(cut))
      .repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source ordering is by mod time
    events.filter(col("event_id") % 7 =!= 0 && col("ts") > lit(cut))
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
      .format("memory").queryName("late_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("late_out")
    val batch = streaming.StreamingOps.lateDataBatch(events)
    assert(streamed.count() == batch.count(),
      s"streamed=${streamed.count()} batch=${batch.count()}")
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "streaming emission must equal the late-data-contract replay")
    // all fates occurred: a no-drop replay disagrees (stragglers were
    // dropped), and admitted stragglers are visible in the emission
    // (batch totals exceed an on-time-only replay)
    val noDrop = streaming.StreamingOps.lateWindowAgg(events)
      .crossJoin(broadcast(events.agg(
        (max(col("ts")) - expr("INTERVAL 1 HOUR")).as("__fwm"))))
      .filter(col("window.end") <= col("__fwm"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("v"))
    assert(noDrop.except(batch).count() > 0,
      "the scenario must actually drop straggler rows")
    val admittedLate = batch.agg(sum(col("n"))).head.getLong(0) -
      events.filter(col("event_id") % 7 =!= 0)
        .crossJoin(broadcast(events.agg(
          (max(col("ts")) - expr("INTERVAL 1 HOUR")).as("__fwm"))))
        .filter(window(col("ts"), "10 minutes").getField("end") <=
          col("__fwm")).count()
    assert(admittedLate > 0, "some stragglers must be admitted and emitted")
  }

  test("streaming dedup (dropDuplicates) agrees with batch distinct") {
    val deduped = streamEvents
      .select(col("user_id"), col("event_type"),
        window(col("ts"), "5 minutes").getField("start").as("w_start"))
      .dropDuplicates("user_id", "event_type", "w_start")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_out")
    val batch = streaming.StreamingOps.dedupBatch(Tables.events(spark, sf))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
  }

  test("NTZ-encoded events round-trip: the loader normalizer makes " +
      "windowAgg/sessionize/attribution encoding-independent") {
    // Write an events table whose ts is TIMESTAMP_NTZ (what a
    // timezone-free timestamp[us] parquet reads back as in Spark 4)
    // IN-TEST, so this coverage never depends on how the driver
    // happens to encode /root/testdata in a given round.
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    events.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType,
      "precondition: the rewritten table must read back as NTZ")
    val ntz = Tables.normalizeTs(raw)
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // Every streaming-family transformation must agree with the
    // TimestampType reference frame (UTC session ⇒ the cast is exact).
    val ops: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "windowAgg" -> streaming.StreamingOps.windowAgg,
      "sessionize" -> streaming.StreamingOps.sessionizeBatch,
      "attribution" -> (e => streaming.StreamingOps.clickAttribution(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "click"))))
    ops.foreach { case (name, op) =>
      val a = op(ntz); val b = op(events)
      assert(a.count() == b.count() && a.except(b).count() == 0 &&
        b.except(a).count() == 0, s"$name disagrees under NTZ encoding")
    }
  }

  test("change feed guards: _change_type-bearing tables refuse, bad " +
      "readChangeFeed values name the option") {
    import org.apache.spark.sql.functions.lit
    val t = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_cfg").toString,
      spark.range(3).toDF("k").withColumn("_change_type", lit("x")))
    val e = intercept[Exception](
      spark.readStream.format("graft-lake")
        .option("readChangeFeed", "true").load(t.location).schema)
    assert(e.getMessage.contains("_change_type"))
    val t2 = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_cfg2").toString,
      spark.range(3).toDF("k"))
    val e2 = intercept[IllegalArgumentException](
      spark.readStream.format("graft-lake")
        .option("readChangeFeed", "yes").load(t2.location).schema)
    assert(e2.getMessage.contains("readChangeFeed"))
  }

  test("lineage stream feed: one row per update (vs the plain feed's " +
      "pair), empty compaction batch, per-batch row ids") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // lineage must be on BEFORE the first data commit: a feed batch
    // whose endpoint predates enablement refuses (its manifest holds
    // no row ids — history cannot be retro-keyed)
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "tag", "v")
    val t = graft.lakehouse.GraftTable.createEmpty(spark,
      java.nio.file.Files.createTempDirectory("graft_linfeed").toString,
      base.schema)                                             // snap 0'
    t.setProperties(Map(
      graft.lakehouse.GraftTable.RowLineageProp -> "true"))
    t.append(base)                                             // snap 1'
    t.append(Seq((4L, "d", 4.0)).toDF("k", "tag", "v"))        // snap 2
    t.update(Map("v" -> "v * 10"), "k <= 2")                   // snap 3
    t.compact(1)                                               // snap 4
    def drain(mode: String, qn: String) = {
      val q = spark.readStream.format("graft-lake")
        .option("readChangeFeed", mode)
        .option("maxCommitsPerTrigger", 1).load(t.location)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(qn)
    }
    val lin = drain("lineage", "lin_feed_spec")
    val plain = drain("true", "plain_feed_spec")
    // the pairing dividend: each of the 2 updates is ONE lineage row
    // but a delete+insert PAIR on the plain feed
    assert(lin.filter(col("_change_type") === "update").count() == 2)
    assert(plain.count() == lin.count() + 2,
      "plain feed ships one extra row per update (the old image)")
    // snapshot-1 rows' ids assigned at snap 2 still stream correctly
    assert(lin.filter(col("_row_id").isNull).count() == 0)
    assert(lin.select("_row_id").distinct().count() == 4,
      "4 logical rows → 4 distinct ids across the whole feed " +
        "(insert + update of one row share its id)")
    // the compaction batch arrived empty: total = 4 inserts + 2 updates
    assert(lin.count() == 6)
  }

  test("checkpointed restart with nothing new is a zero-row no-op") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = graft.lakehouse.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_noop_src").toString,
      Seq((1L, "a"), (2L, "b")).toDF("k", "tag"))
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_noop_sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_noop_ck").toString
    def drain(): Long = {
      val q = spark.readStream.format("graft-lake").load(src.location)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(sinkDir)
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    assert(drain() == 2)
    assert(drain() == 0, "no new commits → restart must admit no rows")
    assert(graft.lakehouse.GraftTable.load(spark, sinkDir)
      .read().count() == 2)
  }
}
